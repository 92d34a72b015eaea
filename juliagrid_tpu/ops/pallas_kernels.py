"""Pallas TPU kernels for the hot linear-algebra path.

``batched_cholesky``: one fused kernel factorizing a batch of SPD matrices
(SE gain matrices H'WH, fast-decoupled B'/B'', DC nodal matrices) entirely
in VMEM — the blocked right-looking algorithm with the rank-B trailing
update on the MXU. XLA's built-in Cholesky expander round-trips HBM between
panel steps; keeping the whole (padded) matrix resident in VMEM removes
that traffic, which dominates for the n <= ~1024 matrices the scenario
fleets factorize by the thousands.

Measured on TPU v5e (batch 1024): currently ~0.65x of XLA's expander — the
per-matrix grid layout underuses the vector lanes for these small tiles.
Round-2 plan: tile several matrices per grid step so the unrolled masked
column ops vectorize across the batch. Kept as the self-contained custom
factorization path and validated against XLA in tests.

The panel/column loops are statically unrolled: indices stay Python ints,
which sidesteps Mosaic's dynamic scalar-indexing limitations and lets the
compiler schedule the whole factorization as straight-line vector/MXU code.

Matrices are padded to a multiple of the 64-column panel; the caller pads
with an identity tail so the factor of the padded matrix embeds the factor
of the original. Falls back to interpreter mode off-TPU so the same code
path is testable on CPU meshes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BLK = 64


def _factor_diag(d):
    """Unblocked Cholesky of a (BLK, BLK) tile, statically unrolled.
    All intermediates stay 2-D (Mosaic-friendly); column writes go through
    masked selects — Mosaic has no scatter."""
    # all literals pinned to 32-bit: under jax_enable_x64 weak Python
    # scalars otherwise promote to i64/f64, which Mosaic cannot legalize
    zero = np.float32(0.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    for j in range(BLK):
        ji = np.int32(j)
        pivot = jnp.sqrt(d[j:j + 1, j:j + 1])          # (1, 1)
        col = d[:, j:j + 1] / pivot                    # (BLK, 1)
        low = jnp.where(rows > ji, col, zero)
        d = d - low * jnp.transpose(low)
        col_new = jnp.where(rows == ji, pivot, low)
        d = jnp.where(cols2 == ji, col_new, d)
    return jnp.where(rows2 >= cols2, d, zero)


def _tri_inv(l):
    """Inverse of a (BLK, BLK) lower-triangular tile by unrolled row-wise
    forward substitution — (1, BLK) x (BLK, BLK) dots instead of skinny
    matvecs, so the MXU stays busy."""
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    eye = (rows2 == cols2).astype(jnp.float32)
    x = jnp.zeros((BLK, BLK), dtype=jnp.float32)
    for i in range(BLK):
        li = l[i:i + 1, :]
        acc = jax.lax.dot_general(
            li, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (1, BLK)
        row = (eye[i:i + 1, :] - acc) / l[i:i + 1, i:i + 1]
        x = jnp.where(rows2 == np.int32(i), row, x)
    return x


def _panel_solve(slab, l11, use_inverse: bool = False):
    """X with X @ L11^T = slab.

    ``use_inverse=True`` computes X = slab @ (L11^-1)^T with one full-width
    MXU matmul after an explicit triangular inversion (faster, slightly less
    accurate); the default is unrolled forward substitution.
    """
    if use_inverse:
        inv = _tri_inv(l11)
        return jax.lax.dot_general(
            slab, inv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    x = jnp.zeros_like(slab)
    n = slab.shape[0]
    cols_n = jax.lax.broadcasted_iota(jnp.int32, (n, BLK), 1)
    for j in range(BLK):
        acc = jax.lax.dot_general(
            x, l11[j:j + 1, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (n, 1)
        newcol = (slab[:, j:j + 1] - acc) / l11[j:j + 1, j:j + 1]
        x = jnp.where(cols_n == np.int32(j), newcol, x)
    return x


def _cholesky_kernel(a_ref, out_ref):
    # refs carry a leading batch-block dim of size 1
    n = a_ref.shape[1]
    nblocks = n // BLK
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, BLK), 0)

    out_ref[0] = a_ref[0]

    for kb in range(nblocks):
        off = kb * BLK
        dblk = out_ref[0, off:off + BLK, off:off + BLK]
        l11 = _factor_diag(dblk)

        slab = out_ref[0, :, off:off + BLK]
        x = _panel_solve(slab, l11)

        below = row_ids >= np.int32(off + BLK)
        inblk = (row_ids >= np.int32(off)) & (row_ids < np.int32(off + BLK))
        # place L11 at block rows via static concatenation (Mosaic
        # supports neither pad nor dynamic_update_slice)
        parts = []
        if off:
            parts.append(jnp.zeros((off, BLK), dtype=l11.dtype))
        parts.append(l11)
        if n - off - BLK:
            parts.append(jnp.zeros((n - off - BLK, BLK), dtype=l11.dtype))
        l11_full = jnp.concatenate(parts, axis=0) if len(parts) > 1 else l11
        panel = jnp.where(below, x, jnp.where(inblk, l11_full,
                                             np.float32(0.0)))
        out_ref[0, :, off:off + BLK] = panel

        # trailing update: A22 -= L21 L21^T (rank-BLK MXU update)
        xm = jnp.where(below, x, np.float32(0.0))
        out_ref[0] = out_ref[0] - jax.lax.dot_general(
            xm, xm, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def _cholesky_kernel_tiled(a_ref, out_ref):
    """Several matrices per grid step: the per-column masked ops of the
    panel factorization vectorize across the tile's batch axis (the
    single-matrix kernel underused the vector lanes — its (BLK, 1)
    columns left 7/8 sublanes idle at SE-gain sizes)."""
    n = a_ref.shape[1]
    nblocks = n // BLK
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, BLK), 0)

    out_ref[...] = a_ref[...]

    f_diag = jax.vmap(_factor_diag)
    f_panel = jax.vmap(_panel_solve)
    for kb in range(nblocks):
        off = kb * BLK
        dblk = out_ref[:, off:off + BLK, off:off + BLK]   # (TB, BLK, BLK)
        l11 = f_diag(dblk)

        slab = out_ref[:, :, off:off + BLK]               # (TB, n, BLK)
        x = f_panel(slab, l11)

        below = row_ids >= np.int32(off + BLK)
        inblk = (row_ids >= np.int32(off)) & (row_ids < np.int32(off + BLK))
        parts = []
        if off:
            parts.append(jnp.zeros((l11.shape[0], off, BLK),
                                   dtype=l11.dtype))
        parts.append(l11)
        if n - off - BLK:
            parts.append(jnp.zeros((l11.shape[0], n - off - BLK, BLK),
                                   dtype=l11.dtype))
        l11_full = jnp.concatenate(parts, axis=1) if len(parts) > 1 else l11
        panel = jnp.where(below[None], x,
                          jnp.where(inblk[None], l11_full, np.float32(0.0)))
        out_ref[:, :, off:off + BLK] = panel

        # trailing update: A -= L_panel L_panel^T, batched on the MXU
        xm = jnp.where(below[None], x, np.float32(0.0))
        out_ref[...] = out_ref[...] - jax.lax.dot_general(
            xm, xm, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("interpret", "tile"))
def batched_cholesky_tiled(a, tile: int = 8, interpret: bool = False):
    """Batch-tiled Pallas Cholesky: ``tile`` matrices per grid step.

    ``a``: (batch, n, n) f32, n a multiple of 64, batch a multiple of
    ``tile`` (pad the batch with identity matrices if needed)."""
    batch, n, _ = a.shape
    assert batch % tile == 0, "pad the batch to a multiple of tile"
    with jax.enable_x64(False):
        return pl.pallas_call(
            _cholesky_kernel_tiled,
            out_shape=jax.ShapeDtypeStruct((batch, n, n), a.dtype),
            grid=(batch // tile,),
            in_specs=[pl.BlockSpec((tile, n, n), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((tile, n, n), lambda b: (b, 0, 0)),
            interpret=interpret,
        )(a)


@partial(jax.jit, static_argnames="interpret")
def batched_cholesky(a, interpret: bool = False):
    """Lower Cholesky factors for a batch of SPD matrices.

    ``a``: (batch, n, n) f32 with n a multiple of 64 (pad with an identity
    tail). Returns the lower factors, same shape.

    Pallas tracing runs with x64 scoped off: the framework enables
    jax_enable_x64 globally (oracle parity), but Mosaic cannot legalize
    the i64 index arithmetic that leaks into kernels under that flag.
    """
    batch, n, _ = a.shape
    with jax.enable_x64(False):
        return pl.pallas_call(
            _cholesky_kernel,
            out_shape=jax.ShapeDtypeStruct((batch, n, n), a.dtype),
            grid=(batch,),
            in_specs=[pl.BlockSpec((1, n, n), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, n, n), lambda b: (b, 0, 0)),
            interpret=interpret,
        )(a)


def pad_spd(a64, block: int = BLK):
    """Pad an SPD matrix with an identity tail to a multiple of ``block``."""
    n = a64.shape[-1]
    n_pad = (-n) % block
    if n_pad == 0:
        return a64, n
    pad_width = [(0, 0)] * (a64.ndim - 2) + [(0, n_pad), (0, n_pad)]
    a_p = jnp.pad(a64, pad_width)
    eye_tail = jnp.zeros_like(a_p)
    idx = jnp.arange(n, n + n_pad)
    eye_tail = eye_tail.at[..., idx, idx].set(1.0)
    return a_p + eye_tail, n


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def cholesky_f32(a32_batch):
    """Batched f32 Cholesky via the Pallas kernel (interpreted off-TPU)."""
    return batched_cholesky(a32_batch, interpret=not on_tpu())
