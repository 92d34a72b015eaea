"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from juliagrid_tpu.ops.pallas_kernels import batched_cholesky, pad_spd


def test_batched_cholesky_matches_xla():
    # interpret mode executes the unrolled kernel op-by-op; keep it to a
    # single 64-wide block so the CPU test stays fast (TPU runs compiled)
    rng = np.random.default_rng(1)
    B, N = 2, 64
    M = rng.standard_normal((B, N, N)).astype(np.float32)
    A = jnp.asarray(M @ np.transpose(M, (0, 2, 1))
                    + N * np.eye(N, dtype=np.float32))
    L = batched_cholesky(A, interpret=True)
    rec = jnp.einsum("bij,bkj->bik", L, L)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(A),
                               rtol=2e-4, atol=2e-2)
    Lx = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lx),
                               rtol=2e-3, atol=2e-2)


def test_pad_spd():
    A = jnp.eye(60, dtype=jnp.float32) * 4.0
    Ap, n = pad_spd(A[None])
    assert Ap.shape == (1, 64, 64)
    assert n == 60
    assert float(Ap[0, 63, 63]) == 1.0
