"""Pallas batched-Cholesky A/B vs the XLA expander at SE-gain shapes.

The round-1 kernel (one matrix per grid step) measured 0.65x of XLA's
expander; the round-3 tiled kernel runs several matrices per grid step so
the per-column masked ops vectorize across the batch. Decision rule
(VERDICT round 2, item 6): ship it into the hot path if >= 1.2x vs the
expander, delete it otherwise.

Usage: python benchmarks/pallas_ab.py   (TPU; keep the host otherwise idle)
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import juliagrid_tpu  # noqa: F401  (x64 config)
    from juliagrid_tpu.ops.pallas_kernels import (batched_cholesky,
                                                  batched_cholesky_tiled,
                                                  on_tpu)

    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0])}
    results = []
    for batch, n in [(1024, 256), (256, 256), (1024, 128), (256, 512)]:
        m = rng.standard_normal((batch, n, n)).astype(np.float32)
        a_np = np.einsum("bij,bkj->bik", m, m) + n * np.eye(
            n, dtype=np.float32)
        a = jnp.asarray(a_np)

        xla_chol = jax.jit(jnp.linalg.cholesky)

        def timed(fn, *args, **kw):
            r = fn(*args, **kw)
            r.block_until_ready()
            best = np.inf
            for _ in range(5):
                t0 = time.perf_counter()
                r = fn(*args, **kw)
                r.block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best, r

        row = {"batch": batch, "n": n}
        t_x, r_x = timed(xla_chol, a)
        row["xla_ms"] = round(t_x * 1e3, 3)
        try:
            t_p, r_p = timed(batched_cholesky, a, interpret=not on_tpu())
            row["pallas_1per_ms"] = round(t_p * 1e3, 3)
            row["pallas_1per_vs_xla"] = round(t_x / t_p, 2)
        except Exception as exc:
            row["pallas_1per_error"] = str(exc)[:150]
        for tile in (8, 16):
            try:
                t_t, r_t = timed(batched_cholesky_tiled, a, tile=tile,
                                 interpret=not on_tpu())
                err = float(jnp.max(jnp.abs(jnp.tril(r_t) - jnp.tril(r_x))))
                row[f"pallas_t{tile}_ms"] = round(t_t * 1e3, 3)
                row[f"pallas_t{tile}_vs_xla"] = round(t_x / t_t, 2)
                row[f"pallas_t{tile}_maxerr"] = err
            except Exception as exc:
                row[f"pallas_t{tile}_error"] = str(exc)[:150]
        results.append(row)
        print(json.dumps(row), flush=True)
    out["results"] = results


if __name__ == "__main__":
    main()
