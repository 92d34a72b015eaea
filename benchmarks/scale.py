"""Optional scalability benchmark: Newton-Raphson on synthetic grids of
increasing size (pegase-1354-class and beyond), single solve and batched.

Run manually: ``python benchmarks/scale.py`` (uses the default device).
Not part of the driver bench (bench.py) to keep its runtime bounded.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    from juliagrid_tpu.parallel.batch import batched_nr_solve_jit
    from juliagrid_tpu.powerflow.ac import newton_raphson
    from juliagrid_tpu.powerflow.driver import power_flow
    from juliagrid_tpu.utils.synthetic import synthetic_grid

    results = []
    for rows, cols, nscen in ((12, 10, 256), (26, 26, 64), (37, 37, 16)):
        system = synthetic_grid(rows, cols)
        n = system.bus.number
        analysis = newton_raphson(system)
        power_flow(analysis)  # includes compile
        t0 = time.perf_counter()
        power_flow(analysis)
        t_single = time.perf_counter() - t0

        arr = analysis.arrays
        rng = np.random.default_rng(5)
        scale = 1.0 + 0.03 * rng.standard_normal(nscen)
        vm0 = jnp.asarray(np.tile(analysis.voltage.magnitude, (nscen, 1)))
        va0 = jnp.asarray(np.tile(analysis.voltage.angle, (nscen, 1)))
        ps = jnp.asarray(np.asarray(arr.p_sched)[None, :] * scale[:, None])
        qs = jnp.asarray(np.asarray(arr.q_sched)[None, :] * scale[:, None])
        out = batched_nr_solve_jit(arr, vm0, va0, ps, qs,
                                   tol=1e-8, max_iter=20)
        out[0].block_until_ready()
        t0 = time.perf_counter()
        out = batched_nr_solve_jit(arr, vm0, va0, ps, qs,
                                   tol=1e-8, max_iter=20)
        out[0].block_until_ready()
        dt = time.perf_counter() - t0
        iters = int(np.asarray(out[2]).sum())
        results.append({
            "buses": n,
            "single_solve_s": round(t_single, 4),
            "batch": nscen,
            "batch_wall_s": round(dt, 4),
            "batch_iters_per_s": round(iters / dt, 1),
            "converged": int(np.asarray(out[3]).sum()),
        })
        print(json.dumps(results[-1]))


def se_scale(rows=37, cols=37, nscen=16):
    """Batched WLS SE at pegase-1354 class size (BASELINE configs 3/5)."""
    import jax.numpy as jnp

    import juliagrid_tpu as jg
    from juliagrid_tpu.estimation.acse import compile_se_arrays
    from juliagrid_tpu.measurement.devices import (add_varmeter,
                                                   add_voltmeter,
                                                   add_wattmeter)
    from juliagrid_tpu.measurement.load import measurement
    from juliagrid_tpu.parallel.batch import batched_se_solve_jit
    from juliagrid_tpu.postprocessing.ac import power as ac_power
    from juliagrid_tpu.powerflow.ac import compile_ac_arrays, newton_raphson
    from juliagrid_tpu.powerflow.driver import power_flow
    from juliagrid_tpu.utils.synthetic import synthetic_grid

    system = synthetic_grid(rows, cols)
    pf = newton_raphson(system)
    power_flow(pf)
    ac_power(pf)
    monitoring = measurement(system)
    add_voltmeter(monitoring, analysis=pf)
    add_wattmeter(monitoring, analysis=pf)
    add_varmeter(monitoring, analysis=pf)
    arr, _, _ = compile_se_arrays(system, monitoring)
    net = compile_ac_arrays(system)

    n = system.bus.number
    rng = np.random.default_rng(7)
    base_mean = np.asarray(arr.mean)
    sigma = 1.0 / np.sqrt(np.asarray(arr.w))
    means = jnp.asarray(base_mean[None, :] + 0.3 * sigma[None, :]
                        * rng.standard_normal((nscen, len(base_mean))))
    vm0 = jnp.asarray(np.tile(system.bus.voltage.magnitude.array[:n],
                              (nscen, 1)))
    va0 = jnp.asarray(np.tile(system.bus.voltage.angle.array[:n],
                              (nscen, 1)))
    out = batched_se_solve_jit(arr, net, vm0, va0, means,
                               tol=1e-8, max_iter=40)
    out[0].block_until_ready()
    t0 = time.perf_counter()
    out = batched_se_solve_jit(arr, net, vm0, va0, means,
                               tol=1e-8, max_iter=40)
    out[0].block_until_ready()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "se_buses": n,
        "se_rows": len(base_mean),
        "se_batch": nscen,
        "se_batch_wall_s": round(dt, 4),
        "se_converged": int(np.asarray(out[3]).sum()),
        "se_solve_s_amortized": round(dt / nscen, 4),
    }))


if __name__ == "__main__":
    main()
    se_scale()
