"""Benchmark: batched Newton-Raphson AC power flow throughput on TPU.

Prints one JSON line: NR iterations/s across a Monte-Carlo scenario batch
(load-scaled case30), measured on the default JAX device (the TPU chip
under the driver; falls back to CPU elsewhere).

``vs_baseline`` compares against a single-threaded scipy sparse-LU
Newton-Raphson implemented below — the same algorithm/stack shape as the
reference JuliaGrid hot path (serial CSC Jacobian fill + SuiteSparse
factorization on CPU; SURVEY §3.1), since the reference publishes no
wall-clock numbers of its own (BASELINE.md).
"""

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
CASE = os.path.join(HERE, "tests", "data", "case30test.m")
N_SCENARIOS = 1024
TOL = 1e-8
MAX_ITER = 20


def cpu_reference_rate(system, scale):
    """Single-threaded scipy NR (reference-style): iterations/second."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    n = system.bus.number
    ybus = system.model.ac.nodal.tocsc()
    g = ybus.real.toarray()
    b = ybus.imag.toarray()
    types = system.bus.layout.type.array[:n]
    slack = system.bus.layout.slack
    p0 = system.bus.supply.active.array[:n] - system.bus.demand.active.array[:n]
    q0 = (system.bus.supply.reactive.array[:n]
          - system.bus.demand.reactive.array[:n])
    vm0 = system.bus.voltage.magnitude.array[:n].copy()
    va0 = system.bus.voltage.angle.array[:n].copy()
    is_pq = types == 1
    not_slack = np.arange(n) != slack

    total_iters = 0
    t0 = time.perf_counter()
    n_cases = min(64, len(scale))  # subsample; rate is per-iteration
    for s in scale[:n_cases]:
        ps, qs = p0 * s, q0 * s
        vm, va = vm0.copy(), va0.copy()
        for _ in range(MAX_ITER):
            vc = vm * np.exp(1j * va)
            inj = vc * np.conj(ybus.dot(vc))
            mp = np.where(not_slack, inj.real - ps, 0.0)
            mq = np.where(is_pq, inj.imag - qs, 0.0)
            if max(np.abs(mp).max(), np.abs(mq).max()) < TOL:
                break
            th = va[:, None] - va[None, :]
            st, ct = np.sin(th), np.cos(th)
            vv = vm[:, None] * vm[None, :]
            gc_bs = g * ct + b * st
            gs_bc = g * st - b * ct
            h = vv * gs_bc
            nn = vm[:, None] * gc_bs
            jj = -vv * gc_bs
            ll = vm[:, None] * gs_bc
            i = np.arange(n)
            h[i, i] = -inj.imag - np.diag(b) * vm**2
            nn[i, i] = inj.real / vm + np.diag(g) * vm
            jj[i, i] = inj.real - np.diag(g) * vm**2
            ll[i, i] = inj.imag / vm - np.diag(b) * vm
            mask = np.concatenate([not_slack, is_pq]).astype(float)
            jac = np.block([[h, nn], [jj, ll]])
            jac = mask[:, None] * jac * mask[None, :] + np.diag(1 - mask)
            rhs = np.concatenate([mp, mq]) * mask
            dx = spla.splu(sp.csc_matrix(jac)).solve(rhs)
            va = va - np.where(not_slack, dx[:n], 0.0)
            vm = vm - np.where(is_pq, dx[n:], 0.0)
            total_iters += 1
    dt = time.perf_counter() - t0
    return total_iters / dt


def main():
    import jax
    import jax.numpy as jnp

    import juliagrid_tpu as jg
    from juliagrid_tpu.parallel.batch import batched_nr_solve_jit
    from juliagrid_tpu.powerflow.ac import newton_raphson

    system = jg.power_system(CASE)
    analysis = newton_raphson(system)
    arr = analysis.arrays
    n = system.bus.number

    rng = np.random.default_rng(11)
    scale = 1.0 + 0.04 * rng.standard_normal(N_SCENARIOS)
    vm0 = jnp.asarray(np.tile(analysis.voltage.magnitude, (N_SCENARIOS, 1)))
    va0 = jnp.asarray(np.tile(analysis.voltage.angle, (N_SCENARIOS, 1)))
    ps = jnp.asarray(np.asarray(arr.p_sched)[None, :] * scale[:, None])
    qs = jnp.asarray(np.asarray(arr.q_sched)[None, :] * scale[:, None])

    # warmup/compile
    vm, va, iters, conv = batched_nr_solve_jit(arr, vm0, va0, ps, qs,
                                               tol=TOL, max_iter=MAX_ITER)
    vm.block_until_ready()

    t0 = time.perf_counter()
    vm, va, iters, conv = batched_nr_solve_jit(arr, vm0, va0, ps, qs,
                                               tol=TOL, max_iter=MAX_ITER)
    vm.block_until_ready()
    dt = time.perf_counter() - t0

    total_iters = int(np.asarray(iters).sum())
    rate = total_iters / dt
    n_conv = int(np.asarray(conv).sum())

    se_detail = se_bench(system, vm, va, scale)

    base_rate = cpu_reference_rate(system, scale)
    print(json.dumps({
        "metric": "nr_iterations_per_second_case30_batch1024",
        "value": round(rate, 1),
        "unit": "iterations/s",
        "vs_baseline": round(rate / base_rate, 2),
        "detail": {
            "scenarios": N_SCENARIOS,
            "converged": n_conv,
            "wall_s": round(dt, 4),
            "total_nr_iterations": total_iters,
            "cpu_baseline_iters_per_s": round(base_rate, 1),
            "device": str(jax.devices()[0]),
            **se_detail,
        },
    }))


def se_bench(system, vm_solved, va_solved, scale):
    """Batched Monte-Carlo WLS SE throughput (BASELINE config 3/5 shape)."""
    import jax.numpy as jnp

    from juliagrid_tpu.estimation.acse import compile_se_arrays
    from juliagrid_tpu.measurement.devices import (add_varmeter,
                                                   add_voltmeter,
                                                   add_wattmeter)
    from juliagrid_tpu.measurement.load import measurement
    from juliagrid_tpu.parallel.batch import batched_se_solve_jit
    from juliagrid_tpu.postprocessing.ac import power as ac_power
    from juliagrid_tpu.powerflow.ac import compile_ac_arrays

    class _V:  # adapter: solved state of scenario 0 as an analysis-like obj
        pass

    pf = _V()
    pf.voltage = _V()
    pf.voltage.magnitude = np.asarray(vm_solved)[0]
    pf.voltage.angle = np.asarray(va_solved)[0]
    pf.system = system
    pf.power = None
    pf.current = None
    pf.kind = "power_flow"
    ac_power(pf)

    monitoring = measurement(system)
    add_voltmeter(monitoring, analysis=pf)
    add_wattmeter(monitoring, analysis=pf)
    add_varmeter(monitoring, analysis=pf)
    arr, _, _ = compile_se_arrays(system, monitoring)
    net = compile_ac_arrays(system)

    n = system.bus.number
    nscen = N_SCENARIOS
    rng = np.random.default_rng(3)
    base_mean = np.asarray(arr.mean)
    sigma = 1.0 / np.sqrt(np.asarray(arr.w))
    means = jnp.asarray(base_mean[None, :]
                        + 0.5 * sigma[None, :]
                        * rng.standard_normal((nscen, len(base_mean))))
    vm0 = jnp.asarray(np.tile(system.bus.voltage.magnitude.array[:n],
                              (nscen, 1)))
    va0 = jnp.asarray(np.tile(system.bus.voltage.angle.array[:n],
                              (nscen, 1)))

    vm, va, iters, conv = batched_se_solve_jit(arr, net, vm0, va0, means,
                                               tol=1e-8, max_iter=40)
    vm.block_until_ready()
    t0 = time.perf_counter()
    vm, va, iters, conv = batched_se_solve_jit(arr, net, vm0, va0, means,
                                               tol=1e-8, max_iter=40)
    vm.block_until_ready()
    dt = time.perf_counter() - t0
    return {
        "se_scenarios": nscen,
        "se_wall_s": round(dt, 4),
        "se_converged": int(np.asarray(conv).sum()),
        "se_solves_per_s": round(nscen / dt, 1),
        "se_gn_iterations": int(np.asarray(iters).sum()),
    }


if __name__ == "__main__":
    main()
