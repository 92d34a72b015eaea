"""Benchmark: BASELINE configs 1-5 on the driver's device (TPU chip).

Measures the named BASELINE.json configurations:

  1. Newton-Raphson AC power flow, IEEE 14, flat start (single case)
  2. DC power flow + fast-decoupled AC power flow, IEEE 118
  3. Gauss-Newton WLS SE, SCADA+PMU set, IEEE 118 (batched Monte-Carlo)
  4. LAV SE + largest-normalized-residual bad-data loop, IEEE 118
  5. Interior-point AC OPF on case1354pegase + batched Monte-Carlo WLS SE
     on case1354pegase (the 10k-scenario pod-slice shape, measured on one
     chip and reported as solves/s)

``vs_baseline`` is the geometric mean of per-config speedups against the
independent sparse CPU oracle (juliagrid_tpu/oracle/sparse_ref.py): serial
CSC fill + splu factorization — the reference's stack shape (SURVEY §3.1),
validated exactly against the MATPOWER goldens (tests/test_oracle.py).
LAV and AC OPF have no scipy-class oracle (the reference rides Ipopt);
they are reported as absolute numbers without a ratio.

Runner architecture (round-4 redesign): a SUPERVISOR parent that never
imports JAX spawns one inline child for all pending configs (a single
TPU-client/tunnel init), streams per-config results from a JSONL file,
and prints one complete cumulative JSON line after EVERY event (same
schema, geomean over what has completed, ``"partial": true`` until the
last) — so a run killed by the driver's wall clock still leaves a
parseable result on stdout; the FINAL line is authoritative. If the
child makes no progress on its current config within that config's
ceiling (the axon tunnel can block a single device call indefinitely),
the parent kills the child's process group and respawns with the rest;
one retry per config. rc is 0 in every outcome. Overall wall budget:
``BENCH_BUDGET_S`` (default 480 s fast / 3600 s with ``BENCH_FULL=1``).
"""

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "tests", "data")
TOL = 1e-8

# Fast mode (default): subset + single warm rep, sized to finish inside
# the driver's wall clock against a pre-warmed persistent compile cache.
# BENCH_FULL=1 restores the full 6-config sweep with generous budgets.
FULL = os.environ.get("BENCH_FULL") == "1"
_REPS = 3 if FULL else 1
# Overall wall budget for the WHOLE run (driver-facing contract): the
# parent stops launching children once the deadline nears and flushes a
# complete JSON line after EVERY child, so even a killed run reports
# what completed. Round-3 post-mortem: six serial children with 1500 s
# budgets and no overall clock produced rc=124 with zero bytes of output.
# Fast default raised in round 5 to fit the pegase AC OPF (config5a):
# every config flushes a complete JSON line the moment it finishes, so
# a driver that enforces a tighter wall still collects everything that
# completed — only the in-flight config is lost.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S",
                                "3600" if FULL else "2200"))
# v5e bf16 MXU peak; f32 ~0.5x, f64 is software-emulated (~10-20x tax on
# elementwise, matmuls route through f32 passes). MFU is reported against
# this number so "fast on the chip" is measured against hardware peak.
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197.0"))


def _case(name):
    import juliagrid_tpu as jg
    return jg.power_system(os.path.join(DATA, name))


def _best(fn, reps=3):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _flat_start(system):
    n = system.bus.number
    system.bus.voltage.magnitude.array[:n] = 1.0
    system.bus.voltage.angle.array[:n] = 0.0


def _scada_pmu(system, pmu_every=10):
    """SCADA+PMU measurement set from the solved power flow."""
    from juliagrid_tpu.measurement.devices import (add_pmu, add_varmeter,
                                                   add_voltmeter,
                                                   add_wattmeter)
    from juliagrid_tpu.measurement.load import measurement
    from juliagrid_tpu.powerflow.ac import newton_raphson
    from juliagrid_tpu.powerflow.driver import power_flow

    pf = newton_raphson(system)
    power_flow(pf, power=True)
    mon = measurement(system)
    add_voltmeter(mon, analysis=pf, noise=False)
    add_wattmeter(mon, analysis=pf, noise=False)
    add_varmeter(mon, analysis=pf, noise=False)
    for b in range(0, system.bus.number, pmu_every):
        add_pmu(mon, bus=system.bus.label.label(b),
                magnitude=float(pf.voltage.magnitude[b]),
                angle=float(pf.voltage.angle[b]), polar=True, noise=False)
    return mon, pf


# ---------------------------------------------------------------------------
# Config 1: NR IEEE-14 flat start (single case)
# ---------------------------------------------------------------------------

def _dispatch_floor_ms():
    """Round-trip latency of a trivial jitted op — the fixed cost every
    single-case number pays through the remote TPU tunnel. Reported so
    sub-ms solve latencies are interpretable."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(8)
    f(x).block_until_ready()
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return round(best * 1e3, 3)


def config1_nr14(on_tpu):
    import jax.numpy as jnp

    from juliagrid_tpu.oracle import oracle_nr
    from juliagrid_tpu.parallel.batch import batched_nr_solve_jit
    from juliagrid_tpu.powerflow.ac import _nr_solve, newton_raphson

    system = _case("case14.m")
    _flat_start(system)
    analysis = newton_raphson(system)
    arr = analysis.arrays
    vm0 = jnp.asarray(analysis.voltage.magnitude)
    va0 = jnp.asarray(analysis.voltage.angle)

    def run():
        vm, va, it, *_ = _nr_solve(arr, vm0, va0, TOL, 20, "LU")
        vm.block_until_ready()
        return it

    iters = int(run())  # warmup/compile
    t_fw = _best(run)

    res = oracle_nr(system)
    # best-of-3 on the oracle too: a single serial-CPU measurement under
    # host contention was a round-to-round variance source of the fleet
    # RATIO (77-114x across round-4 runs)
    t_cpu = _best(lambda: oracle_nr(system))
    assert res.iterations == iters, (res.iterations, iters)

    # BASELINE metric "NR iterations/s": fleet throughput (vmap over
    # scenarios) — the quantity the chip is for; the single-case number
    # above is dominated by the per-dispatch tunnel round-trip
    nscen = 1024 if on_tpu else 64
    n = system.bus.number
    vm_b = jnp.asarray(np.tile(np.asarray(vm0), (nscen, 1)))
    va_b = jnp.asarray(np.tile(np.asarray(va0), (nscen, 1)))
    rng = np.random.default_rng(0)
    scale = 1.0 + 0.05 * rng.standard_normal((nscen, 1))
    p_b = jnp.asarray(
        np.asarray(analysis.arrays.p_sched)[None, :] * scale)
    q_b = jnp.asarray(
        np.asarray(analysis.arrays.q_sched)[None, :] * scale)

    def run_fleet():
        vm, va, its, conv = batched_nr_solve_jit(
            arr, vm_b, va_b, p_b, q_b, tol=TOL, max_iter=20)
        vm.block_until_ready()
        return int(np.asarray(its).sum()), int(np.asarray(conv).sum())

    total_it, conv = run_fleet()      # warmup: compile outside the clock
    # a warm fleet rep is ~0.2 s; best-of-3 pins the headline ratio to
    # <=15% spread even in fast mode (round-4 verdict item 9)
    t_fleet = _best(run_fleet, reps=max(_REPS, 3))
    rate_iters = total_it / t_fleet
    rate_cpu = iters / t_cpu          # serial oracle iterations/s
    return {
        "fw_ms": round(t_fw * 1e3, 3), "cpu_ms": round(t_cpu * 1e3, 3),
        "iterations": iters,
        "dispatch_floor_ms": _dispatch_floor_ms(),
        "fleet_scenarios": nscen, "fleet_converged": conv,
        "fleet_nr_iterations_per_s": round(rate_iters, 0),
        "cpu_nr_iterations_per_s": round(rate_cpu, 0),
        # fleet-throughput ratio (1024-scenario vmap vs one serial oracle
        # solve) — renamed from round-3's "speedup" so round-over-round
        # numbers aren't read as a single-case latency ratio
        "fleet_speedup": round(rate_iters / rate_cpu, 2),
    }


# ---------------------------------------------------------------------------
# Config 2: DC PF + fast-decoupled AC PF, IEEE 118
# ---------------------------------------------------------------------------

def config2_dc_fdpf_118():
    import jax.numpy as jnp

    from juliagrid_tpu.oracle import oracle_dc, oracle_fdpf
    from juliagrid_tpu.powerflow.dc import _dc_solve, dc_power_flow
    from juliagrid_tpu.powerflow.fast_decoupled import (_fnr_solve,
                                                        fast_newton_raphson_bx)

    system = _case("case118.m")

    pf = dc_power_flow(system)

    def run_dc():
        th = _dc_solve(pf.arrays, "LU")
        th.block_until_ready()
        return th

    th = run_dc()
    t_dc = _best(run_dc)
    t0 = time.perf_counter()
    res_dc = oracle_dc(system)
    t_dc_cpu = time.perf_counter() - t0
    assert np.max(np.abs(np.asarray(th) - res_dc.angle)) < 1e-6

    # fleet throughput (vmap over demand scenarios) through the PRODUCT
    # batched-DC API — the benched path is the shipped path
    from juliagrid_tpu.parallel import batched_dc_solve_jit
    nscen_dc = 1024
    rng = np.random.default_rng(1)
    p_b = jnp.asarray(np.asarray(pf.arrays.p_sched)[None, :]
                      * (1.0 + 0.05 * rng.standard_normal((nscen_dc, 1))))

    def run_dc_fleet(p_b):
        return batched_dc_solve_jit(pf.arrays, p_b)

    run_dc_fleet(p_b).block_until_ready()
    t0 = time.perf_counter()
    run_dc_fleet(p_b).block_until_ready()
    t_dc_fleet = time.perf_counter() - t0
    dc_rate = nscen_dc / t_dc_fleet
    dc_rate_cpu = 1.0 / t_dc_cpu

    fd = fast_newton_raphson_bx(system)
    arr = fd.arrays
    vm0 = jnp.asarray(fd.voltage.magnitude)
    va0 = jnp.asarray(fd.voltage.angle)

    def run_fd():
        vm, va, it, *_ = _fnr_solve(arr, vm0, va0, TOL, 200, "LU")
        vm.block_until_ready()
        return it

    iters = int(run_fd())
    t_fd = _best(run_fd)
    t0 = time.perf_counter()
    res_fd = oracle_fdpf(system, bx=True, iteration=200)
    t_fd_cpu = time.perf_counter() - t0
    assert res_fd.iterations == iters, (res_fd.iterations, iters)
    return {
        "dc_fw_ms": round(t_dc * 1e3, 3),
        "dc_cpu_ms": round(t_dc_cpu * 1e3, 3),
        "dc_fleet_scenarios": nscen_dc,
        "dc_fleet_solves_per_s": round(dc_rate, 1),
        "dc_cpu_solves_per_s": round(dc_rate_cpu, 1),
        "dc_speedup": round(dc_rate / dc_rate_cpu, 2),
        "dispatch_floor_ms": _dispatch_floor_ms(),
        "fdpf_fw_ms": round(t_fd * 1e3, 3),
        "fdpf_cpu_ms": round(t_fd_cpu * 1e3, 3),
        "fdpf_iterations": iters,
        "fdpf_single_case_speedup": round(t_fd_cpu / t_fd, 2),
    }


# ---------------------------------------------------------------------------
# Config 3: batched Monte-Carlo GN WLS SE, SCADA+PMU, IEEE 118
# ---------------------------------------------------------------------------

def _se_scenarios(arr_host, nscen, spread=0.5, rng_seed=3):
    """arr_host must be the HOST mirror (device readbacks through the
    tunnel cost ~2 min each)."""
    rng = np.random.default_rng(rng_seed)
    base = np.asarray(arr_host.mean)
    sigma = 1.0 / np.sqrt(np.asarray(arr_host.w))
    return base[None, :] + spread * sigma[None, :] * rng.standard_normal(
        (nscen, len(base)))


def _se_hbm_gb(chunk, rows, n_bus):
    """Rough per-chunk HBM footprint of the batched GN SE program: the
    Jacobian now lives as its O(nnz) entry list plus ONE f32 dense
    scatter (H) and its weight-scaled copy for the MXU gain — the dense
    f64 H/WH of rounds 1-4 are gone (gn_increment sparse-refinement
    redesign). Per scenario: 2 f32 (rows x 2n) + ~3 f32 (2n)^2 for the
    gain/LU/temps. Used to pick chunk sizes that respect the 16 GB v5e
    budget."""
    s = 2 * n_bus
    per_scen = 2 * rows * s * 4 + 3 * s * s * 4
    return round(chunk * per_scen / 2**30, 2)


def _pick_chunk(rows, n_bus, budget_gb=8.0, cap=256):
    """Largest power-of-two scenario chunk whose estimated footprint fits
    the budget (the v5e has 16 GB; leave headroom for XLA temps)."""
    chunk = cap
    while chunk > 1 and _se_hbm_gb(chunk, rows, n_bus) > budget_gb:
        chunk //= 2
    return chunk


def config3_se118(on_tpu):
    import jax.numpy as jnp

    from juliagrid_tpu.estimation.acse import compile_se_arrays
    from juliagrid_tpu.oracle import oracle_wls_se
    from juliagrid_tpu.parallel.batch import batched_se_solve_jit
    from juliagrid_tpu.powerflow.ac import compile_ac_arrays

    system = _case("case118.m")
    mon, pf = _scada_pmu(system)
    arr, _, _, arr_h = compile_se_arrays(system, mon, return_host=True)
    net = compile_ac_arrays(system)
    n = system.bus.number
    rows = int(arr_h.mean.shape[0])

    # chunked like config 5: one 1024-scenario while_loop was exactly the
    # shape that OOM-killed the round-2 bench on the 16 GB chip
    nscen = (1024 if FULL else 256) if on_tpu else 64
    chunk = _pick_chunk(rows, n, cap=128) if on_tpu else 16
    hbm_gb = _se_hbm_gb(chunk, rows, n)
    means = _se_scenarios(arr_h, nscen)
    vm0 = jnp.asarray(np.tile(system.bus.voltage.magnitude.array[:n],
                              (chunk, 1)))
    va0 = jnp.asarray(np.tile(system.bus.voltage.angle.array[:n],
                              (chunk, 1)))

    def run_chunk(mz):
        vm, va, iters, conv = batched_se_solve_jit(
            arr, net, vm0, va0, jnp.asarray(mz), tol=TOL, max_iter=40)
        vm.block_until_ready()
        return iters, conv

    run_chunk(means[:chunk])  # warmup/compile

    def run_all():
        tot_it, tot_conv = 0, 0
        for k in range(0, nscen, chunk):
            iters, conv = run_chunk(means[k:k + chunk])
            tot_it += int(np.asarray(iters).sum())
            tot_conv += int(np.asarray(conv).sum())
        return tot_it, tot_conv

    t0 = time.perf_counter()
    total_iters, total_conv = run_all()
    t_fw = time.perf_counter() - t0

    # serial sparse oracle rate (subsample; scale by scenario count)
    n_cpu = min(8, nscen)
    t0 = time.perf_counter()
    for _ in range(n_cpu):
        res = oracle_wls_se(system, mon)
    t_cpu_each = (time.perf_counter() - t0) / n_cpu
    assert res.converged
    rate_fw = nscen / t_fw
    rate_cpu = 1.0 / t_cpu_each
    return {
        "scenarios": nscen, "chunk": chunk, "hbm_est_gb": hbm_gb,
        "converged": total_conv,
        "gn_iterations": total_iters,
        "fw_solves_per_s": round(rate_fw, 1),
        "cpu_solves_per_s": round(rate_cpu, 1),
        "fw_wall_s": round(t_fw, 4),
        "speedup": round(rate_fw / rate_cpu, 2),
        "rows": rows,
        "achieved_tflops": _se_tflops(total_iters, rows, n, t_fw),
        "mfu_pct": _mfu(_se_tflops(total_iters, rows, n, t_fw)),
    }


def _se_tflops(gn_iterations, rows, n_bus, wall_s):
    """Nominal FLOPs of the dominant SE kernels (gain matmul + LU) per
    GN iteration, so 'fast' is demonstrated against the chip's peak, not
    just against the CPU baseline."""
    s = 2 * n_bus
    flops = gn_iterations * (2.0 * rows * s * s + (2.0 / 3.0) * s**3)
    return round(flops / wall_s / 1e12, 3)


def _mfu(tflops):
    """Achieved fraction of the chip's MXU peak for the dominant kernel.
    The SE gain forms in f32 (half the bf16 peak) and the f64 state/
    residual arithmetic around it is software-emulated — single-digit
    MFU is the honest expectation for f64-grade solvers; see BENCH_NOTES."""
    return round(100.0 * tflops / PEAK_TFLOPS, 2)


# ---------------------------------------------------------------------------
# Config 4: LAV SE + largest-normalized-residual loop, IEEE 118
# ---------------------------------------------------------------------------

def config4_lav_baddata_118():
    import scipy.sparse as sp
    from scipy.sparse.linalg import splu

    from juliagrid_tpu.estimation.acse import gauss_newton, state_estimation
    from juliagrid_tpu.estimation.baddata import _deactivate, lnr_removal
    from juliagrid_tpu.estimation.lav import ac_lav_state_estimation
    from juliagrid_tpu.measurement.devices import update_wattmeter
    from juliagrid_tpu.oracle import oracle_wls_se

    system = _case("case118.m")
    mon, pf = _scada_pmu(system)
    # two gross errors for the LNR loop to find
    update_wattmeter(mon, mon.wattmeter.label.label(3), active=5.0)
    update_wattmeter(mon, mon.wattmeter.label.label(40), active=-4.0)

    def make_mon():
        m, _ = _scada_pmu(system)
        update_wattmeter(m, m.wattmeter.label.label(3), active=5.0)
        update_wattmeter(m, m.wattmeter.label.label(40), active=-4.0)
        return m

    def lnr_loop(m):
        # device-fused detect-remove-resolve loop: ONE jitted program
        # instead of ~6 dispatches + a dense readback per removal round
        # (the host-driven loop was tunnel-dispatch bound at 0.06x CPU)
        se = gauss_newton(m)
        removed = lnr_removal(se, threshold=3.0, max_remove=10)
        return len(removed), se

    # warm measurement: the first pass pays the tunnel compiles; the
    # deployment shape (cyclic re-estimation) runs against the compile cache
    lnr_loop(mon)
    t0 = time.perf_counter()
    removed, se = lnr_loop(make_mon())
    t_fw = time.perf_counter() - t0

    # CPU baseline: oracle WLS + sparse-gain LNR loop (same algorithm:
    # re-estimate, normalized residuals from the residual-covariance
    # diagonal, deactivate the worst row, repeat)
    mon2, _ = _scada_pmu(system)
    update_wattmeter(mon2, mon2.wattmeter.label.label(3), active=5.0)
    update_wattmeter(mon2, mon2.wattmeter.label.label(40), active=-4.0)

    def cpu_loop():
        removed = 0
        while removed < 10:
            res = oracle_wls_se(system, mon2)
            H = res.jacobian.tocsc()
            keep = np.ones(H.shape[1])
            keep[res.slack] = 0.0
            Hm = (H @ sp.diags(keep)).tocsc()
            gain = (Hm.T @ sp.diags(res.weights) @ Hm
                    + sp.diags(1.0 - keep)).tocsc()
            lu = splu(gain)
            ginv_ht = lu.solve(Hm.T.toarray())
            c = 1.0 / res.weights - np.einsum(
                "ji,ji->i", ginv_ht, Hm.toarray().T)
            rn = np.abs(res.residual) / np.sqrt(np.maximum(c, 1e-14))
            k = int(np.argmax(rn))
            if rn[k] <= 3.0:
                break
            kind, dev = res.row_device[k]
            _deactivate(mon2, kind, dev)
            removed += 1
        return removed

    t0 = time.perf_counter()
    removed_cpu = cpu_loop()
    t_cpu = time.perf_counter() - t0

    mon3, _ = _scada_pmu(system)
    state_estimation(ac_lav_state_estimation(mon3))  # compile pass
    lav = ac_lav_state_estimation(mon3)
    t0 = time.perf_counter()
    state_estimation(lav)
    t_lav = time.perf_counter() - t0
    err = float(np.max(np.abs(lav.voltage.magnitude - pf.voltage.magnitude)))
    return {
        "lnr_removed": removed, "lnr_fw_s": round(t_fw, 3),
        "lnr_cpu_removed": removed_cpu, "lnr_cpu_s": round(t_cpu, 3),
        "lnr_speedup": round(t_cpu / t_fw, 2),
        "lav_converged": bool(lav.method.converged),
        "lav_iterations": int(lav.method.iteration),
        "lav_wall_s": round(t_lav, 2),
        "lav_state_err_vs_pf": round(err, 9),
    }


# ---------------------------------------------------------------------------
# Config 5: IPM AC OPF (pegase) + batched Monte-Carlo SE (pegase)
# ---------------------------------------------------------------------------

def config5_opf(on_tpu):
    """AC OPF (interior point); pegase on the chip, 118 on CPU dry-runs
    (the pegase IPM takes ~1h of CPU; this is a TPU benchmark). Runs in
    its own child so a compile overrun can't cost the SE numbers."""
    out = {}
    opf_case = "case1354pegase.h5" if on_tpu else "case118.m"
    try:
        from juliagrid_tpu.opf.acopf import ac_optimal_power_flow, solve
        system = _case(opf_case)
        opf = ac_optimal_power_flow(system)
        t0 = time.perf_counter()
        solve(opf, max_seconds=1100.0 if on_tpu else 300.0)
        t_opf = time.perf_counter() - t0
        out.update(opf_case=opf_case,
                   opf_converged=bool(opf.method.converged),
                   opf_status=getattr(opf.method.result, "status", "?"),
                   opf_iterations=int(opf.method.iteration),
                   opf_objective=round(float(opf.method.objective), 2),
                   opf_kkt_error=float(opf.method.result.kkt_error),
                   opf_wall_s=round(t_opf, 2))
    except Exception as exc:  # report, don't kill the bench
        out.update(opf_case=opf_case, opf_converged=False,
                   opf_error=f"{type(exc).__name__}: {str(exc)[:200]}")
    return out


def config5_se(on_tpu):
    """Batched Monte-Carlo WLS SE on pegase (the 10k-scenario pod shape)."""
    out = {}
    _config5_se(out, on_tpu)
    return out


def _config5_se(out, on_tpu):
    import jax.numpy as jnp

    from juliagrid_tpu.estimation.acse import compile_se_arrays
    from juliagrid_tpu.oracle import oracle_wls_se
    from juliagrid_tpu.parallel.batch import batched_se_solve_jit
    from juliagrid_tpu.powerflow.ac import compile_ac_arrays

    system = _case("case1354pegase.h5")
    mon, pf = _scada_pmu(system, pmu_every=10)
    arr, _, _, arr_h = compile_se_arrays(system, mon, return_host=True)
    net = compile_ac_arrays(system)
    n = system.bus.number
    rows = int(arr_h.mean.shape[0])

    nscen = (256 if FULL else 64) if on_tpu else 4
    chunk = _pick_chunk(rows, n, cap=32) if on_tpu else 2
    out["se_chunk"] = chunk
    out["se_hbm_est_gb"] = _se_hbm_gb(chunk, rows, n)
    means = _se_scenarios(arr_h, nscen)
    vm0 = np.tile(system.bus.voltage.magnitude.array[:n], (chunk, 1))
    va0 = np.tile(system.bus.voltage.angle.array[:n], (chunk, 1))
    vm0 = jnp.asarray(vm0)
    va0 = jnp.asarray(va0)

    def run_chunk(mz):
        vm, va, iters, conv = batched_se_solve_jit(
            arr, net, vm0, va0, jnp.asarray(mz), tol=TOL, max_iter=40)
        vm.block_until_ready()
        return iters, conv

    run_chunk(means[:chunk])  # warmup
    t0 = time.perf_counter()
    total_conv = 0
    total_iters = 0
    for k in range(0, nscen, chunk):
        iters, conv = run_chunk(means[k:k + chunk])
        total_conv += int(np.asarray(conv).sum())
        total_iters += int(np.asarray(iters).sum())
    t_fw = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = oracle_wls_se(system, mon)
    t_cpu_each = time.perf_counter() - t0
    assert res.converged
    rate_fw = nscen / t_fw
    rate_cpu = 1.0 / t_cpu_each
    out.update({
        "se_scenarios": nscen, "se_chunk": chunk,
        "se_converged": total_conv, "se_gn_iterations": total_iters,
        "se_fw_solves_per_s": round(rate_fw, 2),
        "se_cpu_solves_per_s": round(rate_cpu, 2),
        "se_speedup": round(rate_fw / rate_cpu, 2),
        "se_rows": rows,
        "se_10k_projected_s": round(10000 / rate_fw, 1),
        "se_achieved_tflops": _se_tflops(total_iters, rows, n, t_fw),
        "se_mfu_pct": _mfu(_se_tflops(total_iters, rows, n, t_fw)),
    })


CONFIGS = [
    ("config1_nr14_flat", lambda on_tpu: config1_nr14(on_tpu)),
    ("config2_dc_fdpf_118", lambda on_tpu: config2_dc_fdpf_118()),
    ("config3_wls_se_118", lambda on_tpu: config3_se118(on_tpu)),
    ("config4_lav_baddata_118", lambda on_tpu: config4_lav_baddata_118()),
    ("config5a_opf_pegase", lambda on_tpu: config5_opf(on_tpu)),
    ("config5b_se_pegase", lambda on_tpu: config5_se(on_tpu)),
]

# Launch order: highest information first, so a tight budget still yields
# the headline ratios (NR fleet, SE+MFU, DC fleet) before the long tails.
# config4 runs LAST in fast mode: its LNR/LAV loops are host-dispatch
# bound through the tunnel (observed >900 s solo on-chip against a ~23 ms
# dispatch floor) and must only start if the budget still allows.
ORDER = ["config1_nr14_flat", "config3_wls_se_118", "config2_dc_fdpf_118",
         "config5b_se_pegase", "config4_lav_baddata_118",
         "config5a_opf_pegase"]

RATIO_KEYS = [
    ("config1_nr14_flat", ("fleet_speedup",)),
    ("config2_dc_fdpf_118", ("dc_speedup",)),
    ("config3_wls_se_118", ("speedup",)),
    ("config4_lav_baddata_118", ("lnr_speedup",)),
    ("config5b_se_pegase", ("se_speedup",)),
]


def _emit(detail, partial):
    """Print the full result line (geomean over whatever has completed).
    Called after EVERY child with flush so a killed run still leaves the
    latest complete JSON line on stdout; the final call supersedes it."""
    ratios = []
    for name, keys in RATIO_KEYS:
        for k in keys:
            v = detail.get(name, {}).get(k)
            if v is not None:
                ratios.append(v)
    geomean = float(np.exp(np.mean(np.log(np.maximum(ratios, 1e-12))))) \
        if ratios else 0.0
    out = {
        "metric": "baseline_configs_speedup_geomean",
        "value": round(geomean, 3),
        "unit": "x vs sparse CPU oracle (CSC+splu, reference stack shape)",
        "vs_baseline": round(geomean, 3),
        "detail": detail,
    }
    if partial:
        out["partial"] = True
    print(json.dumps(out), flush=True)


def _select(order):
    only = os.environ.get("BENCH_ONLY")  # "1,3,5b" short codes or names
    if not only:
        return list(order), only
    sel = only.split(",")
    return [n for n in order
            if n in sel
            or n.split("_")[0].removeprefix("config") in sel], only


def _run_inline_child(names_csv):
    """Child: run the listed configs INLINE (one TPU-client/tunnel init),
    appending one JSON line per finished config to BENCH_OUT. Only
    children touch JAX/the chip; the parent supervises, streams results,
    and never stalls."""
    import jax

    out_path = os.environ["BENCH_OUT"]

    def emit(name, payload):
        with open(out_path, "a") as f:
            f.write(json.dumps({"name": name, **payload}) + "\n")
            f.flush()
            os.fsync(f.fileno())

    device = jax.devices()[0]
    on_tpu = device.platform not in ("cpu",)
    emit("_device", {"device": str(device)})
    fns = dict(CONFIGS)
    for name in names_csv.split(","):
        t0 = time.perf_counter()
        try:
            res = fns[name](on_tpu)
        except Exception as exc:
            res = {"error": f"{type(exc).__name__}: {str(exc)[:300]}"}
        res["config_wall_s"] = round(time.perf_counter() - t0, 1)
        emit(name, res)


# Per-config PROGRESS ceilings (seconds, warm-ish chip): if the child
# produces no result for the config it is on within this window, the
# config is declared STALLED — the axon tunnel has been observed to block
# a single device call INDEFINITELY (round-4 finding: a program that
# completes in 58 s hung >16 min, main thread futex-parked in a transfer;
# no in-process recovery exists). The parent then kills the child's whole
# process group and respawns a fresh child with the remaining configs;
# one retry per config when the budget allows.
PROGRESS_S = {
    "config1_nr14_flat": 280, "config3_wls_se_118": 180,
    "config2_dc_fdpf_118": 120, "config5b_se_pegase": 330,
    "config4_lav_baddata_118": 480, "config5a_opf_pegase": 2100,
}
INIT_S = 90          # extra allowance for the first config in a child
MAX_ATTEMPTS = 2


def main():
    """Supervisor (never imports JAX, so it can always flush): streams
    per-config results from inline children, kills a child group whose
    current config stalls, retries once, and prints a complete cumulative
    JSON line after every event. rc is 0 in every outcome; the final
    line is authoritative."""
    import signal
    import subprocess
    import sys
    import tempfile

    deadline = time.perf_counter() + BUDGET_S
    scale = 2.0 if FULL else 1.0
    detail = {}

    def flush(partial=True):
        _emit({"budget_s": BUDGET_S, "full": FULL, **detail}, partial)

    base = ORDER
    names, only = _select(base)
    if not names:
        detail["error"] = f"no configs selected (BENCH_ONLY={only!r})"
        flush(partial=False)
        return
    attempts = {n: 0 for n in names}
    pending = list(names)
    flush()  # a parseable line exists from the first moment

    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    while pending:
        remaining = deadline - time.perf_counter()
        if remaining < INIT_S + 45:
            for n in pending:
                detail.setdefault(n, {
                    "skipped": f"insufficient budget "
                               f"({remaining:.0f}s remaining)"})
            break
        out_path = tempfile.mktemp(suffix=".jsonl")
        env = dict(os.environ, BENCH_INLINE=",".join(pending),
                   BENCH_OUT=out_path)
        note(f"spawn child for {pending} ({remaining:.0f}s left)")
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            start_new_session=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        offset = 0
        current = pending[0]
        first_in_child = True
        t_cfg = time.perf_counter()
        stalled = False
        while True:
            time.sleep(1.0)
            # drain any newly completed results
            try:
                with open(out_path) as f:
                    f.seek(offset)
                    new = f.read()
                    offset = f.tell()
            except FileNotFoundError:
                new = ""
            for line in new.splitlines():
                if not line.strip():
                    continue
                rec = json.loads(line)
                nm = rec.pop("name")
                if nm == "_device":
                    detail["device"] = rec["device"]
                    continue
                detail[nm] = rec
                if nm in pending:
                    pending.remove(nm)
                flush(partial=bool(pending))
                current = pending[0] if pending else None
                first_in_child = False
                t_cfg = time.perf_counter()
            if proc.poll() is not None and not pending:
                break
            if proc.poll() is not None:
                # child died with configs outstanding: mark the one it
                # was on, keep the rest for a fresh child
                attempts[current] += 1
                detail[current] = {
                    "error": f"child exited rc={proc.returncode} "
                             f"mid-config (attempt {attempts[current]})"}
                if attempts[current] >= MAX_ATTEMPTS:
                    pending.remove(current)
                flush(partial=bool(pending))
                break
            if current is None:
                # all results are in; the child is only tearing down the
                # TPU client. That teardown can ALSO stall in the tunnel —
                # give it a short grace, then kill the group and move on
                # (never let a drained child block the final flush).
                teardown_over = time.perf_counter() - t_cfg > 60.0
                if teardown_over or time.perf_counter() > deadline:
                    note("child drained but won't exit; killing group")
                    try:
                        os.killpg(proc.pid, signal.SIGKILL)
                    except ProcessLookupError:
                        pass
                    proc.wait()
                    break
                continue
            allowed = PROGRESS_S[current] * scale \
                + (INIT_S if first_in_child else 0.0)
            over_cfg = time.perf_counter() - t_cfg > allowed
            over_all = time.perf_counter() > deadline
            if over_cfg or over_all:
                stalled = True
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                attempts[current] += 1
                why = "overall budget exhausted" if over_all else \
                    f"no progress in {allowed:.0f}s (tunnel stall?)"
                detail[current] = {
                    "error": f"stalled: {why} "
                             f"(attempt {attempts[current]})"}
                note(f"{current} stalled ({why}); killed child group")
                if attempts[current] >= MAX_ATTEMPTS or over_all:
                    pending.remove(current)
                flush(partial=bool(pending))
                break
        try:
            os.unlink(out_path)
        except OSError:
            pass
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
    flush(partial=False)


if __name__ == "__main__":
    if os.environ.get("BENCH_INLINE"):
        _run_inline_child(os.environ["BENCH_INLINE"])
    else:
        main()
