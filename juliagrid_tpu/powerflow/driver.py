"""Power-flow drivers (reference powerFlow!, acPowerFlow.jl:1389-1433 and
dcPowerFlow.jl:159-178).

For the iterative AC methods the whole mismatch/solve loop runs on device as
one compiled ``lax.while_loop`` program; the host only reads back the final
state and iteration count. Iteration semantics match the reference exactly:
the count equals the number of linear solves performed, and convergence is
judged on the freshly recomputed mismatches.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import config
from ..report.solver import (print_exit, print_increments_pf,
                             print_middle_pf, print_solver_pf, print_top)
from .ac import AcPowerFlow, _nr_solve


def power_flow(analysis, iteration: int = 20, tolerance: float = 1e-8,
               power: bool = False, current: bool = False,
               verbose: int | None = None):
    """Solve an analysis to convergence. Dispatches on the analysis type."""
    from .dc import DcPowerFlow, dc_solve
    from ..opf.acopf import AcOptimalPowerFlow
    from ..opf.dcopf import DcOptimalPowerFlow
    if isinstance(analysis, (AcOptimalPowerFlow, DcOptimalPowerFlow)):
        # reference powerFlow! also wraps OPF analyses
        from ..opf import solve_opf
        solve_opf(analysis, verbose=verbose or 0)
        if power and isinstance(analysis, AcOptimalPowerFlow):
            from ..postprocessing.ac import power as ac_power
            ac_power(analysis)
        elif power:
            from ..postprocessing.dc import power as dc_power
            dc_power(analysis)
        if current and isinstance(analysis, AcOptimalPowerFlow):
            from ..postprocessing.ac import current as ac_current
            ac_current(analysis)
        return analysis
    if isinstance(analysis, DcPowerFlow):
        dc_solve(analysis, verbose=verbose)
        if power:
            from ..postprocessing.dc import power as dc_power
            dc_power(analysis)
        return analysis

    verbose = config.verbose if verbose is None else verbose
    from ..utils.profiling import Timings, default_timings
    method = analysis.method
    if getattr(method, "timings", None) is None:
        method.timings = Timings()
    with method.timings.span("refresh"), default_timings.span("pf.refresh"):
        analysis._refresh_arrays()
    method.iteration = 0

    if verbose >= 2:
        # reference-style statistics + per-iteration log (print/solver.jl):
        # run the stepwise host loop so each mismatch can be reported
        from .ac import mismatch as _mismatch_step
        from .ac import solve as _solve_step
        print_top(analysis.system, analysis, verbose)
        print_middle_pf(analysis.system, analysis, verbose)
        converged = False
        dmag = dang = None
        for _ in range(iteration + 1):
            del_p, del_q = _mismatch_step(analysis)
            print_solver_pf(method.iteration, del_p, del_q, verbose)
            if del_p < tolerance and del_q < tolerance:
                converged = True
                break
            if method.iteration == iteration:
                break
            vm_prev = np.asarray(analysis.voltage.magnitude).copy()
            va_prev = np.asarray(analysis.voltage.angle).copy()
            _solve_step(analysis)
            dmag = np.abs(np.asarray(analysis.voltage.magnitude) - vm_prev)
            dang = np.abs(np.asarray(analysis.voltage.angle) - va_prev)
        if dmag is not None and method.name != "gauss_seidel":
            print_increments_pf((float(dmag.min()), float(dmag.max())),
                                (float(dang.min()), float(dang.max())),
                                verbose)
        method.converged = converged
        print_exit(method.name, converged, not converged,
                   method.iteration, verbose)
        if power:
            from ..postprocessing.ac import power as ac_power
            ac_power(analysis)
        if current:
            from ..postprocessing.ac import current as ac_current
            ac_current(analysis)
        return analysis

    vm = jnp.asarray(analysis.voltage.magnitude)
    va = jnp.asarray(analysis.voltage.angle)

    with method.timings.span("solve"), default_timings.span("pf.solve"):
        if method.name == "newton_raphson":
            vm, va, it, del_p, del_q, converged = _nr_solve(
                analysis.arrays, vm, va, tolerance, iteration,
                method.factorization)
        elif method.name in ("fast_newton_raphson_bx",
                             "fast_newton_raphson_xb"):
            from .fast_decoupled import _fnr_solve
            vm, va, it, del_p, del_q, converged = _fnr_solve(
                analysis.arrays, vm, va, tolerance, iteration,
                method.factorization)
        elif method.name == "gauss_seidel":
            from .gauss_seidel import _gs_solve
            vm, va, it, del_p, del_q, converged = _gs_solve(
                analysis.arrays, vm, va, tolerance, iteration)
        else:
            raise ValueError(f"unknown method {method.name}")

        # the host readbacks below block on the device loop, so the span
        # measures the full solve, not just the dispatch
        analysis.voltage.magnitude = np.asarray(vm)
        analysis.voltage.angle = np.asarray(va)
    method.iteration = int(it)
    method.converged = bool(converged)
    method.max_mismatch_active = float(del_p)
    method.max_mismatch_reactive = float(del_q)

    if verbose:
        print_exit(method.name, method.converged, not method.converged,
                   method.iteration, verbose)

    if power:
        from ..postprocessing.ac import power as ac_power
        ac_power(analysis)
    if current:
        from ..postprocessing.ac import current as ac_current
        ac_current(analysis)
    return analysis
