"""External OPF anchors (reference carries Ipopt/HiGHS goldens for every
OPF variant, test/optimalPowerFlow/analysis.jl:9-12).

1. DC OPF at 118 buses against an INDEPENDENT LP solve: the linear
   program is assembled in this file from raw system data (branch
   reactance/tap/shift, demands, generator boxes, linear costs) and
   solved by scipy.optimize.linprog's HiGHS — sharing nothing with the
   framework's DC OPF spec except the .m parser.
2. AC OPF objective anchored at the MATPOWER-published optimum for
   case118 (129660.69 $/hr, MATPOWER 7.x runopf with MIPS/Ipopt —
   the same published operating point family as test_matpower_anchor).
"""

import numpy as np
import pytest

import juliagrid_tpu as jg


def _linear_costs(system, rng_seed=11):
    """Replace every generator's cost with a distinct linear curve so the
    DC OPF is an LP (and the dispatch is non-degenerate)."""
    rng = np.random.default_rng(rng_seed)
    g = system.generator.number
    c1 = 20.0 + 30.0 * rng.random(g)
    for i in range(g):
        jg.cost(system, system.generator.label.label(i), active=2,
                polynomial=[float(c1[i]), 5.0])
    return c1


def _independent_dc_lp(system, c1):
    """Assemble and solve the DC OPF LP from raw system data."""
    from scipy.optimize import linprog

    n = system.bus.number
    g = system.generator.number
    br = system.branch
    gen = system.generator
    bus = system.bus

    on_g = np.flatnonzero(gen.layout.status.array[:g] == 1)
    gidx = {int(i): k for k, i in enumerate(on_g)}
    nv = n + len(on_g)          # theta, pg(on)

    # bus balance: sum(flows out of i) - sum(pg at i) = -pd_i - gsh_i
    # with branch flow (f->t) = adm * (theta_f - theta_t - phi),
    # entering t with the same magnitude (lossless DC)
    a_eq = np.zeros((n, nv))
    b_eq = (-np.asarray(bus.demand.active.array[:n])
            - np.asarray(bus.shunt.conductance.array[:n]))
    for k in range(br.number):
        if br.layout.status[k] != 1:
            continue
        f, t = int(br.layout.from_bus[k]), int(br.layout.to_bus[k])
        x = float(br.parameter.reactance[k])
        tau = float(br.parameter.turns_ratio[k]) or 1.0
        phi = float(br.parameter.shift_angle[k])
        adm = 1.0 / (x * tau)
        # out of f: +adm*tf - adm*tt - adm*phi  (constant to RHS)
        a_eq[f, f] += adm
        a_eq[f, t] -= adm
        b_eq[f] += adm * phi
        # out of t: +adm*tt - adm*tf + adm*phi
        a_eq[t, t] += adm
        a_eq[t, f] -= adm
        b_eq[t] -= adm * phi
    for i in on_g:
        a_eq[int(gen.layout.bus[i]), n + gidx[int(i)]] = -1.0

    slack = bus.layout.slack
    bounds = [(None, None)] * n
    bounds[slack] = (float(bus.voltage.angle[slack]),
                     float(bus.voltage.angle[slack]))
    for i in on_g:
        lo = gen.capability.min_active[i]
        hi = gen.capability.max_active[i]
        bounds.append((float(lo) if np.isfinite(lo) else None,
                       float(hi) if np.isfinite(hi) else None))

    c = np.zeros(nv)
    for i in on_g:
        c[n + gidx[int(i)]] = c1[i]

    res = linprog(c, A_eq=a_eq, b_eq=b_eq, bounds=bounds, method="highs")
    assert res.status == 0, res.message
    return res


def test_dc_opf_118_vs_independent_lp(data_path):
    from juliagrid_tpu.opf.dcopf import dc_optimal_power_flow, solve

    system = jg.power_system(str(data_path / "case118.m"))
    c1 = _linear_costs(system)
    lp = _independent_dc_lp(system, c1)

    opf = dc_optimal_power_flow(system)
    solve(opf)
    assert opf.method.converged

    const_term = 5.0 * (system.generator.layout.status.array[
        :system.generator.number] == 1).sum()
    np.testing.assert_allclose(opf.method.objective,
                               lp.fun + const_term, rtol=1e-7)
    n = system.bus.number
    pg_lp = np.zeros(system.generator.number)
    on_g = np.flatnonzero(system.generator.layout.status.array[
        :system.generator.number] == 1)
    pg_lp[on_g] = lp.x[n:]
    np.testing.assert_allclose(opf.power.generator.active, pg_lp,
                               atol=2e-6)


@pytest.mark.slow
def test_ac_opf_118_matpower_objective(data_path):
    """MATPOWER-published case118 AC OPF optimum: 129660.69 $/hr
    (MATPOWER 7.x `runopf('case118')`, quadratic polynomial costs)."""
    from juliagrid_tpu.opf.acopf import ac_optimal_power_flow, solve

    system = jg.power_system(str(data_path / "case118.m"))
    opf = ac_optimal_power_flow(system)
    solve(opf)
    assert opf.method.result.status in ("optimal", "acceptable")
    np.testing.assert_allclose(opf.method.objective, 129660.69, rtol=2e-4)
