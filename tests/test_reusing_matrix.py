"""Parametrized reusing/live-edit equivalence matrix.

Mirrors the structure of the reference's reusing suites
(/root/reference/test/powerFlow/reusing.jl:1-449,
/root/reference/test/optimalPowerFlow/reusing.jl:1-353,
/root/reference/test/stateEstimation/reusing.jl:1-735): every live edit
applied to an already-solved analysis must re-solve to the SAME solution
as an analysis freshly built from the edited system — the signature/
revision protocol must never leave a stale device array behind.

The sweep crosses analysis families (NR, FD-BX, FD-XB, Gauss-Seidel, DC,
DC OPF, AC OPF, AC WLS SE, DC SE, PMU SE, AC LAV) with system edits
(demand, shunt, setpoint, branch parameter/tap, branch status both
directions, generator output/status both directions, add-branch,
add-generator, slack re-designation, cost models) and, for the
estimators, per-device measurement edits (value, variance, status both
directions, per device type).
"""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.dc import dc_power_flow
from juliagrid_tpu.powerflow.driver import power_flow
from juliagrid_tpu.powerflow.fast_decoupled import (fast_newton_raphson_bx,
                                                    fast_newton_raphson_xb)
from juliagrid_tpu.powerflow.gauss_seidel import gauss_seidel


# ---------------------------------------------------------------------------
# system edits (applied between the first and second solve)
# ---------------------------------------------------------------------------

def _blab(system, i):
    return system.bus.label.label(i)


def _removable_branch(system):
    """An in-service branch whose outage keeps the island connected."""
    for k in range(system.branch.number):
        if system.branch.layout.status[k] != 1:
            continue
        system.branch.layout.status[k] = 0
        connected = len(jg.physical_island(system)) == 1
        system.branch.layout.status[k] = 1
        if connected:
            return k
    raise AssertionError("no removable branch")


def e_demand(s):
    jg.update_bus(s, _blab(s, 3), active=0.28, reactive=0.09)


def e_shunt(s):
    jg.update_bus(s, _blab(s, 8), susceptance=0.22)


def e_setpoint(s):
    # PV setpoint magnitude (bus 2 of case14 is a generator bus)
    jg.update_bus(s, _blab(s, 1), magnitude=1.03)


def e_branch_param(s):
    jg.update_branch(s, s.branch.label.label(2), reactance=0.3,
                     resistance=0.02)


def e_branch_tap(s):
    jg.update_branch(s, s.branch.label.label(7), turns_ratio=1.04,
                     shift_angle=0.015)


def e_branch_off(s):
    k = _removable_branch(s)
    jg.update_branch(s, s.branch.label.label(k), status=0)


def e_branch_off_on(s):
    k = _removable_branch(s)
    lab = s.branch.label.label(k)
    jg.update_branch(s, lab, status=0)
    jg.update_branch(s, lab, status=1)


def e_gen_output(s):
    jg.update_generator(s, s.generator.label.label(1), active=0.42,
                        reactive=0.12)


def _nonslack_gen(s):
    """A generator NOT at the slack bus whose bus hosts only that one."""
    slack = s.bus.layout.slack
    for k in range(s.generator.number):
        if int(s.generator.layout.bus[k]) != slack \
                and s.generator.layout.status[k] == 1:
            return k
    raise AssertionError("no non-slack generator")


def e_gen_off(s):
    k = _nonslack_gen(s)
    jg.update_generator(s, s.generator.label.label(k), status=0)


def e_gen_off_on(s):
    k = _nonslack_gen(s)
    lab = s.generator.label.label(k)
    jg.update_generator(s, lab, status=0)
    jg.update_generator(s, lab, status=1)


def e_add_branch(s):
    jg.add_branch(s, from_bus=_blab(s, 2), to_bus=_blab(s, 7),
                  reactance=0.35, resistance=0.01)


def e_add_generator(s):
    jg.add_generator(s, bus=_blab(s, 4), active=0.15, reactive=0.02,
                     max_active=0.8, min_active=0.0, max_reactive=0.4,
                     min_reactive=-0.4, magnitude=1.02, status=1)


def e_slack_move(s):
    # re-designate the slack onto generator bus 2 (the old slack demotes)
    jg.update_bus(s, _blab(s, 1), type=3)


SYSTEM_EDITS = {
    "demand": e_demand,
    "shunt": e_shunt,
    "setpoint": e_setpoint,
    "branch_param": e_branch_param,
    "branch_tap": e_branch_tap,
    "branch_off": e_branch_off,
    "branch_off_on": e_branch_off_on,
    "gen_output": e_gen_output,
    "gen_off": e_gen_off,
    "gen_off_on": e_gen_off_on,
    "add_branch": e_add_branch,
    "add_generator": e_add_generator,
    "slack_move": e_slack_move,
}


# ---------------------------------------------------------------------------
# power-flow families
# ---------------------------------------------------------------------------

PF_FAMILIES = {
    "nr": (newton_raphson, 100, 1e-9),
    "fnr_bx": (fast_newton_raphson_bx, 300, 1e-8),
    "fnr_xb": (fast_newton_raphson_xb, 300, 1e-8),
    "gs": (gauss_seidel, 3000, 1e-6),
    "dc": (dc_power_flow, 100, 1e-12),
}

# the full 13-edit sweep runs on NR and DC; the other iterative families
# cover the structurally distinct subset (matrix pattern, slack, shapes)
_PF_EDITS = {
    "nr": list(SYSTEM_EDITS),
    "dc": list(SYSTEM_EDITS),
    "fnr_bx": ["demand", "branch_param", "branch_off", "add_branch",
               "slack_move", "gen_off"],
    "fnr_xb": ["demand", "branch_tap", "branch_off_on", "add_generator",
               "slack_move", "setpoint"],
    "gs": ["demand", "branch_off", "add_branch", "slack_move"],
}

PF_CASES = [(fam, edit) for fam in PF_FAMILIES for edit in _PF_EDITS[fam]]


@pytest.mark.parametrize("family,edit", PF_CASES,
                         ids=[f"{f}-{e}" for f, e in PF_CASES])
def test_pf_reuse_matches_fresh(data_path, family, edit):
    build, iteration, atol = PF_FAMILIES[family]
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = build(system)
    power_flow(analysis, iteration=iteration)
    assert analysis.method.converged

    SYSTEM_EDITS[edit](system)

    fresh = build(system)
    power_flow(analysis, iteration=iteration)
    power_flow(fresh, iteration=iteration)
    assert analysis.method.converged and fresh.method.converged
    np.testing.assert_allclose(analysis.voltage.angle, fresh.voltage.angle,
                               atol=atol)
    if hasattr(fresh.voltage, "magnitude") and \
            fresh.voltage.magnitude is not None:
        np.testing.assert_allclose(analysis.voltage.magnitude,
                                   fresh.voltage.magnitude, atol=atol)


# ---------------------------------------------------------------------------
# OPF families
# ---------------------------------------------------------------------------

def e_cost_poly(s):
    jg.cost(s, s.generator.label.label(1), active=2,
            polynomial=[820.0, 22.0, 0.008])


def e_cost_piecewise(s):
    jg.cost(s, s.generator.label.label(1), active=1,
            piecewise=[[0.0, 2.0], [0.4, 14.0], [0.9, 40.0]])


def e_gen_limits(s):
    jg.update_generator(s, s.generator.label.label(1), max_active=0.6,
                        min_active=0.05)


def e_add_generator_cost(s):
    k = jg.add_generator(s, bus=_blab(s, 4), active=0.1, max_active=0.7,
                         min_active=0.0, max_reactive=0.3,
                         min_reactive=-0.3, status=1)
    jg.cost(s, s.generator.label.label(k), active=2,
            polynomial=[100.0, 30.0, 0.02])


OPF_EDITS = {
    "demand": e_demand,
    "branch_param": e_branch_param,
    "branch_off": e_branch_off,
    "add_branch": e_add_branch,
    "add_generator": e_add_generator_cost,
    "gen_limits": e_gen_limits,
    "cost_poly": e_cost_poly,
    "cost_piecewise": e_cost_piecewise,
    "gen_off": e_gen_off,
}


@pytest.mark.parametrize("edit", list(OPF_EDITS))
def test_dc_opf_reuse_matches_fresh(data_path, edit):
    from juliagrid_tpu.opf.dcopf import dc_optimal_power_flow, solve
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = dc_optimal_power_flow(system)
    solve(analysis)
    assert analysis.method.converged

    OPF_EDITS[edit](system)

    fresh = dc_optimal_power_flow(system)
    solve(analysis)
    solve(fresh)
    assert analysis.method.converged and fresh.method.converged
    np.testing.assert_allclose(analysis.method.objective,
                               fresh.method.objective,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(analysis.voltage.angle, fresh.voltage.angle,
                               atol=1e-5)


_AC_OPF_EDITS = ["demand", "gen_limits", "cost_poly", "cost_piecewise",
                 "branch_off", "add_generator", "add_branch"]


@pytest.mark.slow
@pytest.mark.parametrize("edit", _AC_OPF_EDITS)
def test_ac_opf_reuse_matches_fresh(data_path, edit):
    from juliagrid_tpu.opf.acopf import ac_optimal_power_flow, solve
    system = jg.power_system(str(data_path / "case14optimal.m"))
    analysis = ac_optimal_power_flow(system)
    solve(analysis)
    assert analysis.method.converged

    OPF_EDITS[edit](system)

    fresh = ac_optimal_power_flow(system)
    solve(analysis)
    solve(fresh)
    ok = ("optimal", "acceptable")
    assert analysis.method.result.status in ok
    assert fresh.method.result.status in ok
    np.testing.assert_allclose(analysis.method.objective,
                               fresh.method.objective, rtol=1e-5)


# ---------------------------------------------------------------------------
# estimator families: system edits + per-device measurement edits
# ---------------------------------------------------------------------------

def _monitored(data_path, pmu_every=4):
    from juliagrid_tpu.measurement.devices import (add_pmu, add_varmeter,
                                                   add_voltmeter,
                                                   add_wattmeter)
    from juliagrid_tpu.measurement.load import measurement
    from juliagrid_tpu.postprocessing.ac import power as ac_power

    system = jg.power_system(str(data_path / "case14test.m"))
    pf = newton_raphson(system)
    power_flow(pf)
    ac_power(pf)
    mon = measurement(system)
    add_voltmeter(mon, analysis=pf, noise=False)
    add_wattmeter(mon, analysis=pf, noise=False)
    add_varmeter(mon, analysis=pf, noise=False)
    for b in range(0, system.bus.number, pmu_every):
        add_pmu(mon, bus=system.bus.label.label(b),
                magnitude=float(pf.voltage.magnitude[b]),
                angle=float(pf.voltage.angle[b]), polar=True, noise=False)
    return system, mon


def m_watt_value(mon):
    from juliagrid_tpu.measurement.devices import update_wattmeter
    update_wattmeter(mon, mon.wattmeter.label.label(2), active=0.31)


def m_watt_variance(mon):
    from juliagrid_tpu.measurement.devices import update_wattmeter
    update_wattmeter(mon, mon.wattmeter.label.label(2), variance=4e-3)


def m_watt_off(mon):
    from juliagrid_tpu.measurement.devices import update_wattmeter
    update_wattmeter(mon, mon.wattmeter.label.label(5), status=0)


def m_watt_off_on(mon):
    from juliagrid_tpu.measurement.devices import update_wattmeter
    lab = mon.wattmeter.label.label(5)
    update_wattmeter(mon, lab, status=0)
    update_wattmeter(mon, lab, status=1)


def m_var_off(mon):
    from juliagrid_tpu.measurement.devices import update_varmeter
    update_varmeter(mon, mon.varmeter.label.label(4), status=0)


def m_volt_value(mon):
    from juliagrid_tpu.measurement.devices import update_voltmeter
    update_voltmeter(mon, mon.voltmeter.label.label(3), magnitude=1.01,
                     variance=2e-3)


def m_pmu_value(mon):
    from juliagrid_tpu.measurement.devices import update_pmu
    update_pmu(mon, mon.pmu.label.label(1), magnitude=1.02, angle=-0.06)


def m_pmu_off(mon):
    from juliagrid_tpu.measurement.devices import update_pmu
    update_pmu(mon, mon.pmu.label.label(2), status=0)


def m_pmu_off_on(mon):
    from juliagrid_tpu.measurement.devices import update_pmu
    lab = mon.pmu.label.label(2)
    update_pmu(mon, lab, status=0)
    update_pmu(mon, lab, status=1)


def m_add_wattmeter(mon):
    from juliagrid_tpu.measurement.devices import add_wattmeter
    s = mon.system
    add_wattmeter(mon, bus=s.bus.label.label(6), active=0.0,
                  variance=1e-2, noise=False)


MEAS_EDITS = {
    "watt_value": m_watt_value,
    "watt_variance": m_watt_variance,
    "watt_off": m_watt_off,
    "watt_off_on": m_watt_off_on,
    "var_off": m_var_off,
    "volt_value": m_volt_value,
    "pmu_value": m_pmu_value,
    "pmu_off": m_pmu_off,
    "pmu_off_on": m_pmu_off_on,
    "add_wattmeter": m_add_wattmeter,
}

_SE_SYS_EDITS = ["branch_off", "branch_off_on", "slack_move", "add_branch",
                 "add_generator"]


def _solve_pair(mon, build, atol):
    from juliagrid_tpu.estimation.acse import state_estimation
    live = build(mon)
    state_estimation(live)
    return live


@pytest.mark.parametrize("edit", list(MEAS_EDITS) + _SE_SYS_EDITS)
def test_wls_se_reuse_matches_fresh(data_path, edit):
    from juliagrid_tpu.estimation.acse import gauss_newton, state_estimation
    system, mon = _monitored(data_path)
    live = gauss_newton(mon)
    state_estimation(live)
    assert live.method.converged

    if edit in MEAS_EDITS:
        MEAS_EDITS[edit](mon)
    else:
        SYSTEM_EDITS[edit](system)

    fresh = gauss_newton(mon)
    state_estimation(live)
    state_estimation(fresh)
    assert live.method.converged and fresh.method.converged
    np.testing.assert_allclose(live.voltage.magnitude,
                               fresh.voltage.magnitude, atol=1e-9)
    np.testing.assert_allclose(live.voltage.angle, fresh.voltage.angle,
                               atol=1e-9)


_DC_SE_EDITS = ["watt_value", "watt_variance", "watt_off", "watt_off_on",
                "add_wattmeter", "branch_off", "slack_move"]


@pytest.mark.parametrize("edit", _DC_SE_EDITS)
def test_dc_se_reuse_matches_fresh(data_path, edit):
    from juliagrid_tpu.estimation.acse import state_estimation
    from juliagrid_tpu.estimation.dcse import dc_state_estimation
    system, mon = _monitored(data_path)
    live = dc_state_estimation(mon)
    state_estimation(live)

    if edit in MEAS_EDITS:
        MEAS_EDITS[edit](mon)
    else:
        SYSTEM_EDITS[edit](system)

    fresh = dc_state_estimation(mon)
    state_estimation(live)
    state_estimation(fresh)
    np.testing.assert_allclose(live.voltage.angle, fresh.voltage.angle,
                               atol=1e-10)


_PMU_SE_EDITS = ["pmu_value", "pmu_off", "pmu_off_on", "branch_off",
                 "slack_move"]


@pytest.mark.parametrize("edit", _PMU_SE_EDITS)
def test_pmu_se_reuse_matches_fresh(data_path, edit):
    from juliagrid_tpu.estimation.acse import state_estimation
    from juliagrid_tpu.estimation.pmuse import pmu_state_estimation
    system, mon = _monitored(data_path, pmu_every=1)
    live = pmu_state_estimation(mon)
    state_estimation(live)

    if edit in MEAS_EDITS:
        MEAS_EDITS[edit](mon)
    else:
        SYSTEM_EDITS[edit](system)

    fresh = pmu_state_estimation(mon)
    state_estimation(live)
    state_estimation(fresh)
    np.testing.assert_allclose(live.voltage.magnitude,
                               fresh.voltage.magnitude, atol=1e-9)
    np.testing.assert_allclose(live.voltage.angle, fresh.voltage.angle,
                               atol=1e-9)


_LAV_EDITS = ["watt_value", "watt_off", "branch_off"]


@pytest.mark.slow
@pytest.mark.parametrize("edit", _LAV_EDITS)
def test_lav_se_reuse_matches_fresh(data_path, edit):
    from juliagrid_tpu.estimation.acse import state_estimation
    from juliagrid_tpu.estimation.lav import ac_lav_state_estimation
    system, mon = _monitored(data_path)
    live = ac_lav_state_estimation(mon)
    state_estimation(live)

    if edit in MEAS_EDITS:
        MEAS_EDITS[edit](mon)
    else:
        SYSTEM_EDITS[edit](system)

    fresh = ac_lav_state_estimation(mon)
    state_estimation(live)
    state_estimation(fresh)
    np.testing.assert_allclose(live.voltage.magnitude,
                               fresh.voltage.magnitude, atol=5e-6)
    np.testing.assert_allclose(live.voltage.angle, fresh.voltage.angle,
                               atol=5e-6)
