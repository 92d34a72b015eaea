"""Update-equivalence tests (pattern of /root/reference/test/powerFlow/
reusing.jl and stateEstimation/reusing.jl): after live updates, the reused
analysis must converge to the same solution as a freshly built one."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.dc import dc_power_flow
from juliagrid_tpu.powerflow.driver import power_flow


def _assert_same_as_fresh(analysis, build):
    fresh = build(analysis.system)
    power_flow(analysis, iteration=100)
    power_flow(fresh, iteration=100)
    assert analysis.method.converged and fresh.method.converged
    np.testing.assert_allclose(analysis.voltage.angle, fresh.voltage.angle,
                               atol=1e-10)
    if hasattr(analysis.voltage, "magnitude"):
        np.testing.assert_allclose(analysis.voltage.magnitude,
                                   fresh.voltage.magnitude, atol=1e-10)


def test_reuse_after_demand_update(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = newton_raphson(system)
    power_flow(analysis)
    jg.update_bus(system, system.bus.label.label(3), active=0.3,
                  reactive=0.1)
    _assert_same_as_fresh(analysis, newton_raphson)


def test_reuse_after_shunt_update(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = newton_raphson(system)
    power_flow(analysis)
    jg.update_bus(system, system.bus.label.label(8), susceptance=0.25)
    _assert_same_as_fresh(analysis, newton_raphson)


def test_reuse_after_branch_status_flip(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = newton_raphson(system)
    power_flow(analysis)
    # pick an in-service branch whose removal keeps the network connected
    pick = None
    for k in range(system.branch.number):
        if system.branch.layout.status[k] != 1:
            continue
        system.branch.layout.status[k] = 0
        connected = len(jg.physical_island(system)) == 1
        system.branch.layout.status[k] = 1
        if connected:
            pick = k
            break
    assert pick is not None
    jg.update_branch(system, system.branch.label.label(pick), status=0)
    _assert_same_as_fresh(analysis, newton_raphson)
    jg.update_branch(system, system.branch.label.label(pick), status=1)
    _assert_same_as_fresh(analysis, newton_raphson)


def test_reuse_after_branch_parameter_update(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = newton_raphson(system)
    power_flow(analysis)
    jg.update_branch(system, system.branch.label.label(2), reactance=0.3)
    _assert_same_as_fresh(analysis, newton_raphson)


def test_reuse_after_generator_update(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = newton_raphson(system)
    power_flow(analysis)
    jg.update_generator(system, system.generator.label.label(1), active=0.5)
    _assert_same_as_fresh(analysis, newton_raphson)


def test_reuse_dc_after_updates(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = dc_power_flow(system)
    power_flow(analysis)
    jg.update_bus(system, system.bus.label.label(4), active=0.2)
    jg.update_branch(system, system.branch.label.label(7), status=0)
    fresh = dc_power_flow(system)
    power_flow(analysis)
    power_flow(fresh)
    np.testing.assert_allclose(analysis.voltage.angle, fresh.voltage.angle,
                               atol=1e-12)


def test_reuse_fast_decoupled_after_update(data_path):
    from juliagrid_tpu.powerflow.fast_decoupled import fast_newton_raphson_bx
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = fast_newton_raphson_bx(system)
    power_flow(analysis, iteration=40)
    jg.update_branch(system, system.branch.label.label(4), resistance=0.02)
    fresh = fast_newton_raphson_bx(system)
    power_flow(analysis, iteration=60)
    power_flow(fresh, iteration=60)
    np.testing.assert_allclose(analysis.voltage.magnitude,
                               fresh.voltage.magnitude, atol=1e-9)


def test_reuse_se_after_measurement_update(data_path):
    from juliagrid_tpu.estimation.acse import gauss_newton, state_estimation
    from juliagrid_tpu.measurement.devices import (add_varmeter,
                                                   add_voltmeter,
                                                   add_wattmeter,
                                                   update_wattmeter)
    from juliagrid_tpu.measurement.load import measurement
    from juliagrid_tpu.postprocessing.ac import power as ac_power

    system = jg.power_system(str(data_path / "case14test.m"))
    pf = newton_raphson(system)
    power_flow(pf)
    ac_power(pf)
    monitoring = measurement(system)
    add_voltmeter(monitoring, analysis=pf)
    add_wattmeter(monitoring, analysis=pf)
    add_varmeter(monitoring, analysis=pf)

    se = gauss_newton(monitoring)
    state_estimation(se)

    update_wattmeter(monitoring, monitoring.wattmeter.label.label(3),
                     active=0.55, variance=1e-3)
    fresh = gauss_newton(monitoring)
    state_estimation(se)
    state_estimation(fresh)
    np.testing.assert_allclose(se.voltage.magnitude,
                               fresh.voltage.magnitude, atol=1e-10)
    np.testing.assert_allclose(se.voltage.angle, fresh.voltage.angle,
                               atol=1e-10)


def test_reuse_opf_after_updates(data_path):
    from juliagrid_tpu.opf.dcopf import dc_optimal_power_flow, solve
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = dc_optimal_power_flow(system)
    solve(analysis)
    jg.update_bus(system, system.bus.label.label(2), active=0.3)
    fresh = dc_optimal_power_flow(system)
    solve(analysis)
    solve(fresh)
    np.testing.assert_allclose(analysis.power.generator.active,
                               fresh.power.generator.active, atol=1e-6)
    np.testing.assert_allclose(analysis.voltage.angle, fresh.voltage.angle,
                               atol=1e-6)
