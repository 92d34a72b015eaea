"""LAV estimation tests: zero-noise reproduction of power-flow state
(pattern of /root/reference/test/stateEstimation/analysis.jl LAV sections)."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.estimation.lav import (ac_lav_state_estimation,
                                          dc_lav_state_estimation,
                                          dc_lav_solve, lav_solve,
                                          pmu_lav_state_estimation,
                                          pmu_lav_solve)
from juliagrid_tpu.measurement.devices import (add_pmu, add_varmeter,
                                               add_voltmeter, add_wattmeter)
from juliagrid_tpu.measurement.load import measurement
from juliagrid_tpu.postprocessing.ac import current as ac_current
from juliagrid_tpu.postprocessing.ac import power as ac_power
from juliagrid_tpu.postprocessing.dc import power as dc_power
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.dc import dc_power_flow
from juliagrid_tpu.powerflow.driver import power_flow

pytestmark = pytest.mark.slow


def test_dc_lav_reproduces_pf(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    pf = dc_power_flow(system)
    power_flow(pf)
    dc_power(pf)
    monitoring = measurement(system)
    add_wattmeter(monitoring, analysis=pf)
    se = dc_lav_state_estimation(monitoring)
    dc_lav_solve(se)
    assert se.method.converged
    np.testing.assert_allclose(se.voltage.angle, pf.voltage.angle, atol=1e-6)


def test_pmu_lav_reproduces_pf(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    pf = newton_raphson(system)
    power_flow(pf)
    ac_current(pf)
    monitoring = measurement(system)
    add_pmu(monitoring, analysis=pf)
    se = pmu_lav_state_estimation(monitoring)
    pmu_lav_solve(se)
    assert se.method.converged
    np.testing.assert_allclose(se.voltage.magnitude, pf.voltage.magnitude,
                               atol=1e-6)
    np.testing.assert_allclose(se.voltage.angle, pf.voltage.angle,
                               atol=1e-6)


def test_ac_lav_reproduces_pf(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    pf = newton_raphson(system)
    power_flow(pf)
    ac_power(pf)
    ac_current(pf)
    monitoring = measurement(system)
    add_voltmeter(monitoring, analysis=pf)
    add_wattmeter(monitoring, analysis=pf)
    add_varmeter(monitoring, analysis=pf)
    se = ac_lav_state_estimation(monitoring)
    lav_solve(se)
    np.testing.assert_allclose(se.voltage.magnitude, pf.voltage.magnitude,
                               atol=1e-5)
    np.testing.assert_allclose(se.voltage.angle, pf.voltage.angle,
                               atol=1e-5)
