"""I/O round-trip tests (pattern of /root/reference/test/powerSystem/
loadSave.jl and measurement/loadSave.jl): parse .m -> save .h5 -> reload ->
field equality; .h5 fixture compatibility; NR equivalence across formats."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.measurement.load import ems, measurement
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.driver import power_flow
from juliagrid_tpu.system.hdf5io import save_power_system


def test_h5_fixture_loads_and_solves(data_path):
    system = jg.power_system(str(data_path / "case14.h5"))
    assert system.bus.number == 14
    assert system.branch.number == 20
    assert system.generator.number == 5
    analysis = newton_raphson(system)
    power_flow(analysis)
    assert analysis.method.converged


def test_monitoring_h5_loads(data_path):
    system, monitoring = ems(str(data_path / "case14.h5"),
                             str(data_path / "monitoring.h5"))
    assert monitoring.voltmeter.number == 14
    assert monitoring.wattmeter.number == 54
    assert monitoring.pmu.number == 54
    # and a WLS SE runs on it
    from juliagrid_tpu.estimation.acse import gauss_newton, state_estimation
    se = gauss_newton(monitoring)
    state_estimation(se)
    assert se.method.converged


def test_roundtrip_m_h5(data_path, tmp_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    out = tmp_path / "case14test.h5"
    save_power_system(system, str(out))
    system2 = jg.power_system(str(out))

    n = system.bus.number
    np.testing.assert_allclose(system2.bus.demand.active.array,
                               system.bus.demand.active.array)
    np.testing.assert_allclose(system2.bus.voltage.magnitude.array,
                               system.bus.voltage.magnitude.array)
    np.testing.assert_array_equal(system2.branch.layout.from_bus.array,
                                  system.branch.layout.from_bus.array)
    np.testing.assert_allclose(system2.generator.output.active.array,
                               system.generator.output.active.array)
    assert system2.bus.layout.slack == system.bus.layout.slack
    for gi, poly in system.generator.cost.active.polynomial.items():
        np.testing.assert_allclose(
            system2.generator.cost.active.polynomial[gi], poly)
    for gi, pts in system.generator.cost.active.piecewise.items():
        np.testing.assert_allclose(
            system2.generator.cost.active.piecewise[gi], pts)

    a1 = newton_raphson(system)
    power_flow(a1)
    a2 = newton_raphson(system2)
    power_flow(a2)
    np.testing.assert_allclose(a2.voltage.magnitude, a1.voltage.magnitude,
                               atol=1e-12)
    assert a1.method.iteration == a2.method.iteration


def test_measurement_roundtrip(data_path, tmp_path):
    from juliagrid_tpu.measurement.hdf5io import save_measurement
    system, monitoring = ems(str(data_path / "case14.h5"),
                             str(data_path / "monitoring.h5"))
    out = tmp_path / "monitoring2.h5"
    save_measurement(monitoring, str(out))
    monitoring2 = measurement(system, str(out))
    np.testing.assert_allclose(
        monitoring2.wattmeter.active.mean.array,
        monitoring.wattmeter.active.mean.array)
    np.testing.assert_array_equal(
        monitoring2.pmu.layout.index.array,
        monitoring.pmu.layout.index.array)
    np.testing.assert_allclose(
        monitoring2.pmu.angle.variance.array,
        monitoring.pmu.angle.variance.array)


def test_psse_matches_matpower_fixture(data_path):
    """PSSE .raw vs .m parity (reference loadSave.jl pattern, atol 1e-6)."""
    raw = jg.power_system(str(data_path / "psse.raw"))
    mfile = jg.power_system(str(data_path / "psse.m"))
    assert raw.bus.number == mfile.bus.number
    assert raw.branch.number == mfile.branch.number
    assert raw.generator.number == mfile.generator.number
    np.testing.assert_allclose(raw.bus.demand.active.array,
                               mfile.bus.demand.active.array, atol=1e-6)
    np.testing.assert_allclose(raw.bus.shunt.susceptance.array,
                               mfile.bus.shunt.susceptance.array, atol=1e-6)
    np.testing.assert_allclose(raw.branch.parameter.reactance.array,
                               mfile.branch.parameter.reactance.array,
                               atol=1e-6)
    np.testing.assert_allclose(raw.branch.parameter.turns_ratio.array,
                               mfile.branch.parameter.turns_ratio.array,
                               atol=1e-6)
    np.testing.assert_array_equal(raw.branch.layout.status.array,
                                  mfile.branch.layout.status.array)
    np.testing.assert_array_equal(raw.branch.layout.from_bus.array,
                                  mfile.branch.layout.from_bus.array)
    np.testing.assert_allclose(raw.generator.output.active.array,
                               mfile.generator.output.active.array,
                               atol=1e-6)
