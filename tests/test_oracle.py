"""Qualify the independent sparse CPU oracle against the shipped MATPOWER
goldens (tests/data/results.h5) — exact iteration-count parity and
voltages. Passing here is what licenses the oracle to generate the
scale-class goldens (results_large.h5, see benchmarks/make_goldens.py)."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.oracle import oracle_dc, oracle_fdpf, oracle_nr

from .utils import h5group


@pytest.mark.parametrize("case", ["case14test", "case30test"])
def test_oracle_nr_matches_matpower(case, data_path):
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(str(data_path / "results.h5"), f"{case}/newtonRaphson")
    res = oracle_nr(system)
    assert res.converged
    assert res.iterations == int(golden["iteration"][0])
    np.testing.assert_allclose(res.magnitude, golden["voltageMagnitude"],
                               atol=1e-12)
    np.testing.assert_allclose(res.angle, golden["voltageAngle"], atol=1e-12)


@pytest.mark.parametrize("case", ["case14test", "case30test"])
@pytest.mark.parametrize("bx,label", [(True, "fastNewtonRaphsonBX"),
                                      (False, "fastNewtonRaphsonXB")])
def test_oracle_fdpf_matches_matpower(case, bx, label, data_path):
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(str(data_path / "results.h5"), f"{case}/{label}")
    res = oracle_fdpf(system, bx=bx, iteration=1000)
    assert res.converged
    assert res.iterations == int(golden["iteration"][0])
    np.testing.assert_allclose(res.magnitude, golden["voltageMagnitude"],
                               atol=1e-9)
    np.testing.assert_allclose(res.angle, golden["voltageAngle"], atol=1e-9)


@pytest.mark.parametrize("case", ["case14test", "case30test"])
def test_oracle_dc_matches_matpower(case, data_path):
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(str(data_path / "results.h5"), f"{case}/dcPowerFlow")
    res = oracle_dc(system)
    np.testing.assert_allclose(res.angle, golden["voltage"], atol=1e-12)


def _scada_pmu_set(system, noise=False):
    """SCADA+PMU measurement set from a solved power flow (deterministic)."""
    from juliagrid_tpu.measurement.devices import (add_pmu, add_varmeter,
                                                   add_voltmeter,
                                                   add_wattmeter)
    from juliagrid_tpu.measurement.load import measurement
    from juliagrid_tpu.powerflow.ac import newton_raphson
    from juliagrid_tpu.powerflow.driver import power_flow

    pf = newton_raphson(system)
    power_flow(pf, power=True)
    mon = measurement(system)
    add_voltmeter(mon, analysis=pf, noise=noise)
    add_wattmeter(mon, analysis=pf, noise=noise)
    add_varmeter(mon, analysis=pf, noise=noise)
    for b in range(0, system.bus.number, 10):
        add_pmu(mon, bus=system.bus.label.label(b),
                magnitude=float(pf.voltage.magnitude[b]),
                angle=float(pf.voltage.angle[b]), polar=True, noise=noise)
    return mon


@pytest.mark.parametrize("case", ["case14test.m", "case118.m",
                                  "case1354pegase.h5"])
def test_oracle_wls_se_cross_check(case, data_path):
    """Framework GN WLS vs the independent sparse oracle: iteration parity
    and state agreement — a genuine two-implementation cross-check on the
    SCADA+PMU set (extends SE validation to BASELINE config-3 scale)."""
    from juliagrid_tpu.estimation.acse import gauss_newton, state_estimation
    from juliagrid_tpu.oracle import oracle_wls_se

    system = jg.power_system(str(data_path / case))
    mon = _scada_pmu_set(system)
    se = gauss_newton(mon)
    state_estimation(se)
    res = oracle_wls_se(system, mon)
    assert se.method.converged and res.converged
    assert se.method.iteration == res.iterations
    np.testing.assert_allclose(se.voltage.magnitude, res.magnitude,
                               atol=1e-10)
    np.testing.assert_allclose(se.voltage.angle, res.angle, atol=1e-10)
