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
