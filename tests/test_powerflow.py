"""Power-flow oracle parity tests (pattern of
/root/reference/test/powerFlow/analysis.jl)."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.dc import dc_power_flow
from juliagrid_tpu.powerflow.driver import power_flow

from .utils import assert_dc_voltage, assert_voltage, h5group


@pytest.mark.parametrize("case", ["case14test", "case30test"])
def test_newton_raphson_matpower(data_path, case):
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(data_path / "results.h5", f"{case}/newtonRaphson")

    jg.ac_model(system)
    analysis = newton_raphson(system)
    power_flow(analysis)
    assert analysis.method.converged
    assert_voltage(golden, analysis)


@pytest.mark.parametrize("case", ["case14test", "case30test"])
def test_dc_power_flow_matpower(data_path, case):
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(data_path / "results.h5", f"{case}/dcPowerFlow")

    analysis = dc_power_flow(system)
    power_flow(analysis)
    assert_dc_voltage(golden, analysis)
