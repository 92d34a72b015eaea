"""Reactive-limit tests (pattern of /root/reference/test/powerFlow/
limits.jl): enforce limits, re-solve with accumulated iteration count,
adjust angles to the original slack, compare with golden data."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.driver import power_flow
from juliagrid_tpu.powerflow.limits import adjust_angle, reactive_limit
from juliagrid_tpu.report.log import suppress

from .utils import assert_voltage, h5group


@pytest.mark.parametrize("case", ["case14test", "case30test"])
def test_reactive_limit(data_path, case):
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(data_path / "results.h5",
                     f"{case}/reactiveLimit/newtonRaphson")

    analysis = newton_raphson(system)
    power_flow(analysis)
    iteration = analysis.method.iteration

    with suppress():
        reactive_limit(analysis)

    analysis = newton_raphson(system)
    power_flow(analysis)
    analysis.method.iteration += iteration

    adjust_angle(analysis, system.bus.label.label(0))
    assert_voltage(golden, analysis)
