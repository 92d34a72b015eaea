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


@pytest.mark.parametrize("case", ["case14test", "case30test"])
@pytest.mark.parametrize("variant", ["BX", "XB"])
def test_reactive_limit_fast_decoupled(data_path, case, variant):
    from juliagrid_tpu.powerflow.fast_decoupled import (
        fast_newton_raphson_bx, fast_newton_raphson_xb)
    build = fast_newton_raphson_bx if variant == "BX" \
        else fast_newton_raphson_xb
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(data_path / "results.h5",
                     f"{case}/reactiveLimit/fastNewtonRaphson{variant}")

    analysis = build(system)
    power_flow(analysis, iteration=300)
    iteration = analysis.method.iteration

    with suppress():
        reactive_limit(analysis)

    analysis = build(system)
    power_flow(analysis, iteration=300)
    analysis.method.iteration += iteration

    adjust_angle(analysis, system.bus.label.label(0))
    assert_voltage(golden, analysis)


@pytest.mark.parametrize("case", ["case14test", "case30test"])
def test_reactive_limit_gauss_seidel(data_path, case):
    from juliagrid_tpu.powerflow.gauss_seidel import gauss_seidel
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(data_path / "results.h5",
                     f"{case}/reactiveLimit/gaussSeidel")

    analysis = gauss_seidel(system)
    power_flow(analysis, iteration=3000)
    iteration = analysis.method.iteration

    with suppress():
        reactive_limit(analysis)

    analysis = gauss_seidel(system)
    power_flow(analysis, iteration=3000)
    analysis.method.iteration += iteration

    adjust_angle(analysis, system.bus.label.label(0))
    assert_voltage(golden, analysis)
