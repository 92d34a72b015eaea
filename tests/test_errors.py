"""Typed error surface — the reference's rich error contract
(backend/utility.jl:589-893) as catchable exception classes that remain
compatible with the built-ins historically raised."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.utils.errors import (CostError, DeviceStatusError,
                                        JuliaGridError, LabelError,
                                        MethodError_, MissingDataError,
                                        SlackBusError, StatusCountError,
                                        VarianceError)


def test_label_errors(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    with pytest.raises(LabelError, match="does not exist"):
        system.bus.label.index("no-such-bus")
    # back-compat: callers catching KeyError keep working
    with pytest.raises(KeyError):
        system.bus.label.index("no-such-bus")
    assert issubclass(LabelError, JuliaGridError)


def test_slack_missing(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    system.bus.layout.slack = -1
    with pytest.raises(SlackBusError, match="slack bus is missing"):
        system.check_slack()
    with pytest.raises(ValueError):  # back-compat
        system.check_slack()


def test_cost_errors(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    g0 = system.generator.label.label(0)
    with pytest.raises(CostError, match="cost model"):
        jg.cost(system, g0, active=3, polynomial=[1.0, 1.0])
    with pytest.raises(CostError, match="matrix"):
        jg.cost(system, g0, active=1, piecewise=[1.0, 2.0, 3.0])


def test_variance_and_status_errors(data_path):
    from juliagrid_tpu.measurement.devices import add_voltmeter
    from juliagrid_tpu.measurement.load import measurement

    system = jg.power_system(str(data_path / "case14test.m"))
    mon = measurement(system)
    with pytest.raises(VarianceError):
        add_voltmeter(mon, bus=system.bus.label.label(0), magnitude=1.0,
                      variance=0.0)
    with pytest.raises(DeviceStatusError):
        add_voltmeter(mon, bus=system.bus.label.label(0), magnitude=1.0,
                      status=7)


def test_status_count_error(data_path):
    """Reference errorStatusDevice: requesting more devices than exist."""
    from juliagrid_tpu.measurement.configuration import status_voltmeter
    from juliagrid_tpu.measurement.devices import add_voltmeter
    from juliagrid_tpu.measurement.load import measurement

    system = jg.power_system(str(data_path / "case14test.m"))
    mon = measurement(system)
    add_voltmeter(mon, bus=system.bus.label.label(0), magnitude=1.0)
    with pytest.raises(StatusCountError, match="less than the requested"):
        status_voltmeter(mon, inservice=5)


def test_missing_data_error(tmp_path):
    bad = tmp_path / "empty.m"
    bad.write_text("function mpc = empty\nmpc.baseMVA = 100;\n")
    with pytest.raises(MissingDataError, match="bus data is missing"):
        jg.power_system(str(bad))


def test_correlated_guard_is_typed(data_path):
    from juliagrid_tpu.estimation.acse import gauss_newton
    from juliagrid_tpu.measurement.devices import add_pmu, add_voltmeter
    from juliagrid_tpu.measurement.load import measurement
    from juliagrid_tpu.powerflow.ac import newton_raphson
    from juliagrid_tpu.powerflow.driver import power_flow

    system = jg.power_system(str(data_path / "case14test.m"))
    pf = newton_raphson(system)
    power_flow(pf)
    mon = measurement(system)
    add_voltmeter(mon, analysis=pf, noise=False)
    add_pmu(mon, bus=system.bus.label.label(0), magnitude=1.0, angle=0.0,
            polar=False, correlated=True)
    with pytest.raises(MethodError_, match="non-diagonal precision"):
        gauss_newton(mon, factorization="QR")
