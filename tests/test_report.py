"""Reporting smoke tests: tables render with sane content."""

import io

import juliagrid_tpu as jg
from juliagrid_tpu.postprocessing.ac import power as ac_power
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.driver import power_flow


def test_tables_render(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = newton_raphson(system)
    power_flow(analysis)
    ac_power(analysis)

    buf = io.StringIO()
    out = jg.print_bus_data(analysis, file=buf)
    assert "Bus Data" in out and "Voltage Magnitude" in out
    assert out.count("\n") > 14
    out = jg.print_branch_data(analysis, file=buf)
    assert "From-Bus" in out
    out = jg.print_generator_data(analysis, file=buf)
    assert "Power Output Active" in out
    out = jg.print_bus_summary(analysis, file=buf)
    assert "Minimum" in out

    from juliagrid_tpu.measurement.devices import add_wattmeter
    from juliagrid_tpu.measurement.load import measurement
    monitoring = measurement(system)
    add_wattmeter(monitoring, analysis=analysis)
    out = jg.print_wattmeter_data(monitoring, file=buf)
    assert "Wattmeter Data" in out


def test_constraint_tables(data_path):
    from juliagrid_tpu.opf.dcopf import dc_optimal_power_flow, solve
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = dc_optimal_power_flow(system)
    solve(analysis)
    buf = io.StringIO()
    out = jg.print_bus_constraint(analysis, file=buf)
    assert "Active Balance Dual" in out
    out = jg.print_generator_constraint(analysis, file=buf)
    assert "Generator Constraint" in out


def test_measurement_residual_column(data_path):
    from juliagrid_tpu.estimation.acse import gauss_newton, state_estimation
    from juliagrid_tpu.measurement.devices import (add_varmeter,
                                                   add_voltmeter,
                                                   add_wattmeter)
    from juliagrid_tpu.measurement.load import measurement

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

    buf = io.StringIO()
    out = jg.print_wattmeter_data(monitoring, analysis=se, file=buf)
    assert "Residual" in out


def test_verbose_iteration_log(data_path, capsys):
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = newton_raphson(system)
    power_flow(analysis, verbose=2)
    out = capsys.readouterr().out
    assert "iteration 0" in out
    assert "EXIT: The solution was found" in out
    assert analysis.method.converged
    from .utils import h5group
    golden = h5group(data_path / "results.h5", "case14test/newtonRaphson")
    assert analysis.method.iteration == int(golden["iteration"][0])
