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
    assert "Active Power Balance Dual" in out
    out = jg.print_generator_constraint(analysis, file=buf)
    assert "Generator Constraint" in out


def test_ac_constraint_tables_full_columns(data_path):
    """Reference print/constraint.jl column sets: Minimum/Solution/
    Maximum/Dual per quantity."""
    system = jg.power_system(str(data_path / "case14optimal.m"))
    opf = jg.ac_optimal_power_flow(system)
    power_flow(opf, power=True)
    buf = io.StringIO()
    out = jg.print_bus_constraint(opf, file=buf)
    for col in ("Voltage Magnitude Minimum", "Voltage Magnitude Solution",
                "Voltage Magnitude Maximum", "Voltage Magnitude Dual",
                "Active Power Balance Solution",
                "Active Power Balance Dual",
                "Reactive Power Balance Solution",
                "Reactive Power Balance Dual"):
        assert col in out, col
    out = jg.print_generator_constraint(opf, file=io.StringIO())
    for col in ("Active Power Minimum", "Active Power Solution",
                "Active Power Maximum", "Active Power Dual",
                "Reactive Power Solution"):
        assert col in out, col
    out = jg.print_branch_constraint(opf, file=io.StringIO())
    if len(opf._spec.fl_k):
        for col in ("Flow Minimum", "Flow Solution", "Flow Maximum",
                    "Flow Dual"):
            assert col in out, col


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
    assert "Maximum Active Mismatch" in out
    assert "EXIT: The solution was found" in out
    assert analysis.method.converged
    from .utils import h5group
    golden = h5group(data_path / "results.h5", "case14test/newtonRaphson")
    assert analysis.method.iteration == int(golden["iteration"][0])


def test_info_trees(data_path, capsys):
    """print/info.jl equivalents: per-element trees, units, templates."""
    from juliagrid_tpu.measurement.devices import add_pmu, add_voltmeter
    from juliagrid_tpu.measurement.load import measurement
    from juliagrid_tpu.report.info import (print_ammeter_unit,
                                           print_branch_template,
                                           print_branch_unit,
                                           print_bus_template,
                                           print_bus_unit,
                                           print_generator_template,
                                           print_generator_unit,
                                           print_monitoring, print_pmu_unit,
                                           print_pmu_template, print_system,
                                           print_varmeter_unit,
                                           print_voltmeter_template,
                                           print_wattmeter_unit)

    system = jg.power_system(str(data_path / "case14test.m"))
    print_system(system, bus=system.bus.label.label(0))
    out = capsys.readouterr().out
    assert "📁" in out and "Demand Power" in out and "Layout" in out
    assert "Type: slack" in out

    print_system(system, branch=system.branch.label.label(3))
    out = capsys.readouterr().out
    assert "Resistance" in out and "From-Bus" in out

    print_system(system, generator=system.generator.label.label(0))
    out = capsys.readouterr().out
    assert "Output Power" in out and "Active Power Cost" in out

    mon = measurement(system)
    add_voltmeter(mon, bus=system.bus.label.label(0), magnitude=1.05)
    add_pmu(mon, bus=system.bus.label.label(1), magnitude=1.0, angle=0.0,
            polar=True)
    print_monitoring(mon, voltmeter=1)
    assert "Voltage Magnitude Measurement" in capsys.readouterr().out
    print_monitoring(mon, pmu=1)
    out = capsys.readouterr().out
    assert "Voltage Angle Measurement" in out and "Polar: True" in out

    for fn in (print_bus_unit, print_branch_unit, print_generator_unit,
               print_wattmeter_unit, print_varmeter_unit, print_ammeter_unit,
               print_pmu_unit, print_bus_template, print_branch_template,
               print_generator_template, print_voltmeter_template,
               print_pmu_template):
        fn()
        assert "📁" in capsys.readouterr().out


def test_verbose_solver_tables(data_path, capsys):
    """print/solver.jl equivalents: statistics blocks, iteration tables,
    increment/residual summaries, EXIT lines."""
    from juliagrid_tpu.estimation.acse import gauss_newton, state_estimation
    from juliagrid_tpu.measurement.devices import (add_varmeter,
                                                   add_voltmeter,
                                                   add_wattmeter)
    from juliagrid_tpu.measurement.load import measurement
    from juliagrid_tpu.powerflow.dc import dc_power_flow, dc_solve

    system = jg.power_system(str(data_path / "case14test.m"))
    pf = newton_raphson(system)
    power_flow(pf, verbose=3)
    out = capsys.readouterr().out
    assert "Number of buses:" in out
    assert "Number of entries in the Jacobian:" in out
    assert "Maximum Active Mismatch" in out
    assert "Magnitude Increment:" in out
    assert "EXIT: The solution was found using the Newton-Raphson method" \
        in out

    dcpf = dc_power_flow(system)
    dc_solve(dcpf, verbose=2)
    out = capsys.readouterr().out
    assert "Number of entries in the nodal matrix:" in out
    assert "EXIT: The solution of the DC power flow was found." in out

    power_flow(pf, power=True)
    mon = measurement(system)
    add_voltmeter(mon, analysis=pf, noise=False)
    add_wattmeter(mon, analysis=pf, noise=False)
    add_varmeter(mon, analysis=pf, noise=False)
    se = gauss_newton(mon)
    state_estimation(se, verbose=3)
    out = capsys.readouterr().out
    assert "Number of wattmeters:" in out
    assert "Objective Value   Maximum Increment" in out
    assert "Absolute Residual:" in out
    assert "EXIT: The solution was found using the Gauss-Newton method" \
        in out
    assert se.method.converged

    # verbose solve must land on the same state as the compiled solve
    import numpy as np
    se2 = gauss_newton(mon)
    state_estimation(se2)
    np.testing.assert_allclose(se.voltage.magnitude, se2.voltage.magnitude,
                               atol=1e-12)


def test_print_format_contract(data_path):
    """Reference keyword contract (print/powerSystem.jl:1-52): per-column
    fmt/width/show dicts, repeat headers, style/delimiter, title, label."""
    import pytest

    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = newton_raphson(system)
    power_flow(analysis)
    ac_power(analysis)

    buf = io.StringIO()
    # per-column fmt (printf style like the reference) + width + show
    out = jg.print_bus_data(
        analysis, file=buf,
        fmt={"Voltage Magnitude": "%.2f"},
        width={"Voltage Angle": 25},
        show={"Power Demand Reactive": False})
    assert "Power Demand Reactive" not in out
    header = next(l for l in out.splitlines() if "Voltage Angle" in l)
    cell = [c for c in header.split("|") if "Voltage Angle" in c][0]
    assert len(cell) >= 27  # 25 + padding
    row = out.splitlines()[-2]
    vm_col = [c.strip() for c in row.split("|")][2]
    assert len(vm_col.split(".")[-1]) == 2  # %.2f applied

    # repeat headers
    out = jg.print_bus_data(analysis, file=buf, repeat=5)
    assert out.count("Voltage Magnitude") >= 3  # 14 rows / 5 per block

    # delimiter style off (reference style=false CSV-ish output)
    out = jg.print_bus_data(analysis, file=buf, style=False, delimiter=";")
    assert "+--" not in out and ";" in out

    # title override + header/footer suppression
    out = jg.print_bus_data(analysis, file=buf, title="Custom",
                            header=False)
    assert out.startswith("Custom") and "Voltage Magnitude" not in out

    # label filtering on data and meter printers
    out = jg.print_bus_data(analysis, file=buf,
                        label=system.bus.label.label(2))
    assert out.count("\n") < 10

    from juliagrid_tpu.measurement.devices import add_voltmeter
    from juliagrid_tpu.measurement.load import measurement
    monitoring = measurement(system)
    add_voltmeter(monitoring, analysis=analysis)
    out = jg.print_voltmeter_data(monitoring, file=buf,
                              label=monitoring.voltmeter.label.label(1),
                                  fmt={"Measurement Mean": "%.3f"})
    assert out.count("\n") < 10

    # unknown keywords are rejected, not silently dropped
    with pytest.raises(TypeError):
        jg.print_bus_data(analysis, file=buf, nonsense=1)
