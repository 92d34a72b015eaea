"""Unit-system and template tests (reference @power/@voltage/@parameter/
@bus macro semantics)."""

import math

import numpy as np
import pytest

import juliagrid_tpu as jg


@pytest.fixture(autouse=True)
def reset_units():
    yield
    jg.default("all")


def test_si_power_inputs():
    jg.units.set_power("MW", "MVAr")
    system = jg.power_system()
    jg.add_bus(system, 1, type=3, base=138e3)
    jg.add_bus(system, 2, active=21.7, reactive=12.7, base=138e3)
    # base power 1e8 VA -> 21.7 MW = 0.217 pu
    assert abs(system.bus.demand.active[1] - 0.217) < 1e-12
    assert abs(system.bus.demand.reactive[1] - 0.127) < 1e-12


def test_voltage_units_deg_kv():
    jg.units.set_voltage("kV", "deg", base="kV")
    system = jg.power_system()
    jg.add_bus(system, 1, type=3, base=138.0, magnitude=82.065,
               angle=-5.0)
    # reference convention: V_pu = V_phase * sqrt(3) / V_base_LL
    # (topu with baseInv = sqrt(3)/base, utility.jl:331-344)
    expected = 82.065e3 * math.sqrt(3) / 138e3
    assert abs(system.bus.voltage.magnitude[0] - expected) < 1e-9
    assert abs(system.bus.voltage.angle[0] + 5.0 * math.pi / 180) < 1e-12
    assert abs(system.base.voltage.value[0] - 138e3) < 1e-6


def test_impedance_units():
    jg.units.set_parameter("ohm", "S")
    system = jg.power_system()
    jg.add_bus(system, 1, type=3, base=138e3)
    jg.add_bus(system, 2, base=138e3)
    # z_base = 138e3^2 / 1e8 = 190.44 ohm
    jg.add_branch(system, from_bus=1, to_bus=2, resistance=19.044,
                  reactance=38.088)
    assert abs(system.branch.parameter.resistance[0] - 0.1) < 1e-9
    assert abs(system.branch.parameter.reactance[0] - 0.2) < 1e-9


def test_templates_apply_and_reset():
    jg.set_template("bus", magnitude=1.05, type=2)
    system = jg.power_system()
    jg.add_bus(system, 1)
    assert abs(system.bus.voltage.magnitude[0] - 1.05) < 1e-12
    assert system.bus.layout.type[0] == 2
    jg.default("template")
    system2 = jg.power_system()
    jg.add_bus(system2, 1)
    assert abs(system2.bus.voltage.magnitude[0] - 1.0) < 1e-12


def test_si_template_values():
    jg.units.set_power("MW")
    jg.set_template("bus", active=50.0)   # 50 MW default demand
    jg.units.set_power("pu")              # change live units afterwards
    system = jg.power_system()
    jg.add_bus(system, 1, type=3, base=138e3)
    # template stored in SI must still convert against the base
    assert abs(system.bus.demand.active[0] - 0.5) < 1e-12


def test_status_randomization(data_path):
    from juliagrid_tpu.measurement.configuration import seed
    from juliagrid_tpu.measurement.devices import add_wattmeter
    from juliagrid_tpu.measurement.load import measurement
    from juliagrid_tpu.postprocessing.dc import power as dc_power
    from juliagrid_tpu.powerflow.dc import dc_power_flow
    from juliagrid_tpu.powerflow.driver import power_flow

    system = jg.power_system(str(data_path / "case14test.m"))
    pf = dc_power_flow(system)
    power_flow(pf)
    dc_power(pf)
    monitoring = jg.measurement(system)
    add_wattmeter(monitoring, analysis=pf)
    total = monitoring.wattmeter.number

    seed(1)
    jg.status_wattmeter(monitoring, inservice=12)
    assert int(monitoring.wattmeter.active.status.array[:total].sum()) == 12
    jg.status_wattmeter(monitoring, outservice=5)
    assert int(monitoring.wattmeter.active.status.array[:total].sum()) \
        == total - 5
    # redundancy = devices / (2 n - 1)
    jg.status_wattmeter(monitoring, redundancy=1.0)
    assert int(monitoring.wattmeter.active.status.array[:total].sum()) \
        == 2 * system.bus.number - 1
