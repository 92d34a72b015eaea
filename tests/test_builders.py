"""Builder-vs-parser equivalence (reference test/powerSystem/buildUpdate.jl
pattern): a system hand-built through add_* with the same data matches the
parsed one, through to identical power-flow solutions."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.driver import power_flow


def rebuild_via_builders(src):
    """Reconstruct a parsed system element-by-element with the builders."""
    system = jg.power_system()
    n = src.bus.number
    for i in range(n):
        jg.add_bus(system, src.bus.label.label(i),
                   type=int(src.bus.layout.type[i]),
                   active=float(src.bus.demand.active[i]),
                   reactive=float(src.bus.demand.reactive[i]),
                   conductance=float(src.bus.shunt.conductance[i]),
                   susceptance=float(src.bus.shunt.susceptance[i]),
                   magnitude=float(src.bus.voltage.magnitude[i]),
                   angle=float(src.bus.voltage.angle[i]),
                   min_magnitude=float(src.bus.voltage.min_magnitude[i]),
                   max_magnitude=float(src.bus.voltage.max_magnitude[i]),
                   base=float(src.base.voltage.value[i]),
                   area=int(src.bus.layout.area[i]),
                   loss_zone=int(src.bus.layout.loss_zone[i]))
    for k in range(src.branch.number):
        jg.add_branch(system,
                      from_bus=src.bus.label.label(
                          int(src.branch.layout.from_bus[k])),
                      to_bus=src.bus.label.label(
                          int(src.branch.layout.to_bus[k])),
                      resistance=float(src.branch.parameter.resistance[k]),
                      reactance=float(src.branch.parameter.reactance[k]),
                      conductance=float(src.branch.parameter.conductance[k]),
                      susceptance=float(src.branch.parameter.susceptance[k]),
                      turns_ratio=float(src.branch.parameter.turns_ratio[k]),
                      shift_angle=float(src.branch.parameter.shift_angle[k]),
                      status=int(src.branch.layout.status[k]))
    for g in range(src.generator.number):
        jg.add_generator(system,
                         bus=src.bus.label.label(
                             int(src.generator.layout.bus[g])),
                         active=float(src.generator.output.active[g]),
                         reactive=float(src.generator.output.reactive[g]),
                         magnitude=float(
                             src.generator.voltage.magnitude[g]),
                         min_reactive=float(
                             src.generator.capability.min_reactive[g]),
                         max_reactive=float(
                             src.generator.capability.max_reactive[g]),
                         status=int(src.generator.layout.status[g]))
    return system


def test_builder_equivalence_case14(data_path):
    src = jg.power_system(str(data_path / "case14test.m"))
    built = rebuild_via_builders(src)

    assert built.bus.number == src.bus.number
    assert built.branch.number == src.branch.number
    np.testing.assert_allclose(built.bus.supply.active.array,
                               src.bus.supply.active.array)
    assert built.bus.layout.slack == src.bus.layout.slack

    jg.ac_model(src)
    jg.ac_model(built)
    diff = abs(built.model.ac.nodal - src.model.ac.nodal)
    assert diff.max() < 1e-12

    a1 = newton_raphson(src)
    power_flow(a1)
    a2 = newton_raphson(built)
    power_flow(a2)
    assert a1.method.iteration == a2.method.iteration
    np.testing.assert_allclose(a2.voltage.magnitude, a1.voltage.magnitude,
                               atol=1e-12)


def test_update_branch_invalid_status_leaves_model_intact(data_path):
    """A raising update_branch (invalid status) must not corrupt the
    incrementally-stamped Y-bus/B matrices (advisor round-3 finding:
    the -stamp ran before validation)."""
    from juliagrid_tpu.utils.errors import DeviceStatusError

    system = jg.power_system(str(data_path / "case14test.m"))
    jg.ac_model(system)
    jg.dc_model(system)
    y0 = system.model.ac.nodal.toarray().copy()
    b0 = system.model.dc.nodal.toarray().copy()
    shift0 = system.model.dc.shift_power.copy()

    with pytest.raises((DeviceStatusError, ValueError)):
        jg.update_branch(system, system.branch.label.label(2), status=7)

    np.testing.assert_allclose(system.model.ac.nodal.toarray(), y0,
                               atol=1e-14)
    np.testing.assert_allclose(system.model.dc.nodal.toarray(), b0,
                               atol=1e-14)
    np.testing.assert_allclose(system.model.dc.shift_power, shift0,
                               atol=1e-14)

    # and a later NR solve matches a freshly loaded system exactly
    a1 = newton_raphson(system)
    power_flow(a1)
    fresh = jg.power_system(str(data_path / "case14test.m"))
    a2 = newton_raphson(fresh)
    power_flow(a2)
    assert a1.method.iteration == a2.method.iteration
    np.testing.assert_allclose(a1.voltage.magnitude, a2.voltage.magnitude,
                               atol=1e-12)


def test_update_branch_mid_mutation_failure_keeps_consistency(data_path):
    """If a conversion raises mid-mutation, the stamps are re-added from
    the current parameters: Y-bus == assembly(params) still holds."""
    system = jg.power_system(str(data_path / "case14test.m"))
    jg.ac_model(system)
    with pytest.raises((TypeError, ValueError)):
        jg.update_branch(system, system.branch.label.label(2),
                         resistance=0.05, shift_angle=object())
    # resistance landed, shift_angle didn't; Y-bus must equal the full
    # reassembly of the (partially mutated) host parameters
    from juliagrid_tpu.system.model import ac_model as full_ac
    patched = system.model.ac.nodal.toarray().copy()
    system.model.ac.nodal = None
    full_ac(system)
    np.testing.assert_allclose(patched, system.model.ac.nodal.toarray(),
                               atol=1e-12)
