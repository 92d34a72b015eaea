"""Incremental ± nodal stamps: update_branch/update_bus must patch the
live CSR to exactly what a full reassembly produces (reference
acNodalUpdate!/acParameterUpdate!, model.jl:81-132; shunt delta,
bus.jl:222-240), at O(branch) cost."""

import time

import numpy as np

import juliagrid_tpu as jg
from juliagrid_tpu.system.builders import update_branch, update_bus
from juliagrid_tpu.system.model import ac_model, dc_model, model


def test_incremental_equals_rebuild(data_path):
    system = jg.power_system(str(data_path / "case118.m"))
    model(system, "both")

    update_branch(system, system.branch.label.label(5),
                  reactance=0.123, resistance=0.01)
    update_branch(system, system.branch.label.label(17), status=0)
    update_branch(system, system.branch.label.label(17), status=1)
    update_branch(system, system.branch.label.label(40),
                  shift_angle=0.05, turns_ratio=0.97)
    update_bus(system, system.bus.label.label(7),
               conductance=0.02, susceptance=-0.05)

    inc_ac = system.model.ac.nodal.toarray().copy()
    inc_dc = system.model.dc.nodal.toarray().copy()
    inc_shift = system.model.dc.shift_power.copy()
    inc_adm = np.asarray(system.model.ac.admittance).copy()

    ac_model(system)
    dc_model(system)
    np.testing.assert_allclose(inc_ac, system.model.ac.nodal.toarray(),
                               atol=1e-12)
    np.testing.assert_allclose(inc_dc, system.model.dc.nodal.toarray(),
                               atol=1e-12)
    np.testing.assert_allclose(inc_shift, system.model.dc.shift_power,
                               atol=1e-12)
    np.testing.assert_allclose(inc_adm,
                               np.asarray(system.model.ac.admittance),
                               atol=1e-12)


def test_incremental_is_o_branch(data_path):
    """The economics claim: at 10k buses a single-branch edit must be far
    cheaper than a full reassembly (soft 3x bound to stay robust on
    loaded CI hosts; measured ~15x)."""
    system = jg.power_system(str(data_path / "case_ACTIVSg10k.h5"))
    model(system, "both")
    label = system.branch.label.label(100)

    update_branch(system, label, reactance=0.05)  # warm any lazy state
    t0 = time.perf_counter()
    for k in range(20):
        update_branch(system, label, reactance=0.05 + 1e-6 * k)
    t_inc = (time.perf_counter() - t0) / 20

    t0 = time.perf_counter()
    ac_model(system)
    dc_model(system)
    t_full = time.perf_counter() - t0
    assert t_inc * 3 < t_full, (t_inc, t_full)


def test_incremental_preserves_solutions(data_path):
    """A PF solved after incremental edits matches one on a freshly
    parsed+edited system (end-to-end equivalence)."""
    from juliagrid_tpu.powerflow.ac import newton_raphson
    from juliagrid_tpu.powerflow.driver import power_flow

    sys_a = jg.power_system(str(data_path / "case14test.m"))
    model(sys_a, "both")            # build, then edit incrementally
    update_branch(sys_a, sys_a.branch.label.label(3), reactance=0.3)
    pf_a = newton_raphson(sys_a)
    power_flow(pf_a)

    sys_b = jg.power_system(str(data_path / "case14test.m"))
    update_branch(sys_b, sys_b.branch.label.label(3), reactance=0.3)
    pf_b = newton_raphson(sys_b)    # models built after the edit
    power_flow(pf_b)

    assert pf_a.method.converged and pf_b.method.converged
    assert pf_a.method.iteration == pf_b.method.iteration
    np.testing.assert_allclose(pf_a.voltage.magnitude,
                               pf_b.voltage.magnitude, atol=1e-12)
