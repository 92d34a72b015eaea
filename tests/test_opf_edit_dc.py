"""Live-edit parity for the DC OPF model — the DC mirror of
test_opf_edit.py (the reference dispatches fix!/unfix!/remove!/setBound!
and dual transfer over both AC and DC JuMP models,
optimalPowerFlow/utility.jl:525-700).

Each test edits a *live* solved DC model through opf.edit and checks the
re-solve against a freshly built model on the same system state.
"""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.opf import (fix, remove_constraint, set_bound, unfix,
                               update_cost, update_demand)
from juliagrid_tpu.opf.dcopf import dc_optimal_power_flow
from juliagrid_tpu.opf.dcopf import solve as dc_solve

pytestmark = pytest.mark.slow


def _solved(data_path, case="case14optimal.m"):
    system = jg.power_system(str(data_path / case))
    analysis = dc_optimal_power_flow(system)
    dc_solve(analysis)
    assert analysis.method.converged
    return system, analysis


def _obj_close(a, b, rel=1e-6):
    assert abs(a - b) <= rel * max(1.0, abs(a), abs(b)), (a, b)


def _fresh(system):
    fresh = dc_optimal_power_flow(system)
    dc_solve(fresh)
    assert fresh.method.converged
    return fresh


def test_set_bound_matches_fresh(data_path):
    system, analysis = _solved(data_path)
    spec = analysis._spec
    g = int(np.argmax(analysis.power.generator.active))
    new_max = float(analysis.power.generator.active[g]) - 0.05
    set_bound(analysis, variable="active",
              label=system.generator.label.label(g), max=new_max)
    assert analysis._spec is spec                      # no rebuild
    dc_solve(analysis)
    assert analysis.method.converged
    fresh = _fresh(system)
    _obj_close(analysis.method.objective, fresh.method.objective)
    np.testing.assert_allclose(analysis.power.generator.active,
                               fresh.power.generator.active, atol=1e-5)
    assert analysis.power.generator.active[g] <= new_max + 1e-7


def test_set_bound_rejects_non_active(data_path):
    system, analysis = _solved(data_path)
    with pytest.raises(ValueError, match="active"):
        set_bound(analysis, variable="magnitude",
                  label=system.bus.label.label(1), max=1.1)


def test_fix_unfix_roundtrip(data_path):
    system, analysis = _solved(data_path)
    spec = analysis._spec
    g0 = system.generator.label.label(0)
    cap = system.generator.capability
    before = (float(cap.min_active[0]), float(cap.max_active[0]))
    pinned = float(analysis.power.generator.active[0]) * 0.9

    fix(analysis, variable="active", label=g0, value=pinned)
    assert analysis._spec is spec
    assert any(i == 0 for i, _ in spec.fix_p)
    dc_solve(analysis)
    assert analysis.method.converged
    np.testing.assert_allclose(analysis.power.generator.active[0], pinned,
                               atol=1e-7)

    unfix(analysis, variable="active", label=g0)
    after = (float(cap.min_active[0]), float(cap.max_active[0]))
    assert before == after                 # capability data restored
    dc_solve(analysis)
    fresh = _fresh(system)
    _obj_close(analysis.method.objective, fresh.method.objective)


def test_unfix_without_fix_raises(data_path):
    system, analysis = _solved(data_path)
    with pytest.raises(ValueError, match="no recorded fix"):
        unfix(analysis, variable="active",
              label=system.generator.label.label(0))


def test_remove_flow_constraint_live(data_path):
    """remove! drops the constraint from the live model only; a fresh
    build restores it (reference remove! semantics)."""
    system, analysis = _solved(data_path, case="case30test.m")
    spec = analysis._spec
    flow_ks = {f[6] for f in spec.flows}
    assert flow_ks, "case30test should carry flow limits"
    k = sorted(flow_ks)[0]
    label = system.branch.label.label(k)
    n_flows = len(spec.flows)
    remove_constraint(analysis, constraint="flow", label=label)
    assert analysis._spec is spec
    assert len(spec.flows) < n_flows
    dc_solve(analysis)
    assert analysis.method.converged
    fresh = _fresh(system)                 # restores the constraint
    assert analysis.method.objective <= fresh.method.objective + 1e-6
    assert any(f[6] == k for f in fresh._spec.flows)


def test_remove_balance_raises(data_path):
    system, analysis = _solved(data_path)
    with pytest.raises(ValueError, match="balance"):
        remove_constraint(analysis, constraint="balance",
                          label=system.bus.label.label(0))


def test_update_demand_matches_fresh(data_path):
    system, analysis = _solved(data_path)
    spec = analysis._spec
    label = system.bus.label.label(2)
    update_demand(analysis, label,
                  active=1.1 * float(system.bus.demand.active[2]))
    assert analysis._spec is spec
    dc_solve(analysis)
    assert analysis.method.converged
    fresh = _fresh(system)
    _obj_close(analysis.method.objective, fresh.method.objective)
    np.testing.assert_allclose(analysis.voltage.angle, fresh.voltage.angle,
                               atol=1e-6)


def test_update_cost_polynomial_live(data_path):
    system, analysis = _solved(data_path)
    spec = analysis._spec
    g0 = system.generator.label.label(0)
    update_cost(analysis, g0, active=2, polynomial=[0.05, 30.0, 50.0])
    assert analysis._spec is spec
    assert spec.obj_quad[0] == 0.05 and spec.obj_lin[0] == 30.0
    dc_solve(analysis)
    assert analysis.method.converged
    fresh = _fresh(system)
    _obj_close(analysis.method.objective, fresh.method.objective)


def test_duals_carried_across_edit(data_path):
    """Value edits keep the constraint layout, so the next solve
    warm-starts the duals (reference setdual/transferdual!)."""
    system, analysis = _solved(data_path)
    update_demand(analysis, system.bus.label.label(2),
                  active=1.02 * float(system.bus.demand.active[2]))
    assert analysis._carry_duals
    dc_solve(analysis)
    warm_iters = analysis.method.iteration
    assert analysis.method.converged
    fresh = _fresh(system)
    assert warm_iters <= fresh.method.iteration


def test_dual_tags_aligned(data_path):
    """The inequality dual registry must follow the ineq() emission order
    (all capability mins, then maxes, then flows) — regression for the
    interleaved-tag misalignment."""
    system, analysis = _solved(data_path, case="case30test.m")
    spec = analysis._spec
    tags = spec.ineq_tags
    n_lo = len(spec.cap_lo)
    n_hi = len(spec.cap_hi)
    assert all(t == "capability_min" for t, _ in tags[:n_lo])
    assert all(t == "capability_max" for t, _ in tags[n_lo:n_lo + n_hi])
    assert [i for _, i in tags[:n_lo]] == [i for i, _ in spec.cap_lo]
    # the harvest vector must be exactly as long as the tag registry
    z = analysis.method.dual["ineq"]
    assert len(z) == len(tags)
