"""Live-edit parity for the AC OPF model (the reference's reusing surface
on analyses: optimalPowerFlow/utility.jl:525-700 fix!/unfix!/remove!/
setBound! and the cost!(system, analysis) overload, generator.jl:382-567).

Each test edits a *live* solved model through opf.edit and checks the
re-solve against a freshly built model on the same system state. The spec
object must survive the edit (no full rebuild), and value-only edits must
keep every baked structure array identical so the re-solve hits the XLA
compile cache.
"""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.opf import (fix, remove_constraint, set_bound, unfix,
                               update_cost, update_demand)
from juliagrid_tpu.opf.acopf import ac_optimal_power_flow
from juliagrid_tpu.opf.acopf import solve as ac_solve

pytestmark = pytest.mark.slow


def _solved(data_path, case="case14optimal.m"):
    system = jg.power_system(str(data_path / case))
    analysis = ac_optimal_power_flow(system)
    ac_solve(analysis)
    assert analysis.method.converged
    return system, analysis


def _obj_close(a, b, rel=1e-6):
    assert abs(a - b) <= rel * max(1.0, abs(a), abs(b)), (a, b)


def _solved_ok(analysis):
    """converged keeps its strict meaning (KKT < tol); degenerate live-edit
    re-solves may legitimately stop at the Ipopt-style acceptable level."""
    assert analysis.method.converged or \
        analysis.method.result.status == "acceptable", \
        analysis.method.result.status


def _fresh(system):
    fresh = ac_optimal_power_flow(system)
    ac_solve(fresh)
    _solved_ok(fresh)  # min==max capability boxes are degenerate by design
    return fresh


def test_set_bound_value_only_keeps_structure(data_path):
    """Tightening an existing finite bound is a params-only edit: the spec
    survives, the baked index arrays are untouched, and the re-solve
    matches a fresh build."""
    system, analysis = _solved(data_path)
    spec = analysis._spec
    vlo_i = spec.vlo_i
    vhi_i = spec.vhi_i
    n_tags = len(spec.ineq_tags)

    vmax = float(analysis.voltage.magnitude[3]) - 0.005
    set_bound(analysis, variable="magnitude",
              label=system.bus.label.label(3), max=vmax)

    assert analysis._spec is spec                      # no rebuild
    assert spec.vlo_i is not None and np.array_equal(spec.vlo_i, vlo_i)
    assert np.array_equal(spec.vhi_i, vhi_i)           # same structure
    assert len(spec.ineq_tags) == n_tags
    ac_solve(analysis)
    assert analysis.method.converged
    assert float(analysis.voltage.magnitude[3]) <= vmax + 1e-7

    fresh = _fresh(system)
    _obj_close(analysis.method.objective, fresh.method.objective)
    np.testing.assert_allclose(analysis.voltage.magnitude,
                               fresh.voltage.magnitude, atol=1e-5)


def test_set_generator_bound_live(data_path):
    system, analysis = _solved(data_path)
    spec = analysis._spec
    pmax = float(analysis.power.generator.active[1]) * 0.8
    set_bound(analysis, variable="active",
              label=system.generator.label.label(1), max=pmax)
    assert analysis._spec is spec
    ac_solve(analysis)
    assert analysis.method.converged
    assert float(analysis.power.generator.active[1]) <= pmax + 1e-7
    fresh = _fresh(system)
    _obj_close(analysis.method.objective, fresh.method.objective)


def test_fix_unfix_roundtrip(data_path):
    """fix! pins a generator output (equality row, like the reference's
    JuMP fix); unfix! restores the original capability box and the
    re-solve returns to the original optimum."""
    system, analysis = _solved(data_path)
    obj0 = analysis.method.objective
    pg0 = analysis.power.generator.active.copy()

    fix(analysis, variable="active",
        label=system.generator.label.label(1), value=0.3)
    ac_solve(analysis)
    _solved_ok(analysis)
    assert abs(float(analysis.power.generator.active[1]) - 0.3) < 1e-6
    fresh = _fresh(system)  # system now carries min=max=0.3
    _obj_close(analysis.method.objective, fresh.method.objective)

    unfix(analysis, variable="active",
          label=system.generator.label.label(1))
    ac_solve(analysis)
    _solved_ok(analysis)
    _obj_close(analysis.method.objective, obj0)
    np.testing.assert_allclose(analysis.power.generator.active, pg0,
                               atol=1e-4)


def test_update_demand_params_only(data_path):
    """Moving a load is a pure params edit — spec structure untouched."""
    system, analysis = _solved(data_path)
    spec = analysis._spec
    tags0 = list(spec.ineq_tags)
    update_demand(analysis, system.bus.label.label(2),
                  active=1.05 * float(system.bus.demand.active[2]))
    assert analysis._spec is spec
    assert spec.ineq_tags == tags0
    ac_solve(analysis)
    assert analysis.method.converged
    fresh = _fresh(system)
    _obj_close(analysis.method.objective, fresh.method.objective)
    np.testing.assert_allclose(analysis.voltage.angle, fresh.voltage.angle,
                               atol=1e-5)


def test_update_cost_polynomial_live(data_path):
    system, analysis = _solved(data_path)
    spec = analysis._spec
    update_cost(analysis, system.generator.label.label(0), active=2,
                polynomial=[0.05, 22.0, 0.0])
    assert analysis._spec is spec
    ac_solve(analysis)
    assert analysis.method.converged
    fresh = _fresh(system)
    _obj_close(analysis.method.objective, fresh.method.objective)
    np.testing.assert_allclose(analysis.power.generator.active,
                               fresh.power.generator.active, atol=1e-4)


def test_remove_flow_constraint_live(data_path):
    """remove! drops the constraint from the live model only — the system
    keeps its limits (rebuilding restores them, reference semantics)."""
    system, analysis = _solved(data_path, case="case30test.m")
    spec = analysis._spec
    flow_ks = {f[0] for f in spec.flows}
    assert flow_ks, "case30test should carry flow limits"
    k = sorted(flow_ks)[0]
    label = system.branch.label.label(k)
    n_flows = len(spec.flows)
    remove_constraint(analysis, constraint="flow", label=label)
    assert analysis._spec is spec
    assert len(spec.flows) < n_flows
    assert all(f[0] != k for f in spec.flows)
    ac_solve(analysis)
    _solved_ok(analysis)
    # relaxation: objective can only improve or stay
    fresh = _fresh(system)  # fresh build restores the constraint
    assert analysis.method.objective <= fresh.method.objective + 1e-6
    assert any(f[0] == k for f in fresh._spec.flows)


def test_duals_carried_across_edit(data_path):
    """The re-solve warm-starts primal and duals from the previous optimum
    (reference setdual/transferdual!) and converges in fewer iterations
    than the cold build."""
    system, analysis = _solved(data_path)
    update_demand(analysis, system.bus.label.label(2),
                  active=1.02 * float(system.bus.demand.active[2]))
    assert analysis._carry_duals
    ac_solve(analysis)
    warm_iters = analysis.method.iteration
    fresh = _fresh(system)
    assert warm_iters <= fresh.method.iteration
    assert analysis.method.converged


def test_balance_remove_rejected(data_path):
    system, analysis = _solved(data_path)
    with pytest.raises(ValueError, match="balance"):
        remove_constraint(analysis, constraint="balance",
                          label=system.bus.label.label(0))
