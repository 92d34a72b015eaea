"""Optimal power flow oracle tests (pattern of
/root/reference/test/optimalPowerFlow/analysis.jl: Ipopt/HiGHS golden
values at atol 1e-6)."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.opf.acopf import ac_optimal_power_flow
from juliagrid_tpu.opf.acopf import solve as ac_solve
from juliagrid_tpu.opf.dcopf import dc_optimal_power_flow
from juliagrid_tpu.opf.dcopf import solve as dc_solve

from .utils import h5group

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("case", ["case14test", "case30test"])
def test_dc_opf_matpower(data_path, case):
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(data_path / "results.h5", f"{case}/dcOptimalPowerFlow")
    analysis = dc_optimal_power_flow(system)
    dc_solve(analysis)
    assert analysis.method.converged
    np.testing.assert_allclose(analysis.voltage.angle, golden["voltage"],
                               atol=1e-6)
    np.testing.assert_allclose(analysis.power.generator.active,
                               golden["generator"], atol=1e-6)


def test_ac_opf_ipopt_class_iterations(data_path):
    """The filter-line-search IPM matches Ipopt's iteration class (~20)
    on the AC OPF oracles — including case30test, whose fixed-Q
    generators (Qmin == Qmax) require the fixed-output equality
    treatment (reference: Ipopt via JuMP at acOptimalPowerFlow.jl:333,
    exercised on system30 at test/optimalPowerFlow/analysis.jl:445)."""
    for case, obj in (("case14optimal", 95587.8394), ("case30test", None)):
        system = jg.power_system(str(data_path / f"{case}.m"))
        analysis = ac_optimal_power_flow(system)
        ac_solve(analysis)
        assert analysis.method.converged, case
        assert analysis.method.iteration <= 25, (
            case, analysis.method.iteration)
        if obj is not None:
            assert abs(analysis.method.objective - obj) < 1e-2


def test_ac_opf_matpower(data_path):
    system = jg.power_system(str(data_path / "case14optimal.m"))
    golden = h5group(data_path / "results.h5",
                     "case14optimal/acOptimalPowerFlow")
    analysis = ac_optimal_power_flow(system)
    ac_solve(analysis)
    assert analysis.method.converged
    np.testing.assert_allclose(analysis.voltage.magnitude,
                               golden["voltageMagnitude"], atol=1e-6)
    np.testing.assert_allclose(analysis.voltage.angle,
                               golden["voltageAngle"], atol=1e-6)
    np.testing.assert_allclose(analysis.power.generator.active,
                               golden["generatorActive"], atol=1e-6)
    np.testing.assert_allclose(analysis.power.generator.reactive,
                               golden["generatorReactive"], atol=1e-6)


def test_cost_update_changes_opf(data_path):
    """cost! live-edit: updating a generator cost re-optimizes."""
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = dc_optimal_power_flow(system)
    dc_solve(analysis)
    obj1 = analysis.method.objective
    # make generator 1 much cheaper
    jg.cost(system, system.generator.label.label(0), active=2,
            polynomial=[1.0, 1.0, 0.0])
    dc_solve(analysis)
    assert analysis.method.converged
    assert analysis.method.objective < obj1


def test_opf_user_extension(data_path):
    """User variables/constraints/objective terms (reference
    @addVariable/@addConstraint pattern)."""
    import jax.numpy as jnp

    from juliagrid_tpu.opf.extended import (add_constraint, add_objective_term,
                                            add_variable, solve_extended)

    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = dc_optimal_power_flow(system)
    dc_solve(analysis)
    base_obj = analysis.method.objective

    # spinning-reserve style extension: reserve >= 0.2 total, costed
    analysis2 = dc_optimal_power_flow(system)
    add_variable(analysis2, "reserve", dim=2, lower=0.0, start=0.1)
    add_constraint(analysis2,
                   lambda s: jnp.sum(s["reserve"]) - 0.2, kind="eq")
    add_objective_term(analysis2,
                       lambda s: 50.0 * jnp.sum(s["reserve"] ** 2))
    solve_extended(analysis2)
    assert analysis2.method.converged
    r = analysis2.method.user_values["reserve"]
    assert abs(r.sum() - 0.2) < 1e-6
    # symmetric quadratic cost splits the reserve evenly
    assert abs(r[0] - r[1]) < 1e-4
    # extension adds cost on top of the base dispatch
    assert analysis2.method.objective > base_obj


def test_ac_opf_powers_matpower(data_path):
    """OPF postprocessing parity vs the golden power columns."""
    from juliagrid_tpu.postprocessing.ac import power as ac_power
    system = jg.power_system(str(data_path / "case14optimal.m"))
    golden = h5group(data_path / "results.h5",
                     "case14optimal/acOptimalPowerFlow")
    analysis = ac_optimal_power_flow(system)
    ac_solve(analysis)
    ac_power(analysis)
    p = analysis.power
    np.testing.assert_allclose(p.injection.active,
                               golden["injectionActive"], atol=1e-5)
    np.testing.assert_allclose(p.injection.reactive,
                               golden["injectionReactive"], atol=1e-5)
    np.testing.assert_allclose(p.from_.active, golden["fromActive"],
                               atol=1e-5)
    np.testing.assert_allclose(p.to.reactive, golden["toReactive"],
                               atol=1e-5)
    np.testing.assert_allclose(p.series.active, golden["lossActive"],
                               atol=1e-5)
    np.testing.assert_allclose(p.shunt.reactive, golden["shuntReactive"],
                               atol=1e-5)
    np.testing.assert_allclose(p.supply.active, golden["supplyActive"],
                               atol=1e-5)
