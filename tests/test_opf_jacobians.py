"""Analytic OPF constraint Jacobians vs autodiff (the IPM's fallback).

The analytic forms (acopf.py jac_eq/jac_ineq: polar power-flow derivatives
per Y entry + constant bound/fix/cut rows + 4-variable flow grads) must
match jax.jacfwd of the traced constraint functions exactly — they replace
the chunked autodiff pass on the pegase-scale hot path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import juliagrid_tpu as jg


def _spec_and_x(case):
    system = jg.power_system(f"tests/data/{case}")
    opf = jg.ac_optimal_power_flow(system)
    spec = opf._spec
    # perturb off the flat/start point so trig terms are generic
    rng = np.random.default_rng(11)
    x = np.asarray(opf._x0).copy()
    n = spec.n
    x[:n] += 0.03 * rng.standard_normal(n)
    x[n:2 * n] *= 1.0 + 0.01 * rng.standard_normal(n)
    x[2 * n:] += 0.01 * rng.standard_normal(len(x) - 2 * n)
    return spec, jnp.asarray(x)


@pytest.mark.parametrize("case", ["case14optimal.m", "case30test.m"])
def test_jac_eq_matches_autodiff(case):
    spec, x = _spec_and_x(case)
    p = spec.params
    j_auto = np.asarray(jax.jacfwd(lambda xx: spec.eq(xx, p))(x))
    j_ana = np.asarray(spec.jac_eq(x, p))
    assert j_ana.shape == j_auto.shape == (spec.m_e, spec.n_x)
    np.testing.assert_allclose(j_ana, j_auto, atol=1e-12)


@pytest.mark.parametrize("case", ["case14optimal.m", "case30test.m"])
def test_jac_ineq_matches_autodiff(case):
    spec, x = _spec_and_x(case)
    p = spec.params
    ineq_val = spec.ineq(x, p)
    if ineq_val is None:
        pytest.skip("case has no inequalities")
    j_auto = np.asarray(jax.jacfwd(lambda xx: spec.ineq(xx, p))(x))
    j_ana = np.asarray(spec.jac_ineq(x, p))
    assert j_ana.shape == j_auto.shape == (spec.m_i, spec.n_x)
    np.testing.assert_allclose(j_ana, j_auto, atol=1e-10)


@pytest.mark.parametrize("case", ["case14optimal.m", "case30test.m"])
def test_hess_matches_autodiff(case):
    spec, x = _spec_and_x(case)
    p = spec.params
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.standard_normal(spec.m_e))
    z = jnp.asarray(rng.standard_normal(spec.m_i))

    def lag(xx):
        val = spec.objective(xx, p) - y @ spec.eq(xx, p)
        iv = spec.ineq(xx, p)
        if iv is not None:
            val = val - z @ iv
        return val

    h_auto = np.asarray(jax.jacfwd(jax.grad(lag))(x))
    h_ana = np.asarray(spec.hess(x, y, z, p))
    assert h_ana.shape == (spec.n_x, spec.n_x)
    np.testing.assert_allclose(h_ana, h_auto, atol=1e-9)
    # symmetric by construction
    np.testing.assert_allclose(h_ana, h_ana.T, atol=1e-12)


def test_opf_solve_unchanged_with_analytic_jacobians():
    """End-to-end: the IPM on the analytic path converges to the same
    optimum (golden-parity is covered by test_opf.py; here just assert
    self-consistency and convergence)."""
    system = jg.power_system("tests/data/case14optimal.m")
    opf = jg.ac_optimal_power_flow(system)
    jg.power_flow(opf)
    assert opf.method.converged
    assert opf.method.result.kkt_error < 1e-6
