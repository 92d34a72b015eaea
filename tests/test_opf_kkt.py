"""Structured (BBD) KKT solver equivalence vs the dense IPM path.

The BBD KKT (opf/kkt_bbd.py) must assemble EXACTLY the same augmented
matrix the dense step builds — element-exact on the full matrix, matching
solutions on random right-hand sides, and identical OPF results
end-to-end. Mirrors how the reference validates its solver boundary by
objective parity against Ipopt (test/optimalPowerFlow/analysis.jl:9-12);
here both sides are in-house so the contract is exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.opf.acopf import ac_optimal_power_flow
from juliagrid_tpu.opf.acopf import solve as ac_solve
from juliagrid_tpu.opf.kkt_bbd import AcKktBbd

pytestmark = pytest.mark.slow


def _spec_and_state(data_path, case, seed=0):
    system = jg.power_system(str(data_path / f"{case}.m"))
    analysis = ac_optimal_power_flow(system)
    analysis._refresh_spec()
    spec = analysis._spec
    rng = np.random.default_rng(seed)
    x = jnp.asarray(analysis._x0 + 0.01 * rng.standard_normal(spec.n_x))
    y = jnp.asarray(rng.standard_normal(spec.m_e))
    z = jnp.asarray(rng.uniform(0.1, 2.0, spec.m_i))
    s = jnp.asarray(rng.uniform(0.1, 2.0, spec.m_i))
    pk = {"p": spec.params, "sf": jnp.asarray(1.0),
          "ge": jnp.ones(spec.m_e), "gi": jnp.ones(spec.m_i)}
    return spec, x, y, z, s, pk


def _dense_kkt(spec, x, y, z, sigma, delta, pk):
    """Reference assembly exactly as the dense IPM step builds it."""
    p = spec.params
    h = spec.hess(x, np.asarray(y), np.asarray(z), p)
    ji = spec.jac_ineq(x, p)
    je = spec.jac_eq(x, p)
    w = np.asarray(h) + np.asarray(ji).T @ (
        np.asarray(sigma)[:, None] * np.asarray(ji))
    n_x, m_e = spec.n_x, spec.m_e
    n_aug = n_x + m_e
    kkt = np.zeros((n_aug, n_aug))
    kkt[:n_x, :n_x] = w + delta * np.eye(n_x)
    kkt[:n_x, n_x:] = np.asarray(je).T
    kkt[n_x:, :n_x] = np.asarray(je)
    kkt[n_x:, n_x:] = -1e-10 * np.eye(m_e)
    return kkt


@pytest.mark.parametrize("case", ["case14test", "case30test", "case118"])
def test_kkt_matrix_element_exact(data_path, case):
    spec, x, y, z, s, pk = _spec_and_state(data_path, case)
    sigma = z / s
    delta = 1e-3
    kkt_obj = AcKktBbd(spec, n_blocks=3)

    vals = np.asarray(kkt_obj._values(x, y, z, sigma, delta, pk))
    rows = np.asarray(kkt_obj._rows)
    cols = np.asarray(kkt_obj._cols)
    coo = np.zeros((kkt_obj.n_aug, kkt_obj.n_aug))
    np.add.at(coo, (rows, cols), vals)

    dense = _dense_kkt(spec, x, y, z, sigma, delta, pk)
    assert np.max(np.abs(coo - dense)) < 1e-9 * max(
        1.0, np.max(np.abs(dense)))


@pytest.mark.parametrize("case", ["case30test", "case118"])
def test_kkt_solve_matches_dense(data_path, case):
    spec, x, y, z, s, pk = _spec_and_state(data_path, case, seed=1)
    sigma = z / s
    delta = 1e-4
    kkt_obj = AcKktBbd(spec, n_blocks=4)
    rng = np.random.default_rng(2)
    rhs_x = rng.standard_normal(spec.n_x)
    rhs_e = rng.standard_normal(spec.m_e)

    dx, v, lin_res, curv = jax.jit(kkt_obj.solve)(
        x, y, z, sigma, delta, jnp.asarray(rhs_x), jnp.asarray(rhs_e), pk)

    dense = _dense_kkt(spec, x, y, z, sigma, delta, pk)
    sol = np.linalg.solve(dense, np.concatenate([rhs_x, rhs_e]))
    scale = max(1.0, np.max(np.abs(sol)))
    assert np.max(np.abs(np.asarray(dx) - sol[:spec.n_x])) < 1e-6 * scale
    assert np.max(np.abs(np.asarray(v) - sol[spec.n_x:])) < 1e-6 * scale
    assert float(lin_res) < 1e-8
    # curvature quadratic form matches the dense W_reg
    w = dense[:spec.n_x, :spec.n_x]
    curv_ref = sol[:spec.n_x] @ (w @ sol[:spec.n_x])
    assert abs(float(curv) - curv_ref) < 1e-6 * max(1.0, abs(curv_ref))


def test_kkt_solve_f64_endgame(data_path):
    """The structured f64 endgame (AcKktBbd.solve_f64) must solve the
    SAME assembled system as the f32 path, and keep working where the
    f32 factorization loses the solution: an endgame-shaped Sigma
    spanning ~1e12 (the round-4 pegase wall, here injected directly)."""
    spec, x, y, z, s, pk = _spec_and_state(data_path, "case118", seed=5)
    rng = np.random.default_rng(6)
    # endgame active set: z/s spread over 12 orders of magnitude
    z = jnp.asarray(10.0 ** rng.uniform(-6, 6, spec.m_i))
    s = jnp.asarray(10.0 ** rng.uniform(-6, 6, spec.m_i))
    sigma = z / s
    delta = 1e-8
    kkt_obj = AcKktBbd(spec, n_blocks=4)
    rhs_x = rng.standard_normal(spec.n_x)
    rhs_e = rng.standard_normal(spec.m_e)

    dx64, v64, lin_res64, _ = jax.jit(kkt_obj.solve_f64)(
        x, y, z, sigma, delta, jnp.asarray(rhs_x), jnp.asarray(rhs_e), pk)
    _, _, lin_res32, _ = jax.jit(kkt_obj.solve)(
        x, y, z, sigma, delta, jnp.asarray(rhs_x), jnp.asarray(rhs_e), pk)

    dense = _dense_kkt(spec, x, y, z, sigma, delta, pk)
    sol = np.linalg.solve(dense, np.concatenate([rhs_x, rhs_e]))
    scale = max(1.0, np.max(np.abs(sol)))
    assert float(lin_res64) < 1e-9
    assert np.max(np.abs(np.asarray(dx64) - sol[:spec.n_x])) \
        < 1e-6 * scale
    assert np.max(np.abs(np.asarray(v64) - sol[spec.n_x:])) \
        < 1e-6 * scale
    # the f64 path must be at least as good as f32 on this conditioning
    assert float(lin_res64) <= max(float(lin_res32), 1e-9)


@pytest.mark.parametrize("case", ["case14test", "case118"])
def test_kkt_row_maxes_match_dense(data_path, case):
    spec, x, y, z, s, pk = _spec_and_state(data_path, case, seed=3)
    kkt_obj = AcKktBbd(spec, n_blocks=3)
    rme, rmi = jax.jit(kkt_obj.row_maxes)(x, spec.params)
    je = np.abs(np.asarray(spec.jac_eq(x, spec.params))).max(axis=1)
    ji = np.abs(np.asarray(spec.jac_ineq(x, spec.params))).max(axis=1)
    # row_maxes floors at 1.0 — identical scaling outcome, since the
    # gradient-based row scale is min(1, 100/max): any max <= 100 that is
    # also >= the floor maps to the same g row
    assert np.allclose(np.asarray(rme), np.maximum(je, 1.0),
                       rtol=1e-9, atol=1e-12)
    assert np.allclose(np.asarray(rmi), np.maximum(ji, 1.0),
                       rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("case,blocks", [("case14optimal", 3),
                                         ("case118", 4)])
def test_ac_opf_bbd_end_to_end(data_path, case, blocks):
    """Same optimum through the BBD KKT as through the dense KKT."""
    system = jg.power_system(str(data_path / f"{case}.m"))
    dense = ac_solve(ac_optimal_power_flow(system), kkt_blocks=0)
    assert dense.method.converged

    system2 = jg.power_system(str(data_path / f"{case}.m"))
    bbd = ac_solve(ac_optimal_power_flow(system2), kkt_blocks=blocks)
    assert bbd.method.result.status in ("optimal", "acceptable")
    assert abs(bbd.method.objective - dense.method.objective) \
        < 1e-5 * max(1.0, abs(dense.method.objective))
    assert np.max(np.abs(bbd.voltage.magnitude
                         - dense.voltage.magnitude)) < 1e-4


def test_synthetic_opf_bbd_path():
    """The shape of the >=10k capability proof (benchmarks/opf_scale.py),
    pinned small on the CPU mesh: synthetic lattice with costs + voltage
    bounds, solved through the BBD KKT, equal to the dense optimum, and a
    live cost edit re-solving against the CACHED routed structure."""
    from juliagrid_tpu.opf.edit import update_cost
    from juliagrid_tpu.utils.synthetic import synthetic_grid

    dense = ac_solve(ac_optimal_power_flow(synthetic_grid(6, 6, opf=True)),
                     kkt_blocks=0)
    assert dense.method.converged

    bbd_an = ac_optimal_power_flow(synthetic_grid(6, 6, opf=True))
    ac_solve(bbd_an, kkt_blocks=4)
    assert bbd_an.method.result.status in ("optimal", "acceptable")
    assert abs(bbd_an.method.objective - dense.method.objective) \
        < 1e-5 * max(1.0, abs(dense.method.objective))

    # live numeric cost edit: the routed KKT structure must be reused
    kkt_before = bbd_an._kkt_cache[1]
    update_cost(bbd_an, 1, active=2, polynomial=[0.05, 25.0, 0.0])
    ac_solve(bbd_an, kkt_blocks=4)
    assert bbd_an._kkt_cache[1] is kkt_before
    assert bbd_an.method.result.status in ("optimal", "acceptable")

    # fresh build with the same edit agrees
    sys2 = synthetic_grid(6, 6, opf=True)
    from juliagrid_tpu.system.builders import cost as cost_builder
    cost_builder(sys2, 1, active=2, polynomial=[0.05, 25.0, 0.0])
    fresh = ac_solve(ac_optimal_power_flow(sys2), kkt_blocks=0)
    assert abs(bbd_an.method.objective - fresh.method.objective) \
        < 1e-5 * max(1.0, abs(fresh.method.objective))
