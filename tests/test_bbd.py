"""BBD Schur-complement solver tests: equivalence with the direct dense
solve on a DC nodal system, single-device and sharded over a block mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.ops.bbd import (BbdArrays, bbd_partition, bbd_solve,
                                   bbd_solve_sharded, build_bbd_arrays)
from juliagrid_tpu.utils.synthetic import synthetic_grid


@pytest.fixture(scope="module")
def dc_system():
    system = synthetic_grid(8, 12)
    jg.dc_model(system)
    n = system.bus.number
    b = np.asarray(system.model.dc.nodal.todense())
    # mask slack to identity (as the DC solve does)
    slack = system.bus.layout.slack
    m = np.ones(n)
    m[slack] = 0.0
    a = m[:, None] * b * m[None, :] + np.diag(1 - m)
    rhs = (system.bus.supply.active.array[:n]
           - system.bus.demand.active.array[:n]) * m
    return system, a, rhs


def test_bbd_partition_covers(dc_system):
    system, a, rhs = dc_system
    adj = system.model.dc.nodal.copy()
    adj.eliminate_zeros()
    block_of, border = bbd_partition(adj, 4)
    n = system.bus.number
    assert len(border) > 0
    assert np.all((block_of >= -1) & (block_of < 4))
    covered = set(np.flatnonzero(block_of >= 0)) | set(border)
    assert covered == set(range(n))


def test_bbd_solve_matches_direct(dc_system):
    system, a, rhs = dc_system
    adj = system.model.dc.nodal.copy()
    adj.eliminate_zeros()
    block_of, border = bbd_partition(adj, 4)
    arr = build_bbd_arrays(a, block_of, border)
    x = np.asarray(bbd_solve(arr, jnp.asarray(rhs)))
    x_ref = np.linalg.solve(a, rhs)
    np.testing.assert_allclose(x, x_ref, atol=1e-8)


def test_bbd_solve_sharded(dc_system):
    from jax.sharding import Mesh
    system, a, rhs = dc_system
    adj = system.model.dc.nodal.copy()
    adj.eliminate_zeros()
    n_dev = min(4, len(jax.devices()))
    block_of, border = bbd_partition(adj, n_dev)
    arr = build_bbd_arrays(a, block_of, border)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("block",))
    x = np.asarray(bbd_solve_sharded(mesh, arr, jnp.asarray(rhs)))
    x_ref = np.linalg.solve(a, rhs)
    np.testing.assert_allclose(x, x_ref, atol=1e-8)
