"""SE on the BBD/Schur gain substrate: dense-path equivalence, staleness
refresh, correlated-PMU guard, and the nd_partition invariants."""

import numpy as np
import pytest
import scipy.sparse as sp

import juliagrid_tpu as jg
from juliagrid_tpu.estimation.acse import gauss_newton, state_estimation
from juliagrid_tpu.estimation.acse_bbd import gauss_newton_bbd, se_bbd_solve
from juliagrid_tpu.measurement.devices import (add_pmu, add_varmeter,
                                               add_voltmeter, add_wattmeter)
from juliagrid_tpu.measurement.load import measurement
from juliagrid_tpu.ops.partition import nd_partition
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.driver import power_flow


def _scada_pmu(case, data_path, pmu_every=10):
    system = jg.power_system(str(data_path / case))
    pf = newton_raphson(system)
    power_flow(pf, power=True)
    mon = measurement(system)
    add_voltmeter(mon, analysis=pf, noise=False)
    add_wattmeter(mon, analysis=pf, noise=False)
    add_varmeter(mon, analysis=pf, noise=False)
    for b in range(0, system.bus.number, pmu_every):
        add_pmu(mon, bus=system.bus.label.label(b),
                magnitude=float(pf.voltage.magnitude[b]),
                angle=float(pf.voltage.angle[b]), polar=True, noise=False)
    return system, mon


def test_se_bbd_matches_dense_118(data_path):
    system, mon = _scada_pmu("case118.m", data_path)
    se = gauss_newton(mon)
    state_estimation(se)
    bb = gauss_newton_bbd(mon, n_blocks=4)
    se_bbd_solve(bb)
    assert bb.method.converged
    assert bb.method.iteration == se.method.iteration
    np.testing.assert_allclose(bb.voltage.magnitude, se.voltage.magnitude,
                               atol=1e-10)
    np.testing.assert_allclose(bb.voltage.angle, se.voltage.angle,
                               atol=1e-10)


def test_se_bbd_staleness_refresh(data_path):
    """System edits after construction must rebuild the BBD snapshot
    (the signature protocol — round-1 advisor finding on the PF BBD)."""
    from juliagrid_tpu.system.builders import update_branch

    system, mon = _scada_pmu("case14test.m", data_path, pmu_every=5)
    bb = gauss_newton_bbd(mon, n_blocks=2)
    se_bbd_solve(bb)
    before = bb.voltage.magnitude.copy()

    update_branch(system, 4, status=0)
    # measurements unchanged; the estimate must track the new topology
    n = system.bus.number
    bb.voltage.magnitude = system.bus.voltage.magnitude.array[:n].copy()
    bb.voltage.angle = system.bus.voltage.angle.array[:n].copy()
    se_bbd_solve(bb)
    fresh = gauss_newton_bbd(mon, n_blocks=2)
    se_bbd_solve(fresh)
    np.testing.assert_allclose(bb.voltage.magnitude,
                               fresh.voltage.magnitude, atol=1e-10)
    assert not np.allclose(bb.voltage.magnitude, before, atol=1e-12)


def test_se_bbd_correlated_raises(data_path):
    system, mon = _scada_pmu("case14test.m", data_path)
    pf = newton_raphson(system)
    power_flow(pf)
    add_pmu(mon, bus=system.bus.label.label(2),
            magnitude=float(pf.voltage.magnitude[2]),
            angle=float(pf.voltage.angle[2]), correlated=True, noise=False)
    with pytest.raises(ValueError, match="non-diagonal precision"):
        gauss_newton_bbd(mon, n_blocks=2)


@pytest.mark.parametrize("case,k,bound", [("case118.m", 4, 0.25),
                                          ("case1354pegase.h5", 8, 0.12)])
def test_nd_partition_invariants(case, k, bound, data_path):
    """No adjacency edge joins two interiors; the border is a small
    fraction of the buses (the BFS partitioner gave 25-60%).
    Separators shrink relative to n as n grows (near-planar graphs)."""
    from juliagrid_tpu.system.model import model

    system = jg.power_system(str(data_path / case))
    model(system, "ac")
    nodal = system.model.ac.nodal.tocsr()
    pat = sp.csr_matrix((np.ones(nodal.nnz), nodal.indices, nodal.indptr),
                        shape=nodal.shape)
    block_of, border = nd_partition(pat, k)
    n = nodal.shape[0]
    assert len(border) < bound * n
    coo = pat.tocoo()
    bi, bj = block_of[coo.row], block_of[coo.col]
    cross = (bi >= 0) & (bj >= 0) & (bi != bj)
    assert not np.any(cross)
    # every bus accounted for
    assert np.all((block_of >= 0) | np.isin(np.arange(n), border))
