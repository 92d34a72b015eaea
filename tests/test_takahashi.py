"""Selected-inverse (Takahashi) tests against dense references."""

import numpy as np
import scipy.sparse as sp

import juliagrid_tpu as jg
from juliagrid_tpu.estimation.takahashi import (projection_diag_sparse,
                                                takahashi_diag)


def test_takahashi_diag_matches_dense():
    rng = np.random.default_rng(3)
    n = 40
    m = sp.random(n, n, density=0.1, random_state=3)
    a = (m @ m.T + 10 * sp.eye(n)).tocsc()
    d = takahashi_diag(a)
    d_ref = np.diag(np.linalg.inv(a.toarray()))
    np.testing.assert_allclose(d, d_ref, rtol=1e-8)


def test_projection_diag_matches_dense(data_path):
    from juliagrid_tpu.estimation.dcse import dc_state_estimation
    from juliagrid_tpu.estimation import state_estimation
    from juliagrid_tpu.measurement.devices import add_wattmeter
    from juliagrid_tpu.measurement.load import measurement
    from juliagrid_tpu.postprocessing.dc import power as dc_power
    from juliagrid_tpu.powerflow.dc import dc_power_flow
    from juliagrid_tpu.powerflow.driver import power_flow
    from juliagrid_tpu.estimation.baddata import _projection_diag

    system = jg.power_system(str(data_path / "case14test.m"))
    pf = dc_power_flow(system)
    power_flow(pf)
    dc_power(pf)
    monitoring = measurement(system)
    add_wattmeter(monitoring, analysis=pf)
    se = dc_state_estimation(monitoring)
    state_estimation(se)

    h = np.asarray(se.arrays.h_dense)
    w = np.asarray(se.arrays.w)
    slack = int(np.asarray(se.arrays.slack))
    c_dense = np.asarray(_projection_diag(h, w, mask_cols=[slack]))
    c_sparse = projection_diag_sparse(sp.csr_matrix(h), w,
                                      mask_cols=[slack])
    np.testing.assert_allclose(c_sparse, c_dense, atol=1e-8)


def test_projection_diag_sparse_10k_scale(data_path):
    """Vectorized recurrences at ACTIVSg10k scale (80k rows, 20k states):
    sanity-bounded leverages, spot-row exactness, and a wall-time budget
    (the round-1 dict recurrences took minutes here)."""
    import time

    import juliagrid_tpu as jg
    from juliagrid_tpu.measurement.devices import (add_varmeter,
                                                   add_voltmeter,
                                                   add_wattmeter)
    from juliagrid_tpu.measurement.load import measurement
    from juliagrid_tpu.oracle import oracle_nr, oracle_wls_se
    from juliagrid_tpu.postprocessing.ac import power as ac_power
    from juliagrid_tpu.system.model import model
    from scipy.sparse.linalg import splu

    system = jg.power_system(str(data_path / "case_ACTIVSg10k.h5"))
    model(system, "ac")
    pfo = oracle_nr(system, iteration=50)

    class _V:
        pass

    pf = _V()
    pf.voltage = _V()
    pf.voltage.magnitude = pfo.magnitude
    pf.voltage.angle = pfo.angle
    pf.system = system
    pf.power = None
    pf.current = None
    pf.kind = "power_flow"
    ac_power(pf)
    mon = measurement(system)
    add_voltmeter(mon, analysis=pf, noise=False)
    add_wattmeter(mon, analysis=pf, noise=False)
    add_varmeter(mon, analysis=pf, noise=False)
    res = oracle_wls_se(system, mon)

    t0 = time.perf_counter()
    c = projection_diag_sparse(res.jacobian, res.weights,
                               mask_cols=[res.slack])
    wall = time.perf_counter() - t0
    assert wall < 60.0  # ~6 s measured; dict version was minutes
    lev = c * res.weights
    assert lev.min() > -1e-9 and lev.max() < 1.0 + 1e-9

    # spot-exactness against direct solves
    h = sp.csr_matrix(res.jacobian)
    keep = np.ones(h.shape[1])
    keep[res.slack] = 0.0
    hm = (h @ sp.diags(keep)).tocsr()
    g = (hm.T @ sp.diags(res.weights) @ hm + sp.diags(1 - keep)).tocsc()
    lu = splu(g)
    rng = np.random.default_rng(0)
    for r in rng.choice(h.shape[0], 8, replace=False):
        hr = hm[r].toarray().ravel()
        exact = hr @ lu.solve(hr)
        assert abs(c[r] - exact) <= 1e-6 * max(abs(exact), 1e-12)
