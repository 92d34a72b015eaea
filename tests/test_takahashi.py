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
