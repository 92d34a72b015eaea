"""Bad-data tests: plant an outlier, assert detection and recovery
(pattern of /root/reference/test/stateEstimation/badData.jl)."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.estimation.acse import gauss_newton, state_estimation
from juliagrid_tpu.estimation.baddata import chi_test, residual_test
from juliagrid_tpu.estimation.dcse import dc_state_estimation
from juliagrid_tpu.measurement.devices import (add_varmeter, add_voltmeter,
                                               add_wattmeter,
                                               update_wattmeter)
from juliagrid_tpu.measurement.load import measurement
from juliagrid_tpu.postprocessing.ac import current as ac_current
from juliagrid_tpu.postprocessing.ac import power as ac_power
from juliagrid_tpu.postprocessing.dc import power as dc_power
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.dc import dc_power_flow
from juliagrid_tpu.powerflow.driver import power_flow


def test_dc_outlier_detection(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    pf = dc_power_flow(system)
    power_flow(pf)
    dc_power(pf)

    monitoring = measurement(system)
    add_wattmeter(monitoring, analysis=pf)
    # plant a gross error on one flow measurement
    bad_label = monitoring.wattmeter.label.label(20)
    update_wattmeter(monitoring, bad_label, active=10.0)

    se = dc_state_estimation(monitoring)
    state_estimation(se)
    chi = chi_test(se)
    assert chi.detect

    bad = residual_test(se, threshold=3.0)
    assert bad.detect
    assert bad.label == bad_label
    assert monitoring.wattmeter.active.status[20] == 0

    # re-estimation recovers the power-flow angles
    se2 = dc_state_estimation(monitoring)
    state_estimation(se2)
    np.testing.assert_allclose(se2.voltage.angle, pf.voltage.angle,
                               atol=1e-8)
    chi2r = chi_test(se2)
    assert not chi2r.detect


def test_ac_outlier_detection(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    pf = newton_raphson(system)
    power_flow(pf)
    ac_power(pf)
    ac_current(pf)

    monitoring = measurement(system)
    add_voltmeter(monitoring, analysis=pf)
    add_wattmeter(monitoring, analysis=pf)
    add_varmeter(monitoring, analysis=pf)
    bad_label = monitoring.wattmeter.label.label(5)
    update_wattmeter(monitoring, bad_label, active=5.0)

    se = gauss_newton(monitoring)
    state_estimation(se)
    chi = chi_test(se)
    assert chi.detect

    bad = residual_test(se, threshold=3.0)
    assert bad.detect
    assert bad.label == bad_label

    se2 = gauss_newton(monitoring)
    state_estimation(se2)
    assert se2.method.converged
    np.testing.assert_allclose(se2.voltage.magnitude, pf.voltage.magnitude,
                               atol=1e-7)
    assert not chi_test(se2).detect


def test_residual_test_sparse_path_matches(data_path):
    """The Takahashi selected-inverse path gives the same identification
    as the dense projection."""
    system = jg.power_system(str(data_path / "case14test.m"))
    pf = newton_raphson(system)
    power_flow(pf)
    ac_power(pf)
    ac_current(pf)
    monitoring = measurement(system)
    add_voltmeter(monitoring, analysis=pf)
    add_wattmeter(monitoring, analysis=pf)
    add_varmeter(monitoring, analysis=pf)
    bad_label = monitoring.wattmeter.label.label(8)
    update_wattmeter(monitoring, bad_label, active=4.0)

    se = gauss_newton(monitoring)
    state_estimation(se)
    dense = residual_test(se, threshold=3.0, sparse=False)
    # restore status flipped by the dense identification
    monitoring.wattmeter.active.status[8] = 1
    monitoring.changed()
    se2 = gauss_newton(monitoring)
    state_estimation(se2)
    sparse = residual_test(se2, threshold=3.0, sparse=True)
    assert dense.label == sparse.label == bad_label
    assert abs(dense.max_normalized_residual
               - sparse.max_normalized_residual) < 1e-6


def test_lnr_removal_fused_matches_stepwise(data_path):
    """The device-fused LNR loop (lnr_removal) must remove the same
    devices and land on the same state as the host-driven
    residual_test + state_estimation loop (the bench config-4 shape)."""
    from juliagrid_tpu.estimation.baddata import lnr_removal

    def build_mon():
        system = jg.power_system(str(data_path / "case14test.m"))
        pf = newton_raphson(system)
        power_flow(pf)
        ac_power(pf)
        ac_current(pf)
        mon = measurement(system)
        add_voltmeter(mon, analysis=pf)
        add_wattmeter(mon, analysis=pf)
        add_varmeter(mon, analysis=pf)
        update_wattmeter(mon, mon.wattmeter.label.label(5), active=5.0)
        update_wattmeter(mon, mon.wattmeter.label.label(12), active=-4.0)
        return mon

    # stepwise reference loop
    mon_a = build_mon()
    se_a = gauss_newton(mon_a)
    state_estimation(se_a)
    removed_a = []
    for _ in range(10):
        bad = residual_test(se_a, threshold=3.0)
        if not bad.detect:
            break
        removed_a.append(bad.label)
        state_estimation(se_a)

    # fused loop
    mon_b = build_mon()
    se_b = gauss_newton(mon_b)
    removed_b = lnr_removal(se_b, threshold=3.0, max_remove=10)

    assert removed_a  # the planted errors must actually be caught
    assert sorted(map(str, removed_a)) == sorted(map(str, removed_b))
    np.testing.assert_allclose(se_b.voltage.magnitude,
                               se_a.voltage.magnitude, atol=1e-9)
    np.testing.assert_allclose(se_b.voltage.angle,
                               se_a.voltage.angle, atol=1e-9)
    # the monitoring sets agree row-for-row
    np.testing.assert_array_equal(
        mon_b.wattmeter.active.status, mon_a.wattmeter.active.status)
