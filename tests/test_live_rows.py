"""Live measurement-row value patches (reference update! in-place row
patching, powermeter.jl:629-958 and pmu.jl:566-915): numeric-only edits
must patch the per-row value vectors without rebuilding/re-uploading the
row snapshot, and structural edits must still rebuild."""

import numpy as np

import juliagrid_tpu as jg


def _se_setup():
    system = jg.power_system("tests/data/case14test.m")
    pf = jg.newton_raphson(system)
    jg.power_flow(pf, power=True)
    mon = jg.measurement(system)
    jg.add_voltmeter(mon, analysis=pf, noise=False)
    jg.add_wattmeter(mon, analysis=pf, noise=False)
    jg.add_varmeter(mon, analysis=pf, noise=False)
    jg.add_pmu(mon, bus=system.bus.label.label(3),
               magnitude=float(pf.voltage.magnitude[3]),
               angle=float(pf.voltage.angle[3]), noise=False)
    return system, pf, mon


def test_value_update_patches_without_rebuild():
    system, pf, mon = _se_setup()
    se = jg.gauss_newton(mon)
    jg.state_estimation(se)
    pattern_buf = se.arrays.p_ent_k  # device-resident index pattern

    jg.update_wattmeter(mon, mon.wattmeter.label.label(1), active=0.5,
                        variance=1e-3)
    jg.update_voltmeter(mon, mon.voltmeter.label.label(2), status=0)
    jg.state_estimation(se)

    # the index pattern was NOT rebuilt (same device buffer object)
    assert se.arrays.p_ent_k is pattern_buf

    # and the patched analysis equals a freshly compiled one
    fresh = jg.gauss_newton(mon)
    jg.state_estimation(fresh)
    np.testing.assert_allclose(
        np.asarray(se.voltage.magnitude),
        np.asarray(fresh.voltage.magnitude), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(se.voltage.angle),
        np.asarray(fresh.voltage.angle), atol=1e-10)


def test_structural_update_still_rebuilds():
    system, pf, mon = _se_setup()
    se = jg.gauss_newton(mon)
    jg.state_estimation(se)
    pattern_buf = se.arrays.p_ent_k

    # polar flip changes row kinds -> snapshot rebuild
    jg.update_pmu(mon, mon.pmu.label.label(0), polar=True)
    jg.state_estimation(se)
    assert se.arrays.p_ent_k is not pattern_buf

    fresh = jg.gauss_newton(mon)
    jg.state_estimation(fresh)
    np.testing.assert_allclose(
        np.asarray(se.voltage.angle),
        np.asarray(fresh.voltage.angle), atol=1e-10)


def test_correlated_pmu_variance_patch():
    """Correlated-PMU variance edits flow into the off-diagonal precision
    (pair_off) through the values-only path."""
    system, pf, mon = _se_setup()
    jg.update_pmu(mon, mon.pmu.label.label(0), correlated=True)
    se = jg.gauss_newton(mon)
    jg.state_estimation(se)
    off_before = np.asarray(se.arrays.pair_off).copy()

    jg.update_pmu(mon, mon.pmu.label.label(0), variance_magnitude=5e-3)
    jg.state_estimation(se)
    off_after = np.asarray(se.arrays.pair_off)
    assert off_before.shape == off_after.shape
    assert not np.allclose(off_before, off_after)

    fresh = jg.gauss_newton(mon)
    jg.state_estimation(fresh)
    np.testing.assert_allclose(
        np.asarray(se.voltage.magnitude),
        np.asarray(fresh.voltage.magnitude), atol=1e-10)


def test_lnr_loop_uses_value_patches():
    """Bad-data deactivation is a status edit: the LNR loop should run
    entirely on value patches after the first snapshot build."""
    from juliagrid_tpu.estimation.baddata import residual_test

    system, pf, mon = _se_setup()
    jg.update_wattmeter(mon, mon.wattmeter.label.label(1), active=4.0)
    se = jg.gauss_newton(mon)
    jg.state_estimation(se)
    pattern_buf = se.arrays.p_ent_k

    removed = 0
    while removed < 5:
        bad = residual_test(se, threshold=3.0)
        if not bad.detect:
            break
        removed += 1
        jg.state_estimation(se)
    assert removed == 1
    assert se.arrays.p_ent_k is pattern_buf
    err = np.abs(np.asarray(se.voltage.angle)
                 - np.asarray(pf.voltage.angle)).max()
    assert err < 1e-8
