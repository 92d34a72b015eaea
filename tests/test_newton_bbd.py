"""BBD-substrate Newton-Raphson: equivalence with the dense path."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.driver import power_flow
from juliagrid_tpu.powerflow.newton_bbd import (newton_raphson_bbd,
                                                power_flow_bbd)
from juliagrid_tpu.utils.synthetic import synthetic_grid


def test_bbd_nr_matches_dense_case30(data_path):
    system = jg.power_system(str(data_path / "case30test.m"))
    dense = newton_raphson(system)
    power_flow(dense)

    bbd = newton_raphson_bbd(system, n_blocks=3)
    power_flow_bbd(bbd)
    assert bbd.method.converged
    assert bbd.method.iteration == dense.method.iteration
    np.testing.assert_allclose(bbd.voltage.magnitude,
                               dense.voltage.magnitude, atol=1e-9)
    np.testing.assert_allclose(bbd.voltage.angle, dense.voltage.angle,
                               atol=1e-9)


def test_bbd_nr_synthetic_grid():
    system = synthetic_grid(10, 12)
    dense = newton_raphson(system)
    power_flow(dense)

    bbd = newton_raphson_bbd(system, n_blocks=4)
    power_flow_bbd(bbd)
    assert bbd.method.converged
    np.testing.assert_allclose(bbd.voltage.magnitude,
                               dense.voltage.magnitude, atol=1e-9)


def test_fnr_bbd_matches_plain(data_path):
    from juliagrid_tpu.powerflow.fast_decoupled import (
        fast_newton_raphson_bbd, fast_newton_raphson_bx,
        power_flow_fnr_bbd)
    system = jg.power_system(str(data_path / "case30test.m"))
    plain = fast_newton_raphson_bx(system)
    power_flow(plain, iteration=40)

    bbd = fast_newton_raphson_bbd(system, bx=True, n_blocks=3)
    power_flow_fnr_bbd(bbd, iteration=40)
    assert bbd.method.converged
    assert bbd.method.iteration == plain.method.iteration
    np.testing.assert_allclose(bbd.voltage.magnitude,
                               plain.voltage.magnitude, atol=1e-9)


def test_fnr_bbd_synthetic():
    from juliagrid_tpu.powerflow.fast_decoupled import (
        fast_newton_raphson_bbd, power_flow_fnr_bbd)
    system = synthetic_grid(20, 20)
    bbd = fast_newton_raphson_bbd(system, bx=True, n_blocks=4)
    power_flow_fnr_bbd(bbd, iteration=60)
    assert bbd.method.converged


def test_bbd_nr_off_branch_cross_interior():
    """ADVICE r1: an out-of-service branch keeps a structural zero in the
    Y-bus pattern; if its endpoints land in different interiors the entry
    must be dropped (value identically 0), not crash compilation."""
    system = synthetic_grid(6, 8)
    jg.update_branch(system, 10, status=0)

    dense = newton_raphson(system)
    power_flow(dense)

    bbd = newton_raphson_bbd(system, n_blocks=4)
    power_flow_bbd(bbd)
    assert bbd.method.converged
    np.testing.assert_allclose(bbd.voltage.magnitude,
                               dense.voltage.magnitude, atol=1e-9)
    np.testing.assert_allclose(bbd.voltage.angle, dense.voltage.angle,
                               atol=1e-9)


def test_bbd_nr_refresh_after_update():
    """ADVICE r1: updates after construction must reach the BBD solve
    (signature-staleness protocol), not silently solve the stale model."""
    system = synthetic_grid(6, 8)
    bbd = newton_raphson_bbd(system, n_blocks=4)
    power_flow_bbd(bbd)

    jg.update_branch(system, 5, status=0)
    power_flow_bbd(bbd)

    fresh = newton_raphson(system)
    power_flow(fresh)
    assert bbd.method.converged
    np.testing.assert_allclose(bbd.voltage.magnitude,
                               fresh.voltage.magnitude, atol=1e-9)
    np.testing.assert_allclose(bbd.voltage.angle, fresh.voltage.angle,
                               atol=1e-9)


def test_fnr_bbd_refresh_after_update():
    """ADVICE r1: the FDPF-BBD analysis must refresh B'/B'' factors when
    the system moves past the captured revision."""
    from juliagrid_tpu.powerflow.fast_decoupled import (
        fast_newton_raphson_bbd, fast_newton_raphson_bx, power_flow_fnr_bbd)

    system = synthetic_grid(6, 8)
    bbd = fast_newton_raphson_bbd(system, bx=True, n_blocks=4)
    power_flow_fnr_bbd(bbd)

    jg.update_branch(system, 5, status=0)
    power_flow_fnr_bbd(bbd, iteration=60)

    system2 = synthetic_grid(6, 8)
    jg.update_branch(system2, 5, status=0)
    fresh = fast_newton_raphson_bx(system2)
    power_flow(fresh, iteration=60)
    assert bbd.method.converged
    np.testing.assert_allclose(bbd.voltage.magnitude,
                               fresh.voltage.magnitude, atol=1e-8)
    np.testing.assert_allclose(bbd.voltage.angle, fresh.voltage.angle,
                               atol=1e-8)
