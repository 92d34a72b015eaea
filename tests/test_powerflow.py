"""Power-flow oracle parity tests (pattern of
/root/reference/test/powerFlow/analysis.jl)."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.dc import dc_power_flow
from juliagrid_tpu.powerflow.driver import power_flow

from .utils import assert_dc_voltage, assert_voltage, h5group


@pytest.mark.parametrize("case", ["case14test", "case30test"])
def test_newton_raphson_matpower(data_path, case):
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(data_path / "results.h5", f"{case}/newtonRaphson")

    jg.ac_model(system)
    analysis = newton_raphson(system)
    power_flow(analysis)
    assert analysis.method.converged
    assert_voltage(golden, analysis)


@pytest.mark.parametrize("case", ["case14test", "case30test"])
def test_dc_power_flow_matpower(data_path, case):
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(data_path / "results.h5", f"{case}/dcPowerFlow")

    analysis = dc_power_flow(system)
    power_flow(analysis)
    assert_dc_voltage(golden, analysis)


@pytest.mark.parametrize("case", ["case14test", "case30test"])
@pytest.mark.parametrize("variant", ["BX", "XB"])
def test_fast_newton_raphson_matpower(data_path, case, variant):
    from juliagrid_tpu.powerflow.fast_decoupled import (
        fast_newton_raphson_bx, fast_newton_raphson_xb)
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(data_path / "results.h5",
                     f"{case}/fastNewtonRaphson{variant}")
    build = fast_newton_raphson_bx if variant == "BX" else fast_newton_raphson_xb
    analysis = build(system)
    power_flow(analysis, iteration=30)
    assert analysis.method.converged
    assert_voltage(golden, analysis)


@pytest.mark.parametrize("case", ["case14test", "case30test"])
def test_gauss_seidel_matpower(data_path, case):
    from juliagrid_tpu.powerflow.gauss_seidel import gauss_seidel
    system = jg.power_system(str(data_path / f"{case}.m"))
    golden = h5group(data_path / "results.h5", f"{case}/gaussSeidel")
    analysis = gauss_seidel(system)
    power_flow(analysis, iteration=900)
    assert analysis.method.converged
    assert_voltage(golden, analysis, atol=1e-8)


def test_newton_raphson_powers(data_path):
    from juliagrid_tpu.postprocessing.ac import current as ac_current
    from juliagrid_tpu.postprocessing.ac import power as ac_power
    from .utils import assert_bus_balance, assert_power
    system = jg.power_system(str(data_path / "case14test.m"))
    golden = h5group(data_path / "results.h5", "case14test/newtonRaphson")
    analysis = newton_raphson(system)
    power_flow(analysis)
    ac_power(analysis)
    ac_current(analysis)
    assert_power(golden, analysis)
    assert_bus_balance(analysis)


def test_dc_power_flow_powers(data_path):
    from juliagrid_tpu.postprocessing.dc import power as dc_power
    from .utils import assert_dc_power
    system = jg.power_system(str(data_path / "case14test.m"))
    golden = h5group(data_path / "results.h5", "case14test/dcPowerFlow")
    analysis = dc_power_flow(system)
    power_flow(analysis)
    dc_power(analysis)
    assert_dc_power(golden, analysis)


def test_compare_ac_methods(data_path):
    """All AC methods converge to the same solution (reference
    'Compare AC Power Flows Methods' testset)."""
    from juliagrid_tpu.powerflow.fast_decoupled import (
        fast_newton_raphson_bx, fast_newton_raphson_xb)
    from juliagrid_tpu.powerflow.gauss_seidel import gauss_seidel

    system = jg.power_system(str(data_path / "case14test.m"))
    nr = newton_raphson(system)
    power_flow(nr)

    for build, kwargs in ((fast_newton_raphson_bx, dict(iteration=300)),
                          (fast_newton_raphson_xb, dict(iteration=300)),
                          (gauss_seidel, dict(iteration=1000,
                                              tolerance=1e-9))):
        analysis = build(system)
        power_flow(analysis, **kwargs)
        assert analysis.method.converged
        np.testing.assert_allclose(analysis.voltage.magnitude,
                                   nr.voltage.magnitude, atol=1e-7)
        np.testing.assert_allclose(analysis.voltage.angle,
                                   nr.voltage.angle, atol=1e-7)


def test_stepwise_api(data_path):
    """Reference mismatch!/solve! stepwise loop."""
    from juliagrid_tpu.powerflow.ac import mismatch, solve
    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = newton_raphson(system)
    for _ in range(20):
        dp, dq = mismatch(analysis)
        if dp < 1e-8 and dq < 1e-8:
            break
        solve(analysis)
    assert dp < 1e-8 and dq < 1e-8
    golden = h5group(data_path / "results.h5", "case14test/newtonRaphson")
    assert analysis.method.iteration == int(golden["iteration"][0])


def test_f32_fleet_screening(data_path):
    """f32 fast path converges to screening tolerance."""
    import jax.numpy as jnp
    from juliagrid_tpu.parallel.batch import (batched_nr_solve_f32_jit,
                                              batched_nr_solve_jit)

    system = jg.power_system(str(data_path / "case14test.m"))
    analysis = newton_raphson(system)
    arr = analysis.arrays
    nscen = 8
    rng = np.random.default_rng(2)
    scale = 1.0 + 0.03 * rng.standard_normal(nscen)
    vm0 = jnp.asarray(np.tile(analysis.voltage.magnitude, (nscen, 1)))
    va0 = jnp.asarray(np.tile(analysis.voltage.angle, (nscen, 1)))
    ps = jnp.asarray(np.asarray(arr.p_sched)[None, :] * scale[:, None])
    qs = jnp.asarray(np.asarray(arr.q_sched)[None, :] * scale[:, None])

    vm64, va64, _, conv64 = batched_nr_solve_jit(arr, vm0, va0, ps, qs,
                                                 tol=1e-8, max_iter=20)
    vm32, va32, _, conv32 = batched_nr_solve_f32_jit(arr, vm0, va0, ps, qs,
                                                     tol=1e-4, max_iter=20)
    assert bool(jnp.all(conv64)) and bool(jnp.all(conv32))
    assert vm32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(vm32), np.asarray(vm64),
                               atol=5e-4)


def test_batched_dc_solve_matches_single(data_path):
    """The product batched-DC API (factorize once, batch the triangular
    solves) matches per-scenario single solves exactly."""
    import jax.numpy as jnp

    from juliagrid_tpu.parallel import batched_dc_solve_jit
    from juliagrid_tpu.powerflow.dc import _dc_solve, dc_power_flow

    system = jg.power_system(str(data_path / "case14test.m"))
    pf = dc_power_flow(system)
    nscen = 8
    rng = np.random.default_rng(7)
    scale = 1.0 + 0.05 * rng.standard_normal(nscen)
    p_b = jnp.asarray(np.asarray(pf.arrays.p_sched)[None, :]
                      * scale[:, None])
    theta_b = batched_dc_solve_jit(pf.arrays, p_b)
    assert theta_b.shape == (nscen, system.bus.number)
    for k in range(nscen):
        th1 = _dc_solve(pf.arrays._replace(p_sched=p_b[k]), "LU")
        np.testing.assert_allclose(np.asarray(theta_b[k]), np.asarray(th1),
                                   atol=1e-10)
