"""Observability and PMU placement tests (pattern of
/root/reference/test/stateEstimation/observability.jl and pmuPlacement.jl)."""

import numpy as np
import pytest

import juliagrid_tpu as jg
from juliagrid_tpu.estimation.acse import gauss_newton, state_estimation
from juliagrid_tpu.estimation.observability import (island_topological,
                                                    island_topological_flow,
                                                    pmu_placement,
                                                    pmu_placement_apply,
                                                    restoration_gram)
from juliagrid_tpu.estimation.pmuse import pmu_state_estimation
from juliagrid_tpu.estimation import state_estimation as se_mod
from juliagrid_tpu.measurement.devices import (add_pmu, add_varmeter,
                                               add_voltmeter, add_wattmeter)
from juliagrid_tpu.measurement.load import measurement
from juliagrid_tpu.postprocessing.ac import current as ac_current
from juliagrid_tpu.postprocessing.ac import power as ac_power
from juliagrid_tpu.powerflow.ac import newton_raphson
from juliagrid_tpu.powerflow.driver import power_flow


@pytest.fixture(scope="module")
def solved14(data_path):
    system = jg.power_system(str(data_path / "case14test.m"))
    pf = newton_raphson(system)
    power_flow(pf)
    ac_power(pf)
    ac_current(pf)
    return system, pf


def test_full_flow_measurements_one_island(solved14):
    system, pf = solved14
    monitoring = measurement(system)
    add_wattmeter(monitoring, analysis=pf, status_bus=-1)
    add_varmeter(monitoring, analysis=pf, status_bus=-1)
    islands = island_topological_flow(monitoring)
    assert len(islands.island) == 1
    assert sorted(islands.island[0]) == list(range(system.bus.number))
    assert not islands.tie.branch


def test_no_measurements_all_singletons(solved14):
    system, pf = solved14
    monitoring = measurement(system)
    islands = island_topological(monitoring)
    assert len(islands.island) == system.bus.number


def test_injections_merge_islands(solved14):
    system, pf = solved14
    monitoring = measurement(system)
    # injections everywhere + no flows: topological merging via injections
    add_wattmeter(monitoring, analysis=pf, status_from=-1, status_to=-1)
    add_varmeter(monitoring, analysis=pf, status_from=-1, status_to=-1)
    islands = island_topological(monitoring)
    assert len(islands.island) == 1


def test_restoration_promotes_pseudo(solved14):
    system, pf = solved14
    monitoring = measurement(system)
    # flows only on the first ten in-service branches -> islands remain
    added = 0
    for k in range(system.branch.number):
        if system.branch.layout.status[k] != 1 or added >= 10:
            continue
        label = system.branch.label.label(k)
        add_wattmeter(monitoring, from_branch=label,
                      active=float(pf.power.from_.active[k]))
        add_varmeter(monitoring, from_branch=label,
                     reactive=float(pf.power.from_.reactive[k]))
        added += 1
    islands = island_topological(monitoring)
    assert len(islands.island) > 1

    pseudo = measurement(system)
    add_wattmeter(pseudo, analysis=pf, status_from=-1, status_to=-1)
    add_varmeter(pseudo, analysis=pf, status_from=-1, status_to=-1)
    n_before = monitoring.wattmeter.number
    restoration_gram(monitoring, pseudo, islands)
    assert monitoring.wattmeter.number > n_before

    islands2 = island_topological(monitoring)
    assert len(islands2.island) == 1

    # and the restored set plus voltage anchors estimates the PF state
    add_voltmeter(monitoring, analysis=pf)
    se = gauss_newton(monitoring)
    state_estimation(se)
    assert se.method.converged
    np.testing.assert_allclose(se.voltage.magnitude, pf.voltage.magnitude,
                               atol=1e-6)


def test_pmu_placement_observable(solved14):
    system, pf = solved14
    monitoring = measurement(system)
    placement = pmu_placement_apply(monitoring, pf)
    assert len(placement.bus) >= 3  # known optimum for IEEE 14 is 4 buses
    se = pmu_state_estimation(monitoring)
    se_mod(se) if callable(se_mod) else None
    from juliagrid_tpu.estimation.pmuse import pmu_se_solve
    pmu_se_solve(se)
    np.testing.assert_allclose(se.voltage.magnitude, pf.voltage.magnitude,
                               atol=1e-6)
    np.testing.assert_allclose(se.voltage.angle, pf.voltage.angle, atol=1e-6)


def test_restoration_with_reference_fixtures(data_path):
    """End-to-end on the reference's own fixture files: limited wattmeter
    set -> islands -> restoration from pseudo.h5 (the reference's
    restorationGram! doctest scenario)."""
    from juliagrid_tpu.measurement.configuration import seed, status_wattmeter

    system, monitoring, pseudo = jg.ems(
        str(data_path / "case14.h5"), str(data_path / "monitoring.h5"),
        str(data_path / "pseudo.h5"))
    seed(4)
    status_wattmeter(monitoring, inservice=10)
    # pair varmeter statuses with wattmeters (standard observability) and
    # retire the PMUs — monitoring.h5 ships full bus-PMU coverage, which
    # makes the system observable regardless of the wattmeter set
    for i in range(monitoring.varmeter.number):
        monitoring.varmeter.reactive.status[i] = \
            monitoring.wattmeter.active.status[i]
    for i in range(monitoring.pmu.number):
        monitoring.pmu.magnitude.status[i] = 0
        monitoring.pmu.angle.status[i] = 0
    monitoring.changed()

    islands = island_topological(monitoring)
    n_before = len(islands.island)
    assert n_before > 1

    restoration_gram(monitoring, pseudo, islands)
    islands2 = island_topological(monitoring)
    assert len(islands2.island) < n_before
