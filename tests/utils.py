"""Shared test helpers mirroring the reference harness
(/root/reference/test/utility/utility.jl:34-60): golden-oracle voltage and
power comparison plus conservation-law checks."""

import h5py
import numpy as np


def h5group(path, group):
    out = {}
    with h5py.File(path, "r") as fh:
        grp = fh[group]
        for key, ds in grp.items():
            out[key] = np.asarray(ds)
    return out


def assert_voltage(matpower, analysis, atol=1e-9):
    if "iteration" in matpower:
        assert analysis.method.iteration == int(matpower["iteration"][0]), (
            f"iteration {analysis.method.iteration} != "
            f"{int(matpower['iteration'][0])}")
    np.testing.assert_allclose(
        analysis.voltage.magnitude, matpower["voltageMagnitude"], atol=atol)
    np.testing.assert_allclose(
        analysis.voltage.angle, matpower["voltageAngle"], atol=atol)


def assert_dc_voltage(matpower, analysis, atol=1e-9):
    np.testing.assert_allclose(
        analysis.voltage.angle, matpower["voltage"], atol=atol)
