"""Measurement constructors and the ``ems`` bootstrap
(reference measurement/load.jl:31-163)."""

from __future__ import annotations

import os

from ..system.load import power_system
from .types import Measurement


def measurement(system, path: str | None = None) -> Measurement:
    monitoring = Measurement(system=system)
    if path is not None:
        ext = os.path.splitext(path)[1].lower()
        if ext in (".h5", ".hdf5"):
            from .hdf5io import load_measurement
            load_measurement(monitoring, path)
        else:
            raise ValueError(f"the file extension {ext!r} is not supported")
    return monitoring


def ems(system_file: str | None = None, monitoring_file: str | None = None,
        optimal: bool = True):
    """One-call bootstrap: returns (system, monitoring)."""
    system = power_system(system_file, optimal=optimal)
    monitoring = measurement(system, monitoring_file)
    return system, monitoring
