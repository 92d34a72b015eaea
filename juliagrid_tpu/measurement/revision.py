"""Measurement revision counter (reference MeasurementRevision,
definition/system.jl:404-406)."""

from dataclasses import dataclass


@dataclass
class MeasurementRevision:
    measurement: int = 0
