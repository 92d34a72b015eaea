"""Compute substrate: mixed-precision linear algebra, the equation library,
BBD Schur solves."""

from . import linalg
from .linalg import KLU, LDLT, LL, LU, QR
