"""LAV (least absolute value) state estimation — placeholder.

The reference builds LAV as an L1 optimization over JuMP/Ipopt
(acStateEstimation.jl:629-853). Here it reduces to an LP solved by the
in-house interior-point method (opf/ipm.py); wired up once the IPM lands.
"""

from __future__ import annotations


def lav_solve(analysis, iteration=40, power=False, current=False):
    raise NotImplementedError(
        "LAV estimation lands with the interior-point solver (opf/ipm.py)")
