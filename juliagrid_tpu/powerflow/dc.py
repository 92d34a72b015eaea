"""DC power flow (reference /root/reference/src/powerFlow/dcPowerFlow.jl).

One masked linear solve: B θ = P_injected - P_shift - G_shunt with the slack
row/column masked to identity (dcPowerFlow.jl:89-134), then the slack angle
offset added back. Runs as a single jitted mixed-precision solve; ``vmap``
over injection vectors gives batched contingency/scenario studies sharing
one factorization.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import linalg
from ..system.model import model
from ..system.types import PowerSystem
from .ac import MethodState, change_slack_bus


class DcArrays(NamedTuple):
    b_dense: jax.Array   # f64[n,n] B' matrix (dense snapshot)
    slack: jax.Array     # i32
    p_sched: jax.Array   # f64[n] supply - demand
    shift: jax.Array     # f64[n] shift-angle power
    gshunt: jax.Array    # f64[n] shunt conductance
    slack_angle: jax.Array  # f64 scalar


@dataclass
class Angle:
    angle: np.ndarray


@dataclass
class DcPowerFlow:
    system: PowerSystem
    voltage: Angle
    method: MethodState
    arrays: DcArrays
    power: Optional[object] = None
    signature: dict = field(default_factory=dict)

    def _refresh_arrays(self):
        rev = self.system.model.revision
        sig = self.signature
        if (sig.get("dc_model") != rev.dc_model
                or sig.get("dc_pattern") != rev.dc_pattern
                or sig.get("injection") != rev.injection
                or sig.get("slack") != rev.slack):
            self.arrays = compile_dc_arrays(self.system)
            sig.update(dc_model=rev.dc_model, dc_pattern=rev.dc_pattern,
                       injection=rev.injection, slack=rev.slack)


def compile_dc_arrays(system: PowerSystem) -> DcArrays:
    model(system, "dc")
    n = system.bus.number
    b = np.asarray(system.model.dc.nodal.todense())
    return DcArrays(
        b_dense=jnp.asarray(b),
        slack=jnp.asarray(system.bus.layout.slack, dtype=jnp.int32),
        p_sched=jnp.asarray(system.bus.supply.active.array[:n]
                            - system.bus.demand.active.array[:n]),
        shift=jnp.asarray(system.model.dc.shift_power),
        gshunt=jnp.asarray(system.bus.shunt.conductance.array[:n]),
        slack_angle=jnp.asarray(
            system.bus.voltage.angle[int(system.bus.layout.slack)]),
    )


@partial(jax.jit, static_argnames="kind")
def _dc_solve(arr: DcArrays, kind: str):
    n = arr.b_dense.shape[0]
    rhs = arr.p_sched - arr.shift - arr.gshunt
    m = (jnp.arange(n) != arr.slack).astype(arr.b_dense.dtype)
    b = m[:, None] * arr.b_dense * m[None, :] + jnp.diag(1.0 - m)
    theta = linalg.solve(linalg.factorize(b, kind), rhs * m)
    return theta + arr.slack_angle


def dc_power_flow(system: PowerSystem,
                  factorization: str = linalg.LU) -> DcPowerFlow:
    """Reference dcPowerFlow (dcPowerFlow.jl:42-70)."""
    system.check_slack()
    change_slack_bus(system)
    model(system, "dc")
    arrays = compile_dc_arrays(system)
    rev = system.model.revision
    return DcPowerFlow(
        system=system,
        voltage=Angle(np.zeros(system.bus.number)),
        method=MethodState("dc_power_flow", factorization),
        arrays=arrays,
        signature={"dc_model": rev.dc_model, "dc_pattern": rev.dc_pattern,
                   "injection": rev.injection, "slack": rev.slack},
    )


def dc_solve(analysis: DcPowerFlow, verbose: int | None = None):
    """Reference solve! for DC power flow."""
    verbose = 0 if verbose is None else verbose
    if verbose:
        from ..report.solver import (print_exit, print_middle_pf,
                                     print_top)
        print_top(analysis.system, analysis, verbose)
        print_middle_pf(analysis.system, analysis, verbose)
    analysis._refresh_arrays()
    theta = _dc_solve(analysis.arrays, analysis.method.factorization)
    analysis.voltage.angle = np.asarray(theta)
    analysis.method.converged = True
    if verbose:
        print_exit("dc_power_flow", True, False, 0, verbose)
    return analysis
