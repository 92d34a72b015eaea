"""DC state estimation (linear WLS).

Reference /root/reference/src/stateEstimation/dcStateEstimation.jl:44-153
(builder) and :342-435 (Normal/Orthogonal/PetersWilkinson solves). Rows:
wattmeter injections (B-row pattern, mean adjusted by shift power and shunt
conductance), wattmeter flows (±branch admittance, mean adjusted by
shift-angle power), PMU bus angles (identity, mean relative to the slack
angle). One masked mixed-precision solve on device; no iteration.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import linalg
from ..powerflow.ac import Polar
from ..system.model import model
from ..system.types import PowerSystem


class DcSeArrays(NamedTuple):
    h_dense: jax.Array   # f64[m, n] coefficient matrix
    mean: jax.Array      # f64[m]
    w: jax.Array         # f64[m]
    slack: jax.Array     # i32
    slack_angle: jax.Array


@dataclass
class DcSeMethod:
    name: str
    factorization: str = linalg.LU
    iteration: int = 0
    converged: bool = False
    inservice: int = 0
    residual: Optional[np.ndarray] = None
    jacobian: Optional[np.ndarray] = None
    precision_diag: Optional[np.ndarray] = None
    mean: Optional[np.ndarray] = None
    #: device index per row: ("watt", i) or ("pmu", i)
    row_device: Optional[list] = None


@dataclass
class DcStateEstimation:
    system: PowerSystem
    monitoring: object
    voltage: object
    method: DcSeMethod
    arrays: DcSeArrays
    power: Optional[object] = None
    kind: str = "state_estimation"
    signature: dict = field(default_factory=dict)

    def _refresh_arrays(self):
        rev = self.system.model.revision
        mrev = self.monitoring.revision
        sig = self.signature
        if (sig.get("dc_model") != rev.dc_model
                or sig.get("measurement") != mrev.measurement
                or sig.get("meas_values") != mrev.values
                or sig.get("slack") != rev.slack):
            self.arrays, self.method.row_device, self.method.inservice = \
                compile_dcse_arrays(self.system, self.monitoring)
            sig.update(dc_model=rev.dc_model, measurement=mrev.measurement,
                       meas_values=mrev.values, slack=rev.slack)


@dataclass
class Angle:
    angle: np.ndarray


def compile_dcse_arrays(system: PowerSystem, monitoring):
    model(system, "dc")
    n = system.bus.number
    dc = system.model.dc
    watt = monitoring.wattmeter
    pmu = monitoring.pmu
    bus = system.bus

    rows_h, mean, w, row_device = [], [], [], []
    inservice = 0

    bdense = np.asarray(dc.nodal.todense())
    f = system.branch.layout.from_bus
    t = system.branch.layout.to_bus
    shift = system.branch.parameter.shift_angle

    for i in range(watt.number):
        k = int(watt.layout.index[i])
        st = int(watt.active.status[i])
        inservice += st
        hrow = np.zeros(n)
        if watt.layout.bus[i]:
            hrow[:] = st * bdense[k]
            m = st * (watt.active.mean[i] - dc.shift_power[k]
                      - bus.shunt.conductance[k])
        else:
            adm = dc.admittance[k] if watt.layout.from_[i] \
                else -dc.admittance[k]
            adm *= st
            hrow[int(f[k])] = adm
            hrow[int(t[k])] = -adm
            m = st * (watt.active.mean[i] + shift[k] * adm)
        rows_h.append(hrow)
        mean.append(m)
        w.append(1.0 / watt.active.variance[i])
        row_device.append(("wattmeter", i))

    slack_angle = bus.voltage.angle[bus.layout.slack]
    for i in range(pmu.number):
        if not pmu.layout.bus[i]:
            continue
        st = int(pmu.angle.status[i])
        inservice += st
        hrow = np.zeros(n)
        hrow[int(pmu.layout.index[i])] = st
        rows_h.append(hrow)
        mean.append(st * (pmu.angle.mean[i] - slack_angle))
        w.append(1.0 / pmu.angle.variance[i])
        row_device.append(("pmu", i))

    h = np.asarray(rows_h) if rows_h else np.zeros((0, n))
    arr = DcSeArrays(
        h_dense=jnp.asarray(h),
        mean=jnp.asarray(np.asarray(mean)),
        w=jnp.asarray(np.asarray(w)),
        slack=jnp.asarray(bus.layout.slack, dtype=jnp.int32),
        slack_angle=jnp.asarray(slack_angle),
    )
    return arr, row_device, inservice


@partial(jax.jit, static_argnames="kind")
def _dcse_solve(arr: DcSeArrays, kind: str):
    n = arr.h_dense.shape[1]
    col_mask = jnp.ones(n).at[arr.slack].set(0.0)
    Hm = arr.h_dense * col_mask[None, :]
    if kind == linalg.QR:
        e = jnp.zeros((1, n)).at[0, arr.slack].set(1.0)
        A = jnp.concatenate([jnp.sqrt(arr.w)[:, None] * Hm, e], axis=0)
        b = jnp.concatenate([jnp.sqrt(arr.w) * arr.mean, jnp.zeros(1)])
        theta = linalg.solve(linalg.factorize(A, linalg.QR), b)
    else:
        WH = arr.w[:, None] * Hm
        gain = Hm.T @ WH + jnp.diag(1.0 - col_mask)
        theta = linalg.solve(linalg.factorize(gain, linalg.LU),
                             Hm.T @ (arr.w * arr.mean))
    return theta * col_mask + arr.slack_angle


def dc_state_estimation(monitoring,
                        factorization: str = linalg.LU) -> DcStateEstimation:
    """Reference dcStateEstimation (dcStateEstimation.jl:44-66)."""
    system = monitoring.system
    system.check_slack()
    model(system, "dc")
    arr, row_device, inservice = compile_dcse_arrays(system, monitoring)
    rev = system.model.revision
    method = DcSeMethod("dc_wls", factorization)
    method.row_device = row_device
    method.inservice = inservice
    return DcStateEstimation(
        system=system, monitoring=monitoring,
        voltage=Angle(np.zeros(system.bus.number)),
        method=method, arrays=arr,
        signature={"dc_model": rev.dc_model,
                   "measurement": monitoring.revision.measurement,
                   "meas_values": monitoring.revision.values,
                   "slack": rev.slack},
    )


def dc_se_solve(analysis: DcStateEstimation, power: bool = False):
    analysis._refresh_arrays()
    kind = linalg.QR if analysis.method.factorization == linalg.QR \
        else linalg.LU
    theta = _dcse_solve(analysis.arrays, kind)
    analysis.voltage.angle = np.asarray(theta)
    analysis.method.converged = True
    analysis.method.residual = (np.asarray(analysis.arrays.mean)
                                + np.asarray(analysis.arrays.slack_angle) * 0
                                - np.asarray(analysis.arrays.h_dense)
                                @ (analysis.voltage.angle
                                   - float(analysis.arrays.slack_angle)))
    analysis.method.jacobian = np.asarray(analysis.arrays.h_dense)
    analysis.method.precision_diag = np.asarray(analysis.arrays.w)
    analysis.method.mean = np.asarray(analysis.arrays.mean)
    if power:
        from ..postprocessing.dc import power as dc_power
        dc_power(analysis)
    return analysis
