"""Linear PMU state estimation in rectangular coordinates.

Reference /root/reference/src/stateEstimation/pmuStateEstimation.jl:42-177
(builder: bus phasor identity rows and branch current rows from the complex
two-port row [y_ff, y_ft] / [y_tf, y_tt]), :369-473 (WLS solves). State is
(Re V, Im V) for every bus — no slack handling; angle reference comes from
the phasor measurements themselves. Exact linear model: one
mixed-precision solve, no iteration. Correlated PMUs contribute 2x2
precision blocks exactly as in the AC SE path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import equations as eq
from ..ops import linalg
from ..powerflow.ac import Polar
from ..system.model import model
from ..system.types import PowerSystem


class PmuSeArrays(NamedTuple):
    h_dense: jax.Array   # f64[2p, 2n]
    mean: jax.Array      # f64[2p]
    w: jax.Array         # f64[2p]
    pair_r1: jax.Array
    pair_r2: jax.Array
    pair_off: jax.Array


@dataclass
class PmuSeMethod:
    name: str
    factorization: str = linalg.LU
    iteration: int = 0
    converged: bool = False
    inservice: int = 0
    residual: Optional[np.ndarray] = None
    jacobian: Optional[np.ndarray] = None
    precision_diag: Optional[np.ndarray] = None
    mean: Optional[np.ndarray] = None


@dataclass
class PmuStateEstimation:
    system: PowerSystem
    monitoring: object
    voltage: Polar
    method: PmuSeMethod
    arrays: PmuSeArrays
    power: Optional[object] = None
    current: Optional[object] = None
    kind: str = "state_estimation"
    signature: dict = field(default_factory=dict)

    def _refresh_arrays(self):
        rev = self.system.model.revision
        mrev = self.monitoring.revision
        sig = self.signature
        if (sig.get("ac_model") != rev.ac_model
                or sig.get("measurement") != mrev.measurement
                or sig.get("meas_values") != mrev.values):
            self.arrays, self.method.inservice = compile_pmuse_arrays(
                self.system, self.monitoring)
            sig.update(ac_model=rev.ac_model, measurement=mrev.measurement,
                       meas_values=mrev.values)


def compile_pmuse_arrays(system: PowerSystem, monitoring):
    model(system, "ac")
    n = system.bus.number
    ac = system.model.ac
    pmu = monitoring.pmu
    p = pmu.number

    h = np.zeros((2 * p, 2 * n))
    mean = np.zeros(2 * p)
    w = np.zeros(2 * p)
    pair_r1, pair_r2, pair_off = [], [], []
    inservice = 0

    f = system.branch.layout.from_bus
    t = system.branch.layout.to_bus

    for i in range(p):
        k = int(pmu.layout.index[i])
        ang = pmu.angle.mean[i]
        mag = pmu.magnitude.mean[i]
        cos_t, sin_t = np.cos(ang), np.sin(ang)
        var_re, var_im = eq.variance_pmu(
            pmu.magnitude.variance[i], pmu.angle.variance[i],
            mag, cos_t, sin_t)
        r_re, r_im = 2 * i, 2 * i + 1
        if pmu.layout.correlated[i]:
            w11, w22, off = eq.covariance_pmu(
                pmu.magnitude.variance[i], pmu.angle.variance[i], mag,
                cos_t, sin_t, var_re, var_im)
            w[r_re], w[r_im] = w11, w22
            pair_r1.append(r_re)
            pair_r2.append(r_im)
            pair_off.append(off)
        else:
            w[r_re], w[r_im] = 1.0 / var_re, 1.0 / var_im

        on = (pmu.magnitude.status[i] == 1 and pmu.angle.status[i] == 1)
        if not on:
            continue
        inservice += 2
        mean[r_re] = mag * cos_t
        mean[r_im] = mag * sin_t

        if pmu.layout.bus[i]:
            h[r_re, k] = 1.0
            h[r_im, n + k] = 1.0
        else:
            fb, tb = int(f[k]), int(t[k])
            if pmu.layout.from_[i]:
                cf = ac.nodal_from_from[k]
                ct = ac.nodal_from_to[k]
            else:
                cf = ac.nodal_to_from[k]
                ct = ac.nodal_to_to[k]
            # ReI row:  Re(c) ReV - Im(c) ImV ; ImI row: Im(c) ReV + Re(c) ImV
            h[r_re, fb] = cf.real
            h[r_re, n + fb] = -cf.imag
            h[r_re, tb] = ct.real
            h[r_re, n + tb] = -ct.imag
            h[r_im, fb] = cf.imag
            h[r_im, n + fb] = cf.real
            h[r_im, tb] = ct.imag
            h[r_im, n + tb] = ct.real

    arr = PmuSeArrays(
        h_dense=jnp.asarray(h),
        mean=jnp.asarray(mean),
        w=jnp.asarray(w),
        pair_r1=jnp.asarray(np.asarray(pair_r1, dtype=np.int32)),
        pair_r2=jnp.asarray(np.asarray(pair_r2, dtype=np.int32)),
        pair_off=jnp.asarray(np.asarray(pair_off)),
    )
    return arr, inservice


@partial(jax.jit, static_argnames="kind")
def _pmuse_solve(arr: PmuSeArrays, kind: str):
    H = arr.h_dense
    if kind == linalg.QR:
        A = jnp.sqrt(arr.w)[:, None] * H
        x = linalg.solve(linalg.factorize(A, linalg.QR),
                         jnp.sqrt(arr.w) * arr.mean)
    else:
        WH = arr.w[:, None] * H
        wz = arr.w * arr.mean
        if arr.pair_r1.shape[0]:
            WH = WH.at[arr.pair_r1].add(
                arr.pair_off[:, None] * H[arr.pair_r2])
            WH = WH.at[arr.pair_r2].add(
                arr.pair_off[:, None] * H[arr.pair_r1])
            wz = wz.at[arr.pair_r1].add(arr.pair_off * arr.mean[arr.pair_r2])
            wz = wz.at[arr.pair_r2].add(arr.pair_off * arr.mean[arr.pair_r1])
        gain = H.T @ WH
        x = linalg.solve(linalg.factorize(gain, linalg.LU), H.T @ wz)
    n = H.shape[1] // 2
    re, im = x[:n], x[n:]
    return jnp.sqrt(re**2 + im**2), jnp.arctan2(im, re)


def pmu_state_estimation(monitoring, factorization: str = linalg.LU
                         ) -> PmuStateEstimation:
    """Reference pmuStateEstimation (pmuStateEstimation.jl:42-70)."""
    system = monitoring.system
    model(system, "ac")
    arr, inservice = compile_pmuse_arrays(system, monitoring)
    rev = system.model.revision
    method = PmuSeMethod("pmu_wls", factorization)
    method.inservice = inservice
    n = system.bus.number
    return PmuStateEstimation(
        system=system, monitoring=monitoring,
        voltage=Polar(np.zeros(n), np.zeros(n)),
        method=method, arrays=arr,
        signature={"ac_model": rev.ac_model,
                   "measurement": monitoring.revision.measurement,
                   "meas_values": monitoring.revision.values},
    )


def pmu_se_solve(analysis: PmuStateEstimation, power: bool = False,
                 current: bool = False):
    analysis._refresh_arrays()
    kind = linalg.QR if analysis.method.factorization == linalg.QR \
        else linalg.LU
    vm, va = _pmuse_solve(analysis.arrays, kind)
    analysis.voltage.magnitude = np.asarray(vm)
    analysis.voltage.angle = np.asarray(va)
    analysis.method.converged = True
    n = analysis.system.bus.number
    x = np.concatenate([analysis.voltage.magnitude * np.cos(
        analysis.voltage.angle), analysis.voltage.magnitude * np.sin(
        analysis.voltage.angle)])
    analysis.method.residual = (np.asarray(analysis.arrays.mean)
                                - np.asarray(analysis.arrays.h_dense) @ x)
    analysis.method.jacobian = np.asarray(analysis.arrays.h_dense)
    analysis.method.precision_diag = np.asarray(analysis.arrays.w)
    analysis.method.mean = np.asarray(analysis.arrays.mean)
    if power:
        from ..postprocessing.ac import power as ac_power
        ac_power(analysis)
    if current:
        from ..postprocessing.ac import current as ac_current
        ac_current(analysis)
    return analysis
