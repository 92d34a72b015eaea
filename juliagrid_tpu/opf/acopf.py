"""AC optimal power flow on the in-house interior-point solver.

Model parity with /root/reference/src/optimalPowerFlow/acOptimalPowerFlow.jl:
variables V (bounded), θ (slack fixed), Pg/Qg (capability boxes,
out-of-service fixed at 0), piecewise epigraph helpers for both power kinds
(:436-484); nonlinear bus balance from the Y-bus pattern (:517-567);
trapezoidal P-Q capability-curve cuts (:570-627); flow limits with the
reference's type dispatch — 1 active power, 2/3 apparent (3 squared), 4/5
current magnitude (5 squared), with limit clamping and skip rules
(checkLimit, :695-703); angle-difference constraints (:495-514); objective
= full polynomial costs (quadratic + monomial tails, utility.jl:473-523)
plus piecewise affine/epigraph terms, for active and reactive costs.

The whole model is three pure JAX functions (objective/eq/ineq) over a flat
state vector — autodiff supplies exact Jacobians and the Lagrangian
Hessian to the IPM (opf/ipm.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..postprocessing.results import AcPower, Cartesian
from ..powerflow.ac import Polar
from ..system.model import model
from ..system.types import PowerSystem
from .dcopf import OpfMethod
from .ipm import NlpProblem, solve_nlp


@dataclass
class AcOptimalPowerFlow:
    system: PowerSystem
    voltage: Polar
    power: AcPower
    method: OpfMethod
    current: Optional[object] = None
    kind: str = "optimal_power_flow"
    _spec: Optional[object] = None
    _x0: Optional[np.ndarray] = None
    signature: dict = None

    def _refresh_spec(self):
        """Rebuild when the system moved past the captured revision
        (reference acOptimalPowerFlow.jl:275-283)."""
        rev = self.system.model.revision
        key = (rev.ac_model, rev.ac_pattern, rev.ac_optimization,
               rev.injection, rev.slack, rev.type)
        if self.signature != {"key": key}:
            from ..system.model import model as _model
            _model(self.system, "ac")
            old = self._spec
            self._spec = _AcSpec(self.system)
            if old is not None and old.n_x != self._spec.n_x:
                self._x0 = None
            if self._x0 is None:
                set_initial_point(self)
            self.signature = {"key": key}


def _poly_cost(poly):
    """Full polynomial evaluation (quad part + monomial tails)."""
    coeffs = np.asarray(poly, dtype=float)

    def f(p):
        val = 0.0
        deg = len(coeffs) - 1
        for k, c in enumerate(coeffs):
            val = val + c * p ** (deg - k)
        return val

    return f


class _AcSpec:
    def __init__(self, system: PowerSystem):
        model(system, "ac")
        n = system.bus.number
        g = system.generator.number
        bus = system.bus
        gen = system.generator
        self.n, self.g = n, g
        self.slack = bus.layout.slack
        self.slack_angle = float(bus.voltage.angle[self.slack])

        coo = system.model.ac.nodal.tocoo()
        order = np.lexsort((coo.col, coo.row))
        self.rows = jnp.asarray(coo.row[order].astype(np.int32))
        self.cols = jnp.asarray(coo.col[order].astype(np.int32))
        self.yg = jnp.asarray(coo.data[order].real)
        self.yb = jnp.asarray(coo.data[order].imag)

        self.pd = jnp.asarray(bus.demand.active.array[:n])
        self.qd = jnp.asarray(bus.demand.reactive.array[:n])
        self.gen_bus = jnp.asarray(gen.layout.bus.array[:g].astype(np.int32))
        self.gen_on = gen.layout.status.array[:g] == 1

        # ---- objective ---------------------------------------------------
        self.cost_terms = []       # (kind 'p'|'q', gen idx, callable)
        self.pw_cuts_p = []        # (gen, helper pos, slope, intercept)
        self.pw_cuts_q = []
        self.pw_gens_p = []
        self.pw_gens_q = []
        self.obj_const = 0.0

        for kind, cost, pw_gens, pw_cuts in (
                ("p", gen.cost.active, self.pw_gens_p, self.pw_cuts_p),
                ("q", gen.cost.reactive, self.pw_gens_q, self.pw_cuts_q)):
            for i in range(g):
                if not self.gen_on[i]:
                    continue
                cmodel = int(cost.model[i]) if i < len(cost.model) else 0
                if cmodel == 2 and i in cost.polynomial:
                    self.cost_terms.append(
                        (kind, i, _poly_cost(cost.polynomial[i])))
                elif cmodel == 1 and i in cost.piecewise:
                    pts = np.asarray(cost.piecewise[i])
                    if len(pts) == 2:
                        slope = ((pts[1, 1] - pts[0, 1])
                                 / (pts[1, 0] - pts[0, 0]))
                        icept = pts[0, 1] - pts[0, 0] * slope
                        self.cost_terms.append(
                            (kind, i,
                             (lambda s, c: lambda p: s * p + c)(
                                 slope, icept)))
                    elif len(pts) > 2:
                        hpos = len(pw_gens)
                        pw_gens.append(i)
                        for k in range(1, len(pts)):
                            slope = ((pts[k, 1] - pts[k - 1, 1])
                                     / (pts[k, 0] - pts[k - 1, 0]))
                            if not np.isfinite(slope):
                                raise ValueError(
                                    "piecewise cost has infinite slope")
                            pw_cuts.append(
                                (i, hpos, slope,
                                 slope * pts[k - 1, 0] - pts[k - 1, 1]))
                    else:
                        raise ValueError(
                            "piecewise cost requires at least two points")

        self.n_hp = len(self.pw_gens_p)
        self.n_hq = len(self.pw_gens_q)
        self.n_x = 2 * n + 2 * g + self.n_hp + self.n_hq

        # ---- inequality bookkeeping -------------------------------------
        self.ineq_tags = []
        vmin = bus.voltage.min_magnitude.array[:n]
        vmax = bus.voltage.max_magnitude.array[:n]
        self.v_lo = [(i, float(vmin[i])) for i in range(n)
                     if np.isfinite(vmin[i])]
        self.v_hi = [(i, float(vmax[i])) for i in range(n)
                     if np.isfinite(vmax[i])]
        for i, _ in self.v_lo:
            self.ineq_tags.append(("voltage_min", i))
        for i, _ in self.v_hi:
            self.ineq_tags.append(("voltage_max", i))

        cap = gen.capability
        self.p_lo, self.p_hi, self.q_lo, self.q_hi = [], [], [], []
        for i in range(g):
            if not self.gen_on[i]:
                continue
            for store, val, tag in (
                    (self.p_lo, cap.min_active[i], "active_min"),
                    (self.p_hi, cap.max_active[i], "active_max"),
                    (self.q_lo, cap.min_reactive[i], "reactive_min"),
                    (self.q_hi, cap.max_reactive[i], "reactive_max")):
                if np.isfinite(val):
                    store.append((i, float(val)))
                    self.ineq_tags.append((tag, i))

        # capability-curve cuts (reference capabilityCurve, :570-627)
        self.curve_cuts = []
        for i in range(g):
            if not self.gen_on[i]:
                continue
            low, up = cap.low_active[i], cap.up_active[i]
            if (low == 0.0 and up == 0.0) or low == up:
                continue
            if low >= up or cap.max_low_reactive[i] <= \
                    cap.min_low_reactive[i] or cap.max_up_reactive[i] <= \
                    cap.min_up_reactive[i]:
                raise ValueError("Capability curve is not correctly defined.")
            diff_p_inv = 1.0 / (up - low)
            min_low_p = cap.min_active[i] - low
            max_low_p = cap.max_active[i] - low

            diff_q = cap.max_up_reactive[i] - cap.max_low_reactive[i]
            max_q_min_p = cap.max_low_reactive[i] + min_low_p * diff_q \
                * diff_p_inv
            max_q_max_p = cap.max_low_reactive[i] + max_low_p * diff_q \
                * diff_p_inv
            if max_q_min_p < cap.max_reactive[i] \
                    or max_q_max_p < cap.max_reactive[i]:
                dq = cap.max_low_reactive[i] - cap.max_up_reactive[i]
                dp = up - low
                b = dq * low + dp * cap.max_low_reactive[i]
                scale = 1.0 / np.sqrt(dq**2 + dp**2)
                self.curve_cuts.append((i, scale * dq, scale * dp, scale * b))
                self.ineq_tags.append(("capability_upper", i))

            diff_q = cap.min_up_reactive[i] - cap.min_low_reactive[i]
            min_q_min_p = cap.min_low_reactive[i] + min_low_p * diff_q \
                * diff_p_inv
            min_q_max_p = cap.min_low_reactive[i] + max_low_p * diff_q \
                * diff_p_inv
            if min_q_min_p > cap.min_reactive[i] \
                    or min_q_max_p > cap.min_reactive[i]:
                dq = cap.min_up_reactive[i] - cap.min_low_reactive[i]
                dp = low - up
                b = dq * low + dp * cap.min_low_reactive[i]
                scale = 1.0 / np.sqrt(dq**2 + dp**2)
                self.curve_cuts.append((i, scale * dq, scale * dp, scale * b))
                self.ineq_tags.append(("capability_lower", i))

        # flow constraints (from/to, type dispatch)
        m = system.branch.number
        br = system.branch
        ac = system.model.ac
        self.flows = []
        for k in range(m):
            if br.layout.status[k] != 1:
                continue
            ftype = int(br.flow.type[k]) if len(br.flow.type) else 3
            sq = 2 if ftype in (3, 5) else 1
            for side, lo, hi in (
                    ("from", br.flow.min_from_bus[k], br.flow.max_from_bus[k]),
                    ("to", br.flow.min_to_bus[k], br.flow.max_to_bus[k])):
                lo, hi = float(lo), float(hi)
                if ftype != 1:
                    lo, hi = max(lo, 0.0), max(hi, 0.0)
                if (lo == 0.0 and hi == 0.0) or (np.isinf(lo)
                                                 and np.isinf(hi)):
                    continue
                lo_c, hi_c = lo ** sq, hi ** sq
                fb, tb = int(br.layout.from_bus[k]), int(br.layout.to_bus[k])
                self.flows.append((k, side, ftype, fb, tb, lo_c, hi_c))
                if np.isfinite(lo_c) and not (ftype != 1 and lo == 0.0):
                    self.ineq_tags.append((f"flow_{side}_min", k))
                if np.isfinite(hi_c):
                    self.ineq_tags.append((f"flow_{side}_max", k))

        self.angles = []
        two_pi = 2 * np.pi
        for k in range(m):
            if br.layout.status[k] != 1:
                continue
            lo = float(br.voltage.min_diff_angle[k]) if len(
                br.voltage.min_diff_angle) else -two_pi
            hi = float(br.voltage.max_diff_angle[k]) if len(
                br.voltage.max_diff_angle) else two_pi
            meaningful = ((np.isfinite(lo) and lo not in (0.0, -two_pi))
                          or (np.isfinite(hi) and hi not in (0.0, two_pi)))
            if meaningful:
                self.angles.append(
                    (int(br.layout.from_bus[k]), int(br.layout.to_bus[k]),
                     lo, hi, k))
                self.ineq_tags.append(("angle_min", k))
                self.ineq_tags.append(("angle_max", k))

        for (gi, *_rest) in self.pw_cuts_p:
            self.ineq_tags.append(("piecewise_active", gi))
        for (gi, *_rest) in self.pw_cuts_q:
            self.ineq_tags.append(("piecewise_reactive", gi))

        # branch two-port params for flow expressions
        self.br_yff = ac.nodal_from_from
        self.br_yft = ac.nodal_from_to
        self.br_ytf = ac.nodal_to_from
        self.br_ytt = ac.nodal_to_to

    # ---- state layout ----------------------------------------------------

    def split(self, x):
        n, g = self.n, self.g
        theta = x[:n]
        v = x[n:2 * n]
        pg = x[2 * n:2 * n + g]
        qg = x[2 * n + g:2 * n + 2 * g]
        hp = x[2 * n + 2 * g:2 * n + 2 * g + self.n_hp]
        hq = x[2 * n + 2 * g + self.n_hp:]
        return theta, v, pg, qg, hp, hq

    def _injections(self, theta, v):
        vi = v[self.rows]
        vj = v[self.cols]
        th = theta[self.rows] - theta[self.cols]
        t1 = vi * vj * (self.yg * jnp.cos(th) + self.yb * jnp.sin(th))
        t2 = vi * vj * (self.yg * jnp.sin(th) - self.yb * jnp.cos(th))
        import jax
        p = jax.ops.segment_sum(t1, self.rows, num_segments=self.n)
        q = jax.ops.segment_sum(t2, self.rows, num_segments=self.n)
        return p, q

    def objective(self, x):
        theta, v, pg, qg, hp, hq = self.split(x)
        val = self.obj_const
        for kind, i, fcn in self.cost_terms:
            val = val + fcn(pg[i] if kind == "p" else qg[i])
        if self.n_hp:
            val = val + jnp.sum(hp)
        if self.n_hq:
            val = val + jnp.sum(hq)
        return val

    def eq(self, x):
        theta, v, pg, qg, hp, hq = self.split(x)
        p_inj, q_inj = self._injections(theta, v)
        on = jnp.asarray(self.gen_on)
        sup_p = jnp.zeros(self.n).at[self.gen_bus].add(
            jnp.where(on, pg, 0.0))
        sup_q = jnp.zeros(self.n).at[self.gen_bus].add(
            jnp.where(on, qg, 0.0))
        out = [sup_p - p_inj - self.pd,
               sup_q - q_inj - self.qd,
               jnp.array([theta[self.slack] - self.slack_angle])]
        off_idx = np.flatnonzero(~self.gen_on)
        if len(off_idx):
            out.append(pg[off_idx])
            out.append(qg[off_idx])
        return jnp.concatenate(out)

    def _branch_pq(self, theta, v, k, fb, tb, side):
        """Complex branch flow S = P + jQ at the given end."""
        vf = v[fb] * jnp.exp(1j * theta[fb])
        vt = v[tb] * jnp.exp(1j * theta[tb])
        if side == "from":
            i_ = vf * self.br_yff[k] + vt * self.br_yft[k]
            s = vf * jnp.conj(i_)
        else:
            i_ = vf * self.br_ytf[k] + vt * self.br_ytt[k]
            s = vt * jnp.conj(i_)
        return jnp.real(s), jnp.imag(s), i_

    def ineq(self, x):
        theta, v, pg, qg, hp, hq = self.split(x)
        out = []
        for i, lo in self.v_lo:
            out.append(v[i] - lo)
        for i, hi in self.v_hi:
            out.append(hi - v[i])
        for i, lo in self.p_lo:
            out.append(pg[i] - lo)
        for i, hi in self.p_hi:
            out.append(hi - pg[i])
        for i, lo in self.q_lo:
            out.append(qg[i] - lo)
        for i, hi in self.q_hi:
            out.append(hi - qg[i])
        for (i, aq, ap, b) in self.curve_cuts:
            out.append(b - aq * pg[i] - ap * qg[i])
        for (k, side, ftype, fb, tb, lo, hi) in self.flows:
            p, q, i_ = self._branch_pq(theta, v, k, fb, tb, side)
            if ftype == 1:
                val = p
            elif ftype in (2, 3):
                val = p**2 + q**2
                if ftype == 2:
                    val = jnp.sqrt(val)
            else:
                val = jnp.real(i_) ** 2 + jnp.imag(i_) ** 2
                if ftype == 4:
                    val = jnp.sqrt(val)
            if np.isfinite(lo) and not (ftype != 1 and lo == 0.0):
                out.append(val - lo)
            if np.isfinite(hi):
                out.append(hi - val)
        for (fb, tb, lo, hi, _k) in self.angles:
            diff = theta[fb] - theta[tb]
            out.append(diff - lo)
            out.append(hi - diff)
        for (gi, hpos, slope, icept) in self.pw_cuts_p:
            out.append(icept - slope * pg[gi] + hp[hpos])
        for (gi, hpos, slope, icept) in self.pw_cuts_q:
            out.append(icept - slope * qg[gi] + hq[hpos])
        if not out:
            return None
        return jnp.stack([jnp.asarray(o) for o in out])


def ac_optimal_power_flow(system: PowerSystem) -> AcOptimalPowerFlow:
    """Reference acOptimalPowerFlow (acOptimalPowerFlow.jl:44-250)."""
    system.check_slack()
    model(system, "ac")
    spec = _AcSpec(system)
    n, g = spec.n, spec.g
    x0 = np.zeros(spec.n_x)
    x0[:n] = system.bus.voltage.angle.array[:n]
    x0[n:2 * n] = system.bus.voltage.magnitude.array[:n]
    x0[2 * n:2 * n + g] = system.generator.output.active.array[:g]
    x0[2 * n + g:2 * n + 2 * g] = system.generator.output.reactive.array[:g]
    if spec.n_hp or spec.n_hq:
        x0[2 * n + 2 * g:] = 1.0

    power = AcPower(generator=Cartesian(
        active=system.generator.output.active.array[:g].copy(),
        reactive=system.generator.output.reactive.array[:g].copy()))
    analysis = AcOptimalPowerFlow(
        system=system,
        voltage=Polar(system.bus.voltage.magnitude.array[:n].copy(),
                      system.bus.voltage.angle.array[:n].copy()),
        power=power,
        method=OpfMethod("ac_optimal_power_flow"),
    )
    analysis._spec = spec
    analysis._x0 = x0
    return analysis


def solve(analysis: AcOptimalPowerFlow, max_iter: int = 300,
          tolerance: float = 1e-9, verbose: int = 0) -> AcOptimalPowerFlow:
    analysis._refresh_spec()
    spec = analysis._spec
    import jax.numpy as jnp_
    has_ineq = spec.ineq(jnp_.asarray(analysis._x0)) is not None
    problem = NlpProblem(objective=spec.objective, eq=spec.eq,
                         ineq=spec.ineq if has_ineq else None)
    res = solve_nlp(problem, analysis._x0, max_iter=max_iter, tol=tolerance,
                    verbose=verbose)
    analysis.method.result = res
    analysis.method.iteration = res.iterations
    analysis.method.converged = res.converged
    analysis.method.objective = res.objective

    n, g = spec.n, spec.g
    analysis.voltage.angle = res.x[:n]
    analysis.voltage.magnitude = res.x[n:2 * n]
    pg = res.x[2 * n:2 * n + g].copy()
    qg = res.x[2 * n + g:2 * n + 2 * g].copy()
    pg[~spec.gen_on] = 0.0
    qg[~spec.gen_on] = 0.0
    analysis.power.generator = Cartesian(active=pg, reactive=qg)
    analysis._x0 = res.x
    analysis.method.dual = {
        "balance_active": res.y[:n],
        "balance_reactive": res.y[n:2 * n],
        "ineq": res.z,
        "ineq_tags": spec.ineq_tags,
    }
    return analysis


def set_initial_point(analysis: AcOptimalPowerFlow, source=None):
    spec = analysis._spec
    n, g = spec.n, spec.g
    system = analysis.system
    if source is None:
        x0 = np.zeros(spec.n_x)
        x0[:n] = system.bus.voltage.angle.array[:n]
        x0[n:2 * n] = system.bus.voltage.magnitude.array[:n]
        x0[2 * n:2 * n + g] = system.generator.output.active.array[:g]
        x0[2 * n + g:2 * n + 2 * g] = \
            system.generator.output.reactive.array[:g]
        if spec.n_hp or spec.n_hq:
            x0[2 * n + 2 * g:] = 1.0
        analysis._x0 = x0
    else:
        x0 = np.asarray(analysis._x0).copy()
        x0[:n] = source.voltage.angle[:n]
        if hasattr(source.voltage, "magnitude"):
            x0[n:2 * n] = source.voltage.magnitude[:n]
        if getattr(source, "power", None) is not None and \
                len(getattr(source.power.generator, "active", [])) == g:
            x0[2 * n:2 * n + g] = source.power.generator.active
            if len(getattr(source.power.generator, "reactive", [])) == g:
                x0[2 * n + g:2 * n + 2 * g] = \
                    source.power.generator.reactive
        analysis._x0 = x0
