"""DC optimal power flow on the in-house interior-point solver.

Model parity with /root/reference/src/optimalPowerFlow/dcOptimalPowerFlow.jl:
variables θ (all buses, slack fixed) and Pg (all generators, out-of-service
fixed at 0) plus epigraph helpers for piecewise costs (>2 points); balance
equalities with rhs = demand + shunt conductance + shift power (:229-255);
capability boxes; flow limits only when a bound is nonzero and finite
(:258-277); angle-difference limits when meaningful (acOptimalPowerFlow.jl
addAngle); cost machinery: polynomial (last-3 quadratic truncation,
utility.jl:473-510), 2-point piecewise as affine, >2-point piecewise as
epigraph cuts (acOptimalPowerFlow.jl:436-484).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..postprocessing.results import Cartesian, DcPower
from ..powerflow.dc import Angle
from ..system.model import model
from ..system.types import PowerSystem
from .ipm import IpmResult, NlpProblem, solve_nlp


@dataclass
class OpfMethod:
    name: str
    result: Optional[IpmResult] = None
    iteration: int = 0
    converged: bool = False
    objective: float = 0.0
    dual: dict = field(default_factory=dict)


@dataclass
class DcOptimalPowerFlow:
    system: PowerSystem
    voltage: Angle
    power: DcPower
    method: OpfMethod
    kind: str = "optimal_power_flow"
    _spec: Optional[object] = None
    #: warm-start state vector (reference setInitialPoint! semantics)
    _x0: Optional[np.ndarray] = None
    signature: dict = None

    def _refresh_spec(self):
        """Rebuild the problem structure when the system moved past the
        captured revision (reference dcOptimalPowerFlow solve! signature
        check, dcOptimalPowerFlow.jl:298-310)."""
        rev = self.system.model.revision
        key = (rev.dc_model, rev.dc_pattern, rev.dc_optimization,
               rev.injection, rev.slack)
        if self.signature != {"key": key}:
            from ..system.model import model as _model
            _model(self.system, "dc")
            old = self._spec
            self._spec = _DcSpec(self.system)
            if old is not None and old.n_x != self._spec.n_x:
                self._x0 = None
            if self._x0 is None:
                n, gg = self._spec.n, self._spec.g
                x0 = np.zeros(self._spec.n_x)
                x0[:n] = self.system.bus.voltage.angle.array[:n]
                x0[n:n + gg] = \
                    self.system.generator.output.active.array[:gg]
                self._spec.push_inside(x0)
                if self._spec.n_h:
                    self._spec.init_helpers(x0)
                self._x0 = x0
            self.signature = {"key": key}


class _DcSpec:
    """Host-compiled problem structure (indices + constants)."""

    def __init__(self, system: PowerSystem):
        model(system, "dc")
        n = system.bus.number
        g = system.generator.number
        gen = system.generator
        bus = system.bus

        self.n, self.g = n, g
        self.slack = bus.layout.slack
        self.slack_angle = float(bus.voltage.angle[self.slack])
        self.b_dense = jnp.asarray(np.asarray(system.model.dc.nodal.todense()))
        self.rhs = jnp.asarray(
            bus.demand.active.array[:n] + bus.shunt.conductance.array[:n]
            + system.model.dc.shift_power)
        self.gen_bus = jnp.asarray(
            gen.layout.bus.array[:g].astype(np.int32))
        self.gen_on = gen.layout.status.array[:g] == 1

        self._build_objective(system)
        self.n_h = len(self.pw_gens)
        self.n_x = n + g + self.n_h

        cap_lo, cap_hi, fix_p = [], [], []
        for i in range(g):
            if not self.gen_on[i]:
                continue
            lo = gen.capability.min_active[i]
            hi = gen.capability.max_active[i]
            if np.isfinite(lo) and lo == hi:
                # fixed output: an equality row, not two opposing
                # inequalities (their slacks could never both stay > 0)
                fix_p.append((i, float(lo)))
                continue
            if np.isfinite(lo):
                cap_lo.append((i, float(lo)))
            if np.isfinite(hi):
                cap_hi.append((i, float(hi)))
        self.cap_lo = cap_lo
        self.cap_hi = cap_hi
        self.fix_p = fix_p

        m = system.branch.number
        br = system.branch
        flows = []
        for k in range(m):
            if br.layout.status[k] != 1:
                continue
            lo = br.flow.min_from_bus[k]
            hi = br.flow.max_from_bus[k]
            if (lo != 0.0 and np.isfinite(lo)) or (hi != 0.0
                                                   and np.isfinite(hi)):
                adm = system.model.dc.admittance[k]
                flows.append((int(br.layout.from_bus[k]),
                              int(br.layout.to_bus[k]),
                              float(adm), float(br.parameter.shift_angle[k]),
                              float(lo), float(hi), k))
        self.flows = flows

        angles = []
        two_pi = 2 * np.pi
        for k in range(m):
            if br.layout.status[k] != 1:
                continue
            lo = br.voltage.min_diff_angle[k] if len(
                br.voltage.min_diff_angle) else -two_pi
            hi = br.voltage.max_diff_angle[k] if len(
                br.voltage.max_diff_angle) else two_pi
            meaningful = ((np.isfinite(lo) and lo not in (0.0, -two_pi))
                          or (np.isfinite(hi) and hi not in (0.0, two_pi)))
            if meaningful:
                angles.append((int(br.layout.from_bus[k]),
                               int(br.layout.to_bus[k]), float(lo),
                               float(hi), k))
        self.angles = angles

        self._finalize()

    def _build_objective(self, system):
        """(Re)derive the cost arrays and piecewise cuts from the system
        (reference addObjective/addPiecewise, acOptimalPowerFlow.jl:377-484
        DC variant). Live cost edits re-run this; if the epigraph helper
        count changes the caller must rebuild the spec (state size)."""
        g = self.g
        gen = system.generator
        self.pw_gens = []       # gens with >2 piecewise points
        self.pw_cuts = []       # (gen_pos_in_x, helper_pos, slope, intercept)
        self.obj_quad = np.zeros(g)
        self.obj_lin = np.zeros(g)
        self.obj_const = 0.0

        cost = gen.cost.active
        for i in range(g):
            if not self.gen_on[i]:
                continue
            cmodel = int(cost.model[i]) if i < len(cost.model) else 0
            if cmodel == 2:
                poly = cost.polynomial[i]
                if len(poly) >= 3:
                    self.obj_quad[i] = poly[-3]
                    self.obj_lin[i] = poly[-2]
                    self.obj_const += poly[-1]
                elif len(poly) == 2:
                    self.obj_lin[i] = poly[0]
                    self.obj_const += poly[1]
                elif len(poly) == 1:
                    self.obj_const += poly[0]
            elif cmodel == 1:
                pts = cost.piecewise[i]
                if len(pts) == 2:
                    slope = (pts[1, 1] - pts[0, 1]) / (pts[1, 0] - pts[0, 0])
                    self.obj_lin[i] += slope
                    self.obj_const += pts[0, 1] - pts[0, 0] * slope
                elif len(pts) > 2:
                    hpos = len(self.pw_gens)
                    self.pw_gens.append(i)
                    for k in range(1, len(pts)):
                        slope = ((pts[k, 1] - pts[k - 1, 1])
                                 / (pts[k, 0] - pts[k - 1, 0]))
                        if not np.isfinite(slope):
                            raise ValueError(
                                "piecewise cost has an infinite slope")
                        self.pw_cuts.append(
                            (i, hpos, slope,
                             slope * pts[k - 1, 0] - pts[k - 1, 1]))
                else:
                    raise ValueError(
                        "piecewise cost requires at least two points")

    def _finalize(self):
        """Rebuild the inequality tag registry in the EXACT emission order
        of ``ineq`` (all capability mins, all maxes, flows min/max per
        branch, angles, piecewise cuts) so the dual harvest stays aligned;
        live edits (opf/edit.py) re-run this after list surgery."""
        tags = []
        for i, _ in self.cap_lo:
            tags.append(("capability_min", i))
        for i, _ in self.cap_hi:
            tags.append(("capability_max", i))
        for (_f, _t, _adm, _phi, lo, hi, k) in self.flows:
            if np.isfinite(lo):
                tags.append(("flow_min", k))
            if np.isfinite(hi):
                tags.append(("flow_max", k))
        for (_f, _t, _lo, _hi, k) in self.angles:
            tags.append(("angle_min", k))
            tags.append(("angle_max", k))
        for (gi, _hpos, _slope, _icept) in self.pw_cuts:
            tags.append(("piecewise", gi))
        self.ineq_tags = tags

    def init_helpers(self, x0):
        """Initialize epigraph helpers to the piecewise cost at the starting
        outputs so every cut holds at the initial point (see the AC spec's
        init_helpers for why a constant start cripples the IPM)."""
        n, g = self.n, self.g
        if not self.n_h:
            return
        pg0 = x0[n:n + g]
        h = np.full(self.n_h, -np.inf)
        for gi, hpos, slope, icept in self.pw_cuts:
            h[hpos] = max(h[hpos], slope * pg0[gi] - icept)
        x0[n + g:] = np.where(np.isfinite(h), h + 1e-3, 1.0)

    def push_inside(self, x0):
        """Project the start strictly inside the capability boxes and set
        fixed outputs exactly (Ipopt push_x0; see the AC spec)."""
        n, g = self.n, self.g
        kappa = 0.01
        lo = np.full(g, -np.inf)
        hi = np.full(g, np.inf)
        for i, b in self.cap_lo:
            lo[i] = b
        for i, b in self.cap_hi:
            hi[i] = b
        pl = np.where(np.isfinite(lo),
                      kappa * np.maximum(1.0, np.abs(lo)), 0.0)
        pu = np.where(np.isfinite(hi),
                      kappa * np.maximum(1.0, np.abs(hi)), 0.0)
        both = np.isfinite(lo) & np.isfinite(hi)
        width = np.where(both, hi - lo, np.inf)
        pl = np.minimum(pl, kappa * width)
        pu = np.minimum(pu, kappa * width)
        lo_eff = np.where(np.isfinite(lo), lo + pl, -np.inf)
        hi_eff = np.where(np.isfinite(hi), hi - pu, np.inf)
        x0[n:n + g] = np.clip(x0[n:n + g], np.minimum(lo_eff, hi_eff),
                              np.maximum(lo_eff, hi_eff))
        for i, b in self.fix_p:
            x0[n + i] = b

    # ---- NLP functions ---------------------------------------------------

    def split(self, x):
        n, g = self.n, self.g
        return x[:n], x[n:n + g], x[n + g:]

    def objective(self, x):
        theta, pg, h = self.split(x)
        val = (jnp.sum(jnp.asarray(self.obj_quad) * pg**2)
               + jnp.sum(jnp.asarray(self.obj_lin) * pg)
               + self.obj_const)
        if self.n_h:
            val = val + jnp.sum(h)
        return val

    def eq(self, x):
        theta, pg, h = self.split(x)
        inj = jnp.zeros(self.n).at[self.gen_bus].add(
            jnp.where(jnp.asarray(self.gen_on), pg, 0.0))
        balance = inj - self.b_dense @ theta - self.rhs
        out = [balance, jnp.array([theta[self.slack] - self.slack_angle])]
        off = ~jnp.asarray(self.gen_on)
        if bool(np.any(~self.gen_on)):
            out.append(pg[np.flatnonzero(~self.gen_on)])
        if self.fix_p:
            idx = np.asarray([i for i, _ in self.fix_p], dtype=np.int64)
            val = np.asarray([b for _, b in self.fix_p])
            out.append(pg[idx] - val)
        return jnp.concatenate(out)

    def ineq(self, x):
        theta, pg, h = self.split(x)
        out = []
        for i, lo in self.cap_lo:
            out.append(pg[i] - lo)
        for i, hi in self.cap_hi:
            out.append(hi - pg[i])
        for (f, t, adm, phi, lo, hi, _k) in self.flows:
            flow = adm * (theta[f] - theta[t] - phi)
            if np.isfinite(lo):
                out.append(flow - lo)
            if np.isfinite(hi):
                out.append(hi - flow)
        for (f, t, lo, hi, _k) in self.angles:
            diff = theta[f] - theta[t]
            out.append(diff - lo)
            out.append(hi - diff)
        for (gi, hpos, slope, icept) in self.pw_cuts:
            out.append(icept - slope * pg[gi] + h[hpos])
        if not out:
            return None
        return jnp.stack([jnp.asarray(v) for v in out])


def dc_optimal_power_flow(system: PowerSystem) -> DcOptimalPowerFlow:
    """Reference dcOptimalPowerFlow (dcOptimalPowerFlow.jl:44-198); the
    optimizer argument is implicit — the in-house IPM."""
    system.check_slack()
    model(system, "dc")
    spec = _DcSpec(system)
    n, g = spec.n, spec.g
    x0 = np.zeros(spec.n_x)
    x0[:n] = system.bus.voltage.angle.array[:n]
    x0[n:n + g] = system.generator.output.active.array[:g]
    spec.push_inside(x0)
    if spec.n_h:
        spec.init_helpers(x0)
    power = DcPower(generator=Cartesian(
        active=system.generator.output.active.array[:g].copy()))
    analysis = DcOptimalPowerFlow(
        system=system,
        voltage=Angle(system.bus.voltage.angle.array[:n].copy()),
        power=power,
        method=OpfMethod("dc_optimal_power_flow"),
    )
    analysis._spec = spec
    analysis._x0 = x0
    return analysis


def solve(analysis: DcOptimalPowerFlow, max_iter: int = 200,
          tolerance: float = 1e-8, verbose: int = 0) -> DcOptimalPowerFlow:
    """Reference solve! — runs the IPM and harvests primal/duals."""
    analysis._refresh_spec()
    spec = analysis._spec
    has_ineq = spec.ineq(jnp.asarray(analysis._x0)) is not None
    problem = NlpProblem(
        objective=spec.objective,
        eq=spec.eq,
        ineq=spec.ineq if has_ineq else None,
        push_inside=spec.push_inside)
    # dual carry across live edits, guarded by the constraint layout
    # (reference setdual/transferdual!, optimalPowerFlow/utility.jl)
    layout = (spec.n, tuple(spec.ineq_tags),
              tuple(i for i, _ in spec.fix_p))
    warm = None
    prev = getattr(analysis.method, "result", None)
    if getattr(analysis, "_carry_duals", False) and prev is not None \
            and getattr(analysis.method, "_warm_layout", None) == layout:
        warm = (prev.y, prev.z, prev.s)
    analysis._carry_duals = False
    res = solve_nlp(problem, analysis._x0, max_iter=max_iter,
                    tol=tolerance, verbose=verbose, warm_duals=warm)
    analysis.method._warm_layout = layout
    analysis.method.result = res
    analysis.method.iteration = res.iterations
    analysis.method.converged = res.converged
    analysis.method.objective = res.objective

    n, g = spec.n, spec.g
    theta = res.x[:n]
    pg = res.x[n:n + g].copy()
    pg[~spec.gen_on] = 0.0
    analysis.voltage.angle = theta
    analysis.power.generator = Cartesian(active=pg)
    analysis._x0 = res.x  # warm start for the next solve

    # dual harvest: balance duals then per-family inequality duals
    analysis.method.dual = {
        "balance": res.y[:n],
        "ineq": dict(zip(range(len(spec.ineq_tags)), res.z)),
        "ineq_tags": spec.ineq_tags,
    }
    return analysis


def set_initial_point(analysis: DcOptimalPowerFlow, source=None):
    """Reference setInitialPoint! — warm start from system or another
    analysis (acOptimalPowerFlow.jl:762-924 semantics, DC variant)."""
    spec = analysis._spec
    n, g = spec.n, spec.g
    system = analysis.system
    if source is None:
        x0 = np.concatenate([
            system.bus.voltage.angle.array[:n],
            system.generator.output.active.array[:g],
            np.ones(spec.n_h)])
        spec.push_inside(x0)
        spec.init_helpers(x0)
        analysis._x0 = x0
    else:
        x0 = np.asarray(analysis._x0).copy()
        x0[:n] = source.voltage.angle[:n]
        if hasattr(source, "power") and source.power is not None \
                and len(source.power.generator.active) == g:
            x0[n:n + g] = source.power.generator.active
        spec.push_inside(x0)
        spec.init_helpers(x0)
        analysis._x0 = x0
