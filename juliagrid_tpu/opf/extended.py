"""User extensions of the OPF models: extra variables, constraints, and
objective terms.

Equivalent of the reference ``@addVariable``/``@addConstraint`` macros and
the ``Extended`` registry (/root/reference/src/optimalPowerFlow/
extended.jl:27-265). The reference wraps JuMP; here extensions are pure
JAX callables over a named view of the state, composed into the
``NlpProblem`` at solve time — autodiff differentiates through them like
any built-in constraint.

Usage::

    opf = ac_optimal_power_flow(system)
    add_variable(opf, "reserve", dim=3, lower=0.0, start=0.1)
    add_constraint(opf, lambda s: s["reserve"].sum() - 0.5, kind="eq")
    add_objective_term(opf, lambda s: 10.0 * (s["reserve"] ** 2).sum())
    solve_extended(opf)

The state view ``s`` maps names to arrays: for the AC model ``angle``,
``magnitude``, ``active`` (Pg), ``reactive`` (Qg) plus user variables; for
the DC model ``angle`` and ``active``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from .acopf import AcOptimalPowerFlow
from .dcopf import DcOptimalPowerFlow
from .ipm import NlpProblem, solve_nlp


@dataclass
class Extension:
    variables: list = field(default_factory=list)  # (name, dim, lo, hi, x0)
    constraints: list = field(default_factory=list)  # (fn, kind)
    objectives: list = field(default_factory=list)


def _ext(analysis) -> Extension:
    if not hasattr(analysis, "_extension"):
        analysis._extension = Extension()
    return analysis._extension


def add_variable(analysis, name: str, dim: int = 1, lower=None, upper=None,
                 start: float = 0.0):
    """Reference @addVariable: register a user variable (vector)."""
    _ext(analysis).variables.append((name, dim, lower, upper, start))


def add_constraint(analysis, fn, kind: str = "ineq"):
    """Reference @addConstraint. ``fn(state_view) -> residuals``;
    kind 'eq' targets 0, 'ineq' requires >= 0."""
    if kind not in ("eq", "ineq"):
        raise ValueError("kind must be 'eq' or 'ineq'")
    _ext(analysis).constraints.append((fn, kind))


def add_objective_term(analysis, fn):
    """Add ``fn(state_view)`` to the objective."""
    _ext(analysis).objectives.append(fn)


def remove(analysis, kind: str, index: int):
    """Reference remove!: drop a user variable/constraint/objective by
    registration index."""
    ext = _ext(analysis)
    store = {"variable": ext.variables, "constraint": ext.constraints,
             "objective": ext.objectives}[kind]
    del store[index]


def _state_view(analysis, spec, x_base, user_vals):
    if isinstance(analysis, AcOptimalPowerFlow):
        theta, v, pg, qg, hp, hq = spec.split(x_base)
        view = {"angle": theta, "magnitude": v, "active": pg,
                "reactive": qg}
    else:
        theta, pg, h = spec.split(x_base)
        view = {"angle": theta, "active": pg}
    view.update(user_vals)
    return view


def solve_extended(analysis, max_iter: int = 300, tolerance: float = 1e-8,
                   verbose: int = 0):
    """Solve the OPF with the registered extensions composed in."""
    if isinstance(analysis, AcOptimalPowerFlow):
        analysis._refresh_spec()
    else:
        analysis._refresh_spec()
    spec = analysis._spec
    ext = _ext(analysis)

    if isinstance(analysis, AcOptimalPowerFlow):
        # AC spec functions take (x, params); bake the current params in —
        # the extended path retraces per solve like the reference rebuilds
        prm = spec.params
        base_obj = lambda xb: spec.objective(xb, prm)  # noqa: E731
        base_eq = lambda xb: spec.eq(xb, prm)          # noqa: E731
        base_ineq = lambda xb: spec.ineq(xb, prm)      # noqa: E731
    else:
        base_obj, base_eq, base_ineq = spec.objective, spec.eq, spec.ineq

    base_n = spec.n_x
    offsets = {}
    pos = base_n
    for (name, dim, lo, hi, start) in ext.variables:
        offsets[name] = (pos, dim)
        pos += dim
    total_n = pos

    def split_user(x):
        vals = {}
        for (name, dim, *_rest) in ext.variables:
            o, d = offsets[name]
            vals[name] = x[o:o + d]
        return x[:base_n], vals

    def objective(x):
        xb, vals = split_user(x)
        val = base_obj(xb)
        view = _state_view(analysis, spec, xb, vals)
        for fn in ext.objectives:
            val = val + fn(view)
        return val

    def eq(x):
        xb, vals = split_user(x)
        out = [base_eq(xb)]
        view = _state_view(analysis, spec, xb, vals)
        for fn, kind in ext.constraints:
            if kind == "eq":
                out.append(jnp.atleast_1d(fn(view)))
        return jnp.concatenate(out)

    def ineq(x):
        xb, vals = split_user(x)
        base = base_ineq(xb)
        out = [base] if base is not None else []
        view = _state_view(analysis, spec, xb, vals)
        for fn, kind in ext.constraints:
            if kind == "ineq":
                out.append(jnp.atleast_1d(fn(view)))
        for (name, dim, lo, hi, _start) in ext.variables:
            o, d = offsets[name]
            if lo is not None:
                out.append(x[o:o + d] - lo)
            if hi is not None:
                out.append(hi - x[o:o + d])
        if not out:
            return None
        return jnp.concatenate(out)

    x0 = np.zeros(total_n)
    x0[:base_n] = analysis._x0
    for (name, dim, lo, hi, start) in ext.variables:
        o, d = offsets[name]
        x0[o:o + d] = start

    has_ineq = ineq(jnp.asarray(x0)) is not None
    res = solve_nlp(NlpProblem(objective, eq, ineq if has_ineq else None),
                    x0, max_iter=max_iter, tol=tolerance, verbose=verbose)

    analysis.method.result = res
    analysis.method.iteration = res.iterations
    analysis.method.converged = res.converged
    analysis.method.objective = res.objective
    analysis.method.dual = {"extended": True}
    xb, vals = split_user(jnp.asarray(res.x))
    analysis.method.user_values = {k: np.asarray(v) for k, v in vals.items()}

    from ..postprocessing.results import Cartesian
    if isinstance(analysis, AcOptimalPowerFlow):
        n, g = spec.n, spec.g
        analysis.voltage.angle = res.x[:n]
        analysis.voltage.magnitude = res.x[n:2 * n]
        pg = res.x[2 * n:2 * n + g].copy()
        qg = res.x[2 * n + g:2 * n + 2 * g].copy()
        pg[~spec.gen_on] = 0.0
        qg[~spec.gen_on] = 0.0
        analysis.power.generator = Cartesian(active=pg, reactive=qg)
    else:
        n, g = spec.n, spec.g
        analysis.voltage.angle = res.x[:n]
        pg = res.x[n:n + g].copy()
        pg[~spec.gen_on] = 0.0
        analysis.power.generator = Cartesian(active=pg)
    analysis._x0 = res.x[:base_n]
    return analysis
