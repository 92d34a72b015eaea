"""Primal-dual interior-point method for NLP/QP/LP, in JAX.

This is the framework's own optimizer — the component the reference
delegates to Ipopt/HiGHS/GLPK through JuMP (SURVEY §2: "the build's hardest
component"). It solves

    min f(x)   s.t.  c_E(x) = 0,   c_I(x) >= 0

with slacks s > 0 on the inequalities and a log-barrier, using the damped
Newton primal-dual system condensed to the augmented form

    [ W + J_Iᵀ Σ J_I + δI   J_Eᵀ ] [ dx ]   [ -r_d ]
    [ J_E                   -δc I ] [ -dy ] = [ -r_E ]

with Σ = Z S⁻¹. Derivatives (gradients, constraint Jacobians, and the exact
Lagrangian Hessian) come from JAX autodiff; the augmented solve is the
mixed-precision MXU path (ops/linalg.py). Fraction-to-boundary steps, an
Armijo backtracking line search on the barrier merit function, monotone
(Fiacco-McCormick) barrier reduction, and inertia-free δ-regularization
escalation give Ipopt-class robustness on the power-system problems the
test oracles cover (reference parity atol 1e-6,
test/optimalPowerFlow/analysis.jl:9-12).

The per-iteration step is one jitted function; the outer loop runs on host
(tens of iterations). ``vmap`` over problem data enables batched OPF.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import linalg


@dataclass
class NlpProblem:
    """Problem functions (all jax-traceable, x is a flat f64 vector)."""

    objective: Callable            # x -> scalar
    eq: Optional[Callable] = None  # x -> (mE,) residuals, target 0
    ineq: Optional[Callable] = None  # x -> (mI,) values, constraint >= 0


@dataclass
class IpmResult:
    x: np.ndarray
    y: np.ndarray          # equality duals
    z: np.ndarray          # inequality duals
    s: np.ndarray          # slacks
    objective: float
    converged: bool
    iterations: int
    kkt_error: float


def _make_step(problem: NlpProblem, n_x: int, m_e: int, m_i: int):
    f = problem.objective
    c_e = problem.eq if m_e else (lambda x: jnp.zeros(0))
    c_i = problem.ineq if m_i else (lambda x: jnp.zeros(0))

    grad_f = jax.grad(f)
    jac_e = jax.jacfwd(c_e)
    jac_i = jax.jacfwd(c_i)

    def lagrangian(x, y, z):
        val = f(x)
        if m_e:
            val = val - y @ c_e(x)
        if m_i:
            val = val - z @ c_i(x)
        return val

    hess_l = jax.hessian(lagrangian)

    @partial(jax.jit, static_argnames=())
    def kkt_error(x, y, z, s, mu):
        r_d = grad_f(x)
        if m_e:
            r_d = r_d - jac_e(x).T @ y
        if m_i:
            r_d = r_d - jac_i(x).T @ z
        err = jnp.max(jnp.abs(r_d))
        if m_e:
            err = jnp.maximum(err, jnp.max(jnp.abs(c_e(x))))
        if m_i:
            err = jnp.maximum(err, jnp.max(jnp.abs(c_i(x) - s)))
            err = jnp.maximum(err, jnp.max(jnp.abs(s * z - mu)))
        return err

    @jax.jit
    def step(x, y, z, s, mu, delta):
        """One damped primal-dual Newton step at barrier mu."""
        w = hess_l(x, y, z)
        g = grad_f(x)

        r_d = g
        if m_e:
            je = jac_e(x)
            ce = c_e(x)
            r_d = r_d - je.T @ y
        if m_i:
            ji = jac_i(x)
            ci = c_i(x)
            r_d = r_d - ji.T @ z
            sigma = jnp.clip(z / s, 1e-12, 1e12)
            # condensed: W + Jiᵀ Σ Ji ; rhs folds the barrier term
            w = w + ji.T @ (sigma[:, None] * ji)
            # r_i: primal infeasibility of c_I - s
            r_i = ci - s
            # folded RHS contribution:  Jiᵀ (Σ r_i + z - μ/s)
            r_d = r_d + ji.T @ (sigma * r_i + z - mu / s)

        n_aug = n_x + m_e
        kkt = jnp.zeros((n_aug, n_aug))
        kkt = kkt.at[:n_x, :n_x].set(w + delta * jnp.eye(n_x))
        rhs = jnp.zeros(n_aug)
        rhs = rhs.at[:n_x].set(-r_d)
        if m_e:
            kkt = kkt.at[:n_x, n_x:].set(je.T)
            kkt = kkt.at[n_x:, :n_x].set(je)
            kkt = kkt.at[n_x:, n_x:].set(-1e-10 * jnp.eye(m_e))
            rhs = rhs.at[n_x:].set(-ce)

        # symmetric Jacobi equilibration: the barrier term Σ = Z/S spans
        # ~1e12 near convergence, far beyond what the f32 MXU factorization
        # plus refinement tolerates (cond must stay ~< 1e7 for IR to
        # converge); D A D compresses the dynamic range to O(1)
        d = 1.0 / jnp.sqrt(jnp.maximum(jnp.max(jnp.abs(kkt), axis=1), 1e-12))
        kkt_s = d[:, None] * kkt * d[None, :]
        sol = d * linalg.solve(linalg.factorize(kkt_s, linalg.LU), d * rhs)
        # linear-solve quality: a silently failed f32 factorization shows up
        # as a large relative residual — the driver escalates delta then
        lin_res = jnp.max(jnp.abs(kkt @ sol - rhs)) / (
            1.0 + jnp.max(jnp.abs(rhs)))
        dx = sol[:n_x]
        dy = -sol[n_x:] if m_e else jnp.zeros(0)

        if m_i:
            ds = ji @ dx + r_i
            dz = (mu - s * z - z * ds) / s
            # fraction-to-boundary
            tau = 0.995
            alpha_s = jnp.min(jnp.where(ds < 0, -tau * s / ds, 1.0))
            alpha_z = jnp.min(jnp.where(dz < 0, -tau * z / dz, 1.0))
            alpha_s = jnp.minimum(alpha_s, 1.0)
            alpha_z = jnp.minimum(alpha_z, 1.0)
        else:
            ds = jnp.zeros(0)
            dz = jnp.zeros(0)
            alpha_s = jnp.asarray(1.0)
            alpha_z = jnp.asarray(1.0)

        return dx, dy, ds, dz, alpha_s, alpha_z, lin_res

    @jax.jit
    def merit(x, s, mu, nu):
        """Barrier merit: f - mu sum(log s) + nu * ||infeasibility||_1."""
        val = f(x)
        if m_i:
            val = val - mu * jnp.sum(jnp.log(s))
            val = val + nu * jnp.sum(jnp.abs(c_i(x) - s))
        if m_e:
            val = val + nu * jnp.sum(jnp.abs(c_e(x)))
        return val

    return step, kkt_error, merit, (c_e, c_i)


def solve_nlp(problem: NlpProblem, x0: np.ndarray,
              max_iter: int = 200, tol: float = 1e-8,
              acceptable_tol: float = 1e-6, acceptable_iter: int = 25,
              mu0: float = 0.1, verbose: int = 0) -> IpmResult:
    """Outer IPM driver (host loop over jitted steps)."""
    x = jnp.asarray(np.asarray(x0, dtype=np.float64))
    n_x = x.shape[0]
    m_e = int(np.asarray(problem.eq(x)).shape[0]) if problem.eq else 0
    m_i = int(np.asarray(problem.ineq(x)).shape[0]) if problem.ineq else 0

    # Ipopt-style gradient-based objective scaling: keep max|∇f| near 100
    # so currency-unit cost coefficients don't swamp the KKT tolerances.
    g0 = np.asarray(jax.grad(problem.objective)(x))
    gmax = float(np.max(np.abs(g0))) if g0.size else 1.0
    scale_f = min(1.0, 100.0 / gmax) if gmax > 0 else 1.0
    raw_objective = problem.objective
    if scale_f != 1.0:
        problem = NlpProblem(
            objective=lambda xx: scale_f * raw_objective(xx),
            eq=problem.eq, ineq=problem.ineq)

    step, kkt_error, merit, (c_e, c_i) = _make_step(problem, n_x, m_e, m_i)

    if m_i:
        ci0 = jnp.asarray(problem.ineq(x))
        s = jnp.maximum(ci0, 1e-2)
        z = jnp.maximum(mu0 / s, 1e-8)
    else:
        s = jnp.zeros(0)
        z = jnp.zeros(0)
    y = jnp.zeros(m_e)

    mu = mu0
    nu = 10.0
    converged = False
    it = 0
    err = np.inf
    best = None
    stall = 0

    for it in range(1, max_iter + 1):
        err_mu = float(kkt_error(x, y, z, s, mu))
        err = float(kkt_error(x, y, z, s, 0.0))
        if best is None or err < best[0]:
            best = (err, x, y, z, s)
            stall = 0
        else:
            stall += 1
        # Ipopt-style acceptable-level stop: degenerate active sets (e.g.
        # an optimum exactly at a piecewise-cost breakpoint) leave the KKT
        # system singular in the limit; accept the best iterate once
        # progress stalls below the acceptable tolerance.
        if stall >= acceptable_iter and best[0] < acceptable_tol:
            converged = True
            break
        if verbose >= 2:
            print(f"  ipm iter {it}: kkt={err:.3e} mu={mu:.3e}")
        if err < tol:
            converged = True
            break
        if err_mu < 10 * mu:
            mu = max(mu / 10.0, tol / 10.0)

        # the l1 exactness condition requires nu > ||duals||_inf; keep it
        # ahead of the multipliers or the line search rejects feasibility
        # restoration steps (merit decrease in f outweighs the penalty)
        if m_e or m_i:
            dual_inf = 0.0
            if m_e and y.shape[0]:
                dual_inf = float(jnp.max(jnp.abs(y)))
            if m_i and z.shape[0]:
                dual_inf = max(dual_inf, float(jnp.max(jnp.abs(z))))
            nu = max(nu, 2.0 * dual_inf + 10.0)

        delta = 0.0
        accepted = False
        for attempt in range(12):
            dx, dy, ds, dz, alpha_s, alpha_z = 0, 0, 0, 0, 0, 0
            out = step(x, y, z, s, mu, delta)
            dx, dy, ds, dz, alpha_s, alpha_z, lin_res = out
            solver_ok = bool(jnp.all(jnp.isfinite(dx))) \
                and float(lin_res) < 1e-6
            if solver_ok:
                # backtrack on the merit function; a step is also acceptable
                # if it reduces the (mu-)KKT error — merit can stagnate at
                # round-off while the KKT error still shrinks
                m0 = float(merit(x, s, mu, nu))
                alpha = float(alpha_s)
                for halving in range(20):
                    x_t = x + alpha * dx
                    s_t = jnp.maximum(s + alpha * ds, 1e-14) if m_i else s
                    m_t = float(merit(x_t, s_t, mu, nu))
                    if np.isfinite(m_t) and \
                            m_t <= m0 + 1e-6 * max(1.0, abs(m0)):
                        accepted = True
                        break
                    z_t = z + alpha * dz if m_i else z
                    e_t = float(kkt_error(x_t, y + alpha * dy
                                          if m_e else y,
                                          jnp.maximum(z_t, 1e-14), s_t, mu))
                    if np.isfinite(e_t) and e_t <= err_mu * (1 - 1e-4 * alpha):
                        accepted = True
                        break
                    alpha *= 0.5
                if accepted:
                    break
            delta = 1e-8 if delta == 0.0 else delta * 100.0
        if not accepted:
            break  # no productive step available; return best iterate

        x = x + alpha * dx
        if m_e:
            y = y + min(1.0, alpha) * dy
        if m_i:
            s = s + alpha * ds
            z = z + float(alpha_z) * dz
            s = jnp.maximum(s, 1e-14)
            # kappa_Sigma safeguard (tightened): project duals into a band
            # around the central path z ~ mu/s. Weakly-active constraints
            # otherwise shoot z up by ~mu/s^2 on barrier reductions, which
            # the merit function cannot see (it has no dual term).
            kappa = 1e4
            z = jnp.clip(z, mu / (kappa * s), kappa * mu / s)
            z = jnp.maximum(z, 1e-14)

    if best is not None and best[0] < err:
        err, x, y, z, s = best
        converged = converged or err < tol
    inv = 1.0 / scale_f
    return IpmResult(
        x=np.asarray(x), y=np.asarray(y) * inv, z=np.asarray(z) * inv,
        s=np.asarray(s),
        objective=float(raw_objective(x)),
        converged=converged, iterations=it, kkt_error=float(err))
