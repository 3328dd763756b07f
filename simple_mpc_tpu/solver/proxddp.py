"""Proximal augmented-Lagrangian DDP solver — TPU-native ProxDDP.

Capability parity with aligator::SolverProxDDP as consumed by the reference
(mpc.cpp:43-53, 84-89, 212-217): multiple-shooting trajectory optimization
with equality/conic constraints, warm starts, LINEAR rollout, Riccati
feedback gains, 1-iteration receding-horizon operation.

TPU-first design decisions:
  * every stage is linearized in parallel (vmap over the horizon) — the
    expensive part (rigid-body dynamics Jacobians) becomes one big batched
    kernel instead of T serial evaluations;
  * one fused `stage_eval` per stage supplies costs, constraints AND next
    state from a single rigid-body evaluation (the constrained-dynamics
    KKT solve is shared), and `jax.linearize` differentiates the whole
    bundle in one forward-mode pass — this is what keeps the XLA graph
    small enough to compile fast;
  * the backward Riccati recursion runs as `lax.scan` (serial oracle) or as
    an associative scan (parallel-in-time, cf. PAPERS.md "Parallelization
    of Riccati Recursion") — both produce identical gains;
  * the line search evaluates all step sizes simultaneously (vmap over
    alpha, alpha=0 included so the iterate never regresses in merit);
  * float32-ready numerics: dtype-aware floors on the AL penalty mu, the
    proximal regularization, and a Jacobi-preconditioned Quu Cholesky —
    f64-calibrated constants (mu=1e-8, reg=1e-9) would NaN on TPU f32.
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
    alphas: tuple = (0.0, 1.0, 0.5, 0.25, 0.1, 0.03, 0.01)
    parallel: bool = False  # associative-scan Riccati backward
    # lax.scan unroll factor for the serial Riccati/rollout scans: each
    # scan step is a handful of tiny batched matmuls, so per-step dispatch
    # overhead dominates at T=100; unrolling amortizes it without changing
    # the math.
    scan_unroll: int = 5
    # Mixed-precision linearization: run the 60-wide forward-mode tangent
    # sweep in this dtype (e.g. "bfloat16") while keeping primal residuals,
    # defects and the Riccati recursion in the working dtype.  The SoA
    # tangent sweep is HBM-bound on TPU (measured 1.7x faster in bf16 at
    # B=128); Gauss-Newton with ~3-digit Jacobians is classic inexact
    # Newton — fixed points are unchanged because feasibility/merit always
    # use full-precision evaluations.  None = full precision (default; the
    # equivalence tests pin this path).
    lin_dtype: Optional[str] = None
    # BCL outer-loop schedule (the AL safeguard Aligator's ProxDDP uses):
    # multipliers update only when the primal residual beats eta = mu^alpha,
    # else mu stiffens by bcl_mu_factor.  Unguarded updates oscillate on
    # cold starts far from feasibility (the 1-iteration warm-started MPC
    # tick always lands in the "update" branch, so its behavior is
    # unchanged).
    bcl: bool = True
    bcl_alpha: float = 0.1
    bcl_mu_factor: float = 0.1
    bcl_eta_shrink: float = 0.33  # feasibility tolerance contraction on success
    # Stationarity gate for the multiplier update (LANCELOT): a first-order
    # update lam += g/mu is only a valid multiplier estimate at an
    # (approximate) minimizer of the AL; updating from an arbitrary inner
    # iterate overshoots by O(g/mu) and destabilizes the outer loop.  The
    # gate compares the backward pass's |Qu|_inf against omega, which starts
    # at dual_0 * bcl_omega_init relative to the first iteration's dual
    # residual (scale-free) and contracts on every accepted update.
    bcl_omega_init: float = 0.1
    bcl_omega_shrink: float = 0.5
    # Trailing-batch (structure-of-arrays) trajectory evaluation: stage
    # math runs with the horizon in the vector lanes instead of a vmap
    # that leaves 3x3 component dims minor-most (see ops/soa.py).  Used
    # automatically when the OCP implements stage_eval_soa; this flag
    # exists so equivalence tests can pin the generic path.
    soa: bool = True
    # Control variable scaling (nondimensionalization): the solver takes
    # its step in u_hat = u / u_scale, i.e. every u-derivative is chained
    # through du = u_scale * du_hat and the Riccati recursion, line search
    # and gains operate on O(1) quantities.  For force-carrying controls
    # (kinodynamics contact wrenches ~ m*g ~ 900 N on Talos) this removes
    # the mixed-magnitude cancellation that sets the f32 accuracy floor
    # (BASELINE.md accuracy row; VERDICT r4 next #6).  "auto" reads the
    # OCP's u_scale property (falls back to None); None = identity.
    # Returned Results.ks/Ks are always in PHYSICAL units.
    u_scale: Any = None


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
    mu: jnp.ndarray  # scalar: BCL-evolved AL penalty (thread into the next
    #                  run() call to continue an outer loop across warm starts)
    diverged: Any = False  # NaN/Inf anywhere in the
    #                  final iterate — surfaced by MPC so a poisoned solve
    #                  is never consumed silently (VERDICT r2 §9)


def _eps(dtype) -> float:
    return float(jnp.finfo(dtype).eps)


class ProxDDPSolver:
    """Solver bound to one OCP formulation (static structure)."""

    def __init__(self, ocp, settings: SolverSettings = SolverSettings()):
        self.ocp = ocp
        self.settings = settings
        self.space = ocp.space
        u_sc = settings.u_scale
        if isinstance(u_sc, str):
            if u_sc != "auto":
                raise ValueError(f"u_scale: expected 'auto' or array, got {u_sc!r}")
            u_sc = getattr(ocp, "u_scale", None)
        self._u_scale = None if u_sc is None else np.asarray(u_sc, np.float64)
        if self._u_scale is not None and self._u_scale.shape != (ocp.nu,):
            raise ValueError(
                f"u_scale shape {self._u_scale.shape} != (nu,) = ({ocp.nu},)")
        if settings.lin_dtype is not None and not self._use_soa:
            import warnings

            warnings.warn(
                "SolverSettings.lin_dtype is only honored on the SoA "
                "linearization path; this OCP/space has no SoA support "
                f"(or soa=False), so the solver runs full precision "
                f"(requested lin_dtype={settings.lin_dtype!r})",
                stacklevel=2)

    # ------------------------------------------------------------------
    # Fused trajectory evaluation
    # ------------------------------------------------------------------
    def _stage_bundle(self, x, u, p, lam_eq, lam_in, mu):
        """(r_all, w_all, g, h, xnext) — one rigid-body evaluation."""
        r, w, g, h, xnext = self.ocp.stage_eval(x, u, p)
        sh = h + mu * lam_in
        act = (sh > 0).astype(x.dtype)
        r_all = jnp.concatenate([r, g + mu * lam_eq, jnp.where(act > 0, sh, 0.0)])
        w_all = jnp.concatenate([w, jnp.full(g.shape, 1.0 / mu, x.dtype), act / mu])
        return r_all, w_all, g, h, xnext

    @property
    def _use_soa(self) -> bool:
        return (self.settings.soa
                and hasattr(self.ocp, "stage_eval_soa")
                and hasattr(self.space, "integrate_parts_soa")
                and getattr(self.space, "tangent_split", None) is not None)

    def _stage_bundle_soa(self, X, U, P, LE, LI, mu):
        """Trailing-batch twin of _stage_bundle: all args (comps..., T)."""
        r, w, g, h, xnext = self.ocp.stage_eval_soa(X, U, P)
        sh = h + mu * LI
        act = (sh > 0).astype(X.dtype)
        r_all = jnp.concatenate(
            [r, g + mu * LE, jnp.where(act > 0, sh, 0.0)], axis=0)
        w_all = jnp.concatenate(
            [jnp.broadcast_to(w[:, None], r.shape),
             jnp.full(g.shape, 1.0 / mu, X.dtype), act / mu], axis=0)
        return r_all, w_all, g, h, xnext

    @staticmethod
    def _transpose_params(sp):
        """Stage-param pytree (T, ...) -> trailing-stage (..., T)."""
        return jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, -1), sp)

    def _eval_traj(self, problem, xs, us, lam_eq, lam_in, mu):
        """Stage bundles over the horizon: AL cost pieces, raw constraints,
        and multiple-shooting gaps in one fused pass.  SoA path when the
        OCP provides it (horizon in the vector lanes), vmap otherwise."""
        sp = problem.stage_params
        if self._use_soa:
            X, U, Xn = xs[:-1].T, us.T, xs[1:].T
            P = self._transpose_params(sp)
            r_all, w_all, g, h, xnext = self._stage_bundle_soa(
                X, U, P, lam_eq.T, lam_in.T, mu)
            gap = self.space.difference_soa(Xn, xnext)
            costs = 0.5 * jnp.sum(w_all * r_all * r_all, axis=0)
            return costs, g.T, h.T, gap.T

        def one(x, u, p, le, li, xn):
            r_all, w_all, g, h, xnext = self._stage_bundle(x, u, p, le, li, mu)
            gap = self.space.difference(xn, xnext)
            cost = 0.5 * jnp.sum(w_all * r_all * r_all)
            return cost, g, h, gap

        costs, g_all, h_all, gaps = jax.vmap(one)(
            xs[:-1], us, sp, lam_eq, lam_in, xs[1:])
        return costs, g_all, h_all, gaps

    def _term_al_cost(self, x, p, lam_term, mu):
        ocp = self.ocp
        r, w = ocp.term_residuals(x, p)
        g = ocp.term_eq_constraints(x, p)
        rg = g + mu * lam_term
        return 0.5 * jnp.sum(w * r * r) + 0.5 / mu * jnp.sum(rg * rg)

    def _merit_from(self, costs, gaps, x0_gap, term_cost, mu):
        gap_pen = 0.5 / mu * jnp.sum(gaps * gaps)
        return (jnp.sum(costs) + term_cost + gap_pen
                + 0.5 / mu * jnp.sum(x0_gap * x0_gap))

    # ------------------------------------------------------------------
    # Stage linearization (one forward-mode pass per stage)
    # ------------------------------------------------------------------
    def _linearize_stage(self, x, u, xn, p, lam_eq, lam_in, mu):
        space = self.space
        ndx, nu = space.ndx, self.ocp.nu

        def bundle(xx, uu):
            r_all, w_all, _, _, xnext = self._stage_bundle(
                xx, uu, p, lam_eq, lam_in, mu)
            d = space.difference(xn, xnext)
            return r_all, d, w_all  # w_all's tangent is zero; carried for w0

        # Split linearization: one jax.linearize per input block so tangents
        # only flow through ops that actually depend on that block.  The
        # u-tangents (forces/torques/accels) never touch the FK/centroidal
        # chain, and for q/v-factorizable spaces the v-tangents skip the
        # position-FK chain too — each block's JVP keeps the other blocks'
        # tangents symbolically zero, so XLA never emits the dead chains.
        # This sweep is the hot path of the per-tick solve (mpc.cpp:212).
        split = getattr(space, "tangent_split", None)
        if split is None:
            z0 = jnp.zeros(ndx, dtype=x.dtype)
            (r0, d0, w0), lin_x = jax.linearize(
                lambda dx: bundle(space.integrate(x, dx), u), z0)
            Jr_xT, Jd_xT, _ = jax.vmap(lin_x)(jnp.eye(ndx, dtype=x.dtype))
        else:
            zq = jnp.zeros(split, dtype=x.dtype)
            zv = jnp.zeros(ndx - split, dtype=x.dtype)
            (r0, d0, w0), lin_q = jax.linearize(
                lambda dq: bundle(space.integrate_parts(x, dq, zv), u), zq)
            _, lin_v = jax.linearize(
                lambda dv: bundle(space.integrate_parts(x, zq, dv), u)[:2], zv)
            Jr_qT, Jd_qT, _ = jax.vmap(lin_q)(jnp.eye(split, dtype=x.dtype))
            Jr_vT, Jd_vT = jax.vmap(lin_v)(jnp.eye(ndx - split, dtype=x.dtype))
            Jr_xT = jnp.concatenate([Jr_qT, Jr_vT], axis=0)
            Jd_xT = jnp.concatenate([Jd_qT, Jd_vT], axis=0)
        su = (None if self._u_scale is None
              else jnp.asarray(self._u_scale, x.dtype))
        _, lin_u = jax.linearize(
            lambda du: bundle(x, u + (du if su is None else su * du))[:2],
            jnp.zeros(nu, x.dtype))
        Jr_uT, Jd_uT = jax.vmap(lin_u)(jnp.eye(nu, dtype=x.dtype))
        J = jnp.concatenate([Jr_xT.T, Jr_uT.T], axis=1)  # (nr, ndx+nu)
        AB = jnp.concatenate([Jd_xT.T, Jd_uT.T], axis=1)  # (ndx, ndx+nu)
        grad = J.T @ (w0 * r0)
        H = J.T @ (w0[:, None] * J)
        A, B = AB[:, :ndx], AB[:, ndx:]
        return dict(A=A, B=B, d=d0,
                    qx=grad[:ndx], qu=grad[ndx:],
                    Qxx=H[:ndx, :ndx], Quu=H[ndx:, ndx:], Qux=H[ndx:, :ndx])

    def _linearize_traj_soa(self, problem, xs, us, lam_eq, lam_in, mu):
        """Whole-horizon linearization in trailing-batch layout: the T
        stages ride the vector lanes and the tangent basis rides a leading
        vmap axis, so each of the 60 forward-mode passes is elementwise
        over the lanes.  Gauss-Newton products (J^T W J per stage) become
        T-batched 60 x nr x 60 matmuls on the MXU."""
        space, ocp = self.space, self.ocp
        ndx, nu = space.ndx, ocp.nu
        split = space.tangent_split
        T = us.shape[0]
        dtype = xs.dtype
        X, U, Xn = xs[:-1].T, us.T, xs[1:].T
        P = self._transpose_params(problem.stage_params)
        LE, LI = lam_eq.T, lam_in.T

        # Mixed-precision sweep: tangents ride a compute dtype (bf16 halves
        # the HBM traffic of the 60-direction chain); primal quantities that
        # enter the Riccati recursion (r0, w0, d0) are recomputed in the
        # working dtype — one extra bundle eval that XLA CSEs against the
        # line search's alpha=0 candidate.
        ld = self.settings.lin_dtype
        cdt = dtype if ld is None else jnp.dtype(ld)

        def _cast(a):
            return a.astype(cdt) if jnp.issubdtype(a.dtype, jnp.floating) else a

        Xc, Uc, Xnc = _cast(X), _cast(U), _cast(Xn)
        Pc = jax.tree_util.tree_map(_cast, P)
        LEc, LIc, muc = _cast(LE), _cast(LI), jnp.asarray(mu, cdt)

        su = (None if self._u_scale is None
              else jnp.asarray(self._u_scale, cdt)[:, None])

        def bundle(dq, dv, du):
            Xp = space.integrate_parts_soa(Xc, dq, dv)
            r_all, w_all, _, _, xnext = self._stage_bundle_soa(
                Xp, Uc + (du if su is None else su * du), Pc, LEc, LIc, muc)
            d = space.difference_soa(Xnc, xnext)
            return r_all, d, w_all  # w_all tangent is zero; primal only

        zq = jnp.zeros((split, T), cdt)
        zv = jnp.zeros((ndx - split, T), cdt)
        zu = jnp.zeros((nu, T), cdt)

        def basis(n):
            return jnp.broadcast_to(jnp.eye(n, dtype=cdt)[..., None],
                                    (n, n, T))

        (r0, d0, w0), lin_q = jax.linearize(lambda a: bundle(a, zv, zu), zq)
        _, lin_v = jax.linearize(lambda a: bundle(zq, a, zu)[:2], zv)
        _, lin_u = jax.linearize(lambda a: bundle(zq, zv, a)[:2], zu)
        Jr_q, Jd_q, _ = jax.vmap(lin_q)(basis(split))
        Jr_v, Jd_v = jax.vmap(lin_v)(basis(ndx - split))
        Jr_u, Jd_u = jax.vmap(lin_u)(basis(nu))
        Jr = jnp.concatenate([Jr_q, Jr_v, Jr_u], axis=0)  # (ndx+nu, nr, T)
        Jd = jnp.concatenate([Jd_q, Jd_v, Jd_u], axis=0)  # (ndx+nu, ndx, T)

        if ld is not None:
            # working-dtype primal for the gradient/defect (the bf16 ones
            # would poison the gap folding); shares the line search's
            # alpha=0 evaluation via CSE
            r0, w0, _, _, xnext = self._stage_bundle_soa(X, U, P, LE, LI, mu)
            d0 = space.difference_soa(Xn, xnext)

        # one sqrt(w)-scaled copy of Jr feeds BOTH Gauss-Newton products
        # (H = (W^1/2 J)^T (W^1/2 J), grad = (W^1/2 J)^T (W^1/2 r)) — halves
        # the HBM reads of the (60, nr, T) Jacobian stack
        ws = jnp.sqrt(w0)
        Jw = Jr * ws.astype(cdt)[None]
        wr = (ws * r0).astype(cdt)
        grad = jnp.einsum("ent,nt->te", Jw, wr,
                          preferred_element_type=dtype)  # (T, ndx+nu)
        H = jnp.einsum("ant,bnt->tab", Jw, Jw,
                       preferred_element_type=dtype)  # (T, 60, 60)
        A = jnp.transpose(Jd[:ndx], (2, 1, 0)).astype(dtype)  # (T, ndx, ndx)
        B = jnp.transpose(Jd[ndx:], (2, 1, 0)).astype(dtype)  # (T, ndx, nu)
        return dict(A=A, B=B, d=d0.T.astype(dtype),
                    qx=grad[:, :ndx], qu=grad[:, ndx:],
                    Qxx=H[:, :ndx, :ndx], Quu=H[:, ndx:, ndx:],
                    Qux=H[:, ndx:, :ndx])

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
        """Riccati backward pass: serial lax.scan oracle, or the
        associative-scan parallel-in-time version (settings.parallel) —
        the TPU analogue of Aligator's PARALLEL LQ choice (mpc.cpp:46-52)."""
        # with u scaling, Qu is the gradient wrt u_hat = u/s; the dual
        # residual must be reported in PHYSICAL units (|dL/du| = |Qu|/s) or
        # the BCL omega gate sees s-inflated values and stops promoting
        # multipliers
        dual_scale = (None if self._u_scale is None
                      else 1.0 / jnp.asarray(self._u_scale,
                                             lin["qu"].dtype))
        if self.settings.parallel:
            from .parallel_riccati import parallel_backward

            return parallel_backward(lin, Vx_T, Vxx_T, reg,
                                     dual_scale=dual_scale)

        def step(carry, s):
            Vx, Vxx = carry
            A, B, d = s["A"], s["B"], s["d"]
            ndx = A.shape[0]
            # Merged-products step: the 36/24-sized per-stage matmuls are
            # far below the MXU tile, so fewer/larger products beat many
            # small ones.  [A B] concatenated gives the whole Q expansion
            # in TWO matrix products instead of five, and the condensed
            # value update (with the exact reg correction — k/K solve
            # against Quu + reg*diag(dscale^2), so K'QuuK = -K'Qux -
            # reg*K'DK) needs one more instead of five.
            AB = jnp.concatenate([A, B], axis=1)  # (ndx, ndx+nu)
            Vx_g = Vx + Vxx @ d  # gap folding (multiple shooting)
            VAB = Vxx @ AB  # (ndx, ndx+nu)
            H = AB.T @ VAB  # (ndx+nu, ndx+nu)
            gq = AB.T @ Vx_g
            Qx = s["qx"] + gq[:ndx]
            Qu = s["qu"] + gq[ndx:]
            Qxx = s["Qxx"] + H[:ndx, :ndx]
            Quu = s["Quu"] + H[ndx:, ndx:]
            Qux = s["Qux"] + H[ndx:, :ndx]
            nu = Qu.shape[0]
            dtype = Qu.dtype
            # Jacobi preconditioning: D^-1/2 Quu D^-1/2 has unit diagonal
            dscale = jnp.sqrt(jnp.abs(jnp.diag(Quu)) + _eps(dtype))
            Qs = Quu / (dscale[:, None] * dscale[None, :])
            Qs = Qs + reg * jnp.eye(nu, dtype=dtype)
            # fully unrolled Cholesky + substitution (ops/soa_dyn.py): the
            # nu x nu factorization becomes one fused elementwise DAG per
            # scan step instead of XLA's blocked lapack-style loop — the
            # per-step win that dominates the serial backward at T=100
            from ..ops.soa_dyn import chol_solve_unrolled, chol_unrolled

            L = chol_unrolled(Qs)
            rhs = jnp.concatenate([(Qu / dscale)[:, None], Qux / dscale[:, None]],
                                  axis=1)
            sol = chol_solve_unrolled(L, rhs) / dscale[:, None]
            k = -sol[:, 0]
            K = -sol[:, 1:]
            # explicit PSD value update assembled from merged products
            # (P = [-k -K]): the condensed form Vxx = Qxx + Qux'K -
            # reg*K'DK relies on analytic cancellation of the large
            # K'QuuK term and loses positive-semidefiniteness under f32
            # ill-conditioning at contact switches (measured: NaN'd the
            # full-dynamics walking loop); the explicit quadratic form
            # keeps the PSD structure the recursion needs.
            QuuP = Quu @ sol  # (nu, 1+ndx)
            PtQuuP = sol.T @ QuuP  # [[k'Quuk, k'QuuK],[K'Quuk, K'QuuK]]
            QuxtP = Qux.T @ sol  # [-Qux'k | -Qux'K]
            KtQu = -sol[:, 1:].T @ Qu
            Vx_new = Qx + KtQu - QuxtP[:, 0] + PtQuuP[1:, 0]
            Vxx_new = (Qxx - QuxtP[:, 1:] - QuxtP[:, 1:].T
                       + PtQuuP[1:, 1:])
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            return (Vx_new, Vxx_new), (k, K, Qu)

        (_, _), (ks, Ks, Qus) = jax.lax.scan(
            step, (Vx_T, Vxx_T), lin, reverse=True,
            unroll=self.settings.scan_unroll)
        if dual_scale is not None:
            Qus = Qus * dual_scale[None, :]
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
            step, dx0, (lin["A"], lin["B"], lin["d"], ks, Ks),
            unroll=self.settings.scan_unroll
        )
        xs_new = jax.vmap(self.space.integrate)(
            xs, jnp.concatenate([dxs, dx_T[None]], axis=0)
        )
        if self._u_scale is not None:  # dus is in u_hat units; chain back
            dus = dus * jnp.asarray(self._u_scale, us.dtype)[None, :]
        us_new = us + dus
        return xs_new, us_new

    # ------------------------------------------------------------------
    # Main loop
    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 6))
    def run(self, problem, xs, us, lams: Optional[tuple] = None,
            mu: Optional[float] = None, max_iters: Optional[int] = None) -> Results:
        """One or more ProxDDP iterations from a warm start.

        (solver_->run(problem, xs_warm, us_warm), mpc.cpp:212)
        """
        # TPU matmuls default to bf16 inputs; the Riccati/Gauss-Newton
        # products need full f32 accumulate or the backward pass NaNs
        with jax.default_matmul_precision("float32"):
            return self._run_impl(problem, xs, us, lams, mu, max_iters)

    def _run_impl(self, problem, xs, us, lams, mu, max_iters):
        st = self.settings
        ocp = self.ocp
        T = problem.horizon
        dtype = xs.dtype
        eps = _eps(dtype)
        if lams is None:
            lam_eq = jnp.zeros((T, ocp.n_eq), dtype)
            lam_in = jnp.zeros((T, ocp.n_in), dtype)
            lam_term = jnp.zeros((ocp.n_term_eq,), dtype)
        else:
            lam_eq, lam_in, lam_term = lams
        # dtype-aware floors: f64 keeps the reference's 1e-8; f32 floors at
        # sqrt(eps) ~ 3e-4 (1/mu enters squared in the AL Hessian)
        mu_floor = jnp.asarray(np.sqrt(eps), dtype)
        mu = jnp.asarray(st.mu_init if mu is None else mu, dtype)
        mu = jnp.maximum(mu, mu_floor)
        reg = jnp.maximum(jnp.asarray(st.reg_init, dtype),
                          jnp.asarray(50.0 * eps, dtype))
        n_iters = st.max_iters if max_iters is None else max_iters
        alphas = jnp.asarray(st.alphas, dtype)

        def iteration(carry, _):
            xs, us, lam_eq, lam_in, lam_term, mu, eta, omega = carry
            sp = problem.stage_params
            if self._use_soa:
                lin = self._linearize_traj_soa(problem, xs, us, lam_eq,
                                               lam_in, mu)
            else:
                lin = jax.vmap(
                    lambda x, u, xn, p, le, li: self._linearize_stage(
                        x, u, xn, p, le, li, mu)
                )(xs[:-1], us, xs[1:], sp, lam_eq, lam_in)
            Vx_T, Vxx_T = self._linearize_term(xs[-1], problem.term_params, lam_term, mu)
            ks, Ks, dual_res = self._backward(lin, Vx_T, Vxx_T, reg)
            dx0 = self.space.difference(xs[0], problem.x0)  # force_initial_condition

            def try_alpha(alpha):
                xs_new, us_new = self._candidate(xs, us, lin, ks, Ks, dx0, alpha)
                costs, g_all, h_all, gaps = self._eval_traj(
                    problem, xs_new, us_new, lam_eq, lam_in, mu)
                term = self._term_al_cost(xs_new[-1], problem.term_params, lam_term, mu)
                x0_gap = self.space.difference(xs_new[0], problem.x0)
                m = self._merit_from(costs, gaps, x0_gap, term, mu)
                # NaN-poisoned candidates lose to every finite merit
                m = jnp.where(jnp.isnan(m), jnp.inf, m)
                return m, xs_new, us_new, g_all, h_all, gaps

            merits, xs_cand, us_cand, g_cand, h_cand, gap_cand = jax.vmap(try_alpha)(alphas)
            best = jnp.argmin(merits)
            xs_n, us_n = xs_cand[best], us_cand[best]
            g_all, h_all, gaps = g_cand[best], h_cand[best], gap_cand[best]
            merit = merits[best]

            g_term = ocp.term_eq_constraints(xs_n[-1], problem.term_params)
            prim = jnp.max(jnp.abs(gaps))
            if ocp.n_eq:
                prim = jnp.maximum(prim, jnp.max(jnp.abs(g_all)))
            if ocp.n_in:
                prim = jnp.maximum(prim, jnp.max(jnp.maximum(h_all, 0.0)))
            if ocp.n_term_eq:
                prim = jnp.maximum(prim, jnp.max(jnp.abs(g_term)))

            # BCL outer loop (LANCELOT schedule, the AL safeguard Aligator's
            # ProxDDP uses).  The inner loop is "converged" when the
            # stationarity residual |Qu|_inf beats omega; only then is the
            # first-order update lam += g/mu a meaningful multiplier
            # estimate.  inner-converged + feasible -> promote multipliers,
            # tighten eta/omega; inner-converged + infeasible -> stiffen mu,
            # reset the tolerances from the new mu; inner not converged ->
            # keep iterating with everything frozen.  Ungated updates (or a
            # feasibility-only gate) inject O(g/mu) multiplier overshoots
            # that make the merit rise and pin the line search at alpha=0.
            if st.bcl:
                # scale-free omega init: relative to the first dual residual
                omega = jnp.where(omega < 0, jnp.maximum(
                    dual_res * jnp.asarray(st.bcl_omega_init, dtype),
                    jnp.asarray(st.tol, dtype)), omega)
                dual_ok = dual_res <= omega
                ok = dual_ok & (prim <= eta)
                fail = dual_ok & (prim > eta)
                mu_n = jnp.where(
                    fail,
                    jnp.maximum(mu * jnp.asarray(st.bcl_mu_factor, dtype),
                                mu_floor),
                    mu)
                eta_n = jnp.where(
                    ok,
                    jnp.maximum(jnp.asarray(st.tol, dtype),
                                eta * jnp.asarray(st.bcl_eta_shrink, dtype)),
                    jnp.where(fail,
                              jnp.maximum(jnp.asarray(st.tol, dtype),
                                          mu_n ** jnp.asarray(st.bcl_alpha, dtype)),
                              eta))
                omega_n = jnp.where(
                    ok,
                    jnp.maximum(jnp.asarray(st.tol, dtype),
                                omega * jnp.asarray(st.bcl_omega_shrink, dtype)),
                    jnp.where(fail, omega / jnp.asarray(st.bcl_mu_factor, dtype),
                              omega))
            else:
                ok = jnp.asarray(True)
                mu_n = mu
                eta_n = eta
                omega_n = omega
            lam_eq_n = jnp.where(ok, lam_eq + g_all / mu, lam_eq)
            # projection keeps the inequality multipliers in the dual cone
            lam_in_n = jnp.where(ok, jnp.maximum(0.0, lam_in + h_all / mu), lam_in)
            lam_term_n = jnp.where(ok, lam_term + g_term / mu, lam_term)
            stats = (prim, dual_res, merit, ks, Ks)
            return (xs_n, us_n, lam_eq_n, lam_in_n, lam_term_n, mu_n, eta_n,
                    omega_n), stats

        eta0 = jnp.maximum(jnp.asarray(st.tol, dtype),
                           mu ** jnp.asarray(st.bcl_alpha, dtype))
        omega0 = jnp.asarray(-1.0, dtype)  # set from the first dual residual
        carry = (xs, us, lam_eq, lam_in, lam_term, mu, eta0, omega0)
        carry, stats = jax.lax.scan(iteration, carry, None, length=n_iters)
        xs, us, lam_eq, lam_in, lam_term, mu = carry[:6]
        prim, dual, merit, ks_all, Ks_all = stats
        bad = ~(jnp.all(jnp.isfinite(xs)) & jnp.all(jnp.isfinite(us))
                & jnp.isfinite(merit[-1]))
        ks_out, Ks_out = ks_all[-1], Ks_all[-1]
        if self._u_scale is not None:  # gains back to physical u units
            su_out = jnp.asarray(self._u_scale, dtype)
            ks_out = ks_out * su_out[None, :]
            Ks_out = Ks_out * su_out[None, :, None]
        return Results(xs=xs, us=us, ks=ks_out, Ks=Ks_out,
                       lam_eq=lam_eq, lam_in=lam_in, lam_term=lam_term,
                       prim_res=prim[-1], dual_res=dual[-1], merit=merit[-1],
                       mu=mu, diverged=bad)
