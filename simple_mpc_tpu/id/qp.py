"""Dense ADMM QP solver — the ProxQP-capability kernel for the 1 kHz ID layer.

Reference capability: tsid::solvers::SolverProxQP consuming the HQP data of
InverseDynamicsFormulationAccForce (kinodynamics-id.hpp:84, kinodynamics-id.cpp:
93, 117, 229).  TPU-native re-design: one fixed-size OSQP-form problem

    min 0.5 z'Hz + g'z   s.t.  l <= Az <= u

solved by over-relaxed ADMM with a single Cholesky factorization and a fixed
iteration count — no data-dependent control flow, so the whole solve jits,
vmaps over robot batches, and runs as a handful of fused matmuls on the MXU.
Equalities are rows with l == u (they get a stiffer per-row rho, OSQP-style).
Dynamic task sets (TSID add/removeRigidContact) become bound toggling:
deactivated rows get (-inf, +inf), so shapes never change and nothing
recompiles when the contact set changes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class QPSolution(NamedTuple):
    z: jnp.ndarray  # (n,) primal
    y: jnp.ndarray  # (m,) dual
    prim_res: jnp.ndarray  # scalar, max |Az - proj(Az)|
    dual_res: jnp.ndarray  # scalar


def solve_qp(H, g, A, l, u, iters: int = 100, rho: float = 0.1,
             sigma: float = 1e-6, alpha: float = 1.6,
             z0=None, y0=None) -> QPSolution:
    """Over-relaxed ADMM (OSQP scheme).  All shapes static; `iters` fixed.

    Warm starts (z0, y0) make the 1 kHz loop cheap: consecutive ID problems
    differ only in data.
    """
    m, n = A.shape
    dtype = H.dtype
    eq = jnp.abs(u - l) < 1e-12
    rho_vec = jnp.where(eq, 1e3 * rho, rho).astype(dtype)
    K = H + sigma * jnp.eye(n, dtype=dtype) + (A.T * rho_vec[None, :]) @ A
    L = jnp.linalg.cholesky(K)

    x = jnp.zeros(n, dtype) if z0 is None else z0
    zc = A @ x
    y = jnp.zeros(m, dtype) if y0 is None else y0

    def body(carry, _):
        x, zc, y = carry
        rhs = sigma * x - g + A.T @ (rho_vec * zc - y)
        x_new = jax.scipy.linalg.cho_solve((L, True), rhs)
        Ax = A @ x_new
        Ax_rel = alpha * Ax + (1.0 - alpha) * zc
        zc_new = jnp.clip(Ax_rel + y / rho_vec, l, u)
        y_new = y + rho_vec * (Ax_rel - zc_new)
        return (x_new, zc_new, y_new), None

    (x, zc, y), _ = jax.lax.scan(body, (x, zc, y), None, length=iters)
    Ax = A @ x
    prim = jnp.max(jnp.abs(Ax - jnp.clip(Ax, l, u)))
    dual = jnp.max(jnp.abs(H @ x + g + A.T @ y))
    return QPSolution(z=x, y=y, prim_res=prim, dual_res=dual)
