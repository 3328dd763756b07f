"""Parallel-in-time Riccati backward pass via associative scan.

The TPU-native equivalent of Aligator's OpenMP block-parallel LQ solver
(reference mpc.cpp:46-52, `LQSolverChoice::PARALLEL`): the backward value
recursion is reformulated as an associative composition of conditional
value-function elements (cf. PAPERS.md "The Parallelization of Riccati
Recursion"; Särkkä & García-Fernández temporal-parallelization scheme) and
evaluated with `lax.associative_scan` — O(log T) depth instead of O(T),
mapping onto the MXU as batched (T, n, n) matmuls.

Each element e = (A, b, C, eta, J) encodes the value-function map of a stage
after eliminating its control:
    A_e = A - B Quu^{-1} Qux          (closed-loop drift)
    b_e = d - B Quu^{-1} qu           (affine drift incl. shooting gap)
    C_e = B Quu^{-1} B'               (control-channel "covariance")
    J_e = Qxx - Qux' Quu^{-1} Qux     (eliminated stage cost Hessian)
    eta_e = -(qx - Qux' Quu^{-1} qu)  (eliminated stage cost gradient, negated)
with terminal element (0, 0, 0, -Vx_T, Vxx_T).  The suffix composition at t
yields S_t = J, Vx_t = -eta; gains are then recovered stage-wise in parallel.
Correctness oracle: the serial `lax.scan` backward (test_parallel_riccati).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(e1, e2):
    """Compose element e1 (earlier stage map) with suffix element e2."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    n = A1.shape[-1]
    I = jnp.eye(n, dtype=A1.dtype)
    # shared solve against (I + C1 J2)
    M = jnp.linalg.solve(I + C1 @ J2, jnp.concatenate(
        [A1, (b1 + C1 @ eta2)[:, None], C1], axis=-1))
    A12 = A2 @ M[:, :n]
    b12 = A2 @ M[:, n] + b2
    C12 = A2 @ M[:, n + 1:] @ A2.T + C2
    C12 = 0.5 * (C12 + C12.T)
    # shared solve against (I + J2 C1)
    N = jnp.linalg.solve(I + J2 @ C1, jnp.concatenate(
        [(eta2 - J2 @ b1)[:, None], J2 @ A1], axis=-1))
    eta12 = A1.T @ N[:, 0] + eta1
    J12 = A1.T @ N[:, 1:] + J1
    J12 = 0.5 * (J12 + J12.T)
    return A12, b12, C12, eta12, J12


def _combine_batched(a, b):
    """vmapped combine for lax.associative_scan(reverse=True).

    In reverse mode the scan runs over the flipped sequence, so the block
    `a` covers LATER original stages and `b` EARLIER ones — compose as
    earlier∘later."""
    return jax.vmap(_combine)(b, a)


def parallel_backward(lin, Vx_T, Vxx_T, reg, dual_scale=None):
    """Drop-in replacement for the serial Riccati scan.

    lin: dict of stacked (T, ...) stage expansions (A, B, d, qx, qu, Qxx,
    Quu, Qux).  Returns (ks, Ks, dual_res) matching the serial pass.
    dual_scale: optional (nu,) factor applied to Qu before the dual-residual
    max (physical-unit reporting under control scaling).
    """
    A, B, d = lin["A"], lin["B"], lin["d"]
    qx, qu = lin["qx"], lin["qu"]
    Qxx, Quu, Qux = lin["Qxx"], lin["Quu"], lin["Qux"]
    T, ndx = A.shape[0], A.shape[1]
    nu = B.shape[2]
    dtype = A.dtype

    # eliminate controls stage-wise (batched Cholesky)
    Quu_r = Quu + reg * jnp.eye(nu, dtype=dtype)[None]
    Lq = jnp.linalg.cholesky(Quu_r)
    sol = jax.vmap(lambda L, rhs: jax.scipy.linalg.cho_solve((L, True), rhs))(
        Lq, jnp.concatenate([Qux, qu[..., None], B.swapaxes(1, 2)], axis=-1))
    Ui_Qux = sol[..., :ndx]          # Quu^{-1} Qux
    Ui_qu = sol[..., ndx]            # Quu^{-1} qu
    Ui_Bt = sol[..., ndx + 1:]       # Quu^{-1} B'

    Ae = A - B @ Ui_Qux
    be = d - (B @ Ui_qu[..., None])[..., 0]
    Ce = B @ Ui_Bt
    Ce = 0.5 * (Ce + Ce.swapaxes(1, 2))
    Je = Qxx - Qux.swapaxes(1, 2) @ Ui_Qux
    Je = 0.5 * (Je + Je.swapaxes(1, 2))
    etae = -(qx - (Ui_Qux.swapaxes(1, 2) @ qu[..., None])[..., 0])

    # append the terminal element
    zero_m = jnp.zeros((1, ndx, ndx), dtype)
    elems = (
        jnp.concatenate([Ae, zero_m], axis=0),
        jnp.concatenate([be, jnp.zeros((1, ndx), dtype)], axis=0),
        jnp.concatenate([Ce, zero_m], axis=0),
        jnp.concatenate([etae, -Vx_T[None]], axis=0),
        jnp.concatenate([Je, Vxx_T[None]], axis=0),
    )
    suffix = jax.lax.associative_scan(_combine_batched, elems, reverse=True)
    S = suffix[4]      # (T+1, ndx, ndx): S[t] = Vxx_t
    v = -suffix[3]     # (T+1, ndx):      v[t] = Vx_t

    # stage-wise gain recovery with the *next* value function (vmapped)
    S1, v1 = S[1:], v[1:]

    def gains(A, B, d, qu, Qux, Lq0, Quu, S1, v1):
        Vx_g = v1 + S1 @ d
        Qu_hat = qu + B.T @ Vx_g
        Qux_hat = Qux + B.T @ S1 @ A
        Quu_hat = Quu + B.T @ S1 @ B + reg * jnp.eye(B.shape[1], dtype=B.dtype)
        L = jnp.linalg.cholesky(Quu_hat)
        kK = jax.scipy.linalg.cho_solve(
            (L, True), jnp.concatenate([Qu_hat[:, None], Qux_hat], axis=1))
        return -kK[:, 0], -kK[:, 1:], Qu_hat

    ks, Ks, Qus = jax.vmap(gains)(A, B, d, qu, Qux, Lq, Quu, S1, v1)
    if dual_scale is not None:
        Qus = Qus * dual_scale[None, :]
    dual_res = jnp.max(jnp.abs(Qus))
    return ks, Ks, dual_res
