"""Parallel (associative-scan) Riccati vs. the serial lax.scan oracle.

SURVEY.md §7.5: the parallel backward must produce identical gains; this is
the TPU counterpart of Aligator SERIAL-vs-PARALLEL LQ equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_mpc_tpu.solver.parallel_riccati import parallel_backward


def random_lq(T=25, ndx=8, nu=3, seed=0):
    rng = np.random.default_rng(seed)
    lin = {}
    A = rng.normal(size=(T, ndx, ndx)) * 0.3 + np.eye(ndx)[None]
    B = rng.normal(size=(T, ndx, nu)) * 0.2
    d = rng.normal(size=(T, ndx)) * 0.01
    qx = rng.normal(size=(T, ndx)) * 0.1
    qu = rng.normal(size=(T, nu)) * 0.1
    Qxx, Quu, Qux = [], [], []
    for t in range(T):
        Wx = rng.normal(size=(ndx + nu, ndx + nu))
        H = Wx @ Wx.T / (ndx + nu) + 0.5 * np.eye(ndx + nu)
        Qxx.append(H[:ndx, :ndx])
        Quu.append(H[ndx:, ndx:])
        Qux.append(H[ndx:, :ndx])
    lin = dict(A=jnp.asarray(A), B=jnp.asarray(B), d=jnp.asarray(d),
               qx=jnp.asarray(qx), qu=jnp.asarray(qu),
               Qxx=jnp.asarray(np.stack(Qxx)), Quu=jnp.asarray(np.stack(Quu)),
               Qux=jnp.asarray(np.stack(Qux)))
    WT = rng.normal(size=(ndx, ndx))
    Vxx_T = jnp.asarray(WT @ WT.T / ndx + 0.5 * np.eye(ndx))
    Vx_T = jnp.asarray(rng.normal(size=ndx) * 0.1)
    return lin, Vx_T, Vxx_T


def serial_backward(lin, Vx_T, Vxx_T, reg):
    """Plain (unpreconditioned) serial Riccati for an exact comparison."""

    def step(carry, s):
        Vx, Vxx = carry
        A, B, d = s["A"], s["B"], s["d"]
        Vx_g = Vx + Vxx @ d
        Qx = s["qx"] + A.T @ Vx_g
        Qu = s["qu"] + B.T @ Vx_g
        Qxx = s["Qxx"] + A.T @ Vxx @ A
        Quu = s["Quu"] + B.T @ Vxx @ B + reg * jnp.eye(B.shape[1], dtype=B.dtype)
        Qux = s["Qux"] + B.T @ Vxx @ A
        kK = jnp.linalg.solve(Quu, jnp.concatenate([Qu[:, None], Qux], axis=1))
        k, K = -kK[:, 0], -kK[:, 1:]
        Vx_n = Qx + K.T @ Qu + Qux.T @ k + K.T @ Quu @ k
        Vxx_n = Qxx + K.T @ Qux + Qux.T @ K + K.T @ Quu @ K
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
        return (Vx_n, Vxx_n), (k, K, Qu)

    (_, _), (ks, Ks, Qus) = jax.lax.scan(step, (Vx_T, Vxx_T), lin, reverse=True)
    return ks, Ks, jnp.max(jnp.abs(Qus))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_parallel_matches_serial(seed):
    lin, Vx_T, Vxx_T = random_lq(seed=seed)
    reg = 1e-9
    ks_s, Ks_s, dual_s = serial_backward(lin, Vx_T, Vxx_T, reg)
    ks_p, Ks_p, dual_p = parallel_backward(lin, Vx_T, Vxx_T, reg)
    np.testing.assert_allclose(np.asarray(ks_p), np.asarray(ks_s),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Ks_p), np.asarray(Ks_s),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(dual_p), float(dual_s), rtol=1e-6)


@pytest.mark.slow
def test_parallel_long_horizon():
    """T=100 (the benchmark horizon) stays numerically healthy."""
    lin, Vx_T, Vxx_T = random_lq(T=100, seed=3)
    ks_s, Ks_s, _ = serial_backward(lin, Vx_T, Vxx_T, 1e-9)
    ks_p, Ks_p, _ = parallel_backward(lin, Vx_T, Vxx_T, 1e-9)
    np.testing.assert_allclose(np.asarray(Ks_p), np.asarray(Ks_s),
                               rtol=1e-5, atol=1e-7)
