"""Native host QP (C++ ADMM) vs. the JAX kernel — same problem, same
solution (deployment path parity, SURVEY §2b ProxSuite row)."""
import numpy as np
import pytest

from simple_mpc_tpu import native
from simple_mpc_tpu.id.qp import solve_qp

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def random_qp(n=24, m=40, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(n, n))
    H = W @ W.T / n + 0.5 * np.eye(n)
    g = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    # mix of equalities, boxes, one-sided rows
    l = np.full(m, -1e20)
    u = np.full(m, 1e20)
    l[:5] = u[:5] = rng.normal(size=5) * 0.1  # equalities
    l[5:20] = -1.0
    u[5:20] = 1.0
    u[20:30] = 0.5
    return H, g, A, l, u


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_jax(seed):
    H, g, A, l, u = random_qp(seed=seed)
    sol = solve_qp(H, g, A, l, u, iters=400)
    z_n, y_n, prim_n, dual_n = native.solve_qp_host(H, g, A, l, u, iters=400)
    assert prim_n < 1e-5, prim_n
    np.testing.assert_allclose(z_n, np.asarray(sol.z), atol=2e-4)


def test_native_warm_start():
    H, g, A, l, u = random_qp(seed=3)
    z1, y1, _, _ = native.solve_qp_host(H, g, A, l, u, iters=400)
    # warm-started resolve converges in far fewer iterations
    z2, y2, prim, dual = native.solve_qp_host(H, g, A, l, u, iters=20,
                                              z0=z1, y0=y1)
    np.testing.assert_allclose(z2, z1, atol=1e-6)
    assert prim < 1e-6
