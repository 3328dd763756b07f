"""Split-block stage linearization == monolithic Jacobian.

The solver linearizes each stage per input block (dq / dv / du) with
symbolic-zero tangents in the other blocks (ProxDDPSolver._linearize_stage).
This must produce exactly the same Jacobians as pushing eye(ndx+nu) through
the full bundle — the blocks are just groups of directional derivatives.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_kinodynamics_solver import make_go2_kino
from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings


def monolithic_linearize(solver, x, u, xn, p, lam_eq, lam_in, mu):
    space = solver.space
    ndx, nu = space.ndx, solver.ocp.nu

    def bundle(dxu):
        xx = space.integrate(x, dxu[:ndx])
        uu = u + dxu[ndx:]
        r_all, w_all, _, _, xnext = solver._stage_bundle(
            xx, uu, p, lam_eq, lam_in, mu)
        d = space.difference(xn, xnext)
        return r_all, d

    z0 = jnp.zeros(ndx + nu, dtype=x.dtype)
    (r0, d0), lin = jax.linearize(bundle, z0)
    Jr_T, Jd_T = jax.vmap(lin)(jnp.eye(ndx + nu, dtype=x.dtype))
    return Jr_T.T, Jd_T.T


@pytest.mark.slow
def test_split_matches_monolithic():
    ocp, mh, dh, x0 = make_go2_kino(T=3)
    solver = ProxDDPSolver(ocp, SolverSettings())
    p0 = jax.tree_util.tree_map(lambda a: a[0], ocp.problem.stage_params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.asarray(x0))
    # perturb the state off the reference so no Jacobian block is trivially 0
    dx = jnp.asarray(rng.normal(size=ocp.space.ndx) * 0.05)
    x = ocp.space.integrate(x, dx)
    u = jnp.asarray(np.asarray(ocp.get_reference_control(0))
                    + rng.normal(size=ocp.nu) * 0.1)
    xn = ocp.space.integrate(x, jnp.asarray(rng.normal(size=ocp.space.ndx) * 0.02))
    lam_eq = jnp.asarray(rng.normal(size=ocp.n_eq) * 0.1)
    lam_in = jnp.asarray(rng.normal(size=ocp.n_in) * 0.1)
    mu = jnp.asarray(1e-4)

    lin = solver._linearize_stage(x, u, xn, p0, lam_eq, lam_in, mu)
    J_ref, AB_ref = monolithic_linearize(solver, x, u, xn, p0, lam_eq, lam_in, mu)
    ndx = ocp.space.ndx
    A_ref, B_ref = AB_ref[:, :ndx], AB_ref[:, ndx:]
    np.testing.assert_allclose(np.asarray(lin["A"]), np.asarray(A_ref),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(lin["B"]), np.asarray(B_ref),
                               rtol=1e-10, atol=1e-12)
    # Gauss-Newton pieces from the reference Jacobian
    r_all, w_all, _, _, _ = solver._stage_bundle(x, u, p0, lam_eq, lam_in, mu)
    grad = J_ref.T @ (w_all * r_all)
    H = J_ref.T @ (w_all[:, None] * J_ref)
    np.testing.assert_allclose(np.asarray(lin["qx"]), np.asarray(grad[:ndx]),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(lin["qu"]), np.asarray(grad[ndx:]),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(lin["Quu"]), np.asarray(H[ndx:, ndx:]),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(lin["Qux"]), np.asarray(H[ndx:, :ndx]),
                               rtol=1e-9, atol=1e-11)
