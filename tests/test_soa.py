"""Validation of the trailing-batch (SoA) kernels and solver path.

ops/soa.py must agree with vmap over the per-sample oracles (ops/lie,
ops/world, stage_eval), and the solver's SoA trajectory path must produce
the same iterates as the generic per-stage path to float tolerance.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_mpc_tpu.configs import (go2_handler, go2_kinodynamics_config,
                                    talos_handler, talos_kinodynamics_config)
from simple_mpc_tpu.ocp.kinodynamics import KinodynamicsOCP
from simple_mpc_tpu.ops import soa
from simple_mpc_tpu.ops import world as W
from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings


def _rand_states(model, n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, model.nq)) * 0.3
    quat = rng.normal(size=(n, 4))
    q[:, 3:7] = quat / np.linalg.norm(quat, axis=-1, keepdims=True)
    v = rng.normal(size=(n, model.nv))
    return jnp.asarray(q), jnp.asarray(v)


@pytest.fixture(scope="module", params=["go2", "talos"])
def setup(request):
    mh = go2_handler() if request.param == "go2" else talos_handler()
    q, v = _rand_states(mh.model, 5, seed=hash(request.param) % 2**31)
    return request.param, mh, q, v


def test_fk_world_soa(setup):
    _, mh, q, v = setup
    model = mh.model
    oR, op = soa.fk_world(model, q.T)
    oR0, op0 = jax.vmap(lambda qq: W.fk_world(model, qq))(q)
    np.testing.assert_allclose(np.moveaxis(np.asarray(oR), -1, 0),
                               np.asarray(oR0), atol=1e-12)
    np.testing.assert_allclose(np.moveaxis(np.asarray(op), -1, 0),
                               np.asarray(op0), atol=1e-12)


def test_world_algebra_soa(setup):
    _, mh, q, v = setup
    model = mh.model
    qT, vT = q.T, v.T
    oR, op = soa.fk_world(model, qT)
    Sw = soa.world_axes(model, oR, op)
    com = soa.com_world(model, oR, op)
    vW = soa.body_velocities(model, Sw, vT)
    hg = soa.agx(model, oR, op, Sw, vT, com)
    bias = soa.bias_hdot(model, oR, op, Sw, vW, vT, com)
    A6 = soa.ag6(model, oR, op, Sw, com)

    def oracle(qq, vv):
        oR, op = W.fk_world(model, qq)
        Sw = W.world_axes(model, qq, oR, op)
        com = W.com_world(model, oR, op)
        vW = W.body_velocities(model, Sw, vv)
        return (com, W.Agx(model, oR, op, Sw, vv, com),
                W.bias_hdot(model, oR, op, Sw, vW, vv, com),
                W.ag6(model, oR, op, Sw, com))

    com0, hg0, bias0, A60 = jax.vmap(oracle)(q, v)
    np.testing.assert_allclose(np.asarray(com.T), np.asarray(com0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(hg.T), np.asarray(hg0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(bias.T), np.asarray(bias0), atol=1e-8)
    np.testing.assert_allclose(np.moveaxis(np.asarray(A6), -1, 0),
                               np.asarray(A60), atol=1e-8)
    # closed-form centroidal solve against dense LU on the oracle A6
    b = jnp.asarray(np.random.default_rng(1).normal(size=(6, q.shape[0])))
    x = soa.centroidal_solve6(model, oR, op, com, b)
    x0 = jax.vmap(jnp.linalg.solve)(A60, b.T)
    np.testing.assert_allclose(np.asarray(x.T), np.asarray(x0), atol=1e-8)
    # solve_spd6 on a genuinely SPD system
    S = jnp.einsum("abn,cbn->acn", A6, A6) + 1e-3 * jnp.eye(6)[..., None]
    xs = soa.solve_spd6(S, b)
    S0 = np.moveaxis(np.asarray(S), -1, 0)
    xs0 = np.linalg.solve(S0, np.asarray(b.T)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(xs.T), xs0, atol=1e-7)


def test_state_ops_soa(setup):
    _, mh, q, v = setup
    model = mh.model
    from simple_mpc_tpu.ops import state as st

    n = q.shape[0]
    rng = np.random.default_rng(3)
    dq = jnp.asarray(rng.normal(size=(n, model.nv)) * 0.2)
    q2 = jax.vmap(lambda a, b: st.integrate(model, a, b))(q, dq)
    q2s = soa.integrate(model, q.T, dq.T)
    np.testing.assert_allclose(np.asarray(q2s.T), np.asarray(q2), atol=1e-10)
    d = jax.vmap(lambda a, b: st.difference(model, a, b))(q, q2)
    ds = soa.difference(model, q.T, q2s)
    np.testing.assert_allclose(np.asarray(ds.T), np.asarray(d), atol=1e-8)


def _make_ocp(name, mh):
    if name == "go2":
        cfg = go2_kinodynamics_config(mh)
    else:
        cfg = talos_kinodynamics_config(mh)
    ocp = KinodynamicsOCP(cfg, mh)
    x0 = jnp.asarray(mh.reference_state)
    T = 8
    ocp.create_problem(x0, T, ocp.fs, -9.81, True)
    return ocp, x0, T


def test_stage_eval_soa_matches(setup):
    name, mh, q, v = setup
    ocp, x0, T = _make_ocp(name, mh)
    sp = ocp.problem.stage_params
    rng = np.random.default_rng(7)
    xs = jnp.asarray(np.asarray(x0)[None] + 0.0
                     * rng.normal(size=(T, x0.shape[0])))
    # perturb velocities + joints only (keep quaternion valid)
    pert = rng.normal(size=(T, x0.shape[0])) * 0.05
    pert[:, 3:7] = 0.0
    xs = xs + jnp.asarray(pert)
    us = jnp.asarray(rng.normal(size=(T, ocp.nu)) * 0.1)

    r0, w0, g0, h0, xn0 = jax.vmap(lambda x, u, p: ocp.stage_eval(x, u, p))(
        xs, us, sp)
    P = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, -1), sp)
    r1, w1, g1, h1, xn1 = ocp.stage_eval_soa(xs.T, us.T, P)
    np.testing.assert_allclose(np.asarray(r1.T), np.asarray(r0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(g1.T), np.asarray(g0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(h1.T), np.asarray(h0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(xn1.T), np.asarray(xn0), atol=1e-8)


@pytest.mark.slow
def test_solver_soa_equivalence(setup):
    """The SoA trajectory path must reproduce the generic per-stage path."""
    name, mh, _, _ = setup
    ocp, x0, T = _make_ocp(name, mh)
    xs = jnp.tile(x0[None], (T + 1, 1))
    us = jnp.tile(jnp.asarray(ocp.get_reference_control(0))[None], (T, 1))

    s_ref = ProxDDPSolver(ocp, SolverSettings(max_iters=3, mu_init=1e-6,
                                              soa=False))
    s_soa = ProxDDPSolver(ocp, SolverSettings(max_iters=3, mu_init=1e-6,
                                              soa=True))
    r_ref = s_ref.run(ocp.problem, xs, us)
    r_soa = s_soa.run(ocp.problem, xs, us)
    np.testing.assert_allclose(np.asarray(r_soa.xs), np.asarray(r_ref.xs),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(r_soa.us), np.asarray(r_ref.us),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(r_soa.Ks), np.asarray(r_ref.Ks),
                               atol=1e-6)
    np.testing.assert_allclose(float(r_soa.prim_res), float(r_ref.prim_res),
                               atol=1e-9)
