"""Fused stage_eval bundles must equal the composed split methods exactly
(kinodynamics + full dynamics overrides vs. the OCPHandler default)."""
import jax.numpy as jnp
import numpy as np

from simple_mpc_tpu.ocp.base import OCPHandler, index_params
from tests.test_fulldynamics_solver import make_go2_full
from tests.test_kinodynamics_solver import make_go2_kino


def _check(ocp, x, u, p):
    fused = ocp.stage_eval(x, u, p)
    split = OCPHandler.stage_eval(ocp, x, u, p)
    for a, b, name in zip(fused, split, ["r", "w", "g", "h", "xnext"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12,
                                   err_msg=name)


def test_kinodynamics_fusion():
    ocp, mh, dh, x0 = make_go2_kino(T=3, force_cone=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.concatenate(
        [np.asarray(x0[: ocp.nq]), 0.1 * rng.normal(size=ocp.nv)]))
    u = jnp.asarray(rng.normal(size=ocp.nu))
    _check(ocp, x, u, index_params(ocp.problem.stage_params, 1))


def test_kinodynamics_flattened_vs_reference():
    """The world-frame flattened stage_eval (ops/world.py) must equal the
    per-joint oracle (stage_eval_reference) exactly, including at random
    base orientations."""
    ocp, mh, dh, x0 = make_go2_kino(T=3, force_cone=True)
    rng = np.random.default_rng(7)
    q = np.asarray(x0[: ocp.nq]) + 0.2 * rng.normal(size=ocp.nq)
    q[3:7] /= np.linalg.norm(q[3:7])
    x = jnp.asarray(np.concatenate([q, 0.5 * rng.normal(size=ocp.nv)]))
    u = jnp.asarray(rng.normal(size=ocp.nu))
    p = index_params(ocp.problem.stage_params, 1)
    fused = ocp.stage_eval(x, u, p)
    oracle = ocp.stage_eval_reference(x, u, p)
    for a, b, name in zip(fused, oracle, ["r", "w", "g", "h", "xnext"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11,
                                   err_msg=name)


def test_kinodynamics_flattened_talos_6d():
    """6D (quad-foot) variant: Talos kinodynamics stage bundle."""
    import tests.test_kinodynamics_solver as tks
    from simple_mpc_tpu.configs import talos_handler
    from simple_mpc_tpu.ocp.kinodynamics import KinodynamicsOCP

    mh = talos_handler()
    model = mh.model
    nv = model.nv
    conf = dict(
        timestep=0.01,
        w_x=np.ones(2 * nv) * 0.1, w_u=np.ones(6 * 2 + nv - 6) * 1e-3,
        w_cent=np.ones(6) * 0.1, w_centder=np.ones(6) * 0.1,
        w_frame=np.ones(6) * 100.0, gravity=np.array([0, 0, -9.81]),
        force_size=6, qmin=model.lower_limit[7:], qmax=model.upper_limit[7:],
        kinematics_limits=True, force_cone=True, land_cstr=False,
        mu=0.8, Lfoot=0.1, Wfoot=0.075,
    )
    ocp = KinodynamicsOCP(conf, mh)
    x0 = np.asarray(mh.reference_state)
    ocp.create_problem(x0, 3, 6, -9.81, False)
    rng = np.random.default_rng(11)
    q = x0[: ocp.nq] + 0.1 * rng.normal(size=ocp.nq)
    q[3:7] /= np.linalg.norm(q[3:7])
    x = jnp.asarray(np.concatenate([q, 0.3 * rng.normal(size=ocp.nv)]))
    u = jnp.asarray(rng.normal(size=ocp.nu))
    p = index_params(ocp.problem.stage_params, 1)
    fused = ocp.stage_eval(x, u, p)
    oracle = ocp.stage_eval_reference(x, u, p)
    for a, b, name in zip(fused, oracle, ["r", "w", "g", "h", "xnext"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10,
                                   err_msg=name)


def test_fulldynamics_fusion():
    ocp, mh, dh, x0 = make_go2_full(T=3)
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.concatenate(
        [np.asarray(x0[: ocp.nq]), 0.05 * rng.normal(size=ocp.nv)]))
    u = jnp.asarray(0.5 * rng.normal(size=ocp.nu))
    _check(ocp, x, u, index_params(ocp.problem.stage_params, 1))
