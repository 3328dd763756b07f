"""Kinodynamics OCP structure + standing solve (reference problem-suite
rung 2/4 analogue: tests/problem.cpp:105-195 + self-consistent solve)."""
import jax.numpy as jnp
import numpy as np
import pytest

from simple_mpc_tpu.models import robots
from simple_mpc_tpu.models.handler import RobotDataHandler, RobotModelHandler
from simple_mpc_tpu.ocp.kinodynamics import KinodynamicsOCP
from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings


def make_go2_kino(T=8, force_cone=False):
    """go2_kinodynamics.py:40-86 configuration."""
    model = robots.load_go2()
    mh = RobotModelHandler(model, "standing", "base")
    for f in ["FL_foot", "FR_foot", "RL_foot", "RR_foot"]:
        mh.add_point_foot(f, "base")
    dh = RobotDataHandler(mh)
    nv = model.nv
    w_basepos = [0, 0, 100, 10, 10, 0]
    w_legpos = [1, 1, 1]
    w_basevel = [10, 10, 10, 10, 10, 10]
    w_legvel = [0.1, 0.1, 0.1]
    w_x = np.array(w_basepos + w_legpos * 4 + w_basevel + w_legvel * 4)
    w_linforce = np.array([0.01, 0.01, 0.01])
    w_u = np.concatenate([w_linforce] * 4 + [np.ones(nv - 6) * 1e-5])
    conf = dict(
        timestep=0.01,
        w_x=w_x,
        w_u=w_u,
        w_cent=np.concatenate([[0.0, 0.0, 1.0], [0.1, 0.1, 10.0]]),
        w_centder=np.concatenate([np.zeros(3), np.ones(3) * 0.1]),
        gravity=np.array([0, 0, -9.81]),
        force_size=3,
        w_frame=np.ones(3) * 2000.0,
        qmin=model.lower_limit[7:],
        qmax=model.upper_limit[7:],
        mu=0.8,
        Lfoot=0.01,
        Wfoot=0.01,
        kinematics_limits=True,
        force_cone=force_cone,
        land_cstr=False,
    )
    ocp = KinodynamicsOCP(conf, mh)
    x0 = np.asarray(mh.reference_state)
    ocp.create_problem(x0, T, 3, -9.81, False)
    return ocp, mh, dh, x0


def test_problem_structure():
    ocp, mh, dh, x0 = make_go2_kino()
    assert ocp.nu == 12 + 12
    assert ocp.n_eq == 4 * 3
    assert ocp.n_in == 2 * 12
    p = ocp.problem
    u0 = np.asarray(p.stage_params.u_ref[0])
    np.testing.assert_allclose(u0[2:12:3], mh.mass * 9.81 / 4, rtol=1e-12)
    np.testing.assert_allclose(u0[12:], 0.0)


def test_setters_roundtrip():
    ocp, mh, dh, x0 = make_go2_kino()
    pos = np.array([0.3, 0.1, 0.0])
    ocp.set_reference_pose(2, "FL_foot", np.eye(3), pos)
    np.testing.assert_allclose(np.asarray(ocp.get_reference_pose(2, "FL_foot")[1]), pos)
    f = np.array([1.0, 2.0, 30.0])
    ocp.set_reference_force(3, "RR_foot", f)
    np.testing.assert_allclose(np.asarray(ocp.get_reference_force(3, "RR_foot")), f)
    v6 = np.arange(6.0) * 0.1
    ocp.set_velocity_base(4, v6)
    np.testing.assert_allclose(np.asarray(ocp.get_velocity_base(4)), v6)
    pose7 = np.array([0, 0, 0.4, 0, 0, 0, 1.0])
    ocp.set_pose_base(5, pose7)
    np.testing.assert_allclose(np.asarray(ocp.get_pose_base(5)), pose7)
    assert ocp.get_contact_state(0) == [True] * 4
    # x_ref round trip preserves the other slices
    np.testing.assert_allclose(
        np.asarray(ocp.get_reference_state(4))[mh.model.nq: mh.model.nq + 6], v6)


@pytest.mark.slow
def test_standing_solve():
    ocp, mh, dh, x0 = make_go2_kino(T=8)
    solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-5, max_iters=12))
    T = 8
    xs = jnp.tile(jnp.asarray(x0)[None], (T + 1, 1))
    us = ocp.problem.stage_params.u_ref
    res = solver.run(ocp.problem, xs, us)
    assert float(res.prim_res) < 1e-5, f"prim {res.prim_res}"
    # standing solution keeps vertical forces ~ mg/4 and tiny joint accels
    u_last = np.asarray(res.us[-1])
    np.testing.assert_allclose(u_last[2:12:3], mh.mass * 9.81 / 4, rtol=0.2)
    assert np.abs(u_last[12:]).max() < 5.0
    # final state close to reference (standing)
    dx = np.asarray(mh.difference(x0, res.xs[-1]))
    assert np.abs(dx).max() < 0.05


@pytest.mark.slow
def test_u_scale_invariance_f64():
    """SolverSettings.u_scale is a pure reparameterization: Gauss-Newton
    steps are invariant under linear control scaling in exact arithmetic,
    so the f64 iterates must coincide (and the returned gains must come
    back in physical units)."""
    ocp, mh, dh, x0 = make_go2_kino(T=6)
    T = 6
    xs = jnp.tile(jnp.asarray(x0)[None], (T + 1, 1))
    us = ocp.problem.stage_params.u_ref
    r0 = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-5, max_iters=6)).run(
        ocp.problem, xs, us)
    r1 = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-5, max_iters=6,
                                           u_scale="auto")).run(
        ocp.problem, xs, us)
    np.testing.assert_allclose(np.asarray(r1.us), np.asarray(r0.us),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(r1.Ks), np.asarray(r0.Ks),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1.ks), np.asarray(r0.ks),
                               rtol=1e-6, atol=1e-8)
    assert abs(float(r1.dual_res) - float(r0.dual_res)) < 1e-8
