"""End-to-end: centroidal OCP + ProxDDP solver (the SURVEY §7 minimum
slice — Talos centroidal standing/walking, no rigid-body kernels in the
OCP itself)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_mpc_tpu.models import robots
from simple_mpc_tpu.models.handler import RobotDataHandler, RobotModelHandler
from simple_mpc_tpu.ocp.centroidal import CentroidalOCP
from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings


def make_talos_centroidal(T=20, force_size=6):
    model = robots.load_talos()
    mh = RobotModelHandler(model, "half_sitting", "base_link")
    quad = np.array([[0.1, 0.075, 0], [-0.1, 0.075, 0], [-0.1, -0.075, 0], [0.1, -0.075, 0]])
    mh.add_quad_foot("left_sole_link", "base_link", quad)
    mh.add_quad_foot("right_sole_link", "base_link", quad)
    dh = RobotDataHandler(mh)
    w3 = np.ones(3) * 0.001
    wa = np.ones(3) * 0.1
    w_u = np.concatenate([w3, wa] * 2) if force_size == 6 else np.concatenate([w3] * 2)
    conf = dict(
        timestep=0.01,
        w_u=w_u,
        w_com=np.zeros(3),
        w_linear_mom=np.array([0.01, 0.01, 100.0]),
        w_angular_mom=np.array([0.1, 0.1, 1000.0]),
        w_linear_acc=0.01 * np.ones(3),
        w_angular_acc=0.01 * np.ones(3),
        gravity=np.array([0.0, 0.0, -9.81]),
        mu=0.8,
        Lfoot=0.1,
        Wfoot=0.075,
        force_size=force_size,
    )
    ocp = CentroidalOCP(conf, mh)
    x0 = np.asarray(dh.get_centroidal_state())
    ocp.create_problem(x0, T, force_size, -9.81, False)
    return ocp, mh, dh, x0


def test_problem_structure():
    ocp, mh, dh, x0 = make_talos_centroidal()
    p = ocp.problem
    assert p.horizon == 20
    assert p.stage_params.u_ref.shape == (20, 12)
    # reference: standing => per-foot vertical force = m g / n_feet
    u0 = np.asarray(p.stage_params.u_ref[0]).reshape(2, 6)
    np.testing.assert_allclose(u0[:, 2], mh.mass * 9.81 / 2, rtol=1e-12)
    assert np.asarray(p.stage_params.contact_active).all()


def test_setters_roundtrip():
    """Reference test rung 2 (tests/problem.cpp:249-285): round-trip every
    reference get/setter."""
    ocp, mh, dh, x0 = make_talos_centroidal()
    pose = np.array([0.1, 0.2, 0.3])
    ocp.set_reference_pose(3, "left_sole_link", np.eye(3), pose)
    np.testing.assert_allclose(np.asarray(ocp.get_reference_pose(3, "left_sole_link")[1]), pose)
    f = np.arange(6.0)
    ocp.set_reference_force(4, "right_sole_link", f)
    np.testing.assert_allclose(np.asarray(ocp.get_reference_force(4, "right_sole_link")), f)
    v = np.arange(6.0) * 0.1
    ocp.set_velocity_base(5, v)
    np.testing.assert_allclose(np.asarray(ocp.get_velocity_base(5)), v, atol=1e-12)
    c = np.array([0.0, 0.1, 0.9])
    ocp.set_pose_base(6, c)
    np.testing.assert_allclose(np.asarray(ocp.get_pose_base(6)), c)
    xr = np.concatenate([c, v])
    ocp.set_reference_state(7, xr)
    np.testing.assert_allclose(np.asarray(ocp.get_reference_state(7)), xr, atol=1e-12)
    assert ocp.get_contact_state(0) == [True, True]
    assert ocp.get_contact_support(0) == 2


@pytest.mark.parametrize("force_size", [6, 3])
def test_standing_solve_converges(force_size):
    ocp, mh, dh, x0 = make_talos_centroidal(T=20, force_size=force_size)
    solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=40))
    T = 20
    xs = jnp.tile(jnp.asarray(x0)[None], (T + 1, 1))
    us = ocp.problem.stage_params.u_ref
    res = solver.run(ocp.problem, xs, us)
    assert float(res.prim_res) < 1e-6, f"primal residual {res.prim_res}"
    # standing: forces stay ~ m g / 2 vertical, momentum ~ 0
    uf = np.asarray(res.us[-1]).reshape(2, force_size)
    np.testing.assert_allclose(uf[:, 2], mh.mass * 9.81 / 2, rtol=0.05)
    # heavily-weighted momentum components (z: w=100/1000) stay ~0; x/y are
    # weighted 0.01/0.1 and legitimately drift to balance torque about an
    # off-center CoM.
    xT = np.asarray(res.xs[-1])
    np.testing.assert_allclose(xT[[5, 8]], 0.0, atol=1e-3)
    # friction cone satisfied: |fx|,|fy| <= mu fz
    assert abs(uf[0, 0]) <= 0.8 * uf[0, 2] + 1e-6


def test_warm_start_one_iteration():
    """MPC mode: warm-started single iteration stays feasible and cheap."""
    ocp, mh, dh, x0 = make_talos_centroidal(T=20)
    solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=40))
    T = 20
    xs = jnp.tile(jnp.asarray(x0)[None], (T + 1, 1))
    us = ocp.problem.stage_params.u_ref
    res = solver.run(ocp.problem, xs, us)
    res2 = solver.run(ocp.problem, res.xs, res.us,
                      lams=(res.lam_eq, res.lam_in, res.lam_term), max_iters=1)
    assert float(res2.prim_res) < 1e-6
    np.testing.assert_allclose(np.asarray(res2.us), np.asarray(res.us), atol=1e-4)
