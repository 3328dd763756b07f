"""Full-dynamics OCP structure + standing solve (reference
tests/problem.cpp:21-103 analogue)."""
import jax.numpy as jnp
import numpy as np
import pytest

from simple_mpc_tpu.models import robots
from simple_mpc_tpu.models.handler import RobotDataHandler, RobotModelHandler
from simple_mpc_tpu.ocp.fulldynamics import FullDynamicsOCP
from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings


def make_go2_full(T=6, force_cone=True):
    """go2_fulldynamics.py-style configuration."""
    model = robots.load_go2()
    mh = RobotModelHandler(model, "standing", "base")
    for f in ["FL_foot", "FR_foot", "RL_foot", "RR_foot"]:
        mh.add_point_foot(f, "base")
    dh = RobotDataHandler(mh)
    nv = model.nv
    nu = nv - 6
    w_basepos = [0, 0, 10, 10, 10, 0]
    w_legpos = [1, 1, 1]
    w_basevel = [10, 10, 10, 10, 10, 10]
    w_legvel = [0.1, 0.1, 0.1]
    w_x = np.array(w_basepos + w_legpos * 4 + w_basevel + w_legvel * 4)
    conf = dict(
        timestep=0.01,
        w_x=w_x,
        w_u=np.ones(nu) * 1e-4,
        w_cent=np.concatenate([[0.0, 0.0, 0.0], [0.1, 0.1, 0.1]]),
        w_forces=np.ones(3) * 1e-4,
        w_frame=np.ones(3) * 1000.0,
        gravity=np.array([0, 0, -9.81]),
        force_size=3,
        Kp_correction=np.zeros(3),
        Kd_correction=np.zeros(3),
        umin=-model.effort_limit[6:],
        umax=model.effort_limit[6:],
        qmin=model.lower_limit[7:],
        qmax=model.upper_limit[7:],
        mu=0.8,
        Lfoot=0.01,
        Wfoot=0.01,
        torque_limits=True,
        kinematics_limits=True,
        force_cone=force_cone,
        land_cstr=False,
    )
    ocp = FullDynamicsOCP(conf, mh)
    x0 = np.asarray(mh.reference_state)
    ocp.create_problem(x0, T, 3, -9.81, False)
    return ocp, mh, dh, x0


def test_problem_structure():
    ocp, mh, dh, x0 = make_go2_full()
    assert ocp.nu == 12
    assert ocp.n_in == 2 * 12 + 2 * 12 + 4 * 5
    p = ocp.problem
    np.testing.assert_allclose(
        np.asarray(p.stage_params.f_ref[0])[:, 2], mh.mass * 9.81 / 4, rtol=1e-12)


def test_setters_roundtrip():
    ocp, mh, dh, x0 = make_go2_full()
    pos = np.array([0.3, 0.1, 0.0])
    ocp.set_reference_pose(2, "FL_foot", np.eye(3), pos)
    np.testing.assert_allclose(np.asarray(ocp.get_reference_pose(2, "FL_foot")[1]), pos)
    f = np.array([1.0, 2.0, 30.0])
    ocp.set_reference_force(3, "RR_foot", f)
    np.testing.assert_allclose(np.asarray(ocp.get_reference_force(3, "RR_foot")), f)


@pytest.mark.slow
def test_standing_solve():
    ocp, mh, dh, x0 = make_go2_full(T=6)
    solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-4, max_iters=12))
    T = 6
    xs = jnp.tile(jnp.asarray(x0)[None], (T + 1, 1))
    us = jnp.zeros((T, ocp.nu))
    res = solver.run(ocp.problem, xs, us)
    assert float(res.prim_res) < 1e-3, f"prim {res.prim_res}"
    assert float(res.dual_res) < 1.0, f"dual {res.dual_res}"
    # bounded drift from the reference pose (the exact optimum trades a slow
    # crouch against torque cost over this short horizon; closed-loop MPC
    # tests cover pose holding)
    dx = np.asarray(mh.difference(x0, res.xs[-1]))
    assert np.abs(dx).max() < 0.4, dx
    # torques within limits
    assert np.abs(np.asarray(res.us)).max() <= float(mh.model.effort_limit[6:].max()) + 1e-6
    # stance forces support the robot's weight (Newton balance at stage 0)
    p0 = ocp.problem.stage_params
    import jax

    f = np.asarray(ocp.get_contact_forces(
        res.xs[0], res.us[0],
        jax.tree_util.tree_map(lambda a: a[0], p0)))
    # Newton: sum fz = m (g + zdd_com); the optimum crouches slowly so allow
    # the accelerating-down band, but forces must stay unilateral and carry
    # most of the weight
    assert (f[:, 2] > -1e-6).all(), f
    assert abs(f[:, 2].sum() - mh.mass * 9.81) < 0.35 * mh.mass * 9.81, f
