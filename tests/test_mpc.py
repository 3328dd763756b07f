"""Receding-horizon MPC behavior — reference tests/mpc.cpp analogue.

Pins the exact takeoff/land event integers (tests/mpc.cpp:78-94) using the
centroidal formulation (cheapest stages; the timing bookkeeping is
formulation-independent), plus swing-trajectory unit behavior
(foot-trajectory.cpp:41-96).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from simple_mpc_tpu.models import robots
from simple_mpc_tpu.models.handler import RobotModelHandler
from simple_mpc_tpu.mpc import MPC, MPCSettings
from simple_mpc_tpu.mpc import foot_trajectory as ft
from simple_mpc_tpu.ocp.centroidal import CentroidalOCP


def quad_points():
    return np.array([[0.1, 0.075, 0.0], [0.1, -0.075, 0.0],
                     [-0.1, 0.075, 0.0], [-0.1, -0.075, 0.0]])


def make_talos_mpc(T=100):
    model = robots.load_talos()
    mh = RobotModelHandler(model, "half_sitting", "base_link")
    mh.add_quad_foot("left_sole_link", "base_link", quad_points())
    mh.add_quad_foot("right_sole_link", "base_link", quad_points())
    nx = 9
    conf = dict(
        timestep=0.01,
        w_u=np.ones(12) * 1e-4,
        w_com=np.array([0.0, 0.0, 0.0]),
        w_linear_mom=np.diag([0.01, 0.01, 100.0]),
        w_angular_mom=np.diag([0.1, 0.1, 1000.0]),
        w_linear_acc=0.01 * np.eye(3),
        w_angular_acc=0.01 * np.eye(3),
        gravity=np.array([0, 0, -9.81]),
        mu=0.8, Lfoot=0.1, Wfoot=0.075, force_size=6,
    )
    ocp = CentroidalOCP(conf, mh)
    dh_state = np.zeros(nx)
    # x0 = centroidal state at the reference configuration
    from simple_mpc_tpu.models.handler import RobotDataHandler

    dh = RobotDataHandler(mh)
    x0 = np.asarray(dh.get_centroidal_state())
    ocp.create_problem(x0, T, 6, -9.81, False)
    return ocp, mh


def biped_gait_plan():
    """10 double + 50 left-support + 10 double + 50 right-support
    (tests/mpc.cpp:46-75)."""
    l, r = "left_sole_link", "right_sole_link"
    plan = []
    plan += [{l: True, r: True}] * 10
    plan += [{l: True, r: False}] * 50
    plan += [{l: True, r: True}] * 10
    plan += [{l: False, r: True}] * 50
    return plan


@pytest.fixture(scope="module")
def talos_mpc():
    ocp, mh = make_talos_mpc()
    settings = MPCSettings(
        support_force=mh.mass * 9.81, TOL=1e-6, mu_init=1e-8, max_iters=1,
        num_threads=1, swing_apex=0.1, T_fly=80, T_contact=20, timestep=0.01)
    return MPC(settings, ocp), mh


def test_warm_start_sizes(talos_mpc):
    mpc, mh = talos_mpc
    assert mpc.xs.shape[0] == 101
    assert mpc.us.shape[0] == 100


def test_event_timings(talos_mpc):
    """Exact takeoff/land integers (tests/mpc.cpp:78-94)."""
    mpc, mh = talos_mpc
    mpc.generate_cycle_horizon(biped_gait_plan())
    assert mpc.foot_takeoff_times["left_sole_link"][0] == 170
    assert mpc.foot_takeoff_times["right_sole_link"][0] == 110
    assert mpc.foot_land_times["left_sole_link"][0] == 219
    assert mpc.foot_land_times["right_sole_link"][0] == 160

    # iterate takes the full multibody state (mpc.cpp:189); the formulation
    # maps it to its own state via getProblemState
    x_meas = np.asarray(mh.reference_state)
    for _ in range(10):
        mpc.iterate(x_meas)

    assert mpc.foot_takeoff_times["left_sole_link"][0] == 160
    assert mpc.foot_takeoff_times["right_sole_link"][0] == 100
    assert mpc.foot_land_times["left_sole_link"][0] == 209
    assert mpc.foot_land_times["right_sole_link"][0] == 150
    # state derivative accessor (mpc.cpp:346-352)
    xdot = np.asarray(mpc.get_state_derivative(0))
    assert xdot.shape == (9,)


def test_swing_trajectory_shape():
    """Bézier swing reference semantics (foot-trajectory.cpp:41-82)."""
    p0 = np.array([0.0, 0.1, 0.0])
    p1 = np.array([0.2, 0.1, 0.0])
    apex = 0.15
    T_fly, T = 30, 50
    # boundary: before takeoff -> initial, after landing -> final
    ref = np.asarray(ft.sample_swing(p0, p1, apex, 40, T_fly, T))
    assert np.allclose(ref[0], p0)  # t=40 > T_fly: still initial
    assert np.allclose(ref[-1], p1)  # t=-9 < 0: landed
    # midpoint of flight reaches >= half the apex
    ref2 = np.asarray(ft.sample_swing(p0, p1, apex, T_fly, T_fly, T))
    # max curve height = C(8,4)/2^8 * apex ≈ 0.273*apex (only the midpoint
    # control point is lifted; foot-trajectory.cpp:50-53)
    mid = ref2[T_fly // 2]
    assert mid[2] > 0.25 * apex
    assert np.all(ref2[:, 2] <= apex + 1e-9)
    # start and end of flight exactly at the anchors (zero vel/acc/jerk ends)
    assert np.allclose(ref2[0], p0, atol=1e-12)
    assert np.allclose(ref2[T_fly], p1, atol=1e-12)


def test_standing_recede(talos_mpc):
    """switchToStand falls back to the standing horizon once all feet are in
    contact at the last stage (mpc.cpp:242-253, 382-392)."""
    mpc, mh = talos_mpc
    mpc.switch_to_stand()
    assert mpc.now == 1
    np.testing.assert_allclose(mpc.velocity_base, 0.0)
    mpc.switch_to_walk(np.array([0.2, 0, 0, 0, 0, 0.0]))
    assert mpc.now == 0
