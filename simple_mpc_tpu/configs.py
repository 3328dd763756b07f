"""Canonical robot + OCP configurations mirroring the reference examples.

These reproduce the settings dictionaries of examples/go2_kinodynamics.py,
examples/go2_fulldynamics.py, examples/talos_centroidal.py etc., so tests,
benchmarks and examples share one source of truth.
"""
from __future__ import annotations

import numpy as np

from .models import robots
from .models.handler import RobotDataHandler, RobotModelHandler

GO2_FEET = ["FL_foot", "FR_foot", "RL_foot", "RR_foot"]
TALOS_FEET = ["left_sole_link", "right_sole_link"]
TALOS_CONTACT_POINTS = np.array(
    [[0.1, 0.075, 0.0], [0.1, -0.075, 0.0], [-0.1, 0.075, 0.0], [-0.1, -0.075, 0.0]]
)


def go2_handler() -> RobotModelHandler:
    model = robots.load_go2()
    mh = RobotModelHandler(model, "standing", "base")
    for f in GO2_FEET:
        mh.add_point_foot(f, "base")
    return mh


def talos_handler() -> RobotModelHandler:
    model = robots.load_talos()
    mh = RobotModelHandler(model, "half_sitting", "base_link")
    for f in TALOS_FEET:
        mh.add_quad_foot(f, "base_link", TALOS_CONTACT_POINTS)
    return mh


def go2_kinodynamics_config(mh: RobotModelHandler) -> dict:
    """examples/go2_kinodynamics.py:40-86 settings."""
    nv = mh.model.nv
    w_x = np.array([0, 0, 100, 10, 10, 0] + [1, 1, 1] * 4
                   + [10, 10, 10, 10, 10, 10] + [0.1, 0.1, 0.1] * 4)
    w_u = np.concatenate([np.tile([0.01, 0.01, 0.01], 4), np.ones(nv - 6) * 1e-5])
    return dict(
        timestep=0.01, w_x=w_x, w_u=w_u,
        w_cent=np.concatenate([[0.0, 0.0, 1.0], [0.1, 0.1, 10.0]]),
        w_centder=np.concatenate([np.zeros(3), np.ones(3) * 0.1]),
        gravity=np.array([0, 0, -9.81]), force_size=3,
        w_frame=np.ones(3) * 2000.0,
        qmin=mh.model.lower_limit[7:], qmax=mh.model.upper_limit[7:],
        mu=0.8, Lfoot=0.01, Wfoot=0.01,
        kinematics_limits=True, force_cone=False, land_cstr=False,
    )


def talos_kinodynamics_config(mh: RobotModelHandler) -> dict:
    """examples/talos_kinodynamics.py:49-107 settings (6D quad feet) on the
    22-actuated-joint reduced Talos.  Per-group weights follow the
    reference's grouping and joint order exactly
    (talos_kinodynamics.py:49-66): [base, legs(2x6), torso(2), arms(2x4)]."""
    model = mh.model
    nv = model.nv
    w_basepos = [0, 0, 1000, 1000, 1000, 1000]
    w_legpos = [0.1] * 6
    w_torsopos = [1, 1000]
    w_armpos = [1, 1, 10, 10]
    w_basevel = [10.0] * 6
    w_legvel = [1.0] * 6
    w_torsovel = [0.1, 100]
    w_armvel = [10.0] * 4
    w_x = np.array(w_basepos + w_legpos * 2 + w_torsopos + w_armpos * 2
                   + w_basevel + w_legvel * 2 + w_torsovel + w_armvel * 2) * 10.0
    w_linforce = np.array([0.001, 0.001, 0.01])
    w_angforce = np.ones(3) * 0.1
    w_u = np.concatenate(
        [w_linforce, w_angforce, w_linforce, w_angforce,
         np.ones(nv - 6) * 1e-4])
    return dict(
        timestep=0.01,
        w_x=w_x, w_u=w_u,
        w_cent=np.concatenate([[0.0, 0.0, 1.0], [0.1, 0.1, 10.0]]),
        w_centder=np.concatenate([np.zeros(3), np.ones(3) * 0.1]),
        w_frame=np.ones(6) * 100000.0, gravity=np.array([0, 0, -9.81]),
        force_size=6, qmin=model.lower_limit[7:], qmax=model.upper_limit[7:],
        kinematics_limits=True, force_cone=False, land_cstr=False,
        mu=0.8, Lfoot=0.1, Wfoot=0.075,
    )


def go2_fulldynamics_config(mh: RobotModelHandler, force_cone=True) -> dict:
    """examples/go2_fulldynamics.py settings."""
    model = mh.model
    nv = model.nv
    w_x = np.array([0, 0, 10, 10, 10, 0] + [1, 1, 1] * 4
                   + [10, 10, 10, 10, 10, 10] + [0.1, 0.1, 0.1] * 4)
    return dict(
        timestep=0.01, w_x=w_x, w_u=np.ones(nv - 6) * 1e-4,
        w_cent=np.concatenate([np.zeros(3), [0.1, 0.1, 0.1]]),
        w_forces=np.ones(3) * 1e-4, w_frame=np.ones(3) * 1000.0,
        gravity=np.array([0, 0, -9.81]), force_size=3,
        Kp_correction=np.zeros(3), Kd_correction=np.zeros(3),
        umin=-model.effort_limit[6:], umax=model.effort_limit[6:],
        qmin=model.lower_limit[7:], qmax=model.upper_limit[7:],
        mu=0.8, Lfoot=0.01, Wfoot=0.01,
        torque_limits=True, kinematics_limits=True,
        force_cone=force_cone, land_cstr=False,
    )


def talos_centroidal_config(mh: RobotModelHandler) -> dict:
    """examples/talos_centroidal.py settings."""
    return dict(
        timestep=0.01, w_u=np.ones(12) * 1e-4, w_com=np.zeros(3),
        w_linear_mom=np.diag([0.01, 0.01, 100.0]),
        w_angular_mom=np.diag([0.1, 0.1, 1000.0]),
        w_linear_acc=0.01 * np.eye(3), w_angular_acc=0.01 * np.eye(3),
        gravity=np.array([0, 0, -9.81]),
        mu=0.8, Lfoot=0.1, Wfoot=0.075, force_size=6,
    )


def make_go2_kinodynamics(T: int = 100):
    """Flagship benchmark config (BASELINE.md: Go2 kinodynamic MPC, T=100)."""
    from .ocp.kinodynamics import KinodynamicsOCP

    mh = go2_handler()
    ocp = KinodynamicsOCP(go2_kinodynamics_config(mh), mh)
    x0 = np.asarray(mh.reference_state)
    ocp.create_problem(x0, T, 3, -9.81, False)
    return ocp, mh, x0
