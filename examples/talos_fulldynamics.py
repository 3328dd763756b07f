"""Talos full-dynamics MPC with Riccati feedback.

Reference: examples/talos_fulldynamics.py — biped, 6D quad contacts,
u = us[0] - K0 @ diff(x, xs[0]) (:203-205).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from examples.loop import run_closed_loop, save_trajectory
from simple_mpc_tpu import FullDynamicsOCP, MPC, MPCSettings
from simple_mpc_tpu.configs import talos_handler


def talos_fulldynamics_config(mh):
    model = mh.model
    nv = model.nv
    w_x = np.array([0, 0, 100, 100, 100, 100] + [10.0] * (nv - 6)
                   + [10, 10, 10, 100, 100, 100] + [1.0] * (nv - 6))
    return dict(
        timestep=0.01, w_x=w_x, w_u=np.ones(nv - 6) * 1e-4,
        w_cent=np.concatenate([np.zeros(3), [0.1, 0.1, 1.0]]),
        w_forces=np.ones(6) * 1e-5, w_frame=np.ones(6) * 1000.0,
        gravity=np.array([0, 0, -9.81]), force_size=6,
        Kp_correction=np.zeros(6), Kd_correction=np.zeros(6),
        umin=-model.effort_limit[6:], umax=model.effort_limit[6:],
        qmin=model.lower_limit[7:], qmax=model.upper_limit[7:],
        mu=0.8, Lfoot=0.1, Wfoot=0.075,
        torque_limits=True, kinematics_limits=True,
        force_cone=False, land_cstr=False,
    )


def main(n_steps=50, T=100):
    mh = talos_handler()
    ocp = FullDynamicsOCP(talos_fulldynamics_config(mh), mh)
    x0 = np.asarray(mh.reference_state)
    ocp.create_problem(x0, T, 6, -9.81, False)
    mpc = MPC(MPCSettings(support_force=mh.mass * 9.81, TOL=1e-4,
                          mu_init=1e-8, max_iters=1, swing_apex=0.1,
                          T_fly=80, T_contact=20, timestep=0.01), ocp)

    l, r = mh.feet_names
    gait = ([{l: True, r: True}] * 20 + [{l: True, r: False}] * 80
            + [{l: True, r: True}] * 20 + [{l: False, r: True}] * 80)

    log = run_closed_loop(mpc, mh, id_solver=None, n_steps=n_steps,
                          walk_velocity=np.array([0.1, 0, 0, 0, 0, 0]),
                          gait=gait)
    save_trajectory(log, "/tmp/talos_fulldynamics.npz")
    return log


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
