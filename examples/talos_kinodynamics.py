"""Talos kinodynamics MPC + KinodynamicsID closed loop.

Reference: examples/talos_kinodynamics.py — biped footsteps, T=100.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from examples.loop import run_closed_loop, save_trajectory
from simple_mpc_tpu import (IDSettings, KinodynamicsID, KinodynamicsOCP, MPC,
                            MPCSettings)
from simple_mpc_tpu.configs import talos_handler


def talos_kinodynamics_config(mh):
    """examples/talos_kinodynamics.py settings (6D quad feet)."""
    nv = mh.model.nv
    w_x = np.array([0, 0, 1000, 1000, 1000, 1000] + [10.0] * (nv - 6)
                   + [10, 10, 10, 100, 100, 100] + [1.0] * (nv - 6))
    w_u = np.concatenate([np.tile([1e-2, 1e-2, 1e-2, 1e-2, 1e-2, 1e-2], 2),
                          np.ones(nv - 6) * 1e-4])
    return dict(
        timestep=0.01, w_x=w_x, w_u=w_u,
        w_cent=np.concatenate([[0.0, 0.0, 10.0], [0.1, 0.1, 10.0]]),
        w_centder=np.concatenate([np.zeros(3), np.ones(3) * 0.1]),
        gravity=np.array([0, 0, -9.81]), force_size=6,
        w_frame=np.ones(6) * 2000.0,
        qmin=mh.model.lower_limit[7:], qmax=mh.model.upper_limit[7:],
        mu=0.8, Lfoot=0.1, Wfoot=0.075,
        kinematics_limits=True, force_cone=False, land_cstr=False,
    )


def main(n_steps=100, T=100):
    mh = talos_handler()
    ocp = KinodynamicsOCP(talos_kinodynamics_config(mh), mh)
    x0 = np.asarray(mh.reference_state)
    ocp.create_problem(x0, T, 6, -9.81, False)
    mpc = MPC(MPCSettings(support_force=mh.mass * 9.81, TOL=1e-4,
                          mu_init=1e-8, max_iters=1, swing_apex=0.1,
                          T_fly=80, T_contact=20, timestep=0.01), ocp)

    l, r = mh.feet_names
    gait = ([{l: True, r: True}] * 20 + [{l: True, r: False}] * 80
            + [{l: True, r: True}] * 20 + [{l: False, r: True}] * 80)

    idq = KinodynamicsID(mh, 1e-3, IDSettings(
        kp_base=10.0, kp_posture=10.0, kp_contact=50.0, w_base=1.0,
        w_posture=0.1, w_contact_motion=100.0, w_contact_force=0.05,
        Lfoot=0.1, Wfoot=0.075, qp_iters=60))
    log = run_closed_loop(mpc, mh, id_solver=idq, n_steps=n_steps,
                          walk_velocity=np.array([0.1, 0, 0, 0, 0, 0]),
                          gait=gait)
    save_trajectory(log, "/tmp/talos_kinodynamics.npz")
    return log


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
