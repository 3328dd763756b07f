"""Go2 kinodynamics MPC + KinodynamicsID closed loop.

Reference: examples/go2_kinodynamics.py — quadruped trot (10 double-support
+ 30 single-pair flight x2), T=50 horizon, ID tracking at 1 kHz.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from examples.loop import run_closed_loop, save_trajectory
from simple_mpc_tpu import (IDSettings, KinodynamicsID, KinodynamicsOCP, MPC,
                            MPCSettings)
from simple_mpc_tpu.configs import go2_handler, go2_kinodynamics_config


def main(n_steps=100, T=50, plant=None):
    mh = go2_handler()
    ocp = KinodynamicsOCP(go2_kinodynamics_config(mh), mh)
    x0 = np.asarray(mh.reference_state)
    ocp.create_problem(x0, T, 3, -9.81, False)
    mpc = MPC(MPCSettings(support_force=mh.mass * 9.81, TOL=1e-4,
                          mu_init=1e-8, max_iters=1, num_threads=1,
                          swing_apex=0.05, T_fly=30, T_contact=10,
                          timestep=0.01), ocp)

    # trot gait (go2_kinodynamics.py:135-138): diagonal pairs
    feet = mh.feet_names
    ds = {f: True for f in feet}
    pair_a = {f: f in ("FL_foot", "RR_foot") for f in feet}
    pair_b = {f: f in ("FR_foot", "RL_foot") for f in feet}
    gait = [ds] * 10 + [pair_a] * 30 + [ds] * 10 + [pair_b] * 30

    idq = KinodynamicsID(mh, 1e-3, IDSettings(
        kp_base=10.0, kp_posture=10.0, kp_contact=50.0, w_base=1.0,
        w_posture=0.1, w_contact_motion=100.0, w_contact_force=0.05,
        qp_iters=60))
    log = run_closed_loop(mpc, mh, id_solver=idq, n_steps=n_steps,
                          walk_velocity=np.array([0.2, 0, 0, 0, 0, 0]),
                          gait=gait, plant=plant)
    save_trajectory(log, "/tmp/go2_kinodynamics.npz")
    return log


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
