"""Talos centroidal MPC + CentroidalID closed loop.

Reference: examples/talos_centroidal.py — biped walk (20 double + 80 single
support x2), T=100 horizon, CentroidalID tracking (CoM + swing feet).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from examples.loop import run_closed_loop, save_trajectory
from simple_mpc_tpu import (CentroidalID, CentroidalOCP, IDSettings, MPC,
                            MPCSettings, RobotDataHandler)
from simple_mpc_tpu.configs import talos_centroidal_config, talos_handler


def main(n_steps=100, T=100):
    mh = talos_handler()
    ocp = CentroidalOCP(talos_centroidal_config(mh), mh)
    dh = RobotDataHandler(mh)
    x0 = np.asarray(dh.get_centroidal_state())
    ocp.create_problem(x0, T, 6, -9.81, False)
    mpc = MPC(MPCSettings(support_force=mh.mass * 9.81, TOL=1e-4,
                          mu_init=1e-8, max_iters=1, swing_apex=0.1,
                          T_fly=80, T_contact=20, timestep=0.01), ocp)

    l, r = mh.feet_names
    gait = ([{l: True, r: True}] * 20 + [{l: True, r: False}] * 80
            + [{l: True, r: True}] * 20 + [{l: False, r: True}] * 80)

    cid = CentroidalID(mh, 1e-3, IDSettings(
        kp_base=10.0, kp_posture=10.0, kp_contact=50.0, kp_com=50.0,
        kp_feet_tracking=50.0, w_base=1.0, w_posture=0.1,
        w_contact_motion=100.0, w_contact_force=0.05, w_com=10.0,
        w_feet_tracking=5.0, Lfoot=0.1, Wfoot=0.075, qp_iters=60))

    # CentroidalID drives set_target with its own signature inside the loop:
    # wrap it so the generic runner's kinodynamics-style call maps through
    class _Adapter:
        def __init__(self, cid, mpc, mh):
            self.cid, self.mpc, self.mh = cid, mpc, mh

        def set_target(self, x_i, _v, a_t, contacts, f_t):
            # x_i is the interpolated 9-dim centroidal state [com; h]
            feet_pose, feet_vel = [], []
            for nb, name in enumerate(self.mh.feet_names):
                p = np.asarray(self.mpc.ocp_handler.get_reference_pose(0, name)[1])
                feet_pose.append((np.eye(3), p))
                feet_vel.append(np.zeros(6))
            self.cid.set_target(x_i[:3], x_i[3:6] / self.mh.mass, feet_pose,
                                feet_vel, contacts, f_t)

        def solve(self, t, q, v):
            return self.cid.solve(t, q, v)

    log = run_closed_loop(mpc, mh, id_solver=_Adapter(cid, mpc, mh),
                          n_steps=n_steps,
                          walk_velocity=np.array([0.1, 0, 0, 0, 0, 0]),
                          gait=gait)
    save_trajectory(log, "/tmp/talos_centroidal.npz")
    return log


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
