"""Go2 full-dynamics MPC with Riccati feedback + friction compensation.

Reference: examples/go2_fulldynamics.py — torque control
u = us[0] - K0 @ diff(x, xs[0]) (:282-284) + FrictionCompensation (:286-289).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from examples.loop import run_closed_loop, save_trajectory
from simple_mpc_tpu import (FrictionCompensation, FullDynamicsOCP, MPC,
                            MPCSettings)
from simple_mpc_tpu.configs import go2_fulldynamics_config, go2_handler


def main(n_steps=50, T=50):
    mh = go2_handler()
    ocp = FullDynamicsOCP(go2_fulldynamics_config(mh), mh)
    x0 = np.asarray(mh.reference_state)
    ocp.create_problem(x0, T, 3, -9.81, False)
    mpc = MPC(MPCSettings(support_force=mh.mass * 9.81, TOL=1e-4,
                          mu_init=1e-8, max_iters=1, swing_apex=0.05,
                          T_fly=30, T_contact=10, timestep=0.01), ocp)

    feet = mh.feet_names
    ds = {f: True for f in feet}
    pair_a = {f: f in ("FL_foot", "RR_foot") for f in feet}
    pair_b = {f: f in ("FR_foot", "RL_foot") for f in feet}
    gait = [ds] * 10 + [pair_a] * 30 + [ds] * 10 + [pair_b] * 30

    fcomp = FrictionCompensation(mh.model)
    log = run_closed_loop(mpc, mh, id_solver=None, friction=fcomp,
                          n_steps=n_steps,
                          walk_velocity=np.array([0.2, 0, 0, 0, 0, 0]),
                          gait=gait)
    save_trajectory(log, "/tmp/go2_fulldynamics.npz")
    return log


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
