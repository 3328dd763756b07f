"""Shared closed-loop runner for the examples.

Mirrors the reference examples' control architecture (SURVEY.md §3.4,
examples/go2_kinodynamics.py:206-295): MPC tick at 100 Hz, inner loop at
1 kHz with state/acceleration interpolation, low-level torques from either
the inverse-dynamics QP (kino/centroidal) or Riccati feedback
u = us[0] - K0 @ diff(x, xs[0]) (full dynamics, talos_fulldynamics.py:
203-205), physics by the in-framework rigid-contact simulator instead of
PyBullet.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from simple_mpc_tpu.ops import kinematics as kin
from simple_mpc_tpu.ops.state import state_difference
from simple_mpc_tpu.sim import Simulator, SimSettings
from simple_mpc_tpu.utils import Interpolator


def foot_height(mh):
    q = jnp.asarray(mh.reference_state[: mh.model.nq])
    oR, op = kin.fk(mh.model, q)
    fR, fp = kin.frame_placements(mh.model, oR, op)
    return float(np.mean([np.asarray(fp[i])[2] for i in mh.feet_frame_ids]))


def run_closed_loop(mpc, mh, *, id_solver=None, friction=None, n_steps=50,
                    n_simu=10, walk_velocity=None, gait=None, log_every=10,
                    plant=None):
    """Run the MPC + inner-loop + simulator closed loop; returns the state
    log.  `id_solver=None` selects Riccati feedback (full dynamics).
    `plant` overrides the physics engine (same step(q, v, tau) interface —
    e.g. sim.mujoco_plant.MuJoCoPlant for independent-engine validation,
    the reference's PyBullet role)."""
    model = mh.model
    interp = Interpolator(model)
    sim = plant if plant is not None else Simulator(
        model, mh.feet_frame_ids,
        SimSettings(dt=1e-3, ground_height=foot_height(mh)))
    if gait is not None:
        mpc.generate_cycle_horizon(gait)
    if walk_velocity is not None:
        mpc.switch_to_walk(np.asarray(walk_velocity))

    x = np.asarray(mh.reference_state)
    q, v = x[: model.nq].copy(), x[model.nq:].copy()
    nv = model.nv
    log = dict(q=[], v=[], f=[], solve_time=[])

    for step in range(n_steps):
        x_meas = np.concatenate([q, v])
        t0 = time.perf_counter()
        mpc.iterate(x_meas)
        log["solve_time"].append(time.perf_counter() - t0)

        xs = np.stack([np.asarray(mpc.xs[0]), np.asarray(mpc.xs[1])])
        a0 = np.asarray(mpc.get_state_derivative(0))[-nv:]
        a1 = np.asarray(mpc.get_state_derivative(1))[-nv:]
        aa = np.stack([a0, a1])
        contacts = mpc.ocp_handler.get_contact_state(0)
        feet = mh.feet_names
        if id_solver is not None:
            f_t = [np.asarray(mpc.ocp_handler.get_reference_force(0, f))
                   for f in feet]

        multibody_state = xs.shape[1] == model.nq + nv
        for sub in range(n_simu):
            delay = sub * 1e-3
            if id_solver is not None:
                if multibody_state:
                    x_i = np.asarray(interp.interpolate_state(delay, 0.01, xs))
                else:  # centroidal 9-dim state: plain linear interpolation
                    x_i = np.asarray(interp.interpolate_linear(delay, 0.01, xs))
                a_i = np.asarray(interp.interpolate_linear(delay, 0.01, aa))
                id_solver.set_target(x_i[: model.nq] if multibody_state else x_i,
                                     x_i[model.nq:] if multibody_state else x_i,
                                     a_i, contacts, f_t)
                tau = np.asarray(id_solver.solve(step * 0.01 + delay, q, v))
            else:
                dx = np.asarray(state_difference(
                    model, jnp.asarray(mpc.xs[0]),
                    jnp.asarray(np.concatenate([q, v]))))
                tau = np.asarray(mpc.us[0]) - np.asarray(mpc.Ks[0]) @ dx
            if friction is not None:
                tau = np.asarray(friction.compute_friction(v[6:], tau))
            qj, vj, fw = sim.step(jnp.asarray(q), jnp.asarray(v),
                                  jnp.asarray(tau))
            q, v = np.asarray(qj), np.asarray(vj)
        log["q"].append(q.copy())
        log["v"].append(v.copy())
        log["f"].append(np.asarray(fw))
        if log_every and step % log_every == 0:
            print(f"step {step:4d}: base_z={q[2]:.4f} "
                  f"|v|={np.abs(v).max():.3f} "
                  f"solve={log['solve_time'][-1]*1e3:.1f}ms "
                  f"contacts={contacts}", flush=True)
    return log


def save_trajectory(log, path):
    """(examples/utils.py:34-85 capability) dump the rollout to .npz."""
    np.savez(path, q=np.stack(log["q"]), v=np.stack(log["v"]),
             f=np.stack(log["f"]), solve_time=np.asarray(log["solve_time"]))
