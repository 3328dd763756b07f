"""In-framework rigid-body simulator — the PyBullet-replacement for
closed-loop validation (reference examples use BulletRobot,
examples/bullet_robot.py:16-120; SURVEY.md §2b suggests an in-framework
simulator built from the same device kernels).

Ground contact is RIGID: feet at/below the ground plane become active 3D
point contacts solved by the same masked constrained-dynamics KKT kernel the
full-dynamics OCP uses (ops/dynamics.constrained_fwd_dynamics), with
Baumgarte stabilization toward a vertical-only anchor.  Unilaterality is a
one-step active-set refinement (solve, drop pulling contacts, re-solve) —
fixed structure, so the whole step jits and `lax.scan`s on device.  An
explicit spring-damper ground was tried first and chatters at robot-realistic
stiffness under explicit integration; the rigid path is unconditionally
stable at dt=1e-3.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import RobotModel
from ..ops import dynamics as dyn
from ..ops import kinematics as kin
from ..ops.state import integrate as q_integrate


@dataclasses.dataclass(frozen=True)
class SimSettings:
    dt: float = 1e-3
    ground_height: float = 0.0
    contact_margin: float = 1e-4  # activation band below the plane
    baumgarte_kp: float = 400.0  # [1/s^2] position correction
    baumgarte_kd: float = 40.0  # [1/s]


class Simulator:
    """Torque-in, state-out simulator (BulletRobot capability:
    execute(tau) + measureState)."""

    def __init__(self, model: RobotModel, feet_frame_ids: Sequence[int],
                 settings: SimSettings = SimSettings()):
        self.model = model
        self.settings = settings
        self.feet_fids = list(feet_frame_ids)
        self.nk = len(self.feet_fids)

    def _dynamics(self, q, v, tau_full, active, anchors):
        s = self.settings
        return dyn.constrained_fwd_dynamics(
            self.model, q, v, tau_full, self.feet_fids, active,
            contact_dim=3, contact_ref_p=anchors,
            kp=s.baumgarte_kp, kd=s.baumgarte_kd)

    @partial(jax.jit, static_argnums=(0,))
    def step(self, q, v, tau_joints):
        """One semi-implicit Euler step under actuated joint torques."""
        s = self.settings
        m = self.model
        dtype = q.dtype
        oR, op = kin.fk(m, q)
        fR, fp = kin.frame_placements(m, oR, op)
        feet_p = jnp.stack([fp[f] for f in self.feet_fids])
        feet_R = jnp.stack([fR[f] for f in self.feet_fids])
        pen = s.ground_height - feet_p[:, 2]
        active0 = (pen > -s.contact_margin).astype(dtype)
        # vertical-only anchor: keep xy, pin z to the plane
        anchors = feet_p.at[:, 2].set(s.ground_height)
        tau_full = jnp.concatenate([jnp.zeros(6, dtype), tau_joints])

        ddq, f_loc = self._dynamics(q, v, tau_full, active0, anchors)
        # unilateral refinement: drop contacts pulling on the ground
        f_w = jnp.einsum("kij,kj->ki", feet_R, f_loc)
        active1 = active0 * (f_w[:, 2] > 0.0).astype(dtype)
        ddq, f_loc = self._dynamics(q, v, tau_full, active1, anchors)
        f_w = jnp.einsum("kij,kj->ki", feet_R, f_loc)

        v_next = v + s.dt * ddq
        q_next = q_integrate(m, q, s.dt * v_next)
        return q_next, v_next, f_w

    @partial(jax.jit, static_argnums=(0,))
    def contact_forces(self, q, v, tau_joints):
        """(nk, 3) world ground-reaction forces at the current state."""
        return self.step(q, v, tau_joints)[2]

    def rollout(self, q0, v0, taus):
        """(N, nu) torque sequence -> on-device lax.scan rollout."""

        def body(carry, tau):
            q, v = carry
            q, v, f = self.step(q, v, tau)
            return (q, v), (q, v, f)

        (_, _), traj = jax.lax.scan(body, (jnp.asarray(q0), jnp.asarray(v0)),
                                    jnp.asarray(taus))
        return traj
