"""MuJoCo as an *independent* closed-loop physics plant.

The in-framework rigid-contact `Simulator` reuses the framework's own
constrained-dynamics kernel — a shared modeling bug would cancel out of any
closed-loop test built on it.  This plant steps `mujoco.mj_step` on the
exact same model (exported via models/mjcf.to_mjcf with foot collision
spheres), giving the role PyBullet plays for the reference
(examples/bullet_robot.py:16-120: torque control + state measurement
against an engine the controller shares no code with).

State conventions bridged here (same mapping the kernel oracle tests pin,
tests/test_rigid_body.py):
  qpos free joint  [p(3), quat wxyz]     ours: [p(3), quat xyzw]
  qvel free joint  [v_lin WORLD, omega LOCAL]   ours: both LOCAL
Joint (hinge/slide) coordinates are identical and in the same order.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from ..models.model import RobotModel


class MuJoCoPlant:
    """Torque-in, state-out plant with the Simulator's `step` interface
    (BulletRobot capability: execute(tau) + measureState).

    step(q, v, tau_joints) -> (q_next, v_next, forces_world (nk, 3)) —
    stateful inside (MuJoCo integrates its own mjData); q/v arguments are
    accepted for interface parity and ignored after `reset`.
    """

    def __init__(self, model: RobotModel, feet_frame_names: Sequence[str],
                 dt: float = 1e-3, ground_height: float = 0.0,
                 foot_radius: float = 0.015):
        import mujoco

        from ..models.mjcf import to_mjcf

        self._mujoco = mujoco
        self.model = model
        self.feet_names = list(feet_frame_names)
        xml = to_mjcf(model, timestep=dt, ground=True,
                      contact_feet=self.feet_names,
                      foot_radius=foot_radius, ground_height=ground_height)
        self.mj = mujoco.MjModel.from_xml_string(xml)
        self.d = mujoco.MjData(self.mj)
        self._foot_geoms = [
            mujoco.mj_name2id(self.mj, mujoco.mjtObj.mjOBJ_GEOM,
                              f"{n}_collision") for n in self.feet_names]
        self._initialized = False

    # -- conventions ------------------------------------------------------
    def _R_base(self, q):
        import jax.numpy as jnp

        from ..ops import lie

        return np.asarray(lie.quat_to_rotmat(jnp.asarray(q[3:7], jnp.float64)))

    def reset(self, q, v):
        q = np.asarray(q, np.float64)
        v = np.asarray(v, np.float64)
        self.d.qpos[:3] = q[:3]
        self.d.qpos[3:7] = [q[6], q[3], q[4], q[5]]  # xyzw -> wxyz
        self.d.qpos[7:] = q[7:]
        R = self._R_base(q)
        self.d.qvel[:3] = R @ v[:3]  # local linear -> world
        self.d.qvel[3:6] = v[3:6]
        self.d.qvel[6:] = v[6:]
        self._mujoco.mj_forward(self.mj, self.d)
        self._initialized = True

    def measure_state(self):
        """Our-convention (q, v) from mjData."""
        qp, qv = self.d.qpos, self.d.qvel
        q = np.concatenate([qp[:3], [qp[4], qp[5], qp[6], qp[3]], qp[7:]])
        R = self._R_base(q)
        v = np.concatenate([R.T @ qv[:3], qv[3:6], qv[6:]])
        return q, v

    def foot_forces_world(self):
        """(nk, 3) sum of world-frame contact forces on each foot geom."""
        mujoco = self._mujoco
        out = np.zeros((len(self._foot_geoms), 3))
        f6 = np.zeros(6)
        for ci in range(self.d.ncon):
            con = self.d.contact[ci]
            for k, g in enumerate(self._foot_geoms):
                if g in (con.geom1, con.geom2):
                    mujoco.mj_contactForce(self.mj, self.d, ci, f6)
                    fw = con.frame.reshape(3, 3).T @ f6[:3]
                    out[k] += fw if con.geom2 == g else -fw
        return out

    def step(self, q, v, tau_joints):
        """One mj_step under actuated joint torques (no floating-base
        actuation, matching the OCP's [0; I] actuation matrix)."""
        if not self._initialized:
            self.reset(q, v)
        self.d.qfrc_applied[:] = 0.0
        self.d.qfrc_applied[6:] = np.asarray(tau_joints, np.float64)
        self._mujoco.mj_step(self.mj, self.d)
        qn, vn = self.measure_state()
        return qn, vn, self.foot_forces_world()
