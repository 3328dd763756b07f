"""Joint-friction compensation torque.

Capability parity with FrictionCompensation (reference
src/friction-compensation.cpp:6-31): adds dry (friction*sign(v)) + viscous
(damping*v) terms, coefficients from the model tail(nu).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.model import RobotModel


class FrictionCompensation:
    def __init__(self, model: RobotModel, with_free_flyer: bool = True):
        self.nu = model.nv - 6 if with_free_flyer else model.nv
        self.dry_friction = np.asarray(model.friction)[-self.nu:]
        self.viscous_friction = np.asarray(model.damping)[-self.nu:]

    def compute_friction(self, velocity, torque):
        """Returns torque + viscous*v + dry*sign(v) (functional; the
        reference mutates in place)."""
        v = jnp.asarray(velocity)
        if v.shape[0] != self.nu:
            raise ValueError("Velocity has wrong size")
        tau = jnp.asarray(torque)
        if tau.shape[0] != self.nu:
            raise ValueError("Torque has wrong size")
        dry = jnp.asarray(self.dry_friction, v.dtype)
        visc = jnp.asarray(self.viscous_friction, v.dtype)
        return tau + visc * v + dry * jnp.sign(v)
