"""State spaces: vector space and multibody phase space.

Aligator VectorSpace / MultibodyPhaseSpace capability (reference
centroidal-dynamics.cpp:31, kinodynamics.cpp:46): integrate/difference
pairs used by the solver to form tangent-space expansions.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.model import RobotModel
from ..ops import state as state_ops


class VectorSpace:
    def __init__(self, nx: int):
        self.nx = nx
        self.ndx = nx

    def integrate(self, x, dx):
        return x + dx

    def difference(self, x1, x2):
        return x2 - x1

    def neutral(self):
        return jnp.zeros(self.nx)


class MultibodyPhaseSpace:
    """x = [q (nq); v (nv)], tangent [dq (nv); dv (nv)] (Lie on q)."""

    def __init__(self, model: RobotModel):
        self.model = model
        self.nx = model.nq + model.nv
        self.ndx = 2 * model.nv

    def integrate(self, x, dx):
        return state_ops.state_integrate(self.model, x, dx)

    def difference(self, x1, x2):
        return state_ops.state_difference(self.model, x1, x2)
