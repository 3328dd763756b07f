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
    tangent_split = None  # no cheap q/v factorization to exploit

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
        # tangent factorizes as [dq; dv]: integrate applies dq on the Lie
        # q-part and dv additively — lets the solver linearize per block
        # with symbolic-zero tangents in the other block (see
        # ProxDDPSolver._linearize_stage).
        self.tangent_split = model.nv

    def integrate(self, x, dx):
        return state_ops.state_integrate(self.model, x, dx)

    def integrate_parts(self, x, dq, dv):
        """integrate(x, [dq; dv]) with dq/dv as separate arguments, so a
        JVP in one block keeps the other block's tangent symbolically zero
        (q-tangents never generate v-chain ops and vice versa)."""
        nq = self.model.nq
        return jnp.concatenate(
            [state_ops.integrate(self.model, x[:nq], dq), x[nq:] + dv])

    def difference(self, x1, x2):
        return state_ops.state_difference(self.model, x1, x2)

    # -- trailing-batch (SoA) twins: X (nx, N), tangents (nv, N) ----------
    def integrate_soa(self, X, dX):
        from ..ops import soa

        return soa.state_integrate(self.model, X, dX)

    def integrate_parts_soa(self, X, dq, dv):
        from ..ops import soa

        nq = self.model.nq
        return jnp.concatenate(
            [soa.integrate(self.model, X[:nq], dq), X[nq:] + dv], axis=0)

    def difference_soa(self, X1, X2):
        from ..ops import soa

        return soa.state_difference(self.model, X1, X2)
