"""Configuration-space Lie ops over a whole RobotModel.

pinocchio::{integrate, difference, interpolate} equivalents as used by
robot-handler.cpp:81-96 and interpolator.cpp:5-48, unrolled over the
model's static joint layout.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.model import FREE, RobotModel
from . import lie


def integrate(model: RobotModel, q, dq):
    """q (+) dq -> q_new (nq,).  dq is a tangent vector (nv,)."""
    parts = []
    for j in range(model.njoints):
        iq, iv = model.idx_q[j], model.idx_v[j]
        if model.joint_types[j] == FREE:
            parts.append(lie.freeflyer_integrate(q[iq: iq + 7], dq[iv: iv + 6]))
        else:
            parts.append(q[iq: iq + 1] + dq[iv: iv + 1])
    return jnp.concatenate(parts)


def difference(model: RobotModel, q1, q2):
    """Tangent d with integrate(q1, d) == q2 (nv,)."""
    parts = []
    for j in range(model.njoints):
        iq = model.idx_q[j]
        if model.joint_types[j] == FREE:
            parts.append(lie.freeflyer_difference(q1[iq: iq + 7], q2[iq: iq + 7]))
        else:
            parts.append(q2[iq: iq + 1] - q1[iq: iq + 1])
    return jnp.concatenate(parts)


def interpolate(model: RobotModel, q1, q2, alpha):
    """Geodesic interpolation (pinocchio::interpolate, interpolator.cpp:22)."""
    return integrate(model, q1, alpha * difference(model, q1, q2))


def state_difference(model: RobotModel, x1, x2):
    """Reference RobotModelHandler::difference (robot-handler.cpp:81-96):
    dx = [difference(q1, q2); v2 - v1]  over x = [q; v]."""
    nq = model.nq
    return jnp.concatenate(
        [difference(model, x1[:nq], x2[:nq]), x2[nq:] - x1[nq:]]
    )


def state_integrate(model: RobotModel, x, dx):
    """x (+) dx over x = [q; v], dx = [dq_tangent; dv]."""
    nq, nv = model.nq, model.nv
    return jnp.concatenate(
        [integrate(model, x[:nq], dx[:nv]), x[nq:] + dx[nv:]]
    )
