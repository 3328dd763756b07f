"""Sub-timestep interpolation between MPC knots for the 1 kHz loop.

Capability parity with Interpolator (reference src/interpolator.cpp):
configuration via Lie-group interpolation (:5-24), state = Lie q-part +
linear v-part (:26-48), generic linear (:50-67), contacts = nearest-knot
sample with clamp (:69-78).  All jnp, jittable, trajectory passed as a
stacked (N, dim) array.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.model import RobotModel
from ..ops import state as state_ops


def _knot(delay, timestep, n):
    step_nb = jnp.floor(delay / timestep).astype(jnp.int32)
    step_nb = jnp.clip(step_nb, 0, n - 1)
    progress = (delay - step_nb.astype(delay.dtype) * timestep) / timestep
    # past the last knot: hold the final value
    at_end = step_nb >= n - 1
    nxt = jnp.clip(step_nb + 1, 0, n - 1)
    progress = jnp.where(at_end, 0.0, progress)
    return step_nb, nxt, progress


class Interpolator:
    def __init__(self, model: RobotModel):
        self.model = model

    def interpolate_configuration(self, delay, timestep, qs):
        qs = jnp.asarray(qs)
        delay = jnp.asarray(delay, qs.dtype)
        i, j, s = _knot(delay, timestep, qs.shape[0])
        dq = state_ops.difference(self.model, qs[i], qs[j])
        return state_ops.integrate(self.model, qs[i], s * dq)

    def interpolate_state(self, delay, timestep, xs):
        xs = jnp.asarray(xs)
        delay = jnp.asarray(delay, xs.dtype)
        nq = self.model.nq
        i, j, s = _knot(delay, timestep, xs.shape[0])
        dq = state_ops.difference(self.model, xs[i, :nq], xs[j, :nq])
        q = state_ops.integrate(self.model, xs[i, :nq], s * dq)
        v = xs[j, nq:] * s + xs[i, nq:] * (1.0 - s)
        return jnp.concatenate([q, v])

    def interpolate_linear(self, delay, timestep, vs):
        vs = jnp.asarray(vs)
        delay = jnp.asarray(delay, vs.dtype)
        i, j, s = _knot(delay, timestep, vs.shape[0])
        return vs[j] * s + vs[i] * (1.0 - s)

    def interpolate_contacts(self, delay, timestep, cs):
        cs = jnp.asarray(cs)
        step_nb = jnp.clip(jnp.floor(jnp.asarray(delay) / timestep).astype(jnp.int32),
                           0, cs.shape[0] - 1)
        return cs[step_nb]
