"""Swing-foot reference generation — Bézier curves, TPU-native.

Capability parity with src/foot-trajectory.cpp (FootTrajectory): one
9-control-point Bézier per swing phase (4x init point for zero vel/acc/jerk,
midpoint = 3/4 init + 1/4 final lifted by swing_apex, 4x final point,
foot-trajectory.cpp:41-62); horizon sampling walks backwards from the landing
time: t < 0 -> final pose, t > T_fly -> initial pose, else
curve((T_fly - t)/T_fly) (foot-trajectory.cpp:64-82).

TPU-first re-design: instead of ndcurves spline objects per foot, the state is
two arrays (initial/final positions per foot) and evaluation is a closed-form
degree-8 Bernstein polynomial — pure jnp, vmapped over feet and horizon
stages, so the whole per-tick reference regeneration is one fused kernel
inside the jitted MPC step.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# Binomial coefficients C(8, i) for the degree-8 Bernstein basis.
_BINOM8 = np.array([1, 8, 28, 56, 70, 56, 28, 8, 1], dtype=np.float64)


def bezier_control_points(p_init, p_final, swing_apex):
    """(9, 3) control points of the swing Bézier (foot-trajectory.cpp:41-62)."""
    p_init = jnp.asarray(p_init)
    p_final = jnp.asarray(p_final)
    mid = 0.75 * p_init + 0.25 * p_final
    mid = mid.at[..., 2].add(swing_apex)
    reps_i = jnp.broadcast_to(p_init, (4,) + p_init.shape)
    reps_f = jnp.broadcast_to(p_final, (4,) + p_final.shape)
    return jnp.concatenate([reps_i, mid[None], reps_f], axis=0)


def bezier_eval(points, s):
    """Evaluate the degree-8 Bézier at s in [0, 1].  points: (9, 3)."""
    i = jnp.arange(9, dtype=points.dtype)
    s = jnp.asarray(s, dtype=points.dtype)
    basis = jnp.asarray(_BINOM8, dtype=points.dtype) * s**i * (1.0 - s) ** (8.0 - i)
    return basis @ points


def sample_swing(p_init, p_final, swing_apex, time_to_land, T_fly, horizon):
    """(horizon, 3) foot reference positions over the lookahead window.

    Stage t samples the swing at countdown `time_to_land - t`
    (createTrajectory, foot-trajectory.cpp:64-82): already landed -> final,
    not yet taken off -> initial, in flight -> Bézier.
    """
    pts = bezier_control_points(p_init, p_final, swing_apex)
    dtype = pts.dtype
    t = jnp.asarray(time_to_land, dtype=dtype) - jnp.arange(horizon, dtype=dtype)
    s = jnp.clip((T_fly - t) / T_fly, 0.0, 1.0)
    curve = jax.vmap(lambda si: bezier_eval(pts, si))(s)
    ref = jnp.where((t < 0)[:, None], jnp.asarray(p_final, dtype)[None], curve)
    ref = jnp.where((t > T_fly)[:, None], jnp.asarray(p_init, dtype)[None], ref)
    return ref


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SwingState:
    """Per-foot swing bookkeeping as arrays — the functional counterpart of
    FootTrajectory's initial_poses_/final_poses_ maps."""

    p_init: jnp.ndarray  # (nk, 3)
    p_final: jnp.ndarray  # (nk, 3)


class FootTrajectory:
    """Host-facing wrapper with the reference's update/get API
    (foot-trajectory.hpp:24-62); all math delegates to the jnp functions
    above so the MPC can also call them from inside jit."""

    def __init__(self, initial_poses: Dict[str, np.ndarray], swing_apex: float,
                 T_fly: int, T_contact: int, T: int):
        self.names = list(initial_poses.keys())
        p0 = jnp.stack([jnp.asarray(initial_poses[n]) for n in self.names])
        self.state = SwingState(p_init=p0, p_final=p0)
        self.swing_apex = float(swing_apex)
        self.T_fly = int(T_fly)
        self.T_contact = int(T_contact)
        self.T = int(T)
        self.references = {n: np.tile(np.asarray(initial_poses[n]), (T, 1))
                           for n in self.names}

    def update_apex(self, apex: float):
        self.swing_apex = float(apex)

    def update_trajectory(self, update: bool, landing_time: int, ee_trans,
                          final_trans, ee_name: str):
        """(foot-trajectory.cpp:84-96) — refit the Bézier from the current
        foot position when `update`, then resample the horizon."""
        k = self.names.index(ee_name)
        if update:
            self.state = SwingState(
                p_init=self.state.p_init.at[k].set(jnp.asarray(ee_trans)),
                p_final=self.state.p_final.at[k].set(jnp.asarray(final_trans)),
            )
        ref = sample_swing(self.state.p_init[k], self.state.p_final[k],
                           self.swing_apex, landing_time, self.T_fly, self.T)
        self.references[ee_name] = np.asarray(ref)
        return ref

    def get_reference(self, ee_name: str):
        return self.references[ee_name]
