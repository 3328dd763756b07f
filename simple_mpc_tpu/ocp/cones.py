"""Cone constraint residuals: friction pyramid, wrench cone, boxes.

Aligator Friction/WrenchCone residual capability (reference
centroidal-dynamics.cpp:85-104, kinodynamics.cpp:116-133, fulldynamics.cpp:
167-186).  Expressed as linear inequalities r = A f <= 0, evaluated as pure
functions so they can be masked per-stage by contact activity.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# minimum normal force in the friction pyramid's fz row (shared by
# friction_cone and the formulations' SoA twins so the two constraint
# paths can never silently diverge)
FRICTION_EPS = 1e-4


def friction_cone_mat(mu: float) -> np.ndarray:
    """(5, 3) pyramid: fz >= eps, |fx| <= mu fz, |fy| <= mu fz."""
    return np.array(
        [
            [0.0, 0.0, -1.0],
            [1.0, 0.0, -mu],
            [-1.0, 0.0, -mu],
            [0.0, 1.0, -mu],
            [0.0, -1.0, -mu],
        ]
    )


def friction_cone(f3, mu: float, eps: float = FRICTION_EPS):
    """Residual (5,) <= 0 for a 3D force in the contact frame."""
    A = jnp.asarray(friction_cone_mat(mu), dtype=f3.dtype)
    r = A @ f3
    return r.at[0].add(eps)  # fz >= eps


def wrench_cone_mat(mu: float, L: float, W: float) -> np.ndarray:
    """(17, 6) rectangular-foot contact wrench cone (Caron et al. CWC):
    friction pyramid (4), fz>0 (1), CoP box (4), yaw-torque limits (8).
    Wrench ordering [fx, fy, fz, tx, ty, tz] about the foot-frame center.
    """
    rows = []
    # |fx| <= mu fz ; |fy| <= mu fz
    rows += [[1, 0, -mu, 0, 0, 0], [-1, 0, -mu, 0, 0, 0],
             [0, 1, -mu, 0, 0, 0], [0, -1, -mu, 0, 0, 0]]
    # fz >= 0
    rows += [[0, 0, -1, 0, 0, 0]]
    # CoP inside foot: |ty| <= L fz ; |tx| <= W fz   (L = half-length x, W = half-width y)
    rows += [[0, 0, -L, 0, 1, 0], [0, 0, -L, 0, -1, 0],
             [0, 0, -W, 1, 0, 0], [0, 0, -W, -1, 0, 0]]
    # yaw torque limits
    rows += [
        [-W, -L, -(L + W) * mu, mu, mu, -1],
        [-W, L, -(L + W) * mu, mu, -mu, -1],
        [W, -L, -(L + W) * mu, -mu, mu, -1],
        [W, L, -(L + W) * mu, -mu, -mu, -1],
        [W, L, -(L + W) * mu, mu, mu, 1],
        [W, -L, -(L + W) * mu, mu, -mu, 1],
        [-W, L, -(L + W) * mu, -mu, mu, 1],
        [-W, -L, -(L + W) * mu, -mu, -mu, 1],
    ]
    return np.array(rows, dtype=np.float64)


def wrench_cone(f6, mu: float, L: float, W: float):
    """Residual (17,) <= 0 for a 6D wrench in the foot frame."""
    A = jnp.asarray(wrench_cone_mat(mu, L, W), dtype=f6.dtype)
    return A @ f6


def box(value, lower, upper):
    """Two-sided bound as stacked inequalities (2n,) <= 0.

    Infinite bounds produce -inf rows; callers clamp with `mask_ineq`.
    """
    lo = jnp.asarray(lower, dtype=value.dtype)
    hi = jnp.asarray(upper, dtype=value.dtype)
    return jnp.concatenate([value - hi, lo - value])


def mask_ineq(r, mask):
    """Deactivate inequality rows: masked-out rows become -1 (satisfied).
    Also neutralizes +/-inf rows coming from unbounded box limits."""
    r = jnp.where(jnp.isfinite(r), r, -1.0)
    return jnp.where(mask, r, -1.0)


def mask_eq(r, mask):
    """Deactivate equality rows (residual forced to 0)."""
    return jnp.where(mask, r, 0.0)
