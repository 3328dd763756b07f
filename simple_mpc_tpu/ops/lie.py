"""Lie-group operations: SO(3), SE(3), quaternions.

TPU-native re-implementation of the Lie-algebra capability the reference
delegates to Pinocchio (reference: src/robot-handler.cpp:81-96 `difference`,
src/interpolator.cpp:5-48 `interpolate`).  All functions are pure jnp,
dtype-polymorphic, and vmappable over arbitrary leading batch dims.

Conventions (Pinocchio-compatible):
  * quaternions stored (x, y, z, w)
  * SE(3) tangent vectors ordered [linear(3); angular(3)]
  * free-flyer configuration block: [p(3); quat(4, xyzw)]
  * free-flyer tangent/velocity: [v_lin_LOCAL(3); omega_LOCAL(3)]

Numerical robustness: all small-angle branches use Taylor expansions behind
the "double-where" trick so gradients stay NaN-free in float32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

def _small2(dtype):
    """theta^2 threshold below which Taylor expansions are used: theta <
    eps(dtype)^(1/4).  Dtype-aware is essential: with an f64-calibrated
    constant, f32 JVPs of the generic branches divide by theta^6 ~ 1e-38
    (underflow -> inf*0 = NaN) for tiny-but-nonzero rotations."""
    import numpy as _np

    # jnp.finfo understands the ml_dtypes low-precision types (bfloat16)
    # that numpy's finfo rejects
    return float(_np.sqrt(float(jnp.finfo(dtype).eps)))


def _safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def skew(v):
    """3-vector -> skew-symmetric matrix, batched over leading dims."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q1, q2):
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:]], axis=-1)


def quat_to_rotmat(q):
    """Unit quaternion (xyzw) -> rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return r


def rotmat_to_quat(R):
    """Rotation matrix -> unit quaternion (xyzw), w >= 0.

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select by the largest diagonal combination (vmappable, NaN-free).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates (unnormalized), each valid when its pivot is largest.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    # candidate i has pivot p_i
    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                        1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cand, 4 wxyz-ish)
    q_wxyz = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # reorder: candidate stored as (w-part at position of pivot layout) -> build xyzw
    q = jnp.stack([q_wxyz[..., 1], q_wxyz[..., 2], q_wxyz[..., 3], q_wxyz[..., 0]], axis=-1)
    q = q * jnp.sign(jnp.where(q[..., 3:] == 0.0, 1.0, q[..., 3:]))
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO(3) exp / log
# ---------------------------------------------------------------------------

def exp3(w):
    """so(3) vector -> rotation matrix (Rodrigues, Taylor-guarded)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _small2(w.dtype)
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks; theta itself is
    # computed from the guarded theta2 so its JVP never sees sqrt(0)
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    s = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    c = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + s[..., None, None] * W + c[..., None, None] * (W @ W)


def log3(R):
    """Rotation matrix -> so(3) vector (principal branch, |w| <= pi).

    Three branches (small angle / generic / near pi), each evaluated on
    guarded inputs so gradients are NaN-free everywhere except the true
    singularity at theta == pi exactly (where log is non-differentiable;
    a finite value is still returned).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    # antisymmetric part: a = 2 sin(theta) * axis
    a = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0], R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    # small-angle branch for theta < eps^(1/4): cos > 1 - theta^2/2
    small = cos_t > 1.0 - 0.5 * _small2(cos_t.dtype)
    near_pi = cos_t < -1.0 + 2e-5
    generic = jnp.logical_not(small | near_pi)
    # --- generic branch: w = theta / (2 sin theta) * a  (arccos input guarded)
    cos_g = jnp.where(generic, cos_t, 0.0)
    theta_g = jnp.arccos(cos_g)
    sin_g = jnp.where(generic, jnp.sin(theta_g), 1.0)
    w_generic = (theta_g / (2.0 * sin_g))[..., None] * a
    # --- small branch: Taylor of theta/(2 sin theta) with theta^2 = |a|^2/4
    t2 = jnp.sum(a * a, axis=-1) * 0.25
    w_small = 0.5 * a * (1.0 + t2 / 6.0 + 7.0 * t2 * t2 / 360.0)[..., None]
    # --- near-pi branch: magnitude from diagonal, sign from antisymmetric part
    sin_p = _safe_sqrt(jnp.sum(a * a, axis=-1) * 0.25 + 1e-30)
    theta_p = jnp.pi - jnp.arcsin(jnp.clip(sin_p, 0.0, 1.0))
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    one_m_cos = jnp.where(near_pi, 1.0 - cos_t, 1.0)
    axis_abs = _safe_sqrt(jnp.clip(diag - cos_t[..., None], 0.0, None) / one_m_cos[..., None])
    sgn = jnp.where(a >= 0.0, 1.0, -1.0)
    w_pi = theta_p[..., None] * axis_abs * sgn
    return jnp.where(
        near_pi[..., None], w_pi, jnp.where(small[..., None], w_small, w_generic)
    )


def _so3_jacobians(w):
    """Left Jacobian V(w) of SO(3) and its inverse, used by SE(3) exp/log.

    V(w) = I + (1-cos t)/t^2 W + (t - sin t)/t^3 W^2
    Vinv(w) = I - W/2 + (1/t^2 - (1+cos t)/(2 t sin t)) W^2
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _small2(w.dtype)
    t2s = jnp.where(small, 1.0, theta2)
    ts = jnp.sqrt(t2s)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(ts)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (ts - jnp.sin(ts)) / (t2s * ts))
    W = skew(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    denom = 2.0 * ts * jnp.where(small, 1.0, jnp.sin(ts))
    e = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / t2s - (1.0 + jnp.cos(ts)) / denom,
    )
    Vinv = eye - 0.5 * W + e[..., None, None] * W2
    return V, Vinv


# ---------------------------------------------------------------------------
# SE(3): tuples (R, p); tangent = [linear; angular]
# ---------------------------------------------------------------------------

def se3_identity(dtype=jnp.float32):
    return jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype)


def se3_mul(M1, M2):
    R1, p1 = M1
    R2, p2 = M2
    return R1 @ R2, (R1 @ p2[..., None])[..., 0] + p1


def se3_inv(M):
    R, p = M
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ p[..., None])[..., 0]


def se3_act(M, x):
    """Apply SE(3) transform to 3D point(s)."""
    R, p = M
    return (R @ x[..., None])[..., 0] + p


def exp6(v):
    """se(3) tangent [lin; ang] -> SE(3). Pinocchio convention."""
    lin, ang = v[..., :3], v[..., 3:]
    R = exp3(ang)
    V, _ = _so3_jacobians(ang)
    p = (V @ lin[..., None])[..., 0]
    return R, p


def log6(M):
    """SE(3) -> tangent [lin; ang]."""
    R, p = M
    w = log3(R)
    _, Vinv = _so3_jacobians(w)
    lin = (Vinv @ p[..., None])[..., 0]
    return jnp.concatenate([lin, w], axis=-1)


# ---------------------------------------------------------------------------
# Free-flyer (p, quat) block difference / integrate — Pinocchio semantics
# ---------------------------------------------------------------------------

def freeflyer_integrate(pq, v):
    """pq = [p(3); quat(4 xyzw)], v = [lin; ang] local tangent -> new pq.

    Matches pinocchio SpecialEuclideanOperationTpl<3>: M_new = M * exp6(v).
    """
    p, q = pq[..., :3], pq[..., 3:7]
    R = quat_to_rotmat(q)
    dR, dp = exp6(v)
    R_new = R @ dR
    p_new = p + (R @ dp[..., None])[..., 0]
    q_new = rotmat_to_quat(R_new)
    return jnp.concatenate([p_new, q_new], axis=-1)


def freeflyer_difference(pq1, pq2):
    """Tangent d s.t. integrate(pq1, d) = pq2: d = log6(M1^-1 M2)."""
    p1, q1 = pq1[..., :3], pq1[..., 3:7]
    p2, q2 = pq2[..., :3], pq2[..., 3:7]
    R1 = quat_to_rotmat(q1)
    R2 = quat_to_rotmat(q2)
    R1t = jnp.swapaxes(R1, -1, -2)
    dR = R1t @ R2
    dp = (R1t @ (p2 - p1)[..., None])[..., 0]
    return log6((dR, dp))


# ---------------------------------------------------------------------------
# Spatial-algebra helpers (motion/force transforms), Pinocchio [lin; ang] order
# ---------------------------------------------------------------------------

def motion_action(M, v):
    """Act on motion vector by SE(3): v_out = X(M) v, [lin; ang] order.

    If M = (R, p) maps frame B coords to frame A coords (aMb), then for a
    motion v expressed in B: lin_A = R lin_B + p x (R ang_B); ang_A = R ang_B.
    """
    R, p = M
    lin, ang = v[..., :3], v[..., 3:]
    ang_a = (R @ ang[..., None])[..., 0]
    lin_a = (R @ lin[..., None])[..., 0] + jnp.cross(p, ang_a)
    return jnp.concatenate([lin_a, ang_a], axis=-1)


def motion_action_inv(M, v):
    """v expressed in A -> expressed in B where M = aMb."""
    R, p = M
    Rt = jnp.swapaxes(R, -1, -2)
    lin, ang = v[..., :3], v[..., 3:]
    ang_b = (Rt @ ang[..., None])[..., 0]
    lin_b = (Rt @ (lin - jnp.cross(p, ang))[..., None])[..., 0]
    return jnp.concatenate([lin_b, ang_b], axis=-1)


def force_action(M, f):
    """Force covector transform: f_A = X*(M) f_B, f = [force; torque]."""
    R, p = M
    lin, ang = f[..., :3], f[..., 3:]
    lin_a = (R @ lin[..., None])[..., 0]
    ang_a = (R @ ang[..., None])[..., 0] + jnp.cross(p, lin_a)
    return jnp.concatenate([lin_a, ang_a], axis=-1)


def force_action_inv(M, f):
    R, p = M
    Rt = jnp.swapaxes(R, -1, -2)
    lin, ang = f[..., :3], f[..., 3:]
    lin_b = (Rt @ lin[..., None])[..., 0]
    ang_b = (Rt @ (ang - jnp.cross(p, lin))[..., None])[..., 0]
    return jnp.concatenate([lin_b, ang_b], axis=-1)


def motion_cross(v, m):
    """Spatial cross product v x m for motions, [lin; ang] order."""
    vl, va = v[..., :3], v[..., 3:]
    ml, ma = m[..., :3], m[..., 3:]
    lin = jnp.cross(va, ml) + jnp.cross(vl, ma)
    ang = jnp.cross(va, ma)
    return jnp.concatenate([lin, ang], axis=-1)


def motion_cross_star(v, f):
    """Dual cross product v x* f for forces."""
    vl, va = v[..., :3], v[..., 3:]
    fl, fa = f[..., :3], f[..., 3:]
    lin = jnp.cross(va, fl)
    ang = jnp.cross(va, fa) + jnp.cross(vl, fl)
    return jnp.concatenate([lin, ang], axis=-1)
