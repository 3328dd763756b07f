"""Structure-of-arrays rigid-body kernels — batch in the vector lanes.

Round-1 profiling showed the solver hot path (stage evaluation + its
60-wide forward-mode linearization, mpc.cpp:212 equivalent) running at
~1% of the chip's elementwise throughput: every array carried its 3x3 /
3-vector component dims TRAILING, so the TPU's (8 sublanes x 128 lanes)
vector registers were tiled over a 3x3 footprint — 9/1024 useful slots.

This module re-implements the `ops.lie` / `ops.world` capability
(Pinocchio FK / centroidal algebra parity, reference
src/robot-handler.cpp:114-140, src/kinodynamics.cpp:85-89) with the
BATCH AXIS TRAILING: every quantity is shaped (components..., N) where N
is the flattened stage/scenario batch.  All small-matrix algebra is
unrolled componentwise, so every XLA op is elementwise over N lanes —
the layout the VPU actually vectorizes.  Contractions over dof/joint
axes are einsums whose operands keep N minor-most (batched matmuls on
the MXU).

Component-axis conventions:
  * 3-vectors / 6-vectors: (..., 3, N) / (..., 6, N), [lin; ang] order
  * rotations: (..., 3, 3, N); quaternions (xyzw): (..., 4, N)
  * configuration q: (nq, N); tangents/velocities: (nv, N)
All functions are dtype-polymorphic, JVP-safe (Taylor-guarded branches,
same guards as ops.lie), and compose with an outer vmap (the scenario
batch axis B is added by the solver's caller).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import FREE, RobotModel
from . import world as _world
from .lie import _small2

# ---------------------------------------------------------------------------
# Small-matrix algebra, unrolled over components, elementwise over lanes
# ---------------------------------------------------------------------------


def mm(A, B):
    """(...,3,3,N) @ (...,3,3,N) -> (...,3,3,N), unrolled."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(A[..., i, 0, :] * B[..., 0, j, :]
                        + A[..., i, 1, :] * B[..., 1, j, :]
                        + A[..., i, 2, :] * B[..., 2, j, :])
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def mtm(A, B):
    """A^T @ B."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(A[..., 0, i, :] * B[..., 0, j, :]
                        + A[..., 1, i, :] * B[..., 1, j, :]
                        + A[..., 2, i, :] * B[..., 2, j, :])
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def mv(A, x):
    """(...,3,3,N) @ (...,3,N) -> (...,3,N)."""
    return jnp.stack(
        [A[..., i, 0, :] * x[..., 0, :] + A[..., i, 1, :] * x[..., 1, :]
         + A[..., i, 2, :] * x[..., 2, :] for i in range(3)], axis=-2)


def mtv(A, x):
    """A^T @ x."""
    return jnp.stack(
        [A[..., 0, i, :] * x[..., 0, :] + A[..., 1, i, :] * x[..., 1, :]
         + A[..., 2, i, :] * x[..., 2, :] for i in range(3)], axis=-2)


def cross(a, b):
    """Cross product over axis -2."""
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=-2)


def _mat3(rows):
    """Build (...,3,3,N) from a 3x3 nested list of (...,N) entries."""
    return jnp.stack([jnp.stack(r, axis=-2) for r in rows], axis=-3)


def transpose3(A):
    return jnp.swapaxes(A, -3, -2)


def eye3(like):
    """(3,3,1)-shaped identity broadcastable against (...,3,3,N)."""
    return jnp.eye(3, dtype=like.dtype)[..., None]


# ---------------------------------------------------------------------------
# Quaternions (xyzw), components on axis -2
# ---------------------------------------------------------------------------


def quat_to_rotmat(q):
    x, y, z, w = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return _mat3([
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ])


def quat_normalize(q):
    return q / jnp.sqrt(jnp.sum(q * q, axis=-2, keepdims=True))


def rotmat_to_quat(R):
    """Branch-free Shepperd (parity with lie.rotmat_to_quat), (...,4,N)."""
    m00, m01, m02 = R[..., 0, 0, :], R[..., 0, 1, :], R[..., 0, 2, :]
    m10, m11, m12 = R[..., 1, 0, :], R[..., 1, 1, :], R[..., 1, 2, :]
    m20, m21, m22 = R[..., 2, 0, :], R[..., 2, 1, :], R[..., 2, 2, :]
    tr = m00 + m11 + m22
    # candidates in (w, x, y, z) order, one per pivot
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-2)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-2)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-2)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-2)
    cands = jnp.stack([qw, qx, qy, qz], axis=-3)  # (...,4cand,4comp,N)
    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                        1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-2)
    idx = jnp.argmax(pivots, axis=-2)  # (...,N)
    onehot = jax.nn.one_hot(idx, 4, axis=-2, dtype=R.dtype)  # (...,4,N)
    q_wxyz = jnp.sum(cands * onehot[..., :, None, :], axis=-3)  # (...,4comp,N)
    q = jnp.stack([q_wxyz[..., 1, :], q_wxyz[..., 2, :], q_wxyz[..., 3, :],
                   q_wxyz[..., 0, :]], axis=-2)
    w = q[..., 3:4, :]
    q = q * jnp.sign(jnp.where(w == 0.0, 1.0, w))
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO(3)/SE(3) exp/log (Taylor-guarded as in ops.lie)
# ---------------------------------------------------------------------------


def exp3(w):
    """so(3) (...,3,N) -> R (...,3,3,N): R = (1 - c t^2) I + s W + c w w^T."""
    theta2 = jnp.sum(w * w, axis=-2)
    small = theta2 < _small2(w.dtype)
    t2s = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2s)
    s = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    c = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    w0, w1, w2 = w[..., 0, :], w[..., 1, :], w[..., 2, :]
    a = 1.0 - c * theta2
    return _mat3([
        [a + c * w0 * w0, -s * w2 + c * w0 * w1, s * w1 + c * w0 * w2],
        [s * w2 + c * w0 * w1, a + c * w1 * w1, -s * w0 + c * w1 * w2],
        [-s * w1 + c * w0 * w2, s * w0 + c * w1 * w2, a + c * w2 * w2],
    ])


def log3(R):
    """R (...,3,3,N) -> w (...,3,N) (principal branch; parity with lie.log3)."""
    tr = R[..., 0, 0, :] + R[..., 1, 1, :] + R[..., 2, 2, :]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    a = jnp.stack([R[..., 2, 1, :] - R[..., 1, 2, :],
                   R[..., 0, 2, :] - R[..., 2, 0, :],
                   R[..., 1, 0, :] - R[..., 0, 1, :]], axis=-2)
    small = cos_t > 1.0 - 0.5 * _small2(cos_t.dtype)
    near_pi = cos_t < -1.0 + 2e-5
    generic = jnp.logical_not(small | near_pi)
    cos_g = jnp.where(generic, cos_t, 0.0)
    theta_g = jnp.arccos(cos_g)
    sin_g = jnp.where(generic, jnp.sin(theta_g), 1.0)
    w_generic = (theta_g / (2.0 * sin_g))[..., None, :] * a
    t2 = jnp.sum(a * a, axis=-2) * 0.25
    w_small = 0.5 * a * (1.0 + t2 / 6.0 + 7.0 * t2 * t2 / 360.0)[..., None, :]
    sin_p = jnp.sqrt(jnp.maximum(jnp.sum(a * a, axis=-2) * 0.25, 0.0) + 1e-30)
    theta_p = jnp.pi - jnp.arcsin(jnp.clip(sin_p, 0.0, 1.0))
    diag = jnp.stack([R[..., 0, 0, :], R[..., 1, 1, :], R[..., 2, 2, :]], axis=-2)
    one_m_cos = jnp.where(near_pi, 1.0 - cos_t, 1.0)
    axis_abs = jnp.sqrt(jnp.clip(
        (diag - cos_t[..., None, :]) / one_m_cos[..., None, :], 0.0, None))
    sgn = jnp.where(a >= 0.0, 1.0, -1.0)
    w_pi = theta_p[..., None, :] * axis_abs * sgn
    return jnp.where(near_pi[..., None, :], w_pi,
                     jnp.where(small[..., None, :], w_small, w_generic))


def so3_jacobians(w):
    """Left Jacobian V and V^-1 of SO(3): V = (1 - c t^2) I + b W + c w w^T,
    Vinv = (1 - e t^2) I - W/2 + e w w^T (same coefficients as ops.lie)."""
    theta2 = jnp.sum(w * w, axis=-2)
    small = theta2 < _small2(w.dtype)
    t2s = jnp.where(small, 1.0, theta2)
    ts = jnp.sqrt(t2s)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(ts)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (ts - jnp.sin(ts)) / (t2s * ts))
    denom = 2.0 * ts * jnp.where(small, 1.0, jnp.sin(ts))
    e = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  1.0 / t2s - (1.0 + jnp.cos(ts)) / denom)
    w0, w1, w2 = w[..., 0, :], w[..., 1, :], w[..., 2, :]

    def build(diag_coef, skew_coef, outer_coef):
        return _mat3([
            [diag_coef + outer_coef * w0 * w0,
             -skew_coef * w2 + outer_coef * w0 * w1,
             skew_coef * w1 + outer_coef * w0 * w2],
            [skew_coef * w2 + outer_coef * w0 * w1,
             diag_coef + outer_coef * w1 * w1,
             -skew_coef * w0 + outer_coef * w1 * w2],
            [-skew_coef * w1 + outer_coef * w0 * w2,
             skew_coef * w0 + outer_coef * w1 * w2,
             diag_coef + outer_coef * w2 * w2],
        ])

    V = build(1.0 - c * theta2, b, c)
    Vinv = build(1.0 - e * theta2, -0.5 * jnp.ones_like(b), e)
    return V, Vinv


def exp6(v):
    """se(3) (...,6,N) [lin; ang] -> (R, p)."""
    lin, ang = v[..., :3, :], v[..., 3:, :]
    R = exp3(ang)
    V, _ = so3_jacobians(ang)
    return R, mv(V, lin)


def log6(R, p):
    """SE(3) -> tangent (...,6,N) [lin; ang]."""
    w = log3(R)
    _, Vinv = so3_jacobians(w)
    return jnp.concatenate([mv(Vinv, p), w], axis=-2)


def freeflyer_integrate(pq, v):
    """pq (...,7,N) [p; quat xyzw], v (...,6,N) local tangent -> new pq."""
    p, q = pq[..., :3, :], pq[..., 3:7, :]
    R = quat_to_rotmat(q)
    dR, dp = exp6(v)
    q_new = rotmat_to_quat(mm(R, dR))
    p_new = p + mv(R, dp)
    return jnp.concatenate([p_new, q_new], axis=-2)


def freeflyer_difference(pq1, pq2):
    """log6(M1^-1 M2) (...,6,N)."""
    p1, q1 = pq1[..., :3, :], pq1[..., 3:7, :]
    p2, q2 = pq2[..., :3, :], pq2[..., 3:7, :]
    R1 = quat_to_rotmat(q1)
    R2 = quat_to_rotmat(q2)
    dR = mtm(R1, R2)
    dp = mtv(R1, p2 - p1)
    return log6(dR, dp)


# ---------------------------------------------------------------------------
# Spatial algebra, components on axis -2 ([lin; ang])
# ---------------------------------------------------------------------------


def motion_action_inv(R, p, v):
    """Motion in A coords -> B coords, (R, p) = aMb."""
    lin, ang = v[..., :3, :], v[..., 3:, :]
    ang_b = mtv(R, ang)
    lin_b = mtv(R, lin - cross(p, ang))
    return jnp.concatenate([lin_b, ang_b], axis=-2)


def force_action(R, p, f):
    """Force in B coords -> A coords."""
    lin, ang = f[..., :3, :], f[..., 3:, :]
    lin_a = mv(R, lin)
    ang_a = mv(R, ang) + cross(p, lin_a)
    return jnp.concatenate([lin_a, ang_a], axis=-2)


def motion_cross(v, m):
    vl, va = v[..., :3, :], v[..., 3:, :]
    ml, ma = m[..., :3, :], m[..., 3:, :]
    return jnp.concatenate(
        [cross(va, ml) + cross(vl, ma), cross(va, ma)], axis=-2)


def motion_cross_star(v, f):
    vl, va = v[..., :3, :], v[..., 3:, :]
    fl, fa = f[..., :3, :], f[..., 3:, :]
    return jnp.concatenate(
        [cross(va, fl), cross(va, fa) + cross(vl, fl)], axis=-2)


def solve_spd3(A, b):
    """Unrolled 3x3 Cholesky solve, A (...,3,3,N) SPD, b (...,3,N)."""
    a00 = jnp.sqrt(jnp.maximum(A[..., 0, 0, :], 1e-30))
    l10 = A[..., 1, 0, :] / a00
    l20 = A[..., 2, 0, :] / a00
    a11 = jnp.sqrt(jnp.maximum(A[..., 1, 1, :] - l10 * l10, 1e-30))
    l21 = (A[..., 2, 1, :] - l20 * l10) / a11
    a22 = jnp.sqrt(jnp.maximum(A[..., 2, 2, :] - l20 * l20 - l21 * l21, 1e-30))
    y0 = b[..., 0, :] / a00
    y1 = (b[..., 1, :] - l10 * y0) / a11
    y2 = (b[..., 2, :] - l20 * y0 - l21 * y1) / a22
    x2 = y2 / a22
    x1 = (y1 - l21 * x2) / a11
    x0 = (y0 - l10 * x1 - l20 * x2) / a00
    return jnp.stack([x0, x1, x2], axis=-2)


def solve_spd6(A, b):
    """Unrolled 6x6 Cholesky solve, A (...,6,6,N) SPD, b (...,6,N).

    Every operation is elementwise over the lanes — the batched-tiny-solve
    shape jnp.linalg.solve handles badly on TPU."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[..., i, j, :]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-2)


# ---------------------------------------------------------------------------
# Configuration-space ops (free-flyer root + 1-dof chain layout)
# ---------------------------------------------------------------------------


def _check_layout(model: RobotModel) -> bool:
    """True iff joint 0 is the free-flyer root and 1..nj-1 are 1-dof (the
    layout every supported robot uses; fall back paths assert otherwise)."""
    return (model.joint_types[0] == FREE
            and all(t != FREE for t in model.joint_types[1:]))


def _require_layout(model: RobotModel, where: str) -> None:
    """Hard guard (survives python -O, unlike assert): the SoA kernels
    support exactly free-flyer-root + 1-dof-chain layouts."""
    if not _check_layout(model):
        raise NotImplementedError(
            f"unsupported joint layout for SoA {where}: expected free-flyer "
            "root followed by 1-dof joints")


def integrate(model: RobotModel, q, dq):
    """q (nq,N) (+) dq (nv,N) -> (nq,N)."""
    if model.joint_types and model.joint_types[0] == FREE:
        _require_layout(model, "integrate")
        base = freeflyer_integrate(q[..., :7, :], dq[..., :6, :])
        return jnp.concatenate([base, q[..., 7:, :] + dq[..., 6:, :]], axis=-2)
    if any(t == FREE for t in model.joint_types):
        raise NotImplementedError("unsupported joint layout for SoA integrate")
    return q + dq


def difference(model: RobotModel, q1, q2):
    if model.joint_types and model.joint_types[0] == FREE:
        _require_layout(model, "difference")
        base = freeflyer_difference(q1[..., :7, :], q2[..., :7, :])
        return jnp.concatenate([base, q2[..., 7:, :] - q1[..., 7:, :]], axis=-2)
    if any(t == FREE for t in model.joint_types):
        raise NotImplementedError("unsupported joint layout for SoA difference")
    return q2 - q1


def state_integrate(model: RobotModel, x, dx):
    nq, nv = model.nq, model.nv
    return jnp.concatenate(
        [integrate(model, x[..., :nq, :], dx[..., :nv, :]),
         x[..., nq:, :] + dx[..., nv:, :]], axis=-2)


def state_difference(model: RobotModel, x1, x2):
    nq = model.nq
    return jnp.concatenate(
        [difference(model, x1[..., :nq, :], x2[..., :nq, :]),
         x2[..., nq:, :] - x1[..., nq:, :]], axis=-2)


# ---------------------------------------------------------------------------
# World-frame kernels (ops.world parity, trailing batch)
# ---------------------------------------------------------------------------


def fk_world(model: RobotModel, q):
    """(oR (nj,3,3,N), op (nj,3,N)) — pointer-doubling FK."""
    tab = _world.tables(model)
    dtype = q.dtype
    nj = tab.jR.shape[0]
    N = q.shape[-1]
    jR = jnp.asarray(tab.jR, dtype)[..., None]  # (nj,3,3,1)
    jp = jnp.asarray(tab.jp, dtype)[..., None]  # (nj,3,1)

    blocks_R, blocks_p = [], []
    if tab.free_base:
        _require_layout(model, "fk_world")
        blocks_R.append(quat_to_rotmat(q[3:7, :])[None])
        blocks_p.append(q[0:3, :][None])
    if len(tab.one_dof):
        th = q[jnp.asarray(tab.qidx), :]  # (n1, N)
        ax = jnp.asarray(tab.axes, dtype)[..., None]  # (n1,3,1)
        prs = jnp.asarray(tab.is_prismatic, dtype)[:, None, None]  # (n1,1,1)
        w = ax * (th[:, None, :] * (1.0 - prs))  # (n1,3,N)
        blocks_R.append(exp3(w))
        blocks_p.append(ax * (th[:, None, :] * prs))
    Rl = jnp.concatenate(blocks_R, axis=0)
    pl = jnp.concatenate(blocks_p, axis=0)
    if not tab.free_base and len(tab.one_dof) != nj:
        raise NotImplementedError("unsupported joint layout for SoA FK")

    R = mm(jR, Rl)
    p = jp + mv(jR, jnp.broadcast_to(pl, (nj, 3, N)))

    eR = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[..., None], (1, 3, 3, N))
    ep = jnp.zeros((1, 3, N), dtype)
    for anc in tab.doubling:
        Rpad = jnp.concatenate([R, eR], axis=0)
        ppad = jnp.concatenate([p, ep], axis=0)
        Ra = Rpad[jnp.asarray(anc)]
        pa = ppad[jnp.asarray(anc)]
        R = mm(Ra, R)
        p = pa + mv(Ra, p)
    return R, p


def frame_placements_world(model: RobotModel, oR, op, frame_ids=None):
    tab = _world.tables(model)
    dtype = oR.dtype
    if frame_ids is None:
        fR, fp, par = tab.fR, tab.fp, tab.fparent
    else:
        ids = np.asarray(frame_ids)
        fR, fp, par = tab.fR[ids], tab.fp[ids], tab.fparent[ids]
    fR = jnp.asarray(fR, dtype)[..., None]
    fp = jnp.asarray(fp, dtype)[..., None]
    Rj = oR[jnp.asarray(par)]
    pj = op[jnp.asarray(par)]
    Rw = mm(Rj, fR)
    pw = pj + mv(Rj, jnp.broadcast_to(fp, fp.shape[:-1] + (oR.shape[-1],)))
    return Rw, pw


def world_axes(model: RobotModel, oR, op):
    """Sw (nv, 6, N): world dof axes measured at the origin."""
    tab = _world.tables(model)
    dtype = oR.dtype
    rows = []
    if tab.free_base:
        R0, p0 = oR[0], op[0]  # (3,3,N), (3,N)
        for d in range(3):  # linear base dofs
            lin = R0[..., :, d, :]
            rows.append(jnp.concatenate([lin, jnp.zeros_like(lin)], axis=-2))
        for d in range(3):  # angular base dofs
            col = R0[..., :, d, :]
            rows.append(jnp.concatenate([cross(p0, col), col], axis=-2))
    if len(tab.one_dof):
        jj = jnp.asarray(tab.one_dof)
        ax = jnp.asarray(tab.axes, dtype)[..., None]  # (n1,3,1)
        aw = mv(oR[jj], jnp.broadcast_to(ax, ax.shape[:-1] + (oR.shape[-1],)))
        prs = jnp.asarray(tab.is_prismatic, dtype)[:, None, None]
        lin = (1.0 - prs) * cross(op[jj], aw) + prs * aw
        ang = (1.0 - prs) * aw
        base = jnp.stack(rows, axis=0) if rows else None
        onedof = jnp.concatenate([lin, ang], axis=-2)  # (n1,6,N)
        return (jnp.concatenate([base, onedof], axis=0)
                if base is not None else onedof)
    return jnp.stack(rows, axis=0)


def body_velocities(model: RobotModel, Sw, v):
    """vW (nj, 6, N) = ancestor-masked sum of dof axis motions."""
    tab = _world.tables(model)
    mask = jnp.asarray(tab.mask, v.dtype)
    X = Sw * v[:, None, :]  # (nv, 6, N)
    return jnp.einsum("jd,dkn->jkn", mask, X)


def com_world(model: RobotModel, oR, op):
    tab = _world.tables(model)
    dtype = oR.dtype
    c = jnp.asarray(tab.coms, dtype)[..., None]
    cj = op + mv(oR, jnp.broadcast_to(c, c.shape[:-1] + (oR.shape[-1],)))
    return jnp.einsum("j,jkn->kn", jnp.asarray(tab.masses, dtype),
                      cj) / tab.total_mass


def inertia_apply(model: RobotModel, oR, op, mW):
    """out[j] = X*_{O<-j} (I_loc[j] (X_{j<-O} mW[j])), (nj,6,N)->(nj,6,N)."""
    tab = _world.tables(model)
    vloc = motion_action_inv(oR, op, mW)
    hloc = jnp.einsum("jab,jbn->jan", jnp.asarray(tab.I_loc, mW.dtype), vloc)
    return force_action(oR, op, hloc)


def shift_to_com(h, com):
    """Spatial force at origin -> at CoM: h (...,6,N), com (...,3,N)."""
    lin, ang = h[..., :3, :], h[..., 3:, :]
    return jnp.concatenate([lin, ang - cross(com, lin)], axis=-2)


def agx(model: RobotModel, oR, op, Sw, x, com):
    """Ag(q) @ x about the CoM (6, N) without forming Ag."""
    vW = body_velocities(model, Sw, x)
    hO = inertia_apply(model, oR, op, vW)
    return shift_to_com(jnp.sum(hO, axis=0), com)


def ag6(model: RobotModel, oR, op, Sw, com):
    """Ag[:, :6] as (6 momentum coords, 6 base dofs, N)."""
    tab = _world.tables(model)
    basis = Sw[:6][None]  # (1, 6dof, 6comp, N)
    vloc = motion_action_inv(oR[:, None], op[:, None], basis)
    hloc = jnp.einsum("jab,jdbn->jdan", jnp.asarray(tab.I_loc, oR.dtype), vloc)
    hO = force_action(oR[:, None], op[:, None], hloc)
    cols = jnp.sum(hO, axis=0)  # (6dof, 6comp, N)
    cols = shift_to_com(cols, com[None])
    return jnp.swapaxes(cols, -3, -2)  # (6comp, 6dof, N)


def composite_rot_inertia(model: RobotModel, oR, op, com):
    """I_c (3,3,N): composite rotational inertia about the CoM, world axes.

    Built from the ang-ang block of the origin-frame composite spatial
    inertia (3 pure-angular basis motions through the inertia pipeline)
    plus the parallel-axis term  m (c x)(c x)  back to the CoM."""
    tab = _world.tables(model)
    dtype = oR.dtype
    N = oR.shape[-1]
    nj = oR.shape[0]
    basis = jnp.concatenate(
        [jnp.zeros((3, 3, N), dtype),
         jnp.broadcast_to(jnp.eye(3, dtype=dtype)[..., None], (3, 3, N))],
        axis=-2)[None]  # (1, 3 basis, 6 comp, N): lin = 0, ang = e_k
    vloc = motion_action_inv(oR[:, None], op[:, None],
                             jnp.broadcast_to(basis, (nj, 3, 6, N)))
    hloc = jnp.einsum("jab,jdbn->jdan", jnp.asarray(tab.I_loc, dtype), vloc)
    hO = jnp.sum(force_action(oR[:, None], op[:, None], hloc), axis=0)
    # I_O[i, k] = ang component i of the response to angular basis k
    I_O = jnp.swapaxes(hO[:, 3:, :], -3, -2)  # (3, 3, N)
    m = tab.total_mass
    c0, c1, c2 = com[..., 0, :], com[..., 1, :], com[..., 2, :]
    cc = _mat3([[c0 * c0, c0 * c1, c0 * c2],
                [c1 * c0, c1 * c1, c1 * c2],
                [c2 * c0, c2 * c1, c2 * c2]])
    c2sum = (c0 * c0 + c1 * c1 + c2 * c2)[..., None, None, :]
    # (c x)(c x) = c c^T - |c|^2 I
    return I_O + m * (cc - c2sum * eye3(com))


def centroidal_solve6(model: RobotModel, oR, op, com, b):
    """Solve  Ag[:, :6] x = b  in closed form, b (6, N) -> x (6, N).

    Ag[:, :6] = shift_to_com o I^C_O o X(base), so the inverse is three
    exact steps: un-shift the momentum to the origin, invert the composite
    spatial inertia via its (m, c, I_c) parameters (one 3x3 SPD solve),
    and map the world twist back to base-local coordinates.  Replaces a
    batched 6x6 LU (non-symmetric A6) with lane-parallel closed forms."""
    tab = _world.tables(model)
    m = tab.total_mass
    lin, ang = b[..., :3, :], b[..., 3:, :]
    ang_O = ang + cross(com, lin)  # un-shift: momentum about the origin
    I_c = composite_rot_inertia(model, oR, op, com)
    # h_ang_O = I_c w + c x h_lin  =>  w = I_c^-1 (ang_O - c x lin)
    w = solve_spd3(I_c, ang_O - cross(com, lin))
    # h_lin = m (vl + w x c)  =>  vl = lin/m - w x c
    vl = lin / m - cross(w, com)
    return motion_action_inv(oR[0], op[0],
                             jnp.concatenate([vl, w], axis=-2))


def bias_hdot(model: RobotModel, oR, op, Sw, vW, v, com):
    """Adot @ v about the CoM (6, N) (ops.world.bias_hdot parity)."""
    tab = _world.tables(model)
    hO = inertia_apply(model, oR, op, vW)
    vb = vW[jnp.asarray(tab.dof_joint)]  # (nv, 6, N)
    c = motion_cross(vb, Sw) * v[:, None, :]
    aW = jnp.einsum("jd,dkn->jkn", jnp.asarray(tab.mask, v.dtype), c)
    fb = motion_cross_star(vW, hO) + inertia_apply(model, oR, op, aW)
    return shift_to_com(jnp.sum(fb, axis=0), com)


def frame_velocities_world(model: RobotModel, vW, fRw, fpw, fparent):
    """(v_world_aligned (nf,6,N), v_local (nf,6,N))."""
    vj = vW[jnp.asarray(np.asarray(fparent))]
    lin = vj[..., :3, :] + cross(vj[..., 3:, :], fpw)
    ang = vj[..., 3:, :]
    v_loc = jnp.concatenate([mtv(fRw, lin), mtv(fRw, ang)], axis=-2)
    return jnp.concatenate([lin, ang], axis=-2), v_loc
