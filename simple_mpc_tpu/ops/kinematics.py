"""Forward kinematics, frame placements, Jacobians — pure JAX, vmappable.

Capability parity with the Pinocchio kernels the reference uses
(reference: src/robot-handler.cpp:114-140 — forwardKinematics,
updateFramePlacements, computeJointJacobians).  TPU-first design: the
kinematic topology is static Python data (RobotModel), so every function
unrolls the joint loop at trace time into straight-line XLA ops; batching
comes from `jax.vmap` over leading axes, which turns each tiny per-joint op
into a large batched op that XLA fuses and tiles.

All single-sample signatures: q (nq,), v (nv,).  Motion vectors [lin; ang].
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.model import FREE, PRISMATIC, REVOLUTE, RobotModel
from . import lie


def joint_calc(model: RobotModel, j: int, q):
    """Local joint transform (R, p) and per-dof motion subspace S (6, ndof)
    for joint j at configuration block q."""
    t = model.joint_types[j]
    iq = model.idx_q[j]
    dtype = q.dtype
    if t == FREE:
        R = lie.quat_to_rotmat(q[iq + 3: iq + 7])
        p = q[iq: iq + 3]
        S = jnp.eye(6, dtype=dtype)
    elif t == REVOLUTE:
        axis = jnp.asarray(model.axes[j], dtype=dtype)
        R = lie.exp3(axis * q[iq])
        p = jnp.zeros(3, dtype=dtype)
        S = jnp.concatenate([jnp.zeros(3, dtype=dtype), axis])[:, None]
    elif t == PRISMATIC:
        axis = jnp.asarray(model.axes[j], dtype=dtype)
        R = jnp.eye(3, dtype=dtype)
        p = axis * q[iq]
        S = jnp.concatenate([axis, jnp.zeros(3, dtype=dtype)])[:, None]
    else:
        raise ValueError(f"unknown joint type {t}")
    return R, p, S


def fk(model: RobotModel, q):
    """World placements of all joint frames.

    Returns (oR (nj,3,3), op (nj,3)) — pinocchio::forwardKinematics 1st-order
    equivalent (robot-handler.cpp:119).
    """
    oR, op = [], []
    for j in range(model.njoints):
        Rj, pj, _ = joint_calc(model, j, q)
        # placement of joint j in parent joint frame
        jR = jnp.asarray(model.jR[j], dtype=q.dtype)
        jp = jnp.asarray(model.jp[j], dtype=q.dtype)
        R_l = jR @ Rj
        p_l = jp + jR @ pj
        par = model.parents[j]
        if par < 0:
            oR.append(R_l)
            op.append(p_l)
        else:
            oR.append(oR[par] @ R_l)
            op.append(op[par] + oR[par] @ p_l)
    return jnp.stack(oR), jnp.stack(op)


def fk_velocities(model: RobotModel, q, v):
    """FK + local spatial velocities of each joint frame.

    Returns (oR, op, vloc (nj,6)) with vloc expressed in the joint frame.
    """
    oR, op, vloc = [], [], []
    for j in range(model.njoints):
        Rj, pj, S = joint_calc(model, j, q)
        jR = jnp.asarray(model.jR[j], dtype=q.dtype)
        jp = jnp.asarray(model.jp[j], dtype=q.dtype)
        R_l = jR @ Rj
        p_l = jp + jR @ pj
        iv, nd = model.idx_v[j], S.shape[1]
        vj = S @ v[iv: iv + nd]
        par = model.parents[j]
        if par < 0:
            oR.append(R_l)
            op.append(p_l)
            vloc.append(vj)
        else:
            oR.append(oR[par] @ R_l)
            op.append(op[par] + oR[par] @ p_l)
            # parent velocity expressed in this joint's frame + own joint vel
            vloc.append(lie.motion_action_inv((R_l, p_l), vloc[par]) + vj)
    return jnp.stack(oR), jnp.stack(op), jnp.stack(vloc)


def frame_placements(model: RobotModel, oR, op):
    """World placements of all operational frames (updateFramePlacements)."""
    fR, fp, fpar = model.frames_arrays()
    if len(model.frames) == 0:
        return jnp.zeros((0, 3, 3), dtype=oR.dtype), jnp.zeros((0, 3), dtype=oR.dtype)
    fR = jnp.asarray(fR, dtype=oR.dtype)
    fp = jnp.asarray(fp, dtype=oR.dtype)
    oRf = oR[fpar] @ fR
    opf = op[fpar] + (oR[fpar] @ fp[..., None])[..., 0]
    return oRf, opf


def frame_placement(model: RobotModel, q, frame_id: int):
    """World placement (R, p) of a single frame."""
    oR, op = fk(model, q)
    f = model.frames[frame_id]
    R = oR[f.parent_joint] @ jnp.asarray(f.R, dtype=q.dtype)
    p = op[f.parent_joint] + oR[f.parent_joint] @ jnp.asarray(f.p, dtype=q.dtype)
    return R, p


def _dof_world_axes(model: RobotModel, q):
    """Per-dof spatial motion axes in world coords at each joint origin.

    Returns Sw (nv, 6): column d of a Jacobian before shifting to a frame.
    """
    oR, op = fk(model, q)
    cols = []
    for j in range(model.njoints):
        _, _, S = joint_calc(model, j, q)
        # world transform of joint j applied to each subspace column
        Rj, pj = oR[j], op[j]
        for d in range(S.shape[1]):
            cols.append(lie.motion_action((Rj, pj), S[:, d]))
    return jnp.stack(cols), oR, op


# Static ancestor masks cached per model id
_ancestor_cache: dict = {}


def dof_ancestor_mask(model: RobotModel) -> np.ndarray:
    """(nj, nv) bool: mask[j, d] = dof d is on the path from world to joint j."""
    key = id(model)
    if key not in _ancestor_cache:
        nj, nv = model.njoints, model.nv
        mask = np.zeros((nj, nv), dtype=bool)
        for j in range(nj):
            k = j
            while k >= 0:
                nd = 6 if model.joint_types[k] == FREE else 1
                mask[j, model.idx_v[k]: model.idx_v[k] + nd] = True
                k = model.parents[k]
        _ancestor_cache[key] = mask
    return _ancestor_cache[key]


def frame_jacobian(model: RobotModel, q, frame_id: int, reference_frame: str = "local_world_aligned"):
    """(6, nv) frame Jacobian.

    reference_frame: 'local' | 'local_world_aligned' | 'world'
    (pinocchio::computeJointJacobians + getFrameJacobian capability,
    robot-handler.cpp:131-134).
    """
    Sw, oR, op = _dof_world_axes(model, q)
    f = model.frames[frame_id]
    Rf = oR[f.parent_joint] @ jnp.asarray(f.R, dtype=q.dtype)
    pf = op[f.parent_joint] + oR[f.parent_joint] @ jnp.asarray(f.p, dtype=q.dtype)
    mask = jnp.asarray(dof_ancestor_mask(model)[f.parent_joint], dtype=q.dtype)
    lin, ang = Sw[:, :3], Sw[:, 3:]
    if reference_frame == "world":
        J = Sw
    else:
        # Sw columns are spatial motions measured at the world origin;
        # velocity of the point at p_f is lin + ang x p_f.
        lin_f = lin + jnp.cross(ang, pf[None, :])
        J = jnp.concatenate([lin_f, ang], axis=1)
        if reference_frame == "local":
            Rt = Rf.T
            J = jnp.concatenate([(Rt @ J[:, :3].T).T, (Rt @ J[:, 3:].T).T], axis=1)
        elif reference_frame != "local_world_aligned":
            raise ValueError(reference_frame)
    return (J * mask[:, None]).T


def feet_jacobians(model: RobotModel, q, frame_ids, reference_frame: str = "local"):
    """Stacked (len(frame_ids), 6, nv) frame Jacobians sharing one FK pass.

    The per-foot `frame_jacobian` recomputes FK; this fused version computes
    the dof world axes once — the hot path of constrained dynamics.
    """
    Sw, oR, op = _dof_world_axes(model, q)
    lin, ang = Sw[:, :3], Sw[:, 3:]
    Js = []
    for fid in frame_ids:
        f = model.frames[fid]
        Rf = oR[f.parent_joint] @ jnp.asarray(f.R, dtype=q.dtype)
        pf = op[f.parent_joint] + oR[f.parent_joint] @ jnp.asarray(f.p, dtype=q.dtype)
        mask = jnp.asarray(dof_ancestor_mask(model)[f.parent_joint], dtype=q.dtype)
        lin_f = lin + jnp.cross(ang, pf[None, :])
        J = jnp.concatenate([lin_f, ang], axis=1)
        if reference_frame == "local":
            Rt = Rf.T
            J = jnp.concatenate([(Rt @ J[:, :3].T).T, (Rt @ J[:, 3:].T).T], axis=1)
        elif reference_frame != "local_world_aligned":
            raise ValueError(reference_frame)
        Js.append((J * mask[:, None]).T)
    return jnp.stack(Js)


def feet_velocities(model: RobotModel, q, v, frame_ids, reference_frame: str = "local"):
    """Stacked (len(frame_ids), 6) frame spatial velocities sharing ONE
    velocity-FK pass (the per-frame `frame_velocity` recomputes it)."""
    oR, op, vloc = fk_velocities(model, q, v)
    out = []
    for fid in frame_ids:
        f = model.frames[fid]
        j = f.parent_joint
        vf_local = lie.motion_action_inv(
            (jnp.asarray(f.R, q.dtype), jnp.asarray(f.p, q.dtype)), vloc[j])
        if reference_frame == "local":
            out.append(vf_local)
        elif reference_frame == "local_world_aligned":
            Rf = oR[j] @ jnp.asarray(f.R, dtype=q.dtype)
            out.append(jnp.concatenate([Rf @ vf_local[:3], Rf @ vf_local[3:]]))
        else:
            raise ValueError(reference_frame)
    return jnp.stack(out)


def frame_velocity(model: RobotModel, q, v, frame_id: int, reference_frame: str = "local_world_aligned"):
    """(6,) spatial velocity of a frame."""
    oR, op, vloc = fk_velocities(model, q, v)
    f = model.frames[frame_id]
    # velocity of frame = joint velocity transported through fixed placement
    vf_local = lie.motion_action_inv((jnp.asarray(f.R, q.dtype), jnp.asarray(f.p, q.dtype)),
                                     vloc[f.parent_joint])
    if reference_frame == "local":
        return vf_local
    Rf = oR[f.parent_joint] @ jnp.asarray(f.R, dtype=q.dtype)
    lin = Rf @ vf_local[:3]
    ang = Rf @ vf_local[3:]
    if reference_frame == "local_world_aligned":
        return jnp.concatenate([lin, ang])
    if reference_frame != "world":
        raise ValueError(reference_frame)
    # spatial velocity measured at the world origin: v_O = v_pf + pf x w
    pf = op[f.parent_joint] + oR[f.parent_joint] @ jnp.asarray(f.p, dtype=q.dtype)
    return jnp.concatenate([lin + jnp.cross(pf, ang), ang])
