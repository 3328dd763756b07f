"""Structure-flattened world-frame rigid-body kernels — the solver hot path.

Same capabilities as `ops.kinematics` / `ops.dynamics` (Pinocchio FK /
centroidal algebra parity, reference src/robot-handler.cpp:114-140 and the
KinodynamicsFwdDynamics consumption in src/kinodynamics.cpp:85-89), but
re-shaped for the TPU execution model:

  * the per-joint Python loops of `ops.kinematics.fk` et al. unroll into
    ~1000 scalar-sized XLA ops; under the solver's 60-wide forward-mode
    linearization that graph dominates the whole MPC tick (round-1 profile:
    1.9 s of a 1.75 s/iteration budget at B=128).  Here every quantity is
    computed with JOINTS AND DOFS AS ARRAY AXES: batched Rodrigues over all
    revolute joints at once, log-depth pointer-doubling FK composition, and
    masked einsums with static (nj, nv) ancestor tables.
  * world-frame spatial algebra: dof axes Sw (nv, 6) measured at the world
    origin make body velocities, centroidal momentum, frame Jacobians and
    the momentum bias ALL flat contractions — no serial tree sweeps.
  * everything that involves a spatial inertia is written as a VECTOR
    pipeline  X*_{O<-j} (I_loc (X_{j<-O} m))  over (nj, 6) tensors; 6x6
    world-frame operators are never materialized, so a jax.linearize tangent
    of the bundle stays (ntang, nj, 6)-sized — this is what makes plain
    forward-mode differentiation of the stage affordable on TPU (HBM-bound,
    not launch-bound).

Conventions match ops.lie: motion/force vectors ordered [lin; ang],
quaternions xyzw, free-flyer tangents local.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..models.model import FREE, PRISMATIC, REVOLUTE, RobotModel
from . import lie


class WorldTables(NamedTuple):
    """Static (numpy) topology tables derived once per RobotModel."""

    free_base: bool
    one_dof: np.ndarray  # (n1,) joint indices of the 1-dof joints, in order
    axes: np.ndarray  # (n1, 3) local joint axes
    is_prismatic: np.ndarray  # (n1,) float flags
    qidx: np.ndarray  # (n1,) position of each 1-dof joint's angle in q
    jR: np.ndarray  # (nj, 3, 3) fixed placement in parent joint frame
    jp: np.ndarray  # (nj, 3)
    doubling: tuple  # tuple of (nj,) int arrays: ancestor pointers, world->nj
    mask: np.ndarray  # (nj, nv) dof-ancestor mask (includes own dofs)
    dof_joint: np.ndarray  # (nv,) joint carrying each dof
    masses: np.ndarray  # (nj,)
    coms: np.ndarray  # (nj, 3) body CoM in joint frame
    I_loc: np.ndarray  # (nj, 6, 6) constant local spatial inertias
    fR: np.ndarray  # (nf, 3, 3) frame placements in parent joint frame
    fp: np.ndarray  # (nf, 3)
    fparent: np.ndarray  # (nf,)
    total_mass: float


_tables_cache: dict = {}


def _spatial_inertia_np(m, c, I):
    C = np.array([[0, -c[2], c[1]], [c[2], 0, -c[0]], [-c[1], c[0], 0.0]])
    E = np.eye(3)
    top = np.concatenate([m * E, -m * C], axis=1)
    bot = np.concatenate([m * C, I - m * (C @ C)], axis=1)
    return np.concatenate([top, bot], axis=0)


def tables(model: RobotModel) -> WorldTables:
    key = id(model)
    # frames can be registered dynamically (robot-handler.cpp:39-41) —
    # rebuild when the frame count changes
    cached = _tables_cache.get(key)
    if cached is not None and cached.fparent.shape[0] == len(model.frames):
        return cached
    nj, nv = model.njoints, model.nv
    free_base = model.joint_types[0] == FREE
    for t in model.joint_types[1:]:
        if t == FREE:
            raise NotImplementedError("only a single free-flyer root joint is supported")
    one_dof = np.array(
        [j for j, t in enumerate(model.joint_types) if t != FREE], dtype=np.int32)
    axes = (np.asarray(model.axes)[one_dof]
            if len(one_dof) else np.zeros((0, 3)))
    is_prismatic = np.array(
        [1.0 if model.joint_types[j] == PRISMATIC else 0.0 for j in one_dof])
    qidx = np.array([model.idx_q[j] for j in one_dof], dtype=np.int32)

    # pointer-doubling ancestor tables; index nj = world/identity pad
    anc = np.array([p if p >= 0 else nj for p in model.parents] + [nj],
                   dtype=np.int32)
    doubling = []
    cur = anc
    while np.any(cur[:nj] != nj):
        doubling.append(cur[:nj].copy())
        cur = cur[cur]

    from .kinematics import dof_ancestor_mask

    mask = dof_ancestor_mask(model).astype(np.float64)
    dof_joint = np.zeros(nv, dtype=np.int32)
    for j in range(nj):
        nd = 6 if model.joint_types[j] == FREE else 1
        dof_joint[model.idx_v[j]: model.idx_v[j] + nd] = j

    I_loc = np.stack([
        _spatial_inertia_np(float(model.mass[j]), np.asarray(model.com[j]),
                            np.asarray(model.inertia[j]))
        for j in range(nj)])
    fR, fp, fparent = model.frames_arrays()
    tab = WorldTables(
        free_base=free_base, one_dof=one_dof, axes=axes,
        is_prismatic=is_prismatic, qidx=qidx,
        jR=np.asarray(model.jR), jp=np.asarray(model.jp),
        doubling=tuple(doubling), mask=mask, dof_joint=dof_joint,
        masses=np.asarray(model.mass), coms=np.asarray(model.com),
        I_loc=I_loc, fR=np.asarray(fR), fp=np.asarray(fp),
        fparent=np.asarray(fparent, dtype=np.int32),
        total_mass=model.total_mass(),
    )
    _tables_cache[key] = tab
    return tab


# ---------------------------------------------------------------------------
# FK: batched local transforms + pointer-doubling composition
# ---------------------------------------------------------------------------

def fk_world(model: RobotModel, q):
    """World joint placements (oR (nj,3,3), op (nj,3)).

    pinocchio::forwardKinematics capability (robot-handler.cpp:119), log-depth:
    all local joint transforms in one batched Rodrigues, then
    ceil(log2(depth)) gather+compose steps.
    """
    tab = tables(model)
    dtype = q.dtype
    nj = tab.jR.shape[0]
    jR = jnp.asarray(tab.jR, dtype)
    jp = jnp.asarray(tab.jp, dtype)

    # local joint motion (R_j, p_j) for every joint at once
    Rl = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (nj, 3, 3))
    pl = jnp.zeros((nj, 3), dtype)
    if len(tab.one_dof):
        th = q[jnp.asarray(tab.qidx)]  # (n1,)
        ax = jnp.asarray(tab.axes, dtype)
        prs = jnp.asarray(tab.is_prismatic, dtype)[:, None]
        Rrev = lie.exp3(ax * (th[:, None] * (1.0 - prs)))  # eye for prismatic
        prev = ax * (th[:, None] * prs)  # zero for revolute
        Rl = Rl.at[jnp.asarray(tab.one_dof)].set(Rrev)
        pl = pl.at[jnp.asarray(tab.one_dof)].set(prev)
    if tab.free_base:
        Rl = Rl.at[0].set(lie.quat_to_rotmat(q[3:7]))
        pl = pl.at[0].set(q[:3])

    # compose with the fixed placement: T_parent<-j = (jR, jp) * (Rl, pl)
    R = jR @ Rl
    p = jp + (jR @ pl[..., None])[..., 0]

    # pointer doubling: T_j <- T_anc[j] o T_j until anc == world
    eyeR = jnp.eye(3, dtype=dtype)[None]
    zp = jnp.zeros((1, 3), dtype)
    for anc in tab.doubling:
        Rpad = jnp.concatenate([R, eyeR], axis=0)
        ppad = jnp.concatenate([p, zp], axis=0)
        Ra = Rpad[jnp.asarray(anc)]
        pa = ppad[jnp.asarray(anc)]
        R = Ra @ R
        p = pa + (Ra @ p[..., None])[..., 0]
    return R, p


def frame_placements_world(model: RobotModel, oR, op, frame_ids=None):
    """World placements of operational frames (updateFramePlacements)."""
    tab = tables(model)
    dtype = oR.dtype
    if frame_ids is None:
        fR = jnp.asarray(tab.fR, dtype)
        fp = jnp.asarray(tab.fp, dtype)
        par = jnp.asarray(tab.fparent)
    else:
        ids = np.asarray(frame_ids)
        fR = jnp.asarray(tab.fR[ids], dtype)
        fp = jnp.asarray(tab.fp[ids], dtype)
        par = jnp.asarray(tab.fparent[ids])
    Rw = oR[par] @ fR
    pw = op[par] + (oR[par] @ fp[..., None])[..., 0]
    return Rw, pw


# ---------------------------------------------------------------------------
# World dof axes and flat velocity/centroidal algebra
# ---------------------------------------------------------------------------

def world_axes(model: RobotModel, q, oR, op):
    """Sw (nv, 6): world spatial motion axis of each dof, measured at the
    world origin ([lin; ang]).  Column d of any frame Jacobian is a masked
    point-shift of Sw[d] (computeJointJacobians capability)."""
    tab = tables(model)
    dtype = q.dtype
    rows = []
    if tab.free_base:
        R0, p0 = oR[0], op[0]
        # motion transform X((R0, p0)) columns: [R 0; 0 R] + lever arm
        lin_t = jnp.concatenate([R0, lie.skew(p0) @ R0], axis=1)  # (3, 6)
        ang_t = jnp.concatenate([jnp.zeros((3, 3), dtype), R0], axis=1)
        rows.append(jnp.concatenate([lin_t, ang_t], axis=0).T)  # (6, 6)
    if len(tab.one_dof):
        jj = jnp.asarray(tab.one_dof)
        aw = (oR[jj] @ jnp.asarray(tab.axes, dtype)[..., None])[..., 0]  # (n1,3)
        prs = jnp.asarray(tab.is_prismatic, dtype)[:, None]
        lin = (1.0 - prs) * jnp.cross(op[jj], aw) + prs * aw
        ang = (1.0 - prs) * aw
        rows.append(jnp.concatenate([lin, ang], axis=1))  # (n1, 6)
    return jnp.concatenate(rows, axis=0)


def body_velocities(model: RobotModel, Sw, v):
    """vW (nj, 6): world spatial velocity (at origin) of every body —
    vW[j] = sum_{d in anc(j)} Sw[d] v[d], one masked matmul."""
    tab = tables(model)
    mask = jnp.asarray(tab.mask, v.dtype)
    return (mask * v) @ Sw


def com_world(model: RobotModel, oR, op):
    tab = tables(model)
    dtype = oR.dtype
    cj = op + (oR @ jnp.asarray(tab.coms, dtype)[..., None])[..., 0]
    return jnp.asarray(tab.masses, dtype) @ cj / tab.total_mass


def _inertia_apply(model: RobotModel, oR, op, mW):
    """Per-joint world-frame inertia application as a vector pipeline:
    out[j] = X*_{O<-j} (I_loc[j] (X_{j<-O} mW[j])), mW (nj, 6) -> (nj, 6).
    Never materializes 6x6 world operators (tangent-friendly)."""
    tab = tables(model)
    vloc = lie.motion_action_inv((oR, op), mW)
    hloc = (jnp.asarray(tab.I_loc, mW.dtype) @ vloc[..., None])[..., 0]
    return lie.force_action((oR, op), hloc)


def shift_to_com(h, com):
    """Spatial force measured at origin -> measured at the CoM."""
    lin, ang = h[..., :3], h[..., 3:]
    return jnp.concatenate([lin, ang - jnp.cross(com, lin)], axis=-1)


def Agx(model: RobotModel, oR, op, Sw, x, com):
    """Centroidal map applied to a generalized-velocity-like vector:
    Ag(q) @ x about the CoM, without forming Ag (pinocchio::ccrba
    capability applied to a vector)."""
    vW = body_velocities(model, Sw, x.astype(Sw.dtype))
    hO = _inertia_apply(model, oR, op, vW)
    return shift_to_com(jnp.sum(hO, axis=0), com)


def ag6(model: RobotModel, oR, op, Sw, com):
    """Ag[:, :6] (6, 6): centroidal map restricted to the base dofs.

    Every joint descends from the base, so column d is the total world
    inertia applied to Sw[d] — a 6-wide batch of the vector pipeline."""
    nj = oR.shape[0]
    basis = jnp.broadcast_to(Sw[:6][None], (nj, 6, 6))  # (nj, col, 6)
    vloc = lie.motion_action_inv((oR[:, None], op[:, None]), basis)
    tab = tables(model)
    hloc = (jnp.asarray(tab.I_loc, oR.dtype)[:, None] @ vloc[..., None])[..., 0]
    hO = lie.force_action((oR[:, None], op[:, None]), hloc)
    cols = jnp.sum(hO, axis=0)  # (col, 6)
    return shift_to_com(cols, com).T  # (6, 6): rows = momentum coords


def centroidal_momentum_world(model: RobotModel, oR, op, Sw, v, com):
    """h_g = Ag v about the CoM (computeCentroidalMomentum parity)."""
    return Agx(model, oR, op, Sw, v, com)


def bias_hdot(model: RobotModel, oR, op, Sw, vW, v, com):
    """Adot @ v: centroidal momentum rate at zero generalized acceleration,
    about the CoM (pinocchio::dccrba @ v capability).

    hdot_O|_{qdd=0} = sum_j [ vW_j x* (I_j vW_j) + I_j aW_j ] with the bias
    body accelerations aW_j = sum_{d in anc(j)} (vW_{b(d)} x Sw_d) v_d (the
    world-frame rate of the moving dof axes).  Shifting to the moving CoM
    adds -vcom x h_lin = -vcom x (m vcom) = 0, so the origin->CoM shift is
    exact for the bias too."""
    tab = tables(model)
    dtype = Sw.dtype
    hO = _inertia_apply(model, oR, op, vW)  # (nj, 6) per-body momenta
    # per-dof axis-rate contributions c_d = (vW_{b(d)} x Sw_d) v_d
    vb = vW[jnp.asarray(tab.dof_joint)]  # (nv, 6)
    c = lie.motion_cross(vb, Sw) * v[:, None]
    mask = jnp.asarray(tab.mask, dtype)
    aW = mask @ c  # (nj, 6)
    fb = lie.motion_cross_star(vW, hO) + _inertia_apply(model, oR, op, aW)
    return shift_to_com(jnp.sum(fb, axis=0), com)


def frame_velocities_world(model: RobotModel, vW, fRw, fpw, fparent):
    """Spatial velocities of frames, world-aligned at the frame point and
    LOCAL, from the flat body velocities: (v_wa (nf,6), v_loc (nf,6))."""
    vj = vW[fparent]
    lin = vj[..., :3] + jnp.cross(vj[..., 3:], fpw)
    ang = vj[..., 3:]
    Rt = jnp.swapaxes(fRw, -1, -2)
    v_loc = jnp.concatenate(
        [(Rt @ lin[..., None])[..., 0], (Rt @ ang[..., None])[..., 0]], axis=-1)
    return jnp.concatenate([lin, ang], axis=-1), v_loc


def frame_translation_jacobians(model: RobotModel, Sw, fpw, fparent):
    """(nf, 3, nv) world-aligned translation Jacobians of frame points from
    the flat dof axes: column d = Sw_lin[d] + Sw_ang[d] x p_f, masked by
    ancestry (getFrameJacobian LOCAL_WORLD_ALIGNED capability, linear rows)."""
    tab = tables(model)
    mask = jnp.asarray(tab.mask, Sw.dtype)[np.asarray(fparent)]  # (nf, nv)
    lin = Sw[None, :, :3] + jnp.cross(Sw[None, :, 3:], fpw[:, None, :])
    return (lin * mask[..., None]).swapaxes(1, 2)
