"""Rigid-body dynamics kernels: RNEA, CRBA, ABA, centroidal momentum,
constrained forward dynamics — pure JAX, unrolled over static topology.

Capability parity with the Pinocchio algorithms the reference consumes
(reference: src/robot-handler.cpp:119-140 crba/nonLinearEffects/
computeCentroidalMomentum/dccrba; fulldynamics.cpp:139-140 constrained
forward dynamics with Baumgarte correction).  Derivatives come from JAX
autodiff — no hand-written derivative algorithms needed.

Design notes (TPU-first):
  * per-sample functions on (nq,)/(nv,) vectors; batch with vmap — XLA turns
    the unrolled per-joint ops into (B, ...) fused kernels.
  * matrices are tiny (nv<=24 here); batched Cholesky solves are the
    intended execution model, not per-sample MXU tiling.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import FREE, RobotModel
from . import lie
from .kinematics import frame_jacobian, joint_calc


def spatial_inertia(model: RobotModel, j: int, dtype):
    """6x6 spatial inertia of body j in its joint frame, [lin; ang] order:
    [[m E, -m C], [m C, I_com - m C C]] with C = skew(com)."""
    m = float(model.mass[j])
    c = jnp.asarray(model.com[j], dtype=dtype)
    I = jnp.asarray(model.inertia[j], dtype=dtype)
    C = lie.skew(c)
    E = jnp.eye(3, dtype=dtype)
    top = jnp.concatenate([m * E, -m * C], axis=1)
    bot = jnp.concatenate([m * C, I - m * (C @ C)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _local_tree(model: RobotModel, q):
    """Per-joint local placements (liMi) and motion subspaces."""
    Rs, ps, Ss = [], [], []
    for j in range(model.njoints):
        Rj, pj, S = joint_calc(model, j, q)
        jR = jnp.asarray(model.jR[j], dtype=q.dtype)
        jp = jnp.asarray(model.jp[j], dtype=q.dtype)
        Rs.append(jR @ Rj)
        ps.append(jp + jR @ pj)
        Ss.append(S)
    return Rs, ps, Ss


def rnea(model: RobotModel, q, v, a, f_ext: Optional[dict] = None):
    """Inverse dynamics tau(q, v, a) including gravity.

    f_ext: optional {joint_index: (6,) local spatial force} applied to bodies.
    pinocchio::rnea / nonLinearEffects(a=0) equivalent.
    """
    nj = model.njoints
    Rs, ps, Ss = _local_tree(model, q)
    g = jnp.asarray(-model.gravity, dtype=q.dtype)  # base "acceleration" trick
    a0 = jnp.concatenate([g, jnp.zeros(3, dtype=q.dtype)])
    vloc, aloc, floc = [None] * nj, [None] * nj, [None] * nj
    for j in range(nj):
        iv = model.idx_v[j]
        nd = Ss[j].shape[1]
        vj = Ss[j] @ v[iv: iv + nd]
        aj = Ss[j] @ a[iv: iv + nd]
        par = model.parents[j]
        if par < 0:
            vloc[j] = vj
            aloc[j] = lie.motion_action_inv((Rs[j], ps[j]), a0) + aj
        else:
            X = (Rs[j], ps[j])
            vloc[j] = lie.motion_action_inv(X, vloc[par]) + vj
            aloc[j] = (
                lie.motion_action_inv(X, aloc[par]) + aj + lie.motion_cross(vloc[j], vj)
            )
        I = spatial_inertia(model, j, q.dtype)
        fj = I @ aloc[j] + lie.motion_cross_star(vloc[j], I @ vloc[j])
        if f_ext is not None and j in f_ext:
            fj = fj - f_ext[j]
        floc[j] = fj
    tau = jnp.zeros(model.nv, dtype=q.dtype)
    for j in reversed(range(nj)):
        iv = model.idx_v[j]
        nd = Ss[j].shape[1]
        tau = tau.at[iv: iv + nd].set(Ss[j].T @ floc[j])
        par = model.parents[j]
        if par >= 0:
            floc[par] = floc[par] + lie.force_action((Rs[j], ps[j]), floc[j])
    return tau


def nle(model: RobotModel, q, v):
    """Nonlinear effects b(q, v) = rnea(q, v, 0) (robot-handler.cpp:137)."""
    return rnea(model, q, v, jnp.zeros(model.nv, dtype=q.dtype))


def crba(model: RobotModel, q):
    """Joint-space mass matrix M(q) (nv, nv), symmetric (crba + symmetrize,
    robot-handler.cpp:135-136 make_symmetric equivalent is inherent here)."""
    nj, nv = model.njoints, model.nv
    Rs, ps, Ss = _local_tree(model, q)
    Ic = [spatial_inertia(model, j, q.dtype) for j in range(nj)]
    M = jnp.zeros((nv, nv), dtype=q.dtype)
    for j in reversed(range(nj)):
        par = model.parents[j]
        if par >= 0:
            # composite inertia to parent coords: Xm maps parent->child
            # motion, so I_parent = Xm^T I_child Xm (Xm^T is the child->
            # parent force transform).
            Xm = _motion_matrix(Rs[j], ps[j])
            Ic[par] = Ic[par] + Xm.T @ Ic[j] @ Xm
        iv, nd = model.idx_v[j], Ss[j].shape[1]
        F = Ic[j] @ Ss[j]  # (6, nd)
        M = M.at[iv: iv + nd, iv: iv + nd].set(Ss[j].T @ F)
        # walk up ancestors
        k = j
        Fk = F
        while model.parents[k] >= 0:
            # transport F into parent coordinates (force transform)
            Fk = _force_matrix(Rs[k], ps[k]) @ Fk
            k = model.parents[k]
            ivk, ndk = model.idx_v[k], Ss[k].shape[1]
            blk = Fk.T @ Ss[k]  # (nd, ndk)
            M = M.at[iv: iv + nd, ivk: ivk + ndk].set(blk)
            M = M.at[ivk: ivk + ndk, iv: iv + nd].set(blk.T)
    return M


def _motion_matrix(R, p):
    """6x6 matrix of motion_action_inv((R,p), .): parent frame -> child frame."""
    Rt = R.T
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([Rt, -Rt @ lie.skew(p)], axis=1)
    bot = jnp.concatenate([Z, Rt], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _force_matrix(R, p):
    """6x6 matrix of force_action((R,p), .): child frame -> parent frame."""
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=1)
    bot = jnp.concatenate([lie.skew(p) @ R, R], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def aba(model: RobotModel, q, v, tau, f_ext: Optional[dict] = None):
    """Articulated-body forward dynamics ddq(q, v, tau) — independent O(n)
    algorithm used to cross-validate crba/rnea (and vice versa)."""
    nj = model.njoints
    Rs, ps, Ss = _local_tree(model, q)
    g = jnp.asarray(-model.gravity, dtype=q.dtype)
    a0 = jnp.concatenate([g, jnp.zeros(3, dtype=q.dtype)])
    vloc, c_bias = [None] * nj, [None] * nj
    IA = [spatial_inertia(model, j, q.dtype) for j in range(nj)]
    pA = [None] * nj
    for j in range(nj):
        iv, nd = model.idx_v[j], Ss[j].shape[1]
        vj = Ss[j] @ v[iv: iv + nd]
        par = model.parents[j]
        if par < 0:
            vloc[j] = vj
            c_bias[j] = jnp.zeros(6, dtype=q.dtype)
        else:
            X = (Rs[j], ps[j])
            vloc[j] = lie.motion_action_inv(X, vloc[par]) + vj
            c_bias[j] = lie.motion_cross(vloc[j], vj)
        pA[j] = lie.motion_cross_star(vloc[j], IA[j] @ vloc[j])
        if f_ext is not None and j in f_ext:
            pA[j] = pA[j] - f_ext[j]
    U, D_inv, u_ = [None] * nj, [None] * nj, [None] * nj
    for j in reversed(range(nj)):
        iv, nd = model.idx_v[j], Ss[j].shape[1]
        U[j] = IA[j] @ Ss[j]  # (6, nd)
        D = Ss[j].T @ U[j]
        D_inv[j] = jnp.linalg.inv(D)
        u_[j] = tau[iv: iv + nd] - Ss[j].T @ pA[j]
        par = model.parents[j]
        if par >= 0:
            Ia = IA[j] - U[j] @ D_inv[j] @ U[j].T
            pa = pA[j] + Ia @ c_bias[j] + U[j] @ (D_inv[j] @ u_[j])
            Xm = _motion_matrix(Rs[j], ps[j])
            IA[par] = IA[par] + Xm.T @ Ia @ Xm
            pA[par] = pA[par] + lie.force_action((Rs[j], ps[j]), pa)
    a_out = jnp.zeros(model.nv, dtype=q.dtype)
    aloc = [None] * nj
    for j in range(nj):
        iv, nd = model.idx_v[j], Ss[j].shape[1]
        par = model.parents[j]
        if par < 0:
            a_par = lie.motion_action_inv((Rs[j], ps[j]), a0)
        else:
            a_par = lie.motion_action_inv((Rs[j], ps[j]), aloc[par])
        a_par = a_par + c_bias[j]
        qdd = D_inv[j] @ (u_[j] - U[j].T @ a_par)
        aloc[j] = a_par + Ss[j] @ qdd
        a_out = a_out.at[iv: iv + nd].set(qdd)
    return a_out


# ---------------------------------------------------------------------------
# Centroidal quantities
# ---------------------------------------------------------------------------

def center_of_mass(model: RobotModel, q):
    """World CoM position (3,)."""
    from .kinematics import fk

    oR, op = fk(model, q)
    num = jnp.zeros(3, dtype=q.dtype)
    for j in range(model.njoints):
        cj = op[j] + oR[j] @ jnp.asarray(model.com[j], dtype=q.dtype)
        num = num + float(model.mass[j]) * cj
    return num / model.total_mass()


def centroidal_momentum(model: RobotModel, q, v):
    """h_g = [linear; angular] momentum about the CoM (6,)
    (pinocchio::computeCentroidalMomentum, robot-handler.cpp:123)."""
    from .kinematics import fk_velocities

    oR, op, vloc = fk_velocities(model, q, v)
    h_O = jnp.zeros(6, dtype=q.dtype)
    num = jnp.zeros(3, dtype=q.dtype)
    for j in range(model.njoints):
        I = spatial_inertia(model, j, q.dtype)
        h_local = I @ vloc[j]
        h_O = h_O + lie.force_action((oR[j], op[j]), h_local)
        num = num + float(model.mass[j]) * (op[j] + oR[j] @ jnp.asarray(model.com[j], dtype=q.dtype))
    com = num / model.total_mass()
    # shift force-vector from world origin to com: torque -= com x force
    lin, ang = h_O[:3], h_O[3:]
    return jnp.concatenate([lin, ang - jnp.cross(com, lin)])


def centroidal_momentum_matrix(model: RobotModel, q):
    """Ag (6, nv) with h_g = Ag @ v  (pinocchio::ccrba equivalent)."""
    return jax.jacfwd(lambda vv: centroidal_momentum(model, q, vv))(
        jnp.zeros(model.nv, dtype=q.dtype)
    )


def centroidal_momentum_time_variation(model: RobotModel, q, v):
    """dAg/dt @ v term (pinocchio::dccrba @ v): time derivative of h_g minus
    Ag @ a contribution, computed by autodiff along the configuration flow."""
    from .state import integrate

    def h_of_t(t):
        return centroidal_momentum(model, integrate(model, q, t * v), v)

    return jax.jacfwd(h_of_t)(jnp.zeros((), dtype=q.dtype))


def centroidal_quantities(model: RobotModel, q, v):
    """Fused analytic centroidal bundle from ONE tree sweep.

    Returns (oR, op, vloc, com, hg, Ag, Adotv):
      oR/op   world joint placements        (nj,3,3) / (nj,3)
      vloc    local joint spatial velocities (nj,6)
      com     world CoM                      (3,)
      hg      centroidal momentum            (6,) == Ag @ v
      Ag      centroidal momentum matrix     (6,nv)   [ccrba]
      Adotv   dAg/dt @ v                     (6,)     [dccrba @ v]

    This replaces the autodiff implementations (`centroidal_momentum_matrix`
    = jacfwd over v, `centroidal_momentum_time_variation` = jvp along the
    configuration flow) on the solver hot path: those nest an 18-wide JVP of
    a full FK pass inside the stage linearization's 60-wide JVP.  Here Ag is
    the world-frame composite-rigid-body algorithm (pinocchio::ccrba
    capability) and Adotv is the velocity-product momentum bias (an RNEA
    force pass with zero acceleration and zero gravity), so the whole bundle
    is straight-line 6x6/6x1 arithmetic that batches onto the MXU.

    Derivation of Adotv: h_O = sum_j X*_{O<-j} I_j v_j, so at ddq = 0 (no
    gravity) dh_O/dt = sum_j X*_{O<-j} (v_j x* I_j v_j + I_j a_j^bias) with
    a_j^bias the zero-ddq local acceleration; shifting to the (moving) CoM
    frame adds -com x lin_dot, while the frame-motion term vcom x (m vcom)
    vanishes.
    """
    nj, nv = model.njoints, model.nv
    dtype = q.dtype
    Rs, ps, Ss = _local_tree(model, q)
    oR, op, vloc, aloc = [None] * nj, [None] * nj, [None] * nj, [None] * nj
    for j in range(nj):
        iv, nd = model.idx_v[j], Ss[j].shape[1]
        vj = Ss[j] @ v[iv: iv + nd]
        par = model.parents[j]
        if par < 0:
            oR[j], op[j] = Rs[j], ps[j]
            vloc[j] = vj
            aloc[j] = jnp.zeros(6, dtype=dtype)
        else:
            oR[j] = oR[par] @ Rs[j]
            op[j] = op[par] + oR[par] @ ps[j]
            X = (Rs[j], ps[j])
            vloc[j] = lie.motion_action_inv(X, vloc[par]) + vj
            # zero-ddq local acceleration (velocity-product bias only)
            aloc[j] = (lie.motion_action_inv(X, aloc[par])
                       + lie.motion_cross(vloc[j], vj))

    com_num = jnp.zeros(3, dtype=dtype)
    for j in range(nj):
        com_num = com_num + float(model.mass[j]) * (
            op[j] + oR[j] @ jnp.asarray(model.com[j], dtype=dtype))
    com = com_num / model.total_mass()

    # accumulate everything in a CoM-centered world-aligned frame: forming
    # spatial inertias about the world origin cancels like m*|p_world|^2
    # (f32-hostile, grows with base distance from origin); about the CoM the
    # lever arms are bounded by robot size
    hg = jnp.zeros(6, dtype=dtype)
    hd = jnp.zeros(6, dtype=dtype)
    Icg = [None] * nj  # CoM-frame composite inertias
    Sg = [None] * nj  # CoM-frame motion subspaces (6, nd)
    for j in range(nj):
        I = spatial_inertia(model, j, dtype)
        pg = op[j] - com
        Xf = _force_matrix(oR[j], pg)  # j -> com-frame force transform
        Xm = _motion_matrix(oR[j], pg)  # com-frame -> j motion transform
        Icg[j] = Xf @ I @ Xm
        Sg[j] = jax.vmap(lambda s: lie.motion_action((oR[j], pg), s),
                         in_axes=1, out_axes=1)(Ss[j])
        hj = I @ vloc[j]
        hg = hg + Xf @ hj
        hd = hd + Xf @ (lie.motion_cross_star(vloc[j], hj) + I @ aloc[j])

    # CoM-frame CCRBA: composite subtree inertias, then Ag columns
    Ag = jnp.zeros((6, nv), dtype=dtype)
    for j in reversed(range(nj)):
        par = model.parents[j]
        if par >= 0:
            Icg[par] = Icg[par] + Icg[j]
        iv, nd = model.idx_v[j], Ss[j].shape[1]
        Ag = Ag.at[:, iv: iv + nd].set(Icg[j] @ Sg[j])
    return jnp.stack(oR), jnp.stack(op), jnp.stack(vloc), com, hg, Ag, hd


def centroidal_state(model: RobotModel, q, v):
    """9-dim [com; h_lin; h_ang] (RobotDataHandler::getCentroidalState,
    robot-handler.cpp:142-149)."""
    h = centroidal_momentum(model, q, v)
    return jnp.concatenate([center_of_mass(model, q), h])


# ---------------------------------------------------------------------------
# Forward dynamics (free and constrained)
# ---------------------------------------------------------------------------

def _baumgarte_rows(gain, dim: int, n_contacts: int, dtype):
    """Static (n_contacts * dim,) per-row gain vector from a scalar or a
    per-dimension (dim,) Baumgarte gain (fulldynamics.cpp:58-74: the same
    vector corrector gain is installed on every contact model)."""
    arr = np.asarray(gain, dtype=np.float64).reshape(-1)
    if arr.size == 1:
        arr = np.full(dim, arr[0])
    if arr.size != dim:
        raise ValueError(
            f"Baumgarte gain must be scalar or ({dim},); got shape {arr.shape}")
    return jnp.asarray(np.tile(arr, n_contacts), dtype)


def forward_dynamics(model: RobotModel, q, v, tau):
    """Unconstrained ddq via Cholesky of CRBA (used in the solver hot path;
    M is reused by the contact KKT)."""
    M = crba(model, q)
    b = nle(model, q, v)
    L = jnp.linalg.cholesky(M)
    return jax.scipy.linalg.cho_solve((L, True), tau - b)


def constrained_fwd_dynamics(
    model: RobotModel,
    q,
    v,
    tau,
    contact_frame_ids: Sequence[int],
    contact_active,  # (nc,) float/bool mask
    contact_dim: int = 3,  # 3 = point (LOCAL), 6 = quad (LOCAL_WORLD_ALIGNED)
    contact_ref_R=None,  # (nc,3,3) anchor orientations (6D only)
    contact_ref_p=None,  # (nc,3)  anchor positions for Baumgarte correction
    kp=0.0,  # Baumgarte gains: scalar or per-dimension (contact_dim,)
    kd=0.0,  # vector, applied identically to every contact (the reference
    #          builds each RigidConstraintModel with the same VECTOR
    #          corrector gains, fulldynamics.cpp:58-74)
    prox_mu: float = 1e-9,
):
    """Constrained articulated forward dynamics with Baumgarte stabilization.

    MultibodyConstraintFwdDynamics equivalent (reference fulldynamics.cpp:
    39,58-75,139-140): rigid contacts as KKT system
        [M  J^T] [ddq]   [tau - b]
        [J  -mu] [-f ] = [-(Jdot v + a_corr)]
    solved by Schur complement on the (masked, fixed-size) contact block.
    Inactive contacts are masked rows: their force is exactly zero and the
    corresponding KKT rows become identity — static shapes, no recompile
    when the contact set changes (SURVEY.md §7 hard part 3).

    Returns (ddq (nv,), forces (nc, contact_dim)).
    """
    nc = len(contact_frame_ids)
    d = contact_dim
    M = crba(model, q)
    b = nle(model, q, v)
    dtype = q.dtype
    mask = jnp.asarray(contact_active, dtype=dtype)
    ref = "local" if d == 3 else "local_world_aligned"

    from .kinematics import feet_jacobians, frame_placement
    from .state import integrate

    # one fused FK pass for all contact Jacobians, and ONE jvp along the
    # configuration flow for all Jdot v terms
    def stacked_Jv(qq):
        J6 = feet_jacobians(model, qq, contact_frame_ids, ref)  # (nc,6,nv)
        return J6[:, :d, :]

    Jc_blocks, JdotV_blocks = jax.jvp(
        lambda t: stacked_Jv(integrate(model, q, t * v)),
        (jnp.zeros((), dtype=dtype),), (jnp.ones((), dtype=dtype),)
    )
    Jc = Jc_blocks.reshape(nc * d, model.nv)
    jdot_v = (JdotV_blocks @ v).reshape(nc * d)

    kp_rows, kd_rows = (_baumgarte_rows(g, d, nc, dtype) for g in (kp, kd))
    corr = kd_rows * (Jc @ v)
    if np.any(np.asarray(kp)):
        from .kinematics import fk, frame_placements

        oR, op = fk(model, q)
        fR_all, fp_all = frame_placements(model, oR, op)
        errs = []
        for k, fid in enumerate(contact_frame_ids):
            Rf, pf = fR_all[fid], fp_all[fid]
            p_ref = (jnp.zeros(3, dtype=dtype) if contact_ref_p is None
                     else jnp.asarray(contact_ref_p)[k].astype(dtype))
            if d == 3:
                errs.append(Rf.T @ (pf - p_ref))  # LOCAL position error
            else:
                R_ref = (jnp.eye(3, dtype=dtype) if contact_ref_R is None
                         else jnp.asarray(contact_ref_R)[k].astype(dtype))
                err6 = lie.log6((R_ref.T @ Rf, R_ref.T @ (pf - p_ref)))
                errs.append(jnp.concatenate([R_ref @ err6[:3], R_ref @ err6[3:]]))
        corr = corr + kp_rows * jnp.concatenate(errs)
    rhs_c = jdot_v + corr  # desired: Jc ddq + rhs_c = 0 (active rows)

    L = jnp.linalg.cholesky(M)
    Minv_Jt = jax.scipy.linalg.cho_solve((L, True), Jc.T)  # (nv, nc*d)
    free_acc = jax.scipy.linalg.cho_solve((L, True), tau - b)

    m_rows = jnp.repeat(mask, d)  # (nc*d,)
    A = Jc @ Minv_Jt  # Delassus operator
    # dtype-aware proximal floor: 1e-9 is f64-calibrated (reference
    # ProximalSettings, fulldynamics.cpp:39); f32 needs ~50*eps
    prox = max(prox_mu, 50.0 * float(jnp.finfo(dtype).eps))
    A = A * m_rows[:, None] * m_rows[None, :] + jnp.diag(1.0 - m_rows) + prox * jnp.eye(
        nc * d, dtype=dtype
    )
    rhs = m_rows * (Jc @ free_acc + rhs_c)
    f = -jnp.linalg.solve(A, rhs) * m_rows  # contact forces (stacked)
    ddq = free_acc + Minv_Jt @ f
    return ddq, f.reshape(nc, d)
