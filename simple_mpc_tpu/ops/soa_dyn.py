"""SoA (trailing-batch) articulated dynamics: mass matrix, bias torques,
contact Jacobians and the constrained-dynamics KKT solve in the lanes.

This extends ops/soa.py (FK / centroidal algebra) with the full-dynamics
hot ops so FullDynamicsOCP gets the same batch-in-the-lanes fast path as
kinodynamics (VERDICT r2 §2).  Capability parity with
ops.dynamics.{crba, nle, constrained_fwd_dynamics} — the Pinocchio
algorithms the reference consumes for MultibodyConstraintFwdDynamics
(reference src/fulldynamics.cpp:39, 58-75, 139-140).

Layout: all quantities (components..., N); every small-matrix factorization
is unrolled so each XLA op is elementwise over the N lanes (see ops/soa.py
module docstring).  The dof-axis contractions are einsums with N minor-most
(batched matmuls on the MXU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import RobotModel
from . import soa
from .world import tables


# ---------------------------------------------------------------------------
# Generic unrolled SPD Cholesky (lanes trailing)
# ---------------------------------------------------------------------------


def chol_unrolled(A):
    """Lower Cholesky of A (n, n, ...lanes) as a list-of-lists of lane
    arrays.  Fully unrolled — every op is elementwise over the lanes,
    the layout TPU vector units want for many tiny factorizations."""
    n = A.shape[0]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    return L


def chol_solve_unrolled(L, b):
    """Solve (L L^T) x = b with b (n, ...rhs/lanes); extra rhs axes
    broadcast against the lane-shaped L entries."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=0)


def solve_spd(A, b):
    """Unrolled SPD solve, A (n, n, ...), b (n, ...)."""
    return chol_solve_unrolled(chol_unrolled(A), b)


# ---------------------------------------------------------------------------
# World-frame spatial inertias (about the origin), (nj, 6, 6, N)
# ---------------------------------------------------------------------------


def _static_body_params(model: RobotModel):
    tab = tables(model)
    nj = model.njoints
    masses = np.asarray(tab.masses, np.float64)
    coms = np.asarray(tab.coms, np.float64)
    # I_loc[3:,3:] = I_com_loc - m C C  (C = skew(c_loc))  =>  recover I_com
    I_com = np.empty((nj, 3, 3))
    for j in range(nj):
        c = coms[j]
        C = np.array([[0, -c[2], c[1]], [c[2], 0, -c[0]], [-c[1], c[0], 0.0]])
        I_com[j] = np.asarray(tab.I_loc[j][3:, 3:]) + masses[j] * (C @ C)
    return masses, coms, I_com


def body_inertias_world(model: RobotModel, oR, op):
    """IW (nj, 6, 6, N): world-frame spatial inertia of every body about
    the world ORIGIN, [lin; ang] order:
        [[m E, -m skew(c)], [m skew(c), I_c - m skew(c) skew(c)]]
    with c the body-CoM world position and I_c = R I_com R^T."""
    masses, coms, I_com = _static_body_params(model)
    dtype = oR.dtype
    N = oR.shape[-1]
    nj = oR.shape[0]
    m = jnp.asarray(masses, dtype)[:, None, None, None]  # (nj,1,1,1)
    cl = jnp.asarray(coms, dtype)[..., None]  # (nj,3,1)
    c = op + soa.mv(oR, jnp.broadcast_to(cl, (nj, 3, N)))  # world body CoM
    Ic = soa.mm(soa.mm(oR, jnp.asarray(I_com, dtype)[..., None]),
                soa.transpose3(oR))  # R I_com R^T
    z = jnp.zeros_like(c[:, 0])
    C = soa._mat3([[z, -c[:, 2], c[:, 1]],
                   [c[:, 2], z, -c[:, 0]],
                   [-c[:, 1], c[:, 0], z]])  # (nj,3,3,N)
    E = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[..., None], (nj, 3, 3, N))
    top = jnp.concatenate([m * E, -m * C], axis=-2)  # rows lin
    bot = jnp.concatenate([m * C, Ic - m * soa.mm(C, C)], axis=-2)
    return jnp.concatenate([top, bot], axis=-3)  # (nj,6,6,N)


def _ancestor_dof_matrix(model: RobotModel) -> np.ndarray:
    """(nv, nv) A[d1, d2] = 1 iff dof d1 is ancestor-or-self of the joint
    carrying dof d2 (static selector for the CRBA branch structure)."""
    tab = tables(model)
    return np.asarray(tab.mask)[np.asarray(tab.dof_joint)].T  # (nv, nv)


def crba_world(model: RobotModel, oR, op, Sw, IW=None):
    """Joint-space mass matrix M (nv, nv, N) via world-frame composite
    rigid bodies: M[d1,d2] = Sw_d1 . I^C_{body(deeper dof)} Sw_d2
    (pinocchio::crba capability, robot-handler.cpp:135)."""
    tab = tables(model)
    dtype = oR.dtype
    if IW is None:
        IW = body_inertias_world(model, oR, op)
    mask = jnp.asarray(tab.mask, dtype)  # (nj, nv)
    # subtree composite seen by each dof: IC[d] = sum_{j descendant} IW[j]
    IC = jnp.einsum("jd,jabn->dabn", mask, IW)  # (nv,6,6,N)
    F = jnp.einsum("dabn,dbn->dan", IC, Sw)  # (nv,6,N)
    G = jnp.einsum("dan,ean->den", Sw, F)  # G[d1,d2] = Sw_d1 . IC_d2 Sw_d2
    # M[d1,d2] = G[d1,d2] if d1 ancestor of body(d2); G[d2,d1] if d2
    # ancestor of body(d1); 0 for branch-disjoint dof pairs
    A = jnp.asarray(_ancestor_dof_matrix(model), bool)[..., None]
    return jnp.where(A, G,
                     jnp.where(jnp.swapaxes(A, 0, 1),
                               jnp.swapaxes(G, 0, 1), 0.0))


def nle_world(model: RobotModel, oR, op, Sw, vW, v, IW=None):
    """Nonlinear effects b(q, v) (nv, N): Coriolis/centrifugal + gravity
    (pinocchio::nonLinearEffects capability) via the base-acceleration
    trick in world coordinates."""
    tab = tables(model)
    dtype = oR.dtype
    N = oR.shape[-1]
    if IW is None:
        IW = body_inertias_world(model, oR, op)
    mask = jnp.asarray(tab.mask, dtype)
    # bias body accelerations: aW[j] = sum_{d in anc(j)} (vW_{b(d)} x Sw_d) v_d
    vb = vW[jnp.asarray(tab.dof_joint)]  # (nv,6,N)
    c = soa.motion_cross(vb, Sw) * v[:, None, :]
    aW = jnp.einsum("jd,dkn->jkn", mask, c)
    ag = jnp.concatenate(
        [jnp.asarray(-np.asarray(model.gravity), dtype)[:, None],
         jnp.zeros((3, 1), dtype)], axis=0)  # fictitious base acceleration
    a_tot = aW + ag[None]
    f = (jnp.einsum("jabn,jbn->jan", IW, a_tot)
         + soa.motion_cross_star(vW, jnp.einsum("jabn,jbn->jan", IW, vW)))
    Fsub = jnp.einsum("jd,jan->dan", mask, f)  # subtree force per dof
    return jnp.einsum("dan,dan->dn", Sw, Fsub)


# ---------------------------------------------------------------------------
# Contact Jacobians (world-aligned / local), (nc*dim, nv, N)
# ---------------------------------------------------------------------------


def contact_jacobians(model: RobotModel, oR, op, Sw, feet_ids, dim: int):
    """Stacked contact Jacobians for the feet frames, matching
    ops.kinematics.feet_jacobians: dim=3 -> LOCAL linear rows, dim=6 ->
    LOCAL_WORLD_ALIGNED.  Returns (J (nk*dim, nv, N), fRw, fpw)."""
    tab = tables(model)
    dtype = oR.dtype
    ids = np.asarray(feet_ids)
    fRw, fpw = soa.frame_placements_world(model, oR, op, ids)  # (nk,3,3,N),(nk,3,N)
    maskf = jnp.asarray(np.asarray(tab.mask)[tab.fparent[ids]], dtype)  # (nk,nv)
    nk, nv, N = len(ids), model.nv, Sw.shape[-1]
    lin = Sw[None, :, :3, :] + soa.cross(
        jnp.broadcast_to(Sw[None, :, 3:, :], (nk, nv, 3, N)),
        fpw[:, None])  # (nk, nv, 3, N)
    ang = jnp.broadcast_to(Sw[None, :, 3:, :], lin.shape)
    if dim == 3:
        # LOCAL: rotate the world-aligned point velocity into the foot frame
        J = soa.mtv(fRw[:, None], lin)  # (nk, nv, 3, N)
    else:
        J = jnp.concatenate([lin, ang], axis=-2)  # (nk, nv, 6, N)
    J = J * maskf[:, :, None, None]
    # (nk, nv, dim, N) -> (nk, dim, nv, N) -> (nk*dim, nv, N)
    J = jnp.swapaxes(J, 1, 2)
    return J.reshape(len(ids) * dim, model.nv, J.shape[-1]), fRw, fpw


def constrained_fwd_dynamics_soa(
    model: RobotModel,
    q,  # (nq, N)
    v,  # (nv, N)
    tau,  # (nv, N)
    feet_ids,
    active,  # (nk, N)
    dim: int = 3,
    ref_R=None,  # (nk, 3, 3, N)
    ref_p=None,  # (nk, 3, N)
    kp=0.0,  # Baumgarte gains: scalar or per-dimension (dim,) vector,
    kd=0.0,  # same for every contact (fulldynamics.cpp:58-74)
    prox_mu: float = 1e-9,
    precomp=None,  # optional (oR, op, Sw, vW, IW) to share with the caller
):
    """Trailing-batch constrained articulated forward dynamics — the SoA
    twin of ops.dynamics.constrained_fwd_dynamics (same KKT + Baumgarte +
    masked-Schur semantics; MultibodyConstraintFwdDynamics capability,
    reference fulldynamics.cpp:139-140).

    Returns (ddq (nv, N), forces (nk, dim, N))."""
    dtype = q.dtype
    nv = model.nv
    nk = len(feet_ids)
    nc = nk * dim
    N = q.shape[-1]

    if precomp is None:
        oR, op = soa.fk_world(model, q)
        Sw = soa.world_axes(model, oR, op)
        vW = soa.body_velocities(model, Sw, v)
        IW = body_inertias_world(model, oR, op)
    else:
        oR, op, Sw, vW, IW = precomp

    M = crba_world(model, oR, op, Sw, IW)
    b = nle_world(model, oR, op, Sw, vW, v, IW)

    # contact Jacobians + their time derivative along the flow q' = v
    # (same jvp construction as the generic path, so the two agree exactly)
    def jac_of(qq):
        oR2, op2 = soa.fk_world(model, qq)
        Sw2 = soa.world_axes(model, oR2, op2)
        return contact_jacobians(model, oR2, op2, Sw2, feet_ids, dim)[0]

    t0 = jnp.zeros((), dtype)
    Jc, Jdot = jax.jvp(
        lambda t: jac_of(soa.integrate(model, q, t * v)), (t0,),
        (jnp.ones((), dtype),))
    jdot_v = jnp.einsum("rvn,vn->rn", Jdot, v)

    from .dynamics import _baumgarte_rows

    kp_rows, kd_rows = (_baumgarte_rows(g, dim, nk, dtype) for g in (kp, kd))
    corr = kd_rows[:, None] * jnp.einsum("rvn,vn->rn", Jc, v)
    if np.any(np.asarray(kp)):
        fRw, fpw = soa.frame_placements_world(model, oR, op,
                                              np.asarray(feet_ids))
        if dim == 3:
            err = soa.mtv(fRw, fpw - (jnp.zeros((nk, 3, 1), dtype)
                                      if ref_p is None else ref_p))
        else:
            Rr = (jnp.broadcast_to(jnp.eye(3, dtype=dtype)[..., None],
                                   (nk, 3, 3, N)) if ref_R is None else ref_R)
            pr = jnp.zeros((nk, 3, 1), dtype) if ref_p is None else ref_p
            e6 = soa.log6(soa.mtm(Rr, fRw), soa.mtv(Rr, fpw - pr))
            err = jnp.concatenate(
                [soa.mv(Rr, e6[:, :3]), soa.mv(Rr, e6[:, 3:])], axis=-2)
        corr = corr + kp_rows[:, None] * err.reshape(nc, N)
    rhs_c = jdot_v + corr

    Lm = chol_unrolled(M)
    # one multi-rhs solve: [Jc^T | tau - b]
    rhs_all = jnp.concatenate(
        [jnp.swapaxes(Jc, 0, 1), (tau - b)[:, None, :]], axis=1)  # (nv, nc+1, N)
    sol = chol_solve_unrolled(Lm, rhs_all)
    Minv_Jt, free_acc = sol[:, :nc, :], sol[:, nc, :]

    m_rows = jnp.repeat(active, dim, axis=0).astype(dtype)  # (nc, N)
    A = jnp.einsum("rvn,vsn->rsn", Jc, Minv_Jt)  # Delassus (nc, nc, N)
    prox = max(prox_mu, 50.0 * float(jnp.finfo(dtype).eps))
    A = (A * m_rows[:, None, :] * m_rows[None, :, :]
         + jnp.eye(nc, dtype=dtype)[..., None] * (prox + 1.0)
         - jnp.eye(nc, dtype=dtype)[..., None] * m_rows[None, :, :])
    # note: diag term = (1 - m) + prox, matching the generic path
    rhs = m_rows * (jnp.einsum("rvn,vn->rn", Jc, free_acc) + rhs_c)
    f = -solve_spd(A, rhs) * m_rows
    ddq = free_acc + jnp.einsum("vrn,rn->vn", Minv_Jt, f)
    return ddq, f.reshape(nk, dim, N)
