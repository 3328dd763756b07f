"""Kinodynamics OCP — whole-body kinematics + centroidal dynamics.

Reference: src/kinodynamics.cpp (KinodynamicsOCP).  State (q, v) on the
multibody phase space (kinodynamics.cpp:46); control
u = [forces (nk*fs); ddq_joints (nv-6)] (:34).  Base acceleration follows
from centroidal wrench consistency (KinodynamicsFwdDynamics, :85-89) via
semi-implicit Euler.  Constraints: joint-limit box (:91-101), per-contact
zero frame velocity (:103-149), optional cones, land-height equality
(:134-145).  Terminal: state + 10x centroidal momentum cost (:352-364),
DCM-position equality with tau = sqrt(z_com/9.81) (:366-377).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dynamics as dyn
from ..ops import kinematics as kin
from ..ops import lie
from . import cones
from .base import OCPHandler
from .spaces import MultibodyPhaseSpace


def _dvec(w):
    w = np.asarray(w, dtype=np.float64)
    return np.diag(w) if w.ndim == 2 else w


@dataclasses.dataclass
class KinodynamicsSettings:
    """Field parity with KinodynamicsSettings (kinodynamics.hpp:24-51)."""

    timestep: float = 0.01
    w_x: np.ndarray = None
    w_u: np.ndarray = None
    w_cent: np.ndarray = None
    w_centder: np.ndarray = None
    w_frame: np.ndarray = None
    gravity: np.ndarray = None
    force_size: int = 3
    qmin: np.ndarray = None
    qmax: np.ndarray = None
    mu: float = 0.8
    Lfoot: float = 0.1
    Wfoot: float = 0.075
    kinematics_limits: bool = True
    force_cone: bool = False
    land_cstr: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "KinodynamicsSettings":
        from ..utils.config import settings_from_dict

        return settings_from_dict(cls, d)


class KinoStageParams(NamedTuple):
    contact_active: jnp.ndarray  # (nk,)
    foot_ref_R: jnp.ndarray  # (nk,3,3) pose-cost references
    foot_ref_p: jnp.ndarray  # (nk,3)
    x_ref: jnp.ndarray  # (nx,) state-cost target (holds base pose/vel refs)
    u_ref: jnp.ndarray  # (nu,) control-cost target (holds force refs)
    land: jnp.ndarray  # (nk,) land-constraint flags


class KinoTermParams(NamedTuple):
    x_ref: jnp.ndarray
    dcm_ref: jnp.ndarray  # (3,) terminal DCM target


class KinodynamicsOCP(OCPHandler):
    def __init__(self, settings, model_handler):
        if isinstance(settings, dict):
            settings = KinodynamicsSettings.from_dict(settings)
        super().__init__(settings, model_handler)
        self.model = model_handler.model
        self.space = MultibodyPhaseSpace(self.model)
        self.nk = model_handler.n_feet
        self.fs = settings.force_size
        nv = self.model.nv
        self.nv = nv
        self.nq = self.model.nq
        self.nu = self.nk * self.fs + (nv - 6)
        self.mass = model_handler.mass
        self.feet_fids = list(model_handler.feet_frame_ids)
        # constraint sizes (static maximal structure, masked by activity)
        self.vel_dim = 3 if self.fs == 3 else 6
        n_land = self.nk if (settings.land_cstr and self.fs == 3) else 0
        self.n_eq = self.nk * self.vel_dim + n_land
        n_box = 2 * (nv - 6) if settings.kinematics_limits else 0
        n_cone = self.nk * (5 if self.fs == 3 else 17) if settings.force_cone else 0
        self.n_in = n_box + n_cone
        self.n_term_eq = 0  # set by make_term_params when DCM equality enabled
        self._use_term_eq = False

    @property
    def u_scale(self):
        """Per-coordinate control magnitudes for solver nondimensionalization
        (SolverSettings.u_scale="auto"): contact forces ~ m*g, contact
        torques (fs=6) ~ m*g*footprint, joint accelerations ~ 1.  Pure
        reparameterization — Gauss-Newton steps are invariant in exact
        arithmetic; in f32 it removes the 450 N-vs-O(1) cancellation floor
        on Talos (BASELINE.md accuracy row)."""
        s = self.settings
        g = abs(float(np.asarray(s.gravity)[2])) if s.gravity is not None else 9.81
        mg = float(self.mass) * g
        blk = np.full(self.fs, mg)
        if self.fs == 6:
            blk[3:] = mg * max(float(s.Lfoot), float(s.Wfoot))
        w = np.ones(self.nu)
        w[: self.nk * self.fs] = np.tile(blk, self.nk)
        return w

    # -- params --------------------------------------------------------------
    def make_stage_params(self, active, poses_R, poses_p, forces, land):
        return KinoStageParams(
            contact_active=jnp.asarray(active),
            foot_ref_R=jnp.asarray(poses_R),
            foot_ref_p=jnp.asarray(poses_p),
            x_ref=jnp.asarray(self.model_handler.reference_state),
            u_ref=jnp.concatenate([
                jnp.asarray(np.asarray(forces).reshape(-1)),
                jnp.zeros(self.nv - 6),
            ]),
            land=jnp.asarray(land),
        )

    def make_term_params(self, x0, terminal_constraint):
        self._use_term_eq = bool(terminal_constraint)
        self.n_term_eq = 3 if terminal_constraint else 0
        com0 = dyn.center_of_mass(self.model, x0[: self.nq])
        return KinoTermParams(
            x_ref=jnp.asarray(self.model_handler.reference_state), dcm_ref=com0
        )

    # -- dynamics (KinodynamicsFwdDynamics + semi-implicit Euler) ------------
    def ode_acc(self, x, u, p: KinoStageParams):
        """Generalized acceleration: base 6 dofs from centroidal wrench
        consistency Ag qdd = W_ext - Adot v, joints commanded by u."""
        m = self.model
        q, v = x[: self.nq], x[self.nq:]
        f = u[: self.nk * self.fs].reshape(self.nk, self.fs) * p.contact_active[:, None]
        ddq_j = u[self.nk * self.fs:]
        g = jnp.asarray(self.settings.gravity, dtype=x.dtype)
        com = dyn.center_of_mass(m, q)
        # external centroidal wrench from contact forces (world frame, feet FK)
        oR, op = kin.fk(m, q)
        fR, fp = kin.frame_placements(m, oR, op)
        Wlin = jnp.zeros(3, x.dtype)
        Wang = jnp.zeros(3, x.dtype)
        for k, fid in enumerate(self.feet_fids):
            fk_w = f[k, :3]
            Wlin = Wlin + fk_w
            Wang = Wang + jnp.cross(fp[fid] - com, fk_w)
            if self.fs == 6:
                Wang = Wang + f[k, 3:]
        W = jnp.concatenate([Wlin + self.mass * g, Wang])
        Ag = dyn.centroidal_momentum_matrix(m, q)
        Adotv = dyn.centroidal_momentum_time_variation(m, q, v)
        rhs = W - Adotv - Ag[:, 6:] @ ddq_j
        a_base = jnp.linalg.solve(Ag[:, :6], rhs)
        return jnp.concatenate([a_base, ddq_j])

    def dynamics(self, x, u, p):
        """Semi-implicit Euler (kinodynamics.cpp:85-89)."""
        dt = self.settings.timestep
        q, v = x[: self.nq], x[self.nq:]
        a = self.ode_acc(x, u, p)
        v_next = v + dt * a
        from ..ops import state as st

        q_next = st.integrate(self.model, q, dt * v_next)
        return jnp.concatenate([q_next, v_next])

    def stage_eval(self, x, u, p: KinoStageParams):
        """Fused bundle on the structure-flattened world-frame kernels
        (ops/world.py): one batched FK + flat centroidal algebra shared by
        the dynamics, the costs and the contact-velocity equalities.  This
        is the solver's hot path for the flagship benchmark — every
        intermediate is at most (nj, 6) per sample so the solver's
        forward-mode linearization stays HBM-cheap on TPU (see ops/world.py
        module docstring; reference semantics: kinodynamics.cpp:40-152)."""
        s = self.settings
        m = self.model
        q, v = x[: self.nq], x[self.nq:]
        dtype = x.dtype
        f = u[: self.nk * self.fs].reshape(self.nk, self.fs) * p.contact_active[:, None]
        ddq_j = u[self.nk * self.fs:]
        g = jnp.asarray(s.gravity, dtype=dtype)

        from ..ops import world as W

        tab = W.tables(m)
        feet_ids = np.asarray(self.feet_fids)
        feet_par = tab.fparent[feet_ids]

        oR, op = W.fk_world(m, q)
        Sw = W.world_axes(m, q, oR, op)
        com = W.com_world(m, oR, op)
        vW = W.body_velocities(m, Sw, v)
        fRw, fpw = W.frame_placements_world(m, oR, op, feet_ids)
        hg = W.Agx(m, oR, op, Sw, v, com)
        bias = W.bias_hdot(m, oR, op, Sw, vW, v, com)

        # external centroidal wrench from the commanded forces
        Wlin = self.mass * g + jnp.sum(f[:, :3], axis=0)
        Wang = jnp.sum(jnp.cross(fpw - com, f[:, :3]), axis=0)
        if self.fs == 6:
            Wang = Wang + jnp.sum(f[:, 3:], axis=0)
        Wr = jnp.concatenate([Wlin, Wang])

        # dynamics (KinodynamicsFwdDynamics + semi-implicit Euler)
        acc_j = jnp.concatenate([jnp.zeros(6, dtype), ddq_j])
        rhs = Wr - bias - W.Agx(m, oR, op, Sw, acc_j, com)
        A6 = W.ag6(m, oR, op, Sw, com)
        a_base = jnp.linalg.solve(A6, rhs)
        a = jnp.concatenate([a_base, ddq_j])
        dt = s.timestep
        v_next = v + dt * a
        from ..ops import state as st

        xnext = jnp.concatenate([st.integrate(m, q, dt * v_next), v_next])

        # costs
        r_state = self.space.difference(p.x_ref, x)
        r_u = u - p.u_ref
        if self.fs == 6:
            dR = jnp.swapaxes(p.foot_ref_R, -1, -2) @ fRw
            dp = (jnp.swapaxes(p.foot_ref_R, -1, -2)
                  @ (fpw - p.foot_ref_p)[..., None])[..., 0]
            foot_r = lie.log6((dR, dp)).reshape(-1)
        else:
            foot_r = (fpw - p.foot_ref_p).reshape(-1)
        r = jnp.concatenate([r_state, r_u, hg, Wr, foot_r])
        w = jnp.concatenate(
            [jnp.asarray(_dvec(s.w_x)), jnp.asarray(_dvec(s.w_u)),
             jnp.asarray(_dvec(s.w_cent)), jnp.asarray(_dvec(s.w_centder))]
            + [jnp.asarray(_dvec(s.w_frame))] * self.nk
        ).astype(dtype)

        # equality constraints: stance-foot zero velocity (+ land heights)
        _, v_loc = W.frame_velocities_world(m, vW, fRw, fpw,
                                            jnp.asarray(feet_par))
        vf = v_loc[:, :3] if self.vel_dim == 3 else v_loc
        geq = (vf * (p.contact_active > 0.5)[:, None]).reshape(-1)
        if s.land_cstr and self.fs == 3:
            land_r = fpw[:, 2] - p.foot_ref_p[:, 2]
            land_on = (p.land > 0.5) & (p.contact_active > 0.5)
            geq = jnp.concatenate([geq, jnp.where(land_on, land_r, 0.0)])

        h = self.ineq_constraints(x, u, p)  # cheap: boxes + force cones on u
        return r, w, geq, h, xnext

    def stage_eval_soa(self, X, U, P: KinoStageParams):
        """Trailing-batch stage_eval: X (nx, N), U (nu, N), P leaves with
        their leading stage axis moved to the back (moveaxis(0, -1)).

        Semantically identical to vmap(stage_eval) over N stages but laid
        out for the TPU's vector registers — the batch lives in the lanes
        (see ops/soa.py module docstring).  Returns (r (nr,N), w (nr,),
        geq (n_eq,N), h (n_in,N), xnext (nx,N))."""
        s = self.settings
        m = self.model
        dtype = X.dtype
        N = X.shape[-1]
        q, v = X[: self.nq], X[self.nq:]
        f = (U[: self.nk * self.fs].reshape(self.nk, self.fs, N)
             * P.contact_active[:, None, :])
        ddq_j = U[self.nk * self.fs:]
        g = jnp.asarray(s.gravity, dtype=dtype)[:, None]

        from ..ops import soa

        tab = soa._world.tables(m)
        feet_ids = np.asarray(self.feet_fids)
        feet_par = tab.fparent[feet_ids]

        oR, op = soa.fk_world(m, q)
        Sw = soa.world_axes(m, oR, op)
        com = soa.com_world(m, oR, op)
        vW = soa.body_velocities(m, Sw, v)
        fRw, fpw = soa.frame_placements_world(m, oR, op, feet_ids)
        hg = soa.agx(m, oR, op, Sw, v, com)
        bias = soa.bias_hdot(m, oR, op, Sw, vW, v, com)

        # external centroidal wrench from the commanded forces
        Wlin = self.mass * g + jnp.sum(f[:, :3], axis=0)
        Wang = jnp.sum(soa.cross(fpw - com[None], f[:, :3]), axis=0)
        if self.fs == 6:
            Wang = Wang + jnp.sum(f[:, 3:], axis=0)
        Wr = jnp.concatenate([Wlin, Wang], axis=-2)

        # dynamics (KinodynamicsFwdDynamics + semi-implicit Euler)
        acc_j = jnp.concatenate([jnp.zeros((6, N), dtype), ddq_j], axis=0)
        rhs = Wr - bias - soa.agx(m, oR, op, Sw, acc_j, com)
        a_base = soa.centroidal_solve6(m, oR, op, com, rhs)
        a = jnp.concatenate([a_base, ddq_j], axis=0)
        dt = s.timestep
        v_next = v + dt * a
        xnext = jnp.concatenate(
            [soa.integrate(m, q, dt * v_next), v_next], axis=0)

        # costs
        r_state = soa.state_difference(m, P.x_ref, X)
        r_u = U - P.u_ref
        if self.fs == 6:
            refR = P.foot_ref_R  # (nk,3,3,N)
            dR = soa.mtm(refR, fRw)
            dp = soa.mtv(refR, fpw - P.foot_ref_p)
            foot_r = soa.log6(dR, dp).reshape(-1, N)
        else:
            foot_r = (fpw - P.foot_ref_p).reshape(-1, N)
        r = jnp.concatenate([r_state, r_u, hg, Wr, foot_r], axis=0)
        w = jnp.concatenate(
            [jnp.asarray(_dvec(s.w_x)), jnp.asarray(_dvec(s.w_u)),
             jnp.asarray(_dvec(s.w_cent)), jnp.asarray(_dvec(s.w_centder))]
            + [jnp.asarray(_dvec(s.w_frame))] * self.nk
        ).astype(dtype)

        # equality constraints: stance-foot zero velocity (+ land heights)
        _, v_loc = soa.frame_velocities_world(m, vW, fRw, fpw, feet_par)
        vf = v_loc[:, :3] if self.vel_dim == 3 else v_loc
        geq = (vf * (P.contact_active > 0.5)[:, None, :]).reshape(-1, N)
        if s.land_cstr and self.fs == 3:
            land_r = fpw[:, 2] - P.foot_ref_p[:, 2]
            land_on = (P.land > 0.5) & (P.contact_active > 0.5)
            geq = jnp.concatenate(
                [geq, jnp.where(land_on, land_r, 0.0)], axis=0)

        # inequalities: joint box (+ force cones), linear in (x, u)
        rows = []
        if s.kinematics_limits:
            qj = X[7: self.nq]
            lo = jnp.asarray(s.qmin, dtype)[:, None]
            hi = jnp.asarray(s.qmax, dtype)[:, None]
            b = jnp.concatenate([qj - hi, lo - qj], axis=0)
            rows.append(jnp.where(jnp.isfinite(b), b, -1.0))
        if s.force_cone:
            A = (cones.friction_cone_mat(s.mu) if self.fs == 3
                 else cones.wrench_cone_mat(s.mu, s.Lfoot, s.Wfoot))
            A = jnp.asarray(A, dtype)
            fk_all = U[: self.nk * self.fs].reshape(self.nk, self.fs, N)
            cr = jnp.einsum("cf,kfn->kcn", A, fk_all)
            if self.fs == 3:
                cr = cr.at[:, 0].add(cones.FRICTION_EPS)  # fz >= eps
            cr = jnp.where(P.contact_active[:, None, :] > 0.5, cr, -1.0)
            rows.append(cr.reshape(-1, N))
        h = (jnp.concatenate(rows, axis=0) if rows
             else jnp.zeros((0, N), dtype))
        return r, w, geq, h, xnext

    def stage_eval_reference(self, x, u, p: KinoStageParams):
        """Per-joint oracle implementation of stage_eval (ops/kinematics,
        ops/dynamics), kept for exactness tests of the flattened hot path."""
        s = self.settings
        m = self.model
        q, v = x[: self.nq], x[self.nq:]
        dtype = x.dtype
        f = u[: self.nk * self.fs].reshape(self.nk, self.fs) * p.contact_active[:, None]
        ddq_j = u[self.nk * self.fs:]
        g = jnp.asarray(s.gravity, dtype=dtype)

        # shared kinematics/centroidal quantities
        oR, op = kin.fk(m, q)
        fR, fp = kin.frame_placements(m, oR, op)
        com = dyn.center_of_mass(m, q)
        Ag = dyn.centroidal_momentum_matrix(m, q)
        Adotv = dyn.centroidal_momentum_time_variation(m, q, v)
        hg = Ag @ v
        feet_v = kin.feet_velocities(m, q, v, self.feet_fids, "local")

        # external centroidal wrench from the commanded forces
        Wlin = self.mass * g
        Wang = jnp.zeros(3, dtype)
        for k, fid in enumerate(self.feet_fids):
            Wlin = Wlin + f[k, :3]
            Wang = Wang + jnp.cross(fp[fid] - com, f[k, :3])
            if self.fs == 6:
                Wang = Wang + f[k, 3:]
        W = jnp.concatenate([Wlin, Wang])

        # dynamics (KinodynamicsFwdDynamics + semi-implicit Euler)
        rhs = W - Adotv - Ag[:, 6:] @ ddq_j
        a_base = jnp.linalg.solve(Ag[:, :6], rhs)
        a = jnp.concatenate([a_base, ddq_j])
        dt = s.timestep
        v_next = v + dt * a
        from ..ops import state as st

        xnext = jnp.concatenate([st.integrate(m, q, dt * v_next), v_next])

        # costs
        r_state = self.space.difference(p.x_ref, x)
        r_u = u - p.u_ref
        foot_rs = []
        for k, fid in enumerate(self.feet_fids):
            if self.fs == 6:
                dR = p.foot_ref_R[k].T @ fR[fid]
                dp = p.foot_ref_R[k].T @ (fp[fid] - p.foot_ref_p[k])
                foot_rs.append(lie.log6((dR, dp)))
            else:
                foot_rs.append(fp[fid] - p.foot_ref_p[k])
        r = jnp.concatenate([r_state, r_u, hg, W] + foot_rs)
        w = jnp.concatenate(
            [jnp.asarray(_dvec(s.w_x)), jnp.asarray(_dvec(s.w_u)),
             jnp.asarray(_dvec(s.w_cent)), jnp.asarray(_dvec(s.w_centder))]
            + [jnp.asarray(_dvec(s.w_frame))] * self.nk
        ).astype(dtype)

        # equality constraints: stance-foot zero velocity (+ land heights)
        rows = []
        for k, fid in enumerate(self.feet_fids):
            vf = feet_v[k]
            rr = vf[:3] if self.vel_dim == 3 else vf
            rows.append(cones.mask_eq(rr, p.contact_active[k] > 0.5))
        if s.land_cstr and self.fs == 3:
            for k, fid in enumerate(self.feet_fids):
                rr = (fp[fid][2] - p.foot_ref_p[k][2])[None]
                rows.append(cones.mask_eq(
                    rr, (p.land[k] > 0.5) & (p.contact_active[k] > 0.5)))
        geq = jnp.concatenate(rows) if rows else jnp.zeros(0, dtype)

        h = self.ineq_constraints(x, u, p)  # cheap: boxes + force cones on u
        return r, w, geq, h, xnext

    # -- costs (kinodynamics.cpp:56-83) --------------------------------------
    def cost_residuals(self, x, u, p: KinoStageParams):
        s = self.settings
        m = self.model
        q, v = x[: self.nq], x[self.nq:]
        r_state = self.space.difference(p.x_ref, x)
        r_u = u - p.u_ref
        hg = dyn.centroidal_momentum(m, q, v)
        # momentum derivative residual: hdot implied by the commanded forces
        f = u[: self.nk * self.fs].reshape(self.nk, self.fs) * p.contact_active[:, None]
        g = jnp.asarray(s.gravity, dtype=x.dtype)
        com = dyn.center_of_mass(m, q)
        oR, op = kin.fk(m, q)
        fR, fp = kin.frame_placements(m, oR, op)
        hd_lin = self.mass * g
        hd_ang = jnp.zeros(3, x.dtype)
        for k, fid in enumerate(self.feet_fids):
            hd_lin = hd_lin + f[k, :3]
            hd_ang = hd_ang + jnp.cross(fp[fid] - com, f[k, :3])
            if self.fs == 6:
                hd_ang = hd_ang + f[k, 3:]
        r_hdot = jnp.concatenate([hd_lin, hd_ang])
        # per-foot pose costs
        foot_rs = []
        for k, fid in enumerate(self.feet_fids):
            if self.fs == 6:
                dR = p.foot_ref_R[k].T @ fR[fid]
                dp = p.foot_ref_R[k].T @ (fp[fid] - p.foot_ref_p[k])
                foot_rs.append(lie.log6((dR, dp)))
            else:
                foot_rs.append(fp[fid] - p.foot_ref_p[k])
        r = jnp.concatenate([r_state, r_u, hg, r_hdot] + foot_rs)
        wf = _dvec(s.w_frame)
        w = jnp.concatenate(
            [jnp.asarray(_dvec(s.w_x)), jnp.asarray(_dvec(s.w_u)),
             jnp.asarray(_dvec(s.w_cent)), jnp.asarray(_dvec(s.w_centder))]
            + [jnp.asarray(wf)] * self.nk
        ).astype(x.dtype)
        return r, w

    def term_residuals(self, x, p: KinoTermParams):
        s = self.settings
        q, v = x[: self.nq], x[self.nq:]
        r_state = self.space.difference(p.x_ref, x)
        hg = dyn.centroidal_momentum(self.model, q, v)
        r = jnp.concatenate([r_state, hg])
        w = jnp.concatenate(
            [jnp.asarray(_dvec(s.w_x)), 10.0 * jnp.asarray(_dvec(s.w_cent))]
        ).astype(x.dtype)
        return r, w

    # -- constraints (kinodynamics.cpp:91-149) -------------------------------
    def eq_constraints(self, x, u, p: KinoStageParams):
        s = self.settings
        q, v = x[: self.nq], x[self.nq:]
        rows = []
        for k, fid in enumerate(self.feet_fids):
            vf = kin.frame_velocity(self.model, q, v, fid, "local")
            r = vf[:3] if self.vel_dim == 3 else vf
            rows.append(cones.mask_eq(r, p.contact_active[k] > 0.5))
        if s.land_cstr and self.fs == 3:
            oR, op = kin.fk(self.model, q)
            fR, fp = kin.frame_placements(self.model, oR, op)
            for k, fid in enumerate(self.feet_fids):
                r = (fp[fid][2] - p.foot_ref_p[k][2])[None]
                rows.append(cones.mask_eq(r, (p.land[k] > 0.5) & (p.contact_active[k] > 0.5)))
        return jnp.concatenate(rows) if rows else jnp.zeros(0, x.dtype)

    def ineq_constraints(self, x, u, p: KinoStageParams):
        s = self.settings
        rows = []
        if s.kinematics_limits:
            qj = x[7: self.nq]
            rows.append(cones.mask_ineq(
                cones.box(qj, jnp.asarray(s.qmin), jnp.asarray(s.qmax)), True))
        if s.force_cone:
            f = u[: self.nk * self.fs].reshape(self.nk, self.fs)
            for k in range(self.nk):
                r = (cones.friction_cone(f[k], s.mu) if self.fs == 3
                     else cones.wrench_cone(f[k], s.mu, s.Lfoot, s.Wfoot))
                rows.append(cones.mask_ineq(r, p.contact_active[k] > 0.5))
        return jnp.concatenate(rows) if rows else jnp.zeros(0, x.dtype)

    def term_eq_constraints(self, x, p: KinoTermParams):
        """DCM position equality: com + tau * vcom == dcm_ref."""
        if not self._use_term_eq:
            return jnp.zeros(0, x.dtype)
        q, v = x[: self.nq], x[self.nq:]
        com = dyn.center_of_mass(self.model, q)
        h = dyn.centroidal_momentum(self.model, q, v)
        tau = jnp.sqrt(p.dcm_ref[2] / 9.81)
        return com + tau * h[:3] / self.mass - p.dcm_ref

    # -- reference get/setters (kinodynamics.cpp:155-338) --------------------
    def set_all_foot_translations(self, refs):
        """Batched (T, nk, 3) write of every stage's foot pose-cost targets
        (fused equivalent of the setReferencePose loop, mpc.cpp:304-308)."""
        sp = self.problem.stage_params._replace(foot_ref_p=jnp.asarray(refs))
        self.problem = dataclasses.replace(self.problem, stage_params=sp)

    def state_derivative(self, x, u, p):
        """Continuous xdot [v; a] (MPC::getStateDerivative, mpc.cpp:346-352)."""
        v = x[self.nq:]
        return jnp.concatenate([v, self.ode_acc(x, u, p)])

    def set_reference_pose(self, t: int, ee_name: str, R, pos):
        k = self.model_handler.foot_nb(ee_name)
        sp = self.problem.stage_params
        sp = sp._replace(
            foot_ref_R=sp.foot_ref_R.at[t, k].set(jnp.asarray(R)),
            foot_ref_p=sp.foot_ref_p.at[t, k].set(jnp.asarray(pos)),
        )
        self.problem = dataclasses.replace(self.problem, stage_params=sp)

    def set_reference_poses(self, t: int, pose_refs: dict):
        for name, (R, pos) in pose_refs.items():
            self.set_reference_pose(t, name, R, pos)

    def get_reference_pose(self, t: int, ee_name: str):
        k = self.model_handler.foot_nb(ee_name)
        sp = self.problem.stage_params
        return sp.foot_ref_R[t, k], sp.foot_ref_p[t, k]

    def compute_control_from_forces(self, force_refs: dict, u_ref=None):
        """Write per-foot force refs into the force block of a control
        reference, keeping the ddq tail (KinodynamicsOCP::
        computeControlFromForces, kinodynamics.cpp:229-243; functional)."""
        u = (jnp.zeros(self.nu) if u_ref is None else jnp.asarray(u_ref))
        for name, f in force_refs.items():
            f = jnp.asarray(f)
            if f.shape[0] != self.fs:
                raise RuntimeError(
                    "force size in settings does not match reference force size")
            k = self.model_handler.foot_nb(name)
            u = u.at[k * self.fs: (k + 1) * self.fs].set(f)
        return u

    def set_reference_forces(self, t: int, force_refs: dict):
        u = self.compute_control_from_forces(
            force_refs, self.problem.stage_params.u_ref[t])
        self.set_reference_control(t, u)

    def set_reference_force(self, t: int, ee_name: str, force_ref):
        k = self.model_handler.foot_nb(ee_name)
        u = self.problem.stage_params.u_ref[t]
        u = u.at[k * self.fs: (k + 1) * self.fs].set(jnp.asarray(force_ref))
        self.set_reference_control(t, u)

    def get_reference_force(self, t: int, ee_name: str):
        k = self.model_handler.foot_nb(ee_name)
        return self.problem.stage_params.u_ref[t, k * self.fs: (k + 1) * self.fs]

    def set_velocity_base(self, t: int, velocity_base):
        sp = self.problem.stage_params
        xr = sp.x_ref[t].at[self.nq: self.nq + 6].set(jnp.asarray(velocity_base))
        sp = sp._replace(x_ref=sp.x_ref.at[t].set(xr))
        self.problem = dataclasses.replace(self.problem, stage_params=sp)

    def get_velocity_base(self, t: int):
        return self.problem.stage_params.x_ref[t, self.nq: self.nq + 6]

    def set_pose_base(self, t: int, pose_base):
        sp = self.problem.stage_params
        xr = sp.x_ref[t].at[:7].set(jnp.asarray(pose_base))
        sp = sp._replace(x_ref=sp.x_ref.at[t].set(xr))
        self.problem = dataclasses.replace(self.problem, stage_params=sp)

    def get_pose_base(self, t: int):
        return self.problem.stage_params.x_ref[t, :7]

    def set_reference_state(self, t: int, x_ref):
        sp = self.problem.stage_params
        sp = sp._replace(x_ref=sp.x_ref.at[t].set(jnp.asarray(x_ref)))
        self.problem = dataclasses.replace(self.problem, stage_params=sp)

    def get_reference_state(self, t: int):
        return self.problem.stage_params.x_ref[t]

    def update_terminal_constraint(self, com_ref):
        tp = self.problem.term_params._replace(dcm_ref=jnp.asarray(com_ref))
        self.problem = dataclasses.replace(self.problem, term_params=tp)

    def set_terminal_reference_state(self, x_ref):
        tp = self.problem.term_params._replace(x_ref=jnp.asarray(x_ref))
        self.problem = dataclasses.replace(self.problem, term_params=tp)

    def get_problem_state(self, data_handler):
        return jnp.concatenate([data_handler.data.q, data_handler.data.v])

    def write_references(self, stage_params, term_params, foot_refs,
                         x_reference, velocity_base, com_ref):
        """Pure per-tick reference update (see OCPHandler.write_references):
        set_all_foot_translations + set_reference_state(T-1) +
        set_velocity_base(T-1) + update_terminal_constraint, fused."""
        T = stage_params.x_ref.shape[0]
        xr = jnp.asarray(x_reference, stage_params.x_ref.dtype)
        xr = xr.at[self.nq: self.nq + 6].set(
            jnp.asarray(velocity_base, xr.dtype))
        sp = stage_params._replace(
            foot_ref_p=jnp.asarray(foot_refs, stage_params.foot_ref_p.dtype),
            x_ref=stage_params.x_ref.at[T - 1].set(xr))
        tp = term_params._replace(
            dcm_ref=jnp.asarray(com_ref, term_params.dcm_ref.dtype))
        return sp, tp
