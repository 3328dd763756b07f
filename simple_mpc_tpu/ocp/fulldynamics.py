"""Full-dynamics OCP — constrained articulated dynamics with rigid contact.

Reference: src/fulldynamics.cpp (FullDynamicsOCP).  State (q, v); control =
joint torques (nu = nv-6), actuation [0; I] (fulldynamics.cpp:35-37).
Dynamics = constrained forward dynamics over the active contact set with
Baumgarte correction and proximal regularization (:39, 139-140), 3D LOCAL
point or 6D LOCAL_WORLD_ALIGNED quad contacts (:50-75), semi-implicit
Euler.  Costs: state/control/centroidal/pose/contact-force (:88-137).
Constraints: torque box, joint-limit box, per-contact cones on the implicit
contact force, landing velocity + height equalities (:144-211).
Terminal: state + 10x centroidal cost (:418-430), DCM equality (:432-445).
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
class FullDynamicsSettings:
    """Field parity with FullDynamicsSettings (fulldynamics.hpp:28-65)."""

    timestep: float = 0.01
    w_x: np.ndarray = None
    w_u: np.ndarray = None
    w_cent: np.ndarray = None
    w_forces: np.ndarray = None
    w_frame: np.ndarray = None
    gravity: np.ndarray = None
    force_size: int = 3
    Kp_correction: np.ndarray = None
    Kd_correction: np.ndarray = None
    umin: np.ndarray = None
    umax: np.ndarray = None
    qmin: np.ndarray = None
    qmax: np.ndarray = None
    mu: float = 0.8
    Lfoot: float = 0.1
    Wfoot: float = 0.075
    torque_limits: bool = True
    kinematics_limits: bool = True
    force_cone: bool = True
    land_cstr: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "FullDynamicsSettings":
        from ..utils.config import settings_from_dict

        return settings_from_dict(cls, d)


class FullStageParams(NamedTuple):
    contact_active: jnp.ndarray  # (nk,)
    foot_ref_R: jnp.ndarray  # (nk,3,3)
    foot_ref_p: jnp.ndarray  # (nk,3)
    x_ref: jnp.ndarray  # (nx,)
    u_ref: jnp.ndarray  # (nu,) control-cost target (zeros in reference)
    f_ref: jnp.ndarray  # (nk, force_size) contact-force cost references
    land: jnp.ndarray  # (nk,)


class FullTermParams(NamedTuple):
    x_ref: jnp.ndarray
    dcm_ref: jnp.ndarray


class FullDynamicsOCP(OCPHandler):
    def __init__(self, settings, model_handler):
        if isinstance(settings, dict):
            settings = FullDynamicsSettings.from_dict(settings)
        super().__init__(settings, model_handler)
        self.model = model_handler.model
        self.space = MultibodyPhaseSpace(self.model)
        self.nk = model_handler.n_feet
        self.fs = settings.force_size
        nv = self.model.nv
        self.nv, self.nq = nv, self.model.nq
        self.nu = nv - 6
        self.mass = model_handler.mass
        self.feet_fids = list(model_handler.feet_frame_ids)
        # Vector Baumgarte corrector gains, one entry per contact dimension,
        # installed identically on every contact (fulldynamics.cpp:58-74;
        # the reference rejects sizes != force_size, :41-48)
        self.vel_dim = 3 if settings.force_size == 3 else 6

        def _gain(g):
            if g is None:
                return 0.0
            arr = np.asarray(g, dtype=np.float64).reshape(-1)
            if arr.size == 1:
                return float(arr[0])
            if arr.size != self.vel_dim:
                raise ValueError(
                    "Force must be of same size as Kp correction"
                    f" (got {arr.size}, force_size={settings.force_size})")
            return arr

        self.kp = _gain(settings.Kp_correction)
        self.kd = _gain(settings.Kd_correction)
        self.prox_mu = 1e-9
        n_land_vel = self.nk * (3 if self.fs == 3 else 6) if settings.land_cstr else 0
        n_land_h = self.nk if (settings.land_cstr and self.fs == 3) else 0
        self.n_eq = n_land_vel + n_land_h
        n_box = (2 * self.nu if settings.torque_limits else 0) + (
            2 * (nv - 6) if settings.kinematics_limits else 0)
        n_cone = self.nk * (5 if self.fs == 3 else 17) if settings.force_cone else 0
        self.n_in = n_box + n_cone
        self.n_term_eq = 3
        self._use_term_eq = False

    @property
    def u_scale(self):
        """Per-joint torque magnitudes for solver nondimensionalization
        (SolverSettings.u_scale="auto"): the actuator effort limits span
        3-300 Nm across a humanoid, so scaling each torque by its own
        limit keeps the Riccati pipeline O(1) per coordinate."""
        lim = np.asarray(self.model.effort_limit[6:], np.float64)
        return np.where(np.isfinite(lim) & (lim > 0), lim, 1.0)

    # -- params --------------------------------------------------------------
    def make_stage_params(self, active, poses_R, poses_p, forces, land):
        return FullStageParams(
            contact_active=jnp.asarray(active),
            foot_ref_R=jnp.asarray(poses_R),
            foot_ref_p=jnp.asarray(poses_p),
            x_ref=jnp.asarray(self.model_handler.reference_state),
            u_ref=jnp.zeros(self.nu),
            f_ref=jnp.asarray(np.asarray(forces).reshape(self.nk, self.fs)),
            land=jnp.asarray(land),
        )

    def make_term_params(self, x0, terminal_constraint):
        self._use_term_eq = bool(terminal_constraint)
        self.n_term_eq = 3 if terminal_constraint else 0
        com0 = dyn.center_of_mass(self.model, x0[: self.nq])
        return FullTermParams(
            x_ref=jnp.asarray(self.model_handler.reference_state), dcm_ref=com0
        )

    # -- dynamics ------------------------------------------------------------
    def _constrained_acc(self, x, u, p: FullStageParams):
        """(ddq, forces): constrained dynamics over the masked contact set.
        Anchor poses for Baumgarte = the per-stage foot pose references."""
        q, v = x[: self.nq], x[self.nq:]
        tau_full = jnp.concatenate([jnp.zeros(6, x.dtype), u])
        return dyn.constrained_fwd_dynamics(
            self.model, q, v, tau_full, self.feet_fids, p.contact_active,
            contact_dim=self.vel_dim,
            contact_ref_R=p.foot_ref_R, contact_ref_p=p.foot_ref_p,
            kp=self.kp, kd=self.kd, prox_mu=self.prox_mu,
        )

    def _integrate_acc(self, x, a):
        """Semi-implicit Euler from a generalized acceleration."""
        dt = self.settings.timestep
        q, v = x[: self.nq], x[self.nq:]
        v_next = v + dt * a
        from ..ops import state as st

        q_next = st.integrate(self.model, q, dt * v_next)
        return jnp.concatenate([q_next, v_next])

    def dynamics(self, x, u, p):
        a, _ = self._constrained_acc(x, u, p)
        return self._integrate_acc(x, a)

    def stage_eval(self, x, u, p):
        """Fused bundle: the constrained-dynamics KKT solve is evaluated
        ONCE and shared by the force cost, the force cones, and the
        integrator (the solver differentiates this whole bundle in one
        forward-mode pass)."""
        a, forces = self._constrained_acc(x, u, p)
        r, w = self._cost_residuals_with(x, u, p, forces)
        g = self.eq_constraints(x, u, p)
        h = self._ineq_with(x, u, p, forces)
        return r, w, g, h, self._integrate_acc(x, a)

    def stage_eval_soa(self, X, U, P: FullStageParams):
        """Trailing-batch stage_eval: the whole horizon rides the vector
        lanes (see ops/soa.py).  The constrained-dynamics KKT solve runs as
        lane-unrolled Cholesky factorizations (ops/soa_dyn.py) shared by
        the force cost, the force cones and the integrator — semantically
        identical to vmap(stage_eval) (pinned by tests), laid out for the
        TPU.  Reference semantics: fulldynamics.cpp:88-211."""
        s = self.settings
        m = self.model
        dtype = X.dtype
        N = X.shape[-1]
        q, v = X[: self.nq], X[self.nq:]
        tau_full = jnp.concatenate([jnp.zeros((6, N), dtype), U], axis=0)

        from ..ops import soa, soa_dyn

        tab = soa._world.tables(m)
        feet_ids = np.asarray(self.feet_fids)
        feet_par = tab.fparent[feet_ids]

        oR, op = soa.fk_world(m, q)
        Sw = soa.world_axes(m, oR, op)
        vW = soa.body_velocities(m, Sw, v)
        IW = soa_dyn.body_inertias_world(m, oR, op)
        com = soa.com_world(m, oR, op)
        fRw, fpw = soa.frame_placements_world(m, oR, op, feet_ids)
        hg = soa.agx(m, oR, op, Sw, v, com)

        a, forces = soa_dyn.constrained_fwd_dynamics_soa(
            m, q, v, tau_full, self.feet_fids, P.contact_active,
            dim=self.vel_dim, ref_R=P.foot_ref_R, ref_p=P.foot_ref_p,
            kp=self.kp, kd=self.kd, prox_mu=self.prox_mu,
            precomp=(oR, op, Sw, vW, IW))

        dt = s.timestep
        v_next = v + dt * a
        xnext = jnp.concatenate(
            [soa.integrate(m, q, dt * v_next), v_next], axis=0)

        # costs (fulldynamics.cpp:88-137 inventory, same order as stage_eval)
        r_state = soa.state_difference(m, P.x_ref, X)
        r_u = U - P.u_ref
        if self.fs == 6:
            dR = soa.mtm(P.foot_ref_R, fRw)
            dp = soa.mtv(P.foot_ref_R, fpw - P.foot_ref_p)
            foot_r = soa.log6(dR, dp).reshape(-1, N)
        else:
            foot_r = (fpw - P.foot_ref_p).reshape(-1, N)
        # f_ref arrives as (nk, fs, N): the (T, nk, fs) stage param with its
        # stage axis moved minor-most by the solver's _transpose_params
        rf = ((forces - P.f_ref) * P.contact_active[:, None, :]).reshape(-1, N)
        r = jnp.concatenate([r_state, r_u, hg, foot_r, rf], axis=0)
        w = jnp.concatenate(
            [jnp.asarray(_dvec(s.w_x)), jnp.asarray(_dvec(s.w_u)),
             jnp.asarray(_dvec(s.w_cent))]
            + [jnp.asarray(_dvec(s.w_frame))] * self.nk
            + [jnp.asarray(_dvec(s.w_forces))] * self.nk
        ).astype(dtype)

        # equality constraints: landing velocity (world-aligned) + height
        if s.land_cstr:
            v_wa, _ = soa.frame_velocities_world(m, vW, fRw, fpw, feet_par)
            vf = v_wa[:, :3] if self.fs == 3 else v_wa
            on = ((P.land > 0.5) & (P.contact_active > 0.5))[:, None, :]
            geq = jnp.where(on, vf, 0.0).reshape(-1, N)
            if self.fs == 3:
                land_r = fpw[:, 2] - P.foot_ref_p[:, 2]
                geq = jnp.concatenate(
                    [geq, jnp.where(on[:, 0], land_r, 0.0)], axis=0)
        else:
            geq = jnp.zeros((0, N), dtype)

        # inequalities: torque box, joint box, cones on the implicit forces
        rows = []
        if s.torque_limits:
            lo = jnp.asarray(s.umin, dtype)[:, None]
            hi = jnp.asarray(s.umax, dtype)[:, None]
            b = jnp.concatenate([U - hi, lo - U], axis=0)
            rows.append(jnp.where(jnp.isfinite(b), b, -1.0))
        if s.kinematics_limits:
            qj = X[7: self.nq]
            lo = jnp.asarray(s.qmin, dtype)[:, None]
            hi = jnp.asarray(s.qmax, dtype)[:, None]
            b = jnp.concatenate([qj - hi, lo - qj], axis=0)
            rows.append(jnp.where(jnp.isfinite(b), b, -1.0))
        if s.force_cone:
            A = (cones.friction_cone_mat(s.mu) if self.fs == 3
                 else cones.wrench_cone_mat(s.mu, s.Lfoot, s.Wfoot))
            cr = jnp.einsum("cf,kfn->kcn", jnp.asarray(A, dtype), forces)
            if self.fs == 3:
                cr = cr.at[:, 0].add(cones.FRICTION_EPS)
            cr = jnp.where(P.contact_active[:, None, :] > 0.5, cr, -1.0)
            rows.append(cr.reshape(-1, N))
        h = (jnp.concatenate(rows, axis=0) if rows
             else jnp.zeros((0, N), dtype))
        return r, w, geq, h, xnext

    def get_contact_forces(self, x, u, p):
        """Constraint forces (MPC::getContactForces capability,
        mpc.cpp:354-380)."""
        return self._constrained_acc(x, u, p)[1]

    # -- costs ---------------------------------------------------------------
    def cost_residuals(self, x, u, p: FullStageParams):
        _, forces = self._constrained_acc(x, u, p)
        return self._cost_residuals_with(x, u, p, forces)

    def _cost_residuals_with(self, x, u, p: FullStageParams, forces):
        s = self.settings
        q, v = x[: self.nq], x[self.nq:]
        r_state = self.space.difference(p.x_ref, x)
        r_u = u - p.u_ref
        hg = dyn.centroidal_momentum(self.model, q, v)
        oR, op = kin.fk(self.model, q)
        fR, fp = kin.frame_placements(self.model, oR, op)
        foot_rs = []
        for k, fid in enumerate(self.feet_fids):
            if self.fs == 6:
                dR = p.foot_ref_R[k].T @ fR[fid]
                dp = p.foot_ref_R[k].T @ (fp[fid] - p.foot_ref_p[k])
                foot_rs.append(lie.log6((dR, dp)))
            else:
                foot_rs.append(fp[fid] - p.foot_ref_p[k])
        # contact-force cost (active contacts only; masked otherwise)
        rf = ((forces - p.f_ref) * p.contact_active[:, None]).reshape(-1)
        r = jnp.concatenate([r_state, r_u, hg] + foot_rs + [rf])
        wf = _dvec(s.w_frame)
        w = jnp.concatenate(
            [jnp.asarray(_dvec(s.w_x)), jnp.asarray(_dvec(s.w_u)),
             jnp.asarray(_dvec(s.w_cent))]
            + [jnp.asarray(wf)] * self.nk
            + [jnp.asarray(_dvec(s.w_forces))] * self.nk
        ).astype(x.dtype)
        return r, w

    def term_residuals(self, x, p: FullTermParams):
        s = self.settings
        q, v = x[: self.nq], x[self.nq:]
        r_state = self.space.difference(p.x_ref, x)
        hg = dyn.centroidal_momentum(self.model, q, v)
        r = jnp.concatenate([r_state, hg])
        w = jnp.concatenate(
            [jnp.asarray(_dvec(s.w_x)), 10.0 * jnp.asarray(_dvec(s.w_cent))]
        ).astype(x.dtype)
        return r, w

    # -- constraints ---------------------------------------------------------
    def eq_constraints(self, x, u, p: FullStageParams):
        s = self.settings
        if not s.land_cstr:
            return jnp.zeros(0, x.dtype)
        q, v = x[: self.nq], x[self.nq:]
        rows = []
        for k, fid in enumerate(self.feet_fids):
            vf = kin.frame_velocity(self.model, q, v, fid, "local_world_aligned")
            r = vf[:3] if self.fs == 3 else vf
            rows.append(cones.mask_eq(r, (p.land[k] > 0.5) & (p.contact_active[k] > 0.5)))
        if self.fs == 3:
            oR, op = kin.fk(self.model, q)
            fR, fp = kin.frame_placements(self.model, oR, op)
            for k, fid in enumerate(self.feet_fids):
                r = (fp[fid][2] - p.foot_ref_p[k][2])[None]
                rows.append(cones.mask_eq(r, (p.land[k] > 0.5) & (p.contact_active[k] > 0.5)))
        return jnp.concatenate(rows)

    def ineq_constraints(self, x, u, p: FullStageParams):
        if self.settings.force_cone:
            _, forces = self._constrained_acc(x, u, p)
        else:
            forces = None
        return self._ineq_with(x, u, p, forces)

    def _ineq_with(self, x, u, p: FullStageParams, forces):
        s = self.settings
        rows = []
        if s.torque_limits:
            rows.append(cones.mask_ineq(
                cones.box(u, jnp.asarray(s.umin), jnp.asarray(s.umax)), True))
        if s.kinematics_limits:
            qj = x[7: self.nq]
            rows.append(cones.mask_ineq(
                cones.box(qj, jnp.asarray(s.qmin), jnp.asarray(s.qmax)), True))
        if s.force_cone:
            for k in range(self.nk):
                r = (cones.friction_cone(forces[k], s.mu) if self.fs == 3
                     else cones.wrench_cone(forces[k], s.mu, s.Lfoot, s.Wfoot))
                rows.append(cones.mask_ineq(r, p.contact_active[k] > 0.5))
        return jnp.concatenate(rows) if rows else jnp.zeros(0, x.dtype)

    def term_eq_constraints(self, x, p: FullTermParams):
        if not self._use_term_eq:
            return jnp.zeros(0, x.dtype)
        q, v = x[: self.nq], x[self.nq:]
        com = dyn.center_of_mass(self.model, q)
        h = dyn.centroidal_momentum(self.model, q, v)
        tau = jnp.sqrt(p.dcm_ref[2] / 9.81)
        return com + tau * h[:3] / self.mass - p.dcm_ref

    def set_all_foot_translations(self, refs):
        """Batched (T, nk, 3) write of every stage's foot pose-cost targets
        (fused equivalent of the setReferencePose loop, mpc.cpp:304-308)."""
        sp = self.problem.stage_params._replace(foot_ref_p=jnp.asarray(refs))
        self.problem = dataclasses.replace(self.problem, stage_params=sp)

    def state_derivative(self, x, u, p):
        """Continuous xdot [v; a] (MPC::getStateDerivative, mpc.cpp:346-352)."""
        v = x[self.nq:]
        return jnp.concatenate([v, self._constrained_acc(x, u, p)[0]])

    # -- reference get/setters (mirror kinodynamics + force-cost refs) -------
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

    def set_reference_force(self, t: int, ee_name: str, force_ref):
        k = self.model_handler.foot_nb(ee_name)
        sp = self.problem.stage_params
        sp = sp._replace(f_ref=sp.f_ref.at[t, k].set(jnp.asarray(force_ref)))
        self.problem = dataclasses.replace(self.problem, stage_params=sp)

    def set_reference_forces(self, t: int, force_refs: dict):
        for name, f in force_refs.items():
            self.set_reference_force(t, name, f)

    def get_reference_force(self, t: int, ee_name: str):
        k = self.model_handler.foot_nb(ee_name)
        return self.problem.stage_params.f_ref[t, k]

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
        """Pure per-tick reference update (see OCPHandler.write_references)."""
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
