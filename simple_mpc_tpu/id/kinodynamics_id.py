"""Whole-body inverse-dynamics QP — 1 kHz low-level control layer.

Capability parity with KinodynamicsID (reference src/inverse-dynamics/
kinodynamics-id.cpp, kinodynamics-id.hpp:22-47): a task-space ID problem over
variables z = [ddq; f] (TSID InverseDynamicsFormulationAccForce), with
  * floating-base dynamics equality  M₆ddq + h₆ = (Jᶜ)₆ᵀ f,
  * per-foot rigid-contact tasks (PD'd motion, Kd = 2√Kp convention,
    kinodynamics-id.cpp:35-47) as hard equalities or weighted costs
    (`contact_motion_equality`, kinodynamics-id.hpp:46),
  * posture + base SE3 motion tasks (kinodynamics-id.cpp:58-90),
  * friction cones, per-foot normal-force bounds ([0.01, 10]·m·g ratios,
    kinodynamics-id.cpp:24-26), joint pos/vel viability bounds, actuation
    bounds (τ recovered as (M ddq + h − Jᶜᵀf) actuated rows),
solved with the batched ADMM QP kernel (qp.py).

TPU-first re-design: TSID's dynamic add/removeRigidContact becomes bound and
weight masking over a static maximal problem — the QP matrices keep one fixed
shape for any contact set, so the 1 kHz tick is a single jitted kernel and
vmaps over robot batches.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.handler import QUAD, RobotModelHandler
from ..ocp.cones import friction_cone_mat, wrench_cone_mat
from ..ops import dynamics as dyn
from ..ops import kinematics as kin
from ..ops.state import integrate as q_integrate
from . import qp

_INF = 1e20


@dataclasses.dataclass
class IDSettings:
    """Field parity with KinodynamicsID::Settings (kinodynamics-id.hpp:22-47)."""

    friction_coefficient: float = 0.6
    contact_weight_ratio_max: float = 10.0
    contact_weight_ratio_min: float = 0.01
    kp_base: float = 0.0
    kp_posture: float = 0.0
    kp_contact: float = 0.0
    w_base: float = -1.0
    w_posture: float = -1.0
    w_contact_motion: float = -1.0
    w_contact_force: float = -1.0
    contact_motion_equality: bool = False
    # CentroidalID extras (centroidal-id.hpp:17-26)
    kp_com: float = 0.0
    kp_feet_tracking: float = 0.0
    w_com: float = -1.0
    w_feet_tracking: float = -1.0
    # foot geometry for the 6D wrench cone (TSID Contact6d corner points)
    Lfoot: float = 0.1
    Wfoot: float = 0.075
    qp_iters: int = 100

    @classmethod
    def from_dict(cls, d: dict) -> "IDSettings":
        from ..utils.config import settings_from_dict

        return settings_from_dict(cls, d)


class KinodynamicsID:
    def __init__(self, model_handler: RobotModelHandler, control_dt: float,
                 settings):
        if isinstance(settings, dict):
            settings = IDSettings.from_dict(settings)
        self.settings = settings
        self.mh = model_handler
        self.model = model_handler.model
        self.dt = float(control_dt)
        m = self.model
        self.nq, self.nv = m.nq, m.nv
        self.nu = m.nv - 6
        self.nk = model_handler.n_feet
        self.fdim = 6 if (model_handler.feet_types
                          and model_handler.feet_types[0] == QUAD) else 3
        self.nz = self.nv + self.nk * self.fdim
        self.weight = model_handler.mass * 9.81
        self.max_f = settings.contact_weight_ratio_max * self.weight
        self.min_f = settings.contact_weight_ratio_min * self.weight
        self.feet_fids = list(model_handler.feet_frame_ids)
        if not hasattr(self, "_base_mask"):
            self._base_mask = np.ones(6)  # CentroidalID masks to orientation
        self._cone_mat = (friction_cone_mat(settings.friction_coefficient)
                          if self.fdim == 3 else
                          wrench_cone_mat(settings.friction_coefficient,
                                          settings.Lfoot, settings.Wfoot))
        self.n_cone = self._cone_mat.shape[0]

        # default target: reference state, all feet in contact, weight/n on z
        # (kinodynamics-id.cpp:95-117)
        x_ref = np.asarray(model_handler.reference_state)
        f0 = np.zeros((self.nk, self.fdim))
        f0[:, 2] = self.weight / self.nk
        self.set_target(x_ref[: self.nq], x_ref[self.nq:], np.zeros(self.nv),
                        [True] * self.nk, f0)
        self._last = None
        self._qp_warm = None
        # dry run (kinodynamics-id.cpp:113-117)
        self.solve(0.0, x_ref[: self.nq], x_ref[self.nq:])

    # ------------------------------------------------------------------
    def set_target(self, q_target, v_target, a_target, contact_state_target,
                   f_target):
        """(kinodynamics-id.cpp:120-186).  Targets live in a pytree passed
        through the jitted solve (a static-self jit would bake them in)."""
        if not hasattr(self, "_targets"):
            self._targets = {}
        f = np.zeros((self.nk, self.fdim))
        for k in range(self.nk):
            f[k] = np.asarray(f_target[k]).reshape(-1)[: self.fdim]
        self._targets.update(
            q_t=jnp.asarray(q_target), v_t=jnp.asarray(v_target),
            a_t=jnp.asarray(a_target),
            contacts=jnp.asarray(np.asarray(contact_state_target, dtype=np.float64)),
            f_t=jnp.asarray(f))

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0,))
    def _assemble_core(self, q, v, targets):
        """Jitted QP-data assembly: (H, g, A, l, u, M, h, JcT)."""
        q_t, v_t, a_t = targets["q_t"], targets["v_t"], targets["a_t"]
        contacts, f_t = targets["contacts"], targets["f_t"]
        s = self.settings
        m = self.model
        nv, nu, nk, fd = self.nv, self.nu, self.nk, self.fdim
        nz = self.nz
        dtype = q.dtype

        M = dyn.crba(m, q)
        h = dyn.nle(m, q, v)
        ref = "local_world_aligned"  # TSID useLocalFrame(false)
        # fused contact Jacobians + Jdot v (shared FK pass)
        def stacked_J(qq):
            J6 = kin.feet_jacobians(m, qq, self.feet_fids, ref)
            return J6[:, :fd, :] if fd == 3 else J6

        Jblocks, Jdot_blocks = jax.jvp(
            lambda t: stacked_J(q_integrate(m, q, t * v)),
            (jnp.zeros((), dtype),), (jnp.ones((), dtype),))
        Jc = Jblocks.reshape(nk * fd, nv)
        jdot_v = (Jdot_blocks @ v).reshape(nk * fd)
        vf = (Jblocks @ v).reshape(nk * fd)

        # J^T stacked for the force part of the dynamics
        JcT = Jc.T  # (nv, nk*fd)

        # ---- task residuals (costs): rows J_r z + r0, weights w ----------
        rows_J: List[jnp.ndarray] = []
        rows_r0: List[jnp.ndarray] = []
        rows_w: List[jnp.ndarray] = []

        # posture task on actuated joints (kinodynamics-id.cpp:58-63)
        if s.w_posture > 0.0:
            kp, w = s.kp_posture, s.w_posture
            kd = 2.0 * np.sqrt(kp)
            a_des = (a_t[6:] + kp * (q_t[7:] - q[7:]) + kd * (v_t[6:] - v[6:]))
            Jp = jnp.zeros((nu, nz), dtype).at[:, 6: nv].set(jnp.eye(nu, dtype=dtype))
            rows_J.append(Jp)
            rows_r0.append(-a_des)
            rows_w.append(jnp.full((nu,), w, dtype))

        # base SE3 task (kinodynamics-id.cpp:66-72; vel/acc rotated to
        # world-aligned with the measured base pose, kinodynamics-id.cpp:219-225)
        if s.w_base > 0.0:
            kp, w = s.kp_base, s.w_base
            kd = 2.0 * np.sqrt(kp)
            bid = self.mh.base_frame_id
            Jb6 = kin.frame_jacobian(m, q, bid, ref)
            oR, op = kin.fk(m, q)
            fR, fp = kin.frame_placements(m, oR, op)
            Rb = fR[bid]
            # target base pose = base pose at the target state
            oRt, opt = kin.fk(m, q_t)
            fRt, fpt = kin.frame_placements(m, oRt, opt)
            from ..ops import lie

            e_pos = fpt[bid] - fp[bid]
            e_rot = Rb @ lie.log3(Rb.T @ fRt[bid])
            e6 = jnp.concatenate([e_pos, e_rot])
            v_t_wa = jnp.concatenate([Rb @ v_t[:3], Rb @ v_t[3:6]])
            a_t_wa = jnp.concatenate([Rb @ a_t[:3], Rb @ a_t[3:6]])
            vb = Jb6 @ v
            jdotv_b = jax.jvp(
                lambda t: kin.frame_jacobian(m, q_integrate(m, q, t * v), bid, ref) @ v,
                (jnp.zeros((), dtype),), (jnp.ones((), dtype),))[1]
            a_des_b = a_t_wa + kp * e6 + kd * (v_t_wa - vb)
            Jb = jnp.zeros((6, nz), dtype).at[:, :nv].set(Jb6)
            rows_J.append(Jb)
            rows_r0.append(jdotv_b - a_des_b)
            rows_w.append(w * jnp.asarray(self._base_mask, dtype))

        # contact force regularization (w_contact_force, setTarget refs)
        if s.w_contact_force > 0.0:
            Jf = jnp.zeros((nk * fd, nz), dtype).at[:, nv:].set(
                jnp.eye(nk * fd, dtype=dtype))
            rows_J.append(Jf)
            rows_r0.append(-f_t.reshape(-1))
            w_mask = jnp.repeat(contacts, fd) * s.w_contact_force
            rows_w.append(w_mask.astype(dtype))

        # contact motion as cost (if not hard equality)
        kp_c = s.kp_contact
        kd_c = 2.0 * np.sqrt(kp_c) if kp_c > 0 else 0.0
        # anchored at the measured foot pose each solve => position error 0;
        # remaining correction is velocity damping (kinodynamics-id.cpp:196-217)
        motion_rhs = jdot_v + kd_c * vf  # J ddq + rhs = 0 desired
        if (not s.contact_motion_equality) and s.w_contact_motion > 0.0:
            Jm = jnp.zeros((nk * fd, nz), dtype).at[:, :nv].set(Jc)
            rows_J.append(Jm)
            rows_r0.append(motion_rhs)
            rows_w.append((jnp.repeat(contacts, fd) * s.w_contact_motion).astype(dtype))

        extra = self._extra_tasks(q, v, targets, dtype)
        for (Je, r0e, we) in extra:
            rows_J.append(Je)
            rows_r0.append(r0e)
            rows_w.append(we)

        Jr = jnp.concatenate(rows_J, axis=0)
        r0 = jnp.concatenate(rows_r0)
        w = jnp.concatenate(rows_w)
        H = (Jr.T * w[None, :]) @ Jr
        g = Jr.T @ (w * r0)
        H = H + 1e-8 * jnp.eye(nz, dtype=dtype)

        # ---- constraints: l <= A z <= u ----------------------------------
        A_rows: List[jnp.ndarray] = []
        lo: List[jnp.ndarray] = []
        hi: List[jnp.ndarray] = []

        # floating-base dynamics (TSID equality): M₆ ddq - (Jᶜᵀf)₆ = -h₆
        A_dyn = jnp.concatenate([M[:6], -JcT[:6]], axis=1)
        A_rows.append(A_dyn)
        lo.append(-h[:6])
        hi.append(-h[:6])

        # contact motion hard equality (contact_motion_equality mode)
        if s.contact_motion_equality:
            Am = jnp.concatenate([Jc, jnp.zeros((nk * fd, nk * fd), dtype)], axis=1)
            A_rows.append(Am)
            act = jnp.repeat(contacts, fd) > 0.5
            lo.append(jnp.where(act, -motion_rhs, -_INF))
            hi.append(jnp.where(act, -motion_rhs, _INF))

        # inactive contact force = 0 (TSID removeRigidContact equivalent)
        Af = jnp.concatenate([jnp.zeros((nk * fd, nv), dtype),
                              jnp.eye(nk * fd, dtype=dtype)], axis=1)
        A_rows.append(Af)
        act = jnp.repeat(contacts, fd) > 0.5
        lo.append(jnp.where(act, -_INF, 0.0))
        hi.append(jnp.where(act, _INF, 0.0))

        # friction/wrench cone rows per foot + normal-force bounds (active)
        C = jnp.asarray(self._cone_mat, dtype)  # (nc, fd)
        Acone = jnp.zeros((nk * self.n_cone, nz), dtype)
        for k in range(nk):
            Acone = Acone.at[k * self.n_cone: (k + 1) * self.n_cone,
                             nv + k * fd: nv + (k + 1) * fd].set(C)
        A_rows.append(Acone)
        cone_act = jnp.repeat(contacts, self.n_cone) > 0.5
        lo.append(jnp.full((nk * self.n_cone,), -_INF, dtype))
        hi.append(jnp.where(cone_act, 0.0, _INF))
        # fz in [min_f, max_f] for active feet
        Afz = jnp.zeros((nk, nz), dtype)
        for k in range(nk):
            Afz = Afz.at[k, nv + k * fd + 2].set(1.0)
        A_rows.append(Afz)
        lo.append(jnp.where(contacts > 0.5, self.min_f, -_INF))
        hi.append(jnp.where(contacts > 0.5, self.max_f, _INF))

        # joint pos/vel viability bounds -> ddq box (TaskJointPosVelAccBounds)
        dt = self.dt
        vmax = jnp.asarray(m.velocity_limit[6:], dtype)
        qlo = jnp.asarray(m.lower_limit[7:], dtype)
        qhi = jnp.asarray(m.upper_limit[7:], dtype)
        qj, vj = q[7:], v[6:]
        dd_hi = jnp.minimum((vmax - vj) / dt,
                            2.0 * (qhi - qj - vj * dt) / dt**2)
        dd_lo = jnp.maximum((-vmax - vj) / dt,
                            2.0 * (qlo - qj - vj * dt) / dt**2)
        Aj = jnp.zeros((nu, nz), dtype).at[:, 6: nv].set(jnp.eye(nu, dtype=dtype))
        A_rows.append(Aj)
        lo.append(jnp.minimum(dd_lo, dd_hi))
        hi.append(jnp.maximum(dd_lo, dd_hi))

        # actuation bounds: tau = (M ddq + h - Jᶜᵀ f) actuated rows
        Atau = jnp.concatenate([M[6:], -JcT[6:]], axis=1)
        taumax = jnp.asarray(m.effort_limit[6:], dtype)
        A_rows.append(Atau)
        lo.append(-taumax - h[6:])
        hi.append(taumax - h[6:])

        A = jnp.concatenate(A_rows, axis=0)
        l = jnp.concatenate(lo)
        u = jnp.concatenate(hi)
        return H, g, A, l, u, M, h, JcT

    @partial(jax.jit, static_argnums=(0,))
    def _solve_core(self, q, v, targets, warm):
        H, g, A, l, u, M, h, JcT = self._assemble_core(q, v, targets)
        sol = qp.solve_qp(H, g, A, l, u, iters=self.settings.qp_iters,
                          z0=None if warm is None else warm[0],
                          y0=None if warm is None else warm[1])
        nv, nk, fd = self.nv, self.nk, self.fdim
        ddq = sol.z[:nv]
        f = sol.z[nv:]
        tau = (M @ ddq + h - JcT @ f)[6:]
        return tau, ddq, f.reshape(nk, fd), sol

    def _extra_tasks(self, q, v, targets, dtype):
        """Hook for CentroidalID's CoM + swing-tracking tasks."""
        return []

    # ------------------------------------------------------------------
    def solve(self, t, q_meas, v_meas):
        """QP solve at the measured state -> actuated torques
        (kinodynamics-id.cpp:188-232)."""
        tau, ddq, f, sol = self._solve_core(
            jnp.asarray(q_meas), jnp.asarray(v_meas), dict(self._targets),
            self._qp_warm)
        self._last = (tau, ddq, f)
        self._qp_warm = (jnp.concatenate([ddq, f.reshape(-1)]), sol.y)
        return tau

    def solve_host(self, t, q_meas, v_meas):
        """Deployment-path solve: assemble on device (jitted), solve the QP
        with the native C++ ADMM (native/qp_admm.cpp) — the robot-side 1 kHz
        configuration (ProxQP role, kinodynamics-id.hpp:84)."""
        from .. import native as native_mod

        H, g, A, l, u, M, h, JcT = self._assemble_core(
            jnp.asarray(q_meas), jnp.asarray(v_meas), dict(self._targets))
        warm = self._qp_warm
        z, y, prim, dual = native_mod.solve_qp_host(
            np.asarray(H), np.asarray(g), np.asarray(A), np.asarray(l),
            np.asarray(u), iters=self.settings.qp_iters,
            z0=None if warm is None else np.asarray(warm[0]),
            y0=None if warm is None else np.asarray(warm[1]))
        nv = self.nv
        ddq, f = z[:nv], z[nv:]
        tau = (np.asarray(M) @ ddq + np.asarray(h) - np.asarray(JcT) @ f)[6:]
        self._last = (tau, ddq, f.reshape(self.nk, self.fdim))
        self._qp_warm = (z, y)
        return tau

    def get_accelerations(self):
        """(kinodynamics-id.cpp:234-237)"""
        return self._last[1]

    def get_forces(self):
        return self._last[2]
