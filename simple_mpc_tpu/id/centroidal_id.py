"""Centroidal-MPC tracking ID — CoM + swing-foot task extension.

Capability parity with CentroidalID (reference src/inverse-dynamics/
centroidal-id.cpp): base task masked to orientation only (:10-20), CoM task
(:22-29), per-foot SE3 swing-tracking tasks masked to position for point feet
and activated only for feet out of contact (:31-52, 105-139); `setTarget`
delegates to the kinodynamics base with the reference posture (:88-145).

TPU-first: TSID's add/removeTask churn becomes weight masking — tracking
tasks are always rows in the QP with weight w_feet_tracking * (1 - contact).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.handler import QUAD
from ..ops import dynamics as dyn
from ..ops import kinematics as kin
from ..ops import lie
from ..ops.state import integrate as q_integrate
from .kinodynamics_id import IDSettings, KinodynamicsID


class CentroidalID(KinodynamicsID):
    def __init__(self, model_handler, control_dt: float, settings):
        if isinstance(settings, dict):
            settings = IDSettings.from_dict(settings)
        # base task orientation-only mask (centroidal-id.cpp:10-20)
        self._base_mask = np.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
        nk = model_handler.n_feet
        # initial targets from the reference-state FK (centroidal-id.cpp:55-84)
        q_ref = jnp.asarray(model_handler.reference_state[: model_handler.model.nq])
        oR, op = kin.fk(model_handler.model, q_ref)
        fR, fp = kin.frame_placements(model_handler.model, oR, op)
        self._targets = dict(
            com_t=dyn.center_of_mass(model_handler.model, q_ref),
            com_v_t=jnp.zeros(3),
            feet_p_t=jnp.stack([fp[i] for i in model_handler.feet_frame_ids]),
            feet_R_t=jnp.stack([fR[i] for i in model_handler.feet_frame_ids]),
            feet_v_t=jnp.zeros((nk, 6)))
        super().__init__(model_handler, control_dt, settings)

    # ------------------------------------------------------------------
    def set_target(self, *args, **kwargs):
        """Either the centroidal signature (com_pos, com_vel, feet_pose,
        feet_vel, contacts, f) or a pass-through to the kinodynamics base
        during construction."""
        if len(args) == 5 or "q_target" in kwargs:
            return super().set_target(*args, **kwargs)
        com_pos, com_vel, feet_pose, feet_vel, contacts, f_target = args
        Rs, ps, vs = [], [], []
        for k in range(self.nk):
            R, p = feet_pose[k]
            Rs.append(np.asarray(R))
            ps.append(np.asarray(p))
            vs.append(np.asarray(feet_vel[k]).reshape(-1))
        self._targets.update(
            com_t=jnp.asarray(com_pos), com_v_t=jnp.asarray(com_vel),
            feet_R_t=jnp.asarray(np.stack(Rs)),
            feet_p_t=jnp.asarray(np.stack(ps)),
            feet_v_t=jnp.asarray(np.stack(vs)))
        # delegate with reference posture (centroidal-id.cpp:140-144)
        x_ref = np.asarray(self.mh.reference_state)
        super().set_target(x_ref[: self.nq], x_ref[self.nq:],
                           np.zeros(self.nv), contacts, f_target)

    # ------------------------------------------------------------------
    def _extra_tasks(self, q, v, targets, dtype):
        s = self.settings
        contacts = targets["contacts"]
        com_t, com_v_t = targets["com_t"], targets["com_v_t"]
        feet_p_t, feet_R_t = targets["feet_p_t"], targets["feet_R_t"]
        feet_v_t = targets["feet_v_t"]
        m = self.model
        nv, nz, nk, fd = self.nv, self.nz, self.nk, self.fdim
        rows = []

        # CoM task (centroidal-id.cpp:22-29): J_com = Ag_lin / mass
        if s.w_com > 0.0:
            kp = s.kp_com
            kd = 2.0 * np.sqrt(kp)
            Ag = dyn.centroidal_momentum_matrix(m, q)
            Jcom = Ag[:3] / self.mass_()
            com = dyn.center_of_mass(m, q)
            com_v = Jcom @ v
            jdotv = jax.jvp(
                lambda t: (dyn.centroidal_momentum_matrix(
                    m, q_integrate(m, q, t * v))[:3] / self.mass_()) @ v,
                (jnp.zeros((), dtype),), (jnp.ones((), dtype),))[1]
            a_des = kp * (com_t.astype(dtype) - com) + kd * (
                com_v_t.astype(dtype) - com_v)
            J = jnp.zeros((3, nz), dtype).at[:, :nv].set(Jcom)
            rows.append((J, jdotv - a_des, jnp.full((3,), s.w_com, dtype)))

        # swing-foot tracking (centroidal-id.cpp:31-52, 105-139): active for
        # feet NOT in contact; position-only mask for point feet
        if s.w_feet_tracking > 0.0:
            kp = s.kp_feet_tracking
            kd = 2.0 * np.sqrt(kp)
            ref = "local_world_aligned"
            J6 = kin.feet_jacobians(m, q, self.feet_fids, ref)  # (nk,6,nv)
            jdotv6 = jax.jvp(
                lambda t: kin.feet_jacobians(
                    m, q_integrate(m, q, t * v), self.feet_fids, ref) @ v,
                (jnp.zeros((), dtype),), (jnp.ones((), dtype),))[1]
            oR, op = kin.fk(m, q)
            fR, fp = kin.frame_placements(m, oR, op)
            ndim = 6 if self.mh.feet_types[0] == QUAD else 3
            for k, fid in enumerate(self.feet_fids):
                e_pos = feet_p_t[k].astype(dtype) - fp[fid]
                if ndim == 6:
                    Rk = fR[fid]
                    e_rot = Rk @ lie.log3(Rk.T @ feet_R_t[k].astype(dtype))
                    e = jnp.concatenate([e_pos, e_rot])
                    Jk, jdv = J6[k], jdotv6[k]
                    v_ref = feet_v_t[k].astype(dtype)
                else:
                    e = e_pos
                    Jk, jdv = J6[k][:3], jdotv6[k][:3]
                    v_ref = feet_v_t[k][:3].astype(dtype)
                vf = Jk @ v
                a_des = kp * e + kd * (v_ref - vf)
                J = jnp.zeros((ndim, nz), dtype).at[:, :nv].set(Jk)
                w = s.w_feet_tracking * (1.0 - contacts[k])
                rows.append((J, jdv - a_des,
                             jnp.full((ndim,), 1.0, dtype) * w))
        return rows

    def mass_(self):
        return self.mh.mass
