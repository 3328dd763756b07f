"""Centroidal OCP formulation — 9-dim point-mass + angular momentum model.

Reference: src/centroidal-dynamics.cpp (CentroidalOCP).  State
x = [com(3); h_lin(3); h_ang(3)] on a vector space; control = stacked
per-foot forces (3D) or wrenches (6D).  Explicit-Euler integrated ODE
(centroidal-dynamics.cpp:79-81), cone inequality per active contact
(:85-104), base pose/velocity references stored in the momentum-cost
references scaled by mass (:227-257 — semantics preserved exactly).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import cones
from .base import OCPHandler, Problem
from .spaces import VectorSpace


def _diag(w):
    w = np.asarray(w, dtype=np.float64)
    return np.diag(w) if w.ndim == 1 else w


def _dvec(w):
    """Accept vector or (diagonal) matrix weights; store the diagonal."""
    w = np.asarray(w, dtype=np.float64)
    return np.diag(w) if w.ndim == 2 else w


@dataclasses.dataclass
class CentroidalSettings:
    """Field parity with CentroidalSettings (centroidal-dynamics.hpp:33-52)."""

    timestep: float = 0.01
    w_com: np.ndarray = None  # (3,) or (3,3)
    w_u: np.ndarray = None
    w_linear_mom: np.ndarray = None
    w_angular_mom: np.ndarray = None
    w_linear_acc: np.ndarray = None
    w_angular_acc: np.ndarray = None
    gravity: np.ndarray = None  # (3,)
    mu: float = 0.8
    Lfoot: float = 0.1
    Wfoot: float = 0.075
    force_size: int = 3

    @classmethod
    def from_dict(cls, d: dict) -> "CentroidalSettings":
        from ..utils.config import settings_from_dict

        return settings_from_dict(cls, d)


class CentroidalStageParams(NamedTuple):
    contact_active: jnp.ndarray  # (nk,)
    contact_pose: jnp.ndarray  # (nk, 3) foot positions for torque arms
    com_ref: jnp.ndarray  # (3,)
    u_ref: jnp.ndarray  # (nu,)
    linmom_ref: jnp.ndarray  # (3,) = v_base_lin * mass
    angmom_ref: jnp.ndarray  # (3,) = v_base_ang * mass
    land: jnp.ndarray  # (nk,) unused by this formulation


class CentroidalTermParams(NamedTuple):
    linmom_ref: jnp.ndarray
    angmom_ref: jnp.ndarray
    com_ref: jnp.ndarray  # terminal-constraint CoM target (disabled by default)


class CentroidalOCP(OCPHandler):
    def __init__(self, settings, model_handler):
        if isinstance(settings, dict):
            settings = CentroidalSettings.from_dict(settings)
        super().__init__(settings, model_handler)
        self.space = VectorSpace(9)
        self.nk = model_handler.n_feet
        self.fs = settings.force_size
        self.nu = self.nk * self.fs
        self.mass = model_handler.mass
        self.n_eq = 0
        self.n_in = self.nk * (5 if self.fs == 3 else 17)
        self.n_term_eq = 0  # terminal CoM constraint disabled (ref :318-328)

    # -- params construction -------------------------------------------------
    def make_stage_params(self, active, poses_R, poses_p, forces, land):
        return CentroidalStageParams(
            contact_active=jnp.asarray(active),
            contact_pose=jnp.asarray(poses_p),
            com_ref=jnp.zeros(3),
            u_ref=jnp.asarray(np.asarray(forces).reshape(-1)),
            linmom_ref=jnp.zeros(3),
            angmom_ref=jnp.zeros(3),
            land=jnp.asarray(land),
        )

    def make_term_params(self, x0, terminal_constraint):
        return CentroidalTermParams(
            linmom_ref=jnp.zeros(3), angmom_ref=jnp.zeros(3), com_ref=x0[:3]
        )

    # -- dynamics (CentroidalFwdDynamics + IntegratorEuler) ------------------
    def ode(self, x, u, p: CentroidalStageParams):
        m = self.mass
        g = jnp.asarray(self.settings.gravity, dtype=x.dtype)
        com, h, L = x[:3], x[3:6], x[6:9]
        f = u.reshape(self.nk, self.fs) * p.contact_active[:, None]
        fsum = jnp.sum(f[:, :3], axis=0)
        arm = p.contact_pose - com[None, :]
        tau = jnp.sum(jnp.cross(arm, f[:, :3]), axis=0)
        if self.fs == 6:
            tau = tau + jnp.sum(f[:, 3:], axis=0)
        return jnp.concatenate([h / m, fsum + m * g, tau])

    def dynamics(self, x, u, p):
        """Explicit Euler (centroidal-dynamics.cpp:79-81)."""
        return x + self.settings.timestep * self.ode(x, u, p)

    # -- costs ---------------------------------------------------------------
    def cost_residuals(self, x, u, p: CentroidalStageParams):
        s = self.settings
        m = self.mass
        g = jnp.asarray(s.gravity, dtype=x.dtype)
        f = u.reshape(self.nk, self.fs) * p.contact_active[:, None]
        fsum = jnp.sum(f[:, :3], axis=0)
        arm = p.contact_pose - x[:3][None, :]
        tau = jnp.sum(jnp.cross(arm, f[:, :3]), axis=0)
        if self.fs == 6:
            tau = tau + jnp.sum(f[:, 3:], axis=0)
        r = jnp.concatenate([
            x[:3] - p.com_ref,            # com_cost
            u - p.u_ref,                  # control_cost
            x[3:6] - p.linmom_ref,        # linear_mom_cost
            x[6:9] - p.angmom_ref,        # angular_mom_cost
            fsum / m + g,                 # linear_acc_cost
            tau,                          # angular_acc_cost
        ])
        w = jnp.concatenate([jnp.asarray(_dvec(s.w_com)), jnp.asarray(_dvec(s.w_u)),
                             jnp.asarray(_dvec(s.w_linear_mom)),
                             jnp.asarray(_dvec(s.w_angular_mom)),
                             jnp.asarray(_dvec(s.w_linear_acc)),
                             jnp.asarray(_dvec(s.w_angular_acc))]).astype(x.dtype)
        return r, w

    def term_residuals(self, x, p: CentroidalTermParams):
        s = self.settings
        r = jnp.concatenate([x[3:6] - p.linmom_ref, x[6:9] - p.angmom_ref])
        w = jnp.concatenate([jnp.asarray(_dvec(s.w_linear_mom)),
                             jnp.asarray(_dvec(s.w_angular_mom))]).astype(x.dtype)
        return r, w

    # -- constraints ---------------------------------------------------------
    def eq_constraints(self, x, u, p):
        return jnp.zeros(0, dtype=x.dtype)

    def ineq_constraints(self, x, u, p: CentroidalStageParams):
        s = self.settings
        f = u.reshape(self.nk, self.fs)
        rows = []
        for k in range(self.nk):
            if self.fs == 3:
                r = cones.friction_cone(f[k], s.mu)
            else:
                r = cones.wrench_cone(f[k], s.mu, s.Lfoot, s.Wfoot)
            rows.append(cones.mask_ineq(r, p.contact_active[k] > 0.5))
        return jnp.concatenate(rows)

    def term_eq_constraints(self, x, p):
        return jnp.zeros(0, dtype=x.dtype)

    # -- reference get/setters (semantics of centroidal-dynamics.cpp) -------
    def set_reference_pose(self, t: int, ee_name: str, R, pos):
        k = self.model_handler.foot_nb(ee_name)
        sp = self.problem.stage_params
        sp = sp._replace(contact_pose=sp.contact_pose.at[t, k].set(jnp.asarray(pos)))
        self.problem = dataclasses.replace(self.problem, stage_params=sp)

    def get_reference_pose(self, t: int, ee_name: str):
        k = self.model_handler.foot_nb(ee_name)
        return jnp.eye(3), self.problem.stage_params.contact_pose[t, k]

    def compute_control_from_forces(self, force_refs: dict):
        """Assemble the stacked control reference from per-foot force refs
        (CentroidalOCP::computeControlFromForces, centroidal-dynamics.cpp:108-119;
        functional: returns the vector instead of mutating internal state)."""
        us = []
        for n in self.model_handler.feet_names:
            f = jnp.asarray(force_refs[n])
            if f.shape[0] != self.fs:
                raise RuntimeError(
                    "force size in settings does not match reference force size")
            us.append(f)
        return jnp.concatenate(us)

    def set_reference_forces(self, t: int, force_refs: dict):
        self.set_reference_control(t, self.compute_control_from_forces(force_refs))

    def set_reference_force(self, t: int, ee_name: str, force_ref):
        k = self.model_handler.foot_nb(ee_name)
        u = self.problem.stage_params.u_ref[t]
        u = u.at[k * self.fs: (k + 1) * self.fs].set(jnp.asarray(force_ref))
        self.set_reference_control(t, u)

    def get_reference_force(self, t: int, ee_name: str):
        k = self.model_handler.foot_nb(ee_name)
        return self.problem.stage_params.u_ref[t, k * self.fs: (k + 1) * self.fs]

    def set_velocity_base(self, t: int, velocity_base):
        """Stored as momentum refs x mass (centroidal-dynamics.cpp:227-239)."""
        v = jnp.asarray(velocity_base)
        sp = self.problem.stage_params
        sp = sp._replace(
            linmom_ref=sp.linmom_ref.at[t].set(v[:3] * self.mass),
            angmom_ref=sp.angmom_ref.at[t].set(v[3:] * self.mass),
        )
        self.problem = dataclasses.replace(self.problem, stage_params=sp)

    def get_velocity_base(self, t: int):
        sp = self.problem.stage_params
        return jnp.concatenate([sp.linmom_ref[t] / self.mass, sp.angmom_ref[t] / self.mass])

    def set_pose_base(self, t: int, pose_base):
        sp = self.problem.stage_params
        sp = sp._replace(com_ref=sp.com_ref.at[t].set(jnp.asarray(pose_base)))
        self.problem = dataclasses.replace(self.problem, stage_params=sp)

    def get_pose_base(self, t: int):
        return self.problem.stage_params.com_ref[t]

    def set_reference_state(self, t: int, x_ref):
        """[pose_base(3); velocity_base(6)] — exact reference semantics
        (centroidal-dynamics.cpp setReferenceState/getReferenceState)."""
        x_ref = jnp.asarray(x_ref)
        self.set_pose_base(t, x_ref[:3])
        self.set_velocity_base(t, x_ref[3:])

    def get_reference_state(self, t: int):
        return jnp.concatenate([self.get_pose_base(t), self.get_velocity_base(t)])

    def set_all_foot_translations(self, refs):
        """Batched (T, nk, 3) write of every stage's foot positions — the
        fused equivalent of the per-stage setReferencePose loop
        (mpc.cpp:304-308)."""
        sp = self.problem.stage_params._replace(contact_pose=jnp.asarray(refs))
        self.problem = dataclasses.replace(self.problem, stage_params=sp)

    def state_derivative(self, x, u, p):
        """Continuous xdot (MPC::getStateDerivative capability,
        mpc.cpp:346-352)."""
        return self.ode(x, u, p)

    def update_terminal_constraint(self, com_ref):
        tp = self.problem.term_params._replace(com_ref=jnp.asarray(com_ref))
        self.problem = dataclasses.replace(self.problem, term_params=tp)

    def get_problem_state(self, data_handler):
        return data_handler.get_centroidal_state()

    def x0_from_measurement(self, x):
        """[com; h_lin; h_ang] from a measured full robot state (the
        jit-pure counterpart of get_centroidal_state)."""
        from ..ops import dynamics as dyn

        m = self.model_handler.model
        q, v = x[: m.nq], x[m.nq:]
        com = dyn.center_of_mass(m, q)
        hg = dyn.centroidal_momentum(m, q, v)
        return jnp.concatenate([com, hg])

    def write_references(self, stage_params, term_params, foot_refs,
                         x_reference, velocity_base, com_ref):
        """Pure per-tick reference update.  Net effect of the host sequence
        set_all_foot_translations + set_reference_state(T-1, x_reference) +
        set_velocity_base(T-1, velocity_base) + update_terminal_constraint:
        the velocity_base write overwrites the momentum refs from
        x_reference[3:]."""
        T = stage_params.com_ref.shape[0]
        xr = jnp.asarray(x_reference, stage_params.com_ref.dtype)
        vb = jnp.asarray(velocity_base, stage_params.com_ref.dtype)
        sp = stage_params._replace(
            contact_pose=jnp.asarray(foot_refs, stage_params.contact_pose.dtype),
            com_ref=stage_params.com_ref.at[T - 1].set(xr[:3]),
            linmom_ref=stage_params.linmom_ref.at[T - 1].set(vb[:3] * self.mass),
            angmom_ref=stage_params.angmom_ref.at[T - 1].set(vb[3:] * self.mass))
        tp = term_params._replace(
            com_ref=jnp.asarray(com_ref, term_params.com_ref.dtype))
        return sp, tp
