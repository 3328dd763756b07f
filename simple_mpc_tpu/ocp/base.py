"""OCP formulation base: stage-parameter pytrees + problem assembly.

Reference capability: src/ocp-handler.cpp (createProblem/createStages,
reference get/setters) re-designed functionally: a "problem" is a pytree of
stacked per-stage parameter arrays with static shapes; the reference's
mutate-a-stage API becomes indexed functional updates; heterogeneous stage
structure (contact-dependent constraint sets) becomes masking over a static
maximal structure (SURVEY.md §7 "the single most important architectural
translation").
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.handler import RobotModelHandler


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Problem:
    """Trajectory-optimization problem as data (aligator TrajOptProblem
    equivalent, ocp-handler.cpp:130): x0 + stacked stage params + terminal
    params.  The formulation object (static) gives the params meaning."""

    x0: jnp.ndarray
    stage_params: Any  # pytree, leaves have leading dim T
    term_params: Any  # pytree (single stage)

    @property
    def horizon(self) -> int:
        return int(jax.tree_util.tree_leaves(self.stage_params)[0].shape[0])

    def astype(self, dtype) -> "Problem":
        """Cast every floating leaf (the TPU deployment path runs f32 on a
        problem built in f64)."""
        dtype = jnp.dtype(dtype)

        def cast(a):
            a = jnp.asarray(a)
            return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

        return jax.tree_util.tree_map(cast, self)


def stack_params(params_list: Sequence[Any]):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def index_params(stacked: Any, t):
    return jax.tree_util.tree_map(lambda x: x[t], stacked)


def update_params(stacked: Any, t, new: Any):
    return jax.tree_util.tree_map(lambda s, n: s.at[t].set(n), stacked, new)


def roll_params(stacked: Any, new_last: Any):
    """Drop stage 0, append new_last — the receding-horizon shift
    (problem.replaceStageCircular + cycleProblem, mpc.cpp:225-226)."""
    return jax.tree_util.tree_map(
        lambda s, n: jnp.concatenate([s[1:], n[None]], axis=0), stacked, new_last
    )


class OCPHandler:
    """Abstract base (reference ocp-handler.hpp:42-164).

    Subclasses define: space, nu, n_eq, n_in, make_stage_params,
    make_term_params, cost_residuals, term_residuals, dynamics,
    eq_constraints, ineq_constraints, term_eq_constraints, and the
    formulation-specific reference get/setters.
    """

    def __init__(self, settings, model_handler: RobotModelHandler):
        self.settings = settings
        self.model_handler = model_handler
        self.problem: Optional[Problem] = None

    # -- sizes (overridden) --------------------------------------------------
    nu: int
    n_eq: int = 0
    n_in: int = 0
    n_term_eq: int = 0

    # -- problem construction (ocp-handler.cpp:96-137) ----------------------
    def create_problem(self, x0, horizon: int, force_size: int, gravity: float,
                       terminal_constraint: bool = False) -> Problem:
        """All-feet-in-contact standing horizon; per-foot vertical force
        m*g/n_feet."""
        mh = self.model_handler
        nk = mh.n_feet
        fref = np.zeros(force_size)
        fref[2] = -mh.mass * gravity / nk
        # foot poses from the reference state FK
        from ..ops import kinematics

        q_ref = jnp.asarray(mh.reference_state[: mh.model.nq])
        oR, op = kinematics.fk(mh.model, q_ref)
        fR, fp = kinematics.frame_placements(mh.model, oR, op)
        poses_R = np.stack([np.asarray(fR[i]) for i in mh.feet_frame_ids])
        poses_p = np.stack([np.asarray(fp[i]) for i in mh.feet_frame_ids])

        contact_states = [dict((n, True) for n in mh.feet_names)] * horizon
        contact_poses = [(poses_R, poses_p)] * horizon
        contact_forces = [np.tile(fref, (nk, 1))] * horizon
        stages = self.create_stages(contact_states, contact_poses, contact_forces)
        term = self.make_term_params(jnp.asarray(x0), terminal_constraint)
        self.problem = Problem(x0=jnp.asarray(x0), stage_params=stages, term_params=term)
        self.terminal_constraint = terminal_constraint
        return self.problem

    def create_stages(self, contact_phases: List[Dict[str, bool]],
                      contact_poses, contact_forces):
        """Walk a contact-phase sequence; flag land_constraint on the
        contact-making stage (ocp-handler.cpp:21-56)."""
        mh = self.model_handler
        params = []
        for t, phase in enumerate(contact_phases):
            land = {}
            for name in mh.feet_names:
                if t >= 1 and phase[name] and not contact_phases[t - 1][name]:
                    land[name] = True
                else:
                    land[name] = False
            active = np.array([float(phase[n]) for n in mh.feet_names])
            land_v = np.array([float(land[n]) for n in mh.feet_names])
            pR, pp = contact_poses[t]
            params.append(
                self.make_stage_params(active, np.asarray(pR), np.asarray(pp),
                                       np.asarray(contact_forces[t]), land_v)
            )
        return stack_params(params)

    # -- fused stage evaluation ----------------------------------------------
    def stage_eval(self, x, u, p):
        """(cost residuals, weights, eq, ineq, next state) in one pass.

        Formulations whose pieces share expensive subcomputations (e.g. the
        full-dynamics constrained-KKT solve) override this to evaluate them
        once; the solver builds everything from this single bundle."""
        r, w = self.cost_residuals(x, u, p)
        g = self.eq_constraints(x, u, p)
        h = self.ineq_constraints(x, u, p)
        xnext = self.dynamics(x, u, p)
        return r, w, g, h, xnext

    # -- common reference plumbing (ocp-handler.cpp:58-94) -------------------
    def set_reference_control(self, t: int, u_ref):
        sp = self.problem.stage_params
        sp = sp._replace(u_ref=sp.u_ref.at[t].set(jnp.asarray(u_ref)))
        self.problem = dataclasses.replace(self.problem, stage_params=sp)

    def get_reference_control(self, t: int):
        return self.problem.stage_params.u_ref[t]

    def get_contact_state(self, t: int):
        return [bool(b) for b in np.asarray(self.problem.stage_params.contact_active[t]) > 0.5]

    def get_contact_support(self, t: int) -> int:
        return int(np.asarray(self.problem.stage_params.contact_active[t]).sum())

    def set_init_state(self, x0):
        self.problem = dataclasses.replace(self.problem, x0=jnp.asarray(x0))

    # -- pure hooks for the fused (on-device) MPC tick ------------------------
    def x0_from_measurement(self, x):
        """Problem initial state from a measured full robot state (q, v) —
        jit-pure counterpart of get_problem_state(data_handler).  Identity
        for multibody-state formulations; centroidal overrides."""
        return x

    def write_references(self, stage_params, term_params, foot_refs,
                         x_reference, velocity_base, com_ref):
        """Pure counterpart of the per-tick reference writes in
        MPC::updateStepTrackerReferences (mpc.cpp:304-323): batched foot
        pose-cost targets for every stage, terminal state/base-velocity ref
        on stage T-1, and the terminal-constraint CoM target.  Must match
        the host setters exactly (tests pin this)."""
        raise NotImplementedError
