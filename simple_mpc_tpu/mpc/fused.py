"""Fused on-device MPC tick — the whole receding-horizon iteration as ONE
jitted XLA program.

The host `MPC.iterate` (mpc.py) mirrors the reference's orchestration
(mpc.cpp:189-218) with Python control flow between device calls; this module
is the TPU-first re-design promised in SURVEY.md §3.3: "iterate = one jitted
step: roll parameter arrays, recompute swing refs (jnp), one solver
iteration, all on device; host only feeds x_measured and reads us[0], K[0]".

Everything the host engine keeps as Python state becomes a carry pytree:

  * the problem's stacked stage params + the cyclic stage-parameter pool
    (replaceStageCircular/cycleProblem, mpc.cpp:225-226, = array rolls);
  * the contact plan as a (L, nk) float array, rolled in lockstep;
  * the takeoff/land event queues (host: per-foot Python int lists,
    mpc.cpp:228-241, 256-276) as fixed-width int32 arrays with an EMPTY
    sentinel, kept sorted; decrement / pop-head / append-at-tail become
    masked vector ops with the reference's exact integer semantics
    (pinned against the host engine by tests/test_fused_mpc.py);
  * swing-foot Bézier state (p_init/p_final) + Raibert footstep placement
    (mpc.cpp:291-302) evaluated with the measured-state FK, all vmapped
    over feet;
  * warm starts xs/us and AL multipliers, shifted in-graph.

One `step(carry, x_measured)` call = FK + recede + swing refs + warm-start
shift + 1 ProxDDP iteration.  `rollout` lax.scans `step` over a stream of
measurements; `self_rollout` closes the loop on the solver's own one-step
prediction (fully on-device receding-horizon rollout).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ocp.base import Problem, index_params, roll_params
from ..solver.proxddp import Results
from . import foot_trajectory as ft
from .mpc import MPC, STANDING, WALKING

EMPTY = np.int32(2**30)  # sentinel for empty event-queue slots
QMAX = 8  # max pending events per foot (>= ceil((T+L)/cycle) in practice)


class MPCCarry(NamedTuple):
    """Device-resident receding-horizon state (everything MPC mutates
    per tick)."""

    stage_params: Any  # problem stage params, leaves (T, ...)
    term_params: Any
    x0: jnp.ndarray
    cycle_params: Any  # cyclic pool, leaves (L, ...)
    standing_params: Any  # standing pool, leaves (T, ...)
    plan: jnp.ndarray  # (L, nk) contact plan, rolled with cycle_params
    takeoff: jnp.ndarray  # (nk, QMAX) int32 event queues (EMPTY-padded)
    land: jnp.ndarray  # (nk, QMAX)
    p_init: jnp.ndarray  # (nk, 3) swing Bézier endpoints
    p_final: jnp.ndarray  # (nk, 3)
    xs: jnp.ndarray  # (T+1, nx) warm start
    us: jnp.ndarray  # (T, nu)
    lam_eq: jnp.ndarray
    lam_in: jnp.ndarray
    lam_term: jnp.ndarray
    x_reference: jnp.ndarray
    velocity_base: jnp.ndarray  # (6,)
    com0_z: jnp.ndarray  # scalar
    now: jnp.ndarray  # int32 state machine (WALKING/STANDING/MOTION)


def _queue_from_list(times, dtype=np.int32):
    out = np.full(QMAX, EMPTY, dtype)
    out[: len(times)] = times
    return out


class FusedMPC:
    """Jit-compiled receding-horizon engine sharing all semantics with the
    host `MPC` (which remains the reference-parity oracle)."""

    def __init__(self, mpc: MPC):
        if mpc.cycle_horizon is None:
            raise ValueError("call mpc.generate_cycle_horizon(...) first")
        self.ocp = mpc.ocp_handler
        self.solver = mpc.solver
        self.settings = mpc.settings
        self.model = mpc.model_handler.model
        self.nk = mpc.model_handler.n_feet
        self.feet_fids = list(mpc.model_handler.feet_frame_ids)
        self.feet_ref_fids = list(mpc.model_handler.feet_ref_frame_ids)
        self.base_fid = mpc.model_handler.base_frame_id
        self.step = jax.jit(self._step)
        # donated variant for the real-time loop: the previous tick's carry
        # buffers are dead the moment the new carry exists, so XLA may
        # update them in place — fewer HBM allocations/copies per call.
        # The passed-in carry is CONSUMED (invalid afterwards).
        self.step_donated = jax.jit(self._step, donate_argnums=0)
        # scenario-batched whole tick: B independent receding-horizon
        # engines advanced by one full MPC::iterate each (the reference's
        # per-tick unit of work, mpc.cpp:189-218) in one XLA program.
        self.step_batched = jax.jit(jax.vmap(self._step))
        self.step_batched_donated = jax.jit(jax.vmap(self._step),
                                            donate_argnums=0)

    # ------------------------------------------------------------------
    # Carry construction from (and sync back to) the host engine
    # ------------------------------------------------------------------
    def make_carry(self, mpc: MPC) -> MPCCarry:
        names = mpc.ee_names
        plan = jnp.asarray(
            np.array([[float(s[n]) for n in names] for s in mpc.contact_states]))
        takeoff = jnp.asarray(np.stack(
            [_queue_from_list(mpc.foot_takeoff_times[n]) for n in names]))
        land = jnp.asarray(np.stack(
            [_queue_from_list(mpc.foot_land_times[n]) for n in names]))
        lam_eq, lam_in, lam_term = mpc.lams
        return MPCCarry(
            stage_params=mpc.ocp_handler.problem.stage_params,
            term_params=mpc.ocp_handler.problem.term_params,
            x0=mpc.ocp_handler.problem.x0,
            cycle_params=mpc.cycle_horizon,
            standing_params=mpc.standing_horizon,
            plan=plan, takeoff=takeoff, land=land,
            p_init=mpc.foot_trajectories.state.p_init,
            p_final=mpc.foot_trajectories.state.p_final,
            xs=mpc.xs, us=mpc.us,
            lam_eq=lam_eq, lam_in=lam_in, lam_term=lam_term,
            x_reference=jnp.asarray(mpc.x_reference),
            velocity_base=jnp.asarray(mpc.velocity_base),
            com0_z=jnp.asarray(mpc.com0[2]),
            now=jnp.asarray(mpc.now, jnp.int32),
        )

    @staticmethod
    def tile_carry(carry: MPCCarry, batch: int) -> MPCCarry:
        """Replicate a carry to a leading (B, ...) scenario batch for
        step_batched (independent engines; perturb x0/xs per scenario for
        distinct rollouts)."""
        return jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), carry)

    def switch_to_walk(self, carry: MPCCarry, velocity_base) -> MPCCarry:
        return carry._replace(now=jnp.asarray(WALKING, jnp.int32),
                              velocity_base=jnp.asarray(velocity_base))

    def switch_to_stand(self, carry: MPCCarry) -> MPCCarry:
        return carry._replace(now=jnp.asarray(STANDING, jnp.int32),
                              velocity_base=jnp.zeros(6, carry.velocity_base.dtype))

    # ------------------------------------------------------------------
    # Event queues (exact integer semantics of mpc.cpp:228-241, 256-276)
    # ------------------------------------------------------------------
    @staticmethod
    def _queue_tick(q, dec_mask_extra, append_flag, append_val):
        """append (pre-decrement, as in recedeWithCycle) -> decrement ->
        pop head if negative.  q: (nk, QMAX) sorted ascending."""
        valid = q < EMPTY // 2
        n_valid = jnp.sum(valid, axis=1)
        slot = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
        q = jnp.where((slot == n_valid[:, None]) & append_flag[:, None],
                      append_val, q)
        valid = q < EMPTY // 2
        q = jnp.where(valid & dec_mask_extra, q - 1, q)
        pop = q[:, 0] < 0
        shifted = jnp.concatenate(
            [q[:, 1:], jnp.full((q.shape[0], 1), EMPTY, q.dtype)], axis=1)
        return jnp.where(pop[:, None], shifted, q)

    # ------------------------------------------------------------------
    # One fused tick
    # ------------------------------------------------------------------
    def _step(self, carry: MPCCarry, x_meas):
        ocp = self.ocp
        s = self.settings
        nk = self.nk
        sp, tp = carry.stage_params, carry.term_params
        T = ocp.problem.horizon
        L = carry.plan.shape[0]

        # -- measured-state kinematics (data_handler_->updateInternalData) --
        from ..ops import dynamics as dyn
        from ..ops import kinematics as kin

        m = self.model
        q = x_meas[: m.nq]
        oR, op = kin.fk(m, q)
        fR, fp = kin.frame_placements(m, oR, op)
        com_meas = dyn.center_of_mass(m, q)
        base_p = fp[self.base_fid]
        foot_p = jnp.stack([fp[f] for f in self.feet_fids])  # (nk, 3)
        ref_p = jnp.stack([fp[f] for f in self.feet_ref_fids])  # (nk, 3)

        # -- recedeWithCycle (mpc.cpp:220-254) -------------------------------
        support_last = jnp.sum(sp.contact_active[T - 1])
        walking = (carry.now == WALKING) | (support_last < nk)

        cyc_head = index_params(carry.cycle_params, 0)
        stand_head = index_params(carry.standing_params, 0)
        new_last = jax.tree_util.tree_map(
            lambda a, b: jnp.where(walking, a, b), cyc_head, stand_head)
        sp = roll_params(sp, new_last)
        # pools rotate only on their own branch
        cycle_params = jax.tree_util.tree_map(
            lambda x: jnp.where(walking, jnp.roll(x, -1, axis=0), x),
            carry.cycle_params)
        standing_params = jax.tree_util.tree_map(
            lambda x: jnp.where(walking, x, jnp.roll(x, -1, axis=0)),
            carry.standing_params)
        plan = jnp.where(walking, jnp.roll(carry.plan, -1, axis=0), carry.plan)

        # event append from the rotated plan tail (mpc.cpp:188-193), then
        # decrement/pop (update_cycle_timing: standing decrements only
        # events already inside the horizon)
        tail, prev_tail = plan[L - 1] > 0.5, plan[L - 2] > 0.5
        to_edge = walking & ~tail & prev_tail
        ld_edge = walking & tail & ~prev_tail
        def dec_mask(qarr):
            return jnp.where(walking, jnp.ones_like(qarr, bool), qarr < T)
        takeoff = self._queue_tick(carry.takeoff, dec_mask(carry.takeoff),
                                   to_edge, jnp.int32(L + T))
        land = self._queue_tick(carry.land, dec_mask(carry.land),
                                ld_edge, jnp.int32(L + T))

        # -- updateStepTrackerReferences (mpc.cpp:278-324) -------------------
        land_head = jnp.where(land[:, 0] < EMPTY // 2, land[:, 0], -1)
        update = land_head >= s.T_fly
        # Raibert heuristic footstep (mpc.cpp:291-299)
        twist = jnp.stack([-(ref_p[:, 1] - base_p[1]),
                           ref_p[:, 0] - base_p[0]], axis=1)  # (nk, 2)
        vb = carry.velocity_base.astype(x_meas.dtype)
        horiz = (vb[None, :2] + vb[5] * twist) * (
            (s.T_fly + s.T_contact) * s.timestep)
        next_pose = jnp.concatenate(
            [ref_p[:, :2] + horiz, foot_p[:, 2:3]], axis=1)  # (nk, 3)
        p_init = jnp.where(update[:, None], foot_p, carry.p_init)
        p_final = jnp.where(update[:, None], next_pose, carry.p_final)
        refs = jax.vmap(
            lambda pi, pf, lt: ft.sample_swing(pi, pf, s.swing_apex, lt,
                                               s.T_fly, T)
        )(p_init, p_final, land_head)  # (nk, T, 3)
        refs = jnp.transpose(refs, (1, 0, 2))  # (T, nk, 3)

        com_ref = jnp.mean(refs[T - 1], axis=0)
        com_ref = com_ref.at[2].add(carry.com0_z)
        sp, tp = ocp.write_references(sp, tp, refs, carry.x_reference,
                                      carry.velocity_base, com_ref)

        # -- warm-start shift + 1 solver iteration (mpc.cpp:201-217) ---------
        x0 = ocp.x0_from_measurement(x_meas)
        xs = jnp.concatenate([x0[None], carry.xs[2:], carry.xs[-1:]], axis=0)
        us = jnp.concatenate([carry.us[1:], carry.us[-1:]], axis=0)
        lams = (jnp.concatenate([carry.lam_eq[1:], carry.lam_eq[-1:]], axis=0),
                jnp.concatenate([carry.lam_in[1:], carry.lam_in[-1:]], axis=0),
                carry.lam_term)
        problem = Problem(x0=x0, stage_params=sp, term_params=tp)
        with jax.default_matmul_precision("float32"):
            res = self.solver._run_impl(problem, xs, us, lams, None, None)

        new_carry = MPCCarry(
            stage_params=sp, term_params=tp, x0=x0,
            cycle_params=cycle_params, standing_params=standing_params,
            plan=plan, takeoff=takeoff, land=land,
            p_init=p_init, p_final=p_final,
            xs=res.xs, us=res.us,
            lam_eq=res.lam_eq, lam_in=res.lam_in, lam_term=res.lam_term,
            x_reference=carry.x_reference,
            velocity_base=carry.velocity_base,
            com0_z=carry.com0_z, now=carry.now,
        )
        return new_carry, res

    # ------------------------------------------------------------------
    # Scanned rollouts
    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def rollout(self, carry: MPCCarry, xs_meas):
        """lax.scan of the fused tick over a (N, nx) measurement stream."""
        return jax.lax.scan(self._step, carry, xs_meas)

    @partial(jax.jit, static_argnums=(0, 2))
    def self_rollout(self, carry: MPCCarry, n_ticks: int):
        """Fully on-device receding-horizon rollout: each tick consumes the
        solver's own one-step prediction xs[1] as the next measurement
        (perfect-model closed loop).  Multibody-state formulations only —
        centroidal's problem state (9-dim) is not a full robot state."""

        def tick(c, _):
            c2, res = self._step(c, c.xs[1])
            return c2, (res.us[0], res.xs[1], res.prim_res)

        return jax.lax.scan(tick, carry, None, length=n_ticks)
