"""Fused on-device MPC tick vs. the host receding-horizon oracle.

The host `MPC` pins the reference's semantics (mpc.cpp); `FusedMPC` re-runs
the same tick as one jitted program.  Feeding both the same measurement
stream must produce identical solutions, event queues, swing states and
stage parameters.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_mpc_tpu.configs import make_go2_kinodynamics
from simple_mpc_tpu.mpc import MPC, MPCSettings
from simple_mpc_tpu.mpc.fused import EMPTY, FusedMPC

FEET = ["FL_foot", "FR_foot", "RL_foot", "RR_foot"]


def quad_gait_plan(n_double=2, n_single=2):
    FL, FR, RL, RR = FEET
    allc = {f: True for f in FEET}
    sw1 = {FL: False, FR: True, RL: True, RR: False}
    sw2 = {FL: True, FR: False, RL: False, RR: True}
    return [allc] * n_double + [sw1] * n_single + [allc] * n_double + [sw2] * n_single


@pytest.fixture(scope="module")
def go2_pair():
    T = 12
    ocp, mh, x0 = make_go2_kinodynamics(T)
    settings = MPCSettings(
        support_force=mh.mass * 9.81, TOL=1e-6, mu_init=1e-8, max_iters=1,
        swing_apex=0.05, T_fly=4, T_contact=2, T=T, timestep=0.01)
    mpc = MPC(settings, ocp)
    mpc.generate_cycle_horizon(quad_gait_plan())
    mpc.switch_to_walk(np.array([0.1, 0.0, 0.0, 0.0, 0.0, 0.05]))
    fused = FusedMPC(mpc)
    carry0 = fused.make_carry(mpc)

    # deterministic measurement stream near the reference state
    nq, nv = mh.model.nq, mh.model.nv
    xs_meas = []
    for i in range(4):
        x = np.array(mh.reference_state)
        x[nq:] += 0.02 * np.sin(0.3 * i + np.arange(nv))
        x[2] += 0.005 * i
        xs_meas.append(x)
    xs_meas = np.stack(xs_meas)
    return mpc, fused, carry0, xs_meas, mh


def _queues_as_lists(qarr):
    out = []
    for row in np.asarray(qarr):
        out.append([int(v) for v in row if v < EMPTY // 2])
    return out


@pytest.mark.slow
def test_fused_matches_host(go2_pair):
    mpc, fused, carry, xs_meas, mh = go2_pair
    for i in range(xs_meas.shape[0]):
        res_host = mpc.iterate(xs_meas[i])
        carry, res_fused = fused.step(carry, jnp.asarray(xs_meas[i]))

        np.testing.assert_allclose(np.asarray(res_fused.us),
                                   np.asarray(res_host.us),
                                   rtol=1e-9, atol=1e-10,
                                   err_msg=f"us mismatch at tick {i}")
        np.testing.assert_allclose(np.asarray(res_fused.xs),
                                   np.asarray(res_host.xs),
                                   rtol=1e-9, atol=1e-10,
                                   err_msg=f"xs mismatch at tick {i}")
        np.testing.assert_allclose(np.asarray(res_fused.Ks),
                                   np.asarray(res_host.Ks),
                                   rtol=1e-7, atol=1e-8,
                                   err_msg=f"Ks mismatch at tick {i}")

        # event queues: exact integer parity (mpc.cpp:228-241, 256-276)
        assert _queues_as_lists(carry.takeoff) == [
            mpc.foot_takeoff_times[n] for n in mpc.ee_names], f"takeoff tick {i}"
        assert _queues_as_lists(carry.land) == [
            mpc.foot_land_times[n] for n in mpc.ee_names], f"land tick {i}"

        # swing state + stage parameters track the host exactly
        np.testing.assert_allclose(np.asarray(carry.p_init),
                                   np.asarray(mpc.foot_trajectories.state.p_init),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(carry.p_final),
                                   np.asarray(mpc.foot_trajectories.state.p_final),
                                   rtol=1e-12)
        host_sp = mpc.ocp_handler.problem.stage_params
        np.testing.assert_allclose(np.asarray(carry.stage_params.foot_ref_p),
                                   np.asarray(host_sp.foot_ref_p),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(carry.stage_params.contact_active),
                                   np.asarray(host_sp.contact_active))
        np.testing.assert_allclose(np.asarray(carry.term_params.dcm_ref),
                                   np.asarray(mpc.ocp_handler.problem.term_params.dcm_ref),
                                   rtol=1e-12)


@pytest.mark.slow
def test_fused_rollout_runs(go2_pair):
    """Scanned multi-tick rollout compiles and stays finite."""
    mpc, fused, carry, xs_meas, mh = go2_pair
    carry2, res = fused.rollout(carry, jnp.asarray(xs_meas))
    assert np.all(np.isfinite(np.asarray(res.us)))
    carry3, (us0, xs1, prim) = fused.self_rollout(carry2, 3)
    assert us0.shape == (3, mpc.us.shape[1])
    assert np.all(np.isfinite(np.asarray(us0)))


@pytest.mark.slow
def test_step_batched_matches_single(go2_pair):
    """vmapped whole-tick step (the bench's ticks/s metric path) equals B
    independent single-engine steps, with distinct per-scenario states."""
    mpc, fused, carry, xs_meas, mh = go2_pair
    B = 3
    cb = fused.tile_carry(carry, B)
    # distinct scenarios: perturb each engine's warm start + measurement
    key_xs = jnp.asarray(np.linspace(-1e-3, 1e-3, B))[:, None, None]
    cb = cb._replace(xs=cb.xs + key_xs * jnp.ones_like(cb.xs))
    x_b = jnp.stack([jnp.asarray(xs_meas[i % xs_meas.shape[0]])
                     for i in range(B)])
    cb2, res_b = fused.step_batched(cb, x_b)
    for i in range(B):
        ci = jax.tree_util.tree_map(lambda a: a[i], cb)
        _, res_i = fused.step(ci, x_b[i])
        # vmap reorders fusions/reductions vs the single-engine program;
        # measured deviation is ~9e-9 absolute on ~35 N forces (f64)
        np.testing.assert_allclose(np.asarray(res_b.us[i]),
                                   np.asarray(res_i.us),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(res_b.xs[i]),
                                   np.asarray(res_i.xs),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_benched_latency_config_feasible():
    """Pins the EXACT configuration bench.py's latency phase times
    (parallel-in-time Riccati + bf16 tangent sweep + f32 carry, Go2
    kinodynamics T=100 walking) to the same feasibility bounds the bench
    asserts over a 20-tick self-consumed rollout from the pristine tick-0
    carry: transient max < 5e-3 (swing-entry ticks spike to ~2e-3 even in
    the f64 host engine) and median < 5e-4 (VERDICT r4 next #3)."""
    import bench as bench_mod

    ocp, mh, _ = make_go2_kinodynamics(100)
    cpu = jax.devices("cpu")[0]
    fused, carry, _ = bench_mod._make_fused(cpu, ocp, mh, parallel=True)
    _, (_, _, prims) = fused.self_rollout(carry, 20)
    parr = np.asarray(prims)
    prim, prim_med = float(parr.max()), float(np.median(parr))
    assert prim < 5e-3 and prim_med < 5e-4, (
        f"benched latency config infeasible: max={prim:.3e} "
        f"median={prim_med:.3e}")
