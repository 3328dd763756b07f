"""Scenario-parallel layer: shard_map solves with in-graph collective
summaries must equal the unsharded batch (SURVEY.md §4 implication 5 —
the single-host-vs-multi-host equivalence rung the reference never had).

Uses the centroidal formulation (vector space, compiles in seconds) on the
virtual 8-device CPU mesh from conftest.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from simple_mpc_tpu.configs import talos_centroidal_config, talos_handler
from simple_mpc_tpu.models.handler import RobotDataHandler
from simple_mpc_tpu.ocp.centroidal import CentroidalOCP
from simple_mpc_tpu.parallel import BatchedSolver, make_mesh, tile_problem
from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings


@pytest.fixture(scope="module")
def batch():
    mh = talos_handler()
    ocp = CentroidalOCP(talos_centroidal_config(mh), mh)
    x0 = np.asarray(RobotDataHandler(mh).get_centroidal_state())
    T = 10
    ocp.create_problem(x0, T, 6, -9.81, False)
    solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=2))
    B = 8
    problems = tile_problem(ocp.problem, B)
    # per-scenario distinct initial states (real data parallelism)
    import dataclasses

    x0s = jnp.asarray(x0)[None] + 1e-3 * jnp.arange(B)[:, None]
    problems = dataclasses.replace(problems, x0=x0s)
    xs = jnp.tile(jnp.asarray(x0)[None, None], (B, T + 1, 1))
    us = jnp.tile(jnp.asarray(ocp.get_reference_control(0))[None, None],
                  (B, T, 1))
    return solver, problems, xs, us


def test_sharded_equals_unsharded(batch):
    solver, problems, xs, us = batch
    res0 = BatchedSolver(solver, mesh=None).run(problems, xs, us)
    mesh = make_mesh(8)
    res1, summary = BatchedSolver(solver, mesh).run_summarized(problems, xs, us)
    np.testing.assert_allclose(np.asarray(res1.xs), np.asarray(res0.xs),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(res1.us), np.asarray(res0.us),
                               atol=1e-10)
    # in-graph collective summary equals the post-hoc reduction
    s0 = BatchedSolver(solver, mesh=None).summary(res0)
    assert abs(float(summary["max_prim"]) - float(s0["max_prim"])) < 1e-12
    assert abs(float(summary["max_dual"]) - float(s0["max_dual"])) < 1e-10
    assert abs(float(summary["mean_merit"]) - float(s0["mean_merit"])) < 1e-8
    assert int(summary["any_diverged"]) == 0


def test_sharded_equals_unsharded_f32_centroidal(batch):
    """Quick-tier f32 sharding-equality rung: the centroidal formulation
    compiles in seconds, so CI always exercises the f32 mode where
    shard_map and plain-jit programs compile with different
    fusion/reduction orders (conftest's global x64 hid this in round 3).
    Scale-aware gate as in the kinodynamics twin below."""
    solver, problems, xs, us = batch
    import dataclasses

    jax.config.update("jax_enable_x64", False)
    try:
        f32 = jnp.float32

        def cast(tree):
            return jax.tree_util.tree_map(
                lambda a: a.astype(f32)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

        problems32, xs32, us32 = cast(problems), cast(xs), cast(us)
        s32 = ProxDDPSolver(solver.ocp, dataclasses.replace(
            solver.settings, max_iters=1))
        res0 = BatchedSolver(s32, mesh=None).run(problems32, xs32, us32)
        res1, summary = BatchedSolver(s32, make_mesh(8)).run_summarized(
            problems32, xs32, us32)
        assert res0.xs.dtype == f32
        np.testing.assert_allclose(np.asarray(res1.xs), np.asarray(res0.xs),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res1.us), np.asarray(res0.us),
                                   rtol=1e-4, atol=1e-4)
        assert int(summary["any_diverged"]) == 0
    finally:
        jax.config.update("jax_enable_x64", True)


@pytest.mark.slow
def test_sharded_equals_unsharded_f32():
    """f32 replica of the driver's dryrun_multichip gate (Go2 kinodynamics,
    T=3).  Under f32 the shard_map and plain-jit programs compile with
    different fusion/reduction orders, so exact equality is NOT expected —
    the observed divergence is accumulated f32 rounding (~2e-5 relative on
    ~36 N contact forces; round-3 driver log: 8/576 elements past atol
    1e-5, max rel 1.97e-5).  Gate it scale-aware: rtol=1e-4 with a small
    absolute floor.  conftest enables x64 globally, which hid this mode
    from CI in round 3 — hence the explicit disable_x64 scope here.
    Nightly tier: the two fresh f32 kinodynamics compiles cost ~4 CPU-min;
    the quick tier covers the same f32 mode with the centroidal twin
    above."""
    import dataclasses

    from simple_mpc_tpu.configs import make_go2_kinodynamics

    jax.config.update("jax_enable_x64", False)
    try:
        ocp, mh, x0 = make_go2_kinodynamics(T=3)
        solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=1))
        B, T = 8, ocp.problem.horizon
        problems = tile_problem(ocp.problem, B)
        problems = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, problems)
        x0f = jnp.asarray(x0, jnp.float32)
        problems = dataclasses.replace(
            problems, x0=jnp.broadcast_to(x0f[None], (B, x0f.shape[0])))
        xs = jnp.tile(x0f[None, None], (B, T + 1, 1))
        us = jnp.tile(jnp.asarray(ocp.get_reference_control(0),
                                  jnp.float32)[None, None], (B, T, 1))
        res0 = BatchedSolver(solver, mesh=None).run(problems, xs, us)
        res1, summary = BatchedSolver(solver, make_mesh(8)).run_summarized(
            problems, xs, us)
        assert res0.xs.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(res1.xs), np.asarray(res0.xs),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(res1.us), np.asarray(res0.us),
                                   rtol=1e-4, atol=1e-5)
        assert int(summary["any_diverged"]) == 0
    finally:
        jax.config.update("jax_enable_x64", True)


def test_host_dp_mesh_equals_unsharded(batch):
    """2-D ('host','dp') mesh — the multi-host layout, emulated by
    reshaping the 8 virtual devices to (2, 4)."""
    solver, problems, xs, us = batch
    res0 = BatchedSolver(solver, mesh=None).run(problems, xs, us)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("host", "dp"))
    bs = BatchedSolver(solver, mesh)
    res1, summary = bs.run_summarized(problems, xs, us)
    np.testing.assert_allclose(np.asarray(res1.xs), np.asarray(res0.xs),
                               atol=1e-10)
    assert np.isfinite(float(summary["max_prim"]))
    # warm path: thread multipliers back through, still sharded
    lams = (res1.lam_eq, res1.lam_in, res1.lam_term)
    res2 = bs.run(problems, res1.xs, res1.us, lams)
    assert np.isfinite(np.asarray(res2.us)).all()
