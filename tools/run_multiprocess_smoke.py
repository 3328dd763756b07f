"""Two-process `jax.distributed` smoke run — first real execution of the
multi-host (DCN) code path (SURVEY.md §2b items 1-3, BASELINE.md scaling
row).

Launches two localhost CPU processes, each owning 2 virtual devices.  Both
call `init_distributed(coordinator, 2, rank)` (parallel/scenarios.py:37-46),
build the 2-D ('host','dp') mesh with `make_host_mesh()`, and run
`BatchedSolver.run_summarized` on a 4-scenario Talos-centroidal batch
sharded over BOTH axes — the in-graph pmax/pmean summary reduction rides
the cross-process (DCN-equivalent: gloo) axis.  Each process independently
re-solves the batch unsharded and asserts the replicated summary scalars
match, i.e. the distributed program computed the same answer.

Usage:  python tools/run_multiprocess_smoke.py          # launcher
        python tools/run_multiprocess_smoke.py --rank N # worker (internal)
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COORD = "localhost:12467"
N_PROC = 2
DEV_PER_PROC = 2


def worker(rank: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from simple_mpc_tpu.parallel import (BatchedSolver, init_distributed,
                                         make_host_mesh, tile_problem)

    init_distributed(COORD, N_PROC, rank)
    assert jax.process_count() == N_PROC, jax.process_count()
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC, jax.devices()

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from simple_mpc_tpu.configs import talos_centroidal_config, talos_handler
    from simple_mpc_tpu.models.handler import RobotDataHandler
    from simple_mpc_tpu.ocp.centroidal import CentroidalOCP
    from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings

    mh = talos_handler()
    ocp = CentroidalOCP(talos_centroidal_config(mh), mh)
    x0 = np.asarray(RobotDataHandler(mh).get_centroidal_state())
    T = 10
    ocp.create_problem(x0, T, 6, -9.81, False)
    solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=2))
    B = N_PROC * DEV_PER_PROC
    problems = tile_problem(ocp.problem, B)
    x0s = jnp.asarray(x0)[None] + 1e-3 * jnp.arange(B)[:, None]
    problems = dataclasses.replace(problems, x0=x0s)
    xs = jnp.tile(jnp.asarray(x0)[None, None], (B, T + 1, 1))
    us = jnp.tile(jnp.asarray(ocp.get_reference_control(0))[None, None],
                  (B, T, 1))

    mesh = make_host_mesh()
    assert mesh.shape == {"host": N_PROC, "dp": DEV_PER_PROC}, mesh.shape
    _, summary = BatchedSolver(solver, mesh).run_summarized(problems, xs, us)

    # independent unsharded baseline in every process
    res0 = BatchedSolver(solver, mesh=None).run(problems, xs, us)
    s0 = BatchedSolver(solver, mesh=None).summary(res0)
    for key, tol in (("max_prim", 1e-12), ("max_dual", 1e-10),
                     ("mean_merit", 1e-8)):
        d = abs(float(summary[key]) - float(s0[key]))
        assert d < tol, (key, d)
    assert int(summary["any_diverged"]) == 0
    print(f"[rank {rank}] multiprocess smoke OK: processes={N_PROC} "
          f"global_devices={len(jax.devices())} "
          f"max_prim={float(summary['max_prim']):.3e}", flush=True)

    # -- flagship shape across the process boundary (VERDICT r4 next #8):
    # the Go2 kinodynamics T=100 benchmark problem, one scenario per
    # global device, sharded over ('host','dp') — the first time the
    # flagship program itself crosses a process boundary.
    from simple_mpc_tpu.configs import make_go2_kinodynamics

    ocp2, mh2, x02 = make_go2_kinodynamics(100)
    solver2 = ProxDDPSolver(ocp2, SolverSettings(mu_init=1e-6, max_iters=1))
    T2 = 100
    problems2 = tile_problem(ocp2.problem, B)
    x0s2 = jnp.asarray(x02)[None] * (1.0 + 1e-4 * jnp.arange(B)[:, None])
    problems2 = dataclasses.replace(problems2, x0=x0s2)
    xs2 = jnp.tile(jnp.asarray(x02)[None, None], (B, T2 + 1, 1))
    us2 = jnp.tile(jnp.asarray(ocp2.get_reference_control(0))[None, None],
                   (B, T2, 1))
    _, summary2 = BatchedSolver(solver2, mesh).run_summarized(
        problems2, xs2, us2)
    res2 = BatchedSolver(solver2, mesh=None).run(problems2, xs2, us2)
    s2 = BatchedSolver(solver2, mesh=None).summary(res2)
    for key, tol in (("max_prim", 1e-12), ("max_dual", 1e-10),
                     ("mean_merit", 1e-8)):
        d = abs(float(summary2[key]) - float(s2[key]))
        assert d < tol, ("flagship", key, d)
    assert int(summary2["any_diverged"]) == 0
    print(f"[rank {rank}] flagship (go2 kinodynamics T=100) across "
          f"{N_PROC} processes OK: max_prim="
          f"{float(summary2['max_prim']):.3e}", flush=True)


def launch() -> int:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
        ).strip()
    procs = [
        subprocess.Popen([sys.executable, os.path.abspath(__file__),
                          "--rank", str(r)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for r in range(N_PROC)
    ]
    rc = 0
    for r, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        sys.stdout.write(out)
        if (p.returncode != 0 or "smoke OK" not in out
                or "flagship" not in out):
            rc = 1
    print("MULTIPROCESS SMOKE " + ("PASSED" if rc == 0 else "FAILED"),
          flush=True)
    return rc


if __name__ == "__main__":
    if "--rank" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--rank") + 1]))
    else:
        sys.exit(launch())
