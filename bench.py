"""Flagship benchmark: Go2 kinodynamics MPC solver throughput (BASELINE.md).

Measures batched 1-iteration ProxDDP solves/s on one chip (the per-tick
receding-horizon operation, mpc.cpp:212) for the Go2 kinodynamics T=100
config.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: driver target is 10 000 solves/s on v5p-16 (8 chips) => 1 250
solves/s/chip; vs_baseline = value / 1250.
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _tpu_reachable(timeout_s: float = 240.0) -> bool:
    """Probe the (tunneled) TPU backend in a subprocess with a hard timeout.

    jax.devices() over a dead tunnel blocks forever with no deadline of its
    own; a hung probe must not take the benchmark down with it — the driver
    needs the JSON line either way.
    """
    if os.environ.get("BENCH_FORCE_CPU"):
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform != 'cpu'"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except Exception:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=int(os.environ.get("BENCH_BATCH", 128)))
    ap.add_argument("--horizon", type=int, default=100)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    on_tpu = _tpu_reachable()
    if not on_tpu:
        print("# WARNING: TPU backend unreachable — benching on CPU fallback",
              file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"
        if "--batch" not in sys.argv[1:] and "BENCH_BATCH" not in os.environ:
            args.batch = 8
        if "--iters" not in sys.argv[1:]:
            args.iters = 3

    import jax

    # keep the CPU backend available: eager ops over the tunneled TPU are one
    # network round trip EACH, so all problem construction happens on CPU and
    # only the final arrays ship to the chip
    try:
        jax.config.update("jax_platforms", "axon,cpu" if on_tpu else "cpu")
    except Exception:
        pass
    import jax.numpy as jnp

    from simple_mpc_tpu.configs import make_go2_kinodynamics
    from simple_mpc_tpu.parallel import BatchedSolver, tile_problem
    from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings

    dtype = jnp.dtype(args.dtype)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    B, T = args.batch, args.horizon
    with jax.default_device(cpu):
        ocp, mh, x0 = make_go2_kinodynamics(T)
        problem = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            ocp.problem)
        problems = tile_problem(problem, B)
        xs = jnp.tile(jnp.asarray(x0, dtype)[None, None], (B, T + 1, 1))
        us = jnp.tile(jnp.asarray(ocp.get_reference_control(0), dtype)[None, None],
                      (B, T, 1))
    solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=1))
    problems = jax.device_put(problems, tpu)
    xs = jax.device_put(xs, tpu)
    us = jax.device_put(us, tpu)
    bs = BatchedSolver(solver, mesh=None)

    import numpy as _np

    def force(r):
        # block_until_ready is not trustworthy over the tunneled backend;
        # a host transfer is the only hard sync
        return float(_np.asarray(r.prim_res).max())

    res = bs.run(problems, xs, us)  # compile + first run
    force(res)
    lams = (res.lam_eq, res.lam_in, res.lam_term)
    res = bs.run(problems, res.xs, res.us, lams)  # warm-path compile
    force(res)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        lams = (res.lam_eq, res.lam_in, res.lam_term)
        res = bs.run(problems, res.xs, res.us, lams)
    _np.asarray(res.xs)  # hard sync
    dt = time.perf_counter() - t0

    # single-call p50 latency, synchronous (host transfer = hard sync)
    lat = []
    for _ in range(10):
        t1 = time.perf_counter()
        lams = (res.lam_eq, res.lam_in, res.lam_term)
        res = bs.run(problems, res.xs, res.us, lams)
        _np.asarray(res.xs)
        lat.append(time.perf_counter() - t1)

    prim = float(_np.asarray(res.prim_res).max())
    print(f"# sanity: max prim_res={prim:.3e}  p50 batched-call latency="
          f"{_np.median(lat)*1e3:.2f} ms (B={B})", file=sys.stderr)

    solves_per_s = B * args.iters / dt
    print(json.dumps({
        "metric": "go2_kinodynamics_T100_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / 1250.0, 4),
    }))


if __name__ == "__main__":
    main()
