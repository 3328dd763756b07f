"""Throughput sweep on the real chip: times the exact bench.py warm loop
(batched 1-iter ProxDDP, warm lams) across candidate configs — alpha-ladder
length, scan unroll, batch size.  Prints solves/s per config.

Run:  python tools/profile... env BENCH-style knobs not needed; configs are
inline below (edit CONFIGS).  Each config is a fresh compile (~30-60 s over
the tunnel)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simple_mpc_tpu.configs import make_go2_kinodynamics
from simple_mpc_tpu.parallel import BatchedSolver, tile_problem
from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings

T = int(os.environ.get("T", 100))
ITERS = int(os.environ.get("ITERS", 20))

CONFIGS = [
    # (label, B, dict of SolverSettings overrides)
    ("base B128 a5 u5", 128, {}),
    ("a3", 128, {"alphas": (0.0, 1.0, 0.5)}),
    ("a2", 128, {"alphas": (0.0, 1.0)}),
    ("a3 u10", 128, {"alphas": (0.0, 1.0, 0.5), "scan_unroll": 10}),
    ("a3 B192", 192, {"alphas": (0.0, 1.0, 0.5)}),
    ("a3 B256", 256, {"alphas": (0.0, 1.0, 0.5)}),
    # round-4 finding: trimming the ladder 5->3 changed nothing (1216.8 vs
    # 1218.1 solves/s) — the tick is linearization-bound, so sweep B with
    # the test-pinned 5-alpha ladder instead
    ("a5 B192", 192, {}),
    ("a5 B256", 256, {}),
    ("a5 B512", 512, {}),
]
if os.environ.get("SWEEP"):
    keep = os.environ["SWEEP"].split(";")
    CONFIGS = [c for c in CONFIGS if c[0] in keep]

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
print(f"device: {tpu}", file=sys.stderr)

with jax.default_device(cpu):
    ocp, mh, x0 = make_go2_kinodynamics(T)

for label, B, over in CONFIGS:
    with jax.default_device(cpu):
        problems = tile_problem(ocp.problem, B)
        xs = jnp.tile(jnp.asarray(x0, jnp.float32)[None, None], (B, T + 1, 1))
        us = jnp.tile(jnp.asarray(ocp.get_reference_control(0),
                                  jnp.float32)[None, None], (B, T, 1))
    solver = ProxDDPSolver(ocp, SolverSettings(
        mu_init=1e-6, max_iters=1, lin_dtype="bfloat16", **over))
    bs = BatchedSolver(solver, mesh=None)
    problems = jax.device_put(problems, tpu)
    xs = jax.device_put(xs, tpu)
    us = jax.device_put(us, tpu)
    try:
        t_c0 = time.perf_counter()
        res = bs.run(problems, xs, us)
        float(np.asarray(res.prim_res).max())
        lams = (res.lam_eq, res.lam_in, res.lam_term)
        res = bs.run(problems, res.xs, res.us, lams)
        float(np.asarray(res.prim_res).max())
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(ITERS):
            lams = (res.lam_eq, res.lam_in, res.lam_term)
            res = bs.run(problems, res.xs, res.us, lams)
        np.asarray(res.xs)
        dt = time.perf_counter() - t0
        prim = float(np.asarray(res.prim_res).max())
        print(f"{label:16s} B={B:4d} solves/s={B * ITERS / dt:9.1f} "
              f"prim={prim:.2e} (compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"{label:16s} B={B:4d} FAILED: {e!r}", flush=True)
