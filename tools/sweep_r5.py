"""Round-5 throughput sweep on the real chip, with variance windows.

Times the exact bench.py warm loop (batched 1-iter ProxDDP, warm lams,
bf16 linearization) across candidate configs — batch size, donation —
repeating the timed window WINDOWS times per config so a single number is
never trusted on a tunneled backend with day-to-day variance.

Run:  python tools/sweep_r5.py            (all configs)
      SWEEP="don B256;don B512" python tools/sweep_r5.py
"""
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
WINDOWS = int(os.environ.get("WINDOWS", 3))

CONFIGS = [
    # (label, B, donated, dict of SolverSettings overrides)
    # round-5 measured (2026-08-21, one v5e chip, bf16 tangents):
    #   base B128 1179.7 | don B128 1181.4 | don B256 1056.1 (worse: past
    #   the HBM sweet spot) -> donation is ~neutral, optimum is near B=128
    ("base B128", 128, False, {}),
    ("don  B128", 128, True, {}),
    ("don  B256", 256, True, {}),
    ("don  B512", 512, True, {}),
    # B=160 NaN: BOTH donated and plain runs return prim=nan on the axon
    # TPU backend at B=160 (919/908 solves/s), while B=96/128/256 are clean
    # (prim 6.03e-05) and the IDENTICAL B=160 program on the CPU backend is
    # clean (prim 5.97e-05, all finite).  Verdict: batch-shape-dependent
    # miscompile / fusion-order edge of the experimental axon backend, not
    # framework math.  The benched configs stay on B=128.
    ("base B160", 160, False, {}),
    ("don  B96", 96, True, {}),
    ("don  B160", 160, True, {}),
    ("don  B192", 192, True, {}),
    ("don  B128 u10", 128, True, {"scan_unroll": 10}),
]
if os.environ.get("SWEEP"):
    keep = [s.strip() for s in os.environ["SWEEP"].split(";")]
    CONFIGS = [c for c in CONFIGS if c[0].strip() in keep]

SCANNED = os.environ.get("SCANNED") == "1"  # chain ITERS warm solves in ONE
#                                             lax.scan program (no per-call
#                                             dispatch at all)

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
print(f"device: {tpu}", file=sys.stderr)

with jax.default_device(cpu):
    ocp, mh, x0 = make_go2_kinodynamics(T)

for label, B, donated, over in CONFIGS:
    with jax.default_device(cpu):
        problems = tile_problem(ocp.problem, B)
        xs = jnp.tile(jnp.asarray(x0, jnp.float32)[None, None], (B, T + 1, 1))
        us = jnp.tile(jnp.asarray(ocp.get_reference_control(0),
                                  jnp.float32)[None, None], (B, T, 1))
        zl = tuple(np.zeros(s, np.float32) for s in
                   ((B, T, ocp.n_eq), (B, T, ocp.n_in), (B, ocp.n_term_eq)))
    solver = ProxDDPSolver(ocp, SolverSettings(
        mu_init=1e-6, max_iters=1, lin_dtype="bfloat16", **over))
    bs = BatchedSolver(solver, mesh=None)
    problems = jax.device_put(problems, tpu)
    xs = jax.device_put(xs, tpu)
    us = jax.device_put(us, tpu)
    zl = jax.device_put(zl, tpu)
    call = bs.run_donated if donated else bs.run
    if SCANNED:
        import functools

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def chain(problems, xs, us, lams):
            def body(carry, _):
                xs, us, lams = carry
                r = jax.vmap(lambda p, x, u, l: solver.run(p, x, u, l))(
                    problems, xs, us, lams)
                return (r.xs, r.us, (r.lam_eq, r.lam_in, r.lam_term)), r.prim_res
            (xs, us, lams), prims = jax.lax.scan(
                body, (xs, us, lams), None, length=ITERS)
            return xs, us, lams, prims

        try:
            t_c0 = time.perf_counter()
            state = (xs, us, zl)
            xs_, us_, lams_, prims = chain(problems, *state)
            float(np.asarray(prims).max())
            compile_s = time.perf_counter() - t_c0
            rates = []
            for w in range(WINDOWS):
                t0 = time.perf_counter()
                xs_, us_, lams_, prims = chain(problems, xs_, us_, lams_)
                np.asarray(prims[-1])
                rates.append(B * ITERS / (time.perf_counter() - t0))
            prim = float(np.asarray(prims).max())
            rs = " ".join(f"{r:8.1f}" for r in rates)
            print(f"{label:10s} B={B:4d} SCANNED solves/s=[{rs}] "
                  f"med={np.median(rates):8.1f} prim={prim:.2e} "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"{label:10s} B={B:4d} SCANNED FAILED: {e!r}", flush=True)
        continue
    try:
        t_c0 = time.perf_counter()
        res = call(problems, xs, us, zl)  # the only compile
        float(np.asarray(res.prim_res).max())
        compile_s = time.perf_counter() - t_c0
        # warm in
        for _ in range(3):
            lams = (res.lam_eq, res.lam_in, res.lam_term)
            res = call(problems, res.xs, res.us, lams)
        float(np.asarray(res.prim_res).max())
        rates = []
        for w in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                lams = (res.lam_eq, res.lam_in, res.lam_term)
                res = call(problems, res.xs, res.us, lams)
            np.asarray(res.prim_res)  # hard sync (small transfer)
            rates.append(B * ITERS / (time.perf_counter() - t0))
        prim = float(np.asarray(res.prim_res).max())
        rs = " ".join(f"{r:8.1f}" for r in rates)
        print(f"{label:10s} B={B:4d} solves/s=[{rs}] med={np.median(rates):8.1f} "
              f"prim={prim:.2e} (compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"{label:10s} B={B:4d} FAILED: {e!r}", flush=True)
