"""Flagship benchmark: Go2 kinodynamics MPC solver throughput (BASELINE.md).

Measures batched 1-iteration ProxDDP solves/s on one chip (the per-tick
receding-horizon operation, mpc.cpp:212) for the Go2 kinodynamics T=100
config, plus a batched whole-MPC-tick throughput (the reference's per-tick
unit of work, MPC::iterate = recede + refs + shift + solve,
mpc.cpp:189-218) and the p50 device tick latency of the fused B=1 MPC step
(10 ms real-time budget, mpc.hpp:41-48).  Prints one JSON line per
metric; the throughput headline is always the LAST line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The timed window is repeated BENCH_WINDOWS (default 3) times and the
headline reports the MEDIAN with the per-window rates in "windows" and the
low/high spread — a single 20-iteration window on a tunneled backend has
day-to-day variance of several percent (VERDICT r4 weak #1), so a gate
decision needs the spread, not a point sample.

Baseline: driver target is 10 000 solves/s on v5p-16 (8 chips) => 1 250
solves/s/chip; vs_baseline = value / 1250.  Latency vs_baseline =
10 ms / p50.
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


_T_START = time.perf_counter()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=int(os.environ.get("BENCH_BATCH", 128)))
    ap.add_argument("--horizon", type=int, default=100)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int,
                    default=int(os.environ.get("BENCH_WINDOWS", 3)))
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
        if "--windows" not in sys.argv[1:]:
            args.windows = 2

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
        # explicit zero multipliers, built on CPU and shipped once (eager
        # jnp.zeros on the tunneled default device is one RTT per array)
        zl = (jnp.zeros((B, T, ocp.n_eq), dtype),
              jnp.zeros((B, T, ocp.n_in), dtype),
              jnp.zeros((B, ocp.n_term_eq), dtype))
    # bf16 tangent sweep: the linearization is HBM-bound on TPU; primal
    # residuals/defects stay f32 (see SolverSettings.lin_dtype)
    lin_dtype = os.environ.get("BENCH_LIN_DTYPE", "bfloat16")
    # 5-alpha ladder: the 1-iteration warm-started tick almost always
    # accepts alpha=1; round-4 sweeps measured the 3-alpha trim as noise
    # (the tick is linearization-bound), so keep the test-pinned ladder
    kw = {"alphas": (0.0, 1.0, 0.5, 0.25, 0.1)}
    if os.environ.get("BENCH_ALPHAS"):
        kw["alphas"] = tuple(
            float(a) for a in os.environ["BENCH_ALPHAS"].split(","))
    if os.environ.get("BENCH_UNROLL"):
        kw["scan_unroll"] = int(os.environ["BENCH_UNROLL"])
    solver = ProxDDPSolver(ocp, SolverSettings(
        mu_init=1e-6, max_iters=1,
        lin_dtype=None if lin_dtype in ("", "none", "float32") else lin_dtype,
        **kw))
    problems = jax.device_put(problems, tpu)
    xs = jax.device_put(xs, tpu)
    us = jax.device_put(us, tpu)
    zl = jax.device_put(zl, tpu)
    bs = BatchedSolver(solver, mesh=None)

    import numpy as _np

    def force(r):
        # block_until_ready is not trustworthy over the tunneled backend;
        # a host transfer is the only hard sync
        return float(_np.asarray(r.prim_res).max())

    def retry(fn, attempts=3, wait=30):
        # the tunneled remote_compile endpoint flakes occasionally
        # ("response body closed before all bytes were read") — retry
        for i in range(attempts):
            try:
                return fn()
            except Exception as e:
                if i == attempts - 1:
                    raise
                print(f"# compile attempt {i + 1} failed ({e!r}); retrying",
                      file=sys.stderr)
                time.sleep(wait)

    # Cold start with EXPLICIT zero multipliers: lams=None and lams=<tuple>
    # trace to two different executables, and on a slow remote-compile day
    # (observed ~16 min/executable over the tunnel) the second compile can
    # eat the whole watchdog budget.  Zero lams is exactly what lams=None
    # means, so ONE executable serves the cold call and the timed loop.
    # The loop donates xs/us/lams: the previous iterate is dead the moment
    # the new Results exist, so XLA reuses the buffers in place.
    res = retry(lambda: bs.run_donated(problems, xs, us, zl))  # the ONLY compile
    force(res)
    lams = (res.lam_eq, res.lam_in, res.lam_term)
    res = retry(lambda: bs.run_donated(problems, res.xs, res.us, lams))  # cached
    force(res)

    rates = []
    for _ in range(max(args.windows, 1)):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            lams = (res.lam_eq, res.lam_in, res.lam_term)
            res = bs.run_donated(problems, res.xs, res.us, lams)
        _np.asarray(res.prim_res)  # hard sync (small transfer)
        rates.append(B * args.iters / (time.perf_counter() - t0))
    rates_s = sorted(rates)

    # single-call p50 latency, synchronous (host transfer = hard sync)
    lat = []
    for _ in range(10):
        t1 = time.perf_counter()
        lams = (res.lam_eq, res.lam_in, res.lam_term)
        res = bs.run_donated(problems, res.xs, res.us, lams)
        _np.asarray(res.prim_res)
        lat.append(time.perf_counter() - t1)

    prim = float(_np.asarray(res.prim_res).max())
    print(f"# sanity: max prim_res={prim:.3e}  p50 batched-call latency="
          f"{_np.median(lat)*1e3:.2f} ms (B={B})", file=sys.stderr)
    # Accuracy gate on the timed configuration (bf16 linearization + alpha
    # ladder): the warm-started 1-iter tick must keep the trajectory
    # feasible.  Round-3 measured 6e-5; 5e-4 is margin, 1e-3-class values
    # mean the fast path broke and the throughput number is meaningless.
    # tests/test_parity_fixtures.py::test_bf16_lin_matches_f64_fixture gates
    # the same lin_dtype="bfloat16" configuration against the f64 fixture.
    assert prim < 5e-4, (
        f"timed configuration lost feasibility (max prim_res={prim:.3e} "
        f">= 5e-4) — refusing to emit a throughput metric for a broken solve")

    # headline first (crash-safe: the supervisor re-orders it last); the
    # later phases involve more remote compiles that can hang
    solves_per_s = float(_np.median(rates))
    print(json.dumps({
        "metric": "go2_kinodynamics_T100_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s/chip",
        "windows": [round(r, 1) for r in rates],
        "low": round(rates_s[0], 2),
        "high": round(rates_s[-1], 2),
        "vs_baseline": round(solves_per_s / 1250.0, 4),
        "vs_baseline_low": round(rates_s[0] / 1250.0, 4),
    }), flush=True)

    child_budget = int(os.environ.get("BENCH_CHILD_TIMEOUT", 2700))

    def phase_budget_ok(frac=0.75):
        """Skip an optional phase if its share of the child's wall-clock
        budget is spent (compiles over the tunnel are 8-15 min on bad
        days; the headline must never be starved by later phases)."""
        if time.perf_counter() - _T_START > frac * child_budget:
            print("# time budget consumed; skipping remaining phases to "
                  "keep the headline metric safe", file=sys.stderr)
            return False
        return True

    # ------------------------------------------------------------------
    # Batched whole-tick throughput: B_t independent fused MPC engines
    # (recede + swing refs + warm shift + solve — MPC::iterate,
    # mpc.cpp:189-218) advanced in one donated XLA program per tick.
    # ------------------------------------------------------------------
    try:
        if os.environ.get("BENCH_TICKS", "1") == "0":
            raise RuntimeError("tick phase disabled (BENCH_TICKS=0)")
        if not on_tpu:
            raise RuntimeError("no TPU; skipping tick phase on CPU fallback")
        if not phase_budget_ok(0.45):
            raise RuntimeError("skipped (time budget)")
        _batched_tick_throughput(cpu, tpu, ocp, mh, retry,
                                 B=int(os.environ.get("BENCH_TICK_BATCH", B)),
                                 iters=args.iters,
                                 windows=max(args.windows, 1))
    except Exception as e:
        print(f"# tick-throughput metric failed: {e!r}", file=sys.stderr)

    # ------------------------------------------------------------------
    # Latency axis (BASELINE.md): p50 single-tick latency of the fused
    # receding-horizon MPC step at B=1 — the real-time budget is 10 ms per
    # mpc.iterate (reference mpc.hpp:41-48, examples/go2_kinodynamics.py:
    # 217-220).  vs_baseline = 10 ms / p50 (>= 1 means real-time capable).
    # ------------------------------------------------------------------
    try:
        if os.environ.get("BENCH_LATENCY", "1") == "0":
            raise RuntimeError("latency phase disabled (BENCH_LATENCY=0)")
        if not on_tpu:
            raise RuntimeError("no TPU; skipping the latency phase on the "
                               "CPU fallback")
        if not phase_budget_ok():
            raise RuntimeError("skipped (time budget)")
        lat_ms, call_ms, rtt_ms, pipe_p50, pipe_p99 = _fused_tick_latency(
            cpu, tpu, ocp, mh)
        print(f"# latency: device tick p50={lat_ms:.2f} ms (scanned), "
              f"single-call p50={call_ms:.2f} ms incl. tunnel RTT "
              f"(noop RTT floor {rtt_ms:.2f} ms)", file=sys.stderr)
        print(json.dumps({
            "metric": "go2_kinodynamics_T100_p50_single_call_tick_ms",
            "value": round(pipe_p50, 3),
            "unit": "ms",
            "p99": round(pipe_p99, 3),
            "vs_baseline": round(10.0 / max(pipe_p50, 1e-9), 4),
        }), flush=True)
        print(json.dumps({
            "metric": "go2_kinodynamics_T100_p50_tick_latency_ms",
            "value": round(lat_ms, 3),
            "unit": "ms",
            "vs_baseline": round(10.0 / lat_ms, 4),
        }), flush=True)
    except Exception as e:  # the headline metric must survive regardless
        print(f"# latency metric failed: {e!r}", file=sys.stderr)


def _make_fused(cpu, ocp, mh, parallel=True):
    """Build the walking fused-MPC engine + f32 carry on the CPU backend."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from simple_mpc_tpu.mpc import MPC, MPCSettings
    from simple_mpc_tpu.mpc.fused import FusedMPC
    from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings

    with jax.default_device(cpu):
        mpc = MPC(MPCSettings(support_force=mh.mass * 9.81, max_iters=1,
                              T_fly=30, T_contact=10, swing_apex=0.15,
                              init_max_iters=2),
                  ocp)
        mpc.solver = ProxDDPSolver(ocp, SolverSettings(
            mu_init=1e-6, max_iters=1, lin_dtype="bfloat16",
            parallel=parallel))
        names = mh.feet_names
        # go2_kinodynamics.py:93-138 quadruped gait cycle
        FL, FR, RL, RR = names
        plan = ([{n: True for n in names}] * 10
                + [{FL: True, FR: False, RL: False, RR: True}] * 30
                + [{n: True for n in names}] * 10
                + [{FL: False, FR: True, RL: True, RR: False}] * 30)
        mpc.generate_cycle_horizon(plan)
        mpc.switch_to_walk(_np.array([0.2, 0, 0, 0, 0, 0]))
        fused = FusedMPC(mpc)
        carry = fused.make_carry(mpc)
        x_meas = jnp.asarray(mpc.x0, jnp.float32)
        carry = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, carry)
    return fused, carry, x_meas


def _batched_tick_throughput(cpu, tpu, ocp, mh, retry, B=128, iters=20,
                             windows=3):
    """solves/s where one "solve" is a whole fused MPC tick
    (MPC::iterate): B independent engines, donated carry, each consuming
    its own one-step prediction as the measurement."""
    import jax
    import numpy as _np

    # serial Riccati at large batch (matches the solver-throughput phase)
    fused, carry1, _ = _make_fused(cpu, ocp, mh, parallel=False)
    with jax.default_device(cpu):
        carry_b = fused.tile_carry(carry1, B)
    carry_b = jax.device_put(carry_b, tpu)

    def tick(c):
        return fused.step_batched_donated(c, c.xs[:, 1])

    carry_b, res = retry(lambda: tick(carry_b))  # the only compile
    _np.asarray(res.prim_res)
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry_b, res = tick(carry_b)
        _np.asarray(res.prim_res)
        rates.append(B * iters / (time.perf_counter() - t0))
    prim = float(_np.asarray(res.prim_res).max())
    med = float(_np.median(rates))
    print(f"# tick throughput: {med:.1f} whole-MPC-ticks/s (B={B}), "
          f"max prim={prim:.3e}", file=sys.stderr)
    # swing-entry ticks transiently spike to ~1e-3-2e-3 even in f64 (see
    # the latency-phase gate note); 5e-3 still catches a broken fast path
    assert prim < 5e-3, (
        f"batched tick path lost feasibility (prim={prim:.3e})")
    print(json.dumps({
        "metric": "go2_kinodynamics_T100_mpc_ticks_per_s_per_chip",
        "value": round(med, 2),
        "unit": "ticks/s/chip",
        "windows": [round(r, 1) for r in rates],
        "vs_baseline": round(med / 1250.0, 4),
    }), flush=True)


def _fused_tick_latency(cpu, tpu, ocp, mh, n=20, reps=10):
    """Latency of one whole fused MPC tick (recede + swing refs + warm
    shift + 1 ProxDDP iteration) at B=1 on the chip.

    Two numbers: (a) DEVICE tick latency from a lax.scan of n ticks (the
    number an attached-TPU control loop sees — no per-tick host round
    trip); (b) single-call p50, which over this tunneled backend is
    dominated by the ~28 ms network RTT (reported for transparency).
    The B=1 solver uses the associative-scan parallel Riccati — the
    log-depth backward wins at batch 1 (serial scan wins at B>=128)."""
    import time

    import jax
    import numpy as _np

    fused, carry, x_meas = _make_fused(cpu, ocp, mh, parallel=True)
    # TWO independent device copies: the pipelined step_donated loop below
    # consumes/advances one through ~200 walking ticks; the self_rollout
    # feasibility check must start from the PRISTINE tick-0 carry.  (Round
    # 4 measured the rollout from the advanced carry and saw prim drift
    # 5e-4 -> 5e-3 — a measurement-order artifact, not a numerical
    # regression; VERDICT r4 weak #2.)
    carry = jax.device_put(carry, tpu)
    carry0 = jax.device_put(jax.tree_util.tree_map(_np.asarray, carry), tpu)
    x_meas = jax.device_put(x_meas, tpu)

    # RTT floor of the tunneled backend
    import jax.numpy as jnp

    noop = jax.jit(lambda x: x + 1.0)
    one = jax.device_put(jnp.ones(()), tpu)
    _np.asarray(noop(one))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _np.asarray(noop(one))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = float(_np.median(rtts) * 1e3)

    # single-call p50 (includes one RTT per tick); the donated executable
    # serves this, the pipelined loop, and the compile — ONE executable for
    # the whole per-tick surface (a non-donated twin would cost a second
    # 8-15 min remote compile on a bad tunnel day for the same semantics)
    carry, res = fused.step_donated(carry, x_meas)  # the only tick compile
    _np.asarray(res.prim_res)
    lats = []
    for _ in range(10):
        t0 = time.perf_counter()
        carry, res = fused.step_donated(carry, carry.xs[1])
        _np.asarray(res.prim_res)
        lats.append(time.perf_counter() - t0)
    call_ms = float(_np.median(lats) * 1e3)

    # un-amortized single-call DEVICE time, measured without subtraction:
    # dispatch k dependent step_donated calls asynchronously (no host sync
    # between them — jax dispatch is async, so the device queue back-to-
    # backs the k executions of the SINGLE-CALL executable) and sync once.
    # Per-call = total/k.  Unlike the scanned number this uses the actual
    # per-tick program (own launch overhead, donated carry buffers); unlike
    # the RTT-subtracted number it is a direct wall-clock measurement.
    k = 20
    carry, res = fused.step_donated(carry, carry.xs[1])
    _np.asarray(res.prim_res)
    pipe = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            carry, res = fused.step_donated(carry, carry.xs[1])
        _np.asarray(res.prim_res)
        pipe.append((time.perf_counter() - t0) / k)
    pipe_ms = [p * 1e3 for p in sorted(pipe)]
    pipe_p50 = float(_np.median(pipe_ms))
    pipe_p99 = float(pipe_ms[-1])
    print(f"# latency: un-amortized single-call device tick p50="
          f"{pipe_p50:.2f} ms p99={pipe_p99:.2f} ms "
          f"(async-pipelined x{k}, donated carry)", file=sys.stderr)

    # device tick latency: n dependent ticks in ONE program, from the
    # pristine tick-0 carry (same initial state every round)
    c2, (us0, xs1, prims) = fused.self_rollout(carry0, n)  # compile
    _np.asarray(prims)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, (_, _, prims) = fused.self_rollout(carry0, n)
        _np.asarray(prims)
        ts.append(time.perf_counter() - t0)
    # subtract the single dispatch RTT, divide by ticks
    lat_ms = max(float(_np.median(ts)) * 1e3 - rtt_ms, 1e-3) / n
    parr = _np.asarray(prims)
    prim, prim_med = float(parr.max()), float(_np.median(parr))
    print(f"# latency-path sanity: prim over {n}-tick rollout max="
          f"{prim:.3e} median={prim_med:.3e}", file=sys.stderr)
    # Feasibility gate mirroring the throughput phase's (VERDICT r4 next
    # #3): the benched latency configuration (parallel Riccati + bf16
    # tangents + donated carry) must keep the closed loop feasible.
    # Root cause of the r3->r4 "drift" (5.1e-4 -> 5.3e-3): the max over a
    # tick window is gait-phase dependent — a 1-iteration warm-started
    # tick transiently spikes to ~2e-3 when a swing phase enters the
    # horizon (the FULL-PRECISION f64 host engine shows the same ~2.2e-3
    # spikes), then recovers within a tick.  So the gate is two-sided:
    # transient max < 5e-3 AND median < 5e-4 (steady state).
    # tests/test_fused_mpc.py pins the same config in the nightly lane.
    assert prim < 5e-3 and prim_med < 5e-4, (
        f"latency path lost feasibility (max prim={prim:.3e}, median="
        f"{prim_med:.3e}) — refusing to emit a latency metric for a "
        "broken rollout")
    return lat_ms, call_ms, rtt_ms, pipe_p50, pipe_p99


def _supervise():
    """Run the measurement in a watchdogged child: the tunneled
    remote-compile endpoint can hang INDEFINITELY (observed), which no
    in-process retry can interrupt.  The child gets a hard wall-clock
    budget; one retry on hang/crash.  The child's stdout (the JSON
    metric lines) is re-emitted verbatim."""
    # generous default: remote compiles over the tunnel have been observed
    # at ~16 min/executable on bad days; the headline needs ONE compile +
    # the timed loop, and the supervisor salvages a partial child's stdout.
    # Worst-case wall clock = 2 attempts x BENCH_CHILD_TIMEOUT = 90 min by
    # default; if the outer driver enforces a shorter hard timeout, set
    # BENCH_TOTAL_BUDGET (seconds) and the per-attempt budget becomes
    # BENCH_TOTAL_BUDGET / 2.
    if os.environ.get("BENCH_TOTAL_BUDGET"):
        budget = int(os.environ["BENCH_TOTAL_BUDGET"]) // 2
    else:
        budget = int(os.environ.get("BENCH_CHILD_TIMEOUT", 2700))

    def emit(stdout: str) -> bool:
        """Re-emit the child's lines with the throughput headline LAST
        (the driver reads the final JSON line)."""
        lines = [ln for ln in (stdout or "").splitlines() if ln.strip()]
        head = [ln for ln in lines if "solves_per_s" in ln]
        rest = [ln for ln in lines if ln not in head]
        for ln in rest + head:
            print(ln)
        return bool(head)

    for attempt in range(2):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"]
                + sys.argv[1:],
                timeout=budget, capture_output=True, text=True)
            sys.stderr.write(r.stderr[-4000:])
            if emit(r.stdout):
                return 0
            print(f"# bench child exited rc={r.returncode} without a metric",
                  file=sys.stderr)
        except subprocess.TimeoutExpired as e:
            out = e.stdout.decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            err = e.stderr.decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
            sys.stderr.write(err[-4000:])
            print(f"# bench child exceeded {budget}s (hung remote compile?)",
                  file=sys.stderr)
            if emit(out):  # salvage a partial but valid headline
                return 0
    return 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        sys.argv.remove("--worker")
        main()
    else:
        sys.exit(_supervise())
