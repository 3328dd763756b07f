"""Metrics / profiling — first-class observability.

The reference has none (solver runs QUIET; examples time `mpc.iterate` with
`time.time()`, SURVEY.md §5).  Here: a latency recorder with percentile
summaries (solves/s and p50 step latency are the headline metrics,
BASELINE.md), a hard-sync helper that works over tunneled TPU backends where
`block_until_ready` is unreliable, and a `jax.profiler` trace context.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional

import numpy as np


def hard_sync(x) -> None:
    """Force completion of all pending work feeding `x` via a host transfer
    (the only reliable sync over a tunneled device)."""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(leaves[0])


class LatencyRecorder:
    """Rolling wall-clock latency stats for a named phase."""

    def __init__(self, name: str):
        self.name = name
        self.samples: List[float] = []

    @contextlib.contextmanager
    def measure(self, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            hard_sync(sync_on)
        self.samples.append(time.perf_counter() - t0)

    def add(self, seconds: float) -> None:
        self.samples.append(seconds)

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {"name": self.name, "count": 0}
        a = np.asarray(self.samples)
        return {
            "name": self.name,
            "count": int(a.size),
            "mean_ms": float(a.mean() * 1e3),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p95_ms": float(np.percentile(a, 95) * 1e3),
            "max_ms": float(a.max() * 1e3),
        }

    def __repr__(self) -> str:
        return json.dumps(self.summary())


class SolveStats:
    """Aggregates throughput + residual telemetry across ticks — the
    'solves/s/chip' reporting surface used by bench.py / examples."""

    def __init__(self):
        self.lat = LatencyRecorder("iterate")
        self.prim: List[float] = []
        self.dual: List[float] = []

    def record(self, seconds: float, prim_res=None, dual_res=None):
        self.lat.add(seconds)
        if prim_res is not None:
            self.prim.append(float(prim_res))
        if dual_res is not None:
            self.dual.append(float(dual_res))

    def summary(self, batch: int = 1) -> Dict:
        s = self.lat.summary()
        total = sum(self.lat.samples) or 1.0
        s["solves_per_s"] = batch * len(self.lat.samples) / total
        if self.prim:
            s["prim_res_max"] = float(np.max(self.prim))
        if self.dual:
            s["dual_res_max"] = float(np.max(self.dual))
        return s


@contextlib.contextmanager
def trace(path: Optional[str] = None):
    """jax.profiler trace context (viewable in TensorBoard / xprof);
    no-op when path is None."""
    if path is None:
        yield
        return
    import jax

    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
