"""Checkpoint round-trips + metrics summaries (SURVEY.md §5 subsystems)."""
import os

import jax.numpy as jnp
import numpy as np

from simple_mpc_tpu.utils import checkpoint, metrics


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "xs": jnp.arange(12.0).reshape(3, 4),
        "nested": {"lam": jnp.ones(5), "idx": jnp.asarray(7)},
        "tup": (jnp.zeros(2), jnp.full((2, 2), 3.0)),
    }
    p = os.path.join(tmp_path, "ckpt.npz")
    checkpoint.save(p, tree, metadata={"tick": 42, "tag": "walk"})
    like = {
        "xs": jnp.zeros((3, 4)),
        "nested": {"lam": jnp.zeros(5), "idx": jnp.asarray(0)},
        "tup": (jnp.ones(2), jnp.ones((2, 2))),
    }
    restored, meta = checkpoint.load(p, like)
    assert meta == {"tick": 42, "tag": "walk"}
    np.testing.assert_array_equal(np.asarray(restored["xs"]),
                                  np.arange(12.0).reshape(3, 4))
    np.testing.assert_array_equal(np.asarray(restored["nested"]["lam"]), np.ones(5))
    assert int(restored["nested"]["idx"]) == 7
    np.testing.assert_array_equal(np.asarray(restored["tup"][1]), np.full((2, 2), 3.0))


def test_checkpoint_shape_mismatch(tmp_path):
    p = os.path.join(tmp_path, "bad.npz")
    checkpoint.save(p, {"a": jnp.zeros(3)})
    try:
        checkpoint.load(p, {"a": jnp.zeros(4)})
        assert False, "expected shape error"
    except ValueError:
        pass


def test_metrics_summary():
    st = metrics.SolveStats()
    for i in range(10):
        st.record(0.001 * (i + 1), prim_res=1e-5 * i, dual_res=2e-6)
    s = st.summary(batch=8)
    assert s["count"] == 10
    assert abs(s["p50_ms"] - 5.5) < 0.51
    assert s["solves_per_s"] > 0
    assert s["prim_res_max"] <= 1e-4
    with metrics.trace(None):
        pass  # no-op path
