"""Checkpoint / resume for solver and MPC state.

The reference has no checkpointing (SURVEY.md §5): its nearest concept is the
warm-start state (xs_, us_) shifted each tick (mpc.cpp:201-207) plus `.npz`
trajectory dumps in the examples (examples/utils.py:34-85).  Here the entire
receding-horizon state is already a pytree (`MPCCarry`, solver `Results`,
plain warm-start tuples), so checkpointing is generic: flatten any pytree of
arrays to a single `.npz` with key-path names, restore it bit-exactly, and
resume — making long closed-loop rollouts deterministic and resumable.
"""
from __future__ import annotations

import json
from typing import Any, Dict, Optional

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.FlattenedIndexKey):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save(path: str, tree: Any, metadata: Optional[Dict] = None) -> None:
    """Serialize a pytree of arrays to one `.npz` (device arrays are pulled
    to host).  `metadata` (JSON-serializable) rides along."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {f"leaf::{_path_str(p)}": np.asarray(v) for p, v in leaves}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load(path: str, like: Any, device=None):
    """Restore a pytree saved by `save`.  `like` provides the structure
    (e.g. a freshly built MPCCarry); array values are replaced by the
    checkpoint's.  Returns (tree, metadata)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
        leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
        new_leaves = []
        for p, old in leaves:
            key = f"leaf::{_path_str(p)}"
            if key not in data:
                raise KeyError(f"checkpoint {path} is missing leaf {key}")
            arr = data[key]
            if tuple(arr.shape) != tuple(np.shape(old)):
                raise ValueError(
                    f"checkpoint leaf {key} has shape {arr.shape}, "
                    f"expected {np.shape(old)}")
            new_leaves.append(arr)
    tree = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), new_leaves)
    if device is not None:
        tree = jax.device_put(tree, device)
    return tree, meta
