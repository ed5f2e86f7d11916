"""Checkpoint / resume: bit-exact restart points for long runs.

The reference has no reloadable state at all — a dead 500k-generation run
loses everything but PNG frames (SURVEY.md §5, modules/config.py:8). Here
any NamedTuple-of-arrays optimizer state (GAState, SAState, GradState) plus
metadata round-trips through a single .npz: arrays (including the PRNG key)
are saved verbatim, so resuming reproduces the exact trajectory the
uninterrupted run would have taken.
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _write_npz(path: str, arrays: Dict[str, np.ndarray], payload: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __meta__=json.dumps(payload), **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _leaf_to_np(x):
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        x = jax.random.key_data(x)  # typed PRNG key -> raw uint32 data
    return np.asarray(jax.device_get(x))


def save_checkpoint(path: str, state: Any, meta: Dict[str, Any] | None = None) -> None:
    """Save a NamedTuple/pytree of arrays + JSON-able metadata atomically."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": _leaf_to_np(x) for i, x in enumerate(leaves)}
    payload = {
        "treedef": str(treedef),
        "num_leaves": len(leaves),
        "meta": meta or {},
    }
    _write_npz(path, arrays, payload)


def save_checkpoint_distributed(
    path: str, state: Any, meta: Dict[str, Any] | None = None
) -> None:
    """Multi-host-safe save: shards that span processes are allgathered to
    every host (one collective per sharded leaf), process 0 writes the
    .npz atomically, and a global barrier orders the write before any
    process proceeds — so a subsequent load on any host sees the file.
    Resuming loads with load_checkpoint + parallel.shard.place_* (each
    process re-places its own shards). Single-process, this degrades to
    exactly save_checkpoint. Closes SURVEY §5's multi-host
    checkpoint/restart gap; tested by tests/test_multiprocess.py.
    """
    from jax.experimental import multihost_utils

    leaves, treedef = jax.tree.flatten(state)

    def gather(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            x = jax.random.key_data(x)
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            x = multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(jax.device_get(x))

    arrays = {f"leaf_{i}": gather(x) for i, x in enumerate(leaves)}
    payload = {
        "treedef": str(treedef),
        "num_leaves": len(leaves),
        "meta": meta or {},
    }
    if jax.process_index() == 0:
        _write_npz(path, arrays, payload)
    if jax.process_count() > 1:
        multihost_utils.sync_global_devices("ggs_ckpt_written:" + path)


def load_checkpoint(path: str, like: Any) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint into the structure of `like` (same pytree shape).

    Returns (state, meta). Dtypes/shapes come from the file; the PRNG key
    leaf is restored with its original dtype so RNG streams continue
    bit-exactly.
    """
    with np.load(path, allow_pickle=False) as z:
        payload = json.loads(str(z["__meta__"]))
        n = int(payload["num_leaves"])
        arrays = [z[f"leaf_{i}"] for i in range(n)]
    leaves, treedef = jax.tree.flatten(like)
    if len(leaves) != n:
        raise ValueError(
            f"checkpoint has {n} leaves but template has {len(leaves)}"
        )
    restored = []
    for tmpl, arr in zip(leaves, arrays):
        if hasattr(tmpl, "dtype") and jax.dtypes.issubdtype(tmpl.dtype, jax.dtypes.prng_key):
            # typed PRNG keys: rewrap raw uint32 data
            restored.append(jax.random.wrap_key_data(arr))
        else:
            restored.append(arr)
    return jax.tree.unflatten(treedef, restored), payload["meta"]
