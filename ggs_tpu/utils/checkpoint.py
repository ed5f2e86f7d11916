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


def save_checkpoint(path: str, state: Any, meta: Dict[str, Any] | None = None) -> None:
    """Save a NamedTuple/pytree of arrays + JSON-able metadata atomically."""
    leaves, treedef = jax.tree.flatten(state)

    def to_np(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            x = jax.random.key_data(x)  # typed PRNG key -> raw uint32 data
        return np.asarray(jax.device_get(x))

    arrays = {f"leaf_{i}": to_np(x) for i, x in enumerate(leaves)}
    payload = {
        "treedef": str(treedef),
        "num_leaves": len(leaves),
        "meta": meta or {},
    }
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
