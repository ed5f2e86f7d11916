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


_FORMAT_VERSION = 2  # v2: treedef + per-leaf shape/dtype validated on load


def save_checkpoint(path: str, state: Any, meta: Dict[str, Any] | None = None) -> None:
    """Save a NamedTuple/pytree of arrays + JSON-able metadata atomically."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": _leaf_to_np(x) for i, x in enumerate(leaves)}
    payload = {
        "format_version": _FORMAT_VERSION,
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
        "format_version": _FORMAT_VERSION,
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

    Returns (state, meta). The stored treedef string and every leaf's
    shape/dtype are validated against the template: two state types with
    the same arity (e.g. SAState vs GradState) must NOT silently
    reinterpret each other's arrays (round-2 verdict #6) — a mismatch
    raises ValueError instead. The PRNG key leaf is restored with its
    original dtype so RNG streams continue bit-exactly.
    """
    import zipfile

    try:
        with np.load(path, allow_pickle=False) as z:
            payload = json.loads(str(z["__meta__"]))
            n = int(payload["num_leaves"])
            arrays = [z[f"leaf_{i}"] for i in range(n)]
    except (KeyError, ValueError, OSError, EOFError, zipfile.BadZipFile) as e:
        raise ValueError(f"corrupt or truncated checkpoint {path!r}: {e}") from e
    version = int(payload.get("format_version", 1))
    if version > _FORMAT_VERSION:
        raise ValueError(
            f"checkpoint {path!r} has format v{version}; this build reads <= v{_FORMAT_VERSION}"
        )
    leaves, treedef = jax.tree.flatten(like)
    if len(leaves) != n:
        raise ValueError(
            f"checkpoint has {n} leaves but template has {len(leaves)}"
        )
    if payload.get("treedef") and payload["treedef"] != str(treedef):
        raise ValueError(
            f"checkpoint state type mismatch: stored treedef\n  {payload['treedef']}\n"
            f"does not match template\n  {treedef}"
        )
    restored = []
    for i, (tmpl, arr) in enumerate(zip(leaves, arrays)):
        is_key = hasattr(tmpl, "dtype") and jax.dtypes.issubdtype(
            tmpl.dtype, jax.dtypes.prng_key
        )
        if is_key:
            # typed PRNG keys: rewrap raw uint32 data
            restored.append(jax.random.wrap_key_data(arr))
            continue
        # Lazy fallbacks: getattr's default is evaluated EAGERLY, and
        # np.asarray on a multi-process global jax.Array raises (its value
        # spans non-addressable devices) — so never touch the data when the
        # template already carries shape/dtype attributes.
        t_shape = tuple(tmpl.shape) if hasattr(tmpl, "shape") else np.shape(tmpl)
        t_dtype = (
            np.dtype(tmpl.dtype) if hasattr(tmpl, "dtype") else np.asarray(tmpl).dtype
        )
        if tuple(arr.shape) != t_shape or np.dtype(arr.dtype) != t_dtype:
            raise ValueError(
                f"checkpoint leaf {i}: stored {arr.dtype}{list(arr.shape)} does not "
                f"match template {t_dtype}{list(t_shape)} (did the config change "
                "between save and resume?)"
            )
        restored.append(arr)
    return jax.tree.unflatten(treedef, restored), payload["meta"]
