"""Device mesh: population x canvas-tile axes.

The reference has no distributed code at all (SURVEY.md §2.4: single
hard-coded CUDA device, host-Python evolution loop). The TPU-native scaling
story is a 2D `jax.sharding.Mesh`:

* `pop` axis — candidate-level data parallelism: each chip renders and
  evaluates a shard of the population (the reference's batch dim B,
  render.py:240, stretched across chips).
* `tile` axis — spatial parallelism: the canvas rows are sharded so each
  chip rasterizes a slab of every candidate; fitness partial sums and
  (in gradient mode) splat-parameter grads reduce over this axis. This is
  the domain's sequence/context-parallel analogue (SURVEY.md §5).

Collectives ride ICI within a slice and DCN across slices through the same
XLA ops; multi-host bootstrap is `jax.distributed.initialize`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

POP_AXIS = "pop"
TILE_AXIS = "tile"


def make_mesh(
    pop_shards: int = 1,
    tile_shards: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (pop, tile) mesh over `pop_shards * tile_shards` devices."""
    devs = list(devices) if devices is not None else jax.devices()
    n = pop_shards * tile_shards
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    grid = np.asarray(devs[:n]).reshape(pop_shards, tile_shards)
    return Mesh(grid, (POP_AXIS, TILE_AXIS))


def auto_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """Split devices between pop and tile axes (pop-major: population
    parallelism is embarrassingly parallel, so it gets the larger factor)."""
    devs = list(devices) if devices is not None else jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    tile = 1
    for cand in (2, 4):  # keep the tile axis small; fitness reduces over it
        if n % cand == 0 and n // cand >= cand:
            tile = cand
    return make_mesh(n // tile, tile, devs)


def pop_sharding(mesh: Mesh) -> NamedSharding:
    """[P, N, 9] population: sharded over the pop axis."""
    return NamedSharding(mesh, P(POP_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def target_sharding(mesh: Mesh) -> NamedSharding:
    """[H, W, 3] target: rows sharded over the tile axis."""
    return NamedSharding(mesh, P(TILE_AXIS, None, None))


def mask_sharding(mesh: Mesh) -> NamedSharding:
    """[H, W] weight mask: rows sharded over the tile axis."""
    return NamedSharding(mesh, P(TILE_AXIS, None))


def images_pspec() -> P:
    """[B, H, W, 3] candidate canvases: pop x tile sharded."""
    return P(POP_AXIS, TILE_AXIS, None, None)


def distributed_init(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bootstrap (jax.distributed.initialize passthrough).

    On a real multi-host slice each host calls this before building the
    mesh from jax.devices() (which then spans all hosts).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
