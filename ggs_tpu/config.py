"""Typed configuration for ggs_tpu.

The reference keeps ~30 module-level constants star-imported by its entry
scripts (reference: modules/config.py:1-73, run_ggs.py:12). Here the same
knobs (with identical defaults) live in frozen dataclasses so they are
hashable (usable as jit static args) and composable; library functions still
take explicit values, preserving the reference's explicit-kwargs discipline
(reference: modules/algorithm.py:17-31).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class MutSigma:
    """Per-gene-group mutation sigmas (reference: modules/config.py:27-43)."""

    xy: float = 0.1
    alog: float = 0.5
    blog: float = 0.5
    theta: float = 0.3
    rgb: float = 25.0
    alpha: float = 25.0

    @staticmethod
    def max_defaults() -> "MutSigma":
        return MutSigma()

    @staticmethod
    def min_defaults() -> "MutSigma":
        return MutSigma(xy=0.01, alog=0.05, blog=0.05, theta=0.025, rgb=2.0, alpha=2.0)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Rasterizer settings (reference: modules/config.py:18-19, render.py:203-214)."""

    k_sigma: float = 3.0
    tile_h: int = 64  # swept on v5e: (64,128) ~1.7x faster than (16,128)
    tile_w: int = 128
    background: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # Per-tile splat-list capacity for the binned Pallas path. None = N
    # (provably lossless; reference keeps variable-length lists,
    # render.py:51-118 — XLA needs a static capacity).
    bin_capacity: Optional[int] = None
    # "pallas" | "xla" | "auto" (auto: pallas on TPU, xla elsewhere)
    impl: str = "auto"


@dataclasses.dataclass(frozen=True)
class MaskConfig:
    """Importance-mask settings (reference: modules/mask.py:29-40, config.py:49-50)."""

    edge_scales: Tuple[int, ...] = (1, 2, 4)
    w_edge: float = 0.7
    w_var: float = 0.3
    gamma: float = 0.7
    floor: float = 0.15
    smooth: int = 3
    strength: float = 0.7
    boost_only: bool = False
    boost_beta: float = 1.0


@dataclasses.dataclass(frozen=True)
class GenomeConfig:
    """Splat-set shape and bounds (reference: modules/config.py:6,23-24)."""

    n_splats: int = 512
    min_scale: float = 3.0  # min sigma, pixels (MIN_SCALE_SPLATS)
    max_scale: float = 0.1  # max sigma, fraction of max(H, W) (MAX_SCALE_SPLATS)


@dataclasses.dataclass(frozen=True)
class GAConfig:
    """Genetic-algorithm settings (reference: modules/config.py:6-15,46)."""

    pop_size: int = 32
    generations: int = 500_000
    tour_k: int = 2
    elite_k: int = 8
    cxpb: float = 0.05
    mutpb: float = 0.05
    schedule: str = "cosine"  # sigma anneal: "cosine" | "linear" | "exp"
    # Reference re-renders elites every generation (algorithm.py:129-137);
    # fitness is deterministic so we cache elite fitness instead (documented
    # conscious fix, SURVEY.md §7). Set True to reproduce the extra renders.
    reeval_elites: bool = False


@dataclasses.dataclass(frozen=True)
class SAConfig:
    """Simulated-annealing settings (reference: modules/config.py:71-73)."""

    iterations: int = 500_000
    tries_per_iter: int = 8
    t0: float = 1e-3
    temp_schedule: str = "cosine"  # "exp"|"linear"|"cosine"|"log"|"cauchy"
    sigma_schedule: str = "cosine"
    mutpb: float = 0.05
    # "batched": all tries proposed from the iteration-start state and
    # Metropolis-accepted sequentially (one render of B=tries per iter —
    # TPU-first redesign of annealing.py:121-146, which renders B=1 eight
    # times with a host sync each). "sequential": exact reference chaining.
    proposal_mode: str = "batched"


@dataclasses.dataclass(frozen=True)
class GradConfig:
    """Gradient-descent fitting (new capability; no reference analogue)."""

    steps: int = 2000
    lr: float = 1e-2
    b1: float = 0.9
    b2: float = 0.999
    remat_chunk: int = 64  # splat-chunk size for rematerialized backward


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout: population x canvas-tile sharding (SURVEY.md §2.4)."""

    pop_axis: str = "pop"
    tile_axis: str = "tile"
    pop_shards: int = 1
    tile_shards: int = 1
    migrate_every: int = 0  # island-model migration cadence; 0 = off
    migrate_k: int = 1  # individuals migrated per event


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Top-level run settings (reference: modules/config.py:4-5,53-68)."""

    work_max_side: int = 512
    seed: int = 42
    input_dir: str = "imgs"
    output_dir: str = "output"
    ref_img: str = "reference.jpg"
    save_video: bool = True
    video_len: int = 10
    fps: int = 30
    save_loss_curve: bool = True
    loss_log_y: bool = True
    log_every: int = 50  # generations per jitted block (host-sync cadence)
    checkpoint_every: int = 0  # 0 = off

    def frame_every(self, generations: int) -> int:
        return max(1, generations // (self.fps * self.video_len))
