"""ggs_tpu — a TPU-native genetic/annealed/gradient Gaussian-splat image
approximation framework (JAX / XLA / Pallas / shard_map).

Built from scratch with the capabilities of josedelrey/genetic-gaussian-splats
(surveyed in SURVEY.md) plus the capabilities the reference lacks: an exact
differentiable backward pass through the compositing order, gradient and
hybrid memetic fitting, fused on-chip fitness, and multi-chip
population/tile sharding.

Layout:
    ops/       codec, renderers (XLA oracle + Pallas TPU kernel), mask, fitness
    models/    population init, GA / SA / gradient optimizers
    parallel/  device mesh, sharded evaluators, island-model collectives
    utils/     image IO, loss curves, checkpointing, profiling
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
