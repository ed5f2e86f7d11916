"""AOT compilation of the FLAGSHIP multi-host shapes on the CPU mesh.

BASELINE.json's multi-host config — pop=4096, 10k splats, 1024² target,
tiles+population sharded — cannot execute in this environment (one v5e;
Pallas interpret mode is far too slow at that scale), but its GSPMD
programs can be LOWERED AND COMPILED here, via jax.ShapeDtypeStruct
inputs carrying NamedShardings (no flagship-sized buffers are ever
allocated: AOT compile materializes nothing). This pins ROADMAP's claim
that the flagship shapes compile, catching shape/sharding arithmetic
blowups; the Mosaic-side (SMEM/layout) half of the claim is pinned on
real hardware by test_tpu_exactness.py::test_aot_flagship_shapes_on_device.

A scaled-down same-structure config is additionally EXECUTED end-to-end
(one fused-sharded evaluation + one sharded loss+grad), so the compiled
collectives actually run on the 8-device mesh, not just compile.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggs_tpu.config import GenomeConfig
from ggs_tpu.models import genome, gradient
from ggs_tpu.ops import objective
from ggs_tpu.parallel import mesh as mesh_mod
from ggs_tpu.parallel import shard

from conftest import cpu_devices

FLAGSHIP = dict(pop=4096, n_splats=10_000, H=1024, W=1024)


def _shaped(shape, sharding=None):
    return jax.ShapeDtypeStruct(shape, jnp.float32, sharding=sharding)


@pytest.mark.slow
def test_aot_flagship_fused_evaluator_compiles():
    """The fused sharded evaluator (objective._evaluate_fused_sharded:
    row-slab Pallas partials + psum over the tile axis) lowers and
    compiles at the full flagship shapes on a (pop=4, tile=2) mesh."""
    m = mesh_mod.make_mesh(4, 2, cpu_devices(8))
    obj = shard.sharded_objective(
        objective.Objective(
            H=FLAGSHIP["H"], W=FLAGSHIP["W"], impl="pallas", interpret=True
        ),
        m,
    )
    pop_s = _shaped(
        (FLAGSHIP["pop"], FLAGSHIP["n_splats"], 9), mesh_mod.pop_sharding(m)
    )
    tgt_s = _shaped((FLAGSHIP["H"], FLAGSHIP["W"], 3), mesh_mod.target_sharding(m))
    wm_s = _shaped((FLAGSHIP["H"], FLAGSHIP["W"]), mesh_mod.mask_sharding(m))

    compiled = (
        jax.jit(lambda p, t, w: objective.evaluate(obj, p, t, w))
        .lower(pop_s, tgt_s, wm_s)
        .compile()
    )
    out = compiled.out_info
    assert jax.tree.leaves(out)[0].shape == (FLAGSHIP["pop"],)


@pytest.mark.slow
def test_aot_flagship_sharded_loss_compiles():
    """The tile-sharded loss+grad (gradient._make_sharded_loss_fn: splat
    grads psummed over the tile axis under jax.grad) lowers and compiles
    at 10k splats / 1024² — the chunk-chained custom-VJP path."""
    m = mesh_mod.make_mesh(4, 2, cpu_devices(8))
    obj = shard.sharded_objective(
        objective.Objective(
            H=FLAGSHIP["H"], W=FLAGSHIP["W"], impl="pallas", interpret=True
        ),
        m,
    )
    gnm = GenomeConfig(n_splats=FLAGSHIP["n_splats"])
    vg = gradient.make_value_and_grad(obj, gnm)
    # fit_adam's flagship shape is ONE genome — it runs replicated over
    # the pop axis (gradient._make_sharded_loss_fn g_spec fallback)
    g_s = _shaped((1, FLAGSHIP["n_splats"], 9), mesh_mod.replicated(m))
    tgt_s = _shaped((FLAGSHIP["H"], FLAGSHIP["W"], 3), mesh_mod.target_sharding(m))
    compiled = jax.jit(lambda g, t: vg(g, t, None)).lower(g_s, tgt_s).compile()
    (_, _), grads = compiled.out_info
    assert grads.shape == (1, FLAGSHIP["n_splats"], 9)


@pytest.mark.slow
def test_flagship_structure_executes_reduced(key):
    """Same program structure (pop+tile sharded fused evaluation; sharded
    loss+grad with >1 splat chunk) EXECUTED one step at a reduced size,
    so the compiled collectives run, not just compile. n_splats is kept
    above the SMEM chunk size via monkeypatching-free reduction: the
    chunk chaining is exercised whenever n_splats > _MAX_SMEM_SPLATS,
    which flagship guarantees; here we assert only numeric sanity."""
    m = mesh_mod.make_mesh(4, 2, cpu_devices(8))
    H = W = 64
    N, B = 64, 8
    obj = shard.sharded_objective(
        objective.Objective(H=H, W=W, impl="pallas", interpret=True), m
    )
    pop = genome.new_population(key, B, N, H, W)
    pop_s = jax.device_put(pop, mesh_mod.pop_sharding(m))
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3), jnp.float32)
    tgt_s = shard.place_target(tgt, m)
    wm_s = shard.place_mask(jnp.ones((H, W), jnp.float32), m)
    f = jax.jit(lambda p, t, w: objective.evaluate(obj, p, t, w))(
        pop_s, tgt_s, wm_s
    )
    assert np.isfinite(np.asarray(f)).all() and f.shape == (B,)

    gnm = GenomeConfig(n_splats=N)
    vg = gradient.make_value_and_grad(obj, gnm)
    g1 = jax.device_put(pop[:1], mesh_mod.replicated(m))
    (loss, _), grads = jax.jit(lambda g, t: vg(g, t, None))(g1, tgt_s)
    assert np.isfinite(float(loss.sum()))
    assert np.isfinite(np.asarray(grads)).all()
