"""On-hardware exactness: compiled Pallas kernels vs the XLA oracle.

The rest of the suite runs the kernels on the CPU interpreter (float
tolerance — interpret and the XLA-CPU oracle contract FMAs differently).
This module runs ONLY when a TPU is attached and asserts the stronger
claim the framework documents: the compiled forward kernel is bit-exact
vs the oracle (BASELINE.md "pixel-exact"), including the chunked-pass
path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggs_tpu.models import genome
from ggs_tpu.ops import codec, oracle
from ggs_tpu.ops import render_pallas as rp

try:
    _TPUS = jax.devices("tpu")
except RuntimeError:
    _TPUS = []

pytestmark = pytest.mark.skipif(not _TPUS, reason="no TPU attached")


def _on_tpu(fn, *args):
    args = [jax.device_put(a, _TPUS[0]) for a in args]
    with jax.default_device(_TPUS[0]):
        return fn(*args)


def test_compiled_render_bitexact_vs_oracle(key):
    H, W = 96, 160
    g = genome.new_population(key, 2, 24, H, W, 1.0, 0.4)
    g9 = codec.genome_to_renderer(g)
    got = _on_tpu(lambda g: rp.render_pallas(g, H, W), g9)
    ref = _on_tpu(lambda g: oracle.render_xla(g, H, W), g9)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_compiled_chunked_passes_bitexact(monkeypatch, key):
    H = W = 64
    g = genome.new_population(key, 1, 20, H, W, 1.0, 0.4)
    g9 = codec.genome_to_renderer(g)
    one = _on_tpu(lambda g: rp.render_pallas(g, H, W), g9)
    monkeypatch.setattr(rp, "_MAX_SMEM_SPLATS", 7)
    rp.render_pallas.clear_cache()
    chunked = _on_tpu(lambda g: rp.render_pallas(g, H, W), g9)
    rp.render_pallas.clear_cache()
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(one))


def test_compiled_fused_fitness_matches_image_path(key):
    H = W = 64
    g = genome.new_population(key, 4, 16, H, W, 1.0, 0.4)
    g9 = codec.genome_to_renderer(g)
    tgt = _on_tpu(
        lambda k: jax.random.uniform(k, (H, W, 3), jnp.float32), jax.random.PRNGKey(1)
    )
    fused = _on_tpu(lambda g, t: rp.fitness_pallas(g, t, None, H, W), g9, tgt)
    imgs = _on_tpu(lambda g: rp.render_pallas(g, H, W), g9)
    ref = jnp.mean((imgs - tgt[None]) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=5e-6)


def test_ssim_bounded_on_tpu(key):
    """Regression: the TPU conv defaults to bf16 multiplies, whose error
    once flipped the SSIM variance denominator's sign (optimizers then
    exploited the pole to 'energies' of -7). With HIGHEST-precision convs
    + variance clamping, SSIM must stay in [-1, 1] for any in-gamut
    images."""
    from ggs_tpu.ops import codec, oracle
    from ggs_tpu.ops import ssim as ssim_mod

    H, W = 48, 64
    g = genome.new_population(key, 6, 48, H, W, 1.0, 0.6)
    imgs = _on_tpu(lambda g: oracle.render_xla(codec.genome_to_renderer(g), H, W), g)
    tgt = imgs[0]
    s = _on_tpu(lambda a, b: ssim_mod.ssim(a, b), imgs, tgt)
    s = np.asarray(s)
    assert np.all(s <= 1.0 + 1e-5) and np.all(s >= -1.0 - 1e-5), s
    assert s[0] > 0.999  # self-similarity
