"""Checkpoint / resume: bit-exact state round trips (SURVEY.md §5)."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.config import GAConfig, GenomeConfig
from ggs_tpu.models import ga, genome
from ggs_tpu.ops import codec, objective, oracle
from ggs_tpu.utils import checkpoint as ckpt
import pytest

H = W = 16
GNM = GenomeConfig(n_splats=4, min_scale=1.0, max_scale=0.3)
OBJ = objective.Objective(H=H, W=W, impl="xla")
CFG = GAConfig(pop_size=4, generations=20, elite_k=1)


def _target(key):
    g = genome.new_population(key, 1, 4, H, W, GNM.min_scale, GNM.max_scale)[0]
    return oracle.render_xla(codec.genome_to_renderer(g), H, W)


@pytest.mark.slow
def test_state_roundtrip(tmp_path, key):
    target = _target(key)
    st = ga.init(key, OBJ, target, None, CFG, GNM)
    path = str(tmp_path / "ck.npz")
    ckpt.save_checkpoint(path, st, meta={"gen": 3, "note": "x"})
    st2, meta = ckpt.load_checkpoint(path, st)
    assert meta["gen"] == 3 and meta["note"] == "x"
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(a)) if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key) else np.asarray(a),
            np.asarray(jax.random.key_data(jnp.asarray(b))) if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key) else np.asarray(b),
        )


@pytest.mark.slow
def test_resume_is_bit_exact(tmp_path, key):
    """run(10) == run(5) -> checkpoint -> load -> run(5)."""
    target = _target(jax.random.PRNGKey(1001))
    run = ga.make_run_block(OBJ, CFG, GNM)

    st_full = ga.init(key, OBJ, target, None, CFG, GNM)
    st_full, _ = run(st_full, target, None, 10)

    st_a = ga.init(key, OBJ, target, None, CFG, GNM)
    st_a, _ = run(st_a, target, None, 5)
    path = str(tmp_path / "mid.npz")
    ckpt.save_checkpoint(path, st_a, meta={"gen": 5})
    template = ga.init(key, OBJ, target, None, CFG, GNM)
    st_b, _ = ckpt.load_checkpoint(path, template)
    st_b = ga.GAState(*[jnp.asarray(x) for x in st_b])
    st_b, _ = run(st_b, target, None, 5)

    np.testing.assert_array_equal(np.asarray(st_full.pop), np.asarray(st_b.pop))
    np.testing.assert_array_equal(np.asarray(st_full.fits), np.asarray(st_b.fits))
    assert float(st_full.best_fit) == float(st_b.best_fit)


def test_load_rejects_wrong_state_type(tmp_path, key):
    """A same-arity but different state type (or shape-changed config)
    must raise, not silently reinterpret arrays (round-2 verdict #6)."""
    import pytest

    from ggs_tpu.config import GradConfig
    from ggs_tpu.models import gradient

    target = _target(key)
    st = ga.init(key, OBJ, target, None, CFG, GNM)
    path = str(tmp_path / "ga.npz")
    ckpt.save_checkpoint(path, st)

    # different pytree type entirely
    opt, _ = gradient.make_fit_step(OBJ, GNM, GradConfig())
    g0 = genome.new_population(key, 4, 4, H, W, GNM.min_scale, GNM.max_scale)
    grad_state = gradient.init_state(opt, g0)
    with pytest.raises(ValueError):
        ckpt.load_checkpoint(path, grad_state)

    # same type, changed shapes (resume at a different pop size)
    st_big = ga.init(
        key, OBJ, target, None, GAConfig(pop_size=8, generations=20, elite_k=1), GNM
    )
    with pytest.raises(ValueError, match="does not match template"):
        ckpt.load_checkpoint(path, st_big)


def test_load_rejects_corrupt_file(tmp_path, key):
    import pytest

    target = _target(key)
    st = ga.init(key, OBJ, target, None, CFG, GNM)
    path = str(tmp_path / "ok.npz")
    ckpt.save_checkpoint(path, st)
    data = open(path, "rb").read()
    bad = str(tmp_path / "truncated.npz")
    with open(bad, "wb") as f:
        f.write(data[: len(data) // 3])
    with pytest.raises(ValueError, match="corrupt or truncated"):
        ckpt.load_checkpoint(bad, st)
