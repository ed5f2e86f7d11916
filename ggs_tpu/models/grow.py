"""Error-guided splat growth — the 3DGS-densification analogue.

The reference fits a FIXED splat budget from random initialization
(modules/population.py), wasting capacity on easy regions. Here a
population can grow between fitting stages: new splats are appended (=
painted on top, §2.1 z-order) at pixels sampled from each individual's
own residual-error map, colored from the target, and sized small — so
added capacity lands exactly where the current fit is worst. Growth is a
staged operation (N is a static shape under jit): the runner chains
fitting stages through ga.genetic_approx(init_pop=...) exactly like
progressive fitting.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import objective as objective_mod
from ..ops.objective import Objective


def grow_population(
    key: jax.Array,
    pop: jnp.ndarray,  # [P, N, 9] axes-angle
    n_new: int,
    target: jnp.ndarray,  # [H, W, 3]
    obj: Objective,
    weight_mask: Optional[jnp.ndarray] = None,
    sigma_px: float = 3.0,
    alpha: float = 220.0,
) -> jnp.ndarray:
    """[P, N, 9] -> [P, N + n_new, 9] with error-guided new splats.

    Positions are sampled per individual from its own |render - target|
    residual distribution (optionally importance-weighted, without
    replacement — gumbel-top-k, see below), so each candidate's added
    splats target its own weaknesses; colors are read from the target at
    the sampled pixel; scales start near sigma_px with slight anisotropy
    left to mutation/gradients to develop.
    """
    P, N, C = pop.shape
    H, W = obj.H, obj.W
    target = target.astype(jnp.float32)

    imgs = objective_mod.render_genomes(obj, pop)  # [P, H, W, 3]
    res = jnp.sum(jnp.abs(imgs - target[None]), axis=-1)  # [P, H, W]
    if weight_mask is not None:
        res = res * weight_mask[None]
    logits = jnp.log(res.reshape(P, H * W) + 1e-9)

    key, k_pos, k_theta = jax.random.split(key, 3)
    # Gumbel-top-k: the n_new largest gumbel-perturbed logits are a
    # weighted sample WITHOUT replacement from the same residual
    # distribution. The direct route — vmapped
    # jax.random.categorical(shape=(n_new,)) — materializes a
    # [P, n_new, H*W] gumbel tensor: 8.6 GB at (32, 256, 512²), a
    # measured RESOURCE_EXHAUSTED at the flagship recipe's 256→512
    # growth stage (the r3 runs survived only because 512×384 kept it
    # at 6.4 GB). This needs ONE [P, H*W] perturbation + lax.top_k,
    # and distinct pixels per individual spread the added capacity
    # better than i.i.d. draws, which can stack several new splats on
    # a single hot pixel.
    g = jax.random.gumbel(k_pos, logits.shape, logits.dtype)  # [P, H*W]
    _, idx = jax.lax.top_k(logits + g, n_new)  # [P, n_new]
    py = idx // W
    px = idx % W

    # axes-angle columns (SURVEY.md §2.1): normalized xy so that
    # cx = x*(W-1) lands on the sampled pixel.
    x = px.astype(jnp.float32) / max(W - 1, 1)
    y = py.astype(jnp.float32) / max(H - 1, 1)
    log_s = jnp.full((P, n_new), jnp.log(sigma_px), jnp.float32)
    theta = jax.random.uniform(
        k_theta, (P, n_new), minval=-jnp.pi, maxval=jnp.pi, dtype=jnp.float32
    )
    rgb = target[py, px] * 255.0  # [P, n_new, 3]
    a = jnp.full((P, n_new), alpha, jnp.float32)

    new = jnp.concatenate(
        [
            x[..., None], y[..., None], log_s[..., None], log_s[..., None],
            theta[..., None], rgb, a[..., None],
        ],
        axis=-1,
    )
    return jnp.concatenate([pop.astype(jnp.float32), new], axis=1)


def recycle_population(
    key: jax.Array,
    pop: jnp.ndarray,  # [P, N, 9] axes-angle
    k: int,
    target: jnp.ndarray,
    obj: Objective,
    weight_mask: Optional[jnp.ndarray] = None,
    sigma_px: float = 3.0,
    alpha: float = 220.0,
) -> jnp.ndarray:
    """Prune each candidate's k lowest-impact splats and regrow them at its
    highest-residual pixels (the densify+prune cycle at FIXED N — no shape
    change, so it can run between jitted blocks without recompiling).

    Impact proxy: alpha * sigma_x * sigma_y — proportional to the splat's
    integrated Gaussian mass (2*pi*alpha*sx*sy), so near-invisible or
    near-degenerate splats are recycled first. Survivors keep their
    relative painter order; replacements are appended on top, where the
    residual says detail is missing.
    """
    P, N, C = pop.shape
    assert 0 < k < N
    imp = (
        pop[..., 8] * jnp.exp(pop[..., 2]) * jnp.exp(pop[..., 3])
    )  # [P, N] alpha(0-255 scale) * sx * sy
    # survivors = all but the k lowest-impact, in original painter order:
    # sort by (pruned, original index) and take the first N-k slots.
    _, prune_idx = jax.lax.top_k(-imp, k)  # [P, k] lowest impact
    pruned_mask = jnp.zeros((P, N), bool)
    pruned_mask = jax.vmap(lambda m, i: m.at[i].set(True))(pruned_mask, prune_idx)
    order_key = jnp.where(pruned_mask, N + jnp.arange(N)[None], jnp.arange(N)[None])
    order = jnp.argsort(order_key, axis=1)[:, : N - k]  # [P, N-k]
    survivors = jnp.take_along_axis(pop, order[..., None], axis=1)

    grown = grow_population(
        key, survivors, k, target, obj, weight_mask=weight_mask,
        sigma_px=sigma_px, alpha=alpha,
    )
    return grown
