"""Gradient-descent fitting entry point (new capability — the reference is
derivative-free; this uses the differentiable renderer + projected Adam).

    python runners/run_grad.py --image imgs/reference.png --steps 2000
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", default="imgs/reference.png")
    p.add_argument("--output-dir", default="output")
    p.add_argument("--work-max-side", type=int, default=512)
    p.add_argument("--n-splats", type=int, default=2000)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--k-sigma", type=float, default=3.0)
    p.add_argument("--mask-strength", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--init-from", default="", help="checkpoint/.npy genome to warm-start from")
    p.add_argument("--impl", default="auto", choices=["auto", "pallas", "xla"])
    p.add_argument(
        "--metric", default="mse", choices=["mse", "ssim", "mix"],
        help="differentiable objective: masked MSE, DSSIM, or the fused mix",
    )
    p.add_argument("--ssim-weight", type=float, default=0.5,
                   help="mix weight on the DSSIM term (metric=mix)")
    p.add_argument(
        "--anneal-sigma0", type=float, default=0.0,
        help="scale-space homotopy: optimize the sigma-smoothed landscape "
        "first, sigma decaying to 0 over the first --anneal-frac of the "
        "steps (ops/anneal.py, docs/DESIGN.md 9c)",
    )
    p.add_argument("--anneal-frac", type=float, default=0.6)
    p.add_argument(
        "--precision", default="exact-tight",
        choices=["highest", "exact-tight", "fast"],
        help="exact-tight (default) = the deterministic tight k-sigma box "
        "render — no ε/tolerance term, ~+10%%, truncation residual in the "
        "class §8d measured polish-neutral (DESIGN §8e). "
        "highest = the reference's conservative box. "
        "fast = Adam on the ε-culled render (exact grads of that "
        "culled objective; sub-ε-alpha splats get zero grad — DESIGN §8d). "
        "Final loss/PSNR are always rescored on the highest energy.",
    )
    p.add_argument(
        "--cull-eps", type=float, default=None,
        help="fast-mode cull ε (default: 2e-3). Measured "
        "(DESIGN §8d): ε ≤ 1e-2 is quality-neutral for Adam fits; the GA's "
        "selection ε (8e-2) costs +48%% final MSE here — the polish ε and "
        "the selection ε are different knobs",
    )
    p.add_argument("--pop-shards", type=int, default=1, help="mesh: genome-batch shards")
    p.add_argument("--tile-shards", type=int, default=1, help="mesh: canvas-row shards (grads psum over this axis)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from ggs_tpu.config import GenomeConfig, GradConfig, MaskConfig
    from ggs_tpu.models import gradient
    from ggs_tpu.ops import codec, mask as mask_mod, render
    from ggs_tpu.ops.objective import Objective
    from ggs_tpu.utils import curves as curves_mod
    from ggs_tpu.utils import io as io_mod

    os.makedirs(args.output_dir, exist_ok=True)
    target = io_mod.load_image(args.image)
    H_out, W_out = target.shape[0], target.shape[1]
    H, W = codec.choose_work_size(H_out, W_out, max_side=args.work_max_side)
    print(f"target {H_out}x{W_out} -> work {H}x{W}")

    obj = Objective(
        H=H, W=W, k_sigma=args.k_sigma, impl=args.impl,
        metric=args.metric, ssim_weight=args.ssim_weight,
        precision=args.precision, cull_eps=args.cull_eps,
    )
    if args.pop_shards * args.tile_shards > 1:
        import jax

        from ggs_tpu.parallel import mesh as mesh_mod
        from ggs_tpu.parallel import shard as shard_mod

        mesh = mesh_mod.make_mesh(
            args.pop_shards, args.tile_shards,
            jax.devices()[: args.pop_shards * args.tile_shards],
        )
        obj = shard_mod.sharded_objective(obj, mesh)
    gnm = GenomeConfig(n_splats=args.n_splats)
    cfg = GradConfig(steps=args.steps, lr=args.lr)
    mask_cfg = MaskConfig(strength=args.mask_strength)

    t = io_mod.ensure_hw(jnp.asarray(target), H, W)
    wm = mask_mod.compute_importance_mask(
        t, H, W, edge_scales=tuple(mask_cfg.edge_scales), w_edge=mask_cfg.w_edge,
        w_var=mask_cfg.w_var, gamma=mask_cfg.gamma, floor=mask_cfg.floor,
        smooth=mask_cfg.smooth, strength=mask_cfg.strength,
    )

    init = None
    if args.init_from:
        init = jnp.asarray(np.load(args.init_from))

    best, best_loss, curve = gradient.fit_adam(
        t, H, W, obj=obj, gnm=gnm, cfg=cfg, init_genomes=init,
        weight_mask=wm, seed=args.seed, log_every=args.log_every,
        anneal_sigma0=args.anneal_sigma0, anneal_frac=args.anneal_frac,
    )
    print("Final loss:", best_loss)
    if best_loss > 0 and args.metric == "mse":
        import math

        print(f"PSNR: {-10.0 * math.log10(best_loss):.2f} dB")

    curves_mod.save_loss_curve_png(
        {"loss": curve}, os.path.join(args.output_dir, "grad_loss.png"),
        title="Adam fitting", xlabel="Step",
        ylabel={"mse": "MSE", "ssim": "DSSIM", "mix": "mixed energy"}[args.metric],
        log_y=True,
    )
    curves_mod.save_curves_csv({"loss": curve}, os.path.join(args.output_dir, "grad_loss.csv"))
    np.save(os.path.join(args.output_dir, "grad_genome.npy"), best)

    sH, sW = H_out / float(H), W_out / float(W)
    best_full = codec.scale_genome_pixels_anisotropic(jnp.asarray(best), sH=sH, sW=sW)
    g9 = codec.genome_to_renderer(best_full)
    final = render.render_splats(g9[None], H_out, W_out, k_sigma=args.k_sigma)[0]
    out_path = os.path.join(args.output_dir, "grad_splats.png")
    io_mod.save_image_u8(final, out_path)
    print(f"Saved full-resolution gradient-fit result as {out_path}")


if __name__ == "__main__":
    main()
