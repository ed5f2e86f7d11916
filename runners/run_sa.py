"""SA entry point (reference run_sags.py equivalent, with a real CLI).

    python runners/run_sa.py --image imgs/reference.png --iterations 5000
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
    p.add_argument("--n-splats", type=int, default=512)
    p.add_argument("--iterations", type=int, default=500_000)
    p.add_argument("--tries-per-iter", type=int, default=8)
    p.add_argument("--t0", type=float, default=1e-3)
    p.add_argument(
        "--temp-schedule", default="cosine",
        choices=["exp", "linear", "cosine", "log", "cauchy"],
    )
    p.add_argument("--sigma-schedule", default="cosine", choices=["cosine", "linear", "exp"])
    p.add_argument("--mutpb", type=float, default=0.05)
    p.add_argument(
        "--proposal-mode", default="batched", choices=["batched", "sequential"],
        help="batched: one render of all tries per iter (TPU-first); "
        "sequential: exact reference proposal chaining",
    )
    p.add_argument("--k-sigma", type=float, default=3.0)
    p.add_argument("--mask-strength", type=float, default=0.7)
    p.add_argument("--boost-only", action="store_true")
    p.add_argument("--impl", default="auto", choices=["auto", "pallas", "xla"])
    p.add_argument(
        "--precision", default="exact-tight",
        choices=["highest", "exact-tight", "fast", "bf16"],
        help="exact-tight (default): deterministic tight k-sigma box, "
        "~+10%% (DESIGN §8e); highest: reference conservative box; "
        "fast: +ε-cull at ~5e-5 canvas error (exp2 walk)",
    )
    p.add_argument(
        "--cull-eps", type=float, default=None,
        help="fast-mode splat-contribution cull threshold (DESIGN §8c): "
        "larger is faster at a proportionally larger canvas tolerance; "
        "selection-safe up to 8e-2, the recommended evolution setting "
        "(default: 2e-3)",
    )
    p.add_argument("--metric", default="mse", choices=["mse", "ssim", "mix"])
    p.add_argument("--ssim-weight", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--no-video", action="store_true")
    p.add_argument("--video-len", type=int, default=10)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", default="")
    p.add_argument(
        "--replicas", type=int, default=1,
        help=">1: parallel tempering — K chains on a geometric annealed "
        "temperature ladder, proposals rendered as one fused batch, "
        "neighbor swaps. K x the render cost per iteration; measured at "
        "parity with plain SA on smooth targets (docs/DESIGN.md \u00a710)",
    )
    p.add_argument("--swap-every", type=int, default=10)
    p.add_argument("--t-hot", type=float, default=0.0, help="ladder top (default 100*t0)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from ggs_tpu.config import GenomeConfig, MaskConfig, SAConfig
    from ggs_tpu.models import sa
    from ggs_tpu.ops import codec, render
    from ggs_tpu.ops.objective import Objective
    from ggs_tpu.utils import io as io_mod

    os.makedirs(args.output_dir, exist_ok=True)
    video_dir = os.path.join(args.output_dir, "video_frames_sa")
    save_video = not args.no_video
    if save_video:
        os.makedirs(video_dir, exist_ok=True)

    target = io_mod.load_image(args.image)
    H_out, W_out = target.shape[0], target.shape[1]
    H, W = codec.choose_work_size(H_out, W_out, max_side=args.work_max_side)
    print(f"target {H_out}x{W_out} -> work {H}x{W}")

    obj = Objective(
        H=H, W=W, k_sigma=args.k_sigma, boost_only=args.boost_only,
        impl=args.impl, precision=args.precision, cull_eps=args.cull_eps,
        metric=args.metric, ssim_weight=args.ssim_weight,
    )
    sa_cfg = SAConfig(
        iterations=args.iterations,
        tries_per_iter=args.tries_per_iter,
        t0=args.t0,
        temp_schedule=args.temp_schedule,
        sigma_schedule=args.sigma_schedule,
        mutpb=args.mutpb,
        proposal_mode=args.proposal_mode,
    )
    gnm = GenomeConfig(n_splats=args.n_splats)
    mask_cfg = MaskConfig(strength=args.mask_strength, boost_only=args.boost_only)
    frame_every = max(1, args.iterations // (args.fps * args.video_len))

    best, best_fit, _ = sa.simulated_annealing(
        target,
        H,
        W,
        obj=obj,
        sa=sa_cfg,
        gnm=gnm,
        mask_cfg=mask_cfg,
        seed=args.seed,
        log_every=args.log_every,
        save_video=save_video,
        frame_every=frame_every,
        video_dir=video_dir,
        prefix="sa",
        loss_png_path=os.path.join(args.output_dir, "sa_loss.png"),
        loss_csv_path=os.path.join(args.output_dir, "sa_loss.csv"),
        loss_log_y=True,
        checkpoint_path=os.path.join(args.output_dir, "sa_ckpt.npz"),
        checkpoint_every=args.checkpoint_every,
        resume_from=args.resume,
        replicas=args.replicas,
        swap_every=args.swap_every,
        t_hot=args.t_hot,
    )
    label = "MSE" if args.metric == "mse" else f"energy ({args.metric})"
    if args.precision != "highest":
        # The run's energy carries the evaluation mode's truncation bias
        # (tight-box / exp2-walk / cull-ε tail — DESIGN §8c/§8e); rescore
        # the winner on the reference-exact energy so the reported number
        # is mode-independent (mirrors run_ga / fit_adam).
        import jax.numpy as _jnp

        from ggs_tpu.ops import mask as _mask_mod, objective as _objective

        _t = io_mod.ensure_hw(_jnp.asarray(target), H, W)
        _wm = _mask_mod.compute_importance_mask(
            _t, H, W, smooth=mask_cfg.smooth, strength=mask_cfg.strength,
        )
        best_fit = float(
            _objective.evaluate(
                obj._replace(precision="highest", cull_eps=None),
                _jnp.asarray(best)[None], _t, _wm,
            )[0]
        )
        print(f"SA Best {label} (exact rescore):", best_fit)
    else:
        print(f"SA Best {label}:", best_fit)
    if best_fit > 0 and args.metric == "mse":
        import math

        print(f"PSNR: {-10.0 * math.log10(best_fit):.2f} dB")

    import jax.numpy as jnp
    import numpy as np

    sH, sW = H_out / float(H), W_out / float(W)
    best_full = codec.scale_genome_pixels_anisotropic(jnp.asarray(best), sH=sH, sW=sW)
    g9 = codec.genome_to_renderer(best_full)
    final = render.render_splats(g9[None], H_out, W_out, k_sigma=args.k_sigma, impl=args.impl)[0]
    out_path = os.path.join(args.output_dir, "sa_splats.png")
    io_mod.save_image_u8(final, out_path)
    # Save the genome itself, not just pixels (the reference only ever
    # saved a rendered PNG, run_ggs.py:69-77 — losing the parameters):
    # reload with np.load for full-res re-render or warm starts.
    np.save(os.path.join(args.output_dir, "sa_best_genome.npy"), np.asarray(best))
    print(f"Saved full-resolution SA result as {out_path}")

    if save_video:
        anim = io_mod.assemble_apng(
            video_dir, "sa", os.path.join(args.output_dir, "sa_anim.apng"), fps=args.fps
        )
        if anim:
            print(f"Assembled animation: {anim}")


if __name__ == "__main__":
    main()
