"""Assemble a run's saved frame PNGs into a looping .apng animation.

The reference's SAVE_VIDEO/FPS config only sets a frame cadence and leaves
assembly to the user (SURVEY.md §3.5); the GA/SA runners assemble
automatically at run end — this tool covers frames from interrupted or
older runs.

    python runners/make_video.py output/video_frames --prefix ga \
        --out output/ga_anim.apng --fps 30
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("frames_dir")
    p.add_argument("--prefix", default="ga")
    p.add_argument("--out", default="")
    p.add_argument("--fps", type=int, default=30)
    args = p.parse_args(argv)

    from ggs_tpu.utils import io as io_mod

    out = args.out or os.path.join(
        os.path.dirname(args.frames_dir.rstrip("/")) or ".",
        f"{args.prefix}_anim.apng",
    )
    path = io_mod.assemble_apng(args.frames_dir, args.prefix, out, fps=args.fps)
    if path is None:
        print(
            f"no frames matching {args.prefix}_*.png in {args.frames_dir} "
            "(or native runtime unavailable)",
            file=sys.stderr,
        )
        sys.exit(1)
    print(f"Assembled animation: {path}")


if __name__ == "__main__":
    main()
