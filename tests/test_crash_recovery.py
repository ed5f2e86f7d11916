"""Fault injection + recovery (SURVEY.md §5 failure-detection gap):
SIGKILL a real GA run mid-flight and resume it from the periodic
checkpoint — the run must pick up at the checkpointed generation and
finish with the normal artifacts. Complements test_checkpoint.py's
bit-exact resume (which proves trajectory equality; this proves the
full CLI crash path end to end)."""
import os
import signal
import subprocess
import sys
import time

import numpy as np
from PIL import Image
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    inherited = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([_REPO] + inherited)
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.slow
def test_sigkill_then_resume(tmp_path):
    img = tmp_path / "target.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(img)
    out = tmp_path / "out"
    base = [
        sys.executable, os.path.join(_REPO, "runners", "run_ga.py"),
        "--image", str(img), "--output-dir", str(out),
        "--work-max-side", "32", "--n-splats", "16", "--pop-size", "8",
        "--elite-k", "2", "--generations", "2000", "--log-every", "50",
        "--checkpoint-every", "100", "--no-video", "--impl", "xla",
    ]
    ckpt = out / "ga_ckpt.npz"

    p = subprocess.Popen(
        base, env=_env(), stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )
    try:
        deadline = time.time() + 420
        while time.time() < deadline:
            if ckpt.exists() and ckpt.stat().st_size > 0:
                time.sleep(2)  # get past any in-flight atomic replace
                break
            if p.poll() is not None:
                raise AssertionError(f"run exited early rc={p.returncode}")
            time.sleep(1)
        assert ckpt.exists(), "no checkpoint appeared before the kill"
        p.send_signal(signal.SIGKILL)  # hard crash: no cleanup, no flush
        p.wait(timeout=60)
    finally:
        if p.poll() is None:
            p.kill()


    with np.load(ckpt, allow_pickle=False) as z:
        import json

        meta = json.loads(str(z["__meta__"]))["meta"]
    crashed_gen = int(meta["gen"])
    assert crashed_gen >= 100

    r = subprocess.run(
        base + ["--resume", str(ckpt)],
        env=_env(), capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (out / "ga_splats.png").exists()
    assert (out / "ga_best_genome.npy").exists()
    # The resumed run continued from the checkpoint, not from scratch:
    # its curve CSV covers the full budget starting at the crashed gen.
    rows = (out / "ga_loss.csv").read_text().strip().splitlines()
    assert len(rows) - 1 >= 2000 - crashed_gen
