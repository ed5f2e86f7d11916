"""CLI smoke tests: every runner entry point executes end-to-end on tiny
configs (CPU, xla impl) and produces its artifacts. Guards the flag
wiring and import paths the unit tests never touch (the round-1 advisor
findings — fragile runner imports, silently-ignored flag combinations —
were all in this layer)."""
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

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


@pytest.fixture(scope="module")
def target_png(tmp_path_factory):
    d = tmp_path_factory.mktemp("img")
    img = d / "t.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)).save(img)
    return str(img)


def _run(script, args, timeout=600):
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "runners", script), *args],
        env=_env(), capture_output=True, text=True, timeout=timeout, cwd=_REPO,
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stderr[-3000:]}"
    return r


@pytest.mark.slow
def test_run_ga_cli(tmp_path, target_png):
    _run("run_ga.py", [
        "--image", target_png, "--output-dir", str(tmp_path),
        "--work-max-side", "24", "--n-splats", "8", "--pop-size", "4",
        "--elite-k", "1", "--generations", "30", "--log-every", "10",
        "--no-video", "--impl", "xla",
    ])
    assert (tmp_path / "ga_splats.png").exists()
    assert (tmp_path / "ga_best_genome.npy").exists()
    assert (tmp_path / "ga_loss.csv").exists()


@pytest.mark.slow
def test_run_ga_grow_auto_cli(tmp_path, target_png):
    _run("run_ga.py", [
        "--image", target_png, "--output-dir", str(tmp_path),
        "--work-max-side", "24", "--n-splats", "16", "--pop-size", "4",
        "--elite-k", "1", "--generations", "60", "--log-every", "10",
        "--no-video", "--impl", "xla", "--grow-auto", "--grow-patience", "5",
    ])
    assert (tmp_path / "ga_splats.png").exists()


@pytest.mark.slow
def test_run_ga_memetic_cli(tmp_path, target_png):
    """Hybrid GA+SGD via the CLI (--memetic-every), combined with the
    recommended fast evaluation mode so the commensurate-accept path
    (gradient.refine_elites scoring with the GA's own objective) runs
    end-to-end."""
    _run("run_ga.py", [
        "--image", target_png, "--output-dir", str(tmp_path),
        "--work-max-side", "24", "--n-splats", "8", "--pop-size", "4",
        "--elite-k", "1", "--generations", "30", "--log-every", "10",
        "--no-video", "--impl", "xla", "--memetic-every", "10",
        "--memetic-steps", "3",
    ])
    assert (tmp_path / "ga_splats.png").exists()
    assert (tmp_path / "ga_loss.csv").exists()


@pytest.mark.slow
def test_run_ga_progressive_fixed_mask_cli(tmp_path, target_png):
    _run("run_ga.py", [
        "--image", target_png, "--output-dir", str(tmp_path),
        "--n-splats", "8", "--pop-size", "4", "--elite-k", "1",
        "--generations", "40", "--log-every", "10", "--no-video",
        "--impl", "xla", "--progressive", "12,24", "--fixed-mask",
    ])
    assert (tmp_path / "ga_splats.png").exists()


@pytest.mark.slow
def test_run_sa_cli_with_metric(tmp_path, target_png):
    r = _run("run_sa.py", [
        "--image", target_png, "--output-dir", str(tmp_path),
        "--work-max-side", "24", "--n-splats", "8", "--iterations", "20",
        "--log-every", "10", "--no-video", "--impl", "xla", "--metric", "mix",
    ])
    assert (tmp_path / "sa_splats.png").exists()
    # default tier is exact-tight (round 5, DESIGN §8e) -> the reported
    # final must be the mode-independent exact rescore, like run_ga's
    assert "exact rescore" in r.stdout


def test_runner_default_precision_is_exact_tight():
    """Round-5 tier decision (DESIGN §8e): every runner defaults to the
    deterministic exact-tight tier; `highest` stays the reference-parity
    tier. Pinned via the help text that states the default."""
    for script in ("run_ga.py", "run_sa.py", "run_grad.py", "run_pipeline.py"):
        r = _run(script, ["--help"])
        assert "exact-tight (default)" in " ".join(r.stdout.split()), script


@pytest.mark.slow
def test_run_grad_cli(tmp_path, target_png):
    _run("run_grad.py", [
        "--image", target_png, "--output-dir", str(tmp_path),
        "--work-max-side", "24", "--n-splats", "8", "--steps", "10",
        "--log-every", "5", "--impl", "xla",
        # flag plumbing only on the xla path (the oracle loss is always
        # exact); the culled-gradient behavior itself is unit-tested in
        # test_render_grad.py / test_gradient.py
        "--precision", "fast", "--cull-eps", "8e-2",
    ])
    assert (tmp_path / "grad_splats.png").exists()
    assert (tmp_path / "grad_genome.npy").exists()


@pytest.mark.slow
def test_run_pipeline_cli(tmp_path, target_png):
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "runners", "run_pipeline.py"),
         "--image", target_png, "--output-dir", str(tmp_path),
         "--work-max-side", "24", "--n-splats", "8", "--pop-size", "4",
         "--ga-generations", "40", "--adam-steps", "5", "--no-video",
         "--grow-patience", "5", "--memetic-every", "20",
         "--memetic-steps", "2"],
        env=_env(), capture_output=True, text=True, timeout=900, cwd=_REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / "grad_splats.png").exists()
    assert (tmp_path / "grad_genome.npy").exists()
