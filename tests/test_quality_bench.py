"""Protocol smoke for the standing quality benchmark (benchmarks/quality.py).

The quality harness is itself load-bearing: its JSON rows are what
RESULTS_v5e.md's quality table and round-over-round regression diffs
consume, and its arm protocols encode measurement rules (warm both GA
arms before any timed wall, derive the equal-time budget from realized
walls, rescore every final on the EXACT energy) that a silent breakage
would invalidate without failing loudly. These tests run the real CLI
end-to-end on tiny CPU configs and pin the row schema + basic sanity.
"""
import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    # Same subprocess hygiene as tests/test_runners.py: strip the axon
    # plugin path (it ignores JAX_PLATFORMS) and force pure-CPU jax.
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


def _run_quality(args, timeout=1500):
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "benchmarks", "quality.py"), *args],
        env=_env(), capture_output=True, text=True, timeout=timeout, cwd=_REPO,
    )
    assert r.returncode == 0, f"quality.py failed:\n{r.stderr[-3000:]}"
    return r


@pytest.mark.slow
def test_quality_ga_and_adam_protocol(tmp_path):
    out = tmp_path / "q.json"
    _run_quality([
        "--arms", "ga,ga-time,adam", "--families", "synthetic,text",
        "--seeds", "42,43", "--gens", "1000", "--impl", "xla",
        "--size", "64", "--n-splats", "32",
        "--adam-n", "64", "--adam-steps", "100", "--adam-eps", "0.01",
        "--out", str(out),
    ])
    rows = json.load(open(out))
    by = {(r["config"], r["arm"]): r for r in rows}

    # every (config, arm) cell the protocol promises is present
    for fam in ("synthetic", "text"):
        assert (f"quality-ga-{fam}", "exact") in by
        assert (f"quality-ga-{fam}", "fast-eps0.08") in by
        assert (f"quality-ga-time-{fam}", "fast-eps0.08") in by
        assert (f"quality-adam-{fam}", "exact") in by
        assert (f"quality-adam-{fam}", "fast-eps0.01") in by

    for row in rows:
        # schema pinned: these keys are what RESULTS/diffs consume
        assert {"config", "arm", "exact_final_mse", "mean", "psnr_db"} <= set(row)
        assert set(row["exact_final_mse"]) == {"42", "43"}
        assert 0.0 < row["mean"] < 1.0
        assert row["psnr_db"] > 0.0

    # equal-wall budgets derive from realized walls: the ga-time arm must
    # run at least the equal-gens budget's generations
    for fam in ("synthetic", "text"):
        assert by[(f"quality-ga-time-{fam}", "fast-eps0.08")]["gens"] >= 1000

    # fast and exact at equal budget land in the same energy regime: the
    # GA rows are exact-rescored, so a broken rescore (e.g. scoring with
    # the fast energy) would show up as a systematic scale difference
    for fam in ("synthetic", "text"):
        ex = by[(f"quality-ga-{fam}", "exact")]["mean"]
        fa = by[(f"quality-ga-{fam}", "fast-eps0.08")]["mean"]
        assert fa < 3.0 * ex and ex < 3.0 * fa, (fam, ex, fa)
    # Adam reaches far below random-init energy (it optimizes directly)
    assert by[("quality-adam-synthetic", "exact")]["mean"] < 0.05


@pytest.mark.slow
def test_quality_pipeline_arm(tmp_path):
    """The in-process pipeline arm drives the REAL run_pipeline entry and
    rescores the saved genome on the exact energy."""
    out = tmp_path / "qp.json"
    _run_quality([
        "--arms", "pipeline", "--seeds", "42", "--impl", "xla",
        "--size", "48", "--pipeline-families", "synthetic",
        "--pipeline-gens", "60", "--pipeline-adam-steps", "5",
        "--pipeline-n-splats", "8",
        "--out", str(out),
    ])
    rows = json.load(open(out))
    arms = {r["arm"] for r in rows}
    assert arms == {"exact", "fast-eps0.08"}
    for row in rows:
        assert row["config"] == "quality-pipeline-synthetic"
        assert row["ga_gens"] == 60 and row["adam_steps"] == 5
        assert set(row["exact_final_mse"]) == {"42"}
        assert 0.0 < row["mean"] < 1.0
