"""Diff two benchmark JSON files and flag regressions.

Round-over-round comparability is the point of the standing harnesses
(benchmarks/suite.py rows, benchmarks/quality.py rows, bench.py's single
record) — this makes the comparison mechanical instead of eyeballed:

    python tools/bench_diff.py BENCH_r03.json BENCH_r04.json
    python tools/bench_diff.py benchmarks/QUALITY_r04.json new_quality.json
    python tools/bench_diff.py old_suite.json new_suite.json --threshold 0.05

Exit code 1 if any shared metric regresses beyond --threshold (relative):
throughput-like values (renders/s, gens/s, steps/s, psnr_db) regress by
going DOWN; energy-like values (mean exact MSE) regress by going UP.
Metrics present on only one side are listed but never fail the diff (new
rows appear, configs get renamed deliberately).
"""
from __future__ import annotations

import argparse
import json
import sys

# bench.py record fields that are configuration, not measurements
_CONFIG_FIELDS = {
    "cull_eps", "batch", "vs_baseline", "corner_cull", "hardware",
    "precision", "unit", "metric",
}


def _flatten(doc) -> dict:
    """JSON doc -> {metric_name: (value, lower_is_better)}."""
    out = {}
    if isinstance(doc, dict):  # bench.py single record
        if isinstance(doc.get("parsed"), dict):
            doc = doc["parsed"]  # the driver's BENCH_rNN.json wrapper
        metric = doc.get("metric")
        for k, v in doc.items():
            if (k in _CONFIG_FIELDS or isinstance(v, bool)
                    or not isinstance(v, (int, float))):
                continue
            out[metric if (k == "value" and metric) else k] = (float(v), False)
        return out
    for row in doc:  # suite.py / quality.py row lists
        cfg = row.get("config", "?")
        arm = row.get("arm")
        name = f"{cfg}/{arm}" if arm else cfg
        if "value" in row:  # suite: rates, higher is better
            out[name] = (float(row["value"]), False)
        if "mean" in row:  # quality: exact MSE, lower is better
            out[f"{name}/mean_mse"] = (float(row["mean"]), True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.05,
                    help="relative regression that fails the diff "
                    "(default 5%%; measurement noise on the v5e is ~1-3%%)")
    args = ap.parse_args()

    with open(args.old) as f:
        old = _flatten(json.load(f))
    with open(args.new) as f:
        new = _flatten(json.load(f))

    regressions = []
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared metrics between the two files", file=sys.stderr)
        return 2
    width = max(len(s) for s in shared)
    for name in shared:
        (ov, lower), (nv, _) = old[name], new[name]
        if ov == 0:
            continue
        rel = (nv - ov) / abs(ov)
        worse = rel > args.threshold if lower else rel < -args.threshold
        better = rel < -args.threshold if lower else rel > args.threshold
        tag = "REGRESSED" if worse else ("improved" if better else "")
        print(f"{name:<{width}}  {ov:>12.6g} -> {nv:>12.6g}  {rel:+7.2%}  {tag}")
        if worse:
            regressions.append((name, ov, nv, rel))
    for name in sorted(set(old) - set(new)):
        print(f"{name:<{width}}  {old[name][0]:>12.6g} -> (gone)")
    for name in sorted(set(new) - set(old)):
        print(f"{name:<{width}}  (new) -> {new[name][0]:>12.6g}")

    if regressions:
        print(f"\n{len(regressions)} regression(s) beyond "
              f"{args.threshold:.0%}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
