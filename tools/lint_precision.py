#!/usr/bin/env python
"""Precision-policy lint: every TPU matmul/conv/resize must say its precision.

Bug class this guards (docs/ROADMAP.md, round-1 incident): TPU convs and
bilinear resizes default to bf16 multiplies (~4e-3 error); the GA exploited
the resulting SSIM-denominator pole until every conv/resize was pinned to
Precision.HIGHEST. Any newly-added `lax.conv_general_dilated`,
`jax.image.resize`, `jnp.dot`/`matmul`/`einsum`, or `lax.dot_general` call
must pass an explicit `precision=` (or `preferred_element_type=`), or carry
a `# precision-ok: <reason>` comment on the call line.

Usage: python tools/lint_precision.py [paths...]   (default: ggs_tpu runners)
Exit 1 with a per-site report on violations. Run by tests/test_precision_lint.py
and .github/workflows/ci.yml.
"""
from __future__ import annotations

import os
import re
import sys

RISKY = re.compile(
    r"\b(?:jax\.lax|lax)\.(?:conv_general_dilated|conv|dot_general|dot)\s*\("
    r"|\bjax\.image\.resize\s*\("
    r"|\b(?:jnp|jax\.numpy)\.(?:dot|matmul|einsum|tensordot)\s*\("
)
OK_MARK = "precision-ok"


def _call_text(src: str, open_paren: int) -> str:
    """Source of the balanced-paren call starting at src[open_paren] == '('."""
    depth = 0
    for i in range(open_paren, len(src)):
        c = src[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return src[open_paren : i + 1]
    return src[open_paren:]


def lint_file(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        src = f.read()
    problems = []
    for m in RISKY.finditer(src):
        line_no = src.count("\n", 0, m.start()) + 1
        line_end = src.find("\n", m.start())
        line = src[src.rfind("\n", 0, m.start()) + 1 : line_end if line_end >= 0 else None]
        if OK_MARK in line:
            continue
        call = _call_text(src, src.index("(", m.start()))
        if "precision=" in call or "preferred_element_type=" in call:
            continue
        problems.append(
            f"{path}:{line_no}: {m.group(0).rstrip('(')} without explicit "
            f"precision= (bf16-default bug class; add precision= or "
            f"'# {OK_MARK}: <reason>')"
        )
    return problems


def main(argv: list[str] | None = None) -> int:
    args = (argv if argv is not None else sys.argv[1:]) or ["ggs_tpu", "runners"]
    problems = []
    for root in args:
        if os.path.isfile(root):
            problems += lint_file(root)
            continue
        for dirpath, _, files in os.walk(root):
            for fn in files:
                if fn.endswith(".py"):
                    problems += lint_file(os.path.join(dirpath, fn))
    for p in problems:
        print(p)
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
