"""CLI runners (GA / SA / Adam / pipeline / video).

A regular package (not an implicit namespace package) so the installed
console scripts in pyproject.toml resolve `runners.run_*:main` robustly
and `from runners import run_ga` works without relying on namespace
resolution order.
"""
