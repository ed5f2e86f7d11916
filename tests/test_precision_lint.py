"""The precision-policy lint (tools/lint_precision.py) guards the bf16-
default bug class (round-1 SSIM-pole incident): it must pass on the
package as shipped and fail on an intentionally-unannotated conv."""
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LINT = os.path.join(_REPO, "tools", "lint_precision.py")


def _run(args):
    return subprocess.run(
        [sys.executable, _LINT, *args], capture_output=True, text=True, cwd=_REPO
    )


def test_package_is_clean():
    r = _run(["ggs_tpu", "runners", "benchmarks"])
    assert r.returncode == 0, f"precision lint violations:\n{r.stdout}"


def test_flags_unannotated_conv(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text(
        "import jax\n"
        "def f(lhs, rhs):\n"
        "    return jax.lax.conv_general_dilated(lhs, rhs, (1, 1), 'VALID')\n"
    )
    r = _run([str(bad)])
    assert r.returncode == 1
    assert "conv_general_dilated" in r.stdout


def test_allows_annotated_and_marked(tmp_path):
    ok = tmp_path / "ok.py"
    ok.write_text(
        "import jax\n"
        "import jax.numpy as jnp\n"
        "def f(lhs, rhs):\n"
        "    a = jax.lax.conv_general_dilated(\n"
        "        lhs, rhs, (1, 1), 'VALID',\n"
        "        precision=jax.lax.Precision.HIGHEST,\n"
        "    )\n"
        "    b = jnp.dot(lhs, rhs)  # precision-ok: integer indices\n"
        "    return a, b\n"
    )
    r = _run([str(ok)])
    assert r.returncode == 0, r.stdout
