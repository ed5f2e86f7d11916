"""Wheel build hook: compile the C++ host runtime into the wheel.

`pip wheel .` / `pip install .` runs `make -C ggs_tpu/native` so the
built wheel ships `libggs_native.so` prebuilt — installed environments
need no compiler (round-2 verdict #8). A source-tree checkout keeps the
lazy first-use `make` in `ggs_tpu/native/__init__.py` as the fallback,
and if the toolchain is missing at build time the wheel still builds
(the runtime then degrades to the PIL path, as documented there).
"""
import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution


class build_py_with_native(build_py):
    def run(self):
        native_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "ggs_tpu", "native"
        )
        try:
            subprocess.run(["make", "-C", native_dir, "-s"], check=True, timeout=300)
        except Exception as e:  # no compiler at build time: lazy-make fallback
            print(f"[setup] native lib not prebuilt ({e}); lazy build remains")
        super().run()


class BinaryDistribution(Distribution):
    # The wheel carries a compiled .so: tag it for the platform, not
    # py3-none-any (pip would otherwise serve it cross-platform).
    def has_ext_modules(self):
        return True


setup(cmdclass={"build_py": build_py_with_native}, distclass=BinaryDistribution)
