"""Build hook: compile the native C++ components into the package.

The engine is pure Python/JAX; ``native/fastadb.cpp`` (FASTA ingestion)
and ``native/leafalign.cpp`` (Myers-Miller leaf solver) are throughput
optimizations with pure-Python correctness paths (io/fasta.py,
search/hirschberg._ops_small). If no C++ toolchain is available the
build proceeds without the shared libraries.
"""
from __future__ import annotations

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        root = os.path.dirname(os.path.abspath(__file__))
        native = os.path.join(root, "native")
        if os.path.isdir(native) and shutil.which("make") and shutil.which("g++"):
            try:
                subprocess.run(["make", "-C", native], check=True)
            except subprocess.CalledProcessError:
                print("warning: native build failed; installing without .so libs")
        for name in ("libfastadb.so", "libleafalign.so"):
            so = os.path.join(native, name)
            if os.path.exists(so):
                shutil.copy2(so, os.path.join(root, "libssa_tpu", "io", name))
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
