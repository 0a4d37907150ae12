"""Build hook: compile the native C++ FASTA packer into the package.

The engine is pure Python/JAX; ``native/fastadb.cpp`` is an optional
throughput optimization for database ingestion (see io/native.py — the
pure-Python parser in io/fasta.py is the correctness path). If no C++
toolchain is available the build proceeds without the shared library.
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
        so = os.path.join(native, "libfastadb.so")
        if os.path.isdir(native) and shutil.which("make") and shutil.which("g++"):
            try:
                subprocess.run(["make", "-C", native], check=True)
            except subprocess.CalledProcessError:
                print("warning: native build failed; installing without libfastadb.so")
        if os.path.exists(so):
            dest = os.path.join(root, "libssa_tpu", "io", "libfastadb.so")
            shutil.copy2(so, dest)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
