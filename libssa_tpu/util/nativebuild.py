"""Lazy build of the native helper libraries (fastadb, leafalign).

The native components are throughput optimizations with pure-Python
fallbacks, which makes their ABSENCE silent — and expensive: a checkout
without ``native/libleafalign.so`` ran the 100k x 100k traceback demo
~10x slower through the Python leaf fill before anyone noticed (round 5;
the .so is a build artifact, so a fresh clone never has it). Shipping
prebuilt binaries in git is worse: they are compiled ``-march=native``
for ONE host's CPU and can SIGILL on the next (the same cross-host
hazard that poisoned the XLA:CPU compilation cache — util/jaxcache.py).

So the bridges self-build: when a library is missing (or older than its
source) and the repo's ``native/`` sources plus a C++ compiler are
available, build it once, under a file lock (the multi-process tests
spawn concurrent importers). Failure is silent by design — the Python
fallbacks remain correct, and hirschberg warns on the expensive path.
Opt out with ``LIBSSA_NO_NATIVE_BUILD=1``.
"""
from __future__ import annotations

import os
import subprocess

_CXXFLAGS = ["-O3", "-march=native", "-std=c++17", "-fPIC", "-shared"]


def _source_dir() -> str | None:
    here = os.path.dirname(os.path.abspath(__file__))  # libssa_tpu/util
    root = os.path.dirname(os.path.dirname(here))  # repo root
    cand = os.path.join(root, "native")
    return cand if os.path.isdir(cand) else None


def _fresh(out: str, src: str) -> bool:
    return os.path.isfile(out) and os.path.getmtime(out) >= os.path.getmtime(src)


def ensure_built(so_name: str, source_name: str) -> str | None:
    """Path to an up-to-date ``so_name``, building it if needed/possible."""
    if os.environ.get("LIBSSA_NO_NATIVE_BUILD"):
        return None
    src_dir = _source_dir()
    if src_dir is None:
        return None
    src = os.path.join(src_dir, source_name)
    if not os.path.isfile(src):
        return None
    out_dir = src_dir
    if not os.access(out_dir, os.W_OK):
        out_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "libssa_tpu", "native"
        )
    out = os.path.join(out_dir, so_name)
    if _fresh(out, src):
        return out
    try:
        import fcntl

        os.makedirs(out_dir, exist_ok=True)
        with open(out + ".lock", "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            if not _fresh(out, src):  # a concurrent holder may have built
                cxx = os.environ.get("CXX", "g++")
                tmp = f"{out}.tmp.{os.getpid()}"
                subprocess.run(
                    [cxx, *_CXXFLAGS, "-o", tmp, src],
                    check=True,
                    capture_output=True,
                    timeout=300,
                )
                os.replace(tmp, out)
    except Exception:
        return None
    return out
