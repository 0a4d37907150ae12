"""Persistent XLA compilation cache setup.

Kernel compilation through the axon TPU tunnel's remote-compile helper is
extremely slow (measured: ~270 s for one Pallas DP kernel specialization).
JAX's persistent compilation cache turns every repeat compile — across
processes and runs — into a sub-second disk load (measured: 0.4 s). This is
the search engine's equivalent of the reference library's ahead-of-time
compiled .so: pay the build cost once per kernel shape, never again.

Enabled automatically by SearchEngine/api unless LIBSSA_NO_COMPILE_CACHE is
set; cache location override via LIBSSA_COMPILE_CACHE_DIR.
"""
from __future__ import annotations

import os

_done = False


def enable_compilation_cache() -> None:
    global _done
    if _done or os.environ.get("LIBSSA_NO_COMPILE_CACHE"):
        return
    _done = True
    import jax

    path = os.environ.get(
        "LIBSSA_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "libssa_tpu", "xla"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never a hard dependency
        pass
