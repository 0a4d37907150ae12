"""Persistent XLA compilation cache setup.

Kernel compilation through the axon TPU tunnel's remote-compile helper is
extremely slow (measured: ~270 s for one Pallas DP kernel specialization).
JAX's persistent compilation cache turns every repeat compile — across
processes and runs — into a sub-second disk load (measured: 0.4 s). This is
the search engine's equivalent of the reference library's ahead-of-time
compiled .so: pay the build cost once per kernel shape, never again.

Enabled automatically by SearchEngine/api unless LIBSSA_NO_COMPILE_CACHE is
set; cache location override via LIBSSA_COMPILE_CACHE_DIR.

The cache is TPU-only. XLA:CPU entries are ahead-of-time machine code
for the WRITER's exact CPU feature set, and on this project's rotating
virtualized hosts they are poison in both directions: loading an entry
from a previous host warns "Target machine feature +prefer-no-scatter is
not supported ... could lead to execution errors such as SIGILL", and
XLA:CPU executable SERIALIZATION itself segfaulted deterministically
mid-suite on some hosts (faulthandler: `put_executable_and_time` →
`zstandard.backend_c`, twice, different tests). CPU compiles are local
and fast — the cache buys nothing there. TPU executables are compiled
for the TPU target, not the host, so they cache safely and survive host
swaps — which is the whole point (tunnel compiles cost ~270 s each).
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

    try:
        if jax.default_backend() == "cpu":
            return  # see module docstring: CPU AOT caching is unsafe here
    except Exception:
        return

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
