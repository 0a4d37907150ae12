"""Process-level infrastructure guarantees the suite itself relies on.

The full suite compiles thousands of XLA:CPU programs in one process;
each live executable holds ~3.5 memory mappings (ORC JIT sections), and
crossing the kernel's vm.max_map_count ceiling (default 65530) turns
LLVM's next mmap failure into a hard SIGSEGV inside
backend_compile_and_load (observed deterministically around test ~300
before the conftest high-watermark fixture landed). This test locks the
mechanism that fixture depends on: jax.clear_caches() + gc must
actually RELEASE the executables' mappings, not merely drop Python
references.
"""
import gc
import os

import pytest


def _n_maps() -> int:
    with open("/proc/self/maps") as f:
        return sum(1 for _ in f)


@pytest.mark.skipif(
    not os.path.exists("/proc/self/maps"), reason="needs Linux /proc"
)
def test_clear_caches_releases_jit_code_maps():
    import jax
    import jax.numpy as jnp

    # Compile 20 distinct programs (distinct shapes force fresh
    # executables rather than cache hits).
    for i in range(20):
        n = 64 + i
        f = jax.jit(lambda x, n=n: (x @ jnp.ones((n, n))) * n)
        f(jnp.ones((2, n), jnp.float32)).block_until_ready()
    grown = _n_maps()

    jax.clear_caches()
    gc.collect()
    dropped = grown - _n_maps()

    # 20 executables hold ~70 mappings; demand a clear majority released
    # (other allocator traffic can add/remove a handful either way).
    assert dropped >= 30, (
        f"jax.clear_caches released only {dropped} of the ~70 JIT code "
        f"mappings 20 fresh executables hold — the conftest map-count "
        f"high-watermark fixture would no longer prevent "
        f"vm.max_map_count exhaustion (see tests/conftest.py)"
    )
