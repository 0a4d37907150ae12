"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is tested without TPU hardware by forcing the CPU
backend with 8 virtual devices (SURVEY.md §4: the collective top-k merge is
testable single-host this way). Set LIBSSA_TEST_TPU=1 to run the suite on
whatever real accelerator JAX finds instead.

NOTE: the JAX_PLATFORMS environment variable is NOT sufficient under the
axon TPU plugin — the plugin still registers itself as the default backend.
``jax.config.update("jax_platforms", "cpu")`` before any computation is what
actually forces CPU (verified; without it the whole suite silently runs on,
and serializes against, the single real TPU chip).
"""
import os

import pytest

if not os.environ.get("LIBSSA_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


# Every XLA:CPU executable holds ~3.5 memory mappings of JIT'd code for
# the life of the process; the full suite compiles thousands of programs,
# so one pytest process crosses the kernel's vm.max_map_count ceiling
# (default 65530) around test ~300 and LLVM's next mmap fails with a
# hard SIGSEGV inside backend_compile_and_load (measured: maps grew to
# 63k+ thirty seconds before a deterministic crash in test_sharded; a
# jax.clear_caches() + gc drops the count right back — verified 865->501
# over two compile/clear cycles of 120 programs). Clearing at a high
# watermark keeps the suite far from the ceiling and only costs
# recompiles from that point on.
_MAPS_HIGH_WATER = 35_000


@pytest.fixture(autouse=True)
def _bound_jit_code_maps():
    yield
    try:
        with open("/proc/self/maps") as f:
            n_maps = sum(1 for _ in f)
    except OSError:  # non-Linux: no /proc, and no map-count ceiling
        return
    if n_maps > _MAPS_HIGH_WATER:
        import gc

        import jax

        jax.clear_caches()
        gc.collect()
