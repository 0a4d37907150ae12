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

if not os.environ.get("LIBSSA_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
