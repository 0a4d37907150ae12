"""Kernel dispatch: pick the fastest scoring kernel for the backend.

TPU-native analogue of the reference's runtime CPU dispatch
(``src/cpu_config.c``, SURVEY.md §2: cpuid selects SSE vs AVX2 kernels at
runtime). Here the choice is between the Pallas VMEM-resident kernel
(TPU only) and the portable XLA ``lax.scan`` kernel (any backend).
"""
from __future__ import annotations

import jax

from ..ops import interseq


def backend() -> str:
    return jax.default_backend()


def pallas_available() -> bool:
    """Pallas TPU kernel importable and the backend is a real TPU."""
    if backend() != "tpu":
        return False
    try:
        from ..ops import interseq_pallas  # noqa: F401

        return True
    except ImportError:
        return False


def best_kernel(force: str | None = None):
    """Callable with the ``interseq_scores`` signature.

    ``force``: "scan" | "pallas" to override the automatic choice
    (mirrors the reference's ability to pin a SIMD level for testing).
    """
    if force == "scan":
        return interseq.interseq_scores
    if force == "pallas" or (force is None and pallas_available()):
        from ..ops import interseq_pallas

        return interseq_pallas.interseq_scores_pallas
    return interseq.interseq_scores
