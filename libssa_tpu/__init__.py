"""libssa_tpu — a TPU-native optimal sequence-alignment engine.

A from-scratch JAX/Pallas re-design of the capabilities of the reference
C/SIMD library (xubo245/libssa, surveyed in /root/repo/SURVEY.md):
Smith-Waterman and Needleman-Wunsch alignment with affine gaps, BLOSUM/PAM
substitution matrices, adaptive-precision database search with top-k hit
lists, traceback alignment, and multi-host sharded search over TPU meshes.
"""

from .constants import (
    AlignType,
    BitWidth,
    ComputeMode,
    OutputMode,
    Strand,
    SymType,
)

__version__ = "0.1.0"

__all__ = [
    "AlignType",
    "BitWidth",
    "ComputeMode",
    "OutputMode",
    "Strand",
    "SymType",
    "__version__",
]
