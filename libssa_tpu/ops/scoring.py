"""Query-profile construction for the device kernels.

Counterpart of the reference's per-search "query profile" (SWIPE dprofile
fill, SURVEY.md §3.2): for a fixed query q, precompute
``profile[i, c] = sub(q[i], c)`` for every alphabet symbol c. At search time
a subject-symbol column of scores is one profile lookup per lane — which the
TPU kernels express either as a gather or as ``profile @ onehot(s_t)`` on
the MXU (the matmul formulation is the idiomatic TPU replacement for the
reference's SSE shuffle-based dprofile gather).
"""
from __future__ import annotations

import numpy as np

from ..constants import PADDED_ALPHABET


def make_profile(q_codes: np.ndarray, padded_matrix: np.ndarray) -> np.ndarray:
    """(m, PADDED_ALPHABET) int32 profile for query ``q_codes``.

    ``padded_matrix`` is ``ScoreMatrix.padded()``; pad symbols keep their
    large-negative scores so they can never extend an alignment.
    """
    q = np.asarray(q_codes, dtype=np.intp)
    mat = np.asarray(padded_matrix, dtype=np.int32)
    if mat.shape != (PADDED_ALPHABET, PADDED_ALPHABET):
        raise ValueError(f"expected padded matrix, got {mat.shape}")
    return mat[q]
