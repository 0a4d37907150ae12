"""Top-k hit selection with deterministic tie-breaking.

Counterpart of the reference's fixed-capacity min-heap (``src/util/minheap.c``,
SURVEY.md §2): keep the k best (score, seq_id) pairs, ordered by score
descending then seq_id ascending — the tie-break must be fixed so hit lists
are reproducible across chunk sizes, batch orders, devices, and hosts
(SURVEY.md §7 "identical tie-breaking in top-k ordering").

On device we avoid heaps entirely (branchy, serial — wrong shape for TPU):
a chunk's scores are reduced with a single sort on a composite key, and
running results merge by concatenate+sort. k is small (10s), chunks are
large (1000s), so sort cost is negligible next to the DP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INVALID_ID = np.int32(2**31 - 1)  # sorts after every real id
NEG_SCORE = np.int32(-(2**31) + 1)


@functools.partial(jax.jit, static_argnames=("k",))
def chunk_topk(scores: jax.Array, seq_ids: jax.Array, k: int):
    """Top-k of one chunk. Padding lanes are marked with seq_id < 0.

    Returns (scores, seq_ids) of shape (k,), score-desc / id-asc order;
    absent entries (chunk smaller than k) have NEG_SCORE / INVALID_ID.
    """
    valid = seq_ids >= 0
    s = jnp.where(valid, scores, NEG_SCORE).astype(jnp.int32)
    i = jnp.where(valid, seq_ids, INVALID_ID).astype(jnp.int32)
    neg_s, ids = jax.lax.sort((-s, i), num_keys=2)
    return -neg_s[:k], ids[:k]


@functools.partial(jax.jit, static_argnames=("k",))
def merge_topk(scores_a, ids_a, scores_b, ids_b, k: int):
    """Merge two top-k lists (e.g. running result + new chunk)."""
    s = jnp.concatenate([scores_a, scores_b])
    i = jnp.concatenate([ids_a, ids_b])
    neg_s, ids = jax.lax.sort((-s, i), num_keys=2)
    return -neg_s[:k], ids[:k]


def host_topk(scores: np.ndarray, seq_ids: np.ndarray, k: int):
    """Host-side exact top-k over accumulated per-chunk results."""
    scores = np.asarray(scores, dtype=np.int64)
    seq_ids = np.asarray(seq_ids, dtype=np.int64)
    valid = seq_ids >= 0
    scores, seq_ids = scores[valid], seq_ids[valid]
    order = np.lexsort((seq_ids, -scores))[:k]
    return scores[order], seq_ids[order].astype(np.int32)
