"""Aligner (fast traceback) vs the scalar oracle — three-way cross-check.

The aligner's row-vectorized fill, the scalar oracle, and the device kernels
are three independent implementations of the same recurrences; this suite
locks aligner == oracle (kernels == oracle is locked elsewhere).
"""
import numpy as np
import pytest

from libssa_tpu import matrices, oracle
from libssa_tpu.search.aligner import align_pair, fill_matrices

B62 = matrices.builtin("BLOSUM62")


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
def test_matrices_match_oracle(local):
    rng = np.random.default_rng(0)
    for _ in range(10):
        m, n = int(rng.integers(1, 25)), int(rng.integers(1, 25))
        q = rng.integers(0, 20, m).astype(np.uint8)
        s = rng.integers(0, 20, n).astype(np.uint8)
        Q, R = 11, 1
        H2, E2, F2 = fill_matrices(q, s, B62.scores, Q, R, local)
        H1, E1, F1 = oracle._dp_matrices(q, s, B62.scores, Q, R, local)
        np.testing.assert_array_equal(H1, H2)
        np.testing.assert_array_equal(F1[1:, 1:], F2[1:, 1:])
        np.testing.assert_array_equal(E1[1:, 1:], E2[1:, 1:])


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
@pytest.mark.parametrize("gaps", [(10, 1), (0, 2), (5, 5)])
def test_align_pair_matches_oracle(local, gaps):
    go, ge = gaps
    rng = np.random.default_rng(go * 3 + ge)
    fn = oracle.sw_align if local else oracle.nw_align
    for _ in range(8):
        m, n = int(rng.integers(2, 30)), int(rng.integers(2, 30))
        q = rng.integers(0, 20, m).astype(np.uint8)
        s = rng.integers(0, 20, n).astype(np.uint8)
        got = align_pair(q, s, B62.scores, go, ge, local)
        want = fn(q, s, B62.scores, go, ge)
        assert got == want  # identical Traceback incl. cigar (canonical path)


def test_align_pair_speed_on_long_pair():
    """The point of the fast fill: long pairs must align in well under a
    second (the scalar oracle takes tens of seconds here)."""
    import time

    rng = np.random.default_rng(1)
    q = rng.integers(0, 20, 1500).astype(np.uint8)
    s = rng.integers(0, 20, 1500).astype(np.uint8)
    # Best of 2: a single-core host saturated by a concurrent benchmark
    # can stall any one run (observed twice in round 2); the oracle-vs-
    # vectorized gap is ~2 orders of magnitude, so min-of-2 under 15 s
    # still proves the point without flaking under load.
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        tb = align_pair(q, s, B62.scores, 10, 1, local=True)
        best = min(best, time.perf_counter() - t0)
        if best < 8.0:
            break
    assert best < 15.0
    assert tb.score > 0


def test_align_pair_empty():
    q = np.array([0, 1], dtype=np.uint8)
    e = np.zeros(0, dtype=np.uint8)
    assert align_pair(q, e, B62.scores, 10, 1, True).score == 0
    assert align_pair(q, e, B62.scores, 10, 1, False).score == -12
