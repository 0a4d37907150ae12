"""Linear-space Myers-Miller aligner vs the oracle and matrix aligner."""
import numpy as np
import pytest

from libssa_tpu import matrices, oracle
from libssa_tpu.search import aligner
from libssa_tpu.search.hirschberg import align_pair_linear

B62 = matrices.builtin("BLOSUM62")


def _path_score(q, s, tb, sub, Q, R):
    """Independent evaluation of a traceback path's score."""
    i, j = tb.q_begin, tb.s_begin
    total, run = 0, None
    for op in tb.cigar:
        if op == "M":
            total += int(sub[q[i], s[j]])
            i += 1
            j += 1
            run = None
        else:
            total -= R if run == op else Q
            run = op
            if op == "D":
                i += 1
            else:
                j += 1
    assert (i, j) == (tb.q_end, tb.s_end)
    return total


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
def test_fuzz_vs_oracle(local):
    rng = np.random.default_rng(7)
    for _ in range(60):
        m = int(rng.integers(1, 70))
        n = int(rng.integers(1, 70))
        go = int(rng.integers(1, 14))
        ge = int(rng.integers(1, min(go + 1, 5)))
        q = rng.integers(0, 20, m).astype(np.uint8)
        s = rng.integers(0, 20, n).astype(np.uint8)
        Q, R = oracle.gap_qr(go, ge)
        tb = align_pair_linear(q, s, B62.scores, go, ge, local)
        want = (oracle.sw_score if local else oracle.nw_score)(
            q, s, B62.scores, go, ge
        )
        assert tb.score == want
        if tb.cigar:
            assert _path_score(q, s, tb, B62.scores, Q, R) == want
        elif local:
            assert want == 0


def test_long_pair_routes_linear():
    """align_pair auto-routes big pairs; result matches a spot oracle."""
    rng = np.random.default_rng(1)
    m, n = 2000, 9001  # > MATRIX_CELL_LIMIT
    q = rng.integers(0, 20, m).astype(np.uint8)
    s = rng.integers(0, 20, n).astype(np.uint8)
    s[4000 : 4000 + 500] = q[700 : 700 + 500]  # planted local hit
    tb = aligner.align_pair(q, s, B62.scores, 11, 1, local=True)
    Q, R = oracle.gap_qr(11, 1)
    assert tb.score >= 500 * 4  # the planted identity region dominates
    assert _path_score(q, s, tb, B62.scores, Q, R) == tb.score


def test_empty_and_edge():
    q = np.array([], dtype=np.uint8)
    s = np.array([3, 4], dtype=np.uint8)
    assert align_pair_linear(q, s, B62.scores, 10, 1, True).score == 0
    assert align_pair_linear(q, s, B62.scores, 10, 1, False).score == -12
    one = align_pair_linear(
        np.array([5], dtype=np.uint8), np.array([5], dtype=np.uint8),
        B62.scores, 10, 1, False,
    )
    assert one.score == B62.scores[5, 5]
    assert one.cigar == "M"
