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


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
def test_fuzz_leaf_vs_recursion(local, monkeypatch):
    """The direct leaf solve (_ops_small) vs the full recursion.

    Tiny LEAF_CELLS forces deep splits so leaves see every (tb, te)
    boundary-contract combination; gap-heavy shapes (m >> n and n >> m)
    drive the t2 (gap-crossing) branch. Scores must equal the oracle and
    every returned path must evaluate to that score.
    """
    from libssa_tpu.search import hirschberg as hb

    rng = np.random.default_rng(11 if local else 12)
    for trial in range(30):
        m = int(rng.integers(2, 90))
        n = int(rng.integers(2, 90))
        if trial % 3 == 1:
            m, n = m * 3, max(2, n // 4)  # deletion-heavy
        elif trial % 3 == 2:
            m, n = max(2, m // 4), n * 3  # insertion-heavy
        go = int(rng.integers(1, 14))
        ge = int(rng.integers(1, min(go + 1, 5)))
        q = rng.integers(0, 20, m).astype(np.uint8)
        s = rng.integers(0, 20, n).astype(np.uint8)
        Q, R = oracle.gap_qr(go, ge)
        monkeypatch.setattr(hb, "LEAF_CELLS", 0)
        rec = align_pair_linear(q, s, B62.scores, go, ge, local)
        monkeypatch.setattr(hb, "LEAF_CELLS", 64)
        leafy = align_pair_linear(q, s, B62.scores, go, ge, local)
        monkeypatch.setattr(hb, "LEAF_CELLS", 1 << 20)
        direct = align_pair_linear(q, s, B62.scores, go, ge, local)
        want = (oracle.sw_score if local else oracle.nw_score)(
            q, s, B62.scores, go, ge
        )
        for tb in (rec, leafy, direct):
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


def test_leaf_native_matches_python():
    """native/leafalign.cpp == _ops_small: same ops, every (tb, te)
    boundary-contract combo, random and tie-heavy inputs."""
    import itertools

    import pytest

    from libssa_tpu.search import hirschberg as hb
    from libssa_tpu.search.leafnative import leaf_ops_native, native_available

    if not native_available():
        pytest.skip("libleafalign.so not built (make -C native)")
    cost = -B62.scores.astype(np.int64)
    Q, R = oracle.gap_qr(10, 1)
    g, h = Q - R, R
    rng = np.random.default_rng(7)
    cases = []
    for _ in range(60):
        m = int(rng.integers(2, 70))
        n = int(rng.integers(1, 70))
        cases.append(
            (
                rng.integers(0, 20, m).astype(np.intp),
                rng.integers(0, 20, n).astype(np.intp),
            )
        )
    motif = np.array([12, 4, 9, 1], np.intp)
    cases.append((np.tile(motif, 30), np.tile(motif, 35)))  # tie-heavy
    for q, s in cases:
        for tb, te in itertools.product((0, g), (0, g)):
            got = leaf_ops_native(q, s, cost, g, h, tb, te)
            want = hb._ops_small(q, s, cost, g, h, tb, te)
            assert got == want, (len(q), len(s), tb, te)
