"""Device Myers-Miller row passes (ops/mm_device.py) vs the host passes.

Interpret mode on CPU; the host NumPy implementations in
search/hirschberg.py are the correctness anchors (themselves locked
against the int64 oracle by test_hirschberg.py).
"""
import numpy as np
import pytest

from libssa_tpu import matrices, oracle
from libssa_tpu.ops.mm_device import (
    DevicePair,
    mm_pass_rows,
    sw_end_cell,
)
from libssa_tpu.search import hirschberg as hb

B62 = matrices.builtin("BLOSUM62")
Q, R = oracle.gap_qr(10, 1)
G, H = Q - R, R
COST = -B62.scores.astype(np.int64)


@pytest.mark.parametrize("m,n", [(40, 60), (300, 200), (513, 287), (96, 700)])
@pytest.mark.parametrize("tb0", [False, True], ids=["tb=g", "tb=0"])
def test_mm_pass_rows_matches_host(m, n, tb0):
    rng = np.random.default_rng(m + n + (1 if tb0 else 0))
    q = rng.integers(0, 20, m).astype(np.intp)
    s = rng.integers(0, 20, n).astype(np.intp)
    CC, DD = mm_pass_rows(
        q, s, B62.padded(), Q, R, tb0, RB=256, WC=256, interpret=True
    )
    wCC, wDD = hb._mm_pass(q, s, COST, G, H, 0 if tb0 else G)
    np.testing.assert_array_equal(CC, wCC)
    np.testing.assert_array_equal(DD, wDD)


@pytest.mark.parametrize("m,n,qs,ss", [(500, 400, 37, 91), (260, 600, 100, 0)])
@pytest.mark.parametrize("tb0", [False, True], ids=["tb=g", "tb=0"])
def test_windowed_pass_matches_host(m, n, qs, ss, tb0):
    """A traced (offset, m, n) window into the resident planes == the
    host pass on the sliced arrays — forward AND reversed planes."""
    rng = np.random.default_rng(m + qs + (1 if tb0 else 0))
    q = rng.integers(0, 20, m).astype(np.intp)
    s = rng.integers(0, 20, n).astype(np.intp)
    dev = DevicePair(q, s, B62.padded(), Q, R, interpret=True, RB=256, WC=256)
    mi, ni = 150, 200
    CC, DD = dev.mm_pass(qs, mi, ss, ni, tb0)
    wCC, wDD = hb._mm_pass(
        q[qs : qs + mi], s[ss : ss + ni], COST, G, H, 0 if tb0 else G
    )
    np.testing.assert_array_equal(CC, wCC)
    np.testing.assert_array_equal(DD, wDD)
    # Reversed planes: window (m-qe, mi) == host pass on rev slices.
    CCr, DDr = dev.mm_pass(m - (qs + mi), mi, n - (ss + ni), ni, tb0,
                           reverse=True)
    wCCr, wDDr = hb._mm_pass(
        q[qs : qs + mi][::-1].copy(), s[ss : ss + ni][::-1].copy(),
        COST, G, H, 0 if tb0 else G,
    )
    np.testing.assert_array_equal(CCr, wCCr)
    np.testing.assert_array_equal(DDr, wDDr)


@pytest.mark.parametrize(
    "tbs", [(False, False), (True, False), (False, True)]
)
def test_divide_level_matches_host(tbs):
    """One-dispatch divide LEVEL (mixed node sizes, padded node count) ==
    the host t1/t2 argmin splits, node by node."""
    rng = np.random.default_rng(sum(tbs) + 11)
    m, n = 601, 240
    q = rng.integers(0, 20, m).astype(np.intp)
    s = rng.integers(0, 20, n).astype(np.intp)
    dev = DevicePair(q, s, B62.padded(), Q, R, interpret=True, RB=256, WC=256)
    # Three nodes of deliberately different sizes (pads the map to 4).
    nodes = [
        (0, 301, 0, 120, tbs[0], tbs[1]),
        (301, 601, 120, 240, tbs[1], tbs[0]),
        (10, 120, 5, 230, False, False),
    ]
    got = dev.divide_level(nodes)
    assert dev.dispatches == 1
    for (qs, qe, ss, se, f0, r0), (j1, j2, v1, v2) in zip(nodes, got):
        mid = (qe - qs) // 2
        CCf, DDf = hb._mm_pass(
            q[qs : qs + mid], s[ss:se], COST, G, H, 0 if f0 else G
        )
        CCr, DDr = hb._mm_pass(
            q[qs + mid : qe][::-1].copy(), s[ss:se][::-1].copy(),
            COST, G, H, 0 if r0 else G,
        )
        CCr, DDr = CCr[::-1], DDr[::-1]
        t1 = CCf + CCr
        t2 = DDf + DDr - G
        assert (j1, v1) == (int(np.argmin(t1)), int(t1.min()))
        assert (j2, v2) == (int(np.argmin(t2)), int(t2.min()))


def test_sw_end_windowed_matches_host():
    """Windowed SW end cells (the reverse-prefix pass of a local
    alignment) == the host scan on the sliced arrays."""
    rng = np.random.default_rng(40)
    q = rng.integers(0, 20, 420).astype(np.intp)
    s = rng.integers(0, 20, 350).astype(np.intp)
    dev = DevicePair(q, s, B62.padded(), Q, R, interpret=True, RB=256, WC=256)
    assert dev.sw_end(0, len(q), 0, len(s)) == hb._score_end_sw(
        q, s, B62.scores, Q, R
    )
    ei, ej = 333, 290
    got = dev.sw_end(len(q) - ei, ei, len(s) - ej, ej, reverse=True)
    want = hb._score_end_sw(
        q[:ei][::-1].copy(), s[:ej][::-1].copy(), B62.scores, Q, R
    )
    assert got == want


@pytest.mark.parametrize("m,n", [(50, 80), (300, 300), (430, 190)])
def test_sw_end_cell_matches_host(m, n):
    rng = np.random.default_rng(m * 7 + n)
    q = rng.integers(0, 20, m).astype(np.intp)
    s = rng.integers(0, 20, n).astype(np.intp)
    got = sw_end_cell(q, s, B62.padded(), Q, R, RB=256, WC=256, interpret=True)
    want = hb._score_end_sw(q, s, B62.scores, Q, R)
    assert got == want


def test_sw_end_cell_tie_break():
    # Repeated motif: many cells share the best score — the oracle picks
    # the smallest (i, j).
    motif = np.array([12, 4, 9, 1, 17, 3], dtype=np.intp)
    q = np.tile(motif, 50)
    s = np.tile(motif, 60)
    got = sw_end_cell(q, s, B62.padded(), Q, R, RB=256, WC=256, interpret=True)
    want = hb._score_end_sw(q, s, B62.scores, Q, R)
    assert got == want


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
def test_align_pair_linear_device_path(monkeypatch, local):
    """Full Myers-Miller with the device passes forced on, vs host-only."""
    monkeypatch.setattr(hb, "DEVICE_MIN_CELLS", 1024)
    monkeypatch.setattr(hb, "DEVICE_INTERPRET", True)
    # Keep the recursion alive below the device threshold — the default
    # LEAF_CELLS would solve this whole pair directly on the host.
    monkeypatch.setattr(hb, "LEAF_CELLS", 256)
    rng = np.random.default_rng(5 if local else 6)
    q = rng.integers(0, 20, 230).astype(np.uint8)
    s = rng.integers(0, 20, 310).astype(np.uint8)
    got = hb.align_pair_linear(q, s, B62.scores, 10, 1, local=local)
    monkeypatch.setattr(hb, "DEVICE_MIN_CELLS", 1 << 60)
    want = hb.align_pair_linear(q, s, B62.scores, 10, 1, local=local)
    assert (got.score, got.q_begin, got.q_end, got.s_begin, got.s_end,
            got.cigar) == (
        want.score, want.q_begin, want.q_end, want.s_begin, want.s_end,
        want.cigar,
    )
    wantsc = (oracle.sw_score if local else oracle.nw_score)(
        q, s, B62.scores, 10, 1
    )
    assert got.score == wantsc
