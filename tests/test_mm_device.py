"""Device Myers-Miller row passes (ops/mm_device.py) vs the host passes.

Interpret mode on CPU; the host NumPy implementations in
search/hirschberg.py are the correctness anchors (themselves locked
against the int64 oracle by test_hirschberg.py).
"""
import numpy as np
import pytest

from libssa_tpu import matrices, oracle
from libssa_tpu.ops.mm_device import (
    mm_pass_rows,
    mm_pass_rows_pair,
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


@pytest.mark.parametrize("tbs", [(False, False), (True, False), (False, True)])
def test_mm_pass_rows_pair_matches_singles(tbs):
    """One-dispatch divide level == two independent passes, bit-exact."""
    rng = np.random.default_rng(sum(tbs) + 11)
    m, n = 601, 240
    mid = m // 2
    q = rng.integers(0, 20, m).astype(np.intp)
    s = rng.integers(0, 20, n).astype(np.intp)
    qf, qr = q[:mid], q[mid:][::-1].copy()
    sr = s[::-1].copy()
    out = mm_pass_rows_pair(
        qf, s, tbs[0], qr, sr, tbs[1], B62.padded(), Q, R,
        RB=256, WC=256, interpret=True,
    )
    assert out is not None, "equal-n halves must share a tile plan"
    for (CC, DD), (qq, ss, tb0) in zip(out, ((qf, s, tbs[0]), (qr, sr, tbs[1]))):
        wCC, wDD = mm_pass_rows(
            qq, ss, B62.padded(), Q, R, tb0, RB=256, WC=256, interpret=True
        )
        np.testing.assert_array_equal(CC, wCC)
        np.testing.assert_array_equal(DD, wDD)


def test_mm_pass_rows_pair_plan_mismatch_falls_back():
    """Halves that cross a tile boundary (interpret plan differs by m)
    return None -> the recursion falls back to two single passes."""
    rng = np.random.default_rng(3)
    q1 = rng.integers(0, 20, 250).astype(np.intp)   # RB snaps to 256
    q2 = rng.integers(0, 20, 300).astype(np.intp)   # RB snaps to 512
    s = rng.integers(0, 20, 200).astype(np.intp)
    out = mm_pass_rows_pair(
        q1, s, False, q2, s[::-1].copy(), False, B62.padded(), Q, R,
        RB=256, WC=256, interpret=True,
    )
    assert out is None


def test_mm_pass_rows_batch_matches_singles(monkeypatch):
    """A whole recursion level in batched dispatches: bit-exact vs the
    single-problem path, one jitted call per tile plan, and a
    below-threshold group falls back to None."""
    from libssa_tpu.ops import mm_device

    rng = np.random.default_rng(21)
    s = rng.integers(0, 20, 260).astype(np.intp)
    sr = s[::-1].copy()
    probs = [
        (rng.integers(0, 20, 240).astype(np.intp), s, False),
        (rng.integers(0, 20, 241).astype(np.intp), sr, True),
        (rng.integers(0, 20, 240).astype(np.intp), s, True),
        # A different plan (RB snaps higher in interpret mode):
        (rng.integers(0, 20, 300).astype(np.intp), s, False),
    ]
    calls = []
    real = mm_device._rows_score_pair

    def counted(*a, **k):
        calls.append(a[0].shape[0])
        return real(*a, **k)

    monkeypatch.setattr(mm_device, "_rows_score_pair", counted)
    out = mm_device.mm_pass_rows_batch(
        probs, B62.padded(), Q, R, RB=256, WC=256, interpret=True
    )
    # Two plans -> two dispatches; the 3-problem group pads to 4.
    assert sorted(calls) == [1, 4]
    for (CC, DD), (qq, ss, tb0) in zip(out, probs):
        wCC, wDD = mm_pass_rows(
            qq, ss, B62.padded(), Q, R, tb0, RB=256, WC=256, interpret=True
        )
        np.testing.assert_array_equal(CC, wCC)
        np.testing.assert_array_equal(DD, wDD)
    # min_group_cells above every group total -> all None (host fallback).
    out2 = mm_device.mm_pass_rows_batch(
        probs, B62.padded(), Q, R, RB=256, WC=256, interpret=True,
        min_group_cells=1 << 40,
    )
    assert out2 == [None] * len(probs)


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
