"""Ring-parallel Myers-Miller (parallel/ring_mm.py) vs the single-chip
linear-space aligner and the host reference passes.

Runs on the 8-virtual-device CPU mesh from conftest.py with the banded
tile in interpret mode — the staircase ppermute orchestration, the
all_gather combine, and the cross-device end-cell cascade are exercised
for real across shards. Parity is EXACT equality (scores, coordinates,
and the full ops string): the ring computes the same int32 t1/t2 arrays
and splits on the same first-occurrence argmin as the single-chip path.
"""
import numpy as np
import pytest

from libssa_tpu import matrices, oracle
from libssa_tpu.parallel.ring_mm import RingPair, ring_align_pair
from libssa_tpu.parallel.sharded import make_db_mesh
from libssa_tpu.search import hirschberg as hb
from libssa_tpu.search.manager import SearchStats

B62 = matrices.builtin("BLOSUM62")


@pytest.fixture(scope="module")
def mesh():
    return make_db_mesh()


def _pair(m, n, seed, hi=20):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, hi, m).astype(np.uint8),
        rng.integers(0, hi, n).astype(np.uint8),
    )


def _host_divide(q, s, qs, qe, ss, se, f0, r0, Q, R):
    g, h = Q - R, R
    cost = -B62.padded().astype(np.int64)
    mid = (qe - qs) // 2
    CCf, DDf = hb._mm_pass(
        q[qs : qs + mid], s[ss:se], cost, g, h, 0 if f0 else g
    )
    CCr, DDr = hb._mm_pass(
        q[qs + mid : qe][::-1].copy(), s[ss:se][::-1].copy(), cost, g, h,
        0 if r0 else g,
    )
    CCr, DDr = CCr[::-1], DDr[::-1]
    t1 = CCf + CCr
    t2 = DDf + DDr - g
    return (
        int(np.argmin(t1)), int(np.argmin(t2)),
        int(t1.min()), int(t2.min()),
    )


@pytest.mark.parametrize(
    "win",
    [
        (0, 200, 0, 333, False, False),  # whole pair, fresh gaps
        (10, 150, 5, 200, True, False),  # tb crosses the boundary
        (50, 52, 100, 333, False, True),  # minimal height, te crosses
        (0, 64, 0, 8, False, False),  # narrow subject (one shard wide)
        (3, 199, 330, 333, True, True),
    ],
)
def test_ring_divide_matches_host(mesh, win):
    q, s = _pair(200, 333, 0)
    Q, R = oracle.gap_qr(11, 1, True)
    rp = RingPair(q, s, B62.padded(), Q, R, mesh, RB=32, interpret=True)
    qs, qe, ss, se, f0, r0 = win
    got = rp.divide(qs, qe, ss, se, f0, r0)
    assert got == _host_divide(q, s, qs, qe, ss, se, f0, r0, Q, R)
    assert rp.dispatches == 1


def test_ring_sw_end_matches_host(mesh):
    q, s = _pair(150, 400, 7)
    Q, R = oracle.gap_qr(10, 2, True)
    rp = RingPair(q, s, B62.padded(), Q, R, mesh, RB=32, interpret=True)
    want = hb._score_end_sw(q, s, B62.padded(), Q, R)
    assert rp.sw_end(len(q), len(s)) == want
    # Reverse prefix-window sweep (the start-cell pass).
    _, ei, ej = want
    want_r = hb._score_end_sw(
        q[:ei][::-1].copy(), s[:ej][::-1].copy(), B62.padded(), Q, R
    )
    assert rp.sw_end(ei, ej, reverse=True) == want_r


def _check_valid(q, s, got, want, local):
    """Optimality + validity: same score/coords as the single-chip
    result and the cigar re-scores to it (ops STRINGS are only pinned
    under a common leaf threshold — see test_ring_align_bit_identical:
    equal-cost ties depend on the recursion schedule, exactly as the
    single-chip path's own LEAF_CELLS knob does)."""
    assert got.score == want.score
    assert (got.q_begin, got.q_end, got.s_begin, got.s_end) == (
        want.q_begin, want.q_end, want.s_begin, want.s_end,
    )
    Q, R = oracle.gap_qr(11, 1, True)
    qq = q[got.q_begin : got.q_end]
    ss = s[got.s_begin : got.s_end]
    if got.cigar:
        ops = list(got.cigar)
        assert sum(c != "I" for c in ops) == len(qq)
        assert sum(c != "D" for c in ops) == len(ss)
        assert hb._ops_score(
            np.asarray(qq, np.intp), np.asarray(ss, np.intp),
            B62.padded(), Q, R, ops,
        ) == got.score
    else:
        assert local and want.score == 0


@pytest.mark.parametrize("local", [True, False])
@pytest.mark.parametrize("m,n,seed", [(200, 333, 1), (97, 510, 2)])
def test_ring_align_matches_single_chip(mesh, local, m, n, seed):
    q, s = _pair(m, n, seed)
    want = hb.align_pair_linear(q, s, B62.padded(), 11, 1, local=local)
    got = ring_align_pair(
        q, s, B62.padded(), 11, 1, local=local, mesh=mesh, RB=32,
        ring_min_cells=4096, interpret=True,
    )
    _check_valid(q, s, got, want, local)


@pytest.mark.parametrize("local", [True, False])
def test_ring_align_bit_identical(mesh, local, monkeypatch):
    """Under a COMMON leaf threshold the recursion trees coincide (every
    ring divide equals the host divide — test_ring_divide_matches_host)
    and the whole Traceback, cigar included, is bit-identical."""
    monkeypatch.setattr(hb, "LEAF_CELLS", 512)
    q, s = _pair(200, 333, 1)
    want = hb.align_pair_linear(q, s, B62.padded(), 11, 1, local=local)
    got = ring_align_pair(
        q, s, B62.padded(), 11, 1, local=local, mesh=mesh, RB=32,
        ring_min_cells=4096, interpret=True,
    )
    assert got == want


def test_ring_align_gap_convention(mesh):
    q, s = _pair(120, 300, 3)
    for fro in (True, False):
        want = hb.align_pair_linear(
            q, s, B62.padded(), 6, 2, local=True, first_residue_opens=fro
        )
        got = ring_align_pair(
            q, s, B62.padded(), 6, 2, local=True,
            first_residue_opens=fro, mesh=mesh, RB=32,
            ring_min_cells=4096, interpret=True,
        )
        assert got == want


def test_ring_align_nucleotide(mesh):
    """ACGT codes exercise the small-K plane tree on the ring tiles."""
    from libssa_tpu.matrices import constant_scoring

    mat = constant_scoring(5, -4)
    q, s = _pair(100, 257, 4, hi=4)
    want = hb.align_pair_linear(q, s, mat.padded(), 10, 2, local=True)
    got = ring_align_pair(
        q, s, mat.padded(), 10, 2, local=True, mesh=mesh, RB=32,
        ring_min_cells=2048, interpret=True,
    )
    assert got == want


def test_ring_align_stats_dispatches(mesh):
    q, s = _pair(128, 256, 5)
    stats = SearchStats()
    got = ring_align_pair(
        q, s, B62.padded(), 11, 1, local=False, mesh=mesh, RB=32,
        ring_min_cells=4096, interpret=True, stats=stats,
    )
    assert got == hb.align_pair_linear(q, s, B62.padded(), 11, 1,
                                       local=False)
    # At least the level-0 divide ran on the ring and was counted.
    assert stats.aligner_dispatches >= 1


def test_ring_align_window_escape(mesh):
    """Matrices outside the bf16-exact window (|entry| > 256) escape to
    the single-chip exact path and still return the right alignment."""
    from libssa_tpu.matrices import constant_scoring

    mat = constant_scoring(500, -400)
    q, s = _pair(64, 128, 6, hi=4)
    want = hb.align_pair_linear(q, s, mat.padded(), 300, 100, local=True)
    got = ring_align_pair(
        q, s, mat.padded(), 300, 100, local=True, mesh=mesh, RB=32,
        ring_min_cells=1024, interpret=True,
    )
    assert got == want


def test_ring_align_small_pair_passthrough(mesh):
    """Pairs below ring_min_cells route straight to align_pair_linear."""
    q, s = _pair(20, 30, 8)
    got = ring_align_pair(
        q, s, B62.padded(), 11, 1, local=True, mesh=mesh,
        interpret=True,  # default ring_min_cells: 20*30 is far below
    )
    assert got == hb.align_pair_linear(q, s, B62.padded(), 11, 1,
                                       local=True)
