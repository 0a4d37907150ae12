"""Linear-space optimal alignment (Myers-Miller / Hirschberg).

The full-matrix aligner (``aligner.py``) keeps O(m*n) traceback state —
right for re-aligning top-k database hits (small, bounded), impossible for
two long sequences. This module produces optimal alignments in O(m + n)
memory: the classic Myers-Miller divide-and-conquer for affine gaps
(forward and reverse passes meet at the query midpoint; the crossing
column — and whether the path crosses inside a vertical gap — splits the
problem in two).

The reference has no equivalent (its aligner fills full direction
matrices, SURVEY.md §3.3); this is the long-pair counterpart of the
wavefront/ring score paths (SURVEY.md §5 "long-context").

Internally min-cost form with gap(L) = g + h*L where g = Q - R (open
minus first extend, from ``oracle.gap_qr``'s Q) and h = R; substitution
cost = -score. Row passes are vectorized with the same lazy-E prefix
identity the matrix aligner uses.

SW wraps NW: a forward O(m+n)-memory scoring pass finds the end cell, a
reverse pass from there finds the start cell, then the bounded
subrectangle aligns globally.
"""
from __future__ import annotations

import numpy as np

from ..oracle import NEG, Traceback, gap_qr

INF = int(2**60)

# Round 3: subproblems with at least this many cells run their row pass
# on the banded tile kernel (ops/mm_device.py) — ~50 GCUPS vs ~0.15 for
# the NumPy pass; below it the dispatch round trip dominates. Tests
# lower it (and set DEVICE_INTERPRET) to force the device path on CPU.
DEVICE_MIN_CELLS = 16 * 1024 * 1024
DEVICE_INTERPRET = False


def _pad32(sub):
    out = np.full((32, 32), -64, np.int64)
    A = sub.shape[0]
    out[:A, :A] = sub
    return out


def _device_ok(m, n, sub, Q, R):
    if m * n < DEVICE_MIN_CELLS or m < 2 or n < 2:
        return False
    from ..ops.longpair import real_max_abs, score_bound

    if score_bound(m, n, sub, Q, R) >= 2**24:
        return False  # outside the f32 window: NumPy int64 stays exact
    if real_max_abs(sub)[0] > 256:
        return False  # bf16 query planes: integers exact only to 256
    if DEVICE_INTERPRET:
        return True
    from .kernels import pallas_available

    return pallas_available()


def _mm_pass(q, s, cost, g, h, tb):
    """One Myers-Miller forward pass over all rows of ``q``.

    Returns ``(CC, DD)`` (n+1,) int64: best cost of aligning all of ``q``
    with ``s[:j]`` in any state / ending in a vertical-gap (delete) state.
    ``tb``: open cost for a vertical gap hugging the left/top corner
    (g normally, 0 when the subproblem continues a gap across its top
    boundary).
    """
    m, n = len(q), len(s)
    js = np.arange(1, n + 1, dtype=np.int64)
    CC = np.empty(n + 1, dtype=np.int64)
    CC[0] = 0
    CC[1:] = g + h * js
    DD = CC + g  # row-0 vertical-state seeds (open later at row 1)
    # Column-0 delete state IS the corner gap: seed with the boundary
    # cost so DD[0] evolves to tb + h*i (not tb + g + h*i).
    DD[0] = tb
    for i in range(1, m + 1):
        CC_prev = CC
        c0 = tb + h * i  # CC[i][0]: leading deletions at boundary cost
        DD = np.minimum(DD, CC_prev + g) + h
        w = cost[q[i - 1], s]  # (n,)
        cnof = np.minimum(DD[1:], CC_prev[:-1] + w)
        # E (horizontal/insert) via prefix min:
        #   E[j] = min( c0 + g + j h,  min_{1<=k<j} cnof[k] + g + (j-k) h )
        W = cnof - js * h
        Cmin = np.minimum.accumulate(W)
        prev = np.concatenate(([INF], Cmin[:-1]))
        prev = np.minimum(prev, c0)
        E = prev + g + js * h
        CC = np.empty(n + 1, dtype=np.int64)
        CC[0] = c0
        CC[1:] = np.minimum(cnof, E)
    return CC, DD


def _rev(x):
    return np.ascontiguousarray(x[::-1])


def _mm_pass_any(q, s, cost, g, h, tb):
    """_mm_pass, device-accelerated for large subproblems (see module
    constants). tb is g (fresh vertical open) or 0 (gap crosses the
    boundary) — the only values the recursion produces."""
    m, n = len(q), len(s)
    if tb in (0, g) and m and n:
        sub = -cost
        Q, R = g + h, h
        if _device_ok(m, n, sub, Q, R):
            from ..ops.mm_device import mm_pass_rows

            return mm_pass_rows(
                q, s, _pad32(sub), Q, R, tb == 0,
                interpret=DEVICE_INTERPRET,
            )
    return _mm_pass(q, s, cost, g, h, tb)


def _mm_pass_pair_any(qf, qr, s_fwd, s_rev, cost, g, h, tb, te):
    """Both divide passes of one recursion level, one dispatch when both
    qualify for the device path and share a tile plan (they share ``n``
    and differ in ``m`` by <=1, so they almost always do) — the warm
    cost of a huge-pair traceback is round trips, not device compute."""
    mf, nf, mr, nr = len(qf), len(s_fwd), len(qr), len(s_rev)
    if tb in (0, g) and te in (0, g) and mf and nf and mr and nr:
        sub = -cost
        Q, R = g + h, h
        if _device_ok(mf, nf, sub, Q, R) and _device_ok(mr, nr, sub, Q, R):
            from ..ops.mm_device import mm_pass_rows_pair

            out = mm_pass_rows_pair(
                qf, s_fwd, tb == 0, qr, s_rev, te == 0,
                _pad32(sub), Q, R, interpret=DEVICE_INTERPRET,
            )
            if out is not None:
                return out
    return (
        _mm_pass_any(qf, s_fwd, cost, g, h, tb),
        _mm_pass_any(qr, s_rev, cost, g, h, te),
    )


def _sw_end_any(q, s, sub, Q, R):
    if _device_ok(len(q), len(s), sub, Q, R):
        from ..ops.mm_device import sw_end_cell

        return sw_end_cell(
            q, s, _pad32(sub), Q, R, interpret=DEVICE_INTERPRET
        )
    return _score_end_sw(q, s, sub, Q, R)


def _nw_ops(q, s, cost, g, h, tb, te):
    """Myers-Miller recursion -> ops list 'M'/'D'/'I' (D: query residue
    to gap, I: subject residue to gap)."""
    m, n = len(q), len(s)
    if n == 0:
        return ["D"] * m
    if m == 0:
        return ["I"] * n
    if m == 1:
        # q[0] aligned to some s[j] with flanking horizontal gaps, or q[0]
        # deleted inside one vertical gap (cheapest boundary open).
        best = min(tb, te) + h + g + h * n  # delete + full insert run
        best_j = -1
        for j in range(n):
            gaps = 0
            if j > 0:
                gaps += g + h * j
            if j < n - 1:
                gaps += g + h * (n - 1 - j)
            c = int(cost[q[0], s[j]]) + gaps
            if c < best:
                best, best_j = c, j
        if best_j < 0:
            return ["D"] + ["I"] * n
        return ["I"] * best_j + ["M"] + ["I"] * (n - best_j - 1)
    mid = m // 2
    (CCf, DDf), (CCr, DDr) = _mm_pass_pair_any(
        q[:mid], _rev(q[mid:]), s, _rev(s), cost, g, h, tb, te
    )
    CCr, DDr = _rev(CCr), _rev(DDr)
    t1 = CCf + CCr  # crossing at (mid, j) in match/insert state
    t2 = DDf + DDr - g  # crossing inside one vertical gap (one open only)
    j1 = int(np.argmin(t1))
    j2 = int(np.argmin(t2))
    if t1[j1] <= t2[j2]:
        return _nw_ops(q[:mid], s[:j1], cost, g, h, tb, g) + _nw_ops(
            q[mid:], s[j1:], cost, g, h, g, te
        )
    return (
        _nw_ops(q[: mid - 1], s[:j2], cost, g, h, tb, 0)
        + ["D", "D"]
        + _nw_ops(q[mid + 1 :], s[j2:], cost, g, h, 0, te)
    )


def _score_end_sw(q, s, sub, Q, R):
    """O(m+n) SW pass -> (best score, end_i, end_j) (1-based inclusive).

    Ties break toward the smallest (i, j) — matching the matrix aligner's
    argmax over C-order.
    """
    m, n = len(q), len(s)
    js = np.arange(1, n + 1, dtype=np.int64)
    H = np.zeros(n + 1, dtype=np.int64)
    Fcol = np.full(n + 1, NEG, dtype=np.int64)
    best, bi, bj = 0, 0, 0
    for i in range(1, m + 1):
        Hprev = H
        Fcol = np.maximum(Fcol - R, Hprev - Q)
        S = sub[q[i - 1], s]
        hnof = np.maximum(np.maximum(Hprev[:-1] + S, Fcol[1:]), 0)
        W = hnof + js * R
        C = np.maximum.accumulate(W)
        prev = np.concatenate(([NEG], C[:-1]))
        E = np.maximum(prev, 0) - Q - (js - 1) * R
        H = np.concatenate(([0], np.maximum(hnof, E)))
        j = int(np.argmax(H))
        if H[j] > best:
            best, bi, bj = int(H[j]), i, j
    return best, bi, bj


def _ops_score(q, s, sub, Q, R, ops) -> int:
    """Score of an alignment path in O(m+n) (vectorized).

    Gotoh accounting: a maximal run of one gap op costs Q + (run-1)*R;
    switching between D and I opens a NEW gap (two separate gaps).
    """
    a = np.frombuffer("".join(ops).encode(), np.uint8)
    isM = a == ord("M")
    isD = a == ord("D")
    i_pos = np.cumsum(isM | isD) - 1  # query index at each step
    j_pos = np.cumsum(~isD) - 1  # subject index (M or I advance j)
    subs = int(sub[q[i_pos[isM]], s[j_pos[isM]]].sum())
    gap = ~isM
    opens = int((gap & np.concatenate([[True], a[1:] != a[:-1]])).sum())
    gap_len = int(gap.sum())
    return subs - opens * Q - (gap_len - opens) * R


def align_pair_linear(
    q: np.ndarray,
    s: np.ndarray,
    sub: np.ndarray,
    gap_open: int,
    gap_extend: int,
    local: bool = True,
    first_residue_opens: bool = True,
) -> Traceback:
    """Optimal alignment in O(m+n) memory (same scores as the oracle)."""
    Q, R = gap_qr(gap_open, gap_extend, first_residue_opens)
    q = np.asarray(q, dtype=np.intp)
    s = np.asarray(s, dtype=np.intp)
    sub = np.asarray(sub)
    m, n = len(q), len(s)
    if m == 0 or n == 0:
        if local:
            return Traceback(0, 0, 0, 0, 0, "")
        score = 0 if m == n else -(Q + (max(m, n) - 1) * R)
        return Traceback(score, 0, m, 0, n, "D" * m + "I" * n)
    g, h = Q - R, R
    cost = -sub.astype(np.int64)

    if local:
        score, ei, ej = _sw_end_any(q, s, sub, Q, R)
        if score == 0:
            return Traceback(0, 0, 0, 0, 0, "")
        # Reverse pass over the prefix rectangle finds the start cell.
        _, ri, rj = _sw_end_any(_rev(q[:ei]), _rev(s[:ej]), sub, Q, R)
        si, sj = ei - ri, ej - rj  # 0-based start
        ops = _nw_ops(q[si:ei], s[sj:ej], cost, g, h, g, g)
        return Traceback(score, si, ei, sj, ej, "".join(ops))
    ops = _nw_ops(q, s, cost, g, h, g, g)
    # The optimal score is the optimal path's score: evaluate the ops in
    # O(m+n) instead of re-running a whole O(m*n) forward pass (which was
    # +33-50% wall time on every huge-pair global alignment) just to read
    # CC[n].
    return Traceback(_ops_score(q, s, sub, Q, R, ops), 0, m, 0, n, "".join(ops))
