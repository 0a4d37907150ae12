"""Device row passes for kernel-rate Myers-Miller (huge-pair traceback).

``search/hirschberg.py`` aligns arbitrarily long pairs in O(m+n) memory,
but its row passes are host NumPy (~0.15 GCUPS). Its divide step needs
exactly two things per subproblem:

  * ``_mm_pass`` — the (CC, DD) min-cost rows at the split row: these
    are the NEGATED H and F (vertical-gap state) rows of a standard
    Gotoh NW fill whose LEFT boundary opens at ``tb`` (g = Q-R for a
    fresh gap, 0 when a vertical gap crosses the subproblem boundary):
    CC[j] = -H[mid][j], DD[j] = -F[mid][j]  (proof: DD's recurrence
    DD_i = min(DD_{i-1}, CC_{i-1}+g) + h negates to exactly
    F_i = max(F_{i-1}-R, H_{i-1}-Q)).
  * the SW end cell (score, i, j) with the oracle's tie-break (smallest
    i, then smallest j).

Both are banded-tile sweeps (ops/ring_block_pallas.py): the H/F row at
ANY query row is the tile kernel's bottom-stream capture (traced
band/row — one compilation serves every split row), and the end cell is
the SW sweep with per-cell argmax-step tracking (``track_pos``).
``hirschberg.align_pair_linear`` routes subproblems above a cell
threshold here; NumPy remains the small-case / CPU path and the
correctness anchor (tests cross-check all three).

Boundary mapping (min-cost -> score form): substitution = the original
matrix, penalties the original (Q, R); left column H[i][0] =
-(tb + R*i); top row H[0][j] = -(Q + (j-1)R); E boundary = -inf.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import PADDED_ALPHABET
from .longpair_pallas import band_height
from .ring_block_pallas import banded_tile, tile_shapes, top_stream_chunks

NEG_F32 = float(-(2.0**24))
SENTINEL = -(2**30)
RB_DEF = 16384
WC_DEF = 16384


def _plan(m, n, RB, WC, interpret, K=PADDED_ALPHABET):
    # FIXED two-level tile ladder: recursion subproblem sizes vary
    # continuously, and every distinct (RB, WC) is a separate Pallas
    # compile (tens of seconds via the remote-compile tunnel). Small
    # tiles for small problems, else the full tile; pad waste is bounded
    # by one block per axis.
    RB = 2048 if m <= 6144 else int(RB)
    WC = 2048 if n <= 6144 else int(WC)
    if interpret:  # CPU tests: tiny tiles keep interpret time sane
        RB = min(RB, max(256, -(-m // 256) * 256))
        WC = min(WC, max(256, -(-n // 256) * 256))
    # Band height: measured lookup (longpair_pallas.band_height); the
    # tile ladder's small tiles stay at 8 (B must stay a lane multiple).
    CH = 8 if (interpret or RB < 8192) else band_height(K, RB)
    T, B = tile_shapes(RB, WC, interpret, CH)
    Rb, Cc = -(-m // RB), -(-n // WC)
    if not interpret:
        # Grid dims round up to powers of two: every (Rb, Cc) pair is an
        # XLA retrace (remote-compiled, seconds) — recursion produces
        # continuously varying sizes, so bound the shape set (~25 pairs,
        # cached persistently). Pad tiles are PAD-filled: bounded wasted
        # compute (cheap next to a dispatch), exactness untouched.
        Rb = 1 << (Rb - 1).bit_length()
        Cc = 1 << (Cc - 1).bit_length()
    return RB, WC, T, B, Rb, Cc, CH


def _pq_blocks(q_codes, matrix_padded, Rb, RB, B, K=PADDED_ALPHABET,
               CH=8):
    # K-code space: pad at K-1, matrix pad column/row mapped onto it
    # (longpair_pallas.alphabet_planes / build_planes convention).
    cmap = np.arange(K, dtype=np.int64)
    cmap[K - 1] = PADDED_ALPHABET - 1
    q_full = np.full((Rb * RB,), K - 1, np.int64)
    q_full[: len(q_codes)] = np.asarray(q_codes, np.int64)
    qprof = np.asarray(matrix_padded)[cmap[q_full]][:, cmap]
    return np.ascontiguousarray(
        qprof.reshape(Rb, B, CH, K).transpose(0, 3, 2, 1)
    ).astype(np.float32)


def _s_chunks(s_codes, Cc, WC, T, K=PADDED_ALPHABET):
    PAD = K - 1
    s_chunks = np.full((Cc, T), PAD, np.int32)
    s_flat = np.full((Cc * WC,), PAD, np.int32)
    s_flat[: len(s_codes)] = np.asarray(s_codes, np.int32)
    s_chunks[:, :WC] = s_flat.reshape(Cc, WC)
    return s_chunks


@functools.partial(
    jax.jit,
    static_argnames=("RB", "WC", "Q", "R", "interpret", "K", "CH"),
)
def _rows_score(
    pq_blocks, s_chunks, m, tbf, *, RB, WC, Q, R, interpret,
    K=PADDED_ALPHABET, CH=8,
):
    """NW grid fill; returns the FULL padded H and F streams of DP row
    ``m`` (traced; callers slice [:n]).

    ``tbf``: the left-boundary vertical-gap open cost (g, or 0 when the
    gap crosses the subproblem boundary) — traced, so one compilation
    serves both.
    """
    T, B = tile_shapes(RB, WC, interpret, CH)
    Rb = pq_blocks.shape[0]
    Cc = s_chunks.shape[0]
    n_pad = Cc * WC
    tile = banded_tile(
        RB, WC, Q, R, False, interpret, n_planes=K, ch=CH
    )
    Qf, Rf = jnp.float32(Q), jnp.float32(R)
    tbf = jnp.asarray(tbf, jnp.float32)
    m = jnp.asarray(m, jnp.int32)

    def lcol(i):
        # H[i][0] = -(tb + R*i), H[0][0] = 0.
        fi = i.astype(jnp.float32)
        return jnp.where(fi <= 0, 0.0, -(tbf + fi * Rf))

    # The block holding DP row m (traced): its stream is the answer.
    # The grid may extend past it (power-of-two padding) with all-PAD
    # blocks whose streams are garbage — the latch below ignores them.
    cap_blk = (m - 1) // RB
    last_local = m - 1 - cap_blk * RB  # 0-based row within that block

    def row_block(carry, xs):
        botH_full, botF_full, capH, capF = carry
        pq_r, r = xs
        i0 = r * RB + 1
        rows = i0 + jnp.arange(RB, dtype=jnp.int32)
        lH0 = lcol(rows).reshape(B, CH)
        lD0 = lcol(rows.reshape(B, CH)[:, 0] - 1).reshape(1, B)
        corner0 = lcol(jnp.asarray(i0 - 1, jnp.int32)).reshape(1)
        topH_ext = jnp.concatenate([corner0, botH_full])
        is_cap = r == cap_blk
        bot_band = jnp.where(is_cap, last_local // CH, B - 1)
        bot_row = jnp.where(is_cap, last_local % CH, CH - 1)

        def chunk(ccarry, cxs):
            rH_prev, rE_prev = ccarry
            s_c, topH_c, topF_c, c = cxs
            first = c == 0
            lH = jnp.where(first, lH0.T, rH_prev)
            lE = jnp.where(
                first, jnp.full((CH, B), NEG_F32, jnp.float32), rE_prev
            )
            lD = jnp.where(
                first,
                lD0,
                jnp.concatenate(
                    [jnp.zeros((1, 1), jnp.float32),
                     rH_prev[CH - 1 : CH, :-1]],
                    axis=1,
                ),
            )
            acc, cap, rH, rE, bH, bF = tile(
                s_c, topH_c, topF_c, pq_r, lH, lE, lD,
                0, SENTINEL, bot_band, bot_row,
            )
            return (rH, rE), (bH, bF)

        cs, topH_chunks, topF_chunks = top_stream_chunks(
            topH_ext, botF_full, Cc, WC, T
        )

        _, (bHs, bFs) = jax.lax.scan(
            chunk,
            (
                jnp.zeros((CH, B), jnp.float32),
                jnp.full((CH, B), NEG_F32, jnp.float32),
            ),
            (s_chunks, topH_chunks, topF_chunks, cs),
        )
        bHf, bFf = bHs.reshape(-1), bFs.reshape(-1)
        capH = jnp.where(is_cap, bHf, capH)
        capF = jnp.where(is_cap, bFf, capF)
        # For r == cap_blk the emitted stream is the CAPTURED row, not
        # the block's bottom row — later blocks' top feeds are then
        # wrong, but only all-PAD padding blocks follow the capture.
        return (bHf, bFf, capH, capF), None

    js = 1 + jnp.arange(n_pad, dtype=jnp.int32)
    topH0 = -(Qf + (js.astype(jnp.float32) - 1.0) * Rf)
    topF0 = jnp.full((n_pad,), NEG_F32, jnp.float32)
    z = jnp.zeros((n_pad,), jnp.float32)
    (_, _, bH, bF), _ = jax.lax.scan(
        row_block,
        (topH0, topF0, z, z),
        (pq_blocks, jnp.arange(Rb, dtype=jnp.int32)),
    )
    return bH, bF


def mm_pass_rows(
    q_codes: np.ndarray,
    s_codes: np.ndarray,
    matrix_padded: np.ndarray,
    gap_q: int,
    gap_r: int,
    tb_is_zero: bool,
    RB: int = RB_DEF,
    WC: int = WC_DEF,
    interpret: bool = False,
):
    """(CC, DD) int64 rows — device analogue of ``hirschberg._mm_pass``.

    CC[j]/DD[j] for j = 0..n; exact while every |H| < 2**24 (callers
    guard with ``longpair.score_bound``).
    """
    from .longpair_pallas import alphabet_planes

    m, n = len(q_codes), len(s_codes)
    Q, R = int(gap_q), int(gap_r)
    K = alphabet_planes(np.asarray(q_codes), np.asarray(s_codes))
    RB, WC, T, B, Rb, Cc, CH = _plan(m, n, RB, WC, interpret, K)
    tb = 0 if tb_is_zero else Q - R
    bH, bF = _rows_score(
        jnp.asarray(
            _pq_blocks(q_codes, matrix_padded, Rb, RB, B, K, CH)
        ).astype(jnp.bfloat16),
        jnp.asarray(_s_chunks(s_codes, Cc, WC, T, K)),
        m, float(tb),
        RB=RB, WC=WC, Q=Q, R=R, interpret=bool(interpret), K=K, CH=CH,
    )
    bH, bF = np.asarray(bH)[:n], np.asarray(bF)[:n]
    CC = np.empty(n + 1, np.int64)
    DD = np.empty(n + 1, np.int64)
    CC[0] = tb + R * m
    DD[0] = tb + R * m
    CC[1:] = -bH.astype(np.int64)
    DD[1:] = -bF.astype(np.int64)
    return CC, DD


@functools.partial(
    jax.jit,
    static_argnames=("RB", "WC", "Q", "R", "interpret", "K", "CH"),
)
def _rows_score_pair(pq2, s2, m2, tb2, *, RB, WC, Q, R, interpret,
                     K=PADDED_ALPHABET, CH=8):
    """A STACK of Myers-Miller divide passes in ONE program:
    ``lax.map`` over the leading axis — one dispatch+fence serves a
    whole recursion level (the warm-time cost of a huge-pair traceback
    is round trips, not device compute). The leading dim is shape-
    static; callers pad it to a power of two to bound retraces."""
    return jax.lax.map(
        lambda x: _rows_score(
            x[0], x[1], x[2], x[3],
            RB=RB, WC=WC, Q=Q, R=R, interpret=interpret, K=K, CH=CH,
        ),
        (pq2, s2, m2, tb2),
    )


def mm_pass_rows_batch(
    problems,
    matrix_padded: np.ndarray,
    gap_q: int,
    gap_r: int,
    RB: int = RB_DEF,
    WC: int = WC_DEF,
    interpret: bool = False,
    min_group_cells: int = 0,
):
    """All row passes of one Myers-Miller recursion LEVEL, batched.

    ``problems``: list of ``(q_codes, s_codes, tb_is_zero)``. Returns a
    list of ``(CC, DD)`` int64 pairs in the same order. Problems are
    grouped by tile plan (same-level subproblems share m to within one
    row, so 1-3 groups is typical); each group is stacked — padded to a
    power-of-two count with copies of its first member to bound
    retraces — and runs as ONE jitted dispatch. Groups whose total
    cells fall below ``min_group_cells`` are not worth a round trip:
    their entries come back ``None`` and the caller uses its host pass.
    """
    from .longpair_pallas import alphabet_planes

    Q, R = int(gap_q), int(gap_r)
    arrs = []
    for qq, ss, _ in problems:
        arrs.append(np.asarray(qq))
        arrs.append(np.asarray(ss))
    K = alphabet_planes(*arrs)
    groups = {}
    for idx, (qq, ss, _) in enumerate(problems):
        plan = _plan(len(qq), len(ss), RB, WC, interpret, K)
        groups.setdefault(plan, []).append(idx)
    out = [None] * len(problems)
    for plan, idxs in groups.items():
        if sum(len(problems[i][0]) * len(problems[i][1]) for i in idxs) < (
            min_group_cells
        ):
            continue
        RBg, WCg, T, B, Rb, Cc, CH = plan
        N = 1 << (len(idxs) - 1).bit_length() if len(idxs) > 1 else 1
        sel = idxs + [idxs[0]] * (N - len(idxs))
        pq = np.stack(
            [
                _pq_blocks(problems[i][0], matrix_padded, Rb, RBg, B, K, CH)
                for i in sel
            ]
        )
        s2 = np.stack(
            [_s_chunks(problems[i][1], Cc, WCg, T, K) for i in sel]
        )
        ms = np.asarray([len(problems[i][0]) for i in sel], np.int32)
        tbs = np.asarray(
            [0.0 if problems[i][2] else float(Q - R) for i in sel],
            np.float32,
        )
        bH, bF = _rows_score_pair(
            jnp.asarray(pq).astype(jnp.bfloat16),
            jnp.asarray(s2),
            jnp.asarray(ms),
            jnp.asarray(tbs),
            RB=RBg, WC=WCg, Q=Q, R=R, interpret=bool(interpret), K=K,
            CH=CH,
        )
        bH, bF = np.asarray(bH), np.asarray(bF)
        for k, i in enumerate(idxs):
            qq, ss, tb0 = problems[i]
            mm_, nn = len(qq), len(ss)
            tb = 0 if tb0 else Q - R
            CC = np.empty(nn + 1, np.int64)
            DD = np.empty(nn + 1, np.int64)
            CC[0] = tb + R * mm_
            DD[0] = tb + R * mm_
            CC[1:] = -bH[k][:nn].astype(np.int64)
            DD[1:] = -bF[k][:nn].astype(np.int64)
            out[i] = (CC, DD)
    return out


def mm_pass_rows_pair(
    qf_codes: np.ndarray,
    sf_codes: np.ndarray,
    tbf_is_zero: bool,
    qr_codes: np.ndarray,
    sr_codes: np.ndarray,
    tbr_is_zero: bool,
    matrix_padded: np.ndarray,
    gap_q: int,
    gap_r: int,
    RB: int = RB_DEF,
    WC: int = WC_DEF,
    interpret: bool = False,
):
    """Both (CC, DD) row pairs of one divide level in ONE dispatch.

    The two passes of a Myers-Miller divide share ``n`` (full subject,
    forward and reversed) and differ in ``m`` by at most one row, so
    they almost always share a tile plan; returns None when the plans
    differ (caller falls back to two ``mm_pass_rows`` calls). Thin
    wrapper over ``mm_pass_rows_batch``.
    """
    from .longpair_pallas import alphabet_planes

    K = alphabet_planes(
        np.asarray(qf_codes), np.asarray(sf_codes),
        np.asarray(qr_codes), np.asarray(sr_codes),
    )
    if _plan(len(qf_codes), len(sf_codes), RB, WC, interpret, K) != _plan(
        len(qr_codes), len(sr_codes), RB, WC, interpret, K
    ):
        return None
    return mm_pass_rows_batch(
        [(qf_codes, sf_codes, tbf_is_zero), (qr_codes, sr_codes, tbr_is_zero)],
        matrix_padded, gap_q, gap_r, RB=RB, WC=WC, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("RB", "WC", "Q", "R", "interpret", "K", "CH"),
)
def _sw_end_score(pq_blocks, s_chunks, *, RB, WC, Q, R, interpret,
                  K=PADDED_ALPHABET, CH=8):
    """SW grid fill with per-cell argmax-step tracking.

    Returns stacked per-tile (acc, tbest) — (Rb, Cc, CH, B) each.
    """
    T, B = tile_shapes(RB, WC, interpret, CH)
    Rb = pq_blocks.shape[0]
    Cc = s_chunks.shape[0]
    n_pad = Cc * WC
    tile = banded_tile(
        RB, WC, Q, R, True, interpret, track_pos=True, n_planes=K, ch=CH
    )

    def row_block(carry, xs):
        botH_full, botF_full = carry
        pq_r, r = xs
        topH_ext = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), botH_full]
        )

        def chunk(ccarry, cxs):
            rH_prev, rE_prev = ccarry
            s_c, topH_c, topF_c, c = cxs
            first = c == 0
            lH = jnp.where(
                first, jnp.zeros((CH, B), jnp.float32), rH_prev
            )
            lE = jnp.where(
                first, jnp.full((CH, B), NEG_F32, jnp.float32), rE_prev
            )
            lD = jnp.where(
                first,
                jnp.zeros((1, B), jnp.float32),
                jnp.concatenate(
                    [jnp.zeros((1, 1), jnp.float32),
                     rH_prev[CH - 1 : CH, :-1]],
                    axis=1,
                ),
            )
            acc, cap, rH, rE, bH, bF, tbest = tile(
                s_c, topH_c, topF_c, pq_r, lH, lE, lD, 0, SENTINEL
            )
            return (rH, rE), (acc, tbest, bH, bF)

        cs, topH_chunks, topF_chunks = top_stream_chunks(
            topH_ext, botF_full, Cc, WC, T
        )

        _, (accs, tbests, bHs, bFs) = jax.lax.scan(
            chunk,
            (
                jnp.zeros((CH, B), jnp.float32),
                jnp.full((CH, B), NEG_F32, jnp.float32),
            ),
            (s_chunks, topH_chunks, topF_chunks, cs),
        )
        return (bHs.reshape(-1), bFs.reshape(-1)), (accs, tbests)

    topH0 = jnp.zeros((n_pad,), jnp.float32)
    topF0 = jnp.full((n_pad,), NEG_F32, jnp.float32)
    _, (accs, tbests) = jax.lax.scan(
        row_block,
        (topH0, topF0),
        (pq_blocks, jnp.arange(Rb, dtype=jnp.int32)),
    )
    # Reduce the argmax + (smallest gi, then gj) tie-break ON DEVICE: the
    # per-tile stacks are (Rb, Cc, CH, B) — hundreds of MB for giant
    # pairs — while the caller only needs three scalars, and the
    # serving-link fetch is ~7 MB/s (docs/PERF_NOTES.md).
    shape = accs.shape  # (Rb, Cc, CH, B)
    rblk = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cblk = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    r8 = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    band = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    gi = rblk * RB + band * CH + r8 + 1
    gj = cblk * WC + (tbests.astype(jnp.int32) - band) + 1
    best = jnp.max(accs)
    mask = accs == best
    BIG = jnp.int32(2**30)
    min_gi = jnp.min(jnp.where(mask, gi, BIG))
    min_gj = jnp.min(jnp.where(mask & (gi == min_gi), gj, BIG))
    return best, min_gi, min_gj


def sw_end_cell(
    q_codes: np.ndarray,
    s_codes: np.ndarray,
    matrix_padded: np.ndarray,
    gap_q: int,
    gap_r: int,
    RB: int = RB_DEF,
    WC: int = WC_DEF,
    interpret: bool = False,
):
    """(best, end_i, end_j) 1-based inclusive — device analogue of
    ``hirschberg._score_end_sw`` with the oracle tie-break (smallest i,
    then smallest j)."""
    from .longpair_pallas import alphabet_planes

    m, n = len(q_codes), len(s_codes)
    Q, R = int(gap_q), int(gap_r)
    K = alphabet_planes(np.asarray(q_codes), np.asarray(s_codes))
    RB, WC, T, B, Rb, Cc, CH = _plan(m, n, RB, WC, interpret, K)
    best, gi, gj = _sw_end_score(
        jnp.asarray(
            _pq_blocks(q_codes, matrix_padded, Rb, RB, B, K, CH)
        ).astype(jnp.bfloat16),
        jnp.asarray(_s_chunks(s_codes, Cc, WC, T, K)),
        RB=RB, WC=WC, Q=Q, R=R, interpret=bool(interpret), K=K, CH=CH,
    )
    # Three scalars fetched; the argmax + (smallest i, then j) tie-break
    # — the oracle's convention; the latched step t inside the kernel
    # gives tau = t - band, i.e. earliest == smallest j per cell —
    # reduced on device (the per-tile stacks would be a multi-hundred-MB
    # fetch for giant pairs).
    best = int(np.asarray(best))
    if best <= 0:
        return 0, 0, 0
    return best, int(np.asarray(gi)), int(np.asarray(gj))
