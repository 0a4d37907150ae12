"""Ring-parallel Myers-Miller: device-spanning TRACEBACK for one pair.

``parallel/ring.py`` scores a device-spanning pair (SURVEY.md §5
"long-context": subject column-sharded, Gotoh boundary columns shipped
right over ICI); ``search/hirschberg.py`` + ``ops/mm_device.py`` produce
optimal alignments in O(m+n) memory on ONE chip. This module closes the
gap between them (VERDICT r4 next-round #6): the Myers-Miller DIVIDE
passes — the forward/reverse row sweeps that dominate a linear-space
traceback — run ring-parallel over the mesh, so the alignment of a pair
too big (or too slow) for one chip scales with the slice.

Design (all pieces reused, none re-derived):

* The divide step needs, per subproblem, the (CC, DD) min-cost rows at
  the query midpoint from both directions (``hirschberg._mm_pass``).
  These are the negated H and F rows of an NW fill — on one chip,
  ``mm_device._rows_core``'s bottom-stream capture. Here the SAME
  banded tile kernel (``ops/ring_block_pallas``) runs per device per
  pipeline phase with ``parallel/ring.py``'s staircase orchestration
  (phase p = row_block + device, right-edge H/E columns shipped by
  ``ppermute``), and the captured row-``mid`` H/F streams are
  ``all_gather``-ed so the t1/t2 crossing combine and argmin happen ON
  DEVICE — one dispatch per divide, a 4-int fetch (the exact analogue
  of ``DevicePair.divide_level``, minus the cross-node batching: ring
  levels hold 2^level <= a handful of nodes).
* The SW end/start cells (local mode) are the same staircase with the
  SW tile (``track_pos=True``): per-phase lexicographic reduction of
  (score, i, j) with the oracle tie-break (smallest i, then j), then a
  pmax/pmin cascade across devices — a 3-int fetch.
* Once a subproblem drops below ``ring_min_cells`` the recursion hands
  off to the single-chip machinery (``hirschberg._nw_ops`` with its
  own ``DevicePair``), which already solves sub-tiles at kernel rate
  and leaf rectangles natively. The handoff is exact: both sides
  compute identical int32 t1/t2 arrays and split on the same
  first-occurrence argmin, so the ops string is bit-identical to the
  single-chip path (locked by tests/test_ring_mm.py).

Speedup model (documented in docs/PARITY.md): Myers-Miller total work
~= 2*area; level L costs area/2^L. Running levels 0..L-1 ring-parallel
on D devices at staircase utilization u = Rb/(Rb+D-1) leaves
2*area/2^L on one chip: wall ~= area*(2 - 2/2^L)/(D*u) + 2*area/2^L.
For D = 8 and L = 3 that is ~3.9x over single-chip; the SW end/start
sweeps (another 2*area for local mode) ring-parallelize fully.

Exactness window: the tile computes in f32 — callers are guarded by
``ops.longpair.score_bound < 2**24`` and bf16-exact matrices
(|entries| <= 256), exactly like ``ring_score`` / ``_device_ok``;
outside the window ``ring_align_pair`` falls back to the single-chip
``align_pair_linear`` (NumPy int64 / device int paths, exact at any
magnitude) with a WARNING, mirroring ``ring_score``'s escape.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..oracle import Traceback, gap_qr
from ..ops.mm_device import _kcode_matrix, _next_pow2
from ..ops.longpair_pallas import alphabet_planes, band_height
from ..ops.ring_block_pallas import banded_tile, tile_shapes

NEG_F32 = float(-(2.0**24))
SENTINEL = -(2**30)
INF32 = 2**30
RB_DEF = 16384

# Subproblems below this many cells leave the ring and finish on the
# single-chip Myers-Miller stack (hirschberg._nw_ops + DevicePair).
# Break-even model: a ring divide saves ~area*(1 - 1/(D*u))/rate over
# the single-chip pass but pays ~0.1-0.3 s of per-node upload+dispatch
# (vs DevicePair.divide_level, which batches a whole level into one
# dispatch). At ~100 GCUPS tile rate and D = 8 that crosses near
# 3e10 cells; average node area quarters per level, so a teracell pair
# runs ~3 ring levels (1+2+4 dispatches) before handing off.
RING_MIN_CELLS = 1 << 35


def _pow2_ceil_div(x: int, d: int, floor: int) -> int:
    return max(floor, _next_pow2(-(-x // d)))


def _rows_ring(qprof, s_local, d, q_off, m, tb, *, RB, Rb, W, CH, K, Q, R,
               D, interpret):
    """Per-device ring NW row pass: H/F streams of window row ``m``.

    ``qprof``: (Mp, K) bf16 replicated flat query planes; ``s_local``:
    (W,) int32 this device's subject columns (PAD = K-1 beyond the
    window). Staircase: device d processes row block rb at phase
    p = rb + d; row blocks past the capture block are cond-skipped.
    Returns (capH, capF): (W,) f32 — H and F of window row ``m`` at this
    device's columns (boundary contract: H[i][0] = -(tb + R*i),
    H[0][j] = -(Q + (j-1)R), exactly ``mm_device._rows_core``).
    """
    B = RB // CH
    T, _ = tile_shapes(RB, W, interpret, CH)
    tile = banded_tile(RB, W, Q, R, False, interpret, n_planes=K, ch=CH)
    Qf, Rf = jnp.float32(Q), jnp.float32(R)
    tbf = jnp.asarray(tb, jnp.float32)
    m = jnp.asarray(m, jnp.int32)
    q_off = jnp.asarray(q_off, jnp.int32)
    cap_blk = (m - 1) // RB
    last_local = (m - 1) % RB

    def lcol(i):
        fi = jnp.asarray(i).astype(jnp.float32)
        return jnp.where(fi <= 0, 0.0, -(tbf + fi * Rf))

    cols = d * W + 1 + jnp.arange(W, dtype=jnp.int32)
    topH_row0 = -(Qf + (cols.astype(jnp.float32) - 1.0) * Rf)
    cw = (d * W).astype(jnp.float32)
    corner_row0 = jnp.where(d * W == 0, 0.0, -(Qf + (cw - 1.0) * Rf))
    PAD = K - 1
    s_t = jnp.concatenate(
        [s_local.astype(jnp.int32), jnp.full((T - W,), PAD, jnp.int32)]
    )
    negT = jnp.full((T - W,), NEG_F32, jnp.float32)
    topF_row0 = jnp.concatenate(
        [jnp.full((W,), NEG_F32, jnp.float32), negT]
    )
    pad_plane = qprof[-1]
    perm = [(i, i + 1) for i in range(D - 1)]

    def phase(carry, p):
        (inbox_H, inbox_E, corner_state, botH_prev, botF_prev,
         capH, capF) = carry
        rb = jnp.clip(p - d, 0, Rb - 1)
        active = (p - d >= 0) & (p - d <= Rb - 1) & (rb * RB < m)
        is_cap = rb == cap_blk

        def run(_):
            win = jax.lax.dynamic_slice(
                qprof, (q_off + rb * RB, 0), (RB, K)
            )
            rl = rb * RB + jnp.arange(RB, dtype=jnp.int32)
            win = jnp.where((rl < m)[:, None], win, pad_plane[None, :])
            pq_r = win.reshape(B, CH, K).transpose(2, 1, 0)
            i0 = rb * RB + 1
            rows = i0 + jnp.arange(RB, dtype=jnp.int32)
            lH0 = lcol(rows).reshape(B, CH).T
            lD0 = lcol(rows.reshape(B, CH)[:, 0] - 1).reshape(1, B)
            is0 = d == 0
            lH = jnp.where(is0, lH0, inbox_H)
            lE = jnp.where(
                is0, jnp.full((CH, B), NEG_F32, jnp.float32), inbox_E
            )
            lD = jnp.where(
                is0,
                lD0,
                jnp.concatenate(
                    [jnp.zeros((1, 1), jnp.float32),
                     inbox_H[CH - 1 : CH, :-1]],
                    axis=1,
                ),
            )
            corner = jnp.where(
                rb == 0,
                corner_row0,
                jnp.where(is0, lcol(i0 - 1), corner_state),
            )
            first_rb = rb == 0
            topH_vals = jnp.where(first_rb, topH_row0, botH_prev)
            topH_stream = jnp.concatenate(
                [jnp.reshape(corner, (1,)), topH_vals, negT]
            )
            topF_stream = jnp.where(
                first_rb,
                topF_row0,
                jnp.concatenate([botF_prev, negT]),
            )
            bot_band = jnp.where(is_cap, last_local // CH, B - 1)
            bot_row = jnp.where(is_cap, last_local % CH, CH - 1)
            acc, cap, rH, rE, bHf, bFf = tile(
                s_t, topH_stream, topF_stream, pq_r, lH, lE, lD,
                0, SENTINEL, bot_band, bot_row,
            )
            return rH, rE, bHf, bFf

        def skip(_):
            return inbox_H, inbox_E, botH_prev, botF_prev

        rH, rE, bHf, bFf = jax.lax.cond(active, run, skip, None)
        capH = jnp.where(active & is_cap, bHf, capH)
        capF = jnp.where(active & is_cap, bFf, capF)
        botH_prev = jnp.where(active & ~is_cap, bHf, botH_prev)
        botF_prev = jnp.where(active & ~is_cap, bFf, botF_prev)
        # Next phase's corner is this phase's inbox bottom-right
        # (the left neighbor's previous row block's right-edge bottom).
        corner_next = inbox_H[CH - 1, B - 1]
        inbox_H = jax.lax.ppermute(rH, "d", perm)
        inbox_E = jax.lax.ppermute(rE, "d", perm)
        return (
            inbox_H, inbox_E, corner_next, botH_prev, botF_prev,
            capH, capF,
        ), None

    carry0 = (
        jnp.zeros((CH, B), jnp.float32),
        jnp.full((CH, B), NEG_F32, jnp.float32),
        jnp.float32(0.0),
        jnp.zeros((W,), jnp.float32),
        jnp.full((W,), NEG_F32, jnp.float32),
        jnp.zeros((W,), jnp.float32),
        jnp.zeros((W,), jnp.float32),
    )
    carry, _ = jax.lax.scan(
        phase, carry0, jnp.arange(Rb + D - 1, dtype=jnp.int32)
    )
    return carry[5], carry[6]


_DIV_STATICS = ("mesh", "RB", "Rb", "W", "CH", "K", "Q", "R", "interpret")


@functools.partial(jax.jit, static_argnames=_DIV_STATICS)
def _ring_divide(qprof_f, qprof_r, s_f, s_r, q_off_f, mid, q_off_r, mr,
                 nn, tbf, tbr, *, mesh, RB, Rb, W, CH, K, Q, R, interpret):
    """One Myers-Miller divide ring-parallel: (4,) int32
    ``[j1, j2, t1[j1], t2[j2]]`` — the split ``hirschberg._nw_ops``
    consumes, bit-identical to ``DevicePair.divide_level``'s (same
    int32 combine, same first-occurrence argmin)."""
    D = mesh.devices.size
    g = jnp.int32(Q - R)
    INF = jnp.int32(INF32)
    n_pad = D * W

    def device_fn(qf, qr, sf_shard, sr_shard):
        d = jax.lax.axis_index("d")
        fH, fF = _rows_ring(
            qf, sf_shard, d, q_off_f, mid, tbf,
            RB=RB, Rb=Rb, W=W, CH=CH, K=K, Q=Q, R=R, D=D,
            interpret=interpret,
        )
        rHs, rFs = _rows_ring(
            qr, sr_shard, d, q_off_r, mr, tbr,
            RB=RB, Rb=Rb, W=W, CH=CH, K=K, Q=Q, R=R, D=D,
            interpret=interpret,
        )
        fH_all = jax.lax.all_gather(fH, "d", tiled=True)
        fF_all = jax.lax.all_gather(fF, "d", tiled=True)
        rH_all = jax.lax.all_gather(rHs, "d", tiled=True)
        rF_all = jax.lax.all_gather(rFs, "d", tiled=True)
        # Combine in exact int32 (f32 streams are exact inside the
        # guarded window; SUMS can reach 2**25 where f32 rounds).
        c0f = (tbf + R * mid).astype(jnp.int32).reshape(1)
        c0r = (tbr + R * mr).astype(jnp.int32).reshape(1)
        CCf = jnp.concatenate([c0f, (-fH_all).astype(jnp.int32)])
        DDf = jnp.concatenate([c0f, (-fF_all).astype(jnp.int32)])
        CCr = jnp.concatenate([c0r, (-rH_all).astype(jnp.int32)])
        DDr = jnp.concatenate([c0r, (-rF_all).astype(jnp.int32)])
        j = jnp.arange(n_pad + 1, dtype=jnp.int32)
        jr = jnp.clip(nn - j, 0, n_pad)
        bad = j > nn
        t1 = jnp.where(bad, INF, CCf + CCr[jr])
        t2 = jnp.where(bad, INF, DDf + DDr[jr] - g)
        j1 = jnp.argmin(t1).astype(jnp.int32)
        j2 = jnp.argmin(t2).astype(jnp.int32)
        return jnp.stack([j1, j2, t1[j1], t2[j2]])

    return jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(), P("d"), P("d")),
        out_specs=P(),
        check_vma=False,
    )(qprof_f, qprof_r, s_f, s_r)


@functools.partial(jax.jit, static_argnames=_DIV_STATICS)
def _ring_sw_end(qprof, s_sh, q_off, m, nn, *, mesh, RB, Rb, W, CH, K, Q,
                 R, interpret):
    """Ring SW end-cell sweep: (3,) int32 ``[best, end_i, end_j]``
    (1-based inclusive, oracle tie-break: smallest i, then smallest j)
    over the window q[q_off:q_off+m] x s_window — the mesh analogue of
    ``mm_device._sw_end_win``. ``nn`` masks nothing (PAD columns clamp
    to <= 0 under SW); it is kept for interface symmetry."""
    del nn
    D = mesh.devices.size
    B = RB // CH
    T, _ = tile_shapes(RB, W, interpret, CH)
    BIG = jnp.int32(INF32)

    def device_fn(qp, s_shard):
        d = jax.lax.axis_index("d")
        tile = banded_tile(
            RB, W, Q, R, True, interpret, track_pos=True, n_planes=K,
            ch=CH,
        )
        PAD = K - 1
        s_t = jnp.concatenate(
            [s_shard.astype(jnp.int32), jnp.full((T - W,), PAD, jnp.int32)]
        )
        negT = jnp.full((T - W,), NEG_F32, jnp.float32)
        pad_plane = qp[-1]
        perm = [(i, i + 1) for i in range(D - 1)]
        m_t = jnp.asarray(m, jnp.int32)
        q_off_t = jnp.asarray(q_off, jnp.int32)
        r8 = jax.lax.broadcasted_iota(jnp.int32, (CH, B), 0)
        band = jax.lax.broadcasted_iota(jnp.int32, (CH, B), 1)

        def phase(carry, p):
            (inbox_H, inbox_E, corner_state, botH_prev, botF_prev,
             best, gi, gj) = carry
            rb = jnp.clip(p - d, 0, Rb - 1)
            active = (p - d >= 0) & (p - d <= Rb - 1) & (rb * RB < m_t)

            def run(_):
                win = jax.lax.dynamic_slice(
                    qp, (q_off_t + rb * RB, 0), (RB, K)
                )
                rl = rb * RB + jnp.arange(RB, dtype=jnp.int32)
                win = jnp.where(
                    (rl < m_t)[:, None], win, pad_plane[None, :]
                )
                pq_r = win.reshape(B, CH, K).transpose(2, 1, 0)
                is0 = d == 0
                lH = jnp.where(
                    is0, jnp.zeros((CH, B), jnp.float32), inbox_H
                )
                lE = jnp.where(
                    is0, jnp.full((CH, B), NEG_F32, jnp.float32), inbox_E
                )
                lD = jnp.where(
                    is0,
                    jnp.zeros((1, B), jnp.float32),
                    jnp.concatenate(
                        [jnp.zeros((1, 1), jnp.float32),
                         inbox_H[CH - 1 : CH, :-1]],
                        axis=1,
                    ),
                )
                first_rb = rb == 0
                topH_vals = jnp.where(
                    first_rb, jnp.zeros((W,), jnp.float32), botH_prev
                )
                corner = jnp.where(first_rb, 0.0, corner_state)
                topH_stream = jnp.concatenate(
                    [jnp.reshape(corner, (1,)), topH_vals, negT]
                )
                topF_stream = jnp.where(
                    first_rb,
                    jnp.concatenate(
                        [jnp.full((W,), NEG_F32, jnp.float32), negT]
                    ),
                    jnp.concatenate([botF_prev, negT]),
                )
                acc, cap, rH, rE, bHf, bFf, tbest = tile(
                    s_t, topH_stream, topF_stream, pq_r, lH, lE, lD,
                    0, SENTINEL,
                )
                return acc, tbest, rH, rE, bHf, bFf

            def skip(_):
                z = jnp.zeros((CH, B), jnp.float32)
                zw = jnp.zeros((W,), jnp.float32)
                return z, z, inbox_H, inbox_E, zw, zw

            acc, tbest, rH, rE, bHf, bFf = jax.lax.cond(
                active, run, skip, None
            )
            # Lexicographic (score desc, i asc, j asc) tile reduction.
            tile_best = jnp.max(acc)
            gi_grid = rb * RB + band * CH + r8 + 1
            gj_grid = d * W + (tbest.astype(jnp.int32) - band) + 1
            mask = acc == tile_best
            gi_t = jnp.min(jnp.where(mask, gi_grid, BIG))
            gj_t = jnp.min(
                jnp.where(mask & (gi_grid == gi_t), gj_grid, BIG)
            )
            better = active & (
                (tile_best > best)
                | (
                    (tile_best == best)
                    & ((gi_t < gi) | ((gi_t == gi) & (gj_t < gj)))
                )
            )
            best = jnp.where(better, tile_best, best)
            gi = jnp.where(better, gi_t, gi)
            gj = jnp.where(better, gj_t, gj)
            botH_prev = jnp.where(active, bHf, botH_prev)
            botF_prev = jnp.where(active, bFf, botF_prev)
            corner_next = inbox_H[CH - 1, B - 1]
            inbox_H = jax.lax.ppermute(rH, "d", perm)
            inbox_E = jax.lax.ppermute(rE, "d", perm)
            return (
                inbox_H, inbox_E, corner_next, botH_prev, botF_prev,
                best, gi, gj,
            ), None

        carry0 = (
            jnp.zeros((CH, B), jnp.float32),
            jnp.full((CH, B), NEG_F32, jnp.float32),
            jnp.float32(0.0),
            jnp.zeros((W,), jnp.float32),
            jnp.full((W,), NEG_F32, jnp.float32),
            jnp.float32(0.0),
            BIG,
            BIG,
        )
        carry, _ = jax.lax.scan(
            phase, carry0, jnp.arange(Rb + D - 1, dtype=jnp.int32)
        )
        best, gi, gj = carry[5], carry[6], carry[7]
        # Cross-device lex-min cascade (each device's triple is already
        # the lex-min over its own cells).
        b = jax.lax.pmax(best, "d")
        gi_x = jax.lax.pmin(jnp.where(best == b, gi, BIG), "d")
        gj_x = jax.lax.pmin(
            jnp.where((best == b) & (gi == gi_x), gj, BIG), "d"
        )
        return jnp.stack([b.astype(jnp.int32), gi_x, gj_x])

    return jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P("d")),
        out_specs=P(),
        check_vma=False,
    )(qprof, s_sh)


@jax.jit
def _planes_repl(codes, mat_k):
    return mat_k[codes].astype(jnp.bfloat16)


class RingPair:
    """Mesh-resident query planes of ONE pair + per-call subject shards.

    The query's forward/reverse substitution row-profiles are built ON
    DEVICE (codes + a KxK table upload, not planes — the ``DevicePair``
    trick) and replicated over the mesh once; each ``divide``/``sw_end``
    then uploads only its subject WINDOW (column-sharded, int32 codes)
    and fetches 4 (divide) or 3 (sw_end) ints. Plane capacity covers the
    worst window (offset <= m, padded block count <= 2*(m/2 + RB)) —
    the ``DevicePair`` slack argument.
    """

    def __init__(self, q_codes, s_codes, matrix_padded, gap_q, gap_r,
                 mesh: Mesh, RB: int | None = None, interpret=False):
        q = np.asarray(q_codes, np.int32)
        s = np.asarray(s_codes, np.int32)
        self.m, self.n = len(q), len(s)
        self.K = alphabet_planes(q, s)
        self.Q, self.R = int(gap_q), int(gap_r)
        self.mesh = mesh
        self.D = mesh.devices.size
        self.interpret = bool(interpret)
        if RB is None:
            RB = 256 if interpret else RB_DEF
        self.RB = int(RB)
        self.CH = (
            8 if (interpret or self.RB < 8192)
            else band_height(self.K, self.RB)
        )
        self.Mp = _next_pow2(3 * self.m + 3 * self.RB)
        from .sharded import put_global

        mat_k = put_global(
            _kcode_matrix(matrix_padded, self.K), mesh, P(), np.float32
        )

        def _codes(arr):
            out = np.full(self.Mp, self.K - 1, np.int32)
            out[: len(arr)] = arr
            return put_global(out, mesh, P(), np.int32)

        self.qprof_f = _planes_repl(_codes(q), mat_k)
        self.qprof_r = _planes_repl(_codes(q[::-1]), mat_k)
        self.s_np = s
        self.dispatches = 0

    def _put_subject(self, window: np.ndarray, W: int):
        from .sharded import put_global

        pad = np.full((W * self.D,), self.K - 1, np.int32)
        pad[: len(window)] = window
        return put_global(pad, self.mesh, P("d"), np.int32)

    def _shapes(self, m_max: int, nn: int):
        w_floor = 8 if self.interpret else 256
        W = _pow2_ceil_div(nn, self.D, w_floor)
        Rb = _pow2_ceil_div(m_max, self.RB, 1)
        if self.Mp < self.m + Rb * self.RB:
            raise AssertionError((self.Mp, self.m, Rb, self.RB))
        return W, Rb

    def divide(self, qs, qe, ss, se, tbf_zero, tbr_zero):
        """Ring divide of q[qs:qe] x s[ss:se] (absolute coordinates):
        returns ``(j1, j2, v1, v2)`` — window-local split columns and
        t1/t2 costs, the exact ``DevicePair.divide_level`` contract."""
        mid = (qe - qs) // 2
        mr = (qe - qs) - mid
        nn = se - ss
        W, Rb = self._shapes(max(mid, mr), nn)
        g = self.Q - self.R
        win = self.s_np[ss:se]
        s_f = self._put_subject(win, W)
        s_r = self._put_subject(win[::-1].copy(), W)
        out = np.asarray(
            _ring_divide(
                self.qprof_f, self.qprof_r, s_f, s_r,
                jnp.int32(qs), jnp.int32(mid),
                jnp.int32(self.m - qe), jnp.int32(mr),
                jnp.int32(nn),
                jnp.int32(0 if tbf_zero else g),
                jnp.int32(0 if tbr_zero else g),
                mesh=self.mesh, RB=self.RB, Rb=Rb, W=W, CH=self.CH,
                K=self.K, Q=self.Q, R=self.R, interpret=self.interpret,
            )
        )
        self.dispatches += 1
        return tuple(int(v) for v in out)

    def sw_end(self, q_end, s_end, reverse=False):
        """(best, end_i, end_j) of SW over q[:q_end] x s[:s_end]
        (or their reverses) — 1-based inclusive, oracle tie-break."""
        m, nn = int(q_end), int(s_end)
        W, Rb = self._shapes(m, nn)
        if reverse:
            qprof, q_off = self.qprof_r, self.m - m
            win = self.s_np[:nn][::-1].copy()
        else:
            qprof, q_off = self.qprof_f, 0
            win = self.s_np[:nn]
        s_sh = self._put_subject(win, W)
        out = np.asarray(
            _ring_sw_end(
                qprof, s_sh, jnp.int32(q_off), jnp.int32(m),
                jnp.int32(nn),
                mesh=self.mesh, RB=self.RB, Rb=Rb, W=W, CH=self.CH,
                K=self.K, Q=self.Q, R=self.R, interpret=self.interpret,
            )
        )
        self.dispatches += 1
        best, gi, gj = (int(v) for v in out)
        if best <= 0:
            return 0, 0, 0
        return best, gi, gj


def _ring_nw_ops(rp: RingPair, dev, q, s, cost, g, h, tb, te, q0, s0,
                 ring_min_cells):
    """Breadth-first Myers-Miller with ring divides at the top.

    Mirrors ``hirschberg._nw_ops``'s node bookkeeping exactly; nodes at
    or above ``ring_min_cells`` split via ``rp.divide`` (one mesh
    dispatch each), smaller nodes hand their whole subtree to the
    single-chip ``hirschberg._nw_ops`` (with its DevicePair ``dev`` and
    absolute offsets). Identical splits by construction -> ops strings
    bit-identical to ``align_pair_linear``.
    """
    from ..search.hirschberg import _Node, _nw_ops

    items = [_Node(0, len(q), 0, len(s), tb, te)]
    while True:
        pending = [
            (i, it) for i, it in enumerate(items) if isinstance(it, _Node)
        ]
        if not pending:
            break
        for i, nd in pending:
            m, n = nd.qe - nd.qs, nd.se - nd.ss
            if m > 1 and n > 0 and m * n >= ring_min_cells:
                continue  # ring-sized: split below
            items[i] = _nw_ops(
                q[nd.qs : nd.qe], s[nd.ss : nd.se], cost, g, h,
                nd.tb, nd.te, dev=dev, q0=q0 + nd.qs, s0=s0 + nd.ss,
            )
        for i, nd in pending:
            if not isinstance(items[i], _Node):
                continue
            j1, j2, v1, v2 = rp.divide(
                q0 + nd.qs, q0 + nd.qe, s0 + nd.ss, s0 + nd.se,
                nd.tb == 0, nd.te == 0,
            )
            mid = (nd.qe - nd.qs) // 2
            if v1 <= v2:
                items[i] = [
                    _Node(nd.qs, nd.qs + mid, nd.ss, nd.ss + j1, nd.tb, g),
                    _Node(nd.qs + mid, nd.qe, nd.ss + j1, nd.se, g, nd.te),
                ]
            else:
                items[i] = [
                    _Node(nd.qs, nd.qs + mid - 1, nd.ss, nd.ss + j2,
                          nd.tb, 0),
                    ["D", "D"],
                    _Node(nd.qs + mid + 1, nd.qe, nd.ss + j2, nd.se,
                          0, nd.te),
                ]
        flat = []
        for it in items:
            if isinstance(it, list) and it and not isinstance(it[0], str):
                flat.extend(it)
            else:
                flat.append(it)
        items = flat
    out = []
    for it in items:
        out.extend(it)
    return out


def ring_align_pair(
    q_codes: np.ndarray,
    s_codes: np.ndarray,
    matrix_padded: np.ndarray,
    gap_open: int,
    gap_extend: int,
    local: bool = True,
    first_residue_opens: bool = True,
    mesh: Mesh | None = None,
    RB: int | None = None,
    ring_min_cells: int = RING_MIN_CELLS,
    interpret: bool = False,
    stats=None,
) -> Traceback:
    """Optimal alignment of ONE device-spanning pair, ring-parallel.

    Same result contract as ``hirschberg.align_pair_linear`` (scores
    and ops bit-identical — tests lock it); the Myers-Miller divides
    above ``ring_min_cells`` and the SW end/start sweeps run over the
    mesh. Falls back to the single-chip path (with a WARNING) when the
    pair is outside the ring's f32/bf16 exactness window or the mesh
    has one device — mirroring ``ring_score``'s escapes.
    """
    from ..search.hirschberg import (
        _make_device_pair, _ops_score, align_pair_linear,
    )
    from ..ops.longpair import real_max_abs, score_bound
    from .sharded import make_db_mesh

    mesh = mesh if mesh is not None else make_db_mesh()
    Q, R = gap_qr(gap_open, gap_extend, first_residue_opens)
    q = np.asarray(q_codes, np.intp)
    s = np.asarray(s_codes, np.intp)
    sub = np.asarray(matrix_padded)
    m, n = len(q), len(s)
    if (
        m < 2
        or n < 2
        or mesh.devices.size < 2
        or m * n < ring_min_cells
        or score_bound(m, n, sub, Q, R) >= 2**24
        or real_max_abs(sub)[0] > 256
    ):
        if m * n >= ring_min_cells and mesh.devices.size >= 2:
            from ..constants import OutputMode
            from ..util.logging import log

            log(
                OutputMode.WARNING,
                "ring_align_pair: pair outside the ring's f32/bf16 "
                "exactness window; escaping to the single-device "
                "linear-space path (exact at any magnitude)",
            )
        return align_pair_linear(
            q, s, sub, gap_open, gap_extend, local=local,
            first_residue_opens=first_residue_opens, stats=stats,
        )

    g, h = Q - R, R
    cost = -sub.astype(np.int64)
    rp = RingPair(q, s, sub, Q, R, mesh, RB=RB, interpret=interpret)
    dev = _make_device_pair(q, s, sub, Q, R)
    try:
        if local:
            best, ei, ej = rp.sw_end(m, n)
            if best == 0:
                return Traceback(0, 0, 0, 0, 0, "")
            _, ri, rj = rp.sw_end(ei, ej, reverse=True)
            si, sj = ei - ri, ej - rj
            ops = _ring_nw_ops(
                rp, dev, q[si:ei], s[sj:ej], cost, g, h, g, g,
                q0=si, s0=sj, ring_min_cells=ring_min_cells,
            )
            return Traceback(best, si, ei, sj, ej, "".join(ops))
        ops = _ring_nw_ops(
            rp, dev, q, s, cost, g, h, g, g, q0=0, s0=0,
            ring_min_cells=ring_min_cells,
        )
        return Traceback(
            _ops_score(q, s, sub, Q, R, ops), 0, m, 0, n, "".join(ops)
        )
    finally:
        if stats is not None:
            stats.aligner_dispatches += rp.dispatches
            if dev is not None:
                stats.aligner_dispatches += dev.dispatches
