"""Banded Pallas TILE kernel with boundary I/O — the ring's per-device sweep.

``longpair_pallas.py`` scores one whole pair: its skewed-band loop owns
the global DP boundaries (SW zeros / NW formulas). This module is the
SAME measured kernel body (bf16 select tree, int32 symbol shift
register, 3 lane rolls, phase-split windows — see that module's design
history) generalized to ONE (RB x W) tile of a larger DP, so that
``parallel/ring.py`` can run it per device per pipeline phase
(VERDICT r2 next-round item 2: "ring_pair_score reuses the same tile
kernel per device"):

  * The LEFT boundary (H/E column ``c0-1`` from the device to the left,
    shipped over ICI) is INJECTED into each band's state at its
    ``tau == 0`` step — the generalization of longpair's NW column-0
    injection, with data instead of formulas. Because every lane is
    re-initialized at tau == 0, warm lanes (tau < 0) need no masking at
    all here: their transient state is discarded. (SW warm lanes still
    stay harmlessly at 0 for the running max: PAD substitution plus the
    clamp pin them — longpair_pallas's argument.)
  * The TOP boundary (bottom H/F of this device's previous row block)
    streams from SMEM: lane 0 reads ``topH_in[t+1]``/``topF_in[t]`` per
    step; the diagonal needs ``topH_in[t]`` — topH_in is corner-first
    (length W+1), so no separate delay register for lane 0.
  * The RIGHT edge (each band's H and E at its last column, tau == W-1)
    is latched into (8, B) capture buffers — the left boundary of the
    device to the right.
  * The BOTTOM boundary (band B-1's row-7 H and F per column) is
    extracted via a rotating accumulator: each step writes the bottom
    value at lane B-1 and rotates the accumulator left by one (static
    shifts only), so after a B-step window lane u holds the value from
    window step u; the accumulator is flushed to row ``w`` of a (Wn, B)
    output after each window — one sublane-indexed block store per
    window instead of a per-step dynamic lane store (which Mosaic would
    serialize). Flattened, entry t holds the bottom value of column
    ``t - (B-1)``; the wrapper re-bases.

The step loop is window-aligned (T = Wn * B steps): window 0 carries the
tau == 0 injections; the last windows ([max(1, Wn-2), Wn)) carry the
right-edge latch, since every tau == W-1 event lands at
t = W-1+b in [T-2B, T) by construction. An optional mid-cell latch
(``cap_row``/``cap_col``, for the global NW end cell when it falls
inside this tile) runs in every window — its events depend on traced
scalars, so they cannot be confined statically; callers pass
cap_col = -2**30 to disable (tau never matches; lane-b tau is always
> -B, so warm lanes cannot spuriously hit either).

Exactness: the tile runs the full Gotoh recurrence given its
boundaries — ring.py's row-block/column-shard decomposition argument.
Bit-exact vs oracle tiles for |H| < 2**24; locked by
tests/test_ring_block.py (interpret mode chains tiles into whole pairs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import PADDED_ALPHABET

NEG_F32 = float(-(2.0**24))
UNROLL_STEPS = 32


def _kernel(
    sc_ref,  # (4,) int32 SMEM: [cap_row, cap_col, bot_band, bot_row]
    s_ref,  # (T,) int32 SMEM: this tile's subject codes, PAD beyond W
    topH_ref,  # (T+1,) f32 SMEM: corner-first top-row H stream
    topF_ref,  # (T,) f32 SMEM: top-row F stream
    pq_ref,  # (K, CH, B) bf16: per-symbol query planes of this row block
    lH_ref,  # (CH, B) f32: left-boundary H column (band-major)
    lE_ref,  # (CH, B) f32: left-boundary E column
    ld_ref,  # (1, B) f32: left-boundary diagonal (row above each band)
    acc_ref,  # (CH, B) f32 out: SW running max (garbage in NW mode)
    cap_ref,  # (1, B) f32 out: mid-cell latch per lane (see module doc)
    rH_ref,  # (CH, B) f32 out: right-edge H (tau == W-1)
    rE_ref,  # (CH, B) f32 out: right-edge E
    botH_ref,  # (Wn, B) f32 out: bottom H windows (flat[t] = col t - bb)
    botF_ref,  # (Wn, B) f32 out: bottom F windows
    tb_ref,  # (CH, B) f32 out: per-cell earliest argmax step (track_pos)
    h_ref,  # (CH, B) f32 scratch (carry init round-trip; Mosaic splat bug)
    e_ref,
    buf_ref,  # (6, B) f32 scratch
    *,
    B: int,
    W: int,
    Wn: int,
    Q: int,
    R: int,
    K: int,
    CH: int,
    local: bool,
    track_pos: bool,
    unroll: int,
):
    Qf, Rf = jnp.float32(Q), jnp.float32(R)
    PAD = K - 1
    cr = sc_ref[0]
    cc = sc_ref[1]
    bb = sc_ref[2]  # bottom-stream band (B-1 for the true bottom row)
    br = sc_ref[3]  # bottom-stream row within the band (7 for the bottom)
    rc = cr % CH  # capture row within its band
    T = Wn * B

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    lane0 = lane1 == 0
    rid = jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (CH, B), 0) == 0
    masks = []
    d = 1
    while d < CH:
        masks.append(jnp.where(rid >= d, -d * Rf, NEG_F32))
        d *= 2
    fmask = jnp.where(rid >= 1, -Qf, NEG_F32)
    fdecay = -rid.astype(jnp.float32) * Rf
    rid8 = jax.lax.broadcasted_iota(jnp.int32, (CH, B), 0)
    rowX = rid8 == br  # traced: the bottom-stream row mask
    laneX = lane1 == bb  # traced: the bottom-stream band lane

    def sel_tree(symi):
        # Alphabet-sized tree: K-1 selects, odd tails pass through
        # (longpair_pallas.sel_tree has the correctness argument).
        lvl = [pq_ref[a] for a in range(K)]
        bit = 0
        while len(lvl) > 1:
            b_set = ((symi >> bit) & 1) == 1
            nxt = [
                jnp.where(b_set, lvl[2 * i + 1], lvl[2 * i])
                for i in range(len(lvl) // 2)
            ]
            if len(lvl) % 2:
                nxt.append(lvl[-1])
            lvl = nxt
            bit += 1
        return lvl[0].astype(jnp.float32)

    def make_step(inject: bool, edge: bool):
        def step(t, carry):
            (h, e, botH1, topHd_raw, botF1, sym, acc, cap, rH, rE,
             abH, abF, tbest) = carry
            sym = jnp.where(
                lane0, s_ref[t], pltpu.roll(sym, shift=1, axis=1)
            )
            s_col = sel_tree(sym)

            if inject:
                tau = t - lane1
                at0 = tau == 0
                h = jnp.where(at0, lH_ref[:], h)
                e = jnp.where(at0, lE_ref[:], e)

            topH = pltpu.roll(botH1, shift=1, axis=1)
            topHd = topHd_raw
            topF = pltpu.roll(botF1, shift=1, axis=1)
            topH = jnp.where(lane0, topH_ref[t + 1], topH)
            topHd = jnp.where(lane0, topH_ref[t], topHd)
            topF = jnp.where(lane0, topF_ref[t], topF)
            if inject:
                # Diagonal at tau == 0 is the left boundary of the row
                # above each band (lane 0's corner rides topH_ref[0]).
                topHd = jnp.where(
                    at0 & jnp.logical_not(lane0), ld_ref[:], topHd
                )

            e_new = jnp.maximum(e - Rf, h - Qf)
            hd = jnp.where(row0, topHd, pltpu.roll(h, shift=1, axis=0))
            hnof = jnp.maximum(hd + s_col, e_new)
            if local:
                hnof = jnp.maximum(hnof, 0.0)
            carry_in = jnp.maximum(topF - Rf, topH - Qf)
            dsc = hnof
            for i, mk in enumerate(masks):
                dsc = jnp.maximum(dsc, pltpu.roll(dsc, shift=1 << i, axis=0) + mk)
            f = jnp.maximum(
                pltpu.roll(dsc, shift=1, axis=0) + fmask, carry_in + fdecay
            )
            h_new = jnp.maximum(hnof, f)

            if local:
                if track_pos:
                    better = h_new > acc
                    acc = jnp.where(better, h_new, acc)
                    tbest = jnp.where(
                        better, jnp.float32(1.0) * t, tbest
                    )
                else:
                    acc = jnp.maximum(acc, h_new)
            # Mid-cell latch (global NW end cell inside this tile):
            # cap_col is -2**30 when not applicable — tau > -B always,
            # so no lane can match.
            hit = (t - lane1) == cc
            cap_row_v = jnp.max(
                jnp.where(rid == rc, h_new, NEG_F32), axis=0, keepdims=True
            )
            cap = jnp.where(hit, cap_row_v, cap)
            if edge:
                onedge = (t - lane1) == W - 1
                rH = jnp.where(onedge, h_new, rH)
                rE = jnp.where(onedge, e_new, rE)

            # Bottom extraction: write band B-1's row-7 value at lane
            # B-1 and rotate the accumulator left each step — after the
            # B-step window, lane u holds the value written at window
            # step u (stale lanes are fully displaced), so the flush is
            # one static-layout row store. All static shifts.
            bh = jnp.max(
                jnp.where(rowX, h_new, NEG_F32), axis=0, keepdims=True
            )
            bf_ = jnp.max(
                jnp.where(rowX, f, NEG_F32), axis=0, keepdims=True
            )
            abH = jnp.where(laneX, bh, pltpu.roll(abH, shift=B - 1, axis=1))
            abF = jnp.where(laneX, bf_, pltpu.roll(abF, shift=B - 1, axis=1))

            return (
                h_new, e_new, h_new[CH - 1 : CH, :], topH,
                f[CH - 1 : CH, :], sym,
                acc, cap, rH, rE, abH, abF, tbest,
            )

        return step

    # Carry inits round-trip through scratch refs (Mosaic splat-carry
    # relayout bug; see longpair_pallas.py).
    h_ref[:] = jnp.zeros((CH, B), jnp.float32)
    e_ref[:] = jnp.full((CH, B), NEG_F32, jnp.float32)
    buf_ref[0:1, :] = jnp.zeros((1, B), jnp.float32)  # botH1
    buf_ref[1:2, :] = jnp.zeros((1, B), jnp.float32)  # topHd_raw
    buf_ref[2:3, :] = jnp.full((1, B), NEG_F32, jnp.float32)  # botF1
    buf_ref[3:4, :] = jnp.full((1, B), NEG_F32, jnp.float32)  # cap
    buf_ref[4:5, :] = jnp.zeros((1, B), jnp.float32)  # abH
    buf_ref[5:6, :] = jnp.zeros((1, B), jnp.float32)  # abF
    acc_ref[:] = jnp.zeros((CH, B), jnp.float32)
    rH_ref[:] = jnp.zeros((CH, B), jnp.float32)
    rE_ref[:] = jnp.full((CH, B), NEG_F32, jnp.float32)
    cap_ref[:] = jnp.full((1, B), NEG_F32, jnp.float32)
    tb_ref[:] = jnp.full((CH, B), -1.0, jnp.float32)
    carry = (
        h_ref[:], e_ref[:],
        buf_ref[0:1, :], buf_ref[1:2, :], buf_ref[2:3, :],
        jnp.full((1, B), PAD, jnp.int32),
        acc_ref[:], buf_ref[3:4, :], rH_ref[:], rE_ref[:],
        buf_ref[4:5, :], buf_ref[5:6, :], tb_ref[:],
    )

    # Window loop: B steps per window (B % unroll == 0), flushing the
    # bottom accumulators after each window. Edge-latch windows cover
    # every tau == W-1 event (t in [W-1, W-1+B) ⊆ [T-2B, T)).
    edge_w0 = max(1, Wn - 2)
    steps_per = B // unroll

    def make_window(inject, edge):
        body = make_step(inject, edge)

        def window(w, carry):
            def iteration(k, carry):
                t0 = (w * steps_per + k) * unroll
                for u in range(unroll):
                    carry = body(t0 + u, carry)
                return carry

            carry = jax.lax.fori_loop(0, steps_per, iteration, carry)
            botH_ref[pl.ds(w, 1), :] = carry[10]
            botF_ref[pl.ds(w, 1), :] = carry[11]
            return carry

        return window

    carry = make_window(True, edge_w0 == 0 or Wn <= 2)(0, carry)
    if edge_w0 > 1:
        carry = jax.lax.fori_loop(
            1, edge_w0, make_window(False, False), carry
        )
    if Wn > 1:
        carry = jax.lax.fori_loop(
            edge_w0, Wn, make_window(False, True), carry
        )
    acc_ref[:] = carry[6]
    cap_ref[:] = carry[7]
    rH_ref[:] = carry[8]
    rE_ref[:] = carry[9]
    tb_ref[:] = carry[12]


@functools.lru_cache(maxsize=64)
def _build(RB, W, Q, R, local, interpret, track_pos=False,
           K=PADDED_ALPHABET, CH=8):
    B = RB // CH
    unroll = 1 if interpret else UNROLL_STEPS
    if B % unroll:
        raise ValueError(f"RB/CH = {B} must be a multiple of {unroll}")
    Wn = -(-(W + B) // B)  # ceil((W + B)/B) windows; T = Wn*B >= W + B
    T = Wn * B
    kernel = functools.partial(
        _kernel, B=B, W=W, Wn=Wn, Q=Q, R=R, K=K, CH=CH, local=local,
        track_pos=track_pos, unroll=unroll,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        in_specs=[smem, smem, smem, smem, vmem, vmem, vmem, vmem],
        out_specs=[vmem] * 7,
        out_shape=[
            jax.ShapeDtypeStruct((CH, B), jnp.float32),  # acc
            jax.ShapeDtypeStruct((1, B), jnp.float32),  # cap
            jax.ShapeDtypeStruct((CH, B), jnp.float32),  # right H
            jax.ShapeDtypeStruct((CH, B), jnp.float32),  # right E
            jax.ShapeDtypeStruct((Wn, B), jnp.float32),  # bottom H
            jax.ShapeDtypeStruct((Wn, B), jnp.float32),  # bottom F
            jax.ShapeDtypeStruct((CH, B), jnp.float32),  # tbest (track_pos)
        ],
        scratch_shapes=[
            pltpu.VMEM((CH, B), jnp.float32),
            pltpu.VMEM((CH, B), jnp.float32),
            pltpu.VMEM((6, B), jnp.float32),
        ],
        interpret=interpret,
    )

    def run(
        s_codes, topH, topF, pq, leftH, leftE, leftD, cap_row, cap_col,
        bot_band=B - 1, bot_row=CH - 1,
    ):
        """Jit-composable tile sweep. Shapes per _kernel; returns
        (acc, cap, rightH, rightE, botH_flat, botF_flat[, tbest]) where
        the bottom streams (H and F of query row CH*bot_band + bot_row,
        1-based row CH*bot_band + bot_row + 1) are re-based so entry j =
        column j's value."""
        bb = jnp.asarray(bot_band, jnp.int32)
        sc = jnp.stack(
            [
                jnp.asarray(cap_row, jnp.int32),
                jnp.asarray(cap_col, jnp.int32),
                bb,
                jnp.asarray(bot_row, jnp.int32),
            ]
        )
        acc, cap, rH, rE, bH, bF, tbest = call(
            sc, s_codes, topH, topF, pq, leftH, leftE, leftD
        )
        # The rotating accumulator leaves each window-row rotated by
        # (B-1-bot_band); after un-rotating, flat[t] holds the captured
        # row's value at column t - bot_band.
        def rebase(x):
            x = jnp.roll(x, B - 1 - bb, axis=1)
            return jax.lax.dynamic_slice(x.reshape(-1), (bb,), (W,))

        out = (acc, cap, rH, rE, rebase(bH), rebase(bF))
        return out + ((tbest,) if track_pos else ())

    return run, T


def tile_shapes(RB: int, W: int, interpret: bool = False, ch: int = 8):
    """(T, B) the wrapper needs for host-side stream sizing."""
    B = RB // ch
    unroll = 1 if interpret else UNROLL_STEPS
    if B % unroll:
        raise ValueError(f"RB/CH = {B} must be a multiple of {unroll}")
    Wn = -(-(W + B) // B)
    return Wn * B, B


def banded_tile(
    RB: int,
    W: int,
    gap_q: int,
    gap_r: int,
    local: bool,
    interpret: bool = False,
    track_pos: bool = False,
    n_planes: int = PADDED_ALPHABET,
    ch: int = 8,
):
    """Compiled tile sweep for (RB x W) tiles at the given penalties.

    ``n_planes`` (K) sizes the substitution select tree — callers derive
    it with ``longpair_pallas.alphabet_planes`` and build pq/s codes in
    the remapped K-code space (PAD = K-1). ``ch`` is the band height
    (``longpair_pallas.band_height`` rationale: taller bands shrink the
    serialized lane rolls; B = RB/ch lanes).

    Call signature of the returned function: see ``_build.run``.
    Inputs sized by ``tile_shapes``: s_codes (T,) int32 (PAD beyond the
    real columns), topH (T+1,) f32 corner-first, topF (T,) f32, pq
    (K, ch, B) bf16, leftH/leftE (ch, B) f32 band-major
    (leftH[r, b] = H[rowblock_base + ch*b + r][c0 - 1]), leftD (1, B)
    f32 (leftD[b] = H[base + ch*b - 1][c0 - 1]; lane 0's value is
    unused — the corner rides topH[0]).
    """
    run, _T = _build(
        int(RB), int(W), int(gap_q), int(gap_r), bool(local),
        bool(interpret), bool(track_pos), int(n_planes), int(ch),
    )
    return run


def nw_boundary(i, Q, R):
    """NW boundary value H[i][0] == H[0][i] (formula row/column): 0 at
    i <= 0, else -(Q + (i-1) R). Shared by every tile-chaining wrapper
    (tiled_pair, ring) so the boundary convention lives in ONE place."""
    fi = jnp.asarray(i).astype(jnp.float32)
    return jnp.where(fi <= 0, 0.0, -(Q + (fi - 1.0) * R))


def top_stream_chunks(topH_ext, botF_full, Cc, WC, T):
    """Per-chunk top-stream views for one row block, with drain isolation.

    ``topH_ext``: (n_pad+1,) corner-first extended H stream of the row
    above; ``botF_full``: (n_pad,) F stream. Chunk c reads its corner +
    WC columns; beyond its own real columns the stream is forced to NEG
    (a drain-phase lane must decay, never read the next chunk's data).
    Returns ``(cs, topH_chunks (Cc, T+1), topF_chunks (Cc, T))`` — the
    per-chunk scan inputs shared by every tile-chaining wrapper
    (tiled_pair, mm_device row passes, SW end-cell sweep).
    """
    cs = jnp.arange(Cc, dtype=jnp.int32)
    pos = jnp.arange(T + 1)
    topH_chunks = jax.vmap(
        lambda c: jax.lax.dynamic_slice(
            jnp.concatenate([topH_ext, jnp.full((T,), NEG_F32, jnp.float32)]),
            (c * WC,),
            (T + 1,),
        )
    )(cs)
    topH_chunks = jnp.where(pos[None, :] <= WC, topH_chunks, NEG_F32)
    topF_chunks = jax.vmap(
        lambda c: jax.lax.dynamic_slice(
            jnp.concatenate([botF_full, jnp.full((T,), NEG_F32, jnp.float32)]),
            (c * WC,),
            (T,),
        )
    )(cs)
    topF_chunks = jnp.where(pos[None, :-1] < WC, topF_chunks, NEG_F32)
    return cs, topH_chunks, topF_chunks
