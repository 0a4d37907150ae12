"""Pallas TPU kernel for inter-sequence batched SW/NW scoring.

This is the VMEM-resident redesign of the scan kernel in ``interseq.py`` —
the TPU equivalent of the reference's hand-written SSE/AVX2 inner loops
(``src/algo/8|16/search_*`` per SURVEY.md §2/§3.2). The XLA ``lax.scan``
formulation is HBM-bound: H/E state round-trips HBM every subject step.
Here the entire DP state lives in VMEM for the whole sweep.

Design (round-2 iteration; docs/PERF_NOTES.md has the measured landscape):

  * Grid: one program per tile of ``B_TILE`` subjects (lanes).
  * A ``fori_loop`` walks subject positions; per step the score column is
    ``profile @ onehot(s_t)`` on the MXU.
  * The vertical F dependency uses **chunked-sequential lazy-F**: rows are
    split into chunks of ``CH`` (default 8 — one sublane tile); each chunk
    runs a confined log2(CH)-pass prefix-max scan (the exact lazy-F
    identity, with the per-distance gap decay folded into the additive
    masks), and the F value crossing each chunk boundary rides as a cheap
    (1, B) carry computed *sequentially* — so the scan work per cell is
    O(log CH / CH) instead of O(log m). Golfed alternatives (4-column
    unroll, full-width masked passes, bigger tiles) all measured equal or
    slower — see docs/PERF_NOTES.md round-2 table.
  * SW tracks the running best in an (CH, B) accumulator shared by all
    chunks (round 2: was (m, B); the squeeze freed VMEM and measured
    ~+2% — one 8-row cross-sublane reduce at the very end). Exact because
    pad symbols score -64: once past a subject's end no cell can exceed
    the running maximum, so lengths need no masking in the SW path.
  * ``m_real`` is a TRACED scalar in SMEM (round 2): ONE compiled kernel
    serves every query length, NW included — the capture row is selected
    with a ``pl.when`` on the (traced) chunk index plus an in-chunk row
    mask (VERDICT r1 missing #3/weak #5: NW multi-query used to compile
    per query length and dispatch per query).

Gap penalties are compile-time constants (the reference also fixes them at
``init_gap_penalties`` time); changing them recompiles, which takes one-time
seconds against hours-long database sweeps.

Bit-exactness: identical results to ``interseq.interseq_scores`` and the
NumPy oracle — locked by tests/test_pallas.py, which runs this kernel in
Pallas interpret mode on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import PADDED_ALPHABET
from . import interseq

NEG_F32 = float(-(2.0**24))  # -inf surrogate, exact in f32
VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom below the ~16MB/core VMEM


def query_fits_vmem(m: int, n_pad: int) -> bool:
    """True iff a (padded) m-row query leaves room for one 128-lane tile.

    Mirrors ``_build``'s budget: 4 (m,) f32 arrays per lane plus the
    accumulator rows and one double-buffered subject block. Past ~7k query
    rows no lane tile fits and Mosaic compilation would fail; callers
    should fall back to the HBM-state scan kernel.
    """
    m += (-m) % 32
    n_blk = min(n_pad + n_pad % 2, 256)
    per_lane = 4 * m * 4 + 2 * 8 * 4 + 2 * n_blk * 4
    return (VMEM_BUDGET // per_lane) >= 128


def _column_block(n_pad: int) -> int:
    """Column-block size for an (even) padded subject length.

    The largest power-of-two divisor of ``n_pad``, clamped to [32, 256]
    (whole length when <= 256). Round 3 first shipped a finer bucket
    ladder (io/db._LADDER, 64/128-multiples) but ``_build`` still rounded
    n_pad up to 256-multiples, quietly discarding the fill gain — the
    flagship e2e rate measured byte-identical to the coarse ladder.
    Divisor-derived blocks make plan buckets honest: a 320-column bucket
    runs exactly 320 columns (5 blocks of 64). Smaller blocks cost only
    grid steps (DMA stays double-buffered); measured rates at
    n_blk 32..256 are within noise (experiments/r3_nblk_probe.py,
    PERF_NOTES r3).
    """
    if n_pad <= 256:
        return n_pad
    return max(32, min(256, n_pad & -n_pad))


def _kernel(
    mr_ref,  # (1,) int32 SMEM: true query length (traced)
    profile_ref,  # (m, 32) f32
    subjects_ref,  # (n_pad, B_TILE) int
    lengths_ref,  # (1, B_TILE) int32
    scores_ref,  # (1, B_TILE) f32 out
    hi_ref,
    lo_ref,  # placeholder in NW mode: lo is a STATIC bound (see wrapper)
    H_ref,  # (m, B_TILE) f32 scratch
    E_ref,  # (m, B_TILE) f32 scratch
    A_ref,  # (CH, B_TILE) f32 scratch: SW best / NW hi accumulator
    *,
    m: int,
    n_blk: int,
    n_blocks: int,
    Q: int,
    R: int,
    CH: int,
    local: bool,
    track_range: bool,
):
    B = subjects_ref.shape[1]
    NCH = m // CH
    prof = profile_ref[:]  # (m, 32)
    Qf = jnp.float32(Q)
    Rf = jnp.float32(R)
    mr = mr_ref[0]
    mrf = mr.astype(jnp.float32)

    # Confined-scan masks, (CH, 1): additive -d*R inside the chunk window,
    # NEG outside (kills circular-roll wraparound). The F shift folds -Q.
    rid = jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)
    masks = []
    d = 1
    while d < CH:
        masks.append(jnp.where(rid >= d, -d * Rf, NEG_F32).astype(jnp.float32))
        d *= 2
    fmask = jnp.where(rid >= 1, -Qf, NEG_F32).astype(jnp.float32)
    # Carry decay column: the chunk-boundary F enters row j as carry - j*R
    # (row 0 = the carry itself), so it joins F as one broadcast add + max
    # instead of riding the scan via a seeded select.
    fdecay = (-rid.astype(jnp.float32) * Rf).astype(jnp.float32)
    row0f = jax.lax.broadcasted_iota(jnp.int32, (m, B), 0) == 0

    jblk = pl.program_id(1)  # n-block index: subjects stream over grid dim 1

    @pl.when(jblk == 0)
    def _init():
        rR_full = (
            jax.lax.broadcasted_iota(jnp.int32, (m, B), 0).astype(jnp.float32)
            * Rf
        )
        if local:
            H_ref[:] = jnp.zeros((m, B), jnp.float32)
        else:
            # H[i][0] = -(Q + (i-1) R) for query position i = row r + 1.
            H_ref[:] = -(Qf + rR_full)
        E_ref[:] = jnp.full((m, B), NEG_F32, jnp.float32)
        if local:
            A_ref[:] = jnp.zeros(A_ref.shape, jnp.float32)
        else:
            # NW score vs the empty subject (len-0 lanes keep it).
            scores_ref[:] = jnp.zeros((1, B), jnp.float32) - (
                Qf + (mrf - 1.0) * Rf
            )
            if track_range:
                A_ref[:] = jnp.zeros(A_ref.shape, jnp.float32)
        hi_ref[:] = jnp.zeros((1, B), jnp.float32)
        lo_ref[:] = jnp.zeros((1, B), jnp.float32)

    lengths = lengths_ref[:].astype(jnp.int32)  # (1, B)

    def outer(t2, _):
        # int32 rows load directly at any offset ((8,128) tiling); the
        # global column index offsets by this n-block's position. Two
        # columns per trip amortize loop/index overhead.
        tl = t2 * 2
        step(jblk * n_blk + tl, subjects_ref[pl.ds(tl, 1), :])
        step(jblk * n_blk + tl + 1, subjects_ref[pl.ds(tl + 1, 1), :])
        return 0

    def step(t, s_t):
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (PADDED_ALPHABET, B), 0) == s_t
        ).astype(jnp.float32)
        S = jnp.dot(prof, onehot, preferred_element_type=jnp.float32)

        if local:
            h0_prev = jnp.float32(0.0)
            carry = jnp.full((1, B), NEG_F32, jnp.float32)
        else:
            tf = t.astype(jnp.float32)
            h0_prev = jnp.where(t == 0, 0.0, -(Qf + (tf - 1.0) * Rf))
            h0_new = -(Qf + tf * Rf)
            # F entering row 0 from the top boundary of this column.
            carry = jnp.full((1, B), h0_new - Qf, jnp.float32)

        Hd = jnp.where(row0f, h0_prev, pltpu.roll(H_ref[:], shift=1, axis=0))

        for k in range(NCH):
            sl = slice(k * CH, (k + 1) * CH)
            Hp = H_ref[sl, :]
            Ep = E_ref[sl, :]
            E_new = jnp.maximum(Ep - Rf, Hp - Qf)
            Hnof = jnp.maximum(Hd[sl, :] + S[sl, :], E_new)
            if local:
                Hnof = jnp.maximum(Hnof, 0.0)
            # Confined scan over Hnof alone:
            #   D[j] = max_{j'<=j}(Hnof[j'] - (j-j')R),  F[j] = D[j-1] - Q
            # plus the boundary carry as a separate decayed candidate:
            #   F[j] = max(F[j], carry - j*R)   (row 0 = carry exactly).
            D = Hnof
            for i, mk in enumerate(masks):
                D = jnp.maximum(D, pltpu.roll(D, shift=1 << i, axis=0) + mk)
            F = jnp.maximum(
                pltpu.roll(D, shift=1, axis=0) + fmask, carry + fdecay
            )
            H_new = jnp.maximum(Hnof, F)
            H_ref[sl, :] = H_new
            E_ref[sl, :] = E_new
            carry = jnp.maximum(D[CH - 1 : CH, :] - Qf, carry - CH * Rf)
            if local or track_range:
                # Round 3 (VERDICT r2 weak #2): the NW hi accumulator
                # needs NO masking — pad rows (-64 profile) and
                # past-length columns (PAD symbol) only DECAY H, so
                # every pad-cell value is <= some earlier real cell
                # already folded into the running max. The lo side is
                # not tracked at all: every H cell is >= the static
                # bound -(2Q + (m+n-2) R) (align down the boundary then
                # across), which the wrapper emits per lane — flags may
                # become spuriously true (safe), never falsely false.
                # This collapses the tracked-mode cost from five
                # masked ops per (chunk, column) to this single max
                # (was 186.8 vs 232 GCUPS untracked).
                A_ref[:] = jnp.maximum(A_ref[:], H_new)

        if not local:
            # NW capture: row m_real-1 of the freshly written column — one
            # dynamic (1, B) row read (32-bit rows slice at any offset),
            # latched on each lane's last real column. Replaced the r2
            # per-chunk pl.when capture, which measured 35% slower
            # (151 vs ~215 GCUPS; docs/PERF_NOTES.md).
            cap = H_ref[pl.ds(mr - 1, 1), :]
            scores_ref[:] = jnp.where(t == lengths - 1, cap, scores_ref[:])

    jax.lax.fori_loop(0, n_blk // 2, outer, 0)

    @pl.when(jblk == n_blocks - 1)
    def _finalize():
        if local:
            # Pad rows/columns hold values <= the running max (pad scores
            # are -64 and SW clamps at 0), so the unmasked reduce is exact.
            scores_ref[:] = jnp.max(A_ref[:], axis=0, keepdims=True)
            hi_ref[:] = scores_ref[:]
            # SW H never drops below 0: lo is identically 0 (init value).
        elif track_range:
            hi_ref[:] = jnp.max(A_ref[:], axis=0, keepdims=True)
            # NW lo is the wrapper's static bound; this output is unused.
        else:
            # Untracked NW: honor the scan kernel's documented contract
            # hi == scores (review finding — hi came back as the init
            # zeros, so a caller applying overflow_flags to an untracked
            # sweep per the contract would never see a flag fire).
            hi_ref[:] = scores_ref[:]


@functools.lru_cache(maxsize=256)
def _build(
    m, n_pad, B, Q, R, local, track_range, b_tile, interpret, subj_bits,
    n_blk=None,
):
    """Compile one (shape, gap, mode) specialization of the kernel.

    ``m_real`` is NOT part of the key (traced SMEM scalar): all query
    lengths sharing a padded profile height reuse one compilation.
    """
    # Subjects stream over grid dim 1 in n-blocks, so VMEM holds the DP
    # state plus one (double-buffered) block — never the whole database
    # chunk. Budget: H/E f32 scratch (A/L are CH rows, negligible), S
    # column + Hd roll values in flight, and 2x the subjects block.
    del subj_bits  # widened to int32 on-device before the kernel
    CH = 8
    n_arrays = 2 + 2  # H, E + S/Hd values in flight
    n_pad = n_pad + n_pad % 2  # even: columns step in pairs
    if n_blk is None:
        n_blk = _column_block(n_pad)
    n_pad = -(-n_pad // n_blk) * n_blk
    n_blocks = n_pad // n_blk
    per_lane = n_arrays * m * 4 + 2 * CH * 4 + 2 * n_blk * 4
    bt_max = max(128, (VMEM_BUDGET // per_lane) // 128 * 128)
    bt_max = min(bt_max, b_tile)
    # Split B into equal lane-multiple tiles so budget cuts don't create
    # padding waste (e.g. B=2048 with a 1664 budget -> 2 tiles of 1024).
    grid = max(1, -(-B // bt_max))
    b_tile = -(-B // grid // 128) * 128
    pad_b = grid * b_tile - B
    Bp = B + pad_b

    kernel = functools.partial(
        _kernel,
        m=m,
        n_blk=n_blk,
        n_blocks=n_blocks,
        Q=Q,
        R=R,
        CH=CH,
        local=local,
        track_range=track_range,
    )
    out_shape = [jax.ShapeDtypeStruct((1, Bp), jnp.float32)] * 3
    out_spec = pl.BlockSpec((1, b_tile), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(grid, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # m_real scalar
            pl.BlockSpec(
                (m, PADDED_ALPHABET), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_blk, b_tile), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, b_tile), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[out_spec] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((m, b_tile), jnp.float32),  # H
            pltpu.VMEM((m, b_tile), jnp.float32),  # E
            pltpu.VMEM((CH, b_tile), jnp.float32),  # A
        ],
        interpret=interpret,
    )

    @jax.jit
    def run(m_real, profile, subjects_T, lengths):
        # Widen on-device inside the jit: int8 ships over the tunnel, the
        # kernel wants int32 rows (loadable at any offset).
        subjects_T = subjects_T.astype(jnp.int32)
        if subjects_T.shape[0] < n_pad:
            subjects_T = jnp.pad(
                subjects_T,
                ((0, n_pad - subjects_T.shape[0]), (0, 0)),
                constant_values=PADDED_ALPHABET - 1,
            )
        if pad_b:
            subjects_T = jnp.pad(
                subjects_T, ((0, 0), (0, pad_b)), constant_values=0
            )
            lengths = jnp.pad(lengths, (0, pad_b))
        lengths_i = lengths.reshape(1, Bp).astype(jnp.int32)
        mr_arr = jnp.reshape(jnp.asarray(m_real, jnp.int32), (1,))
        scores, hi, lo = call(
            mr_arr,
            profile.astype(jnp.float32),
            subjects_T,
            lengths_i,
        )
        if not local and track_range:
            # Static per-lane lower bound on every H cell: align down the
            # left boundary (Q + (m-1) R) then across the bottom row
            # (Q + (n-1) R) dominates any cell's worst case, minus a
            # margin for in-flight intermediates (E/F candidates decay a
            # further <= Q + CH*R below H; substitution adds <= 64).
            margin = Q + 8 * R + 64
            lo = -(2 * Q + (m_real + lengths_i - 2) * R) - margin
        return (
            scores.reshape(Bp)[:B].astype(jnp.int32),
            hi.reshape(Bp)[:B].astype(jnp.int32),
            lo.reshape(Bp)[:B].astype(jnp.int32),
        )

    return run


def interseq_scores_pallas(
    profile: jax.Array,  # (m, PADDED_ALPHABET) int32
    subjects_T: jax.Array,  # (n_pad, B) int
    lengths: jax.Array,  # (B,) int32
    gap_q,
    gap_r,
    local: bool = True,
    use_matmul: bool = True,  # accepted for interface parity; always MXU
    track_range: bool = False,
    dtype=jnp.float32,  # interface parity; kernel computes in f32
    b_tile: int = 2048,
    interpret: bool = False,
    m_real=None,  # int | traced scalar | None
):
    """Drop-in replacement for ``interseq.interseq_scores`` on TPU.

    f32 arithmetic (exact within +/-2**24 — the manager's ladder guards the
    window); returns int32 (scores, hi, lo) like the scan kernel. Gap
    penalties specialize the compiled kernel (LRU-cached per configuration);
    ``m_real`` is traced, so query length does NOT.

    The profile is padded to a multiple of 32 rows here (with -64 pad rows)
    so kernel compilations — tens of seconds each via the remote-compile
    tunnel — are shared across query lengths.
    """
    del use_matmul, dtype
    m = profile.shape[0]
    if not query_fits_vmem(m, subjects_T.shape[0]):
        # The DP state is (m, lanes) resident in VMEM; below one full
        # 128-lane tile the kernel cannot be tiled into the budget, so a
        # giant query (> ~7k rows) would fail Mosaic compilation. The XLA
        # scan kernel is bit-identical (locked by tests) and keeps state
        # in HBM — the right venue for this rare shape. dtype=f32 keeps
        # THIS kernel's contract (f32 window semantics) AND avoids the
        # int32 path's int8 MXU gather, which would silently wrap
        # |score|>127 matrices (review finding — the fallback used to
        # take the scan kernel's int32 default without the gate).
        return interseq.interseq_scores(
            profile, subjects_T, lengths, gap_q, gap_r, local=local,
            use_matmul=True, track_range=track_range,
            dtype=jnp.float32, m_real=m_real,
        )
    mr = m_real if m_real is not None else m
    pad_m = (-m) % 32
    if pad_m:
        profile = jnp.pad(profile, ((0, pad_m), (0, 0)), constant_values=-64)
        m += pad_m
    if local:
        # SW never reads m_real (pad rows clamp to 0 and the accumulator
        # reduce is exact over them): canonicalize so the traced scalar
        # carries no information either.
        mr = m
    n_pad, B = subjects_T.shape
    subj_bits = 32  # widened on-device inside run() before the kernel
    run = _build(
        m, n_pad, B, int(gap_q), int(gap_r), bool(local),
        bool(track_range), int(b_tile), bool(interpret), subj_bits,
    )
    return run(mr, profile, subjects_T, lengths)
