"""Pallas TPU kernel for inter-sequence batched SW/NW scoring.

This is the VMEM-resident redesign of the scan kernel in ``interseq.py`` —
the TPU equivalent of the reference's hand-written SSE/AVX2 inner loops
(``src/algo/8|16/search_*`` per SURVEY.md §2/§3.2). The XLA ``lax.scan``
formulation is HBM-bound: H/E state (and several temporaries) round-trip HBM
every subject step, capping throughput near 6 GCUPS/chip. Here the entire
DP state lives in VMEM for the whole sweep:

  * Grid: one program per tile of ``B_TILE`` subjects (lanes).
  * Within a program, a ``fori_loop`` walks subject positions; per step the
    score column is ``profile @ onehot(s_t)`` on the MXU and the H/E/F
    updates are full-width VPU ops on (m, B_TILE) arrays that never leave
    the chip.
  * The vertical F dependency uses the same exact lazy-F identity as the
    scan kernel (see interseq.py docstring), computed as a Hillis-Steele
    prefix-max: log2(m) shift+mask+max passes with compile-time-constant
    masks.

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

NEG_F32 = float(-(2.0**24))  # -inf surrogate, exact in f32


def _prefix_max(x, m_rows: int):
    """Inclusive prefix max along axis 0 of (m_rows, B) via log-shift passes."""
    d = 1
    while d < m_rows:
        rolled = pltpu.roll(x, shift=d, axis=0)
        mask = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) >= d
        x = jnp.maximum(x, jnp.where(mask, rolled, NEG_F32))
        d *= 2
    return x


def _kernel(
    profile_ref,  # (m, 32) f32
    subjects_ref,  # (n_pad, B_TILE) int32
    lengths_ref,  # (1, B_TILE) int32
    scores_ref,  # (1, B_TILE) f32 out (doubles as best/nw accumulator)
    hi_ref,
    lo_ref,
    H_ref,  # (m, B_TILE) f32 scratch
    E_ref,  # (m, B_TILE) f32 scratch
    *,
    m: int,
    m_real: int,
    n_pad: int,
    Q: int,
    R: int,
    local: bool,
    track_range: bool,
):
    # All DP state lives in VMEM refs. (fori_loop array carries initialized
    # from splat constants trip a Mosaic layout bug — "replicated in
    # destination but not in source" — refs sidestep the carry entirely.)
    B = subjects_ref.shape[1]
    prof = profile_ref[:]  # (m, 32)
    lengths = lengths_ref[:].astype(jnp.int32)  # (1, B)

    Qf = jnp.float32(Q)
    Rf = jnp.float32(R)
    # rR[r] = r * R for the prefix-max change of variables.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, B), 0)
    rR = row_ids.astype(jnp.float32) * Rf
    row0_mask = row_ids == 0
    # Rows >= m_real are -64-profile padding shared across query lengths;
    # they clamp to 0 in SW and cannot affect real rows (dependencies only
    # flow toward higher rows), but NW capture and range tracking must
    # ignore them.
    real_rows = row_ids < m_real
    capture_row = row_ids == (m_real - 1)

    if local:
        H_ref[:] = jnp.zeros((m, B), jnp.float32)
    else:
        # H[i][0] = -(Q + (i-1) R) for query position i = row r + 1.
        H_ref[:] = -(Qf + rR)
    E_ref[:] = jnp.full((m, B), NEG_F32, jnp.float32)
    # scores_ref accumulates best (SW) / captured last-row H (NW).
    scores_ref[:] = (
        jnp.zeros((1, B), jnp.float32)
        if local
        else jnp.full((1, B), -(Qf + (m_real - 1) * Rf), jnp.float32)
    )
    hi_ref[:] = jnp.zeros((1, B), jnp.float32)
    lo_ref[:] = jnp.zeros((1, B), jnp.float32)

    def step(t, _):
        H = H_ref[:]
        E = E_ref[:]
        s_t = subjects_ref[pl.ds(t, 1), :].astype(jnp.int32)  # (1, B)

        # Profile column via MXU: (m, 32) @ (32, B) one-hot.
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (PADDED_ALPHABET, B), 0) == s_t
        ).astype(jnp.float32)
        S = jnp.dot(prof, onehot, preferred_element_type=jnp.float32)

        # Previous column's boundary H[0][j-1] and this column's H[0][j].
        if local:
            h0_prev = jnp.float32(0.0)
            h0_new = jnp.float32(0.0)
        else:
            tf = t.astype(jnp.float32)
            h0_prev = jnp.where(t == 0, 0.0, -(Qf + (tf - 1.0) * Rf))
            h0_new = -(Qf + tf * Rf)

        # E (horizontal) and the diagonal term (H shifted down one row,
        # row 0 fed from the boundary).
        E_new = jnp.maximum(E - Rf, H - Qf)
        H_diag = jnp.where(row0_mask, h0_prev, pltpu.roll(H, shift=1, axis=0))
        Hnof = jnp.maximum(H_diag + S, E_new)
        if local:
            Hnof = jnp.maximum(Hnof, 0.0)

        # F via prefix max of W[r] = Hnof[r] + r*R (exact lazy-F):
        #   F[r] = max(C[r-1], h0_new - R) - Q - (r-1) R
        C = _prefix_max(Hnof + rR, m)
        C_shift = jnp.where(
            row0_mask, NEG_F32, pltpu.roll(C, shift=1, axis=0)
        )
        F = jnp.maximum(C_shift, h0_new - Rf) - Qf - (rR - Rf)
        H_new = jnp.maximum(Hnof, F)

        H_ref[:] = H_new
        E_ref[:] = E_new

        valid = t < lengths  # (1, B)
        if local:
            # Pad rows are exactly 0 in SW, so the unmasked max is correct.
            col_max = jnp.max(H_new, axis=0, keepdims=True)
            scores_ref[:] = jnp.where(
                valid, jnp.maximum(scores_ref[:], col_max), scores_ref[:]
            )
        else:
            # Masked reduce instead of a row slice: static slices at
            # arbitrary sublane offsets upset Mosaic's alignment rules.
            captured = jnp.max(
                jnp.where(capture_row, H_new, NEG_F32), axis=0, keepdims=True
            )
            scores_ref[:] = jnp.where(
                t == lengths - 1, captured, scores_ref[:]
            )
        if track_range:
            H_masked = jnp.where(real_rows, H_new, 0.0)
            col_max = jnp.max(H_masked, axis=0, keepdims=True)
            col_min = jnp.min(H_masked, axis=0, keepdims=True)
            hi_ref[:] = jnp.where(
                valid, jnp.maximum(hi_ref[:], col_max), hi_ref[:]
            )
            lo_ref[:] = jnp.where(
                valid, jnp.minimum(lo_ref[:], col_min), lo_ref[:]
            )
        return 0

    jax.lax.fori_loop(0, n_pad, step, 0)
    if not track_range:
        hi_ref[:] = scores_ref[:]
        lo_ref[:] = jnp.zeros((1, B), jnp.float32)


@functools.lru_cache(maxsize=256)
def _build(m, m_real, n_pad, B, Q, R, local, track_range, b_tile, interpret):
    """Compile one (shape, gap, mode) specialization of the kernel."""
    b_tile = min(b_tile, -(-B // 128) * 128)  # lane-multiple, <= requested
    pad_b = (-B) % b_tile
    Bp = B + pad_b
    grid = Bp // b_tile

    kernel = functools.partial(
        _kernel,
        m=m,
        m_real=m_real,
        n_pad=n_pad,
        Q=Q,
        R=R,
        local=local,
        track_range=track_range,
    )
    out_shape = [jax.ShapeDtypeStruct((1, Bp), jnp.float32)] * 3
    out_spec = pl.BlockSpec((1, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (m, PADDED_ALPHABET), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((n_pad, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((m, b_tile), jnp.float32),  # H
            pltpu.VMEM((m, b_tile), jnp.float32),  # E
        ],
        interpret=interpret,
    )

    @jax.jit
    def run(profile, subjects_T, lengths):
        if pad_b:
            subjects_T = jnp.pad(
                subjects_T, ((0, 0), (0, pad_b)), constant_values=0
            )
            lengths = jnp.pad(lengths, (0, pad_b))
        scores, hi, lo = call(
            profile.astype(jnp.float32),
            subjects_T,
            lengths.reshape(1, Bp).astype(jnp.int32),
        )
        return (
            scores.reshape(Bp)[:B].astype(jnp.int32),
            hi.reshape(Bp)[:B].astype(jnp.int32),
            lo.reshape(Bp)[:B].astype(jnp.int32),
        )

    return run


def interseq_scores_pallas(
    profile: jax.Array,  # (m, PADDED_ALPHABET) int32
    subjects_T: jax.Array,  # (n_pad, B) int32
    lengths: jax.Array,  # (B,) int32
    gap_q,
    gap_r,
    local: bool = True,
    use_matmul: bool = True,  # accepted for interface parity; always MXU
    track_range: bool = False,
    dtype=jnp.float32,  # interface parity; kernel computes in f32
    b_tile: int = 512,
    interpret: bool = False,
    m_real: int | None = None,
):
    """Drop-in replacement for ``interseq.interseq_scores`` on TPU.

    f32 arithmetic (exact within +/-2**24 — the manager's ladder guards the
    window); returns int32 (scores, hi, lo) like the scan kernel. Gap
    penalties specialize the compiled kernel (LRU-cached per configuration).

    The profile is padded to a multiple of 32 rows here (with -64 pad rows
    and ``m_real`` bookkeeping) so kernel compilations — minutes each via
    the remote-compile tunnel — are shared across query lengths.
    """
    del use_matmul, dtype
    m = profile.shape[0]
    mr = m_real if m_real is not None else m
    pad_m = (-m) % 32
    if pad_m:
        profile = jnp.pad(profile, ((0, pad_m), (0, 0)), constant_values=-64)
        m += pad_m
    n_pad, B = subjects_T.shape
    run = _build(
        m, mr, n_pad, B, int(gap_q), int(gap_r), bool(local),
        bool(track_range), int(b_tile), bool(interpret),
    )
    return run(profile, subjects_T, lengths)
