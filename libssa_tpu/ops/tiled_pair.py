"""Whole-pair scoring from chained banded TILES — unbounded query length.

``longpair_pallas`` holds the whole query's substitution planes in VMEM,
capping m at 64k. This module runs the SAME banded sweep as a grid of
(RB x WC) tiles (``ops/ring_block_pallas.py``) chained by their DP
boundaries inside ONE jitted program: an outer ``lax.scan`` over row
blocks carries the bottom H/F streams, an inner scan over column chunks
carries the right-edge H/E columns. Memory is O(n) for the streams and
O(m) for the planes — both HBM-resident, tiles copied to VMEM per call
by Pallas — so a single chip scores pairs of any length at kernel rate
with one dispatch.

``parallel/ring.py`` distributes the SAME tile kernel: columns sharded
over the mesh, right edges shipped by ``ppermute`` instead of the inner
scan carry.

Boundary conventions (H is the (m+1) x (n+1) DP matrix):
  * tile (r, c) covers H rows [1 + r*RB, 1 + (r+1)*RB) and columns
    [1 + c*WC, 1 + (c+1)*WC);
  * top stream, corner-first: topH[0] = H[i0-1][c0], topH[1+t] =
    H[i0-1][c0+1+t]; topF[t] = F[i0-1][c0+1+t]; row-block 0 uses the
    SW zeros / NW formula row, F = -inf;
  * left column: lH[r, b] = H[i0+8b+r][c0], lE = E at the same cells,
    diag lD[b] = H[i0+8b-1][c0]; chunk 0 uses the SW zeros / NW formula
    column, E = -inf;
  * beyond each tile's real columns the subject is forced to PAD and
    the top stream to -inf, so drain-phase lanes only decay (SW's
    running max cannot be polluted; NW latches happen at tau <= WC-1).

Bit-exact vs the int64 oracle; locked by tests/test_ring_block.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import PADDED_ALPHABET
from .ring_block_pallas import (
    banded_tile,
    nw_boundary,
    tile_shapes,
    top_stream_chunks,
)

NEG_F32 = float(-(2.0**24))
SENTINEL = -(2**30)


@functools.partial(
    jax.jit,
    static_argnames=(
        "RB", "WC", "Q", "R", "local", "interpret", "K", "CH",
    ),
)
def _tiled_score(
    pq_blocks,  # (Rb, K, CH, B) bf16 per-row-block query planes
    s_chunks,  # (Cc, T) int32 per-chunk subject codes (PAD-tailed)
    m,  # traced int32: real query length (pair sizes vary continuously;
    n,  # traced int32: real subject length   a retrace per size would
    #    cost tens of seconds each via the remote-compile tunnel)
    *,
    RB: int,
    WC: int,
    Q: int,
    R: int,
    local: bool,
    interpret: bool,
    K: int = PADDED_ALPHABET,
    CH: int = 8,
):
    T, B = tile_shapes(RB, WC, interpret, CH)
    Rb = pq_blocks.shape[0]
    Cc = s_chunks.shape[0]
    n_pad = Cc * WC
    tile = banded_tile(
        RB, WC, Q, R, local, interpret, n_planes=K, ch=CH
    )
    Qf, Rf = jnp.float32(Q), jnp.float32(R)

    cap_row_g = m - 1  # global end cell (NW)
    cap_col_g = n - 1

    def row_block(carry, xs):
        best_in, botH_full, botF_full = carry
        pq_r, r = xs
        i0 = r * RB + 1  # first global H row of this block

        # Left global boundary of this row block (chunk 0 injections).
        rows = i0 + jnp.arange(RB, dtype=jnp.int32)
        if local:
            lH0 = jnp.zeros((RB,), jnp.float32)
            lD0 = jnp.zeros((B,), jnp.float32)
        else:
            lH0 = nw_boundary(rows, Qf, Rf)
            lD0 = nw_boundary(rows.reshape(B, CH)[:, 0] - 1, Qf, Rf)
        lE0 = jnp.full((RB,), NEG_F32, jnp.float32)
        # Corner-first extended top stream H[i0-1][0..n_pad].
        if local:
            corner0 = jnp.zeros((1,), jnp.float32)
        else:
            corner0 = nw_boundary(jnp.asarray([i0 - 1], jnp.int32), Qf, Rf)
        topH_ext = jnp.concatenate([corner0, botH_full])  # (n_pad+1,)

        def chunk(ccarry, cxs):
            rH_prev, rE_prev = ccarry
            s_c, topH_c, topF_c, c = cxs
            first = c == 0
            # Left boundary: chunk 0 formulas, else the previous chunk's
            # right edge. (8, B) band-major.
            lH = jnp.where(
                first, lH0.reshape(B, CH).T, rH_prev
            )
            lE = jnp.where(first, lE0.reshape(B, CH).T, rE_prev)
            lD = jnp.where(
                first,
                lD0.reshape(1, B),
                jnp.concatenate(
                    [jnp.zeros((1, 1), jnp.float32),
                     rH_prev[CH - 1 : CH, :-1]],
                    axis=1,
                ),
            )
            cap_col = jnp.where(
                (cap_col_g >= c * WC) & (cap_col_g < (c + 1) * WC),
                cap_col_g - c * WC,
                SENTINEL,
            )
            in_block = (cap_row_g >= r * RB) & (cap_row_g < (r + 1) * RB)
            cap_row = jnp.where(in_block, cap_row_g - r * RB, 0)
            cap_col = jnp.where(in_block, cap_col, SENTINEL)
            acc, cap, rH, rE, bH, bF = tile(
                s_c, topH_c, topF_c, pq_r, lH, lE, lD, cap_row, cap_col
            )
            band = cap_row // CH
            cap_val = jnp.take(cap[0], band)
            return (rH, rE), (jnp.max(acc), cap_val, bH, bF)

        cs, topH_chunks, topF_chunks = top_stream_chunks(
            topH_ext, botF_full, Cc, WC, T
        )

        (rH_f, rE_f), (accs, caps, bHs, bFs) = jax.lax.scan(
            chunk,
            (
                jnp.zeros((CH, B), jnp.float32),
                jnp.full((CH, B), NEG_F32, jnp.float32),
            ),
            (s_chunks, topH_chunks, topF_chunks, cs),
        )
        if local:
            best = jnp.maximum(best_in, jnp.max(accs))
        else:
            # Only the tile containing the global end cell latched a
            # value above NEG; pass best through for other row blocks.
            in_blk = (cap_row_g >= r * RB) & (cap_row_g < (r + 1) * RB)
            best = jnp.where(in_blk, jnp.max(caps), best_in)
        return (
            best,
            bHs.reshape(-1),
            bFs.reshape(-1),
        ), None

    if local:
        topH0 = jnp.zeros((n_pad,), jnp.float32)
    else:
        js = 1 + jnp.arange(n_pad, dtype=jnp.int32)
        topH0 = -(Qf + (js.astype(jnp.float32) - 1.0) * Rf)
    topF0 = jnp.full((n_pad,), NEG_F32, jnp.float32)
    init = (jnp.float32(0.0 if local else NEG_F32), topH0, topF0)
    (final, _, _), _ = jax.lax.scan(
        row_block,
        init,
        (pq_blocks, jnp.arange(Rb, dtype=jnp.int32)),
    )
    return final.astype(jnp.int32)


def tiled_pair_score(
    q_codes: np.ndarray,
    s_codes: np.ndarray,
    matrix_padded: np.ndarray,
    gap_q: int,
    gap_r: int,
    local: bool = True,
    RB: int = 16384,
    WC: int = 16384,
    interpret: bool = False,
) -> int:
    """Exact SW/NW score of one pair of ANY size, one device, one dispatch.

    Caller contract: |score| < 2**24 (``longpair.score_bound``).
    Compilations key on (RB, WC, gaps, mode) and the POW2-ROUNDED grid
    dims only: the real (m, n) are traced scalars and the tile ladder /
    grid rounding is shared with ``mm_device._plan``, so continuously
    varying giant-pair sizes hit a bounded, persistently cached shape
    set instead of a retrace per distinct size.
    """
    m, n = len(q_codes), len(s_codes)
    if m == 0 or n == 0:
        raise ValueError("use longpair.longpair_score for empty inputs")
    from .longpair_pallas import alphabet_planes
    from .mm_device import _plan, _pq_blocks, _s_chunks

    K = alphabet_planes(np.asarray(q_codes), np.asarray(s_codes))
    RB, WC, T, B, Rb, Cc, CH = _plan(m, n, RB, WC, interpret, K)
    pq_blocks = _pq_blocks(q_codes, matrix_padded, Rb, RB, B, K, CH)
    s_chunks = _s_chunks(s_codes, Cc, WC, T, K)

    return int(
        _tiled_score(
            jnp.asarray(pq_blocks).astype(jnp.bfloat16),
            jnp.asarray(s_chunks),
            jnp.int32(m),
            jnp.int32(n),
            RB=RB,
            WC=WC,
            Q=int(gap_q),
            R=int(gap_r),
            local=bool(local),
            interpret=bool(interpret),
            K=K,
            CH=CH,
        )
    )
