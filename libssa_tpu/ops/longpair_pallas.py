"""Pallas TPU kernel for single enormous-pair SW/NW scoring.

Round-3 design history (experiments/r3_lp_bisect.py has the receipts):
a straightforward row-sweep with a full-width lane-doubling lazy-E scan
measured 5.1 GCUPS at 16k x 16k — bisection showed (a) per-row-block MXU
matmuls for the substitution rows cost ~28 ms of the 52 (1024 small
matmuls), and (b) LANE-axis ``pltpu.roll``s cost ~90 ns each while
sublane rolls and plain VPU ops pipeline at issue rate across carry-loop
iterations. The kernel below is shaped by those two measurements.

**Skewed-band formulation.** The query is cut into ``B = m_pad/8`` bands
of 8 rows; band ``b`` lives in LANE ``b`` (its 8 rows on the sublanes).
At kernel step ``t`` band ``b`` processes ITS subject column
``tau = t - b`` — a one-column-per-band skew: a software ring pipeline,
exactly ``parallel/ring.py``'s row-block staircase with bands instead of
devices. Consequences:

  * The vertical F recurrence inside a band is ONE confined 8-row
    lazy-F chunk — all sublane rolls (ops/interseq_pallas.py's proven
    scan, CH=8). No lane-axis rolls in the DP chain.
  * Band coupling (band b's top row needs band b-1's bottom row at the
    same and previous columns) telescopes through the skew into small
    (1, B) delay buffers carrying the prior steps' bottom rows,
    lane-rolled by one — the only lane rolls in the loop.
  * The per-lane subject symbol ``s[t - b]`` is a SHIFT REGISTER: roll
    the symbol lane vector by one, inject ``s[t]`` at lane 0.
  * Substitution scores come from a 5-level binary select tree over the
    32 per-symbol query planes ``Pq[a, r, b] = sub(q[8b + r], a)``
    (VMEM-resident, built outside) — no MXU, no gather, and no per-lane
    profile problem (the blocker that kept anti-diagonal formulations
    at ~1 GCUPS, docs/PERF_NOTES.md r2).
  * State is ONE (8, B) H/E pair: memory O(m); the subject only streams
    as a (T,) symbol vector, so n is unbounded.

Exactness: each band runs the full Gotoh recurrence given its top
boundary — the standard row-block decomposition (ring.py's argument).
SW needs no activity masking at all: pre-phase lanes hold exactly the
SW boundary state (H = 0 under the clamp; the E steady-state value -Q
equals the boundary recurrence's E[i][1] candidate), and post-phase /
pad lanes only decay (PAD symbols score -64), so the running max is
exact. NW injects the column boundary when ``tau == 0`` and latches the
capture row at ``tau == n_real - 1``. Bit-exact vs the int64 oracle for
|score| < 2**24 (caller checks ``longpair.score_bound``); locked by
tests/test_longpair.py (interpret mode) and the TPU hardware lane.
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
M_PAD_MAX = 64 * 1024  # Pq (32, 8, B) f32 must fit VMEM
UNROLL_STEPS = 32  # DP steps per fori iteration (see _kernel)


def _kernel(
    mr_ref,  # (2,) int32 SMEM: [m_real, n_real] (traced)
    s_ref,  # (T,) int32 SMEM: subject codes, PAD beyond n_real
    pq_ref,  # (32, 8, B) f32: per-symbol query planes
    out_ref,  # (8, B) f32: SW running max (NW: unused zeros)
    cap_ref,  # (1, B) f32: NW captured cells (per lane's column hit)
    h_ref,  # (8, B) f32 scratch: carry inits (Mosaic rejects splat-
    e_ref,  # (8, B) f32 scratch:  initialized fori carries — the known
    buf_ref,  # (4, B) f32 scratch: relayout bug; see module docstring)
    *,
    B: int,
    T: int,
    Q: int,
    R: int,
    local: bool,
    unroll: int,
):
    Qf, Rf = jnp.float32(Q), jnp.float32(R)
    PAD = PADDED_ALPHABET - 1
    mr = mr_ref[0]
    nr = mr_ref[1]

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    lane0 = lane1 == 0
    rid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0) == 0
    # Confined 8-row lazy-F masks (ops/interseq_pallas.py).
    masks = []
    d = 1
    while d < 8:
        masks.append(jnp.where(rid >= d, -d * Rf, NEG_F32))
        d *= 2
    fmask = jnp.where(rid >= 1, -Qf, NEG_F32)
    fdecay = -rid.astype(jnp.float32) * Rf
    # NW column-0 boundary plane: H[i][0] = -(Q + (i-1) R), i = 8b + r + 1.
    gi = (
        jax.lax.broadcasted_iota(jnp.int32, (8, B), 1) * 8
        + jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
    ).astype(jnp.float32)
    ibnd = -(Qf + gi * Rf)
    rc = (mr - 1) % 8  # NW capture row within its band (traced)

    def sel_tree(sym):
        """Substitution plane select: 5-level binary tree over symbols."""
        symi = sym.astype(jnp.int32)
        lvl = [pq_ref[a] for a in range(PADDED_ALPHABET)]
        for bit in range(5):
            b_set = ((symi >> bit) & 1) == 1  # (1, B)
            lvl = [
                jnp.where(b_set, lvl[2 * i + 1], lvl[2 * i])
                for i in range(len(lvl) // 2)
            ]
        return lvl[0]  # (8, B)

    def next_sym(sym, t):
        # Shift register: after injection lane b holds s[t - b] (f32
        # payload keeps the carry single-dtype; values are tiny ints).
        s_t = s_ref[t].astype(jnp.float32)
        return jnp.where(lane0, s_t, pltpu.roll(sym, shift=1, axis=1))

    def step(t, carry):
        h, e, botH1, botH2, botF1, sym, s_col, acc, cap = carry
        tau = t - lane1  # (1, B): this lane's subject column index

        # Software pipeline: this step's substitution column came from
        # the previous iteration's carry; compute the NEXT step's here —
        # an independent chain that overlaps the DP's critical path (the
        # VPU's ~45-60 ns dependent-op latency is the floor; see
        # experiments/r3_carry_probe.py).
        sym_n = next_sym(sym, t + 1)
        s_col_n = sel_tree(sym_n)

        if not local:
            # This lane is about to compute its first real column: its
            # state must hold the column-0 NW boundary.
            at0 = tau == 0
            h = jnp.where(at0, ibnd, h)
            e = jnp.where(at0, NEG_F32, e)

        # Top-boundary feeds: band b-1's bottom rows, delayed 1/2 steps.
        # Warmup lanes (tau < 0) must NOT see band b-1's real values —
        # they hold the pre-DP boundary state until their tau == 0 step.
        warm = tau < 0
        topH = pltpu.roll(botH1, shift=1, axis=1)
        topHd = pltpu.roll(botH2, shift=1, axis=1)
        topF = pltpu.roll(botF1, shift=1, axis=1)
        if local:
            topH = jnp.where(lane0 | warm, 0.0, topH)
            topHd = jnp.where(lane0 | warm, 0.0, topHd)
        else:
            tf = tau.astype(jnp.float32)
            # Row-above column-0 boundary H[8b][0] for the diagonal at
            # tau == 0 (band b-1's column 0 was never an update output).
            diag0 = jnp.where(
                lane0, 0.0, -(Qf + (8.0 * lane1.astype(jnp.float32) - 1.0) * Rf)
            )
            topH = jnp.where(lane0, -(Qf + tf * Rf), jnp.where(warm, 0.0, topH))
            topHd = jnp.where(
                lane0,
                jnp.where(tau <= 0, 0.0, -(Qf + (tf - 1.0) * Rf)),
                jnp.where(tau == 0, diag0, jnp.where(warm, 0.0, topHd)),
            )
        topF = jnp.where(lane0 | warm, NEG_F32, topF)

        # One interseq-style column update; CH = 8 = the whole band.
        e_new = jnp.maximum(e - Rf, h - Qf)
        hd = jnp.where(row0, topHd, pltpu.roll(h, shift=1, axis=0))
        hnof = jnp.maximum(hd + s_col, e_new)
        if local:
            hnof = jnp.maximum(hnof, 0.0)
        carry_in = jnp.maximum(topF - Rf, topH - Qf)  # (1, B)
        dsc = hnof
        for i, mk in enumerate(masks):
            dsc = jnp.maximum(dsc, pltpu.roll(dsc, shift=1 << i, axis=0) + mk)
        f = jnp.maximum(
            pltpu.roll(dsc, shift=1, axis=0) + fmask, carry_in + fdecay
        )
        h_new = jnp.maximum(hnof, f)

        if local:
            acc = jnp.maximum(acc, h_new)
        else:
            hit = tau == nr - 1
            # Row rc of h_new via mask + sublane max-reduce (dynamic_slice
            # of a VALUE does not lower in Pallas TPU; refs would cost a
            # store per step).
            cap_row = jnp.max(
                jnp.where(rid == rc, h_new, NEG_F32), axis=0, keepdims=True
            )
            cap = jnp.where(hit, cap_row, cap)

        return (
            h_new,
            e_new,
            h_new[7:8, :],
            botH1,
            f[7:8, :],
            sym_n,
            s_col_n,
            acc,
            cap,
        )

    # Carry inits round-trip through scratch refs: splat-constant fori
    # carries trip a Mosaic relayout bug ("replicated in destination but
    # not in source"), the same one ops/interseq_pallas.py works around
    # with ref-resident state.
    h_ref[:] = jnp.zeros((8, B), jnp.float32)  # SW boundary; NW @ tau==0
    e_ref[:] = jnp.full((8, B), NEG_F32, jnp.float32)
    buf_ref[0:1, :] = jnp.zeros((1, B), jnp.float32)  # botH1
    buf_ref[1:2, :] = jnp.zeros((1, B), jnp.float32)  # botH2
    buf_ref[2:3, :] = jnp.full((1, B), NEG_F32, jnp.float32)  # botF1
    buf_ref[3:4, :] = jnp.full((1, B), float(PAD), jnp.float32)  # sym pre-0
    out_ref[:] = jnp.zeros((8, B), jnp.float32)
    cap_ref[:] = jnp.full((1, B), NEG_F32, jnp.float32)
    sym0 = next_sym(buf_ref[3:4, :], 0)  # lane 0 <- s[0]
    init = (
        h_ref[:],
        e_ref[:],
        buf_ref[0:1, :],
        buf_ref[1:2, :],
        buf_ref[2:3, :],
        sym0,
        sel_tree(sym0),
        out_ref[:],
        cap_ref[:],
    )

    # UNROLL_STEPS per fori iteration: a Pallas fori_loop iteration has
    # ~1.65 us of fixed overhead regardless of body size (measured,
    # experiments/r3_carry_probe.py — body ops run at ~5-10 ns each once
    # inside one iteration), so the loop must amortize it over many DP
    # steps, exactly like interseq_pallas's two-columns-per-trip outer().
    def unrolled(k, carry):
        t0 = k * unroll
        for u in range(unroll):
            carry = step(t0 + u, carry)
        return carry

    final = jax.lax.fori_loop(0, T // unroll, unrolled, init)
    out_ref[:] = final[7]
    cap_ref[:] = final[8]


@functools.lru_cache(maxsize=64)
def _build(m_pad, T, Q, R, local, interpret):
    B = m_pad // 8
    # Interpret mode (CPU tests) keeps the loop rolled: the 32x body is
    # identical code, and interpreting it 32x inline is painfully slow.
    unroll = 1 if interpret else UNROLL_STEPS
    kernel = functools.partial(
        _kernel, B=B, T=T, Q=Q, R=R, local=local, unroll=unroll
    )
    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, B), jnp.float32),
            pltpu.VMEM((8, B), jnp.float32),
            pltpu.VMEM((4, B), jnp.float32),
        ],
        interpret=interpret,
    )

    @jax.jit
    def run(m_real, n_real, s_codes, pq):
        mrnr = jnp.stack(
            [jnp.asarray(m_real, jnp.int32), jnp.asarray(n_real, jnp.int32)]
        )
        out, cap = call(mrnr, s_codes, pq)
        if local:
            return jnp.max(out).astype(jnp.int32)
        band = (jnp.asarray(m_real, jnp.int32) - 1) // 8
        return cap[0, band].astype(jnp.int32)

    return run


def longpair_score_pallas(
    q_codes: np.ndarray,
    s_codes: np.ndarray,
    matrix_padded: np.ndarray,
    gap_q: int,
    gap_r: int,
    local: bool = True,
    interpret: bool = False,
) -> int:
    """Exact SW/NW score of one pair on the skewed-band Pallas kernel.

    Caller contract: |score| < 2**24 (``longpair.score_bound``) and
    ``len(q_codes) <= M_PAD_MAX`` (the per-symbol query planes must fit
    VMEM; ``longpair.longpair_score`` swaps/falls back). Subject length
    is unbounded. Compilations key on (m_pad, T_pad, gaps, mode).
    """
    m, n = len(q_codes), len(s_codes)
    if m == 0 or n == 0:
        raise ValueError("use longpair.longpair_score for empty inputs")
    if m > M_PAD_MAX:
        raise ValueError(f"query too long for the VMEM planes ({m})")
    PAD = PADDED_ALPHABET - 1
    m_pad = max(1024, -(-m // 1024) * 1024)
    B = m_pad // 8
    # Steps: every band must pass its last real column; pad to a 512
    # multiple (= UNROLL_STEPS multiple) to bound compile-cache
    # fragmentation.
    T = -(-(n + B) // 512) * 512

    q_full = np.full((m_pad,), PAD, np.int64)
    q_full[:m] = np.asarray(q_codes, np.int64)
    # Pq[a, r, b] = sub(q[8b + r], a).
    qprof = np.asarray(matrix_padded)[q_full]  # (m_pad, 32)
    pq = np.ascontiguousarray(
        qprof.reshape(B, 8, PADDED_ALPHABET).transpose(2, 1, 0)
    ).astype(np.float32)

    # T + 1: the software-pipelined select tree reads s[t + 1].
    s_full = np.full((T + 1,), PAD, np.int32)
    s_full[:n] = np.asarray(s_codes, np.int32)

    run = _build(m_pad, T, int(gap_q), int(gap_r), bool(local), bool(interpret))
    return int(run(m, n, jnp.asarray(s_full), jnp.asarray(pq)))
