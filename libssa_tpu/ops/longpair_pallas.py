"""Pallas TPU kernel for single enormous-pair SW/NW scoring.

Round-3 design history (experiments/r3_lp_bisect.py and
r3_banded_bisect.py have the receipts): a straightforward row-sweep with
a full-width lane-doubling lazy-E scan measured 5.1 GCUPS at 16k x 16k —
bisection showed (a) per-row-block MXU matmuls for the substitution rows
cost ~28 ms of the 52 (1024 small matmuls), and (b) LANE-axis
``pltpu.roll``s are serialized shuffles while sublane rolls and plain
VPU ops pipeline at issue rate. The kernel below is shaped by those
measurements plus a second bisect round on the banded form itself:
  * the 32-plane substitution select tree dominates a step (~180 ns of
    ~330); computing it in bfloat16 halves its vector-register footprint
    (scores are small integers — exact in bf16);
  * the warmup masks (tau<0 handling) cost ~100 ns/step but are dead
    after the first B steps — the loop is phase-split so only the
    prologue pays them;
  * the subject-symbol shift register carries int32 (lane rotates only
    legalize for 32-bit data; carrying f32 pays a cast per step);
  * a ~1.65 us fixed cost per fori iteration (r3_carry_probe.py) forces
    a 32-step unrolled body.
Measured: 263 ns/step probe-equivalent at B=2048 — ~55 GCUPS on a
16k x 16k pair; the r2 state of this path was ~1 GCUPS.

**Skewed-band formulation.** The query is cut into ``B = m_pad/CH``
bands of CH rows (CH = 8/16/32, picked by ``band_height`` from the
alphabet size and query length — taller bands shrink the serialized
lane rolls and the pipeline length at the cost of cross-vreg sublane
rolls in the lazy-F scan); band ``b`` lives in LANE ``b`` (its CH rows
on the sublanes).
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
  * Substitution scores come from a binary select tree over the
    per-symbol query planes ``Pq[a, r, b] = sub(q[8b + r], a)``
    (VMEM-resident, built outside) — no MXU, no gather, and no
    per-lane profile problem (the blocker that kept anti-diagonal
    formulations at ~1 GCUPS, docs/PERF_NOTES.md r2). The tree is
    ALPHABET-SIZED (K-1 selects over K planes, odd tails pass through):
    the PAD symbol is remapped from 31 to the first free code, so a
    nucleotide pair selects over 16 planes (15 selects) and a standard
    protein pair over 21 (20 selects; rare-code sequences 25) instead
    of a fixed 32 — selects cost ~4-5 ns each IN EITHER LAYOUT
    (issue-bound on the mask+select sequence, not operand volume;
    PERF_NOTES r3 + r5). Two data layouts (``tree_impl``): bf16 planes
    for the small nucleotide trees, and for protein trees (K >= 21,
    CH >= 32) the r5 packed-int8 layout — four int8 rows per int32
    word, tree on the packed words, one shift-pair sign-extend unpack
    per step — measured 95-109 GCUPS at 16k/32k protein vs 63-88 bf16.
  * State is ONE (8, B) H/E pair: memory O(m); the subject only streams
    as a (T,) symbol vector, so n is unbounded.

Exactness: each band runs the full Gotoh recurrence given its top
boundary — the standard row-block decomposition (ring.py's argument).
SW needs no activity masking at all: pre-phase lanes hold exactly the
SW boundary state (H = 0 under the clamp; the E steady-state value -Q
equals the boundary recurrence's E[i][1] candidate), and post-phase /
pad lanes only decay (PAD symbols score -64), so the running max is
exact. NW injects the column boundary when ``tau == 0`` and latches the
capture row at ``tau == n_real - 1``. Phase bounds are static: warmup
(tau < 0 anywhere) only happens for t < B, and every capture event
t = n_real - 1 + b lands in [T - B - 512, T) by the wrapper's T
padding, so the masked bodies run only there. Bit-exact vs the int64
oracle for |score| < 2**24 (caller checks ``longpair.score_bound``);
locked by tests/test_longpair.py (interpret mode) and the TPU hardware
lane.
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
M_PAD_MAX = 64 * 1024  # Pq (32, CH, B) bf16 must fit VMEM
UNROLL_STEPS = 32  # DP steps per fori iteration (see _kernel)
CH_ROWS = 8  # band height (rows per lane); see _build(CH=...)


def _kernel(
    mr_ref,  # (2,) int32 SMEM: [m_real, n_real] (traced)
    s_ref,  # (T,) int32 SMEM: subject codes, PAD beyond n_real
    pq_ref,  # (K, CH, B) bf16: per-symbol query planes
    out_ref,  # (CH, B) f32: SW running max (NW: unused zeros)
    cap_ref,  # (1, B) f32: NW captured cells (per lane's column hit)
    h_ref,  # (CH, B) f32 scratch: carry inits (Mosaic rejects splat-
    e_ref,  # (CH, B) f32 scratch:  initialized fori carries — the known
    buf_ref,  # (3, B) f32 scratch: relayout bug; see module docstring)
    *,
    B: int,
    T: int,
    Q: int,
    R: int,
    K: int,
    CH: int,
    local: bool,
    unroll: int,
    tree_mode: str,
):
    Qf, Rf = jnp.float32(Q), jnp.float32(R)
    PAD = K - 1
    mr = mr_ref[0]
    nr = mr_ref[1]

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    lane0 = lane1 == 0
    rid = jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (CH, B), 0) == 0
    # Confined CH-row lazy-F masks (ops/interseq_pallas.py).
    masks = []
    d = 1
    while d < CH:
        masks.append(jnp.where(rid >= d, -d * Rf, NEG_F32))
        d *= 2
    fmask = jnp.where(rid >= 1, -Qf, NEG_F32)
    fdecay = -rid.astype(jnp.float32) * Rf
    # NW column-0 boundary plane: H[i][0] = -(Q + (i-1) R), i = CH*b + r + 1.
    gi = (
        jax.lax.broadcasted_iota(jnp.int32, (CH, B), 1) * CH
        + jax.lax.broadcasted_iota(jnp.int32, (CH, B), 0)
    ).astype(jnp.float32)
    ibnd = -(Qf + gi * Rf)
    rc = (mr - 1) % CH  # NW capture row within its band (traced)

    def _tree(symi, planes):
        """Binary select tree over the K symbol planes (K-1 selects: an
        odd tail at any level passes through unchanged — node j at level
        d covers symbols with ``sym >> d == j``, so the lone tail node
        needs no select until a higher bit pairs it)."""
        lvl = planes
        bit = 0
        while len(lvl) > 1:
            b_set = ((symi >> bit) & 1) == 1  # (1, B)
            nxt = [
                jnp.where(b_set, lvl[2 * i + 1], lvl[2 * i])
                for i in range(len(lvl) // 2)
            ]
            if len(lvl) % 2:
                nxt.append(lvl[-1])
            lvl = nxt
            bit += 1
        return lvl[0]

    if tree_mode == "const":

        def sel_tree(symi):
            """PROBE-ONLY floor variant (experiments/r5_lp_pack_probe):
            the substitution select replaced by one plane — WRONG scores,
            right instruction mix minus the tree. Never reachable from
            ``longpair_score_pallas``."""
            return pq_ref[0].astype(jnp.float32)

    elif tree_mode == "packed8":
        W = CH // 4

        def sel_tree(symi):
            """Packed-int8 substitution select (r5; the measured step
            breakdown put the K-1 selects at ~55% of a protein step).

            Each plane is (W, B) int32 with FOUR rows' int8 scores per
            word (byte j = band row ``w + W*j``) — HALF the per-select
            data volume of the bf16 planes, on ops that all legalize
            (int32 where/shift; int8 vector ops don't lower in Mosaic —
            PERF_NOTES legalization matrix — but int8 data inside int32
            words never touches an int8 op). The tree runs on the packed
            words; ONE shift-pair sign-extend unpack per step (vs a
            convert inside every select) rebuilds the (CH, B) f32
            column. Packing is along SUBLANES, so the per-LANE select
            condition broadcast is unchanged.
            """
            word = _tree(symi, [pq_ref[a] for a in range(K)])  # (W, B) i32
            groups = []
            for j in range(4):
                g = word >> (8 * j) if j == 3 else (
                    (word << (24 - 8 * j)) >> 24
                )
                groups.append(g.astype(jnp.float32))
            return jnp.concatenate(groups, axis=0)  # (CH, B)

    else:

        def sel_tree(symi):
            """bf16 substitution plane select: (CH, B) bf16 operands
            halve the per-select register footprint vs f32; matrix
            scores are small integers, so bf16 is exact."""
            return _tree(
                symi, [pq_ref[a] for a in range(K)]
            ).astype(jnp.float32)  # (CH, B)

    def make_step(warmup: bool, capture: bool):
        """One DP step; ``warmup`` adds the tau<0 masks (only correct —
        and only needed — while any lane has tau <= 0, i.e. t < B);
        ``capture`` adds the NW end-cell latch (t in [nr-1, nr-1+B))."""

        def step(t, carry):
            h, e, botH1, topHd_raw, botF1, sym, acc, cap = carry
            # Shift register: after injection lane b holds s[t - b].
            sym = jnp.where(
                lane0, s_ref[t], pltpu.roll(sym, shift=1, axis=1)
            )
            s_col = sel_tree(sym)

            if warmup:
                tau = t - lane1  # (1, B): this lane's subject column
                warm = tau < 0
                if not local:
                    # This lane is about to compute its first real
                    # column: its state must hold the NW column-0
                    # boundary.
                    at0 = tau == 0
                    h = jnp.where(at0, ibnd, h)
                    e = jnp.where(at0, NEG_F32, e)

            # Top-boundary feeds: band b-1's bottom rows, delayed 1/2
            # steps. The 2-step delay (topHd) is last step's 1-step roll,
            # carried RAW (pre-mask) — saves a lane roll per step.
            # Warmup lanes (tau < 0) must NOT see band b-1's real
            # values — they hold the pre-DP boundary state until their
            # tau == 0 step.
            topH_raw = pltpu.roll(botH1, shift=1, axis=1)
            topH = topH_raw
            topHd = topHd_raw
            topF = pltpu.roll(botF1, shift=1, axis=1)
            if local:
                dead = (lane0 | warm) if warmup else lane0
                topH = jnp.where(dead, 0.0, topH)
                topHd = jnp.where(dead, 0.0, topHd)
                topF = jnp.where(dead, NEG_F32, topF)
            elif warmup:
                tf = (t - lane1).astype(jnp.float32)
                # Row-above column-0 boundary H[CH*b][0] for the diagonal
                # at tau == 0 (band b-1's column 0 was never an update
                # output).
                diag0 = jnp.where(
                    lane0,
                    0.0,
                    -(Qf + (CH * lane1.astype(jnp.float32) - 1.0) * Rf),
                )
                tau = t - lane1
                topH = jnp.where(
                    lane0, -(Qf + tf * Rf), jnp.where(warm, 0.0, topH)
                )
                topHd = jnp.where(
                    lane0,
                    jnp.where(tau <= 0, 0.0, -(Qf + (tf - 1.0) * Rf)),
                    jnp.where(tau == 0, diag0, jnp.where(warm, 0.0, topHd)),
                )
                topF = jnp.where(lane0 | warm, NEG_F32, topF)
            else:
                # Steady NW: lane 0's synthetic top boundary at column t
                # is a scalar broadcast (t >= B > 0 here).
                tsf = t.astype(jnp.float32)
                topH = jnp.where(lane0, -(Qf + tsf * Rf), topH)
                topHd = jnp.where(lane0, -(Qf + (tsf - 1.0) * Rf), topHd)
                topF = jnp.where(lane0, NEG_F32, topF)

            # One interseq-style column update over the whole CH-row band.
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
            elif capture:
                hit = (t - lane1) == nr - 1
                # Row rc of h_new via mask + sublane max-reduce
                # (dynamic_slice of a VALUE does not lower in Pallas
                # TPU; refs would cost a store per step).
                cap_row = jnp.max(
                    jnp.where(rid == rc, h_new, NEG_F32),
                    axis=0,
                    keepdims=True,
                )
                cap = jnp.where(hit, cap_row, cap)

            return (
                h_new,
                e_new,
                h_new[CH - 1 : CH, :],
                topH_raw,
                f[CH - 1 : CH, :],
                sym,
                acc,
                cap,
            )

        return step

    # Carry inits round-trip through scratch refs: splat-constant (8, B)
    # fori carries trip a Mosaic relayout bug ("replicated in destination
    # but not in source"), the same one ops/interseq_pallas.py works
    # around with ref-resident state.
    h_ref[:] = jnp.zeros((CH, B), jnp.float32)  # SW boundary; NW @ tau==0
    e_ref[:] = jnp.full((CH, B), NEG_F32, jnp.float32)
    buf_ref[0:1, :] = jnp.zeros((1, B), jnp.float32)  # botH1
    buf_ref[1:2, :] = jnp.zeros((1, B), jnp.float32)  # topHd_raw
    buf_ref[2:3, :] = jnp.full((1, B), NEG_F32, jnp.float32)  # botF1
    out_ref[:] = jnp.zeros((CH, B), jnp.float32)
    cap_ref[:] = jnp.full((1, B), NEG_F32, jnp.float32)
    init = (
        h_ref[:],
        e_ref[:],
        buf_ref[0:1, :],
        buf_ref[1:2, :],
        buf_ref[2:3, :],
        jnp.full((1, B), PAD, jnp.int32),  # sym pre-injection
        out_ref[:],
        cap_ref[:],
    )

    # UNROLL_STEPS per fori iteration: a Pallas fori_loop iteration has
    # ~1.65 us of fixed overhead regardless of body size (measured,
    # experiments/r3_carry_probe.py — body ops run at issue rate once
    # inside one iteration), so the loop must amortize it over many DP
    # steps, exactly like interseq_pallas's two-columns-per-trip outer().
    def unrolled_loop(lo, hi, body):
        def run(k, carry):
            t0 = k * unroll
            for u in range(unroll):
                carry = body(t0 + u, carry)
            return carry

        return lo // unroll, hi // unroll, run

    # Phase bounds (STATIC; see module docstring): warmup masks are only
    # live for t < B; NW capture events t = nr-1 + b all land at
    # t >= T - B - 512 because the wrapper pads T < nr + B + 512.
    P = min(B, T)
    E = T if local else max(P, T - B - 512)
    carry = init
    lo, hi, body = unrolled_loop(0, P, make_step(warmup=True, capture=True))
    carry = jax.lax.fori_loop(lo, hi, body, carry)
    if E > P:
        lo, hi, body = unrolled_loop(
            P, E, make_step(warmup=False, capture=False)
        )
        carry = jax.lax.fori_loop(lo, hi, body, carry)
    if T > E:
        lo, hi, body = unrolled_loop(
            E, T, make_step(warmup=False, capture=True)
        )
        carry = jax.lax.fori_loop(lo, hi, body, carry)
    out_ref[:] = carry[6]
    cap_ref[:] = carry[7]


@functools.lru_cache(maxsize=64)
def _build(
    m_pad, T, Q, R, local, interpret, K=PADDED_ALPHABET, CH=None,
    tree_mode="bf16",
):
    CH = CH_ROWS if CH is None else CH
    B = m_pad // CH
    # Interpret mode (CPU tests) keeps the loop rolled: the 32x body is
    # identical code, and interpreting it 32x inline is painfully slow.
    unroll = 1 if interpret else UNROLL_STEPS
    kernel = functools.partial(
        _kernel, B=B, T=T, Q=Q, R=R, K=K, CH=CH, local=local,
        unroll=unroll, tree_mode=tree_mode,
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
            jax.ShapeDtypeStruct((CH, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((CH, B), jnp.float32),
            pltpu.VMEM((CH, B), jnp.float32),
            pltpu.VMEM((3, B), jnp.float32),
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
        band = (jnp.asarray(m_real, jnp.int32) - 1) // CH
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
    ch: int | None = None,
    tree: str | None = None,
) -> int:
    """Exact SW/NW score of one pair on the skewed-band Pallas kernel.

    Caller contract: |score| < 2**24 (``longpair.score_bound``) and
    ``len(q_codes) <= M_PAD_MAX`` (the per-symbol query planes must fit
    VMEM; ``longpair.longpair_score`` swaps/falls back). Subject length
    is unbounded. Compilations key on (m_pad, T_pad, gaps, mode, K, CH,
    tree) where K is the select-tree plane count (``alphabet_planes``),
    CH the band height (``band_height`` unless pinned via ``ch``), and
    ``tree`` the select-tree data layout: ``"bf16"`` (per-row bf16
    planes) or ``"packed8"`` (four int8 rows per int32 word — half the
    per-select data volume; see ``_kernel.sel_tree``). ``None`` picks by
    alphabet (``tree_impl``, measured — PERF_NOTES r5).
    """
    m, n = len(q_codes), len(s_codes)
    if m == 0 or n == 0:
        raise ValueError("use longpair.longpair_score for empty inputs")
    q_codes = np.asarray(q_codes, np.int64)
    s_codes = np.asarray(s_codes, np.int64)
    K = alphabet_planes(q_codes, s_codes)
    if m > M_PAD_MAX * (PADDED_ALPHABET // K):
        raise ValueError(f"query too long for the VMEM planes ({m})")
    PAD = K - 1
    CH = band_height(K, m) if ch is None else int(ch)
    auto_tree = tree is None
    tree = tree_impl(K, CH) if tree is None else tree
    if tree not in ("bf16", "packed8"):
        raise ValueError(f"unknown select-tree impl {tree!r}")
    packed = tree == "packed8" and CH % 4 == 0
    # m_pad: B = m_pad/CH must be a lane multiple (>= 128) and an
    # UNROLL_STEPS multiple for the phase bounds.
    unit = max(1024, 128 * CH)
    m_pad = max(unit, -(-m // unit) * unit)
    B = m_pad // CH
    # Steps: every band must pass its last real column; pad to a 512
    # multiple (= an UNROLL_STEPS multiple) to bound compile-cache
    # fragmentation. The NW epilogue phase bound relies on this slack
    # being < 512 (see _kernel).
    T = -(-(n + B) // 512) * 512

    pq = build_planes(q_codes, matrix_padded, m_pad, K, CH)
    if packed and auto_tree and np.abs(pq).max() > 127:
        # The Pallas paths admit |score| <= 256 (bf16-exact); the packed
        # bytes only <= 127 — auto-picked trees fall back, an explicit
        # "packed8" request errors in pack_planes.
        packed = False
    if packed:
        pq_dev = jnp.asarray(pack_planes(pq))
    else:
        pq_dev = jnp.asarray(pq.astype(np.float32)).astype(jnp.bfloat16)

    s_full = np.full((T,), PAD, np.int32)
    s_full[:n] = s_codes

    run = _build(
        m_pad, T, int(gap_q), int(gap_r), bool(local), bool(interpret), K,
        CH, "packed8" if packed else "bf16",
    )
    return int(run(m, n, jnp.asarray(s_full), pq_dev))


def band_height(K: int, m: int) -> int:
    """Band height CH (rows per lane) for a query of m rows, K planes.

    Trade-off (all measured on-chip, PERF_NOTES r3 "band height" + r5
    "packed select tree"): the per-step lane rolls are serialized
    shuffles proportional to B = m_pad/CH, and a smaller B also
    shortens the pipeline (T = n + B) — but taller bands pay cross-vreg
    sublane rolls in the confined lazy-F scan, and the sweet spot moves
    with the select-tree size and layout. Measured best cells: K=5
    16k->CH16 / >=32k->CH32 (124 GCUPS at 32k); K=16 16k->CH16;
    K>=21 (protein, packed8 tree) -> CH32 at every large size (95-108
    at 16k K=21, 104-109 at 32k K=25 — the r3-era CH16 rule for 32k
    protein belonged to the bf16 tree, whose packed replacement needs
    whole-vreg words, CH >= 32). Small queries stay at CH8: their
    padding unit is 128*CH and they are dispatch-bound anyway.
    """
    if m < 8192:
        return 8
    if K <= 5:
        return 16 if m <= 16384 else 32
    if K <= 16:
        return 16
    return 32


def alphabet_planes(*code_arrays) -> int:
    """Number of substitution planes (incl. pad) the select tree needs.

    The tree costs K-1 selects (~4.5 ns each, measured — the dominant
    per-step cost), so K is sized to the codes actually present: 5
    covers plain ACGT (the common genome-pair case), 16 the 15 IUPAC
    nucleotide codes, 21 the 20 standard amino acids (the common
    protein case — rare-code sequences with B/Z/X/U/O take the next
    rung), 25 the 24 NCBI amino-acid codes (alphabet.py), 32 anything
    else. The kernel-side PAD symbol is remapped from
    ``PADDED_ALPHABET - 1`` to ``K - 1`` (the first free code);
    ``build_planes`` places the matrix's pad column/row there, so
    scores are unchanged. Measured 16k x 16k SW rates: K=32 53.8,
    K=25 62.3, K=16 70.3 (PERF_NOTES r3, bf16 tree); K=21 packed8
    ~100-108 (PERF_NOTES r5).
    """
    maxc = max(
        (int(a.max()) for a in code_arrays if len(a)), default=0
    )
    if maxc <= 3:
        return 5
    if maxc <= 14:
        return 16
    if maxc <= 19:
        return 21
    if maxc <= 23:
        return 25
    return PADDED_ALPHABET


def tree_impl(K: int, CH: int) -> str:
    """Select-tree data layout by (alphabet, band height) — measured,
    PERF_NOTES r5. Protein-and-larger trees (K >= 21) are select-bound:
    the packed-int8 layout wins decisively there (K=25 CH=32: 92-95 vs
    67-88 bf16; K=21: 95-108). Two gates: the small nucleotide trees
    keep bf16 (4-15 selects don't amortize the fixed ~25 ns unpack),
    and packing needs CH >= 32 so a packed plane's W = CH/4 >= 8
    sublanes fill whole vregs — at CH=16 the (4, B) half-vreg operands
    triggered a Mosaic relayout storm (measured 31 GCUPS vs 69 bf16)."""
    return "packed8" if K >= 21 and CH >= 32 and CH % 4 == 0 else "bf16"


def build_planes(
    q_codes, matrix_padded, m_pad: int, K: int, CH: int = 8
) -> np.ndarray:
    """(K, CH, B) planes ``Pq[a, r, b] = sub(q[CH*b + r], a)``, pad K-1."""
    B = m_pad // CH
    m = len(q_codes)
    # Map kernel code space (0..K-1, pad at K-1) onto matrix columns/rows
    # (0..31, pad at 31).
    cmap = np.arange(K, dtype=np.int64)
    cmap[K - 1] = PADDED_ALPHABET - 1
    q_full = np.full((m_pad,), K - 1, np.int64)
    q_full[:m] = np.asarray(q_codes, np.int64)
    qprof = np.asarray(matrix_padded)[cmap[q_full]][:, cmap]  # (m_pad, K)
    return np.ascontiguousarray(qprof.reshape(B, CH, K).transpose(2, 1, 0))


def pack_planes(pq: np.ndarray) -> np.ndarray:
    """(K, CH, B) int planes -> (K, CH//4, B) int32, 4 int8 rows/word.

    Byte j of word w holds band row ``w + (CH//4) * j`` (two's
    complement), so the kernel's shift-pair sign-extend unpack yields
    the four (CH//4, B) row groups in concatenation order. Caller
    contract: |score| <= 127 (``longpair_score`` already rejects
    matrices past the bf16-exact bound of 256 for every Pallas path;
    the packed path's tighter bound is enforced here).
    """
    K, CH, B = pq.shape
    if CH % 4:
        raise ValueError(f"band height {CH} not divisible into words")
    if np.abs(pq).max() > 127:
        raise ValueError("packed select tree needs |score| <= 127")
    b = pq.astype(np.int8).astype(np.uint8).astype(np.uint32)
    W = CH // 4
    g = b.reshape(K, 4, W, B)  # group j = rows [W*j, W*(j+1))
    word = g[:, 0] | (g[:, 1] << 8) | (g[:, 2] << 16) | (g[:, 3] << 24)
    return word.astype(np.int32)
