"""Bisect the banded longpair kernel's per-step cost (real TPU).

Round-3 v2: slope timing (K=1 vs K=3 chained calls inside one jit — the
axon tunnel's ~100 ms/dispatch otherwise swamps a ~9 ms kernel) and the
product kernel's UNROLL=32 body.

Variants (probe-only; product kernel in ops/longpair_pallas.py):
  full    — the real SW step (measured 480 ns/step, 30 GCUPS @16k)
  nosel   — substitution = plane 0 (no select tree)          [wrong]
  nosym   — no symbol shift register (constant symbol)       [wrong]
  noroll  — no (1,B) lane rolls for boundary feeds           [wrong]
  nosmem  — no SMEM scalar read (s_t = 3)                    [wrong]
  bare    — H/E update only, no S/sym/boundaries             [wrong]
  steady  — full minus tau/warm masks (steady-state body:
            valid for steps >= B; timing probe)              [wrong-ish]
  bf16    — full with the select tree computed in bf16       [exact-ish]
  steady16— steady + bf16 tree                               [wrong-ish]
  opt     — steady16 + int32 sym carry                       [wrong-ish]
  optb    — opt + per-bit boolean shift registers            [wrong-ish]
  opt64   — opt with UNROLL=64                               [wrong-ish]

Usage: /opt/venv/bin/python experiments/r3_banded_bisect.py [variants...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libssa_tpu.util.jaxcache import enable_compilation_cache

enable_compilation_cache()

NEG = float(-(2.0**24))
UNROLL = 32


def build(B, T, Q, R, variant):
    def kernel(seed_ref, s_ref, pq_ref, out_ref, h_ref, e_ref, buf_ref):
        Qf, Rf = jnp.float32(Q), jnp.float32(R)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        lane0 = lane1 == 0
        rid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        row0 = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0) == 0
        masks = [jnp.where(rid >= d, -d * Rf, NEG) for d in (1, 2, 4)]
        fmask = jnp.where(rid >= 1, -Qf, NEG)
        fdecay = -rid.astype(jnp.float32) * Rf

        h_ref[:] = jnp.zeros((8, B), jnp.float32) + seed_ref[0].astype(
            jnp.float32
        )
        e_ref[:] = jnp.full((8, B), NEG, jnp.float32)
        buf_ref[:] = jnp.zeros((4, B), jnp.float32)

        def step(t, carry):
            h, e, b1, b2, bf, sym, acc = carry
            steady = variant in ("steady", "steady16")
            bftree = variant in ("bf16", "steady16")
            if not steady:
                tau = t - lane1
                warm = tau < 0
            if variant in ("nosmem", "bare"):
                s_t = jnp.float32(3.0)
            else:
                s_t = s_ref[t].astype(jnp.float32)
            if variant in ("nosym", "bare"):
                sym = jnp.where(lane0, s_t, sym)
            else:
                sym = jnp.where(
                    lane0, s_t, pltpu.roll(sym, shift=1, axis=1)
                )
            if variant in ("nosel", "bare"):
                s_col = pq_ref[0] + sym  # keep sym live
            else:
                symi = sym.astype(jnp.int32)
                lvl = [pq_ref[a] for a in range(32)]  # ref dtype (f32/bf16)
                for bit in range(5):
                    b_set = ((symi >> bit) & 1) == 1
                    lvl = [
                        jnp.where(b_set, lvl[2 * i + 1], lvl[2 * i])
                        for i in range(len(lvl) // 2)
                    ]
                s_col = lvl[0].astype(jnp.float32)
            if variant in ("noroll", "bare"):
                topH = jnp.where(lane0 | warm, 0.0, b1)
                topHd = jnp.where(lane0 | warm, 0.0, b2)
                topF = jnp.where(lane0 | warm, NEG, bf)
            elif steady:
                topH = jnp.where(lane0, 0.0, pltpu.roll(b1, shift=1, axis=1))
                topHd = jnp.where(lane0, 0.0, pltpu.roll(b2, shift=1, axis=1))
                topF = jnp.where(lane0, NEG, pltpu.roll(bf, shift=1, axis=1))
            else:
                topH = jnp.where(
                    lane0 | warm, 0.0, pltpu.roll(b1, shift=1, axis=1)
                )
                topHd = jnp.where(
                    lane0 | warm, 0.0, pltpu.roll(b2, shift=1, axis=1)
                )
                topF = jnp.where(
                    lane0 | warm, NEG, pltpu.roll(bf, shift=1, axis=1)
                )
            e_new = jnp.maximum(e - Rf, h - Qf)
            hd = jnp.where(row0, topHd, pltpu.roll(h, shift=1, axis=0))
            hnof = jnp.maximum(jnp.maximum(hd + s_col, e_new), 0.0)
            carry_in = jnp.maximum(topF - Rf, topH - Qf)
            dsc = hnof
            for i, mk in enumerate(masks):
                dsc = jnp.maximum(
                    dsc, pltpu.roll(dsc, shift=1 << i, axis=0) + mk
                )
            f = jnp.maximum(
                pltpu.roll(dsc, shift=1, axis=0) + fmask, carry_in + fdecay
            )
            h_new = jnp.maximum(hnof, f)
            acc = jnp.maximum(acc, h_new)
            return (h_new, e_new, h_new[7:8, :], b1, f[7:8, :], sym, acc)

        init = (
            h_ref[:], e_ref[:],
            buf_ref[0:1, :], buf_ref[1:2, :], buf_ref[2:3, :],
            buf_ref[3:4, :], jnp.zeros((8, B), jnp.float32),
        )

        def unrolled(k, carry):
            t0 = k * UNROLL
            for u in range(UNROLL):
                carry = step(t0 + u, carry)
            return carry

        final = jax.lax.fori_loop(0, T // UNROLL, unrolled, init)
        out_ref[:] = final[6]

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, B), jnp.float32),
            pltpu.VMEM((8, B), jnp.float32),
            pltpu.VMEM((4, B), jnp.float32),
        ],
    )

    def chained(k):
        @jax.jit
        def f(s, pq):
            outs = []
            for i in range(k):
                outs.append(
                    jnp.max(call(jnp.full((1,), i, jnp.int32), s, pq))
                )
            return jnp.stack(outs)
        return f

    return chained(1), chained(3)


def build_opt(B, T, Q, R, variant):
    """Steady-state-only kernel: bf16 tree + int32 sym (+ bool bit regs)."""
    unroll = 64 if variant == "opt64" else UNROLL
    boolbits = variant == "optb"

    def kernel(seed_ref, s_ref, pq_ref, out_ref, h_ref, e_ref, buf_ref):
        Qf, Rf = jnp.float32(Q), jnp.float32(R)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        lane0 = lane1 == 0
        rid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        row0 = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0) == 0
        masks = [jnp.where(rid >= d, -d * Rf, NEG) for d in (1, 2, 4)]
        fmask = jnp.where(rid >= 1, -Qf, NEG)
        fdecay = -rid.astype(jnp.float32) * Rf

        h_ref[:] = jnp.zeros((8, B), jnp.float32) + seed_ref[0].astype(
            jnp.float32
        )
        e_ref[:] = jnp.full((8, B), NEG, jnp.float32)
        buf_ref[:] = jnp.zeros((4, B), jnp.float32)

        def tree(bits):
            lvl = [pq_ref[a] for a in range(32)]
            for b_set in bits:
                lvl = [
                    jnp.where(b_set, lvl[2 * i + 1], lvl[2 * i])
                    for i in range(len(lvl) // 2)
                ]
            return lvl[0].astype(jnp.float32)

        def step(t, carry):
            h, e, b1, b2, bf, sym, acc = carry
            s_t = s_ref[t]
            if boolbits:
                bits = [
                    jnp.where(
                        lane0,
                        ((s_t >> k) & 1) == 1,
                        pltpu.roll(sym[k], shift=1, axis=1),
                    )
                    for k in range(5)
                ]
                sym_new = bits
            else:
                sym_new = jnp.where(
                    lane0, s_t, pltpu.roll(sym, shift=1, axis=1)
                )
                bits = [((sym_new >> k) & 1) == 1 for k in range(5)]
            s_col = tree(bits)
            topH = jnp.where(lane0, 0.0, pltpu.roll(b1, shift=1, axis=1))
            topHd = jnp.where(lane0, 0.0, pltpu.roll(b2, shift=1, axis=1))
            topF = jnp.where(lane0, NEG, pltpu.roll(bf, shift=1, axis=1))
            e_new = jnp.maximum(e - Rf, h - Qf)
            hd = jnp.where(row0, topHd, pltpu.roll(h, shift=1, axis=0))
            hnof = jnp.maximum(jnp.maximum(hd + s_col, e_new), 0.0)
            carry_in = jnp.maximum(topF - Rf, topH - Qf)
            dsc = hnof
            for i, mk in enumerate(masks):
                dsc = jnp.maximum(
                    dsc, pltpu.roll(dsc, shift=1 << i, axis=0) + mk
                )
            f = jnp.maximum(
                pltpu.roll(dsc, shift=1, axis=0) + fmask, carry_in + fdecay
            )
            h_new = jnp.maximum(hnof, f)
            acc = jnp.maximum(acc, h_new)
            return (h_new, e_new, h_new[7:8, :], b1, f[7:8, :], sym_new, acc)

        if boolbits:
            sym0 = [jnp.zeros((1, B), jnp.bool_) for _ in range(5)]
        else:
            sym0 = jnp.zeros((1, B), jnp.int32)
        init = (
            h_ref[:], e_ref[:],
            buf_ref[0:1, :], buf_ref[1:2, :], buf_ref[2:3, :],
            sym0, jnp.zeros((8, B), jnp.float32),
        )

        def unrolled(k, carry):
            t0 = k * unroll
            for u in range(unroll):
                carry = step(t0 + u, carry)
            return carry

        final = jax.lax.fori_loop(0, T // unroll, unrolled, init)
        out_ref[:] = final[6]

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, B), jnp.float32),
            pltpu.VMEM((8, B), jnp.float32),
            pltpu.VMEM((4, B), jnp.float32),
        ],
    )

    def chained(k):
        @jax.jit
        def f(s, pq):
            outs = []
            for i in range(k):
                outs.append(
                    jnp.max(call(jnp.full((1,), i, jnp.int32), s, pq))
                )
            return jnp.stack(outs)
        return f

    return chained(1), chained(3)


def main():
    print("devices:", jax.devices(), flush=True)
    N = 16384
    B = N // 8
    T = N + B
    rng = np.random.default_rng(1)
    s = rng.integers(0, 20, T).astype(np.int32)
    pq = rng.normal(size=(32, 8, B)).astype(np.float32) - 2.0
    s_j = jnp.asarray(s)
    variants = sys.argv[1:] or [
        "bare", "nosel", "nosym", "noroll", "nosmem", "full"
    ]
    for variant in variants:
        if variant in ("bf16", "steady16", "opt", "optb", "opt64"):
            pq_j = jnp.asarray(pq).astype(jnp.bfloat16)
        else:
            pq_j = jnp.asarray(pq)
        if variant.startswith("opt"):
            f1, f3 = build_opt(B, T, 11, 1, variant)
        else:
            f1, f3 = build(B, T, 11, 1, variant)
        t0 = time.perf_counter()
        np.asarray(f1(s_j, pq_j)); np.asarray(f3(s_j, pq_j))
        ct = time.perf_counter() - t0
        t1 = min(
            _time(lambda: np.asarray(f1(s_j, pq_j))) for _ in range(3)
        )
        t3 = min(
            _time(lambda: np.asarray(f3(s_j, pq_j))) for _ in range(3)
        )
        per = (t3 - t1) / 2 / T
        print(f"{variant:7s}: kernel {(t3-t1)/2*1e3:7.2f} ms = "
              f"{per*1e9:6.0f} ns/step ({N*N/((t3-t1)/2)/1e9:6.2f} "
              f"GCUPS-equiv) compile {ct:.1f}s", flush=True)


def _time(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
