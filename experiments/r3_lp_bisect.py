"""Bisect the longpair_pallas per-row cost on real TPU.

Variants of the row loop with stages disabled (probe-only kernels; the
product kernel lives in ops/longpair_pallas.py):
  full      — the real kernel
  noscan    — lazy-E doubling scan removed (wrong scores, timing only)
  nosass    — S-row assembly replaced by a constant (wrong scores)
  noshift   — Hdiag/Dsh global shifts replaced by plain rolls (wrong)
  nosmall   — scan keeps only the vreg-aligned (d>=128) levels (wrong)

Also checks the FULL kernel's 4096 score against the vectorized host
fill (aligner.fill_matrices) — the big-pair oracle.

Usage: /opt/venv/bin/python experiments/r3_lp_bisect.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libssa_tpu.constants import PADDED_ALPHABET
from libssa_tpu.util.jaxcache import enable_compilation_cache

enable_compilation_cache()

NEG = float(-(2.0**24))


def build(n_pad, m_pad, RB, Q, R, variant):
    W = n_pad // 8
    n_lvl = 0
    d = 1
    while d < W:
        n_lvl += 1
        d *= 2
    use_scratch_masks = variant.startswith("ms")

    def kernel(qoh_ref, p_ref, out_ref, h_ref, f_ref, mk_ref, *s_refs):
        blk = pl.program_id(0)
        Qf, Rf = jnp.float32(Q), jnp.float32(R)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, W), 1)
        sub1 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        lane0 = lane == 0
        pos0 = (jax.lax.broadcasted_iota(jnp.int32, (8, W), 0) == 0) & lane0
        smasks = [jnp.where(sub1 >= d, -d * W * Rf, NEG) for d in (1, 2, 4)]

        @pl.when(blk == 0)
        def _():
            h_ref[:] = jnp.zeros((8, W), jnp.float32)
            f_ref[:] = jnp.full((8, W), NEG, jnp.float32)
            out_ref[:] = jnp.zeros((8, W), jnp.float32)
            for i in range(n_lvl):
                dd = 1 << i
                mk_ref[i] = jnp.where(lane >= dd, -dd * Rf, NEG)
            mk_ref[n_lvl] = -(lane.astype(jnp.float32) + 1.0) * Rf

        def lmask(i):
            if use_scratch_masks:
                return mk_ref[i]
            dd = 1 << i
            return jnp.where(lane >= dd, -dd * Rf, NEG)

        def lanedec():
            if use_scratch_masks:
                return mk_ref[n_lvl]
            return -(lane.astype(jnp.float32) + 1.0) * Rf

        qoh = qoh_ref[:]
        for r in range(8):
            s_refs[r][:] = jnp.dot(
                qoh, p_ref[r], preferred_element_type=jnp.float32
            )

        if variant.startswith("c_"):
            # Carry-based state: scratch refs only touched outside the
            # fori (the per-iteration ref write/read measured ~1.7 us of
            # pure overhead in the ref-based variants).
            def crow(ri, carry):
                h, f, acc = carry
                if variant == "c_empty":
                    return (h + 1.0, f, acc)
                s_row = jnp.concatenate(
                    [s_refs[r][pl.ds(ri, 1), :] for r in range(8)], axis=0
                )
                f_new = jnp.maximum(f - Rf, h - Qf)
                rolled = pltpu.roll(h, shift=1, axis=1)
                coll = pltpu.roll(h[:, W - 1 : W], shift=1, axis=0)
                fix = jnp.where(sub1 == 0, 0.0, coll)
                hd = jnp.where(lane0, fix, rolled)
                hnof = jnp.maximum(jnp.maximum(hd + s_row, f_new), 0.0)
                dsc = hnof
                if variant != "c_noscan":
                    for i in range(n_lvl):
                        dsc = jnp.maximum(
                            dsc,
                            pltpu.roll(dsc, shift=1 << i, axis=1) + lmask(i),
                        )
                    pfx = dsc[:, W - 1 : W]
                    for i, mk in enumerate(smasks):
                        pfx = jnp.maximum(
                            pfx, pltpu.roll(pfx, shift=1 << i, axis=0) + mk
                        )
                    g = pltpu.roll(pfx, shift=1, axis=0)
                    g = jnp.where(sub1 == 0, NEG, g)
                    dsc = jnp.maximum(dsc, g + lanedec())
                drolled = pltpu.roll(dsc, shift=1, axis=1)
                dcoll = pltpu.roll(dsc[:, W - 1 : W], shift=1, axis=0)
                dfix = jnp.where(sub1 == 0, NEG, dcoll)
                dsh = jnp.where(lane0, dfix, drolled)
                e_row = jnp.where(pos0, NEG, dsh - Qf)
                h_new = jnp.maximum(hnof, e_row)
                return (h_new, f_new, jnp.maximum(acc, h_new))

            h, f, acc = jax.lax.fori_loop(
                0, RB, crow, (h_ref[:], f_ref[:], out_ref[:])
            )
            h_ref[:] = h
            f_ref[:] = f
            out_ref[:] = acc
            return

        def row(ri, _):
            if variant == "empty":
                h_ref[:] = h_ref[:] + 1.0
                return 0
            if variant == "min4":
                hp = h_ref[:]
                h_new = jnp.maximum(
                    pltpu.roll(hp, shift=1, axis=1)
                    + jnp.concatenate(
                        [s_refs[r][pl.ds(ri, 1), :] for r in range(8)],
                        axis=0,
                    ),
                    0.0,
                )
                h_ref[:] = h_new
                out_ref[:] = jnp.maximum(out_ref[:], h_new)
                return 0
            if variant == "nosass":
                s_row = f_ref[:] * 0.0 - 2.0
            else:
                s_row = jnp.concatenate(
                    [s_refs[r][pl.ds(ri, 1), :] for r in range(8)], axis=0
                )
            hp = h_ref[:]
            fp = f_ref[:]
            f_new = jnp.maximum(fp - Rf, hp - Qf)
            if variant == "noshift":
                hd = pltpu.roll(hp, shift=1, axis=1)
            else:
                rolled = pltpu.roll(hp, shift=1, axis=1)
                coll = pltpu.roll(hp[:, W - 1 : W], shift=1, axis=0)
                fix = jnp.where(sub1 == 0, 0.0, coll)
                hd = jnp.where(lane0, fix, rolled)
            hnof = jnp.maximum(jnp.maximum(hd + s_row, f_new), 0.0)
            x = jnp.where(pos0, jnp.maximum(hnof, NEG), hnof)
            dsc = x
            if variant not in ("noscan", "ms_noscan"):
                for i in range(n_lvl):
                    if variant == "nosmall" and (1 << i) < 128:
                        continue
                    dsc = jnp.maximum(
                        dsc, pltpu.roll(dsc, shift=1 << i, axis=1) + lmask(i)
                    )
                se = dsc[:, W - 1 : W]
                pfx = se
                for i, mk in enumerate(smasks):
                    pfx = jnp.maximum(
                        pfx, pltpu.roll(pfx, shift=1 << i, axis=0) + mk
                    )
                g = pltpu.roll(pfx, shift=1, axis=0)
                g = jnp.where(sub1 == 0, NEG, g)
                dsc = jnp.maximum(dsc, g + lanedec())
            if variant == "noshift":
                dsh = pltpu.roll(dsc, shift=1, axis=1)
            else:
                drolled = pltpu.roll(dsc, shift=1, axis=1)
                dcoll = pltpu.roll(dsc[:, W - 1 : W], shift=1, axis=0)
                dfix = jnp.where(sub1 == 0, NEG, dcoll)
                dsh = jnp.where(lane0, dfix, drolled)
            e_row = jnp.where(pos0, NEG, dsh - Qf)
            h_new = jnp.maximum(hnof, e_row)
            h_ref[:] = h_new
            f_ref[:] = f_new
            out_ref[:] = jnp.maximum(out_ref[:], h_new)
            return 0

        jax.lax.fori_loop(0, RB, row, 0)

    call = pl.pallas_call(
        kernel,
        grid=(m_pad // RB,),
        in_specs=[
            pl.BlockSpec((RB, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, 32, W), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, W), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, W), jnp.float32)] * 2
        + [pltpu.VMEM((n_lvl + 1, 8, W), jnp.float32)]
        + [pltpu.VMEM((RB, W), jnp.float32)] * 8,
    )
    return jax.jit(lambda qoh, p: jnp.max(call(qoh, p)))


def main():
    print("devices:", jax.devices(), flush=True)
    N = 16384
    RB = 128
    rng = np.random.default_rng(1)
    q = rng.integers(0, 20, N).astype(np.uint8)
    s = rng.integers(0, 20, N).astype(np.uint8)
    from libssa_tpu import matrices

    B62 = matrices.builtin("BLOSUM62")
    W = N // 8
    P = np.asarray(B62.padded())[:, s].astype(np.float32)
    p_spans = np.transpose(P.reshape(32, 8, W), (1, 0, 2)).copy()
    qoh = np.zeros((N, 32), np.float32)
    qoh[np.arange(N), q] = 1.0
    qoh_j, p_j = jnp.asarray(qoh), jnp.asarray(p_spans)

    for variant in ("c_empty", "c_noscan", "c_full"):
        f = build(N, N, RB, 11, 1, variant)
        t0 = time.perf_counter()
        sc = float(f(qoh_j, p_j))
        compile_t = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(qoh_j, p_j))
            ts.append(time.perf_counter() - t0)
        print(
            f"{variant:8s}: warm {min(ts)*1e3:7.1f} ms "
            f"({N*N/min(ts)/1e9:6.2f} GCUPS) score={sc:.0f} "
            f"compile {compile_t:.1f}s",
            flush=True,
        )

    return  # skip exactness re-check in this bisect run
    from libssa_tpu.ops.longpair_pallas import longpair_score_pallas
    from libssa_tpu.search.aligner import fill_matrices

    n4 = 4096
    q4, s4 = q[:n4], s[:n4]
    t0 = time.perf_counter()
    H, _, _ = fill_matrices(q4, s4, B62.scores, 11, 1, True)
    want = int(H.max())
    print(f"host fill 4096: {time.perf_counter()-t0:.1f}s score={want}",
          flush=True)
    got = longpair_score_pallas(q4, s4, B62.padded(), 11, 1, local=True)
    print(f"pallas 4096: score={got} {'OK' if got == want else 'MISMATCH'}",
          flush=True)


if __name__ == "__main__":
    main()
