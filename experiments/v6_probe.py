"""v6 kernel probe: folded-mask scan + accumulator tracking + T-batched matmul.

Exactness checked against the scan kernel. SW/local only (the hot path).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from libssa_tpu.constants import PADDED_ALPHABET
from libssa_tpu import matrices
from libssa_tpu.ops.scoring import make_profile
from libssa_tpu.ops import interseq

NEG = float(-(2.0**24))


def _kernel(
    profile_ref,   # (m, 32) f32
    subjects8_ref, # (n/T, T*B) int32 (T columns side by side)
    scores_ref, hi_ref, lo_ref,  # (1, B) f32 outs
    H_ref, E_ref, M_ref, LO_ref, S8_ref,
    *, m, n_pad, Q, R, T, track_lo, IL,
):
    TB = subjects8_ref.shape[1]
    B = TB // T
    prof = profile_ref[:]
    Qf, Rf = jnp.float32(Q), jnp.float32(R)

    rid = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    # Scan masks with -d*R folded in; F-shift mask has -Q folded in.
    masks = []
    d = 1
    while d < m:
        masks.append(
            jnp.where(rid >= d, -d * Rf, NEG).astype(jnp.float32)
        )
        d *= 2
    fmask = jnp.where(rid >= 1, -Qf, NEG).astype(jnp.float32)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (m, TB // TB * B), 0) == 0  # (m, B)

    H_ref[:] = jnp.zeros((m, B), jnp.float32)
    E_ref[:] = jnp.full((m, B), NEG, jnp.float32)
    M_ref[:] = jnp.zeros((m, B), jnp.float32)
    if track_lo:
        LO_ref[:] = jnp.zeros((m, B), jnp.float32)

    def outer(k, _):
        s8 = subjects8_ref[pl.ds(k, 1), :].astype(jnp.int32)  # (1, T*B)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (PADDED_ALPHABET, TB), 0) == s8
        ).astype(jnp.float32)
        S8_ref[:] = jnp.dot(prof, onehot, preferred_element_type=jnp.float32)
        W = B // IL  # lane-group width
        for u in range(T):
            # IL independent lane-groups: their scan chains have no data
            # dependence, letting the VLIW scheduler overlap roll latency.
            Hs, Es, Ms, Ls = [], [], [], []
            for g in range(IL):
                lo_, hi_ = g * W, (g + 1) * W
                S = S8_ref[:, u * B + lo_: u * B + hi_]
                H = H_ref[:, lo_:hi_]
                E = E_ref[:, lo_:hi_]
                E_new = jnp.maximum(E - Rf, H - Qf)
                H_diag = jnp.where(
                    row0[:, :W], 0.0, pltpu.roll(H, shift=1, axis=0)
                )
                Hnof = jnp.maximum(jnp.maximum(H_diag + S, E_new), 0.0)
                D = Hnof
                d2 = 1
                i = 0
                while d2 < m:
                    D = jnp.maximum(
                        D, pltpu.roll(D, shift=d2, axis=0) + masks[i]
                    )
                    d2 *= 2
                    i += 1
                F = pltpu.roll(D, shift=1, axis=0) + fmask
                H_new = jnp.maximum(Hnof, F)
                Hs.append(H_new)
                Es.append(E_new)
                Ms.append(jnp.maximum(M_ref[:, lo_:hi_], H_new))
                if track_lo:
                    Ls.append(jnp.minimum(LO_ref[:, lo_:hi_], H_new))
            for g in range(IL):
                lo_, hi_ = g * W, (g + 1) * W
                H_ref[:, lo_:hi_] = Hs[g]
                E_ref[:, lo_:hi_] = Es[g]
                M_ref[:, lo_:hi_] = Ms[g]
                if track_lo:
                    LO_ref[:, lo_:hi_] = Ls[g]
        return 0

    jax.lax.fori_loop(0, n_pad // T, outer, 0)
    scores_ref[:] = jnp.max(M_ref[:], axis=0, keepdims=True)
    hi_ref[:] = scores_ref[:]
    lo_ref[:] = (
        jnp.min(LO_ref[:], axis=0, keepdims=True)
        if track_lo
        else jnp.zeros_like(scores_ref)
    )


@functools.lru_cache(maxsize=32)
def build(m, n_pad, B, Q, R, T, b_tile, track_lo, IL=1):
    grid = B // b_tile
    kernel = functools.partial(
        _kernel, m=m, n_pad=n_pad, Q=Q, R=R, T=T, track_lo=track_lo, IL=IL
    )
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((m, PADDED_ALPHABET), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad // T, T * b_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.float32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((m, b_tile), jnp.float32),  # H
            pltpu.VMEM((m, b_tile), jnp.float32),  # E
            pltpu.VMEM((m, b_tile), jnp.float32),  # M
            pltpu.VMEM((m, b_tile), jnp.float32),  # LO
            pltpu.VMEM((m, T * b_tile), jnp.float32),  # S8
        ],
    )

    @jax.jit
    def run(profile, subjects_T):
        # (n, B) -> (n/T, grid, T, b_tile) -> (n/T, B*T): each grid tile's
        # T columns are contiguous so BlockSpec lane-slicing stays aligned.
        n, B_ = subjects_T.shape
        g = B_ // b_tile
        s8 = (
            subjects_T.reshape(n // T, T, g, b_tile)
            .transpose(0, 2, 1, 3)
            .reshape(n // T, B_ * T)
        )
        return call(profile.astype(jnp.float32), s8)

    return run


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    track_lo = len(sys.argv) > 2 and sys.argv[2] == "lo"
    m, B, n = 256, 2048, 512
    rng = np.random.default_rng(0)
    padded = matrices.builtin("BLOSUM62").padded()
    q = rng.integers(0, 20, m).astype(np.uint8)
    profile = jnp.asarray(make_profile(q, padded), jnp.int32)
    subjects_T = jnp.asarray(rng.integers(0, 20, (n, B)), jnp.int32)
    lengths = jnp.full((B,), n, jnp.int32)

    ref, _, _ = interseq.interseq_scores(
        profile, subjects_T, lengths, jnp.int32(11), jnp.int32(1),
        local=True, use_matmul=True, track_range=False, dtype=jnp.int32,
    )
    ref = np.asarray(ref)

    IL = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    run = build(m, n, B, 11, 1, T, 512, track_lo, IL)
    s, hi, lo = run(profile, subjects_T)
    out = np.asarray(s).reshape(B)
    ok = np.array_equal(out.astype(np.int64), ref)
    # Robust slope: min over repeats kills one-off stalls (tunnel noise).
    timings = {1: [], 25: []}
    for _rep in range(5):
        for iters in (1, 25):
            t0 = time.perf_counter()
            for _ in range(iters - 1):
                run(profile, subjects_T)
            np.asarray(run(profile, subjects_T)[0])
            timings[iters].append(time.perf_counter() - t0)
    dt = (min(timings[25]) - min(timings[1])) / 24
    gcups = m * B * n / dt / 1e9
    print(f"v6 T={T} lo={track_lo} IL={IL}: {dt*1e3:6.2f} ms  {gcups:7.1f} GCUPS  exact={'YES' if ok else 'NO'}")


if __name__ == "__main__":
    main()
