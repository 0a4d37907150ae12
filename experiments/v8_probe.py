"""v8: chunked-sequential F. Within-chunk confined lazy-F scan (log2 CH
passes on (CH, B) slices) + exact sequential (1, B) carry between chunks.

Carry math (global row r = k*CH + j, X seeded with the carry):
  X[0] = max(Hnof[0], carry + Q - R); X[j] = Hnof[j]
  D[j] = max_{j'<=j}(X[j'] - (j-j')R)        (confined scan)
  F[j] = D[j-1] - Q  (j>=1);  F[0] = carry
  carry_next = D[CH-1] - Q - (CH-1... folded: see derivation) = D[CH-1] - Q
    evaluated one row further: F at next chunk row0 = max-decay continuation
    = D[CH-1] - Q - 0*R with one more row of distance folded by the seed.
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
    profile_ref, subjects_ref, lengths_ref,
    scores_ref, hi_ref, lo_ref,
    H_ref, E_ref, M_ref,
    *, m, n_pad, Q, R, CH,
):
    B = subjects_ref.shape[1]
    NCH = m // CH
    prof = profile_ref[:]
    Qf, Rf = jnp.float32(Q), jnp.float32(R)
    rid = jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)
    masks = []
    d = 1
    while d < CH:
        masks.append(jnp.where(rid >= d, -d * Rf, NEG).astype(jnp.float32))
        d *= 2
    fmask = jnp.where(rid >= 1, -Qf, NEG).astype(jnp.float32)
    row0c = jax.lax.broadcasted_iota(jnp.int32, (CH, B), 0) == 0
    row0f = jax.lax.broadcasted_iota(jnp.int32, (m, B), 0) == 0

    H_ref[:] = jnp.zeros((m, B), jnp.float32)
    E_ref[:] = jnp.full((m, B), NEG, jnp.float32)
    M_ref[:] = jnp.zeros((m, B), jnp.float32)

    def step(t, _):
        s_t = subjects_ref[pl.ds(t, 1), :].astype(jnp.int32)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (PADDED_ALPHABET, B), 0) == s_t
        ).astype(jnp.float32)
        S = jnp.dot(prof, onehot, preferred_element_type=jnp.float32)
        Hd = jnp.where(row0f, 0.0, pltpu.roll(H_ref[:], shift=1, axis=0))

        carry = jnp.full((1, B), NEG, jnp.float32)  # F entering row 0
        for k in range(NCH):
            sl = slice(k * CH, (k + 1) * CH)
            Hp = H_ref[sl, :]
            Ep = E_ref[sl, :]
            E_new = jnp.maximum(Ep - Rf, Hp - Qf)
            Hnof = jnp.maximum(jnp.maximum(Hd[sl, :] + S[sl, :], E_new), 0.0)
            # Seed the carry into the scan at chunk row 0.
            X = jnp.where(row0c, jnp.maximum(Hnof, carry + (Qf - Rf)), Hnof)
            D = X
            for i, mk in enumerate(masks):
                D = jnp.maximum(D, pltpu.roll(D, shift=1 << i, axis=0) + mk)
            F = pltpu.roll(D, shift=1, axis=0) + fmask
            F = jnp.where(row0c, carry, F)
            H_new = jnp.maximum(Hnof, F)
            H_ref[sl, :] = H_new
            E_ref[sl, :] = E_new
            M_ref[sl, :] = jnp.maximum(M_ref[sl, :], H_new)
            carry = D[CH - 1: CH, :] - Qf
        return 0

    jax.lax.fori_loop(0, n_pad, step, 0)
    scores_ref[:] = jnp.max(M_ref[:], axis=0, keepdims=True)
    hi_ref[:] = scores_ref[:]
    lo_ref[:] = jnp.zeros_like(scores_ref)


@functools.lru_cache(maxsize=32)
def build(m, n_pad, B, Q, R, CH, b_tile):
    grid = B // b_tile
    kernel = functools.partial(_kernel, m=m, n_pad=n_pad, Q=Q, R=R, CH=CH)
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((m, PADDED_ALPHABET), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((m, b_tile), jnp.float32)] * 3,
    )

    @jax.jit
    def run(profile, subjects_T, lengths):
        return call(
            profile.astype(jnp.float32), subjects_T,
            lengths.reshape(1, B).astype(jnp.int32),
        )

    return run


def main():
    CH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    BT = int(sys.argv[2]) if len(sys.argv) > 2 else 512
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
    run = build(m, n, B, 11, 1, CH, BT)
    out = np.asarray(run(profile, subjects_T, lengths)[0]).reshape(B)
    ok = np.array_equal(out.astype(np.int64), ref)
    timings = {1: [], 25: []}
    for _rep in range(5):
        for iters in (1, 25):
            t0 = time.perf_counter()
            for _ in range(iters - 1):
                run(profile, subjects_T, lengths)
            np.asarray(run(profile, subjects_T, lengths)[0])
            timings[iters].append(time.perf_counter() - t0)
    dt = (min(timings[25]) - min(timings[1])) / 24
    gcups = m * B * n / dt / 1e9
    print(f"v8 CH={CH} BT={BT}: {dt*1e3:6.2f} ms  {gcups:7.1f} GCUPS  exact={'YES' if ok else 'NO'}")


if __name__ == "__main__":
    main()
