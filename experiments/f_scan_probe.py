"""Probe harness: F prefix-max variants in the Pallas inter-seq kernel.

Round-1 perf roadmap item 1 (docs/PERF_NOTES.md): the 8-pass Hillis-Steele
prefix max costs ~70% of kernel time. Variants probed here:

  v0  shipped kernel (select-mask scan)            -- baseline
  v1  additive (m,1) masks hoisted out of the loop -- 3 ops/pass
  v2  two-level: 3 confined passes + MXU extract of block maxima +
      small (m/8, B) scan + MXU broadcast + combine
  v3  no-F (INVALID scores, compute ceiling probe)

Run: python experiments/f_scan_probe.py [v0 v1 v2 v3 ...]
Slope timing per PERF_NOTES methodology (async dispatch, one D2H fence).
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from libssa_tpu.constants import PADDED_ALPHABET  # noqa: E402
from libssa_tpu import matrices  # noqa: E402
from libssa_tpu.ops.scoring import make_profile  # noqa: E402
from libssa_tpu.ops import interseq  # noqa: E402

NEG_F32 = float(-(2.0**24))


def _prefix_max_v0(x, m_rows, masks=None, extract=None, bcast=None):
    d = 1
    while d < m_rows:
        rolled = pltpu.roll(x, shift=d, axis=0)
        mask = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) >= d
        x = jnp.maximum(x, jnp.where(mask, rolled, NEG_F32))
        d *= 2
    return x


def _prefix_max_v1(x, m_rows, masks, extract=None, bcast=None):
    """Additive (m,1) masks precomputed once per kernel invocation."""
    d = 1
    i = 0
    while d < m_rows:
        x = jnp.maximum(x, pltpu.roll(x, shift=d, axis=0) + masks[i])
        d *= 2
        i += 1
    return x


def _prefix_max_v2(x, m_rows, masks, extract, bcast):
    """Two-level: confined g=8 scan, MXU extract/bcast of block carries."""
    # Level 1: confined to 8-row blocks (d = 1, 2, 4 with (r%8)>=d masks).
    d = 1
    i = 0
    while d < 8:
        x = jnp.maximum(x, pltpu.roll(x, shift=d, axis=0) + masks[i])
        d *= 2
        i += 1
    # Extract block-end rows (7, 15, ...) via one-hot matmul: (nb, m)@(m, B).
    small = jnp.dot(extract, x, preferred_element_type=jnp.float32)
    # Exclusive scan across nb blocks (small array: nb x B).
    nb = m_rows // 8
    small = jnp.maximum(
        pltpu.roll(small, shift=1, axis=0) + masks[i], NEG_F32
    )  # exclusive shift; masks[i] kills wraparound row 0
    d = 1
    j = i + 1
    while d < nb:
        small = jnp.maximum(small, pltpu.roll(small, shift=d, axis=0) + masks[j])
        d *= 2
        j += 1
    # Broadcast carry back to (m, B) rows via one-hot matmul and combine.
    carry = jnp.dot(bcast, small, preferred_element_type=jnp.float32)
    return jnp.maximum(x, carry)


PREFIX = {"v0": _prefix_max_v0, "v1": _prefix_max_v1, "v2": _prefix_max_v2}


def _kernel(
    profile_ref, subjects_ref, lengths_ref, scores_ref,
    H_ref, E_ref,
    *, m, n_pad, Q, R, variant,
):
    B = subjects_ref.shape[1]
    prof = profile_ref[:]
    lengths = lengths_ref[:].astype(jnp.int32)
    Qf, Rf = jnp.float32(Q), jnp.float32(R)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, B), 0)
    rR = row_ids.astype(jnp.float32) * Rf
    row0_mask = row_ids == 0

    # Hoisted mask columns, (m, 1): additive 0 / NEG.
    rid_col = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    masks = []
    extract = bcast = None
    if variant in ("v1", "small3", "big5", "one1", "one8", "one128") or variant.startswith("p"):
        d = 1
        while d < m:
            masks.append(jnp.where(rid_col >= d, 0.0, NEG_F32).astype(jnp.float32))
            d *= 2
    elif variant in ("v4", "v4s"):
        masks = _make_masks_v4(m, rid_col)
    elif variant == "v2":
        nb = m // 8
        d = 1
        while d < 8:
            masks.append(
                jnp.where(rid_col % 8 >= d, 0.0, NEG_F32).astype(jnp.float32)
            )
            d *= 2
        nb_col = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
        masks.append(jnp.where(nb_col >= 1, 0.0, NEG_F32).astype(jnp.float32))
        d = 1
        while d < nb:
            masks.append(
                jnp.where(nb_col >= d, 0.0, NEG_F32).astype(jnp.float32)
            )
            d *= 2
        # extract: (nb, m) one-hot of row 8b+7; bcast: (m, nb) one-hot.
        bi = jax.lax.broadcasted_iota(jnp.int32, (nb, m), 0)
        ri = jax.lax.broadcasted_iota(jnp.int32, (nb, m), 1)
        extract = (ri == bi * 8 + 7).astype(jnp.float32)
        bcast = jnp.transpose((ri == (bi * 8) // 8 * 0 + 0).astype(jnp.float32))
        ri2 = jax.lax.broadcasted_iota(jnp.int32, (m, nb), 0)
        bi2 = jax.lax.broadcasted_iota(jnp.int32, (m, nb), 1)
        bcast = (ri2 // 8 == bi2).astype(jnp.float32)

    prefix_fn = PREFIX.get(variant)

    H_ref[:] = jnp.zeros((m, B), jnp.float32)
    E_ref[:] = jnp.full((m, B), NEG_F32, jnp.float32)
    scores_ref[:] = jnp.zeros((1, B), jnp.float32)

    def step(t, _):
        H = H_ref[:]
        E = E_ref[:]
        s_t = subjects_ref[pl.ds(t, 1), :].astype(jnp.int32)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (PADDED_ALPHABET, B), 0) == s_t
        ).astype(jnp.float32)
        S = jnp.dot(prof, onehot, preferred_element_type=jnp.float32)

        E_new = jnp.maximum(E - Rf, H - Qf)
        H_diag = jnp.where(row0_mask, 0.0, pltpu.roll(H, shift=1, axis=0))
        Hnof = jnp.maximum(jnp.maximum(H_diag + S, E_new), 0.0)

        if variant == "v3":
            H_new = Hnof  # INVALID: no F at all (ceiling probe)
        else:
            C = prefix_fn(Hnof + rR, m, masks, extract, bcast)
            C_shift = jnp.where(row0_mask, NEG_F32, pltpu.roll(C, shift=1, axis=0))
            F = jnp.maximum(C_shift, -Rf) - Qf - (rR - Rf)
            H_new = jnp.maximum(Hnof, F)

        H_ref[:] = H_new
        E_ref[:] = E_new
        valid = t < lengths
        col_max = jnp.max(H_new, axis=0, keepdims=True)
        scores_ref[:] = jnp.where(
            valid, jnp.maximum(scores_ref[:], col_max), scores_ref[:]
        )
        return 0

    jax.lax.fori_loop(0, n_pad, step, 0)


@functools.lru_cache(maxsize=32)
def build(variant, m, n_pad, B, Q, R, b_tile=512):
    grid = B // b_tile
    kernel = functools.partial(
        _kernel, m=m, n_pad=n_pad, Q=Q, R=R, variant=variant
    )
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((m, PADDED_ALPHABET), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m, b_tile), jnp.float32),
            pltpu.VMEM((m, b_tile), jnp.float32),
        ],
    )

    @jax.jit
    def run(profile, subjects_T, lengths):
        return call(
            profile.astype(jnp.float32), subjects_T, lengths.reshape(1, B)
        )

    return run


def main():
    variants = sys.argv[1:] or ["v0", "v1", "v2", "v3"]
    m, B, n = 256, 2048, 512
    rng = np.random.default_rng(0)
    padded = matrices.builtin("BLOSUM62").padded()
    q = rng.integers(0, 20, m).astype(np.uint8)
    profile = jnp.asarray(make_profile(q, padded), jnp.int32)
    subjects = rng.integers(0, 20, (n, B))
    subjects_T = jnp.asarray(subjects, jnp.int32)
    lengths = jnp.full((B,), n, jnp.int32)

    # Reference scores from the scan kernel (exact).
    ref, _, _ = interseq.interseq_scores(
        profile, subjects_T, lengths, jnp.int32(11), jnp.int32(1),
        local=True, use_matmul=True, track_range=False, dtype=jnp.int32,
    )
    ref = np.asarray(ref)

    for v in variants:
        try:
            run = build(v, m, n, B, 11, 1)
            out = np.asarray(run(profile, subjects_T, lengths)).reshape(B)
            ok = np.array_equal(out.astype(np.int64), ref)
            timings = {1: [], 25: []}
            for _rep in range(5):
                for iters in (1, 25):
                    t0 = time.perf_counter()
                    for _ in range(iters - 1):
                        run(profile, subjects_T, lengths)
                    np.asarray(run(profile, subjects_T, lengths))
                    timings[iters].append(time.perf_counter() - t0)
            dt = (min(timings[25]) - min(timings[1])) / 24
            gcups = m * B * n / dt / 1e9
            print(
                f"{v}: {dt*1e3:7.2f} ms  {gcups:7.1f} GCUPS  "
                f"exact={'YES' if ok else 'NO'}"
            )
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:300]}")



# ---------------------------------------------------------------------------
# v4: two-level F scan via reshape block-max + small scan + repeat broadcast.
# v4s: same but level-1 via serial slice chain on the reshaped array.
# ---------------------------------------------------------------------------


def _prefix_max_v4(x, m_rows, masks, extract=None, bcast=None, serial=False):
    nb = m_rows // 8
    B = x.shape[1]
    x3 = x.reshape(nb, 8, B)
    if serial:
        # Serial within-block prefix: 7 dependent maxes on (nb, 1, B) slices.
        cols = [x3[:, 0:1, :]]
        for i in range(1, 8):
            cols.append(jnp.maximum(cols[-1], x3[:, i : i + 1, :]))
        L = jnp.concatenate(cols, axis=1).reshape(m_rows, B)
    else:
        d = 1
        L = x
        i = 0
        while d < 8:
            L = jnp.maximum(L, pltpu.roll(L, shift=d, axis=0) + masks[i])
            d *= 2
            i += 1
    M = jnp.max(x3, axis=1)  # (nb, B) block max
    # Exclusive block scan: shift down one block, then inclusive scan.
    P = pltpu.roll(M, shift=1, axis=0) + masks[3]  # row 0 -> NEG
    d = 1
    j = 4
    while d < nb:
        P = jnp.maximum(P, pltpu.roll(P, shift=d, axis=0) + masks[j])
        d *= 2
        j += 1
    carry = jnp.repeat(P, 8, axis=0)
    return jnp.maximum(L, carry)


PREFIX["v4"] = _prefix_max_v4
PREFIX["v4s"] = functools.partial(_prefix_max_v4, serial=True)


def _make_masks_v4(m, rid_col):
    nb = m // 8
    masks = []
    d = 1
    while d < 8:
        masks.append(jnp.where(rid_col % 8 >= d, 0.0, NEG_F32).astype(jnp.float32))
        d *= 2
    nb_col = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    masks.append(jnp.where(nb_col >= 1, 0.0, NEG_F32).astype(jnp.float32))
    d = 1
    while d < nb:
        masks.append(jnp.where(nb_col >= d, 0.0, NEG_F32).astype(jnp.float32))
        d *= 2
    return masks


def _prefix_max_pN(x, m_rows, masks, extract=None, bcast=None, passes=8):
    d = 1
    i = 0
    while d < m_rows and i < passes:
        x = jnp.maximum(x, pltpu.roll(x, shift=d, axis=0) + masks[i])
        d *= 2
        i += 1
    return x


for _n in (0, 1, 2, 4, 8):
    PREFIX[f"p{_n}"] = functools.partial(_prefix_max_pN, passes=_n)


def _prefix_max_subset(x, m_rows, masks, extract=None, bcast=None, ds=()):
    # WRONG results; timing probe only: run passes for the given shifts.
    all_d = []
    d = 1
    while d < m_rows:
        all_d.append(d)
        d *= 2
    for i, d in enumerate(all_d):
        if d in ds:
            x = jnp.maximum(x, pltpu.roll(x, shift=d, axis=0) + masks[i])
    return x


PREFIX["small3"] = functools.partial(_prefix_max_subset, ds=(1, 2, 4))
PREFIX["big5"] = functools.partial(_prefix_max_subset, ds=(8, 16, 32, 64, 128))
PREFIX["one1"] = functools.partial(_prefix_max_subset, ds=(1,))
PREFIX["one8"] = functools.partial(_prefix_max_subset, ds=(8,))
PREFIX["one128"] = functools.partial(_prefix_max_subset, ds=(128,))

if __name__ == "__main__":
    main()
