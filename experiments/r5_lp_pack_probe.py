"""Packed-int8 select tree vs bf16 tree: on-chip head-to-head (round 5).

VERDICT r4 next-round #1: the K=25 protein select tree is ~55% of a
longpair step (~4-5 ns per select, 24 selects); the packed layout stores
four int8 rows per int32 word — HALF the per-select data volume on ops
that all legalize (int32 where/shift; int8 vector ops do not lower in
Mosaic, but int8 bytes inside int32 words never touch an int8 op) — and
pays one shift-pair sign-extend unpack per step instead of a convert
inside every select.

Slope timing (r3_lp_time.py's method): K dispatch-chained kernel calls
inside ONE jit, difference K=1 vs K=5 — the ~60 ms tunnel dispatch and
~40 ms fence cancel.

Usage: /opt/venv/bin/python experiments/r5_lp_pack_probe.py \
          [--check] [--ch 16,32] [--trees bf16,packed8] [N...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from libssa_tpu.util.jaxcache import enable_compilation_cache

enable_compilation_cache()


def slope(run, N, T, s_full, pq_dev, reps=3):
    def many(k):
        @jax.jit
        def f(s_codes, pq):
            outs = []
            for i in range(k):
                outs.append(run(N, N - i, s_codes, pq))
            return jnp.stack(outs)

        return f

    s_j = jnp.asarray(s_full)
    f1, f5 = many(1), many(5)
    np.asarray(f1(s_j, pq_dev))
    np.asarray(f5(s_j, pq_dev))  # compile both
    t1 = min(
        (lambda t0: (np.asarray(f1(s_j, pq_dev)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(reps)
    )
    t5 = min(
        (lambda t0: (np.asarray(f5(s_j, pq_dev)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(reps)
    )
    return (t5 - t1) / 4


def main():
    print("devices:", jax.devices(), flush=True)
    from libssa_tpu import matrices, oracle
    from libssa_tpu.ops import longpair_pallas as lp

    B62 = matrices.builtin("BLOSUM62")
    rng = np.random.default_rng(7)
    args = sys.argv[1:]

    def opt(name, default):
        if name in args:
            return args[args.index(name) + 1]
        return default

    chs = [int(c) for c in opt("--ch", "16,32").split(",")]
    trees = opt("--trees", "bf16,packed8").split(",")
    # Unroll study (r5): UNROLL_STEPS was tuned under the bf16 tree's
    # vreg pressure; the packed tree frees registers. Must run in a
    # fresh process per value (_build's lru_cache ignores the constant).
    lp_unroll = int(opt("--unroll", "0"))
    if lp_unroll:
        lp.UNROLL_STEPS = lp_unroll
    sizes = [
        int(a)
        for a in args
        if a.isdigit()
    ] or [16384]

    if "--check" in args:
        # On-chip bit-exactness at a small pair (both trees, both modes).
        N = 1500
        q = rng.integers(0, 20, N).astype(np.uint8)
        s = rng.integers(0, 20, N + 200).astype(np.uint8)
        for local in (True, False):
            want = (oracle.sw_score if local else oracle.nw_score)(
                q, s, B62.scores, 10, 1
            )
            for tree in trees:
                got = lp.longpair_score_pallas(
                    q, s, np.asarray(B62.padded()), 11, 1, local=local,
                    tree=tree,
                )
                tag = "OK" if got == want else "MISMATCH"
                print(
                    f"check {'sw' if local else 'nw'} {tree}: "
                    f"{got} vs {want} {tag}",
                    flush=True,
                )
                assert got == want, (tree, local, got, want)

    for N in sizes:
        q = rng.integers(0, 20, N).astype(np.uint8)
        s = rng.integers(0, 20, N).astype(np.uint8)
        # Pin the plane count (--k21/--k25) or derive it from the codes
        # (standard-AA random codes now auto-select the r5 K=21 rung).
        K = (
            21 if "--k21" in args
            else 25 if "--k25" in args
            else lp.alphabet_planes(q, s)
        )
        for CH in chs:
            unit = max(1024, 128 * CH)
            m_pad = max(unit, -(-N // unit) * unit)
            B = m_pad // CH
            T = -(-(N + B) // 512) * 512
            pq = lp.build_planes(q, np.asarray(B62.padded()), m_pad, K, CH)
            s_full = np.full((T,), K - 1, np.int32)
            s_full[:N] = s
            for tree in trees:
                pq_dev = (
                    jnp.asarray(lp.pack_planes(pq))
                    if tree == "packed8"
                    else jnp.asarray(pq.astype(np.float32)).astype(
                        jnp.bfloat16
                    )
                )
                run = lp._build(m_pad, T, 11, 1, True, False, K, CH, tree)
                per = slope(run, N, T, s_full, pq_dev)
                print(
                    f"N={N} K={K} CH={CH} {tree:8s}: {per*1e3:7.2f} ms = "
                    f"{N*N/per/1e9:6.1f} GCUPS, {per/T*1e9:4.0f} ns/step "
                    f"(T={T}, B={B})",
                    flush=True,
                )


if __name__ == "__main__":
    main()
