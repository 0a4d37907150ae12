"""Benchmark: SW affine-gap BLOSUM62 database search GCUPS on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers in-repo (BASELINE.md — the
mount was empty and BASELINE.json has published:{}), so ``vs_baseline``
normalizes against the ~100 GCUPS-class throughput of the reference's
algorithm family on contemporary multi-core x86 (SWIPE lineage literature,
PAPERS.md) — the best available stand-in for "the reference's headline
number" until a real measurement exists.
"""
import json
import time

import numpy as np

BASELINE_GCUPS = 100.0  # SWIPE-class multi-core x86, see PAPERS.md


def main():
    import jax
    import jax.numpy as jnp

    from libssa_tpu import matrices
    from libssa_tpu.io.db import PAD_CODE
    from libssa_tpu.ops.scoring import make_profile
    from libssa_tpu.search import kernels

    rng = np.random.default_rng(0)
    padded = matrices.builtin("BLOSUM62").padded()

    # Realistic protein search shapes: 256-residue query, 512-residue
    # subjects, large batch. All lanes full-length (pad waste is a DB/batch
    # property, not a kernel property; the manager's length-sorting keeps
    # real sweeps close to this).
    m, B, n = 256, 8192, 512
    q = rng.integers(0, 20, m).astype(np.uint8)
    profile = jnp.asarray(make_profile(q, padded), jnp.int32)
    # int8 subject codes, as the manager's chunk streaming sends them.
    subjects_T = jnp.asarray(rng.integers(0, 20, (n, B)), jnp.int8)
    lengths = jnp.full((B,), n, jnp.int32)
    gq, gr = jnp.int32(11), jnp.int32(1)

    fn = kernels.best_kernel()

    def run(sync=True):
        s, hi, lo = fn(
            profile, subjects_T, lengths, gq, gr,
            local=True, use_matmul=True, track_range=True, dtype=jnp.float32,
        )
        # NOTE: sync via device-to-host copy. Under the axon tunnel,
        # block_until_ready() returns before compute finishes (verified:
        # timings shrank with iteration count); np.asarray is a true fence.
        return np.asarray(s) if sync else s

    run()  # compile + warm
    run()
    # Slope timing: a D2H fence costs ~40 ms flat through the tunnel, so
    # measure N dispatches + one fence for two N and take the difference —
    # that's the steady-state per-call kernel time a chunked sweep sees
    # (the manager also syncs once per stage, not per chunk). The recorded
    # value is the MEDIAN of 5 independent slope estimates (VERDICT r3
    # weak #1: a single min-based estimate wobbled ~10% run to run through
    # the tunnel); the shared min-t1 base is the fence cost, which one-off
    # stalls only inflate, so min is right for the base while median
    # rejects stalls in the long legs.
    timings = {1: [], 25: []}
    for _rep in range(5):
        for iters in (1, 25):
            t0 = time.perf_counter()
            for _ in range(iters - 1):
                run(sync=False)
            run()
            timings[iters].append(time.perf_counter() - t0)
    base = min(timings[1])
    slopes = sorted((t - base) / 24 for t in timings[25])
    dt = slopes[len(slopes) // 2]

    gcups = m * B * n / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "GCUPS/chip (SW affine, BLOSUM62)",
                "value": round(gcups, 2),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
            }
        ),
        flush=True,
    )

    # Second line: flagship END-TO-END rate (100 queries x 500k subjects
    # through the full search stack — packing, device-resident DB, fused
    # multi-query sweep, device top-k). Tracks e2e health next to the
    # kernel number (VERDICT r3 next-round #3). Guarded so a failure here
    # never loses the kernel line above.
    try:
        e2e_flagship()
    except Exception as e:  # pragma: no cover - defensive for the driver
        print(
            json.dumps(
                {
                    "metric": "flagship e2e (100q x 500k subjects)",
                    "value": 0,
                    "unit": "q*subj/s",
                    "vs_baseline": 0,
                    "error": f"{type(e).__name__}: {e}",
                }
            ),
            flush=True,
        )


def e2e_flagship(n_queries=100, n_seqs=500_000):
    """100 x 500k SW search end-to-end; prints one JSON line."""
    from libssa_tpu import matrices
    from libssa_tpu.constants import SymType
    from libssa_tpu.io.db import SequenceDB
    from libssa_tpu.search.manager import SearchEngine, SearchStats

    rng = np.random.default_rng(99)
    lengths = np.clip(
        rng.lognormal(mean=5.7, sigma=0.55, size=n_seqs).astype(int), 50, 2000
    )
    seqs = [rng.integers(0, 20, L).astype(np.uint8) for L in lengths]
    db = SequenceDB.from_sequences(
        [f"synth{i}" for i in range(n_seqs)], seqs, SymType.AMINOACID
    )
    eng = SearchEngine(db, matrices.builtin("BLOSUM62"), 11, 1)
    qrng = np.random.default_rng(7)
    queries = [qrng.integers(0, 20, 256).astype(np.uint8) for _ in range(n_queries)]
    eng.search_many(queries, 10, local=True)  # pack + upload + compile
    stats = SearchStats()
    eng.search_many(queries, 10, local=True, stats=stats)
    rate = stats.subjects / stats.seconds
    print(
        json.dumps(
            {
                "metric": "flagship e2e (100q x 500k subjects)",
                "value": round(rate, 0),
                "unit": "q*subj/s",
                "vs_baseline": round(stats.gcups / BASELINE_GCUPS, 3),
                "gcups_e2e": round(stats.gcups, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
