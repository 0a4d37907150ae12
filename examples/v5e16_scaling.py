"""Ready-to-run multi-host scaling benchmark for a real TPU slice (v5e-16).

VERDICT r1 #5 asked for a script that measures the sharded engine's scaling
on real hardware the moment a slice is attached (this dev environment has
exactly one chip behind a tunnel, so only the virtual-mesh program shape
could be validated — benchmarks/scaling.py).

On each host of the slice run:

    python examples/v5e16_scaling.py --coordinator <host0>:8476 \
        --num-hosts 4 --host-id <0..3>

Single-host slices (v5e-4/v5e-8): just `python examples/v5e16_scaling.py`.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host0 address for jax.distributed, e.g. 10.0.0.2:8476")
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-id", type=int, default=0)
    ap.add_argument("--subjects-per-chip", type=int, default=50_000)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id,
        )

    from libssa_tpu import matrices
    from libssa_tpu.constants import SymType
    from libssa_tpu.io.db import SequenceDB
    from libssa_tpu.parallel.sharded import ShardedSearchEngine, make_db_mesh
    from libssa_tpu.search.manager import SearchParams

    D = len(jax.devices())
    print(f"host {args.host_id}: {D} global devices, "
          f"{len(jax.local_devices())} local")

    rng = np.random.default_rng(0)
    n = D * args.subjects_per_chip
    lens = rng.integers(80, 600, n)
    db = SequenceDB.from_sequences(
        [f"s{i}" for i in range(n)],
        [rng.integers(0, 20, int(l)).astype(np.uint8) for l in lens],
        SymType.AMINOACID,
    )
    queries = [
        rng.integers(0, 20, int(rng.integers(150, 400))).astype(np.uint8)
        for _ in range(args.queries)
    ]
    eng = ShardedSearchEngine(
        db, matrices.builtin("BLOSUM62"), 10, 1,
        make_db_mesh(), SearchParams(batch_size=8192),
    )

    t0 = time.perf_counter()
    eng._device_groups()  # pack + upload once (serving warm-up)
    print(f"pack+upload: {time.perf_counter()-t0:.1f}s")

    eng.search_many(queries[:1], args.k)  # compile warm-up
    t0 = time.perf_counter()
    out = eng.search_many(queries, args.k)
    dt = time.perf_counter() - t0
    cells = sum(len(q) for q in queries) * db.total_residues
    print(
        f"devices={D} queries={len(queries)} subjects={n}: {dt:.2f}s  "
        f"{cells/dt/1e9:.1f} GCUPS aggregate  "
        f"{cells/dt/1e9/D:.1f} GCUPS/chip  "
        f"{len(queries)*n/dt:,.0f} (query,subject) pairs/s"
    )
    print("top hit of q0:", out[0][0][:3].tolist(), out[0][1][:3].tolist())


if __name__ == "__main__":
    main()
