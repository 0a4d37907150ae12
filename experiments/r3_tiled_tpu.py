"""Measure tiled_pair (chained banded tiles) on the real TPU.

Exactness on a modest tiled grid, then slope-timed rate on big pairs —
including m > 64k (beyond the single-kernel VMEM cap, the reason this
path exists).

Usage: /opt/venv/bin/python experiments/r3_tiled_tpu.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from libssa_tpu.util.jaxcache import enable_compilation_cache

enable_compilation_cache()


def main():
    print("devices:", jax.devices(), flush=True)
    from libssa_tpu import matrices, oracle
    from libssa_tpu.ops.tiled_pair import tiled_pair_score

    B62 = matrices.builtin("BLOSUM62")
    rng = np.random.default_rng(5)

    # Exactness: a 3x3 tile grid at RB=WC=2048 (small enough to oracle).
    m, n = 5000, 6000
    q = rng.integers(0, 20, m).astype(np.uint8)
    s = rng.integers(0, 20, n).astype(np.uint8)
    for local in (True, False):
        t0 = time.perf_counter()
        got = tiled_pair_score(
            q, s, B62.padded(), 11, 1, local=local, RB=2048, WC=2048
        )
        want = (oracle.sw_score if local else oracle.nw_score)(
            q, s, B62.scores, 10, 1
        )
        mode = "SW" if local else "NW"
        status = "OK" if got == want else f"MISMATCH want {want}"
        print(f"{mode} {m}x{n} tiled(2048): got {got} {status} "
              f"({time.perf_counter()-t0:.1f}s incl compile)", flush=True)

    # Rate: big pairs, default 16k tiles. Warm = min of 3 (the ~100 ms
    # tunnel round trip is noise at these sizes).
    for (M, N) in ((32768, 32768), (131072, 16384)):
        q = rng.integers(0, 20, M).astype(np.uint8)
        s = rng.integers(0, 20, N).astype(np.uint8)
        t0 = time.perf_counter()
        sc = tiled_pair_score(q, s, B62.padded(), 11, 1, local=True)
        print(f"SW {M}x{N} tiled compile+run: {time.perf_counter()-t0:.1f}s "
              f"score={sc}", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            tiled_pair_score(q, s, B62.padded(), 11, 1, local=True)
            ts.append(time.perf_counter() - t0)
        cells = M * N
        print(f"SW {M}x{N} tiled warm: {min(ts):.3f}s = "
              f"{cells/min(ts)/1e9:.1f} GCUPS", flush=True)


if __name__ == "__main__":
    main()
