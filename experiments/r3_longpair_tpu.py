"""Measure longpair_pallas on the real TPU: exactness + GCUPS.

Usage: /opt/venv/bin/python experiments/r3_longpair_tpu.py [sizes...]
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
    from libssa_tpu.ops.longpair_pallas import longpair_score_pallas

    B62 = matrices.builtin("BLOSUM62")
    rng = np.random.default_rng(5)

    # Exactness on a modest pair first (SW + NW).
    m, n = 700, 900
    q = rng.integers(0, 20, m).astype(np.uint8)
    s = rng.integers(0, 20, n).astype(np.uint8)
    for local in (True, False):
        t0 = time.perf_counter()
        got = longpair_score_pallas(q, s, B62.padded(), 11, 1, local=local)
        want = (oracle.sw_score if local else oracle.nw_score)(
            q, s, B62.scores, 10, 1
        )
        mode = "SW" if local else "NW"
        status = "OK" if got == want else f"MISMATCH want {want}"
        print(f"{mode} {m}x{n}: got {got} {status} "
              f"({time.perf_counter()-t0:.1f}s incl compile)", flush=True)

    sizes = [int(a) for a in sys.argv[1:]] or [4096, 16384]
    for N in sizes:
        q = rng.integers(0, 20, N).astype(np.uint8)
        s = rng.integers(0, 20, N).astype(np.uint8)
        t0 = time.perf_counter()
        sc = longpair_score_pallas(q, s, B62.padded(), 11, 1, local=True)
        print(f"SW {N}x{N} compile+run: {time.perf_counter()-t0:.1f}s "
              f"score={sc}", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            longpair_score_pallas(q, s, B62.padded(), 11, 1, local=True)
            ts.append(time.perf_counter() - t0)
        cells = N * N
        print(f"SW {N}x{N} warm: {min(ts):.4f}s = "
              f"{cells/min(ts)/1e9:.2f} GCUPS", flush=True)


if __name__ == "__main__":
    main()
