"""Device-rate of the tiled pair runner: K=1 vs K=2 chained in one jit.

Usage: /opt/venv/bin/python experiments/r3_tiled_slope.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from libssa_tpu.util.jaxcache import enable_compilation_cache

enable_compilation_cache()


def main():
    print("devices:", jax.devices(), flush=True)
    from libssa_tpu import matrices
    from libssa_tpu.constants import PADDED_ALPHABET
    from libssa_tpu.ops import tiled_pair as tp

    B62 = matrices.builtin("BLOSUM62")
    rng = np.random.default_rng(5)
    M = N = 32768
    RB = WC = 16384
    from libssa_tpu.ops.ring_block_pallas import tile_shapes

    T, B = tile_shapes(RB, WC, False)
    Rb, Cc = M // RB, N // WC
    PAD = PADDED_ALPHABET - 1
    q = rng.integers(0, 20, M).astype(np.int64)
    qprof = np.asarray(B62.padded())[q]
    pq = np.ascontiguousarray(
        qprof.reshape(Rb, B, 8, PADDED_ALPHABET).transpose(0, 3, 2, 1)
    ).astype(np.float32)
    s = rng.integers(0, 20, (2, Cc, WC)).astype(np.int32)
    s_chunks = np.full((2, Cc, T), PAD, np.int32)
    s_chunks[:, :, :WC] = s

    pq_j = jnp.asarray(pq).astype(jnp.bfloat16)
    s1 = jnp.asarray(s_chunks[0])
    s2 = jnp.asarray(s_chunks[1])
    kw = dict(RB=RB, WC=WC, Q=11, R=1, local=True, interpret=False)

    @jax.jit
    def one(pq, sa):
        return tp._tiled_score(pq, sa, jnp.int32(M), jnp.int32(N), **kw)

    @jax.jit
    def two(pq, sa, sb):
        return tp._tiled_score(pq, sa, jnp.int32(M), jnp.int32(N), **kw) + tp._tiled_score(pq, sb, jnp.int32(M), jnp.int32(N), **kw)

    np.asarray(one(pq_j, s1)); np.asarray(two(pq_j, s1, s2))
    t1 = min(_t(lambda: np.asarray(one(pq_j, s1))) for _ in range(3))
    t2 = min(_t(lambda: np.asarray(two(pq_j, s1, s2))) for _ in range(3))
    per = t2 - t1
    cells = M * N
    print(f"tiled {M}x{N} (RB=WC=16k): K1 {t1*1e3:.0f} ms K2 {t2*1e3:.0f} ms"
          f" -> device {per*1e3:.1f} ms = {cells/per/1e9:.1f} GCUPS",
          flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
