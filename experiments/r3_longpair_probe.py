"""Round-3 probes for the long-pair kernel design (real TPU).

1. XLA lax.scan row-sweep GCUPS on a 16k x 16k pair (is Pallas even
   needed to clear the >= 50 GCUPS bar?).
2. pltpu.roll cost on the LANE axis of (8, K) f32 — the doubling-scan
   building block of the planned Pallas kernel (sublane rolls are known
   cheap from r2; lane rolls unmeasured).

Usage: /opt/venv/bin/python experiments/r3_longpair_probe.py
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

    # --- probe 2 first (small, fast compiles): lane rolls ---------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 2048
    ITERS = 512

    def mk(body):
        def kernel(x_ref, o_ref):
            def it(_, acc):
                return body(acc)
            o_ref[:] = jax.lax.fori_loop(0, ITERS, it, x_ref[:])
        return jax.jit(
            lambda x: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, K), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
        )

    x = jnp.asarray(np.random.default_rng(0).random((8, K)), jnp.float32)
    probes = {
        "add": lambda a: a + 1.0,
        "max": lambda a: jnp.maximum(a, 0.5),
        "roll_lane1": lambda a: pltpu.roll(a, shift=1, axis=1) + 1.0,
        "roll_lane128": lambda a: pltpu.roll(a, shift=128, axis=1) + 1.0,
        "roll_lane512": lambda a: pltpu.roll(a, shift=512, axis=1) + 1.0,
        "roll_sub1": lambda a: pltpu.roll(a, shift=1, axis=0) + 1.0,
        "scan_step": lambda a: jnp.maximum(
            a, pltpu.roll(a, shift=4, axis=1) - 4.0
        ),
    }
    for name, body in probes.items():
        try:
            f = mk(body)
            np.asarray(f(x))  # compile
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(f(x))
                ts.append(time.perf_counter() - t0)
            per_op = min(ts) / ITERS
            print(f"probe {name:14s}: {per_op*1e9:8.1f} ns/op "
                  f"({min(ts)*1e3:.2f} ms / {ITERS})", flush=True)
        except Exception as e:
            print(f"probe {name:14s}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # --- probe 1: XLA scan row-sweep on 16k x 16k -----------------------
    from libssa_tpu import matrices
    from libssa_tpu.ops import longpair as lp

    B62 = matrices.builtin("BLOSUM62")
    rng = np.random.default_rng(1)
    m = n = 16384
    q = rng.integers(0, 20, m).astype(np.uint8)
    s = rng.integers(0, 20, n).astype(np.uint8)
    P = lp.subject_profile(s, B62.padded())
    qi = q.astype(np.int32)
    Pj = jnp.asarray(P, jnp.int32)
    qj = jnp.asarray(qi)
    t0 = time.perf_counter()
    out = int(lp.longpair_score_scan(Pj, qj, 11, 1, m, n, local=True))
    print(f"scan 16k compile+run: {time.perf_counter()-t0:.1f}s score={out}",
          flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(lp.longpair_score_scan(Pj, qj, 11, 1, m, n, local=True))
        ts.append(time.perf_counter() - t0)
    cells = m * n
    print(f"scan 16k warm: {min(ts):.3f}s = {cells/min(ts)/1e9:.2f} GCUPS",
          flush=True)


if __name__ == "__main__":
    main()
