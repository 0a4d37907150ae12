"""Slope-timed per-op costs of the long-pair kernel building blocks.

r3_longpair_probe.py's single-ITERS timing was swamped by the ~28 ms
tunnel round trip; this differences two iteration counts so the trip
cancels: per_op = (t_hi - t_lo) / (ITERS_HI - ITERS_LO), min over reps.

Usage: /opt/venv/bin/python experiments/r3_roll_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libssa_tpu.util.jaxcache import enable_compilation_cache

enable_compilation_cache()

K = 2048  # lanes: (8, 2048) f32 = 16 vregs, the long-pair row shape
LO, HI = 1024, 16384


def mk(body, iters):
    def kernel(x_ref, o_ref):
        def it(_, acc):
            return body(acc)
        o_ref[:] = jax.lax.fori_loop(0, iters, it, x_ref[:])
    return jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, K), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    )


def main():
    print("devices:", jax.devices(), flush=True)
    x = jnp.asarray(np.random.default_rng(0).random((8, K)) * 0.5, jnp.float32)
    probes = {
        "add": lambda a: a + 1e-7,
        "max3": lambda a: jnp.maximum(a, jnp.maximum(a * 0.99, a * 1.01)),
        "roll_lane1+max": lambda a: jnp.maximum(
            a, pltpu.roll(a, shift=1, axis=1) - 1e-6
        ),
        "roll_lane8+max": lambda a: jnp.maximum(
            a, pltpu.roll(a, shift=8, axis=1) - 1e-6
        ),
        "roll_lane512+max": lambda a: jnp.maximum(
            a, pltpu.roll(a, shift=512, axis=1) - 1e-6
        ),
        "roll_sub1+max": lambda a: jnp.maximum(
            a, pltpu.roll(a, shift=1, axis=0) - 1e-6
        ),
        "scanstep_masked": lambda a: jnp.maximum(
            a,
            jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (8, K), 1) >= 4,
                pltpu.roll(a, shift=4, axis=1) - 1e-6,
                -1e6,
            ),
        ),
    }
    for name, body in probes.items():
        try:
            flo, fhi = mk(body, LO), mk(body, HI)
            np.asarray(flo(x)); np.asarray(fhi(x))  # compile both
            best = None
            for _ in range(5):
                t0 = time.perf_counter(); np.asarray(flo(x))
                tlo = time.perf_counter() - t0
                t0 = time.perf_counter(); np.asarray(fhi(x))
                thi = time.perf_counter() - t0
                cur = (thi - tlo) / (HI - LO)
                best = cur if best is None else min(best, cur)
            print(f"probe {name:18s}: {best*1e9:7.1f} ns/op", flush=True)
        except Exception as e:
            print(f"probe {name:18s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
