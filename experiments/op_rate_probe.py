"""Microbenchmark: VPU op rates inside a Pallas fori_loop on VMEM state.

Measures roll (sublane vs lane axis), max, add, select at f32 vs bf16 on
(256, 512) tiles -- the shapes the inter-seq kernel uses. Slope timing.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 2048  # inner fori_loop trips


def _kernel(x_ref, o_ref, acc_ref, *, op, reps, dtype):
    acc_ref[:] = x_ref[:].astype(dtype)

    def body(t, _):
        a = acc_ref[:]
        for _ in range(reps):
            if op == "roll0":
                a = pltpu.roll(a, shift=1, axis=0)
            elif op == "roll1":
                a = pltpu.roll(a, shift=1, axis=1)
            elif op == "max":
                a = jnp.maximum(a, a * 0.999)
            elif op == "add":
                a = a + jnp.asarray(0.001, dtype)
            elif op == "scanpass":  # roll + add + max (one F-scan pass)
                a = jnp.maximum(a, pltpu.roll(a, shift=1, axis=0) + jnp.asarray(-1.0, dtype))
            elif op == "select":
                a = jnp.where(a > 0, a, a * 0.5)
        acc_ref[:] = a
        return 0

    jax.lax.fori_loop(0, ITERS, body, 0)
    o_ref[:] = acc_ref[:].astype(jnp.float32)


@functools.lru_cache(maxsize=64)
def build(op, reps, dtype_name, m=256, B=512):
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    call = pl.pallas_call(
        functools.partial(_kernel, op=op, reps=reps, dtype=dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, B), dtype)],
    )
    return jax.jit(call)


def main():
    m, B = 256, 512
    x = jnp.asarray(np.random.rand(m, B).astype(np.float32))
    ops = sys.argv[1:] or ["roll0", "roll1", "max", "add", "scanpass", "select"]
    for op in ops:
        for dt in ("f32", "bf16"):
            try:
                r4 = build(op, 4, dt, m, B)
                r8 = build(op, 8, dt, m, B)
                np.asarray(r4(x)); np.asarray(r8(x))  # compile+warm
                t = {}
                for fn, key in ((r4, 4), (r8, 8)):
                    t0 = time.perf_counter()
                    for _ in range(4):
                        fn(x)
                    np.asarray(fn(x))
                    t[key] = time.perf_counter() - t0
                # per-op time: (t8 - t4) / (4 reps * ITERS * 5 calls)
                per_op = (t[8] - t[4]) / (4 * ITERS * 5)
                rate = m * B / per_op / 1e12
                print(f"{op:9s} {dt:5s}: {per_op*1e9:7.2f} ns/op  {rate:6.2f} T elem/s")
            except Exception as e:
                print(f"{op:9s} {dt:5s}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
