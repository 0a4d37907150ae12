"""Isolate the Pallas fori_loop per-iteration overhead by carry shape.

r3_banded_bisect's BARE variant costs ~1.6 us/iteration while the
r3_roll_probe single-(8,K)-carry loop costs ~0. Which carry/body element
triggers the per-iteration penalty?

Usage: /opt/venv/bin/python experiments/r3_carry_probe.py
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

K = 2048
T = 16384


def build(variant):
    def kernel(x_ref, o_ref):
        def one_chain(h, n_ops):
            for _ in range(n_ops):
                h = jnp.maximum(h, h * 0.5 - 1.0)
            return h

        if variant == "single":
            def step(t, h):
                return one_chain(h, 12)
            o_ref[:] = jax.lax.fori_loop(0, T, step, x_ref[:])
            return
        if variant == "tuple3":
            def step(t, c):
                a, b, d = c
                return (one_chain(a, 4), one_chain(b, 4), one_chain(d, 4))
            a, b, d = jax.lax.fori_loop(
                0, T, step, (x_ref[:], x_ref[:] + 1.0, x_ref[:] + 2.0)
            )
            o_ref[:] = a + b + d
            return
        if variant == "with1b":
            def step(t, c):
                a, v = c
                a = one_chain(a, 10)
                v = jnp.maximum(v, a[0:1, :])
                return (a, v)
            a, v = jax.lax.fori_loop(
                0, T, step, (x_ref[:], x_ref[0:1, :])
            )
            o_ref[:] = a + v
            return
        if variant == "slice78":
            def step(t, c):
                a, v = c
                a = one_chain(a, 10)
                v = jnp.maximum(v, a[7:8, :])
                return (a, v)
            a, v = jax.lax.fori_loop(
                0, T, step, (x_ref[:], x_ref[0:1, :])
            )
            o_ref[:] = a + v
            return
        if variant == "subroll":
            def step(t, h):
                for d in (1, 2, 4):
                    h = jnp.maximum(h, pltpu.roll(h, shift=d, axis=0) - 1.0)
                return one_chain(h, 6)
            o_ref[:] = jax.lax.fori_loop(0, T, step, x_ref[:])
            return
        if variant == "laneroll1b":
            def step(t, c):
                a, v = c
                a = one_chain(a, 8)
                v = jnp.maximum(pltpu.roll(v, shift=1, axis=1), a[7:8, :])
                return (a, v)
            a, v = jax.lax.fori_loop(
                0, T, step, (x_ref[:], x_ref[0:1, :])
            )
            o_ref[:] = a + v
            return
        if variant == "iota_t":
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
            def step(t, h):
                warm = (t - lane1) < 0
                h = jnp.where(warm, 0.0, one_chain(h, 10))
                return h
            o_ref[:] = jax.lax.fori_loop(0, T, step, x_ref[:])
            return
        if variant == "smemread":
            def step(t, h):
                return one_chain(h, 10) + 0.0
            o_ref[:] = jax.lax.fori_loop(0, T, step, x_ref[:])
            return

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, K), jnp.float32),
    )
    return jax.jit(lambda x: jnp.max(call(x)))


def main():
    print("devices:", jax.devices(), flush=True)
    x = jnp.asarray(
        np.random.default_rng(0).random((8, K)).astype(np.float32) - 2.0
    )
    for variant in (
        "single", "tuple3", "with1b", "slice78", "subroll",
        "laneroll1b", "iota_t",
    ):
        f = build(variant)
        t0 = time.perf_counter()
        float(f(x))
        ct = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        print(f"{variant:10s}: {min(ts)*1e3:7.1f} ms = "
              f"{min(ts)/T*1e9:7.0f} ns/iter  compile {ct:.1f}s", flush=True)


if __name__ == "__main__":
    main()
