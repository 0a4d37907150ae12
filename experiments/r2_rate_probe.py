"""Round-2 probe B2: REAL op-throughput ratios bf16/int16 vs f32.

The r2_dtype_probe part-B slopes were noise (sub-ms compute vs ~50 ms tunnel
costs). Here each measurement runs thousands of op applications inside one
kernel so the slope is dominated by compute:

    time(reps=4096) - time(reps=512)  over  8 dispatches, min of 5.

The question that decides the narrow-precision design: is a bf16 elementwise
op ~2x the element rate of f32 (packed sublanes), or ~1x (widened in
registers)? Same for int16 add (the only int16 op that legalizes).

Run: /opt/venv/bin/python experiments/r2_rate_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def fence(x):
    np.asarray(x)


@functools.lru_cache(maxsize=64)
def chain_kernel(dtype_name, rows, cols, reps, op_name):
    dtype = jnp.dtype(dtype_name)

    def kernel(a_ref, b_ref, o_ref):
        b = b_ref[:]

        def body(i, x):
            if op_name == "add":
                return x + b
            if op_name == "maximum":
                return jnp.maximum(x, b)
            if op_name == "max_add":  # the DP inner-loop flavor
                return jnp.maximum(x + b, b)
            raise ValueError(op_name)

        o_ref[:] = jax.lax.fori_loop(0, reps, body, a_ref[:])

    return jax.jit(
        pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((rows, cols), dtype))
    )


def measure(dtype_name, op_name, rows, cols):
    rng = np.random.default_rng(1)
    if dtype_name in ("float32", "bfloat16"):
        # b=0 keeps chained adds exact and un-overflowed in every dtype
        a = jnp.asarray(rng.integers(-3, 4, (rows, cols)).astype(np.float32), dtype_name)
        b = jnp.zeros((rows, cols), dtype_name)
    else:
        a = jnp.asarray(rng.integers(-3, 4, (rows, cols)), dtype_name)
        b = jnp.zeros((rows, cols), dtype_name)

    def run(reps, iters=8):
        f = chain_kernel(dtype_name, rows, cols, reps, op_name)
        fence(f(a, b))
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = f(a, b)
            fence(o)
            best = min(best, time.perf_counter() - t0)
        return best / iters

    lo, hi = 512, 4096
    t_lo, t_hi = run(lo), run(hi)
    per_op = (t_hi - t_lo) / (hi - lo)
    return rows * cols / per_op / 1e9, per_op * 1e9  # Gelem/s, ns/op


def main():
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    # Same BYTE footprint per array (1 MB) so VMEM pressure matches:
    # f32 (256,1024), bf16 (512,1024) holds 2x elements.
    cases = [
        ("float32", "add", 256, 1024),
        ("float32", "maximum", 256, 1024),
        ("float32", "max_add", 256, 1024),
        ("bfloat16", "add", 512, 1024),
        ("bfloat16", "maximum", 512, 1024),
        ("bfloat16", "max_add", 512, 1024),
        # same ELEMENT count as f32 for a direct per-element comparison
        ("bfloat16", "maximum", 256, 1024),
        ("int32", "add", 256, 1024),
        ("int32", "maximum", 256, 1024),
        ("int16", "add", 512, 1024),
        ("int16", "add", 256, 1024),
    ]
    for dt, opn, r, c in cases:
        try:
            rate, ns = measure(dt, opn, r, c)
            print(f"  {dt:9s} {opn:8s} ({r:4d},{c}) {rate:9.1f} Gelem/s   {ns:8.0f} ns/op", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {dt:9s} {opn:8s} ({r:4d},{c}) FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
