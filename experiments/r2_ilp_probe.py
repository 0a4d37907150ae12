"""Round-2 probe B3: THROUGHPUT (not latency) of bf16 vs f32 ops.

r2_rate_probe chained one accumulator, so each op waited on the previous —
that measures dependent latency. Here 4 independent accumulators per
iteration give the scheduler ILP; if bf16 add was only latency-bound
(unpack-add-repack pipeline), its 4-stream rate will approach 2x f32.
Also measures the DP-core op mix (2 sub + 1 add + 4 max per element) both
ways — the actual decision number for a bf16 kernel rung.

Run: /opt/venv/bin/python experiments/r2_ilp_probe.py
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
def streams_kernel(dtype_name, rows, cols, reps, op_name):
    dtype = jnp.dtype(dtype_name)

    def kernel(a_ref, b_ref, o_ref):
        b = b_ref[:]

        def op(x):
            if op_name == "add":
                return x + b
            if op_name == "maximum":
                return jnp.maximum(x, b)
            if op_name == "dpmix":
                # per "element step": E = max(E - 1, x - 3); x = max(x + 0, E)
                # (2 sub, 1 add, 2 max — affine-gap flavored, safe values)
                E = jnp.maximum(x - jnp.array(1, dtype), x - jnp.array(3, dtype))
                return jnp.maximum(x + b, E)
            raise ValueError(op_name)

        a = a_ref[:]
        x1, x2, x3, x4 = a, a + b, a, a + b

        def body(i, xs):
            x1, x2, x3, x4 = xs
            return op(x1), op(x2), op(x3), op(x4)

        x1, x2, x3, x4 = jax.lax.fori_loop(0, reps, body, (x1, x2, x3, x4))
        o_ref[:] = jnp.maximum(jnp.maximum(x1, x2), jnp.maximum(x3, x4))

    return jax.jit(
        pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((rows, cols), dtype))
    )


def measure(dtype_name, op_name, rows, cols):
    a = jnp.zeros((rows, cols), dtype_name)
    b = jnp.zeros((rows, cols), dtype_name)

    def run(reps, iters=8):
        f = streams_kernel(dtype_name, rows, cols, reps, op_name)
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

    lo, hi = 128, 1024
    t_lo, t_hi = run(lo), run(hi)
    per_iter = (t_hi - t_lo) / (hi - lo)  # 4 op applications (streams)
    n_ops = 4 * (5 if op_name == "dpmix" else 1)
    return rows * cols * n_ops / per_iter / 1e9  # Gelem-ops/s


def main():
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    cases = [
        ("float32", "add", 256, 1024),
        ("bfloat16", "add", 512, 1024),
        ("float32", "maximum", 256, 1024),
        ("bfloat16", "maximum", 512, 1024),
        ("float32", "dpmix", 256, 1024),
        ("bfloat16", "dpmix", 512, 1024),
    ]
    for dt, opn, r, c in cases:
        try:
            rate = measure(dt, opn, r, c)
            print(f"  {dt:9s} {opn:8s} ({r},{c})  {rate:9.1f} Gelem-ops/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {dt:9s} {opn:8s} FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
