"""Round-2 probe: which narrow-dtype vector ops legalize in Mosaic, and at
what throughput relative to f32?

Round 1 recorded (docs/PERF_NOTES.md): int16 vector max "does not legalize",
bf16 pltpu.roll fails to compile. VERDICT r1 item 1 demands a re-test with
measurements on the current toolchain before the emulated 8/16-bit rungs can
be called toolchain-blocked. This probe:

  part A (legalize): for each (dtype, op) pair, compile+run a tiny Pallas
    kernel and record COMPILES / RUNS / EXACT or the error class.
  part B (rate): for ops that legalize, time R repetitions of the op inside
    a fori_loop on a fixed-size VMEM block; report elements/sec vs f32.
    If int16 processes ~2x the elements of f32 per unit time, lane-density
    rungs are worth building; if ~1x (unpacked), they are not.

Run on the real chip:  /opt/venv/bin/python experiments/r2_dtype_probe.py
"""
import functools
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(x):
    np.asarray(x)  # real D2H copy is the only true fence through the tunnel


# ---------------------------------------------------------------- part A --

OPS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "maximum": jnp.maximum,
    "where_gt": lambda a, b: jnp.where(a > b, a, b),
    "select_gt": lambda a, b: jax.lax.select(a > b, a, b),
    "roll1": lambda a, b: pltpu.roll(a, shift=1, axis=0) + b,
    "roll2": lambda a, b: pltpu.roll(a, shift=2, axis=0) + b,
    "max_roll": lambda a, b: jnp.maximum(pltpu.roll(a, shift=1, axis=0), b),
    "satadd_u8_style": lambda a, b: jnp.minimum(a + b, jnp.array(120, a.dtype)),
}

SHAPES = {
    "float32": (32, 256),
    "bfloat16": (32, 256),
    "int32": (32, 256),
    "int16": (32, 256),
    "int8": (32, 256),
    "uint8": (32, 256),
}


def probe_op(dtype_name, op_name, interpret=False):
    dtype = jnp.dtype(dtype_name)
    shape = SHAPES[dtype_name]
    op = OPS[op_name]

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = op(a_ref[:], b_ref[:])

    rng = np.random.default_rng(0)
    if dtype_name in ("float32", "bfloat16"):
        a = rng.integers(-50, 50, shape).astype(dtype_name if dtype_name == "float32" else np.float32)
        b = rng.integers(-50, 50, shape).astype(a.dtype)
        a, b = jnp.asarray(a, dtype), jnp.asarray(b, dtype)
    else:
        a = jnp.asarray(rng.integers(0 if dtype_name == "uint8" else -50, 50, shape), dtype)
        b = jnp.asarray(rng.integers(0 if dtype_name == "uint8" else -50, 50, shape), dtype)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            interpret=interpret,
        )(a, b)
        got = np.asarray(out)
        want = np.asarray(
            pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct(shape, dtype), interpret=True
            )(a, b)
        )
        status = "EXACT" if np.array_equal(got, want) else "WRONG"
        return status, ""
    except Exception as e:  # noqa: BLE001 - classifying toolchain failures
        msg = str(e).replace("\n", " ")[:140]
        return "FAIL", msg


# ---------------------------------------------------------------- part B --


@functools.lru_cache(maxsize=64)
def rate_kernel(dtype_name, rows, cols, reps, op_name):
    dtype = jnp.dtype(dtype_name)
    op = OPS[op_name]

    def kernel(a_ref, b_ref, o_ref):
        def body(i, x):
            return op(x, b_ref[:])

        o_ref[:] = jax.lax.fori_loop(0, reps, body, a_ref[:])

    return jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, cols), dtype),
        )
    )


def measure_rate(dtype_name, op_name, rows=256, cols=2048):
    """Elements/sec via slope timing (reps=16 vs 256, min over 5)."""
    dtype = jnp.dtype(dtype_name)
    rng = np.random.default_rng(1)
    if dtype_name in ("float32", "bfloat16"):
        a = jnp.asarray(rng.integers(-3, 3, (rows, cols)).astype(np.float32), dtype)
        b = jnp.asarray(rng.integers(-3, 3, (rows, cols)).astype(np.float32), dtype)
    else:
        a = jnp.asarray(rng.integers(-3, 3, (rows, cols)), dtype)
        b = jnp.asarray(rng.integers(-3, 3, (rows, cols)), dtype)

    def run(reps, iters):
        f = rate_kernel(dtype_name, rows, cols, reps, op_name)
        fence(f(a, b))  # compile + warm
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = f(a, b)
            fence(o)
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = 16, 256
    t_lo, t_hi = run(lo, 8), run(hi, 8)
    dt = (t_hi - t_lo) / 8 / (hi - lo)
    return rows * cols / dt / 1e9  # Gelem/s per op application


def main():
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    print("\n== part A: legalization matrix ==", flush=True)
    results = {}
    for dt in SHAPES:
        for opn in OPS:
            st, msg = probe_op(dt, opn)
            results[(dt, opn)] = st
            flag = "" if st == "EXACT" else f"   <-- {msg}" if msg else ""
            print(f"  {dt:9s} {opn:16s} {st}{flag}", flush=True)

    print("\n== part B: op throughput (Gelem/s per op) ==", flush=True)
    for dt in SHAPES:
        for opn in ("add", "maximum", "max_roll"):
            if results.get((dt, opn)) != "EXACT":
                continue
            try:
                r = measure_rate(dt, opn)
                print(f"  {dt:9s} {opn:16s} {r:8.1f} Gelem/s", flush=True)
            except Exception:
                print(f"  {dt:9s} {opn:16s} rate-FAIL", flush=True)
                traceback.print_exc(limit=1)


if __name__ == "__main__":
    sys.exit(main())
