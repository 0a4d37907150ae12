"""Round-4 probe: does s64 legalize on the axon TPU, and how do
out-of-range f32->s32 casts behave?

Two facts the TRUE 64-bit device lane (manager._rungs terminal rung /
BitWidth.BIT64; SURVEY.md §2 P4 [DRIVER]) rests on:

1. **s64 legalizes on TPU.** XLA emulates 64-bit integers with 32-bit
   pairs; add / max / compare / select / take / associative_scan — the
   complete op set of ops.interseq.interseq_scores — all compile and
   run. Verified 2026-08-19 on TPU v5e via the axon tunnel (jax 0.9.0 /
   libtpu 0.0.34):

       TPU int64 ok: 1099511627774 int64   (2**40-scale arithmetic)

2. **f32 -> s32 conversion SATURATES** (out-of-range values clamp to
   INT32_MAX / INT32_MIN rather than wrapping). The f32 rung's hi/lo
   range trackers are cast to int32 at the kernel exit; saturation
   means a score range beyond int32 still satisfies ``hi >= limit`` /
   ``lo <= -limit``, so the ladder's escape flags fire reliably and the
   int64 terminal rung rescores — this is what makes beyond-int32
   scores safe end-to-end (tests/test_int64_lane.py). Verified on CPU
   XLA and TPU:

       cast [2**32, -2**32, 2**31, 3e9] -> [2147483647, -2147483648,
                                            2147483647, 2147483647]

Re-run this probe on any jax/libtpu version bump (same ritual as
experiments/r2_dtype_probe.py).

Usage: /opt/venv/bin/python experiments/r4_int64_probe.py
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices())
    print("jax", jax.__version__)

    with jax.enable_x64(True):

        @jax.jit
        def f(a, b):
            h = a + b
            s = jax.lax.associative_scan(jnp.maximum, h, axis=0)
            t = jnp.take(a, jnp.asarray([0, 2, 1], jnp.int32))
            w = jnp.where(s > 0, s - jnp.int64(3), t)
            return jnp.max(w)

        a = jnp.asarray([2**40, -5, 7], jnp.int64)
        b = jnp.asarray([1, 2, 3], jnp.int64)
        out = np.asarray(f(a, b))
        assert out == 2**40 + 1 - 3, out
        print("s64 legalizes:", out, out.dtype)

    x = jnp.asarray([2.0**32, -(2.0**32), 2.0**31, 3e9], jnp.float32)
    cast = np.asarray(x.astype(jnp.int32))
    print("f32->s32 out-of-range cast:", cast)
    imax, imin = 2**31 - 1, -(2**31)
    assert list(cast) == [imax, imin, imax, imax], "cast does not saturate!"
    print("saturating: ladder escape flags stay reliable beyond int32")


if __name__ == "__main__":
    main()
