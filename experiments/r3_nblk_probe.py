"""Round-3 probe: interseq kernel rate vs column-block size (n_blk).

The refined 64/128-multiple bucket ladder (io/db._LADDER) only pays off
if the kernel can RUN a 320- or 448-column bucket without rounding it
back up to a 256-column-block multiple — which is exactly what _build
did until the round-3 fix (n_blk = min(n_pad, 256) then ceil-round).
The fix derives n_blk from the bucket's largest power-of-two divisor
(>=32, <=256). This probe answers: does a smaller column block cost
kernel rate (more grid steps, shorter fori_loop per step), or is the
double-buffered DMA pipeline indifferent?

Method: slope timing (the ~100 ms tunnel dispatch hides ms-scale
kernels): for each n_blk in {32, 64, 128, 256}, time the SAME (m, B)
sweep at n_pad=2048 and n_pad=8192 (both divisible by every candidate),
rate = extra cells / (t_hi - t_lo), min over 5 trials of 8 dispatches.

Run: /opt/venv/bin/python experiments/r3_nblk_probe.py
"""
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from libssa_tpu.ops import interseq_pallas as ip


def fence(x):
    np.asarray(x[0])


def measure(n_blk, m=512, B=2048, local=True):
    rng = np.random.default_rng(7)
    profile = jnp.asarray(
        rng.integers(-4, 12, (m, 32)).astype(np.int32)
    )
    times = {}
    for n_pad in (2048, 8192):
        subjects = jnp.asarray(
            rng.integers(0, 20, (n_pad, B)).astype(np.int8)
        )
        lengths = jnp.full((B,), n_pad, jnp.int32)
        run = ip._build(
            m, n_pad, B, 4, 2, local, False, 2048, False, 32, n_blk=n_blk
        )
        fence(run(m, profile, subjects, lengths))  # compile + warm
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            o = None
            for _ in range(8):
                o = run(m, profile, subjects, lengths)
            fence(o)
            best = min(best, (time.perf_counter() - t0) / 8)
        times[n_pad] = best
    cells = m * (8192 - 2048) * B
    dt = times[8192] - times[2048]
    return cells / dt / 1e9, times


def main():
    print(f"jax {__import__('jax').__version__}")
    for n_blk in (256, 128, 64, 32):
        gcups, times = measure(n_blk)
        print(
            f"n_blk={n_blk:4d}  slope-rate {gcups:7.1f} GCUPS"
            f"  (t2048={times[2048]*1e3:.2f} ms, t8192={times[8192]*1e3:.2f} ms)"
        )


if __name__ == "__main__":
    main()
