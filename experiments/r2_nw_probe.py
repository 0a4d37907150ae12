"""Measure the NW kernel rate after the traced-m_real rewrite.

Round 1 recorded (PERF_NOTES): NW untracked 231.6 GCUPS, tracked 190.2 at
m=256 B=8192 n=512. The r2 kernel replaced the static capture chunk with
``pl.when(kc == k)`` per chunk per column — this probe quantifies that
cost on hardware, plus SW for reference.

Run: /opt/venv/bin/python experiments/r2_nw_probe.py
"""
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from libssa_tpu import matrices
from libssa_tpu.ops.interseq_pallas import interseq_scores_pallas
from libssa_tpu.ops.scoring import make_profile


def slope(fn, iters=25, reps=5):
    np.asarray(fn())
    np.asarray(fn())
    t1, tn = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            fn()
        np.asarray(fn())
        tn.append(time.perf_counter() - t0)
    return (min(tn) - min(t1)) / (iters - 1)


def main():
    m, B, n = 256, 8192, 512
    rng = np.random.default_rng(0)
    prof = jnp.asarray(
        make_profile(rng.integers(0, 20, m).astype(np.uint8),
                     matrices.builtin("BLOSUM62").padded()),
        jnp.int32,
    )
    subs = jnp.asarray(rng.integers(0, 20, (n, B)), jnp.int8)
    lens = jnp.full((B,), n, jnp.int32)
    cells = m * B * n
    for label, local, track, mr in (
        ("SW  untracked", True, False, None),
        ("NW  untracked", False, False, 256),
        ("NW  tracked  ", False, True, 256),
        ("NW  mr=200   ", False, False, 200),
    ):
        def f(local=local, track=track, mr=mr):
            return interseq_scores_pallas(
                prof, subs, lens, 12, 1, local=local,
                track_range=track, m_real=mr,
            )[0]
        dt = slope(f)
        print(f"  {label}: {dt*1e3:7.3f} ms  {cells/dt/1e9:6.1f} GCUPS", flush=True)


if __name__ == "__main__":
    main()
