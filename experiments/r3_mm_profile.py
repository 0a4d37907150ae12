"""Attribute the 30k x 30k NW Myers-Miller traceback wall time.

Wraps mm_device.mm_pass_rows / mm_pass_rows_pair / hirschberg._mm_pass
with counters (calls, wall seconds, cells) to see whether the 9.89 s
warm NW number is dispatch round trips, host prep, or the NumPy tail.

Usage: python experiments/r3_mm_profile.py [--m 30000] [--mode nw]
"""
import argparse
import time

import numpy as np

from libssa_tpu import matrices
from libssa_tpu.search import hirschberg
from libssa_tpu.ops import mm_device


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=30000)
    ap.add_argument("--n", type=int, default=30000)
    ap.add_argument("--mode", default="nw", choices=["nw", "sw"])
    ap.add_argument("--alpha", type=int, default=20)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--leaf", type=int, default=0,
                    help="override hirschberg.LEAF_CELLS")
    args = ap.parse_args()
    if args.leaf:
        hirschberg.LEAF_CELLS = args.leaf

    rng = np.random.default_rng(0)
    q = rng.integers(0, args.alpha, args.m).astype(np.uint8)
    s = rng.integers(0, args.alpha, args.n).astype(np.uint8)
    sub = matrices.builtin("BLOSUM62").scores

    stats = {}

    def wrap(obj, name, cells_fn):
        fn = getattr(obj, name)
        stats[name] = [0, 0.0, 0]

        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            dt = time.perf_counter() - t0
            st = stats[name]
            st[0] += 1
            st[1] += dt
            st[2] += cells_fn(a, out)
            return out

        setattr(obj, name, wrapped)

    wrap(mm_device, "mm_pass_rows", lambda a, o: len(a[0]) * len(a[1]))
    wrap(
        mm_device,
        "mm_pass_rows_batch",
        lambda a, o: sum(len(q) * len(s) for q, s, _ in a[0]),
    )
    wrap(
        mm_device,
        "mm_pass_rows_pair",
        lambda a, o: (len(a[0]) * len(a[1]) + len(a[3]) * len(a[4]))
        if o is not None
        else 0,
    )
    wrap(mm_device, "sw_end_cell", lambda a, o: len(a[0]) * len(a[1]))
    wrap(hirschberg, "_mm_pass", lambda a, o: len(a[0]) * len(a[1]))
    wrap(
        hirschberg,
        "_score_end_sw",
        lambda a, o: len(a[0]) * len(a[1]),
    )
    # _mm_pass_any / _nw_ops resolve module-level names at call time, so
    # the monkey-patch reaches the recursion.

    for r in range(args.runs):
        for k in stats:
            stats[k] = [0, 0.0, 0]
        t0 = time.perf_counter()
        tb = hirschberg.align_pair_linear(
            q, s, sub, 11, 1, local=(args.mode == "sw")
        )
        total = time.perf_counter() - t0
        print(f"run {r}: total {total:.2f}s score {tb.score}")
        acc = 0.0
        for k, (cn, sec, cells) in stats.items():
            if cn:
                rate = cells / sec / 1e9 if sec else 0
                print(
                    f"  {k:20s} calls={cn:3d} wall={sec:6.2f}s "
                    f"cells={cells/1e9:6.2f}G rate={rate:6.1f} GCUPS"
                )
                acc += sec
        print(f"  attributed {acc:.2f}s / {total:.2f}s "
              f"(host glue {total-acc:.2f}s)")


if __name__ == "__main__":
    main()
