"""Attribute the round-4 huge-pair traceback wall time.

Wraps DevicePair.divide_level / .sw_end, hirschberg._mm_pass (host
levels) and hirschberg._ops_small (leaf fills) with counters to see
where the warm NW seconds go after the device-resident restructure.

Supersedes r3_mm_profile.py (which wrapped the r3 host-packed batch
API removed in round 4; its measurements remain recorded in
docs/PERF_NOTES.md and BENCH_RESULTS.md r3 sections).

Usage: /opt/venv/bin/python experiments/r4_mm_profile.py [--m 30000]
       [--mode nw] [--leaf N] [--minc N]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from libssa_tpu import matrices
from libssa_tpu.ops import mm_device
from libssa_tpu.search import hirschberg
from libssa_tpu.util.jaxcache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=30000)
    ap.add_argument("--n", type=int, default=30000)
    ap.add_argument("--mode", default="nw", choices=["nw", "sw"])
    ap.add_argument("--alpha", type=int, default=20)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--leaf", type=int, default=0)
    ap.add_argument("--minc", type=int, default=0,
                    help="override DEVICE_MIN_CELLS")
    args = ap.parse_args()
    if args.leaf:
        hirschberg.LEAF_CELLS = args.leaf
    if args.minc:
        hirschberg.DEVICE_MIN_CELLS = args.minc

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

    wrap(
        mm_device.DevicePair, "divide_level",
        lambda a, o: sum((qe - qs) * (se - ss) for qs, qe, ss, se, _, _ in a[1]),
    )
    wrap(mm_device.DevicePair, "sw_end", lambda a, o: a[2] * a[4])
    wrap(mm_device.DevicePair, "__init__", lambda a, o: 0)
    wrap(hirschberg, "_mm_pass", lambda a, o: len(a[0]) * len(a[1]))
    wrap(hirschberg, "_ops_small", lambda a, o: len(a[0]) * len(a[1]))
    wrap(hirschberg, "_ops_score", lambda a, o: 0)

    for r in range(args.runs):
        for k in stats:
            stats[k] = [0, 0.0, 0]
        t0 = time.perf_counter()
        tb = hirschberg.align_pair_linear(
            q, s, sub, 11, 1, local=(args.mode == "sw")
        )
        total = time.perf_counter() - t0
        print(f"run {r}: total {total:.2f}s score {tb.score}", flush=True)
        acc = 0.0
        for k, (cn, sec, cells) in stats.items():
            if cn:
                rate = cells / sec / 1e9 if sec else 0
                print(
                    f"  {k:20s} calls={cn:3d} wall={sec:6.2f}s "
                    f"cells={cells/1e9:6.2f}G rate={rate:6.1f} GCUPS",
                    flush=True,
                )
                acc += sec
        print(f"  attributed {acc:.2f}s / {total:.2f}s "
              f"(host glue {total-acc:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
