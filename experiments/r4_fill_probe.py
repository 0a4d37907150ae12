"""Fill simulation for the flagship 100x500k sweep (VERDICT r3 item 5).

Computes the padded-fill ratio (real cells / padded cells) the grouped
stacks would give for the flagship synthetic DB under different window
MIN_LANES cut thresholds, plus window/shape counts (each distinct
(n_pad, B) is one Mosaic instantiation; each window is one lax.map row).

Host-only: no TPU needed. Usage: python experiments/r4_fill_probe.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from libssa_tpu.constants import SymType
from libssa_tpu.io.db import SequenceDB


def simulate(db, batch_size, min_lanes):
    real = int(db.lengths.sum())
    padded = 0
    windows = 0
    shapes = set()
    # MIN_LANES lives inline in SequenceDB._windows, so re-implement the
    # window walk with the knob exposed.
    order = db._order
    buckets = np.array(
        [db._bucket_length(int(L), 64, True) for L in db.lengths[order]],
        dtype=np.int64,
    )
    N = len(order)
    cells_budget = batch_size * 1024
    start = 0
    while start < N:
        end = start
        cur_bucket = 0
        while end < N and (end - start) < batch_size:
            nb = max(cur_bucket, int(buckets[end]))
            lanes = end - start + 1
            if lanes > 8 and nb * lanes > cells_budget:
                break
            if cur_bucket and nb != cur_bucket and (end - start) >= min_lanes:
                break
            cur_bucket = nb
            end += 1
        lanes = end - start
        if lanes >= min_lanes:
            B = 1 << (lanes.bit_length() - 1)
            lanes = B
        else:
            B = max(8, 1 << (lanes - 1).bit_length())
        ids = order[start : start + lanes]
        start += lanes
        n = int(db.lengths[ids].max()) if len(ids) else 0
        n_pad = db._bucket_length(n, 64, True)
        padded += B * n_pad
        windows += 1
        shapes.add((n_pad, B))
    return real / padded, windows, len(shapes)


def main():
    rng = np.random.default_rng(99)
    n_seqs = 500_000
    lengths = np.clip(
        rng.lognormal(mean=5.7, sigma=0.55, size=n_seqs).astype(int), 50, 2000
    )
    seqs = [np.zeros(L, np.uint8) for L in lengths]
    db = SequenceDB.from_sequences(
        [str(i) for i in range(n_seqs)], seqs, SymType.AMINOACID
    )
    for min_lanes in (1024, 512, 256, 128, 64):
        fill, windows, shapes = simulate(db, 8192, min_lanes)
        print(
            f"MIN_LANES={min_lanes:5d}: fill={fill*100:.2f}%  "
            f"windows={windows}  distinct shapes={shapes}"
        )


if __name__ == "__main__":
    main()
