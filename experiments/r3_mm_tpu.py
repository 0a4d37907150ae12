"""Kernel-rate Myers-Miller on the real TPU: big-pair traceback timing.

Aligns one large random pair with the device row passes (default
routing) and with the host NumPy passes (threshold forced off), checks
identical tracebacks, and reports both times.

Usage: /opt/venv/bin/python experiments/r3_mm_tpu.py [m n]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from libssa_tpu.util.jaxcache import enable_compilation_cache

enable_compilation_cache()


def path_score(q, s, tb, sub, go, ge):
    from libssa_tpu.oracle import gap_qr

    Q, R = gap_qr(go, ge)
    i, j, sc, run = tb.q_begin, tb.s_begin, 0, None
    for op in tb.cigar:
        if op == "M":
            sc += int(sub[q[i], s[j]]); i += 1; j += 1; run = None
        else:
            sc += -R if run == op else -Q
            run = op
            if op == "D":
                i += 1
            else:
                j += 1
    assert i == tb.q_end and j == tb.s_end
    return sc


def main():
    print("devices:", jax.devices(), flush=True)
    from libssa_tpu import matrices
    from libssa_tpu.search import hirschberg as hb

    m, n = (int(a) for a in sys.argv[1:3]) if len(sys.argv) > 2 else (30000, 30000)
    B62 = matrices.builtin("BLOSUM62")
    rng = np.random.default_rng(3)
    q = rng.integers(0, 20, m).astype(np.uint8)
    s = rng.integers(0, 20, n).astype(np.uint8)

    for local in (True, False):
        mode = "SW" if local else "NW"
        t0 = time.perf_counter()
        dev = hb.align_pair_linear(q, s, B62.scores, 10, 1, local=local)
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        dev = hb.align_pair_linear(q, s, B62.scores, 10, 1, local=local)
        t_dev = time.perf_counter() - t0
        ps = path_score(q, s, dev, B62.scores, 10, 1)
        assert ps == dev.score, (ps, dev.score)
        print(f"{mode} {m}x{n} device: cold {t_cold:.1f}s warm {t_dev:.1f}s "
              f"score={dev.score} (path-score verified)", flush=True)

        hb.DEVICE_MIN_CELLS, saved = 1 << 60, hb.DEVICE_MIN_CELLS
        t0 = time.perf_counter()
        host = hb.align_pair_linear(q, s, B62.scores, 10, 1, local=local)
        t_host = time.perf_counter() - t0
        hb.DEVICE_MIN_CELLS = saved
        same = (host.score, host.cigar) == (dev.score, dev.cigar)
        print(f"{mode} {m}x{n} host:   {t_host:.1f}s score={host.score} "
              f"identical={same} speedup={t_host/t_dev:.1f}x", flush=True)
        assert same


if __name__ == "__main__":
    main()
