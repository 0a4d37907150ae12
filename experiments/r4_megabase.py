"""Megabase-scale full optimal traceback: ONE pair, 10^12 DP cells.

The round-4 Myers-Miller stack (device-resident planes, one dispatch
per divide level, native leaf solver) makes a 1,000,000 x 1,000,000
optimal alignment *with traceback* feasible on one chip in O(m+n)
memory. This script runs it (default 1M x 1M plain-DNA; pass sizes to
change) and validates the result the only way that scales: the ops
string must be a VALID alignment (consumes exactly m and n symbols —
asserted by the path walk) whose independently evaluated score equals
the score the traceback reports. Optimality at this scale rests on the
construction being bit-exact at every testable scale (tests + soak up
to 100k x 100k vs the host Myers-Miller and the int64 oracle).

Memory: planes 2 * (Mp x 5) bf16 + codes — tens of MB; the divide
levels stream; direction matrices exist only at <= 1 Mcell leaves.

Usage: /opt/venv/bin/python experiments/r4_megabase.py [m n] [--protein]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from libssa_tpu.util.jaxcache import enable_compilation_cache

enable_compilation_cache()


def path_score(q, s, tb, sub, Q, R):
    """Vectorized independent evaluation of the ops string's score."""
    a = np.frombuffer(tb.cigar.encode(), np.uint8)
    if not len(a):
        assert tb.q_begin == tb.q_end and tb.s_begin == tb.s_end
        return 0
    isM = a == ord("M")
    isD = a == ord("D")
    i_pos = tb.q_begin + np.cumsum(isM | isD) - 1
    j_pos = tb.s_begin + np.cumsum(~isD) - 1
    assert i_pos[-1] == tb.q_end - 1
    assert j_pos[-1] == tb.s_end - 1
    subs = int(sub[q[i_pos[isM]], s[j_pos[isM]]].sum())
    gap = ~isM
    opens = int((gap & np.concatenate([[True], a[1:] != a[:-1]])).sum())
    return subs - opens * Q - (int(gap.sum()) - opens) * R


def main():
    import jax

    from libssa_tpu import matrices
    from libssa_tpu.constants import SymType
    from libssa_tpu.oracle import gap_qr
    from libssa_tpu.search import hirschberg as hb

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    m, n = (int(a) for a in args[:2]) if len(args) >= 2 else (1_000_000, 1_000_000)
    protein = "--protein" in sys.argv
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(5)
    if protein:
        mat = matrices.builtin("BLOSUM62")
        go, ge = 11, 1
        q = rng.integers(0, 20, m).astype(np.uint8)
        s = rng.integers(0, 20, n).astype(np.uint8)
    else:
        mat = matrices.constant_scoring(5, -4, SymType.NUCLEOTIDE)
        go, ge = 10, 2
        q = rng.integers(0, 4, m).astype(np.uint8)
        s = rng.integers(0, 4, n).astype(np.uint8)
    Q, R = gap_qr(go, ge)

    for local in (True, False):
        mode = "SW" if local else "NW"
        t0 = time.perf_counter()
        tb = hb.align_pair_linear(q, s, mat.scores, go, ge, local=local)
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        tb = hb.align_pair_linear(q, s, mat.scores, go, ge, local=local)
        t_warm = time.perf_counter() - t0
        ps = path_score(q, s, tb, mat.scores, Q, R)
        assert ps == tb.score, (ps, tb.score)
        print(
            f"{mode} {m}x{n}: cold {t_cold:.1f}s warm {t_warm:.1f}s "
            f"score={tb.score} ops={len(tb.cigar)} "
            f"q[{tb.q_begin}:{tb.q_end}] s[{tb.s_begin}:{tb.s_end}] "
            f"(path-score verified) "
            f"~{m * n / t_warm / 1e9:.0f} GCUPS-equivalent",
            flush=True,
        )


if __name__ == "__main__":
    main()
