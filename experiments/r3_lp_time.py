"""True device-time of the longpair band kernel: chained-call slope timing.

The axon tunnel costs ~60ms/dispatch + ~40ms/fence, swamping a ~10ms
kernel. Run the kernel K times inside ONE jit (distinct traced n_real
scalars defeat CSE) and difference K=1 vs K=5.

Usage: /opt/venv/bin/python experiments/r3_lp_time.py [--nt|--acgt] [N...]
(--nt: IUPAC nucleotide codes -> 16-plane tree; --acgt: plain ACGT ->
5-plane tree; default: amino-acid codes -> 25-plane tree)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from libssa_tpu.util.jaxcache import enable_compilation_cache

enable_compilation_cache()


def main():
    print("devices:", jax.devices(), flush=True)
    from libssa_tpu import matrices
    from libssa_tpu.ops import longpair_pallas as lp

    B62 = matrices.builtin("BLOSUM62")
    rng = np.random.default_rng(7)

    args = [a for a in sys.argv[1:]]
    hi = 15 if "--nt" in args else 4 if "--acgt" in args else 20
    for N in [int(a) for a in args if not a.startswith("--")] or [16384]:
        q = rng.integers(0, hi, N).astype(np.uint8)
        s = rng.integers(0, hi, N).astype(np.uint8)
        K = lp.alphabet_planes(q, s)
        m_pad = max(1024, -(-N // 1024) * 1024)
        B = m_pad // 8
        T = -(-(N + B) // 512) * 512
        pq = lp.build_planes(q, np.asarray(B62.padded()), m_pad, K).astype(
            np.float32
        )
        s_full = np.full((T,), K - 1, np.int32)
        s_full[:N] = s
        run = lp._build(m_pad, T, 11, 1, True, False, K)
        print(f"K={K} planes", flush=True)

        def many(k):
            @jax.jit
            def f(s_codes, pq):
                outs = []
                for i in range(k):
                    outs.append(run(N, N - i, s_codes, pq))
                return jnp.stack(outs)
            return f

        s_j = jnp.asarray(s_full)
        pq_j = jnp.asarray(pq).astype(jnp.bfloat16)
        f1, f5 = many(1), many(5)
        np.asarray(f1(s_j, pq_j)); np.asarray(f5(s_j, pq_j))  # compile
        t1 = min(
            (lambda: (lambda t0: (np.asarray(f1(s_j, pq_j)),
             time.perf_counter() - t0)[1])(time.perf_counter()))()
            for _ in range(3)
        )
        t5 = min(
            (lambda: (lambda t0: (np.asarray(f5(s_j, pq_j)),
             time.perf_counter() - t0)[1])(time.perf_counter()))()
            for _ in range(3)
        )
        per = (t5 - t1) / 4
        print(f"N={N}: K=1 {t1*1e3:.1f} ms, K=5 {t5*1e3:.1f} ms -> "
              f"kernel {per*1e3:.2f} ms = {N*N/per/1e9:.1f} GCUPS, "
              f"{per/T*1e9:.0f} ns/step (T={T})", flush=True)


if __name__ == "__main__":
    main()
