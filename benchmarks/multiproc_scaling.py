"""Cross-process sharded-search measurement (VERDICT r2 weak #4).

Runs the SAME sharded search program in 1-process and 2-process (gloo)
configurations — total device count held at 4 virtual CPU devices — and
reports warm sweep throughput. On one shared host this measures the
PROGRAM cost of crossing a process boundary (gloo collectives, per-
process shard assembly), not silicon scaling: the honest quantity is the
1-proc vs 2-proc ratio at equal devices.

Usage: python benchmarks/multiproc_scaling.py [--seqs 20000] [--iters 5]
Prints one JSON line per configuration.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import textwrap

WORKER = textwrap.dedent(
    """
    import json, os, sys, time
    pid, nproc, port, devs, n_seqs, iters, qlen, maxlen = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4]),
        int(sys.argv[5]), int(sys.argv[6]), int(sys.argv[7]),
        int(sys.argv[8]),
    )
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs}"
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nproc, process_id=pid
        )
    sys.path.insert(0, os.getcwd())  # launcher sets cwd to the repo root
    import numpy as np
    from libssa_tpu import matrices
    from libssa_tpu.constants import SymType
    from libssa_tpu.io.db import SequenceDB
    from libssa_tpu.parallel.sharded import ShardedSearchEngine, make_db_mesh
    from libssa_tpu.search.manager import SearchParams

    B62 = matrices.builtin("BLOSUM62")
    rng = np.random.default_rng(7)  # identical stream in every process
    lens = rng.integers(maxlen // 3, maxlen, size=n_seqs)
    seqs = [rng.integers(0, 20, int(n)).astype(np.uint8) for n in lens]
    db = SequenceDB.from_sequences(
        [f"s{i}" for i in range(n_seqs)], seqs, SymType.AMINOACID
    )
    mesh = make_db_mesh()
    eng = ShardedSearchEngine(db, B62, 10, 1, mesh, SearchParams())
    q = rng.integers(0, 20, qlen).astype(np.uint8)
    s, i = eng.search(q, k=10, local=True)  # warm (compile + stacks)
    t0 = time.perf_counter()
    for _ in range(iters):
        s, i = eng.search(q, k=10, local=True)
    dt = (time.perf_counter() - t0) / iters
    cells = qlen * int(lens.sum())
    if pid == 0:
        print("RESULT " + json.dumps({
            "processes": nproc, "devices_total": devs * nproc,
            "seqs_per_s": round(n_seqs / dt), "gcups": round(cells/dt/1e9, 2),
            "top_score": int(s[0]),
        }), flush=True)
    """
)


def run_config(nproc, devs_per, n_seqs, iters, port, qlen, maxlen):
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER)
        path = f.name
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, path, str(pid), str(nproc), str(port),
                 str(devs_per), str(n_seqs), str(iters), str(qlen),
                 str(maxlen)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            for pid in range(nproc)
        ]
        outs = [p.communicate(timeout=900) for p in procs]
        for p, (out, err) in zip(procs, outs):
            if p.returncode != 0:
                raise RuntimeError(f"worker failed:\n{err[-2000:]}")
        for out, _ in outs:
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    print(line[len("RESULT "):], flush=True)
    finally:
        os.unlink(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=20000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--query-len", type=int, default=64)
    ap.add_argument("--maxlen", type=int, default=120)
    ap.add_argument("--port", type=int, default=29517)
    ap.add_argument(
        "--configs", default="1x4,2x2",
        help="comma-separated NPROCxDEVS_PER_PROC configs (e.g. 1x4,2x2,4x1); "
             "keep total devices equal across configs for a meaningful ratio",
    )
    args = ap.parse_args()
    for off, cfg in enumerate(args.configs.split(",")):
        nproc, devs = (int(x) for x in cfg.lower().split("x"))
        run_config(nproc, devs, args.seqs, args.iters, args.port + off,
                   args.query_len, args.maxlen)


if __name__ == "__main__":
    main()
