"""Hardware test lane: the Pallas kernel on a REAL TPU chip.

The default suite runs every kernel in Pallas interpret mode on the virtual
CPU mesh (tests/conftest.py), which checks semantics but not Mosaic
lowering. This lane compiles and runs the real kernel on whatever
accelerator JAX finds, and is the gate recorded in each round summary
(VERDICT r1 "What's weak" #4).

Run:  LIBSSA_TEST_TPU=1 python -m pytest tests/test_tpu_hw.py -m tpu -v
"""
import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        not os.environ.get("LIBSSA_TEST_TPU"),
        reason="hardware lane: set LIBSSA_TEST_TPU=1 to run on a real chip",
    ),
]


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(20260816)


def _random_case(rng, m, n_subj, max_len):
    from libssa_tpu import matrices

    mat = matrices.builtin("BLOSUM62")
    q = rng.integers(0, 24, size=m).astype(np.uint8)
    subjects = [
        rng.integers(0, 24, size=int(l)).astype(np.uint8)
        for l in rng.integers(10, max_len, size=n_subj)
    ]
    return mat, q, subjects


def test_pallas_kernel_exact_on_hw(rng):
    """Real-TPU kernel scores == int64 NumPy oracle (SW and NW)."""
    import jax.numpy as jnp

    from libssa_tpu import oracle
    from libssa_tpu.constants import PADDED_ALPHABET
    from libssa_tpu.ops.interseq_pallas import interseq_scores_pallas

    mat, q, subjects = _random_case(rng, m=61, n_subj=64, max_len=120)
    Q, R = oracle.gap_qr(10, 1)
    n_pad = max(len(s) for s in subjects)
    stack = np.full((n_pad, len(subjects)), PADDED_ALPHABET - 1, np.int8)
    for j, s in enumerate(subjects):
        stack[: len(s), j] = s
    lengths = np.array([len(s) for s in subjects], np.int32)
    from libssa_tpu.ops.scoring import make_profile

    prof = make_profile(q, mat.padded())

    for local in (True, False):
        got, hi, lo = interseq_scores_pallas(
            jnp.asarray(prof, jnp.int32),
            jnp.asarray(stack),
            jnp.asarray(lengths),
            Q,
            R,
            local=local,
            track_range=True,
            m_real=len(q),
        )
        got = np.asarray(got)
        score_fn = oracle.sw_score if local else oracle.nw_score
        want = np.array(
            [score_fn(q, s, mat.scores, 10, 1) for s in subjects]
        )
        np.testing.assert_array_equal(got, want)


def test_search_engine_end_to_end_on_hw(rng):
    """Full engine search on hardware matches the oracle hit list."""
    from libssa_tpu import matrices, oracle
    from libssa_tpu.constants import BitWidth, SymType
    from libssa_tpu.io.db import SequenceDB
    from libssa_tpu.ops.topk import host_topk
    from libssa_tpu.search.manager import SearchEngine

    mat, q, subjects = _random_case(rng, m=47, n_subj=300, max_len=200)
    db = SequenceDB.from_sequences(
        [f"s{i}" for i in range(len(subjects))], subjects, SymType.AMINOACID
    )
    engine = SearchEngine(db, mat, 10, 1)
    for bw in (BitWidth.EXACT, BitWidth.BIT8):
        scores, ids = engine.search(q, 10, True, bw)
        want = np.array(
            [oracle.sw_score(q, s, mat.scores, 10, 1) for s in subjects]
        )
        ws, wi = host_topk(want, np.arange(len(want)), 10)
        np.testing.assert_array_equal(np.asarray(scores), ws)
        np.testing.assert_array_equal(np.asarray(ids), wi)
