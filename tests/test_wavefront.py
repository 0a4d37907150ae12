"""Wavefront single-pair kernel vs oracle (intra-sequence strategy P2)."""
import numpy as np
import pytest

from libssa_tpu import matrices, oracle
from libssa_tpu.ops.wavefront import pair_score

B62 = matrices.builtin("BLOSUM62")
PADDED = B62.padded()


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
def test_wavefront_random_pairs(local):
    rng = np.random.default_rng(0)
    fn = oracle.sw_score if local else oracle.nw_score
    for _ in range(15):
        m = int(rng.integers(1, 40))
        n = int(rng.integers(1, 40))
        q = rng.integers(0, 20, m).astype(np.uint8)
        s = rng.integers(0, 20, n).astype(np.uint8)
        got = pair_score(q, s, PADDED, 10, 1, local=local)
        assert got == fn(q, s, B62.scores, 10, 1), (m, n)


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
@pytest.mark.parametrize("gaps", [(0, 2), (5, 5), (12, 1)])
def test_wavefront_gap_grid(local, gaps):
    go, ge = gaps
    rng = np.random.default_rng(go + ge)
    fn = oracle.sw_score if local else oracle.nw_score
    q = rng.integers(0, 20, 17).astype(np.uint8)
    s = rng.integers(0, 20, 23).astype(np.uint8)
    assert pair_score(q, s, PADDED, go, ge, local=local) == fn(
        q, s, B62.scores, go, ge
    )


def test_wavefront_extreme_aspect_ratios():
    rng = np.random.default_rng(3)
    q = rng.integers(0, 20, 3).astype(np.uint8)
    s = rng.integers(0, 20, 200).astype(np.uint8)
    assert pair_score(q, s, PADDED, 10, 1) == oracle.sw_score(q, s, B62.scores, 10, 1)
    assert pair_score(s, q, PADDED, 10, 1) == oracle.sw_score(s, q, B62.scores, 10, 1)
    assert pair_score(q, s, PADDED, 10, 1, local=False) == oracle.nw_score(
        q, s, B62.scores, 10, 1
    )


def test_wavefront_empty():
    q = np.array([1, 2, 3], dtype=np.uint8)
    e = np.zeros(0, dtype=np.uint8)
    assert pair_score(q, e, PADDED, 10, 1) == 0
    assert pair_score(q, e, PADDED, 10, 1, local=False) == -(11 + 2)
    assert pair_score(e, e, PADDED, 10, 1, local=False) == 0


def test_wavefront_matches_interseq_long():
    """Cross-check the two strategies on a longer pair."""
    rng = np.random.default_rng(4)
    q = rng.integers(0, 20, 64).astype(np.uint8)
    s = rng.integers(0, 20, 300).astype(np.uint8)
    from libssa_tpu.ops import interseq
    from libssa_tpu.ops.scoring import make_profile

    profile = make_profile(q, PADDED)
    batch, _, _ = interseq.batch_scores_oracle_layout(
        profile, s[None, :].astype(np.int32), np.array([300], np.int32), 11, 1, local=True
    )
    assert pair_score(q, s, PADDED, 10, 1) == batch[0]


def test_wavefront_batch_ragged_vs_oracle():
    """Batched ragged pairs: PAD masking must be exact for SW and NW."""
    import jax.numpy as jnp

    from libssa_tpu import oracle
    from libssa_tpu.constants import PADDED_ALPHABET
    from libssa_tpu.ops.scoring import make_profile
    from libssa_tpu.ops.wavefront import wavefront_pair_scores_batch

    rng = np.random.default_rng(9)
    q = rng.integers(0, 20, 33).astype(np.uint8)
    lens = [7, 40, 21, 1]
    subs = np.full((4, 40), PADDED_ALPHABET - 1, np.int64)
    raw = [rng.integers(0, 20, L).astype(np.uint8) for L in lens]
    for i, s in enumerate(raw):
        subs[i, : len(s)] = s
    prof = jnp.asarray(make_profile(q, PADDED), jnp.int32)
    for local in (True, False):
        got = np.asarray(
            wavefront_pair_scores_batch(
                prof,
                jnp.asarray(subs, jnp.int32),
                jnp.asarray(lens, jnp.int32),
                jnp.int32(11),
                jnp.int32(1),
                local=local,
            )
        )
        fn = oracle.sw_score if local else oracle.nw_score
        want = [fn(q, s, B62.scores, 10, 1) for s in raw]
        assert list(got) == want, (local, list(got), want)


def test_pair_scores_batch_matches_oracle():
    """Batched 1v1 via the inter-sequence route == oracle (SW and NW)."""
    import numpy as np

    from libssa_tpu import matrices, oracle
    from libssa_tpu.constants import PADDED_ALPHABET
    from libssa_tpu.ops.scoring import make_profile
    from libssa_tpu.ops.interseq import pair_scores_batch

    rng = np.random.default_rng(17)
    mat = matrices.builtin("BLOSUM62")
    q = rng.integers(0, 20, 33).astype(np.uint8)
    lens = [5, 20, 41, 64]
    n_pad = max(lens)
    subs = np.full((len(lens), n_pad), PADDED_ALPHABET - 1, np.int32)
    for i, l in enumerate(lens):
        subs[i, :l] = rng.integers(0, 20, l)
    prof = make_profile(q, mat.padded())
    Q, R = oracle.gap_qr(10, 1)
    for local in (True, False):
        got = np.asarray(
            pair_scores_batch(
                prof, subs, np.array(lens, np.int32), Q, R,
                local=local, m_real=len(q), kernel="scan",
            )
        )
        fn = oracle.sw_score if local else oracle.nw_score
        want = np.array(
            [fn(q, subs[i, :l].astype(np.uint8), mat.scores, 10, 1)
             for i, l in enumerate(lens)]
        )
        np.testing.assert_array_equal(got, want)
