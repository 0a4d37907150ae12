"""Pallas kernel bit-exactness vs the scan kernel and oracle.

Runs in Pallas interpret mode so the TPU kernel's logic is verified on the
CPU test mesh (the real-hardware run is exercised by bench.py and the TPU
smoke in the verify skill).
"""
import functools

import numpy as np
import pytest

from libssa_tpu import matrices, oracle
from libssa_tpu.io.db import PAD_CODE
from libssa_tpu.ops.scoring import make_profile

B62 = matrices.builtin("BLOSUM62")
PADDED = B62.padded()


def _pallas(profile, codes, lengths, Q, R, **kw):
    import jax.numpy as jnp

    from libssa_tpu.ops.interseq_pallas import interseq_scores_pallas

    s, hi, lo = interseq_scores_pallas(
        jnp.asarray(profile, jnp.int32),
        jnp.asarray(codes.T, jnp.int32),
        jnp.asarray(lengths, jnp.int32),
        Q,
        R,
        interpret=True,
        **kw,
    )
    return np.asarray(s), np.asarray(hi), np.asarray(lo)


def _random_batch(rng, B, minlen, maxlen):
    lengths = rng.integers(minlen, maxlen + 1, B).astype(np.int32)
    n_pad = int(lengths.max())
    codes = np.full((B, n_pad), PAD_CODE, dtype=np.int32)
    seqs = []
    for b in range(B):
        s = rng.integers(0, 20, lengths[b]).astype(np.uint8)
        seqs.append(s)
        codes[b, : lengths[b]] = s
    return codes, lengths, seqs


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
@pytest.mark.parametrize("m", [1, 7, 33])
def test_pallas_bit_exact_vs_oracle(local, m):
    rng = np.random.default_rng(m)
    q = rng.integers(0, 20, m).astype(np.uint8)
    profile = make_profile(q, PADDED)
    codes, lengths, seqs = _random_batch(rng, 9, 1, 40)
    s, _, _ = _pallas(profile, codes, lengths, 11, 1, local=local, b_tile=128)
    fn = oracle.sw_score if local else oracle.nw_score
    expect = [fn(q, sq, B62.scores, 10, 1) for sq in seqs]
    np.testing.assert_array_equal(s, expect)


@pytest.mark.parametrize("gaps", [(3, 1), (0, 2), (5, 5)])
def test_pallas_gap_grid(gaps):
    go, ge = gaps
    rng = np.random.default_rng(go * 7 + ge)
    q = rng.integers(0, 20, 13).astype(np.uint8)
    profile = make_profile(q, PADDED)
    codes, lengths, seqs = _random_batch(rng, 5, 1, 25)
    for local in (True, False):
        s, _, _ = _pallas(
            profile, codes, lengths, go + ge, ge, local=local, b_tile=128
        )
        fn = oracle.sw_score if local else oracle.nw_score
        expect = [fn(q, sq, B62.scores, go, ge) for sq in seqs]
        np.testing.assert_array_equal(s, expect)


def test_pallas_zero_length_and_padding_lanes():
    rng = np.random.default_rng(3)
    q = rng.integers(0, 20, 10).astype(np.uint8)
    profile = make_profile(q, PADDED)
    codes = np.full((3, 16), PAD_CODE, dtype=np.int32)
    lengths = np.array([0, 16, 4], dtype=np.int32)
    codes[1] = rng.integers(0, 20, 16)
    codes[2, :4] = rng.integers(0, 20, 4)
    s, _, _ = _pallas(profile, codes, lengths, 11, 1, local=True, b_tile=128)
    assert s[0] == 0
    assert s[1] == oracle.sw_score(q, codes[1], B62.scores, 10, 1)
    assert s[2] == oracle.sw_score(q, codes[2, :4], B62.scores, 10, 1)
    # NW with zero-length subject = all-gap penalty
    s, _, _ = _pallas(profile, codes, lengths, 11, 1, local=False, b_tile=128)
    assert s[0] == -(11 + 9 * 1)


def test_pallas_track_range_flags():
    rng = np.random.default_rng(4)
    q = rng.integers(0, 20, 120).astype(np.uint8)
    profile = make_profile(q, PADDED)
    codes = q[None, :].astype(np.int32)
    lengths = np.array([120], dtype=np.int32)
    s, hi, lo = _pallas(
        profile, codes, lengths, 11, 1, local=True, track_range=True, b_tile=128
    )
    expect = int(sum(B62.scores[c, c] for c in q))
    assert s[0] == expect and hi[0] == expect and expect > 255


def test_pallas_matches_scan_kernel_large():
    """Same results as the scan kernel across a bigger ragged batch."""
    import jax.numpy as jnp

    from libssa_tpu.ops import interseq

    rng = np.random.default_rng(5)
    q = rng.integers(0, 20, 50).astype(np.uint8)
    profile = make_profile(q, PADDED)
    codes, lengths, _ = _random_batch(rng, 160, 1, 90)  # forces B padding
    ps, phi, plo = _pallas(
        profile, codes, lengths, 11, 1, local=True, track_range=True, b_tile=128
    )
    ss, shi, slo = interseq.batch_scores_oracle_layout(
        profile, codes, lengths, 11, 1, local=True, track_range=True
    )
    np.testing.assert_array_equal(ps, ss)
    np.testing.assert_array_equal(phi, shi)
    np.testing.assert_array_equal(plo, slo)


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
def test_pallas_internal_m_padding(local):
    """The wrapper pads m to a 32-multiple internally; results unchanged."""
    rng = np.random.default_rng(6)
    for m in (5, 32, 45):
        q = rng.integers(0, 20, m).astype(np.uint8)
        profile = make_profile(q, PADDED)
        codes, lengths, seqs = _random_batch(rng, 4, 1, 30)
        s, hi, lo = _pallas(
            profile, codes, lengths, 11, 1, local=local, track_range=True,
            b_tile=128,
        )
        fn = oracle.sw_score if local else oracle.nw_score
        expect = [fn(q, sq, B62.scores, 10, 1) for sq in seqs]
        np.testing.assert_array_equal(s, expect)


def test_pallas_odd_bucket_column_blocks():
    """Non-256-multiple buckets run exactly, in divisor-sized blocks.

    The refined bucket ladder (io/db._LADDER) emits 64/128-multiple
    padded lengths like 320 and 448; _build must run them as-is (e.g.
    five 64-column blocks) rather than rounding up to 256-multiples —
    the round-3 regression that erased the ladder's fill gain.
    """
    from libssa_tpu.ops.interseq_pallas import _column_block

    assert _column_block(256) == 256
    assert _column_block(320) == 64  # 5 blocks of 64
    assert _column_block(448) == 64
    assert _column_block(384) == 128
    assert _column_block(512) == 256
    assert _column_block(2048) == 256
    assert _column_block(4608) == 256  # 512-step ladder rung
    assert _column_block(100) == 100  # sub-256: whole length
    assert _column_block(322) == 32  # arbitrary even: 32-floor

    rng = np.random.default_rng(11)
    q = rng.integers(0, 20, 24).astype(np.uint8)
    profile = make_profile(q, PADDED)
    for n_pad in (320, 384):
        codes, lengths, seqs = _random_batch(rng, 4, n_pad - 70, n_pad)
        codes = np.pad(
            codes, ((0, 0), (0, n_pad - codes.shape[1])),
            constant_values=PAD_CODE,
        )
        for local in (True, False):
            s, _, _ = _pallas(
                profile, codes, lengths, 11, 1, local=local, b_tile=128
            )
            fn = oracle.sw_score if local else oracle.nw_score
            expect = [fn(q, sq, B62.scores, 10, 1) for sq in seqs]
            np.testing.assert_array_equal(s, expect)


def test_giant_query_falls_back_to_scan_kernel():
    """Queries past the VMEM-practical bound delegate to the scan kernel.

    The (m, lanes) DP state cannot tile into VMEM below one 128-lane
    tile (~7k query rows); the wrapper must route to the bit-identical
    HBM-state scan kernel instead of failing Mosaic compilation. The
    delegation happens before any Pallas machinery, so this exercises
    the REAL fallback path even on CPU (no interpret flag).
    """
    import jax.numpy as jnp

    from libssa_tpu.ops import interseq
    from libssa_tpu.ops.interseq_pallas import (
        interseq_scores_pallas,
        query_fits_vmem,
    )

    assert query_fits_vmem(256, 512)
    assert query_fits_vmem(6000, 512)
    assert not query_fits_vmem(8000, 512)
    assert not query_fits_vmem(100_000, 512)

    rng = np.random.default_rng(9)
    m = 8000
    q = rng.integers(0, 20, m).astype(np.uint8)
    profile = make_profile(q, PADDED)
    codes, lengths, _ = _random_batch(rng, 8, 20, 60)
    s, hi, lo = interseq_scores_pallas(
        jnp.asarray(profile, jnp.int32),
        jnp.asarray(codes.T, jnp.int32),
        jnp.asarray(lengths, jnp.int32),
        jnp.int32(11),
        jnp.int32(1),
        local=True,
        track_range=True,
    )
    ss, shi, slo = interseq.interseq_scores(
        jnp.asarray(profile, jnp.int32),
        jnp.asarray(codes.T, jnp.int32),
        jnp.asarray(lengths, jnp.int32),
        jnp.int32(11),
        jnp.int32(1),
        local=True,
        track_range=True,
    )
    np.testing.assert_array_equal(np.asarray(s), np.asarray(ss))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(shi))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(slo))
