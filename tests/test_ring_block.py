"""Banded tile kernel + tiled whole-pair runner vs the int64 oracle.

The tile kernel (ops/ring_block_pallas.py) is validated THROUGH
ops/tiled_pair.py: chaining tiles over both grid axes exercises every
boundary surface (top/bottom streams, left/right edge columns, corner
and diagonal hand-off, drain isolation) — any error in any of them
breaks the final score. Interpret mode on CPU (same kernel code the TPU
compiles; the hardware lane re-checks exactness on the chip).
"""
import numpy as np
import pytest

from libssa_tpu import matrices, oracle
from libssa_tpu.ops.tiled_pair import tiled_pair_score

B62 = matrices.builtin("BLOSUM62")


def _random_pair(rng, m, n):
    return (
        rng.integers(0, 20, m).astype(np.uint8),
        rng.integers(0, 20, n).astype(np.uint8),
    )


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
@pytest.mark.parametrize(
    "m,n,RB,WC",
    [
        (40, 60, 256, 256),  # single tile, padded
        (300, 200, 256, 256),  # 2 row blocks x 1 chunk
        (200, 300, 256, 256),  # 1 x 2
        (530, 610, 256, 256),  # 3 x 3, ragged ends
        (256, 256, 256, 256),  # exact fit
        (257, 513, 256, 256),  # off-by-one over the tile edges
    ],
)
def test_tiled_vs_oracle(local, m, n, RB, WC):
    rng = np.random.default_rng(m * 1000 + n + (1 if local else 0))
    q, s = _random_pair(rng, m, n)
    want = (oracle.sw_score if local else oracle.nw_score)(
        q, s, B62.scores, 10, 1
    )
    got = tiled_pair_score(
        q, s, B62.padded(), 11, 1, local=local, RB=RB, WC=WC, interpret=True
    )
    assert got == want


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
def test_tiled_randomized(local):
    rng = np.random.default_rng(7 if local else 8)
    for _ in range(4):
        m = int(rng.integers(2, 700))
        n = int(rng.integers(2, 700))
        q, s = _random_pair(rng, m, n)
        want = (oracle.sw_score if local else oracle.nw_score)(
            q, s, B62.scores, 10, 1
        )
        got = tiled_pair_score(
            q, s, B62.padded(), 11, 1, local=local,
            RB=256, WC=256, interpret=True,
        )
        assert got == want, (m, n)


@pytest.mark.parametrize("hi,K", [(4, 5), (15, 16)])
def test_tiled_alphabet_sized_tree(hi, K):
    """Nucleotide-range codes ride the small select tree (r3) through
    the tile path too — exact across tile boundaries with PAD at K-1."""
    from libssa_tpu.ops.longpair_pallas import alphabet_planes

    rng = np.random.default_rng(hi)
    q = rng.integers(0, hi, 530).astype(np.uint8)
    s = rng.integers(0, hi, 610).astype(np.uint8)
    q[0] = s[0] = hi - 1
    assert alphabet_planes(q, s) == K
    for local in (True, False):
        want = (oracle.sw_score if local else oracle.nw_score)(
            q, s, B62.scores, 10, 1
        )
        got = tiled_pair_score(
            q, s, B62.padded(), 11, 1, local=local,
            RB=256, WC=256, interpret=True,
        )
        assert got == want


@pytest.mark.parametrize("ch", [16, 32])
def test_tiled_taller_bands_exact(ch):
    """CH=16/32 tile geometry is bit-exact across tile boundaries (the
    production band_height pick for >=8k tiles; _plan keeps interpret
    tiles at CH8, so force it here)."""
    from libssa_tpu.ops.tiled_pair import _tiled_score
    from libssa_tpu.ops.mm_device import _pq_blocks, _s_chunks
    from libssa_tpu.ops.ring_block_pallas import tile_shapes
    import jax.numpy as jnp

    rng = np.random.default_rng(ch)
    m, n, RB, WC = 530, 610, 256, 256
    q = rng.integers(0, 20, m).astype(np.uint8)
    s = rng.integers(0, 20, n).astype(np.uint8)
    T, B = tile_shapes(RB, WC, True, ch)
    Rb, Cc = -(-m // RB), -(-n // WC)
    pq = _pq_blocks(q, B62.padded(), Rb, RB, B, 25, ch)
    sc = _s_chunks(s, Cc, WC, T, 25)
    for local in (True, False):
        want = (oracle.sw_score if local else oracle.nw_score)(
            q, s, B62.scores, 10, 1
        )
        got = int(
            _tiled_score(
                jnp.asarray(pq).astype(jnp.bfloat16), jnp.asarray(sc),
                jnp.int32(m), jnp.int32(n),
                RB=RB, WC=WC, Q=11, R=1, local=local, interpret=True,
                K=25, CH=ch,
            )
        )
        assert got == want, (ch, local)


def test_tiled_gap_only_and_identical():
    # Degenerate pairs crossing tile boundaries.
    q = np.tile(np.arange(20, dtype=np.uint8), 30)[:520]
    for local in (True, False):
        want = (oracle.sw_score if local else oracle.nw_score)(
            q, q, B62.scores, 10, 1
        )
        got = tiled_pair_score(
            q, q, B62.padded(), 11, 1, local=local,
            RB=256, WC=256, interpret=True,
        )
        assert got == want
