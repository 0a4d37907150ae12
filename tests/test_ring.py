"""Device-spanning ring DP (parallel/ring.py) vs the scalar oracle.

Runs on the 8-virtual-device CPU mesh from conftest.py — the collective
boundary exchange (ppermute) is exercised for real across shards.
"""
import numpy as np
import pytest

from libssa_tpu import matrices, oracle
from libssa_tpu.parallel.ring import ring_score
from libssa_tpu.parallel.sharded import make_db_mesh

B62 = matrices.builtin("BLOSUM62")


@pytest.fixture(scope="module")
def mesh():
    return make_db_mesh()


@pytest.mark.parametrize("m,n", [(128, 1024), (100, 777), (64, 64), (96, 40)])
def test_ring_sw_matches_oracle(mesh, m, n):
    rng = np.random.default_rng(m * 1000 + n)
    q = rng.integers(0, 20, m).astype(np.uint8)
    s = rng.integers(0, 20, n).astype(np.uint8)
    got = ring_score(q, s, B62.padded(), 11, 1, local=True, mesh=mesh, RB=32)
    assert got == oracle.sw_score(q, s, B62.scores, 11, 1)


@pytest.mark.parametrize("m,n", [(128, 1024), (128, 777), (64, 111)])
def test_ring_nw_matches_oracle(mesh, m, n):
    rng = np.random.default_rng(m * 1000 + n + 7)
    q = rng.integers(0, 20, m).astype(np.uint8)
    s = rng.integers(0, 20, n).astype(np.uint8)
    got = ring_score(q, s, B62.padded(), 11, 1, local=False, mesh=mesh, RB=32)
    assert got == oracle.nw_score(q, s, B62.scores, 11, 1)


def test_ring_single_device():
    mesh1 = make_db_mesh(1)
    rng = np.random.default_rng(3)
    q = rng.integers(0, 20, 70).astype(np.uint8)
    s = rng.integers(0, 20, 200).astype(np.uint8)
    got = ring_score(q, s, B62.padded(), 11, 1, local=True, mesh=mesh1, RB=32)
    assert got == oracle.sw_score(q, s, B62.scores, 11, 1)


def test_ring_gap_conventions(mesh):
    rng = np.random.default_rng(5)
    q = rng.integers(0, 20, 64).astype(np.uint8)
    s = rng.integers(0, 20, 300).astype(np.uint8)
    for go, ge in [(5, 2), (20, 1)]:
        got = ring_score(q, s, B62.padded(), go, ge, local=True, mesh=mesh)
        assert got == oracle.sw_score(q, s, B62.scores, go, ge)


@pytest.mark.parametrize("m,n", [(41, 179), (30, 30), (65, 500)])
def test_ring_nw_arbitrary_lengths(mesh, m, n):
    """NW capture at any (m, n) — no shard/block alignment required."""
    rng = np.random.default_rng(m + n)
    q = rng.integers(0, 20, m).astype(np.uint8)
    s = rng.integers(0, 20, n).astype(np.uint8)
    got = ring_score(q, s, B62.padded(), 12, 2, local=False, mesh=mesh, RB=32)
    assert got == oracle.nw_score(q, s, B62.scores, 12, 2)


def test_ring_profile_multiple_validation(mesh):
    """m % RB != 0 must raise (not assert: survives python -O)."""
    import jax.numpy as jnp

    from libssa_tpu.parallel.ring import ring_pair_score

    prof = jnp.zeros((33, 32), jnp.int32)
    subj = jnp.zeros((mesh.devices.size * 8,), jnp.int32)
    with pytest.raises(ValueError, match="multiple of RB"):
        ring_pair_score(prof, subj, 12, 1, mesh=mesh, RB=32)


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
@pytest.mark.parametrize("m,n", [(64, 300), (100, 777), (40, 40)])
def test_banded_ring_matches_oracle(mesh, local, m, n):
    """Round 3: the per-device Pallas tile-kernel ring (interpret mode)."""
    rng = np.random.default_rng(m * 77 + n + (1 if local else 0))
    q = rng.integers(0, 20, m).astype(np.uint8)
    s = rng.integers(0, 20, n).astype(np.uint8)
    got = ring_score(
        q, s, B62.padded(), 11, 1, local=local, mesh=mesh, RB=32,
        kernel="banded", interpret=True,
    )
    want = (oracle.sw_score if local else oracle.nw_score)(
        q, s, B62.scores, 11, 1
    )
    assert got == want


@pytest.mark.parametrize("local", [True, False], ids=["sw", "nw"])
def test_banded_ring_taller_bands(mesh, local):
    """CH=16 band geometry through the ring (production pick for
    RB >= 8192; the wrapper gates interpret runs to CH8, so drive
    ring_pair_score_banded directly with CH16 planes)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from libssa_tpu.ops.longpair_pallas import alphabet_planes
    from libssa_tpu.ops.mm_device import _pq_blocks
    from libssa_tpu.oracle import gap_qr
    from libssa_tpu.parallel.ring import ring_pair_score_banded
    from libssa_tpu.parallel.sharded import put_global

    rng = np.random.default_rng(61 + local)
    m, n, RB, CH = 100, 777, 64, 16
    q = rng.integers(0, 20, m).astype(np.uint8)
    s = rng.integers(0, 20, n).astype(np.uint8)
    K = alphabet_planes(q, s)
    Q, R = gap_qr(11, 1)
    B = RB // CH
    Rblocks = -(-m // RB)
    pq = _pq_blocks(q, B62.padded(), Rblocks, RB, B, K, CH)
    D = mesh.devices.size
    W = -(-n // D)
    s_pad = np.full((W * D,), K - 1, np.int64)
    s_pad[:n] = s
    subj = put_global(s_pad, mesh, P("d"), np.int32)
    pq_j = put_global(pq, mesh, P(), np.float32)
    got = int(
        ring_pair_score_banded(
            jnp.asarray(pq_j).astype(jnp.bfloat16), subj,
            gap_q=int(Q), gap_r=int(R), mesh=mesh, RB=RB, local=local,
            m_real=m, n_real=n, interpret=True,
        )
    )
    want = (oracle.sw_score if local else oracle.nw_score)(
        q, s, B62.scores, 11, 1
    )
    assert got == want


def test_banded_ring_matches_scan_ring(mesh):
    """Both ring formulations agree pairwise (and with the oracle)."""
    rng = np.random.default_rng(123)
    q = rng.integers(0, 20, 96).astype(np.uint8)
    s = rng.integers(0, 20, 555).astype(np.uint8)
    scan = ring_score(
        q, s, B62.padded(), 12, 2, local=True, mesh=mesh, RB=32,
        kernel="scan",
    )
    banded = ring_score(
        q, s, B62.padded(), 12, 2, local=True, mesh=mesh, RB=32,
        kernel="banded", interpret=True,
    )
    assert scan == banded == oracle.sw_score(q, s, B62.scores, 12, 2)


def test_ring_f32_window_escape(capsys):
    """Scores past the f32 window escape to the single-device exact path
    with a WARNING (review finding: both ring tile paths compute in f32
    and had no window guard, unlike longpair/tiled)."""
    from libssa_tpu import matrices, oracle
    from libssa_tpu.constants import SymType
    from libssa_tpu.parallel.ring import ring_score
    from libssa_tpu.util.logging import set_output_mode
    from libssa_tpu.constants import OutputMode

    mat = matrices.constant_scoring(2**25, -4, SymType.NUCLEOTIDE)
    rng = np.random.default_rng(3)
    q = rng.integers(0, 4, 40).astype(np.uint8)
    s = np.concatenate([q, rng.integers(0, 4, 20).astype(np.uint8)])
    want = oracle.sw_score(q, s, mat.scores, 10, 2)
    assert want > 2**24
    set_output_mode(OutputMode.WARNING)
    got = ring_score(q, s, mat.padded(), 10, 2, local=True)
    assert int(got) == int(want)
    assert "f32 exactness window" in capsys.readouterr().err
