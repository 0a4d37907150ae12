"""FASTA / packed-DB tests (reference: db_adapter + libsdb behavior)."""
import numpy as np
import pytest

from libssa_tpu import alphabet
from libssa_tpu.constants import SymType
from libssa_tpu.io import fasta
from libssa_tpu.io.db import PAD_CODE, SequenceDB
from libssa_tpu.io.native import native_available, parse_fasta_native

FASTA_TEXT = """>seq1 first record
MKVLAAGW
KQTE
>seq2
ACDEFGHIKLMNPQRSTVWY

>seq3 empty is legal
"""


def test_iter_fasta_text():
    recs = list(fasta.iter_fasta(FASTA_TEXT))
    assert [h for h, _ in recs] == ["seq1 first record", "seq2", "seq3 empty is legal"]
    assert recs[0][1] == "MKVLAAGWKQTE"
    assert recs[1][1] == "ACDEFGHIKLMNPQRSTVWY"
    assert recs[2][1] == ""


def test_iter_fasta_file(tmp_path):
    p = tmp_path / "db.fas"
    p.write_text(FASTA_TEXT)
    assert list(fasta.iter_fasta(str(p))) == list(fasta.iter_fasta(FASTA_TEXT))


def test_iter_fasta_rejects_headerless(tmp_path):
    p = tmp_path / "bad.fas"
    p.write_text("MKVL\n>late header\nACDE\n")
    with pytest.raises(ValueError):
        list(fasta.iter_fasta(str(p)))


def test_iter_fasta_not_a_file():
    with pytest.raises(FileNotFoundError):
        list(fasta.iter_fasta("/nonexistent/path.fas"))


def _mkdb(n=10, seed=0, minlen=3, maxlen=40):
    rng = np.random.default_rng(seed)
    seqs = [
        rng.integers(0, 20, int(rng.integers(minlen, maxlen))).astype(np.uint8)
        for _ in range(n)
    ]
    headers = [f"s{i}" for i in range(n)]
    return SequenceDB.from_sequences(headers, seqs, SymType.AMINOACID), seqs


class TestSequenceDB:
    def test_pack_roundtrip(self):
        db, seqs = _mkdb()
        assert len(db) == len(seqs)
        for i, s in enumerate(seqs):
            np.testing.assert_array_equal(db.sequence(i), s)
        assert db.total_residues == sum(len(s) for s in seqs)

    def test_chunks_cover_all_sequences(self):
        db, seqs = _mkdb(23)
        seen = []
        for chunk in db.chunks(batch_size=8, length_multiple=16):
            assert chunk.codes.shape[0] == 8
            assert chunk.codes.shape[1] % 16 == 0
            for lane in range(8):
                sid = int(chunk.seq_ids[lane])
                if sid < 0:
                    assert chunk.lengths[lane] == 0
                    continue
                seen.append(sid)
                n = int(chunk.lengths[lane])
                np.testing.assert_array_equal(chunk.codes[lane, :n], seqs[sid])
                assert (chunk.codes[lane, n:] == PAD_CODE).all()
        assert sorted(seen) == list(range(23))

    def test_chunks_length_sorted(self):
        db, _ = _mkdb(50)
        maxima = [c.lengths.max() for c in db.chunks(batch_size=8)]
        assert maxima == sorted(maxima)

    def test_shards_partition(self):
        db, _ = _mkdb(17)
        shards = [db.shard(i, 4) for i in range(4)]
        assert sum(len(s) for s in shards) == 17
        all_headers = sorted(h for s in shards for h in s.headers)
        assert all_headers == sorted(db.headers)

    def test_subset_tracks_ids(self):
        db, seqs = _mkdb(12)
        ids = np.array([3, 7, 11], dtype=np.int32)
        sub = db.subset(ids)
        np.testing.assert_array_equal(sub.subset_ids, ids)
        np.testing.assert_array_equal(sub.sequence(1), seqs[7])

    def test_long_sequence_split(self):
        db, seqs = _mkdb(30, maxlen=100)
        cut = 50
        long_ids = db.long_sequence_ids(cut)
        short = [
            int(s)
            for c in db.chunks(4, max_length=cut)
            for s in c.seq_ids
            if s >= 0
        ]
        assert sorted(short + list(long_ids)) == list(range(30))

    def test_cache_roundtrip(self, tmp_path):
        recs = [("a b", "MKVL"), ("c", "WWWW"), ("d", "")]
        p = tmp_path / "db.fas"
        fasta.write_fasta(str(p), recs)
        db1 = SequenceDB.from_fasta(str(p), SymType.AMINOACID)
        cache = SequenceDB._cache_path(str(p), SymType.AMINOACID)
        import os

        assert os.path.exists(cache)
        db2 = SequenceDB.from_fasta(str(p), SymType.AMINOACID)
        assert db2.headers == db1.headers == ["a b", "c", "d"]
        np.testing.assert_array_equal(db1.codes, db2.codes)
        np.testing.assert_array_equal(db1.lengths, db2.lengths)


@pytest.mark.skipif(not native_available(), reason="native libfastadb.so not built")
class TestNativeParser:
    def test_native_matches_python(self, tmp_path):
        rng = np.random.default_rng(3)
        recs = []
        for i in range(50):
            n = int(rng.integers(0, 200))
            seq = "".join(rng.choice(list("ARNDCQEGHILKMFPSTWYVBZX*"), n))
            recs.append((f"seq{i} desc with spaces {i}", seq))
        p = tmp_path / "db.fas"
        fasta.write_fasta(str(p), recs, width=37)
        got = parse_fasta_native(str(p), SymType.AMINOACID)
        assert got is not None
        codes, offsets, lengths, headers = got
        py_headers, py_seqs = fasta.read_fasta_encoded(str(p), SymType.AMINOACID)
        assert headers == py_headers
        np.testing.assert_array_equal(lengths, [len(s) for s in py_seqs])
        db = SequenceDB(codes, offsets, lengths, headers, SymType.AMINOACID)
        for i, s in enumerate(py_seqs):
            np.testing.assert_array_equal(db.sequence(i), s)

    def test_native_matches_python_on_messy_input(self, tmp_path):
        """Line-based header rule parity: mid-line '>' is sequence
        content (dropped by both filters), leading blank lines are fine,
        digits/gaps/whitespace are stripped identically."""
        messy = (
            "\n  \n"                      # leading whitespace-only lines
            ">first record\n"
            "MKV9L-AA GW\n"               # digits, gaps, spaces stripped
            "TE>ST\n"                     # mid-line '>' is NOT a header
            ">second\r\n"                 # CRLF
            "ARND\r\nCQEG\n"
            ">empty-seq\n"
            ">last\n*WW*\n"
        )
        p = tmp_path / "messy.fas"
        p.write_text(messy)
        got = parse_fasta_native(str(p), SymType.AMINOACID)
        assert got is not None
        codes, offsets, lengths, headers = got
        py_headers, py_seqs = fasta.read_fasta_encoded(str(p), SymType.AMINOACID)
        assert headers == py_headers == ["first record", "second", "empty-seq", "last"]
        np.testing.assert_array_equal(lengths, [len(s) for s in py_seqs])
        db = SequenceDB(codes, offsets, lengths, headers, SymType.AMINOACID)
        for i, s in enumerate(py_seqs):
            np.testing.assert_array_equal(db.sequence(i), s)

    def test_native_cr_only_and_blank_led_headers(self, tmp_path):
        """Review-caught parity holes: lone-'\\r' (classic Mac) line
        terminators used to make the native header skip consume the rest
        of the file (zero-length records), ' >hdr' lines are headers in
        Python (it strips before testing '>'), and headers are trimmed
        of surrounding blanks like Python's line[1:].strip()."""
        messy = (
            ">first rec\rMKVL\rAAGW\r"     # CR-only file
            "  >  second padded  \r"       # blank-led + padded header
            "ARND\r"
        )
        p = tmp_path / "cr.fas"
        p.write_bytes(messy.encode())      # binary: keep the lone CRs
        got = parse_fasta_native(str(p), SymType.AMINOACID)
        assert got is not None
        codes, offsets, lengths, headers = got
        py_headers, py_seqs = fasta.read_fasta_encoded(str(p), SymType.AMINOACID)
        assert headers == py_headers == ["first rec", "second padded"]
        np.testing.assert_array_equal(lengths, [len(s) for s in py_seqs])
        np.testing.assert_array_equal(lengths, [8, 4])
        db = SequenceDB(codes, offsets, lengths, headers, SymType.AMINOACID)
        for i, s in enumerate(py_seqs):
            np.testing.assert_array_equal(db.sequence(i), s)

    def test_native_empty_file(self, tmp_path):
        p = tmp_path / "empty.fas"
        p.write_text("")
        codes, offsets, lengths, headers = parse_fasta_native(str(p), SymType.AMINOACID)
        assert len(lengths) == 0 and len(codes) == 0

    def test_native_used_by_from_fasta(self, tmp_path):
        p = tmp_path / "db.fas"
        fasta.write_fasta(str(p), [("h1", "MKVL"), ("h2", "ACDE")])
        db = SequenceDB.from_fasta(str(p), SymType.AMINOACID, use_cache=False)
        assert db.headers == ["h1", "h2"]
        np.testing.assert_array_equal(
            db.sequence(0), alphabet.encode("MKVL", SymType.AMINOACID)
        )


def test_adaptive_lane_chunks_long_outlier():
    """A long outlier must not force full-width lanes at its length."""
    import numpy as np

    from libssa_tpu.constants import SymType
    from libssa_tpu.io.db import SequenceDB

    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 20, 100).astype(np.uint8) for _ in range(2047)]
    seqs.append(rng.integers(0, 20, 30_000).astype(np.uint8))  # outlier
    db = SequenceDB.from_sequences([f"s{i}" for i in range(2048)], seqs, SymType.AMINOACID)
    chunks = list(db.chunks(2048, 64))
    # Every sequence present exactly once.
    ids = np.concatenate([c.seq_ids[c.seq_ids >= 0] for c in chunks])
    assert sorted(ids.tolist()) == list(range(2048))
    # The outlier's chunk must have few lanes; total padded cells bounded.
    outlier_chunk = next(c for c in chunks if 2047 in c.seq_ids.tolist())
    assert outlier_chunk.codes.shape[0] <= 64
    total_cells = sum(c.codes.shape[0] * c.codes.shape[1] for c in chunks)
    assert total_cells < 2048 * 1024 * 3  # far below 2048 lanes x 32768


def test_bucket_ladder_properties():
    """The r3 refined ladder: monotone, bounded shape set, documented steps."""
    from libssa_tpu.io.db import SequenceDB

    lad = SequenceDB._LADDER
    assert lad == sorted(lad) and len(lad) == len(set(lad))
    assert lad[0] == 320 and lad[-1] == 65536
    # Step widths: 64 through 1024, then doubling per octave.
    for lo, hi, step in ((320, 1024, 64), (1025, 2048, 128),
                         (2049, 4096, 256), (4097, 8192, 512),
                         (8193, 16384, 1024), (16385, 65536, 2048)):
        band = [x for x in lad if lo <= x <= hi]
        assert band and all(b % step == 0 for b in band)
        assert all(b2 - b1 == step for b1, b2 in zip(band, band[1:]))
    # _bucket_length: snaps up to the tightest rung; pow2 below 256;
    # beyond the ladder it rounds to a 256-multiple (those lengths route
    # to the long-pair path anyway).
    bl = SequenceDB._bucket_length
    assert bl(100, 32, True) == 128
    assert bl(256, 32, True) == 256
    assert bl(257, 32, True) == 320
    assert bl(320, 32, True) == 320
    assert bl(321, 32, True) == 384
    assert bl(1025, 32, True) == 1152
    assert bl(70_000, 32, True) % 256 == 0 and bl(70_000, 32, True) >= 70_000
    assert bl(300, 32, False) == 320  # multiple-of-32 mode unchanged


def test_translated_db_matches_per_record_loop(tmp_path):
    """Vectorized six-frame expansion == the naive per-record loop (r2)."""
    import numpy as np

    from libssa_tpu import alphabet
    from libssa_tpu.constants import SymType
    from libssa_tpu.io import fasta
    from libssa_tpu.io.db import SequenceDB

    rng = np.random.default_rng(5)
    # include ambiguity codes (codes 0..15) and short records (< 3 nt)
    seqs = [
        rng.integers(0, 15, int(n)).astype(np.uint8)
        for n in [1, 2, 3, 4, 7, 30, 61, 0, 5]
        if n > 0
    ]
    for gencode in (1, 2, 11):
        db = SequenceDB.from_sequences(
            [f"r{i}" for i in range(len(seqs))], seqs, SymType.NUCLEOTIDE
        )
        tdb, orig, labels = db.translated(gencode)
        # naive reference expansion
        want_seqs, want_orig, want_labels = [], [], []
        for i, nt in enumerate(seqs):
            for lab, src in (("+", nt), ("-", alphabet.reverse_complement(nt))):
                for f in range(3):
                    aa = alphabet.translate(src[f:], gencode)
                    if len(aa):
                        want_seqs.append(aa)
                        want_orig.append(i)
                        want_labels.append(f"{lab}{f}")
        assert len(tdb) == len(want_seqs)
        assert orig.tolist() == want_orig
        assert labels == want_labels
        for e in range(len(tdb)):
            np.testing.assert_array_equal(tdb.sequence(e), want_seqs[e])

    # cache roundtrip: second call loads the persisted npz
    nt_text = "\n".join(
        f">r{i}\n{alphabet.decode(s, SymType.NUCLEOTIDE)}" for i, s in enumerate(seqs)
    )
    p = tmp_path / "nt.fas"
    p.write_text(nt_text + "\n")
    db1 = SequenceDB.from_fasta(str(p), SymType.NUCLEOTIDE)
    t1, o1, l1 = db1.translated(1)
    import os
    assert os.path.exists(str(p) + ".aa1.ssadb6.npz")
    db2 = SequenceDB.from_fasta(str(p), SymType.NUCLEOTIDE)
    t2, o2, l2 = db2.translated(1)
    np.testing.assert_array_equal(t1.codes, t2.codes)
    np.testing.assert_array_equal(o1, o2)
    assert l1 == l2


@pytest.mark.parametrize("pow2", [True, False])
@pytest.mark.parametrize("mult", [32, 64])
def test_bucket_lengths_vec_matches_scalar(pow2, mult):
    """The vectorized bucket rule (review fix: the per-sequence Python
    loop cost seconds of plan time at Swiss-Prot scale) is element-for-
    element the scalar _bucket_length."""
    lengths = np.concatenate([
        np.arange(1, 600),
        np.array([1023, 1024, 1025, 4096, 4097, 65536, 65537, 200_000]),
    ])
    got = SequenceDB._bucket_lengths_vec(lengths, mult, pow2)
    want = [SequenceDB._bucket_length(int(n), mult, pow2) for n in lengths]
    np.testing.assert_array_equal(got, want)
