"""Public API tests: the reference-style init_*/sw_align/nw_align flow."""
import numpy as np
import pytest

from libssa_tpu import alphabet, matrices, oracle
from libssa_tpu.api import SSAContext
from libssa_tpu.constants import (
    AlignType,
    BitWidth,
    ComputeMode,
    Strand,
    SymType,
)
from libssa_tpu.io import fasta

QUERY = "MKVLAAGIVGWKQTERNDCFYHH"
DB_RECORDS = [
    ("exact copy", QUERY),
    ("partial", "AAGIVGWKQTE"),
    ("unrelated", "PPPPPPPPWWPPPPP"),
    ("empty", ""),
    ("longer", "DDDD" + QUERY + "EEEE"),
]


@pytest.fixture
def ctx(tmp_path):
    db_path = tmp_path / "db.fas"
    fasta.write_fasta(str(db_path), DB_RECORDS)
    c = SSAContext()
    c.init_symbol_translation(SymType.AMINOACID, Strand.FORWARD, 1, 1)
    c.init_score_matrix("BLOSUM62")
    c.init_gap_penalties(10, 1)
    c.init_db_fasta(str(db_path))
    c.set_chunk_size(4)
    return c


def test_sw_score_search(ctx):
    q = ctx.init_sequence_fasta(QUERY)
    hits = ctx.sw_align(q, k=3, mode=ComputeMode.SCORE)
    assert len(hits) == 3
    qc = alphabet.encode(QUERY, SymType.AMINOACID)
    self_score = int(sum(matrices.builtin("BLOSUM62").scores[c, c] for c in qc))
    # best hits: the exact copy and the embedded copy tie at the full score
    assert hits[0].score == self_score
    assert {hits[0].header, hits[1].header} == {"exact copy", "longer"}
    assert hits[0].seq_id < hits[1].seq_id  # tie-break by id
    assert hits[0].cigar is None  # score-only


def test_sw_alignment_mode(ctx):
    q = ctx.init_sequence_fasta(QUERY)
    hits = ctx.sw_align(q, k=2, mode=ComputeMode.ALIGNMENT)
    top = hits[0]
    assert top.cigar == "M" * len(QUERY)
    assert (top.q_begin, top.q_end) == (0, len(QUERY))
    qrow, mid, srow = top.aligned
    assert qrow == QUERY and srow == QUERY
    assert mid == "|" * len(QUERY)


def test_nw_align(ctx):
    q = ctx.init_sequence_fasta(QUERY)
    hits = ctx.nw_align(q, k=5, mode=ComputeMode.ALIGNMENT)
    assert hits[0].header == "exact copy"
    # global alignment vs the 'longer' record must span the whole subject
    longer = next(h for h in hits if h.header == "longer")
    assert longer.s_begin == 0 and longer.s_end == len(DB_RECORDS[4][1])
    qc = alphabet.encode(QUERY, SymType.AMINOACID)
    sc = alphabet.encode(DB_RECORDS[4][1], SymType.AMINOACID)
    assert longer.score == oracle.nw_score(
        qc, sc, matrices.builtin("BLOSUM62").scores, 10, 1
    )


def test_query_from_fasta_file(ctx, tmp_path):
    qp = tmp_path / "q.fas"
    fasta.write_fasta(str(qp), [("my query", QUERY)])
    q = ctx.init_sequence_fasta(str(qp))
    assert q.header == "my query"
    assert len(q.sequences) == 1
    hits = ctx.sw_align(q, k=1)
    assert hits[0].score > 0


def test_nucleotide_both_strands(tmp_path):
    c = SSAContext()
    c.init_symbol_translation(SymType.NUCLEOTIDE, Strand.BOTH)
    c.init_constant_scoring(5, -4)
    c.init_gap_penalties(10, 2)
    target = "ACGTTTGCACGT"
    # DB contains the reverse complement of the query region
    rc = alphabet.decode(
        alphabet.reverse_complement(alphabet.encode(target, SymType.NUCLEOTIDE)),
        SymType.NUCLEOTIDE,
    )
    db_path = tmp_path / "nt.fas"
    fasta.write_fasta(str(db_path), [("fwd", target), ("rev", rc)])
    c.init_db_fasta(str(db_path))
    q = c.init_sequence_fasta(target)
    assert len(q.sequences) == 2
    hits = c.sw_align(q, k=2, mode=ComputeMode.ALIGNMENT)
    # both hit with the full match score, on opposite strands
    assert hits[0].score == hits[1].score == 5 * len(target)
    assert {h.strand for h in hits} == {"+", "-"}


def test_unconfigured_errors():
    c = SSAContext()
    q = c.init_sequence_fasta("MKVL")
    with pytest.raises(RuntimeError, match="init_db_fasta"):
        c.sw_align(q, 5)
    c.init_db_fasta(">a\nMKVL\n")
    with pytest.raises(RuntimeError, match="init_score_matrix"):
        c.sw_align(q, 5)


def test_matrix_symtype_mismatch():
    c = SSAContext()
    c.init_symbol_translation(SymType.NUCLEOTIDE)
    c.init_constant_scoring(1, -1)
    c.init_symbol_translation(SymType.AMINOACID)  # now inconsistent
    c.init_db_fasta(">a\nMKVL\n")
    q = c.init_sequence_fasta("MKVL")
    with pytest.raises(RuntimeError, match="matrix"):
        c.sw_align(q, 1)


def test_ssa_exit_resets(ctx):
    ctx.ssa_exit()
    assert ctx.db is None and ctx.matrix is None


def test_bit8_ladder_through_api(ctx):
    q = ctx.init_sequence_fasta(QUERY)
    hits8 = ctx.sw_align(q, k=3, bit_width=BitWidth.BIT8)
    hits_exact = ctx.sw_align(q, k=3, bit_width=BitWidth.EXACT)
    assert [(h.seq_id, h.score) for h in hits8] == [
        (h.seq_id, h.score) for h in hits_exact
    ]


def test_align_pair_one_vs_one(ctx):
    q = ctx.init_sequence_fasta(QUERY)
    a = ctx.align_pair(q, QUERY, AlignType.NW)
    qc = alphabet.encode(QUERY, SymType.AMINOACID)
    self_score = int(sum(matrices.builtin("BLOSUM62").scores[c, c] for c in qc))
    assert a.score == self_score
    assert a.cigar == "M" * len(QUERY)
    a2 = ctx.align_pair(q, "AAGIVGWKQTE", AlignType.SW)
    assert a2.score > 0 and a2.aligned is not None


class TestTranslatedSearch:
    PROT = "MKVLAAGWQTE"
    # Reverse-translate with unambiguous codons (standard code).
    CODONS = {
        "M": "ATG", "K": "AAA", "V": "GTT", "L": "CTT", "A": "GCT",
        "G": "GGT", "W": "TGG", "Q": "CAA", "T": "ACT", "E": "GAA",
    }

    def _nt(self, prot):
        return "".join(self.CODONS[c] for c in prot)

    def test_translated_query_vs_protein_db(self, tmp_path):
        """blastx-style: nucleotide query, protein DB."""
        c = SSAContext()
        c.init_symbol_translation(
            SymType.NUCLEOTIDE, Strand.BOTH, q_gencode=1,
            db_symtype=SymType.AMINOACID,
        )
        c.init_score_matrix("BLOSUM62")
        c.init_gap_penalties(10, 1)
        db_path = tmp_path / "prot.fas"
        fasta.write_fasta(str(db_path), [("target", self.PROT), ("junk", "PPPPPPP")])
        c.init_db_fasta(str(db_path))
        # query: the coding sequence with one leading base (frame +1)
        q = c.init_sequence_fasta("G" + self._nt(self.PROT))
        hits = c.sw_align(q, k=1, mode=ComputeMode.ALIGNMENT)
        top = hits[0]
        assert top.header == "target"
        assert top.strand == "+1"
        pc = alphabet.encode(self.PROT, SymType.AMINOACID)
        expect = int(sum(matrices.builtin("BLOSUM62").scores[x, x] for x in pc))
        assert top.score == expect
        assert top.aligned[2] == self.PROT

    def test_translated_db_vs_protein_query(self, tmp_path):
        """tblastn-style: protein query, nucleotide DB (six frames)."""
        c = SSAContext()
        c.init_symbol_translation(
            SymType.AMINOACID, Strand.FORWARD, d_gencode=1,
            db_symtype=SymType.NUCLEOTIDE,
        )
        c.init_score_matrix("BLOSUM62")
        c.init_gap_penalties(10, 1)
        nt = self._nt(self.PROT)
        rc = alphabet.decode(
            alphabet.reverse_complement(alphabet.encode(nt, SymType.NUCLEOTIDE)),
            SymType.NUCLEOTIDE,
        )
        db_path = tmp_path / "nt.fas"
        fasta.write_fasta(
            str(db_path),
            [("fwd0", nt), ("rev_strand", rc), ("fwd2", "GG" + nt), ("noise", "ACGT" * 10)],
        )
        c.init_db_fasta(str(db_path))
        q = c.init_sequence_fasta(self.PROT)
        hits = c.sw_align(q, k=3, mode=ComputeMode.ALIGNMENT)
        pc = alphabet.encode(self.PROT, SymType.AMINOACID)
        expect = int(sum(matrices.builtin("BLOSUM62").scores[x, x] for x in pc))
        by_header = {h.header: h for h in hits}
        assert by_header["fwd0"].score == expect
        assert by_header["fwd0"].db_frame == "+0"
        assert by_header["rev_strand"].score == expect
        assert by_header["rev_strand"].db_frame.startswith("-")
        assert by_header["fwd2"].db_frame == "+2"

    def test_query_input_validation(self, tmp_path):
        """Malformed/missing query files must raise, not silently search
        the letter-stripped path string as a sequence."""
        c = SSAContext()
        c.init_symbol_translation(SymType.AMINOACID)
        assert len(c.init_sequence_fasta("MKVLW").raw) == 5  # bare seq
        with pytest.raises(FileNotFoundError, match="does not exist"):
            c.init_sequence_fasta("no_such_query.fas")
        bad = tmp_path / "garbage.fas"
        bad.write_text("this is not fasta\njust text\n")
        with pytest.raises(ValueError):
            c.init_sequence_fasta(str(bad))
        empty = tmp_path / "empty.fas"
        empty.write_text("")
        with pytest.raises(ValueError, match="no FASTA records"):
            c.init_sequence_fasta(str(empty))

    def test_hit_count_edge_cases(self):
        c = SSAContext()
        c.init_symbol_translation(SymType.AMINOACID)
        c.init_score_matrix("BLOSUM62")
        c.init_gap_penalties(10, 1)
        c.init_db_fasta(">a\nMKVLAAGW\n>b\nMKVIGAGW\n")
        q = c.init_sequence_fasta("MKVLAAGW")
        assert len(c.sw_align(q, k=0)) == 0
        assert len(c.sw_align(q, k=100)) == 2  # clamped to DB size
        with pytest.raises(ValueError, match="k must be"):
            c.sw_align(q, k=-1)

    def test_host_fallback_drops_frameless_records(self, tmp_path):
        """A nucleotide record too short to translate (< 3 nt) must not
        surface as a sentinel-score hit when the translated search takes
        the exact host fallback (search_reduced -> None)."""
        c = SSAContext()
        c.init_symbol_translation(
            SymType.AMINOACID, Strand.FORWARD, d_gencode=1,
            db_symtype=SymType.NUCLEOTIDE,
        )
        c.init_score_matrix("BLOSUM62")
        c.init_gap_penalties(10, 1)
        nt = self._nt(self.PROT)
        db_path = tmp_path / "nt.fas"
        fasta.write_fasta(
            str(db_path),
            [("ok", nt), ("stub", "AC"), ("noise", "ACGT" * 10)],
        )
        c.init_db_fasta(str(db_path))
        q = c.init_sequence_fasta(self.PROT)
        want = [(h.header, h.score) for h in c.sw_align(q, k=5)]
        eng = c._get_engine()
        eng.search_reduced = lambda *a, **k: None  # force the host path
        hits = c.sw_align(q, k=5, mode=ComputeMode.ALIGNMENT)
        assert [(h.header, h.score) for h in hits] == want
        assert all(h.score > -(2**40) for h in hits)
        assert not any(h.header == "stub" for h in hits)

    def test_mismatched_alphabets_raise(self):
        c = SSAContext()
        c.init_symbol_translation(SymType.AMINOACID, db_symtype=SymType.AMINOACID)
        c.init_constant_scoring(1, -1)  # AA-typed? no: symtype is AA
        c.matrix = matrices.constant_scoring(1, -1, SymType.NUCLEOTIDE)
        c.init_db_fasta(">a\nMKVL\n")
        q = c.init_sequence_fasta("MKVL")
        with pytest.raises(RuntimeError, match="matrix"):
            c.sw_align(q, 1)


def test_align_many_matches_single(tmp_path):
    """Batched multi-query API equals per-query searches."""
    from pathlib import Path

    from libssa_tpu.api import SSAContext
    from libssa_tpu.io import fasta as _fasta

    DATA = Path(__file__).parent / "testdata"
    from libssa_tpu.constants import AlignType, BitWidth, ComputeMode, Strand, SymType

    ctx = SSAContext()
    ctx.init_symbol_translation(SymType.AMINOACID, Strand.FORWARD, 1, 1)
    ctx.init_score_matrix("BLOSUM62")
    ctx.init_gap_penalties(11, 1)
    ctx.init_db_fasta(str(DATA / "proteins.fas"))
    qf = tmp_path / "queries.fas"
    rec0 = next(iter(_fasta.iter_fasta(str(DATA / "query_prot.fas"))))
    qf.write_text(f">q1\n{rec0[1]}\n>q2\n{rec0[1][:40]}\n")
    queries = ctx.init_sequences_fasta(str(qf))
    assert [q.header for q in queries] == ["q1", "q2"]
    lists = ctx.align_many(queries, k=4, mode=ComputeMode.ALIGNMENT)
    for q, hl in zip(queries, lists):
        single = ctx.sw_align(q, 4, BitWidth.EXACT, ComputeMode.ALIGNMENT)
        assert [(h.seq_id, h.score, h.cigar) for h in hl] == [
            (h.seq_id, h.score, h.cigar) for h in single
        ]


def test_align_many_reverse_strand_label(tmp_path):
    """Batched fast path carries the query strand label (ADVICE r1)."""
    c = SSAContext()
    c.init_symbol_translation(SymType.NUCLEOTIDE, Strand.REVERSE)
    c.init_constant_scoring(5, -4)
    c.init_gap_penalties(10, 2)
    target = "ACGTTTGCACGTAA"
    rc = alphabet.decode(
        alphabet.reverse_complement(alphabet.encode(target, SymType.NUCLEOTIDE)),
        SymType.NUCLEOTIDE,
    )
    db_path = tmp_path / "nt.fas"
    fasta.write_fasta(str(db_path), [("rev", rc), ("other", "GGGGCCCCGGGG")])
    c.init_db_fasta(str(db_path))
    q = c.init_sequence_fasta(target)
    assert len(q.sequences) == 1 and q.sequences[0][0] == "-"
    lists = c.align_many([q], k=1, mode=ComputeMode.ALIGNMENT)
    single = c.sw_align(q, k=1, mode=ComputeMode.ALIGNMENT)
    assert lists[0][0].strand == "-" == single[0].strand
    assert lists[0][0].score == single[0].score


def test_score_mismatch_is_real_exception():
    """Score cross-checks must survive ``python -O`` (VERDICT r1 weak #3)."""
    import subprocess
    import sys

    from libssa_tpu.api import ScoreMismatchError, _check_scores_match

    with pytest.raises(ScoreMismatchError):
        _check_scores_match(41, 42)
    _check_scores_match(7, 7)  # equal scores pass
    code = (
        # JAX_PLATFORMS=cpu alone is ignored under the axon plugin (see
        # conftest): force CPU via jax.config so a busy/wedged TPU tunnel
        # can't hang this subprocess.
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from libssa_tpu.api import ScoreMismatchError, _check_scores_match\n"
        "try:\n"
        "    _check_scores_match(1, 2)\n"
        "except ScoreMismatchError:\n"
        "    print('RAISED')\n"
    )
    out = subprocess.run(
        [sys.executable, "-O", "-c", code],
        capture_output=True, text=True, timeout=120,
        env={**__import__('os').environ, "JAX_PLATFORMS": "cpu"},
    )
    assert "RAISED" in out.stdout, out.stderr


def test_engine_caches_are_bounded():
    """Device/host stack caches must not grow without bound (VERDICT r1 weak #6)."""
    import numpy as np

    from libssa_tpu.io.db import SequenceDB
    from libssa_tpu.search.manager import SearchEngine

    rng = np.random.default_rng(7)
    seqs = [rng.integers(0, 24, size=30).astype(np.uint8) for _ in range(40)]
    db = SequenceDB.from_sequences(
        [f"s{i}" for i in range(40)], seqs, SymType.AMINOACID
    )
    eng = SearchEngine(db, matrices.builtin("BLOSUM62"), 10, 1)
    for bs in (8, 16, 24, 32, 48):
        eng._stacks_on_device(db, bs)
        db.grouped_stacks(bs)
    assert len(eng._device_stacks) <= 2
    assert len(db._stack_cache) <= 2
    # LRU: the most recent key survives
    assert (48, eng.params.length_multiple) in eng._device_stacks


def test_gap_convention_knob(tmp_path):
    """Both Gotoh gap conventions work end-to-end (SURVEY App. A)."""
    import numpy as np

    rng = np.random.default_rng(33)
    seqs = [
        alphabet.decode(rng.integers(0, 20, 30).astype(np.uint8),
                        SymType.AMINOACID)
        for _ in range(12)
    ]
    db_path = tmp_path / "p.fas"
    fasta.write_fasta(str(db_path), [(f"s{i}", s) for i, s in enumerate(seqs)])
    qs = alphabet.decode(rng.integers(0, 20, 25).astype(np.uint8),
                         SymType.AMINOACID)
    results = {}
    for fro in (True, False):
        c = SSAContext()
        c.init_symbol_translation(SymType.AMINOACID)
        c.init_score_matrix("BLOSUM62")
        c.init_gap_penalties(10, 1, first_residue_opens=fro)
        c.init_db_fasta(str(db_path))
        q = c.init_sequence_fasta(qs)
        hits = c.sw_align(q, 5, mode=ComputeMode.ALIGNMENT)
        # oracle cross-check under the same convention
        for h in hits:
            want = oracle.sw_align(
                alphabet.encode(qs, SymType.AMINOACID),
                alphabet.encode(seqs[h.seq_id], SymType.AMINOACID),
                c.matrix.scores, 10, 1, first_residue_opens=fro,
            ).score
            assert h.score == want
        results[fro] = [(h.seq_id, h.score) for h in hits]
    # the two conventions genuinely differ on gapped alignments
    assert results[True] != results[False] or all(
        s == results[True][i][1] for i, (_, s) in enumerate(results[False])
    )


def test_set_device_count_sharded_api(tmp_path):
    """API-level mesh search == single-device, SW/NW/translated (r2)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    rng = __import__("numpy").random.default_rng(44)
    import numpy as np

    seqs = [
        alphabet.decode(rng.integers(0, 20, int(n)).astype(np.uint8),
                        SymType.AMINOACID)
        for n in rng.integers(10, 60, size=30)
    ]
    db_path = tmp_path / "p.fas"
    fasta.write_fasta(str(db_path), [(f"s{i}", s) for i, s in enumerate(seqs)])

    def run(devices):
        c = SSAContext()
        c.init_symbol_translation(SymType.AMINOACID)
        c.init_score_matrix("BLOSUM62")
        c.init_gap_penalties(10, 1)
        if devices:
            c.set_device_count(devices)
        c.init_db_fasta(str(db_path))
        q = c.init_sequence_fasta(
            alphabet.decode(rng0.integers(0, 20, 23).astype(np.uint8),
                            SymType.AMINOACID))
        out = {}
        out["sw"] = [(h.seq_id, h.score) for h in c.sw_align(q, 5)]
        out["nw"] = [(h.seq_id, h.score) for h in c.nw_align(q, 5)]
        return out

    rng0 = __import__("numpy").random.default_rng(45)
    single = run(None)
    rng0 = __import__("numpy").random.default_rng(45)
    sharded = run(2)
    assert single == sharded

    # translated (nt query vs protein DB) through the sharded engine
    def run_tr(devices):
        c = SSAContext()
        c.init_symbol_translation(
            SymType.NUCLEOTIDE, Strand.BOTH, db_symtype=SymType.AMINOACID
        )
        c.init_score_matrix("BLOSUM62")
        c.init_gap_penalties(10, 1)
        if devices:
            c.set_device_count(devices)
        c.init_db_fasta(str(db_path))
        q = c.init_sequence_fasta("ATGGCTGCTTGGAAACAAACCGAAATG")
        return [(h.seq_id, h.score, h.strand) for h in c.sw_align(q, 4)]

    assert run_tr(None) == run_tr(2)


def test_fanout_bit_width_faithful_ladder(tmp_path):
    """A narrow bit_width on a fan-out (multi-strand) search runs the
    FAITHFUL ladder surface (VERDICT r3 missing #2): real rescored rung
    statistics, hit lists bit-identical to EXACT, and no notice path."""
    from libssa_tpu.constants import BitWidth

    c = SSAContext()
    c.init_symbol_translation(SymType.NUCLEOTIDE, Strand.BOTH)
    c.init_constant_scoring(5, -4)
    c.init_gap_penalties(10, 2)
    rng = np.random.default_rng(8)
    recs = [
        (f"n{i}", alphabet.decode(
            rng.integers(0, 4, 80).astype(np.uint8), SymType.NUCLEOTIDE))
        for i in range(12)
    ]
    db_path = tmp_path / "nt.fas"
    fasta.write_fasta(str(db_path), recs)
    c.init_db_fasta(str(db_path))
    # query == record 3: a perfect 80-nt self-match scores 400 > 255, so
    # the BIT8 window genuinely overflows and the rung statistic is real.
    q = c.init_sequence_fasta(recs[3][1])

    want = c.sw_align(q, k=5)  # exact
    got = c.sw_align(q, k=5, bit_width=BitWidth.BIT8)
    assert [(h.score, h.seq_id, h.strand) for h in got] == [
        (h.score, h.seq_id, h.strand) for h in want
    ]
    assert got[0].score == 400  # perfect self-match, forward strand
    # Two strands -> the frame-fanout sweep: the rung stat counts DB
    # ENTRIES (unit rides in the key — SearchStats docstring).
    assert got.stats.rescored.get("limit>255/entries", 0) >= 1
    assert not got.stats.notes  # the r2 notice path is gone
    assert not want.stats.rescored  # exact requests report no rungs
    # BIT16: 400 < 32767 — nothing leaves the window.
    got16 = c.sw_align(q, k=5, bit_width=BitWidth.BIT16)
    assert [(h.score, h.seq_id) for h in got16] == [
        (h.score, h.seq_id) for h in want
    ]
    assert not got16.stats.rescored


def test_align_pair_score_only(tmp_path):
    """mode=SCORE routes the pair through ops.longpair — same score."""
    import numpy as np

    from libssa_tpu import api, alphabet, matrices, oracle
    from libssa_tpu.constants import AlignType, ComputeMode, SymType

    rng = np.random.default_rng(21)
    qs = "".join(rng.choice(list("ARNDCQEGHILKMFPSTWYV"), 120))
    ss = "".join(rng.choice(list("ARNDCQEGHILKMFPSTWYV"), 150))
    ctx = api.SSAContext()
    ctx.init_symbol_translation(SymType.AMINOACID)
    ctx.init_score_matrix("BLOSUM62")
    ctx.init_gap_penalties(10, 1)
    q = ctx.init_sequence_fasta(qs)
    B62 = matrices.builtin("BLOSUM62")
    qc = alphabet.encode(qs, SymType.AMINOACID)
    sc = alphabet.encode(ss, SymType.AMINOACID)
    for at, fn in ((AlignType.SW, oracle.sw_score), (AlignType.NW, oracle.nw_score)):
        full = ctx.align_pair(q, ss, at)
        score = ctx.align_pair(q, ss, at, mode=ComputeMode.SCORE)
        want = fn(qc, sc, B62.scores, 10, 1)
        assert score.score == full.score == want
        assert score.cigar is None  # no traceback computed


def test_align_many_bit_width_faithful(tmp_path):
    """align_many honors narrow bit widths on the batched sweep (r4):
    rung stats in the batch-level stats, hits bit-identical to EXACT."""
    from libssa_tpu.constants import BitWidth

    c = SSAContext()
    c.init_symbol_translation(SymType.AMINOACID)
    c.init_score_matrix("BLOSUM62")
    c.init_gap_penalties(10, 1)
    rng = np.random.default_rng(9)
    recs = [
        (f"p{i}", alphabet.decode(
            rng.integers(0, 20, 120).astype(np.uint8), SymType.AMINOACID))
        for i in range(10)
    ]
    db_path = tmp_path / "aa.fas"
    fasta.write_fasta(str(db_path), recs)
    c.init_db_fasta(str(db_path))
    # Queries include a DB copy: a 120-residue self-match scores >= 480
    # (min BLOSUM62 diagonal 4) > 255 -> a genuine 8-bit window escape.
    queries = [c.init_sequence_fasta(recs[2][1]),
               c.init_sequence_fasta(recs[7][1])]
    want = c.align_many(queries, k=4)
    got = c.align_many(queries, k=4, bit_width=BitWidth.BIT8)
    for w, g in zip(want, got):
        assert [(h.score, h.seq_id) for h in g] == [
            (h.score, h.seq_id) for h in w
        ]
    # Batched sweep: the rung stat counts (query, subject) PAIRS (unit
    # rides in the key — SearchStats docstring).
    assert got[0].stats.rescored.get("limit>255/pairs", 0) >= 2
    assert not want[0].stats.rescored
