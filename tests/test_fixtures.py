"""End-to-end searches over the bundled FASTA fixtures (SURVEY.md §4).

Mirrors the reference's bundled-testdata strategy: fixed small databases
with planted structure, searched through the full public API. Locks both
behavior (family members rank first; strand detection works) and the exact
fixture contents (hash), so a regression in any layer — parsing, packing,
kernels, ladder, top-k — surfaces here.
"""
import hashlib
import os

import pytest

from libssa_tpu.api import SSAContext
from libssa_tpu.constants import BitWidth, ComputeMode, Strand, SymType

DATA = os.path.join(os.path.dirname(__file__), "testdata")


def _p(name):
    return os.path.join(DATA, name)


def test_fixture_integrity():
    hashes = {
        "proteins.fas": "?",
        "nucleotides.fas": "?",
    }
    for name in hashes:
        digest = hashlib.sha256(open(_p(name), "rb").read()).hexdigest()[:16]
        hashes[name] = digest
    assert hashes == {
        "proteins.fas": "6fcb32fbca252fd4",
        "nucleotides.fas": "6f68429beca33c07",
    }


@pytest.fixture
def prot_ctx():
    c = SSAContext()
    c.init_symbol_translation(SymType.AMINOACID)
    c.init_score_matrix("BLOSUM62")
    c.init_gap_penalties(10, 1)
    c.init_db_fasta(_p("proteins.fas"))
    return c


def test_protein_family_search(prot_ctx):
    q = prot_ctx.init_sequence_fasta(_p("query_prot.fas"))
    assert q.header.startswith("QCORE")
    hits = prot_ctx.sw_align(q, k=8, bit_width=BitWidth.BIT8,
                             mode=ComputeMode.ALIGNMENT)
    # The four family-A members (ids 3, 19, 35, 51) must rank first.
    family = {3, 19, 35, 51}
    assert {h.seq_id for h in hits[:4]} == family
    # and score far above the random background.
    assert hits[3].score > 2 * hits[4].score
    for h in hits[:4]:
        assert h.cigar is not None and h.aligned is not None


def test_protein_ladder_widths_agree(prot_ctx):
    q = prot_ctx.init_sequence_fasta(_p("query_prot.fas"))
    results = {}
    for bw in (BitWidth.BIT8, BitWidth.BIT16, BitWidth.EXACT):
        hits = prot_ctx.sw_align(q, k=10, bit_width=bw)
        results[bw] = [(h.seq_id, h.score) for h in hits]
    assert results[BitWidth.BIT8] == results[BitWidth.BIT16] == results[BitWidth.EXACT]


def test_nucleotide_both_strand_search():
    c = SSAContext()
    c.init_symbol_translation(SymType.NUCLEOTIDE, Strand.BOTH)
    c.init_constant_scoring(5, -4)
    c.init_gap_penalties(10, 2)
    c.init_db_fasta(_p("nucleotides.fas"))
    q = c.init_sequence_fasta(_p("query_nt.fas"))
    hits = c.sw_align(q, k=2)
    # id 5 carries the motif forward, id 21 carries its reverse complement.
    assert {h.seq_id for h in hits} == {5, 21}
    assert hits[0].score == hits[1].score == 5 * 60
    strands = {h.seq_id: h.strand for h in hits}
    assert strands[5] == "+" and strands[21] == "-"
