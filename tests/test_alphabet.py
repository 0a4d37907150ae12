"""Symbol-translation tests (reference: util_sequence suite)."""
import numpy as np
import pytest

from libssa_tpu import alphabet
from libssa_tpu.constants import SymType


def test_aa_roundtrip():
    seq = "ARNDCQEGHILKMFPSTWYVBZX*"
    codes = alphabet.encode(seq, SymType.AMINOACID)
    np.testing.assert_array_equal(codes, np.arange(24, dtype=np.uint8))
    assert alphabet.decode(codes, SymType.AMINOACID) == seq


def test_aa_lowercase_and_unknown():
    codes = alphabet.encode("acdU O?J", SymType.AMINOACID)
    # whitespace/punctuation stripped; U, O, J map to X
    assert alphabet.decode(codes, SymType.AMINOACID) == "ACDXXX"


def test_nt_roundtrip_and_u():
    codes = alphabet.encode("ACGTU", SymType.NUCLEOTIDE)
    assert alphabet.decode(codes, SymType.NUCLEOTIDE) == "ACGTT"


def test_reverse_complement():
    codes = alphabet.encode("ACGTRYSWKMBDHVN", SymType.NUCLEOTIDE)
    rc = alphabet.reverse_complement(codes)
    assert alphabet.decode(rc, SymType.NUCLEOTIDE) == "NBDHVKMWSRYACGT"
    # involution
    np.testing.assert_array_equal(alphabet.reverse_complement(rc), codes)


def test_translate_standard():
    # ATG GCC TAA -> M A *
    codes = alphabet.encode("ATGGCCTAA", SymType.NUCLEOTIDE)
    aa = alphabet.translate(codes, gencode=1)
    assert alphabet.decode(aa, SymType.AMINOACID) == "MA*"


def test_translate_ambiguous_codon():
    codes = alphabet.encode("ATGNNN", SymType.NUCLEOTIDE)
    aa = alphabet.translate(codes, gencode=1)
    assert alphabet.decode(aa, SymType.AMINOACID) == "MX"


def test_translate_mito_differs():
    # AGA: Arg (R) in standard code, STOP (*) in vertebrate mito (table 2).
    codes = alphabet.encode("AGA", SymType.NUCLEOTIDE)
    assert alphabet.decode(alphabet.translate(codes, 1), SymType.AMINOACID) == "R"
    assert alphabet.decode(alphabet.translate(codes, 2), SymType.AMINOACID) == "*"


def test_six_frames():
    codes = alphabet.encode("ATGGCCTAAG", SymType.NUCLEOTIDE)
    frames = alphabet.six_frames(codes)
    assert len(frames) == 6
    assert alphabet.decode(frames[0], SymType.AMINOACID) == "MA*"
    # frame lengths shrink by one codon as the offset eats bases
    assert [len(f) for f in frames[:3]] == [3, 3, 2]


def test_extended_genetic_codes():
    """Distinctive codons of the extended NCBI tables + legacy identity."""
    from libssa_tpu.alphabet import _NCBI_TABLES

    # Previously shipped literal tables must reproduce from the diffs.
    assert _NCBI_TABLES[2] == "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIMMTTTTNNKKSS**VVVVAAAADDEEGGGG"
    assert _NCBI_TABLES[5] == "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIMMTTTTNNKKSSSSVVVVAAAADDEEGGGG"

    def tr(codon, gc):
        codes = alphabet.encode(codon, SymType.NUCLEOTIDE)
        return alphabet.decode(alphabet.translate(codes, gc), SymType.AMINOACID)

    for codon, gc, want in [
        ("TAA", 6, "Q"), ("TGA", 10, "C"), ("CTG", 12, "S"),
        ("AGA", 13, "G"), ("TAA", 14, "Y"), ("TAG", 16, "L"),
        ("AGG", 24, "K"), ("TGA", 25, "G"), ("AAA", 9, "N"),
        ("TCA", 22, "*"), ("TTA", 23, "*"), ("ATA", 21, "M"),
    ]:
        assert tr(codon, gc) == want, (codon, gc)

    with pytest.raises(ValueError):
        alphabet.genetic_code_table(7)  # never assigned by NCBI
