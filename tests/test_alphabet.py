"""Symbol-translation tests (reference: util_sequence suite)."""
import numpy as np

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
