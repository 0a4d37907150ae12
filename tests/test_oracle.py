"""Scalar oracle tests: hand-computed alignments + structural properties.

Mirrors the reference's oracle pattern (SURVEY.md §4): tiny hand-checked
cases lock the recurrences; property tests lock the invariants every other
kernel is later compared against.
"""
import numpy as np
import pytest

from libssa_tpu import alphabet, matrices, oracle
from libssa_tpu.constants import SymType


def aa(s):
    return alphabet.encode(s, SymType.AMINOACID)


def nt(s):
    return alphabet.encode(s, SymType.NUCLEOTIDE)


B62 = matrices.builtin("BLOSUM62").scores
CONST = matrices.constant_scoring(2, -3).scores
MATCH1 = matrices.constant_scoring(1, -1).scores


class TestHandComputed:
    def test_identical_no_gaps(self):
        q = aa("WCW")
        # W/W=11, C/C=9 -> 31 both local and global
        assert oracle.sw_score(q, q, B62, 10, 1) == 31
        assert oracle.nw_score(q, q, B62, 10, 1) == 31

    def test_sw_picks_best_single_match(self):
        # BLOSUM62: A/C=0, A/A=4, C/C=9 -> best local cell is C-C = 9
        assert oracle.sw_score(aa("AC"), aa("CA"), B62, 10, 1) == 9

    def test_nw_mismatch_only(self):
        # A-C then C-A, both score 0 in BLOSUM62; gaps are worse.
        assert oracle.nw_score(aa("AC"), aa("CA"), B62, 10, 1) == 0

    def test_nw_affine_gap(self):
        # AAAA vs AA, const(match=2, mm=-3), open=3 ext=1 (Q=4, R=1):
        # two matches + one gap of length 2 = 4 - (3 + 2) = -1
        assert oracle.nw_score(nt("AAAA"), nt("AA"), CONST, 3, 1) == -1

    def test_nw_two_gaps_vs_one(self):
        # q=ACCA s=AA: best is one internal gap of len 2: 2+2-(3+2) = -1,
        # beats aligning CC as mismatches (2+2-3-3=-2).
        assert oracle.nw_score(nt("ACCA"), nt("AA"), CONST, 3, 1) == -1

    def test_gattaca_linear_gap(self):
        # Classic example: NW(GATTACA, GCATGCT), match 1, mismatch -1,
        # linear gap 1 (open=0, ext=1) -> score 0.
        assert oracle.nw_score(nt("GATTACA"), nt("GCATGCT"), MATCH1, 0, 1) == 0

    def test_empty_sequences(self):
        assert oracle.sw_score(nt(""), nt("ACGT"), CONST, 3, 1) == 0
        assert oracle.nw_score(nt(""), nt(""), CONST, 3, 1) == 0
        # NW vs empty: one gap spanning the sequence, Q=4 R=1, len 4 -> -(4+3)
        assert oracle.nw_score(nt("ACGT"), nt(""), CONST, 3, 1) == -7

    def test_first_residue_opens_conventions(self):
        # Same alignment under the other gap convention (Q=open, R=extend).
        q, s = nt("AAAA"), nt("AA")
        got = oracle.nw_score(q, s, CONST, 4, 1, first_residue_opens=False)
        assert got == -1  # Q=4, R=1 identical to open=3/ext=1 under default


class TestProperties:
    @pytest.fixture
    def rng(self):
        return np.random.default_rng(42)

    def _random_pairs(self, rng, n_pairs=25, alpha=20, maxlen=12):
        for _ in range(n_pairs):
            m = int(rng.integers(1, maxlen))
            n = int(rng.integers(1, maxlen))
            q = rng.integers(0, alpha, m).astype(np.uint8)
            s = rng.integers(0, alpha, n).astype(np.uint8)
            yield q, s

    def test_sw_nonnegative_and_ge_nw(self, rng):
        for q, s in self._random_pairs(rng):
            sw = oracle.sw_score(q, s, B62, 10, 1)
            nw = oracle.nw_score(q, s, B62, 10, 1)
            assert sw >= 0
            assert sw >= nw

    def test_symmetry(self, rng):
        # sub is symmetric -> swapping q and s preserves both scores
        for q, s in self._random_pairs(rng, n_pairs=15):
            assert oracle.sw_score(q, s, B62, 10, 1) == oracle.sw_score(s, q, B62, 10, 1)
            assert oracle.nw_score(q, s, B62, 10, 1) == oracle.nw_score(s, q, B62, 10, 1)

    def test_sw_self_alignment_is_diagonal_sum(self, rng):
        for q, _ in self._random_pairs(rng, n_pairs=10):
            expect = int(sum(B62[c, c] for c in q))
            assert oracle.sw_score(q, q, B62, 10, 1) == expect


class TestTraceback:
    def _check_cigar(self, tb, q, s, sub, Q, R, local):
        """Re-score the cigar path independently; must equal tb.score."""
        qi, si = tb.q_begin, tb.s_begin
        score = 0
        prev = None
        for op in tb.cigar:
            if op == "M":
                score += int(sub[q[qi], s[si]])
                qi += 1
                si += 1
            else:
                score -= R if op == prev else Q
                if op == "D":
                    qi += 1
                else:
                    si += 1
            prev = op
        assert qi == tb.q_end and si == tb.s_end
        if not local:
            assert tb.q_begin == 0 and tb.s_begin == 0
            assert tb.q_end == len(q) and tb.s_end == len(s)
        return score

    def test_sw_traceback_rescores(self):
        rng = np.random.default_rng(7)
        for _ in range(20):
            q = rng.integers(0, 20, int(rng.integers(2, 15))).astype(np.uint8)
            s = rng.integers(0, 20, int(rng.integers(2, 15))).astype(np.uint8)
            tb = oracle.sw_align(q, s, B62, 10, 1)
            assert tb.score == oracle.sw_score(q, s, B62, 10, 1)
            got = self._check_cigar(tb, q, s, B62, 11, 1, local=True)
            assert got == tb.score

    def test_nw_traceback_rescores(self):
        rng = np.random.default_rng(8)
        for _ in range(20):
            q = rng.integers(0, 20, int(rng.integers(2, 15))).astype(np.uint8)
            s = rng.integers(0, 20, int(rng.integers(2, 15))).astype(np.uint8)
            tb = oracle.nw_align(q, s, B62, 10, 1)
            assert tb.score == oracle.nw_score(q, s, B62, 10, 1)
            got = self._check_cigar(tb, q, s, B62, 11, 1, local=False)
            assert got == tb.score

    def test_aligned_strings(self):
        q, s = aa("HEAGAWGHEE"), aa("PAWHEAE")
        # Durbin et al.: BLOSUM50, linear gap penalty 8 per residue.
        tb = oracle.sw_align(q, s, matrices.builtin("BLOSUM50").scores, 0, 8)
        dec = lambda c: alphabet.decode(c, SymType.AMINOACID)
        top, mid, bot = tb.aligned_strings(q, s, dec)
        assert len(top) == len(mid) == len(bot) == len(tb.cigar)
        # Durbin et al. classic: local alignment AWGHE / AW-HE, score 28
        assert tb.score == 28
        assert top == "AWGHE"
        assert bot == "AW-HE"
