"""Public API mirroring the reference library's surface.

The reference exposes imperative ``init_*`` configuration calls mutating
library globals, then ``sw_align`` / ``nw_align`` entry points returning an
alignment list (SURVEY.md Appendix B, reconstructed from libssa's
``src/libssa.h`` — mount was empty, semantics follow the documented API).
This module offers the same call sequence 1:1 on a context object, plus a
module-level default context so reference-style scripts port line-for-line:

    import libssa_tpu.api as ssa
    ssa.init_symbol_translation(SymType.AMINOACID, Strand.FORWARD, 1, 1)
    ssa.init_score_matrix("BLOSUM62")
    ssa.init_gap_penalties(10, 1)
    ssa.init_db_fasta("db.fas")
    q = ssa.init_sequence_fasta("query.fas")
    hits = ssa.sw_align(q, 10, BitWidth.EXACT, ComputeMode.ALIGNMENT)
    ssa.ssa_exit()
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import alphabet, matrices, oracle
from .constants import (
    AlignType,
    BitWidth,
    ComputeMode,
    OutputMode,
    Strand,
    SymType,
)
from .io import fasta
from .io.db import SequenceDB
from .search.manager import SearchEngine, SearchParams, SearchStats
from .util import logging as _logging
from .util.logging import log


@dataclass
class Query:
    """A translated query ready for search (per-strand code sequences)."""

    header: str
    symtype: SymType
    strands: Strand
    sequences: list[tuple[str, np.ndarray]]  # (strand label, codes)

    @property
    def length(self) -> int:
        return max((len(s) for _, s in self.sequences), default=0)


@dataclass
class Alignment:
    """One hit. Score-only searches leave the traceback fields None."""

    seq_id: int
    header: str
    score: int
    align_type: AlignType
    strand: str = "+"
    q_begin: int | None = None
    q_end: int | None = None
    s_begin: int | None = None
    s_end: int | None = None
    cigar: str | None = None
    aligned: tuple[str, str, str] | None = None  # query row, midline, subject row


@dataclass
class AlignmentList:
    hits: list[Alignment]
    stats: SearchStats

    def __iter__(self):
        return iter(self.hits)

    def __len__(self):
        return len(self.hits)

    def __getitem__(self, i):
        return self.hits[i]


class SSAContext:
    """Mutable configuration + cached engine, one search setup at a time."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.symtype: SymType = SymType.AMINOACID
        self.strands: Strand = Strand.FORWARD
        self.q_gencode: int = 1
        self.d_gencode: int = 1
        self.matrix: matrices.ScoreMatrix | None = None
        self.gap_open: int = 0
        self.gap_extend: int = 1
        self.db: SequenceDB | None = None
        self.params = SearchParams()
        self._engine: SearchEngine | None = None

    # -- configuration (reference init_*/set_* calls) ---------------------

    def init_symbol_translation(
        self,
        symtype: SymType,
        strands: Strand = Strand.FORWARD,
        q_gencode: int = 1,
        d_gencode: int = 1,
    ):
        self.symtype = symtype
        self.strands = Strand(strands)
        self.q_gencode = q_gencode
        self.d_gencode = d_gencode
        self._engine = None

    def init_score_matrix(self, name_or_path: str):
        try:
            self.matrix = matrices.builtin(name_or_path)
        except ValueError:
            self.matrix = matrices.from_file(name_or_path, self.symtype)
        self._engine = None

    def init_constant_scoring(self, match: int, mismatch: int):
        self.matrix = matrices.constant_scoring(match, mismatch, self.symtype)
        self._engine = None

    def init_gap_penalties(self, gap_open: int, gap_extend: int):
        oracle.gap_qr(gap_open, gap_extend)  # validates
        self.gap_open, self.gap_extend = gap_open, gap_extend
        self._engine = None

    def init_db_fasta(self, path_or_text: str):
        self.db = SequenceDB.from_fasta(path_or_text, self.symtype)
        self._engine = None

    def init_sequence_fasta(self, path_or_seq: str, header: str = "query") -> Query:
        """Read a query from FASTA (file or text) or a bare sequence string."""
        if path_or_seq.lstrip().startswith(">") or "\n" not in path_or_seq:
            try:
                recs = list(fasta.iter_fasta(path_or_seq))
                header, seq = recs[0]
            except (FileNotFoundError, ValueError, IndexError):
                seq = path_or_seq  # bare sequence string
        else:
            recs = list(fasta.iter_fasta(path_or_seq))
            header, seq = recs[0]
        codes = alphabet.encode(seq, self.symtype)
        seqs = [("+", codes)]
        if self.symtype is SymType.NUCLEOTIDE:
            if self.strands == Strand.REVERSE:
                seqs = [("-", alphabet.reverse_complement(codes))]
            elif self.strands == Strand.BOTH:
                seqs = [("+", codes), ("-", alphabet.reverse_complement(codes))]
        return Query(header=header, symtype=self.symtype, strands=self.strands, sequences=seqs)

    def set_chunk_size(self, n: int):
        self.params.batch_size = int(n)
        self._engine = None

    def set_thread_count(self, n: int):
        """Reference parity no-op: TPU parallelism is device-level.

        The pthread worker count has no TPU analogue — within-chip
        parallelism is the kernel's lane dimension and multi-chip
        parallelism is configured via ``libssa_tpu.parallel`` meshes. Kept
        so reference-style scripts run unchanged.
        """
        log(OutputMode.INFO, f"set_thread_count({n}): no-op on TPU backend")

    def set_output_mode(self, mode: OutputMode):
        _logging.set_output_mode(mode)

    # -- search -----------------------------------------------------------

    def _get_engine(self) -> SearchEngine:
        if self.db is None:
            raise RuntimeError("init_db_fasta() must be called before searching")
        if self.matrix is None:
            raise RuntimeError("init_score_matrix() must be called before searching")
        if self.matrix.symtype is not self.symtype:
            raise RuntimeError(
                f"score matrix is for {self.matrix.symtype}, search is {self.symtype}"
            )
        if self._engine is None:
            self._engine = SearchEngine(
                self.db, self.matrix, self.gap_open, self.gap_extend, self.params
            )
        return self._engine

    def _align(
        self,
        query: Query,
        k: int,
        bit_width: BitWidth,
        mode: ComputeMode,
        align_type: AlignType,
    ) -> AlignmentList:
        engine = self._get_engine()
        local = align_type is AlignType.SW
        stats = SearchStats()
        # Score every strand; a subject's score is its best over strands
        # (forward wins ties, matching deterministic hit ordering).
        best_scores = None
        best_strand = None
        for label, codes in query.sequences:
            scores = engine.score_all(codes, local, bit_width, stats)
            if best_scores is None:
                best_scores, best_strand = scores, np.full(len(scores), label)
            else:
                better = scores > best_scores
                best_scores = np.where(better, scores, best_scores)
                best_strand = np.where(better, label, best_strand)
        from .ops.topk import host_topk

        top_scores, top_ids = host_topk(best_scores, np.arange(len(best_scores)), k)

        hits = []
        strand_codes = dict(query.sequences)
        for score, sid in zip(top_scores, top_ids):
            sid = int(sid)
            hit = Alignment(
                seq_id=sid,
                header=self.db.headers[sid],
                score=int(score),
                align_type=align_type,
                strand=str(best_strand[sid]),
            )
            if mode is ComputeMode.ALIGNMENT:
                qc = strand_codes[hit.strand]
                sc = self.db.sequence(sid)
                tb_fn = oracle.sw_align if local else oracle.nw_align
                tb = tb_fn(
                    qc, sc, self.matrix.scores, self.gap_open, self.gap_extend
                )
                assert tb.score == hit.score, (
                    f"traceback score {tb.score} != search score {hit.score}"
                )
                hit.q_begin, hit.q_end = tb.q_begin, tb.q_end
                hit.s_begin, hit.s_end = tb.s_begin, tb.s_end
                hit.cigar = tb.cigar
                dec = lambda c: alphabet.decode(c, self.symtype)
                hit.aligned = tb.aligned_strings(qc, sc, dec)
            hits.append(hit)
        return AlignmentList(hits=hits, stats=stats)

    def sw_align(
        self,
        query: Query,
        k: int = 10,
        bit_width: BitWidth = BitWidth.EXACT,
        mode: ComputeMode = ComputeMode.SCORE,
    ) -> AlignmentList:
        return self._align(query, k, bit_width, mode, AlignType.SW)

    def nw_align(
        self,
        query: Query,
        k: int = 10,
        bit_width: BitWidth = BitWidth.EXACT,
        mode: ComputeMode = ComputeMode.SCORE,
    ) -> AlignmentList:
        return self._align(query, k, bit_width, mode, AlignType.NW)

    def ssa_exit(self):
        self.reset()


# -- module-level default context (reference-style global API) -------------

_default = SSAContext()

init_symbol_translation = _default.init_symbol_translation
init_score_matrix = _default.init_score_matrix
init_constant_scoring = _default.init_constant_scoring
init_gap_penalties = _default.init_gap_penalties
init_db_fasta = _default.init_db_fasta
init_sequence_fasta = _default.init_sequence_fasta
set_chunk_size = _default.set_chunk_size
set_thread_count = _default.set_thread_count
set_output_mode = _default.set_output_mode
sw_align = _default.sw_align
nw_align = _default.nw_align
ssa_exit = _default.ssa_exit
