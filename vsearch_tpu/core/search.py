"""Batched search driver (usearch_global engine).

TPU-first restructure of reference src/core/search.cpp +
commands/usearch_global.cpp: instead of one-thread-one-query with early
exits, queries are processed in host batches; per batch the k-mer scoring
and all candidate alignments run as device-wide array ops, and the
sequential accept/reject walk is replayed exactly on host (see
core/searchcore.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..params import Masking, Parameters
from ..db import Database
from ..index import KmerIndex
from ..ops import kmer as kmer_ops
from ..ops.nw import (AlignmentResult, ScoreScheme, SHRT_MAX, align_pair_host,
                      fits_simd)
from ..utils import maps
from . import mask as mask_mod
from .searchcore import (Hit, QueryInfo, MAXDELAYED, join_hits,
                         replay_onequery, search_acceptable_unaligned)

MAXDELAYED = 8


@dataclasses.dataclass
class SearchContext:
    """Everything a search run needs (the search_cli_state_s analogue)."""
    params: Parameters            # effective parameters (maxaccepts clamped)
    db: Database
    index: KmerIndex
    tophits: int
    scheme: ScoreScheme
    aligner: Optional[object] = None  # batched device aligner (ops/nw_jax)

    @classmethod
    def build(cls, params: Parameters, db: Database,
              index: Optional[KmerIndex] = None,
              use_device: bool = True) -> "SearchContext":
        """Mirror of search_prep (usearch_global.cpp:537-615): mask DB, build
        index, clamp maxaccepts/maxrejects, compute tophits."""
        if index is None:
            if params.opt_dbmask == Masking.dust:
                mask_mod.dust_all(db, params)
            elif params.opt_dbmask == Masking.soft and params.opt_hardmask:
                mask_mod.hardmask_all(db)
            index = KmerIndex(params.opt_wordlength)
            index.add_all_sequences(db, params.opt_dbmask)

        effective = dataclasses.replace(params)
        seqcount = db.seqcount
        if effective.opt_maxrejects == 0 or effective.opt_maxrejects > seqcount:
            effective.opt_maxrejects = seqcount
        if effective.opt_maxaccepts == 0 or effective.opt_maxaccepts > seqcount:
            effective.opt_maxaccepts = seqcount
        tophits = min(effective.opt_maxaccepts + effective.opt_maxrejects
                      + MAXDELAYED, seqcount)
        aligner = None
        if use_device:
            try:
                from ..ops.nw_jax import BatchAligner
                aligner = BatchAligner(ScoreScheme.from_params(params))
            except Exception:
                aligner = None
        return cls(effective, db, index, tophits,
                   ScoreScheme.from_params(params), aligner)

    # ------------------------------------------------------------------

    def align_candidates(self, qsequence: bytes,
                         targets: Sequence[int]) -> Dict[int, AlignmentResult]:
        """Align query vs each target with search16 semantics + lma fallback."""
        results: Dict[int, AlignmentResult] = {}
        pending: List[int] = []
        for t in targets:
            tseq = self.db.getsequence(t)
            if (self.scheme.force_scalar_fallback
                    or not fits_simd(len(qsequence), len(tseq))
                    or len(qsequence) == 0 or len(tseq) == 0):
                results[t] = align_pair_host(self.scheme, qsequence, tseq)
            else:
                pending.append(t)
        if pending:
            if self.aligner is not None:
                batch = self.aligner.align(
                    qsequence, [self.db.getsequence(t) for t in pending])
                for t, res in zip(pending, batch):
                    results[t] = res
            else:
                for t in pending:
                    results[t] = align_pair_host(self.scheme, qsequence,
                                                 self.db.getsequence(t))
        # linear-memory fallback for sentinel scores
        for t, res in list(results.items()):
            if res.score == SHRT_MAX:
                results[t] = self.align_fallback(qsequence,
                                                 self.db.getsequence(t))
        return results

    def align_fallback(self, qsequence: bytes, tseq: bytes) -> AlignmentResult:
        """Linear-memory (exact 64-bit) aligner fallback.

        reference: core/linmemalign.cpp via align_delayed
        (searchcore.cpp:806-832)."""
        from ..ops.linmem import linmem_align
        return linmem_align(self.scheme, qsequence, tseq)

    # ------------------------------------------------------------------

    def search_one(self, qi: QueryInfo) -> List[Hit]:
        """search_onequery equivalent for one (query, strand)."""
        params = self.params
        qkmers = kmer_ops.unique_kmer_set(qi.qsequence, self.index.wordlength,
                                          params.opt_qmask)
        qi.kmersamplecount = int(qkmers.size)
        counts = self.index.counts_for_query(qkmers)
        # the reference casts opt_minwordmatches to unsigned before the min
        # (searchcore.cpp:320), so a negative value means "kmersamplecount"
        mwm = params.opt_minwordmatches
        mwm_u = mwm & 0xFFFFFFFF if mwm < 0 else mwm
        minmatches = min(mwm_u, qi.kmersamplecount)
        candidates = self.index.topscores(counts, self.tophits, minmatches)

        # batched device alignment for every candidate that can be aligned
        walk_bound = params.opt_maxaccepts + params.opt_maxrejects - 1
        to_align = [s for s, _ in candidates[:max(walk_bound, 0)]
                    if search_acceptable_unaligned(params, qi, self.db, s)]
        alignments = self.align_candidates(qi.qsequence, to_align)

        def get_alignment(seqno: int) -> AlignmentResult:
            return alignments[seqno]

        return replay_onequery(params, qi, self.db, candidates, get_alignment)

    def search_query(self, query_head: bytes, qsequence: bytes, qsize: int,
                     query_no: int) -> Tuple[List[Hit], bytes, Optional[bytes]]:
        """Both-strand search + join (search_query, usearch_global.cpp:376-421).

        Returns (joined hits, masked plus-strand seq, minus-strand seq)."""
        params = self.params
        # mask query (reference masks the si copy in place; the RC strand is
        # built from the *unmasked* original and masked separately)
        seqs = {}
        hits_by_strand: List[List[Hit]] = []
        strands = 2 if params.opt_strand else 1
        for strand in range(strands):
            seq = qsequence if strand == 0 else maps.reverse_complement(qsequence)
            if params.opt_qmask == Masking.dust:
                seq = mask_mod.dust_mask(seq, params.opt_hardmask)
            elif params.opt_qmask == Masking.soft and params.opt_hardmask:
                seq = mask_mod.hardmask(seq)
            seqs[strand] = seq
            qi = QueryInfo(query_head=query_head, qsequence=seq,
                           qseqlen=len(seq), qsize=qsize, strand=strand,
                           query_no=query_no)
            hits_by_strand.append(self.search_one(qi))
        joined = join_hits(params, hits_by_strand[0],
                           hits_by_strand[1] if strands > 1 else None)
        return joined, seqs[0], seqs.get(1)
