"""Candidate cascade: hits, accept/reject predicates, and the exact replay
of the reference's per-query walk.

The TPU design evaluates a per-query candidate *budget* in one shot (top-K by
k-mer count with the reference's tie-break) and aligns all surviving
candidates batched on device; this module then replays the reference's
sequential walk — heap pops, MAXDELAYED batching, maxaccepts/maxrejects
early-exit — on host, consuming the precomputed alignments.  Because every
reference tie-break is a total order, the replay reproduces the reference's
hits bit-for-bit (see SURVEY.md §7 design stance).

reference: src/core/searchcore.cpp (search_onequery :884-957, align_delayed
:740-881, search_acceptable_unaligned :541-609, search_acceptable_aligned
:664-737, align_trim :343-464, hit ordering :133-243).
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..params import Parameters
from ..utils import maps
from ..ops.nw import AlignmentResult, SHRT_MAX

MAXDELAYED = 8

_CIGAR_RE = re.compile(r"(\d*)([MDI])")


def cigar_ops_iter(cigar: str):
    for count, op in _CIGAR_RE.findall(cigar):
        yield (int(count) if count else 1), op


@dataclasses.dataclass
class Hit:
    target: int
    strand: int
    count: int = 0
    accepted: bool = False
    rejected: bool = False
    aligned: bool = False
    weak: bool = False
    nwscore: int = 0
    nwdiff: int = 0
    nwgaps: int = 0
    nwindels: int = 0
    nwalignmentlength: int = 0
    nwid: float = 0.0
    nwalignment: str = ""
    matches: int = 0
    mismatches: int = 0
    internal_alignmentlength: int = 0
    internal_gaps: int = 0
    internal_indels: int = 0
    trim_q_left: int = 0
    trim_q_right: int = 0
    trim_t_left: int = 0
    trim_t_right: int = 0
    trim_aln_left: int = 0
    trim_aln_right: int = 0
    id: float = 0.0
    id0: float = 0.0
    id1: float = 0.0
    id2: float = 0.0
    id3: float = 0.0
    id4: float = 0.0
    shortest: int = 0
    longest: int = 0


def hit_sort_key_byid(hit: Hit) -> Tuple:
    """Total order of hit_compare_byid (searchcore.cpp:133-179).

    Note: when both hits are unaligned the comparator returns 0, so the sort
    must be stable in that case — Python sort is stable, and we encode only
    the compared fields."""
    return (int(hit.rejected), -int(hit.aligned),
            (-hit.id, hit.target) if hit.aligned else (0.0, 0))


def hit_sort_key_bysize(hit: Hit, db) -> Tuple:
    """Total order of hit_compare_bysize (searchcore.cpp:182-243)."""
    if hit.rejected:
        return (1,)
    if not hit.aligned:
        return (0, 1)
    return (0, 0, -db.getabundance(hit.target), -hit.id, hit.target)


def abundance_ratio_cmp(value: int, ratio: float, reference: int) -> int:
    """Sign of value - ratio*reference (searchcore.cpp:480-537).

    Python floats are doubles and Python ints are arbitrary precision, so the
    sub-2^53 double path and the 128-bit exact path of the reference are both
    reproduced by comparing value to the exact rational of the stored double."""
    if reference <= 0 or ratio <= 0.0:
        return 1 if value > 0 else 0
    if not math.isfinite(ratio):
        return -1
    if value < 2**53 and reference < 2**53:
        product = ratio * float(reference)
        value_d = float(value)
        if value_d < product:
            return -1
        if value_d > product:
            return 1
        return 0
    # exact comparison against the dyadic value of the double
    frac = math.frexp(ratio)
    mantissa = int(frac[0] * (1 << 53))
    exponent = frac[1] - 53
    lhs = value
    rhs = mantissa * reference
    if exponent > 0:
        rhs <<= exponent
    else:
        lhs <<= -exponent
    if lhs < rhs:
        return -1
    if lhs > rhs:
        return 1
    return 0


@dataclasses.dataclass
class QueryInfo:
    """Per-query state the cascade reads (subset of searchinfo_s)."""
    query_head: bytes
    qsequence: bytes
    qseqlen: int
    qsize: int
    strand: int
    query_no: int = 0
    kmersamplecount: int = 0


def unaligned_gate_active(params: Parameters) -> bool:
    """True when any pre-alignment predicate can reject (searchcore.cpp
    :541-609); at the defaults every predicate passes unconditionally, so
    hot walks skip the per-candidate call entirely."""
    cached = getattr(params, "_unaligned_gate_active", None)
    if cached is None:
        from ..params import DBL_MAX, INT64_MAX
        cached = (params.opt_maxqsize < INT64_MAX
                  or params.opt_mintsize > 0
                  or params.opt_minsizeratio > 0.0
                  or params.opt_maxsizeratio < DBL_MAX
                  or params.opt_minqt > 0.0 or params.opt_maxqt < DBL_MAX
                  or params.opt_minsl > 0.0 or params.opt_maxsl < DBL_MAX
                  or bool(params.opt_idprefix) or bool(params.opt_idsuffix)
                  or bool(params.opt_self) or bool(params.opt_selfid))
        try:
            object.__setattr__(params, "_unaligned_gate_active", cached)
        except Exception:
            pass
    return cached


def search_acceptable_unaligned(params: Parameters, qi: QueryInfo, db,
                                target: int) -> bool:
    """reference: searchcore.cpp:541-609

    The target SEQUENCE is fetched lazily — only the idprefix/idsuffix/
    selfid predicates read it, and the abundance/length gates (the hot
    rejectors in the chimera/cluster walks) come first."""
    dseqlen = db.getsequencelen(target)
    tsize = db.getabundance(target)
    qseq = qi.qsequence
    qseqlen = qi.qseqlen

    if not (qi.qsize <= params.opt_maxqsize):
        return False
    if not (tsize >= params.opt_mintsize):
        return False
    if abundance_ratio_cmp(qi.qsize, params.opt_minsizeratio, tsize) < 0:
        return False
    if abundance_ratio_cmp(qi.qsize, params.opt_maxsizeratio, tsize) > 0:
        return False
    if not (qseqlen >= params.opt_minqt * float(dseqlen)):
        return False
    if not (qseqlen <= params.opt_maxqt * float(dseqlen)):
        return False
    if qseqlen < dseqlen:
        if not (qseqlen >= params.opt_minsl * float(dseqlen)):
            return False
        if not (qseqlen <= params.opt_maxsl * float(dseqlen)):
            return False
    else:
        if not (float(dseqlen) >= params.opt_minsl * qseqlen):
            return False
        if not (float(dseqlen) <= params.opt_maxsl * qseqlen):
            return False
    if params.opt_idprefix:
        if not (qseqlen >= params.opt_idprefix
                and dseqlen >= params.opt_idprefix
                and maps.seqcmp(qseq, db.getsequence(target),
                                params.opt_idprefix) == 0):
            return False
    else:
        # idprefix 0: seqcmp over zero chars == 0, predicate passes when both
        # lengths >= 0 (always)
        pass
    if params.opt_idsuffix:
        dseq = db.getsequence(target)
        if not (qseqlen >= params.opt_idsuffix and dseqlen >= params.opt_idsuffix
                and maps.seqcmp(qseq[qseqlen - params.opt_idsuffix:],
                                dseq[dseqlen - params.opt_idsuffix:],
                                params.opt_idsuffix) == 0):
            return False
    if params.opt_self and qi.query_head == db.getheader(target):
        return False
    if params.opt_selfid and qseqlen == dseqlen and \
            maps.seqcmp(qseq, db.getsequence(target), qseqlen) == 0:
        return False
    return True


def align_trim(hit: Hit, params: Parameters) -> None:
    """reference: searchcore.cpp:343-464"""
    hit.trim_aln_left = 0
    hit.trim_q_left = 0
    hit.trim_t_left = 0
    hit.trim_aln_right = 0
    hit.trim_q_right = 0
    hit.trim_t_right = 0

    cigar = hit.nwalignment
    if cigar:
        # only the first and last runs matter: parse them directly
        # instead of regex-scanning the whole string (hot on every hit)
        n = len(cigar)
        i = 0
        while cigar[i].isdigit():
            i += 1
        count_str, op = cigar[:i], cigar[i]
        run = int(count_str) if count_str else 1
        if op != "M":
            hit.trim_aln_left = len(count_str) + 1
            if op == "D":
                hit.trim_q_left = run
            else:
                hit.trim_t_left = run
        j = n - 1
        k = j - 1
        while k >= 0 and cigar[k].isdigit():
            k -= 1
        count_str, op = cigar[k + 1:j], cigar[j]
        run = int(count_str) if count_str else 1
        if op != "M":
            hit.trim_aln_right = len(count_str) + 1
            if op == "D":
                hit.trim_q_right = run
            else:
                hit.trim_t_right = run

    if hit.trim_q_left >= hit.nwalignmentlength:
        hit.trim_q_right = 0
    if hit.trim_t_left >= hit.nwalignmentlength:
        hit.trim_t_right = 0

    hit.internal_alignmentlength = (hit.nwalignmentlength - hit.trim_q_left
                                    - hit.trim_t_left - hit.trim_q_right
                                    - hit.trim_t_right)
    hit.internal_indels = (hit.nwindels - hit.trim_q_left - hit.trim_t_left
                           - hit.trim_q_right - hit.trim_t_right)
    hit.internal_gaps = (hit.nwgaps
                         - (1 if hit.trim_q_left + hit.trim_t_left > 0 else 0)
                         - (1 if hit.trim_q_right + hit.trim_t_right > 0 else 0))

    hit.id0 = 100.0 * hit.matches / hit.shortest if hit.shortest > 0 else 0.0
    hit.id1 = (100.0 * hit.matches / hit.nwalignmentlength
               if hit.nwalignmentlength > 0 else 0.0)
    hit.id2 = (100.0 * hit.matches / hit.internal_alignmentlength
               if hit.internal_alignmentlength > 0 else 0.0)
    hit.id3 = max(0.0, 100.0 * (1.0 - (1.0 * (hit.mismatches + hit.nwgaps)
                                       / hit.longest)))
    hit.id4 = hit.id1
    hit.id = [hit.id0, hit.id1, hit.id2, hit.id3, hit.id4][params.opt_iddef]


def _alignment_uses_forbidden_gap(cigar: str, params: Parameters) -> bool:
    """reference: searchcore.cpp:621-660"""
    ops = _CIGAR_RE.findall(cigar)
    for idx, (count_str, op) in enumerate(ops):
        if op in ("I", "D"):
            run = int(count_str) if count_str else 1
            is_query = op == "I"
            is_left = idx == 0
            is_right = idx == len(ops) - 1
            if is_query:
                open_inf = (params.opt_gap_open_query_left_infinite if is_left
                            else params.opt_gap_open_query_right_infinite if is_right
                            else params.opt_gap_open_query_interior_infinite)
                ext_inf = (params.opt_gap_extension_query_left_infinite if is_left
                           else params.opt_gap_extension_query_right_infinite if is_right
                           else params.opt_gap_extension_query_interior_infinite)
            else:
                open_inf = (params.opt_gap_open_target_left_infinite if is_left
                            else params.opt_gap_open_target_right_infinite if is_right
                            else params.opt_gap_open_target_interior_infinite)
                ext_inf = (params.opt_gap_extension_target_left_infinite if is_left
                           else params.opt_gap_extension_target_right_infinite if is_right
                           else params.opt_gap_extension_target_interior_infinite)
            if open_inf:
                return True
            if ext_inf and run > 1:
                return True
    return False


def search_acceptable_aligned(params: Parameters, qi: QueryInfo, db,
                              hit: Hit) -> bool:
    """reference: searchcore.cpp:664-737"""
    if (hit.id >= 100.0 * params.opt_weak_id
            and hit.mismatches <= params.opt_maxsubs
            and hit.internal_gaps <= params.opt_maxgaps
            and (not params.opt_gap_penalty_has_infinite
                 or not _alignment_uses_forbidden_gap(hit.nwalignment, params))
            and hit.internal_alignmentlength >= params.opt_mincols
            and (params.opt_leftjust == 0
                 or hit.trim_q_left + hit.trim_t_left == 0)
            and (params.opt_rightjust == 0
                 or hit.trim_q_right + hit.trim_t_right == 0)
            and hit.matches + hit.mismatches >= params.opt_query_cov * qi.qseqlen
            and (hit.matches + hit.mismatches
                 >= params.opt_target_cov * float(db.getsequencelen(hit.target)))
            and hit.id <= 100.0 * params.opt_maxid
            and (100.0 * hit.matches / (hit.matches + hit.mismatches)
                 >= params.opt_mid)
            and hit.mismatches + hit.internal_indels <= params.opt_maxdiffs):
        if params.opt_cluster_unoise is not None:
            mismatches = hit.mismatches
            skew = 1.0 * float(qi.qsize) / float(db.getabundance(hit.target))
            beta = 1.0 / math.pow(2, (1.0 * params.opt_unoise_alpha * mismatches) + 1)
            if skew <= beta or mismatches == 0:
                hit.accepted = True
                hit.weak = False
                return True
            hit.rejected = True
            hit.weak = True
            return False
        if hit.id >= 100.0 * params.opt_id:
            hit.accepted = True
            hit.weak = False
            return True
        hit.rejected = True
        hit.weak = True
        return False
    hit.rejected = True
    hit.weak = False
    return False


def fill_alignment_fields(hit: Hit, qi: QueryInfo, db,
                          result: AlignmentResult) -> None:
    """align_delayed's hit-field fill (searchcore.cpp:842-854)."""
    dseqlen = db.getsequencelen(hit.target)
    hit.aligned = True
    hit.shortest = min(qi.qseqlen, dseqlen)
    hit.longest = max(qi.qseqlen, dseqlen)
    hit.nwalignment = result.cigar
    hit.nwscore = result.score
    hit.nwdiff = result.aligned - result.matches
    hit.nwgaps = result.gaps
    hit.nwindels = result.aligned - result.matches - result.mismatches
    hit.nwalignmentlength = result.aligned
    hit.nwid = (100.0 * (result.aligned - hit.nwdiff) / result.aligned
                if result.aligned else 0.0)
    hit.matches = result.aligned - hit.nwdiff
    hit.mismatches = hit.nwdiff - hit.nwindels


class QueryWalk:
    """Incremental replay of search_onequery's candidate walk.

    Drives the exact reference loop (searchcore.cpp:884-957) as a state
    machine so that the delayed-alignment batches of many queries can be
    aligned together in one device call: ``advance()`` pops candidates until
    a MAXDELAYED batch is full (returning the targets that need alignment),
    ``supply()`` is align_delayed with the computed results.
    """

    def __init__(self, params: Parameters, qi: QueryInfo, db,
                 candidates: Sequence[Tuple[int, int]]) -> None:
        self.params = params
        self.qi = qi
        self.db = db
        self.candidates = candidates
        self.hits: List[Hit] = []
        self.accepts = 0
        self.rejects = 0
        self.finalized = 0
        self.delayed = 0
        self.pop_idx = 0
        self.done = False
        self.gate_active = unaligned_gate_active(params)
        # progressive alignment budget: flush the first delayed candidate
        # alone, then widen (1, 4, 16, 32).  Finalization replays the hits
        # in pop order with the same gating either way, so batch size can
        # never change outputs (align_delayed ignores everything popped
        # after the accept/reject limits are hit, searchcore.cpp:783-786) —
        # it only controls how many speculative alignments are wasted when
        # an early candidate accepts (common at high --id with small
        # maxaccepts).
        self.batch_limit = 1

    def _loop_ok(self) -> bool:
        p = self.params
        return (self.finalized + self.delayed
                < p.opt_maxaccepts + p.opt_maxrejects - 1
                and self.rejects < p.opt_maxrejects
                and self.accepts < p.opt_maxaccepts
                and self.pop_idx < len(self.candidates))

    def advance(self) -> List[int]:
        """Pop candidates until a batch of MAXDELAYED needs alignment.

        Returns the targets to align (possibly fewer than MAXDELAYED at the
        end of the walk, or [] when the walk is finished)."""
        if self.done:
            return []
        while self._loop_ok():
            seqno, count = self.candidates[self.pop_idx]
            self.pop_idx += 1
            hit = Hit(target=seqno, strand=self.qi.strand, count=count)
            if not self.gate_active or search_acceptable_unaligned(
                    self.params, self.qi, self.db, seqno):
                self.delayed += 1
            else:
                hit.rejected = True
            self.hits.append(hit)
            if self.delayed >= self.batch_limit:
                return self._delayed_targets()
        if self.delayed > 0:
            return self._delayed_targets()
        self.done = True
        return []

    def _delayed_targets(self) -> List[int]:
        return [h.target for h in self.hits[self.finalized:]
                if not h.rejected]

    def supply(self, alignments: Dict[int, AlignmentResult]) -> None:
        """align_delayed (searchcore.cpp:740-881) with precomputed results."""
        p = self.params
        for x in range(self.finalized, len(self.hits)):
            if self.rejects < p.opt_maxrejects and self.accepts < p.opt_maxaccepts:
                hit = self.hits[x]
                if hit.rejected:
                    self.rejects += 1
                    continue
                fill_alignment_fields(hit, self.qi, self.db,
                                      alignments[hit.target])
                align_trim(hit, p)
                if search_acceptable_aligned(p, self.qi, self.db, hit):
                    self.accepts += 1
                else:
                    self.rejects += 1
        self.finalized = len(self.hits)
        self.delayed = 0
        self.batch_limit = min(self.batch_limit * 4, 32)
        if not self._loop_ok():
            self.done = True


def replay_onequery(params: Parameters, qi: QueryInfo, db,
                    candidates: Sequence[Tuple[int, int]],
                    get_alignment: Callable[[int], AlignmentResult]) -> List[Hit]:
    """Replay search_onequery's walk over the sorted candidate list.

    ``candidates``: (seqno, count) in heap-pop order (count desc, length asc,
    seqno asc).  ``get_alignment(seqno)`` returns the finished alignment for
    a candidate (computed batched on device beforehand; must already include
    the linear-memory fallback for sentinel scores).

    Returns the per-strand hits list (searchinfo_s::hits equivalent).
    reference: searchcore.cpp search_onequery (:884-957) + align_delayed
    (:740-881).
    """
    hits: List[Hit] = []
    accepts = 0
    rejects = 0
    finalized = 0
    delayed = 0
    pop_idx = 0

    def align_delayed_now() -> None:
        nonlocal accepts, rejects, finalized
        for x in range(finalized, len(hits)):
            if rejects < params.opt_maxrejects and accepts < params.opt_maxaccepts:
                hit = hits[x]
                if hit.rejected:
                    rejects += 1
                    continue
                result = get_alignment(hit.target)
                fill_alignment_fields(hit, qi, db, result)
                align_trim(hit, params)
                if search_acceptable_aligned(params, qi, db, hit):
                    accepts += 1
                else:
                    rejects += 1
        finalized = len(hits)

    while (finalized + delayed < params.opt_maxaccepts + params.opt_maxrejects - 1
           and rejects < params.opt_maxrejects
           and accepts < params.opt_maxaccepts
           and pop_idx < len(candidates)):
        seqno, count = candidates[pop_idx]
        pop_idx += 1
        hit = Hit(target=seqno, strand=qi.strand, count=count)
        if search_acceptable_unaligned(params, qi, db, seqno):
            delayed += 1
        else:
            hit.rejected = True
        hits.append(hit)
        if delayed == MAXDELAYED:
            align_delayed_now()
            delayed = 0
    if delayed > 0:
        align_delayed_now()

    return hits


def join_hits(params: Parameters, hits_plus: List[Hit],
              hits_minus: Optional[List[Hit]]) -> List[Hit]:
    """Keep accepted+weak hits of both strands, sorted by id.

    reference: searchcore.cpp search_joinhits (:1028-1052)."""
    kept = [h for h in hits_plus if h.accepted or h.weak]
    if hits_minus is not None:
        kept.extend(h for h in hits_minus if h.accepted or h.weak)
    kept.sort(key=hit_sort_key_byid)
    return kept
