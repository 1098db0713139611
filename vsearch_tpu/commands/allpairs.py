"""allpairs_global command: all-vs-all pairwise global alignment.

reference: src/commands/allpairs_global.cpp — each query i aligned against
every target i+1..n-1 (no k-mer index), accepted hits sorted by
(id desc, target asc); forced single strand.

TPU-native fast path (ops/allpairs_dev.py): sequence codes upload once,
the triangular schedule streams as index-pair batches, per-pair alignment
STATISTICS come back from the device (~10 ints/pair instead of the full
backtrack), the accept/reject cascade runs vectorized on host, and only
accepted hits are realigned for their CIGARs.  Falls back to the generic
batched-aligner path off-TPU, under --acceptall (every pair is emitted,
so per-pair CIGARs are needed anyway), or with infinite gap penalties.
"""

from __future__ import annotations

import os
from contextlib import ExitStack
from typing import List, Optional

import numpy as np

from ..params import Masking, Parameters
from ..db import Database
from ..io import fastx as fastx_io
from ..core import mask as mask_mod
from ..core import results
from ..core.search import SearchContext
from ..core.searchcore import (Hit, QueryInfo, align_trim,
                               fill_alignment_fields,
                               search_acceptable_aligned,
                               search_acceptable_unaligned,
                               unaligned_gate_active)


from ..io.openfile import open_output_opt as _open  # noqa: E402


def _accept_mask(eff: Parameters, stats: np.ndarray, qlens: np.ndarray,
                 tlens: np.ndarray) -> np.ndarray:
    """Vectorized search_acceptable_aligned (searchcore.cpp:664-737) over
    device stats rows [aligned, matches, indels, gap_opens, first_op,
    first_len, last_op, last_len]; float math is IEEE double in the same
    expression order as the scalar path, so the mask is exact."""
    aligned = stats[:, 0].astype(np.float64)
    matches = stats[:, 1].astype(np.int64)
    indels = stats[:, 2].astype(np.int64)
    gap_opens = stats[:, 3].astype(np.int64)
    first_op = stats[:, 4]
    first_len = stats[:, 5].astype(np.int64)
    last_op = stats[:, 6]
    last_len = stats[:, 7].astype(np.int64)

    nwalnlen = stats[:, 0].astype(np.int64)
    mism = nwalnlen - matches - indels

    tql = np.where(first_op == 2, first_len, 0)
    ttl = np.where(first_op == 3, first_len, 0)
    tqr = np.where(last_op == 2, last_len, 0)
    ttr = np.where(last_op == 3, last_len, 0)
    tqr = np.where(tql >= nwalnlen, 0, tqr)
    ttr = np.where(ttl >= nwalnlen, 0, ttr)

    int_alnlen = nwalnlen - tql - ttl - tqr - ttr
    int_indels = indels - tql - ttl - tqr - ttr
    int_gaps = (gap_opens - (tql + ttl > 0).astype(np.int64)
                - (tqr + ttr > 0).astype(np.int64))

    shortest = np.minimum(qlens, tlens).astype(np.float64)
    longest = np.maximum(qlens, tlens).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        id0 = np.where(shortest > 0, 100.0 * matches / shortest, 0.0)
        id1 = np.where(nwalnlen > 0, 100.0 * matches / aligned, 0.0)
        id2 = np.where(int_alnlen > 0,
                       100.0 * matches / int_alnlen.astype(np.float64), 0.0)
        id3 = np.maximum(
            0.0, 100.0 * (1.0 - (1.0 * (mism + gap_opens) / longest)))
        mid_frac = 100.0 * matches / (matches + mism).astype(np.float64)
    ids = [id0, id1, id2, id3, id1][eff.opt_iddef]

    ok = ((ids >= 100.0 * eff.opt_weak_id)
          & (mism <= eff.opt_maxsubs)
          & (int_gaps <= eff.opt_maxgaps)
          & (int_alnlen >= eff.opt_mincols)
          & ((eff.opt_leftjust == 0) | (tql + ttl == 0))
          & ((eff.opt_rightjust == 0) | (tqr + ttr == 0))
          & (matches + mism >= eff.opt_query_cov * qlens)
          & (matches + mism >= eff.opt_target_cov
             * tlens.astype(np.float64))
          & (ids <= 100.0 * eff.opt_maxid)
          & (mid_frac >= eff.opt_mid)
          & (mism + int_indels <= eff.opt_maxdiffs)
          & (ids >= 100.0 * eff.opt_id))
    return ok


def allpairs_global(params: Parameters) -> None:
    with ExitStack() as stack:
        fp_alnout = _open(stack, params.opt_alnout, "--alnout")
        if fp_alnout is not None:
            fp_alnout.write(params.command_line.encode() + b"\n")
            fp_alnout.write(params.prog_header.encode() + b"\n")
        fp_samout = _open(stack, params.opt_samout, "--samout")
        fp_userout = _open(stack, params.opt_userout, "--userout")
        fp_blast6out = _open(stack, params.opt_blast6out, "--blast6out")
        fp_uc = _open(stack, params.opt_uc, "--uc")
        fp_fastapairs = _open(stack, params.opt_fastapairs, "--fastapairs")
        fp_qsegout = _open(stack, params.opt_qsegout, "--qsegout")
        fp_tsegout = _open(stack, params.opt_tsegout, "--tsegout")
        fp_matched = _open(stack, params.opt_matched, "--matched")
        fp_notmatched = _open(stack, params.opt_notmatched, "--notmatched")

        db = Database()
        db.read(params.opt_allpairs_global, params)
        if fp_samout is not None:
            results.show_samheader(fp_samout, params, params.opt_allpairs_global, db)
        if params.opt_qmask == Masking.dust:
            mask_mod.dust_all(db, params)
        elif params.opt_qmask == Masking.soft and params.opt_hardmask:
            mask_mod.hardmask_all(db)

        from ..index import KmerIndex
        ctx = SearchContext.build(params, db, index=KmerIndex(
            params.opt_wordlength))
        eff = ctx.params

        state = {"qmatches": 0, "matched": 0, "notmatched": 0}
        seqcount = db.seqcount

        def emit_query(qi: QueryInfo, finalhits: List[Hit]) -> None:
            toreport = min(params.opt_maxhits, len(finalhits))
            hits = finalhits
            query_head = qi.query_head
            qseqlen = qi.qseqlen
            qseq = qi.qsequence

            if fp_alnout is not None:
                results.show_alnout(fp_alnout, params, hits[:toreport],
                                    query_head, qseq, qseqlen, db)
            if fp_samout is not None:
                results.show_samout(fp_samout, params, hits[:toreport],
                                    query_head, qseq, None, db)
            if toreport:
                top_hit_id = hits[0].id
                for t in range(toreport):
                    hp = hits[t]
                    if params.opt_top_hits_only and hp.id < top_hit_id:
                        break
                    if fp_fastapairs is not None:
                        results.show_fastapairs_one(fp_fastapairs, params,
                                                    hp, query_head, qseq,
                                                    None, db)
                    if fp_qsegout is not None:
                        results.show_qsegout_one(fp_qsegout, params, hp,
                                                 query_head, qseq, qseqlen,
                                                 None)
                    if fp_tsegout is not None:
                        results.show_tsegout_one(fp_tsegout, params, hp, db)
                    if fp_uc is not None and (t == 0
                                              or params.opt_uc_allhits):
                        results.show_uc_one(fp_uc, params, hp, query_head,
                                            qseqlen, hp.target, db)
                    if fp_userout is not None:
                        results.show_userout_one(fp_userout, params, hp,
                                                 query_head, qseq, qseqlen,
                                                 None, db)
                    if fp_blast6out is not None:
                        results.show_blast6_one(fp_blast6out, params, hp,
                                                query_head, qseqlen, db)
            else:
                if fp_uc is not None:
                    results.show_uc_one(fp_uc, params, None, query_head,
                                        qseqlen, 0, db)
                if params.opt_output_no_hits:
                    if fp_userout is not None:
                        results.show_userout_one(fp_userout, params, None,
                                                 query_head, qseq, qseqlen,
                                                 None, db)
                    if fp_blast6out is not None:
                        results.show_blast6_one(fp_blast6out, params, None,
                                                query_head, qseqlen, db)

            if hits:
                state["qmatches"] += 1
                state["matched"] += 1
                if fp_matched is not None:
                    fastx_io.fasta_print_general(fp_matched, params, qseq,
                                                 query_head, qi.qsize,
                                                 state["matched"])
            else:
                state["notmatched"] += 1
                if fp_notmatched is not None:
                    fastx_io.fasta_print_general(fp_notmatched, params,
                                                 qseq, query_head, qi.qsize,
                                                 state["notmatched"])

        def make_qi(query_no: int) -> QueryInfo:
            return QueryInfo(query_head=db.getheader(query_no),
                             qsequence=db.getsequence(query_no),
                             qseqlen=db.getsequencelen(query_no),
                             qsize=db.getabundance(query_no), strand=0,
                             query_no=query_no)

        def build_hit(qi: QueryInfo, t: int, res) -> Optional[Hit]:
            hit = Hit(target=t, strand=0, count=0)
            fill_alignment_fields(hit, qi, db, res)
            align_trim(hit, eff)
            if params.opt_acceptall or \
                    search_acceptable_aligned(eff, qi, db, hit):
                return hit
            return None

        from ..utils.progress import Progress
        align_progress = Progress(
            "Aligning", max(0, seqcount * (seqcount - 1)) // 2, params)

        import jax
        maxlen = max((db.getsequencelen(i) for i in range(seqcount)),
                     default=0)
        use_fast = (
            ctx.aligner is not None
            and jax.default_backend() == "tpu"
            and not params.opt_acceptall
            and not eff.opt_gap_penalty_has_infinite
            and seqcount >= 16
            and 0 < maxlen <= 2048
            and min(db.getsequencelen(i) for i in range(seqcount)) > 0
            and os.environ.get("VSEARCH_TPU_ALLPAIRS_DEV", "1") != "0")

        if use_fast:
            _allpairs_fast(params, eff, db, ctx, align_progress, make_qi,
                           build_hit, emit_query)
        else:
            _allpairs_generic(params, eff, db, ctx, align_progress,
                              make_qi, build_hit, emit_query)

        align_progress.done()
        # reference: allpairs_global.cpp:656-677 — "Matching query
        # sequences" (no "unique"); the log copy gets an extra blank line
        from ..utils.progress import message
        msg = "Matching query sequences: %d of %d" % (state["qmatches"],
                                                      seqcount)
        if seqcount > 0:
            msg += " (%.2f%%)" % (100.0 * state["qmatches"] / seqcount)
        message(params, msg)


def _targets_for(params, eff, db, qi, seqcount):
    if params.opt_acceptall or not unaligned_gate_active(eff):
        return list(range(qi.query_no + 1, seqcount))
    return [t for t in range(qi.query_no + 1, seqcount)
            if search_acceptable_unaligned(eff, qi, db, t)]


def _allpairs_generic(params, eff, db, ctx, align_progress, make_qi,
                      build_hit, emit_query) -> None:
    """Generic batched-aligner path (host C tier / non-TPU backends)."""
    seqcount = db.seqcount
    BATCH_PAIRS = 8192

    def query_groups():
        pending = []       # (qi, targets)
        pairs = []
        for query_no in range(seqcount):
            align_progress.update(align_progress._counter
                                  + (seqcount - query_no - 1))
            qi = make_qi(query_no)
            targets = _targets_for(params, eff, db, qi, seqcount)
            pending.append((qi, targets))
            pairs.extend((qi.qsequence, t) for t in targets)
            if len(pairs) >= BATCH_PAIRS:
                yield pending, ctx.align_pairs(pairs)
                pending = []
                pairs = []
        if pending:
            yield pending, ctx.align_pairs(pairs)

    for pending, aligned in query_groups():
        cursor = 0
        for qi, targets in pending:
            finalhits = []
            if targets:
                for t, res in zip(targets,
                                  aligned[cursor:cursor + len(targets)]):
                    hit = build_hit(qi, t, res)
                    if hit is not None:
                        finalhits.append(hit)
                cursor += len(targets)
                finalhits.sort(key=lambda h: (-h.id, h.target))
            emit_query(qi, finalhits)


def _allpairs_fast(params, eff, db, ctx, align_progress, make_qi,
                   build_hit, emit_query) -> None:
    """Device stats pipeline: dispatch the whole triangle, one bundled
    fetch, vectorized accept, realign only accepted/overflow pairs."""
    import jax
    from ..ops.allpairs_dev import AllPairsDevice
    seqcount = db.seqcount
    seqs = [db.getsequence(i) for i in range(seqcount)]
    dev = AllPairsDevice(ctx.scheme, seqs)
    lens = np.fromiter((db.getsequencelen(i) for i in range(seqcount)),
                       dtype=np.int64, count=seqcount)

    gate = unaligned_gate_active(eff)
    qis = {}

    # schedule the full triangle as index-pair batches, dispatching each
    # as soon as it fills; nothing is fetched until every batch is queued
    handles = []
    metas = []          # (qpos np.ndarray, tpos np.ndarray)
    qbuf: List[int] = []
    tbuf: List[int] = []

    def flush():
        if not qbuf:
            return
        qpos = np.asarray(qbuf, dtype=np.int32)
        tpos = np.asarray(tbuf, dtype=np.int32)
        h = dev.dispatch(qpos, tpos)
        # stream each batch's results to host as soon as its compute
        # finishes: on a tunneled attachment the final device_get
        # otherwise pays the link round-trip PER ARRAY, serially — ~7 ms
        # x 3 arrays x hundreds of batches dwarfed the actual DP compute
        try:
            for a in h:
                a.copy_to_host_async()
        except Exception:
            pass
        handles.append(h)
        metas.append((qpos, tpos))
        del qbuf[:], tbuf[:]

    for q in range(seqcount):
        align_progress.update(align_progress._counter
                              + (seqcount - q - 1))
        if gate:
            qi = qis.setdefault(q, make_qi(q))
            targets = _targets_for(params, eff, db, qi, seqcount)
        else:
            targets = range(q + 1, seqcount)
        for t in targets:
            qbuf.append(q)
            tbuf.append(t)
            if len(qbuf) == dev.PAIR_BATCH:
                flush()
    flush()
    dev.stats_flush()

    fetched = jax.device_get(handles)
    stats_list = dev.stats_results(jax.device_get(dev.stats_handles()))

    # vectorized acceptance over all batches
    accepted = {}        # query_no -> list of target
    slow: List = []      # (q, t) pairs needing the exact scalar path
    for (qpos, tpos), (score, overflow), stats in zip(metas, fetched,
                                                      stats_list):
        n = len(qpos)
        score = np.asarray(score)[:n]
        overflow = np.asarray(overflow)[:n]
        stats = np.asarray(stats)[:n]
        ok = _accept_mask(eff, stats, lens[qpos], lens[tpos])
        for q, t in zip(qpos[overflow].tolist(), tpos[overflow].tolist()):
            slow.append((q, t))
        ok &= ~overflow
        for q, t in zip(qpos[ok].tolist(), tpos[ok].tolist()):
            accepted.setdefault(q, []).append(t)

    # overflow pairs: exact scalar path decides (sentinel -> linmem)
    if slow:
        res = ctx.align_pairs([(seqs[q], t) for q, t in slow])
        for (q, t), r in zip(slow, res):
            qi = qis.setdefault(q, make_qi(q))
            hit = build_hit(qi, t, r)
            if hit is not None:
                accepted.setdefault(q, []).append(t)
                qi._slow_results = getattr(qi, "_slow_results", {})
                qi._slow_results[t] = r

    # realign accepted pairs for CIGARs (rare), then emit in query order
    realign = [(q, t) for q in sorted(accepted) for t in accepted[q]]
    results_map = {}
    pending = [(q, t) for q, t in realign
               if not hasattr(qis.get(q), "_slow_results")
               or t not in qis[q]._slow_results]
    if pending:
        res = ctx.align_pairs([(seqs[q], t) for q, t in pending])
        for (q, t), r in zip(pending, res):
            results_map[(q, t)] = r
    for q in range(seqcount):
        qi = qis.get(q) or make_qi(q)
        finalhits = []
        for t in accepted.get(q, ()):  # targets in ascending order
            slow_map = getattr(qi, "_slow_results", None)
            r = slow_map[t] if (slow_map and t in slow_map) \
                else results_map[(q, t)]
            hit = build_hit(qi, t, r)
            if hit is not None:
                finalhits.append(hit)
        finalhits.sort(key=lambda h: (-h.id, h.target))
        emit_query(qi, finalhits)
