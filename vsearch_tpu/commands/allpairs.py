"""allpairs_global command: all-vs-all pairwise global alignment.

reference: src/commands/allpairs_global.cpp — each query i aligned against
every target i+1..n-1 (no k-mer index), accepted hits sorted by
(id desc, target asc); forced single strand.  The triangular pair schedule
feeds the batched device aligner directly.
"""

from __future__ import annotations

import sys
from contextlib import ExitStack
from typing import IO, List, Optional

from ..params import Masking, Parameters
from ..db import Database
from ..io import fastx as fastx_io
from ..core import mask as mask_mod
from ..core import results
from ..core.search import SearchContext
from ..core.searchcore import (Hit, QueryInfo, align_trim,
                               fill_alignment_fields,
                               search_acceptable_aligned,
                               search_acceptable_unaligned)


from ..io.openfile import open_output_opt as _open  # noqa: E402


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

        qmatches = 0
        count_matched = 0
        count_notmatched = 0
        seqcount = db.seqcount

        from ..utils.progress import Progress
        align_progress = Progress(
            "Aligning", max(0, seqcount * (seqcount - 1)) // 2, params)
        # super-batched alignment: pair lists from consecutive queries are
        # merged until the batch amortizes a device dispatch (or fills the
        # native tier), then emitted strictly in query order
        BATCH_PAIRS = 8192

        def query_groups():
            pending = []       # (qi, targets)
            pairs = []
            for query_no in range(seqcount):
                align_progress.update(align_progress._counter
                                      + (seqcount - query_no - 1))
                qi = QueryInfo(query_head=db.getheader(query_no),
                               qsequence=db.getsequence(query_no),
                               qseqlen=db.getsequencelen(query_no),
                               qsize=db.getabundance(query_no), strand=0,
                               query_no=query_no)
                from ..core.searchcore import unaligned_gate_active
                if params.opt_acceptall or not unaligned_gate_active(eff):
                    targets = list(range(query_no + 1, seqcount))
                else:
                    targets = [t for t in range(query_no + 1, seqcount)
                               if search_acceptable_unaligned(eff, qi, db,
                                                              t)]
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
            finalhits: List[Hit] = []
            if targets:
                for t, res in zip(targets,
                                  aligned[cursor:cursor + len(targets)]):
                    hit = Hit(target=t, strand=0, count=0)
                    fill_alignment_fields(hit, qi, db, res)
                    align_trim(hit, eff)
                    if params.opt_acceptall or \
                            search_acceptable_aligned(eff, qi, db, hit):
                        finalhits.append(hit)
                cursor += len(targets)
                finalhits.sort(key=lambda h: (-h.id, h.target))

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
                qmatches += 1
                count_matched += 1
                if fp_matched is not None:
                    fastx_io.fasta_print_general(fp_matched, params, qseq,
                                                 query_head, qi.qsize,
                                                 count_matched)
            else:
                count_notmatched += 1
                if fp_notmatched is not None:
                    fastx_io.fasta_print_general(fp_notmatched, params, qseq,
                                                 query_head, qi.qsize,
                                                 count_notmatched)

        align_progress.done()
        # reference: allpairs_global.cpp:656-677 — "Matching query
        # sequences" (no "unique"); the log copy gets an extra blank line
        from ..utils.progress import message
        msg = "Matching query sequences: %d of %d" % (qmatches, seqcount)
        if seqcount > 0:
            msg += " (%.2f%%)" % (100.0 * qmatches / seqcount)
        message(params, msg)
