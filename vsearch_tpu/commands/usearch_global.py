"""usearch_global command driver.

Mirrors reference src/commands/usearch_global.cpp: output-file handling,
per-query result emission (in deterministic query order — equal to the
reference's single-thread order), summary statistics, dbmatched/otutab
post-passes.  Queries are processed in batches through the batched device
search pipeline (core/search.py).
"""

from __future__ import annotations

import sys
from contextlib import ExitStack
from typing import IO, List, Optional

from ..params import Parameters
from ..db import Database
from ..io import fastx as fastx_io
from ..core import results
from ..core.search import SearchContext
from ..utils.phasetimer import phase
from ..core.otutable import OtuTable

# query batch per device round: large enough to amortize the tunnel
# round-trip (~64 ms) across the topk + alignment calls of a batch
BATCH = 2048


from ..io.openfile import open_output_opt as _open  # noqa: E402


def _batch_size(ctx=None) -> int:
    """Query batch per pipeline stage.

    With an active device index the batch shrinks to one scoring chunk
    (512 queries) so the loop's 1-deep software pipeline actually
    overlaps: batch i+1's candidate matmul runs on the TPU while batch
    i's results are fetched, walked and written on host.  At the old
    2048 default the whole bench-sized query set was a single batch and
    scoring/host work ran strictly serially.  Host-tier runs keep the
    large batch (no device work to overlap; bigger batches amortize the
    native-call overhead better)."""
    import os
    v = os.environ.get("VSEARCH_TPU_BATCH")
    if v:
        try:
            return max(1, int(v))
        except ValueError:
            pass
    if ctx is not None and getattr(ctx, "device_index", None) is not None:
        return 512
    return BATCH


def _batches(iterable, size=BATCH):
    batch = []
    for item in iterable:
        batch.append(item)
        if len(batch) == size:
            yield batch
            batch = []
    if batch:
        yield batch


def usearch_global(params: Parameters) -> None:
    from ..core.search import load_db_and_index
    with phase("load"):
        db, index = load_db_and_index(params, params.opt_db)
        ctx = SearchContext.build(params, db, index=index)
    run_search_output(params, db, ctx, params.opt_usearch_global)


def run_search_output(params: Parameters, db: Database, ctx,
                      query_file: str) -> None:
    """Shared output surface for usearch_global and search_exact
    (reference: usearch_global.cpp search_output_results + post passes;
    search_exact.cpp reuses the identical surface)."""
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
        fp_dbmatched = _open(stack, params.opt_dbmatched, "--dbmatched")
        fp_dbnotmatched = _open(stack, params.opt_dbnotmatched, "--dbnotmatched")
        fp_otutabout = _open(stack, params.opt_otutabout, "--otutabout")
        fp_mothur = _open(stack, params.opt_mothur_shared_out, "--mothur_shared_out")
        fp_biomout = _open(stack, params.opt_biomout, "--biomout")
        fp_lcaout = _open(stack, params.opt_lcaout, "--lcaout")

        if fp_samout is not None:
            results.show_samheader(fp_samout, params, params.opt_db, db)
        if ctx is None:
            ctx = SearchContext.build(params, db)

        otutab = OtuTable() if (fp_otutabout or fp_mothur or fp_biomout) else None
        dbmatched = [0] * db.seqcount
        stats = {"qmatches": 0, "queries": 0, "qmatches_abundance": 0,
                 "queries_abundance": 0, "count_matched": 0,
                 "count_notmatched": 0}

        def emit(rec, hits, qseq_masked, qseq_rc) -> None:
            stats["queries"] += 1
            stats["queries_abundance"] += rec.abundance
            if hits:
                stats["qmatches"] += 1
                stats["qmatches_abundance"] += rec.abundance

            toreport = min(params.opt_maxhits, len(hits))
            query_head = rec.header
            qseqlen = len(qseq_masked)

            if fp_alnout is not None:
                results.show_alnout(fp_alnout, params, hits[:toreport],
                                    query_head, qseq_masked, qseqlen, db)
            if fp_lcaout is not None:
                results_show_lcaout(fp_lcaout, params, hits[:toreport],
                                    query_head, db)
            if fp_samout is not None:
                results.show_samout(fp_samout, params, hits[:toreport],
                                    query_head, qseq_masked, qseq_rc, db)
            if toreport:
                top_hit_id = hits[0].id
                if otutab is not None:
                    otutab.add(query_head, db.getheader(hits[0].target),
                               rec.abundance)
                for t in range(toreport):
                    hp = hits[t]
                    if params.opt_top_hits_only and hp.id < top_hit_id:
                        break
                    if fp_fastapairs is not None:
                        results.show_fastapairs_one(
                            fp_fastapairs, params, hp, query_head,
                            qseq_masked, qseq_rc, db)
                    if fp_qsegout is not None:
                        results.show_qsegout_one(fp_qsegout, params, hp,
                                                 query_head, qseq_masked,
                                                 qseqlen, qseq_rc)
                    if fp_tsegout is not None:
                        results.show_tsegout_one(fp_tsegout, params, hp, db)
                    if fp_uc is not None and (t == 0 or params.opt_uc_allhits):
                        results.show_uc_one(fp_uc, params, hp, query_head,
                                            qseqlen, hp.target, db)
                    if fp_userout is not None:
                        results.show_userout_one(fp_userout, params, hp,
                                                 query_head, qseq_masked,
                                                 qseqlen, qseq_rc, db)
                    if fp_blast6out is not None:
                        results.show_blast6_one(fp_blast6out, params, hp,
                                                query_head, qseqlen, db)
            else:
                if otutab is not None:
                    otutab.add(query_head, None, rec.abundance)
                if fp_uc is not None:
                    results.show_uc_one(fp_uc, params, None, query_head,
                                        qseqlen, 0, db)
                if params.opt_output_no_hits:
                    if fp_userout is not None:
                        results.show_userout_one(fp_userout, params, None,
                                                 query_head, qseq_masked,
                                                 qseqlen, qseq_rc, db)
                    if fp_blast6out is not None:
                        results.show_blast6_one(fp_blast6out, params, None,
                                                query_head, qseqlen, db)

            if hits:
                stats["count_matched"] += 1
                if fp_matched is not None:
                    fastx_io.fasta_print_general(
                        fp_matched, params, qseq_masked, query_head,
                        rec.abundance, stats["count_matched"])
            else:
                stats["count_notmatched"] += 1
                if fp_notmatched is not None:
                    fastx_io.fasta_print_general(
                        fp_notmatched, params, qseq_masked, query_head,
                        rec.abundance, stats["count_notmatched"])

            for hp in hits:
                if hp.accepted or hp.weak:
                    dbmatched[hp.target] += (rec.abundance
                                             if params.opt_sizein else 1)

        # 1-deep software pipeline: while batch i's hits are walked and
        # written on host, batch i+1's candidate scoring runs on device
        # (the TPU analogue of the reference's reader/worker overlap,
        # worker_loop.hpp:93-106)
        def flush(prev):
            chunk, tasks, state = prev
            if hasattr(ctx, "search_tasks_finish"):
                ctx.search_tasks_finish(state)
            with phase("emit"):
                for rec, task in zip(chunk, tasks):
                    hits = ctx.join_task(task)
                    emit(rec, hits, task.seqs[0],
                         task.seqs[1] if len(task.seqs) > 1 else None)

        from ..utils.progress import Progress, message_both
        prev = None
        # query open failure must surface before the progress meter starts
        # (reference: fastx_open at usearch_global.cpp:675 precedes Progress)
        fastx_io.check_readable(query_file)
        with Progress("Searching", 1, params) as search_progress:
            for chunk in _batches(fastx_io.read_fastx(query_file, params),
                                  _batch_size(ctx)):
                if hasattr(ctx, "prepare_tasks"):
                    tasks = ctx.prepare_tasks(chunk)
                    state = ctx.search_tasks_begin(tasks)
                else:  # search_exact's hash-based context
                    tasks = [ctx.prepare_task(rec.header, rec.sequence,
                                              rec.abundance, rec.seqno)
                             for rec in chunk]
                    ctx.search_tasks(tasks)
                    state = None
                if prev is not None:
                    flush(prev)
                prev = (chunk, tasks, state)
                search_progress.update()
            if prev is not None:
                flush(prev)

        # summary (reference: usearch_global.cpp:715-760 — identical text to
        # stderr and the log, plus the sizein abundance-weighted variant)
        msg = "Matching unique query sequences: %d of %d" % (
            stats["qmatches"], stats["queries"])
        if stats["queries"] > 0:
            msg += " (%.2f%%)" % (100.0 * stats["qmatches"]
                                  / stats["queries"])
        msg += "\n"
        if params.opt_sizein:
            msg += "Matching total query sequences: %d of %d" % (
                stats["qmatches_abundance"], stats["queries_abundance"])
            if stats["queries_abundance"] > 0:
                msg += " (%.2f%%)" % (100.0 * stats["qmatches_abundance"]
                                      / stats["queries_abundance"])
            msg += "\n"
        message_both(params, msg)

        if otutab is not None:
            for i in range(db.seqcount):
                if dbmatched[i] == 0:
                    otutab.add(None, db.getheader(i), 0)
            if fp_biomout is not None:
                otutab.print_biomout(fp_biomout, params)
            if fp_otutabout is not None:
                otutab.print_otutabout(fp_otutabout, params)
            if fp_mothur is not None:
                otutab.print_mothur_shared_out(fp_mothur, params)

        if fp_dbmatched is not None or fp_dbnotmatched is not None:
            count_m = 0
            count_n = 0
            for i in range(db.seqcount):
                if dbmatched[i]:
                    count_m += 1
                    if fp_dbmatched is not None:
                        fastx_io.fasta_print_general(
                            fp_dbmatched, params, db.getsequence(i),
                            db.getheader(i), dbmatched[i], count_m)
                else:
                    count_n += 1
                    if fp_dbnotmatched is not None:
                        fastx_io.fasta_print_general(
                            fp_dbnotmatched, params, db.getsequence(i),
                            db.getheader(i), db.getabundance(i), count_n)


def results_show_lcaout(out, params: Parameters, hits, query_head: bytes,
                        db) -> None:
    """reference: results.cpp:545-687 (Boyer-Moore majority LCA vote)."""
    from ..core.tax import tax_split, TAX_LEVELS, TAXONOMIC_FIELDS
    out.write(query_head + b"\t")
    if not hits:
        out.write(b"\n")
        return
    votes = [0] * TAX_LEVELS
    cand = [-1] * TAX_LEVELS
    cand_splits: List[Optional[list]] = [None] * TAX_LEVELS
    level_match = [0] * TAX_LEVELS

    top_hit_id = hits[0].id
    tophitcount = 0
    for hp in hits:
        if params.opt_top_hits_only and hp.id < top_hit_id:
            break
        tophitcount += 1
        seqno = hp.target
        new_split = tax_split(db.getheader(seqno))
        for k in range(TAX_LEVELS):
            if votes[k] == 0:
                cand[k] = seqno
                votes[k] = 1
                cand_splits[k] = new_split
            else:
                match = all(cand_splits[k][j] == new_split[j]
                            for j in range(k + 1))
                if match:
                    votes[k] += 1
                else:
                    votes[k] -= 1
    for hp in hits[:tophitcount]:
        new_split = tax_split(db.getheader(hp.target))
        for k in range(TAX_LEVELS):
            if all(cand_splits[k][j] == new_split[j] for j in range(k + 1)):
                level_match[k] += 1

    if tophitcount == 0:
        out.write(b"\n")
        return
    comma = False
    for j in range(TAX_LEVELS):
        if 1.0 * level_match[j] / tophitcount < params.opt_lca_cutoff:
            break
        if cand_splits[j] is not None and len(cand_splits[j][j]) > 0:
            out.write((b"," if comma else b"") + TAXONOMIC_FIELDS[j:j + 1]
                      + b":" + cand_splits[j][j])
            comma = True
    out.write(b"\n")
