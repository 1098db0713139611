"""sintax command: naive-Bayes-like bootstrapped taxonomy classifier.

reference: src/commands/sintax.cpp — 100 bootstraps of up to 32 distinct
random query k-mers, top DB hit per bootstrap via the shared-kmer counter
(ties: shortest, then lowest seqno; or random with --sintax_random),
rank-wise consensus voting with prefix constraint.
"""

from __future__ import annotations

import sys
from contextlib import ExitStack
from typing import List, Optional

import numpy as np

from ..params import Masking, Parameters
from ..db import Database
from ..index import KmerIndex
from ..io import fastx as fastx_io
from ..ops import kmer as kmer_ops
from ..core.tax import tax_split, TAX_LEVELS, TAXONOMIC_FIELDS
from ..utils.maps import reverse_complement
from ..utils.random import (SplitMix64, random_base_seed, random_bounded,
                            random_substream_seed)
from ..io.openfile import open_output

SUBSET_SIZE = 32
BOOTSTRAP_COUNT = 100


def _search_topscore(index: KmerIndex, db, kmers: np.ndarray,
                     rng: SplitMix64, params: Parameters):
    """reference: sintax.cpp sintax_search_topscores (:299-402)."""
    if not params.opt_sintax_random:
        # best by (count desc, length asc, seqno asc) with count > 1 —
        # exactly the candidate heap's total order
        cands = index.candidates_for_query(kmers, 1, 2)
        if cands:
            seqno, count = cands[0]
            return count, seqno
        return None
    counts = index.counts_for_query(kmers)
    best_count = 0
    best_seqno = 0
    best_length = 0
    tophit_count = 0
    for i in range(index.count):
        count = int(counts[i])
        seqno = index.mapping[i]
        length = index.lengths[i]
        if count > best_count:
            best_count, best_seqno, best_length = count, seqno, length
            tophit_count = 1
        elif count == best_count:
            if params.opt_sintax_random:
                tophit_count += 1
                if random_bounded(rng, tophit_count) == 0:
                    best_seqno, best_length = seqno, length
            else:
                if length < best_length:
                    best_seqno, best_length = seqno, length
                elif length == best_length:
                    best_seqno = min(seqno, best_seqno)
    if best_count > 1:
        return best_count, best_seqno
    return None


def _analyse(params: Parameters, db, out, query_head: bytes, strand: int,
             all_seqno: List[int], stats) -> None:
    """reference: sintax.cpp sintax_analyse (:139-296)."""
    count = len(all_seqno)
    is_enough = count >= (BOOTSTRAP_COUNT + 1) // 2

    level_best = [-1] * TAX_LEVELS
    level_matchcount = [0] * TAX_LEVELS
    cand_names: List[List[bytes]] = []

    if is_enough:
        for seqno in all_seqno:
            cand_names.append(tax_split(db.getheader(seqno)))
        cand_included = [True] * count
        for k in range(TAX_LEVELS):
            cand_match = [-1] * count
            cand_matchcount = [0] * count
            for i in range(count):
                if not cand_included[i]:
                    continue
                for j in range(i + 1):
                    if cand_included[j] and \
                            cand_names[i][k] == cand_names[j][k]:
                        cand_match[i] = j
                        cand_matchcount[j] += 1
                        break
            level_best[k] = -1
            level_matchcount[k] = 0
            for i in range(count):
                if cand_matchcount[i] > level_matchcount[k]:
                    level_best[k] = i
                    level_matchcount[k] = cand_matchcount[i]
            for i in range(count):
                if cand_match[i] != level_best[k]:
                    cand_included[i] = False

    out.write(query_head + b"\t")
    stats["queries"] += 1
    if is_enough:
        stats["classified"] += 1
        comma = False
        for k in range(TAX_LEVELS):
            best = level_best[k]
            name = cand_names[best][k]
            if len(name) > 0:
                out.write((b"," if comma else b"")
                          + TAXONOMIC_FIELDS[k:k + 1] + b":" + name
                          + b"(%.2f)" % (1.0 * level_matchcount[k] / count))
                comma = True
        out.write(b"\t%c" % (ord("-") if strand else ord("+")))
        if params.opt_sintax_cutoff > 0.0:
            out.write(b"\t")
            comma = False
            for k in range(TAX_LEVELS):
                best = level_best[k]
                name = cand_names[best][k]
                if (len(name) > 0 and 1.0 * level_matchcount[k] / count
                        >= params.opt_sintax_cutoff):
                    out.write((b"," if comma else b"")
                              + TAXONOMIC_FIELDS[k:k + 1] + b":" + name)
                    comma = True
    else:
        out.write(b"\t\t" if params.opt_sintax_cutoff > 0.0 else b"\t")
    out.write(b"\n")


def sintax(params: Parameters) -> None:
    if params.opt_tabbedout is None:
        # reference: open_mandatory_output_file (open_file.cpp:140-143)
        raise ValueError("output file must be specified with --tabbedout")

    with ExitStack() as stack:
        # reference opens --tabbedout before the database (sintax.cpp:704)
        out = stack.enter_context(
            open_output(params.opt_tabbedout, "--tabbedout"))

        from ..core.search import load_db_and_index
        db, index = load_db_and_index(params, params.opt_db, do_mask=False)

        base_seed = random_base_seed(params)
        stats = {"queries": 0, "classified": 0}

        # query open failure surfaces before the progress meter
        # (reference: fastx_open at sintax.cpp:730)
        fastx_io.check_readable(params.opt_sintax)
        from ..utils.progress import Progress
        classify_progress = Progress("Classifying sequences", 1, params)
        # deferred stripped-char warning: the reference emits it at
        # fastx_close, after the progress meter AND the Classified summary
        # (sintax.cpp:755-796) — collect it here and flush at the end
        deferred_warn = []
        for rec in fastx_io.read_fastx(params.opt_sintax, params,
                                       warn_out=deferred_warn):
            classify_progress.update()
            rng = SplitMix64(random_substream_seed(base_seed, rec.seqno))
            strands = 2 if params.opt_strand else 1
            all_seqno = [[], []]
            best_count = [0, 0]
            for s in range(strands):
                seq = rec.sequence if s == 0 else \
                    reverse_complement(rec.sequence)
                kmersample = kmer_ops.unique_kmers(
                    seq, index.wordlength, Masking.none)
                kmersamplecount = int(kmersample.size)
                if kmersamplecount < SUBSET_SIZE:
                    continue
                # all bootstrap draws for this strand at once (bit-identical
                # sequence to the scalar loop); the random tie-break path
                # consumes extra draws mid-stream, so it stays scalar
                draws = None
                if not params.opt_sintax_random:
                    from ..utils.random import random_bounded_block
                    draws = random_bounded_block(
                        rng, BOOTSTRAP_COUNT * SUBSET_SIZE,
                        kmersamplecount).reshape(BOOTSTRAP_COUNT,
                                                 SUBSET_SIZE)
                for b in range(BOOTSTRAP_COUNT):
                    used = set()
                    subset = []
                    for i in range(SUBSET_SIZE):
                        x = (int(draws[b, i]) if draws is not None
                             else random_bounded(rng, kmersamplecount))
                        if x not in used:
                            subset.append(int(kmersample[x]))
                            used.add(x)
                    result = _search_topscore(
                        index, db, np.array(subset, dtype=np.uint32), rng,
                        params)
                    if result is not None:
                        count, seqno = result
                        all_seqno[s].append(seqno)
                        best_count[s] = max(count, best_count[s])

            if not params.opt_strand:
                best_strand = 0
            elif best_count[0] > best_count[1]:
                best_strand = 0
            elif best_count[1] > best_count[0]:
                best_strand = 1
            else:
                best_strand = 0 if len(all_seqno[0]) >= len(all_seqno[1]) \
                    else 1
            _analyse(params, db, out, rec.header, best_strand,
                     all_seqno[best_strand], stats)

        classify_progress.done()
        from ..utils.progress import message_both
        msg = "Classified %d of %d sequences" % (stats["classified"],
                                                 stats["queries"])
        if stats["queries"] > 0:
            msg += " (%.2f%%)" % (100.0 * stats["classified"]
                                  / stats["queries"])
        message_both(params, msg + "\n")
        for stripped, is_fq in deferred_warn:
            fastx_io._warn_stripped(params, stripped, is_fq)
