"""Hit-table writers: uc, blast6, alnout, userout, fastapairs, sam, seg.

Byte-exact mirrors of reference src/core/results.cpp and
src/core/showalign.cpp.  All writers take binary file objects and the
shared ``Hit`` struct.
"""

from __future__ import annotations

from typing import IO, List, Optional

import numpy as np

from ..params import Parameters
from ..utils.maps import CHRMAP_4BIT, AMBIGUOUS_4BIT, CHRMAP_COMPLEMENT
from ..io import fastx as fastx_io
from ..io.attributes import header_strip
from .searchcore import Hit, cigar_ops_iter

USERFIELDS_NAMES = [
    "query", "target", "evalue", "id", "pctpv", "pctgaps", "pairs", "gaps",
    "qlo", "qhi", "tlo", "thi", "pv", "ql", "tl", "qs", "ts", "alnlen",
    "opens", "exts", "raw", "bits", "aln", "caln", "qstrand", "tstrand",
    "qrow", "trow", "qframe", "tframe", "mism", "ids", "qcov", "tcov",
    "id0", "id1", "id2", "id3", "id4", "qilo", "qihi", "tilo", "tihi",
]


def parse_userfields(arg: str) -> List[int]:
    """reference: utils/userfields.cpp parse_userfields_arg"""
    fields = []
    for name in arg.split("+"):
        if name not in USERFIELDS_NAMES:
            raise ValueError("Unknown userfield: %s" % name)
        fields.append(USERFIELDS_NAMES.index(name))
    return fields


def _fmt1(x: float) -> bytes:
    return b"%.1f" % x


def _strip(params: Parameters, header: bytes) -> bytes:
    stripped, _ = header_strip(header, params.opt_xsize, params.opt_xee,
                               params.opt_xlength)
    return stripped


def check_if_perfect_match(params: Parameters, hit: Hit) -> bool:
    """reference: results.cpp:84-95"""
    if params.opt_cluster_fast is not None:
        return hit.matches == hit.internal_alignmentlength
    return hit.matches == hit.nwalignmentlength


def show_uc_one(out: IO[bytes], params: Parameters, hit: Optional[Hit],
                query_head: bytes, qseqlen: int, clusterno: int, db) -> None:
    """reference: results.cpp:274-327"""
    if hit is None:
        out.write(b"N\t*\t*\t*\t.\t*\t*\t*\t%s\t*\n" % query_head)
        return
    perfect = check_if_perfect_match(params, hit)
    out.write(b"H\t%d\t%d\t%s\t%c\t0\t0\t%s\t" % (
        clusterno, qseqlen, _fmt1(hit.id),
        ord("-") if hit.strand else ord("+"),
        b"=" if perfect else hit.nwalignment.encode()))
    out.write(_strip(params, query_head))
    out.write(b"\t")
    out.write(_strip(params, db.getheader(hit.target)))
    out.write(b"\n")


def show_blast6_one(out: IO[bytes], params: Parameters, hit: Optional[Hit],
                    query_head: bytes, qseqlen: int, db) -> None:
    """reference: results.cpp:221-271"""
    if hit is None:
        out.write(b"%s\t*\t0.0\t0\t0\t0\t0\t0\t0\t0\t-1\t0\n" % query_head)
        return
    qstart = qseqlen if hit.strand else 1
    qend = 1 if hit.strand else qseqlen
    out.write(b"%s\t%s\t%s\t%d\t%d\t%d\t%d\t%d\t%d\t%d\t%d\t%d\n" % (
        query_head, db.getheader(hit.target), _fmt1(hit.id),
        hit.internal_alignmentlength, hit.mismatches, hit.internal_gaps,
        qstart, qend, 1, db.getsequencelen(hit.target), -1, 0))


def get_alignment_qrow(seq: bytes, cigar: str, alignlen: int) -> bytes:
    """reference: showalign.cpp get_alignment_qrow — 'I' fills gaps."""
    return _get_alignment_row(seq, cigar, alignlen, fill_on="I")


def get_alignment_trow(seq: bytes, cigar: str, alignlen: int) -> bytes:
    """reference: showalign.cpp get_alignment_trow — 'D' fills gaps."""
    return _get_alignment_row(seq, cigar, alignlen, fill_on="D")


def _get_alignment_row(seq: bytes, cigar: str, alignlen: int,
                       fill_on: str) -> bytes:
    row = bytearray()
    src = 0
    for run, op in cigar_ops_iter(cigar):
        if op == fill_on:
            row += b"-" * run
        else:
            row += seq[src:src + run]
            src += run
    return bytes(row)


def show_fastapairs_one(out: IO[bytes], params: Parameters, hit: Hit,
                        query_head: bytes, qsequence: bytes,
                        qsequence_rc: Optional[bytes], db) -> None:
    """reference: results.cpp:100-155"""
    query = qsequence_rc if hit.strand else qsequence
    qrow = get_alignment_qrow(query, hit.nwalignment, hit.nwalignmentlength)
    off = hit.trim_q_left + hit.trim_t_left
    fastx_io.fasta_print_general(
        out, params, qrow[off:off + hit.internal_alignmentlength], query_head)
    tseq = db.getsequence(hit.target)
    trow = get_alignment_trow(tseq, hit.nwalignment, hit.nwalignmentlength)
    fastx_io.fasta_print_general(
        out, params, trow[off:off + hit.internal_alignmentlength],
        db.getheader(hit.target))
    out.write(b"\n")


def show_qsegout_one(out: IO[bytes], params: Parameters, hit: Hit,
                     query_head: bytes, qsequence: bytes, qseqlen: int,
                     qsequence_rc: Optional[bytes]) -> None:
    """reference: results.cpp:158-188"""
    qseq = (qsequence_rc if hit.strand else qsequence)
    qseg = qseq[hit.trim_q_left:qseqlen - hit.trim_q_right]
    fastx_io.fasta_print_general(out, params, qseg, query_head)


def show_tsegout_one(out: IO[bytes], params: Parameters, hit: Hit, db) -> None:
    """reference: results.cpp:191-218"""
    tseq = db.getsequence(hit.target)
    tseg = tseq[hit.trim_t_left:db.getsequencelen(hit.target) - hit.trim_t_right]
    fastx_io.fasta_print_general(out, params, tseg, db.getheader(hit.target))


def uncompressed_cigar(cigar: str) -> bytes:
    out = bytearray()
    for run, op in cigar_ops_iter(cigar):
        out += op.encode() * run
    return bytes(out)


def show_userout_one(out: IO[bytes], params: Parameters, hit: Optional[Hit],
                     query_head: bytes, qsequence: bytes, qseqlen: int,
                     qsequence_rc: Optional[bytes], db) -> None:
    """reference: results.cpp:330-542"""
    parts: List[bytes] = []
    if hit is not None:
        tsequence = db.getsequence(hit.target)
        tseqlen = db.getsequencelen(hit.target)
        t_head = db.getheader(hit.target)
    else:
        tsequence, tseqlen, t_head = None, 0, None

    for field in params.opt_userfields:
        if field == 0:
            parts.append(query_head)
        elif field == 1:
            parts.append(t_head if hit is not None else b"*")
        elif field == 2:
            parts.append(b"-1")
        elif field == 3:
            parts.append(_fmt1(hit.id if hit is not None else 0.0))
        elif field == 4:
            parts.append(_fmt1(100.0 * hit.matches / hit.internal_alignmentlength
                               if hit is not None and hit.internal_alignmentlength > 0
                               else 0.0))
        elif field == 5:
            parts.append(_fmt1(100.0 * hit.internal_indels / hit.internal_alignmentlength
                               if hit is not None and hit.internal_alignmentlength > 0
                               else 0.0))
        elif field == 6:
            parts.append(b"%d" % (hit.matches + hit.mismatches if hit is not None else 0))
        elif field == 7:
            parts.append(b"%d" % (hit.internal_indels if hit is not None else 0))
        elif field == 8:
            parts.append(b"%d" % ((qseqlen if hit.strand else 1) if hit is not None else 0))
        elif field == 9:
            parts.append(b"%d" % ((1 if hit.strand else qseqlen) if hit is not None else 0))
        elif field == 10:
            parts.append(b"%d" % (1 if hit is not None else 0))
        elif field == 11:
            parts.append(b"%d" % tseqlen)
        elif field == 12:
            parts.append(b"%d" % (hit.matches if hit is not None else 0))
        elif field == 13:
            parts.append(b"%d" % qseqlen)
        elif field == 14:
            parts.append(b"%d" % (tseqlen if hit is not None else 0))
        elif field == 15:
            parts.append(b"%d" % qseqlen)
        elif field == 16:
            parts.append(b"%d" % (tseqlen if hit is not None else 0))
        elif field == 17:
            parts.append(b"%d" % (hit.internal_alignmentlength if hit is not None else 0))
        elif field == 18:
            parts.append(b"%d" % (hit.internal_gaps if hit is not None else 0))
        elif field == 19:
            parts.append(b"%d" % (hit.internal_indels - hit.internal_gaps
                                  if hit is not None else 0))
        elif field == 20:
            parts.append(b"%d" % (hit.nwscore if hit is not None else 0))
        elif field == 21:
            parts.append(b"0")
        elif field == 22:
            parts.append(uncompressed_cigar(hit.nwalignment) if hit is not None else b"")
        elif field == 23:
            parts.append(hit.nwalignment.encode() if hit is not None else b"")
        elif field == 24:
            parts.append((b"-" if hit.strand else b"+") if hit is not None else b"")
        elif field == 25:
            parts.append(b"+" if hit is not None else b"")
        elif field == 26:
            if hit is not None:
                query = qsequence_rc if hit.strand else qsequence
                qrow = get_alignment_qrow(query, hit.nwalignment,
                                          hit.nwalignmentlength)
                off = hit.trim_q_left + hit.trim_t_left
                parts.append(qrow[off:off + hit.internal_alignmentlength])
            else:
                parts.append(b"")
        elif field == 27:
            if hit is not None:
                trow = get_alignment_trow(tsequence, hit.nwalignment,
                                          hit.nwalignmentlength)
                off = hit.trim_q_left + hit.trim_t_left
                parts.append(trow[off:off + hit.internal_alignmentlength])
            else:
                parts.append(b"")
        elif field == 28 or field == 29:
            parts.append(b"+0")
        elif field == 30:
            parts.append(b"%d" % (hit.mismatches if hit is not None else 0))
        elif field == 31:
            parts.append(b"%d" % (hit.matches if hit is not None else 0))
        elif field == 32:
            parts.append(_fmt1(100.0 * (hit.matches + hit.mismatches) / float(qseqlen)
                               if hit is not None else 0.0))
        elif field == 33:
            parts.append(_fmt1(100.0 * (hit.matches + hit.mismatches) / float(tseqlen)
                               if hit is not None else 0.0))
        elif field in (34, 35, 36, 37, 38):
            val = [hit.id0, hit.id1, hit.id2, hit.id3, hit.id4][field - 34] \
                if hit is not None else 0.0
            parts.append(_fmt1(val))
        elif field == 39:
            parts.append(b"%d" % (hit.trim_q_left + 1 if hit is not None else 0))
        elif field == 40:
            parts.append(b"%d" % (qseqlen - hit.trim_q_right if hit is not None else 0))
        elif field == 41:
            parts.append(b"%d" % (hit.trim_t_left + 1 if hit is not None else 0))
        elif field == 42:
            parts.append(b"%d" % (tseqlen - hit.trim_t_right if hit is not None else 0))
    out.write(b"\t".join(parts))
    out.write(b"\n")


# ---------------------------------------------------------------------------
# alnout (human-readable alignment blocks, showalign.cpp)
# ---------------------------------------------------------------------------

def _alignment_symbol(qc: int, tc: int, n_mismatch: bool) -> bytes:
    """reference: showalign.cpp get_aligment_symbol"""
    q4, t4 = int(CHRMAP_4BIT[qc]), int(CHRMAP_4BIT[tc])
    if n_mismatch and (q4 == 15 or t4 == 15):
        return b" "
    if q4 == t4 and not AMBIGUOUS_4BIT[q4]:
        return b"|"
    if (q4 & t4) != 0:
        return b"+"
    return b" "


def align_show(out: IO[bytes], params: Parameters,
               qseq: bytes, qseqlen: int, qoff: int, qname: bytes,
               tseq: bytes, tseqlen: int, toff: int, tname: bytes,
               cigar: str, numwidth: int, namewidth: int,
               alignwidth: int, strand: int) -> None:
    """reference: showalign.cpp align_show (:297-358 + putop machinery)."""
    is_rev = strand != 0
    qpos = (qseqlen - 1 - qoff) if is_rev else qoff
    tpos = toff
    qstart, tstart = qpos, tpos
    q_line = bytearray()
    a_line = bytearray()
    d_line = bytearray()
    line = 0
    delta = -1 if is_rev else 1

    def q_nuc() -> int:
        c = qseq[qpos]
        if is_rev:
            return int(CHRMAP_COMPLEMENT[c])
        return c

    def flush_block() -> None:
        nonlocal qstart, tstart, line
        q_start_disp = min(qstart + 1, qseqlen)
        q_end_disp = qpos + 2 if is_rev else qpos
        t_start_disp = min(tstart + 1, tseqlen)
        t_end_disp = tpos
        out.write(b"\n%*s %*d %c %s %d\n" % (
            namewidth, qname, numwidth, q_start_disp,
            ord("-") if is_rev else ord("+"), bytes(q_line), q_end_disp))
        out.write(b"%*s %*s   %s\n" % (namewidth, b"", numwidth, b"",
                                       bytes(a_line)))
        out.write(b"%*s %*d %c %s %d\n" % (
            namewidth, tname, numwidth, t_start_disp, ord("+"),
            bytes(d_line), t_end_disp))

    for run, op in cigar_ops_iter(cigar):
        for _ in range(run):
            if line == 0:
                qstart, tstart = qpos, tpos
            if op == "M":
                qc = q_nuc()
                tc = tseq[tpos]
                qpos += delta
                tpos += 1
                q_line.append(qc)
                a_line += _alignment_symbol(qc, tc, params.opt_n_mismatch)
                d_line.append(tc)
            elif op == "D":  # gap in target
                qc = q_nuc()
                qpos += delta
                q_line.append(qc)
                a_line += b" "
                d_line += b"-"
            else:  # 'I': gap in query
                tc = tseq[tpos]
                tpos += 1
                q_line += b"-"
                a_line += b" "
                d_line.append(tc)
            line += 1
            if line == alignwidth:
                flush_block()
                q_line = bytearray()
                a_line = bytearray()
                d_line = bytearray()
                line = 0
    if line > 0:
        flush_block()


def show_alnout(out: IO[bytes], params: Parameters, hits: List[Hit],
                query_head: bytes, qsequence: bytes, qseqlen: int, db) -> None:
    """reference: results.cpp:690-788"""
    if not hits:
        if params.opt_output_no_hits:
            out.write(b"\n")
            out.write(b"Query >%s\n" % query_head)
            out.write(b"No hits\n")
        return

    out.write(b"\n")
    out.write(b"Query >%s\n" % query_head)
    out.write(b" %Id   TLen  Target\n")
    top_hit_id = hits[0].id
    for hit in hits:
        if params.opt_top_hits_only and hit.id < top_hit_id:
            break
        out.write(b"%3.0f%% %6d  %s\n" % (
            hit.id, db.getsequencelen(hit.target), db.getheader(hit.target)))

    for hit in hits:
        if params.opt_top_hits_only and hit.id < top_hit_id:
            break
        out.write(b"\n")
        tseq = db.getsequence(hit.target)
        tseqlen = db.getsequencelen(hit.target)
        numwidth = max(len(b"%d" % qseqlen), len(b"%d" % tseqlen))
        out.write(b" Query %*dnt >%s\n" % (numwidth, qseqlen, query_head))
        out.write(b"Target %*dnt >%s\n" % (numwidth, tseqlen,
                                           db.getheader(hit.target)))
        rowlen = (qseqlen + tseqlen) if params.opt_rowlen == 0 else params.opt_rowlen

        # trim the cigar ends as results.cpp:770-772 does with trim_aln_*
        cigar = hit.nwalignment
        trimmed = cigar[hit.trim_aln_left:len(cigar) - hit.trim_aln_right]
        align_show(out, params, qsequence, qseqlen, hit.trim_q_left,
                   b"Qry", tseq, tseqlen, hit.trim_t_left, b"Tgt",
                   trimmed, numwidth, 3, rowlen, hit.strand)
        out.write(b"\n%d cols, %d ids (%3.1f%%), %d gaps (%3.1f%%)\n" % (
            hit.internal_alignmentlength, hit.matches, hit.id,
            hit.internal_indels,
            (100.0 * hit.internal_indels / hit.internal_alignmentlength
             if hit.internal_alignmentlength > 0 else 0.0)))


# ---------------------------------------------------------------------------
# SAM
# ---------------------------------------------------------------------------

def _is_same_4bit(a: int, b: int) -> bool:
    return int(CHRMAP_4BIT[a]) == int(CHRMAP_4BIT[b])


def build_sam_strings(cigar: str, queryseq: bytes, targetseq: bytes):
    """reference: results.cpp:791-920"""
    sam_cigar = []
    md = []
    qpos = tpos = 0
    matched = 0
    flag = False
    for run, op in cigar_ops_iter(cigar):
        if op == "M":
            sam_cigar.append(b"%dM" % run)
            for _ in range(run):
                if _is_same_4bit(queryseq[qpos], targetseq[tpos]):
                    matched += 1
                else:
                    if not flag:
                        md.append(b"%d" % matched)
                        matched = 0
                        flag = True
                    md.append(targetseq[tpos:tpos + 1])
                    flag = False
                qpos += 1
                tpos += 1
        elif op == "D":
            sam_cigar.append(b"%dI" % run)
            qpos += run
        else:  # I
            sam_cigar.append(b"%dD" % run)
            if not flag:
                md.append(b"%d" % matched)
                matched = 0
                flag = True
            md.append(b"^")
            md.append(targetseq[tpos:tpos + run])
            tpos += run
            flag = False
    if not flag:
        md.append(b"%d" % matched)
    return b"".join(sam_cigar), b"".join(md)


def show_samheader(out: IO[bytes], params: Parameters, dbname: str, db) -> None:
    """reference: results.cpp:922-951"""
    import hashlib
    from ..utils.digest import normalize
    if params.opt_samout is None or not params.opt_samheader:
        return
    out.write(b"@HD\tVN:1.0\tSO:unsorted\tGO:query\n")
    for i in range(db.seqcount):
        md5 = hashlib.md5(normalize(db.getsequence(i))).hexdigest().encode()
        out.write(b"@SQ\tSN:%s\tLN:%d\tM5:%s\tUR:file:%s\n" % (
            db.getheader(i), db.getsequencelen(i), md5, dbname.encode()))
    out.write(b"@PG\tID:vsearch\tVN:%s\tCL:%s\n" % (
        b"2.31.0", params.command_line.encode()))


def show_samout(out: IO[bytes], params: Parameters, hits: List[Hit],
                query_head: bytes, qsequence: bytes,
                qsequence_rc: Optional[bytes], db) -> None:
    """reference: results.cpp:954-1070"""
    if not hits:
        if params.opt_output_no_hits:
            out.write(b"%s\t%d\t*\t0\t255\t*\t*\t0\t0\t%s\t*\n" % (
                query_head, 0x04, qsequence))
        return
    top_hit_id = hits[0].id
    for t, hit in enumerate(hits):
        if params.opt_top_hits_only and hit.id < top_hit_id:
            break
        query = qsequence_rc if hit.strand else qsequence
        sam_cigar, md = build_sam_strings(hit.nwalignment, query,
                                          db.getsequence(hit.target))
        out.write(b"%s\t%d\t%s\t1\t255\t%s\t*\t0\t0\t%s\t*\t"
                  b"AS:i:%.0f\tXN:i:0\tXM:i:%d\tXO:i:%d\t"
                  b"XG:i:%d\tNM:i:%d\tMD:Z:%s\tYT:Z:UU\n" % (
                      query_head, (0x10 * hit.strand) | (0x100 if t > 0 else 0),
                      db.getheader(hit.target), sam_cigar, query,
                      hit.id, hit.mismatches, hit.internal_gaps,
                      hit.internal_indels, hit.mismatches + hit.internal_indels,
                      md))
