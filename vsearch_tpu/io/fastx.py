"""FASTA/FASTQ streaming reader and writers.

Mirrors the reference's auto-detecting fastx reader (src/core/fastx.cpp,
fasta.cpp, fastq.cpp): gz/bz2 auto-detection by magic bytes, header
truncation at first blank (src/core/fastx.cpp:152-160), the per-character
sequence action table (src/core/fasta.cpp:112-121) and the fasta/fastq
printers (fasta_print_general / fasta_print_sequence).
"""

from __future__ import annotations

import bz2
import dataclasses
import gzip
import io
import os
import sys
from typing import IO, Iterator, List, Optional

import numpy as np

from ..params import Parameters
from . import attributes

# Sequence character actions (reference: fasta.cpp char_actions):
# 0=warn(strip), 1=accept, 2=reject(fatal), 3=show(fatal), 4=skip, 5=count
_ACTION = np.zeros(256, dtype=np.uint8)
_ACTION[:] = 0  # warn by default for >=32
_ACTION[0:32] = 3
for _c in (9, 11, 12, 13):
    _ACTION[_c] = 4
_ACTION[10] = 5
_ACTION[ord("-")] = 2
_ACTION[ord(".")] = 2
for _c in "ABCDGHKMNRSTUVWYabcdghkmnrstuvwy":
    _ACTION[ord(_c)] = 1

_ACCEPT_MASK = _ACTION == 1
_FATAL_MASK = (_ACTION == 2) | (_ACTION == 3)


@dataclasses.dataclass
class SeqRecord:
    header: bytes          # truncated (or full) header without '>'
    sequence: bytes        # filtered sequence characters
    quality: Optional[bytes] = None  # fastq quality string, None for fasta
    seqno: int = 0         # zero-based ordinal in the input file
    abundance: int = 1     # ;size=N annotation, default 1

    @property
    def length(self) -> int:
        return len(self.sequence)


def open_maybe_compressed(filename: str) -> IO[bytes]:
    """Auto-detect gzip/bzip2 by magic bytes (reference: fastx.cpp
    fastx_open MAGIC detection; the reference dlopens zlib/bz2).

    "-" maps to standard input (reference: open_file.cpp open_input_file
    duplicates stdin); the stream is slurped into a seekable buffer so the
    magic probe and the record scan both see it from the start.  Open
    failures carry the reference's fatal text (fastx.cpp:276)."""
    if filename == "-":
        import io as _io
        handle: IO[bytes] = _io.BytesIO(sys.stdin.buffer.read())
    else:
        try:
            handle = open(filename, "rb")
        except OSError:
            raise ValueError("Unable to open file for reading (%s)"
                             % filename)
    magic = handle.read(3)
    handle.seek(0)
    if magic[:2] == b"\x1f\x8b":
        return gzip.open(handle, "rb")  # type: ignore[return-value]
    if magic[:3] == b"BZh":
        # strict-parity knob: a reference build whose runtime dlopen of
        # libbz2 fails exits 1 with this exact text (dynlibs.cpp /
        # fastx.cpp); we always CAN decompress (python bz2 is built in),
        # so harnesses comparing against such a build set
        # VSEARCH_TPU_NO_BZ2=1 to reproduce its refusal bit-for-bit
        import os as _os
        if _os.environ.get("VSEARCH_TPU_NO_BZ2", "0") == "1":
            raise ValueError(
                "Files compressed with bzip2 are not supported")
        return bz2.open(handle, "rb")  # type: ignore[return-value]
    return handle


def _truncate_header(header: bytes, truncateatspace: bool) -> bytes:
    if truncateatspace:
        for i, b in enumerate(header):
            if b in (0x20, 0x09, 0x00, 0x0D, 0x0A):
                return header[:i]
        return header
    # full header still stops at NUL/CR/LF (reference find_header_end)
    for i, b in enumerate(header):
        if b in (0x00, 0x0D, 0x0A):
            return header[:i]
    return header


_STRIP_MASK = _ACTION == 0
# C-speed translate tables: delete everything except the accepted alphabet;
# a second pass isolates fatal/stripped chars only when something was removed
_DELETE_NON_ACCEPT = bytes(i for i in range(256) if not _ACCEPT_MASK[i])
_DELETE_ACCEPT_AND_WS = bytes(
    i for i in range(256) if _ACCEPT_MASK[i] or _ACTION[i] in (4, 5))
from ..utils.maps import CHRMAP_UPCASE as _CHRMAP_UPCASE  # noqa: E402
_UPCASE_TABLE = bytes(_CHRMAP_UPCASE.tolist())


def _filter_sequence(seq: bytes, upcase: bool = False,
                     stripped=None) -> bytes:
    """Strip non-accepted characters; fatal on '-'/'.'/control chars.

    reference: fasta.cpp fasta_filter_sequence."""
    out = seq.translate(None, _DELETE_NON_ACCEPT)
    if len(out) + seq.count(b"\n") + seq.count(b"\r") != len(seq):
        # slow path: something beyond newlines was removed — classify it
        leftover = seq.translate(None, _DELETE_ACCEPT_AND_WS)
        arr = np.frombuffer(leftover, dtype=np.uint8)
        if arr.size and _FATAL_MASK[arr].any():
            bad = arr[_FATAL_MASK[arr]][0]
            raise ValueError(
                "Illegal character '%c' in sequence of FASTA file" % chr(bad))
        if stripped is not None and arr.size:
            np.add.at(stripped, arr, 1)
    if upcase:
        out = out.translate(_UPCASE_TABLE)
    return out


def _warn_stripped(params, stripped, is_fastq: bool) -> None:
    """reference: fastx.cpp fastx_close (:527-557) — stripped-character
    warning on stderr (not gated on --quiet) duplicated to the log."""
    total = int(stripped.sum())
    if total == 0:
        return
    parts = ["WARNING: %d invalid characters stripped from %s file:"
             % (total, "FASTQ" if is_fastq else "FASTA")]
    for i in np.flatnonzero(stripped):
        parts.append(" %c(%d)" % (chr(int(i)), int(stripped[i])))
    text = ("".join(parts)
            + "\nREMINDER: vsearch does not support amino acid sequences\n")
    sys.stderr.write(text)
    log = getattr(params, "fp_log", None) if params is not None else None
    if log is not None:
        log.write(text.encode())


def check_readable(filename: str) -> None:
    """Fail fast with the reference's open error (fastx.cpp:276) before any
    progress output starts — the reference opens the query file before its
    per-phase Progress is constructed."""
    if filename == "-":
        return
    try:
        open(filename, "rb").close()
    except OSError:
        raise ValueError("Unable to open file for reading (%s)" % filename)


def is_fastq(filename: str) -> bool:
    with open_maybe_compressed(filename) as handle:
        first = handle.read(1)
    return first == b"@"


def read_fastx(filename: str, params: Optional[Parameters] = None,
               truncateatspace: Optional[bool] = None,
               upcase: bool = False, warn_out=None) -> Iterator[SeqRecord]:
    """Stream records from a FASTA or FASTQ file (auto-detected).

    warn_out: optional list; when given, the stripped-character warning is
    deferred into it as (stripped_counts, is_fastq) for the caller to flush
    after its progress meter completes (reference emits the warning at
    fastx_close, after the Progress is destroyed — db.cpp:296-298)."""
    if truncateatspace is None:
        truncateatspace = not (params is not None and params.opt_notrunclabels)
    if is_fastq(filename):
        yield from read_fastq(filename, truncateatspace, upcase, params,
                              warn_out)
    else:
        yield from read_fasta(filename, truncateatspace, upcase, params,
                              warn_out)


def read_fasta(filename: str, truncateatspace: bool = True,
               upcase: bool = False, params=None,
               warn_out=None) -> Iterator[SeqRecord]:
    """FASTA records; native single-pass scanner when available, Python
    fallback otherwise (and for the exact error messages on bad input)."""
    from .. import native
    if native.available():
        with open_maybe_compressed(filename) as handle:
            data = handle.read()
        res = native.scan_fasta(data, truncateatspace, upcase)
        if res is not None:
            nrec, seq_out, seq_off, head_off, head_len, sizes, stripped = res
            seq_bytes = seq_out.tobytes()
            # bulk-convert offsets once: per-record int(np_scalar) calls
            # dominate the loop otherwise (~2x the whole record cost)
            ho_l = head_off[:nrec].tolist()
            hl_l = head_len[:nrec].tolist()
            so_l = seq_off[:nrec + 1].tolist()
            sz_l = sizes[:nrec].tolist()
            lo = so_l[0] if nrec else 0
            for i in range(nrec):
                hi = so_l[i + 1]
                ho = ho_l[i]
                yield SeqRecord(data[ho:ho + hl_l[i]], seq_bytes[lo:hi],
                                None, i, sz_l[i])
                lo = hi
            stripped = stripped.astype(np.int64)
            if warn_out is not None:
                warn_out.append((stripped, False))
            else:
                _warn_stripped(params, stripped, False)
            return
    yield from _read_fasta_py(filename, truncateatspace, upcase, params,
                              warn_out)


def _read_fasta_py(filename: str, truncateatspace: bool = True,
                   upcase: bool = False, params=None,
                   warn_out=None) -> Iterator[SeqRecord]:
    seqno = 0
    header: Optional[bytes] = None
    seq_parts: List[bytes] = []
    stripped = np.zeros(256, dtype=np.int64)
    with open_maybe_compressed(filename) as handle:
        for line in handle:
            if line.startswith(b">"):
                if header is not None:
                    seq = _filter_sequence(b"".join(seq_parts), upcase,
                                           stripped)
                    yield SeqRecord(header, seq, None, seqno,
                                    attributes.get_abundance(header))
                    seqno += 1
                header = _truncate_header(line[1:], truncateatspace)
                seq_parts = []
            elif header is not None:
                seq_parts.append(line)
            elif line.strip():
                raise ValueError(
                    "Invalid FASTA - header must start with > character")
        if header is not None:
            seq = _filter_sequence(b"".join(seq_parts), upcase, stripped)
            yield SeqRecord(header, seq, None, seqno,
                            attributes.get_abundance(header))
    if warn_out is not None:
        warn_out.append((stripped, False))
    else:
        _warn_stripped(params, stripped, False)


def scan_fastq_arrays(filename: str, truncateatspace: bool = True,
                      upcase: bool = False, params=None, warn_out=None):
    """Buffer-level FASTQ scan for batch pipelines (no per-record objects).

    Returns (data, nrec, seq_buf, qual_buf, seq_off, head_off, head_len,
    sizes) with the stripped-char warning emitted (or appended to warn_out
    for deferred ordering), or None when the native scanner is unavailable
    (callers fall back to read_fastq)."""
    from .. import native
    if not native.available():
        return None
    with open_maybe_compressed(filename) as handle:
        data = handle.read()
    res = native.scan_fastq(data, truncateatspace, upcase)
    if res is None:
        return None
    (nrec, seq_out, qual_out, seq_off, head_off, head_len, sizes,
     stripped) = res
    if warn_out is not None:
        warn_out.append((stripped.astype(np.int64), True))
    else:
        _warn_stripped(params, stripped.astype(np.int64), True)
    return (data, nrec, seq_out, qual_out, seq_off, head_off, head_len,
            sizes)


def read_fastq(filename: str, truncateatspace: bool = True,
               upcase: bool = False, params=None,
               warn_out=None) -> Iterator[SeqRecord]:
    """FASTQ records; native scanner with Python fallback (see read_fasta)."""
    from .. import native
    if native.available():
        with open_maybe_compressed(filename) as handle:
            data = handle.read()
        res = native.scan_fastq(data, truncateatspace, upcase)
        if res is not None:
            (nrec, seq_out, qual_out, seq_off, head_off, head_len, sizes,
             stripped) = res
            seq_bytes = seq_out.tobytes()
            qual_bytes = qual_out.tobytes()
            ho_l = head_off[:nrec].tolist()
            hl_l = head_len[:nrec].tolist()
            so_l = seq_off[:nrec + 1].tolist()
            sz_l = sizes[:nrec].tolist()
            lo = so_l[0] if nrec else 0
            for i in range(nrec):
                hi = so_l[i + 1]
                ho = ho_l[i]
                yield SeqRecord(data[ho:ho + hl_l[i]], seq_bytes[lo:hi],
                                qual_bytes[lo:hi], i, sz_l[i])
                lo = hi
            stripped = stripped.astype(np.int64)
            if warn_out is not None:
                warn_out.append((stripped, True))
            else:
                _warn_stripped(params, stripped, True)
            return
    yield from _read_fastq_py(filename, truncateatspace, upcase, params,
                              warn_out)


def _read_fastq_py(filename: str, truncateatspace: bool = True,
                   upcase: bool = False, params=None,
                   warn_out=None) -> Iterator[SeqRecord]:
    seqno = 0
    stripped = np.zeros(256, dtype=np.int64)
    with open_maybe_compressed(filename) as handle:
        while True:
            line1 = handle.readline()
            if not line1:
                break
            if not line1.startswith(b"@"):
                raise ValueError("Invalid FASTQ - header must start with @")
            header = _truncate_header(line1[1:], truncateatspace)
            seq_parts: List[bytes] = []
            line = handle.readline()
            while line and not line.startswith(b"+"):
                seq_parts.append(line.rstrip(b"\r\n"))
                line = handle.readline()
            if not line:
                raise ValueError("Invalid FASTQ - missing '+' line")
            seq = _filter_sequence(b"".join(seq_parts), upcase, stripped)
            qual_parts: List[bytes] = []
            qual_len = 0
            seq_len = sum(len(p) for p in seq_parts)
            while qual_len < seq_len:
                line = handle.readline()
                if not line:
                    raise ValueError("Invalid FASTQ - truncated quality")
                part = line.rstrip(b"\r\n")
                qual_parts.append(part)
                qual_len += len(part)
            qual = b"".join(qual_parts)
            if len(qual) != seq_len:
                raise ValueError(
                    "Invalid FASTQ - quality and sequence lengths differ")
            # quality entries for stripped sequence chars are dropped with them
            if len(seq) != seq_len:
                arr = np.frombuffer(b"".join(seq_parts), dtype=np.uint8)
                keep = _ACCEPT_MASK[arr]
                qual = np.frombuffer(qual, dtype=np.uint8)[keep].tobytes()
            yield SeqRecord(header, seq, qual, seqno,
                            attributes.get_abundance(header))
            seqno += 1
    if warn_out is not None:
        warn_out.append((stripped, True))
    else:
        _warn_stripped(params, stripped, True)


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------

def print_sequence(out: IO[bytes], seq: bytes, width: int) -> None:
    """reference: fasta.cpp fasta_print_sequence"""
    out.write(wrap_sequence(seq, width))


def wrap_sequence(seq: bytes, width: int) -> bytes:
    if width < 1 or len(seq) <= width:
        return seq + b"\n"
    return b"\n".join(seq[i:i + width]
                      for i in range(0, len(seq), width)) + b"\n"


def _format_ee(expected_error: float) -> bytes:
    """reference: fasta.cpp fasta_print_general ee formatting ladder"""
    thresholds = [(1e-9, 13), (1e-8, 12), (1e-7, 11), (1e-6, 10), (1e-5, 9),
                  (1e-4, 8), (1e-3, 7), (1e-2, 6), (1e-1, 5)]
    for limit, prec in thresholds:
        if expected_error < limit:
            return (b"ee=%.*f" % (prec, expected_error))
    return b"ee=%.4f" % expected_error


def fasta_print_general(out: IO[bytes], params: Parameters,
                        seq: Optional[bytes], header: bytes,
                        abundance: int = 0, ordinal: int = -1,
                        expected_error: float = -1.0,
                        clustersize: int = -1, clusterid: int = -1,
                        score_name: Optional[bytes] = None, score: float = 0.0,
                        centroid_size: int = 0,
                        prefix: Optional[bytes] = None) -> None:
    """reference: fasta.cpp fasta_print_general (full annotation pipeline).

    Assembled into one buffer and written with a single call — the writer
    is on the hot path of every streaming command."""
    if (prefix is None and score_name is None and clustersize <= 0
            and clusterid < 0 and expected_error < 0.0
            and _plain_fasta_emit(params)):
        # no annotation option is active: the header passes through
        # verbatim (hot path of every streaming command)
        head = header + b"\n"
    else:
        head = _general_header(params, seq, header, abundance, ordinal,
                               expected_error, clustersize, clusterid,
                               score_name, score, centroid_size, prefix)
    if seq is not None:
        out.write(b">" + head + wrap_sequence(seq,
                                              int(params.opt_fasta_width)))
    else:
        out.write(b">" + head)


def _plain_fasta_emit(params: Parameters) -> bool:
    """True when no header-rewriting option is active, so
    fasta_print_general's default path reduces to the verbatim header
    (cached per Parameters object)."""
    cached = getattr(params, "_fasta_emit_plain", None)
    if cached is None:
        cached = not (
            params.opt_relabel_self or params.opt_relabel_sha1
            or params.opt_relabel_md5 or params.opt_relabel is not None
            or params.opt_xsize or params.opt_sizeout or params.opt_xee
            or params.opt_eeout or params.opt_fastq_eeout
            or params.opt_xlength or params.opt_lengthout
            or params.opt_label_suffix is not None
            or params.opt_sample is not None
            or params.opt_centroid_sizeout or params.opt_relabel_keep)
        try:
            object.__setattr__(params, "_fasta_emit_plain", cached)
        except Exception:
            pass
    return cached


def _general_header(params: Parameters, seq: Optional[bytes], header: bytes,
                    abundance: int, ordinal: int, expected_error: float,
                    clustersize: int = -1, clusterid: int = -1,
                    score_name: Optional[bytes] = None, score: float = 0.0,
                    centroid_size: int = 0,
                    prefix: Optional[bytes] = None) -> bytes:
    parts = []
    if prefix:
        parts.append(prefix)

    trailing_separator = False
    if params.opt_relabel_self:
        parts.append(seq or b"")
    elif params.opt_relabel_sha1:
        import hashlib
        from ..utils.digest import normalized_digest
        parts.append(normalized_digest(hashlib.sha1, seq or b""))
    elif params.opt_relabel_md5:
        import hashlib
        from ..utils.digest import normalized_digest
        parts.append(normalized_digest(hashlib.md5, seq or b""))
    elif params.opt_relabel is not None and ordinal > 0:
        parts.append(params.opt_relabel.encode() + b"%d" % ordinal)
    else:
        strip_size = params.opt_xsize or (params.opt_sizeout and abundance > 0)
        strip_ee = params.opt_xee or (
            (params.opt_eeout or params.opt_fastq_eeout) and expected_error >= 0.0)
        strip_length = params.opt_xlength or params.opt_lengthout
        stripped, trailing_separator = attributes.header_strip(
            header, strip_size, strip_ee, strip_length)
        parts.append(stripped)

    if params.opt_label_suffix is not None:
        suffix = params.opt_label_suffix.encode()
        parts.append(suffix)
        if suffix:
            trailing_separator = suffix.endswith(b";")

    def sep() -> bytes:
        nonlocal trailing_separator
        if trailing_separator:
            trailing_separator = False
            return b""
        return b";"

    if params.opt_sample is not None:
        parts.append(sep() + b"sample=" + params.opt_sample.encode())
    if clustersize > 0:
        parts.append(sep() + b"seqs=%d" % clustersize)
    if clusterid >= 0:
        parts.append(sep() + b"clusterid=%d" % clusterid)
    if params.opt_sizeout and abundance > 0:
        parts.append(sep() + b"size=%d" % abundance)
    if params.opt_centroid_sizeout and centroid_size > 0:
        parts.append(sep() + b"centroid_size=%d" % centroid_size)
    if (params.opt_eeout or params.opt_fastq_eeout) and expected_error >= 0.0:
        parts.append(sep() + _format_ee(expected_error))
    if params.opt_lengthout:
        parts.append(sep() + b"length=%d" % len(seq or b""))
    if score_name is not None:
        parts.append(sep() + score_name + b"=%.4f" % score)
    if params.opt_relabel_keep and (
            (params.opt_relabel is not None and ordinal > 0)
            or params.opt_relabel_sha1 or params.opt_relabel_md5
            or params.opt_relabel_self):
        parts.append(b" " + header)
    parts.append(b"\n")
    return b"".join(parts)


def fastq_print_general(out: IO[bytes], params: Parameters,
                        seq: bytes, header: bytes, qual: bytes,
                        abundance: int = 0, ordinal: int = -1,
                        expected_error: float = -1.0) -> None:
    """reference: fastq.cpp fastq_print_general (header pipeline shared with
    fasta_print_general; sequence and quality always on single lines)."""
    head = _general_header(params, None, header, abundance, ordinal,
                           expected_error)
    out.write(b"@" + head + seq + b"\n+\n" + qual + b"\n")
