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
    fastx_open MAGIC detection; the reference dlopens zlib/bz2)."""
    handle = open(filename, "rb")
    magic = handle.read(3)
    handle.seek(0)
    if magic[:2] == b"\x1f\x8b":
        return gzip.open(handle, "rb")  # type: ignore[return-value]
    if magic[:3] == b"BZh":
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


def _filter_sequence(seq: bytes, upcase: bool = False) -> bytes:
    """Strip non-accepted characters; fatal on '-'/'.'/control chars.

    reference: fasta.cpp fasta_filter_sequence."""
    arr = np.frombuffer(seq, dtype=np.uint8)
    if _FATAL_MASK[arr].any():
        bad = arr[_FATAL_MASK[arr]][0]
        raise ValueError(
            "Illegal character '%c' in sequence of FASTA file" % chr(bad))
    out = arr[_ACCEPT_MASK[arr]]
    if upcase:
        from ..utils.maps import CHRMAP_UPCASE
        out = CHRMAP_UPCASE[out]
    return out.tobytes()


def is_fastq(filename: str) -> bool:
    with open_maybe_compressed(filename) as handle:
        first = handle.read(1)
    return first == b"@"


def read_fastx(filename: str, params: Optional[Parameters] = None,
               truncateatspace: Optional[bool] = None,
               upcase: bool = False) -> Iterator[SeqRecord]:
    """Stream records from a FASTA or FASTQ file (auto-detected)."""
    if truncateatspace is None:
        truncateatspace = not (params is not None and params.opt_notrunclabels)
    if is_fastq(filename):
        yield from read_fastq(filename, truncateatspace, upcase)
    else:
        yield from read_fasta(filename, truncateatspace, upcase)


def read_fasta(filename: str, truncateatspace: bool = True,
               upcase: bool = False) -> Iterator[SeqRecord]:
    seqno = 0
    header: Optional[bytes] = None
    seq_parts: List[bytes] = []
    with open_maybe_compressed(filename) as handle:
        for line in handle:
            if line.startswith(b">"):
                if header is not None:
                    seq = _filter_sequence(b"".join(seq_parts), upcase)
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
            seq = _filter_sequence(b"".join(seq_parts), upcase)
            yield SeqRecord(header, seq, None, seqno,
                            attributes.get_abundance(header))


def read_fastq(filename: str, truncateatspace: bool = True,
               upcase: bool = False) -> Iterator[SeqRecord]:
    seqno = 0
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
            seq = _filter_sequence(b"".join(seq_parts), upcase)
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


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------

def print_sequence(out: IO[bytes], seq: bytes, width: int) -> None:
    """reference: fasta.cpp fasta_print_sequence"""
    if width < 1:
        out.write(seq)
        out.write(b"\n")
        return
    for i in range(0, len(seq), width):
        out.write(seq[i:i + width])
        out.write(b"\n")


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
    """reference: fasta.cpp fasta_print_general (full annotation pipeline)."""
    out.write(b">")
    if prefix:
        out.write(prefix)

    trailing_separator = False
    if params.opt_relabel_self:
        out.write(seq or b"")
    elif params.opt_relabel_sha1:
        import hashlib
        from ..utils.digest import normalized_digest
        out.write(normalized_digest(hashlib.sha1, seq or b""))
    elif params.opt_relabel_md5:
        import hashlib
        from ..utils.digest import normalized_digest
        out.write(normalized_digest(hashlib.md5, seq or b""))
    elif params.opt_relabel is not None and ordinal > 0:
        out.write(params.opt_relabel.encode() + b"%d" % ordinal)
    else:
        strip_size = params.opt_xsize or (params.opt_sizeout and abundance > 0)
        strip_ee = params.opt_xee or (
            (params.opt_eeout or params.opt_fastq_eeout) and expected_error >= 0.0)
        strip_length = params.opt_xlength or params.opt_lengthout
        stripped, trailing_separator = attributes.header_strip(
            header, strip_size, strip_ee, strip_length)
        out.write(stripped)

    if params.opt_label_suffix is not None:
        suffix = params.opt_label_suffix.encode()
        out.write(suffix)
        if suffix:
            trailing_separator = suffix.endswith(b";")

    def sep() -> bytes:
        nonlocal trailing_separator
        if trailing_separator:
            trailing_separator = False
            return b""
        return b";"

    if params.opt_sample is not None:
        out.write(sep() + b"sample=" + params.opt_sample.encode())
    if clustersize > 0:
        out.write(sep() + b"seqs=%d" % clustersize)
    if clusterid >= 0:
        out.write(sep() + b"clusterid=%d" % clusterid)
    if params.opt_sizeout and abundance > 0:
        out.write(sep() + b"size=%d" % abundance)
    if params.opt_centroid_sizeout and centroid_size > 0:
        out.write(sep() + b"centroid_size=%d" % centroid_size)
    if (params.opt_eeout or params.opt_fastq_eeout) and expected_error >= 0.0:
        out.write(sep() + _format_ee(expected_error))
    if params.opt_lengthout:
        out.write(sep() + b"length=%d" % len(seq or b""))
    if score_name is not None:
        out.write(sep() + score_name + b"=%.4f" % score)
    if params.opt_relabel_keep and (
            (params.opt_relabel is not None and ordinal > 0)
            or params.opt_relabel_sha1 or params.opt_relabel_md5
            or params.opt_relabel_self):
        out.write(b" " + header)
    out.write(b"\n")

    if seq is not None:
        print_sequence(out, seq, int(params.opt_fasta_width))


def fastq_print_general(out: IO[bytes], params: Parameters,
                        seq: bytes, header: bytes, qual: bytes,
                        abundance: int = 0, ordinal: int = -1,
                        expected_error: float = -1.0) -> None:
    """reference: fastq.cpp fastq_print_general (header pipeline shared with
    fasta_print_general; sequence and quality always on single lines)."""
    buf = io.BytesIO()
    fasta_print_general(buf, params, None, header, abundance, ordinal,
                        expected_error)
    head = buf.getvalue()
    assert head.startswith(b">")
    out.write(b"@" + head[1:])
    out.write(seq + b"\n+\n" + qual + b"\n")
