"""Header attribute (;size=N;ee=F;length=N) parsing and stripping.

Mirrors reference src/core/attributes.cpp:87-106 (find), 188+ (strip).
Headers are handled as ``bytes`` throughout for byte-exact output.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

_DIGITS = set(b"0123456789")
_DIGITS_DEC = set(b"0123456789.")


def _find_attribute(header: bytes, text: bytes,
                    allow_decimal: bool) -> Optional[Tuple[int, int]]:
    """First occurrence of (^|;)<text><digits>(;|$); returns (start, end).

    reference: attributes.cpp header_find_attribute."""
    header_length = len(header)
    attr_len = len(text)
    digits_set = _DIGITS_DEC if allow_decimal else _DIGITS
    offset = 0
    while offset < header_length - attr_len:
        pos = header.find(text, offset)
        if pos < 0:
            break
        offset = pos
        if offset > 0 and header[offset - 1:offset] != b";":
            offset += attr_len + 1
            continue
        digits = 0
        i = offset + attr_len
        while i < header_length and header[i:i + 1] in (b"0", b"1", b"2", b"3",
                                                        b"4", b"5", b"6", b"7",
                                                        b"8", b"9", b"."):
            if not allow_decimal and header[i:i + 1] == b".":
                break
            digits += 1
            i += 1
        if digits == 0:
            offset += attr_len + 1
            continue
        if (offset + attr_len + digits < header_length
                and header[offset + attr_len + digits:offset + attr_len + digits + 1] != b";"):
            offset += attr_len + digits + 2
            continue
        return offset, offset + attr_len + digits
    return None


def header_get_size(header: bytes) -> int:
    """Abundance from ;size=N annotation, 0 if absent.

    reference: attributes.cpp header_get_size."""
    found = _find_attribute(header, b"size=", False)
    if found is None:
        return 0
    start, _ = found
    digits = b""
    i = start + 5
    while i < len(header) and header[i:i + 1].isdigit():
        digits += header[i:i + 1]
        i += 1
    abundance = int(digits)
    if abundance == 0:
        raise ValueError("Invalid (zero) abundance annotation in FASTA file header")
    return abundance


def get_abundance(header: bytes) -> int:
    """Abundance with default 1 (reference: fasta.cpp fasta_get_abundance)."""
    size = header_get_size(header)
    return size if size > 0 else 1


def header_strip(header: bytes, strip_size: bool, strip_ee: bool,
                 strip_length: bool) -> Tuple[bytes, bool]:
    """Strip selected attributes; returns (stripped_header, trailing_separator).

    reference: attributes.cpp header_fprint_strip — the return flag reports
    whether the last emitted char is the ';' annotation separator."""
    spans: List[Tuple[int, int]] = []
    if strip_size:
        found = _find_attribute(header, b"size=", False)
        if found is not None:
            spans.append(found)
    if strip_ee:
        found = _find_attribute(header, b"ee=", True)
        if found is not None:
            spans.append(found)
    if strip_length:
        found = _find_attribute(header, b"length=", False)
        if found is not None:
            spans.append(found)

    header_length = len(header)
    out = b""
    last_index = -1
    if not spans:
        out = header
        if header_length > 0:
            last_index = header_length - 1
    else:
        spans.sort()
        prev_end = 0
        for start, end in spans:
            if start > prev_end + 1:
                out += header[prev_end:start - 1]
                last_index = start - 2
            prev_end = end
        if header_length > prev_end + 1:
            out += header[prev_end:header_length]
            last_index = header_length - 1

    trailing = last_index >= 0 and header[last_index:last_index + 1] == b";"
    return out, trailing
