"""Taxonomy annotation parsing (reference: src/core/tax.cpp)."""

from __future__ import annotations

from typing import List, Optional, Tuple

TAX_LEVELS = 9
TAXONOMIC_FIELDS = b"dkpcofgst"


def tax_parse(header: bytes) -> Optional[Tuple[int, int]]:
    """First occurrence of (^|;)tax=([^;]*)(;|$) -> (start, end).

    reference: tax.cpp tax_parse (:69-124)."""
    attribute = b"tax="
    header_length = len(header)
    offset = 0
    while offset < header_length - len(attribute):
        pos = header.find(attribute, offset)
        if pos < 0:
            break
        offset = pos
        if offset > 0 and header[offset - 1:offset] != b";":
            offset += len(attribute) + 1
            continue
        terminus = header.find(b";", offset + len(attribute))
        end = header_length if terminus < 0 else terminus
        return offset, end
    return None


def tax_split(header: bytes) -> List[bytes]:
    """Split the tax= annotation into the 9 rank names (d..t).

    Returns a list of 9 bytes values ('' when absent).
    reference: tax.cpp tax_split (:126-186)."""
    out: List[bytes] = [b""] * TAX_LEVELS
    parsed = tax_parse(header)
    if parsed is None:
        return out
    tax_start, tax_end = parsed
    offset = tax_start + 4
    while offset < tax_end:
        letter = header[offset:offset + 1].lower()
        level = TAXONOMIC_FIELDS.find(letter)
        if level >= 0 and header[offset + 1:offset + 2] == b":":
            next_comma = header.find(b",", offset + 2)
            if next_comma >= 0:
                out[level] = header[offset + 2:next_comma]
            else:
                out[level] = header[offset + 2:tax_end]
        next_comma = header.find(b",", offset)
        if next_comma >= 0:
            offset = next_comma + 1
        else:
            offset = tax_end
    return out
