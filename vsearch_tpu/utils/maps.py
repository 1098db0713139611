"""Nucleotide character maps as numpy lookup tables.

Mirrors reference src/utils/maps.cpp (2-bit/4-bit encodings, complement,
masking maps, IUPAC equivalence).  All tables are length-256 numpy arrays so
whole sequences encode with a single fancy-index — the vectorized equivalent
of the reference's per-character table lookups.
"""

from __future__ import annotations

import numpy as np

# 4-bit code per ascii char (reference: maps.cpp chrmap_4bit)
CHRMAP_4BIT = np.zeros(256, dtype=np.uint8)
for _chars, _code in [
    ("Aa", 1), ("Bb", 14), ("Cc", 2), ("Dd", 13), ("Gg", 4), ("Hh", 11),
    ("Kk", 12), ("Mm", 3), ("Nn", 15), ("Rr", 5), ("Ss", 6), ("Tt", 8),
    ("Uu", 8), ("Vv", 7), ("Ww", 9), ("Yy", 10),
]:
    for _c in _chars:
        CHRMAP_4BIT[ord(_c)] = _code

# 2-bit code per ascii char (reference: maps.cpp chrmap_2bit)
CHRMAP_2BIT = np.zeros(256, dtype=np.uint8)
for _chars, _code in [("Cc", 1), ("Gg", 2), ("TtUu", 3)]:
    for _c in _chars:
        CHRMAP_2BIT[ord(_c)] = _code

# complement ascii->ascii (reference: maps.cpp chrmap_complement)
CHRMAP_COMPLEMENT = np.full(256, ord("N"), dtype=np.uint8)
for _src, _dst in zip("ABCDGHKMNRSTUVWY", "TVGHCDMKNYSAABWR"):
    CHRMAP_COMPLEMENT[ord(_src)] = ord(_dst)
for _src, _dst in zip("abcdghkmrstuvwy", "tvghcdmkysaabwr"):
    CHRMAP_COMPLEMENT[ord(_src)] = ord(_dst)
CHRMAP_COMPLEMENT[ord("n")] = ord("n")

# masking maps: 1 = masked (reference: maps.cpp chrmap_mask_ambig/_lower)
CHRMAP_MASK_AMBIG = np.ones(256, dtype=np.uint8)
for _c in "ACGTUacgtu":
    CHRMAP_MASK_AMBIG[ord(_c)] = 0
CHRMAP_MASK_LOWER = np.ones(256, dtype=np.uint8)
for _c in "ACGTU":
    CHRMAP_MASK_LOWER[ord(_c)] = 0

# normalize: upcase + U->T, everything unknown -> N (reference chrmap_normalize)
CHRMAP_NORMALIZE = np.full(256, ord("N"), dtype=np.uint8)
for _c in "ABCDGHKMRSTVWY":
    CHRMAP_NORMALIZE[ord(_c)] = ord(_c)
    CHRMAP_NORMALIZE[ord(_c.lower())] = ord(_c)
CHRMAP_NORMALIZE[ord("U")] = ord("T")
CHRMAP_NORMALIZE[ord("u")] = ord("T")

# upcase: A-Z stay, a-z -> upper, everything else -> N (reference chrmap_upcase)
CHRMAP_UPCASE = np.full(256, ord("N"), dtype=np.uint8)
for _i in range(ord("A"), ord("Z") + 1):
    CHRMAP_UPCASE[_i] = _i
    CHRMAP_UPCASE[_i + 32] = _i

# no_change: A-Za-z stay, everything else -> N (reference chrmap_no_change)
CHRMAP_NO_CHANGE = np.full(256, ord("N"), dtype=np.uint8)
for _i in range(ord("A"), ord("Z") + 1):
    CHRMAP_NO_CHANGE[_i] = _i
    CHRMAP_NO_CHANGE[_i + 32] = _i + 32

# ambiguity per 4-bit code (reference: chrmap_ambiguous_4bit)
AMBIGUOUS_4BIT = np.array(
    [1, 0, 0, 1, 0, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1], dtype=np.uint8)

SYM_NT_4BIT = np.frombuffer(b"-ACMGRSVTWYHKDBN", dtype=np.uint8)
SYM_NT_2BIT = np.frombuffer(b"ACGT", dtype=np.uint8)


def encode(seq: bytes) -> np.ndarray:
    """Raw bytes of a sequence as a uint8 array (no mapping)."""
    return np.frombuffer(seq, dtype=np.uint8)


def map_4bit(seq_u8: np.ndarray) -> np.ndarray:
    return CHRMAP_4BIT[seq_u8]


def map_2bit(seq_u8: np.ndarray) -> np.ndarray:
    return CHRMAP_2BIT[seq_u8]


def reverse_complement(seq: bytes) -> bytes:
    """reference: src/utils/reverse_complement.cpp"""
    arr = np.frombuffer(seq, dtype=np.uint8)
    return CHRMAP_COMPLEMENT[arr[::-1]].tobytes()


def is_equivalent_4bit(a: int, b: int) -> bool:
    """IUPAC-compatible equality on ascii chars (maps.cpp:is_equivalent_4bit)."""
    return (int(CHRMAP_4BIT[a]) & int(CHRMAP_4BIT[b])) != 0


def seqcmp(a: bytes, b: bytes, n: int) -> int:
    """Masked-aware sequence comparison (reference: src/utils/seqcmp.cpp):
    compares 4-bit codes char by char; returns <0/0/>0 like strncmp."""
    ea = CHRMAP_4BIT[np.frombuffer(a[:n], dtype=np.uint8)]
    eb = CHRMAP_4BIT[np.frombuffer(b[:n], dtype=np.uint8)]
    if len(ea) != len(eb):
        # caller guarantees both have >= n chars in reference usage
        m = min(len(ea), len(eb))
        ea, eb = ea[:m], eb[:m]
    diff = ea != eb
    idx = np.argmax(diff) if diff.any() else -1
    if idx < 0:
        return 0
    return int(ea[idx]) - int(eb[idx])
