"""DUST low-complexity masking.

Mirrors reference src/core/mask.cpp exactly: 64-nt windows stepped by 32,
3-mer repeat scoring ``v = 10*sum/j`` (integer division), score threshold 20,
soft (lowercase) or hard ('N') masking, and the ``i += half - b`` window-skip
adjustment.

The O(window^2) scan of the reference (wo(), mask.cpp:78-132) is replaced by
an equivalent closed-form pair-count formulation computed with numpy matrix
ops — same (v, i, j) maximizer including first-occurrence tie-breaking.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..utils.maps import CHRMAP_2BIT

DUST_WINDOW = 64
DUST_WORD = 3
DUST_LEVEL = 20
HALF_WINDOW = DUST_WINDOW // 2


def _wo(words: np.ndarray, length: int) -> Tuple[int, int, int]:
    """Best (v, beg, end) for one window.

    ``words[j]`` is the 3-mer ending at position j (valid for j >= 2).
    Equivalent to reference wo() (mask.cpp:78-132): for each start i,
    v(i,j) = 10 * S(i, i+j) // j where S counts equal-word pairs among
    positions [i+2, i+j]; maximizer with ties broken by first (i, j).
    """
    l1 = length - DUST_WORD + 1 - 5  # smallest possible region is 8
    if l1 < 1:
        return 0, 0, 0

    w = words[:length]
    # M[a, b] = 1 if words equal and both valid word positions, a < b
    eq = (w[:, None] == w[None, :])
    valid = np.arange(length) >= DUST_WORD - 1
    lower = np.tril(eq, -1) & valid[:, None] & valid[None, :]
    lower = lower.astype(np.int32)  # lower[a, b]: a > b?  careful below

    # We need L[a, p] = 1 when a < p and words equal; use upper triangle.
    upper = np.triu(eq, 1) & valid[:, None] & valid[None, :]
    upper = upper.astype(np.int32)

    # SC[i, p] = number of a in [i, p) with words[a]==words[p]
    # = suffix sum over a of upper[a, p]
    suffix = np.flip(np.cumsum(np.flip(upper, 0), 0), 0)  # sum_{a >= i} upper[a, p]

    # B[i, p] = #matches with a in [i+2, p) -> suffix[i+2, p]
    # S[i, p] = cumulative over p of B[i, p]
    starts = np.arange(l1)
    idx = np.minimum(starts + 2, length - 1)
    B = suffix[idx, :]  # (l1, length)
    # zero out columns p <= i+1 (no valid a range) — handled already since
    # upper[a,p]=0 for a>=p, and suffix[i+2,p]=0 when p<i+2.
    S = np.cumsum(B, axis=1)

    # v(i, j) = 10 * S[i, i+j] // j for j in [2, length-i)
    j_grid = np.arange(length)[None, :] - starts[:, None]  # j = p - i
    with np.errstate(divide="ignore", invalid="ignore"):
        v = np.where(j_grid >= 2, (10 * S) // np.maximum(j_grid, 1), 0)
    # positions beyond the sequence or j >= length - i are excluded by
    # construction (S stops growing, but v keeps shrinking; max unaffected
    # only if those cells don't exceed): mask explicitly.
    v = np.where(j_grid < (length - starts[:, None]), v, 0)

    bestv = int(v.max(initial=0))
    if bestv <= 0:
        return 0, 0, 0
    flat = int(np.argmax(v))  # first occurrence row-major = (i asc, j asc)
    besti, p = divmod(flat, length)
    bestj = p - besti
    return bestv, besti, besti + bestj


def dust_mask(seq: bytes, hardmask: bool) -> bytes:
    """DUST one sequence; returns the masked sequence.

    reference: mask.cpp dust_core — soft masking upcases the whole sequence
    first, then lowercases masked regions; hard masking writes 'N' without
    touching case elsewhere.
    """
    from .. import native
    masked = native.dust(seq, hardmask)
    if masked is not None:
        return masked
    return _dust_mask_py(seq, hardmask)


def _dust_mask_py(seq: bytes, hardmask: bool) -> bytes:
    """Pure-python/numpy fallback for dust_mask."""
    length = len(seq)
    original = np.frombuffer(seq, dtype=np.uint8).copy()
    if hardmask:
        out = original.copy()
    else:
        # upcase a-z only (reference uses std::toupper)
        out = original.copy()
        lower = (out >= ord("a")) & (out <= ord("z"))
        out[lower] -= 32

    words_all = CHRMAP_2BIT[original].astype(np.int64)
    # rolling 3-mer codes over the original sequence, per window recomputed
    # (the reference recomputes words per window from the window's chars)
    i = 0
    while i < length:
        l = DUST_WINDOW if length > i + DUST_WINDOW else length - i
        # build words for this window: word[j] = bits of s[i..i+j] limited to 3
        win = words_all[i:i + l]
        words = np.zeros(l, dtype=np.int64)
        acc = 0
        # vectorized rolling word: w[j] = (4*w[j-1] + c[j]) & 63
        # closed form: w[j] = 16*c[j-2] + 4*c[j-1] + c[j] for j >= 2
        if l >= 1:
            words[:] = win
        if l >= 2:
            words[1:] += 4 * win[:-1]
        if l >= 3:
            words[2:] += 16 * win[:-2]
        v, a, b = _wo(words, l)
        if v > DUST_LEVEL:
            if hardmask:
                out[i + a:i + b + 1] = ord("N")
            else:
                out[i + a:i + b + 1] = original[i + a:i + b + 1] | 32
            if b < HALF_WINDOW:
                i += HALF_WINDOW - b
        i += HALF_WINDOW
    return out.tobytes()


def dust_mask_batch(seqs, hardmask: bool):
    """DUST a batch of sequences in one native call (threads)."""
    from .. import native
    masked = native.dust_batch(seqs, hardmask)
    if masked is None:
        masked = [_dust_mask_py(s, hardmask) for s in seqs]
    return masked


def dust_all(db, params) -> None:
    """Mask every DB sequence in place (reference: mask.cpp dust_all,
    "Masking" progress at :238)."""
    from .. import native
    from ..utils.progress import phase
    phase(params, "Masking")
    seqs = [bytes(entry.sequence) for entry in db.entries]
    masked = native.dust_batch(seqs, params.opt_hardmask)
    if masked is None:
        masked = [_dust_mask_py(s, params.opt_hardmask) for s in seqs]
    for entry, m in zip(db.entries, masked):
        entry.sequence[:] = m
    db._encoded_cache = None


def hardmask(seq: bytes) -> bytes:
    """Convert lowercase letters to N (reference: mask.cpp hardmask)."""
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    arr[(arr & 32) != 0] = ord("N")
    return arr.tobytes()


def hardmask_all(db) -> None:
    for entry in db.entries:
        entry.sequence[:] = hardmask(bytes(entry.sequence))
    db._encoded_cache = None
