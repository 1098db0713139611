"""Unique k-mer extraction.

Mirrors reference src/core/unique.cpp: sliding 2-bit k-mers with a "bad"
window that excludes any k-mer overlapping a masked character (ambiguous
always; lowercase additionally when masking is active), deduplicated in
first-occurrence order.

Vectorized with numpy: the rolling k-mer code is a polyval over the window,
the bad mask a windowed OR, and first-occurrence dedup uses np.unique on the
k-mer codes keeping the earliest index.
"""

from __future__ import annotations

import numpy as np

from ..params import Masking
from ..utils.maps import CHRMAP_2BIT, CHRMAP_MASK_AMBIG, CHRMAP_MASK_LOWER


def kmer_codes(seq_u8: np.ndarray, wordlength: int,
               seqmask: Masking) -> np.ndarray:
    """All valid (non-masked) k-mer codes in sequence order, with repeats.

    Returns int64 array of codes of each window whose ``bad`` mask is clear,
    ordered by position (reference: unique.cpp:188-227 scan loop).
    """
    n = seq_u8.shape[0]
    w = wordlength
    if n < w:
        return np.zeros(0, dtype=np.int64)
    codes2 = CHRMAP_2BIT[seq_u8].astype(np.int64)
    maskmap = CHRMAP_MASK_LOWER if seqmask != Masking.none else CHRMAP_MASK_AMBIG
    bad = maskmap[seq_u8].astype(bool)

    # windowed polynomial: kmer[p] = sum_{t=0..w-1} 4^(w-1-t) * c[p+t]
    # via cumulative trick: conv with weights
    weights = (4 ** np.arange(w - 1, -1, -1)).astype(np.int64)
    # sliding windows (n-w+1, w)
    windows = np.lib.stride_tricks.sliding_window_view(codes2, w)
    kmers = windows @ weights
    badwin = np.lib.stride_tricks.sliding_window_view(bad, w).any(axis=1)
    return kmers[~badwin]


def unique_kmers(seq: bytes, wordlength: int, seqmask: Masking) -> np.ndarray:
    """Unique k-mer codes in first-occurrence order (reference: unique_count)."""
    from .. import native
    out = native.unique_kmers(seq, wordlength, seqmask != Masking.none)
    if out is not None:
        return out
    seq_u8 = np.frombuffer(seq, dtype=np.uint8)
    codes = kmer_codes(seq_u8, wordlength, seqmask)
    if codes.size == 0:
        return codes.astype(np.uint32)
    _, first_idx = np.unique(codes, return_index=True)
    return codes[np.sort(first_idx)].astype(np.uint32)


def unique_kmer_set(seq: bytes, wordlength: int, seqmask: Masking) -> np.ndarray:
    """Unique k-mer codes; order irrelevant (counting use)."""
    from .. import native
    out = native.unique_kmers(seq, wordlength, seqmask != Masking.none)
    if out is not None:
        return out
    seq_u8 = np.frombuffer(seq, dtype=np.uint8)
    codes = kmer_codes(seq_u8, wordlength, seqmask)
    return np.unique(codes).astype(np.uint32)


def unique_kmer_sets_batch(seqs, wordlength: int, seqmask: Masking):
    """Unique k-mer sets for many sequences in one threaded native call.

    Returns a list of uint32 arrays (views into one shared buffer — treat
    as read-only and batch-scoped)."""
    buf, off = unique_kmer_sets_batch_raw(seqs, wordlength, seqmask)
    return [buf[off[i]:off[i + 1]] for i in range(len(seqs))]


def unique_kmer_sets_batch_raw(seqs, wordlength: int, seqmask: Masking):
    """Batched unique k-mer sets in the concatenated (buf, offsets[n+1])
    wire format the native postings bulk calls consume zero-copy."""
    from .. import native
    r = native.unique_kmers_batch(seqs, wordlength, seqmask != Masking.none)
    if r is not None:
        return r
    lists = [unique_kmer_set(s, wordlength, seqmask) for s in seqs]
    return native._concat_kmer_lists(lists)
