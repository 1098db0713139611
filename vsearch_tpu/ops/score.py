"""Device k-mer candidate scoring.

TPU-native replacement for the reference's per-kmer counter loops
(src/core/searchcore.cpp:260-340 + arch/*/increment_counters.cpp): the
database k-mer incidence lives in HBM as a packed-bit matrix
(4^w x ceil(N/32) uint32 — the reference's bitmap representation
generalized to every k-mer), and a query batch's shared-kmer counts become

    counts(Q, N) = sum_chunks  A[:, chunk] @ unpack(B[chunk, :])

an int8 MXU matmul over 512-kmer vocabulary chunks, where A is the (Q, 4^w)
query-kmer presence matrix built by scatter.  Top-K selection reproduces the
reference min-heap's total order (count desc, length asc, seqno asc;
minheap.cpp:111-146) exactly via a two-pass top_k: pass 1 by count, pass 2
re-ranks the boundary-count ties by the precomputed (length, seqno) rank.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class DeviceKmerIndex:
    """Packed-bit incidence matrix on device + candidate-order ranks."""

    def __init__(self, wordlength: int, kmer_lists: List[np.ndarray],
                 lengths: np.ndarray, mapping: np.ndarray,
                 capacity: Optional[int] = None) -> None:
        self.wordlength = wordlength
        self.hashsize = 1 << (2 * wordlength)
        n = len(kmer_lists)
        self.n = n
        cap = capacity or n
        cap = max(cap, 1)
        self.words = _round_up(cap, 1024) // 32
        bits = np.zeros((self.hashsize, self.words), dtype=np.uint32)
        for pos, kmers in enumerate(kmer_lists):
            w, b = divmod(pos, 32)
            bits[kmers, w] |= np.uint32(1 << b)
        self.bits = jax.device_put(bits)
        self.lengths = np.asarray(lengths, dtype=np.int64)
        self.mapping = np.asarray(mapping, dtype=np.int64)
        # candidate tie-break rank: smaller is better after count
        # (length asc, seqno asc) — total order, see minheap.cpp:111-146
        order = np.lexsort((self.mapping, self.lengths))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n)
        self.rank = rank

    def counts(self, query_kmer_lists: List[np.ndarray]) -> np.ndarray:
        """Shared-unique-kmer counts (Q, n) for a query batch."""
        q = len(query_kmer_lists)
        if q == 0 or self.n == 0:
            return np.zeros((q, self.n), dtype=np.int32)
        # pad the query dimension to a bucket so kernel geometry is stable
        qp = 8
        while qp < q:
            qp *= 2
        A = np.zeros((qp, self.hashsize), dtype=np.int8)
        for qi, kmers in enumerate(query_kmer_lists):
            A[qi, kmers] = 1
        counts = _counts_kernel(self.hashsize, self.words)(
            jnp.asarray(A), self.bits)
        return np.asarray(counts)[:q, :self.n]


@functools.lru_cache(maxsize=16)
def _counts_kernel(hashsize: int, words: int):
    chunk = 512
    nchunks = hashsize // chunk
    n_cols = words * 32

    @jax.jit
    def run(A, bits):
        # A: (Q, hashsize) int8; bits: (hashsize, words) uint32
        q = A.shape[0]
        shifts = jnp.arange(32, dtype=jnp.uint32)

        def body(acc, c):
            base = c * chunk
            a_c = jax.lax.dynamic_slice(A, (0, base), (q, chunk))
            b_c = jax.lax.dynamic_slice(bits, (base, 0), (chunk, words))
            unpacked = ((b_c[:, :, None] >> shifts[None, None, :]) & 1)
            unpacked = unpacked.astype(jnp.int8).reshape(chunk, n_cols)
            acc = acc + jax.lax.dot(
                a_c, unpacked, preferred_element_type=jnp.int32)
            return acc, None

        acc = jnp.zeros((q, n_cols), dtype=jnp.int32)
        acc, _ = jax.lax.scan(body, acc, jnp.arange(nchunks))
        return acc

    return run


def exact_topk(counts_row: np.ndarray, lengths: np.ndarray,
               mapping: np.ndarray, tophits: int,
               minmatches: int) -> List[Tuple[int, int]]:
    """Host-exact top-K with the reference heap's total order.

    counts_row: (n,) int32 counts per index position."""
    eligible = np.nonzero(counts_row >= minmatches)[0]
    if eligible.size == 0:
        return []
    c = counts_row[eligible]
    l = lengths[eligible]
    s = mapping[eligible]
    order = np.lexsort((s, l, -c))[:tophits]
    return [(int(s[i]), int(c[i])) for i in order]
