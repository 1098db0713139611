"""Device k-mer candidate scoring.

TPU-native replacement for the reference's per-kmer counter loops
(src/core/searchcore.cpp:260-340 + arch/*/increment_counters.cpp): the
database k-mer incidence lives in HBM as a packed-bit matrix
(4^w x ceil(N/32) uint32 — the reference's bitmap representation
generalized to every k-mer), and a query batch's shared-kmer counts become

    counts(Q, N) = sum_chunks  A[:, chunk] @ unpack(B[chunk, :])

an int8 MXU matmul over 512-kmer vocabulary chunks, where A is the (Q, 4^w)
query-kmer presence matrix scattered on device from the padded query k-mer
lists.

Top-K selection runs on device too: index positions are pre-sorted by
(length asc, seqno asc), so jax.lax.top_k's total order (count desc,
position asc — ties prefer the lower index) IS the reference min-heap's
total order (count desc, length asc, seqno asc; minheap.cpp:111-146).
Only (k) values + indices per query cross the wire.
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
    """Packed-bit incidence matrix on device, positions in heap order."""

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
        lengths = np.asarray(lengths, dtype=np.int64)
        mapping = np.asarray(mapping, dtype=np.int64)
        # device position p <-> heap rank p: sorted by (length, seqno) so
        # that top_k's index tie-break reproduces minheap_compare exactly
        perm = np.lexsort((mapping, lengths))
        bits = np.zeros((self.hashsize, self.words), dtype=np.uint32)
        for p, orig in enumerate(perm):
            w, b = divmod(p, 32)
            bits[kmer_lists[orig], w] |= np.uint32(1 << b)
        self.bits = jax.device_put(bits)
        self.seqno_by_pos = mapping[perm]
        self.length_by_pos = lengths[perm]

    def topk(self, query_kmer_lists: List[np.ndarray],
             k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k candidates per query in reference heap order.

        Returns (counts (Q, k) int32, positions (Q, k) int32); positions
        >= n or with count below the caller's minmatches must be dropped.
        """
        q = len(query_kmer_lists)
        k = min(k, self.n)
        if q == 0 or self.n == 0 or k == 0:
            return (np.zeros((q, 0), dtype=np.int32),
                    np.zeros((q, 0), dtype=np.int32))
        qp = 8
        while qp < q:
            qp *= 2
        maxk = max((kl.size for kl in query_kmer_lists), default=1)
        maxk = max(_round_up(maxk, 128), 128)
        # padded kmer ids; hashsize is a scratch column sliced off on device
        ids = np.full((qp, maxk), self.hashsize, dtype=np.int32)
        for qi, kmers in enumerate(query_kmer_lists):
            ids[qi, :kmers.size] = kmers
        vals, idx = _topk_kernel(self.hashsize, self.words, qp, maxk, k,
                                 self.n)(jnp.asarray(ids), self.bits)
        out = jax.device_get((vals, idx))
        return np.asarray(out[0])[:q], np.asarray(out[1])[:q]


@functools.lru_cache(maxsize=32)
def _topk_kernel(hashsize: int, words: int, qp: int, maxk: int, k: int,
                 n_real: int):
    chunk = 512
    nchunks = hashsize // chunk
    n_cols = words * 32

    @jax.jit
    def run(ids, bits):
        # ids: (qp, maxk) int32 padded with `hashsize`; bits: (hashsize, words)
        A = jnp.zeros((qp, hashsize + 1), dtype=jnp.int8)
        rows = jax.lax.broadcasted_iota(jnp.int32, (qp, maxk), 0)
        A = A.at[rows, ids].set(1)[:, :hashsize]
        shifts = jnp.arange(32, dtype=jnp.uint32)

        def body(acc, c):
            base = c * chunk
            a_c = jax.lax.dynamic_slice(A, (0, base), (qp, chunk))
            b_c = jax.lax.dynamic_slice(bits, (base, 0), (chunk, words))
            unpacked = ((b_c[:, :, None] >> shifts[None, None, :]) & 1)
            unpacked = unpacked.astype(jnp.int8).reshape(chunk, n_cols)
            acc = acc + jax.lax.dot(
                a_c, unpacked, preferred_element_type=jnp.int32)
            return acc, None

        acc = jnp.zeros((qp, n_cols), dtype=jnp.int32)
        acc, _ = jax.lax.scan(body, acc, jnp.arange(nchunks))
        # mask padding columns so they can never displace a real candidate
        col = jax.lax.broadcasted_iota(jnp.int32, (qp, n_cols), 1)
        acc = jnp.where(col < jnp.int32(n_real), acc, -1)
        vals, idx = jax.lax.top_k(acc, k)
        return vals, idx.astype(jnp.int32)

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
