"""Device k-mer candidate scoring.

TPU-native replacement for the reference's per-kmer counter loops
(src/core/searchcore.cpp:260-340 + arch/*/increment_counters.cpp): the
database k-mer incidence lives in HBM as a packed-bit matrix
(4^w x ceil(N/32) uint32 — the reference's bitmap representation
generalized to every k-mer), and a query batch's shared-kmer counts become

    counts(Q, N) = sum over the query's unique kmers of unpack(B[kmer, :])

a row gather + bit-unpack + accumulate.  Each query touches only its own
~L unique k-mers, so the work is O(Q x L x N/8) bytes of HBM traffic —
the same asymptotics as the reference's SIMD counter kernel — instead of
a dense matmul over the whole 4^w vocabulary (which wastes 4^w/L of the
MXU's work; measured ~50x slower than the gather form at amplicon sizes).
The gather streams through a lax.scan over fixed k-mer chunks so the
unpacked (Q, chunk, N) intermediate stays small.

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

from vsearch_tpu import configure_jax as _cfg
_cfg()
import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class DeviceKmerIndex:
    """Packed-bit incidence matrix on device, positions in heap order."""

    # device DB sequence storage is only built when the padded code matrix
    # stays within this budget (int8 bytes); beyond it the residual
    # host-driven alignment path carries the load
    DB_CODES_BUDGET = 4 << 30

    # positions per packed-bit block: bounds the scan accumulator (the
    # (qp, 32*words) int32 counts) so multi-million-sequence databases
    # shard into independent per-block top-k dispatches merged exactly
    # on device (counts are per-position, the heap order is encoded in
    # the position ordering, so a k-way merge of per-block top-k IS the
    # global top-k)
    BLOCK_POS = 131072

    def __init__(self, wordlength: int, kmer_lists: List[np.ndarray],
                 lengths: np.ndarray, mapping: np.ndarray,
                 capacity: Optional[int] = None) -> None:
        self.wordlength = wordlength
        self.hashsize = 1 << (2 * wordlength)
        n = len(kmer_lists)
        self.n = n
        cap = capacity or n
        cap = max(cap, 1)
        # dense MXU scoring path (ops/score_mxu.py): one-hot x bit-matrix
        # int8 matmul + packed two-stage top-k; 3.2x the scan kernel on v5e.
        # Blocks then store V rows (no gather-sentinel row) with columns
        # rounded to the kernel's 4096-position tiles.
        from .score_mxu import dense_supported, DENSE_MAXK_LIMIT
        self.dense = dense_supported(self.hashsize, self.BLOCK_POS)
        self._dense_maxk_limit = DENSE_MAXK_LIMIT
        lengths = np.asarray(lengths, dtype=np.int64)
        mapping = np.asarray(mapping, dtype=np.int64)
        # device position p <-> heap rank p: sorted by (length, seqno) so
        # that top_k's index tie-break reproduces minheap_compare exactly
        perm = np.lexsort((mapping, lengths))
        sizes = np.fromiter((kmer_lists[orig].size for orig in perm),
                            dtype=np.int64, count=n)
        all_kmers = np.ascontiguousarray(np.concatenate(
            [kmer_lists[orig] for orig in perm]), dtype=np.uint32) \
            if n and sizes.sum() else np.zeros(0, dtype=np.uint32)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=starts[1:])

        # shard positions (already in heap order) into blocks
        self.blocks = []   # (bits_dev, words, base, nb)
        base = 0
        from .. import native
        while True:
            nb = min(cap - base, self.BLOCK_POS)
            nb_real = max(0, min(n - base, nb))
            # keep the gather geometry inside the proven-fast envelope:
            # narrow rows (words < 640, i.e. < 2.5KB per gathered row)
            # compiled pathologically on the TPU backend; the dense path
            # additionally tiles positions at 4096 (score_mxu.NBLK)
            round_pos = 4096 if self.dense else 1024
            words = max(_round_up(max(nb, 1), round_pos) // 32, 640)
            bits = np.zeros((self.hashsize + 1, words), dtype=np.uint32)
            if nb_real > 0:
                lo_k, hi_k = int(starts[base]), int(starts[base + nb_real])
                blk_kmers = np.ascontiguousarray(all_kmers[lo_k:hi_k])
                blk_starts = np.ascontiguousarray(
                    starts[base:base + nb_real + 1] - starts[base])
                if not native.pack_bits(blk_kmers, blk_starts, nb_real,
                                        words, bits):
                    self._pack_bits_numpy(
                        bits, blk_kmers, blk_starts,
                        sizes[base:base + nb_real], nb_real)
            # dense kernels consume the V-row matrix; the scan fallback
            # needs the all-zero sentinel row for padding-id gathers
            dev = jax.device_put(bits[:self.hashsize] if self.dense
                                 else bits)
            self.blocks.append((dev, words, base, nb_real))
            base += nb
            if base >= cap:
                break
        self.bits = self.blocks[0][0]
        self.words = self.blocks[0][1]
        self.seqno_by_pos = mapping[perm]
        self.length_by_pos = lengths[perm]
        self.perm = perm
        # device-resident padded sequence codes in position order (attached
        # by attach_db_codes); enables index-gather alignment dispatches that
        # upload only query codes + candidate positions
        self.db_codes = None           # (n, Nmax) int8 device array
        self.tlen_by_pos_dev = None    # (n,) int32 device array
        self.db_codes_width = 0
        self._pos_of_seqno: Optional[dict] = None

    def attach_db_codes(self, db, bucket_fn) -> bool:
        """Upload padded 4-bit codes of every DB sequence, position order.

        Returns False (and leaves the index without device sequences) when
        the padded matrix exceeds DB_CODES_BUDGET."""
        if self.db_codes is not None:
            return True
        if self.n == 0:
            return False
        maxlen = int(self.length_by_pos.max())
        width = bucket_fn(max(maxlen, 1))
        if self.n * width > self.DB_CODES_BUDGET:
            return False
        from ..utils.maps import CHRMAP_4BIT
        lens = self.length_by_pos.astype(np.int64)
        flat = b"".join(db.getsequence(int(s)) for s in self.seqno_by_pos)
        arr = CHRMAP_4BIT[np.frombuffer(flat, dtype=np.uint8)].astype(np.int8)
        codes = np.zeros((self.n, width), dtype=np.int8)
        codes[np.arange(width)[None, :] < lens[:, None]] = arr
        self.db_codes = jax.device_put(codes)
        self.tlen_by_pos_dev = jax.device_put(
            self.length_by_pos.astype(np.int32))
        self.db_codes_width = width
        self._pos_of_seqno = {int(s): p
                              for p, s in enumerate(self.seqno_by_pos)}
        return True

    def _pack_bits_numpy(self, bits: np.ndarray, all_kmers: np.ndarray,
                         starts: np.ndarray, sizes: np.ndarray,
                         n: int) -> None:
        """Pure-numpy fallback for native.pack_bits: scatter a boolean
        (4^w, pos-chunk) slab and packbits along positions."""
        POS_CHUNK = 8192           # 0.5 GB slab at 4^8
        slab = np.zeros((self.hashsize, POS_CHUNK), dtype=bool)
        for base in range(0, n, POS_CHUNK):
            hi = min(base + POS_CHUNK, n)
            lo_k, hi_k = starts[base], starts[hi]
            rel = np.repeat(np.arange(base, hi, dtype=np.int64) - base,
                            sizes[base:hi])
            slab[:, :] = False
            slab[all_kmers[lo_k:hi_k].astype(np.int64), rel] = True
            # rows are contiguous along the pack axis; little-endian
            # bit+byte order makes byte i bits 8i..8i+7 == positions
            packed = np.packbits(slab, axis=1, bitorder="little")
            w0 = base // 32
            w1 = min(w0 + POS_CHUNK // 32, self.words)
            bits[:self.hashsize, w0:w1] = \
                packed.view(np.uint32)[:, :w1 - w0]

    def topk(self, query_kmer_lists: List[np.ndarray],
             k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k candidates per query in reference heap order.

        Returns (counts (Q, k) int32, positions (Q, k) int32); positions
        >= n or with count below the caller's minmatches must be dropped.
        """
        return self.topk_collect(self.topk_dispatch(query_kmer_lists, k))

    def topk_dispatch(self, query_kmer_lists: List[np.ndarray], k: int):
        """Asynchronously launch the scoring kernel; collect with
        topk_collect.  The split lets callers overlap host work (output
        writing, walk replay) with the device scan."""
        q = len(query_kmer_lists)
        k = min(k, self.n)
        if q == 0 or self.n == 0 or k == 0:
            return (q, [])
        # the gather kernel is fastest at qp<=512 (larger batches blow the
        # unpack accumulator out of fast memory); bigger query sets run as
        # asynchronously dispatched 512-query chunks with a single bundled
        # device->host fetch, so tunnel latency is paid once
        CHUNK = 512
        maxk = max((kl.size for kl in query_kmer_lists), default=1)
        maxk = max(_round_up(maxk, 640), 640)
        # u16 wire format halves the upload over the tunneled link; kmer ids
        # fit u16 for wordlength <= 8 (the padding sentinel travels as a
        # per-query count instead of an in-band id)
        u16 = self.hashsize <= 65536
        pending = []
        for lo in range(0, q, CHUNK):
            chunk = query_kmer_lists[lo:lo + CHUNK]
            # coarse geometry ladder: qp in {128, 512}; every distinct
            # (qp, maxk) is a separate TPU compile (expensive and
            # queue-dependent on a tunneled device)
            qp = 128 if len(chunk) <= 128 else CHUNK
            if self.dense:
                from .score_mxu import dense_topk_multi, pack_query_bits
                Kbits = pack_query_bits(chunk, qp, self.hashsize)
                kb_d = jnp.asarray(Kbits)
                # one fused dispatch per chunk: every block's counts+top-k
                # plus the exact k-way merge (score_mxu.dense_topk_multi)
                handle = dense_topk_multi(
                    self.hashsize, tuple(w for _, w, _, _ in self.blocks),
                    qp, k, tuple(p for _, _, p, _ in self.blocks),
                    packed_keys=maxk <= self._dense_maxk_limit)(
                    kb_d, [b for b, _, _, _ in self.blocks],
                    [nr for _, _, _, nr in self.blocks])
                pending.append((len(chunk), handle))
                continue
            kcounts = np.zeros(qp, dtype=np.int32)
            ids = np.zeros((qp, maxk), dtype=np.uint16 if u16 else np.int32)
            for qi, kmers in enumerate(chunk):
                ids[qi, :kmers.size] = kmers
                kcounts[qi] = kmers.size
            ids_d = jnp.asarray(ids)
            kc_d = jnp.asarray(kcounts)
            per_block = []
            for bits_dev, words, pbase, nb_real in self.blocks:
                v, i = _topk_kernel(self.hashsize, words, qp, maxk,
                                    min(k, max(nb_real, 1)),
                                    nb_real)(ids_d, kc_d, bits_dev)
                per_block.append((v, i, pbase))
            if len(per_block) == 1:
                v, i, _ = per_block[0]
                handle = (v, i)
            else:
                handle = _merge_blocks(
                    qp, k, tuple(p for _, _, p in per_block))(
                    [v for v, _, _ in per_block],
                    [i for _, i, _ in per_block])
            pending.append((len(chunk), handle))
        return (q, pending)

    def topk_collect(self, state) -> Tuple[np.ndarray, np.ndarray]:
        q, pending = state
        if not pending:
            return (np.zeros((q, 0), dtype=np.int32),
                    np.zeros((q, 0), dtype=np.int32))
        fetched = jax.device_get([h for _, h in pending])
        vals = np.concatenate([np.asarray(v)[:nq]
                               for (nq, _), (v, _) in zip(pending, fetched)])
        idx = np.concatenate([np.asarray(i)[:nq]
                              for (nq, _), (_, i) in zip(pending, fetched)])
        return vals, idx


@functools.lru_cache(maxsize=16)
def _merge_blocks(qp: int, k: int, bases: tuple):
    """Exact k-way merge of per-block top-k results.

    Positions are globally heap-ordered, so the global order is
    (count desc, global position asc) — a two-key lexicographic sort of
    the concatenated block results.  Invalid rows carry count -1 and are
    pushed to the back with position sentinel."""
    nb = len(bases)

    @jax.jit
    def run(vals_list, idx_list):
        vals = jnp.concatenate(vals_list, axis=1)              # (qp, nb*k)
        gidx = jnp.concatenate(
            [i + jnp.int32(b) for i, b in zip(idx_list, bases)], axis=1)
        # invalid entries (count -1): position pushed past every block
        gidx = jnp.where(vals < 0, jnp.int32(2**30), gidx)
        neg = -vals
        sneg, sidx = jax.lax.sort((neg, gidx), num_keys=2)
        return -sneg[:, :k], sidx[:, :k]

    return run


@functools.lru_cache(maxsize=32)
def _topk_kernel(hashsize: int, words: int, qp: int, maxk: int, k: int,
                 n_real: int):
    chunk = 32                     # query kmers unpacked per scan step
    nchunks = maxk // chunk
    n_cols = words * 32

    @jax.jit
    def run(ids, kcounts, bits):
        # ids: (qp, maxk) uint16/int32, real entries per query given by
        # kcounts; padding resolves to row `hashsize` (all-zero bits).
        # Query kmer lists are unique per query, so each gathered row
        # contributes exactly once.
        shifts = jnp.arange(32, dtype=jnp.uint32)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (qp, maxk), 1)
        ids = jnp.where(kpos < kcounts[:, None], ids.astype(jnp.int32),
                        jnp.int32(hashsize))

        def body(acc, idx_chunk):
            rows = bits[idx_chunk]                     # (qp, chunk, words)
            unpacked = (rows[..., None] >> shifts) & jnp.uint32(1)
            return acc + unpacked.astype(jnp.int32).sum(axis=1), None

        # (nchunks, qp, chunk) scan elements
        chunks = ids.reshape(qp, nchunks, chunk).transpose(1, 0, 2)
        acc = jnp.zeros((qp, words, 32), dtype=jnp.int32)
        acc, _ = jax.lax.scan(body, acc, chunks)
        acc = acc.reshape(qp, n_cols)
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
