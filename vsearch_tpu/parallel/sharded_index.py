"""Mesh-sharded k-mer candidate scoring for the production search pipeline.

The packed-bit incidence matrix (ops/score.py DeviceKmerIndex layout:
4^w x ceil(N/32) uint32, positions pre-sorted in the reference min-heap
order) is sharded along the position axis of a 1-D ("db",) device mesh.
Per query chunk each device gathers its query k-mer rows, unpacks and
accumulates counts for its position shard, takes a LOCAL top-k, and the
per-shard candidates are all-gathered and merged on device — the collective
analogue of the reference's per-thread min-heaps (minheap.cpp:82-146).

Exactness: positions are globally heap-ordered, shard s owns the contiguous
range [s*C, (s+1)*C), and the merge key (count desc, global position asc)
is the reference heap's total order, so the sharded top-k is bit-identical
to the single-device (and host) top-k.  tests/test_multichip.py asserts the
end-to-end uc/blast6 byte-parity of an 8-device virtual mesh against the
1-device run.

reference: searchcore.cpp search_topscores (:260-340) + minheap.cpp; the
distributed build target of SURVEY.md §2.3 (collective top-K merge).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from vsearch_tpu import configure_jax as _cfg
_cfg()
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import active_mesh


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ShardedKmerIndex:
    """Drop-in for ops.score.DeviceKmerIndex on a multi-device mesh.

    Same public surface consumed by core/search.py: n, seqno_by_pos,
    length_by_pos, topk / topk_dispatch / topk_collect, attach_db_codes.
    Scoring uses the SAME kernel tiers as the single-chip index: the dense
    MXU one-hot x bit-matrix kernel per shard on TPU meshes (scan-gather
    fallback elsewhere), followed by the collective all_gather + exact
    two-key merge.  attach_db_codes replicates the padded code matrix so
    the top-1 prefetch alignment runs under the mesh too (sharded over
    pairs by nw_jax's mesh-aware gather kernel) — r2 Weak #4."""

    # per-shard budget for the padded replicated code matrix
    DB_CODES_BUDGET = 4 << 30

    def __init__(self, wordlength: int, kmer_lists: List[np.ndarray],
                 lengths: np.ndarray, mapping: np.ndarray,
                 capacity: Optional[int] = None) -> None:
        import os
        mesh = active_mesh()
        assert mesh is not None, "ShardedKmerIndex requires a device mesh"
        self.mesh = mesh
        self.n_devices = mesh.devices.size
        self.wordlength = wordlength
        self.hashsize = 1 << (2 * wordlength)
        n = len(kmer_lists)
        self.n = n
        cap = max(capacity or n, 1)

        # dense MXU tier per shard: same gating as the single-chip index,
        # plus the per-shard position count must fit one dense block;
        # VSEARCH_TPU_DENSE_INTERPRET=1 forces the dense kernels in
        # interpreter mode so CPU virtual meshes can exercise this path
        from ..ops.score_mxu import dense_supported, DENSE_MAXK_LIMIT, NBLK
        self.interpret = os.environ.get(
            "VSEARCH_TPU_DENSE_INTERPRET", "0") == "1"
        cols_est = _round_up(-(-cap // self.n_devices), 32)
        self.dense = ((dense_supported(self.hashsize, cols_est)
                       or (self.interpret and cols_est <= 1 << 17))
                      and self.hashsize <= 1 << 18)
        self._dense_maxk_limit = DENSE_MAXK_LIMIT

        lengths = np.asarray(lengths, dtype=np.int64)
        mapping = np.asarray(mapping, dtype=np.int64)
        # device position p <-> heap rank p (count desc, length asc,
        # seqno asc == count desc, position asc after this presort)
        perm = np.lexsort((mapping, lengths))
        sizes = np.fromiter((kmer_lists[orig].size for orig in perm),
                            dtype=np.int64, count=n)
        all_kmers = np.ascontiguousarray(np.concatenate(
            [kmer_lists[orig] for orig in perm]), dtype=np.uint32) \
            if n and sizes.sum() else np.zeros(0, dtype=np.uint32)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=starts[1:])

        # equal per-shard column counts (positions); word-aligned for the
        # scan tier, dense-tile (4096) aligned for the MXU tier
        cols = _round_up(-(-cap // self.n_devices),
                         NBLK if self.dense else 32)
        self.cols_per_shard = cols
        words_total = cols * self.n_devices // 32
        bits = np.zeros((self.hashsize + 1, words_total), dtype=np.uint32)
        if n:
            from .. import native
            if not native.pack_bits(all_kmers, starts, n, words_total, bits):
                self._pack_bits_numpy(bits, all_kmers, starts, sizes, n,
                                      words_total)
        self.bits = jax.device_put(
            bits, NamedSharding(self.mesh, P(None, "db")))
        self.seqno_by_pos = mapping[perm]
        self.length_by_pos = lengths[perm]
        self.perm = perm
        # prefetch surface (attach_db_codes)
        self.db_codes = None
        self.tlen_by_pos_dev = None
        self.db_codes_width = 0
        self._pos_of_seqno = None

    def _pack_bits_numpy(self, bits, all_kmers, starts, sizes, n,
                         words_total) -> None:
        POS_CHUNK = 8192
        slab = np.zeros((self.hashsize, POS_CHUNK), dtype=bool)
        for base in range(0, n, POS_CHUNK):
            hi = min(base + POS_CHUNK, n)
            lo_k, hi_k = starts[base], starts[hi]
            rel = np.repeat(np.arange(base, hi, dtype=np.int64) - base,
                            sizes[base:hi])
            slab[:, :] = False
            slab[all_kmers[lo_k:hi_k].astype(np.int64), rel] = True
            packed = np.packbits(slab, axis=1, bitorder="little")
            w0 = base // 32
            w1 = min(w0 + POS_CHUNK // 32, words_total)
            bits[:self.hashsize, w0:w1] = packed.view(np.uint32)[:, :w1 - w0]

    def attach_db_codes(self, db, bucket_fn) -> bool:
        """Replicate padded 4-bit DB codes across the mesh so the top-1
        prefetch alignment (core/search.py) runs under the mesh; the
        alignment itself shards over pairs (nw_jax mesh-aware gather)."""
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
        repl = NamedSharding(self.mesh, P())
        self.db_codes = jax.device_put(codes, repl)
        self.tlen_by_pos_dev = jax.device_put(
            self.length_by_pos.astype(np.int32), repl)
        self.db_codes_width = width
        self._pos_of_seqno = {int(s): p
                              for p, s in enumerate(self.seqno_by_pos)}
        return True

    # -- scoring ---------------------------------------------------------

    def topk(self, query_kmer_lists: List[np.ndarray],
             k: int) -> Tuple[np.ndarray, np.ndarray]:
        return self.topk_collect(self.topk_dispatch(query_kmer_lists, k))

    def topk_dispatch(self, query_kmer_lists: List[np.ndarray], k: int):
        q = len(query_kmer_lists)
        k = min(k, self.n)
        if q == 0 or self.n == 0 or k == 0:
            return (q, [])
        CHUNK = 512
        maxk = max((kl.size for kl in query_kmer_lists), default=1)
        maxk = max(_round_up(maxk, 640), 640)
        u16 = self.hashsize <= 65536
        pending = []
        for lo in range(0, q, CHUNK):
            chunk = query_kmer_lists[lo:lo + CHUNK]
            qp = 128 if len(chunk) <= 128 else CHUNK
            if self.dense and maxk <= self._dense_maxk_limit:
                from ..ops.score_mxu import pack_query_bits
                Kbits = pack_query_bits(chunk, qp, self.hashsize)
                handle = _sharded_dense_kernel(
                    self.hashsize, self.cols_per_shard, qp, k, self.n,
                    self.n_devices, self.interpret, id(self.mesh))(
                    jnp.asarray(Kbits), self.bits)
                pending.append((len(chunk), handle))
                continue
            kcounts = np.zeros(qp, dtype=np.int32)
            ids = np.zeros((qp, maxk), dtype=np.uint16 if u16 else np.int32)
            for qi, kmers in enumerate(chunk):
                ids[qi, :kmers.size] = kmers
                kcounts[qi] = kmers.size
            handle = _sharded_topk_kernel(
                self.hashsize, self.cols_per_shard, qp, maxk, k, self.n,
                self.n_devices, id(self.mesh))(
                jnp.asarray(ids), jnp.asarray(kcounts), self.bits)
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


@functools.lru_cache(maxsize=32)
def _sharded_dense_kernel(hashsize: int, cols: int, qp: int, k: int,
                          n_total: int, n_devices: int, interpret: bool,
                          _mesh_id: int):
    """shard_map around the dense MXU block kernel (ops/score_mxu.py):
    each device scores its position shard with the one-hot x bit-matrix
    matmul + packed-key top-k, then the per-shard candidates merge with
    the same all_gather + two-key sort as the scan tier.  Per-shard
    occupancy (n_real) is a traced scalar, so every shard shares one
    compiled kernel."""
    from ..ops.score_mxu import dense_topk_kernel
    mesh = active_mesh()
    k_local = min(k, cols)
    kern = dense_topk_kernel(hashsize, cols // 32, qp, k_local,
                             interpret=interpret)

    def local(Kbits, bits_shard):
        shard = jax.lax.axis_index("db")
        base = shard.astype(jnp.int32) * jnp.int32(cols)
        n_local = jnp.clip(jnp.int32(n_total) - base, 0, jnp.int32(cols))
        vals, idx = kern(Kbits, bits_shard[:hashsize], n_local)
        gidx = jnp.where(vals < 0, jnp.int32(2**30), idx + base)
        allv = jax.lax.all_gather(vals, "db", axis=1, tiled=True)
        alli = jax.lax.all_gather(gidx, "db", axis=1, tiled=True)
        sneg, sidx = jax.lax.sort((-allv, alli), num_keys=2)
        return -sneg[:, :k], sidx[:, :k]

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, "db")),
        out_specs=(P(), P()),
        check_vma=False,
    ))


@functools.lru_cache(maxsize=32)
def _sharded_topk_kernel(hashsize: int, cols: int, qp: int, maxk: int,
                         k: int, n_total: int, n_devices: int,
                         _mesh_id: int):
    """shard_map: per-shard gather+popcount counts, local top-k, all_gather,
    exact device-side merge.  Bits arrive sharded P(None, "db")."""
    mesh = active_mesh()
    words_shard = cols // 32
    chunk = 32
    nchunks = maxk // chunk
    k_local = min(k, cols)

    def local(ids, kcounts, bits_shard):
        shifts = jnp.arange(32, dtype=jnp.uint32)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (qp, maxk), 1)
        ids_m = jnp.where(kpos < kcounts[:, None], ids.astype(jnp.int32),
                          jnp.int32(hashsize))

        def body(acc, idx_chunk):
            rows = bits_shard[idx_chunk]          # (qp, chunk, words_shard)
            unpacked = (rows[..., None] >> shifts) & jnp.uint32(1)
            return acc + unpacked.astype(jnp.int32).sum(axis=1), None

        chunks = ids_m.reshape(qp, nchunks, chunk).transpose(1, 0, 2)
        acc = jnp.zeros((qp, words_shard, 32), dtype=jnp.int32)
        acc, _ = jax.lax.scan(body, acc, chunks)
        acc = acc.reshape(qp, cols)

        shard = jax.lax.axis_index("db")
        base = shard.astype(jnp.int32) * jnp.int32(cols)
        n_local = jnp.clip(jnp.int32(n_total) - base, 0, jnp.int32(cols))
        col = jax.lax.broadcasted_iota(jnp.int32, (qp, cols), 1)
        acc = jnp.where(col < n_local, acc, -1)

        vals, idx = jax.lax.top_k(acc, k_local)
        gidx = jnp.where(vals < 0, jnp.int32(2**30),
                         idx.astype(jnp.int32) + base)
        # collective candidate merge over ICI: every shard's local top-k
        # gathered to all devices, then the exact two-key lexicographic
        # order (count desc, global position asc) replayed on device
        allv = jax.lax.all_gather(vals, "db", axis=1, tiled=True)
        alli = jax.lax.all_gather(gidx, "db", axis=1, tiled=True)
        sneg, sidx = jax.lax.sort((-allv, alli), num_keys=2)
        return -sneg[:, :k], sidx[:, :k]

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(None, "db")),
        out_specs=(P(), P()),
        check_vma=False,
    ))
