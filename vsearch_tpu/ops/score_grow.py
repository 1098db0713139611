"""Device k-mer scoring for GROWING indexes (clustering / denovo chimera).

The search engines that grow their index mid-run (greedy clustering adds
every new centroid, denovo chimera every accepted non-chimera — reference
dbindex.cpp:121-148 add_sequence) cannot use ops/score.py's
DeviceKmerIndex, whose exactness relies on device positions being
pre-sorted in min-heap order.  This class keeps the packed-bit incidence
matrix over-allocated on device and appends rows with per-round
scatter-OR updates (buffer-donated, so XLA updates in place), while the
heap ORDER travels separately as a per-position rank vector maintained
incrementally on host:

    key(q, p) = counts(q, p) << RANK_BITS  |  (RANK_MAX - rank(p))

which makes jax.lax.top_k's descending value order exactly the reference
min-heap's (count desc, length asc, seqno asc) total order
(src/core/minheap.cpp:111-146) for ANY position insertion order.

Exactness gates (callers fall back to the host postings tier otherwise):
  * counts fit the key:   max query-kmer count < 2^(31-RANK_BITS)
  * positions fit ranks:  capacity < 2^RANK_BITS  (1M centroids)

reference: src/core/searchcore.cpp:260-340 (search_topscores) feeding
src/core/cluster.cpp:877-1030 / chimera.cpp:2018-2071.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

from vsearch_tpu import configure_jax as _cfg
_cfg()
import jax
import jax.numpy as jnp

RANK_BITS = 20
RANK_MAX = (1 << RANK_BITS) - 1
MAX_COUNT = (1 << (31 - RANK_BITS)) - 1     # 2047 shared kmers per query
MIN_WORDS = 640        # narrower gathered rows compile pathologically


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _scatter_fn():
    @functools.partial(jax.jit, donate_argnums=0)
    def scatter(bits, packed, nk):
        # packed (2, NK) int32: row 0 = kmer ids, row 1 = positions —
        # ONE host->device upload per round (each upload is a full
        # tunnel round-trip); word column and bit decode on device.
        # NK is BUCKETED (power-of-two pad) so every round reuses one
        # compiled program — per-round recompiles cost ~0.5s each on a
        # tunneled attachment; padding rows are masked to value 0 via
        # the traced nk scalar.  Fresh positions: the targeted bits are
        # all zero and every (kmer, position) pair unique, so
        # scatter-add == scatter-or.
        rows = packed[0]
        p = packed[1]
        live = jnp.arange(rows.shape[0], dtype=jnp.int32) < nk[0]
        cols = jax.lax.shift_right_logical(p, 5)
        vals = jnp.where(
            live,
            jnp.uint32(1) << (p.astype(jnp.uint32) & jnp.uint32(31)),
            jnp.uint32(0))
        return bits.at[rows, cols].add(vals)
    return scatter


def _pad_pow2(n: int, lo: int = 4096) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@functools.lru_cache(maxsize=8)
def _scatter_codes_fn():
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def scatter(codes, tlen, pos, newcodes, newlens):
        return codes.at[pos].set(newcodes), tlen.at[pos].set(newlens)
    return scatter


@functools.lru_cache(maxsize=32)
def _topk_ranked_kernel(hashsize: int, words: int, qp: int, maxk: int,
                        k: int):
    """Scan-counts + rank-keyed exact top-k over one growing block."""
    chunk = 32
    nchunks = maxk // chunk
    n_cols = words * 32

    @jax.jit
    def run(ids, kcounts, bits, rank):
        shifts = jnp.arange(32, dtype=jnp.uint32)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (qp, maxk), 1)
        ids = jnp.where(kpos < kcounts[:, None], ids.astype(jnp.int32),
                        jnp.int32(hashsize))

        def body(acc, idx_chunk):
            rows = bits[idx_chunk]                     # (qp, chunk, words)
            unpacked = (rows[..., None] >> shifts) & jnp.uint32(1)
            return acc + unpacked.astype(jnp.int32).sum(axis=1), None

        chunks = ids.reshape(qp, nchunks, chunk).transpose(1, 0, 2)
        acc = jnp.zeros((qp, words, 32), dtype=jnp.int32)
        acc, _ = jax.lax.scan(body, acc, chunks)
        acc = acc.reshape(qp, n_cols)
        # heap-order key; unoccupied positions carry rank RANK_MAX and are
        # masked out entirely
        key = (acc << RANK_BITS) | (RANK_MAX - rank)[None, :]
        key = jnp.where(rank[None, :] >= RANK_MAX, -1, key)
        vals, idx = jax.lax.top_k(key, k)
        counts = jnp.where(vals >= 0,
                           jax.lax.shift_right_logical(vals, RANK_BITS), -1)
        return counts, idx.astype(jnp.int32)

    return run


class GrowingDeviceKmerIndex:
    """Over-allocated packed-bit incidence matrix with scatter appends."""

    def __init__(self, wordlength: int, capacity: int = 0) -> None:
        self.wordlength = wordlength
        self.hashsize = 1 << (2 * wordlength)
        cap = max(capacity, MIN_WORDS * 32)
        # 4096-column rounding keeps the dense MXU tier eligible
        # (score_mxu.NBLK geometry); the scan tier is indifferent
        cap = _round_up(cap, 4096)
        if cap > RANK_MAX:
            raise ValueError("capacity exceeds rank budget")
        self.cap = cap
        self.words = cap // 32
        self.n = 0
        # +1 sentinel row: padded query-kmer ids gather all-zero bits.
        # Allocated ON DEVICE (jnp.zeros): a host-side zero matrix at
        # production capacity (e.g. 840 MB at 100k positions) would pay
        # a full tunnel upload; device zeros cost nothing and the
        # occupied entries arrive via the same scatter as appends.
        self.bits = jnp.zeros((self.hashsize + 1, self.words),
                              dtype=jnp.uint32)
        self.lengths = np.zeros(cap, dtype=np.int64)
        self.seqnos = np.zeros(cap, dtype=np.int64)
        # positions sorted by (length, seqno): maintained incrementally
        self._order = np.zeros(0, dtype=np.int64)
        self._rank_dev = None          # uploaded lazily before a topk
        self._rank_dirty = True
        self._rank_perm_np = None      # dense tier: kernel-column order
        self._dense = None             # lazily decided (tpu + geometry)
        self.fixed_qp = 0              # pin chunk geometry (one compile)
        # device-resident padded sequence codes (attach_codes): enables
        # the top-1 prefetch alignment chained off the top-k output
        self.codes = None              # (cap, width) int8 device
        self.tlen_dev = None           # (cap,) int32 device
        self.codes_width = 0

    # -- growth ----------------------------------------------------------

    def append_round(self, entries: Sequence[Tuple[np.ndarray, int, int]]
                     ) -> bool:
        """Append (kmers, length, seqno) entries; False if capacity full
        (caller rebuilds with a larger capacity)."""
        if self.n + len(entries) > self.cap:
            return False
        rows_all = []
        pos_all = []
        p0 = self.n
        for kmers, length, seqno in entries:
            p = self.n
            if kmers.size:
                rows_all.append(kmers.astype(np.int32))
                pos_all.append(np.full(kmers.size, p, dtype=np.int32))
            self.lengths[p] = length
            self.seqnos[p] = seqno
            self.n += 1
        # batched sorted-order insert (length asc, seqno asc): ONE
        # np.insert per round — the per-entry form was O(n) each and
        # dominated append cost at production scale.  Composite keys are
        # unique (seqno disambiguates), so inserting the new entries in
        # key order at their searchsorted positions reproduces the exact
        # total order
        new_p = np.arange(p0, self.n, dtype=np.int64)
        new_key = self.lengths[new_p] * (1 << 40) + self.seqnos[new_p]
        ksort = np.argsort(new_key, kind="stable")
        composite = self.lengths[self._order] * (1 << 40) \
            + self.seqnos[self._order]
        at = np.searchsorted(composite, new_key[ksort])
        self._order = np.insert(self._order, at, new_p[ksort])
        if rows_all:
            packed = np.stack([np.concatenate(rows_all),
                               np.concatenate(pos_all)])
            self._scatter(packed)
        if self.codes is not None and entries:
            self._append_codes(entries, self.n - len(entries))
        self._rank_dirty = True
        return True

    def _scatter(self, packed: np.ndarray) -> None:
        nk = packed.shape[1]
        pad = _pad_pow2(nk)
        if pad != nk:
            full = np.zeros((2, pad), dtype=packed.dtype)
            full[:, :nk] = packed
            packed = full
        self.bits = _scatter_fn()(self.bits, jnp.asarray(packed),
                                  jnp.asarray([nk], dtype=np.int32))

    def _put_bits(self, bits: np.ndarray) -> None:
        self.bits = jax.device_put(bits)

    def _topk_kernel(self, qp: int, maxk: int, k: int):
        return _topk_ranked_kernel(self.hashsize, self.words, qp, maxk, k)

    def attach_codes(self, width: int, seq_of) -> None:
        """Allocate the (cap, width) device code matrix and backfill the
        occupied positions.  seq_of: callable seqno -> sequence bytes
        (kept for appends)."""
        from ..utils.maps import CHRMAP_4BIT
        self.codes_width = width
        self._seq_of = seq_of
        codes = np.zeros((self.cap, width), dtype=np.int8)
        tlen = np.zeros(self.cap, dtype=np.int32)
        for p in range(self.n):
            s = seq_of(int(self.seqnos[p]))
            ln = min(len(s), width)
            codes[p, :ln] = CHRMAP_4BIT[
                np.frombuffer(s[:ln], dtype=np.uint8)].astype(np.int8)
            tlen[p] = ln
        self.codes = jax.device_put(codes)
        self.tlen_dev = jax.device_put(tlen)

    def _append_codes(self, entries, p0: int) -> None:
        from ..utils.maps import CHRMAP_4BIT
        ne = len(entries)
        pad = _pad_pow2(ne, lo=64)     # bucketed: one compile per bucket
        nc = np.zeros((pad, self.codes_width), dtype=np.int8)
        nl = np.zeros(pad, dtype=np.int32)
        for k, (_, _, seqno) in enumerate(entries):
            s = self._seq_of(seqno)
            ln = min(len(s), self.codes_width)
            nc[k, :ln] = CHRMAP_4BIT[
                np.frombuffer(s[:ln], dtype=np.uint8)].astype(np.int8)
            nl[k] = ln
        # padding rows repeat entry 0 (identical duplicate .set targets,
        # so whichever write wins the row is unchanged)
        pos = np.full(pad, p0, dtype=np.int32)
        pos[:ne] = np.arange(p0, p0 + ne, dtype=np.int32)
        if ne:
            nc[ne:] = nc[0]
            nl[ne:] = nl[0]
        self.codes, self.tlen_dev = _scatter_codes_fn()(
            self.codes, self.tlen_dev, jnp.asarray(pos), jnp.asarray(nc),
            jnp.asarray(nl))

    @classmethod
    def build(cls, wordlength: int, kmer_lists: List[np.ndarray],
              lengths: Sequence[int], seqnos: Sequence[int],
              capacity: int) -> "GrowingDeviceKmerIndex":
        """Bulk build for activation or capacity growth.  The occupied
        entries ship as ONE (kmer, position) scatter upload (~8 bytes per
        stored k-mer) into the device-allocated zero matrix — the upload
        scales with the DATA, not the capacity."""
        self = cls(wordlength, capacity)
        n = len(kmer_lists)
        if n:
            rows_all = [kl.astype(np.int32) for kl in kmer_lists if kl.size]
            pos_all = [np.full(kl.size, p, dtype=np.int32)
                       for p, kl in enumerate(kmer_lists) if kl.size]
            if rows_all:
                packed = np.stack([np.concatenate(rows_all),
                                   np.concatenate(pos_all)])
                self._scatter(packed)
            self.lengths[:n] = np.asarray(lengths)
            self.seqnos[:n] = np.asarray(seqnos)
            self.n = n
            self._order = np.lexsort((self.seqnos[:n], self.lengths[:n]))
            self._rank_dirty = True
        return self

    # -- scoring ---------------------------------------------------------

    def _ranks(self):
        # numpy result: the upload rides the next kernel dispatch instead
        # of paying its own device_put round-trip on the tunneled link
        if self._rank_dirty or self._rank_dev is None:
            rank = np.full(self.words * 32, RANK_MAX, dtype=np.int32)
            rank[self._order] = np.arange(self.n, dtype=np.int32)
            self._rank_dev = rank
            self._rank_perm_np = None
            self._rank_dirty = False
        return self._rank_dev

    def _rank_perm(self):
        """Rank vector permuted into dense-kernel column order (bit b of
        word w lands at column b*WBLK + w within each NBLK block — see
        score_mxu module docstring)."""
        rank = self._ranks()
        if self._rank_perm_np is None:
            from .score_mxu import NBLK, WBLK
            j = np.arange(self.words * 32)
            r = j % NBLK
            pos = (j // NBLK) * NBLK + 32 * (r % WBLK) + r // WBLK
            self._rank_perm_np = np.ascontiguousarray(rank[pos])
        return self._rank_perm_np

    def _use_dense(self) -> bool:
        """Dense MXU tier eligibility (single TPU chip; the mesh-sharded
        subclass keeps the scan tier)."""
        if self._dense is None:
            import os
            from .score_mxu import NBLK, VBLK_MAX
            V = self.hashsize
            self._dense = (
                os.environ.get("VSEARCH_TPU_GROW_DENSE", "1") != "0"
                and jax.default_backend() == "tpu"
                and (self.words * 32) % NBLK == 0
                and V % min(VBLK_MAX, V) == 0 and V >= 32)
        return self._dense

    def supports(self, kmer_lists: List[np.ndarray]) -> bool:
        return (self.cap <= RANK_MAX
                and max((kl.size for kl in kmer_lists), default=0)
                <= MAX_COUNT)

    def topk_dispatch(self, kmer_lists: List[np.ndarray], tophits: int):
        """Asynchronously launch the ranked top-k; per-chunk (count, pos)
        device handles let the cluster engine chain the top-1 prefetch
        alignment device-to-device before fetching anything."""
        q = len(kmer_lists)
        k = min(tophits, self.n)
        if q == 0 or self.n == 0 or k == 0:
            return (q, [])
        CHUNK = 512
        dense = self._use_dense()
        rank = self._rank_perm() if dense else self._ranks()
        if dense:
            from .score_mxu import dense_topk_ranked_kernel, pack_query_bits
            rank_dev = jnp.asarray(rank)
            pending = []
            for lo in range(0, q, CHUNK):
                chunk = kmer_lists[lo:lo + CHUNK]
                qp = self.fixed_qp or (
                    128 if len(chunk) <= 128 else
                    (256 if len(chunk) <= 256 else CHUNK))
                Kbits = pack_query_bits(chunk, qp, self.hashsize)
                v, i = dense_topk_ranked_kernel(
                    self.hashsize, self.words, qp, k)(
                    jnp.asarray(Kbits), self.bits, rank_dev)
                pending.append((len(chunk), (v, i)))
            return (q, pending)
        maxk = max((kl.size for kl in kmer_lists), default=1)
        maxk = max(_round_up(maxk, 640), 640)
        u16 = self.hashsize <= 65536
        pending = []
        for lo in range(0, q, CHUNK):
            chunk = kmer_lists[lo:lo + CHUNK]
            qp = self.fixed_qp or (
                128 if len(chunk) <= 128 else
                (256 if len(chunk) <= 256 else CHUNK))
            kcounts = np.zeros(qp, dtype=np.int32)
            ids = np.zeros((qp, maxk), dtype=np.uint16 if u16 else np.int32)
            for qi, kmers in enumerate(chunk):
                ids[qi, :kmers.size] = kmers
                kcounts[qi] = kmers.size
            v, i = self._topk_kernel(qp, maxk, k)(
                jnp.asarray(ids), jnp.asarray(kcounts), self.bits, rank)
            pending.append((len(chunk), (v, i)))
        return (q, pending)

    def topk_cut(self, fetched_pending,
                 minmatches_list: Sequence[int]
                 ) -> List[List[Tuple[int, int]]]:
        """Host cut of already-fetched chunk results into per-query
        (seqno, count) lists in reference heap order."""
        out: List[List[Tuple[int, int]]] = []
        qi_global = 0
        for nq, (vals, idx) in fetched_pending:
            vals = np.asarray(vals)
            idx = np.asarray(idx)
            for r in range(nq):
                mm = minmatches_list[qi_global]
                row: List[Tuple[int, int]] = []
                for c, p in zip(vals[r].tolist(), idx[r].tolist()):
                    if c < mm:
                        break
                    row.append((int(self.seqnos[p]), int(c)))
                out.append(row)
                qi_global += 1
        return out

    def topk_batch(self, kmer_lists: List[np.ndarray], tophits: int,
                   minmatches_list: Sequence[int]
                   ) -> List[List[Tuple[int, int]]]:
        """Per-query (seqno, count) candidates in reference heap order."""
        q, pending = self.topk_dispatch(kmer_lists, tophits)
        if not pending:
            return [[] for _ in range(q)]
        fetched = jax.device_get([h for _, h in pending])
        return self.topk_cut(
            [(nq, f) for (nq, _), f in zip(pending, fetched)],
            minmatches_list)


# ---------------------------------------------------------------------------
# mesh-sharded variant
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _sharded_scatter_fn(mesh_shape: int, wps: int, hashsize: int):
    """Per-shard masked scatter: each device applies only the (kmer, pos)
    updates whose word column falls in its shard (out-of-range updates
    retarget the all-zero sentinel row with a zero value)."""
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import active_mesh
    mesh = active_mesh()

    def local(bits_shard, packed, nk):
        rows = packed[0]
        p = packed[1]
        sid = jax.lax.axis_index("db")
        cols = jax.lax.shift_right_logical(p, 5) - sid * wps
        live = jnp.arange(rows.shape[0], dtype=jnp.int32) < nk[0]
        ok = (cols >= 0) & (cols < wps) & live
        rows = jnp.where(ok, rows, hashsize)
        cols = jnp.clip(cols, 0, wps - 1)
        vals = jnp.where(
            ok, jnp.uint32(1) << (p.astype(jnp.uint32) & jnp.uint32(31)),
            jnp.uint32(0))
        return bits_shard.at[rows, cols].add(vals)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "db"), P(), P()),
        out_specs=P(None, "db"),
        check_vma=False), donate_argnums=0)


@functools.lru_cache(maxsize=32)
def _sharded_topk_ranked_kernel(hashsize: int, wps: int, qp: int,
                                maxk: int, k: int):
    """Sharded scan-counts + rank-keyed top-k: local top-k per position
    shard, all_gather, exact merge by the same composite key (the key IS
    the reference heap's total order, so merging top-k lists by key is
    bit-identical to the single-device top-k)."""
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import active_mesh
    mesh = active_mesh()
    chunk = 32
    nchunks = maxk // chunk
    local_cols = wps * 32

    def local(ids, kcounts, bits_shard, rank):
        shifts = jnp.arange(32, dtype=jnp.uint32)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (qp, maxk), 1)
        ids = jnp.where(kpos < kcounts[:, None], ids.astype(jnp.int32),
                        jnp.int32(hashsize))

        def body(acc, idx_chunk):
            rows = bits_shard[idx_chunk]            # (qp, chunk, wps)
            unpacked = (rows[..., None] >> shifts) & jnp.uint32(1)
            return acc + unpacked.astype(jnp.int32).sum(axis=1), None

        chunks = ids.reshape(qp, nchunks, chunk).transpose(1, 0, 2)
        acc = jnp.zeros((qp, wps, 32), dtype=jnp.int32)
        acc = jax.lax.pvary(acc, ("db",))
        acc, _ = jax.lax.scan(body, acc, chunks)
        acc = acc.reshape(qp, local_cols)
        sid = jax.lax.axis_index("db")
        rank_local = jax.lax.dynamic_slice(
            rank, (sid * local_cols,), (local_cols,))
        key = (acc << RANK_BITS) | (RANK_MAX - rank_local)[None, :]
        key = jnp.where(rank_local[None, :] >= RANK_MAX, -1, key)
        kk = min(k, local_cols)
        v, i = jax.lax.top_k(key, kk)
        i = i + sid * local_cols
        allv = jax.lax.all_gather(v, "db", axis=1, tiled=True)
        alli = jax.lax.all_gather(i, "db", axis=1, tiled=True)
        v2, sel = jax.lax.top_k(allv, k)
        idx2 = jnp.take_along_axis(alli, sel, axis=1)
        counts = jnp.where(v2 >= 0,
                           jax.lax.shift_right_logical(v2, RANK_BITS), -1)
        return counts, idx2.astype(jnp.int32)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(None, "db"), P()),
        out_specs=(P(), P()),
        check_vma=False))


class ShardedGrowingKmerIndex(GrowingDeviceKmerIndex):
    """GrowingDeviceKmerIndex with the packed-bit incidence matrix sharded
    along the position axis of the active ("db",) mesh — the growing-index
    analogue of parallel/sharded_index.ShardedKmerIndex (r3 Missing #3).

    Appends land on the owning shard via a per-shard masked scatter; the
    ranked top-k runs per shard and merges with collectives.  Host-side
    bookkeeping (lengths, seqnos, heap order) is identical to the
    single-device class, so topk_cut/exactness carry over unchanged."""

    def __init__(self, wordlength: int, capacity: int = 0) -> None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import active_mesh
        mesh = active_mesh()
        assert mesh is not None, "requires an active device mesh"
        self.mesh = mesh
        S = mesh.devices.size
        self.wordlength = wordlength
        self.hashsize = 1 << (2 * wordlength)
        cap = max(capacity, MIN_WORDS * 32, 32 * S)
        cap = _round_up(cap, 32 * S)
        if cap > RANK_MAX:
            raise ValueError("capacity exceeds rank budget")
        self.cap = cap
        self.words = cap // 32
        self.wps = self.words // S
        self.n = 0
        self.bits = jax.device_put(
            np.zeros((self.hashsize + 1, self.words), dtype=np.uint32),
            NamedSharding(mesh, P(None, "db")))
        self.lengths = np.zeros(cap, dtype=np.int64)
        self.seqnos = np.zeros(cap, dtype=np.int64)
        self._order = np.zeros(0, dtype=np.int64)
        self._rank_dev = None
        self._rank_dirty = True
        self._rank_perm_np = None
        self._dense = False
        self.fixed_qp = 0
        self.codes = None
        self.tlen_dev = None
        self.codes_width = 0

    def _use_dense(self) -> bool:
        return False            # mesh tier: sharded scan + collectives

    def _scatter(self, packed: np.ndarray) -> None:
        nk = packed.shape[1]
        pad = _pad_pow2(nk)
        if pad != nk:
            full = np.zeros((2, pad), dtype=packed.dtype)
            full[:, :nk] = packed
            packed = full
        self.bits = _sharded_scatter_fn(
            self.mesh.devices.size, self.wps, self.hashsize)(
            self.bits, jnp.asarray(packed),
            jnp.asarray([nk], dtype=np.int32))

    def _topk_kernel(self, qp: int, maxk: int, k: int):
        return _sharded_topk_ranked_kernel(self.hashsize, self.wps, qp,
                                           maxk, k)

    def attach_codes(self, width: int, seq_of) -> None:
        # prefetch under a mesh gathers targets inside shard_map with the
        # code matrix replicated (nw_jax._gather_align_kernel mesh path)
        from jax.sharding import NamedSharding, PartitionSpec as P
        super().attach_codes(width, seq_of)
        self.codes = jax.device_put(
            np.asarray(self.codes),
            NamedSharding(self.mesh, P()))
        self.tlen_dev = jax.device_put(
            np.asarray(self.tlen_dev), NamedSharding(self.mesh, P()))
