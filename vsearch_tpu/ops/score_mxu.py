"""Dense MXU candidate scoring: one-hot x bit-matrix int8 matmul.

TPU-first replacement for the gather/unpack scan in ops/score.py: the
shared-kmer counts of a query chunk against an index block are

    counts(Q, N) = onehot(Q, 4^w) @ unpack(bits(4^w, N/32))

with the one-hot operand shipped as packed bits (8x narrower wire format,
built by the native tier: native/vsearch_tpu_native.c
vstpu_pack_query_bits) and the DB bit matrix unpacked INSIDE a Pallas
kernel, once per (vocab-block, position-block) VMEM tile — so the unpack
cost is paid per DB tile and amortized over the whole query chunk, and the
102x-redundant MACs run on the MXU at int8 throughput instead of the VPU.
Measured on v5e (512 queries x 131072 positions, w=8): 22 ms vs 203 ms
for the scan kernel (9x), of which ~127 ms was lax.top_k — replaced here
by an exact two-stage packed-key top-k (~6x faster).

Exactness: the top-k key packs (count << 17) | (2^17 - 1 - position), a
strict total order equal to the reference min-heap's (count desc, length
asc, seqno asc) once positions are presorted by (length, seqno)
(src/core/minheap.cpp:111-146; ops/score.py position presort).  The packed
key needs count < 2^14 and block positions <= 2^17, so the dense path is
gated on maxk <= 16383 (amplicon regime; longer queries take the scan
path) and BLOCK_POS <= 131072.

The in-kernel unpack emits bit b of word w at column j = b*WBLK + w (a
lane-aligned concatenate; Mosaic cannot reshape a (V, W, 32) unpack), so
kernel column j maps to position (j//NBLK)*NBLK + 32*(r%WBLK) + r//WBLK,
r = j%NBLK — decoded arithmetically when building the top-k key.

reference: src/core/searchcore.cpp:260-340 (search_topscores),
src/arch/x86_64/SSSE3/increment_counters.cpp (the SIMD counter kernel this
replaces at chip scale).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from vsearch_tpu import configure_jax as _cfg
_cfg()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# kernel geometry: NBLK positions (NBLK/32 packed words, lane-aligned at
# 128) per grid step along positions; VBLK vocabulary rows per grid step
NBLK = 4096
WBLK = NBLK // 32
VBLK_MAX = 2048

# packed top-k key: count<<17 | (2^17-1-pos); exact iff count < 2^14
DENSE_MAXK_LIMIT = 16383
POS_BITS = 17


def dense_supported(hashsize: int, block_pos: int) -> bool:
    """Dense path eligibility for an index geometry.  The per-chunk
    packed-key/fallback choice (maxk vs DENSE_MAXK_LIMIT) happens at
    dispatch time; this gates only what is static per index."""
    # the kernel uses Mosaic (TPU-only) primitives — gate on an actual TPU
    # backend, not merely "not cpu" (a GPU backend must take the scan path)
    return (hashsize <= 1 << 18 and block_pos <= 1 << POS_BITS
            and jax.default_backend() == "tpu")


def _kernel(vblk: int, n_v: int, pack: bool):
    """Counts tile kernel; when ``pack`` the last vocab step folds the
    counts into the top-k key (count<<17 | (2^17-1-pos), -1 on padding
    columns) in-place, saving an HBM round-trip of the counts matrix.
    n_real arrives as an SMEM scalar so mesh shards (whose real position
    count is shard-dependent) reuse one compiled kernel."""
    def kernel(nreal_ref, K_ref, bits_ref, out_ref):
        i_n = pl.program_id(0)
        i_v = pl.program_id(1)
        rows = pltpu.bitcast(bits_ref[:], jnp.int32)     # (VBLK, WBLK)
        parts = [((rows >> b) & 1).astype(jnp.int8) for b in range(32)]
        unp = jnp.concatenate(parts, axis=1)             # (VBLK, NBLK)
        acc = jax.lax.dot(K_ref[:], unp, preferred_element_type=jnp.int32)

        @pl.when(i_v == 0)
        def _():
            out_ref[:] = acc

        @pl.when(i_v > 0)
        def _():
            out_ref[:] = out_ref[:] + acc

        if pack:
            @pl.when(i_v == n_v - 1)
            def _():
                qp, nblk = out_ref.shape
                j = jax.lax.broadcasted_iota(jnp.int32, (qp, nblk), 1)
                pos = (i_n * NBLK + 32 * (j % WBLK) + j // WBLK)
                key = out_ref[:] * (1 << POS_BITS) \
                    + ((1 << POS_BITS) - 1 - pos)
                out_ref[:] = jnp.where(pos < nreal_ref[0, 0], key, -1)
    return kernel


@functools.lru_cache(maxsize=32)
def dense_topk_kernel(hashsize: int, words: int, qp: int, k: int,
                      interpret: bool = False,
                      packed_keys: bool = True):
    """counts + exact top-k for one index block.

    Takes (Kbits (qp, hashsize/32) uint32, bits (hashsize, words) uint32,
    n_real () int32 — the count of occupied positions, traced so mesh
    shards share one compile); returns (counts (qp, k) int32, positions
    (qp, k) int32) in reference heap order; invalid rows carry count -1 /
    position 2^30 (the contract ops/score.py's merge and host cut
    consume)."""
    V = hashsize
    qw = (V + 31) // 32
    n_cols = words * 32
    assert n_cols % NBLK == 0, "dense geometry requires cols %% %d" % NBLK
    vblk = min(VBLK_MAX, V)
    n_v = V // vblk
    grid = (n_cols // NBLK, n_v)

    def counts_or_keys(Kbits, bits, n_real, pack: bool):
        s = jnp.arange(32, dtype=jnp.int32)
        u = ((Kbits.view(jnp.int32)[:, :, None] >> s) & 1).astype(jnp.int8)
        K8 = u.reshape(qp, qw * 32)[:, :V]
        nr = jnp.asarray(n_real, jnp.int32).reshape(1, 1)
        return pl.pallas_call(
            _kernel(vblk, n_v, pack),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((qp, vblk), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((vblk, WBLK), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((qp, NBLK), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((qp, n_cols), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(nr, K8, bits)

    def run(Kbits, bits, n_real):
        if not packed_keys:
            # counts may exceed the packed-key budget (queries longer than
            # the amplicon regime): permute columns back to position order
            # and run the direct top-k, whose index tie-break (lowest
            # column first) then IS the reference heap order
            counts = counts_or_keys(Kbits, bits, n_real, pack=False)
            jc = np.arange(n_cols)
            rc = jc % NBLK
            pos_of_col = (jc // NBLK) * NBLK + 32 * (rc % WBLK) + rc // WBLK
            col_of_pos = np.empty_like(pos_of_col)
            col_of_pos[pos_of_col] = jc
            counts_pos = counts[:, jnp.asarray(col_of_pos)]
            colp = jax.lax.broadcasted_iota(jnp.int32, (qp, n_cols), 1)
            counts_pos = jnp.where(
                colp < jnp.asarray(n_real, jnp.int32), counts_pos, -1)
            vals, idx = jax.lax.top_k(counts_pos, k)
            return vals, jnp.where(vals >= 0, idx.astype(jnp.int32),
                                   jnp.int32(2**30))

        key = counts_or_keys(Kbits, bits, n_real, pack=True)
        # exact pruned top-k: a group whose max exceeds the k-th largest
        # key necessarily CONTAINS a top-k key, and top-k keys occupy at
        # most k distinct groups — so the k groups with the largest maxima
        # cover every top-k element (keys are distinct, so the selection
        # is THE top-k, not a tie-dependent one)
        G = 256
        ng = n_cols // G
        if ng > k:
            kg = key.reshape(qp, ng, G)
            gmax = kg.max(axis=2)                        # (qp, ng)
            _, gidx = jax.lax.top_k(gmax, k)             # (qp, k)
            cand = jnp.take_along_axis(kg, gidx[:, :, None],
                                       axis=1)           # (qp, k, G)
            v2, _ = jax.lax.top_k(cand.reshape(qp, k * G), k)
        else:
            v2, _ = jax.lax.top_k(key, k)
        cnt = jnp.where(v2 >= 0,
                        jax.lax.shift_right_logical(v2, POS_BITS),
                        -1)
        p = jnp.where(v2 >= 0,
                      ((1 << POS_BITS) - 1) - (v2 & ((1 << POS_BITS) - 1)),
                      jnp.int32(2**30))
        return cnt, p

    return jax.jit(run)


def _kernel_ranked(n_v: int):
    """Counts tile kernel for GROWING indexes: the last vocab step folds
    counts into the rank-composite key

        key = counts << RANK_BITS | (RANK_MAX - rank_perm[col])

    (ops/score_grow.py's total order: count desc, then heap rank asc —
    rank encodes the reference min-heap's (length asc, seqno asc) for any
    position insertion order, minheap.cpp:111-146).  rank_perm arrives
    already permuted into kernel column order, so no in-kernel position
    arithmetic is needed; unoccupied columns carry rank >= RANK_MAX and
    are masked to -1."""
    from .score_grow import RANK_BITS, RANK_MAX

    def kernel(K_ref, bits_ref, rank_ref, out_ref):
        i_v = pl.program_id(1)
        rows = pltpu.bitcast(bits_ref[:], jnp.int32)     # (VBLK, WBLK)
        parts = [((rows >> b) & 1).astype(jnp.int8) for b in range(32)]
        unp = jnp.concatenate(parts, axis=1)             # (VBLK, NBLK)
        acc = jax.lax.dot(K_ref[:], unp, preferred_element_type=jnp.int32)

        @pl.when(i_v == 0)
        def _():
            out_ref[:] = acc

        @pl.when(i_v > 0)
        def _():
            out_ref[:] = out_ref[:] + acc

        @pl.when(i_v == n_v - 1)
        def _():
            r = rank_ref[:]                              # (1, NBLK)
            key = out_ref[:] * (1 << RANK_BITS) + (RANK_MAX - r)
            out_ref[:] = jnp.where(r < RANK_MAX, key, -1)
    return kernel


@functools.lru_cache(maxsize=32)
def dense_topk_ranked_kernel(hashsize: int, words: int, qp: int, k: int,
                             interpret: bool = False):
    """Dense MXU counts + exact rank-keyed top-k for a growing index.

    Takes (Kbits (qp, hashsize/32) uint32 packed one-hot query rows,
    bits (hashsize+1, words) uint32 — the growing incidence matrix, its
    sentinel row is never read — and rank_perm (n_cols,) int32, the heap
    rank vector permuted into kernel column order by
    score_grow.GrowingDeviceKmerIndex._rank_perm).  Returns (counts
    (qp, k) int32, positions (qp, k) int32) in reference heap order with
    count -1 / position 2^30 sentinels, the same contract as
    score_grow._topk_ranked_kernel — but ~5x cheaper per round on the
    MXU than that kernel's per-kmer row gathers (measured 52 ms -> 10 ms
    per 512-query round at 40960 positions on v5e).

    reference: src/core/searchcore.cpp:260-340 feeding the growing-index
    engines (cluster.cpp:877-1030, chimera.cpp:2018-2071)."""
    from .score_grow import RANK_BITS
    V = hashsize
    qw = (V + 31) // 32
    n_cols = words * 32
    assert n_cols % NBLK == 0, "dense geometry requires cols %% %d" % NBLK
    vblk = min(VBLK_MAX, V)
    n_v = V // vblk
    grid = (n_cols // NBLK, n_v)

    @jax.jit
    def run(Kbits, bits, rank_perm):
        s = jnp.arange(32, dtype=jnp.int32)
        u = ((Kbits.view(jnp.int32)[:, :, None] >> s) & 1).astype(jnp.int8)
        K8 = u.reshape(qp, qw * 32)[:, :V]
        key = pl.pallas_call(
            _kernel_ranked(n_v),
            grid=grid,
            in_specs=[
                pl.BlockSpec((qp, vblk), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((vblk, WBLK), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NBLK), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((qp, NBLK), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((qp, n_cols), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(K8, bits, rank_perm.reshape(1, n_cols))
        # exact pruned top-k (same argument as dense_topk_kernel: keys
        # are distinct, so the k groups with the largest maxima contain
        # exactly the top-k keys)
        G = 256
        ng = n_cols // G
        if ng > k and n_cols % G == 0:
            kg = key.reshape(qp, ng, G)
            gmax = kg.max(axis=2)
            _, gidx = jax.lax.top_k(gmax, k)
            cand = jnp.take_along_axis(kg, gidx[:, :, None], axis=1)
            v2, ci = jax.lax.top_k(cand.reshape(qp, k * G), k)
            idx = jnp.take_along_axis(gidx, ci // G, axis=1) * G + ci % G
        else:
            v2, idx = jax.lax.top_k(key, k)
        cnt = jnp.where(v2 >= 0,
                        jax.lax.shift_right_logical(v2, RANK_BITS), -1)
        # kernel column -> true position (the in-kernel unpack emits bit
        # b of word w at column b*WBLK + w within each NBLK block)
        r = idx % NBLK
        pos = (idx // NBLK) * NBLK + 32 * (r % WBLK) + r // WBLK
        pos = jnp.where(v2 >= 0, pos.astype(jnp.int32), jnp.int32(2**30))
        return cnt, pos

    return run


@functools.lru_cache(maxsize=32)
def dense_topk_multi(hashsize: int, words: tuple, qp: int, k: int,
                     bases: tuple, packed_keys: bool = True,
                     interpret: bool = False):
    """Fused per-index dispatch: every block's counts+top-k plus the exact
    k-way merge run as ONE jitted call instead of len(blocks)+1 separate
    dispatches.  On a tunneled attachment each dispatch pays its own
    enqueue overhead, so an 8-block (1M-position) index spent more host
    wall on call plumbing than on all the host work it launched; the fused
    form cuts the per-chunk call count from 9 to 1 with identical results
    (the merge math is _merge_blocks': counts desc, global position asc).
    """
    nb = len(bases)
    # jit-of-jit inlines: each per-block body traces once inside this call
    # (words can differ on the final, partial block).  k is clamped per
    # block to its column count: k = min(tophits, n) can exceed a single
    # block's 131072 positions (e.g. --maxaccepts 0 on a >131072-seq DB),
    # and lax.top_k(key, k) with k > n_cols is a trace-time error.  The
    # sentinel merge below tolerates blocks returning fewer than k rows
    # (total columns across blocks is always >= n >= k).
    ks = [min(k, w * 32) for w in words]
    ones = [dense_topk_kernel(hashsize, w, qp, kb, packed_keys=packed_keys,
                              interpret=interpret)
            for w, kb in zip(words, ks)]

    @jax.jit
    def run(Kbits, bits_list, n_reals):
        outs = [f(Kbits, b, nr)
                for f, b, nr in zip(ones, bits_list, n_reals)]
        if nb == 1:
            return outs[0]
        vals = jnp.concatenate([v for v, _ in outs], axis=1)   # (qp, nb*k)
        gidx = jnp.concatenate(
            [i + jnp.int32(b) for (_, i), b in zip(outs, bases)], axis=1)
        gidx = jnp.where(vals < 0, jnp.int32(2**30), gidx)
        neg = -vals
        sneg, sidx = jax.lax.sort((neg, gidx), num_keys=2)
        return -sneg[:, :k], sidx[:, :k]

    return run


def pack_query_bits(query_kmer_lists: List[np.ndarray], qp: int,
                    hashsize: int) -> Optional[np.ndarray]:
    """(qp, hashsize/32) uint32 one-hot bit rows (native tier; None if the
    native library is unavailable — callers fall back to the scan path)."""
    from .. import native
    qw = (hashsize + 31) // 32
    n = len(query_kmer_lists)
    if n == 0:
        return np.zeros((qp, qw), dtype=np.uint32)
    starts = np.zeros(n + 1, dtype=np.int64)
    starts[1:] = np.cumsum([kl.size for kl in query_kmer_lists])
    allk = np.ascontiguousarray(
        np.concatenate(query_kmer_lists) if starts[-1]
        else np.zeros(0, np.uint32), dtype=np.uint32)
    out = native.pack_query_bits(allk, starts, n, qw)
    if out is None:
        # numpy fallback (row-chunked bitwise_or.at)
        out = np.zeros((n, qw), dtype=np.uint32)
        for q, kl in enumerate(query_kmer_lists):
            np.bitwise_or.at(out[q], (kl >> 5).astype(np.int64),
                             np.uint32(1) << (kl & 31).astype(np.uint32))
    if n < qp:
        out = np.vstack([out, np.zeros((qp - n, qw), dtype=np.uint32)])
    return out
