"""Device pipeline for all-vs-all global alignment (allpairs_global).

TPU-first redesign of reference src/commands/allpairs_global.cpp:340-520:
instead of aligning pairs thread-by-thread and post-processing every hit on
the host, the N sequence codes are uploaded ONCE, the triangular pair
schedule streams through the device as (qpos, tpos) index batches, and the
kernel computes forward DP + a STATS BACKTRACK on device.  Only ~10 int32
per pair cross the link; the accept/reject cascade and identity math then
run vectorized on host, and full CIGARs are recomputed only for the (rare)
accepted hits.

The stats come out of the RLE backtrack walk itself: the row-scan forward
(ops/nw_pallas2.py, with_matches=True) records, per cell, the diagonal
run-length nibble AND the IUPAC match count within that exact run chunk,
so the backtrack accumulates aligned/matches/indels/gap-opens and the
first/last run (op, length) with zero extra gathers — the expansion-based
alternative (per-column gathers) measured ~60x slower on TPU.

Statistics semantics reproduce backtrack16's counting exactly
(align_simd.cpp:1132-1235) including the --n_mismatch N-rule; the
first/last runs feed align_trim (searchcore.cpp:343-464) on host.
"""

from __future__ import annotations

import functools

import numpy as np

from vsearch_tpu import configure_jax as _cfg
_cfg()
import jax
import jax.numpy as jnp

from .nw import DIR_EXTLEFT, DIR_EXTUP, DIR_LEFT, DIR_UP
from .nw_jax import OP_D, OP_I, OP_M, encode_padded


def encode_rowT_all(codes: np.ndarray, mismatch: int, n_mismatch: bool):
    """Per-sequence (n, W) qm/am code planes for the row-scan wire
    (the untransposed form of nw_jax.encode_rowT — rows are gathered and
    transposed on device per pair batch)."""
    amb = np.ones(16, dtype=bool)
    amb[[1, 2, 4, 8]] = False
    qm_lut = np.arange(16, dtype=np.int8)
    qm_lut[amb] = -1
    am_lut = np.full(16, mismatch, dtype=np.int8)
    am_lut[amb] = 0
    if n_mismatch:
        qm_lut[15] = -2
        am_lut[15] = mismatch
    return qm_lut[codes], am_lut[codes]


@functools.lru_cache(maxsize=16)
def build_allpairs_forward(scheme_key: tuple, W: int, Bp: int):
    """jitted (qpos, tpos, qm_all, am_all, raw_all, lens) ->
    (score (B,), overflow (B,), dirs (W, W, B) u8, mr (W, W, B) u8,
    qlen (B,), tlen (B,))."""
    import os
    if os.environ.get("VSEARCH_TPU_NW_NORL", "0") == "1":
        raise RuntimeError("stats kernel requires the RLE dir nibble")
    from .nw_pallas2 import build_forward2
    forward = build_forward2(scheme_key, W, W, Bp, with_matches=True)

    def run(qpos, tpos, qm_all, am_all, raw_all, lens):
        qp = jnp.clip(qpos, 0, raw_all.shape[0] - 1)
        tp = jnp.clip(tpos, 0, raw_all.shape[0] - 1)
        qlen = lens[qp]
        tlen = lens[tp]
        score, overflow, dirs, mr = forward(
            qm_all[qp].T, am_all[qp].T, raw_all[qp].T, qlen,
            raw_all[tp].T, tlen)
        return score, overflow, dirs, mr, qlen, tlen

    return jax.jit(run)


@functools.lru_cache(maxsize=16)
def build_allpairs_stats(W: int, nb: int, Bp: int):
    """jitted stats backtrack over ``nb`` forward batches AT ONCE:
    (dirs tuple, mr tuple, qlen tuple, tlen tuple) -> (nb*Bp, 8) int32.

    The per-step cost of the walk is dominated by the per-lane dynamic
    gather, whose cost grows far slower than its lane count (measured
    ~102 us/step at 1024 lanes vs ~133 us at 4096 on v5e) — so walking
    four batches' direction planes in one while_loop costs ~3x less per
    pair than four separate walks.

    stats columns: aligned, matches, indels, gap_opens, first_op,
    first_len, last_op, last_len (forward-order runs, merged across
    split RLE entries)."""
    S = 2 * W

    def backtrack_stats(dirs_t, mr_t, qlen_t, tlen_t):
        """RLE walk (nw_jax.backtrack_rle structure) accumulating the
        alignment statistics instead of materializing ops."""
        Mr, Npr = dirs_t[0].shape[0], dirs_t[0].shape[1]
        dirs = jnp.concatenate(dirs_t, axis=2) if nb > 1 else dirs_t[0]
        mr = jnp.concatenate(mr_t, axis=2) if nb > 1 else mr_t[0]
        qlen = jnp.concatenate(qlen_t) if nb > 1 else qlen_t[0]
        tlen = jnp.concatenate(tlen_t) if nb > 1 else tlen_t[0]
        B = nb * Bp
        dirs2 = dirs.reshape(Mr * Npr, B)
        mr2 = mr.reshape(Mr * Npr, B)
        z = jnp.zeros(B, dtype=jnp.int32)

        def cond(state):
            t = state[0]
            i, j = state[1], state[2]
            return (t < S) & jnp.any((i >= 0) | (j >= 0))

        def body(state):
            (t, i, j, prev, aligned, matches, indels, gap_opens,
             cur_op, cur_len, last_op, last_len, last_still) = state
            both = (i >= 0) & (j >= 0)
            idx = (jnp.clip(i, 0, Mr - 1) * Npr
                   + jnp.clip(j, 0, Npr - 1))
            byte = jnp.take_along_axis(
                dirs2, idx[None, :], axis=0)[0].astype(jnp.int32)
            rl = (byte >> 4) & 0xFFF
            extleft = (byte & DIR_EXTLEFT) != 0
            extup = (byte & DIR_EXTUP) != 0
            left = (byte & DIR_LEFT) != 0
            up = (byte & DIR_UP) != 0
            op_main = jnp.where(
                (prev == OP_I) & extleft, OP_I,
                jnp.where((prev == OP_D) & extup, OP_D,
                          jnp.where(left, OP_I,
                                    jnp.where(up, OP_D, OP_M))))
            cnt_main = jnp.where(op_main == OP_M, jnp.maximum(rl, 1), 1)
            active = (i >= 0) | (j >= 0)
            op_drain = jnp.where(i >= 0, OP_D, OP_I)
            cnt_drain = jnp.minimum(jnp.where(i >= 0, i, j) + 1, 4095)
            op = jnp.where(both, op_main,
                           jnp.where(active, op_drain, 0))
            cnt = jnp.where(both, cnt_main,
                            jnp.where(active, cnt_drain, 0))
            di = jnp.where((op == OP_D) | (op == OP_M), cnt, 0)
            dj = jnp.where((op == OP_I) | (op == OP_M), cnt, 0)

            m_run = jnp.take_along_axis(
                mr2, idx[None, :], axis=0)[0].astype(jnp.int32)
            aligned = aligned + cnt
            matches = matches + jnp.where(both & (op == OP_M), m_run, 0)
            is_gap = (op == OP_D) | (op == OP_I)
            indels = indels + jnp.where(is_gap, cnt, 0)
            gap_opens = gap_opens + (active & is_gap
                                     & (op != prev)).astype(jnp.int32)

            # head run (alignment start): merge-accumulate; whatever run
            # is current when a lane finishes is its first run
            same = active & (op == cur_op)
            cur_len = jnp.where(same, cur_len + cnt,
                                jnp.where(active, cnt, cur_len))
            cur_op = jnp.where(active, op, cur_op)
            # tail run (alignment end): frozen once op changes
            newly = active & (t == 0)
            last_op = jnp.where(newly, op, last_op)
            cont = active & last_still & (op == last_op)
            last_len = last_len + jnp.where(cont, cnt, 0)
            last_still = last_still & (jnp.logical_not(active) | cont)

            prev = jnp.where(active, op, prev)
            return (t + 1, i - di, j - dj, prev, aligned, matches,
                    indels, gap_opens, cur_op, cur_len, last_op,
                    last_len, last_still)

        state = (jnp.int32(0), qlen - 1, tlen - 1, z, z, z, z, z,
                 z, z, z, z, jnp.ones(B, dtype=bool))
        out = jax.lax.while_loop(cond, body, state)
        (_, _, _, _, aligned, matches, indels, gap_opens,
         cur_op, cur_len, last_op, last_len, _) = out
        return jnp.stack([aligned, matches, indels, gap_opens,
                          cur_op, cur_len, last_op, last_len], axis=1)

    return jax.jit(backtrack_stats)


class AllPairsDevice:
    """Holds the device-resident code planes + streams pair batches.

    Forward DP runs per PAIR_BATCH; the stats backtrack runs once per
    STATS_GROUP forwards over their concatenated direction planes (the
    per-lane gather that dominates the walk costs ~the same at 4096
    lanes as at 1024, so grouping is ~3x cheaper per pair)."""

    PAIR_BATCH = 1024
    # HBM budget for live direction/match planes across a stats group:
    # a group of g batches keeps g x 2 planes of W*W*PB u8 live AND the
    # grouped walk's jnp.concatenate materializes another copy inside the
    # jit, so peak ~= 4*g*W^2*PB bytes.  W is the exact max sequence
    # length (unbounded), so the group width must scale down with W or
    # long-sequence runs that fit at group=1 OOM at group=4.
    STATS_PLANE_BUDGET = int(4e9)

    def __init__(self, scheme, seqs) -> None:
        self.scheme = scheme
        self._key = (scheme.match, scheme.mismatch, scheme.go_q_left,
                     scheme.go_t_left, scheme.go_q_int, scheme.go_t_int,
                     scheme.go_q_right, scheme.go_t_right,
                     scheme.ge_q_left, scheme.ge_t_left, scheme.ge_q_int,
                     scheme.ge_t_int, scheme.ge_q_right, scheme.ge_t_right,
                     scheme.n_mismatch)
        n = len(seqs)
        maxlen = max((len(s) for s in seqs), default=1)
        # exact padded width: this engine compiles ONE kernel per run
        # geometry anyway (the shared bucket ladder exists to share
        # compiles across differently-shaped dispatches, which never
        # happens here), and the amplicon regime pays dearly for bucket
        # padding — L=400 bucketed to 512 wastes 1.64x of every DP cell
        W = max((max(maxlen, 1) + 7) // 8 * 8, 16)
        if W % 8 != 0 or self.PAIR_BATCH % 128 != 0:
            raise RuntimeError("geometry unsupported")
        self.W = W
        codes = encode_padded(seqs, n, self.W)
        qm, am = encode_rowT_all(codes, scheme.mismatch, scheme.n_mismatch)
        lens = np.fromiter((max(len(s), 1) for s in seqs), dtype=np.int32,
                           count=n)
        self.raw_all = jnp.asarray(codes)
        self.qm_all = jnp.asarray(qm)
        self.am_all = jnp.asarray(am)
        self.lens = jnp.asarray(lens)
        self.forward = build_allpairs_forward(self._key, self.W,
                                              self.PAIR_BATCH)
        # bytes/cell across a live group: u16 dirs (2) + u8 mr (1), doubled
        # for the grouped walk's concatenated copy
        self.stats_group = max(1, min(4, self.STATS_PLANE_BUDGET
                                      // (6 * W * W * self.PAIR_BATCH)))
        self._group: list = []       # pending forward handles
        self._stats_out: list = []   # (stats handle, first batch index)
        self._nbatches = 0

    def dispatch(self, qpos: np.ndarray, tpos: np.ndarray):
        """Launch one (<= PAIR_BATCH) index-pair batch; returns device
        handles (score (PB,), overflow (PB,)).  The per-batch stats land
        in grouped backtrack dispatches — call stats_flush() after the
        last dispatch and read stats_results() after fetching."""
        B = len(qpos)
        qp = np.zeros(self.PAIR_BATCH, dtype=np.int32)
        tp = np.zeros(self.PAIR_BATCH, dtype=np.int32)
        qp[:B] = qpos
        tp[:B] = tpos
        score, overflow, dirs, mr, qlen, tlen = self.forward(
            jnp.asarray(qp), jnp.asarray(tp), self.qm_all,
            self.am_all, self.raw_all, self.lens)
        self._group.append((dirs, mr, qlen, tlen))
        self._nbatches += 1
        if len(self._group) == self.stats_group:
            self._stats_dispatch()
        return score, overflow

    def _stats_dispatch(self) -> None:
        group = self._group
        real = len(group)
        if not real:
            return
        # pad a short tail group by repeating its last batch: one stats
        # compile geometry for the whole run, the duplicate lanes are
        # simply never read back
        while len(group) < self.stats_group and self._stats_out:
            group.append(group[-1])
        nb = len(group)
        kern = build_allpairs_stats(self.W, nb, self.PAIR_BATCH)
        stats = kern(tuple(d for d, _, _, _ in group),
                     tuple(m for _, m, _, _ in group),
                     tuple(q for _, _, q, _ in group),
                     tuple(t for _, _, _, t in group))
        try:
            stats.copy_to_host_async()
        except Exception:
            pass
        first = self._nbatches - real
        self._stats_out.append((stats, first, real))
        # drop the direction-plane references so HBM frees as the walk
        # consumes them (each plane is W*W*PB bytes)
        self._group = []

    def stats_flush(self) -> None:
        """Dispatch the stats walk for any pending tail group."""
        self._stats_dispatch()

    def stats_handles(self):
        return [h for h, _, _ in self._stats_out]

    def stats_results(self, fetched) -> list:
        """Per-batch (PB, 8) stats arrays from the fetched grouped
        results (parallel to stats_handles())."""
        out = [None] * self._nbatches
        PB = self.PAIR_BATCH
        for arr, (_, first, real) in zip(fetched, self._stats_out):
            arr = np.asarray(arr)
            for k in range(real):
                out[first + k] = arr[k * PB:(k + 1) * PB]
        return out
