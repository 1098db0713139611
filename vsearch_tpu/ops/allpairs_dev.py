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
from .nw_jax import OP_D, OP_I, OP_M, _bucket, encode_padded


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
def build_allpairs_kernel(scheme_key: tuple, W: int, Bp: int):
    """jitted (qpos, tpos, qm_all, am_all, raw_all, lens) ->
    (score (B,), overflow (B,), stats (B, 8) int32).

    stats columns: aligned, matches, indels, gap_opens, first_op,
    first_len, last_op, last_len (forward-order runs, merged across
    split RLE entries)."""
    import os
    if os.environ.get("VSEARCH_TPU_NW_NORL", "0") == "1":
        raise RuntimeError("stats kernel requires the RLE dir nibble")
    from .nw_pallas2 import build_forward2
    forward = build_forward2(scheme_key, W, W, Bp, with_matches=True)
    S = 2 * W

    def backtrack_stats(dirs, mr, qlen, tlen):
        """RLE walk (nw_jax.backtrack_rle structure) accumulating the
        alignment statistics instead of materializing ops."""
        B = qlen.shape[0]
        Mr, Npr = dirs.shape[0], dirs.shape[1]
        dirs_flat = dirs.reshape(Mr * Npr * B)
        mr_flat = mr.reshape(Mr * Npr * B)
        brange = jnp.arange(B, dtype=jnp.int32)
        z = jnp.zeros(B, dtype=jnp.int32)

        def cond(state):
            t = state[0]
            i, j = state[1], state[2]
            return (t < S) & jnp.any((i >= 0) | (j >= 0))

        def body(state):
            (t, i, j, prev, aligned, matches, indels, gap_opens,
             cur_op, cur_len, last_op, last_len, last_still) = state
            both = (i >= 0) & (j >= 0)
            idx = ((jnp.clip(i, 0, Mr - 1) * Npr
                    + jnp.clip(j, 0, Npr - 1)) * B + brange)
            byte = dirs_flat[idx].astype(jnp.int32)
            rl = (byte >> 4) & 15
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
            cnt_drain = jnp.minimum(jnp.where(i >= 0, i, j) + 1, 31)
            op = jnp.where(both, op_main,
                           jnp.where(active, op_drain, 0))
            cnt = jnp.where(both, cnt_main,
                            jnp.where(active, cnt_drain, 0))
            di = jnp.where((op == OP_D) | (op == OP_M), cnt, 0)
            dj = jnp.where((op == OP_I) | (op == OP_M), cnt, 0)

            m_run = mr_flat[idx].astype(jnp.int32)
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

    def run(qpos, tpos, qm_all, am_all, raw_all, lens):
        qp = jnp.clip(qpos, 0, raw_all.shape[0] - 1)
        tp = jnp.clip(tpos, 0, raw_all.shape[0] - 1)
        qlen = lens[qp]
        tlen = lens[tp]
        score, overflow, dirs, mr = forward(
            qm_all[qp].T, am_all[qp].T, raw_all[qp].T, qlen,
            raw_all[tp].T, tlen)
        stats = backtrack_stats(dirs, mr, qlen, tlen)
        return score, overflow, stats

    return jax.jit(run)


class AllPairsDevice:
    """Holds the device-resident code planes + streams pair batches."""

    PAIR_BATCH = 1024

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
        W = _bucket(max(maxlen, 1))
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
        self.kernel = build_allpairs_kernel(self._key, self.W,
                                            self.PAIR_BATCH)

    def dispatch(self, qpos: np.ndarray, tpos: np.ndarray):
        """Launch one (<= PAIR_BATCH) index-pair batch; returns device
        handles (score, overflow, stats) padded to PAIR_BATCH rows."""
        B = len(qpos)
        qp = np.zeros(self.PAIR_BATCH, dtype=np.int32)
        tp = np.zeros(self.PAIR_BATCH, dtype=np.int32)
        qp[:B] = qpos
        tp[:B] = tpos
        return self.kernel(jnp.asarray(qp), jnp.asarray(tp), self.qm_all,
                           self.am_all, self.raw_all, self.lens)
