"""Batched Needleman-Wunsch on device: anti-diagonal wavefront in XLA.

TPU-first reformulation of the reference's 8-channel SIMD DP
(src/core/align_simd.cpp): instead of 8 alignments per 128-bit vector, a
whole batch of query x target pairs advances one anti-diagonal per scan
step, with every per-cell update an elementwise op over a (batch, M) tile —
mapping onto the VPU's (8, 128) lanes.  Per-diagonal direction bits stay on
device; the backtrack is a second lockstep scan across the batch, so only
the op strings (O(m+n) per pair) ever reach the host.

Semantics are bit-identical to the reference engine (same recurrence,
direction-bit priorities, boundary classes, and 16-bit overflow detection
thresholds) — validated against ops/nw.py's scalar oracle and the reference
binary's outputs.

Precision: cells are int32 — exact for every pair the 16-bit reference
engine accepts; the overflow *flags* replicate the reference's h_min/h_max
detection (align_simd.cpp:2029-2040) so sentinel/fallback behavior matches.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from vsearch_tpu import configure_jax as _cfg
_cfg()
import jax
import jax.numpy as jnp

from ..utils.maps import CHRMAP_4BIT
from .nw import (AlignmentResult, DIR_EXTLEFT, DIR_EXTUP, DIR_LEFT, DIR_UP,
                 SHRT_MAX, ScoreScheme, ops_to_cigar)

# op codes emitted by the device backtrack
OP_NONE, OP_M, OP_D, OP_I = 0, 1, 2, 3

# speculative-prefetch ops rows kept after device-side truncation (see
# _compact_gather_kernel); lanes needing more entries fall back to the
# host aligner
PREFETCH_OPS_CAP = int(os.environ.get("VSEARCH_TPU_PREFETCH_OPS_CAP",
                                      "256"))

NEG_LARGE = jnp.int32(-(2**30))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def encode_padded(seqs: Sequence[bytes], rows: int, width: int) -> np.ndarray:
    """(rows, width) int8 matrix of 4-bit codes, zero padded."""
    out = np.zeros((rows, width), dtype=np.int8)
    if not seqs:
        return out
    lens = np.fromiter((len(s) for s in seqs), dtype=np.int64,
                       count=len(seqs))
    flat = np.frombuffer(b"".join(seqs), dtype=np.uint8)
    mask = np.arange(width)[None, :] < lens[:, None]
    padded_mask = np.zeros((rows, width), dtype=bool)
    padded_mask[:len(seqs)] = mask
    out[padded_mask] = CHRMAP_4BIT[flat].astype(np.int8)
    return out


def encode_rowT(qseqs: Sequence[bytes], rows: int, width: int,
                mismatch: int, n_mismatch: bool):
    """Host-side wire prep for the row-scan kernel (nw_pallas2): returns
    (qmT, amT) — (width, rows) int8, transposed, with the ambiguity/N
    remap folded in by LUT so the device does no per-batch preprocessing.

    qm: the 4-bit code, or -1 for ambiguous codes (never equal to any
    target code => substitution falls through to am), or -2 for N under
    n_mismatch.  am: the mismatch score, or 0 for ambiguous codes
    (reference score-matrix semantics, align_simd.cpp:1319-1342)."""
    codes = encode_padded(qseqs, rows, width)
    amb = np.ones(16, dtype=bool)
    amb[[1, 2, 4, 8]] = False
    qm_lut = np.arange(16, dtype=np.int8)
    qm_lut[amb] = -1
    am_lut = np.full(16, mismatch, dtype=np.int8)
    am_lut[amb] = 0
    if n_mismatch:
        qm_lut[15] = -2
        am_lut[15] = mismatch
    return (np.ascontiguousarray(qm_lut[codes].T),
            np.ascontiguousarray(am_lut[codes].T))


def _bucket(x: int, base: int = 64) -> int:
    """Shape bucket: powers of two with midpoints (1.5x ladder; from 512
    up also the 1.25x quarter-point).  DP cost is quadratic in the
    bucket, so at amplicon sizes the finer rung matters: L=600 pads to
    640 (1.14x cells) instead of 768 (1.64x) — while the ladder stays
    small enough that compiles amortize."""
    if x <= base:
        return base
    b = base
    while b < x:
        if b >= 512 and x <= b + b // 4:
            return b + b // 4
        if x <= b + b // 2:
            return b + b // 2
        b *= 2
    return b


def _pallas_tile(Bp: int, M: int) -> int:
    """Pair-tile size for the Pallas forward: largest divisor of Bp that
    keeps the VMEM working set (~9 int32 arrays of TB x M plus two
    TB x (M+N) target windows) inside the ~100 MB v5e budget."""
    limit = max(8, 600_000 // max(M, 1))
    tb = Bp
    while tb > limit and tb % 2 == 0:
        tb //= 2
    return tb


@functools.lru_cache(maxsize=128)
def _build_kernels(scheme_key: tuple, M: int, N: int, Bp: int = 0,
                   raw: bool = False):
    """Compile the forward DP + backtrack for a (scheme, M, N) geometry.

    When Bp > 0 and a TPU backend is available, the forward sweep uses the
    Pallas VMEM-resident kernel (ops/nw_pallas.py); otherwise the XLA scan."""
    (match, mismatch, go_q_l, go_t_l, go_q_i, go_t_i, go_q_r, go_t_r,
     ge_q_l, ge_t_l, ge_q_i, ge_t_i, ge_q_r, ge_t_r, n_mismatch) = scheme_key
    scheme = ScoreScheme(match, mismatch, go_q_l, go_t_l, go_q_i, go_t_i,
                         go_q_r, go_t_r, ge_q_l, ge_t_l, ge_q_i, ge_t_i,
                         ge_q_r, ge_t_r, bool(n_mismatch))
    QR_q_i = go_q_i + ge_q_i
    QR_q_r = go_q_r + ge_q_r
    QR_t_i = go_t_i + ge_t_i
    QR_t_r = go_t_r + ge_t_r
    score_min = scheme.score_min()
    D = M + N - 1
    S = M + N  # max backtrack steps

    ii = jnp.arange(M, dtype=jnp.int32)  # query index per lane

    def forward(q4, qlen, t4, tlen):
        """q4 (B, M) int8/int32 codes, qlen (B,), t4 (B, N), tlen (B,).

        Returns (scores (B,), overflow (B,), dirs (D, B, M) uint8).

        Gather- and slice-free inner loop: the per-diagonal target codes
        live in an (B, M) int8 carry window that slides one column per
        step, fed by a precomputed (D, B) column stream via the scan xs —
        dynamic_slice inside a TPU scan costs ~4.5 us/step, the static
        shift+insert costs none.  Per-lane boundary/penalty-class arrays
        are recomputed from iotas each step instead of re-read from HBM;
        the substitution score is computed arithmetically from code
        equality/ambiguity flags instead of a matrix lookup."""
        q4 = q4.astype(jnp.int8)
        t4 = t4.astype(jnp.int8)
        B = q4.shape[0]
        qlen_c = qlen[:, None]              # (B, 1)
        tlen_c = tlen[:, None]

        # ambiguity arithmetically: codes {1,2,4,8} are unambiguous
        def amb(c):
            return ((c & (c - 1)) != 0) | (c == 0)

        amb_q = amb(q4)
        # reversed, padded target: t4_ext[b, M + N - 1 - j] = t4[b, j]
        # (zero-pad: code 0 is ambiguous, so V=0 in invalid lanes — the
        # dirs there are masked by `valid` anyway)
        t4_ext = jnp.pad(t4[:, ::-1], ((0, 0), (M, M)))
        # per-step column stream: window_d starts at s_d = M+N-1-d and
        # slides left, so step d inserts column s_d at lane 0
        # cols[d] = t4_ext[:, M+N-1-d]  -> (D, B) int8
        cols = t4_ext[:, ::-1][:, M:M + D].T

        zeros = jnp.zeros((B, M), dtype=jnp.int32)
        init = (zeros, zeros, zeros, zeros,
                jnp.zeros(B, dtype=jnp.int32),       # score
                jnp.zeros(B, dtype=jnp.int32),       # hmin
                jnp.zeros(B, dtype=jnp.int32),       # hmax
                t4_ext[:, M + N:M + N + M])          # pre-slide tj window

        def step(carry, xs):
            H1, H2, E_prev, F_prev, score, hmin, hmax, win = carry
            d, newcol = xs
            # slide the target window left by one diagonal
            tj = jnp.concatenate([newcol[:, None], win[:, :M - 1]], axis=1)

            jj = d - ii                       # (M,) target index per lane
            last_q = ii[None, :] == (qlen_c - 1)
            QR_q = jnp.where(last_q, QR_q_r, QR_q_i)
            R_q = jnp.where(last_q, ge_q_r, ge_q_i)
            valid_i = ii[None, :] < qlen_c
            valid = (jj[None, :] >= 0) & (jj[None, :] < tlen_c) & valid_i

            amb_t = amb(tj)
            # score matrix semantics (align_simd.cpp:1319-1342) computed
            # arithmetically
            if n_mismatch:
                either_n = ((q4 == 15) | (tj == 15))
                V = jnp.where(either_n, mismatch,
                              jnp.where(amb_q | amb_t, 0,
                                        jnp.where(q4 == tj, match, mismatch)))
            else:
                V = jnp.where(amb_q | amb_t, 0,
                              jnp.where(q4 == tj, match, mismatch))
            V = V.astype(jnp.int32)

            right_t = jj[None, :] == (tlen_c - 1)
            QR_t = jnp.where(right_t, QR_t_r, QR_t_i).astype(jnp.int32)
            R_t = jnp.where(right_t, ge_t_r, ge_t_i).astype(jnp.int32)

            jb = jj[None, :]
            # boundaries (align_simd.cpp fresh-channel init, :1895-1910,
            # and aligncolumns_first hep adjustments, :850-887)
            top_hm1 = -(go_q_l + (jb + 1) * ge_q_l)          # H[-1][j]
            diag_top = jnp.where(jb == 0, 0, -(go_q_l + jb * ge_q_l))
            left_col = -(go_t_l + (ii[None, :] + 1) * ge_t_l)  # H[i][-1]
            diag_left = -(go_t_l + ii[None, :] * ge_t_l)

            H2s = jnp.pad(H2, ((0, 0), (1, 0)))[:, :M]       # H2[i-1]
            F_ps = jnp.pad(F_prev, ((0, 0), (1, 0)),
                           constant_values=0)[:, :M]          # F_prev[i-1]

            diag_in = jnp.where(ii[None, :] == 0, diag_top,
                                jnp.where(jb == 0, diag_left, H2s))
            E_in = jnp.where(jb == 0, left_col - QR_q, E_prev)
            F_in = jnp.where(ii[None, :] == 0, top_hm1 - QR_t, F_ps)

            h = diag_in + V
            d_up = F_in > h
            h = jnp.maximum(h, F_in)
            d_left = E_in > h
            h = jnp.maximum(h, E_in)

            hmin = jnp.minimum(hmin, jnp.min(jnp.where(valid, h, 0), axis=1))
            hmax = jnp.maximum(hmax, jnp.max(jnp.where(valid, h, 0), axis=1))

            HF = h - QR_t
            Fx = F_in - R_t
            d_extup = Fx > HF
            F_out = jnp.maximum(Fx, HF)
            HE = h - QR_q
            Ex = E_in - R_q
            d_extleft = Ex > HE
            E_out = jnp.maximum(Ex, HE)

            dirs = (d_up.astype(jnp.uint8) * DIR_UP
                    | d_left.astype(jnp.uint8) * DIR_LEFT
                    | d_extup.astype(jnp.uint8) * DIR_EXTUP
                    | d_extleft.astype(jnp.uint8) * DIR_EXTLEFT)
            dirs = jnp.where(valid, dirs, 0)

            # final-cell extraction without a gather: masked row-reduction
            at_end = (d == (qlen_c + tlen_c - 2)) & last_q
            score = score + jnp.sum(jnp.where(at_end, h, 0), axis=1)

            return (h, H1, E_out, F_out, score, hmin, hmax, tj), dirs

        (H1, H2, E, F, score, hmin, hmax, _win), dirs = jax.lax.scan(
            step, init, (jnp.arange(D, dtype=jnp.int32), cols))
        overflow = (hmin <= score_min) | (hmax >= SHRT_MAX)
        return score, overflow, dirs

    def backtrack(dirs, qlen, tlen, row_layout: bool = False):
        """dirs -> ops (S, B) int16 (end-to-front order, flat moves).

        Two direction-buffer layouts: the wavefront forward emits
        (D, B, Ms) diagonal-major (cell (i,j) at [i+j, b, i]); the
        row-scan forward (nw_pallas2) emits (M, Np, B) row-major
        (cell (i,j) at [i, j, b]).  reference: align_simd.cpp
        backtrack16 (:1144-1233)."""
        B = qlen.shape[0]
        if row_layout:
            Mr, Npr = dirs.shape[0], dirs.shape[1]
            dirs_flat = dirs.reshape(Mr * Npr * B)
            brange = jnp.arange(B, dtype=jnp.int32)
        else:
            # lane stride may exceed M (Pallas pads lanes to int8 tiling)
            Ms = dirs.shape[2]
            # flat 1-D gather: a per-step 2-D take_along_axis over the
            # (B, D*Ms) transpose lowers to a gather ~5x slower than
            # indexing the row-major (D, B, Ms) buffer directly
            dirs_flat = dirs.reshape(D * B * Ms)
            brange = jnp.arange(B, dtype=jnp.int32) * Ms

        def step(carry, _):
            i, j, prev = carry
            both = (i >= 0) & (j >= 0)
            if row_layout:
                idx = ((jnp.clip(i, 0, Mr - 1) * Npr
                        + jnp.clip(j, 0, Npr - 1)) * B + brange)
            else:
                idx = (jnp.clip(i + j, 0, D - 1) * (B * Ms) + brange
                       + jnp.clip(i, 0, Ms - 1))
            dword = dirs_flat[idx].astype(jnp.int32)
            extleft = (dword & DIR_EXTLEFT) != 0
            extup = (dword & DIR_EXTUP) != 0
            left = (dword & DIR_LEFT) != 0
            up = (dword & DIR_UP) != 0
            op_main = jnp.where(
                (prev == OP_I) & extleft, OP_I,
                jnp.where((prev == OP_D) & extup, OP_D,
                          jnp.where(left, OP_I,
                                    jnp.where(up, OP_D, OP_M))))
            op_drain = jnp.where(i >= 0, OP_D, OP_I)
            active = (i >= 0) | (j >= 0)
            op = jnp.where(both, op_main,
                           jnp.where(active, op_drain, OP_NONE))
            di = ((op == OP_D) | (op == OP_M)).astype(jnp.int32)
            dj = ((op == OP_I) | (op == OP_M)).astype(jnp.int32)
            return (i - di, j - dj, jnp.where(active, op, prev)), \
                op.astype(jnp.int16)

        init = (qlen - 1, tlen - 1, jnp.zeros(B, dtype=jnp.int32))
        _, ops = jax.lax.scan(step, init, None, length=S)
        return ops

    def backtrack_rle(dirs, qlen, tlen):
        """RLE backtrack over the row-scan forward's fused dir bytes.

        dirs (M, Np, B) uint16 with bits 0-3 the direction flags and bits
        4-15 the M-run length ending at the cell (nw_pallas2, cap RLCAP).
        Each while-loop step consumes a whole diagonal run (or one I/D
        move, or a whole boundary drain), so the number of HBM gathers —
        the backtrack's cost on TPU (~23 ns/element, scalar-loop gather) —
        is ~#runs instead of #moves: >100x fewer for high-identity pairs.

        Returns ops (S, B) int16 in end-to-front order, run-length encoded
        as op | count << 2 (count 1..4095; plain 1..3 values mean count 1
        — the format the host assembler accepts for both kernels)."""
        B = qlen.shape[0]
        Mr, Npr = dirs.shape[0], dirs.shape[1]
        dirs_flat = dirs.reshape(Mr * Npr * B)
        brange = jnp.arange(B, dtype=jnp.int32)

        def cond(state):
            t, i, j, prev, ops = state
            return (t < S) & jnp.any((i >= 0) | (j >= 0))

        def body(state):
            t, i, j, prev, ops = state
            both = (i >= 0) & (j >= 0)
            idx = ((jnp.clip(i, 0, Mr - 1) * Npr
                    + jnp.clip(j, 0, Npr - 1)) * B + brange)
            byte = dirs_flat[idx].astype(jnp.int32)
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
                           jnp.where(active, op_drain, OP_NONE))
            cnt = jnp.where(both, cnt_main,
                            jnp.where(active, cnt_drain, 0))
            di = jnp.where((op == OP_D) | (op == OP_M), cnt, 0)
            dj = jnp.where((op == OP_I) | (op == OP_M), cnt, 0)
            packed = (op | (cnt << 2)).astype(jnp.int16)
            ops = jax.lax.dynamic_update_index_in_dim(ops, packed, t, 0)
            prev = jnp.where(active, op, prev)
            return (t + 1, i - di, j - dj, prev, ops)

        state = (jnp.int32(0), qlen - 1, tlen - 1,
                 jnp.zeros(B, dtype=jnp.int32),
                 jnp.zeros((S, B), dtype=jnp.int16))
        _, _, _, _, ops = jax.lax.while_loop(cond, body, state)
        return ops

    forward_fn = forward
    row_layout = False
    # Kernel ladder on TPU backends (Pallas primitives here are TPU-only —
    # Mosaic; GPU/CPU take the XLA scan):
    #   pallas2 (default): row-scan forward with VMEM carries and a
    #     max-plus prefix for E (ops/nw_pallas2.py) — measured 43 GCUPS-eq
    #     at (1024 pairs, 640x640) on v5e vs 2.8 for the wavefront.
    #   pallas: the r2 anti-diagonal wavefront (ops/nw_pallas.py).
    #   xla: the scan above (also VSEARCH_TPU_PALLAS=0, the r2 kill-switch).
    impl = os.environ.get("VSEARCH_TPU_NW_IMPL", "pallas2")
    if os.environ.get("VSEARCH_TPU_PALLAS", "1") == "0":
        impl = "xla"
    if Bp > 0 and jax.default_backend() == "tpu" and impl != "xla":
        built = False
        if (impl == "pallas2" and Bp % 128 == 0 and M % 8 == 0
                and N % 8 == 0 and -128 <= mismatch <= 127):
            try:
                from .nw_pallas2 import build_forward2
                forward_fn = build_forward2(scheme_key, M, N, Bp)
                row_layout = True
                built = True
            except Exception:
                forward_fn = forward
        if not built and impl in ("pallas", "pallas2"):
            tb = _pallas_tile(Bp, M)
            if tb >= 8 and Bp % tb == 0:
                try:
                    from .nw_pallas import build_forward
                    forward_fn = build_forward(scheme_key, M, N, tb)
                except Exception:
                    forward_fn = forward

    if row_layout:
        def full(qmT, amT, qlen, t4T, tlen):
            # pre-transposed int8 wire format (encode_rowT on host)
            score, overflow, dirs = forward_fn(qmT, amT, qlen, t4T, tlen)
            ops = backtrack_rle(dirs, qlen, tlen)
            return score, overflow, ops
        full.wire = "rowT"
    else:
        def full(q4, qlen, t4, tlen):
            # codes may arrive as int8 (the wire format is 4x narrower
            # than int32 over the tunneled host<->device link)
            score, overflow, dirs = forward_fn(q4.astype(jnp.int32), qlen,
                                               t4.astype(jnp.int32), tlen)
            ops = backtrack(dirs, qlen, tlen)
            return score, overflow, ops

    if Bp == -1:  # profiling hook: split forward/backtrack timings
        return jax.jit(forward), jax.jit(backtrack)
    if Bp == -2 or raw:
        # raw (unjitted) full kernel for composition: shard_map wrapping
        # (Bp=-2, XLA forward) or fusing extra device stages after the
        # backtrack (raw=True keeps the Bp>0 Pallas forward selection)
        return full
    jitted = jax.jit(full)
    try:
        jitted.wire = getattr(full, "wire", None)
    except AttributeError:  # jit wrapper refuses attributes: wrap it
        _inner = jitted

        def jitted(*a):
            return _inner(*a)
        jitted.wire = getattr(full, "wire", None)
    return jitted


@functools.lru_cache(maxsize=64)
def _build_kernels_sharded(scheme_key: tuple, M: int, N: int, Bp: int,
                           n_devices: int):
    """Pair-parallel forward+backtrack over the device mesh: the batch axis
    is sharded, each device runs the wavefront scan + backtrack on its
    Bp/n_devices slice, outputs are re-sharded by pairs (fetched to host).

    The per-pair computation is independent, so a sharded run is trivially
    bit-identical to the single-device kernel — this is the TPU-native
    analogue of spreading the reference's alignment channels over threads
    (align_simd.cpp CHANNELS), scaled to chips."""
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import active_mesh

    mesh = active_mesh()
    # per-shard kernel: the SAME impl ladder as single-chip for the local
    # batch size (pallas2 row-scan on TPU shards, XLA scan elsewhere) — the
    # sharded path is no longer a slow twin of the single-chip one
    local_kern = _build_kernels(scheme_key, M, N, Bp // n_devices)
    # multi-host: every (replicated) host driver consumes the FULL result,
    # and cross-process shards are not addressable — gather on device
    replicate = jax.process_count() > 1

    def _finish(score, over, ops):
        if replicate:
            score = jax.lax.all_gather(score, "db", axis=0, tiled=True)
            over = jax.lax.all_gather(over, "db", axis=0, tiled=True)
            ops = jax.lax.all_gather(ops, "db", axis=1, tiled=True)
        return score, over, ops

    out_specs = (P(), P(), P()) if replicate \
        else (P("db"), P("db"), P(None, "db"))
    if getattr(local_kern, "wire", None) == "rowT":
        run = jax.jit(jax.shard_map(
            lambda qmT, amT, qlen, t4T, tlen:
                _finish(*local_kern(qmT, amT, qlen, t4T, tlen)),
            mesh=mesh,
            in_specs=(P(None, "db"), P(None, "db"), P("db"),
                      P(None, "db"), P("db")),
            out_specs=out_specs,
            check_vma=False,
        ))

        def wrapped(qmT, amT, qlen, t4T, tlen):
            return run(qmT, amT, qlen, t4T, tlen)
        wrapped.wire = "rowT"
        return wrapped

    return jax.jit(jax.shard_map(
        lambda q4, qlen, t4, tlen: _finish(*local_kern(q4, qlen, t4, tlen)),
        mesh=mesh,
        in_specs=(P("db"), P("db"), P("db"), P("db")),
        out_specs=out_specs,
        check_vma=False,
    ))


@functools.lru_cache(maxsize=64)
def _gather_align_kernel(scheme_key: tuple, M: int, N: int, Bp: int):
    """Forward+backtrack over pairs whose targets live on device.

    Takes query codes, query lengths, candidate index positions (Bp,)
    int32, and the device-resident DB code matrix + length table; gathers
    the target rows on device so a dispatch uploads only the query-side
    data.  Under an active mesh the pair batch is sharded over devices
    (db codes replicated — parallel/sharded_index.attach_db_codes), so
    the top-1 prefetch rides the mesh with the same kernels as
    single-chip (r2 Weak #4)."""
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is not None and Bp % mesh.devices.size == 0:
        nd = mesh.devices.size
        # per-shard batch: _build_kernels picks the best impl for the
        # local size (pallas2 needs 128-multiples; others have no floor)
        local_kern = _build_kernels(scheme_key, M, N, Bp // nd)
        replicate = jax.process_count() > 1

        def _finish(score, over, ops):
            if replicate:
                score = jax.lax.all_gather(score, "db", axis=0, tiled=True)
                over = jax.lax.all_gather(over, "db", axis=0, tiled=True)
                ops = jax.lax.all_gather(ops, "db", axis=1, tiled=True)
            return score, over, ops

        out_specs = (P(), P(), P()) if replicate \
            else (P("db"), P("db"), P(None, "db"))
        if getattr(local_kern, "wire", None) == "rowT":
            def local(qmT, amT, qlen, pos, db_codes, tlen_by_pos):
                p = jnp.clip(pos, 0, db_codes.shape[0] - 1)
                t4T = db_codes[p][:, :N].T
                tlen = jnp.minimum(tlen_by_pos[p], N)
                return _finish(*local_kern(qmT, amT, qlen, t4T, tlen))
            run_m = jax.jit(jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(None, "db"), P(None, "db"), P("db"), P("db"),
                          P(), P()),
                out_specs=out_specs,
                check_vma=False))

            def run(qmT, amT, qlen, pos, db_codes, tlen_by_pos):
                return run_m(qmT, amT, qlen, pos, db_codes, tlen_by_pos)
            run.wire = "rowT"
            return run

        def local(q4, qlen, pos, db_codes, tlen_by_pos):
            p = jnp.clip(pos, 0, db_codes.shape[0] - 1)
            t4 = db_codes[p][:, :N]
            tlen = jnp.minimum(tlen_by_pos[p], N)
            return _finish(*local_kern(q4, qlen, t4, tlen))
        return jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("db"), P("db"), P("db"), P(), P()),
            out_specs=out_specs,
            check_vma=False))

    full_kernel = _build_kernels(scheme_key, M, N, Bp)

    if getattr(full_kernel, "wire", None) == "rowT":
        @jax.jit
        def run(qmT, amT, qlen, pos, db_codes, tlen_by_pos):
            p = jnp.clip(pos, 0, db_codes.shape[0] - 1)
            t4T = db_codes[p][:, :N].T
            tlen = jnp.minimum(tlen_by_pos[p], N)
            return full_kernel(qmT, amT, qlen, t4T, tlen)
        run.wire = "rowT"
        return run

    @jax.jit
    def run(q4, qlen, pos, db_codes, tlen_by_pos):
        p = jnp.clip(pos, 0, db_codes.shape[0] - 1)
        t4 = db_codes[p][:, :N]
        tlen = jnp.minimum(tlen_by_pos[p], N)
        return full_kernel(q4, qlen, t4, tlen)

    return run


@functools.lru_cache(maxsize=32)
def _compact_gather_kernel(scheme_key: tuple, M: int, N: int, qp: int,
                           K: int, R: int):
    """Device-side candidate compaction + gather-align (single device).

    From the top-k output (vals, idx) and per-query minmatches, packs the
    (query, candidate) pairs with count >= minmatches — capped at K per
    query, truncated at R total — into dense lanes, gathers query AND
    target operands per lane, and runs one forward+RLE-backtrack kernel.
    Everything happens device-side off the un-fetched top-k handles, so
    the speculation adds no link round-trip."""
    # one row-scan call is VMEM-bounded at 1024 lanes; larger lane
    # budgets split into sequential kernel calls inside the same jit
    CHUNK = 1024
    nchunks = (R + CHUNK - 1) // CHUNK
    assert R % CHUNK == 0
    base = _gather_align_kernel(scheme_key, M, N, CHUNK)
    assert getattr(base, "wire", None) == "rowT", \
        "compact prefetch requires the row-scan wire"

    @jax.jit
    def run(qmT, amT, qlens, vals, idx, mm, db_codes, tlen_by_pos, n):
        valid = (vals[:, :K] >= mm[:, None]) & (idx[:, :K] < n)
        # candidate-rank-major lane fill: every query's rank-0 candidate
        # first, then every rank-1, ... — so when the budget truncates it
        # drops the DEEP candidates (requested only after many rejects),
        # not whole queries
        lane = jnp.nonzero(valid.T.reshape(-1), size=R,
                           fill_value=qp * K)[0].astype(jnp.int32)
        live = lane < qp * K
        lane_c = jnp.where(live, lane, 0)
        q_idx = lane_c % qp
        c_idx = lane_c // qp
        pos = jnp.take_along_axis(
            idx[:, :K].reshape(-1)[None, :],
            (q_idx * K + c_idx)[None, :], axis=1)[0]
        pos = jnp.where(live, pos, 0)
        qmT_g = qmT[:, q_idx]
        amT_g = amT[:, q_idx]
        ql_g = jnp.where(live, qlens[q_idx], 1)
        scores, overs, opss = [], [], []
        for c in range(nchunks):
            sl = slice(c * CHUNK, (c + 1) * CHUNK)
            s_, o_, op_ = base(qmT_g[:, sl], amT_g[:, sl], ql_g[sl],
                               pos[sl], db_codes, tlen_by_pos)
            scores.append(s_)
            overs.append(o_)
            opss.append(op_)
        score = jnp.concatenate(scores) if nchunks > 1 else scores[0]
        over = jnp.concatenate(overs) if nchunks > 1 else overs[0]
        ops = jnp.concatenate(opss, axis=1) if nchunks > 1 else opss[0]
        # truncate the ops wire to PREFETCH_OPS_CAP rows before the fetch:
        # with the wide-RLE encoding a family pair backtracks in ~2
        # entries and a reject-like random pair in ~100-170 (p90), so the
        # cap covers nearly every lane while cutting the tunneled fetch
        # ~4x (the (S, R) matrix dominated the per-round transfer).  A
        # per-lane entry count rides in meta row 4; lanes that overflow
        # the cap are dropped by the host store and fall back to the host
        # aligner like any other uncovered pair.
        nsteps = jnp.sum((ops != 0).astype(jnp.int32), axis=0)
        meta = jnp.stack([
            q_idx,
            jnp.where(live, pos, jnp.int32(2**30)),
            score.astype(jnp.int32),
            over.astype(jnp.int32),
            nsteps], axis=0)                           # (5, R)
        return (meta.reshape(qp, (5 * R) // qp),
                ops[:PREFETCH_OPS_CAP])

    return run


class BatchAligner:
    """Device-batched aligner with host CIGAR/stat assembly."""

    def __init__(self, scheme: ScoreScheme) -> None:
        self.scheme = scheme
        self._key = (scheme.match, scheme.mismatch, scheme.go_q_left,
                     scheme.go_t_left, scheme.go_q_int, scheme.go_t_int,
                     scheme.go_q_right, scheme.go_t_right, scheme.ge_q_left,
                     scheme.ge_t_left, scheme.ge_q_int, scheme.ge_t_int,
                     scheme.ge_q_right, scheme.ge_t_right, scheme.n_mismatch)

    def align(self, qseq: bytes, tseqs: Sequence[bytes]) -> List[AlignmentResult]:
        """One query vs many targets (the search16 call shape)."""
        return self.align_pairs([qseq] * len(tseqs), tseqs)

    # pair-batch geometry ladder: few buckets so at most four kernel
    # geometries ever compile per (M, N) — TPU compiles are the scarce
    # resource on a tunneled device (tens of seconds to minutes each,
    # queue-dependent), while padded lanes only cost idle VPU work.  All
    # buckets are multiples of 128 (the row-scan kernel's lane width).
    PAIR_BUCKETS = (128, 256, 512, 1024)

    # floor below which batches always run on the host C tier; the live
    # crossover adapts above it from measured device-call overhead and
    # host cell rate (see align_pairs) — ~10M cells co-located, ~100M+
    # through a high-latency tunnel
    NATIVE_CELLS_LIMIT = int(os.environ.get("VSEARCH_TPU_NATIVE_NW_CELLS",
                                            8_000_000))
    DEVICE_RATE = 12e9          # cells/s the row-scan kernel sustains

    # adaptive host/device routing state: EMA of the device call's fixed
    # cost (dispatch+fetch latency — ~1 ms co-located, 40-120 ms through a
    # tunnel) and of the host C tier's measured cell rate.  Process-wide
    # (class attributes): latency and host speed are properties of the rig,
    # not of one aligner instance, and a fresh instance per run must not
    # relearn them through expensive mis-routed dispatches.  Persisted to
    # ~/.cache/vsearch_tpu/autotune.json (keyed by backend) so new
    # processes start from the rig's measured numbers instead of paying
    # mis-routed dispatches (and their kernel compiles) to relearn.
    _dev_overhead_ema = 8e-3     # seconds; pre-learning default
    _native_rate_ema = 1.0e9     # cells/s; conservative start
    _autotune_loaded = False
    _autotune_saved_at = 0.0

    @staticmethod
    def _autotune_path():
        return os.environ.get(
            "VSEARCH_TPU_AUTOTUNE",
            os.path.join(os.path.expanduser("~"), ".cache", "vsearch_tpu",
                         "autotune.json"))

    @classmethod
    def _autotune_load(cls):
        if cls._autotune_loaded:
            return
        cls._autotune_loaded = True
        try:
            import json
            with open(cls._autotune_path()) as fh:
                entry = json.load(fh).get(jax.default_backend())
            if entry:
                cls._dev_overhead_ema = float(entry["dev_overhead"])
                cls._native_rate_ema = float(entry["native_rate"])
        except Exception:
            pass

    @classmethod
    def _autotune_save(cls):
        import time as _time
        now = _time.monotonic()
        if now - cls._autotune_saved_at < 5.0:
            return
        cls._autotune_saved_at = now
        try:
            import json
            path = cls._autotune_path()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            try:
                with open(path) as fh:
                    data = json.load(fh)
            except Exception:
                data = {}
            data[jax.default_backend()] = {
                "dev_overhead": cls._dev_overhead_ema,
                "native_rate": cls._native_rate_ema}
            tmp = path + ".tmp.%d" % os.getpid()
            with open(tmp, "w") as fh:
                json.dump(data, fh)
            os.replace(tmp, path)
        except Exception:
            pass

    @classmethod
    def device_roundtrip_ok(cls, threshold: float = 0.02) -> bool:
        """Is the measured device-call overhead low enough for
        latency-sensitive serial-round engines (growing-index cluster /
        chimera tiers) to profit from per-round device dispatches?

        Co-located chips measure ~1-8 ms and pass; a tunneled attachment
        (40-120+ ms) fails, and those engines keep their host tier — on
        such rigs hundreds of serial rounds of device round-trips cost
        far more than the scoring they replace."""
        cls._autotune_load()
        return cls._dev_overhead_ema <= threshold

    def _native_cells_crossover(self) -> float:
        """Batch size (DP cells) above which the device dispatch beats the
        host C tier: solve cells/host_rate > overhead + cells/device_rate
        with the measured EMAs."""
        if "VSEARCH_TPU_NATIVE_NW_CELLS" in os.environ:
            return self.NATIVE_CELLS_LIMIT
        inv = 1.0 / self._native_rate_ema - 1.0 / self.DEVICE_RATE
        if inv <= 0:
            return self.NATIVE_CELLS_LIMIT
        return max(self.NATIVE_CELLS_LIMIT, self._dev_overhead_ema / inv)

    def align_pairs(self, qseqs: Sequence[bytes],
                    tseqs: Sequence[bytes]) -> List[AlignmentResult]:
        B = len(qseqs)
        if B == 0:
            return []
        self._autotune_load()
        cells = sum(len(q) * len(t) for q, t in zip(qseqs, tseqs))
        # CPU backend: the threaded C tier always beats the XLA CPU scan —
        # except under an active device mesh, where large batches take the
        # sharded device kernel so the multi-chip path is the one exercised
        from ..parallel.mesh import active_mesh
        import time as _time
        if cells <= self._native_cells_crossover() or (
                jax.default_backend() == "cpu" and active_mesh() is None):
            t0 = _time.perf_counter()
            native_res = self._align_pairs_native(qseqs, tseqs)
            if native_res is not None:
                dt = _time.perf_counter() - t0
                if cells >= 1_000_000 and dt > 0:
                    BatchAligner._native_rate_ema = (
                        0.7 * BatchAligner._native_rate_ema
                        + 0.3 * cells / dt)
                    self._autotune_save()
                return native_res
        t0 = _time.perf_counter()
        if B > self.PAIR_BUCKETS[-1]:
            # dispatch every chunk before fetching any, then fetch ALL
            # chunks in a single bundled device_get: on the tunneled TPU
            # every fetch costs a ~40 ms round-trip regardless of size, so
            # the latency is paid once instead of per chunk
            cap = self.PAIR_BUCKETS[-1]
            chunks = [(qseqs[lo:lo + cap], tseqs[lo:lo + cap])
                      for lo in range(0, B, cap)]
            pending = [self._dispatch(qc, tc) for qc, tc in chunks]
            fetched = jax.device_get(pending)
            out: List[AlignmentResult] = []
            for (qc, tc), handle in zip(chunks, fetched):
                out.extend(self._collect(qc, tc, handle))
        else:
            handle = self._dispatch(qseqs, tseqs)
            out = self._collect(qseqs, tseqs, handle)
        # overhead = wall minus the compute the kernel itself accounts for;
        # first calls include compiles — cap the sample so one compile
        # doesn't poison the estimate
        dt = _time.perf_counter() - t0
        overhead = min(max(dt - cells / self.DEVICE_RATE, 1e-4), 0.5)
        BatchAligner._dev_overhead_ema = (
            0.7 * BatchAligner._dev_overhead_ema + 0.3 * overhead)
        self._autotune_save()
        return out

    def _align_pairs_native(self, qseqs: Sequence[bytes],
                            tseqs: Sequence[bytes]
                            ) -> Optional[List[AlignmentResult]]:
        """Host C tier: threaded scalar NW with identical semantics
        (native/vsearch_tpu_native.c vstpu_nw_align_batch)."""
        from .. import native
        res = native.nw_align_batch(qseqs, tseqs, self._key)
        if res is None:
            return None
        return [AlignmentResult(SHRT_MAX, "", 0, 0, 0, 0) if overflow
                else AlignmentResult(score, cigar, aligned, matches, mism,
                                     gaps)
                for (score, overflow, aligned, matches, mism, gaps, cigar)
                in res]

    def dispatch_indexed(self, qseqs: Sequence[bytes], rows: int, pos,
                         db_codes, tlen_by_pos, N: int):
        """Launch alignment of each query against a device-resident target
        selected by index position (e.g. the top-1 column of a top-k
        result).  ``pos`` is a device (rows,) int32 array, so no host sync
        happens here; only the query codes are uploaded."""
        qlens = np.ones(rows, dtype=np.int32)
        for i, s in enumerate(qseqs):
            qlens[i] = max(len(s), 1)
        M = _bucket(max(len(s) for s in qseqs))
        kernel = _gather_align_kernel(self._key, M, N, rows)
        if getattr(kernel, "wire", None) == "rowT":
            qmT, amT = encode_rowT(qseqs, rows, M, self.scheme.mismatch,
                                   self.scheme.n_mismatch)
            return kernel(jnp.asarray(qmT), jnp.asarray(amT),
                          jnp.asarray(qlens), pos, db_codes, tlen_by_pos)
        q4 = encode_padded(qseqs, rows, M)
        return kernel(jnp.asarray(q4), jnp.asarray(qlens), pos,
                      db_codes, tlen_by_pos)

    def dispatch_compact(self, qseqs: Sequence[bytes], qp: int,
                         vals_d, idx_d, mm: np.ndarray, K: int, R: int,
                         db_codes, tlen_by_pos, N: int, n: int):
        """Compacted speculative alignment: align ONLY the top-K
        candidates that pass minwordmatches, packed densely into R device
        lanes (computed on device from the top-k output — no host sync).

        A fixed-K per-query speculation wastes most lanes: the top-k rows
        carry every occupied position while the walk only ever requests
        candidates at or above minmatches (~25% lane utilization measured
        on the 50k cluster bench).  Compaction gathers the query operands
        per lane by a device-computed (query, candidate) index, so R
        covers ~4x more useful candidates per DP cell.  Returns
        (meta (qp, 5R/qp) int32 — reshaped (5, R) rows q_idx/pos/score/
        overflow/nsteps, positions 2^30-sentineled on dead or truncated
        lanes — and ops (min(S, PREFETCH_OPS_CAP), R) int16; lanes whose
        entry count exceeds the cap carry nsteps > ops rows and must fall
        back to the host aligner)."""
        qlens = np.ones(qp, dtype=np.int32)
        for i, s in enumerate(qseqs):
            qlens[i] = max(len(s), 1)
        M = _bucket(max(len(s) for s in qseqs))
        fn = _compact_gather_kernel(self._key, M, N, qp, K, R)
        qmT, amT = encode_rowT(qseqs, qp, M, self.scheme.mismatch,
                               self.scheme.n_mismatch)
        return fn(jnp.asarray(qmT), jnp.asarray(amT), jnp.asarray(qlens),
                  vals_d, idx_d,
                  jnp.asarray(np.ascontiguousarray(mm, dtype=np.int32)),
                  db_codes, tlen_by_pos,
                  jnp.asarray(np.int32(n)))

    def assemble_one(self, score: int, ops_col: np.ndarray, qseq: bytes,
                     tseq: bytes) -> AlignmentResult:
        """Host assembly of one prefetched (score, ops) row."""
        return self._assemble(score, ops_col, qseq, tseq)

    def _dispatch(self, qseqs: Sequence[bytes], tseqs: Sequence[bytes]):
        """Encode, upload and launch one pair chunk; returns device arrays."""
        B = len(qseqs)
        qlens = np.array([len(q) for q in qseqs], dtype=np.int32)
        tlens = np.array([len(t) for t in tseqs], dtype=np.int32)
        M = _bucket(int(qlens.max()))
        N = _bucket(int(tlens.max()))
        Bp = next(b for b in self.PAIR_BUCKETS if b >= B)

        # vectorized encode into the int8 wire format (one lookup over the
        # concatenated bytes + masked scatter instead of per-pair slicing)
        qlens_p = np.ones(Bp, dtype=np.int32)
        qlens_p[:B] = qlens
        tlens_p = np.ones(Bp, dtype=np.int32)
        tlens_p[:B] = tlens

        from ..parallel.mesh import active_mesh
        mesh = active_mesh()
        if mesh is not None and Bp % mesh.devices.size == 0:
            kernel = _build_kernels_sharded(self._key, M, N, Bp,
                                            mesh.devices.size)
        else:
            kernel = _build_kernels(self._key, M, N, Bp)
        if getattr(kernel, "wire", None) == "rowT":
            # row-scan wire: pre-transposed + LUT-remapped on host so the
            # device does no per-batch preprocessing
            qmT, amT = encode_rowT(qseqs, Bp, M, self.scheme.mismatch,
                                   self.scheme.n_mismatch)
            t4T = np.ascontiguousarray(encode_padded(tseqs, Bp, N).T)
            return kernel(jnp.asarray(qmT), jnp.asarray(amT),
                          jnp.asarray(qlens_p), jnp.asarray(t4T),
                          jnp.asarray(tlens_p))
        q4 = encode_padded(qseqs, Bp, M)
        t4 = encode_padded(tseqs, Bp, N)
        return kernel(jnp.asarray(q4), jnp.asarray(qlens_p),
                      jnp.asarray(t4), jnp.asarray(tlens_p))

    def _collect(self, qseqs: Sequence[bytes], tseqs: Sequence[bytes],
                 handle) -> List[AlignmentResult]:
        B = len(qseqs)
        # one bundled device->host transfer (three sequential np.asarray
        # round-trips dominate latency on a tunneled device)
        score, overflow, ops = jax.device_get(handle)
        return self.assemble_columns(score, overflow, np.asarray(ops),
                                     qseqs, tseqs)

    def assemble_columns(self, score, overflow, ops: np.ndarray,
                         qseqs: Sequence[bytes], tseqs: Sequence[bytes]
                         ) -> List[AlignmentResult]:
        """Assemble the first len(qseqs) columns of a fetched (S, B) ops
        matrix into AlignmentResults (one threaded native call for the
        whole batch; overflow columns become SHRT_MAX sentinels)."""
        from .. import native
        B = len(qseqs)
        results: List[Optional[AlignmentResult]] = [None] * B
        live = [b for b in range(B) if not overflow[b]]
        batch = native.assemble_batch(
            ops, live, [qseqs[b] for b in live], [tseqs[b] for b in live],
            self.scheme.n_mismatch) if live else []
        if batch is not None:
            for b, (cigar, aligned, matches, mism, gaps) in zip(live, batch):
                results[b] = AlignmentResult(int(score[b]), cigar, aligned,
                                             matches, mism, gaps)
        else:
            for b in live:
                results[b] = self._assemble(int(score[b]), ops[:, b],
                                            qseqs[b], tseqs[b])
        for b in range(B):
            if results[b] is None:
                results[b] = AlignmentResult(SHRT_MAX, "", 0, 0, 0, 0)
        return results

    def _assemble(self, score: int, ops_rev: np.ndarray, qseq: bytes,
                  tseq: bytes) -> AlignmentResult:
        from .. import native
        res = native.assemble(ops_rev, qseq, tseq, self.scheme.n_mismatch)
        if res is not None:
            cigar, aligned, matches, mismatches, gaps = res
            return AlignmentResult(score, cigar, aligned, matches,
                                   mismatches, gaps)
        vals = ops_rev[ops_rev != OP_NONE][::-1].astype(np.int64)
        # decode run-length bytes (op | count << 2); flat bytes have
        # count-field 0 and decode as a single move
        fwd = np.repeat(vals & 3, np.maximum(vals >> 2, 1))
        aligned = int(fwd.size)
        is_m = fwd == OP_M
        is_d = fwd == OP_D
        is_i = fwd == OP_I
        # per-op sequence positions
        qstep = (is_m | is_d).astype(np.int64)
        tstep = (is_m | is_i).astype(np.int64)
        qpos = np.cumsum(qstep) - qstep
        tpos = np.cumsum(tstep) - tstep
        q4 = CHRMAP_4BIT[np.frombuffer(qseq, dtype=np.uint8)].astype(np.int64)
        t4 = CHRMAP_4BIT[np.frombuffer(tseq, dtype=np.uint8)].astype(np.int64)
        mq = q4[qpos[is_m]]
        mt = t4[tpos[is_m]]
        equiv = (mq & mt) != 0
        if self.scheme.n_mismatch:
            equiv &= (mq != 15) & (mt != 15)
        matches = int(equiv.sum())
        mismatches = int(is_m.sum()) - matches
        # gap runs: transitions into D or I
        prev = np.concatenate(([OP_NONE], fwd[:-1]))
        gaps = int(((is_d) & (prev != OP_D)).sum()
                   + ((is_i) & (prev != OP_I)).sum())
        # run-length encode
        cigar = _ops_array_to_cigar(fwd)
        return AlignmentResult(score, cigar, aligned, matches, mismatches,
                               gaps)


_OP_CHARS = {OP_M: "M", OP_D: "D", OP_I: "I"}


def _ops_array_to_cigar(fwd: np.ndarray) -> str:
    if fwd.size == 0:
        return ""
    change = np.nonzero(np.diff(fwd))[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [fwd.size]))
    parts = []
    for s, e in zip(starts, ends):
        run = e - s
        ch = _OP_CHARS[int(fwd[s])]
        parts.append(("%d%s" % (run, ch)) if run > 1 else ch)
    return "".join(parts)
