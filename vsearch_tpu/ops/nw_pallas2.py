"""Pallas TPU row-scan forward for the batched Needleman-Wunsch DP.

Second-generation forward kernel (replaces the anti-diagonal wavefront of
ops/nw_pallas.py as the TPU default).  Design:

* layout: target positions j in SUBLANES (Np rows), pair batch in LANES
  (TB columns, multiple of 128).  All shifts are sublane shifts; the pair
  dimension is the vector width that hides the VPU dependency latency
  (measured: TB=128 -> 13 GCUPS, TB=1024 -> 43 GCUPS on v5e).
* one fori_loop step per QUERY row (M steps instead of the wavefront's
  M+N-1): the horizontal gap state E, whose within-row recurrence
  E(j+1) = max(E(j) - R, h(j) - QR) is a max-plus prefix, is computed with
  a log2(Np)-stage shifted-max scan:
      E(j) = max(E0, P(j-1) - QR + R) - j*R,  P = cummax(htemp + j*R)
  This removes both the wavefront's ~2x padded-diagonal redundancy and its
  per-step dynamic window rotates.
* the vertical gap state F and the H row are plain per-row carries.
* direction bits (same 4-bit layout as ops/nw.py, bits 0..3) plus the
  diagonal run length (bits 4..15, cap RLCAP) stream to HBM as a uint16
  plane through a double-buffered KROWS-deep staging buffer, layout
  (M, Np, B) — dirs[i, j, b] — consumed by the layout-aware device
  backtrack in nw_jax.py.
* 16-bit overflow *detection* (hmin/hmax vs score_min/SHRT_MAX,
  align_simd.cpp:2029-2040 semantics) is only materialized when the static
  score-envelope analysis (overflow_possible) says the reference engine
  could overflow for this (scheme, M, N); for amplicon geometries the
  bound proves overflow impossible in BOTH engines, so the tracking ops
  are dropped and the flag is constant false — bit-identical behavior.

Cell semantics are identical to ops/nw.py's scalar oracle (reference:
align_simd.cpp onestep :752-781, aligncolumns_* :783-1050).

This toolchain's Mosaic rejects int16 vector max/compare and int8 dynamic
sublane slices (probed), so the datapath is int32 and per-row query codes
are pre-widened to int32 on device.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from vsearch_tpu import configure_jax as _cfg
_cfg()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nw import DIR_EXTLEFT, DIR_EXTUP, DIR_LEFT, DIR_UP, SHRT_MAX, ScoreScheme

NEG = -(2 ** 30)
KROWS = 8  # direction rows per staging DMA
# Diagonal-run cap in the uint16 dir wire (bits 4..15 hold the run length,
# bits 0..3 the direction flags).  255 keeps the lockstep match-count plane
# (with_matches) inside uint8; a clean L=600 alignment backtracks in ~3
# gathers instead of the old int8 nibble's 40 (cap 15).
RLCAP = 255


def overflow_possible(scheme_key: tuple, M: int, N: int) -> bool:
    """Static envelope: can any cell's h reach the reference's 16-bit
    overflow thresholds for this scheme/geometry?

    h(i,j) is the optimal prefix-alignment score, bounded below by the
    score of the specific diagonal-then-single-gap path and above by
    all-diagonal matches.  When both bounds stay inside
    (score_min, SHRT_MAX), neither engine can flag overflow and the
    tracking is dropped (reference: align_simd.cpp compute_score_min
    :1432-1444)."""
    (match, mismatch, go_q_l, go_t_l, go_q_i, go_t_i, go_q_r, go_t_r,
     ge_q_l, ge_t_l, ge_q_i, ge_t_i, ge_q_r, ge_t_r, n_mismatch) = scheme_key
    gos = (go_q_l, go_t_l, go_q_i, go_t_i, go_q_r, go_t_r)
    ges = (ge_q_l, ge_t_l, ge_q_i, ge_t_i, ge_q_r, ge_t_r)
    if min(gos) < 0 or min(ges) < 0:
        return True  # gap rewards: bail to exact tracking
    mm_floor = min(mismatch, match, 0)
    hmin_b = min(M, N) * mm_floor - 2 * max(gos) - max(M, N) * max(ges)
    hmax_b = min(M, N) * max(match, 0)
    scheme = ScoreScheme(match, mismatch, go_q_l, go_t_l, go_q_i, go_t_i,
                         go_q_r, go_t_r, ge_q_l, ge_t_l, ge_q_i, ge_t_i,
                         ge_q_r, ge_t_r, bool(n_mismatch))
    return not (hmin_b > scheme.score_min() + 8 and hmax_b < SHRT_MAX - 8)


def build_forward2(scheme_key: tuple, M: int, N: int, TB: int,
                   interpret: bool = False, with_matches: bool = False):
    """Forward DP for geometry (M query rows, N target cols, TB pairs).

    Returns a jitted fn (q4 (B, M) int8, qlen (B,), t4 (B, N) int8,
    tlen (B,)) -> (score (B,) i32, overflow (B,) bool, dirs (M, N, B) u16)
    with B == TB (TB a multiple of 128; N, M multiples of 8 with M a
    multiple of KROWS).

    with_matches=True additionally takes the RAW query code plane rqT
    (M, TB) int8 (unremapped 4-bit codes) and emits a second
    (M, N, B) u8 plane holding the IUPAC match count within the current
    diagonal run chunk — in lockstep with the run-length nibble, so a
    stats backtrack (ops/allpairs_dev.py) can count matches/mismatches
    per consumed run without re-reading sequence data."""
    (match, mismatch, go_q_l, go_t_l, go_q_i, go_t_i, go_q_r, go_t_r,
     ge_q_l, ge_t_l, ge_q_i, ge_t_i, ge_q_r, ge_t_r, n_mismatch) = scheme_key
    QR_q_i = go_q_i + ge_q_i
    QR_q_r = go_q_r + ge_q_r
    QR_t_i = go_t_i + ge_t_i
    QR_t_r = go_t_r + ge_t_r
    scheme = ScoreScheme(match, mismatch, go_q_l, go_t_l, go_q_i, go_t_i,
                         go_q_r, go_t_r, ge_q_l, ge_t_l, ge_q_i, ge_t_i,
                         ge_q_r, ge_t_r, bool(n_mismatch))
    score_min = scheme.score_min()
    Np = N
    assert Np % 8 == 0 and M % KROWS == 0 and TB % 128 == 0
    track = overflow_possible(scheme_key, M, N)
    # last-row (query-right) classes identical to interior: drop the
    # per-row class selects entirely
    q_classes_equal = (QR_q_i == QR_q_r and ge_q_i == ge_q_r)
    nblk = M // KROWS

    def kernel(*refs):
        if with_matches:
            (qm8_ref, am8_ref, rq8_ref, qlen_ref, t4_ref, tlen_ref,
             score_ref, over_ref, dirs_hbm, mr_hbm,
             qm_ref, am_ref, rq_ref, stage, mstage, sems, msems) = refs
        else:
            (qm8_ref, am8_ref, qlen_ref, t4_ref, tlen_ref,
             score_ref, over_ref, dirs_hbm,
             qm_ref, am_ref, stage, sems) = refs
        # widen the int8 wire rows once (dynamic sublane slices require a
        # 32-bit element type on this Mosaic toolchain)
        qm_ref[:] = qm8_ref[:].astype(jnp.int32)
        am_ref[:] = am8_ref[:].astype(jnp.int32)
        if with_matches:
            rq_ref[:] = rq8_ref[:].astype(jnp.int32)
        jidx = jax.lax.broadcasted_iota(jnp.int32, (Np, TB), 0)
        j0 = jidx == 0
        t4c = t4_ref[:].astype(jnp.int32)
        tlen_v = tlen_ref[:]                       # (1, TB)
        qlen_v = qlen_ref[:]                       # (1, TB)
        # target-side static vectors
        amb_t = jnp.logical_not((t4c == 1) | (t4c == 2) | (t4c == 4)
                                | (t4c == 8))
        if n_mismatch:
            t_is_n = t4c == 15
            amb_t = amb_t & jnp.logical_not(t_is_n)
        right_t = jidx == (tlen_v - 1)
        last_t = right_t                            # score extraction mask
        QR_t_v = jnp.where(right_t, QR_t_r, QR_t_i)
        R_t_v = jnp.where(right_t, ge_t_r, ge_t_i)
        jR_i = jidx * ge_q_i
        if not q_classes_equal:
            jR_r = jidx * ge_q_r
        # virtual row -1 (top boundary) and its F
        H0 = -(go_q_l + (jidx + 1) * ge_q_l)
        F0 = H0 - QR_t_v
        zero = jnp.zeros((Np, TB), jnp.int32)

        def row(i, k, slot, carry):
            # k (row-in-block) is a STATIC python int and the DMA control
            # flow lives at block level: the unrolled block body carries no
            # per-row conditionals, so Mosaic can pipeline it freely
            H, F, RL, MR, score_acc, hmin, hmax = carry
            qm_row = qm_ref[pl.ds(i, 1), :]        # (1, TB) int32
            am_row = am_ref[pl.ds(i, 1), :]
            V = jnp.where(t4c == qm_row, match, am_row)
            V = jnp.where(amb_t, 0, V)
            if n_mismatch:
                either_n = t_is_n | (qm_row == -2)
                V = jnp.where(either_n, mismatch, V)
            lastq = qlen_v == (i + 1)              # (1, TB)
            if q_classes_equal:
                QR_q_row = QR_q_i
                R_q_row = ge_q_i
                QRmR = QR_q_i - ge_q_i
                jR = jR_i
            else:
                QR_q_row = jnp.where(lastq, QR_q_r, QR_q_i)
                R_q_row = jnp.where(lastq, ge_q_r, ge_q_i)
                QRmR = QR_q_row - R_q_row
                jR = jnp.where(lastq, jR_r, jR_i)
            # diagonal input: previous row's H shifted down one position,
            # with the left-boundary H[i-1][-1] injected at j=0
            diag_left = jax.lax.select(i == 0, 0, -(go_t_l + i * ge_t_l))
            diag = jnp.concatenate(
                (jnp.full((1, TB), 0, jnp.int32) + diag_left, H[:Np - 1]),
                axis=0)
            htemp = diag + V
            dup = F > htemp
            htemp2 = jnp.maximum(htemp, F)
            # E via max-plus prefix:
            #   E(j) = max(E0, P(j-1) - (QR - R)) - j*R,
            #   P = cummax(htemp2 + j*R)
            # computed as a two-level segmented scan instead of the
            # log2(Np)-stage full-width ladder: a g-wide sliding-window
            # max (log2(g) full-width stages) combined with an exclusive
            # scan over per-segment maxima at 1/g width.  Exact despite
            # the window crossing segment boundaries: any contaminating
            # element belongs to an earlier segment, so it is dominated
            # by the carry term that already covers that segment.
            E0 = -(go_t_l + (i + 1) * ge_t_l) - QR_q_row
            A = htemp2 + jR
            g = 8
            G = Np // g
            P = A
            s = 1
            while s < g:
                P = jnp.concatenate(
                    (P[:s], jnp.maximum(P[s:], P[:Np - s])), axis=0)
                s *= 2
            segmax = jnp.max(A.reshape(G, g, TB), axis=1)
            s = 1
            while s < G:
                segmax = jnp.concatenate(
                    (segmax[:s],
                     jnp.maximum(segmax[s:], segmax[:G - s])), axis=0)
                s *= 2
            carry = jnp.concatenate(
                (jnp.full((1, TB), NEG, jnp.int32), segmax[:G - 1]),
                axis=0)
            P = jnp.maximum(P, jnp.repeat(carry, g, axis=0))
            Ps = jnp.concatenate(
                (jnp.full((1, TB), NEG, jnp.int32), P[:Np - 1]), axis=0)
            E = jnp.maximum(Ps - QRmR, E0) - jR
            dleft = E > htemp2
            h = jnp.maximum(E, htemp2)
            # direction bits for this row
            HE = h - QR_q_row
            Ex = E - R_q_row
            dextl = Ex > HE
            Fx = F - R_t_v
            HF = h - QR_t_v
            dextu = Fx > HF
            F_next = jnp.maximum(Fx, HF)
            dirs32 = (jnp.where(dup, DIR_UP, 0)
                      | jnp.where(dleft, DIR_LEFT, 0)
                      | jnp.where(dextu, DIR_EXTUP, 0)
                      | jnp.where(dextl, DIR_EXTLEFT, 0))
            # M-run length fused into bits 4..15 of the uint16 dir wire:
            # the number of consecutive diagonal (no-LEFT/no-UP) cells
            # ending here lets the RLE backtrack skip whole match runs per
            # gather.  Runs restart after RLCAP (1..RLCAP, 1..RLCAP, ...)
            # so each recorded value names an exact chunk — the
            # match-count plane below stays in lockstep with the chunk the
            # backtrack will consume.
            MR_next = MR
            if os.environ.get("VSEARCH_TPU_NW_NORL", "0") == "1":
                RL_next = RL
            else:
                leftup = (dirs32 & (DIR_UP | DIR_LEFT)) != 0
                RLs = jnp.concatenate(
                    (jnp.zeros((1, TB), jnp.int32), RL[:Np - 1]), axis=0)
                RL_next = jnp.where(leftup, 0,
                                    jnp.where(RLs >= RLCAP, 1, RLs + 1))
                dirs32 = dirs32 | (RL_next << 4)
                if with_matches:
                    rq_row = rq_ref[pl.ds(i, 1), :]        # (1, TB) int32
                    is_m = ((rq_row & t4c) != 0)
                    if n_mismatch:
                        is_m = is_m & jnp.logical_not(
                            t_is_n | (rq_row == 15))
                    is_m = is_m.astype(jnp.int32)
                    MRs = jnp.concatenate(
                        (jnp.zeros((1, TB), jnp.int32), MR[:Np - 1]),
                        axis=0)
                    MR_next = jnp.where(
                        leftup, 0,
                        jnp.where(RLs >= RLCAP, is_m, MRs + is_m))
                    mstage[slot, k] = MR_next.astype(jnp.uint8)
            stage[slot, k] = dirs32.astype(jnp.uint16)

            # final-cell score: row qlen-1, column tlen-1
            at_end = last_t & lastq
            score_acc = score_acc + jnp.where(at_end, h, 0)
            if track:
                valid = (jidx < tlen_v) & (qlen_v > i)
                hv = jnp.where(valid, h, 0)
                hmin = jnp.minimum(hmin, hv)
                hmax = jnp.maximum(hmax, hv)
            return (h, F_next, RL_next, MR_next, score_acc, hmin, hmax)

        # NOTE: a dynamic (traced) row bound of ceil(max(qlen)/KROWS)*KROWS
        # was measured 48% SLOWER than the static bound — the traced trip
        # count defeats Mosaic's loop pipelining — so the loop always runs
        # all M rows (the bucket ladder keeps M close to max qlen anyway)
        def blk_body(blk, carry):
            slot = jax.lax.rem(blk, 2)

            # before overwriting this slot, drain its previous DMA
            @pl.when(blk >= 2)
            def _():
                pltpu.make_async_copy(
                    stage.at[slot],
                    dirs_hbm.at[pl.ds((blk - 2) * KROWS, KROWS)],
                    sems.at[slot]).wait()
                if with_matches:
                    pltpu.make_async_copy(
                        mstage.at[slot],
                        mr_hbm.at[pl.ds((blk - 2) * KROWS, KROWS)],
                        msems.at[slot]).wait()

            i0 = blk * KROWS
            for k in range(KROWS):
                carry = row(i0 + k, k, slot, carry)

            pltpu.make_async_copy(
                stage.at[slot],
                dirs_hbm.at[pl.ds(blk * KROWS, KROWS)],
                sems.at[slot]).start()
            if with_matches:
                pltpu.make_async_copy(
                    mstage.at[slot],
                    mr_hbm.at[pl.ds(blk * KROWS, KROWS)],
                    msems.at[slot]).start()
            return carry

        H, F, RL, MR, score_acc, hmin, hmax = jax.lax.fori_loop(
            0, nblk, blk_body, (H0, F0, zero, zero, zero, zero, zero))

        # drain outstanding staging DMAs (the last one or two started)
        pltpu.make_async_copy(
            stage.at[(nblk - 1) % 2],
            dirs_hbm.at[pl.ds((nblk - 1) * KROWS, KROWS)],
            sems.at[(nblk - 1) % 2]).wait()
        if nblk >= 2:
            pltpu.make_async_copy(
                stage.at[(nblk - 2) % 2],
                dirs_hbm.at[pl.ds((nblk - 2) * KROWS, KROWS)],
                sems.at[(nblk - 2) % 2]).wait()
        if with_matches:
            pltpu.make_async_copy(
                mstage.at[(nblk - 1) % 2],
                mr_hbm.at[pl.ds((nblk - 1) * KROWS, KROWS)],
                msems.at[(nblk - 1) % 2]).wait()
            if nblk >= 2:
                pltpu.make_async_copy(
                    mstage.at[(nblk - 2) % 2],
                    mr_hbm.at[pl.ds((nblk - 2) * KROWS, KROWS)],
                    msems.at[(nblk - 2) % 2]).wait()

        score_ref[:] = jnp.sum(score_acc, axis=0, keepdims=True)
        if track:
            mn = jnp.min(hmin, axis=0, keepdims=True)
            mx = jnp.max(hmax, axis=0, keepdims=True)
            over_ref[:] = ((mn <= score_min)
                           | (mx >= SHRT_MAX)).astype(jnp.int32)
        else:
            over_ref[:] = jnp.zeros((1, TB), jnp.int32)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # qm (M, TB) i8
        pl.BlockSpec(memory_space=pltpu.VMEM),   # am (M, TB) i8
    ]
    if with_matches:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # rq i8
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # qlen (1, TB) i32
        pl.BlockSpec(memory_space=pltpu.VMEM),   # t4 (Np, TB) i8
        pl.BlockSpec(memory_space=pltpu.VMEM),   # tlen (1, TB) i32
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # score (1, TB)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # overflow (1, TB)
        pl.BlockSpec(memory_space=pl.ANY),       # dirs (M, Np, TB) HBM
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, TB), jnp.int32),
        jax.ShapeDtypeStruct((1, TB), jnp.int32),
        jax.ShapeDtypeStruct((M, Np, TB), jnp.uint16),
    ]
    if with_matches:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # mr HBM
        out_shape.append(jax.ShapeDtypeStruct((M, Np, TB), jnp.uint8))
    scratch_shapes = [
        pltpu.VMEM((M, TB), jnp.int32),          # widened qm
        pltpu.VMEM((M, TB), jnp.int32),          # widened am
    ]
    if with_matches:
        scratch_shapes.append(pltpu.VMEM((M, TB), jnp.int32))  # raw q
    scratch_shapes.append(pltpu.VMEM((2, KROWS, Np, TB), jnp.uint16))
    if with_matches:
        scratch_shapes.append(pltpu.VMEM((2, KROWS, Np, TB), jnp.uint8))
    scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))
    if with_matches:
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))

    call = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )

    if with_matches:
        @jax.jit
        def forward(qmT, amT, rqT, qlen, t4T, tlen):
            score, over, dirs, mr = call(
                qmT, amT, rqT, qlen[None, :].astype(jnp.int32),
                t4T, tlen[None, :].astype(jnp.int32))
            return score[0], over[0] != 0, dirs, mr
        return forward

    @jax.jit
    def forward(qmT, amT, qlen, t4T, tlen):
        """Pre-transposed wire format (nw_jax.encode_rowT): qmT/amT
        (M, TB) int8 with the ambiguity/N remap folded in on host, t4T
        (Np, TB) int8."""
        score, over, dirs = call(qmT, amT, qlen[None, :].astype(jnp.int32),
                                 t4T, tlen[None, :].astype(jnp.int32))
        return score[0], over[0] != 0, dirs

    return forward
