"""Pallas TPU forward wavefront for the batched Needleman-Wunsch DP.

The XLA scan version (nw_jax.forward) is HBM-bandwidth-bound: every
anti-diagonal step round-trips four (B, M) int32 carries through HBM.  This
kernel keeps H/E/F carries in VMEM scratch for the whole sweep and streams
only the per-diagonal direction bits to HBM (double-buffered async copies),
with the per-pair batch tiled over the grid.

Same cell semantics as nw_jax.forward / ops/nw.py's oracle (reference:
align_simd.cpp onestep, :752-781).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from vsearch_tpu import configure_jax as _cfg
_cfg()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nw import DIR_EXTLEFT, DIR_EXTUP, DIR_LEFT, DIR_UP, SHRT_MAX, ScoreScheme

AMB_LUT = np.array([1, 0, 0, 1, 0, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1],
                   dtype=np.int32)


def build_forward(scheme_key: tuple, M: int, N: int, TB: int):
    """Forward DP kernel for geometry (M, N) and pair-tile TB.

    Returns a jitted fn (q4, qlen, t4, tlen) -> (score, overflow, dirs)
    with dirs (D, B, Mp) uint8 (lanes padded to the int8 tiling).  B must be a multiple of TB.
    """
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
    # lane dimension padded to the int8 DMA tiling (128): the direction-bit
    # staging copies slice whole lanes, which Mosaic requires 128-aligned
    Mp = ((M + 127) // 128) * 128
    # sliding-window width must be a multiple of 128 lanes for the dynamic
    # rotate; the extension is padded so the aligned window never overruns
    WIN = Mp + 128
    W = M + N + WIN

    def kernel(q4_ref, tlen_ref, qlen_ref, t4x_ref, ambt_ref,
               score_ref, over_ref, dirs_hbm,
               H1, H2, E, F, hmin, hmax, score_acc, stage, sems):
        tile = pl.program_id(0)
        ii = jax.lax.broadcasted_iota(jnp.int32, (TB, Mp), 1)
        qlen_c = qlen_ref[:]               # (TB, 1) int32
        tlen_c = tlen_ref[:]
        # widen codes before comparing: Mosaic (this toolchain) rejects
        # int8 vector compares ("Target does not support this comparison")
        q4 = q4_ref[:].astype(jnp.int32)
        # ambiguity via arithmetic: codes {1,2,4,8} are unambiguous
        amb_q_m = jnp.logical_not((q4 == 1) | (q4 == 2) | (q4 == 4)
                                  | (q4 == 8))

        last_q = ii == (qlen_c - 1)
        valid_i = ii < qlen_c
        QR_q = jnp.where(last_q, QR_q_r, QR_q_i)
        R_q = jnp.where(last_q, ge_q_r, ge_q_i)

        H1[:] = jnp.zeros((TB, Mp), jnp.int32)
        H2[:] = jnp.zeros((TB, Mp), jnp.int32)
        E[:] = jnp.zeros((TB, Mp), jnp.int32)
        F[:] = jnp.zeros((TB, Mp), jnp.int32)
        hmin[:] = jnp.zeros((TB, Mp), jnp.int32)
        hmax[:] = jnp.zeros((TB, Mp), jnp.int32)
        score_acc[:] = jnp.zeros((TB, Mp), jnp.int32)

        def step(d, _):
            jj = d - ii
            jb = jj
            valid = (jj >= 0) & (jj < tlen_c) & valid_i

            # Mosaic requires lane-dim slice starts to be 128-aligned:
            # load an aligned superset window and rotate the remainder
            start = M + N - 1 - d
            start_al = pl.multiple_of((start // 128) * 128, 128)
            rem = start - start_al
            # positive-equivalent circular shift (dynamic negative shifts
            # are not reliably lowered): -rem == WIN - rem (mod WIN)
            shift = WIN - rem
            win_t = t4x_ref[:, pl.ds(start_al, WIN)]
            tj = pltpu.roll(win_t, shift, 1)[:, :Mp].astype(jnp.int32)
            win_a = ambt_ref[:, pl.ds(start_al, WIN)]
            amb_t_m = pltpu.roll(win_a, shift, 1)[:, :Mp] != 0

            if n_mismatch:
                either_n = (q4 == 15) | (tj == 15)
                V = jnp.where(either_n, mismatch,
                              jnp.where(amb_q_m | amb_t_m, 0,
                                        jnp.where(q4 == tj, match,
                                                  mismatch)))
            else:
                V = jnp.where(amb_q_m | amb_t_m, 0,
                              jnp.where(q4 == tj, match, mismatch))

            right_t = jj == (tlen_c - 1)
            QR_t = jnp.where(right_t, QR_t_r, QR_t_i)
            R_t = jnp.where(right_t, ge_t_r, ge_t_i)

            top_hm1 = -(go_q_l + (jb + 1) * ge_q_l)
            diag_top = jnp.where(jb == 0, 0, -(go_q_l + jb * ge_q_l))
            left_col = -(go_t_l + (ii + 1) * ge_t_l)
            diag_left = -(go_t_l + ii * ge_t_l)

            H2v = H2[:]
            Fv = F[:]
            H2s = pltpu.roll(H2v, 1, 1)
            F_ps = pltpu.roll(Fv, 1, 1)
            first_i = ii == 0

            diag_in = jnp.where(first_i, diag_top,
                                jnp.where(jb == 0, diag_left, H2s))
            E_in = jnp.where(jb == 0, left_col - QR_q, E[:])
            F_in = jnp.where(first_i, top_hm1 - QR_t, F_ps)

            h = diag_in + V
            d_up = F_in > h
            h = jnp.maximum(h, F_in)
            d_left = E_in > h
            h = jnp.maximum(h, E_in)

            hv = jnp.where(valid, h, 0)
            hmin[:] = jnp.minimum(hmin[:], hv)
            hmax[:] = jnp.maximum(hmax[:], hv)

            HF = h - QR_t
            Fx = F_in - R_t
            d_extup = Fx > HF
            F[:] = jnp.maximum(Fx, HF)
            HE = h - QR_q
            Ex = E_in - R_q
            d_extleft = Ex > HE
            E[:] = jnp.maximum(Ex, HE)

            H2[:] = H1[:]
            H1[:] = h

            # avoid int8 multiplies (unsupported by Mosaic): compose the
            # direction bits with int32 selects, cast once at the store
            dirs32 = (jnp.where(d_up, DIR_UP, 0)
                      | jnp.where(d_left, DIR_LEFT, 0)
                      | jnp.where(d_extup, DIR_EXTUP, 0)
                      | jnp.where(d_extleft, DIR_EXTLEFT, 0))
            dirs = jnp.where(valid, dirs32, 0).astype(jnp.uint8)

            at_end = (d == (qlen_c + tlen_c - 2)) & last_q
            score_acc[:] = score_acc[:] + jnp.where(at_end, h, 0)

            # double-buffered stream of this diagonal's direction bits
            slot = jax.lax.rem(d, 2)

            @pl.when(d >= 2)
            def _():
                pltpu.make_async_copy(
                    stage.at[slot],
                    dirs_hbm.at[d - 2, pl.ds(tile * TB, TB)],
                    sems.at[slot]).wait()

            stage[slot] = dirs
            pltpu.make_async_copy(stage.at[slot],
                                  dirs_hbm.at[d, pl.ds(tile * TB, TB)],
                                  sems.at[slot]).start()
            return ()

        jax.lax.fori_loop(0, D, step, (), unroll=False)

        # drain outstanding DMA
        pltpu.make_async_copy(stage.at[(D - 2) % 2],
                              dirs_hbm.at[D - 2, pl.ds(tile * TB, TB)],
                              sems.at[(D - 2) % 2]).wait()
        pltpu.make_async_copy(stage.at[(D - 1) % 2],
                              dirs_hbm.at[D - 1, pl.ds(tile * TB, TB)],
                              sems.at[(D - 1) % 2]).wait()

        score_ref[:] = jnp.sum(score_acc[:], axis=1, keepdims=True)
        mn = jnp.min(hmin[:], axis=1, keepdims=True)
        mx = jnp.max(hmax[:], axis=1, keepdims=True)
        over_ref[:] = ((mn <= score_min) | (mx >= SHRT_MAX)).astype(jnp.int32)

    @jax.jit
    def forward(q4, qlen, t4, tlen):
        B = q4.shape[0]
        assert B % TB == 0
        amb_lut = jnp.asarray(AMB_LUT, dtype=jnp.int32)
        q4 = jnp.pad(q4, ((0, 0), (0, Mp - M)))
        t4_ext = jnp.pad(t4[:, ::-1], ((0, 0), (M, WIN))).astype(jnp.int32)
        amb_t_ext = jnp.pad(amb_lut[t4][:, ::-1], ((0, 0), (M, WIN)),
                            constant_values=1).astype(jnp.int32)

        grid = (B // TB,)
        score, over, dirs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, Mp), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),       # q4
                pl.BlockSpec((TB, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),       # tlen
                pl.BlockSpec((TB, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),       # qlen
                pl.BlockSpec((TB, W), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),       # t4_ext
                pl.BlockSpec((TB, W), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),       # amb_t_ext
            ],
            out_specs=[
                pl.BlockSpec((TB, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),       # score
                pl.BlockSpec((TB, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),       # overflow
                pl.BlockSpec(memory_space=pl.ANY),           # dirs (HBM, full)
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
                jax.ShapeDtypeStruct((D, B, Mp), jnp.uint8),
            ],
            scratch_shapes=[
                pltpu.VMEM((TB, Mp), jnp.int32),   # H1
                pltpu.VMEM((TB, Mp), jnp.int32),   # H2
                pltpu.VMEM((TB, Mp), jnp.int32),   # E
                pltpu.VMEM((TB, Mp), jnp.int32),   # F
                pltpu.VMEM((TB, Mp), jnp.int32),   # hmin
                pltpu.VMEM((TB, Mp), jnp.int32),   # hmax
                pltpu.VMEM((TB, Mp), jnp.int32),   # score_acc
                pltpu.VMEM((2, TB, Mp), jnp.uint8),  # dir staging
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(q4, tlen[:, None], qlen[:, None], t4_ext, amb_t_ext)
        return score[:, 0], over[:, 0] != 0, dirs

    return forward
