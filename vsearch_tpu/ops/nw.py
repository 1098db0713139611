"""Global Needleman-Wunsch alignment with vsearch's position-class affine gaps.

Semantics mirror the reference SIMD aligner (src/core/align_simd.cpp):

* score matrix: match on the diagonal, 0 against ambiguous codes unless
  ``n_mismatch`` (then N rows/cols score as mismatch) (align_simd.cpp:1319-1342)
* six gap penalty classes: (query|target) x (left|interior|right); opens are
  pre-adjusted by the CLI fixups so QR = open + extension
* direction bits with the priorities of onestep() (align_simd.cpp:710-717,
  752-781) and the backtrack order of backtrack16 (:1161-1210)
* the SIMD representability limits — qlen+dlen <= 65535 and
  qlen*dlen <= 25e6 (:88-89) — and the 16-bit overflow detection thresholds
  (compute_score_min, :1432-1444); pairs outside either produce the
  SHRT_MAX sentinel and are realigned by the linear-memory fallback
  (core/linmemalign.cpp semantics), exactly as the reference does.

This module holds the scheme, the exact scalar oracle (tests / tiny inputs)
and the cigar/stat assembly shared with the batched device path (nw_jax.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..params import Parameters
from ..utils.maps import CHRMAP_4BIT, AMBIGUOUS_4BIT

SHRT_MAX = 32767
MAXSEQLENPRODUCT = 25000000
MAXSEQLENSUM = 65535

# direction bit layout in this implementation (per cell, uint8)
DIR_UP = 1        # F > H+V before maxes (4th priority in backtrack)
DIR_LEFT = 2      # E > max(H+V, F)     (3rd priority)
DIR_EXTUP = 4     # F-R  > H-QR (target) (2nd priority)
DIR_EXTLEFT = 8   # E-R  > H-QR (query)  (1st priority)


def fits_simd(qlen: int, dlen: int) -> bool:
    """reference: align_simd.cpp search16_fits (:130-134)"""
    return (qlen + dlen <= MAXSEQLENSUM) and (qlen * dlen <= MAXSEQLENPRODUCT)


@dataclasses.dataclass
class ScoreScheme:
    """Penalties as the aligner sees them (post CLI fixups)."""
    match: int
    mismatch: int
    # gap open penalties already have the extension subtracted (fixups)
    go_q_left: int
    go_t_left: int
    go_q_int: int
    go_t_int: int
    go_q_right: int
    go_t_right: int
    ge_q_left: int
    ge_t_left: int
    ge_q_int: int
    ge_t_int: int
    ge_q_right: int
    ge_t_right: int
    n_mismatch: bool
    force_scalar_fallback: bool = False

    @classmethod
    def from_params(cls, p: Parameters) -> "ScoreScheme":
        scheme = cls(
            match=p.opt_match, mismatch=p.opt_mismatch,
            go_q_left=p.opt_gap_open_query_left,
            go_t_left=p.opt_gap_open_target_left,
            go_q_int=p.opt_gap_open_query_interior,
            go_t_int=p.opt_gap_open_target_interior,
            go_q_right=p.opt_gap_open_query_right,
            go_t_right=p.opt_gap_open_target_right,
            ge_q_left=p.opt_gap_extension_query_left,
            ge_t_left=p.opt_gap_extension_target_left,
            ge_q_int=p.opt_gap_extension_query_interior,
            ge_t_int=p.opt_gap_extension_target_interior,
            ge_q_right=p.opt_gap_extension_query_right,
            ge_t_right=p.opt_gap_extension_target_right,
            n_mismatch=p.opt_n_mismatch,
        )
        # 16-bit representability of scores/penalties
        # (reference: align_simd.cpp clamp_to_cell, :1256-1277)
        penalty_limit = SHRT_MAX // 5  # SHRT_MAX / (1 + CDEPTH)
        for v in (scheme.match, scheme.mismatch):
            if abs(v) > SHRT_MAX:
                scheme.force_scalar_fallback = True
        for v in (scheme.go_q_left, scheme.go_t_left, scheme.go_q_int,
                  scheme.go_t_int, scheme.go_q_right, scheme.go_t_right,
                  scheme.ge_q_left, scheme.ge_t_left, scheme.ge_q_int,
                  scheme.ge_t_int, scheme.ge_q_right, scheme.ge_t_right):
            if abs(v) > penalty_limit:
                scheme.force_scalar_fallback = True
        return scheme

    def score_matrix(self) -> np.ndarray:
        """16x16 int32 matrix over 4-bit codes (align_simd.cpp:1319-1342)."""
        sm = np.zeros((16, 16), dtype=np.int32)
        for i in range(16):
            for j in range(16):
                if self.n_mismatch and (i == 15 or j == 15):
                    sm[i, j] = self.mismatch
                elif AMBIGUOUS_4BIT[i] or AMBIGUOUS_4BIT[j]:
                    sm[i, j] = 0
                elif i == j:
                    sm[i, j] = self.match
                else:
                    sm[i, j] = self.mismatch
        return sm

    def score_min(self) -> int:
        """Overflow threshold (align_simd.cpp compute_score_min :1432-1444)."""
        gap_penalty_max = max(
            0,
            self.go_q_left + self.ge_q_left,
            self.go_q_int + self.ge_q_int,
            self.go_q_right + self.ge_q_right,
            self.go_t_left + self.ge_t_left,
            self.go_t_int + self.ge_t_int,
            self.go_t_right + self.ge_t_right)
        return -32768 + gap_penalty_max


@dataclasses.dataclass
class AlignmentResult:
    score: int                 # SHRT_MAX sentinel when not representable
    cigar: str                 # run-length 'M/D/I' string, query-major
    aligned: int
    matches: int
    mismatches: int
    gaps: int


def dp_matrix_host(scheme: ScoreScheme, q4: np.ndarray,
                   t4: np.ndarray) -> Tuple[int, np.ndarray, bool]:
    """Exact scalar DP — the oracle.

    Returns (score, dir matrix (m, n) uint8, overflow).  Mirrors the
    vectorized onestep()/aligncolumns data flow of the reference with plain
    loops; int64 arithmetic with explicit 16-bit overflow *detection* (not
    saturation — see align_simd analysis: detection thresholds fire before
    saturation can alter any value).
    """
    m, n = len(q4), len(t4)
    sm = scheme.score_matrix()
    QR_q_int = scheme.go_q_int + scheme.ge_q_int
    QR_q_right = scheme.go_q_right + scheme.ge_q_right
    QR_t_int = scheme.go_t_int + scheme.ge_t_int
    QR_t_right = scheme.go_t_right + scheme.ge_t_right
    R_q_int, R_q_right = scheme.ge_q_int, scheme.ge_q_right
    R_t_int, R_t_right = scheme.ge_t_int, scheme.ge_t_right
    qgoL, qgeL = scheme.go_q_left, scheme.ge_q_left
    tgoL, tgeL = scheme.go_t_left, scheme.ge_t_left

    score_min = scheme.score_min()
    hmin, hmax = 0, 0

    dirs = np.zeros((m, n), dtype=np.uint8)
    # column state carried over j: H of previous column, E per row
    H_prev = np.zeros(m, dtype=np.int64)   # H[i][j-1]
    E_row = np.zeros(m, dtype=np.int64)    # E entering column j per row

    for j in range(n):
        right_t = (j == n - 1)
        QR_t = QR_t_right if right_t else QR_t_int
        R_t = R_t_right if right_t else R_t_int
        # boundary above: H[-1][j]
        h_boundary_top = -(qgoL + (j + 1) * qgeL)
        h_diag = -(qgoL + j * qgeL) if j > 0 else 0  # H[-1][j-1]
        F = h_boundary_top - QR_t                    # F entering row 0
        H_col = np.zeros(m, dtype=np.int64)
        for i in range(m):
            right_q = (i == m - 1)
            QR_q = QR_q_right if right_q else QR_q_int
            R_q = R_q_right if right_q else R_q_int
            if j == 0:
                # left boundary: E opens from H[i][-1]
                E = -(tgoL + (i + 1) * tgeL) - QR_q
                diag_in = -(tgoL + i * tgeL) if i > 0 else 0
            else:
                E = E_row[i]
                diag_in = h_diag
            h = diag_in + int(sm[q4[i], t4[j]])
            d = 0
            if F > h:
                d |= DIR_UP
            h = max(h, F)
            if E > h:
                d |= DIR_LEFT
            h = max(h, E)
            hmin = min(hmin, h)
            hmax = max(hmax, h)
            HF = h - QR_t
            Fx = F - R_t
            if Fx > HF:
                d |= DIR_EXTUP
            F_next = max(Fx, HF)
            HE = h - QR_q
            Ex = E - R_q
            if Ex > HE:
                d |= DIR_EXTLEFT
            E_row[i] = max(Ex, HE)
            dirs[i, j] = d
            h_diag = H_prev[i]  # H[i][j-1] becomes diag for (i+1, j)
            H_col[i] = h
            F = F_next
        H_prev = H_col

    overflow = (hmin <= score_min) or (hmax >= SHRT_MAX)
    return int(H_prev[m - 1]), dirs, overflow


def backtrack_ops(dirs: np.ndarray, m: int, n: int) -> List[str]:
    """Ops from (m-1, n-1) back to origin, returned in forward order.

    reference: align_simd.cpp backtrack16 (:1144-1233)."""
    ops: List[str] = []
    i, j = m - 1, n - 1
    op = ""
    while i >= 0 and j >= 0:
        d = int(dirs[i, j])
        if op == "I" and (d & DIR_EXTLEFT):
            j -= 1
            op = "I"
        elif op == "D" and (d & DIR_EXTUP):
            i -= 1
            op = "D"
        elif d & DIR_LEFT:
            j -= 1
            op = "I"
        elif d & DIR_UP:
            i -= 1
            op = "D"
        else:
            i -= 1
            j -= 1
            op = "M"
        ops.append(op)
    while i >= 0:
        ops.append("D")
        i -= 1
    while j >= 0:
        ops.append("I")
        j -= 1
    ops.reverse()
    return ops


def ops_to_cigar(ops: List[str]) -> str:
    """Run-length encode ops ('3M2I...'); runs of 1 printed without count."""
    out: List[str] = []
    prev = ""
    count = 0
    for op in ops:
        if op == prev:
            count += 1
        else:
            if prev:
                out.append(("%d%s" % (count, prev)) if count > 1 else prev)
            prev = op
            count = 1
    if prev:
        out.append(("%d%s" % (count, prev)) if count > 1 else prev)
    return "".join(out)


def ops_stats(ops: List[str], scheme: ScoreScheme, qseq: bytes,
              tseq: bytes) -> Tuple[int, int, int, int]:
    """(aligned, matches, mismatches, gaps) per backtrack16 counting."""
    aligned = len(ops)
    matches = 0
    mismatches = 0
    gaps = 0
    i = j = 0
    prev = ""
    q4 = CHRMAP_4BIT[np.frombuffer(qseq, dtype=np.uint8)]
    t4 = CHRMAP_4BIT[np.frombuffer(tseq, dtype=np.uint8)]
    for op in ops:
        if op == "M":
            qa, ta = int(q4[i]), int(t4[j])
            if (qa & ta) != 0:
                if scheme.n_mismatch and (qa == 15 or ta == 15):
                    mismatches += 1
                else:
                    matches += 1
            else:
                mismatches += 1
            i += 1
            j += 1
        elif op == "D":
            if prev != "D":
                gaps += 1
            i += 1
        else:  # I
            if prev != "I":
                gaps += 1
            j += 1
        prev = op
    return aligned, matches, mismatches, gaps


def align_pair_host(scheme: ScoreScheme, qseq: bytes,
                    tseq: bytes) -> AlignmentResult:
    """Reference-exact alignment of one pair (the search16 per-pair view).

    Returns the SHRT_MAX sentinel for pairs the 16-bit engine cannot
    represent (size limits, score overflow, infinite penalties, empty
    target), matching search16's outputs (align_simd.cpp:1463-1540,
    :1827-1882).  The caller is responsible for the linear-memory fallback.
    """
    m, n = len(qseq), len(tseq)
    if scheme.force_scalar_fallback:
        return AlignmentResult(SHRT_MAX, "", 0, 0, 0, 0)
    if m == 0:
        if not fits_simd(m, n):
            return AlignmentResult(SHRT_MAX, "", 0, 0, 0, 0)
        if n == 0:
            return AlignmentResult(0, "", 0, 0, 0, 0)
        score = max(-scheme.go_t_left - n * scheme.ge_t_left,
                    -scheme.go_t_right - n * scheme.ge_t_right)
        return AlignmentResult(int(score), "%dI" % n, n, 0, 0, n)
    if n == 0 or not fits_simd(m, n):
        # empty targets are skipped by the channel refill loop and reported
        # via the sentinel (align_simd.cpp:1867-1882)
        return AlignmentResult(SHRT_MAX, "", 0, 0, 0, 0)

    q4 = CHRMAP_4BIT[np.frombuffer(qseq, dtype=np.uint8)]
    t4 = CHRMAP_4BIT[np.frombuffer(tseq, dtype=np.uint8)]
    score, dirs, overflow = dp_matrix_host(scheme, q4, t4)
    if overflow:
        return AlignmentResult(SHRT_MAX, "", 0, 0, 0, 0)
    ops = backtrack_ops(dirs, m, n)
    aligned, matches, mismatches, gaps = ops_stats(ops, scheme, qseq, tseq)
    return AlignmentResult(score, ops_to_cigar(ops), aligned, matches,
                           mismatches, gaps)
