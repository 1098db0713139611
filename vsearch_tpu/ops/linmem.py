"""Linear-memory (Hirschberg/Myers-Miller) exact global aligner.

Behavioral mirror of reference src/core/linmemalign.cpp: the divide and
conquer recursion with position-class gap penalties, 64-bit scores and no
length limit.  Used exactly where the reference uses it — for pairs the
16-bit engine cannot represent (size limits, overflow, infinite penalties,
empty sequences).  The CIGAR choice must match the reference's recursion
tie-breaks, so the structure of diff() is reproduced (with the inner DP rows
vectorized in numpy).
"""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from ..utils.maps import CHRMAP_4BIT
from .nw import AlignmentResult, ScoreScheme

INT64_MIN = -(2**63)


class _LinMem:
    def __init__(self, scheme: ScoreScheme, a_seq: bytes, b_seq: bytes) -> None:
        self.s = scheme
        self.a = np.frombuffer(a_seq, dtype=np.uint8)
        self.b = np.frombuffer(b_seq, dtype=np.uint8)
        self.a4 = CHRMAP_4BIT[self.a].astype(np.int64)
        self.b4 = CHRMAP_4BIT[self.b].astype(np.int64)
        self.sm = scheme.score_matrix().astype(np.int64)
        self.ops: List[tuple] = []  # (op, run)

    def cigar_add(self, op: str, run: int) -> None:
        if self.ops and self.ops[-1][0] == op:
            self.ops[-1] = (op, self.ops[-1][1] + run)
        else:
            self.ops.append((op, run))

    def subst(self, a_idx: int, b_idx: int) -> int:
        # reference subst_score(lhs, rhs) = scorematrix[map(rhs)][map(lhs)];
        # the matrix is symmetric so orientation is immaterial
        return int(self.sm[self.b4[b_idx], self.a4[a_idx]])

    def diff(self, a_start: int, b_start: int, a_len: int, b_len: int,
             gap_b_left: bool, gap_b_right: bool,
             a_left: bool, a_right: bool,
             b_left: bool, b_right: bool) -> None:
        s = self.s
        if b_len == 0:
            if a_len > 0:
                self.cigar_add("D", a_len)
            return
        if a_len == 0:
            self.cigar_add("I", b_len)
            return
        if a_len == 1:
            # three possibilities scan (linmemalign.cpp:339-454)
            score = 0
            if not gap_b_left:
                score -= s.go_t_left if b_left else s.go_t_int
            score -= s.ge_t_left if b_left else s.ge_t_int
            score -= (s.go_q_right + b_len * s.ge_q_right) if a_right \
                else (s.go_q_int + b_len * s.ge_q_int)
            max_score = score
            best = -1

            score -= (s.go_q_left + b_len * s.ge_q_left) if a_left \
                else (s.go_q_int + b_len * s.ge_q_int)
            if not gap_b_right:
                score -= s.go_t_right if b_right else s.go_t_int
            score -= s.ge_t_right if b_right else s.ge_t_int
            if score > max_score:
                max_score = score
                best = b_len

            for i in range(b_len):
                score = 0
                if i > 0:
                    score -= (s.go_q_left + i * s.ge_q_left) if a_left \
                        else (s.go_q_int + i * s.ge_q_int)
                score += self.subst(a_start, b_start + i)
                if i < b_len - 1:
                    score -= (s.go_q_right + (b_len - 1 - i) * s.ge_q_right) \
                        if a_right else (s.go_q_int + (b_len - 1 - i) * s.ge_q_int)
                if score > max_score:
                    max_score = score
                    best = i

            if best == -1:
                self.cigar_add("D", 1)
                self.cigar_add("I", b_len)
            elif best == b_len:
                self.cigar_add("I", b_len)
                self.cigar_add("D", 1)
            else:
                if best > 0:
                    self.cigar_add("I", best)
                self.cigar_add("M", 1)
                if best < b_len - 1:
                    self.cigar_add("I", b_len - 1 - best)
            return

        # a_len >= 2 (linmemalign.cpp:455-672)
        half = a_len // 2

        HH, EE = self._forward(a_start, b_start, half, b_len,
                               gap_b_left, a_left, b_left, b_right)
        XX, YY = self._reverse(a_start, b_start, a_len, a_len - half, b_len,
                               gap_b_right, a_right, b_left, b_right)

        # find division point
        score0 = HH + XX[::-1]
        best0 = int(np.argmax(score0))
        max0 = int(score0[best0])

        g = np.full(b_len + 1, s.go_t_int, dtype=np.int64)
        if b_left:
            g[0] = s.go_t_left
        if b_right:
            g[b_len] = s.go_t_right
        with np.errstate(over="ignore"):
            score1 = EE + YY[::-1] + g
        # guard: EE/YY contain INT64_MIN sentinels; replicate C wraparound-free
        # compare by using python ints at the argmax boundary
        best1 = 0
        max1 = INT64_MIN
        for i in range(b_len + 1):
            val = int(EE[i]) + int(YY[b_len - i]) + int(g[i])
            if val > max1:
                max1 = val
                best1 = i

        if max0 > max1:
            part, best = 0, best0
        elif max1 > max0:
            part, best = 1, best1
        else:
            if best0 <= best1:
                part, best = 0, best0
            else:
                part, best = 1, best1

        if part == 0:
            self.diff(a_start, b_start, half, best,
                      gap_b_left, False, a_left, False,
                      b_left, b_right and best == b_len)
            self.diff(a_start + half, b_start + best,
                      a_len - half, b_len - best,
                      False, gap_b_right, False, a_right,
                      b_left and best == 0, b_right)
        else:
            self.diff(a_start, b_start, half - 1, best,
                      gap_b_left, True, a_left, False,
                      b_left, b_right and best == b_len)
            self.cigar_add("D", 2)
            self.diff(a_start + half + 1, b_start + best,
                      a_len - half - 1, b_len - best,
                      True, gap_b_right, False, a_right,
                      b_left and best == 0, b_right)

    def _forward(self, a_start, b_start, half, b_len, gap_b_left, a_left,
                 b_left, b_right):
        s = self.s
        HH = np.zeros(b_len + 1, dtype=object)
        EE = np.zeros(b_len + 1, dtype=object)
        js = np.arange(1, b_len + 1, dtype=np.int64)
        if a_left:
            HH[1:] = -(s.go_q_left + js * s.ge_q_left)
        else:
            HH[1:] = -(s.go_q_int + js * s.ge_q_int)
        EE[1:] = INT64_MIN

        for i in range(1, half + 1):
            p = int(HH[0])
            if b_left:
                h = -((0 if gap_b_left else s.go_t_left) + i * s.ge_t_left)
            else:
                h = -((0 if gap_b_left else s.go_t_int) + i * s.ge_t_int)
            HH[0] = h
            f = INT64_MIN
            for j in range(1, b_len + 1):
                f = max(f, h - s.go_q_int) - s.ge_q_int
                if b_right and j == b_len:
                    EE[j] = max(int(EE[j]), int(HH[j]) - s.go_t_right) - s.ge_t_right
                else:
                    EE[j] = max(int(EE[j]), int(HH[j]) - s.go_t_int) - s.ge_t_int
                h_new = p + self.subst(a_start + i - 1, b_start + j - 1)
                h_new = max(f, h_new)
                h_new = max(int(EE[j]), h_new)
                p = int(HH[j])
                HH[j] = h_new
                h = h_new
            # note: 'h' after the loop is unused by the reference
        EE[0] = HH[0]
        return HH, EE

    def _reverse(self, a_start, b_start, a_len, rows, b_len, gap_b_right,
                 a_right, b_left, b_right):
        s = self.s
        XX = np.zeros(b_len + 1, dtype=object)
        YY = np.zeros(b_len + 1, dtype=object)
        js = np.arange(1, b_len + 1, dtype=np.int64)
        if a_right:
            XX[1:] = -(s.go_q_right + js * s.ge_q_right)
        else:
            XX[1:] = -(s.go_q_int + js * s.ge_q_int)
        YY[1:] = INT64_MIN

        for i in range(1, rows + 1):
            p = int(XX[0])
            if b_right:
                h = -((0 if gap_b_right else s.go_t_right) + i * s.ge_t_right)
            else:
                h = -((0 if gap_b_right else s.go_t_int) + i * s.ge_t_int)
            XX[0] = h
            f = INT64_MIN
            for j in range(1, b_len + 1):
                f = max(f, h - s.go_q_int) - s.ge_q_int
                if b_left and j == b_len:
                    YY[j] = max(int(YY[j]), int(XX[j]) - s.go_t_left) - s.ge_t_left
                else:
                    YY[j] = max(int(YY[j]), int(XX[j]) - s.go_t_int) - s.ge_t_int
                h_new = p + self.subst(a_start + a_len - i, b_start + b_len - j)
                h_new = max(f, h_new)
                h_new = max(int(YY[j]), h_new)
                p = int(XX[j])
                XX[j] = h_new
                h = h_new
        YY[0] = XX[0]
        return XX, YY


def linmem_cigar(scheme: ScoreScheme, a_seq: bytes, b_seq: bytes) -> str:
    lm = _LinMem(scheme, a_seq, b_seq)
    lm.diff(0, 0, len(a_seq), len(b_seq), False, False, True, True, True, True)
    return "".join(("%d%s" % (run, op)) if run > 1 else op
                   for op, run in lm.ops)


def linmem_alignstats(scheme: ScoreScheme, cigar: str, a_seq: bytes,
                      b_seq: bytes) -> AlignmentResult:
    """reference: linmemalign.cpp alignstats (:702-809)."""
    import re
    s = scheme
    a4 = CHRMAP_4BIT[np.frombuffer(a_seq, dtype=np.uint8)]
    b4 = CHRMAP_4BIT[np.frombuffer(b_seq, dtype=np.uint8)]
    sm = scheme.score_matrix()
    score = 0
    alnlen = 0
    matches = 0
    mismatches = 0
    gaps = 0
    a_pos = b_pos = 0
    tokens = re.findall(r"(\d*)([MDI])", cigar)
    for idx, (count, op) in enumerate(tokens):
        run = int(count) if count else 1
        last = idx == len(tokens) - 1
        if op == "M":
            alnlen += run
            for _ in range(run):
                an, bn = int(a4[a_pos]), int(b4[b_pos])
                score += int(sm[bn, an])
                if s.n_mismatch and (an == 15 or bn == 15):
                    mismatches += 1
                elif (an & bn) != 0:
                    matches += 1
                else:
                    mismatches += 1
                a_pos += 1
                b_pos += 1
        elif op == "I":
            if a_pos == 0 and b_pos == 0:
                g = s.go_q_left + run * s.ge_q_left
            elif last:
                g = s.go_q_right + run * s.ge_q_right
            else:
                g = s.go_q_int + run * s.ge_q_int
            score -= g
            gaps += 1
            alnlen += run
            b_pos += run
        else:  # D
            if a_pos == 0 and b_pos == 0:
                g = s.go_t_left + run * s.ge_t_left
            elif last:
                g = s.go_t_right + run * s.ge_t_right
            else:
                g = s.go_t_int + run * s.ge_t_int
            score -= g
            gaps += 1
            alnlen += run
            a_pos += run
        del last
    return AlignmentResult(score, cigar, alnlen, matches, mismatches, gaps)


def linmem_align(scheme: ScoreScheme, a_seq: bytes,
                 b_seq: bytes) -> AlignmentResult:
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 10000))
    cigar = linmem_cigar(scheme, a_seq, b_seq)
    return linmem_alignstats(scheme, cigar, a_seq, b_seq)
