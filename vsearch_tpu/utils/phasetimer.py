"""Opt-in wall-clock phase accumulators for the search pipeline.

Enabled with VSEARCH_TPU_PHASES=1 (bench.py sets it for its breakdown
report); disabled, the context manager is a no-op with one dict lookup.

Phases instrumented in the usearch_global pipeline:
  load       db read + index build + device upload
  prep       query batch host prep (masking, unique-kmer extraction)
  dispatch   device top-k + top-1 prefetch dispatch (async, host side)
  topk_fetch bundled device->host fetch wait (top-k + prefetch rows)
  prefetch   prefetch table assembly (native CIGAR batch)
  align      alignment rounds (device NW + host assembly + linmem)
  walk       accept/reject replay walks (host)
  emit       hit joining + output writing
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager

ENABLED = os.environ.get("VSEARCH_TPU_PHASES", "0") == "1"
acc: dict = defaultdict(float)
counts: dict = defaultdict(int)


@contextmanager
def phase(name: str):
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        acc[name] += time.perf_counter() - t0
        counts[name] += 1


def reset() -> None:
    acc.clear()
    counts.clear()


def report() -> str:
    total = sum(acc.values())
    lines = ["phase breakdown (%.3fs instrumented):" % total]
    for name, t in sorted(acc.items(), key=lambda kv: -kv[1]):
        lines.append("  %-11s %7.3fs (%4.1f%%, n=%d)"
                     % (name, t, 100.0 * t / total if total else 0.0,
                        counts[name]))
    return "\n".join(lines)
