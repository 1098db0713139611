#!/usr/bin/env python3
"""NW DP kernel microbench: cell updates/s per chip (BASELINE.md north star).

Times the full production alignment kernel (forward wavefront + device
backtrack + ops fetch) at representative pair-batch geometries, for both
the Pallas VMEM-resident forward (default on TPU) and the XLA scan
fallback, and prints one JSON line per measurement:

    {"metric": "nw_gcups_pallas_640", "value": ..., "unit": "GCUPS", ...}

vs_baseline is GCUPS relative to the reference's 8-lane SSE2 engine at
~1 GCUPS/core x 16 threads = ~16 GCUPS aggregate (align_simd.cpp:86-87,
Rognes 2011 SWIPE lineage) — i.e. value/16 is chips-per-16-thread-host.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def run():
    import jax
    import jax.numpy as jnp
    from vsearch_tpu.ops import nw_jax
    from vsearch_tpu.ops.nw_jax import _build_kernels, encode_padded

    key = (2, -4, 20, 20, 20, 20, 20, 20, 2, 2, 2, 2, 2, 2, False)
    rng = np.random.default_rng(0)

    def timeit(f, n=4):
        jax.device_get(f())          # warm (compile)
        t0 = time.perf_counter()
        for _ in range(n):
            r = jax.device_get(f())
        return (time.perf_counter() - t0) / n

    REF_16T_GCUPS = 16.0

    for L, B in ((600, 512), (1500, 256)):
        M = N = nw_jax._bucket(L)
        qs, ts = [], []
        for _ in range(B):
            s = rng.integers(0, 4, size=L)
            t = s.copy()
            pos = rng.integers(0, L, size=L // 20)
            t[pos] = rng.integers(0, 4, size=pos.size)
            qs.append(bytes(bytearray(b"ACGT"[c:c + 1][0] for c in s)))
            ts.append(bytes(bytearray(b"ACGT"[c:c + 1][0] for c in t)))
        q4 = jnp.asarray(encode_padded(qs, B, M))
        t4 = jnp.asarray(encode_padded(ts, B, N))
        ql = jnp.asarray(np.full(B, L, np.int32))
        tl = jnp.asarray(np.full(B, L, np.int32))
        cells = B * L * L

        for name, env in (("pallas", "1"), ("xla", "0")):
            os.environ["VSEARCH_TPU_PALLAS"] = env
            nw_jax._build_kernels.cache_clear()
            try:
                kern = _build_kernels(key, M, N, B)
                dt = timeit(lambda: kern(q4, ql, t4, tl))
            except Exception as exc:
                print("bench_nw: %s L=%d failed: %s" % (name, L, exc),
                      file=sys.stderr)
                continue
            gcups = cells / dt / 1e9
            print(json.dumps({
                "metric": "nw_gcups_%s_%d" % (name, L),
                "value": round(gcups, 2),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / REF_16T_GCUPS, 3),
            }))
    os.environ.pop("VSEARCH_TPU_PALLAS", None)


if __name__ == "__main__":
    run()
