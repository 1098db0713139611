#!/usr/bin/env python3
"""NW DP kernel microbench: cell updates/s per chip (BASELINE.md north star).

Times the full production alignment kernel (forward + device backtrack +
ops fetch) at representative pair-batch geometries for each implementation
tier — pallas2 (row-scan, the TPU default), pallas (r2 wavefront), xla
(scan fallback) — and prints one JSON line per measurement:

    {"metric": "nw_gcups_pallas2_600", "value": ..., "unit": "GCUPS", ...}

Timing model: NRUNS dispatches chained through a data dependency (each
call's input depends on the previous call's score vector) with a single
final fetch — this measures sustained on-device execution, the
"cell updates/s per chip" the metric asks for.  The tunneled host<->device
fetch latency is excluded: the production pipeline (core/search.py)
overlaps fetches with host replay/emission, so it is not part of the
kernel's chip rate.  (r2's bench fetched per call through the tunnel,
understating the wavefront kernel roughly 2x.)

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
    from vsearch_tpu.ops.nw_jax import (_build_kernels, encode_padded,
                                        encode_rowT)

    key = (2, -4, 20, 20, 20, 20, 20, 20, 2, 2, 2, 2, 2, 2, False)
    rng = np.random.default_rng(0)

    REF_16T_GCUPS = 16.0
    NRUNS = 4
    saved_impl = os.environ.get("VSEARCH_TPU_NW_IMPL")

    for L, B in ((600, 1024), (1500, 256)):
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
        qmT_h, amT_h = encode_rowT(qs, B, M, key[1], bool(key[14]))
        qmT = jnp.asarray(qmT_h)
        amT = jnp.asarray(amT_h)
        t4T = jnp.asarray(np.ascontiguousarray(np.asarray(
            encode_padded(ts, B, N)).T))
        ql = jnp.asarray(np.full(B, L, np.int32))
        tl = jnp.asarray(np.full(B, L, np.int32))
        cells = B * L * L

        for name in ("pallas2", "pallas", "xla"):
            os.environ["VSEARCH_TPU_NW_IMPL"] = name
            nw_jax._build_kernels.cache_clear()
            try:
                kern = _build_kernels(key, M, N, B)
                rowT = getattr(kern, "wire", None) == "rowT"

                @jax.jit
                def chain(qa, qb, ql, ta, tl):
                    def body(i, acc):
                        dep = (acc[0:1] & 0).astype(jnp.int8)
                        if rowT:
                            s, o, ops = kern(qa + dep[None, :], qb, ql,
                                             ta, tl)
                        else:
                            s, o, ops = kern(qa + dep[:, None], ql, ta, tl)
                        # thread the BACKTRACK output through the chain
                        # dependency too — with only `s` consumed, XLA
                        # dead-code-eliminates the backtrack and the
                        # "fwd+backtrack" number overstates (r3 verdict)
                        opsum = jnp.sum(ops.astype(jnp.int32), axis=0)
                        return acc + s + opsum
                    return jax.lax.fori_loop(
                        0, NRUNS, body, jnp.zeros((B,), jnp.int32))

                args = (qmT, amT, ql, t4T, tl) if rowT \
                    else (q4, q4, ql, t4, tl)
                jax.device_get(chain(*args))    # warm (compile)
                samples = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.device_get(chain(*args))
                    samples.append((time.perf_counter() - t0) / NRUNS)
                samples.sort()
                dt = samples[1]                 # median of 3
            except Exception as exc:
                print("bench_nw: %s L=%d failed: %s" % (name, L, exc),
                      file=sys.stderr)
                continue
            gcups = cells / dt / 1e9
            print(json.dumps({
                "metric": "nw_gcups_%s_%d" % (name, L),
                "value": round(gcups, 2),
                "unit": "GCUPS",
                "gcups_min_med_max": [round(cells / s / 1e9, 2)
                                      for s in (samples[-1], dt,
                                                samples[0])],
                "vs_baseline": round(gcups / REF_16T_GCUPS, 3),
            }))
    # restore the caller's setting (pop only if it was absent before)
    if saved_impl is None:
        os.environ.pop("VSEARCH_TPU_NW_IMPL", None)
    else:
        os.environ["VSEARCH_TPU_NW_IMPL"] = saved_impl
    nw_jax._build_kernels.cache_clear()


if __name__ == "__main__":
    run()
