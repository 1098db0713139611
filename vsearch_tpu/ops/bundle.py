"""Device-side fetch bundling.

On a tunneled TPU attachment every array in a ``jax.device_get`` pays its
own ~40-90 ms round-trip, so a batch whose results live in N small arrays
(per-chunk top-k values/indices + prefetch score/overflow/ops) fetches N
times slower than its payload warrants.  ``bundle_fetch`` concatenates all
int32-able per-chunk results into ONE device array (a trivial fused concat
the device executes in microseconds) so the link latency is paid once;
backtrack op matrices stay int16 and are fetched alongside (grouped as-is —
they dominate payload, not array count).

Used by the usearch_global batch pipeline (core/search.py) and the
clustering round search (core/cluster.py).
"""

from __future__ import annotations

import functools

import numpy as np

from vsearch_tpu import configure_jax as _cfg
_cfg()
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _cat_fn(sig):
    @jax.jit
    def f(parts):
        rows = [jnp.concatenate(
            [p.reshape((p.shape[0], -1)).astype(jnp.int32) for p in cp],
            axis=1) for cp in parts]
        return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
    return f


@functools.lru_cache(maxsize=64)
def _cat_ops_fn(sig):
    @jax.jit
    def f(ops_list):
        return jnp.concatenate(ops_list, axis=0)
    return f


def bundle_fetch(chunks, prefetch):
    """chunks: [(nq, (vals, idx))] per-chunk top-k device handles;
    prefetch: parallel list of per-chunk prefetch handles — either ONE
    (score, overflow, ops) device triple (top-1 prefetch, the search
    path), a LIST of such triples (top-K prefetch, the cluster path), or
    None.  Returns (meta_dev, ops_list, layout) — pass the first two
    through jax.device_get and give everything to unbundle_fetch."""
    nch = len(chunks)
    pref = prefetch if prefetch is not None else [None] * nch
    parts = []
    layout = []
    ops_order = []
    for (nq, (v, i)), pf in zip(chunks, pref):
        cp = [v, i]
        if isinstance(pf, dict):
            # compact prefetch (nw_jax._compact_gather_kernel): one
            # (qp, X) int32 meta block + one ops matrix
            cp.append(pf["mat"])
            ops_order.append(pf["ops"])
            parts.append(cp)
            layout.append((nq, v.shape[0], v.shape[1],
                           ("mat", pf["mat"].shape[1]), False))
            continue
        bare = not isinstance(pf, list)
        plist = ([] if pf is None else ([pf] if bare else pf))
        chunk_ops = []
        for (score, over, ops) in plist:
            cp += [score, over]
            chunk_ops.append(ops)
        if len(chunk_ops) > 1:
            # K ops matrices fetched as K arrays pay K link round-trips;
            # one device-side concat makes it one array per chunk
            osig = tuple((tuple(o.shape), str(o.dtype)) for o in chunk_ops)
            ops_order.append(_cat_ops_fn(osig)(chunk_ops))
        elif chunk_ops:
            ops_order.append(chunk_ops[0])
        parts.append(cp)
        layout.append((nq, v.shape[0], v.shape[1],
                       [tuple(o.shape) for o in chunk_ops], bare))
    sig = tuple(tuple((tuple(p.shape), str(p.dtype)) for p in cp)
                for cp in parts)
    meta = _cat_fn(sig)(parts)
    return meta, ops_order, layout


def unbundle_fetch(meta_h: np.ndarray, ops_h, layout):
    """Split the fetched bundle back into (topk_h, pref_h): topk_h a list
    of (vals, idx) host arrays; pref_h per chunk mirrors the input form —
    a bare (score, overflow, ops) triple, a list of triples, or None."""
    meta_h = np.asarray(meta_h)
    topk_h = []
    pref_h = []
    row = 0
    oi = 0
    for (nq, qp, k, ops_shapes, bare) in layout:
        block = meta_h[row:row + qp]
        row += qp
        topk_h.append((block[:, :k], block[:, k:2 * k]))
        if isinstance(ops_shapes, tuple) and ops_shapes[0] == "mat":
            X = ops_shapes[1]
            pref_h.append({"mat": block[:, 2 * k:2 * k + X],
                           "ops": np.asarray(ops_h[oi])})
            oi += 1
            continue
        npref = len(ops_shapes)
        if npref == 0:
            pref_h.append(None)
            continue
        chunk_ops = np.asarray(ops_h[oi])
        oi += 1
        triples = []
        srow = 0
        for j, oshape in enumerate(ops_shapes):
            score = block[:, 2 * k + 2 * j]
            over = block[:, 2 * k + 2 * j + 1].astype(bool)
            triples.append((score, over,
                            chunk_ops[srow:srow + oshape[0]]))
            srow += oshape[0]
        pref_h.append(triples[0] if bare else triples)
    return topk_h, pref_h
