"""Device-side fetch bundling.

On a tunneled TPU attachment every array in a ``jax.device_get`` pays its
own ~40-90 ms round-trip, so a batch whose results live in N small arrays
(per-chunk top-k values/indices + prefetch score/overflow/ops) fetches N
times slower than its payload warrants.  ``bundle_fetch`` concatenates all
int32-able per-chunk results into ONE device array (a trivial fused concat
the device executes in microseconds) so the link latency is paid once;
backtrack op matrices stay int8 and are fetched alongside (grouped as-is —
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


def bundle_fetch(chunks, prefetch):
    """chunks: [(nq, (vals, idx))] per-chunk top-k device handles;
    prefetch: parallel list of (score, overflow, ops) device tuples (or
    None entries / None).  Returns (meta_dev, ops_list, layout) — pass the
    first two through jax.device_get and give everything to
    unbundle_fetch."""
    nch = len(chunks)
    pref = prefetch if prefetch is not None else [None] * nch
    parts = []
    layout = []
    for (nq, (v, i)), pf in zip(chunks, pref):
        cp = [v, i]
        if pf is not None:
            score, over, ops = pf
            cp += [score, over]
        parts.append(cp)
        layout.append((nq, v.shape[0], v.shape[1], pf is not None))
    sig = tuple(tuple((tuple(p.shape), str(p.dtype)) for p in cp)
                for cp in parts)
    meta = _cat_fn(sig)(parts)
    ops_list = [pf[2] for pf in pref if pf is not None]
    return meta, ops_list, layout


def unbundle_fetch(meta_h: np.ndarray, ops_h, layout):
    """Split the fetched bundle back into (topk_h, pref_h): topk_h a list
    of (vals, idx) host arrays; pref_h a list of (score, overflow, ops)
    or None per chunk (the shapes the walk consumers expect)."""
    meta_h = np.asarray(meta_h)
    topk_h = []
    pref_h = []
    row = 0
    oi = 0
    for (nq, qp, k, has_pref) in layout:
        block = meta_h[row:row + qp]
        row += qp
        topk_h.append((block[:, :k], block[:, k:2 * k]))
        if has_pref:
            score = block[:, 2 * k]
            over = block[:, 2 * k + 1].astype(bool)
            pref_h.append((score, over, ops_h[oi]))
            oi += 1
        else:
            pref_h.append(None)
    return topk_h, pref_h
