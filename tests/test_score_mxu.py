"""Dense MXU scoring kernel (ops/score_mxu.py) exactness.

Runs in Pallas interpret mode so the kernel logic is exercised on the CPU
test mesh; on TPU runs the real Mosaic kernel path is covered by
test_device_search_parity (DeviceKmerIndex picks dense there).
"""

import numpy as np
import pytest

from vsearch_tpu import native
from vsearch_tpu.ops.score_mxu import dense_topk_kernel, pack_query_bits
from vsearch_tpu.ops.score import _topk_kernel

WORDLENGTH = 3
V = 1 << (2 * WORDLENGTH)
WORDS = 640                      # kernel minimum (20480 columns)
N_REAL = 100
QP = 128
K = 10
MAXK = 640


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(42)
    bits = np.zeros((V + 1, WORDS), dtype=np.uint32)
    tlists = []
    starts = [0]
    for p in range(N_REAL):
        nk = rng.integers(3, 40)
        tlists.append(np.sort(rng.choice(V, size=nk, replace=False))
                      .astype(np.uint32))
        starts.append(starts[-1] + nk)
    assert native.pack_bits(
        np.ascontiguousarray(np.concatenate(tlists)),
        np.asarray(starts, np.int64), N_REAL, WORDS, bits)
    qlists = []
    for q in range(17):
        nk = rng.integers(1, 50)
        qlists.append(np.sort(rng.choice(V, size=nk, replace=False))
                      .astype(np.uint32))
    return bits, qlists


@pytest.mark.parametrize("packed_keys", [True, False])
def test_dense_matches_scan_kernel(fixture, packed_keys):
    import jax.numpy as jnp
    bits, qlists = fixture
    ids = np.zeros((QP, MAXK), dtype=np.int32)
    kcounts = np.zeros(QP, dtype=np.int32)
    for qi, kl in enumerate(qlists):
        ids[qi, :kl.size] = kl
        kcounts[qi] = kl.size
    v_scan, i_scan = _topk_kernel(V, WORDS, QP, MAXK, K, N_REAL)(
        jnp.asarray(ids), jnp.asarray(kcounts), jnp.asarray(bits))
    v_scan = np.asarray(v_scan)
    i_scan = np.asarray(i_scan)

    Kb = pack_query_bits(qlists, QP, V)
    v_d, i_d = dense_topk_kernel(V, WORDS, QP, K, interpret=True,
                                 packed_keys=packed_keys)(
        jnp.asarray(Kb), jnp.asarray(bits[:V]), N_REAL)
    v_d = np.asarray(v_d)
    i_d = np.asarray(i_d)
    assert np.array_equal(v_scan, v_d)
    valid = v_scan >= 0
    assert np.array_equal(i_scan[valid], i_d[valid])


def test_multi_block_k_exceeds_block_columns(fixture):
    """Regression: k = min(tophits, n) can exceed one block's column count
    on a multi-block index (e.g. --maxaccepts 0 on a large DB);
    dense_topk_multi must clamp per-block k instead of crashing at trace
    time (lax.top_k with k > n_cols)."""
    import jax.numpy as jnp
    from vsearch_tpu.ops.score_mxu import dense_topk_multi
    bits, qlists = fixture
    n_cols = WORDS * 32
    k = n_cols + 17                      # larger than one block's columns
    Kb = pack_query_bits(qlists, QP, V)
    handle = dense_topk_multi(V, (WORDS, WORDS), QP, k, (0, n_cols),
                              packed_keys=True, interpret=True)
    v, i = handle(jnp.asarray(Kb), [jnp.asarray(bits[:V])] * 2,
                  [N_REAL, N_REAL])
    v = np.asarray(v)
    i = np.asarray(i)
    assert v.shape == (QP, k) and i.shape == (QP, k)
    # block 2's positions are offset by n_cols; per-query valid rows are
    # exactly 2*N_REAL candidates with count >= 0 ordered (count desc,
    # global position asc)
    for qi, kl in enumerate(qlists):
        valid = v[qi] >= 0
        pos = i[qi][valid]
        cnt = v[qi][valid]
        assert len(cnt) <= 2 * N_REAL
        order = np.lexsort((pos, -cnt))
        assert np.array_equal(order, np.arange(len(cnt)))


def test_dense_ranked_matches_scan_ranked(fixture):
    """Growing-index dense MXU tier (dense_topk_ranked_kernel) must be
    bit-identical to the scan ranked kernel (score_grow._topk_ranked_kernel)
    for an arbitrary position insertion order."""
    import jax.numpy as jnp
    from vsearch_tpu.ops.score_grow import (_topk_ranked_kernel, RANK_MAX)
    from vsearch_tpu.ops.score_mxu import (dense_topk_ranked_kernel,
                                           NBLK, WBLK)
    bits, qlists = fixture
    n_cols = WORDS * 32
    rng = np.random.default_rng(3)
    # random heap order over the occupied positions; unoccupied = RANK_MAX
    rank = np.full(n_cols, RANK_MAX, dtype=np.int32)
    rank[rng.permutation(N_REAL)] = np.arange(N_REAL, dtype=np.int32)

    ids = np.zeros((QP, MAXK), dtype=np.int32)
    kcounts = np.zeros(QP, dtype=np.int32)
    for qi, kl in enumerate(qlists):
        ids[qi, :kl.size] = kl
        kcounts[qi] = kl.size
    v_scan, i_scan = _topk_ranked_kernel(V, WORDS, QP, MAXK, K)(
        jnp.asarray(ids), jnp.asarray(kcounts), jnp.asarray(bits),
        jnp.asarray(rank))
    v_scan = np.asarray(v_scan)
    i_scan = np.asarray(i_scan)

    # permute rank into kernel column order (score_grow._rank_perm)
    j = np.arange(n_cols)
    r = j % NBLK
    pos = (j // NBLK) * NBLK + 32 * (r % WBLK) + r // WBLK
    rank_perm = np.ascontiguousarray(rank[pos])
    Kb = pack_query_bits(qlists, QP, V)
    v_d, i_d = dense_topk_ranked_kernel(V, WORDS, QP, K, interpret=True)(
        jnp.asarray(Kb), jnp.asarray(bits), jnp.asarray(rank_perm))
    v_d = np.asarray(v_d)
    i_d = np.asarray(i_d)
    assert np.array_equal(v_scan, v_d)
    valid = v_scan >= 0
    assert np.array_equal(i_scan[valid], i_d[valid])
