"""Multi-block device k-mer index == single-block, bit for bit.

The blocked layout (DeviceKmerIndex.BLOCK_POS) is how multi-million-sequence
databases fit the scan accumulator; the per-block top-k merge must reproduce
the single-block kernel's exact candidate order (count desc, heap position
asc — minheap_compare's total order).
"""

import numpy as np
import pytest


def test_blocked_topk_matches_single_block():
    from vsearch_tpu.ops.score import DeviceKmerIndex

    rng = np.random.RandomState(7)
    n = 2500
    kmer_lists = [np.unique(rng.randint(0, 65536, rng.randint(20, 250))
                            .astype(np.uint32)) for _ in range(n)]
    lengths = rng.randint(80, 400, n)
    mapping = np.arange(n)
    queries = [np.unique(rng.randint(0, 65536, 180).astype(np.uint32))
               for _ in range(33)]

    di1 = DeviceKmerIndex(8, kmer_lists, lengths, mapping)
    assert len(di1.blocks) == 1
    v1, i1 = di1.topk(queries, 37)

    old = DeviceKmerIndex.BLOCK_POS
    try:
        DeviceKmerIndex.BLOCK_POS = 600
        di2 = DeviceKmerIndex(8, kmer_lists, lengths, mapping)
        assert len(di2.blocks) > 3
        v2, i2 = di2.topk(queries, 37)
    finally:
        DeviceKmerIndex.BLOCK_POS = old

    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
