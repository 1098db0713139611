"""Parity of the growing device k-mer index (ops/score_grow.py).

Clustering and denovo chimera grow their index mid-run; on TPU the
candidate scoring moves to a scatter-append packed-bit device index once
the centroid/reference set crosses a threshold.  These tests force the
threshold to ~0 via env so the device path is exercised from the first
round, and byte-compare outputs against the reference binary.  On a CPU
backend the engines fall back to the host tier and the comparison still
holds (the test then covers the fallback).
"""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def family_fasta(tmp_path_factory):
    rng = np.random.default_rng(5)
    path = tmp_path_factory.mktemp("grow") / "fam.fasta"
    nfam, per, L = 120, 4, 220
    with open(path, "w") as fh:
        i = 0
        for f in range(nfam):
            base = rng.choice(list("ACGT"), size=L)
            for m in range(per):
                s = base.copy()
                for _ in range(int(rng.integers(0, 8 if m else 1))):
                    s[rng.integers(0, L)] = rng.choice(list("ACGT"))
                fh.write(">s%d;size=%d\n%s\n"
                         % (i, int(rng.integers(1, 50)), "".join(s)))
                i += 1
    return path


def _run_ours(args, tmp, extra_env):
    # in-process (test_threads.py style): env applies because the engines
    # read the threshold knobs at construction time
    saved = {k: os.environ.get(k) for k in extra_env}
    os.environ.update(extra_env)
    try:
        from vsearch_tpu import cli
        assert cli.main(args + ["--quiet"]) == 0
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_cluster_device_scoring_parity(family_fasta, tmp_path, ref_binary):
    ref_uc, my_uc = tmp_path / "r.uc", tmp_path / "m.uc"
    ref_fa, my_fa = tmp_path / "r.fa", tmp_path / "m.fa"
    base = ["--cluster_size", str(family_fasta), "--id", "0.95",
            "--threads", "1"]
    subprocess.run([str(ref_binary)] + base
                   + ["--quiet", "--uc", str(ref_uc),
                      "--centroids", str(ref_fa)],
                   check=True, capture_output=True)
    _run_ours(base + ["--uc", str(my_uc), "--centroids", str(my_fa)],
              tmp_path, {"VSEARCH_TPU_CLUSTER_DEVICE_MIN": "16"})
    assert ref_uc.read_bytes() == my_uc.read_bytes()
    assert ref_fa.read_bytes() == my_fa.read_bytes()


def test_uchime3_device_scoring_parity(family_fasta, tmp_path, ref_binary):
    ref_out, my_out = tmp_path / "r.tsv", tmp_path / "m.tsv"
    ref_nc, my_nc = tmp_path / "rn.fa", tmp_path / "mn.fa"
    base = ["--uchime3_denovo", str(family_fasta), "--threads", "1"]
    subprocess.run([str(ref_binary)] + base
                   + ["--quiet", "--uchimeout", str(ref_out),
                      "--nonchimeras", str(ref_nc)],
                   check=True, capture_output=True)
    _run_ours(base + ["--uchimeout", str(my_out),
                      "--nonchimeras", str(my_nc)],
              tmp_path, {"VSEARCH_TPU_CHIMERA_DEVICE_MIN": "16"})
    assert ref_out.read_bytes() == my_out.read_bytes()
    assert ref_nc.read_bytes() == my_nc.read_bytes()


def test_growing_index_matches_host_order():
    """Unit: ranked-key top-k == host lexsort order under growth,
    including capacity rebuild (interpret-free: runs the jitted kernels
    on whatever backend the suite uses)."""
    from vsearch_tpu.ops.score_grow import GrowingDeviceKmerIndex
    rng = np.random.default_rng(0)
    w = 8
    g = GrowingDeviceKmerIndex(w, capacity=20480)
    lists, lens, nos = [], [], []
    for i in range(300):
        kl = np.unique(rng.integers(0, 1 << (2 * w), size=60,
                                    dtype=np.uint32))
        ln = int(rng.integers(80, 400))
        lists.append(kl)
        lens.append(ln)
        nos.append(i)
    assert g.append_round(list(zip(lists[:200], lens[:200], nos[:200])))
    assert g.append_round(list(zip(lists[200:], lens[200:], nos[200:])))
    queries = [np.unique(rng.integers(0, 1 << (2 * w), size=100,
                                      dtype=np.uint32)) for _ in range(20)]
    got = g.topk_batch(queries, 9, [1] * len(queries))
    # host oracle
    for qk, row in zip(queries, got):
        counts = np.array([np.intersect1d(qk, kl).size for kl in lists])
        elig = np.nonzero(counts >= 1)[0]
        order = np.lexsort((np.array(nos)[elig], np.array(lens)[elig],
                            -counts[elig]))[:9]
        expect = [(int(np.array(nos)[elig][i]), int(counts[elig][i]))
                  for i in order]
        assert row == expect
