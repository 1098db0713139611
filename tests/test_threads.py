"""--threads N semantics on our side (VERDICT r1 item 7).

The reference's multi-thread output order for search commands is
completion-order (nondeterministic); our contract is stronger: for any
--threads N the output equals the reference's --threads 1 order (the
deterministic oracle every parity test pins to).  Clustering is different:
the reference's parallel round resolution is serial in query order, so its
multi-thread cluster output IS deterministic and must match ours for any
round width (reference cluster.cpp:877-1030; our core/cluster.py rounds +
evaluate_extra_hits repair reproduce the resolved semantics).
"""

import os

import pytest

from .conftest import run_reference


def _run_ours_raw(args, cwd):
    from vsearch_tpu import cli
    old = os.getcwd()
    os.chdir(cwd)
    try:
        rc = cli.main(args + ["--quiet"])
        assert rc == 0
    finally:
        os.chdir(old)


def test_usearch_global_threads_n_matches_t1(ref_binary, ref_data, tmp_path):
    base = ["--usearch_global", str(ref_data / "chimera_queries.fasta"),
            "--db", str(ref_data / "chimera_ref.fasta"), "--id", "0.5",
            "--maxaccepts", "4", "--maxrejects", "8", "--strand", "both"]
    run_reference(ref_binary, base + ["--uc", "ref.uc",
                                      "--blast6out", "ref.b6"], tmp_path)
    for n in (1, 4):
        _run_ours_raw(base + ["--threads", str(n), "--uc", "my%d.uc" % n,
                              "--blast6out", "my%d.b6" % n], tmp_path)
    ref_uc = (tmp_path / "ref.uc").read_bytes()
    assert (tmp_path / "my1.uc").read_bytes() == ref_uc
    # --threads N must be accepted and byte-stable == the T1 order
    assert (tmp_path / "my4.uc").read_bytes() == ref_uc
    assert (tmp_path / "my4.b6").read_bytes() == \
        (tmp_path / "my1.b6").read_bytes()


@pytest.mark.parametrize("round_size", [1, 4, 256])
def test_cluster_round_width_parity(ref_binary, ref_data, tmp_path,
                                    round_size):
    """cluster_size output is round-width invariant on our side and equals
    the reference's resolved multi-thread semantics (--threads 4)."""
    base = ["--cluster_size", str(ref_data / "chimera_ref.fasta"),
            "--id", "0.80", "--sizeout"]
    run_reference(ref_binary,
                  ["--cluster_size", str(ref_data / "chimera_ref.fasta"),
                   "--id", "0.80", "--sizeout", "--threads", "4",
                   "--centroids", "ref.cent", "--uc", "ref.uc"], tmp_path)
    old = os.environ.get("VSEARCH_TPU_CLUSTER_ROUND")
    os.environ["VSEARCH_TPU_CLUSTER_ROUND"] = str(round_size)
    try:
        _run_ours_raw(base + ["--threads", "1", "--centroids", "my.cent",
                              "--uc", "my.uc"], tmp_path)
    finally:
        if old is None:
            del os.environ["VSEARCH_TPU_CLUSTER_ROUND"]
        else:
            os.environ["VSEARCH_TPU_CLUSTER_ROUND"] = old
    assert (tmp_path / "my.cent").read_bytes() == \
        (tmp_path / "ref.cent").read_bytes()
    assert (tmp_path / "my.uc").read_bytes() == \
        (tmp_path / "ref.uc").read_bytes()


@pytest.mark.parametrize("round_size", [1, 16, 512])
def test_chimera_round_width_parity(ref_binary, ref_data, tmp_path,
                                    round_size):
    """uchime3_denovo output is round-width invariant: W=1 is the pure
    serial oracle (no same-round repair can fire), larger widths exercise
    the speculative search + exact repair (core/chimera.py search_round),
    and all must byte-match the reference."""
    src = str(ref_data / "chimera_queries.fasta")
    run_reference(ref_binary,
                  ["--uchime3_denovo", src, "--threads", "1",
                   "--chimeras", "ref.chim", "--nonchimeras", "ref.non",
                   "--uchimeout", "ref.uch"], tmp_path)
    old = os.environ.get("VSEARCH_TPU_CHIMERA_ROUND")
    os.environ["VSEARCH_TPU_CHIMERA_ROUND"] = str(round_size)
    try:
        _run_ours_raw(["--uchime3_denovo", src, "--threads", "1",
                       "--chimeras", "my.chim", "--nonchimeras", "my.non",
                       "--uchimeout", "my.uch"], tmp_path)
    finally:
        if old is None:
            del os.environ["VSEARCH_TPU_CHIMERA_ROUND"]
        else:
            os.environ["VSEARCH_TPU_CHIMERA_ROUND"] = old
    for name in ("chim", "non", "uch"):
        assert (tmp_path / ("my." + name)).read_bytes() == \
            (tmp_path / ("ref." + name)).read_bytes(), name


@pytest.mark.parametrize("batch", [1, 3, 64])
def test_search_batch_width_parity(ref_binary, ref_data, tmp_path, batch):
    """usearch_global output is pipeline-batch-width invariant: the
    driver's 1-deep software pipeline (commands/usearch_global.py
    _batch_size + flush) must produce the reference T1 byte order for any
    VSEARCH_TPU_BATCH, including widths that split every device chunk and
    straddle strand pairs."""
    base = ["--usearch_global", str(ref_data / "chimera_queries.fasta"),
            "--db", str(ref_data / "chimera_ref.fasta"), "--id", "0.5",
            "--maxaccepts", "4", "--maxrejects", "8", "--strand", "both"]
    run_reference(ref_binary, base + ["--threads", "1", "--uc", "ref.uc",
                                      "--blast6out", "ref.b6"], tmp_path)
    old = os.environ.get("VSEARCH_TPU_BATCH")
    os.environ["VSEARCH_TPU_BATCH"] = str(batch)
    try:
        _run_ours_raw(base + ["--uc", "my.uc", "--blast6out", "my.b6"],
                      tmp_path)
    finally:
        if old is None:
            del os.environ["VSEARCH_TPU_BATCH"]
        else:
            os.environ["VSEARCH_TPU_BATCH"] = old
    assert (tmp_path / "my.uc").read_bytes() == \
        (tmp_path / "ref.uc").read_bytes()
    assert (tmp_path / "my.b6").read_bytes() == \
        (tmp_path / "ref.b6").read_bytes()
