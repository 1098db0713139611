"""Byte-parity of usearch_global on a DB large enough to engage the
device top-k index (>=512 sequences) and the top-1 prefetch alignment.

The small api_examples fixtures never cross the DeviceKmerIndex threshold,
so this synthetic workload is what actually exercises the packed-bit
scoring kernel, the candidate cut, and the speculative gather-align path
end-to-end against the reference binary.
"""

import random

import pytest

from .conftest import run_ours, run_reference


def _write_workload(tmp_path, db_n=520, n_queries=64, seq_len=150,
                    seed=77):
    rng = random.Random(seed)
    db = tmp_path / "db.fasta"
    q = tmp_path / "q.fasta"
    seqs = []
    with open(db, "w") as fh:
        for i in range(db_n):
            s = "".join(rng.choice("ACGT") for _ in range(seq_len))
            seqs.append(s)
            fh.write(">d%d\n%s\n" % (i, s))
    with open(q, "w") as fh:
        for i in range(n_queries):
            s = list(seqs[rng.randrange(db_n)])
            for _ in range(int(len(s) * 0.08)):
                p = rng.randrange(len(s))
                r = rng.random()
                if r < 0.85:
                    s[p] = rng.choice("ACGT")
                elif r < 0.93 and len(s) > 20:
                    del s[p]
                else:
                    s.insert(p, rng.choice("ACGT"))
            fh.write(">q%d\n%s\n" % (i, "".join(s)))
    return db, q


@pytest.mark.parametrize("extra", [
    ["--id", "0.8", "--maxaccepts", "1", "--maxrejects", "32"],
    ["--id", "0.9", "--maxaccepts", "4", "--maxrejects", "8",
     "--output_no_hits"],
    ["--id", "0.8", "--strand", "both"],
], ids=["ma1", "ma4_nohits", "both"])
def test_device_path_parity(ref_binary, tmp_path, extra):
    db, q = _write_workload(tmp_path)
    args = ["--usearch_global", str(q), "--db", str(db)] + extra
    run_reference(ref_binary, args + ["--blast6out", "ref.b6",
                                      "--uc", "ref.uc"], tmp_path)
    run_ours(args + ["--blast6out", "my.b6", "--uc", "my.uc"], tmp_path)
    assert (tmp_path / "ref.b6").read_bytes() == \
        (tmp_path / "my.b6").read_bytes()
    assert (tmp_path / "ref.uc").read_bytes() == \
        (tmp_path / "my.uc").read_bytes()


def test_device_index_engaged(ref_binary, tmp_path):
    """The synthetic DB must actually build a DeviceKmerIndex with attached
    DB codes (otherwise the tests above silently cover only the host path).
    """
    db, q = _write_workload(tmp_path, n_queries=1)
    from vsearch_tpu.params import Parameters
    from vsearch_tpu.core.search import SearchContext, load_db_and_index
    params = Parameters()
    params.opt_usearch_global = str(q)
    params.opt_db = str(db)
    params.opt_id = 0.8
    database, index = load_db_and_index(params, str(db))
    ctx = SearchContext.build(params, database, index=index)
    assert ctx.device_index is not None
    from vsearch_tpu.parallel.mesh import active_mesh
    if active_mesh() is not None:
        # multi-device runtime: the mesh-sharded index carries the load
        from vsearch_tpu.parallel.sharded_index import ShardedKmerIndex
        assert isinstance(ctx.device_index, ShardedKmerIndex)
    else:
        assert ctx.device_index.db_codes is not None
        assert ctx.device_index.db_codes_width >= 150
