"""Byte-parity of the allpairs_global device stats pipeline.

The fast path (ops/allpairs_dev.py) computes alignment statistics on
device and replays acceptance vectorized on host; these tests drive it
(the suite runs on a TPU backend; seqcount >= 16 engages the pipeline)
across the output-writer surface and the acceptance-affecting options,
byte-comparing against the reference binary.  On non-TPU backends the
same assertions cover the generic fallback path.
"""

import pathlib
import subprocess

import numpy as np
import pytest

from .conftest import run_ours, run_reference


@pytest.fixture(scope="module")
def pairs_fasta(tmp_path_factory):
    rng = np.random.default_rng(21)
    path = tmp_path_factory.mktemp("ap") / "ap.fasta"
    base = rng.choice(list("ACGT"), size=180)
    with open(path, "w") as fh:
        for i in range(48):
            if i % 2 == 0:
                s = base.copy()
                idx = rng.integers(0, 180, size=rng.integers(5, 40))
                s[idx] = rng.choice(list("ACGTN"), size=idx.size)
                s = s[:int(rng.integers(150, 181))]
            else:
                s = rng.choice(list("ACGTN"), size=int(
                    rng.integers(120, 220)), p=[.24, .24, .24, .24, .04])
            fh.write(">p%d;size=%d\n%s\n"
                     % (i, rng.integers(1, 9), "".join(s)))
    return path


CASES = [
    ("basic", ["--id", "0.5", "--blast6out", "{o}.b6", "--uc", "{o}.uc"]),
    ("low_id_alnout", ["--id", "0.3", "--alnout", "{o}.aln",
                       "--fastapairs", "{o}.fp"]),
    ("iddef0_maxhits", ["--id", "0.4", "--iddef", "0", "--maxhits", "2",
                        "--blast6out", "{o}.b6"]),
    ("top_hits_only", ["--id", "0.4", "--top_hits_only", "--uc", "{o}.uc",
                       "--blast6out", "{o}.b6"]),
    ("userout", ["--id", "0.45", "--userout", "{o}.user", "--userfields",
                 "query+target+id+alnlen+mism+opens+qlo+qhi+tlo+thi+raw+"
                 "caln+qcov+tcov+id3",
                 "--output_no_hits", "--matched", "{o}.m",
                 "--notmatched", "{o}.nm"]),
    ("mincols_maxdiffs", ["--id", "0.3", "--mincols", "100",
                          "--maxdiffs", "80", "--blast6out", "{o}.b6"]),
    ("leftjust", ["--id", "0.3", "--leftjust", "--blast6out", "{o}.b6"]),
    ("acceptall", ["--acceptall", "--blast6out", "{o}.b6",
                   "--uc", "{o}.uc"]),
]


@pytest.mark.parametrize("name,opts", CASES, ids=[c[0] for c in CASES])
def test_allpairs_parity(pairs_fasta, tmp_path, ref_binary, name, opts):
    def expand(tag):
        return [x.replace("{o}", str(tmp_path / tag)) for x in opts]

    base = ["--allpairs_global", str(pairs_fasta), "--minseqlength", "1"]
    run_reference(ref_binary, base + expand("ref"), cwd=str(tmp_path))
    run_ours(base + expand("my"), cwd=str(tmp_path))
    outs = [x for x in opts if x.startswith("{o}")]
    assert outs
    for tpl in outs:
        ref_p = pathlib.Path(tpl.replace("{o}", str(tmp_path / "ref")))
        my_p = pathlib.Path(tpl.replace("{o}", str(tmp_path / "my")))
        ref_b = ref_p.read_bytes()
        my_b = my_p.read_bytes()
        if tpl.endswith(".aln"):
            # program banner differs in the first two lines
            ref_b = b"\n".join(ref_b.split(b"\n")[2:])
            my_b = b"\n".join(my_b.split(b"\n")[2:])
        assert my_b == ref_b, "%s: %s differs" % (name, tpl)
