"""Byte-parity of usearch_global outputs vs the reference binary.

Mirrors the reference's test idiom: golden-file comparison of every output
format on the api_examples fixture data (SURVEY.md §4).
"""

import filecmp

import pytest

from .conftest import run_ours, run_reference

USERFIELDS = ("query+target+id+alnlen+mism+opens+qlo+qhi+tlo+thi+evalue+bits"
              "+caln+raw+id0+id1+id2+id3+id4+qcov+tcov+qilo+qihi+tilo+tihi"
              "+aln+qrow+trow+pairs+gaps+pctpv+pctgaps")


def _compare(tmp_path, name, skip_header_lines=0):
    ref = tmp_path / ("ref." + name)
    mine = tmp_path / ("my." + name)
    if skip_header_lines:
        a = ref.read_bytes().split(b"\n")[skip_header_lines:]
        b = mine.read_bytes().split(b"\n")[skip_header_lines:]
        assert a == b, "output %s differs" % name
    else:
        assert ref.read_bytes() == mine.read_bytes(), \
            "output %s differs" % name


def _run_both(ref_binary, ref_data, tmp_path, extra):
    base = ["--usearch_global", str(ref_data / "chimera_queries.fasta"),
            "--db", str(ref_data / "chimera_ref.fasta")]
    outs = ["blast6out", "uc", "userout", "alnout", "samout", "fastapairs",
            "qsegout", "tsegout", "matched", "notmatched", "dbmatched",
            "dbnotmatched", "otutabout"]
    ref_args = list(base) + extra
    my_args = list(base) + extra
    for o in outs:
        ref_args += ["--" + o, "ref." + o]
        my_args += ["--" + o, "my." + o]
    ref_args += ["--userfields", USERFIELDS]
    my_args += ["--userfields", USERFIELDS]
    run_reference(ref_binary, ref_args, tmp_path)
    run_ours(my_args, tmp_path)
    for o in outs:
        _compare(tmp_path, o, skip_header_lines=2 if o == "alnout" else 0)


@pytest.mark.parametrize("extra", [
    ["--id", "0.5"],
    ["--id", "0.5", "--output_no_hits"],
    ["--id", "0.5", "--maxaccepts", "4", "--maxrejects", "8"],
    ["--id", "0.5", "--strand", "both"],
    ["--id", "0.7", "--iddef", "0"],
    ["--id", "0.5", "--iddef", "1"],
    ["--id", "0.5", "--iddef", "3"],
    ["--id", "0.9"],
    ["--id", "0.5", "--top_hits_only", "--maxaccepts", "4"],
    ["--id", "0.5", "--uc_allhits", "--maxaccepts", "4"],
    ["--id", "0.5", "--sizeout"],
    ["--id", "0.5", "--maxaccepts", "0", "--maxrejects", "0"],
    ["--id", "0.5", "--gapopen", "4I/1E", "--gapext", "1I/1E"],
    ["--id", "0.5", "--match", "4", "--mismatch", "-2"],
    ["--id", "0.5", "--wordlength", "6"],
    ["--id", "0.5", "--minwordmatches", "3"],
    ["--id", "0.5", "--qmask", "none", "--dbmask", "none"],
    ["--id", "0.5", "--hardmask"],
    ["--id", "0.5", "--query_cov", "0.9"],
    ["--id", "0.5", "--mincols", "100"],
], ids=lambda e: "_".join(str(x).lstrip("-") for x in e))
def test_parity(ref_binary, ref_data, tmp_path, extra):
    _run_both(ref_binary, ref_data, tmp_path, extra)


def test_parity_refs10(ref_binary, ref_data, tmp_path):
    """Different fixture pair: 16S sequences (with ambiguous codes)."""
    base = ["--usearch_global", str(ref_data / "refs_10.fasta"),
            "--db", str(ref_data / "refs_10.fasta"),
            "--id", "0.5", "--self", "--maxaccepts", "4", "--output_no_hits"]
    run_reference(ref_binary,
                  base + ["--blast6out", "ref.b6", "--uc", "ref.uc",
                          "--userout", "ref.user", "--userfields", USERFIELDS],
                  tmp_path)
    run_ours(base + ["--blast6out", "my.b6", "--uc", "my.uc",
                     "--userout", "my.user", "--userfields", USERFIELDS],
             tmp_path)
    for o in ("b6", "uc", "user"):
        _compare(tmp_path, o)
