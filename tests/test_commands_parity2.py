"""Second byte-parity batch: commands and output formats not covered by
test_commands_parity.py — orient, pair ops, format conversions, stats
reports (via --log), cluster variants, uchime2, UDB inspectors, and the
full usearch_global output-writer surface (alnout/samout/fastapairs/
qseg/tseg/matched/dbmatched/otutab/biom/mothur/lcaout/userout-all-fields).
"""

import pathlib
import subprocess

import pytest

from .conftest import REF_BINARY, run_ours, run_reference, _common

D = "/root/reference/api_examples/data"

_COMP = bytes.maketrans(b"ACGTURYSWKMBDHVNacgturyswkmbdhvn",
                        b"TGCAAYRSWMKVHDBNtgcaayrswmkvhdbn")


def _revcomp(s: bytes) -> bytes:
    return s.translate(_COMP)[::-1]


def _read_fasta(path):
    recs, head, seq = [], None, []
    for line in pathlib.Path(path).read_bytes().splitlines():
        if line.startswith(b">"):
            if head is not None:
                recs.append((head, b"".join(seq)))
            head, seq = line[1:], []
        else:
            seq.append(line.replace(b" ", b""))
    if head is not None:
        recs.append((head, b"".join(seq)))
    return recs


@pytest.fixture(scope="module")
def fixdir(tmp_path_factory):
    """Deterministic synthetic fixtures shared by this module."""
    import random
    rng = random.Random(20260818)
    d = tmp_path_factory.mktemp("fixtures2")

    # --- paired overlapping FASTQ reads (for join / syncpairs / filter) ---
    npairs = 24
    with open(d / "pair_fwd.fastq", "wb") as ff, \
            open(d / "pair_rev.fastq", "wb") as fr:
        for i in range(npairs):
            frag = bytes(rng.choice(b"ACGT") for _ in range(180))
            fwd = frag[:120]
            rev = _revcomp(frag[60:])
            qf = bytes(33 + rng.randint(2, 40) for _ in range(len(fwd)))
            qr = bytes(33 + rng.randint(2, 40) for _ in range(len(rev)))
            ff.write(b"@pair%d/1\n%s\n+\n%s\n" % (i, fwd, qf))
            fr.write(b"@pair%d/2\n%s\n+\n%s\n" % (i, rev, qr))

    # desynced copies: drop some reads from each side, keep order
    fwd_recs = (d / "pair_fwd.fastq").read_bytes().split(b"\n")
    rev_recs = (d / "pair_rev.fastq").read_bytes().split(b"\n")
    fwd_keep = [i for i in range(npairs) if i % 5 != 1]
    rev_keep = [i for i in range(npairs) if i % 7 != 2]
    with open(d / "sync_fwd.fastq", "wb") as fh:
        for i in fwd_keep:
            fh.write(b"\n".join(fwd_recs[4 * i:4 * i + 4]) + b"\n")
    with open(d / "sync_rev.fastq", "wb") as fh:
        for i in rev_keep:
            fh.write(b"\n".join(rev_recs[4 * i:4 * i + 4]) + b"\n")

    # --- orient input: forward + reverse-complemented queries ---
    recs = _read_fasta(f"{D}/chimera_queries.fasta")
    with open(d / "orient_in.fasta", "wb") as fh:
        for i, (head, seq) in enumerate(recs):
            if i % 2:
                fh.write(b">%s_rc\n%s\n" % (head, _revcomp(seq)))
            else:
                fh.write(b">%s\n%s\n" % (head, seq))

    # --- tax-annotated DB (for lcaout) and sample-annotated queries
    #     (for otutab outputs) ---
    refs = _read_fasta(f"{D}/chimera_ref.fasta")
    with open(d / "tax_db.fasta", "wb") as fh:
        for i, (head, seq) in enumerate(refs):
            fh.write(b">%s;tax=d:Bacteria,p:Phy%d,c:Cls,o:Ord,f:Fam,"
                     b"g:Gen%d,s:Spec%d\n%s\n"
                     % (head.split(b";")[0], i % 2, i % 3, i, seq))
    queries = _read_fasta(f"{D}/chimera_queries.fasta")
    with open(d / "sample_q.fasta", "wb") as fh:
        for i, (head, seq) in enumerate(queries):
            fh.write(b">%s;sample=s%d;size=%d\n%s\n"
                     % (head.split(b";")[0], i % 3, 1 + i, seq))
    return d


CASES = [
    ("orient",
     lambda d: ["--orient", f"{d}/orient_in.fasta", "--db",
                f"{D}/chimera_ref.fasta", "--fastaout", "{o}.fa",
                "--notmatched", "{o}.nm.fa", "--tabbedout", "{o}.tsv"],
     ["{o}.fa", "{o}.nm.fa", "{o}.tsv"]),
    ("fastq_join",
     lambda d: ["--fastq_join", f"{d}/pair_fwd.fastq", "--reverse",
                f"{d}/pair_rev.fastq", "--fastqout", "{o}.fq",
                "--fastaout", "{o}.fa"],
     ["{o}.fq", "{o}.fa"]),
    ("fastq_join_pad",
     lambda d: ["--fastq_join", f"{d}/pair_fwd.fastq", "--reverse",
                f"{d}/pair_rev.fastq", "--fastqout", "{o}.fq",
                "--join_padgap", "TACG", "--join_padgapq", "KKKK"],
     ["{o}.fq"]),
    ("fastx_syncpairs",
     lambda d: ["--fastx_syncpairs", f"{d}/sync_fwd.fastq", "--reverse",
                f"{d}/sync_rev.fastq", "--fastqout", "{o}.f.fq",
                "--fastqout_rev", "{o}.r.fq"],
     ["{o}.f.fq", "{o}.r.fq"]),
    ("fasta2fastq",
     lambda d: ["--fasta2fastq", f"{D}/derep_test.fasta", "--fastqout",
                "{o}.fq", "--fastq_qmaxout", "40"],
     ["{o}.fq"]),
    ("fastq_convert",
     lambda d: ["--fastq_convert", f"{d}/pair_fwd.fastq", "--fastqout",
                "{o}.fq", "--fastq_asciiout", "64"],
     ["{o}.fq"]),
    ("fastx_filter_paired",
     lambda d: ["--fastx_filter", f"{d}/pair_fwd.fastq", "--reverse",
                f"{d}/pair_rev.fastq", "--fastq_maxee", "20",
                "--fastq_trunclen", "100", "--fastqout", "{o}.f.fq",
                "--fastqout_rev", "{o}.r.fq", "--fastaout_discarded",
                "{o}.d.fa"],
     ["{o}.f.fq", "{o}.r.fq", "{o}.d.fa"]),
    ("fastx_getseq",
     lambda d: ["--fastx_getseq", f"{D}/chimera_ref.fasta", "--label",
                "chimera_ref", "--label_substr_match", "--fastaout",
                "{o}.fa", "--notmatched", "{o}.nm.fa"],
     ["{o}.fa", "{o}.nm.fa"]),
    ("cluster_smallmem",
     lambda d: ["--cluster_smallmem", f"{D}/derep_test.fasta",
                "--usersort", "--id", "0.9", "--uc", "{o}.uc",
                "--centroids", "{o}.fa", "--minseqlength", "1"],
     ["{o}.uc", "{o}.fa"]),
    ("cluster_unoise",
     lambda d: ["--cluster_unoise", f"{D}/expected_derep.fasta",
                "--sizein", "--minsize", "1", "--centroids", "{o}.fa",
                "--uc", "{o}.uc", "--sizeout", "--minseqlength", "1"],
     ["{o}.fa", "{o}.uc"]),
    ("uchime2_denovo",
     lambda d: ["--uchime2_denovo", f"{D}/expected_derep.fasta",
                "--sizein", "--chimeras", "{o}.ch.fa", "--nonchimeras",
                "{o}.nc.fa", "--uchimeout", "{o}.tsv",
                "--minseqlength", "1"],
     ["{o}.ch.fa", "{o}.nc.fa", "{o}.tsv"]),
    # --- usearch_global output-writer surface ---
    ("ug_fastapairs_segout",
     lambda d: ["--usearch_global", f"{D}/chimera_queries.fasta", "--db",
                f"{D}/chimera_ref.fasta", "--id", "0.5", "--fastapairs",
                "{o}.pairs.fa", "--qsegout", "{o}.qseg.fa", "--tsegout",
                "{o}.tseg.fa"],
     ["{o}.pairs.fa", "{o}.qseg.fa", "{o}.tseg.fa"]),
    ("ug_samout",
     lambda d: ["--usearch_global", f"{D}/chimera_queries.fasta", "--db",
                f"{D}/chimera_ref.fasta", "--id", "0.5", "--samout",
                "{o}.sam", "--output_no_hits"],
     ["{o}.sam"]),
    ("ug_matched_dbmatched",
     lambda d: ["--usearch_global", f"{D}/chimera_queries.fasta", "--db",
                f"{D}/chimera_ref.fasta", "--id", "0.97", "--matched",
                "{o}.m.fa", "--notmatched", "{o}.nm.fa", "--dbmatched",
                "{o}.dbm.fa", "--dbnotmatched", "{o}.dbnm.fa",
                "--sizeout"],
     ["{o}.m.fa", "{o}.nm.fa", "{o}.dbm.fa", "{o}.dbnm.fa"]),
    ("ug_otutab",
     lambda d: ["--usearch_global", f"{d}/sample_q.fasta", "--db",
                f"{D}/chimera_ref.fasta", "--id", "0.5", "--sizein",
                "--otutabout", "{o}.otu.tsv", "--biomout", "{o}.biom",
                "--mothur_shared_out", "{o}.mothur"],
     ["{o}.otu.tsv", "{o}.biom", "{o}.mothur"]),
    ("ug_lcaout",
     lambda d: ["--usearch_global", f"{D}/chimera_queries.fasta", "--db",
                f"{d}/tax_db.fasta", "--id", "0.5", "--lcaout",
                "{o}.lca.tsv", "--lca_cutoff", "0.6", "--maxaccepts",
                "4", "--uc_allhits", "--uc", "{o}.uc"],
     ["{o}.lca.tsv", "{o}.uc"]),
    ("ug_userout_allfields",
     lambda d: ["--usearch_global", f"{D}/chimera_queries.fasta", "--db",
                f"{D}/chimera_ref.fasta", "--id", "0.5", "--userout",
                "{o}.user.tsv", "--output_no_hits", "--userfields",
                "query+target+evalue+id+pctpv+pctgaps+pairs+gaps+qlo+qhi"
                "+tlo+thi+pv+ql+tl+qs+ts+alnlen+opens+exts+raw+bits+aln"
                "+caln+qstrand+tstrand+qrow+trow+qframe+tframe+mism+ids"
                "+qcov+tcov+id0+id1+id2+id3+id4+qilo+qihi+tilo+tihi"],
     ["{o}.user.tsv"]),
    ("ug_maxhits_tophits",
     lambda d: ["--usearch_global", f"{D}/chimera_queries.fasta", "--db",
                f"{D}/chimera_ref.fasta", "--id", "0.4", "--maxaccepts",
                "8", "--maxhits", "2", "--blast6out", "{o}.b6",
                "--strand", "both"],
     ["{o}.b6"]),
]


@pytest.mark.parametrize("name,mk,outputs", CASES, ids=[c[0] for c in CASES])
def test_command_parity2(ref_binary, ref_data, fixdir, tmp_path, name, mk,
                         outputs):
    args = mk(fixdir)
    run_reference(ref_binary, [a.format(o="ref") for a in args], tmp_path)
    run_ours([a.format(o="my") for a in args], tmp_path)
    for out in outputs:
        ref_file = tmp_path / out.format(o="ref")
        my_file = tmp_path / out.format(o="my")
        ref_bytes = ref_file.read_bytes()
        my_bytes = my_file.read_bytes()
        if out.endswith(".biom"):
            # biom embeds its own filename and a generation timestamp
            ref_bytes = _norm_biom(ref_bytes)
            my_bytes = _norm_biom(my_bytes)
        assert ref_bytes == my_bytes, \
            "output %s differs for %s" % (out, name)


def _norm_biom(raw: bytes) -> bytes:
    return b"\n".join(line for line in raw.splitlines()
                      if not (line.lstrip().startswith(b'"id":')
                              or line.lstrip().startswith(b'"date":')))


def _filter_log(raw: bytes):
    """Strip run-specific lines (banner, command line, timestamps, memory)
    from a --log file, keeping the report body."""
    keep = []
    # first two lines are always the version banner and the command line
    for line in raw.splitlines()[2:]:
        if (line.startswith(b"Started ") or line.startswith(b"Finished ")
                or line.startswith(b"Elapsed time")
                or line.startswith(b"Max memory")):
            continue
        keep.append(line)
    return b"\n".join(keep)


LOG_CASES = [
    ("fastq_chars",
     lambda d: ["--fastq_chars", f"{d}/pair_fwd.fastq"]),
    ("fastq_stats",
     lambda d: ["--fastq_stats", f"{d}/pair_fwd.fastq"]),
]


@pytest.mark.parametrize("name,mk", LOG_CASES, ids=[c[0] for c in LOG_CASES])
def test_log_report_parity(ref_binary, ref_data, fixdir, tmp_path, name, mk):
    args = mk(fixdir)
    run_reference(ref_binary, args + ["--log", "ref.log"], tmp_path)
    run_ours(args + ["--log", "my.log"], tmp_path)
    ref = _filter_log((tmp_path / "ref.log").read_bytes())
    mine = _filter_log((tmp_path / "my.log").read_bytes())
    assert ref == mine, "log report differs for %s" % name


def test_udbinfo_udbstats_parity(ref_binary, ref_data, tmp_path):
    run_reference(str(REF_BINARY),
                  ["--makeudb_usearch", f"{D}/chimera_ref.fasta",
                   "--output", "db.udb"], tmp_path)
    for verb in ("udbinfo", "udbstats"):
        run_reference(str(REF_BINARY),
                      ["--%s" % verb, "db.udb", "--log", "ref_%s.log" % verb],
                      tmp_path)
        run_ours(["--%s" % verb, "db.udb", "--log", "my_%s.log" % verb],
                 tmp_path)
        ref = _filter_log((tmp_path / ("ref_%s.log" % verb)).read_bytes())
        mine = _filter_log((tmp_path / ("my_%s.log" % verb)).read_bytes())
        assert ref == mine, "%s log differs" % verb


def test_checked_output_close_enospc(ref_binary, tmp_path):
    """Deferred write errors surface at close with the reference's fatal
    text (open_file.cpp:150-163), instead of exit 0 + truncated output."""
    if not pathlib.Path("/dev/full").exists():
        pytest.skip("/dev/full unavailable")
    fa = tmp_path / "in.fa"
    fa.write_bytes(b"".join(b">s%d;size=%d\n%s\n"
                            % (i, 10 - i, b"ACGTACGTAC" * 10)
                            for i in range(5)))
    args = ["--sortbysize", str(fa), "--output", "/dev/full", "--quiet"]
    ref = subprocess.run([ref_binary] + args, capture_output=True)
    import os as _os
    import sys as _sys
    ours = subprocess.run(
        [_sys.executable, "-m", "vsearch_tpu.cli"] + args,
        capture_output=True, env=dict(_os.environ))
    assert ref.returncode == 1
    assert ours.returncode == 1
    ref_tail = ref.stderr.decode().strip().splitlines()[-1]
    ours_tail = ours.stderr.decode().strip().splitlines()[-1]
    assert "Fatal error: Unable to write to output file" in ref_tail
    assert ours_tail == ref_tail
