"""Byte-parity tests for every implemented command vs the reference binary."""

import pytest

from .conftest import run_ours, run_reference

D = "/root/reference/api_examples/data"
import pathlib
TD = str(pathlib.Path(__file__).resolve().parent / "data")

CASES = [
    # (id, args with {o}=output placeholder, [output names])
    ("derep_full",
     ["--derep_fulllength", f"{D}/derep_test.fasta", "--output", "{o}.fa",
      "--uc", "{o}.uc", "--sizeout", "--minseqlength", "1"],
     ["{o}.fa", "{o}.uc"]),
    ("derep_id",
     ["--derep_id", f"{D}/derep_test.fasta", "--output", "{o}.fa",
      "--sizein", "--sizeout", "--minseqlength", "1"],
     ["{o}.fa"]),
    ("derep_prefix",
     ["--derep_prefix", f"{D}/derep_test.fasta", "--output", "{o}.fa",
      "--uc", "{o}.uc", "--sizeout", "--minseqlength", "1"],
     ["{o}.fa", "{o}.uc"]),
    ("fastx_uniques_fastq",
     ["--fastx_uniques", f"{D}/merge_fwd.fastq", "--fastaout", "{o}.fa",
      "--fastqout", "{o}.fq", "--tabbedout", "{o}.tsv", "--sizeout",
      "--minseqlength", "1"],
     ["{o}.fa", "{o}.fq", "{o}.tsv"]),
    ("sortbysize",
     ["--sortbysize", f"{D}/expected_derep.fasta", "--output", "{o}.fa",
      "--minseqlength", "1"],
     ["{o}.fa"]),
    ("sortbylength",
     ["--sortbylength", f"{D}/derep_test.fasta", "--output", "{o}.fa",
      "--topn", "5", "--minseqlength", "1"],
     ["{o}.fa"]),
    ("shuffle",
     ["--shuffle", f"{D}/chimera_ref.fasta", "--output", "{o}.fa",
      "--randseed", "42", "--minseqlength", "1"],
     ["{o}.fa"]),
    ("cluster_size",
     ["--cluster_size", f"{D}/derep_test.fasta", "--id", "0.9", "--uc",
      "{o}.uc", "--centroids", "{o}.fa", "--sizein", "--sizeout",
      "--minseqlength", "1"],
     ["{o}.uc", "{o}.fa"]),
    ("cluster_fast_msa",
     ["--cluster_fast", f"{D}/chimera_ref.fasta", "--id", "0.6", "--uc",
      "{o}.uc", "--centroids", "{o}.fa", "--msaout", "{o}.msa",
      "--consout", "{o}.cons", "--profile", "{o}.prof",
      "--minseqlength", "1"],
     ["{o}.uc", "{o}.fa", "{o}.msa", "{o}.cons", "{o}.prof"]),
    ("uchime3_denovo",
     ["--uchime3_denovo", f"{D}/expected_derep.fasta", "--chimeras",
      "{o}.ch.fa", "--nonchimeras", "{o}.nc.fa", "--uchimeout", "{o}.tsv",
      "--minseqlength", "1"],
     ["{o}.ch.fa", "{o}.nc.fa", "{o}.tsv"]),
    ("uchime_denovo",
     ["--uchime_denovo", f"{D}/expected_derep.fasta", "--chimeras",
      "{o}.ch.fa", "--uchimeout", "{o}.tsv", "--borderline", "{o}.bl.fa",
      "--minseqlength", "1"],
     ["{o}.ch.fa", "{o}.tsv", "{o}.bl.fa"]),
    ("chimeras_denovo",
     ["--chimeras_denovo", f"{TD}/chimeras_long.fasta", "--chimeras",
      "{o}.ch.fa", "--nonchimeras", "{o}.nc.fa", "--alnout", "{o}.aln",
      "--tabbedout", "{o}.tsv", "--minseqlength", "1"],
     ["{o}.ch.fa", "{o}.nc.fa", "{o}.aln", "{o}.tsv"]),
    ("uchime_ref",
     ["--uchime_ref", f"{D}/chimera_queries.fasta", "--db",
      f"{D}/chimera_ref.fasta", "--chimeras", "{o}.ch.fa", "--nonchimeras",
      "{o}.nc.fa", "--uchimeout", "{o}.tsv", "--uchimealns", "{o}.alns",
      "--minseqlength", "1"],
     ["{o}.ch.fa", "{o}.nc.fa", "{o}.tsv", "{o}.alns"]),
    ("mergepairs",
     ["--fastq_mergepairs", f"{D}/merge_fwd.fastq", "--reverse",
      f"{D}/merge_rev.fastq", "--fastqout", "{o}.fq", "--fastaout",
      "{o}.fa", "--eetabbedout", "{o}.ee",
      "--fastqout_notmerged_fwd", "{o}.nm.fq"],
     ["{o}.fq", "{o}.fa", "{o}.ee", "{o}.nm.fq"]),
    ("fastq_filter",
     ["--fastq_filter", f"{D}/merge_fwd.fastq", "--fastq_maxee", "1.0",
      "--fastq_trunclen", "100", "--fastaout", "{o}.fa", "--fastqout",
      "{o}.fq", "--fastqout_discarded", "{o}.d.fq", "--eeout"],
     ["{o}.fa", "{o}.fq", "{o}.d.fq"]),
    ("search_exact",
     ["--search_exact", f"{D}/derep_test.fasta", "--db",
      f"{D}/derep_test.fasta", "--blast6out", "{o}.b6", "--uc", "{o}.uc",
      "--minseqlength", "1", "--output_no_hits"],
     ["{o}.b6", "{o}.uc"]),
    ("sintax",
     ["--sintax", f"{D}/chimera_queries.fasta", "--db",
      f"{D}/refs_10.fasta", "--tabbedout", "{o}.tsv", "--randseed", "5",
      "--sintax_cutoff", "0.8"],
     ["{o}.tsv"]),
    ("allpairs",
     ["--allpairs_global", f"{D}/chimera_ref.fasta", "--id", "0.5",
      "--blast6out", "{o}.b6", "--uc", "{o}.uc", "--minseqlength", "1",
      "--output_no_hits"],
     ["{o}.b6", "{o}.uc"]),
    ("fastx_mask",
     ["--fastx_mask", f"{D}/dust_test.fasta", "--fastaout", "{o}.fa"],
     ["{o}.fa"]),
    ("maskfasta",
     ["--maskfasta", f"{D}/dust_test.fasta", "--output", "{o}.fa",
      "--minseqlength", "1"],
     ["{o}.fa"]),
    ("fastx_revcomp",
     ["--fastx_revcomp", f"{D}/derep_test.fasta", "--fastaout", "{o}.fa"],
     ["{o}.fa"]),
    ("fastx_subsample",
     ["--fastx_subsample", f"{D}/refs_10.fasta", "--fastaout", "{o}.fa",
      "--fastaout_discarded", "{o}.d.fa", "--sample_size", "4",
      "--randseed", "7"],
     ["{o}.fa", "{o}.d.fa"]),
    ("rereplicate",
     ["--rereplicate", f"{D}/expected_derep.fasta", "--output", "{o}.fa",
      "--sizein"],
     ["{o}.fa"]),
    ("derep_smallmem",
     ["--derep_smallmem", f"{D}/derep_test.fasta", "--fastaout", "{o}.fa",
      "--sizeout", "--minseqlength", "1"],
     ["{o}.fa"]),
    ("cut",
     ["--cut", f"{D}/chimera_ref.fasta", "--cut_pattern", "G^AATT_C",
      "--fastaout", "{o}.fa", "--fastaout_rev", "{o}.rev.fa",
      "--fastaout_discarded", "{o}.d.fa"],
     ["{o}.fa", "{o}.rev.fa", "{o}.d.fa"]),
    ("fastx_getseqs",
     ["--fastx_getseqs", f"{D}/chimera_ref.fasta", "--label_substr_match",
      "--label", "chim", "--fastaout", "{o}.fa", "--notmatched",
      "{o}.nm.fa"],
     ["{o}.fa", "{o}.nm.fa"]),
    ("fastx_getsubseq",
     ["--fastx_getsubseq", f"{D}/derep_test.fasta", "--label", "seq1",
      "--label_substr_match", "--subseq_start", "3", "--subseq_end", "10",
      "--fastaout", "{o}.fa"],
     ["{o}.fa"]),
    ("fastq_eestats",
     ["--fastq_eestats", f"{D}/merge_fwd.fastq", "--output", "{o}.tsv"],
     ["{o}.tsv"]),
    ("fastq_eestats2",
     ["--fastq_eestats2", f"{D}/merge_fwd.fastq", "--output", "{o}.tsv",
      "--length_cutoffs", "50,*,50"],
     ["{o}.tsv"]),
]


@pytest.mark.parametrize("name,args,outputs",
                         CASES, ids=[c[0] for c in CASES])
def test_command_parity(ref_binary, ref_data, tmp_path, name, args, outputs):
    ref_args = [a.format(o="ref") for a in args]
    my_args = [a.format(o="my") for a in args]
    run_reference(ref_binary, ref_args, tmp_path)
    run_ours(my_args, tmp_path)
    for out in outputs:
        ref_file = tmp_path / out.format(o="ref")
        my_file = tmp_path / out.format(o="my")
        assert ref_file.read_bytes() == my_file.read_bytes(), \
            "output %s differs for %s" % (out, name)


def test_udb_roundtrip_parity(ref_binary, ref_data, tmp_path):
    """makeudb_usearch bytes, udb2fasta, and search against a UDB db all
    match the reference (udb.cpp read/write + usearch_global.cpp:562-572)."""
    run_reference(ref_binary,
                  ["--makeudb_usearch", f"{D}/chimera_ref.fasta",
                   "--output", "ref.udb"], tmp_path)
    run_ours(["--makeudb_usearch", f"{D}/chimera_ref.fasta",
              "--output", "my.udb"], tmp_path)
    assert (tmp_path / "ref.udb").read_bytes() == \
        (tmp_path / "my.udb").read_bytes()
    run_reference(ref_binary, ["--udb2fasta", "ref.udb", "--output",
                               "ref.fa"], tmp_path)
    # cross-load: our reader consumes the reference-written file
    run_ours(["--udb2fasta", "ref.udb", "--output", "my.fa"], tmp_path)
    assert (tmp_path / "ref.fa").read_bytes() == \
        (tmp_path / "my.fa").read_bytes()
    search = ["--usearch_global", f"{D}/chimera_queries.fasta", "--id",
              "0.5"]
    run_reference(ref_binary, search + ["--db", "ref.udb", "--blast6out",
                                        "ref.b6", "--uc", "ref.uc"],
                  tmp_path)
    run_ours(search + ["--db", "my.udb", "--blast6out", "my.b6", "--uc",
                       "my.uc"], tmp_path)
    assert (tmp_path / "ref.b6").read_bytes() == \
        (tmp_path / "my.b6").read_bytes()
    assert (tmp_path / "ref.uc").read_bytes() == \
        (tmp_path / "my.uc").read_bytes()


def _write_synthetic_sff(path):
    """Deterministic minimal SFF (3 reads) per the Roche 454 spec."""
    import random
    import struct
    rng = random.Random(7)
    nflows = 400
    flow_chars = b"TACG" * (nflows // 4)
    key = b"TCAG"
    nreads = 3
    hlen = 31 + nflows + len(key)
    hlen += (8 - hlen % 8) % 8
    pad = hlen - 31 - nflows - len(key)
    out = struct.pack(">IIQIIHHHB", 0x2E736666, 1, 0, 0, nreads, hlen,
                      len(key), nflows, 1) + flow_chars + key + b"\0" * pad
    for r in range(nreads):
        nb = rng.randint(20, 60)
        name = ("read%d" % r).encode()
        rhlen = 16 + len(name)
        rpad = (8 - rhlen % 8) % 8
        rhlen += rpad
        out += struct.pack(">HHIHHHH", rhlen, len(name), nb, 5, nb - 2,
                           0, 0) + name + b"\0" * rpad
        data = struct.pack(">%dH" % nflows,
                           *[rng.randint(0, 300) for _ in range(nflows)])
        data += bytes(rng.randint(1, 3) for _ in range(nb))
        data += bytes(rng.choice(b"ACGT") for _ in range(nb))
        data += bytes(rng.randint(2, 40) for _ in range(nb))
        out += data + b"\0" * ((8 - len(data) % 8) % 8)
    path.write_bytes(out)


def test_sff_convert_parity(ref_binary, tmp_path):
    _write_synthetic_sff(tmp_path / "test.sff")
    run_reference(ref_binary, ["--sff_convert", "test.sff", "--fastqout",
                               "ref.fq"], tmp_path)
    run_ours(["--sff_convert", "test.sff", "--fastqout", "my.fq"], tmp_path)
    assert (tmp_path / "ref.fq").read_bytes() == \
        (tmp_path / "my.fq").read_bytes()
    assert (tmp_path / "ref.fq").stat().st_size > 0
    run_reference(ref_binary, ["--sff_convert", "test.sff", "--fastqout",
                               "ref2.fq", "--sff_clip"], tmp_path)
    run_ours(["--sff_convert", "test.sff", "--fastqout", "my2.fq",
              "--sff_clip"], tmp_path)
    assert (tmp_path / "ref2.fq").read_bytes() == \
        (tmp_path / "my2.fq").read_bytes()
