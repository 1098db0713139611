#!/usr/bin/env python3
"""Narration sweep: run reference and TPU binaries NON-quiet on one case per
command, compare stderr narration and --log bodies after normalizing the
volatile lines (banner, command line, timestamps, memory, progress \\r frames).

Usage: python tools/narration_sweep.py [case ...]
Prints a unified diff per mismatching case; exits 0 iff all match.
"""

import pathlib
import random
import re
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = str(REPO / ".refbuild" / "bin" / "vsearch")
D = "/root/reference/api_examples/data"
TD = str(REPO / "tests" / "data")

_COMP = bytes.maketrans(b"ACGTURYSWKMBDHVNacgturyswkmbdhvn",
                        b"TGCAAYRSWMKVHDBNtgcaayrswmkvhdbn")


def make_fixtures(d):
    rng = random.Random(20260818)
    with open(d / "pair_fwd.fastq", "wb") as ff, \
            open(d / "pair_rev.fastq", "wb") as fr:
        for i in range(24):
            frag = bytes(rng.choice(b"ACGT") for _ in range(180))
            fwd, rev = frag[:120], frag[60:].translate(_COMP)[::-1]
            qf = bytes(33 + rng.randint(2, 40) for _ in range(len(fwd)))
            qr = bytes(33 + rng.randint(2, 40) for _ in range(len(rev)))
            ff.write(b"@pair%d/1\n%s\n+\n%s\n" % (i, fwd, qf))
            fr.write(b"@pair%d/2\n%s\n+\n%s\n" % (i, rev, qr))


CASES = {
    "usearch_global": [
        "--usearch_global", f"{D}/chimera_queries.fasta", "--db",
        f"{D}/chimera_ref.fasta", "--id", "0.5", "--blast6out", "{o}.b6"],
    "search_exact": [
        "--search_exact", f"{D}/derep_test.fasta", "--db",
        f"{D}/derep_test.fasta", "--uc", "{o}.uc", "--minseqlength", "1"],
    "allpairs_global": [
        "--allpairs_global", f"{D}/chimera_ref.fasta", "--id", "0.5",
        "--blast6out", "{o}.b6", "--minseqlength", "1"],
    "derep_fulllength": [
        "--derep_fulllength", f"{D}/derep_test.fasta", "--output", "{o}.fa",
        "--sizeout", "--minseqlength", "1"],
    "derep_prefix": [
        "--derep_prefix", f"{D}/derep_test.fasta", "--output", "{o}.fa",
        "--minseqlength", "1"],
    "derep_smallmem": [
        "--derep_smallmem", f"{D}/derep_test.fasta", "--fastaout", "{o}.fa",
        "--minseqlength", "1"],
    "cluster_size": [
        "--cluster_size", f"{D}/derep_test.fasta", "--id", "0.9",
        "--centroids", "{o}.fa", "--minseqlength", "1"],
    "cluster_fast": [
        "--cluster_fast", f"{D}/chimera_ref.fasta", "--id", "0.6",
        "--centroids", "{o}.fa", "--minseqlength", "1"],
    "cluster_unoise": [
        "--cluster_unoise", f"{D}/expected_derep.fasta", "--sizein",
        "--minsize", "1", "--centroids", "{o}.fa", "--minseqlength", "1"],
    "uchime_denovo": [
        "--uchime_denovo", f"{D}/expected_derep.fasta", "--chimeras",
        "{o}.fa", "--minseqlength", "1"],
    "uchime3_denovo": [
        "--uchime3_denovo", f"{D}/expected_derep.fasta", "--chimeras",
        "{o}.fa", "--minseqlength", "1"],
    "uchime_ref": [
        "--uchime_ref", f"{D}/chimera_queries.fasta", "--db",
        f"{D}/chimera_ref.fasta", "--chimeras", "{o}.fa",
        "--minseqlength", "1"],
    "chimeras_denovo": [
        "--chimeras_denovo", f"{TD}/chimeras_long.fasta", "--chimeras",
        "{o}.fa", "--minseqlength", "1"],
    "fastq_mergepairs": [
        "--fastq_mergepairs", f"{D}/merge_fwd.fastq", "--reverse",
        f"{D}/merge_rev.fastq", "--fastqout", "{o}.fq"],
    "fastq_filter": [
        "--fastq_filter", f"{D}/merge_fwd.fastq", "--fastq_maxee", "1.0",
        "--fastaout", "{o}.fa"],
    "fastx_filter": [
        "--fastx_filter", "{fix}/pair_fwd.fastq", "--reverse",
        "{fix}/pair_rev.fastq", "--fastq_trunclen", "100", "--fastqout",
        "{o}.fq", "--fastqout_rev", "{o}.r.fq"],
    "fastq_join": [
        "--fastq_join", "{fix}/pair_fwd.fastq", "--reverse",
        "{fix}/pair_rev.fastq", "--fastqout", "{o}.fq"],
    "fastx_syncpairs": [
        "--fastx_syncpairs", "{fix}/pair_fwd.fastq", "--reverse",
        "{fix}/pair_rev.fastq", "--fastqout", "{o}.fq", "--fastqout_rev",
        "{o}.r.fq"],
    "fasta2fastq": [
        "--fasta2fastq", f"{D}/derep_test.fasta", "--fastqout", "{o}.fq"],
    "fastq_convert": [
        "--fastq_convert", "{fix}/pair_fwd.fastq", "--fastqout", "{o}.fq",
        "--fastq_asciiout", "64"],
    "fastq_chars": ["--fastq_chars", "{fix}/pair_fwd.fastq"],
    "fastq_stats": ["--fastq_stats", "{fix}/pair_fwd.fastq"],
    "fastq_eestats": [
        "--fastq_eestats", "{fix}/pair_fwd.fastq", "--output", "{o}.tsv"],
    "fastq_eestats2": [
        "--fastq_eestats2", "{fix}/pair_fwd.fastq", "--output", "{o}.tsv"],
    "sortbysize": [
        "--sortbysize", f"{D}/expected_derep.fasta", "--output", "{o}.fa",
        "--minseqlength", "1"],
    "sortbylength": [
        "--sortbylength", f"{D}/derep_test.fasta", "--output", "{o}.fa",
        "--minseqlength", "1"],
    "shuffle": [
        "--shuffle", f"{D}/chimera_ref.fasta", "--output", "{o}.fa",
        "--randseed", "42", "--minseqlength", "1"],
    "rereplicate": [
        "--rereplicate", f"{D}/expected_derep.fasta", "--output", "{o}.fa",
        "--sizein"],
    "fastx_subsample": [
        "--fastx_subsample", f"{D}/refs_10.fasta", "--fastaout", "{o}.fa",
        "--sample_size", "4", "--randseed", "7"],
    "fastx_mask": [
        "--fastx_mask", f"{D}/dust_test.fasta", "--fastaout", "{o}.fa"],
    "maskfasta": [
        "--maskfasta", f"{D}/dust_test.fasta", "--output", "{o}.fa",
        "--minseqlength", "1"],
    "fastx_revcomp": [
        "--fastx_revcomp", f"{D}/derep_test.fasta", "--fastaout", "{o}.fa"],
    "fastx_getseqs": [
        "--fastx_getseqs", f"{D}/chimera_ref.fasta", "--label_substr_match",
        "--label", "chim", "--fastaout", "{o}.fa"],
    "fastx_getsubseq": [
        "--fastx_getsubseq", f"{D}/derep_test.fasta", "--label", "seq1",
        "--label_substr_match", "--subseq_start", "3", "--subseq_end", "10",
        "--fastaout", "{o}.fa"],
    "cut": [
        "--cut", f"{D}/chimera_ref.fasta", "--cut_pattern", "G^AATT_C",
        "--fastaout", "{o}.fa"],
    "orient": [
        "--orient", f"{D}/chimera_queries.fasta", "--db",
        f"{D}/chimera_ref.fasta", "--fastaout", "{o}.fa"],
    "sintax": [
        "--sintax", f"{D}/chimera_queries.fasta", "--db",
        f"{D}/refs_10.fasta", "--tabbedout", "{o}.tsv", "--randseed", "5"],
    "makeudb_usearch": [
        "--makeudb_usearch", f"{D}/chimera_ref.fasta", "--output", "{o}.udb"],
}

# Error/warning-path cases (reference: utils/fatal.cpp surfaces, the
# per-command option matrix cli.cc:4049-4105, configure_threads warnings
# cli.cc:4112-4148).  {td} expands to the case tempdir (missing files live
# there).  Threads are NOT auto-appended (several cases reject --threads).
ERROR_CASES = {
    "err_missing_query": [
        "--usearch_global", "{td}/missing.fa", "--db",
        f"{D}/chimera_ref.fasta", "--id", "0.9", "--alnout", "{o}.aln"],
    "err_missing_db": [
        "--usearch_global", f"{D}/chimera_queries.fasta", "--db",
        "{td}/missing.fa", "--id", "0.9", "--alnout", "{o}.aln"],
    "err_missing_sortbysize": [
        "--sortbysize", "{td}/missing.fa", "--output", "{o}.fa"],
    "err_missing_mergepairs": [
        "--fastq_mergepairs", "{td}/missing.fq", "--reverse",
        "{td}/missing2.fq", "--fastqout", "{o}.fq"],
    "err_missing_sintax_query": [
        "--sintax", "{td}/missing.fa", "--db", f"{D}/refs_10.fasta",
        "--tabbedout", "{o}.tsv"],
    "err_invalid_option_derep": [
        "--derep_fulllength", f"{D}/derep_test.fasta", "--tabbedout",
        "{o}.tsv"],
    "err_invalid_option_filter": [
        "--fastx_filter", f"{D}/derep_test.fasta", "--maxseqlength", "10",
        "--fastaout", "{o}.fa"],
    "warn_uchimeout5_flag": [
        "--uchime_denovo", f"{D}/expected_derep.fasta", "--uchimeout5",
        "--strand", "plus", "--uchimeout", "{o}.tsv", "--minseqlength", "1"],
    "warn_fulldp_flag": [
        "--usearch_global", f"{D}/chimera_queries.fasta", "--db",
        f"{D}/chimera_ref.fasta", "--id", "0.5", "--fulldp", "--uc",
        "{o}.uc"],
    "err_bad_strand": [
        "--usearch_global", f"{D}/chimera_queries.fasta", "--db",
        f"{D}/chimera_ref.fasta", "--id", "0.9", "--strand", "bogus",
        "--uc", "{o}.uc"],
    "err_bad_qmask": [
        "--usearch_global", f"{D}/chimera_queries.fasta", "--db",
        f"{D}/chimera_ref.fasta", "--id", "0.9", "--qmask", "bogus",
        "--uc", "{o}.uc"],
    "err_bad_iddef": [
        "--usearch_global", f"{D}/chimera_queries.fasta", "--db",
        f"{D}/chimera_ref.fasta", "--id", "0.9", "--iddef", "9",
        "--uc", "{o}.uc"],
    "err_bad_int": [
        "--usearch_global", f"{D}/chimera_queries.fasta", "--db",
        f"{D}/chimera_ref.fasta", "--id", "0.9", "--maxaccepts", "1.5",
        "--uc", "{o}.uc"],
    "err_threads_range": [
        "--usearch_global", f"{D}/chimera_queries.fasta", "--db",
        f"{D}/chimera_ref.fasta", "--id", "0.9", "--threads", "9999",
        "--uc", "{o}.uc"],
    "err_relabel_conflict": [
        "--fastx_revcomp", f"{D}/derep_test.fasta", "--relabel", "x",
        "--relabel_sha1", "--fastaout", "{o}.fa"],
    "warn_mt_sortbysize": [
        "--sortbysize", f"{D}/expected_derep.fasta", "--output", "{o}.fa",
        "--threads", "4", "--minseqlength", "1"],
    "err_unwritable_output": [
        "--sortbysize", f"{D}/expected_derep.fasta", "--output",
        "/nonexistent_dir/x", "--minseqlength", "1"],
    "err_two_commands": ["--version", "--help"],
    "warn_no_command": ["--quiet"],
    "err_unknown_option": ["--bogus_xyz"],
    "err_extra_string": [
        "--sortbysize", f"{D}/expected_derep.fasta", "--output", "{o}.fa",
        "extra_string"],
}

_VOLATILE = re.compile(
    rb"^(vsearch v|https://|Started |Finished |Elapsed time|Max memory"
    rb"|WARNING:.*axon|.*xla_bridge.*)")


def norm_stream(raw: bytes, drop_cmdline: bool) -> bytes:
    # argv0 differs between the binaries; getopt-style reports embed it
    raw = raw.replace(REF.encode(), b"vsearch")
    keep = []
    for line in raw.splitlines():
        # progress \r frames: keep only the final state of each line
        if b"\r" in line:
            line = line.rsplit(b"\r", 1)[-1]
        if _VOLATILE.match(line):
            continue
        if drop_cmdline and (b"/vsearch " in line or line.startswith(
                b"vsearch ") or b"refbuild" in line):
            drop_cmdline = False
            continue
        keep.append(line)
    # collapse runs of blank lines (banner removal leaves leading blanks)
    out = []
    for line in keep:
        if line == b"" and (not out or out[-1] == b""):
            continue
        out.append(line)
    while out and out[-1] == b"":
        out.pop()
    return b"\n".join(out)


def run_case(name, args, verbose=False, add_threads=True, add_log=True):
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        make_fixtures(td)
        fixed = [a.format(o="out", fix=str(td), td=str(td)) for a in args]
        if add_threads and args[0][2:] not in (
                "cut", "fastx_getseq", "fastx_getseqs",
                "fastx_getsubseq", "udb2fasta", "udbinfo",
                "udbstats", "makeudb_usearch",
                "fastq_eestats", "fastq_eestats2",
                "sff_convert"):
            fixed += ["--threads", "1"]
        log_args = ["--log", "ref.log"] if add_log else []
        my_log_args = ["--log", "my.log"] if add_log else []
        rref = subprocess.run([REF] + fixed + log_args, cwd=td,
                              capture_output=True)
        rmine = subprocess.run(
            [sys.executable, "-m", "vsearch_tpu.cli"] + fixed
            + my_log_args,
            cwd=td, capture_output=True,
            env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
                 "HOME": "/root", "JAX_PLATFORMS": "cpu"})
        ok = True
        for label, a, b in (
                ("stderr", norm_stream(rref.stderr, True),
                 norm_stream(rmine.stderr, True)),
                ("log", norm_stream((td / "ref.log").read_bytes(), True)
                 if (td / "ref.log").exists() else b"<missing>",
                 norm_stream((td / "my.log").read_bytes(), True)
                 if (td / "my.log").exists() else b"<missing>")):
            if a != b:
                ok = False
                print("==== %s: %s differs" % (name, label))
                import difflib
                for dl in difflib.unified_diff(
                        a.decode(errors="replace").splitlines(),
                        b.decode(errors="replace").splitlines(),
                        "ref", "tpu", lineterm="", n=1):
                    print("  " + dl)
        if rref.returncode != rmine.returncode:
            ok = False
            print("==== %s: exit code ref=%d tpu=%d" % (
                name, rref.returncode, rmine.returncode))
            if rmine.returncode:
                print(rmine.stderr.decode(errors="replace")[-2000:])
        return ok


def run_named(name):
    if name in CASES:
        return run_case(name, CASES[name])
    return run_case(name, ERROR_CASES[name], add_threads=False)


def main():
    names = sys.argv[1:] or (list(CASES) + list(ERROR_CASES))
    bad = [name for name in names if not run_named(name)]
    print("\n%d/%d narration cases match" % (len(names) - len(bad),
                                             len(names)))
    if bad:
        print("MISMATCH:", " ".join(bad))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
