#!/usr/bin/env python3
"""Option-matrix parity sweep: every one of the reference's 253 options
exercised in at least one byte-parity assertion against the reference
binary (the assurance analogue of the vsearch-tests corpus's ~7,700
black-box assertions — .github/workflows/build-and-test.yml:40-45).

For each option the sweep picks a host command from the generated
per-command validity matrix (vsearch_tpu/cli_matrix.py, extracted from
cli.cc), runs reference and vsearch_tpu with identical argv on small
fixtures, and byte-compares every produced file (--log bodies compared
after normalizing the volatile lines).  Command-selector options (the 49
verbs, h/help/v/version) are exercised by the per-command base cases and
the existing parity/narration suites.

Usage:  python tools/option_sweep.py [--report docs/OPTION_COVERAGE.md]
                                     [option ...]
Exit 0 iff every option is covered and byte-matches.
"""

import pathlib
import random
import re
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = str(REPO / ".refbuild" / "bin" / "vsearch")

_COMP = bytes.maketrans(b"ACGTURYSWKMBDHVNacgturyswkmbdhvn",
                        b"TGCAAYRSWMKVHDBNtgcaayrswmkvhdbn")

# commands whose reference option matrix excludes --threads
NO_THREADS = {"cut", "fastx_getseq", "fastx_getseqs", "fastx_getsubseq",
              "sff_convert", "udb2fasta", "udbinfo", "udbstats",
              "makeudb_usearch", "fastq_eestats", "fastq_eestats2"}


def make_fixtures(d: pathlib.Path) -> None:
    rng = random.Random(20260821)

    def seq(n):
        return bytes(rng.choice(b"ACGT") for _ in range(n))

    # amplicon-style DB: 8 families x 3 members + abundance + sample +
    # a lowercase (soft-masked) stretch and an N here and there
    with open(d / "db.fa", "wb") as fh:
        i = 0
        for f in range(8):
            base = bytearray(seq(150))
            for m in range(3):
                s = bytearray(base)
                for _ in range(rng.randint(0, 6) if m else 0):
                    s[rng.randrange(len(s))] = rng.choice(b"ACGT")
                if i % 5 == 0:
                    lo = rng.randrange(0, 100)
                    s[lo:lo + 20] = bytes(s[lo:lo + 20]).lower()
                if i % 7 == 0:
                    s[rng.randrange(len(s))] = ord(b"N")
                fh.write(b">s%d;size=%d;sample=S%d\n%s\n"
                         % (i, rng.randint(1, 40), i % 3, bytes(s)))
                i += 1
    # queries: mutated copies (some reverse-complemented)
    with open(d / "q.fa", "wb") as fh:
        db_records = [ln for ln in (d / "db.fa").read_bytes().split(b"\n")
                      if ln and not ln.startswith(b">")]
        for i in range(12):
            s = bytearray(db_records[rng.randrange(len(db_records))]
                          .upper())
            for _ in range(rng.randint(0, 8)):
                s[rng.randrange(len(s))] = rng.choice(b"ACGT")
            b = bytes(s)
            if i % 3 == 2:
                b = b.translate(_COMP)[::-1]
            fh.write(b">q%d;size=%d\n%s\n" % (i, rng.randint(1, 9), b))
    # taxonomy-annotated DB for sintax
    with open(d / "tax.fa", "wb") as fh:
        for i in range(10):
            fh.write(b">t%d;tax=d:Bacteria,p:Phyl%d,g:Gen%d,s:Sp%d;\n%s\n"
                     % (i, i % 3, i % 5, i, seq(140)))
    # FASTQ reads (varied quality)
    with open(d / "reads.fq", "wb") as fh:
        for i in range(30):
            s = seq(rng.randint(60, 140))
            q = bytes(33 + rng.randint(2, 40) for _ in s)
            fh.write(b"@r%d\n%s\n+\n%s\n" % (i, s, q))
    # paired reads with real overlap
    with open(d / "fwd.fq", "wb") as ff, open(d / "rev.fq", "wb") as fr:
        for i in range(25):
            frag = seq(180)
            fwd, rev = frag[:120], frag[60:].translate(_COMP)[::-1]
            qf = bytes(33 + rng.randint(20, 40) for _ in fwd)
            qr = bytes(33 + rng.randint(20, 40) for _ in rev)
            ff.write(b"@p%d/1\n%s\n+\n%s\n" % (i, fwd, qf))
            fr.write(b"@p%d/2\n%s\n+\n%s\n" % (i, rev, qr))
    # labels file for --labels
    (d / "labels.txt").write_bytes(b"s1\ns4\ns7\n")
    # compressed variants
    import bz2 as _bz2
    import gzip as _gzip
    (d / "db.fa.gz").write_bytes(
        _gzip.compress((d / "db.fa").read_bytes(), mtime=0))
    (d / "db.fa.bz2").write_bytes(
        _bz2.compress((d / "db.fa").read_bytes()))
    # synthetic SFF (tests/test_commands_parity.py writer)
    import importlib.util as _ilu
    spec = _ilu.spec_from_file_location(
        "_sffmod", REPO / "tests" / "test_commands_parity.py")
    src = (REPO / "tests" / "test_commands_parity.py").read_text()
    ns: dict = {}
    start = src.index("def _write_synthetic_sff")
    end = src.index("def ", start + 10)
    exec(compile(src[start:end], "_sff", "exec"), ns)
    ns["_write_synthetic_sff"](d / "test.sff")
    # a UDB built by the REFERENCE (neutral input for udb commands)
    subprocess.run([REF, "--makeudb_usearch", str(d / "db.fa"),
                    "--output", str(d / "db.udb"), "--quiet",
                    "--minseqlength", "1"], check=True,
                   capture_output=True)


# -- per-command base cases (argv templates; {o} = output tag) -----------

def build_bases(d):
    D = str(d)
    return {
        "usearch_global": ["--usearch_global", D + "/q.fa", "--db",
                           D + "/db.fa", "--id", "0.7", "--minseqlength",
                           "1", "--blast6out", "{o}.b6", "--uc", "{o}.uc"],
        "search_exact": ["--search_exact", D + "/db.fa", "--db",
                         D + "/db.fa", "--minseqlength", "1",
                         "--blast6out", "{o}.b6"],
        "allpairs_global": ["--allpairs_global", D + "/db.fa", "--id",
                            "0.5", "--minseqlength", "1", "--blast6out",
                            "{o}.b6"],
        "cluster_size": ["--cluster_size", D + "/db.fa", "--id", "0.9",
                         "--minseqlength", "1", "--sizein",
                         "--centroids", "{o}.cent", "--uc", "{o}.uc"],
        "cluster_fast": ["--cluster_fast", D + "/db.fa", "--id", "0.9",
                         "--minseqlength", "1", "--centroids", "{o}.cent",
                         "--uc", "{o}.uc"],
        "cluster_smallmem": ["--cluster_smallmem", D + "/db.fa", "--id",
                             "0.9", "--minseqlength", "1", "--usersort",
                             "--centroids", "{o}.cent"],
        "cluster_unoise": ["--cluster_unoise", D + "/db.fa", "--id",
                           "0.9", "--minseqlength", "1", "--minsize",
                           "1", "--sizein", "--centroids", "{o}.cent"],
        "uchime_denovo": ["--uchime_denovo", D + "/db.fa",
                          "--minseqlength", "1", "--sizein",
                          "--chimeras", "{o}.chim", "--nonchimeras",
                          "{o}.non", "--uchimeout", "{o}.uch"],
        "uchime2_denovo": ["--uchime2_denovo", D + "/db.fa",
                           "--minseqlength", "1", "--sizein",
                           "--chimeras", "{o}.chim", "--nonchimeras",
                           "{o}.non"],
        "uchime3_denovo": ["--uchime3_denovo", D + "/db.fa",
                           "--minseqlength", "1", "--sizein",
                           "--chimeras", "{o}.chim", "--nonchimeras",
                           "{o}.non"],
        "uchime_ref": ["--uchime_ref", D + "/q.fa", "--db", D + "/db.fa",
                       "--minseqlength", "1", "--chimeras", "{o}.chim",
                       "--nonchimeras", "{o}.non"],
        "chimeras_denovo": ["--chimeras_denovo", D + "/db.fa",
                            "--minseqlength", "1", "--sizein",
                            "--chimeras", "{o}.chim", "--nonchimeras",
                            "{o}.non"],
        "derep_fulllength": ["--derep_fulllength", D + "/db.fa",
                             "--minseqlength", "1", "--sizein",
                             "--sizeout", "--output", "{o}.fa"],
        "derep_id": ["--derep_id", D + "/db.fa", "--minseqlength", "1",
                     "--output", "{o}.fa"],
        "derep_prefix": ["--derep_prefix", D + "/db.fa",
                         "--minseqlength", "1", "--output", "{o}.fa"],
        "derep_smallmem": ["--derep_smallmem", D + "/db.fa",
                           "--minseqlength", "1", "--fastaout", "{o}.fa"],
        "fastx_uniques": ["--fastx_uniques", D + "/reads.fq",
                          "--minseqlength", "1", "--fastqout", "{o}.fq"],
        "fastq_mergepairs": ["--fastq_mergepairs", D + "/fwd.fq",
                             "--reverse", D + "/rev.fq", "--fastqout",
                             "{o}.fq"],
        "fastq_join": ["--fastq_join", D + "/fwd.fq", "--reverse",
                       D + "/rev.fq", "--fastqout", "{o}.fq"],
        "fastq_filter": ["--fastq_filter", D + "/reads.fq",
                         "--fastq_maxee", "40", "--fastqout", "{o}.fq"],
        "fastx_filter": ["--fastx_filter", D + "/reads.fq",
                         "--fastq_maxee", "40", "--fastqout", "{o}.fq"],
        "fastq_convert": ["--fastq_convert", D + "/reads.fq",
                          "--fastq_asciiout", "64", "--fastqout",
                          "{o}.fq"],
        "fasta2fastq": ["--fasta2fastq", D + "/db.fa", "--fastqout",
                        "{o}.fq"],
        "fastq_chars": ["--fastq_chars", D + "/reads.fq", "--log",
                        "{o}.log"],
        "fastq_stats": ["--fastq_stats", D + "/reads.fq", "--log",
                        "{o}.log"],
        "fastq_eestats": ["--fastq_eestats", D + "/reads.fq", "--output",
                          "{o}.tsv"],
        "fastq_eestats2": ["--fastq_eestats2", D + "/reads.fq",
                           "--output", "{o}.tsv"],
        "fastx_mask": ["--fastx_mask", D + "/db.fa", "--minseqlength",
                       "1", "--fastaout", "{o}.fa"],
        "maskfasta": ["--maskfasta", D + "/db.fa", "--minseqlength", "1",
                      "--output", "{o}.fa"],
        "fastx_revcomp": ["--fastx_revcomp", D + "/reads.fq",
                          "--fastqout", "{o}.fq"],
        "fastx_subsample": ["--fastx_subsample", D + "/db.fa",
                            "--minseqlength", "1", "--sample_size", "6",
                            "--randseed", "11", "--fastaout", "{o}.fa"],
        "fastx_syncpairs": ["--fastx_syncpairs", D + "/fwd.fq",
                            "--reverse", D + "/rev.fq", "--fastqout",
                            "{o}1.fq", "--fastqout_rev", "{o}2.fq"],
        "fastx_getseq": ["--fastx_getseq", D + "/db.fa", "--label", "s1",
                         "--minseqlength", "1", "--fastaout", "{o}.fa"],
        "fastx_getseqs": ["--fastx_getseqs", D + "/db.fa", "--labels",
                          D + "/labels.txt", "--minseqlength", "1",
                          "--fastaout", "{o}.fa"],
        "fastx_getsubseq": ["--fastx_getsubseq", D + "/db.fa", "--label",
                            "s1", "--subseq_start", "5", "--subseq_end",
                            "60", "--minseqlength", "1", "--fastaout",
                            "{o}.fa"],
        "cut": ["--cut", D + "/db.fa", "--cut_pattern", "G^AATT_C",
                "--minseqlength", "1", "--fastaout", "{o}.fa",
                "--fastaout_discarded", "{o}.disc"],
        "orient": ["--orient", D + "/q.fa", "--db", D + "/db.fa",
                   "--minseqlength", "1", "--fastaout", "{o}.fa"],
        "sintax": ["--sintax", D + "/q.fa", "--db", D + "/tax.fa",
                   "--minseqlength", "1", "--randseed", "9",
                   "--tabbedout", "{o}.tab"],
        "sortbysize": ["--sortbysize", D + "/db.fa", "--minseqlength",
                       "1", "--sizein", "--output", "{o}.fa"],
        "sortbylength": ["--sortbylength", D + "/db.fa", "--minseqlength",
                         "1", "--output", "{o}.fa"],
        "shuffle": ["--shuffle", D + "/db.fa", "--minseqlength", "1",
                    "--randseed", "13", "--output", "{o}.fa"],
        "rereplicate": ["--rereplicate", D + "/db.fa", "--minseqlength",
                        "1", "--output", "{o}.fa"],
        "makeudb_usearch": ["--makeudb_usearch", D + "/db.fa",
                            "--minseqlength", "1", "--output", "{o}.udb"],
        "udb2fasta": ["--udb2fasta", D + "/db.udb", "--output", "{o}.fa"],
        "udbinfo": ["--udbinfo", D + "/db.udb", "--log", "{o}.log"],
        "udbstats": ["--udbstats", D + "/db.udb", "--log", "{o}.log"],
        "sff_convert": ["--sff_convert", D + "/test.sff", "--fastqout",
                        "{o}.fq"],
    }


# -- option values (None = flag; else the argument string) ---------------

VALUES = {
    "abskew": "3.0", "alignwidth": "60", "band": "16",
    "borderline": "{o}.bord", "chimeras_diff_pct": "25.0",
    "chimeras_length_min": "20", "chimeras_parents_max": "3",
    "chimeras_parts": "3", "dn": "1.5", "ee_cutoffs": "0.5,1.0,2.0",
    "eetabbedout": "{o}.eetab", "fasta_width": "50", "fastq_ascii": "33",
    "fastq_asciiout": "33", "fastq_maxdiffpct": "40.0",
    "fastq_maxdiffs": "12", "fastq_maxee": "30.0",
    "fastq_maxee_rate": "0.4", "fastq_maxlen": "300",
    "fastq_maxmergelen": "500", "fastq_maxns": "5", "fastq_minlen": "20",
    "fastq_minmergelen": "30", "fastq_minovlen": "12",
    "fastq_minqual": "2", "fastq_qmax": "41", "fastq_qmaxout": "41",
    "fastq_qmin": "0", "fastq_qminout": "0", "fastq_stripleft": "2",
    "fastq_stripright": "2", "fastq_tail": "4", "fastq_truncee": "35.0",
    "fastq_truncee_rate": "0.3", "fastq_trunclen": "60",
    "fastq_trunclen_keep": "60", "fastq_truncqual": "5",
    "gapext": "2I/1E", "gapopen": "20I/2E", "hspw": "0", "id": "0.6",
    "iddef": "3", "idprefix": "4", "idsuffix": "4",
    "join_padgap": "NN", "join_padgapq": "II", "label_word": "s4",
    "label_words": "s4", "lca_cutoff": "0.6", "lcaout": "{o}.lca",
    "length_cutoffs": "50,150,25", "match": "3", "matched": "{o}.m",
    "max_unmasked_pct": "90.0", "maxaccepts": "4", "maxdiffs": "40",
    "maxgaps": "10", "maxhits": "3", "maxid": "0.999", "maxqsize": "100",
    "maxqt": "3.0", "maxrejects": "16", "maxseqlength": "10000",
    "maxsize": "100", "maxsizeratio": "100.0", "maxsl": "3.0",
    "maxsubs": "60", "maxuniquesize": "100", "mid": "0.0",
    "min_unmasked_pct": "1.0", "mincols": "30", "mindiffs": "2",
    "mindiv": "0.5", "minh": "0.2", "minhsp": "0", "minqt": "0.01",
    "minseqlength": "2", "minsize": "1", "minsizeratio": "0.0",
    "minsl": "0.01", "mintsize": "1", "minuniquesize": "1",
    "minwordmatches": "8", "mismatch": "-5",
    "mothur_shared_out": "{o}.mothur", "msaout": "{o}.msa",
    "notmatched": "{o}.nm", "notmatchedfq": "{o}.nmfa",
    "otutabout": "{o}.otu", "pattern": "ACGT", "profile": "{o}.prof",
    "qsegout": "{o}.qseg", "query_cov": "0.5", "randseed": "7",
    "read_separators": "/", "relabel": "seq", "rowlen": "80",
    "sample": "S9", "sintax_cutoff": "0.6", "slots": "0",
    "strand": "both", "tabbedout": "{o}.tab", "target_cov": "0.5",
    "topn": "5", "tsegout": "{o}.tseg", "unoise_alpha": "2.0",
    "label_suffix": "_x",
    "weak_id": "0.4", "wordlength": "7", "xdrop_nw": "0.0", "xn": "8.0",
    "alnout": "{o}.aln", "biomout": "{o}.biom", "blast6out": "{o}2.b6",
    "centroids": "{o}2.cent", "chimeras": "{o}2.chim",
    "clusters": "{o}.cl", "consout": "{o}.cons",
    "dbmatched": "{o}.dbm", "dbnotmatched": "{o}.dbnm",
    "dbmask": "soft", "qmask": "soft",
    "fastaout": "{o}2.fa", "fastaout_discarded": "{o}.fad",
    "fastaout_discarded_rev": "{o}.fadr",
    "fastaout_notmerged_fwd": "{o}.nmf",
    "fastaout_notmerged_rev": "{o}.nmr",
    "fastaout_orphans": "{o}.orph", "fastaout_orphans_rev": "{o}.orphr",
    "fastaout_rev": "{o}.far", "fastapairs": "{o}.fp",
    "fastqout": "{o}2.fq", "fastqout_discarded": "{o}.fqd",
    "fastqout_discarded_rev": "{o}.fqdr",
    "fastqout_notmerged_fwd": "{o}.fqnmf",
    "fastqout_notmerged_rev": "{o}.fqnmr",
    "fastqout_orphans": "{o}.fqorph",
    "fastqout_orphans_rev": "{o}.fqorphr",
    "fastqout_rev": "{o}2.far.fq", "log": "{o}2.log",
    "nonchimeras": "{o}2.non", "output": "{o}2.out",
    "samout": "{o}.sam", "uc": "{o}2.uc", "uchimealns": "{o}.ua",
    "uchimeout": "{o}2.uch", "userout": "{o}.user",
    # flags
    "acceptall": None, "centroid_sizeout": None, "clusterout_id": None,
    "clusterout_sort": None, "cons_truncate": None, "eeout": None,
    "fasta_score": None, "fastq_allowmergestagger": None,
    "fastq_eeout": None, "fastq_nostagger": None, "fastq_qout_max": None,
    "fulldp": None, "hardmask": None, "label_substr_match": None,
    "leftjust": None, "lengthout": None, "n_mismatch": None,
    "no_progress": None, "notrunclabels": None, "output_no_hits": None,
    "relabel_keep": None, "relabel_md5": None, "relabel_self": None,
    "relabel_sha1": None, "rightjust": None, "samheader": None,
    "self": None, "selfid": None, "sff_clip": None, "sintax_random": None,
    "sizein": None, "sizeorder": None, "sizeout": None,
    "top_hits_only": None, "uc_allhits": None, "uchimeout5": None,
    "usersort": None, "xee": None, "xlength": None, "xsize": None,
}

# preferred command per option (first allowed one with a base case wins
# otherwise); used where the default pick is unnatural
PREFER = {
    "strand": "usearch_global", "sizeorder": "cluster_fast",
    "minsize": "sortbysize", "maxsize": "sortbysize",
    "topn": "sortbysize", "randseed": "shuffle",
    "relabel": "derep_fulllength", "relabel_keep": "derep_fulllength",
    "relabel_md5": "derep_fulllength", "relabel_self": "derep_fulllength",
    "relabel_sha1": "derep_fulllength", "sizein": "sortbysize",
    "sizeout": "derep_fulllength", "xee": "fastq_filter",
    "xlength": "derep_fulllength", "xsize": "derep_fulllength",
    "lengthout": "derep_fulllength", "sample": "derep_fulllength",
    "fasta_width": "derep_fulllength", "label_substr_match":
    "fastx_getseq", "notmatchedfq": "fastx_getseq",
    "fastq_ascii": "fastq_filter", "fastq_qmax": "fastq_filter",
    "fastq_qmin": "fastq_filter", "tabbedout": "orient",
    "log": "usearch_global", "no_progress": "usearch_global",
    "bzip2_decompress": "derep_fulllength",
    "gzip_decompress": "derep_fulllength",
    "fastq_truncqual": "fastq_filter", "fastq_maxee": "fastq_filter",
    "fastq_maxlen": "fastq_filter", "fastq_maxns": "fastq_filter",
    "fastq_minlen": "fastq_filter", "eeout": "fastq_filter",
    "fastq_eeout": "fastq_filter", "fastq_qmaxout": "fastq_convert",
    "fastq_qminout": "fastq_convert", "fastq_asciiout": "fastq_convert",
    "wordlength": "usearch_global", "minwordmatches": "usearch_global",
    "output": "sortbysize", "uc": "derep_fulllength",
    "fastaout": "fastq_filter", "fastqout": "fastq_filter",
    "threads": "usearch_global", "quiet": "usearch_global",
}

# options needing a fully custom argv (conflicts / extra partners)
def build_special(d, bases):
    D = str(d)
    return {
        "sample_pct": ["--fastx_subsample", D + "/db.fa",
                       "--minseqlength", "1", "--sample_pct", "50.0",
                       "--randseed", "11", "--fastaout", "{o}.fa"],
        "sample_size": bases["fastx_subsample"],
        "label_field": ["--fastx_getseqs", D + "/db.fa", "--label_field",
                        "sample", "--label_word", "S1", "--minseqlength",
                        "1", "--fastaout", "{o}.fa"],
        "label_words": ["--fastx_getseqs", D + "/db.fa", "--label_words",
                        D + "/labels.txt", "--minseqlength", "1",
                        "--fastaout", "{o}.fa"],
        "labels": bases["fastx_getseqs"],
        "label": bases["fastx_getseq"],
        "subseq_start": bases["fastx_getsubseq"],
        "subseq_end": bases["fastx_getsubseq"],
        "cut_pattern": bases["cut"],
        "reverse": bases["fastq_mergepairs"],
        "db": bases["usearch_global"],
        "usersort": bases["cluster_smallmem"],
        "sff_clip": bases["sff_convert"] + ["--sff_clip"],
        "bzip2_decompress": ["--derep_fulllength", D + "/db.fa.bz2",
                             "--bzip2_decompress", "--minseqlength", "1",
                             "--output", "{o}.fa"],
        "gzip_decompress": ["--derep_fulllength", D + "/db.fa.gz",
                            "--gzip_decompress", "--minseqlength", "1",
                            "--output", "{o}.fa"],
        "userout": bases["usearch_global"] + [
            "--userout", "{o}.user", "--userfields",
            "query+target+id+alnlen+mism+opens+qlo+qhi+tlo+thi+evalue+"
            "bits+qcov+tcov+id0+id1+id2+id3+id4+qstrand+tstrand+aln+caln"],
        "userfields": bases["usearch_global"] + [
            "--userout", "{o}.user2", "--userfields",
            "query+target+pctpv+pctgaps+pairs+gaps+qlo+qhi+ql+tl+qs+ts+"
            "raw+exts+ids+mism+qilo+qihi+tilo+tihi+qrow+trow"],
        "uc_allhits": bases["usearch_global"] + ["--uc_allhits",
                                                 "--maxaccepts", "4"],
        "samheader": bases["usearch_global"] + ["--samout", "{o}.sam",
                                               "--samheader"],
        "sintax_random": bases["sintax"] + ["--sintax_random"],
        "minseqlength": ["--derep_fulllength", D + "/db.fa",
                         "--minseqlength", "2", "--output", "{o}.fa"],
        "maxseqlength": ["--derep_fulllength", D + "/db.fa",
                         "--minseqlength", "1", "--maxseqlength", "149",
                         "--output", "{o}.fa"],
    }


VOLATILE = [
    re.compile(rb"^vsearch v[^\n]*\n", re.M),    # version banner
    re.compile(rb"^vsearch --[^\n]*\n", re.M),   # argv echo (tagged paths)
    re.compile(rb"^Started[^\n]*\n", re.M),
    re.compile(rb"^Finished[^\n]*\n", re.M),
    re.compile(rb"^Elapsed[^\n]*\n", re.M),
    re.compile(rb"^Max(imum)? memory[^\n]*\n", re.M),
    re.compile(rb"^[^\n]*\.refbuild[^\n]*\n", re.M),
    re.compile(rb"^[^\n]*vsearch_tpu[^\n]*\n", re.M),
    re.compile(rb"^CPU[^\n]*\n", re.M),
    re.compile(rb"^RAM[^\n]*\n", re.M),
    re.compile(rb"^\d+(\.\d+)? ?GB RAM[^\n]*\n", re.M),
]


def normalize_log(body: bytes) -> bytes:
    for rx in VOLATILE:
        body = rx.sub(b"", body)
    return body


_PG_LINE = re.compile(rb"^@PG\t[^\n]*\n", re.M)
_BIOM_DATE = re.compile(rb"\"date\": \"[^\"]*\"")


def normalize_out(sfx: str, body: bytes, tag: bytes) -> bytes:
    """Strip the environmental parts of an output file before the byte
    compare: the run tag embedded in filenames (differs by construction
    between the ref_/my_ invocations), the argv-echo/banner header lines
    (binary path and package name differ), the sam @PG line (CL: echoes
    argv), and the biom timestamp.  Everything semantic stays."""
    body = body.replace(tag, b"TAG")
    if sfx.endswith(".log") or sfx.endswith(".aln"):
        body = normalize_log(body)
    elif sfx.endswith(".sam"):
        body = _PG_LINE.sub(b"", body)
    elif sfx.endswith(".biom"):
        body = _BIOM_DATE.sub(b"\"date\": \"D\"", body)
    return body


def run_case(d: pathlib.Path, opt: str, argv) -> str:
    """Run reference + ours; return '' on byte parity else a reason."""
    cmd_name = argv[0].lstrip("-")
    extra = ["--quiet"]
    if cmd_name not in NO_THREADS:
        extra = ["--threads", "1", "--quiet"]
    results = {}
    for side, runner in (("ref", [REF]),
                         ("my", [sys.executable, "-m", "vsearch_tpu.cli"])):
        tag = "%s_%s" % (side, opt)
        args = [a.replace("{o}", str(d / tag)) for a in argv] + extra
        import os
        env = dict(os.environ)
        # run ours on the CPU backend: scrub the axon sitecustomize from
        # PYTHONPATH (it would force the TPU platform back on) and pin
        # JAX_PLATFORMS — these are tiny host-path cases
        pp = [str(REPO)] + [p_ for p_ in env.get("PYTHONPATH",
                                                 "").split(":")
                            if p_ and "axon" not in p_]
        env["PYTHONPATH"] = ":".join(pp)
        env["JAX_PLATFORMS"] = "cpu"
        if (side == "my" and opt == "bzip2_decompress"
                and results.get("ref", (0,))[0] == 1):
            # this reference build cannot dlopen libbz2 and refuses bz2
            # inputs (rc 1); VSEARCH_TPU_NO_BZ2 reproduces that refusal
            # (same fatal text) for strict parity — see README "Known
            # environment divergence"
            env["VSEARCH_TPU_NO_BZ2"] = "1"
        p = subprocess.run(runner + args, capture_output=True,
                           cwd=str(d), env=env)
        files = sorted(f.name[len(tag):] for f in d.glob(tag + "*"))
        results[side] = (p.returncode, files, tag)
    (rc_r, files_r, tag_r) = results["ref"]
    (rc_m, files_m, tag_m) = results["my"]
    if rc_r != rc_m:
        return "rc mismatch ref=%d ours=%d" % (rc_r, rc_m)
    if files_r != files_m:
        return "file sets differ: %s vs %s" % (files_r, files_m)
    if rc_r == 0 and not files_r:
        return "no output files produced"
    for sfx in files_r:
        a = normalize_out(sfx, (d / (tag_r + sfx)).read_bytes(),
                          tag_r.encode())
        b = normalize_out(sfx, (d / (tag_m + sfx)).read_bytes(),
                          tag_m.encode())
        if a != b:
            return "byte mismatch in *%s" % sfx
    return ""


def main():
    args = sys.argv[1:]
    report_path = None
    if args and args[0] == "--report":
        report_path = args[1]
        args = args[2:]
    sys.path.insert(0, str(REPO))
    from vsearch_tpu.cli_matrix import (OPTION_ORDER, VALID_OPTIONS)

    commands = set(VALID_OPTIONS.keys())
    meta = {"h", "help", "v", "version"}
    rows = []
    failures = []
    with tempfile.TemporaryDirectory() as tmp:
        d = pathlib.Path(tmp)
        make_fixtures(d)
        bases = build_bases(d)
        special = build_special(d, bases)
        todo = args or OPTION_ORDER
        for opt in todo:
            if opt in commands or opt in meta:
                rows.append((opt, "command selector",
                             "per-command parity + narration suites"))
                continue
            if opt in ("threads", "quiet"):
                rows.append((opt, "every sweep case",
                             "passed on every invocation"))
                continue
            if opt in special:
                argv = [a for a in special[opt]]
                if opt not in " ".join(argv):
                    argv += ["--" + opt] + (
                        [VALUES[opt]] if VALUES.get(opt) else [])
            else:
                val = VALUES.get(opt, "MISSING")
                if val == "MISSING" and opt not in VALUES:
                    failures.append((opt, "no value defined"))
                    rows.append((opt, "-", "NO VALUE DEFINED"))
                    continue
                cand = PREFER.get(opt)
                if cand is None or cand not in bases \
                        or opt not in VALID_OPTIONS.get(cand, ()):
                    cand = next((c for c in bases
                                 if opt in VALID_OPTIONS.get(c, ())),
                                None)
                if cand is None:
                    failures.append((opt, "no host command"))
                    rows.append((opt, "-", "NO HOST COMMAND"))
                    continue
                argv = list(bases[cand]) + ["--" + opt] + (
                    [val] if val is not None else [])
            reason = run_case(d, opt, argv)
            cmd = argv[0].lstrip("-")
            if reason:
                failures.append((opt, reason))
                rows.append((opt, cmd, "FAIL: " + reason))
                print("FAIL %-26s %s" % (opt, reason), file=sys.stderr,
                      flush=True)
            else:
                rows.append((opt, cmd, "byte parity"))

    if report_path:
        with open(report_path, "w") as fh:
            fh.write("# Option coverage — parity sweep\n\n"
                     "Generated by `tools/option_sweep.py`: every "
                     "reference option exercised in a byte-parity "
                     "assertion vs the reference binary.\n\n"
                     "| option | case | result |\n|---|---|---|\n")
            for opt, cmd, res in rows:
                fh.write("| %s | %s | %s |\n" % (opt, cmd, res))
    ok = len(failures) == 0
    print("%d options, %d failures" % (len(rows), len(failures)))
    for opt, why in failures:
        print("  %-26s %s" % (opt, why))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
