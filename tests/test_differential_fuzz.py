"""Randomized differential tests vs the reference binary.

Seeded random inputs (degenerate reads, ambiguous bases, lowercase/masked
runs, homopolymers, extreme quality scores, duplicate/empty-ish records)
driven through both binaries with byte-compared outputs.  This mirrors the
reference's external black-box suite style (SURVEY.md §4: vsearch-tests,
~7,700 CLI assertions) with generated corpora instead of fixtures.
"""

import random

import pytest

from .conftest import run_ours, run_reference

ALPHA = "ACGT"
AMBIG = "RYSWKMBDHVN"


def _seq(rng, n, amb=0.0, lower=0.0):
    out = []
    for _ in range(n):
        c = rng.choice(AMBIG) if rng.random() < amb else rng.choice(ALPHA)
        if rng.random() < lower:
            c = c.lower()
        out.append(c)
    return "".join(out)


def _mutate(rng, seq, rate):
    out = []
    for c in seq:
        r = rng.random()
        if r < rate * 0.6:
            out.append(rng.choice(ALPHA))        # substitution
        elif r < rate * 0.8:
            continue                             # deletion
        elif r < rate:
            out.append(c)
            out.append(rng.choice(ALPHA))        # insertion
        else:
            out.append(c)
    return "".join(out)


def make_fasta(path, rng, n, minlen=40, maxlen=400, amb=0.02, lower=0.05,
               sizes=False, dupes=0.2):
    seqs = []
    with open(path, "w") as fh:
        for i in range(n):
            if seqs and rng.random() < dupes:
                s = rng.choice(seqs)            # exact or near duplicate
                if rng.random() < 0.5:
                    s = _mutate(rng, s, 0.03)
            elif rng.random() < 0.1:
                s = rng.choice(ALPHA) * rng.randint(minlen, maxlen)  # homopolymer
            else:
                s = _seq(rng, rng.randint(minlen, maxlen), amb, lower)
            seqs.append(s)
            size = ";size=%d" % rng.randint(1, 500) if sizes else ""
            fh.write(">fz%d%s\n%s\n" % (i, size, s))
    return seqs


def make_fastq(path, rng, n, minlen=40, maxlen=300, qmin=2, qmax=41):
    with open(path, "w") as fh:
        for i in range(n):
            s = _seq(rng, rng.randint(minlen, maxlen), amb=0.01)
            q = "".join(chr(33 + rng.randint(qmin, qmax)) for _ in s)
            fh.write("@fz%d extra words\n%s\n+\n%s\n" % (i, s, q))


def make_pairs(path_f, path_r, rng, n, readlen=150):
    comp = str.maketrans("ACGT", "TGCA")
    with open(path_f, "w") as ff, open(path_r, "w") as fr:
        for i in range(n):
            frag = _seq(rng, rng.randint(readlen - 40, 2 * readlen - 20))
            fwd = frag[:readlen]
            rev = frag[-readlen:].translate(comp)[::-1]
            qf = "".join(chr(33 + rng.randint(10, 41)) for _ in fwd)
            qr = "".join(chr(33 + rng.randint(2, 41)) for _ in rev)
            ff.write("@p%d/1\n%s\n+\n%s\n" % (i, fwd, qf))
            fr.write("@p%d/2\n%s\n+\n%s\n" % (i, rev, qr))


def _diff(ref_binary, tmp_path, args, outputs):
    run_reference(ref_binary, [a.format(o="ref") for a in args], tmp_path)
    run_ours([a.format(o="my") for a in args], tmp_path)
    for out in outputs:
        rb = (tmp_path / out.format(o="ref")).read_bytes()
        mb = (tmp_path / out.format(o="my")).read_bytes()
        assert rb == mb, "output %s differs (args=%s)" % (out, args)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_fuzz_derep_family(ref_binary, tmp_path, seed):
    rng = random.Random(seed)
    make_fasta(tmp_path / "in.fa", rng, 120, minlen=5, maxlen=250,
               amb=0.05, lower=0.15, sizes=True, dupes=0.35)
    for verb, extra in [
            ("--derep_fulllength", ["--sizein", "--sizeout",
                                    "--uc", "{o}.uc"]),
            ("--derep_id", ["--sizeout"]),
            ("--derep_prefix", ["--sizein", "--sizeout"]),
            ("--derep_fulllength", ["--strand", "both", "--sizeout",
                                    "--topn", "20"]),
    ]:
        outs = ["{o}.fa"] + [e for e in extra if e.startswith("{o}")]
        _diff(ref_binary, tmp_path,
              [verb, "in.fa", "--output", "{o}.fa", "--minseqlength", "1"]
              + extra, outs)


@pytest.mark.parametrize("seed", [21, 22])
def test_fuzz_search(ref_binary, tmp_path, seed):
    rng = random.Random(seed)
    db = make_fasta(tmp_path / "db.fa", rng, 60, minlen=150, maxlen=600,
                    amb=0.01, lower=0.1, dupes=0.0)
    with open(tmp_path / "q.fa", "w") as fh:
        for i in range(40):
            s = _mutate(rng, rng.choice(db), rng.choice([0.0, 0.05, 0.15]))
            if rng.random() < 0.3:      # reverse-complement some queries
                s = s[::-1].translate(str.maketrans("ACGTacgt", "TGCAtgca"))
            fh.write(">q%d\n%s\n" % (i, s))
    for extra in (
            ["--id", "0.7"],
            ["--id", "0.9", "--strand", "both", "--maxaccepts", "4",
             "--maxrejects", "8"],
            ["--id", "0.5", "--iddef", "0", "--output_no_hits",
             "--maxaccepts", "2"],
            ["--id", "0.8", "--userout", "{o}.user", "--userfields",
             "query+target+id+alnlen+mism+opens+qlo+qhi+tlo+thi+evalue+bits"
             "+qcov+tcov+id0+id1+id2+id3+id4+qstrand+aln+caln"],
    ):
        outs = ["{o}.b6", "{o}.uc"] + [e for e in extra if e.startswith("{o}")]
        _diff(ref_binary, tmp_path,
              ["--usearch_global", "q.fa", "--db", "db.fa",
               "--blast6out", "{o}.b6", "--uc", "{o}.uc",
               "--minseqlength", "1"] + extra, outs)


@pytest.mark.parametrize("seed", [31, 32])
def test_fuzz_cluster(ref_binary, tmp_path, seed):
    rng = random.Random(seed)
    base = [_seq(rng, rng.randint(200, 400)) for _ in range(12)]
    with open(tmp_path / "in.fa", "w") as fh:
        i = 0
        for b in base:
            for _ in range(rng.randint(1, 8)):
                fh.write(">c%d;size=%d\n%s\n"
                         % (i, rng.randint(1, 99), _mutate(rng, b, 0.04)))
                i += 1
    for verb in ("--cluster_size", "--cluster_fast", "--cluster_smallmem"):
        extra = []
        if verb == "--cluster_smallmem":
            extra = ["--usersort"]
        _diff(ref_binary, tmp_path,
              [verb, "in.fa", "--id", "0.92", "--uc", "{o}.uc",
               "--centroids", "{o}.fa", "--sizein", "--sizeout",
               "--minseqlength", "1"] + extra,
              ["{o}.uc", "{o}.fa"])


@pytest.mark.parametrize("seed", [41, 42])
def test_fuzz_fastq_pipeline(ref_binary, tmp_path, seed):
    rng = random.Random(seed)
    make_fastq(tmp_path / "in.fq", rng, 150, minlen=20, maxlen=280)
    for args, outs in [
            ((["--fastq_filter", "in.fq", "--fastq_maxee", "0.8",
               "--fastq_truncqual", "15", "--fastq_minlen", "30",
               "--fastaout", "{o}.fa", "--fastqout", "{o}.fq",
               "--fastqout_discarded", "{o}.d.fq", "--eeout"]),
             ["{o}.fa", "{o}.fq", "{o}.d.fq"]),
            ((["--fastx_filter", "in.fq", "--fastq_stripleft", "5",
               "--fastq_stripright", "3", "--fastq_trunclen_keep", "120",
               "--fastq_maxns", "2", "--fastqout", "{o}.fq"]),
             ["{o}.fq"]),
            ((["--fastq_stats", "in.fq", "--log", "{o}.log"]),
             []),
            ((["--fastq_chars", "in.fq", "--log", "{o}.log"]),
             []),
            ((["--fastx_revcomp", "in.fq", "--fastqout", "{o}.fq",
               "--label_suffix", "_rc"]),
             ["{o}.fq"]),
            ((["--fastq_convert", "in.fq", "--fastqout", "{o}.fq",
               "--fastq_asciiout", "64"]),
             ["{o}.fq"]),
    ]:
        _diff(ref_binary, tmp_path, args, outs)


@pytest.mark.parametrize("seed", [51])
def test_fuzz_mergepairs(ref_binary, tmp_path, seed):
    rng = random.Random(seed)
    make_pairs(tmp_path / "f.fq", tmp_path / "r.fq", rng, 200)
    _diff(ref_binary, tmp_path,
          ["--fastq_mergepairs", "f.fq", "--reverse", "r.fq",
           "--fastqout", "{o}.fq", "--fastaout_notmerged_fwd", "{o}.nf.fa",
           "--fastaout_notmerged_rev", "{o}.nr.fa", "--eetabbedout",
           "{o}.ee", "--fastq_allowmergestagger"],
          ["{o}.fq", "{o}.nf.fa", "{o}.nr.fa", "{o}.ee"])
    _diff(ref_binary, tmp_path,
          ["--fastq_mergepairs", "f.fq", "--reverse", "r.fq",
           "--fastaout", "{o}.fa", "--fastq_minovlen", "20",
           "--fastq_maxdiffs", "4", "--fastq_minmergelen", "100"],
          ["{o}.fa"])


@pytest.mark.parametrize("seed", [61])
def test_fuzz_chimera(ref_binary, tmp_path, seed):
    rng = random.Random(seed)
    parents = [_seq(rng, 350) for _ in range(8)]
    with open(tmp_path / "in.fa", "w") as fh:
        i = 0
        for p in parents:
            fh.write(">p%d;size=%d\n%s\n" % (i, rng.randint(50, 200), p))
            i += 1
        for _ in range(10):                      # synthetic two-parent chimeras
            a, b = rng.sample(parents, 2)
            cut = rng.randint(100, 250)
            fh.write(">x%d;size=%d\n%s\n" % (i, rng.randint(1, 4),
                                             a[:cut] + b[cut:]))
            i += 1
    for verb in ("--uchime_denovo", "--uchime2_denovo", "--uchime3_denovo"):
        _diff(ref_binary, tmp_path,
              [verb, "in.fa", "--chimeras", "{o}.ch.fa", "--nonchimeras",
               "{o}.nc.fa", "--uchimeout", "{o}.tsv", "--minseqlength", "1"],
              ["{o}.ch.fa", "{o}.nc.fa", "{o}.tsv"])


@pytest.mark.parametrize("seed", [71])
def test_fuzz_fastx_misc(ref_binary, tmp_path, seed):
    rng = random.Random(seed)
    make_fasta(tmp_path / "in.fa", rng, 80, minlen=30, maxlen=200,
               amb=0.04, lower=0.2, sizes=True)
    for args, outs in [
            ((["--fastx_subsample", "in.fa", "--fastaout", "{o}.fa",
               "--sample_pct", "35.5", "--randseed", "9", "--sizein",
               "--sizeout", "--fastaout_discarded", "{o}.d.fa"]),
             ["{o}.fa", "{o}.d.fa"]),
            ((["--sortbysize", "in.fa", "--output", "{o}.fa", "--sizein",
               "--minsize", "3", "--minseqlength", "1"]),
             ["{o}.fa"]),
            ((["--sortbylength", "in.fa", "--output", "{o}.fa",
               "--minseqlength", "1"]),
             ["{o}.fa"]),
            ((["--shuffle", "in.fa", "--output", "{o}.fa", "--randseed",
               "3", "--minseqlength", "1"]),
             ["{o}.fa"]),
            ((["--rereplicate", "in.fa", "--output", "{o}.fa", "--sizein"]),
             ["{o}.fa"]),
            ((["--fastx_mask", "in.fa", "--fastaout", "{o}.fa",
               "--qmask", "dust", "--hardmask"]),
             ["{o}.fa"]),
            ((["--search_exact", "in.fa", "--db", "in.fa", "--uc", "{o}.uc",
               "--blast6out", "{o}.b6", "--minseqlength", "1", "--strand",
               "both"]),
             ["{o}.uc", "{o}.b6"]),
    ]:
        _diff(ref_binary, tmp_path, args, outs)


@pytest.mark.parametrize("seed", [81])
def test_fuzz_relabel_annotations(ref_binary, tmp_path, seed):
    rng = random.Random(seed)
    make_fasta(tmp_path / "in.fa", rng, 60, minlen=20, maxlen=120,
               amb=0.03, lower=0.1, sizes=True)
    for args, outs in [
            ((["--fastx_filter", "in.fa", "--fastaout", "{o}.fa",
               "--relabel", "read_", "--sizein", "--sizeout",
               "--fastq_minlen", "25"]),
             ["{o}.fa"]),
            ((["--fastx_filter", "in.fa", "--fastaout", "{o}.fa",
               "--relabel_sha1", "--sizein", "--xsize"]),
             ["{o}.fa"]),
            ((["--fastx_filter", "in.fa", "--fastaout", "{o}.fa",
               "--relabel_md5", "--lengthout"]),
             ["{o}.fa"]),
            ((["--derep_fulllength", "in.fa", "--output", "{o}.fa",
               "--relabel_keep", "--relabel", "Uniq", "--sizein",
               "--sizeout", "--minseqlength", "1"]),
             ["{o}.fa"]),
            ((["--sortbysize", "in.fa", "--output", "{o}.fa", "--sizein",
               "--relabel_self", "--sizeout", "--minseqlength", "1"]),
             ["{o}.fa"]),
            ((["--fastx_filter", "in.fa", "--fastaout", "{o}.fa",
               "--sample", "mysample", "--sizein"]),
             ["{o}.fa"]),
    ]:
        _diff(ref_binary, tmp_path, args, outs)


@pytest.mark.parametrize("seed", [91])
def test_fuzz_orient_join_getseq(ref_binary, tmp_path, seed):
    rng = random.Random(seed)
    comp = str.maketrans("ACGT", "TGCA")
    db = [_seq(rng, rng.randint(200, 350)) for _ in range(20)]
    with open(tmp_path / "db.fa", "w") as fh:
        for i, s in enumerate(db):
            fh.write(">ref%d some description\n%s\n" % (i, s))
    with open(tmp_path / "in.fa", "w") as fh:
        for i in range(40):
            s = _mutate(rng, rng.choice(db), 0.05)
            if rng.random() < 0.5:
                s = s.translate(comp)[::-1]
            fh.write(">q%d\n%s\n" % (i, s))
    _diff(ref_binary, tmp_path,
          ["--orient", "in.fa", "--db", "db.fa", "--fastaout", "{o}.fa",
           "--notmatched", "{o}.nm.fa", "--tabbedout", "{o}.tsv"],
          ["{o}.fa", "{o}.nm.fa", "{o}.tsv"])
    make_pairs(tmp_path / "f.fq", tmp_path / "r.fq", rng, 60)
    _diff(ref_binary, tmp_path,
          ["--fastq_join", "f.fq", "--reverse", "r.fq", "--fastqout",
           "{o}.fq", "--join_padgap", "NNNNN", "--join_padgapq", "IIIII"],
          ["{o}.fq"])
    _diff(ref_binary, tmp_path,
          ["--fastx_getseq", "db.fa", "--label", "ref1", "--fastaout",
           "{o}.fa", "--notmatched", "{o}.nm.fa"],
          ["{o}.fa", "{o}.nm.fa"])
    with open(tmp_path / "labels.txt", "w") as fh:
        fh.write("ref2\nref15\nref7\n")
    _diff(ref_binary, tmp_path,
          ["--fastx_getseqs", "db.fa", "--labels", "labels.txt",
           "--fastaout", "{o}.fa"],
          ["{o}.fa"])


@pytest.mark.parametrize("seed", [101])
def test_fuzz_sintax_allpairs(ref_binary, tmp_path, seed):
    rng = random.Random(seed)
    genera = [_seq(rng, 300) for _ in range(6)]
    with open(tmp_path / "db.fa", "w") as fh:
        for g, base in enumerate(genera):
            for i in range(3):
                fh.write(">r%d_%d;tax=d:Bacteria,p:P%d,g:G%d;\n%s\n"
                         % (g, i, g % 3, g, _mutate(rng, base, 0.02)))
    with open(tmp_path / "q.fa", "w") as fh:
        for i in range(25):
            fh.write(">q%d\n%s\n" % (i, _mutate(rng, rng.choice(genera),
                                                 0.06)))
    _diff(ref_binary, tmp_path,
          ["--sintax", "q.fa", "--db", "db.fa", "--tabbedout", "{o}.tsv",
           "--randseed", "11", "--sintax_cutoff", "0.6"],
          ["{o}.tsv"])
    _diff(ref_binary, tmp_path,
          ["--allpairs_global", "q.fa", "--id", "0.6", "--uc", "{o}.uc",
           "--blast6out", "{o}.b6", "--acceptall", "--minseqlength", "1"],
          ["{o}.uc", "{o}.b6"])
