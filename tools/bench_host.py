#!/usr/bin/env python3
"""Host-tier benchmark: ours (CPU/native tier, no TPU) vs the reference
binary on the six BASELINE.json configs, on this host's cores.

Writes BENCH_host.json: per config {ours_s, ref_s, ratio} where ratio > 1
means we are faster.  Both sides run as subprocesses with all cores;
ours is forced onto the CPU/native tier (JAX_PLATFORMS=cpu, axon site
scrubbed) so this measures the host runtime, not the TPU.

Usage: python tools/bench_host.py [outfile]
"""

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = REPO / ".refbuild" / "bin" / "vsearch"

DB = 20000
NQ = 2000
L = 400


def gen_fasta(path, n, length, rng, sizes=False):
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    chars = alphabet[rng.integers(0, 4, size=(n, length), dtype=np.int8)]
    with open(path, "wb") as fh:
        for i in range(n):
            size = b";size=%d" % rng.integers(1, 50) if sizes else b""
            fh.write(b">s%d%s\n%s\n" % (i, size, chars[i].tobytes()))
    return chars


def gen_queries(path, chars, n, rng):
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "wb") as fh:
        for i in range(n):
            src = chars[rng.integers(0, chars.shape[0])].copy()
            pos = rng.integers(0, src.size, size=src.size // 20)
            src[pos] = alphabet[rng.integers(0, 4, size=pos.size)]
            fh.write(b">q%d\n%s\n" % (i, src.tobytes()))


def gen_derep_input(path, chars, n, rng):
    """n reads drawn (with replacement) from the first 2000 templates."""
    with open(path, "wb") as fh:
        for i in range(n):
            src = chars[rng.integers(0, 2000)]
            fh.write(b">r%d\n%s\n" % (i, src.tobytes()))


def gen_fastq_pairs(fwd, rev, n, rng):
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = dict(zip(b"ACGT", b"TGCA"))
    with open(fwd, "wb") as ffh, open(rev, "wb") as rfh:
        for i in range(n):
            frag = alphabet[rng.integers(0, 4, size=420)]
            f = frag[:250].tobytes()
            r = bytes(comp[c] for c in reversed(frag[170:420].tobytes()))
            q = (b"I" * 250)
            ffh.write(b"@p%d\n%s\n+\n%s\n" % (i, f, q))
            rfh.write(b"@p%d\n%s\n+\n%s\n" % (i, r, q))


def run(cmd, env=None):
    t0 = time.perf_counter()
    p = subprocess.run(cmd, capture_output=True, env=env)
    dt = time.perf_counter() - t0
    if p.returncode != 0:
        sys.stderr.write(p.stderr.decode(errors="replace")[-2000:])
        raise SystemExit("command failed: %s" % " ".join(map(str, cmd)))
    return dt


def ours_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    return env


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "BENCH_host.json")
    rng = np.random.default_rng(7)
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        d = pathlib.Path(tmp)
        chars = gen_fasta(d / "db.fa", DB, L, rng)
        gen_queries(d / "q.fa", chars, NQ, rng)
        gen_derep_input(d / "reads.fa", chars, 200000, rng)
        gen_fasta(d / "amp.fa", 4000, L, rng, sizes=True)
        gen_fasta(d / "ap.fa", 800, L, rng)      # allpairs is O(n^2) DP
        gen_fastq_pairs(d / "f.fq", d / "r.fq", 100000, rng)

        configs = {
            "usearch_global": (
                ["--usearch_global", str(d / "q.fa"), "--db", str(d / "db.fa"),
                 "--id", "0.9", "--maxaccepts", "1", "--maxrejects", "32",
                 "--uc", "{o}.uc", "--quiet"]),
            "derep_sort": None,      # special-cased two-step below
            "cluster_size": (
                ["--cluster_size", str(d / "amp.fa"), "--id", "0.97",
                 "--sizein", "--sizeout", "--centroids", "{o}.cent",
                 "--uc", "{o}.uc", "--quiet"]),
            "uchime3_denovo": (
                ["--uchime3_denovo", str(d / "amp.fa"),
                 "--chimeras", "{o}.chim", "--nonchimeras", "{o}.non",
                 "--quiet"]),
            "mergepairs_filter": None,  # special-cased below
            "allpairs_global": (
                ["--allpairs_global", str(d / "ap.fa"), "--id", "0.5",
                 "--blast6out", "{o}.b6", "--quiet"]),
        }

        def both(name, argv_tpl):
            ref_args = [str(REF)] + [a.replace("{o}", str(d / "ref")) for a in argv_tpl]
            my_args = [sys.executable, "-m", "vsearch_tpu"] + \
                [a.replace("{o}", str(d / "my")) for a in argv_tpl]
            ref_s = run(ref_args)
            ours_s = run(my_args, env=ours_env())
            results[name] = {"ours_s": round(ours_s, 2),
                             "ref_s": round(ref_s, 2),
                             "ratio": round(ref_s / ours_s, 3)}
            print("%s: ours %.2fs ref %.2fs -> %.2fx" % (
                name, ours_s, ref_s, ref_s / ours_s), file=sys.stderr)

        for name, tpl in configs.items():
            if tpl is not None:
                both(name, tpl)

        # derep_fulllength + sortbysize (two-step pipeline)
        def derep_chain(binary, tag, env=None):
            t0 = time.perf_counter()
            a = [binary] if isinstance(binary, str) else binary
            subprocess.run(
                a + ["--derep_fulllength", str(d / "reads.fa"), "--sizeout",
                     "--output", str(d / (tag + ".derep")), "--quiet"],
                check=True, capture_output=True, env=env)
            subprocess.run(
                a + ["--sortbysize", str(d / (tag + ".derep")),
                     "--output", str(d / (tag + ".sorted")), "--quiet"],
                check=True, capture_output=True, env=env)
            return time.perf_counter() - t0

        ref_s = derep_chain(str(REF), "ref")
        ours_s = derep_chain([sys.executable, "-m", "vsearch_tpu"], "my",
                             env=ours_env())
        results["derep_sort"] = {"ours_s": round(ours_s, 2),
                                 "ref_s": round(ref_s, 2),
                                 "ratio": round(ref_s / ours_s, 3)}
        print("derep_sort: ours %.2fs ref %.2fs -> %.2fx" % (
            ours_s, ref_s, ref_s / ours_s), file=sys.stderr)

        # fastq_mergepairs + fastq_filter
        def merge_chain(binary, tag, env=None):
            a = [binary] if isinstance(binary, str) else binary
            t0 = time.perf_counter()
            subprocess.run(
                a + ["--fastq_mergepairs", str(d / "f.fq"), "--reverse",
                     str(d / "r.fq"), "--fastqout", str(d / (tag + ".m.fq")),
                     "--quiet"],
                check=True, capture_output=True, env=env)
            subprocess.run(
                a + ["--fastq_filter", str(d / (tag + ".m.fq")),
                     "--fastq_maxee", "1.0", "--fastq_minlen", "200",
                     "--fastaout", str(d / (tag + ".filt.fa")), "--quiet"],
                check=True, capture_output=True, env=env)
            return time.perf_counter() - t0

        ref_s = merge_chain(str(REF), "ref")
        ours_s = merge_chain([sys.executable, "-m", "vsearch_tpu"], "my",
                             env=ours_env())
        results["mergepairs_filter"] = {"ours_s": round(ours_s, 2),
                                        "ref_s": round(ref_s, 2),
                                        "ratio": round(ref_s / ours_s, 3)}
        print("mergepairs_filter: ours %.2fs ref %.2fs -> %.2fx" % (
            ours_s, ref_s, ref_s / ours_s), file=sys.stderr)

    results["_meta"] = {"cores": os.cpu_count(),
                        "note": "ours on CPU/native tier (no TPU); "
                                "reference with default threads"}
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({k: v.get("ratio") for k, v in results.items()
                      if isinstance(v, dict) and "ratio" in v}))


if __name__ == "__main__":
    main()
