#!/usr/bin/env python3
"""On-TPU benchmark of all six BASELINE.json configs vs the reference.

Per config: reference timed with default threads (all cores) as a
subprocess; ours timed IN-PROCESS (cli.main) as the second of two runs —
the first amortizes jit compiles, which on the tunneled axon device do
NOT persist across processes (the remote compile helper bypasses JAX's
persistent cache), exactly the bench.py warmup pattern.  An untimed
single-thread reference run is byte-compared against ours for parity.

Writes BENCH_ALL.json: {config: {ours_s, ref_s, ratio, parity}} with
ratio > 1 meaning ours is faster than the all-cores reference on this
host; ratio_16t scales the reference to a 16-thread host assuming linear
thread scaling (ref_qps_16t ~= ref_qps_Ncores * 16/N), the BENCH_r02
convention.

Usage: python tools/bench_all.py [outfile]
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


def gen_amp_families(path, nfam, per, length, rng):
    """Related families so clustering/chimera engage realistic hit paths."""
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "wb") as fh:
        i = 0
        for f in range(nfam):
            base = alphabet[rng.integers(0, 4, size=length)]
            for m in range(per):
                s = base.copy()
                pos = rng.integers(0, length,
                                   size=rng.integers(0, 10 if m else 1))
                s[pos] = alphabet[rng.integers(0, 4, size=pos.size)]
                fh.write(b">s%d;size=%d\n%s\n"
                         % (i, rng.integers(1, 50), s.tobytes()))
                i += 1


def gen_queries(path, chars, n, rng):
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "wb") as fh:
        for i in range(n):
            src = chars[rng.integers(0, chars.shape[0])].copy()
            pos = rng.integers(0, src.size, size=src.size // 20)
            src[pos] = alphabet[rng.integers(0, 4, size=pos.size)]
            fh.write(b">q%d\n%s\n" % (i, src.tobytes()))


def gen_derep_input(path, chars, n, rng):
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


def run_timed(cmd, env=None):
    t0 = time.perf_counter()
    p = subprocess.run(cmd, capture_output=True, env=env)
    dt = time.perf_counter() - t0
    if p.returncode != 0:
        sys.stderr.write(p.stderr.decode(errors="replace")[-2000:])
        raise SystemExit("command failed: %s" % " ".join(map(str, cmd)))
    return dt


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else str(
        REPO / "BENCH_ALL.json")
    cores = os.cpu_count() or 1
    rng = np.random.default_rng(7)
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        d = pathlib.Path(tmp)
        chars = gen_fasta(d / "db.fa", DB, L, rng)
        gen_queries(d / "q.fa", chars, NQ, rng)
        gen_derep_input(d / "reads.fa", chars, 200000, rng)
        gen_amp_families(d / "amp.fa", 1500, 4, L, rng)
        gen_fasta(d / "ap.fa", 800, L, rng)
        gen_fastq_pairs(d / "f.fq", d / "r.fq", 100000, rng)

        sys.path.insert(0, str(REPO))
        from vsearch_tpu import cli

        def chain(binary, tag, steps, extra=()):
            a = [binary] if isinstance(binary, str) else list(binary)
            t0 = time.perf_counter()
            for argv_tpl in steps:
                argv = [x.replace("{o}", str(d / tag)) for x in argv_tpl]
                p = subprocess.run(a + argv + list(extra),
                                   capture_output=True)
                if p.returncode != 0:
                    sys.stderr.write(
                        p.stderr.decode(errors="replace")[-2000:])
                    raise SystemExit("failed: %s" % " ".join(argv))
            return time.perf_counter() - t0

        def chain_ours(tag, steps, extra=()):
            t0 = time.perf_counter()
            for argv_tpl in steps:
                argv = [x.replace("{o}", str(d / tag)) for x in argv_tpl]
                rc = cli.main(argv + list(extra))
                assert rc == 0, "ours failed: %s" % " ".join(argv)
            return time.perf_counter() - t0

        NRUNS = 5

        def bench(name, steps, parity_files):
            import statistics
            # interleave the two sides so a host-steal burst (this is a
            # shared VM; idle steal 1-3%, bursts much higher) hits both
            # comparably; ratio uses medians, ratio_best uses minima
            ref_runs = []
            ours_runs = []
            chain_ours("warm", steps)
            for _ in range(NRUNS):
                ref_runs.append(chain(str(REF), "ref", steps))
                ours_runs.append(chain_ours("my", steps))
            ref_runs.sort()
            ours_runs.sort()
            ref_s = statistics.median(ref_runs)
            ours_s = statistics.median(ours_runs)
            # parity: deterministic single-thread runs
            chain(str(REF), "ref1", steps, extra=("--threads", "1"))
            chain_ours("my1", steps, extra=("--threads", "1"))
            parity = all(
                (d / ("ref1" + sfx)).read_bytes()
                == (d / ("my1" + sfx)).read_bytes()
                for sfx in parity_files)
            ratio = ref_s / ours_s
            results[name] = {
                "ours_s": round(ours_s, 2), "ref_s": round(ref_s, 2),
                "ours_min_med_max": [round(x, 2) for x in
                                     (ours_runs[0], ours_s, ours_runs[-1])],
                "ref_min_med_max": [round(x, 2) for x in
                                    (ref_runs[0], ref_s, ref_runs[-1])],
                "ratio": round(ratio, 3),
                "ratio_best": round(ref_runs[0] / ours_runs[0], 3),
                "ratio_16t": round(ratio * cores / 16.0, 3),
                "parity": parity}
            print("%s: ours %.2fs ref %.2fs -> %.2fx (16t-eq %.2fx) "
                  "parity=%s" % (name, ours_s, ref_s, ratio,
                                 ratio * cores / 16.0, parity),
                  file=sys.stderr, flush=True)

        bench("usearch_global",
              [["--usearch_global", str(d / "q.fa"), "--db",
                str(d / "db.fa"), "--id", "0.9", "--maxaccepts", "1",
                "--maxrejects", "32", "--uc", "{o}.uc", "--quiet"]],
              [".uc"])
        bench("derep_sort",
              [["--derep_fulllength", str(d / "reads.fa"), "--sizeout",
                "--output", "{o}.derep", "--quiet"],
               ["--sortbysize", "{o}.derep", "--output", "{o}.sorted",
                "--quiet"]],
              [".sorted"])
        bench("cluster_size",
              [["--cluster_size", str(d / "amp.fa"), "--id", "0.97",
                "--sizein", "--sizeout", "--centroids", "{o}.cent",
                "--uc", "{o}.uc", "--quiet"]],
              [".cent", ".uc"])
        bench("uchime3_denovo",
              [["--uchime3_denovo", str(d / "amp.fa"),
                "--chimeras", "{o}.chim", "--nonchimeras", "{o}.non",
                "--quiet"]],
              [".chim", ".non"])
        bench("mergepairs_filter",
              [["--fastq_mergepairs", str(d / "f.fq"), "--reverse",
                str(d / "r.fq"), "--fastqout", "{o}.m.fq", "--quiet"],
               ["--fastq_filter", "{o}.m.fq", "--fastq_maxee", "1.0",
                "--fastq_minlen", "200", "--fastaout", "{o}.filt.fa",
                "--quiet"]],
              [".filt.fa"])
        bench("allpairs_global",
              [["--allpairs_global", str(d / "ap.fa"), "--id", "0.5",
                "--blast6out", "{o}.b6", "--quiet"]],
              [".b6"])

    import jax
    results["_meta"] = {
        "cores": cores,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "note": "medians of 3 timed runs each (min/med/max recorded); "
                "ours on the default (TPU) runtime after one warmup run "
                "(per-process kernel compiles); reference -O2 with "
                "default threads (all cores); parity vs --threads 1 "
                "reference outputs",
        "variance": "this tunneled rig's host speed swings ~30% day to "
                    "day (r02->r03 driver numbers moved 3042->2127 q/s "
                    "with the reference moving proportionally); compare "
                    "RATIOS, which are measured interleaved here, not "
                    "absolute seconds across rounds"}
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({k: v.get("ratio_16t") for k, v in results.items()
                      if isinstance(v, dict) and "ratio_16t" in v}))


if __name__ == "__main__":
    main()
