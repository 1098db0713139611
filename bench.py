#!/usr/bin/env python3
"""Benchmark: usearch_global queries/s vs the reference vsearch binary.

Generates a synthetic amplicon workload (DB of random ~600 nt sequences,
queries mutated from DB members at ~95% identity), runs the TPU pipeline
and the reference binary (all cores) on identical input, verifies the uc
outputs agree, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "queries/s", "vs_baseline": R}

vs_baseline is ours/reference queries-per-second (>1 means faster) on THIS
host's core count; the north-star 16-thread-x86 comparison is derived in
BENCH notes (the reference scales near-linearly in threads on this
memory-bound workload, so ref_qps_16t ~= ref_qps_2t * 8).

The reference binary is REQUIRED: if .refbuild/bin/vsearch is missing the
bench builds it via tools/build_reference.sh and fails loudly if that
fails — it never reports a silent 0.0 baseline.

Environment knobs: BENCH_DB (default 100000 sequences), BENCH_QUERIES
(default 2000), BENCH_SEQLEN (600), BENCH_RUNS (3, median reported).
"""

import json
import os
import pathlib
import random
import statistics
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

REF_BINARY = REPO / ".refbuild" / "bin" / "vsearch"

DB_SIZE = int(os.environ.get("BENCH_DB", "100000"))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", "2000"))
SEQ_LEN = int(os.environ.get("BENCH_SEQLEN", "600"))
N_RUNS = int(os.environ.get("BENCH_RUNS", "3"))
IDENTITY = 0.9


def ensure_reference() -> None:
    if REF_BINARY.exists():
        return
    sys.stderr.write("bench: building reference binary into .refbuild/ ...\n")
    rc = subprocess.run(["sh", str(REPO / "tools" / "build_reference.sh")],
                        capture_output=True)
    if rc.returncode != 0 or not REF_BINARY.exists():
        sys.stderr.write(rc.stdout.decode(errors="replace"))
        sys.stderr.write(rc.stderr.decode(errors="replace"))
        sys.stderr.write(
            "bench: FATAL: reference binary unavailable; refusing to report "
            "a baseline-less number (see tools/build_reference.sh)\n")
        raise SystemExit(1)


def generate(workdir: pathlib.Path, db_size=None, n_queries=None,
             seq_len=None):
    """Vectorized synthetic workload (numpy): ~1M x 600 nt in seconds.

    The single source of truth for the bench dataset (seed 1234);
    tools/gen_benchdata.py imports this so offline-generated datasets are
    byte-identical to what the bench measures."""
    import numpy as np
    db_size = DB_SIZE if db_size is None else db_size
    n_queries = N_QUERIES if n_queries is None else n_queries
    seq_len = SEQ_LEN if seq_len is None else seq_len
    rng = np.random.default_rng(1234)
    db_path = workdir / "db.fasta"
    q_path = workdir / "queries.fasta"
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    codes = rng.integers(0, 4, size=(db_size, seq_len), dtype=np.int8)
    chars = alphabet[codes]
    with open(db_path, "wb") as fh:
        ROW = 8192
        for base in range(0, db_size, ROW):
            hi = min(base + ROW, db_size)
            block = b"".join(
                b">db%d\n%s\n" % (i, chars[i].tobytes())
                for i in range(base, hi))
            fh.write(block)
    with open(q_path, "wb") as fh:
        srcs = rng.integers(0, db_size, size=n_queries)
        nmut = int(seq_len * 0.05)
        for i in range(n_queries):
            seq = list(chars[srcs[i]].tobytes().decode())
            pos = rng.integers(0, seq_len, size=nmut)
            r = rng.random(nmut)
            sub = alphabet[rng.integers(0, 4, size=nmut)]
            for j in range(nmut):
                p = int(pos[j]) % len(seq)
                if r[j] < 0.9:
                    seq[p] = chr(sub[j])
                elif r[j] < 0.95 and len(seq) > 10:
                    del seq[p]
                else:
                    seq.insert(p, chr(sub[j]))
            fh.write(b">q%d\n%s\n" % (i, "".join(seq).encode()))
    del codes, chars
    return db_path, q_path


def run_ours(db_path, q_path, out_uc):
    from vsearch_tpu import cli
    argv = ["--usearch_global", str(q_path), "--db", str(db_path),
            "--id", str(IDENTITY), "--uc", str(out_uc),
            "--maxaccepts", "1", "--maxrejects", "32",
            "--threads", "1", "--quiet"]
    t0 = time.perf_counter()
    rc = cli.main(argv)
    elapsed = time.perf_counter() - t0
    assert rc == 0
    return elapsed


def run_reference(db_path, q_path, out_uc, threads=None):
    argv = [str(REF_BINARY), "--usearch_global", str(q_path),
            "--db", str(db_path), "--id", str(IDENTITY),
            "--uc", str(out_uc), "--maxaccepts", "1", "--maxrejects", "32",
            "--quiet"]
    if threads:
        argv += ["--threads", str(threads)]
    t0 = time.perf_counter()
    subprocess.run(argv, check=True, capture_output=True)
    return time.perf_counter() - t0


def main():
    ensure_reference()
    with tempfile.TemporaryDirectory() as tmp:
        workdir = pathlib.Path(tmp)
        db_path, q_path = generate(workdir)

        # warmup to amortize jit compilation out of the measurement: one
        # full 512-query batch plus a partial one covers every kernel
        # geometry bucket (qp ladder + pair buckets) the measured run uses
        warm_q = workdir / "warm.fasta"
        with open(q_path) as src, open(warm_q, "w") as dst:
            for _ in range(2 * 640):
                line = src.readline()
                if not line:
                    break
                dst.write(line)
        run_ours(db_path, warm_q, workdir / "warm.uc")
        if os.environ.get("VSEARCH_TPU_PHASES") == "1":
            # drop warmup compile waits from the phase breakdown
            from vsearch_tpu.utils import phasetimer
            phasetimer.reset()

        # median of N measured runs: the tunneled TPU's transfer latency
        # varies run to run; each sample is a complete N_QUERIES-query run
        ours_samples = [run_ours(db_path, q_path, workdir / "ours.uc")
                        for _ in range(N_RUNS)]
        ours_s = statistics.median(ours_samples)
        ours_qps = N_QUERIES / ours_s

        if os.environ.get("VSEARCH_TPU_PHASES") == "1":
            # per-phase wall clock over the measured runs (note: 'align'
            # and 'prefetch' nest inside 'walk'; 'load' counts the first
            # run's cold db/index build only — the session cache reuses it)
            from vsearch_tpu.utils import phasetimer
            print("bench: " + phasetimer.report().replace("\n", "\nbench: "),
                  file=sys.stderr)

        ref_s = run_reference(db_path, q_path, workdir / "ref.uc")
        ref_qps = N_QUERIES / ref_s
        vs_baseline = ours_qps / ref_qps

        # parity oracle: single-threaded reference (deterministic order)
        ref1 = workdir / "ref1.uc"
        run_reference(db_path, q_path, ref1, threads=1)
        parity = (workdir / "ours.uc").read_bytes() == ref1.read_bytes()
        if not parity:
            print("WARNING: uc outputs differ from reference",
                  file=sys.stderr)

        cores = os.cpu_count() or 1
        print("bench: DB=%d queries=%d seqlen=%d runs=%d parity=%s"
              % (DB_SIZE, N_QUERIES, SEQ_LEN, N_RUNS, parity),
              file=sys.stderr)
        print("bench: ours median %.2fs (samples %s) = %.1f q/s; "
              "reference (%d cores) %.2fs = %.1f q/s; "
              "16-thread-equivalent ratio ~%.2fx"
              % (ours_s, ["%.2f" % s for s in ours_samples], ours_qps,
                 cores, ref_s, ref_qps,
                 ours_qps / (ref_qps * 16 / cores)),
              file=sys.stderr)

        print(json.dumps({
            "metric": "usearch_global_queries_per_s",
            "value": round(ours_qps, 2),
            "unit": "queries/s",
            "vs_baseline": round(vs_baseline, 3),
        }))


if __name__ == "__main__":
    main()
