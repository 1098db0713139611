"""Multi-host layer: N-process jax.distributed CPU run == 1-process run.

Launches two OS processes on localhost (coordinator on a free port), each
with 2 virtual CPU devices, forming a 4-device GLOBAL mesh with Gloo
collectives; both run the identical usearch_global program (replicated
host driver, sharded device state) and process 0's outputs must
byte-match a plain single-process run (parallel/distributed.py)."""

import os
import pathlib
import random
import socket
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(extra):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)       # scrub the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("VSEARCH_TPU_DEVICES", None)
    env.update(extra)
    return env


def _workload(d):
    rng = random.Random(77)
    seqs = []
    with open(d / "db.fa", "w") as fh:
        for i in range(700):
            s = "".join(rng.choice("ACGT") for _ in range(180))
            seqs.append(s)
            fh.write(">d%d\n%s\n" % (i, s))
    with open(d / "q.fa", "w") as fh:
        for i in range(96):
            s = list(seqs[rng.randrange(len(seqs))])
            for _ in range(12):
                s[rng.randrange(len(s))] = rng.choice("ACGT")
            fh.write(">q%d\n%s\n" % (i, "".join(s)))


def test_two_process_usearch_global_matches_single(tmp_path):
    _workload(tmp_path)
    port = _free_port()
    base = ["--usearch_global", str(tmp_path / "q.fa"),
            "--db", str(tmp_path / "db.fa"), "--id", "0.8",
            "--minseqlength", "1", "--threads", "1", "--quiet"]

    def launch(procid, uc):
        extra = {
            "VSEARCH_TPU_DIST_COORD": "127.0.0.1:%d" % port,
            "VSEARCH_TPU_DIST_NPROCS": "2",
            "VSEARCH_TPU_DIST_PROCID": str(procid),
        }
        return subprocess.Popen(
            [sys.executable, "-m", "vsearch_tpu.cli"] + base
            + ["--uc", str(uc)],
            cwd=str(REPO), env=_env(extra),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)

    p1 = launch(1, tmp_path / "ignored.uc")
    p0 = launch(0, tmp_path / "dist.uc")
    out0, err0 = p0.communicate(timeout=600)
    out1, err1 = p1.communicate(timeout=600)
    assert p0.returncode == 0, err0.decode()[-3000:]
    assert p1.returncode == 0, err1.decode()[-3000:]

    r = subprocess.run(
        [sys.executable, "-m", "vsearch_tpu.cli"] + base
        + ["--uc", str(tmp_path / "single.uc")],
        cwd=str(REPO), env=_env({}), capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-3000:]

    assert (tmp_path / "dist.uc").read_bytes() == \
        (tmp_path / "single.uc").read_bytes()


def _family_workload(d):
    rng = random.Random(13)
    with open(d / "fam.fa", "w") as fh:
        i = 0
        for f in range(60):
            base = [rng.choice("ACGT") for _ in range(160)]
            for m in range(4):
                s = list(base)
                for _ in range(rng.randrange(0, 7) if m else 0):
                    s[rng.randrange(len(s))] = rng.choice("ACGT")
                fh.write(">s%d;size=%d\n%s\n"
                         % (i, rng.randrange(1, 40), "".join(s)))
                i += 1


def _run_two_process(tmp_path, base, outputs, extra_env=None):
    """Launch 2 localhost processes (4-device Gloo mesh), then a plain
    single-process run; assert process 0's outputs byte-match."""
    port = _free_port()

    def launch(procid, outdir):
        extra = {
            "VSEARCH_TPU_DIST_COORD": "127.0.0.1:%d" % port,
            "VSEARCH_TPU_DIST_NPROCS": "2",
            "VSEARCH_TPU_DIST_PROCID": str(procid),
        }
        extra.update(extra_env or {})
        args = [x.replace("{o}", str(outdir)) for x in base]
        return subprocess.Popen(
            [sys.executable, "-m", "vsearch_tpu.cli"] + args,
            cwd=str(REPO), env=_env(extra),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)

    d_dist = tmp_path / "dist"
    d_ignored = tmp_path / "ignored"
    d_single = tmp_path / "single"
    for d in (d_dist, d_ignored, d_single):
        d.mkdir()
    p1 = launch(1, d_ignored)
    p0 = launch(0, d_dist)
    out0, err0 = p0.communicate(timeout=900)
    out1, err1 = p1.communicate(timeout=900)
    assert p0.returncode == 0, err0.decode()[-3000:]
    assert p1.returncode == 0, err1.decode()[-3000:]

    args = [x.replace("{o}", str(d_single)) for x in base]
    r = subprocess.run(
        [sys.executable, "-m", "vsearch_tpu.cli"] + args,
        cwd=str(REPO), env=_env(dict(extra_env or {})),
        capture_output=True, timeout=900)
    assert r.returncode == 0, r.stderr.decode()[-3000:]

    for name in outputs:
        assert (d_dist / name).read_bytes() == \
            (d_single / name).read_bytes(), name


def test_two_process_cluster_size_matches_single(tmp_path):
    """Greedy clustering under jax.distributed: replicated host drivers +
    the growing centroid index sharded over the global 4-device mesh
    (sharded scatter appends + collective top-k merge) — process 0's
    centroids/uc byte-match the single-process run."""
    _family_workload(tmp_path)
    _run_two_process(
        tmp_path,
        ["--cluster_size", str(tmp_path / "fam.fa"), "--id", "0.95",
         "--sizein", "--sizeout", "--minseqlength", "1", "--threads", "1",
         "--quiet", "--centroids", "{o}/c.fa", "--uc", "{o}/c.uc"],
        ["c.fa", "c.uc"],
        extra_env={"VSEARCH_TPU_CLUSTER_DEVICE_MIN": "1"})


def test_two_process_uchime3_matches_single(tmp_path):
    """uchime3_denovo under jax.distributed with the growing reference
    set sharded over the global mesh."""
    _family_workload(tmp_path)
    _run_two_process(
        tmp_path,
        ["--uchime3_denovo", str(tmp_path / "fam.fa"),
         "--minseqlength", "1", "--threads", "1", "--quiet",
         "--chimeras", "{o}/u.chim", "--nonchimeras", "{o}/u.non"],
        ["u.chim", "u.non"],
        extra_env={"VSEARCH_TPU_CHIMERA_DEVICE_MIN": "1"})
