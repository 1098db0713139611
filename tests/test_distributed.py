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
