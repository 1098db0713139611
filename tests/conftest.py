import os

# Prefer a virtual 8-device CPU mesh so multi-chip sharding paths can be
# exercised without TPU hardware.  NOTE: when the axon TPU sitecustomize is
# on PYTHONPATH (/root/.axon_site) it forces jax_platforms="axon,cpu" and
# these settings are ignored — tests then run on the single TPU chip, and
# the multichip test re-launches itself in a scrubbed subprocess.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import shutil
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REF_BINARY = REPO / ".refbuild" / "bin" / "vsearch"
REF_DATA = pathlib.Path("/root/reference/api_examples/data")

sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def ref_binary():
    if not REF_BINARY.exists():
        pytest.skip("reference binary not built (.refbuild/bin/vsearch)")
    return str(REF_BINARY)


@pytest.fixture(scope="session")
def ref_data():
    if not REF_DATA.exists():
        pytest.skip("reference fixture data not available")
    return REF_DATA


# commands whose reference option matrix excludes --threads (cli.cc
# per-command allowed-option lists)
_NO_THREADS = {"--cut", "--fastx_getseq", "--fastx_getseqs",
               "--fastx_getsubseq", "--sff_convert", "--udb2fasta",
               "--udbinfo", "--udbstats", "--makeudb_usearch",
               "--fastq_eestats", "--fastq_eestats2"}


def _common(args):
    extra = ["--quiet"]
    if args[0] not in _NO_THREADS:
        extra = ["--threads", "1", "--quiet"]
    return args + extra


def run_reference(ref_binary, args, cwd):
    subprocess.run([ref_binary] + _common(args),
                   cwd=cwd, check=True, capture_output=True)


def run_ours(args, cwd):
    from vsearch_tpu import cli
    old = os.getcwd()
    os.chdir(cwd)
    try:
        rc = cli.main(_common(args))
        assert rc == 0
    finally:
        os.chdir(old)
