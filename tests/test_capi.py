"""C-ABI embedding shim (native/vsearch_tpu_capi.c + vsearch_tpu_api.h).

Builds the shared library + demo embedder and checks the demo's TSV
against the same queries driven through the Python session API — the
shim is a marshaling layer, so the rows must agree exactly.

reference: src/vsearch_api.h:60-124 (the session protocol the shim
renders in C), api_examples/example_search.cc (the demo's shape).
"""

import os
import pathlib
import subprocess

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
DATA = pathlib.Path("/root/reference/api_examples/data")


@pytest.fixture(scope="module")
def demo():
    r = subprocess.run(["sh", str(REPO / "tools" / "build_capi.sh")],
                       capture_output=True)
    if r.returncode != 0:
        pytest.skip("capi build failed: %s" % r.stderr.decode()[-500:])
    return REPO / "native" / "capi_demo"


def test_capi_demo_matches_python_api(demo):
    if not DATA.exists():
        pytest.skip("reference fixture data not available")
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [str(demo), str(DATA / "chimera_ref.fasta"),
         str(DATA / "chimera_queries.fasta"), "0.5"],
        capture_output=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-1500:]
    c_rows = [ln for ln in r.stdout.decode().splitlines() if ln]

    # same computation through the Python session API
    from vsearch_tpu import api
    from vsearch_tpu.params import Parameters
    from vsearch_tpu.io import fastx as fastx_io
    params = Parameters()
    params.opt_id = 0.5
    params.opt_minseqlength = 1
    api.session_begin(params)
    try:
        db, index = api.read_database(str(DATA / "chimera_ref.fasta"),
                                      params)
        ss = api.SearchSession(params, db, index)
        py_rows = []
        for rec in fastx_io.read_fastx(str(DATA / "chimera_queries.fasta"),
                                       params):
            for h in ss.search(rec.header, rec.sequence):
                py_rows.append("%s\t%s\t%.1f\t%d\t%d\t%d" % (
                    rec.header.decode(), db.getheader(h.target).decode(),
                    h.id, h.matches, h.mismatches, h.gaps))
    finally:
        api.session_end()
    assert c_rows == py_rows
    assert len(c_rows) > 0
