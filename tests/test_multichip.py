"""Multi-chip sharding dry run on a virtual 8-device CPU mesh.

Runs in a subprocess with the axon sitecustomize scrubbed from PYTHONPATH so
JAX_PLATFORMS=cpu + xla_force_host_platform_device_count actually take
effect (see conftest note).
"""

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_dryrun_multichip_subprocess():
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    result = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "OK" in result.stdout
