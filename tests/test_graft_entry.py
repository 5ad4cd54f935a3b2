"""Regression tests for the driver hooks in __graft_entry__.py.

Round 1's driver run of ``dryrun_multichip`` FAILED because the function
assumed the caller had already set up virtual devices: in this environment the
axon TPU plugin registers itself in every interpreter, so the first device
query initialized the remote TPU client (and died on a libtpu version
mismatch). The fix makes the function self-sufficient; this test invokes it in
a pristine subprocess exactly as the driver does.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_subprocess_clean_env():
    # No CPU-forcing env vars: the function itself must avoid touching the
    # real TPU and build the 8-device virtual CPU mesh.
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        # generous: under a loaded host (full suite with -n 6 workers) the
        # subprocess's CPU compile can take several× its solo ~3 min
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout


def test_force_cpu_mesh_inprocess():
    # In the pytest process backends are already CPU with 8 devices
    # (conftest.py); _force_cpu_mesh must be a safe no-op-equivalent.
    import jax

    import __graft_entry__ as g

    g._force_cpu_mesh(8)
    assert jax.default_backend() == "cpu"
    assert jax.device_count() >= 8
