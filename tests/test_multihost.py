"""Multi-process (multi-host) distributed solve validation.

Spawns 2 real processes x 4 virtual CPU devices each through
scripts/multihost_dryrun.py: ``jax.distributed`` init (gloo CPU
collectives), process-local block ingest, the sharded Schur solve over
both the flat global mesh and the hierarchical (hosts, local) mesh, and
bitwise-level agreement with the single-process solve.

TPU-native counterpart of the reference's single-host staging scaling
story (dnaadjust-stage.cpp:59, dnafile_mapping.hpp:48) — see
parallel/multihost.py.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_dryrun(tmp_path):
    out = tmp_path / "MULTIHOST.json"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts/multihost_dryrun.py"),
         "--nproc", "2", "--local-devices", "4", "--rows", "18",
         "--cols", "18", "--block", "6", "--out", str(out),
         "--timeout", "420"],
        env=env, capture_output=True, text=True, timeout=480)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(out.read_text())
    assert res["ok"] is True
    assert res["results"]["flat"]["max_dxi"] < 1e-10
    assert res["results"]["hierarchical"]["max_dxj"] < 1e-10
    assert res["results"]["hierarchical"]["mesh_shape"] == {
        "hosts": 2, "blocks": 4}
    # the PRODUCTION path (Assembler -> constraint elimination -> device
    # assembly -> sharded factors -> statistics) end-to-end across the
    # 2 processes, vs the same adjustment single-device
    e2e = res["results"]["end_to_end_adjustment"]
    assert e2e["max_dxyz_m"] < 1e-8
    assert e2e["d_sigma0"] < 1e-9
    assert e2e["max_dcov"] < 1e-12
