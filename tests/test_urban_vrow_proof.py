"""Regression pin for the urban V-row irreducibility proof.

The single standing CI-replay deviation (test-urban-phased-network: one
zenith row at 0.0011" vs the 0.001" dnadiff bar) is accepted on the
strength of scripts/prove_urban_vrow.py: the production phased sweeps
agree with the reference's exact LAPACK sequence (native/ref_baseline,
OpenBLAS) to ~1.8e-10 m on the same iteration-1 block normals — i.e.
our arithmetic IS the reference algorithm, and the residual golden-file
difference comes from the upstream CI environment.  VERDICT r3 #9: any
solver change that silently grows that agreement past 1e-8 must fail CI
— this test pins it.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLE = "/root/reference/sampleData"
REF_BASELINE = os.path.join(ROOT, "native", "ref_baseline")

sys.path.insert(0, os.path.join(ROOT, "scripts"))


needs_fixtures = pytest.mark.skipif(
    not (os.path.exists(REF_BASELINE)
         and os.path.exists(f"{SAMPLE}/urban-network.stn")),
    reason="native/ref_baseline or reference sampleData not available")


@needs_fixtures
def test_urban_phased_sweeps_match_reference_lapack_sequence(tmp_path):
    from prove_urban_vrow import load_urban, read_dx_dump
    from export_phased_blocks import build_blocks, write_dump
    from dynadjust_tpu.adjust import AdjustmentOptions
    from dynadjust_tpu.adjust.phased import adjust_phased
    from dynadjust_tpu.segment import segment_network

    opts = AdjustmentOptions()
    net = load_urban()
    seg = segment_network(net, min_inner_stns=150, max_block_stns=150)

    blk_file = str(tmp_path / "urban_proof.blk")
    dx_file = str(tmp_path / "urban_proof.dx")
    write_dump(blk_file, build_blocks(net, seg, opts))
    r = subprocess.run([REF_BASELINE, blk_file, "1", "2",
                        "--dump-dx", dx_file],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    cdx = read_dx_dump(dx_file)

    net2 = load_urban()
    trace = {}
    adjust_phased(net2, opts, seg=seg, _trace=trace)

    B = seg.block_count
    worst = 0.0
    for b in range(B):
        dxf, dxr, dxc = cdx[b]
        worst = max(worst, float(np.abs(trace["fwd"][b] - dxf).max()),
                    float(np.abs(trace["rev"][b] - dxr).max()))
        if 0 < b < B - 1:
            worst = max(worst,
                        float(np.abs(trace["comb"][b] - dxc).max()))
    # measured agreement is ~1.8e-10 m (PARITY.md); 1e-8 leaves two
    # orders of headroom while still catching any real solver drift
    assert worst < 1e-8, (
        f"phased sweeps drifted to {worst:.3e} m from the reference "
        f"LAPACK sequence — the urban V-row irreducibility proof "
        f"(PARITY.md, scripts/prove_urban_vrow.py) no longer holds")
