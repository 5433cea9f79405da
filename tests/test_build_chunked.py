"""Block-chunked fused device assembly must be bit-identical to the
monolithic fused build — the chunking is what keeps the 100k-station
resident configuration inside the single chip's HBM (VERDICT r3 #1)."""

import os

import numpy as np
import pytest


@pytest.fixture
def assembly():
    from dynadjust_tpu.utils.synthetic_mixed import synthetic_mixed_network
    from dynadjust_tpu.adjust import AdjustmentOptions
    from dynadjust_tpu.adjust.phased import Block, _first_appearances
    from dynadjust_tpu.adjust.constraint_elim import ConstraintBasis
    from dynadjust_tpu.adjust.tpu_blocked import _build_partition
    from dynadjust_tpu.adjust.device_assembly import DeviceAssembly
    from dynadjust_tpu.geodesy.conversions import geo_to_cart

    net, seg = synthetic_mixed_network(20, 20, block_rows=8, block_cols=8)
    opts = AdjustmentOptions()
    blocks = [Block(net, opts, seg, b) for b in range(seg.block_count)]
    first_fwd = _first_appearances(blocks, "fwd")
    _, part = _build_partition(net.nstations, blocks)
    basis = ConstraintBasis(net, opts)
    x, y, z = geo_to_cart(net.lat, net.lon, net.height,
                          net.datum.ellipsoid)
    est = np.stack([x, y, z], -1)
    for blk in blocks:
        blk.est = est[blk.stations].reshape(-1).copy()
        blk.asm.fill(blk.est, apply_reductions=True)
        blk.Wc = blk.asm.constraint_weights()
    return DeviceAssembly(blocks, part, basis, first_fwd)


@pytest.mark.parametrize("C", [1, 3, 4])
def test_chunked_build_matches_monolithic(assembly, C, monkeypatch):
    da = assembly
    ref = [np.asarray(a) for a in da.build_device()]
    out_bytes = da.Bp * (da.ni ** 2 + da.ni * da.nj + da.nj ** 2) * 4
    monkeypatch.setenv("DTA_BUILD_HBM_BUDGET",
                       str(3.0 * da.M * da.Pp * 4 * C + 2 * out_bytes))
    da._chunk_cache = None
    got = [np.asarray(a) for a in da.build_device()]
    assert da._chunk_cache["C"] == C
    for a, b in zip(got, ref):
        assert np.array_equal(a, b)
