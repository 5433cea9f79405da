"""Bit-parity of the vectorised columnar fill (adjust/vector_fill.py)
against the per-item scalar fills on real all-type networks, across
re-linearisation iterations."""

import numpy as np
import pytest

from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr, NTv2Grid
from dynadjust_tpu.network import build_network
from dynadjust_tpu.geoid import apply_geoid
from dynadjust_tpu.adjust import AdjustmentOptions
from dynadjust_tpu.adjust.assembler import Assembler
from dynadjust_tpu.geodesy.conversions import geo_to_cart


def _build(sample_dir, name, convert):
    stns, frame, epoch = read_dna_stn(f"{sample_dir}/{name}-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/{name}-network.msr")
    stns.sort(key=lambda s: s.name)
    net = build_network(stns, recs, frame, epoch)
    grid = NTv2Grid.read(f"{sample_dir}/{name}-network-geoid.gsb")
    apply_geoid(net, grid, convert_heights=convert)
    return net


def _scalar_fill(asm, est, apply_reductions):
    """The original per-item path, reproduced for comparison."""
    rebuild = asm.has_non_gps or not asm._built
    apply_reductions = apply_reductions or (asm.has_non_gps and asm._built)
    if rebuild:
        asm.A[:] = 0.0
    if asm.has_non_gps and asm._built:
        from dynadjust_tpu.geodesy.conversions import cart_to_geo
        idx = np.asarray(asm.stations, dtype=np.int64)
        l = 3 * np.arange(len(idx))
        la, lo, h = cart_to_geo(est[l], est[l + 1], est[l + 2], asm.ell)
        asm.cur_lat[idx] = la
        asm.cur_lon[idx] = lo
        asm.cur_h[idx] = h
    for it in asm.scalar_items:
        asm._fill_scalar(it, est, apply_reductions)
    for ds in asm.dirn_sets:
        for it in ds.angles:
            asm._fill_scalar(it, est, apply_reductions)
    if rebuild:
        for g in asm.gps_items:
            asm._fill_gps_design(g)
    asm._fill_gps_mmc_all(est)
    asm._built = True


@pytest.mark.parametrize("name,convert", [("urban", True), ("gnss", True)])
def test_vector_fill_bit_parity(sample_dir, name, convert):
    net_v = _build(sample_dir, name, convert)
    net_s = _build(sample_dir, name, convert)
    opts = AdjustmentOptions()
    av = Assembler(net_v, opts)
    as_ = Assembler(net_s, opts)

    x, y, z = geo_to_cart(net_v.lat, net_v.lon, net_v.height,
                          net_v.datum.ellipsoid)
    est = np.stack([x, y, z], -1).reshape(-1)

    rng = np.random.default_rng(7)
    for i in range(3):
        av.fill(est, apply_reductions=(i == 0))
        _scalar_fill(as_, est, apply_reductions=(i == 0))
        # parity is ulp-level, not bit-exact: numpy's SIMD transcendental
        # kernels (array sin/cos) round differently from the scalar libm
        # calls in the per-item path by <= 1 ulp
        assert np.allclose(av.A, as_.A, rtol=1e-13, atol=1e-16), \
            f"A differs at iter {i}: {np.abs(av.A - as_.A).max()}"
        assert np.allclose(av.mmc, as_.mmc, rtol=1e-13, atol=1e-13), \
            f"mmc differs at iter {i}"
        if av._vector_plan is not None:
            av._vector_plan.sync_items()
        for iv, isc in zip(av.item_order, as_.item_order):
            if hasattr(iv, "term1"):
                assert np.isclose(iv.term1, isc.term1, rtol=1e-13)
                assert np.isclose(iv.pre_adj_corr, isc.pre_adj_corr,
                                  rtol=1e-12, atol=1e-15)
        est = est + rng.normal(scale=0.05, size=est.shape)
