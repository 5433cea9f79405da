"""Device-side normals formation (adjust/device_assembly.py) parity.

The pooled MXU product N = AᵀV⁻¹A + constraints must reproduce the host
path (phased._block_normals + constraint transforms + build_block_system)
exactly in f64 and to f32 rounding in f32, and the whole adjustment must
land on the same solution either way.

Reference for the operation being replaced:
UpdateNormals_*/UpdateAtVinv, dnaadjust.cpp:1285-1833.
"""

import numpy as np
import pytest

from dynadjust_tpu.adjust import AdjustmentOptions
from dynadjust_tpu.adjust.constraint_elim import ConstraintBasis
from dynadjust_tpu.adjust.device_assembly import DeviceAssembly
from dynadjust_tpu.adjust.phased import (Block, _add_constraints,
                                         _block_normals,
                                         _first_appearances)
from dynadjust_tpu.adjust.tpu_blocked import (_build_partition,
                                              adjust_tpu_blocked)
from dynadjust_tpu.geodesy.conversions import geo_to_cart
from dynadjust_tpu.parallel.schur import _block_matvec, build_block_system
from dynadjust_tpu.utils.synthetic_mixed import synthetic_mixed_network


@pytest.fixture(scope="module")
def setup():
    net, seg = synthetic_mixed_network(12, 12, block_rows=6, block_cols=6)
    opts = AdjustmentOptions()
    blocks = [Block(net, opts, seg, b) for b in range(seg.block_count)]
    first_fwd = _first_appearances(blocks, "fwd")
    basis = ConstraintBasis(net, opts)
    x, y, z = geo_to_cart(net.lat, net.lon, net.height,
                          net.datum.ellipsoid)
    est = np.stack([x, y, z], -1)
    for blk in blocks:
        blk.est = est[blk.stations].reshape(-1).copy()
        blk.asm.fill(blk.est, apply_reductions=True)
        blk.Wc = blk.asm.constraint_weights()
    _, part = _build_partition(net.nstations, blocks)

    bN, brhs = [], []
    for b, blk in enumerate(blocks):
        N, AtVinv = _block_normals(blk)
        rhs = AtVinv @ blk.asm.mmc
        _add_constraints(N, blk, first_fwd[b], skip=basis.proj)
        basis.transform_block(blk.stations, blk.asm.local, N, rhs,
                              first_fwd[b])
        bN.append(N)
        brhs.append(rhs)
    bs = build_block_system(bN, brhs, [p[0] for p in part],
                            [p[1] for p in part], [p[2] for p in part])
    da = DeviceAssembly(blocks, part, basis, first_fwd)
    return net, seg, bs, da


def test_topology_matches(setup):
    _, _, bs, da = setup
    assert da.nj_global == bs.nj_global
    assert np.array_equal(da.jmap_np, bs.jmap)
    assert np.array_equal(da.jmask_np, bs.jmask)
    assert np.array_equal(da.imask_np, bs.imask)


def test_f64_pools_bit_match_host(setup):
    _, _, bs, da = setup
    Nii, Nij, Njj = da.build_f64()
    sc = np.abs(bs.Nii).max()
    assert np.abs(np.asarray(Nii) - bs.Nii).max() / sc < 1e-13
    assert np.abs(np.asarray(Nij) - bs.Nij).max() / sc < 1e-13
    assert np.abs(np.asarray(Njj) - bs.Njj).max() / sc < 1e-13


def test_f32_pools_match_to_f32_rounding(setup):
    _, _, bs, da = setup
    Nii, Nij, Njj = da.build_device()
    sc = np.abs(bs.Nii).max()
    assert np.abs(np.asarray(Nii, dtype=np.float64)
                  - bs.Nii).max() / sc < 1e-5
    assert str(np.asarray(Nii).dtype) == "float32"


def test_rhs_pools_match(setup):
    _, _, bs, da = setup
    bi, bj = da.rhs_pools()
    sc = max(np.abs(bs.bi).max(), 1.0)
    assert np.abs(bi - bs.bi).max() / sc < 1e-12
    assert np.abs(bj - bs.bj).max() / sc < 1e-12


def test_matvec_matches_block_matvec(setup):
    """The A-based f64 refinement operator equals N·x through the host
    normals (it IS the true system the refined solve converges to)."""
    _, _, bs, da = setup
    rng = np.random.default_rng(3)
    xi = rng.standard_normal(bs.bi.shape)
    xj = rng.standard_normal(bs.nj_global)
    yi0, yj0 = _block_matvec(bs, xi, xj)
    yi1, yj1 = da.matvec(xi, xj)
    sc = max(np.abs(yi0).max(), 1.0)
    assert np.abs(yi0 - yi1).max() / sc < 1e-13
    assert np.abs(yj0 - yj1).max() / sc < 1e-13


@pytest.mark.parametrize("super_blocks", [0, 2])
def test_end_to_end_device_vs_host(monkeypatch, super_blocks):
    """Full adjustment: device-assembled vs host-assembled paths converge
    to the same coordinates and covariances."""
    def run(host):
        monkeypatch.setenv("DTA_HOST_ASSEMBLY", "1" if host else "")
        net, seg = synthetic_mixed_network(12, 12, block_rows=6,
                                           block_cols=6)
        return adjust_tpu_blocked(net, AdjustmentOptions(), seg=seg,
                                  super_blocks=super_blocks)

    r_host = run(True)
    r_dev = run(False)
    assert r_dev.status == "Converged"
    assert r_dev.iterations == r_host.iterations
    assert np.abs(r_host.xyz - r_dev.xyz).max() < 1e-7
    assert abs(r_host.sigma_zero - r_dev.sigma_zero) < 1e-9
    sc = np.abs(r_host.cov_stn).max()
    assert np.abs(r_host.cov_stn - r_dev.cov_stn).max() / sc < 1e-9


def test_block_super_validation():
    """ADVICE r2: explicit block_super must be length-checked, and
    passing it without the nested path must fail loudly."""
    net, seg = synthetic_mixed_network(8, 8, block_rows=4, block_cols=4)
    with pytest.raises(ValueError):
        adjust_tpu_blocked(net, AdjustmentOptions(), seg=seg,
                           super_blocks=0,
                           block_super=np.zeros(seg.block_count))
    with pytest.raises(ValueError):
        adjust_tpu_blocked(net, AdjustmentOptions(), seg=seg,
                           super_blocks=2,
                           block_super=np.zeros(seg.block_count - 1,
                                                dtype=np.int64))


@pytest.mark.parametrize("super_blocks", [0, 2])
def test_device_stats_match_host(monkeypatch, super_blocks):
    """The device statistics path (adj_prec / GNSS VCVs / station covs
    via sliced near-f64 MXU products) must reproduce the host per-block
    covariance statistics.  Forced on a small network by shrinking the
    dense-covariance threshold."""
    def run(dev_stats):
        monkeypatch.setenv("DTA_HOST_ASSEMBLY", "")
        if dev_stats:
            monkeypatch.setenv("DTA_DENSE_COV_MAX_STN", "1")
            monkeypatch.setenv("DTA_DEVICE_STATS", "1")
        else:
            monkeypatch.delenv("DTA_DENSE_COV_MAX_STN", raising=False)
            monkeypatch.setenv("DTA_DEVICE_STATS", "0")
        net, seg = synthetic_mixed_network(12, 12, block_rows=6,
                                           block_cols=6)
        return adjust_tpu_blocked(net, AdjustmentOptions(), seg=seg,
                                  super_blocks=super_blocks)

    r_host = run(False)
    r_dev = run(True)
    assert abs(r_host.sigma_zero - r_dev.sigma_zero) < 1e-12
    sc = np.abs(r_host.cov_stn).max()
    assert np.abs(r_host.cov_stn - r_dev.cov_stn).max() / sc < 1e-9
    for a, b in zip(r_dev.msr_stats, r_host.msr_stats):
        assert abs(a.adj_prec - b.adj_prec) <= \
            1e-9 * abs(b.adj_prec) + 1e-18
        if a.adj_vcv3 is not None:
            assert np.abs(a.adj_vcv3 - b.adj_vcv3).max() <= \
                1e-9 * np.abs(b.adj_vcv3).max() + 1e-18


def test_device_stats_sliced_tier(monkeypatch):
    """The TPU route of the statistics pass — sliced bf16-MXU products
    at the reduced reporting tier (DTA_STATS_TIER, default 5,4) — forced
    on CPU via DTA_SLICED_F64=1, against the host per-block covariance
    statistics at reporting-grade tolerance (~2^-30 relative)."""
    def run(sliced):
        monkeypatch.setenv("DTA_HOST_ASSEMBLY", "")
        monkeypatch.setenv("DTA_SLICED_F64", "1" if sliced else "0")
        if sliced:
            monkeypatch.setenv("DTA_DENSE_COV_MAX_STN", "1")
            monkeypatch.setenv("DTA_DEVICE_STATS", "1")
        else:
            monkeypatch.delenv("DTA_DENSE_COV_MAX_STN", raising=False)
            monkeypatch.setenv("DTA_DEVICE_STATS", "0")
        net, seg = synthetic_mixed_network(12, 12, block_rows=6,
                                           block_cols=6)
        try:
            return adjust_tpu_blocked(net, AdjustmentOptions(), seg=seg,
                                      super_blocks=2)
        finally:
            monkeypatch.setenv("DTA_SLICED_F64", "0")

    r_host = run(False)
    r_dev = run(True)
    assert abs(r_host.sigma_zero - r_dev.sigma_zero) < 1e-6
    sc = np.abs(r_host.cov_stn).max()
    assert np.abs(r_host.cov_stn - r_dev.cov_stn).max() / sc < 1e-6
    for a, b in zip(r_dev.msr_stats, r_host.msr_stats):
        assert abs(a.adj_prec - b.adj_prec) <= \
            1e-6 * abs(b.adj_prec) + 1e-12
        if a.adj_vcv3 is not None:
            assert np.abs(a.adj_vcv3 - b.adj_vcv3).max() <= \
                1e-6 * np.abs(b.adj_vcv3).max() + 1e-12


def test_block_scoped_covariance_output(monkeypatch, tmp_path):
    """Past the dense cap, --output-all-covariances (.apu) and the SINEX
    VCV must emit within-block inter-station covariances from the
    per-block factors, matching the dense covariance on the same pairs
    (the reference's phased-mode block-scoped semantics,
    dnaadjust_printer.cpp:4330-4390)."""
    def run(dense):
        if dense:
            monkeypatch.delenv("DTA_DENSE_COV_MAX_STN", raising=False)
        else:
            monkeypatch.setenv("DTA_DENSE_COV_MAX_STN", "1")
        net, seg = synthetic_mixed_network(10, 10, block_rows=5,
                                           block_cols=5)
        res = adjust_tpu_blocked(net, AdjustmentOptions(), seg=seg)
        return net, res

    net_d, res_d = run(True)
    net_b, res_b = run(False)
    assert res_b.cov_xyz is None and res_b.block_cov is not None

    # the rigorous full covariance from the simultaneous adjustment is
    # the ground truth for every pair
    from dynadjust_tpu.adjust.simultaneous import adjust_simultaneous
    net_s, seg_s = synthetic_mixed_network(10, 10, block_rows=5,
                                           block_cols=5)
    res_s = adjust_simultaneous(net_s, AdjustmentOptions())
    sc = np.abs(res_s.cov_xyz).max()

    bc = res_b.block_cov
    checked = 0
    for i in (0, 7, 33, 60):
        for j in bc.partners(i):
            j = int(j)
            if j <= i:
                continue
            C = bc.pair_cov(i, j)
            Cs = res_s.cov_xyz[3 * i:3 * i + 3, 3 * j:3 * j + 3]
            assert np.abs(C - Cs).max() <= 1e-6 * sc
            # the dense blocked path must carry the same within-block
            # off-diagonals
            Cd = res_d.cov_xyz[3 * i:3 * i + 3, 3 * j:3 * j + 3]
            assert np.abs(Cd - Cs).max() <= 1e-6 * sc
            checked += 1
    assert checked > 10

    # writers run in O(S*k) without the dense matrix
    from dynadjust_tpu.output.uncertainty import write_apu
    from dynadjust_tpu.io_formats.sinex import write_sinex
    apu = tmp_path / "blocked.apu"
    write_apu(str(apu), net_b, res_b, all_covariances=True)
    text = apu.read_text()
    assert text.count("e") > 100            # covariance rows present
    snx = tmp_path / "blocked.snx"
    write_sinex(str(snx), net_b, res_b)
    stext = snx.read_text()
    # off-diagonal (cross-station) rows exist in the matrix block
    assert "+SOLUTION/MATRIX_ESTIMATE L COVA" in stext


def test_solve_and_refinement_evidence_recorded():
    """The fused one-dispatch solve and the residual-driven covariance
    refinement must RECORD their measured residuals (the round-4
    regression was possible precisely because accuracy was assumed, not
    measured): per-iteration solve_rel/solve_rounds in the iteration
    log, and refine_evidence on the result."""
    from dynadjust_tpu.utils.synthetic_mixed import synthetic_mixed_network
    from dynadjust_tpu.adjust import AdjustmentOptions
    from dynadjust_tpu.adjust.tpu_blocked import adjust_tpu_blocked

    net, seg = synthetic_mixed_network(12, 12, block_rows=6, block_cols=6)
    res = adjust_tpu_blocked(net, AdjustmentOptions(), seg=seg,
                             super_blocks=2)
    assert res.status == "Converged"
    for it in res.iteration_log:
        assert it["solve_rel"] < 1e-9          # rtol 1e-10 + stall slack
        assert 0 <= it["solve_rounds"] <= 12
    ev = res.refine_evidence
    assert ev is not None
    assert ev["l1_err"] < 1e-8 and ev["l1_rounds"] >= 1
    assert ev["l3_err"] < 1e-8
