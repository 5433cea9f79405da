"""End-to-end parity test: import → geoid → reftran → simultaneous adjust
on the reference's GNSS sample network, validated against the golden output
gnss.simult.adj.expected (the reference's own regression fixture)."""

import re

import numpy as np
import pytest

from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr, NTv2Grid
from dynadjust_tpu.network import build_network
from dynadjust_tpu.geoid import apply_geoid
from dynadjust_tpu.reftran import transform_network
from dynadjust_tpu.adjust import adjust_simultaneous, AdjustmentOptions


@pytest.fixture(scope="module")
def gnss_result(sample_dir):
    stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    stns.sort(key=lambda s: s.name)
    net = build_network(stns, recs, frame, epoch)
    grid = NTv2Grid.read(f"{sample_dir}/gnss-network-geoid.gsb")
    apply_geoid(net, grid, convert_heights=True)
    transform_network(net)
    res = adjust_simultaneous(net,
                              AdjustmentOptions(scale_normals_to_unity=True))
    return net, res


def _parse_expected_coords(path):
    """Parse the Adjusted Coordinates table from the golden .adj file."""
    out = {}
    with open(path) as f:
        lines = f.read().splitlines()
    in_table = False
    for line in lines:
        if line.startswith("Adjusted Coordinates"):
            in_table = True
            continue
        if not in_table:
            continue
        m = re.match(
            r"^(\S+)\s+[A-Z]{3}\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+"
            r"(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+"
            r"(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)", line)
        if m:
            name = m.group(1)
            out[name] = {
                "lat_dms": float(m.group(2)), "lon_dms": float(m.group(3)),
                "H": float(m.group(4)), "h": float(m.group(5)),
                "X": float(m.group(6)), "Y": float(m.group(7)),
                "Z": float(m.group(8)), "sde": float(m.group(9)),
                "sdn": float(m.group(10)), "sdup": float(m.group(11)),
            }
    return out


def test_tpu_dense_solver_matches_host(gnss_result, sample_dir):
    """--tpu (blocked f32 MXU factor + on-device Newton-refined f64
    inverse) reproduces the host-LAPACK adjustment to f64 precision —
    the TPU-solved .adj stays byte-identical to the golden file."""
    net_host, res_host = gnss_result
    stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    stns.sort(key=lambda s: s.name)
    net = build_network(stns, recs, frame, epoch)
    grid = NTv2Grid.read(f"{sample_dir}/gnss-network-geoid.gsb")
    apply_geoid(net, grid, convert_heights=True)
    transform_network(net)
    res = adjust_simultaneous(net, AdjustmentOptions(
        scale_normals_to_unity=True, use_tpu=True))
    assert res.iterations == res_host.iterations
    assert np.abs(res.xyz - res_host.xyz).max() < 1e-9
    assert abs(res.sigma_zero - res_host.sigma_zero) < 1e-9
    assert (np.abs(np.diag(res.cov_xyz) - np.diag(res_host.cov_xyz)).max()
            < 1e-12)


def test_adj_report_byte_parity(gnss_result, sample_dir, tmp_path):
    """The .adj report is byte-identical to the reference's golden file
    below the volatile header (the reference's own regression bar,
    run-gnss-network.sh: diff below line 53)."""
    from dynadjust_tpu.output.adj_writer import write_adj
    net, res = gnss_result
    out = tmp_path / "gnss.simult.adj"
    write_adj(str(out), net, res,
              AdjustmentOptions(scale_normals_to_unity=True),
              print_adj_msr=True)
    ours = out.read_text().splitlines()
    exp = open(f"{sample_dir}/gnss.simult.adj.expected").read().splitlines()
    ia = next(i for i, l in enumerate(ours)
              if "Number of unknown parameters" in l)
    ib = next(i for i, l in enumerate(exp)
              if "Number of unknown parameters" in l)
    assert ours[ia:] == exp[ib:]


def test_convergence_and_statistics(gnss_result):
    net, res = gnss_result
    # Golden: gnss.simult.adj.expected lines 34-62
    assert res.status == "Converged"
    assert res.iterations == 2
    assert res.unknown_count == 129
    assert res.measurement_count == 417
    assert res.degrees_of_freedom == 288
    assert abs(res.chi_squared - 336.64) < 0.01
    assert abs(res.sigma_zero - 1.169) < 0.001
    assert res.pass_fail == "PASSED"
    assert abs(res.chi_lower - 0.843) < 0.001
    assert abs(res.chi_upper - 1.170) < 0.001
    assert res.potential_outliers == 10
    assert abs(res.global_pelzer - 0.779) < 0.001


def test_adjusted_coordinates_vs_golden(gnss_result, sample_dir):
    net, res = gnss_result
    expected = _parse_expected_coords(f"{sample_dir}/gnss.simult.adj.expected")
    assert len(expected) == 43
    worst = 0.0
    for name, exp in expected.items():
        i = net.name_to_idx[name]
        d = np.abs(res.xyz[i] - np.array([exp["X"], exp["Y"], exp["Z"]]))
        worst = max(worst, float(d.max()))
    # golden file prints to 0.1 mm; require agreement within print rounding
    assert worst < 1.0e-4, f"worst coordinate disagreement {worst} m"


def test_adjusted_sd_vs_golden(gnss_result, sample_dir):
    """Station SDs (e,n,up) from the a-posteriori covariance must match the
    golden output within print rounding (1 sigma, 0.1 mm)."""
    from dynadjust_tpu.geodesy.local_frame import rotation_cart_to_local
    net, res = gnss_result
    expected = _parse_expected_coords(f"{sample_dir}/gnss.simult.adj.expected")
    for name, exp in expected.items():
        i = net.name_to_idx[name]
        V = res.cov_xyz[3 * i:3 * i + 3, 3 * i:3 * i + 3]
        R = rotation_cart_to_local(net.lat[i], net.lon[i])
        Vl = R @ V @ R.T
        sd = np.sqrt(np.diag(Vl))
        assert abs(sd[0] - exp["sde"]) < 2e-4, name
        assert abs(sd[1] - exp["sdn"]) < 2e-4, name
        assert abs(sd[2] - exp["sdup"]) < 2e-4, name


def test_adjusted_measurements_sample(gnss_result):
    """Spot-check adjusted measurement statistics against golden rows."""
    net, res = gnss_result
    # First row: G 324900360 BEEC X: meas -8628.7179, adj -8628.7210,
    # corr -0.0031, measSD 0.0130, adjSD 0.0031, corrSD 0.0127, N -0.25
    first = res.msr_stats[0]
    assert first.mtype == "G"
    assert first.cardinal == "X"
    assert abs(first.pre_adj_meas - (-8628.7179)) < 5e-4
    assert abs(first.adjusted - (-8628.7210)) < 5e-4
    assert abs(first.correction - (-0.0031)) < 2e-4
    assert abs(np.sqrt(first.meas_var) - 0.0130) < 1e-4
    assert abs(np.sqrt(first.adj_prec) - 0.0031) < 1e-4
    assert abs(np.sqrt(first.resid_prec) - 0.0127) < 1e-4
    assert abs(first.nstat - (-0.25)) < 0.01
