"""Auxiliary feature tests: scalar files, Type B, renaming, screening,
diff tool, SINEX/XML/JSONL round trips, plotting."""

import os

import numpy as np
import pytest

from dynadjust_tpu.io_formats.aux_files import (
    read_scalar_file, apply_baseline_scalars, read_typeb_file,
    parse_typeb_global, read_renaming_file, apply_renaming,
)
from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
from dynadjust_tpu.network.screening import (
    unused_stations, filter_stations, find_nearby_stations,
)
from dynadjust_tpu.diff import compare_files


def test_scalar_file(sample_dir):
    scalars = read_scalar_file(f"{sample_dir}/gnss-network.scalars")
    assert len(scalars) == 6
    s = scalars[0]
    assert (s.station1, s.station2) == ("MYRT", "324901240")
    assert s.p_scale == 2.0 and s.h_scale == 5.0

    recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    n = apply_baseline_scalars(recs, scalars)
    assert n >= 6


def test_typeb_file(sample_dir):
    tb = read_typeb_file(f"{sample_dir}/dsg.typeb")
    by_name = {t.station: t for t in tb}
    assert by_name["30"].sd_e == 0.001
    assert by_name["30"].sd_up == 0.005
    assert by_name["409704930"].sd_e == 0.0
    assert by_name["409704930"].sd_up == 0.012
    g = parse_typeb_global("0.003,0.003,0.006")
    assert g.sd_up == 0.006


def test_renaming(sample_dir):
    renames = read_renaming_file(f"{sample_dir}/dsg.renaming")
    assert renames["409704930"] == "1"
    stns, _, _ = read_dna_stn(f"{sample_dir}/dsg.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/dsg.msr")
    apply_renaming(stns, recs, renames)
    names = {s.name for s in stns}
    assert "409704930" not in names


def test_screening(sample_dir):
    stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    assert unused_stations(stns, recs) == []

    keep = [s.name for s in stns[:10]]
    s2, m2 = filter_stations(stns, recs, include=keep)
    assert len(s2) == 10
    for rec in m2:
        from dynadjust_tpu.network.screening import stations_of_record
        assert all(n in keep for n in stations_of_record(rec))


def test_geoid_summary_and_geo_export(sample_dir, tmp_path):
    """Grid summary and the DNA .geo export against the reference's own
    urban-network.geo fixture."""
    from dynadjust_tpu.io_formats import NTv2Grid
    from dynadjust_tpu.geoid import apply_geoid
    from dynadjust_tpu.geoid.gridtools import grid_summary, export_dna_geo
    from dynadjust_tpu.network import build_network

    grid = NTv2Grid.read(f"{sample_dir}/urban-network-geoid.gsb")
    lines = grid_summary(grid)
    assert any("Sub-grids:" in l for l in lines)

    stns, frame, epoch = read_dna_stn(f"{sample_dir}/urban-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/urban-network.msr")
    stns.sort(key=lambda s: s.name)
    net = build_network(stns, recs, frame, epoch)
    apply_geoid(net, grid, convert_heights=True)
    p = tmp_path / "urban.geo"
    export_dna_geo(str(p), net)
    ours = p.read_text().splitlines()
    exp = open(f"{sample_dir}/urban-network.geo").read().splitlines()
    assert ours == exp      # byte-identical to the reference's own export


def test_screening_assoc_and_transcend(sample_dir):
    from dynadjust_tpu.network.screening import (
        filter_stations_assoc_msrs, filter_bounding_box,
        stations_of_record)
    stns, _, _ = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")

    # include-assoc: seed station pulls in all connected stations
    seed = stns[0].name
    s2, m2 = filter_stations_assoc_msrs(stns, recs, include=[seed])
    assert len(s2) > 1
    assert any(seed in stations_of_record(r) for r in m2)

    # exclude-assoc: dropped station has no measurements left
    s3, m3 = filter_stations_assoc_msrs(stns, recs, exclude=[seed])
    assert all(seed not in stations_of_record(r) for r in m3)
    assert len(s3) == len(stns) - 1

    # transcending box keeps at least as much as the plain box
    import numpy as np
    from dynadjust_tpu.geodesy.conversions import dms_to_deg
    lats = [float(dms_to_deg(s.p1)) for s in stns]
    lons = [float(dms_to_deg(s.p2)) for s in stns]
    box = (min(lats), min(lons),
           min(lats) + 0.5 * (max(lats) - min(lats)),
           min(lons) + 0.5 * (max(lons) - min(lons)))
    sa, ma = filter_bounding_box(stns, recs, *box)
    sb, mb = filter_bounding_box(stns, recs, *box, transcend=True)
    assert len(sb) >= len(sa)
    assert len(mb) >= len(ma)


def test_combined_dynaml_roundtrip(sample_dir, tmp_path):
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.io_formats.dynaml import (write_dynaml_combined,
                                                 read_dynaml)
    stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    net = build_network(stns, recs, frame, epoch)
    p = tmp_path / "combined.xml"
    write_dynaml_combined(str(p), net)
    s2, r2, f2, _ = read_dynaml(str(p))
    assert len(s2) == net.nstations
    assert len(r2) == len(net.measurements)
    assert f2 == frame


def test_diff_tool(tmp_path, sample_dir):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("header\nG STN1 1.2345 2.0\n")
    b.write_text("other header\nG STN1 1.2349 2.0\n")
    eq, _ = compare_files(str(a), str(b), tolerance=0.001, skip_headers=1)
    assert eq
    eq, diffs = compare_files(str(a), str(b), tolerance=0.0001,
                              skip_headers=1)
    assert not eq and len(diffs) == 1


def test_plot(tmp_path, sample_dir):
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.output.plot import plot_network
    stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    stns.sort(key=lambda s: s.name)
    net = build_network(stns, recs, frame, epoch)
    out = plot_network(str(tmp_path / "net.png"), net)
    assert os.path.getsize(out) > 1000


def test_sinex_roundtrip(tmp_path, sample_dir):
    from dynadjust_tpu.io_formats.sinex import read_sinex
    stns, msrs, frame, epoch = read_sinex(f"{sample_dir}/TEST_ITRF05.SNX")
    assert [s.name for s in stns] == ["ALIC", "KARR", "YAR2"]
    cl = msrs[0]
    assert cl.mtype == "Y" and len(cl.obs) == 3
    # covariance symmetric and positive definite
    V = np.zeros((9, 9))
    for i, ob in enumerate(cl.obs):
        V[3 * i:3 * i + 3, 3 * i:3 * i + 3] = ob.vcv
        for j, C in enumerate(ob.covs):
            c0 = 3 * (i + 1 + j)
            V[3 * i:3 * i + 3, c0:c0 + 3] = C
            V[c0:c0 + 3, 3 * i:3 * i + 3] = C.T
    assert np.linalg.eigvalsh(V).min() > 0


def test_split_cluster_boundary():
    """X cluster straddling a selection boundary: retained obs keep their
    VCVs and only the covariance blocks to other retained obs
    (--split-clusters parity: SplitClusterMsrsConnectedToStns)."""
    import numpy as np
    from dynadjust_tpu.io_formats.dna import GpsCluster, GpsObs
    from dynadjust_tpu.network.screening import split_cluster

    cl = GpsCluster(mtype="X", ignore=False, coord_type="XYZ", vscale=1,
                    pscale=1, lscale=1, hscale=1,
                    epsg_frame="GDA2020", epoch="01.01.2020")
    names = [("A", "B"), ("B", "C"), ("C", "D")]
    for k, (f, s) in enumerate(names):
        ob = GpsObs(first=f, second=s, vec=np.full(3, float(k)),
                    vcv=np.eye(3) * (k + 1))
        ob.covs = [np.full((3, 3), 10 * k + j)
                   for j in range(len(names) - k - 1)]
        cl.obs.append(ob)

    # keep A, B, C -> obs 0 and 1 retained, obs 2 (C-D) dropped
    out = split_cluster(cl, {"A", "B", "C"})
    assert len(out.obs) == 2
    assert out.obs[0].first == "A" and out.obs[1].second == "C"
    # obs0 originally had covs to obs1, obs2; only the obs1 block remains
    assert len(out.obs[0].covs) == 1
    np.testing.assert_array_equal(out.obs[0].covs[0], np.full((3, 3), 0.0))
    assert len(out.obs[1].covs) == 0
    np.testing.assert_array_equal(out.obs[1].vcv, np.eye(3) * 2)
    # original untouched
    assert len(cl.obs) == 3 and len(cl.obs[0].covs) == 2

    # nothing retained
    assert split_cluster(cl, {"X"}) is None
    # everything retained returns the record itself
    assert split_cluster(cl, {"A", "B", "C", "D"}) is cl


def test_adj_msr_tstat_and_gnss_units(sample_dir):
    """T-stat column and GNSS alternate-units output
    (--output-adj-msr-tstat / --output-adj-gnss-units)."""
    import numpy as np
    from dynadjust_tpu.adjust import AdjustmentOptions
    from dynadjust_tpu.adjust.simultaneous import adjust_simultaneous
    from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.output.adj_writer import measurement_lines

    stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    net = build_network(stns, recs, frame, epoch)
    res = adjust_simultaneous(net, AdjustmentOptions())

    base = measurement_lines(net, res)
    with_t = measurement_lines(net, res, tstat=True)
    assert "T-stat" in with_t[0] and "T-stat" not in base[0]
    # data rows got wider by the T-stat column
    assert len(with_t[2]) > len(base[2])

    enu = measurement_lines(net, res, gnss_units=1)
    cards = [ln[65:66] for ln in enu[2:] if ln[:1] == "G"]
    assert set(cards) <= {"e", "n", "u"} and cards, cards

    aed = measurement_lines(net, res, gnss_units=2)
    cards = [ln[65:66] for ln in aed[2:] if ln[:1] == "G"]
    assert set(cards) <= {"a", "e", "s"} and cards

    # ENU correction magnitudes match the XYZ correction magnitudes
    # (rotation preserves the norm) for the first baseline triple
    import math
    gx = [r for r in res.msr_stats if r.mtype == "G"][:3]
    xyz_norm = math.sqrt(sum(r.correction ** 2 for r in gx))
    from dynadjust_tpu.output.adj_writer import _gnss_alt_rows
    net._sigma0_hint = res.sigma_zero
    enu_rows = _gnss_alt_rows(net, gx, "enu")
    enu_norm = math.sqrt(sum(r.correction ** 2 for r in enu_rows))
    assert abs(xyz_norm - enu_norm) < 1e-9


def test_msr_to_stn_summary(sample_dir):
    from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.output.adj_writer import msr_to_stn_lines

    stns, frame, epoch = read_dna_stn(f"{sample_dir}/urban-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/urban-network.msr")
    net = build_network(stns, recs, frame, epoch)
    lines = msr_to_stn_lines(net)
    assert lines[1].startswith("Measurements to Station")
    hdr = [ln for ln in lines if ln.startswith("Station")][0]
    assert hdr.split()[1:] == list("ABCDEGHIJKLMPQRSVXYZ") + ["Total"]
    totals = [ln for ln in lines if ln.startswith("Totals")][0]
    # every station row total sums to the grand total column
    assert int(totals.split()[-1]) > 0
    # count_desc ordering puts the busiest station first
    desc = msr_to_stn_lines(net, sort="count_desc")
    rows = [ln for ln in desc if ln and not ln.startswith(("-", "Station",
                                                           "Totals",
                                                           "Measurements"))]
    t0 = int(rows[0].split()[-1])
    t1 = int(rows[1].split()[-1])
    assert t0 >= t1


def test_per_station_frames_reftran():
    """Stations imported from SINEX carry their own frame; reftran
    transforms each (frame, epoch) group separately."""
    import numpy as np
    from dynadjust_tpu.io_formats.dna import Station
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.reftran import transform_network
    from dynadjust_tpu.geodesy.conversions import geo_to_cart

    # one station already on GDA2020, one on ITRF2014@2018 (moves with AU)
    stns = [
        Station(name="A", constraints="FFF", coord_type="LLH",
                p1=-37.4854687, p2=144.5830432, p3=100.0),
        Station(name="B", constraints="FFF", coord_type="LLH",
                p1=-36.4854687, p2=145.5830432, p3=120.0,
                frame="ITRF2014", epoch="01.01.2018"),
    ]
    net = build_network(stns, [], "GDA2020", "01.01.2020")
    assert net.station_frames is not None
    lat0 = net.lat.copy()
    lon0 = net.lon.copy()
    stats = transform_network(net, "GDA2020", "01.01.2020")
    # station A unchanged (already GDA2020); B moved ~2 years of AU motion
    assert stats["stations_skipped"] == 1 and stats["stations"] == 1
    assert abs(net.lat[0] - lat0[0]) < 1e-15
    from dynadjust_tpu.params.ellipsoids import GRS80
    x0 = np.array(geo_to_cart(lat0[1], lon0[1], 120.0, GRS80))
    x1 = np.array(geo_to_cart(net.lat[1], net.lon[1], net.height[1], GRS80))
    d = np.linalg.norm(x1 - x0)
    assert 0.08 < d < 0.16, d   # ~2 yr x ~6cm/yr


def test_ignore_insufficient_measurements():
    from dynadjust_tpu.io_formats.dna import Station, Measurement, \
        GpsCluster, GpsObs
    from dynadjust_tpu.network.screening import \
        ignore_insufficient_measurements
    import numpy as np

    def stn(name, c="FFF"):
        return Station(name=name, constraints=c, coord_type="LLH",
                       p1=-37.0, p2=145.0, p3=100.0)

    # A--B slope distance; B has only this one measurement and is FFF ->
    # B is poorly constrained; ignoring the S leaves A with nothing, but
    # A has a GNSS point so A survives.
    stations = [stn("A"), stn("B"), stn("C", "CCC")]
    y = GpsCluster(mtype="Y", ignore=False, coord_type="XYZ", vscale=1,
                   pscale=1, lscale=1, hscale=1, epsg_frame="GDA2020",
                   epoch="")
    y.obs.append(GpsObs(first="A", second="", vec=np.zeros(3),
                        vcv=np.eye(3)))
    s_ab = Measurement(mtype="S", ignore=False, first="A", second="B",
                       value=1000.0, sd=0.01)
    s_c = Measurement(mtype="S", ignore=False, first="C", second="A",
                      value=900.0, sd=0.01)
    msrs = [y, s_ab, s_c]
    poorly = ignore_insufficient_measurements(stations, msrs)
    assert poorly == ["B"]
    assert s_ab.ignore and not s_c.ignore and not y.ignore

    # a CCC station with one height measurement is fine
    stations2 = [stn("D", "CCC")]
    h = Measurement(mtype="H", ignore=False, first="D", value=10.0, sd=0.02)
    assert ignore_insufficient_measurements(stations2, [h]) == []

    # an FFF station with only a height is insufficient
    stations3 = [stn("E", "FFF")]
    h2 = Measurement(mtype="H", ignore=False, first="E", value=10.0,
                     sd=0.02)
    assert ignore_insufficient_measurements(stations3, [h2]) == ["E"]
    assert h2.ignore


def test_dnaproj_roundtrip_and_args(tmp_path):
    from dynadjust_tpu.io_formats.dnaproj import (
        read_dnaproj, settings, write_dnaproj, project_to_args,
    )
    src = "/root/reference/sampleData/sample.dnaproj"
    sections = read_dnaproj(src)
    cfg = settings(sections)
    assert cfg["general"]["network-name"] == "sample"
    assert cfg["import"]["stn-msr-file"] == ["urban-network.stn",
                                             "urban-network.msr"]
    assert cfg["adjust"]["adjustment-mode"] == "phased-adjustment"

    args = project_to_args(src)
    assert args["network_name"] == "sample"
    assert args["phased"] is True
    assert args["max_iterations"] == 10
    assert abs(args["fixed_stn_sd"] - 1e-6) < 1e-12
    assert args["grid"] == "urban-network-geoid.gsb"
    assert args["output_adj_msr"] is True
    assert len(args["files"]) == 2

    # round trip
    out = tmp_path / "copy.dnaproj"
    write_dnaproj(str(out), sections)
    cfg2 = settings(read_dnaproj(str(out)))
    assert cfg2 == cfg


def test_apu_all_covariances(sample_dir, tmp_path):
    from dynadjust_tpu.adjust import AdjustmentOptions
    from dynadjust_tpu.adjust.simultaneous import adjust_simultaneous
    from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.output.uncertainty import write_apu

    stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    net = build_network(stns, recs, frame, epoch)
    res = adjust_simultaneous(net, AdjustmentOptions())
    p1 = tmp_path / "a.apu"
    p2 = tmp_path / "b.apu"
    write_apu(str(p1), net, res)
    write_apu(str(p2), net, res, all_covariances=True)
    t1 = p1.read_text()
    t2 = p2.read_text()
    assert "Full covariance matrix:            No" in t1
    assert "Full covariance matrix:            Yes" in t2
    # covariance output: n*(n-1)/2 extra 3x3 blocks => 3 lines each
    extra = len(t2.splitlines()) - len(t1.splitlines())
    n = net.nstations
    assert extra == 3 * n * (n - 1) // 2


def test_json_adjustment_report(sample_dir, tmp_path):
    import json
    import numpy as np
    from dynadjust_tpu.adjust import AdjustmentOptions
    from dynadjust_tpu.adjust.simultaneous import adjust_simultaneous
    from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.output.json_writer import write_adj_jsonl

    stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    net = build_network(stns, recs, frame, epoch)
    res = adjust_simultaneous(net, AdjustmentOptions())
    out = tmp_path / "r.adj.jsonl"
    n = write_adj_jsonl(str(out), net, res)
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert n == len(lines)
    assert "DnaAdjustmentReport" in lines[0]
    stations = [l for l in lines if "DnaStation" in l]
    msrs = [l for l in lines if "DnaMeasurement" in l]
    stats = [l for l in lines if "DnaStatistics" in l]
    assert len(stations) == net.nstations
    assert len(msrs) == len(res.msr_stats)
    assert len(stats) == 1
    s0 = stations[0]["DnaStation"]
    assert {"Name", "StationCoord", "Adjusted", "Uncertainty"} <= set(s0)
    assert abs(stats[0]["DnaStatistics"]["SigmaZero"] -
               res.sigma_zero) < 1e-12


def test_integrity_checks(sample_dir):
    import numpy as np
    from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
    from dynadjust_tpu.io_formats.dna import Measurement
    from dynadjust_tpu.network.integrity import check_integrity

    stns, _, _ = read_dna_stn(f"{sample_dir}/urban-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/urban-network.msr")
    assert check_integrity(stns, recs) == []

    # inject problems
    recs.append(Measurement(mtype="S", ignore=False, first="NOPE",
                            second="1003", value=10.0, sd=0.01))
    recs.append(Measurement(mtype="S", ignore=False, first="1003",
                            second="1004", value=10.0, sd=0.0))
    probs = check_integrity(stns, recs)
    assert any("unknown station 'NOPE'" in p for p in probs)
    assert any("non-positive std dev" in p for p in probs)


def test_adjustment_checkpoint_resume(sample_dir, tmp_path):
    import numpy as np
    from dynadjust_tpu.adjust import AdjustmentOptions
    from dynadjust_tpu.adjust.simultaneous import adjust_simultaneous
    from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
    from dynadjust_tpu.network import build_network

    def fresh():
        stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
        recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
        return build_network(stns, recs, frame, epoch)

    ck = str(tmp_path / "state.npz")
    # run one iteration only, checkpointing
    r1 = adjust_simultaneous(fresh(), AdjustmentOptions(
        max_iterations=1, checkpoint_file=ck))
    assert r1.iterations == 1
    import os
    assert os.path.exists(ck)
    # resume: converges to the same answer as an uninterrupted run
    r2 = adjust_simultaneous(fresh(), AdjustmentOptions(
        checkpoint_file=ck))
    rf = adjust_simultaneous(fresh(), AdjustmentOptions())
    np.testing.assert_allclose(r2.xyz, rf.xyz, atol=1e-8)


def test_dynaml_msr_round_trip(sample_dir, tmp_path):
    from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
    from dynadjust_tpu.io_formats.dynaml import read_dynaml, \
        write_dynaml_msr
    from dynadjust_tpu.io_formats.dna import Measurement, GpsCluster, \
        DirectionSet
    from dynadjust_tpu.network import build_network
    import numpy as np

    stns, frame, epoch = read_dna_stn(f"{sample_dir}/urban-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/urban-network.msr")
    net = build_network(stns, recs, frame, epoch)
    out = tmp_path / "m.xml"
    write_dynaml_msr(str(out), net)
    _, recs2, _, _ = read_dynaml(str(out))
    assert len(recs2) == len(recs)
    for a, b in zip(recs, recs2):
        assert type(a) is type(b)
        if isinstance(a, Measurement):
            assert a.mtype == b.mtype and a.first == b.first
            assert abs(a.value - b.value) < 1e-8
        elif isinstance(a, GpsCluster):
            assert a.mtype == b.mtype and len(a.obs) == len(b.obs)
            np.testing.assert_allclose(a.obs[0].vec, b.obs[0].vec,
                                       atol=1e-6)
            np.testing.assert_allclose(a.obs[0].vcv, b.obs[0].vcv,
                                       rtol=1e-8)
        elif isinstance(a, DirectionSet):
            assert len(a.directions) == len(b.directions)
            assert abs(a.ro_value - b.ro_value) < 1e-9


def test_observation_epoch(sample_dir, tmp_path):
    """--observation-epoch semantics (dnaimportwrapper.cpp:321,
    ApplyProjectObservationEpoch dnainterop.cpp:223): normalisation,
    not-explicitly-set override rule, DynaML round-trip, JSONL mirror."""
    import json
    from dynadjust_tpu.adjust import AdjustmentOptions
    from dynadjust_tpu.adjust.simultaneous import adjust_simultaneous
    from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
    from dynadjust_tpu.io_formats.dynaml import (read_dynaml,
                                                 write_dynaml_msr)
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.network.data import (normalise_observation_epoch,
                                            apply_observation_epoch)
    from dynadjust_tpu.output.json_writer import write_adj_jsonl

    # normalisation rules
    assert normalise_observation_epoch("2021") == "01.01.2021"
    assert normalise_observation_epoch("15.06.2020") == "15.06.2020"
    assert len(normalise_observation_epoch("today")) == 10
    with pytest.raises(ValueError):
        normalise_observation_epoch("31.02.2020")

    stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    # an explicitly-set record is never overridden
    recs[0].obs_epoch = "02.03.2004"
    n = apply_observation_epoch(recs, "15.06.2020")
    assert n == len(recs) - 1
    assert recs[0].obs_epoch == "02.03.2004"
    assert recs[1].obs_epoch == "15.06.2020"
    # a record whose obs epoch equals the frame epoch (the SetEpoch
    # auto-default) counts as not explicitly set
    recs[2].obs_epoch = recs[2].epoch
    assert apply_observation_epoch(recs[2:3], "16.06.2020") == 1
    assert recs[2].obs_epoch == "16.06.2020"

    net = build_network(stns, recs, frame, epoch)

    # DynaML round-trip preserves per-measurement observation epochs
    xml = tmp_path / "oe.msr.xml"
    write_dynaml_msr(str(xml), net)
    stns2, recs2, _, _ = read_dynaml(str(xml))
    assert recs2[0].obs_epoch == "02.03.2004"
    assert recs2[1].obs_epoch == "15.06.2020"

    # JSONL report mirrors EpochOfObservation per adjusted measurement
    res = adjust_simultaneous(net, AdjustmentOptions())
    out = tmp_path / "oe.adj.jsonl"
    write_adj_jsonl(str(out), net, res)
    msrs = [json.loads(l)["DnaMeasurement"]
            for l in out.read_text().splitlines()
            if "DnaMeasurement" in l]
    epochs = {m.get("EpochOfObservation") for m in msrs}
    assert "15.06.2020" in epochs and "02.03.2004" in epochs


def test_plot_window_and_alt_names(tmp_path, sample_dir):
    """Plot window options (--centre-station/--area-radius,
    --bounding-box) and description labels (--alternate-name)."""
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.output.plot import plot_network
    stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    net = build_network(stns, recs, frame, epoch)
    clat = float(np.degrees(net.lat[0]))
    clon = float(np.degrees(net.lon[0]))
    out = plot_network(str(tmp_path / "win.png"), net,
                       centre=(clat, clon), area_radius_m=20000.0,
                       label_stations=True, alternate_name=True)
    assert os.path.getsize(out) > 1000
    out2 = plot_network(str(tmp_path / "bbox.png"), net,
                        bounding_box=(clat - 1, clon - 1,
                                      clat + 1, clon + 1))
    assert os.path.getsize(out2) > 1000


def test_ntv2_ellipsoid_overrides(tmp_path, sample_dir):
    """--semi-major-from/-to and --semi-minor-from/-to land in the NTv2
    header (NTV2_MAJOR_F..., dnageoidwrapper.cpp:650,886)."""
    import glob
    from dynadjust_tpu.geoid.gridtools import create_ntv2_from_dat, \
        write_gsb
    from dynadjust_tpu.io_formats.ntv2 import NTv2Grid
    dats = glob.glob(f"{sample_dir}/ausgeoid*.dat")
    assert dats, "no DAT fixture"
    grid = create_ntv2_from_dat(dats[0], semi_major_from=6378160.0,
                                semi_minor_from=6356774.719,
                                semi_major_to=6378137.0,
                                semi_minor_to=6356752.314)
    out = tmp_path / "o.gsb"
    write_gsb(grid, str(out))
    g2 = NTv2Grid.read(str(out))
    assert abs(g2.ellipsoid_from[0] - 6378160.0) < 1e-6
    assert abs(g2.ellipsoid_from[1] - 6356774.719) < 1e-6
    assert abs(g2.ellipsoid_to[0] - 6378137.0) < 1e-6
