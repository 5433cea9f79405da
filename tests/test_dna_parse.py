from collections import Counter

import numpy as np

from dynadjust_tpu.io_formats import (
    read_dna_stn, read_dna_msr, GpsCluster, Measurement, DirectionSet,
)


def test_gnss_stations(sample_dir):
    stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    assert len(stns) == 43
    assert frame == "GDA2020"
    assert epoch == "01.01.2020"
    s = stns[0]
    assert s.name == "211300470"
    assert s.constraints == "FFF"
    assert s.coord_type == "LLH"
    assert abs(s.p1 - (-36.3348253617)) < 1e-12


def test_gnss_measurements(sample_dir):
    recs, frame, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    # 129 single baselines, one 4-baseline X cluster, one 6-point Y cluster
    counts = Counter(r.mtype for r in recs)
    assert counts == {"G": 129, "X": 1, "Y": 1}

    g = next(r for r in recs if r.mtype == "G")
    assert g.obs[0].first == "324900360"
    assert g.obs[0].second == "BEEC"
    assert abs(g.obs[0].vec[0] - (-8628.7180)) < 1e-9
    assert abs(g.obs[0].vcv[0, 0] - 1.7012598619000e-05) < 1e-18
    assert g.vscale == 10.0
    assert g.epsg_frame == "ITRF2008"

    # total scalar observation rows: 139 baselines/points x 3 = 417
    rows = sum(len(r.obs) * 3 for r in recs)
    assert rows == 417

    x = next(r for r in recs if r.mtype == "X")
    assert len(x.obs) == 4
    assert len(x.obs[0].covs) == 3
    assert len(x.obs[3].covs) == 0


def test_urban_measurements(sample_dir):
    recs, _, _ = read_dna_msr(f"{sample_dir}/urban-network.msr")
    counts = Counter(type(r).__name__ for r in recs)
    assert counts["GpsCluster"] == 38 + 1       # 38 G + one 4-point Y cluster
    scalars = [r for r in recs if isinstance(r, Measurement) and not r.ignore]
    tc = Counter(m.mtype for m in scalars)
    assert tc["A"] == 248
    assert tc["S"] == 427
    assert tc["V"] == 287
    assert tc["L"] == 89
    # Y clusters in LLH with packed-DMS lat/lon parsed to radians
    y = next(r for r in recs if r.mtype == "Y")
    assert y.coord_type == "LLH"
    lat = y.obs[0].vec[0]
    assert -0.66 < lat < -0.65     # ~ -37.5 deg


def test_direction_sets(sample_dir):
    recs, _, _ = read_dna_msr(f"{sample_dir}/dsg.msr")
    dsets = [r for r in recs if isinstance(r, DirectionSet)]
    assert dsets, "dsg.msr should contain direction sets"
    d = dsets[0]
    assert d.first == "212000820"
    assert d.ro == "269100210"
    assert len(d.directions) == 1


def test_ignored_measurement_continuation_rows(sample_dir):
    """dsg-ignored.msr: ignored clusters' continuation rows carry the
    ignore flag ' *' in column 2 — they are data, not comments."""
    from dynadjust_tpu.io_formats.dna import read_dna_msr
    recs, _, _ = read_dna_msr(f"{sample_dir}/dsg-ignored.msr")
    assert len(recs) == 22
    assert all(getattr(r, "ignore", False) for r in recs)
    # the X cluster keeps its full VCV rows
    from dynadjust_tpu.io_formats.dna import GpsCluster
    xs = [r for r in recs if isinstance(r, GpsCluster) and r.mtype == "X"]
    assert xs and all(len(ob.vcv) == 3 for x in xs for ob in x.obs)


def test_all_type_fixture_parses(sample_dir):
    """dsg.msr + dsg-ignored.msr together cover every measurement type."""
    from dynadjust_tpu.io_formats.dna import read_dna_msr
    recs, _, _ = read_dna_msr(f"{sample_dir}/dsg.msr")
    recs2, _, _ = read_dna_msr(f"{sample_dir}/dsg-ignored.msr")
    types = {getattr(r, "mtype", "D") for r in recs + recs2}
    assert types >= set("ABCEGHIJKLMPQRSVXYZ")


def test_jsonl_fixtures_adjust(sample_dir):
    """The reference's JSONL fixtures import and reproduce the GNSS
    adjustment statistics."""
    from dynadjust_tpu.io_formats.jsonl import read_jsonl
    from dynadjust_tpu.io_formats import NTv2Grid
    from dynadjust_tpu.geoid import apply_geoid
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.adjust import adjust_simultaneous, AdjustmentOptions

    stns, _, f, e = read_jsonl(f"{sample_dir}/gnss-networkstn.jsonl")
    _, recs, _, _ = read_jsonl(f"{sample_dir}/gnss-networkmsr.jsonl")
    stns.sort(key=lambda s: s.name)
    net = build_network(stns, recs, f or "GDA2020", e or "01.01.2020")
    grid = NTv2Grid.read(f"{sample_dir}/gnss-network-geoid.gsb")
    apply_geoid(net, grid, convert_heights=True)
    res = adjust_simultaneous(net, AdjustmentOptions(
        scale_normals_to_unity=True))
    assert res.iterations == 2
    assert abs(res.sigma_zero - 1.169) < 0.005


# ---------------------------------------------------------------------------
# DynaML XSD-equivalent validation (dnainterop.cpp:465; DynaML.xsd)
# ---------------------------------------------------------------------------

def test_dynaml_validation_accepts_all_reference_samples():
    import glob
    from dynadjust_tpu.io_formats.dynaml import read_dynaml
    for p in sorted(glob.glob("/root/reference/sampleData/*.xml")):
        read_dynaml(p)          # must not raise


def test_dynaml_validation_rejects_invalid(tmp_path):
    import pytest
    from dynadjust_tpu.io_formats.dynaml import read_dynaml

    cases = {
        "bad_root.xml":
            '<Bogus type="Station File"></Bogus>',
        "bad_type_attr.xml":
            '<DnaXmlFormat type="Nonsense File"></DnaXmlFormat>',
        "station_missing_coord.xml":
            '<DnaXmlFormat type="Station File"><DnaStation>'
            '<Name>A</Name><Constraints>FFF</Constraints>'
            '<Type>LLH</Type></DnaStation></DnaXmlFormat>',
        "msr_unknown_child.xml":
            '<DnaXmlFormat type="Measurement File"><DnaMeasurement>'
            '<Type>S</Type><Garbage>1</Garbage>'
            '</DnaMeasurement></DnaXmlFormat>',
        "baseline_missing_sigma.xml":
            '<DnaXmlFormat type="Measurement File"><DnaMeasurement>'
            '<Type>G</Type><First>A</First><Second>B</Second>'
            '<GPSBaseline><X>1</X><Y>2</Y><Z>3</Z></GPSBaseline>'
            '</DnaMeasurement></DnaXmlFormat>',
        "station_in_msr_file.xml":
            '<DnaXmlFormat type="Measurement File"><DnaStation>'
            '<Name>A</Name><Constraints>FFF</Constraints><Type>LLH</Type>'
            '<StationCoord><Name>A</Name><XAxis>0</XAxis><YAxis>0</YAxis>'
            '<Height>0</Height></StationCoord></DnaStation>'
            '</DnaXmlFormat>',
    }
    for name, body in cases.items():
        p = tmp_path / name
        p.write_text('<?xml version="1.0"?>\n' + body)
        with pytest.raises(ValueError, match="schema validation"):
            read_dynaml(str(p))
