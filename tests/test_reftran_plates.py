"""Tectonic plate model and plate-motion epoch propagation tests.

Parity targets: dnareftran.cpp IdentifyStationPlate (:103),
CalculateRotations (:207), TransformFrames_PlateMotionModel (:970).
"""

import numpy as np
import pytest

from dynadjust_tpu.geodesy.conversions import geo_to_cart
from dynadjust_tpu.geodesy.local_frame import rotate_cart_local
from dynadjust_tpu.params.datums import Datum
from dynadjust_tpu.params.ellipsoids import GRS80
from dynadjust_tpu.reftran import _transform_xyz
from dynadjust_tpu.reftran.plates import (
    load_plate_model, euler_to_cartesian_rates,
)

PB2002_DIG = "/root/reference/sampleData/PB2002_plates.dig"
PB2002_POLES = "/root/reference/sampleData/PB2002_poles.dat"
MORVEL_DIG = "/root/reference/sampleData/MORVEL56_plates.dig"
MORVEL_POLES = "/root/reference/sampleData/NNR-MORVEL56_poles.dat"


@pytest.fixture(scope="module")
def pb2002():
    return load_plate_model(PB2002_DIG, PB2002_POLES)


def test_euler_to_cartesian_au():
    # ICSM GDA2020 Technical Manual: Australian plate rotation rates
    # 1.50379 / 1.18346 / 1.20716 mas/yr (ITRF2014->GDA2020 rates).
    rx, ry, rz = euler_to_cartesian_rates(32.2447, 38.2022, 0.6285)
    assert abs(rx - 1.50379) < 2e-3
    assert abs(ry - 1.18346) < 2e-3
    assert abs(rz - 1.20716) < 2e-3


def test_plate_identification_global(pb2002):
    cases = [
        ((21.3, -157.8), "PA"),     # Hawaii (mid-plate, dateline side)
        ((-37.8, 145.0), "AU"),     # Melbourne
        ((35.7, 139.7), "OK"),      # Tokyo (Okhotsk in PB2002)
        ((51.5, -0.1), "EU"),       # London
        ((40.7, -74.0), "NA"),      # New York (NA rings the Arctic)
        ((61.2, -149.9), "NA"),     # Anchorage
        ((-33.4, -70.6), "SA"),     # Santiago
        ((-1.3, 36.8), "SO"),       # Nairobi (Somalia plate)
        ((-89.9, 0.0), "AN"),       # near South Pole (AN rings the pole)
        ((-31.95, 115.86), "AU"),   # Perth
    ]
    for (lat, lon), want in cases:
        got = pb2002.identify(np.radians(lat), np.radians(lon))
        assert got == want, f"({lat},{lon}): {got} != {want}"


def test_morvel_loads_and_identifies():
    pm = load_plate_model(MORVEL_DIG, MORVEL_POLES)
    assert len(pm.polygons) >= 50
    assert pm.identify(np.radians(-37.8), np.radians(145.0)) == "AU"
    assert pm.identify(np.radians(40.7), np.radians(-74.0)) == "NA"


def test_pmm_epoch_propagation_velocity(pb2002):
    """ITRF2014 epoch propagation over AU: Melbourne moves ~5.7 cm/yr N,
    ~1.9 cm/yr E (published ITRF2014 velocities)."""
    lat, lon = np.radians(-37.8), np.radians(145.0)
    xyz = np.array(geo_to_cart(lat, lon, 50.0, GRS80))[None, :]
    d10 = Datum.from_name("ITRF2014", "01.01.2010")
    d20 = Datum.from_name("ITRF2014", "01.01.2020")
    out = _transform_xyz(xyz, d10, d20)
    enu = rotate_cart_local((out - xyz)[0], lat, lon)
    assert 0.017 < enu[0] / 10.0 < 0.022      # east m/yr
    assert 0.053 < enu[1] / 10.0 < 0.060      # north m/yr
    assert abs(enu[2]) < 0.01                 # no vertical motion

    # per-plate PB2002 pole agrees with the Australian PMM closely
    out_p = _transform_xyz(xyz, d10, d20, ["AU"], pb2002)
    assert np.linalg.norm(out_p - out) < 1e-3


def test_pmm_round_trip(pb2002):
    """Propagating 2010->2025->2010 must return the input."""
    lat, lon = np.radians(-23.7), np.radians(133.9)   # Alice Springs
    xyz = np.array(geo_to_cart(lat, lon, 600.0, GRS80))[None, :]
    d10 = Datum.from_name("ITRF2014", "01.01.2010")
    d25 = Datum.from_name("ITRF2014", "01.01.2025")
    fwd = _transform_xyz(xyz, d10, d25, ["AU"], pb2002)
    back = _transform_xyz(fwd, d25, d10, ["AU"], pb2002)
    assert np.linalg.norm(back - xyz) < 1e-6


def test_dynamic_to_dynamic_with_frame_change():
    """GDA2020 -> ITRF2014@2030 routes via the 3-step PMM path and lands
    ~10 years of AU motion away (GDA2020 == ITRF2014@2020)."""
    lat, lon = np.radians(-37.8), np.radians(145.0)
    xyz = np.array(geo_to_cart(lat, lon, 50.0, GRS80))[None, :]
    dg = Datum.from_name("GDA2020", "")
    d30 = Datum.from_name("ITRF2014", "01.01.2030")
    out = _transform_xyz(xyz, dg, d30)
    mag = np.linalg.norm(out - xyz)
    assert 0.5 < mag < 0.8


def test_morvel56_epoch_propagation_golden(sample_dir):
    """The reference's own plate-motion fixture: apr network at ITRF2008
    @04.06.2020 propagated to @01.01.2021 with NNR-MORVEL56 must match
    apr.ITRF2008.01.01.2021.stn.expected within 0.1 mm (the reference's
    ref-itrf-pmm-06/07 test with dnadiff -t 0.0001).  Exercises the
    duplicate-plate-id handling (the dig reuses 'NB' for North Bismarck
    and Nubia)."""
    import numpy as np

    from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.reftran import transform_network
    from dynadjust_tpu.reftran.plates import load_plate_model

    stns, _, _ = read_dna_stn(f"{sample_dir}/apr.ITRF2008.04.06.2020.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/apr.ITRF2008.04.06.2020.msr")
    stns.sort(key=lambda st: st.name)
    net = build_network(stns, recs, "ITRF2008", "04.06.2020")
    pm = load_plate_model(f"{sample_dir}/MORVEL56_plates.dig",
                          f"{sample_dir}/NNR-MORVEL56_poles.dat")
    transform_network(net, "ITRF2008", "01.01.2021", plate_model=pm)

    exp = {}
    for line in open(f"{sample_dir}/apr.ITRF2008.01.01.2021.stn.expected"):
        t = line.split()
        if len(t) >= 6 and t[1] == "FFF" and t[2] == "XYZ":
            exp[t[0]] = np.array([float(t[3]), float(t[4]), float(t[5])])
    assert len(exp) == 58
    xyz = net.station_xyz()
    worst = max(float(np.abs(xyz[net.station_index(n)] - e).max())
                for n, e in exp.items())
    assert worst < 1e-4, worst


def test_gda94_to_gda2020_export_golden(sample_dir):
    """reftran GDA94->GDA2020 against the reference's own dnareftran
    export (urban.GDA2020.1.1.2020.stn): all 149 stations within the
    fixture's print quantization (~0.3 mm packed-DMS)."""
    import numpy as np

    from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.reftran import transform_network
    from dynadjust_tpu.geodesy.conversions import dms_to_rad
    from dynadjust_tpu.geodesy.projections import grid_to_geo

    stns, frame, epoch = read_dna_stn(f"{sample_dir}/urban-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/urban-network.msr")
    stns.sort(key=lambda st: st.name)
    net = build_network(stns, recs, frame, epoch)
    transform_network(net, "GDA2020")

    exp_stns, ef, _ = read_dna_stn(f"{sample_dir}/urban.GDA2020.1.1.2020.stn")
    assert ef == "GDA2020" and len(exp_stns) == 149
    worst = worst_h = 0.0
    for st in exp_stns:
        i = net.station_index(st.name)
        if (st.coord_type or "LLH").upper() == "UTM":
            la, lo = grid_to_geo(st.p1, st.p2, 55)
        else:
            la = float(dms_to_rad(st.p1))
            lo = float(dms_to_rad(st.p2))
        worst = max(worst, abs(la - net.lat[i]) * 6.4e6,
                    abs(lo - net.lon[i]) * 6.4e6 * np.cos(la))
        worst_h = max(worst_h, abs(st.p3 - net.height[i]))
    assert worst < 5e-4, worst
    assert worst_h < 2e-4, worst_h


def test_every_itrf_frame_label_transforms(sample_dir):
    """The reference's frame-label battery (ref-frame-misc-01..):
    every ITRF/GDA/WGS84 label joins to GDA2020 with the plate model."""
    from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.reftran import transform_network
    from dynadjust_tpu.reftran.plates import load_plate_model

    stns0, _, _ = read_dna_stn(f"{sample_dir}/urban-network.stn")
    recs0, _, _ = read_dna_msr(f"{sample_dir}/urban-network.msr")
    pm = load_plate_model(f"{sample_dir}/PB2002_plates.dig",
                          f"{sample_dir}/PB2002_poles.dat")
    frames = [("ITRF1988", "03.12.1988"), ("ITRF1989", "01.09.1989"),
              ("ITRF1990", "01.10.1990"), ("ITRF1991", "01.01.1991"),
              ("ITRF1992", "01.02.1992"), ("ITRF1993", "01.03.1993"),
              ("ITRF1994", "01.04.1994"), ("ITRF1996", "01.06.1996"),
              ("ITRF1997", "01.07.1997"), ("ITRF2000", "01.01.2000"),
              ("ITRF2005", "01.01.2005"), ("ITRF2008", "01.01.2008"),
              ("ITRF2014", "01.01.2014"), ("ITRF2020", "01.01.2021"),
              ("GDA94", "01.01.1994"), ("GDA2020", "01.01.2020"),
              ("WGS84", "01.01.2010")]
    for fr, ep in frames:
        net = build_network(list(stns0), recs0, fr, ep)
        stats = transform_network(net, "GDA2020", "01.01.2020",
                                  plate_model=pm)
        assert stats["stations"] + stats["stations_skipped"] == 149, fr
