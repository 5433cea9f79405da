"""Equivalents of the reference's small unit tests (SURVEY §4.1):
test_format_elapsed_time.cpp, test_msr_to_stn_sort.cpp,
test_gnss_nstat_sort.cpp — same cases, same expected values."""

import numpy as np

from dynadjust_tpu.output.adj_writer import (
    format_elapsed_time, format_elapsed_hms, format_elapsed_ms)


def test_format_elapsed_time_reference_cases():
    # the reference's exact REQUIRE cases
    assert format_elapsed_time(0.000078) == "0.078ms"
    assert format_elapsed_time(0.0) == "0.000ms"
    assert format_elapsed_time(0.5) == "500.000ms"
    assert format_elapsed_time(0.999) == "999.000ms"
    assert format_elapsed_time(1.0) == "1.000s"
    assert format_elapsed_time(12.580) == "12.580s"
    assert format_elapsed_time(59.999) == "59.999s"
    assert format_elapsed_time(60.0) == "00:01:00"
    assert format_elapsed_time(68.0) == "00:01:08"
    assert format_elapsed_time(139.419) == "00:02:19"
    assert format_elapsed_time(3600.0) == "01:00:00"
    assert format_elapsed_time(5841.0) == "01:37:21"
    assert format_elapsed_time(26697.777) == "07:24:57"
    assert format_elapsed_time(36000.0) == "10:00:00"


def test_format_elapsed_hms_and_ms():
    assert format_elapsed_hms(0.009) == "00:00:00.009000"
    assert format_elapsed_hms(0.0) == "00:00:00"
    assert format_elapsed_hms(3601.5) == "01:00:01.500000"
    assert format_elapsed_ms(0.007151) == "7.151ms"


def _m2s_net():
    """Five stations with distinct name vs file orders and varying
    measurement counts (the test_msr_to_stn_sort fixture shape)."""
    from dynadjust_tpu.io_formats.dna import Station, Measurement
    from dynadjust_tpu.network import build_network
    rows = [("PERT", 5), ("ALIC", 2), ("TIDB", 8), ("BEEC", 1),
            ("HOB2", 3)]
    stns = [Station(name=n, constraints="FFF", coord_type="LLH",
                    p1=-30.0 - i, p2=140.0 + i, p3=100.0)
            for i, (n, _) in enumerate(rows)]
    msrs = []
    # measurement counts: TIDB 3, PERT 2, ALIC 2, HOB2 1, BEEC 0
    for a, b in (("PERT", "ALIC"), ("PERT", "TIDB"), ("ALIC", "TIDB"),
                 ("TIDB", "HOB2")):
        msrs.append(Measurement(mtype="S", ignore=False, first=a,
                                second=b, value=1000.0, sd=0.01))
    stns_sorted = sorted(stns, key=lambda s: s.name)
    net = build_network(stns_sorted, msrs, "GDA2020", "01.01.2020")
    file_order = {n: k for k, (n, _) in enumerate(rows)}
    net.station_file_order = [file_order[n] for n in net.names]
    return net


def test_msr_to_stn_sort_orders():
    from dynadjust_tpu.output.adj_writer import msr_to_stn_lines
    net = _m2s_net()

    def station_col(lines):
        return [ln.split()[0] for ln in lines
                if ln and ln.split()[0] in net.names]

    by_name = station_col(msr_to_stn_lines(net, sort="name"))
    assert by_name == sorted(by_name)
    by_file = station_col(msr_to_stn_lines(net, sort="file_order"))
    assert by_file == ["PERT", "ALIC", "TIDB", "BEEC", "HOB2"]
    by_count = station_col(msr_to_stn_lines(net, sort="count"))
    counts = {"TIDB": 3, "PERT": 2, "ALIC": 2, "HOB2": 1, "BEEC": 0}
    assert [counts[s] for s in by_count] == \
        sorted((counts[s] for s in by_count))
    by_desc = station_col(msr_to_stn_lines(net, sort="count_desc"))
    assert [counts[s] for s in by_desc] == \
        sorted((counts[s] for s in by_desc), reverse=True)
    assert by_name != by_file


def test_cart_to_local_rotation_axes():
    """CompareGNSSnstat rotation sanity (test_gnss_nstat_sort.cpp): an
    'up' cartesian vector at a station rotates to (0,0,1) locally; an
    'east' vector to (1,0,0)."""
    from dynadjust_tpu.geodesy.local_frame import (rotate_cart_local,
                                                   rotation_local_to_cart)
    lat, lon = np.radians(-35.3), np.radians(149.1)
    R = rotation_local_to_cart(lat, lon)
    up_cart = R @ np.array([0.0, 0.0, 1.0])
    e, n, u = np.ravel(rotate_cart_local(up_cart, lat, lon))
    assert abs(e) < 1e-10 and abs(n) < 1e-10 and abs(u - 1.0) < 1e-10
    east_cart = R @ np.array([1.0, 0.0, 0.0])
    e, n, u = np.ravel(rotate_cart_local(east_cart, lat, lon))
    assert abs(e - 1.0) < 1e-10 and abs(n) < 1e-10 and abs(u) < 1e-10
