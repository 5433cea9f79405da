"""SINEX discontinuity parsing and station renaming tests.

Parity targets: DnaIoSnx::ParseSinexDiscontinuities
(include/io/dnaiosnxread.cpp), rename_discont_station
(include/io/dnaiosnx.hpp:159).
"""

import datetime

import numpy as np

from dynadjust_tpu.io_formats.discontinuities import (
    read_discontinuities, rename_site, apply_discontinuities,
)
from dynadjust_tpu.io_formats.dna import Station, Measurement, GpsCluster, \
    GpsObs
from dynadjust_tpu.io_formats.sinex import read_sinex

DISCONTS = "/root/reference/sampleData/disconts20201205.snx"
SNX = "/root/reference/sampleData/TEST_ITRF05.SNX"


def test_parse_discontinuity_file():
    d = read_discontinuities(DISCONTS)
    assert len(d) > 1000
    alic = d["ALIC"]
    assert len(alic) == 2 and all(w.exists for w in alic)
    assert alic[0].start == datetime.date(1900, 1, 1)
    assert alic[0].end == datetime.date(2011, 7, 20)      # 11:201
    # single-P-window sites are not discontinuity sites
    assert not d["ABPO"][0].exists


def test_rename_by_epoch():
    d = read_discontinuities(DISCONTS)
    assert rename_site(d, "ALIC", datetime.date(2005, 6, 1)) \
        == "ALIC_1900001"
    assert rename_site(d, "ALIC", datetime.date(2015, 6, 1)) \
        == "ALIC_2011201"
    assert rename_site(d, "ABPO", datetime.date(2015, 6, 1)) is None
    assert rename_site(d, "NOPE", datetime.date(2015, 6, 1)) is None


def test_sinex_import_renames_solutions():
    d = read_discontinuities(DISCONTS)
    stns, recs, frame, epoch = read_sinex(SNX, disconts=d)
    names = sorted(s.name for s in stns)
    assert names == ["ALIC_2011201", "KARR_2013254", "YAR2_2013171"]
    # the Y cluster references the renamed stations
    assert sorted(o.first for o in recs[0].obs) == names


def test_apply_discontinuities_to_measurements():
    d = read_discontinuities(DISCONTS)
    stations = [Station(name="ALIC", constraints="FFF", coord_type="LLH",
                        p1=-23.67, p2=133.885, p3=600.0)]
    msr = Measurement(mtype="S", ignore=False, first="ALIC",
                      second="OTHER", value=1000.0, sd=0.01,
                      epoch="01.06.2005")
    cl = GpsCluster(mtype="G", ignore=False, coord_type="XYZ", vscale=1,
                    pscale=1, lscale=1, hscale=1, epsg_frame="ITRF2014",
                    epoch="01.06.2015")
    cl.obs.append(GpsObs(first="ALIC", second="OTHER",
                         vec=np.zeros(3), vcv=np.eye(3)))
    pairs = apply_discontinuities(stations, [msr, cl], d)
    assert ("ALIC", "ALIC_1900001") in pairs
    assert ("ALIC", "ALIC_2011201") in pairs
    assert msr.first == "ALIC_1900001"
    assert cl.obs[0].first == "ALIC_2011201"
    # cloned stations exist for both renamed forms
    names = {s.name for s in stations}
    assert {"ALIC", "ALIC_1900001", "ALIC_2011201"} <= names
