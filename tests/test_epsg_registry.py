"""EPSG registry breadth (VERDICT r3 #10): every frame label and every
EPSG code variant the reference accepts (dnaepsg.hpp /
dnaconsts-datums.hpp) must resolve here, with matching static/dynamic
classification, reference epochs, and ellipsoids."""

import pytest

from dynadjust_tpu.params import epsg as E
from dynadjust_tpu.params.datums import (Datum, is_known_frame,
                                         frame_from_epsg_code)


# (label, xyz/canonical code, static?, reference epoch) — transcribed
# from dnaconsts-datums.hpp:34-211 and dnaepsg.hpp:241-470
REFERENCE_TABLE = [
    ("AGD66", 4202, True, "01.01.1966"),
    ("AGD84", 4203, True, "01.01.1984"),
    ("GDA94", 4938, True, "01.01.1994"),
    ("GDA2020", 7842, True, "01.01.2020"),
    ("ITRF2020", 9988, False, "01.01.2020"),
    ("ITRF2014", 7789, False, "01.01.2010"),
    ("ITRF2008", 5332, False, "01.01.2008"),
    ("ITRF2005", 4896, False, "01.01.2005"),
    ("ITRF2000", 4919, False, "01.01.2000"),
    ("ITRF1997", 4918, False, "01.01.1997"),
    ("ITRF1996", 4917, False, "01.01.1996"),
    ("ITRF1994", 4916, False, "01.01.1994"),
    ("ITRF1993", 4915, False, "01.01.1993"),
    ("ITRF1992", 4914, False, "01.01.1992"),
    ("ITRF1991", 4913, False, "01.01.1991"),
    ("ITRF1990", 4912, False, "01.01.1990"),
    ("ITRF1989", 4911, False, "01.01.1989"),
    ("ITRF1988", 4910, False, "01.01.1988"),
    ("WGS84", 4978, True, ""),
    ("WGS84 (transit)", 7815, False, "01.01.1987"),
    ("WGS84 (G730)", 7656, False, "02.01.1994"),
    ("WGS84 (G873)", 7658, False, "29.09.1996"),
    ("WGS84 (G1150)", 7660, False, "20.01.2002"),
    ("WGS84 (G1674)", 7662, False, "07.05.2012"),
    ("WGS84 (G1762)", 7664, False, "16.10.2013"),
    ("WGS84 (G2139)", 9753, False, "03.01.2021"),
    ("NAD83(CSRS)", 4954, True, "01.01.2010"),
    ("NAD83(CSRS)v2", 8233, True, "01.01.1997"),
    ("NAD83(CSRS)v3", 8238, True, "01.01.1997"),
    ("NAD83(CSRS)v4", 8242, True, "01.01.2002"),
    ("NAD83(CSRS)v5", 8247, True, "01.01.2006"),
    ("NAD83(CSRS)v6", 8250, True, "01.01.2010"),
    ("NAD83(CSRS)v7", 8253, True, "01.01.2010"),
    ("NAD83(CSRS)v8", 10412, True, "01.01.2010"),
    ("Yacare (ROU-USAMS)", 4309, True, "01.01.1963"),
    ("SIRGAS-ROU98", 5379, True, "03.07.1995"),
    ("SIRGAS 1995", 4974, True, "01.04.1995"),
    ("SIRGAS 2000", 4988, True, "01.04.2000"),
]

# every accepted variant code (LatLonEht / LatLon / XYZ / ensemble),
# from dnaconsts-datums.hpp:34-120
ALL_VARIANT_CODES = [
    4202, 4203,
    4938, 4283, 4939, 7842, 7844, 7843,
    9988, 9989, 7789, 7912, 5332, 7911, 4896, 7910, 4919, 7909,
    4910, 7900, 4911, 7901, 4912, 7902, 4913, 7903, 4914, 7904,
    4915, 7905, 4916, 7906, 4917, 7907, 4918, 7908,
    7816, 7815, 7657, 7656, 7659, 7658, 7661, 7660, 7663, 7662,
    7665, 7664, 9754, 9753, 4979, 4978, 6326,
    4955, 4954, 8235, 8233, 8239, 8238, 8244, 8242, 8248, 8247,
    8251, 8250, 8254, 8253, 10413, 10412,
    4309, 5379, 5380, 4974, 4975, 4988, 4989,
]


def test_every_reference_label_resolves():
    for name, xyz_code, static, epoch in REFERENCE_TABLE:
        assert E.epsg_code_from_name(name) == xyz_code, name
        assert E.epsg_string_from_name(name) == str(xyz_code), name


def test_every_variant_code_resolves():
    for code in ALL_VARIANT_CODES:
        name = E.datum_from_epsg_code(code)   # must not raise
        assert name
        assert frame_from_epsg_code(code)     # datums-module canonical


def test_static_dynamic_classification():
    for name, xyz_code, static, _ in REFERENCE_TABLE:
        assert E.is_epsg_datum_static(xyz_code) == static, name


def test_reference_epochs():
    for name, xyz_code, static, epoch in REFERENCE_TABLE:
        if epoch:
            assert E.reference_epoch_from_epsg_code(xyz_code) == epoch, name


def test_unknown_raises():
    with pytest.raises(ValueError):
        E.epsg_code_from_name("NOT_A_FRAME")
    with pytest.raises(ValueError):
        E.datum_from_epsg_code(99999)


def test_wgs84_ensemble():
    assert E.is_epsg_wgs84_ensemble(6326)
    assert E.is_epsg_wgs84_ensemble(4978)
    assert not E.is_epsg_wgs84_ensemble(7842)
    assert E.datum_from_epsg_code(6326) == "WGS84"


def test_datum_construction_and_ellipsoids():
    from dynadjust_tpu.params.ellipsoids import (GRS80, WGS84,
                                                 INTERNATIONAL1924, ANS)
    for name, _, _, _ in REFERENCE_TABLE:
        assert is_known_frame(name), name
        d = Datum.from_name(name)
        ell = d.ellipsoid
        if name.startswith(("ITRF", "GDA", "NAD83", "SIRGAS")):
            assert ell is GRS80, name
        elif name.startswith("Yacare"):
            assert ell is INTERNATIONAL1924
        elif name.startswith("WGS84"):
            assert ell is WGS84, name
        elif name.startswith("AGD"):
            assert ell is ANS, name
