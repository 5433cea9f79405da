import numpy as np

from dynadjust_tpu.geodesy.conversions import (
    geo_to_cart, cart_to_geo, dms_to_deg, deg_to_dms, dms_to_rad, rad_to_dms,
)
from dynadjust_tpu.params.ellipsoids import GRS80


def test_geo_cart_roundtrip():
    rng = np.random.default_rng(0)
    lat = np.radians(rng.uniform(-89, 89, 100))
    lon = np.radians(rng.uniform(-179.9, 179.9, 100))
    h = rng.uniform(-100, 5000, 100)
    x, y, z = geo_to_cart(lat, lon, h, GRS80)
    la2, lo2, h2 = cart_to_geo(x, y, z, GRS80)
    assert np.allclose(lat, la2, atol=1e-12)
    assert np.allclose(lon, lo2, atol=1e-12)
    assert np.allclose(h, h2, atol=1e-6)


def test_cart_to_geo_reference_value():
    # Reference test vector from dnatemplategeodesyfuncs.hpp:144-152:
    # (-3563081.362, -2057145.984, -4870449.482) -> -50 00 00, -150 00 00,
    # h=10000.000
    la, lo, h = cart_to_geo(-3563081.362, -2057145.984, -4870449.482, GRS80)
    # the reference prints "-50 00 00.0000, -150 00 00.0000, 10000.000"
    # (4-5 decimal places of a second)
    assert abs(np.degrees(float(la)) - (-50.0)) < 1e-8
    assert abs(np.degrees(float(lo)) - (-150.0)) < 1e-8
    assert abs(float(h) - 10000.0) < 1e-3


def test_dms_roundtrip():
    vals = np.array([-36.3348253617, 145.5741006771, 0.000001, -0.5959999])
    deg = dms_to_deg(vals)
    back = deg_to_dms(deg)
    assert np.allclose(vals, back, atol=1e-10)


def test_dms_packing():
    # -36 deg 33 min 48.253617 sec
    d = float(dms_to_deg(-36.3348253617))
    expected = -(36 + 33 / 60.0 + 48.253617 / 3600.0)
    assert abs(d - expected) < 1e-12
