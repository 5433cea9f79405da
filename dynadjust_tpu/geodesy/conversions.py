"""Geodetic coordinate conversions (vectorised, float64).

All functions accept numpy or jax arrays and are written with jnp-compatible
primitives; the module-level `xp` defaults to numpy for host paths, and the
jitted device variants live in dynadjust_tpu.adjust.

Parity reference (algorithms studied from):
  /root/reference/dynadjust/include/functions/dnatemplategeodesyfuncs.hpp
    GeoToCart :77, CartToGeo (Lin & Wang 1995 Newton iteration) :154
  /root/reference/dynadjust/include/functions/dnatemplatecalcfuncs.hpp
    DegtoDms :206, DmstoDeg :236
"""

from __future__ import annotations

import math
import numpy as np

from ..params.ellipsoids import Ellipsoid, GRS80


def prime_vertical(e: Ellipsoid, lat):
    """nu: radius of curvature in the prime vertical."""
    s = np.sin(lat)
    return e.a / np.sqrt(1.0 - e.e1sq * s * s)


def prime_meridian(e: Ellipsoid, lat):
    """rho: radius of curvature in the meridian."""
    s = np.sin(lat)
    return e.a * (1.0 - e.e1sq) / (1.0 - e.e1sq * s * s) ** 1.5


def geo_to_cart(lat, lon, h, e: Ellipsoid = GRS80):
    """Geographic (radians, ellipsoidal height) → cartesian XYZ."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)
    nu = prime_vertical(e, lat)
    cl = np.cos(lat)
    x = (nu + h) * cl * np.cos(lon)
    y = (nu + h) * cl * np.sin(lon)
    z = (nu * (1.0 - e.e1sq) + h) * np.sin(lat)
    return x, y, z


def cart_to_geo(x, y, z, e: Ellipsoid = GRS80):
    """Cartesian XYZ → geographic (radians, ellipsoidal height).

    Lin & Wang (1995) Newton iteration, identical iteration control to the
    reference (5 iterations max, 1e-12 f-convergence, per-element freeze).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    p2 = x * x + y * y
    p = np.sqrt(p2)
    a2 = e.a * e.a
    b = e.b
    b2 = b * b
    z2 = z * z
    a2z2 = a2 * z2
    b2p2 = b2 * p2
    A = a2z2 + b2p2

    m = (e.a * b * np.sqrt(A) * A - a2 * b2 * A) / (2.0 * (a2 * a2z2 + b2 * b2p2))
    frozen = np.zeros_like(np.asarray(m), dtype=bool)
    for _ in range(5):
        twom = 2.0 * m
        a2t = a2 + twom
        b2t = b2 + twom
        f = a2 * p2 / (a2t * a2t) + b2 * z2 / (b2t * b2t) - 1.0
        conv = np.abs(f) < 1e-12
        df = -4.0 * (a2 * p2 / (a2t ** 3) + b2 * z2 / (b2t ** 3))
        m_new = m - f / df
        frozen = frozen | conv
        m = np.where(frozen, m, m_new)

    twom = 2.0 * m
    p_E = a2 * p / (a2 + twom)
    z_E = b2 * z / (b2 + twom)

    lat = np.arctan(a2 * z_E / (b2 * p_E))
    lon = np.arctan(y / x)
    lon = np.where((x < 0.0) & (y > 0.0), lon + np.pi, lon)
    lon = np.where((x < 0.0) & (y < 0.0), -(np.pi - lon), lon)

    h = np.sqrt((p - p_E) ** 2 + (z - z_E) ** 2)
    h = np.where((p + np.abs(z)) < (p_E + np.abs(z_E)), -h, h)
    return lat, lon, h


# ---------------------------------------------------------------------------
# Packed DMS (ddd.mmssssss) representation used by DNA station files
# ---------------------------------------------------------------------------

def dms_to_deg(v):
    """Packed ddd.mmssss → decimal degrees (exactly replicates the
    reference's floor(+1e-4) minute extraction)."""
    v = np.asarray(v, dtype=np.float64)
    av = np.abs(v)
    d = np.floor(av)
    m = np.floor((av - d) * 100.0 + 0.0001)
    s = ((av - d) * 100.0 - m) * 100.0
    deg = d + m / 60.0 + s / 3600.0
    return np.where(v < 0.0, -deg, deg)


def deg_to_dms(v):
    """Decimal degrees → packed ddd.mmssss."""
    v = np.asarray(v, dtype=np.float64)
    av = np.abs(v)
    d = np.floor(av)
    m = np.floor((av - d) * 60.0)
    s = (av - d - m / 60.0) * 3600.0
    roll = np.abs(s - 60.0) < 1e-9
    s = np.where(roll, 0.0, s)
    m = np.where(roll, m + 1.0, m)
    dms = d + m / 100.0 + s / 10000.0
    return np.where(v < 0.0, -dms, dms)


def dms_to_rad(v):
    return np.radians(dms_to_deg(v))


def rad_to_dms(v):
    return deg_to_dms(np.degrees(np.asarray(v, dtype=np.float64)))
