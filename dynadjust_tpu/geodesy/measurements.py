"""Measurement reduction functions: directions, angles, zenith distances,
chord/arc conversions, heights — the computational heart of the observation
equations.

All functions are written against plain math ops on numpy scalars/arrays so
they can also be traced by JAX (jnp arrays) for the device path.

Parity reference (formulas studied from):
  include/functions/dnatemplategeodesyfuncs.hpp — Direction :679,
  HorizontalAngle :722, VerticalAngle :777, ZenithDistance :850,
  EllipsoidHeight :909, EllipsoidChordDistance :958,
  RadiusCurvatureInChordDirection :993, MSL/Ellipsoid arc-chord family,
  Laplace/deflection corrections :1181-1217.
"""

from __future__ import annotations

import numpy as np

from ..params.ellipsoids import Ellipsoid, GRS80
from .conversions import prime_vertical, prime_meridian

TWO_PI = 2.0 * np.pi
HALF_PI = 0.5 * np.pi


def local_elements(x1, y1, z1, x2, y2, z2, lat1, lon1):
    """(e, n, up) components of the vector 1→2 in station 1's local frame."""
    dx, dy, dz = x2 - x1, y2 - y1, z2 - z1
    sl, cl = np.sin(lat1), np.cos(lat1)
    so, co = np.sin(lon1), np.cos(lon1)
    e = -so * dx + co * dy
    n = -sl * co * dx - sl * so * dy + cl * dz
    up = cl * co * dx + cl * so * dy + sl * dz
    return e, n, up


def direction_from_local(e, n):
    """Azimuth from local e/n — quadrant-stable formulation."""
    d = np.where(np.abs(e) < np.abs(n), np.arctan2(e, n),
                 HALF_PI - np.arctan2(n, e))
    return np.where(d < 0, d + TWO_PI, d)


def direction(x1, y1, z1, x2, y2, z2, lat1, lon1):
    e, n, _ = local_elements(x1, y1, z1, x2, y2, z2, lat1, lon1)
    return direction_from_local(e, n), e, n


def horizontal_angle(x1, y1, z1, x2, y2, z2, x3, y3, z3, lat1, lon1):
    """Angle 2→1→3.  Returns (angle, dir12, dir13, e12, n12, e13, n13)."""
    d12, e12, n12 = direction(x1, y1, z1, x2, y2, z2, lat1, lon1)
    d13, e13, n13 = direction(x1, y1, z1, x3, y3, z3, lat1, lon1)
    d13 = np.where(d12 > d13, d13 + TWO_PI, d13)
    return d13 - d12, d12, d13, e12, n12, e13, n13


def instrument_height_cart(height, lat, lon):
    """Cartesian components of a plumb (normal-direction) height offset."""
    return (np.cos(lat) * np.cos(lon) * height,
            np.cos(lat) * np.sin(lon) * height,
            np.sin(lat) * height)


def _target_vector(x1, y1, z1, x2, y2, z2, lat1, lon1, lat2, lon2, ih, th):
    dxi, dyi, dzi = instrument_height_cart(ih, lat1, lon1)
    dxt, dyt, dzt = instrument_height_cart(th, lat2, lon2)
    dx = x2 - x1 + dxt - dxi
    dy = y2 - y1 + dyt - dyi
    dz = z2 - z1 + dzt - dzi
    sl, cl = np.sin(lat1), np.cos(lat1)
    so, co = np.sin(lon1), np.cos(lon1)
    e = -so * dx + co * dy
    n = -sl * co * dx - sl * so * dy + cl * dz
    up = cl * co * dx + cl * so * dy + sl * dz
    return e, n, up


def zenith_distance(x1, y1, z1, x2, y2, z2, lat1, lon1, lat2, lon2,
                    ih=0.0, th=0.0):
    """Zenith distance instrument→target incl. inst/target heights.
    Returns (zenith, e, n, up)."""
    e, n, up = _target_vector(x1, y1, z1, x2, y2, z2, lat1, lon1, lat2, lon2,
                              ih, th)
    return np.arctan2(np.sqrt(e * e + n * n), up), e, n, up


def vertical_angle(x1, y1, z1, x2, y2, z2, lat1, lon1, lat2, lon2,
                   ih=0.0, th=0.0):
    e, n, up = _target_vector(x1, y1, z1, x2, y2, z2, lat1, lon1, lat2, lon2,
                              ih, th)
    return np.arctan2(up, np.sqrt(e * e + n * n)), e, n, up


def slope_distance(x1, y1, z1, x2, y2, z2, lat1, lon1, ih=0.0, th=0.0):
    """Spatial distance instrument→target.  Both height offsets use station
    1's latitude/longitude (reference behaviour,
    UpdateDesignNormalMeasMatrices_S, dnaadjust.cpp:5455-5472).
    Returns (dist, dX, dY, dZ) with dX.. the instrument—target components."""
    dxi, dyi, dzi = instrument_height_cart(ih, lat1, lon1)
    dxt, dyt, dzt = instrument_height_cart(th, lat1, lon1)
    dx = x2 - x1 + dxt - dxi
    dy = y2 - y1 + dyt - dyi
    dz = z2 - z1 + dzt - dzi
    return np.sqrt(dx * dx + dy * dy + dz * dz), dx, dy, dz


def ellipsoid_height(x, y, z, lat, e: Ellipsoid = GRS80):
    """Ellipsoidal height from cartesian + latitude.  Returns (h, nu, Zn)."""
    nu = prime_vertical(e, lat)
    zn = e.e1sq * nu * np.sin(lat)
    h = np.sqrt(x * x + y * y + (z + zn) ** 2) - nu
    return h, nu, zn


def ellipsoid_chord_distance(x1, y1, z1, x2, y2, z2, lat1, lat2, h1, h2,
                             e: Ellipsoid = GRS80):
    """Chord between the ellipsoid-surface projections of two points.
    Returns (chord, dX, dY, dZ)."""
    nu1 = prime_vertical(e, lat1)
    nu2 = prime_vertical(e, lat2)
    s1 = nu1 / (nu1 + h1)
    s2 = nu2 / (nu2 + h2)
    zn1 = e.e1sq * nu1 * np.sin(lat1)
    zn2 = e.e1sq * nu2 * np.sin(lat2)
    xa, ya, za = x1 * s1, y1 * s1, (z1 + zn1) * s1 - zn1
    xb, yb, zb = x2 * s2, y2 * s2, (z2 + zn2) * s2 - zn2
    dx, dy, dz = xb - xa, yb - ya, zb - za
    return np.sqrt(dx * dx + dy * dy + dz * dz), dx, dy, dz


def radius_in_chord_direction(x1, y1, z1, x2, y2, z2, lat1, lon1, lat2,
                              e: Ellipsoid = GRS80):
    mean_lat = (lat1 + lat2) / 2.0
    nu = prime_vertical(e, mean_lat)
    rho = prime_meridian(e, mean_lat)
    d, _, _ = direction(x1, y1, z1, x2, y2, z2, lat1, lon1)
    cd, sd = np.cos(d), np.sin(d)
    return rho * nu / (nu * cd * cd + rho * sd * sd)


def ellipsoid_arc_to_chord(arc, x1, y1, z1, x2, y2, z2, lat1, lon1, lat2,
                           e: Ellipsoid = GRS80):
    r = radius_in_chord_direction(x1, y1, z1, x2, y2, z2, lat1, lon1, lat2, e)
    return 2.0 * r * np.sin(arc / 2.0 / r)


def ellipsoid_chord_to_arc(chord, x1, y1, z1, x2, y2, z2, lat1, lon1, lat2,
                           e: Ellipsoid = GRS80):
    r = radius_in_chord_direction(x1, y1, z1, x2, y2, z2, lat1, lon1, lat2, e)
    return np.arcsin(chord / 2.0 / r) * 2.0 * r


def average_radius_of_curvature(e: Ellipsoid, lat):
    nu = prime_vertical(e, lat)
    rho = prime_meridian(e, lat)
    return np.sqrt(nu * rho)


def msl_chord_to_msl_arc(chord, lat1, lat2, n1, n2, e: Ellipsoid = GRS80):
    mean_lat = (lat1 + lat2) / 2.0
    nu = prime_vertical(e, mean_lat)
    rho = prime_meridian(e, mean_lat)
    r = np.sqrt(nu * rho) + (n1 + n2) / 2.0
    return np.arcsin(chord / 2.0 / r) * 2.0 * r


def msl_arc_to_msl_chord(arc, lat1, lat2, n1, n2, e: Ellipsoid = GRS80):
    mean_lat = (lat1 + lat2) / 2.0
    nu = prime_vertical(e, mean_lat)
    rho = prime_meridian(e, mean_lat)
    r = np.sqrt(nu * rho) + (n1 + n2) / 2.0
    return 2.0 * r * np.sin(arc / 2.0 / r)


def msl_chord_to_ellipsoid_chord(msl_chord, lat1, lat2, n1, n2,
                                 e: Ellipsoid = GRS80):
    c2 = msl_chord * msl_chord - (n2 - n1) ** 2
    mean_lat = (lat1 + lat2) / 2.0
    r = average_radius_of_curvature(e, mean_lat)
    c2 = c2 / (1.0 + n1 / r) / (1.0 + n2 / r)
    return np.sqrt(c2)


def ellipsoid_chord_to_msl_chord(chord, lat1, lat2, n1, n2,
                                 e: Ellipsoid = GRS80):
    mean_lat = (lat1 + lat2) / 2.0
    r = average_radius_of_curvature(e, mean_lat)
    c2 = chord * chord * (1.0 + n1 / r) * (1.0 + n2 / r) + (n2 - n1) ** 2
    return np.sqrt(c2)


def msl_arc_to_ellipsoid_chord(arc, lat1, lat2, n1, n2, e: Ellipsoid = GRS80):
    msl_chord = msl_arc_to_msl_chord(arc, lat1, lat2, n1, n2, e)
    return msl_chord_to_ellipsoid_chord(msl_chord, lat1, lat2, n1, n2, e)


def ellipsoid_chord_to_msl_arc(chord, lat1, lat2, n1, n2,
                               e: Ellipsoid = GRS80):
    msl_chord = ellipsoid_chord_to_msl_chord(chord, lat1, lat2, n1, n2, e)
    return msl_chord_to_msl_arc(msl_chord, lat1, lat2, n1, n2, e)


# -- deflection of the vertical corrections ---------------------------------

def laplace_correction(azimuth, zenith, defl_pv, defl_pm, lat):
    return defl_pv * np.tan(lat) + (
        (defl_pm * np.sin(azimuth) - defl_pv * np.cos(azimuth)) /
        np.tan(zenith))


def zenith_deflection_correction(azimuth, defl_pv, defl_pm):
    return defl_pm * np.cos(azimuth) + defl_pv * np.sin(azimuth)


def direction_deflection_correction(azimuth, zenith, defl_pv, defl_pm):
    return (defl_pm * np.sin(azimuth) - defl_pv * np.cos(azimuth)) / \
        np.tan(zenith)


def hz_angle_deflection_correction(az12, zen12, az13, zen13, defl_pv, defl_pm):
    return (direction_deflection_correction(az13, zen13, defl_pv, defl_pm) -
            direction_deflection_correction(az12, zen12, defl_pv, defl_pm))
