"""Local (e,n,up) <-> cartesian rotations and variance propagation.

Parity reference:
  include/functions/dnatemplatematrixfuncs.hpp
    FormLocaltoCartRotationMatrix, Rotate_CartLocal :647,
    PropagateVariances_LocalCart :592, FormCarttoGeoRotationMatrix,
    Prpagate_Variances_Geo_Cart :300 (cart->geo uses the numerically
    inverted geo->cart Jacobian), ScaleGPSVCV :378.
"""

from __future__ import annotations

import numpy as np

from ..params.ellipsoids import Ellipsoid, GRS80
from .conversions import prime_vertical


def rotation_local_to_cart(lat, lon) -> np.ndarray:
    """R such that v_cart = R @ v_local, v_local = (e, n, up).  Vectorised:
    lat/lon (...,) → R (..., 3, 3)."""
    sl, cl = np.sin(lat), np.cos(lat)
    so, co = np.sin(lon), np.cos(lon)
    R = np.stack([
        np.stack([-so, -sl * co, cl * co], axis=-1),
        np.stack([co, -sl * so, cl * so], axis=-1),
        np.stack([np.zeros_like(sl), cl, sl], axis=-1),
    ], axis=-2)
    return R


def rotation_cart_to_local(lat, lon) -> np.ndarray:
    return np.swapaxes(rotation_local_to_cart(lat, lon), -1, -2)


def rotate_cart_local(v_cart, lat, lon):
    """Cartesian vector(s) → local (e, n, up)."""
    R = rotation_cart_to_local(lat, lon)
    return np.einsum("...ij,...j->...i", R, np.asarray(v_cart, dtype=np.float64))


def rotate_local_cart(v_local, lat, lon):
    R = rotation_local_to_cart(lat, lon)
    return np.einsum("...ij,...j->...i", R, np.asarray(v_local, dtype=np.float64))


def propagate_variance_local_cart(V_local, lat, lon):
    """V_cart = R V_local R^T."""
    R = rotation_local_to_cart(lat, lon)
    return R @ np.asarray(V_local, dtype=np.float64) @ R.T


def propagate_variance_cart_local(V_cart, lat, lon):
    R = rotation_local_to_cart(lat, lon)
    return R.T @ np.asarray(V_cart, dtype=np.float64) @ R


def geo_cart_jacobian(lat, lon, h, e: Ellipsoid = GRS80) -> np.ndarray:
    """Jacobian d(X,Y,Z)/d(lat,lon,h) — the 'CarttoGeo rotation matrix'."""
    cl, sl = np.cos(lat), np.sin(lat)
    co, so = np.cos(lon), np.sin(lon)
    term1_a = e.a * e.e1sq
    one_m = 1.0 - e.e1sq
    nu = prime_vertical(e, lat)
    nu_h = nu + h
    nu_e_h = nu * one_m + h
    t1b = term1_a * sl * cl
    t1c = (1.0 - e.e1sq * sl * sl) ** 1.5
    return np.array([
        [t1b * cl * co / t1c - nu_h * sl * co, -nu_h * cl * so, cl * co],
        [t1b * cl * so / t1c - nu_h * sl * so, nu_h * cl * co, cl * so],
        [t1b * one_m * sl / t1c + nu_e_h * cl, 0.0, sl],
    ])


def scale_gps_vcv(V_cart: np.ndarray, lat, lon, h, p_scale, l_scale, h_scale,
                  e: Ellipsoid = GRS80) -> np.ndarray:
    """Scale a cartesian GPS VCV by per-axis geographic scalars.

    Rotates the VCV into the (lat, lon, h) system via the inverted geo->cart
    Jacobian, scales diagonally by sqrt(scalars), rotates back.
    """
    J = geo_cart_jacobian(lat, lon, h, e)
    Jinv = np.linalg.inv(J)
    V_geo = Jinv @ V_cart @ Jinv.T
    S = np.diag([np.sqrt(p_scale), np.sqrt(l_scale), np.sqrt(h_scale)])
    V_geo = S @ V_geo @ S.T
    return J @ V_geo @ J.T


def scale_gps_vcv_cluster(V_cart: np.ndarray, lats, lons, hts,
                          p_scale, l_scale, h_scale,
                          e: Ellipsoid = GRS80,
                          already_geographic: bool = False) -> np.ndarray:
    """Cluster (3n x 3n) version of scale_gps_vcv with a block-diagonal
    Jacobian formed from each point's position."""
    n = len(lats)
    J = np.zeros((3 * n, 3 * n))
    for i in range(n):
        J[3 * i:3 * i + 3, 3 * i:3 * i + 3] = geo_cart_jacobian(
            lats[i], lons[i], hts[i], e)
    if already_geographic:
        V_geo = np.asarray(V_cart, dtype=np.float64)
    else:
        Jinv = np.linalg.inv(J)
        V_geo = Jinv @ V_cart @ Jinv.T
    s = np.tile([np.sqrt(p_scale), np.sqrt(l_scale), np.sqrt(h_scale)], n)
    V_geo = V_geo * np.outer(s, s)
    return J @ V_geo @ J.T


def propagate_vcv_geo_to_cart(V_geo: np.ndarray, lats, lons, hts,
                              e: Ellipsoid = GRS80) -> np.ndarray:
    """Propagate an (optionally cluster) VCV given in geographic
    (lat, lon, h) terms to cartesian: V_cart = J V_geo J^T."""
    lats = np.atleast_1d(lats)
    n = len(lats)
    lons = np.atleast_1d(lons)
    hts = np.atleast_1d(hts)
    J = np.zeros((3 * n, 3 * n))
    for i in range(n):
        J[3 * i:3 * i + 3, 3 * i:3 * i + 3] = geo_cart_jacobian(
            lats[i], lons[i], hts[i], e)
    return J @ V_geo @ J.T
