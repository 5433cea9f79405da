"""Reference frame transformation stage (reftran).

Transforms station coordinates and frame-bound measurements (GPS baselines,
baseline clusters, point clusters) to the project datum via Helmert
14-parameter sets (joined through ITRF2014 when needed) or plate motion
models.

Parity reference: /root/reference/dynadjust/dynadjust/dnareftran/
dnareftran.cpp — TransformStationRecords :1451, TransformMeasurementRecords
:1611, TransformMeasurement_GX :1740 (the baseline is transformed by
transforming both endpoints and differencing; VCVs are not transformed),
TransformMeasurement_Y :1827.
"""

from __future__ import annotations

import numpy as np

from ..geodesy.conversions import geo_to_cart, cart_to_geo
from ..io_formats.dna import GpsCluster
from ..network.data import NetworkData
from ..params.datums import Datum
from ..params.transformations import (
    reduced_parameters_between, transform_7, TransformationError,
)


def _transform_xyz(xyz, datum_from: Datum, datum_to: Datum):
    r7 = reduced_parameters_between(datum_from, datum_to)
    return transform_7(np.asarray(xyz, dtype=np.float64), r7)


def transform_network(net: NetworkData, frame: str | None = None,
                      epoch: str = "") -> dict:
    """Transform all stations and measurements to (frame, epoch); defaults
    to the network's project datum.  Returns a stats dict."""
    datum_to = (Datum.from_name(frame, epoch) if frame
                else net.datum)

    stats = {"stations": 0, "stations_skipped": 0,
             "measurements": 0, "measurements_skipped": 0}

    # --- stations --------------------------------------------------------
    # In this model all stations share the project frame (per-station frames
    # only arise via SINEX import; tracked as a future extension).
    datum_from = net.datum
    if not datum_from.same_as(datum_to):
        x, y, z = geo_to_cart(net.lat, net.lon, net.height,
                              datum_from.ellipsoid)
        xyz = np.stack([x, y, z], axis=-1)
        xyz = _transform_xyz(xyz, datum_from, datum_to)
        la, lo, h = cart_to_geo(xyz[:, 0], xyz[:, 1], xyz[:, 2],
                                datum_to.ellipsoid)
        net.lat, net.lon, net.height = la, lo, h
        stats["stations"] = net.nstations
    else:
        stats["stations_skipped"] = net.nstations

    # --- measurements ----------------------------------------------------
    for rec in net.measurements:
        if not isinstance(rec, GpsCluster):
            continue    # local-frame measurements are not frame-bound
        datum_m = Datum.from_name(rec.epsg_frame, rec.epoch)
        if datum_m.same_as(datum_to):
            stats["measurements_skipped"] += 1
            continue
        if rec.mtype in ("G", "X"):
            _transform_baselines(net, rec, datum_m, datum_to)
        else:
            _transform_points(net, rec, datum_m, datum_to)
        rec.epsg_frame = datum_to.frame
        rec.epoch = epoch or net.epoch
        stats["measurements"] += 1

    net.reftran_applied = True
    net.datum = datum_to
    net.frame = datum_to.frame
    return stats


def _transform_baselines(net: NetworkData, rec: GpsCluster,
                         datum_from: Datum, datum_to: Datum):
    """Transform G/X baselines: endpoint coordinates are transformed and the
    baseline re-differenced (vector transformation; VCV unchanged)."""
    r7 = reduced_parameters_between(datum_from, datum_to)
    ell = datum_from.ellipsoid
    for obs in rec.obs:
        i1 = net.station_index(obs.first)
        x1 = np.array(geo_to_cart(net.lat[i1], net.lon[i1], net.height[i1],
                                  ell))
        x2 = x1 + obs.vec
        x1m = transform_7(x1, r7)
        x2m = transform_7(x2, r7)
        obs.vec = x2m - x1m


def _transform_points(net: NetworkData, rec: GpsCluster,
                      datum_from: Datum, datum_to: Datum):
    r7 = reduced_parameters_between(datum_from, datum_to)
    ell_from = datum_from.ellipsoid
    ell_to = datum_to.ellipsoid
    geographic = rec.coord_type.upper().startswith("LL")
    for obs in rec.obs:
        if geographic:
            xyz = np.array(geo_to_cart(obs.vec[0], obs.vec[1], obs.vec[2],
                                       ell_from))
        else:
            xyz = obs.vec
        xyzm = transform_7(xyz, r7)
        if geographic:
            la, lo, h = cart_to_geo(*xyzm, ell_to)
            obs.vec = np.array([float(la), float(lo), float(h)])
        else:
            obs.vec = xyzm
