"""Synthetic mixed-measurement-type network generator.

Builds a rows×cols station grid carrying the full terrestrial+GNSS
measurement mix (G baselines, S slope distances, A angles, V zenith
distances, L level differences, H orthometric heights) as real
NetworkData records — the scale fixture for the per-iteration
re-linearisation path (the reference re-linearises these types every
iteration: UpdateDesignNormalMeasMatrices_*, dnaadjust.hpp:572-757).

Measurement values are simulated from the true coordinates with the same
geodesy kernels the adjustment uses, plus white noise at the stated
standard deviations; initial coordinates are perturbed so Gauss-Newton
has real work to do.
"""

from __future__ import annotations

import numpy as np

from ..geodesy import measurements as gm
from ..geodesy.conversions import geo_to_cart
from ..io_formats.dna import Station, Measurement, GpsCluster, GpsObs
from ..network import build_network
from ..segment import Segmentation
from ..params.ellipsoids import GRS80
from .synthetic import grid_segmentation


def synthetic_mixed_network(rows: int, cols: int, spacing_deg: float = 0.05,
                            seed: int = 0, lat0: float = -37.0,
                            lon0: float = 143.0,
                            block_rows: int = 16, block_cols: int = 16,
                            perturb: float = 0.15,
                            return_truth: bool = False):
    """Returns (net, seg): a NetworkData with a mixed measurement set and
    a grid-tile Segmentation (boundary rows/cols are junctions).

    return_truth=True additionally returns the (S, 3) true cartesian
    coordinates the measurements were simulated from — callers checking
    adjusted-vs-truth error must use this instead of re-deriving the
    generator's internals (rng draw order, grid formulas)."""
    rng = np.random.default_rng(seed)
    S = rows * cols
    latd = lat0 + spacing_deg * np.arange(rows)
    lond = lon0 + spacing_deg * np.arange(cols)
    LA, LO = np.meshgrid(np.radians(latd), np.radians(lond), indexing="ij")
    lat, lon = LA.ravel(), LO.ravel()
    h = 300.0 + 50.0 * rng.standard_normal(S)
    x, y, z = geo_to_cart(lat, lon, h, GRS80)
    X = np.stack([x, y, z], axis=-1)

    def sid(r, c):
        return r * cols + c

    names = [f"S{r}_{c}" for r in range(rows) for c in range(cols)]
    # perturbed initial coordinates (cartesian noise re-expressed through
    # the station records' geographic fields via a small height/angle jitter)
    dX = perturb * rng.standard_normal((S, 3))
    from ..geodesy.conversions import cart_to_geo
    la0, lo0, h0 = cart_to_geo(X[:, 0] + dX[:, 0], X[:, 1] + dX[:, 1],
                               X[:, 2] + dX[:, 2], GRS80)
    stations = [Station(name=names[i], constraints="FFF",
                        coord_type="LLH-G", p1=float(np.degrees(la0[i])),
                        p2=float(np.degrees(lo0[i])), p3=float(h0[i]))
                for i in range(S)]
    stations[0] = Station(name=names[0], constraints="CCC",
                          coord_type="LLH-G",
                          p1=float(np.degrees(lat[0])),
                          p2=float(np.degrees(lon[0])), p3=float(h[0]))

    # --- edges --------------------------------------------------------
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    right = (rr[:, :-1].ravel() * cols + cc[:, :-1].ravel(),
             rr[:, :-1].ravel() * cols + cc[:, :-1].ravel() + 1)
    down = (rr[:-1].ravel() * cols + cc[:-1].ravel(),
            (rr[:-1].ravel() + 1) * cols + cc[:-1].ravel())
    diag = (rr[:-1, :-1].ravel() * cols + cc[:-1, :-1].ravel(),
            (rr[:-1, :-1].ravel() + 1) * cols + cc[:-1, :-1].ravel() + 1)

    recs = []
    tile = lambda s: (s // cols) // block_rows * \
        ((cols + block_cols - 1) // block_cols) + (s % cols) // block_cols
    rec_block = []

    # G baselines on right+down edges (one-obs clusters, like most real
    # GNSS session baselines)
    sd_g = 0.008
    for (i, j) in (right, down):
        vecs = X[j] - X[i] + sd_g * rng.standard_normal((len(i), 3))
        for k in range(len(i)):
            recs.append(GpsCluster(
                mtype="G", ignore=False, coord_type="XYZ", vscale=1.0,
                pscale=1.0, lscale=1.0, hscale=1.0, epsg_frame="",
                epoch="", obs=[GpsObs(first=names[i[k]], second=names[j[k]],
                                      vec=vecs[k],
                                      vcv=np.eye(3) * sd_g ** 2)]))
            rec_block.append(tile(min(i[k], j[k])))

    # S slope distances on the diagonals
    sd_s = 0.012
    i, j = diag
    dist = gm.slope_distance(X[i, 0], X[i, 1], X[i, 2],
                             X[j, 0], X[j, 1], X[j, 2], lat[i], lon[i])[0]
    vals = dist + sd_s * rng.standard_normal(len(i))
    for k in range(len(i)):
        recs.append(Measurement(mtype="S", ignore=False, first=names[i[k]],
                                second=names[j[k]], value=float(vals[k]),
                                sd=sd_s))
        rec_block.append(tile(min(i[k], j[k])))

    # A horizontal angles at every 2nd interior node: right -> down
    sd_a = np.radians(3.0 / 3600.0)             # 3 arcsec
    ar = rr[:-1:2, :-1:2].ravel()
    ac = cc[:-1:2, :-1:2].ravel()
    c0 = ar * cols + ac
    c1 = c0 + 1                                  # right
    c2 = c0 + cols                               # down
    ang = gm.horizontal_angle(X[c0, 0], X[c0, 1], X[c0, 2],
                              X[c1, 0], X[c1, 1], X[c1, 2],
                              X[c2, 0], X[c2, 1], X[c2, 2],
                              lat[c0], lon[c0])[0]
    vals = ang + sd_a * rng.standard_normal(len(c0))
    for k in range(len(c0)):
        recs.append(Measurement(mtype="A", ignore=False, first=names[c0[k]],
                                second=names[c1[k]], third=names[c2[k]],
                                value=float(vals[k]), sd=sd_a))
        rec_block.append(tile(c0[k]))

    # V zenith distances on every 3rd right edge
    sd_v = np.radians(5.0 / 3600.0)
    i, j = right[0][::3], right[1][::3]
    zen = gm.zenith_distance(X[i, 0], X[i, 1], X[i, 2],
                             X[j, 0], X[j, 1], X[j, 2],
                             lat[i], lon[i], lat[j], lon[j])[0]
    vals = zen + sd_v * rng.standard_normal(len(i))
    for k in range(len(i)):
        recs.append(Measurement(mtype="V", ignore=False, first=names[i[k]],
                                second=names[j[k]], value=float(vals[k]),
                                sd=sd_v))
        rec_block.append(tile(min(i[k], j[k])))

    # L level differences on every 3rd down edge
    sd_l = 0.006
    i, j = down[0][::3], down[1][::3]
    h_i = gm.ellipsoid_height(X[i, 0], X[i, 1], X[i, 2], lat[i], GRS80)[0]
    h_j = gm.ellipsoid_height(X[j, 0], X[j, 1], X[j, 2], lat[j], GRS80)[0]
    vals = (h_j - h_i) + sd_l * rng.standard_normal(len(i))
    for k in range(len(i)):
        recs.append(Measurement(mtype="L", ignore=False, first=names[i[k]],
                                second=names[j[k]], value=float(vals[k]),
                                sd=sd_l))
        rec_block.append(tile(min(i[k], j[k])))

    # R ellipsoidal heights at every 5th station
    sd_r = 0.02
    i = np.arange(0, S, 5)
    hv = gm.ellipsoid_height(X[i, 0], X[i, 1], X[i, 2], lat[i], GRS80)[0]
    vals = hv + sd_r * rng.standard_normal(len(i))
    for k in range(len(i)):
        recs.append(Measurement(mtype="R", ignore=False, first=names[i[k]],
                                value=float(vals[k]), sd=sd_r))
        rec_block.append(tile(i[k]))

    net = build_network(stations, recs, "GDA2020", "01.01.2020")

    blocks, _ = grid_segmentation(rows, cols, block_rows, block_cols)
    B = len(blocks)
    seg = Segmentation(
        inner_stations=[list(b[0]) for b in blocks],
        junction_stations=[list(b[1]) for b in blocks],
        measurements=[[] for _ in range(B)],
        networks=[0] * B)
    for ri, b in enumerate(rec_block):
        seg.measurements[b].append(ri)
    if return_truth:
        return net, seg, X
    return net, seg
