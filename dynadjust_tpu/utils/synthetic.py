"""Synthetic GNSS network generator for scaling tests and benchmarks.

Builds a rows×cols grid of stations over a geographic extent with GPS
baselines between neighbours (right, down, and one diagonal) — the sparse
connectivity structure of a national adjustment (BASELINE.json configs:
1k → 250k+ stations).
"""

from __future__ import annotations

import numpy as np

from ..geodesy.conversions import geo_to_cart
from ..params.ellipsoids import GRS80


def synthetic_grid_network(rows: int, cols: int, spacing_deg: float = 0.05,
                           sd: float = 0.01, seed: int = 0,
                           lat0: float = -37.0, lon0: float = 143.0):
    """Returns (xyz (S,3) true coords, baselines list of (i, j),
    obs (Bn, 3) observed vectors, var (Bn,) per-component variance,
    x0 (S,3) perturbed initial coords)."""
    rng = np.random.default_rng(seed)
    S = rows * cols
    lat = np.radians(lat0 + spacing_deg * (np.arange(rows)))
    lon = np.radians(lon0 + spacing_deg * (np.arange(cols)))
    LA, LO = np.meshgrid(lat, lon, indexing="ij")
    h = 300.0 + 50.0 * rng.standard_normal(S)
    x, y, z = geo_to_cart(LA.ravel(), LO.ravel(), h, GRS80)
    xyz = np.stack([x, y, z], axis=-1)

    def sid(r, c):
        return r * cols + c

    pairs = []
    for r in range(rows):
        for c in range(cols):
            if c + 1 < cols:
                pairs.append((sid(r, c), sid(r, c + 1)))
            if r + 1 < rows:
                pairs.append((sid(r, c), sid(r + 1, c)))
            if r + 1 < rows and c + 1 < cols:
                pairs.append((sid(r, c), sid(r + 1, c + 1)))
    pairs = np.asarray(pairs, dtype=np.int64)

    vec_true = xyz[pairs[:, 1]] - xyz[pairs[:, 0]]
    obs = vec_true + sd * rng.standard_normal(vec_true.shape)
    var = np.full(len(pairs), sd * sd)

    x0 = xyz + 0.5 * rng.standard_normal(xyz.shape)

    # datum: pin a sprinkling of stations (the CCC-constraint analogue of a
    # national adjustment's ITRF fiducials); constrained stations start at
    # their true coordinates and carry near-infinite weight
    n_fix = max(4, S // 2000)
    fixed = np.linspace(0, S - 1, n_fix).astype(np.int64)
    x0[fixed] = xyz[fixed]
    return xyz, pairs, obs, var, x0, fixed


def grid_segmentation(rows: int, cols: int, block_rows: int, block_cols: int):
    """Partition the station grid into rectangular blocks.  Stations on
    internal block boundaries are junctions shared by adjacent blocks.

    Returns (blocks, junction_stations) where blocks is a list of
    (inner_idx, junction_idx) global station index arrays and
    junction_stations the sorted global junction set."""
    def sid(r, c):
        return r * cols + c

    brs = list(range(0, rows, block_rows))
    bcs = list(range(0, cols, block_cols))

    # junction rows/cols: the first row/col of each block after the first
    junc_rows = {r for r in brs if r != 0}
    junc_cols = {c for c in bcs if c != 0}

    junction = set()
    for r in range(rows):
        for c in range(cols):
            if r in junc_rows or c in junc_cols:
                junction.add(sid(r, c))

    blocks = []
    for r0 in brs:
        for c0 in bcs:
            r1 = min(r0 + block_rows, rows - 1) + (0 if r0 + block_rows >= rows else 0)
            inner, junc = [], []
            rmax = min(r0 + block_rows, rows)
            cmax = min(c0 + block_cols, cols)
            # include the boundary row/col of the NEXT block as junctions
            rhi = min(r0 + block_rows + 1, rows)
            chi = min(c0 + block_cols + 1, cols)
            for r in range(r0, rhi):
                for c in range(c0, chi):
                    s = sid(r, c)
                    if s in junction:
                        junc.append(s)
                    elif r < rmax and c < cmax:
                        inner.append(s)
            blocks.append((np.asarray(inner, dtype=np.int64),
                           np.asarray(sorted(junc), dtype=np.int64)))
    return blocks, np.asarray(sorted(junction), dtype=np.int64)


def grid_super_assignment(rows: int, cols: int, block_rows: int,
                          block_cols: int, super_rows: int = 4,
                          super_cols: int = 4):
    """Super-block id for each grid_segmentation block: tiles grouped into
    super-tiles of (super_rows x super_cols) tiles — the level-2 partition
    for the nested Schur solver."""
    tr = (rows + block_rows - 1) // block_rows
    tc = (cols + block_cols - 1) // block_cols
    stc = (tc + super_cols - 1) // super_cols
    out = []
    for r in range(tr):
        for c in range(tc):
            out.append((r // super_rows) * stc + (c // super_cols))
    return np.asarray(out, dtype=np.int32)
