"""Measurement compilation and design/normal-matrix assembly.

Converts parsed measurement records into 'work items', applies one-time
reductions (VCV scaling, deflection-of-the-vertical corrections, arc→chord
reductions), and fills the dense design matrix A, block-diagonal weight
matrix V⁻¹, and measured-minus-computed vector for each iteration.

The normals N = AᵀV⁻¹A and RHS are formed from these with batched matmuls
(device-side), rather than the reference's per-measurement scatter loops —
the TPU-native formulation of UpdateNormals_*/UpdateAtVinv.

Parity reference: dnaadjust.cpp UpdateDesignNormalMeasMatrices_* :3938-6566,
LoadVarianceMatrix_{D,G,X,Y} :4059-4679, AddMsrtoMeasMinusComp :4719.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..geodesy import measurements as gm
from ..geodesy.conversions import cart_to_geo, geo_to_cart
from ..geodesy.local_frame import (
    scale_gps_vcv, scale_gps_vcv_cluster, propagate_vcv_geo_to_cart,
)
from ..io_formats.dna import Measurement, GpsCluster, DirectionSet
from ..network.data import NetworkData
from .options import AdjustmentOptions

TWO_PI = 2.0 * np.pi
E4_SEC_DEFLECTION = 0.0001 * np.pi / 180.0 / 3600.0
_MIN_SCALE = 1.0e-5


@dataclass
class ScalarItem:
    """A scalar observation row (types A B C E H I J K L M P Q R S V Z,
    and each derived angle of a D set)."""
    mtype: str
    row: int                    # design row
    s1: int                     # station indices (bst order)
    s2: int = -1
    s3: int = -1
    term1: float = 0.0          # working (reduced) measurement
    pre_adj_meas: float = 0.0   # original measurement
    pre_adj_corr: float = 0.0   # applied reduction/deflection correction
    var: float = 0.0            # apriori variance (term2 analogue)
    inst_h: float = 0.0
    targ_h: float = 0.0
    ignore: bool = False
    # D-set context
    dirn_set: "DirnSetItem" = None
    angle_index: int = -1


@dataclass
class DirnSetItem:
    """A direction set reduced to (count-1) correlated angles."""
    row0: int
    angles: list = field(default_factory=list)      # list[ScalarItem]
    var_dirn: np.ndarray = None                     # (a, a) banded variance
    vinv: np.ndarray = None


@dataclass
class GpsItem:
    """A G/X/Y cluster: n vector observations with full 3n×3n VCV."""
    mtype: str
    row0: int
    stations1: list = field(default_factory=list)
    stations2: list = field(default_factory=list)   # empty for Y
    obs: np.ndarray = None                          # (3n,) stacked vectors
    pre_adj_meas: np.ndarray = None
    pre_adj_corr: np.ndarray = None                 # (n,) height reductions (Y LLH)
    vcv: np.ndarray = None                          # (3n, 3n) scaled VCV
    vinv: np.ndarray = None
    orig_coord_type: str = "XYZ"
    cluster_id: int = 0


class Assembler:
    """Builds and updates the dense adjustment matrices for one block
    (simultaneous mode: the whole network)."""

    def __init__(self, net: NetworkData, options: AdjustmentOptions,
                 station_subset=None, measurement_subset=None,
                 record_indices=None):
        """station_subset: ordered global station indices forming this
        block's parameter list (None = all stations, identity order).
        measurement_subset: the measurement records of this block."""
        self.net = net
        self.opts = options
        self.ell = net.datum.ellipsoid
        if station_subset is None:
            self.stations = list(range(net.nstations))
        else:
            self.stations = list(station_subset)
        self.local = {g: i for i, g in enumerate(self.stations)}
        self.records = (net.measurements if measurement_subset is None
                        else measurement_subset)
        self.record_indices = (record_indices if record_indices is not None
                               else list(range(len(self.records))))
        self.scalar_items: list[ScalarItem] = []
        self.dirn_sets: list[DirnSetItem] = []
        self.gps_items: list[GpsItem] = []
        self.item_order: list = []      # mixed, in file order for reporting
        self.nrows = 0
        self.has_non_gps = False
        self._compile()
        n = 3 * len(self.stations)
        self.A = np.zeros((self.nrows, n))
        self.mmc = np.zeros(self.nrows)
        self._built = False
        self._vector_plan = None
        # current geographic coordinates, refreshed from the estimates at
        # each fill (UpdateGeographicCoords, dnaadjust.cpp:8734) so
        # local-frame reductions and partials track the estimates
        self.cur_lat = net.lat.copy()
        self.cur_lon = net.lon.copy()
        self.cur_h = net.height.copy()

    def loc3(self, g: int) -> int:
        """Local parameter offset (3 * local index) of global station g."""
        return 3 * self.local[g]

    # ------------------------------------------------------------------
    # compile: one-time load, scaling, reduction bookkeeping
    # ------------------------------------------------------------------
    def _compile(self):
        net = self.net
        row = 0
        self.item_record_idx = []   # global record index per item_order entry
        for rec_i, rec in zip(self.record_indices, self.records):
            if isinstance(rec, GpsCluster):
                if rec.ignore:
                    continue
                item = self._compile_gps(rec, row)
                row += len(item.stations1) * 3
                self.gps_items.append(item)
                self.item_order.append(item)
                self.item_record_idx.append(rec_i)
            elif isinstance(rec, DirectionSet):
                if rec.ignore:
                    continue
                item = self._compile_dirnset(rec, row)
                if item is None:
                    continue
                row += len(item.angles)
                self.dirn_sets.append(item)
                self.item_order.append(item)
                self.item_record_idx.append(rec_i)
                self.has_non_gps = True
            elif isinstance(rec, Measurement):
                if rec.ignore:
                    continue
                item = ScalarItem(
                    mtype=rec.mtype, row=row,
                    s1=net.station_index(rec.first),
                    s2=net.station_index(rec.second) if rec.second else -1,
                    s3=net.station_index(rec.third) if rec.third else -1,
                    term1=rec.value, pre_adj_meas=rec.value,
                    var=rec.sd * rec.sd,
                    inst_h=rec.inst_height, targ_h=rec.targ_height)
                row += 1
                self.scalar_items.append(item)
                self.item_order.append(item)
                self.item_record_idx.append(rec_i)
                self.has_non_gps = True
        self.nrows = row

    def _gps_scaling(self, rec: GpsCluster):
        """LoadVarianceScaling parity (dnaadjust.cpp:4453-4491)."""
        vscale = rec.vscale if rec.vscale >= min(_MIN_SCALE, self.opts.fixed_std_dev) else 1.0
        pscale = rec.pscale if rec.pscale >= min(_MIN_SCALE, self.opts.fixed_std_dev) else 1.0
        lscale = rec.lscale if rec.lscale >= min(_MIN_SCALE, self.opts.fixed_std_dev) else 1.0
        hscale = rec.hscale if rec.hscale >= min(_MIN_SCALE, self.opts.fixed_std_dev) else 1.0
        scale_matrix = abs(vscale - 1.0) > _MIN_SCALE
        scale_partial = (abs(pscale - 1.0) > _MIN_SCALE or
                         abs(lscale - 1.0) > _MIN_SCALE or
                         abs(hscale - 1.0) > _MIN_SCALE)
        if scale_partial and scale_matrix:
            pscale *= vscale
            lscale *= vscale
            hscale *= vscale
        return vscale, pscale, lscale, hscale, scale_matrix, scale_partial

    def _compile_gps(self, rec: GpsCluster, row0: int) -> GpsItem:
        net = self.net
        n = len(rec.obs)
        vscale, pscale, lscale, hscale, scale_matrix, scale_partial = \
            self._gps_scaling(rec)

        item = GpsItem(mtype=rec.mtype, row0=row0,
                       orig_coord_type=rec.coord_type.upper(),
                       cluster_id=rec.cluster_id)
        V = np.zeros((3 * n, 3 * n))
        vecs = np.zeros(3 * n)
        pre_adj_corr = np.zeros(n)
        lats, lons, hts = [], [], []
        is_llh = rec.mtype == "Y" and rec.coord_type.upper().startswith("LL")
        for i, ob in enumerate(rec.obs):
            s1 = net.station_index(ob.first)
            item.stations1.append(s1)
            if rec.mtype != "Y":
                item.stations2.append(net.station_index(ob.second))
            lats.append(net.lat[s1])
            lons.append(net.lon[s1])
            hts.append(net.height[s1])
            vec = np.asarray(ob.vec, dtype=np.float64)
            if is_llh:
                # reduce orthometric height to ellipsoidal (LLH only, not LLh)
                eh = vec[2]
                if rec.coord_type == "LLH" and abs(net.geoid_sep[s1]) > 1e-4:
                    pre_adj_corr[i] = net.geoid_sep[s1]
                    eh = eh + pre_adj_corr[i]
                x, y, z = geo_to_cart(vec[0], vec[1], eh, self.ell)
                vec = np.array([float(x), float(y), float(z)])
            vecs[3 * i:3 * i + 3] = vec
            V[3 * i:3 * i + 3, 3 * i:3 * i + 3] = ob.vcv
            for j, C in enumerate(ob.covs):
                c0 = 3 * (i + 1 + j)
                V[3 * i:3 * i + 3, c0:c0 + 3] = C
                V[c0:c0 + 3, 3 * i:3 * i + 3] = C.T

        # scaling / propagation to cartesian, parity with
        # LoadVarianceMatrix_G/X/Y
        if rec.mtype in ("G", "X"):
            if scale_matrix:
                V = V * vscale
            if scale_partial:
                if n == 1:
                    V = scale_gps_vcv(V, lats[0], lons[0], hts[0],
                                      pscale, lscale, hscale, self.ell)
                else:
                    V = scale_gps_vcv_cluster(V, lats, lons, hts,
                                              pscale, lscale, hscale, self.ell)
        else:   # Y
            if scale_partial:
                V = scale_gps_vcv_cluster(
                    V, lats, lons, hts, pscale, lscale, hscale, self.ell,
                    already_geographic=is_llh)
            elif is_llh:
                V = propagate_vcv_geo_to_cart(V, lats, lons, hts, self.ell)
            if scale_matrix and not scale_partial:
                V = V * vscale

        item.obs = vecs
        item.pre_adj_meas = vecs.copy()
        item.pre_adj_corr = pre_adj_corr
        item.vcv = V
        item.vinv = np.linalg.inv(V)
        return item

    def _compile_dirnset(self, rec: DirectionSet, row0: int):
        net = self.net
        kept = [(t, v, sd) for (t, v, sd, ign) in rec.directions if not ign]
        if not kept:
            return None
        item = DirnSetItem(row0=row0)
        s1 = net.station_index(rec.first)
        prev_val = rec.ro_value
        prev_var = rec.ro_sd * rec.ro_sd
        prev_target = net.station_index(rec.ro)
        a = len(kept)
        var_dirn = np.zeros((a, a))
        for i, (target, val, sd) in enumerate(kept):
            angle = val - prev_val
            if angle < 0:
                angle += TWO_PI
            if angle > TWO_PI:
                angle -= TWO_PI
            var = sd * sd
            si = ScalarItem(
                mtype="D", row=row0 + i, s1=s1, s2=prev_target,
                s3=net.station_index(target),
                term1=angle, pre_adj_meas=angle, var=prev_var + var,
                dirn_set=item, angle_index=i)
            item.angles.append(si)
            var_dirn[i, i] = prev_var + var
            if i + 1 < a:
                var_dirn[i, i + 1] = var_dirn[i + 1, i] = var
            prev_val, prev_var, prev_target = val, var, \
                net.station_index(target)
        item.var_dirn = var_dirn
        item.vinv = np.linalg.inv(var_dirn)
        return item

    # ------------------------------------------------------------------
    # fill: per-iteration computation of A and measured-minus-computed
    # ------------------------------------------------------------------
    def fill(self, est: np.ndarray, apply_reductions: bool = False):
        """est: (3S,) estimated cartesian station coordinates.

        apply_reductions=True on the first call applies one-time deflection
        corrections (mutating term1) as PrepareAdjustment does."""
        A, mmc = self.A, self.mmc
        rebuild_design = self.has_non_gps or not self._built
        # the reference restores term1 from preAdjMeas and re-reduces on
        # every matrix rebuild (InitialiseMeasurement dnaadjust.cpp:3913,
        # bms_meta_.reduced :373), so deflection corrections track the
        # current estimates; reduction branches below are reset-style
        apply_reductions = apply_reductions or (self.has_non_gps and
                                                self._built)
        if rebuild_design:
            A[:] = 0.0
        if self.has_non_gps and self._built:
            from ..geodesy.conversions import cart_to_geo
            idx = np.asarray(self.stations, dtype=np.int64)
            l = 3 * np.arange(len(idx))
            la, lo, h = cart_to_geo(est[l], est[l + 1], est[l + 2],
                                    self.ell)
            self.cur_lat[idx] = la
            self.cur_lon[idx] = lo
            self.cur_h[idx] = h

        if self.scalar_items or self.dirn_sets:
            if self._vector_plan is None:
                from .vector_fill import VectorPlan
                self._vector_plan = VectorPlan(self)
            self._vector_plan.fill(est, apply_reductions)
        if rebuild_design:
            # GPS design entries are constant (±1) but must be rewritten
            # whenever the design matrix is re-zeroed for relinearisation
            for g in self.gps_items:
                self._fill_gps_design(g)
        self._fill_gps_mmc_all(est)
        self._built = True

    def _compile_gps_plan(self):
        """Vectorised GPS mmc plan: flat arrays over every observation row
        of every cluster (the per-iteration hot loop at national scale —
        the reference multithreads this, PrepareAdjustmentMultiThread)."""
        rows, l1s, l2s, obs = [], [], [], []
        for g in self.gps_items:
            for i, s1 in enumerate(g.stations1):
                rows.append(g.row0 + 3 * i)
                l1s.append(self.loc3(s1))
                l2s.append(self.loc3(g.stations2[i])
                           if g.mtype != "Y" else -1)
                obs.append(g.obs[3 * i:3 * i + 3])
        self._gps_rows = np.asarray(rows, dtype=np.int64)
        self._gps_l1 = np.asarray(l1s, dtype=np.int64)
        self._gps_l2 = np.asarray(l2s, dtype=np.int64)
        self._gps_obs = (np.asarray(obs) if obs
                         else np.zeros((0, 3)))

    def _fill_gps_mmc_all(self, est):
        if not hasattr(self, "_gps_rows"):
            self._compile_gps_plan()
        if not len(self._gps_rows):
            return
        r = self._gps_rows
        l1 = self._gps_l1
        l2 = self._gps_l2
        off = np.arange(3)
        p1 = est[l1[:, None] + off]                     # (M, 3)
        comp = np.where((l2 >= 0)[:, None],
                        est[np.maximum(l2, 0)[:, None] + off] - p1, p1)
        self.mmc[(r[:, None] + off).reshape(-1)] = \
            (self._gps_obs - comp).reshape(-1)

    # -- GPS ------------------------------------------------------------
    def _fill_gps_design(self, g: GpsItem):
        A = self.A
        for i, s1 in enumerate(g.stations1):
            r = g.row0 + 3 * i
            l1 = self.loc3(s1)
            if g.mtype == "Y":
                for k in range(3):
                    A[r + k, l1 + k] = 1.0
            else:
                l2 = self.loc3(g.stations2[i])
                for k in range(3):
                    A[r + k, l1 + k] = -1.0
                    A[r + k, l2 + k] = 1.0


    def _fill_scalar(self, it: ScalarItem, est, apply_reductions):
        net, ell = self.net, self.ell
        s1 = it.s1
        l1 = self.loc3(s1)
        x1, y1, z1 = est[l1], est[l1 + 1], est[l1 + 2]
        lat1, lon1 = self.cur_lat[s1], self.cur_lon[s1]
        A, row = self.A, it.row
        t = it.mtype

        if t in ("A", "D"):
            self._fill_angle(it, est, apply_reductions)
            return
        if t in ("B", "K"):
            self._fill_azimuth(it, est, apply_reductions)
            return
        if t in ("C", "E", "M"):
            self._fill_chord(it, est, apply_reductions)
            return
        if t == "S":
            l2 = self.loc3(it.s2)
            x2, y2, z2 = est[l2], est[l2 + 1], est[l2 + 2]
            comp, dx, dy, dz = gm.slope_distance(
                x1, y1, z1, x2, y2, z2, lat1, lon1, it.inst_h, it.targ_h)
            self._mmc(it, comp)
            self._design2(row, it.s1, it.s2, -dx / comp, -dy / comp,
                          -dz / comp)
            return
        if t in ("V", "Z"):
            self._fill_vertical(it, est, apply_reductions)
            return
        if t == "L":
            self._fill_leveldiff(it, est, apply_reductions)
            return
        if t in ("H", "R"):
            self._fill_height(it, est, apply_reductions)
            return
        if t in ("I", "P"):
            self._fill_latitude(it, est, apply_reductions)
            return
        if t in ("J", "Q"):
            self._fill_longitude(it, est, apply_reductions)
            return
        raise ValueError(f"unhandled scalar type {t}")

    def _mmc(self, it: ScalarItem, comp):
        d = it.term1 - comp
        if it.mtype in ("A", "B", "D", "K"):
            if d < -5.5:
                d += TWO_PI
            elif d > 5.5:
                d -= TWO_PI
        self.mmc[it.row] = d

    def _design2(self, row, s1, s2, dx, dy, dz):
        A = self.A
        l1, l2 = self.loc3(s1), self.loc3(s2)
        A[row, l1:l1 + 3] = (dx, dy, dz)
        A[row, l2:l2 + 3] = (-dx, -dy, -dz)

    def _has_deflections(self, s):
        return (abs(self.net.vertical_def[s]) > E4_SEC_DEFLECTION or
                abs(self.net.meridian_def[s]) > E4_SEC_DEFLECTION)

    def _fill_angle(self, it: ScalarItem, est, apply_reductions):
        net = self.net
        s1, s2, s3 = it.s1, it.s2, it.s3
        l1, l2, l3 = self.loc3(s1), self.loc3(s2), self.loc3(s3)
        lat1, lon1 = self.cur_lat[s1], self.cur_lon[s1]
        p1 = est[l1:l1 + 3]
        p2 = est[l2:l2 + 3]
        p3 = est[l3:l3 + 3]
        comp, d12, d13, e12, n12, e13, n13 = gm.horizontal_angle(
            *p1, *p2, *p3, lat1, lon1)

        if apply_reductions:
            if self._has_deflections(s1):
                zen12 = gm.zenith_distance(*p1, *p2, lat1, lon1,
                                           self.cur_lat[s2], self.cur_lon[s2],
                                           it.inst_h, it.targ_h)[0]
                zen13 = gm.zenith_distance(*p1, *p3, lat1, lon1,
                                           self.cur_lat[s3], self.cur_lon[s3],
                                           it.inst_h, it.targ_h)[0]
                it.pre_adj_corr = gm.hz_angle_deflection_correction(
                    d12, zen12, d13, zen13,
                    net.vertical_def[s1], net.meridian_def[s1])
            else:
                it.pre_adj_corr = 0.0
            it.term1 = it.pre_adj_meas - it.pre_adj_corr

        self._mmc(it, comp)

        cl, sl = np.cos(lat1), np.sin(lat1)
        co, so = np.cos(lon1), np.sin(lon1)
        slco, slso = sl * co, sl * so
        c12 = np.cos(d12) ** 2 / (n12 * n12)
        c13 = np.cos(d13) ** 2 / (n13 * n13)
        A, row = self.A, it.row
        A[row, l1] = (c13 * (n13 * so - e13 * slco) -
                      c12 * (n12 * so - e12 * slco))
        A[row, l1 + 1] = (c13 * (-n13 * co - e13 * slso) -
                          c12 * (-n12 * co - e12 * slso))
        A[row, l1 + 2] = c13 * e13 * cl - c12 * e12 * cl
        A[row, l2] = c12 * (n12 * so - e12 * slco)
        A[row, l2 + 1] = c12 * (-n12 * co - e12 * slso)
        A[row, l2 + 2] = c12 * e12 * cl
        A[row, l3] = -c13 * (n13 * so - e13 * slco)
        A[row, l3 + 1] = -c13 * (-n13 * co - e13 * slso)
        A[row, l3 + 2] = -c13 * e13 * cl

    def _fill_azimuth(self, it: ScalarItem, est, apply_reductions):
        net = self.net
        s1, s2 = it.s1, it.s2
        l1, l2 = self.loc3(s1), self.loc3(s2)
        lat1, lon1 = self.cur_lat[s1], self.cur_lon[s1]
        p1 = est[l1:l1 + 3]
        p2 = est[l2:l2 + 3]
        comp, e12, n12 = gm.direction(*p1, *p2, lat1, lon1)

        if apply_reductions:
            if it.mtype == "K" and self._has_deflections(s1):
                zen = gm.zenith_distance(*p1, *p2, lat1, lon1,
                                         self.cur_lat[s2], self.cur_lon[s2],
                                         it.inst_h, it.targ_h)[0]
                it.pre_adj_corr = gm.laplace_correction(
                    comp, zen, net.vertical_def[s1], net.meridian_def[s1],
                    lat1)
            else:
                it.pre_adj_corr = 0.0
            it.term1 = it.pre_adj_meas - it.pre_adj_corr

        self._mmc(it, comp)
        cl, sl = np.cos(lat1), np.sin(lat1)
        co, so = np.cos(lon1), np.sin(lon1)
        c12 = np.cos(comp) ** 2 / (n12 * n12)
        self._design2(it.row, s1, s2,
                      c12 * (n12 * so - e12 * sl * co),
                      c12 * (-n12 * co - e12 * sl * so),
                      c12 * e12 * cl)

    def _fill_chord(self, it: ScalarItem, est, apply_reductions):
        net, ell = self.net, self.ell
        s1, s2 = it.s1, it.s2
        l1, l2 = self.loc3(s1), self.loc3(s2)
        p1 = est[l1:l1 + 3]
        p2 = est[l2:l2 + 3]
        lat1, lon1, lat2 = self.cur_lat[s1], self.cur_lon[s1], self.cur_lat[s2]

        # E and M reduce the (original) arc to a chord on EVERY fill
        # (dnaadjust.cpp:5257-5276, 5412-5423)
        if it.mtype == "E":
            it.term1 = gm.ellipsoid_arc_to_chord(
                it.pre_adj_meas, *p1, *p2, lat1, lon1, lat2, ell)
            it.pre_adj_corr = it.term1 - it.pre_adj_meas
        elif it.mtype == "M":
            it.term1 = gm.msl_arc_to_ellipsoid_chord(
                it.pre_adj_meas, lat1, lat2,
                net.geoid_sep[s1], net.geoid_sep[s2], ell)
            it.pre_adj_corr = it.term1 - it.pre_adj_meas
        else:
            it.pre_adj_corr = 0.0

        comp, dx, dy, dz = gm.ellipsoid_chord_distance(
            *p1, *p2, lat1, lat2, self.cur_h[s1], self.cur_h[s2], ell)
        self._mmc(it, comp)
        self._design2(it.row, s1, s2, -dx / comp, -dy / comp, -dz / comp)

    def _fill_vertical(self, it: ScalarItem, est, apply_reductions):
        net = self.net
        s1, s2 = it.s1, it.s2
        l1, l2 = self.loc3(s1), self.loc3(s2)
        lat1, lon1 = self.cur_lat[s1], self.cur_lon[s1]
        p1 = est[l1:l1 + 3]
        p2 = est[l2:l2 + 3]

        if apply_reductions:
            if self._has_deflections(s1):
                az = gm.direction(*p1, *p2, lat1, lon1)[0]
                it.pre_adj_corr = gm.zenith_deflection_correction(
                    az, net.vertical_def[s1], net.meridian_def[s1])
            else:
                it.pre_adj_corr = 0.0
            if it.mtype == "V":
                it.term1 = it.pre_adj_meas + it.pre_adj_corr
            else:   # Z
                it.term1 = it.pre_adj_meas - it.pre_adj_corr

        if it.mtype == "V":
            comp, e, n, up = gm.zenith_distance(
                *p1, *p2, lat1, lon1, self.cur_lat[s2], self.cur_lon[s2],
                it.inst_h, it.targ_h)
        else:
            comp, e, n, up = gm.vertical_angle(
                *p1, *p2, lat1, lon1, self.cur_lat[s2], self.cur_lon[s2],
                it.inst_h, it.targ_h)
        self._mmc(it, comp)

        e2n2 = e * e + n * n
        sq = np.sqrt(e2n2)
        cos2v = np.cos(comp) ** 2
        cl, sl = np.cos(lat1), np.sin(lat1)
        co, so = np.cos(lon1), np.sin(lon1)
        if it.mtype == "V":
            se_up2 = sq / (up * up)
            up_se = up * sq
            self._design2(
                it.row, s1, s2,
                cos2v * (((e * so + n * sl * co) / up_se) + cl * co * se_up2),
                cos2v * (((-e * co + n * sl * so) / up_se) + cl * so * se_up2),
                cos2v * ((-n * cl / up_se) + sl * se_up2))
        else:
            se_d = sq / e2n2
            up_d = up / (sq * e2n2)
            self._design2(
                it.row, s1, s2,
                cos2v * ((-cl * co * se_d) - ((e * so + n * sl * co) * up_d)),
                cos2v * ((-cl * so * se_d) + ((e * co - n * sl * so) * up_d)),
                cos2v * ((-sl * se_d) + (n * cl * up_d)))

    def _fill_leveldiff(self, it: ScalarItem, est, apply_reductions):
        net, ell = self.net, self.ell
        s1, s2 = it.s1, it.s2
        l1, l2 = self.loc3(s1), self.loc3(s2)
        p1 = est[l1:l1 + 3]
        p2 = est[l2:l2 + 3]
        h1, nu1, zn1 = gm.ellipsoid_height(*p1, self.cur_lat[s1], ell)
        h2, nu2, zn2 = gm.ellipsoid_height(*p2, self.cur_lat[s2], ell)
        comp = h2 - h1

        if apply_reductions:
            if (abs(net.geoid_sep[s1]) > 1e-4 or
                    abs(net.geoid_sep[s2]) > 1e-4):
                it.pre_adj_corr = net.geoid_sep[s2] - net.geoid_sep[s1]
            else:
                it.pre_adj_corr = 0.0
            it.term1 = it.pre_adj_meas + it.pre_adj_corr

        self._mmc(it, comp)
        A, row = self.A, it.row
        A[row, l1:l1 + 3] = (-p1[0] / (nu1 + h1),
                             -p1[1] / (nu1 + h1),
                             -(p1[2] + zn1) / (nu1 + h1))
        A[row, l2:l2 + 3] = (p2[0] / (nu2 + h2),
                             p2[1] / (nu2 + h2),
                             (p2[2] + zn2) / (nu2 + h2))

    def _fill_height(self, it: ScalarItem, est, apply_reductions):
        net, ell = self.net, self.ell
        s1 = it.s1
        l1 = self.loc3(s1)
        p1 = est[l1:l1 + 3]

        if apply_reductions:
            if it.mtype == "H" and abs(net.geoid_sep[s1]) > 1e-4:
                it.pre_adj_corr = net.geoid_sep[s1]
            else:
                it.pre_adj_corr = 0.0
            it.term1 = it.pre_adj_meas + it.pre_adj_corr

        comp, nu1, zn1 = gm.ellipsoid_height(*p1, self.cur_lat[s1], ell)
        self._mmc(it, comp)
        A, row = self.A, it.row
        A[row, l1:l1 + 3] = (p1[0] / (nu1 + comp),
                             p1[1] / (nu1 + comp),
                             (p1[2] + zn1) / (nu1 + comp))

    def _fill_latitude(self, it: ScalarItem, est, apply_reductions):
        net, ell = self.net, self.ell
        s1 = it.s1
        l1 = self.loc3(s1)
        p1 = est[l1:l1 + 3]

        if apply_reductions:
            if it.mtype == "I" and \
                    abs(net.meridian_def[s1]) > E4_SEC_DEFLECTION:
                it.pre_adj_corr = net.meridian_def[s1]
            else:
                it.pre_adj_corr = 0.0
            it.term1 = it.pre_adj_meas - it.pre_adj_corr

        # mechanical differentiation with 1e-4 increments
        # (PartialD_Latitude, dnatemplategeodesyfuncs.hpp:281-320)
        inc = 1.0e-4
        lat0 = float(cart_to_geo(p1[0], p1[1], p1[2], ell)[0])
        A, row = self.A, it.row
        for k in range(3):
            q = p1.copy()
            q[k] += inc
            A[row, l1 + k] = \
                (float(cart_to_geo(q[0], q[1], q[2], ell)[0]) - lat0) / inc
        self._mmc(it, lat0)

    def _fill_longitude(self, it: ScalarItem, est, apply_reductions):
        net = self.net
        s1 = it.s1
        l1 = self.loc3(s1)
        p1 = est[l1:l1 + 3]
        lon1 = self.cur_lon[s1]

        if apply_reductions:
            if it.mtype == "J" and \
                    abs(net.vertical_def[s1]) > E4_SEC_DEFLECTION:
                it.pre_adj_corr = net.vertical_def[s1] / \
                    np.cos(self.cur_lat[s1])
            else:
                it.pre_adj_corr = 0.0
            it.term1 = it.pre_adj_meas - it.pre_adj_corr

        self._mmc(it, lon1)
        t = p1[0] * p1[1] / (p1[0] ** 2 + p1[1] ** 2) ** 1.5
        A, row = self.A, it.row
        A[row, l1] = t * -1.0 / np.cos(lon1)
        A[row, l1 + 1] = t / np.sin(lon1)
        A[row, l1 + 2] = 0.0

    # ------------------------------------------------------------------
    # block-diagonal weight application
    # ------------------------------------------------------------------
    def weight_blocks(self):
        """Yield (row0, Vinv) blocks covering all design rows."""
        for it in self.scalar_items:
            yield it.row, np.array([[1.0 / it.var]])
        for ds in self.dirn_sets:
            yield ds.row0, ds.vinv
        for g in self.gps_items:
            yield g.row0, g.vinv

    def _compile_weight_plan(self):
        """Columnar weight-application plan: scalar rows carry a diagonal
        1/var vector; direction sets and GPS clusters are bucketed by
        V⁻¹ block size into batched (m, k, k) stacks so AᵀV⁻¹ is a few
        batched matmuls instead of a per-measurement Python loop (the
        vectorised UpdateAtVinv, dnaadjust.cpp:1285-1833)."""
        ns = len(self.scalar_items)
        self._w_rows = np.fromiter((it.row for it in self.scalar_items),
                                   np.int64, ns)
        self._w_diag = np.fromiter((1.0 / it.var for it in
                                    self.scalar_items), np.float64, ns)
        buckets = {}
        for obj in list(self.dirn_sets) + list(self.gps_items):
            V = obj.vinv
            b = buckets.setdefault(V.shape[0], ([], []))
            b[0].append(obj.row0)
            b[1].append(V)
        # store Vᵀ stacks: AtVinv columns are A_blkᵀ @ V, i.e. the rows of
        # the transposed product Vᵀ @ A_blk — identical values to the
        # per-block loop (V is an inverse of a symmetric matrix, which is
        # only symmetric to roundoff, so the transpose matters for exact
        # parity)
        self._w_buckets = [
            (np.asarray(r0s, dtype=np.int64),
             np.ascontiguousarray(np.stack(Vs).transpose(0, 2, 1)))
            for r0s, Vs in buckets.values()]

    def atvinv(self) -> np.ndarray:
        """AᵀV⁻¹ (n, nrows), built with batched matmuls (see
        _compile_weight_plan).  The returned array is a transposed view
        of a row-major (nrows, n) buffer."""
        if not hasattr(self, "_w_rows"):
            self._compile_weight_plan()
        A = self.A
        VAT = np.empty_like(A)
        if len(self._w_rows):
            VAT[self._w_rows] = A[self._w_rows] * self._w_diag[:, None]
        for r0s, VT in self._w_buckets:
            k = VT.shape[1]
            idx = r0s[:, None] + np.arange(k)
            VAT[idx] = VT @ A[idx]
        return VAT.T

    def build_vinv(self) -> np.ndarray:
        Vinv = np.zeros((self.nrows, self.nrows))
        for r0, blk in self.weight_blocks():
            k = blk.shape[0]
            Vinv[r0:r0 + k, r0:r0 + k] = blk
        return Vinv

    def constraint_weights(self) -> np.ndarray:
        """Per-station 3x3 inverse-variance constraint blocks added to the
        normals (AddConstraintStationstoNormalsSimultaneous parity)."""
        from ..geodesy.local_frame import propagate_variance_local_cart
        net = self.net
        var_c = self.opts.fixed_std_dev ** 2
        var_f = self.opts.free_std_dev ** 2
        W = np.zeros((len(self.stations), 3, 3))
        for li, i in enumerate(self.stations):
            cc = (net.constraints[i] + "FFF")[:3]
            if cc == "CCC":
                W[li] = np.eye(3) / var_c
            elif cc == "FFF":
                W[li] = np.eye(3) / var_f
            else:
                # mixed: variance formed in local frame then propagated
                # (FormConstraintStationVarianceMatrix, dnaadjust.cpp:2041)
                v = np.zeros((3, 3))
                geographic = net.coord_types[i].startswith("LL")
                # local frame order (e, n, up): for geographic input the
                # first constraint element is latitude (north, index 1)
                i0, i1 = (1, 0) if geographic else (0, 1)
                v[i0, i0] = var_f if cc[0] == "F" else var_c
                v[i1, i1] = var_f if cc[1] == "F" else var_c
                v[2, 2] = var_f if cc[2] == "F" else var_c
                # invert in the local frame (exact diagonal reciprocal)
                # and rotate: R diag(1/v) Rᵀ == inv(R diag(v) Rᵀ) for the
                # orthogonal rotation, without the catastrophic loss of
                # symmetry a numerical inverse suffers at the mixed
                # constraint's 1e14 condition number
                winv = np.diag(1.0 / np.diag(v))
                if net.coord_types[i] == "XYZ":
                    W[li] = winv
                else:
                    W[li] = propagate_variance_local_cart(
                        winv, net.lat[i], net.lon[i])
        return W

    def unknown_params(self) -> int:
        n = 3 * len(self.stations)
        for i in self.stations:
            for c in (self.net.constraints[i] + "FFF")[:3]:
                if c == "C":
                    n -= 1
        return n

    def measurement_count(self) -> int:
        return self.nrows
