"""Vectorised per-iteration design/mmc fill for all scalar measurement
types — the 20-type assembly path without per-measurement Python.

The reference re-linearises every iteration with multithreaded
per-measurement loops (UpdateDesignNormalMeasMatrices_*,
dnaadjust.hpp:572-757; UpdateNormals_*/UpdateAtVinv, dnaadjust.cpp:
1285-1833).  Here the Assembler's compiled work items are bucketed once by
kernel family (angles A/D, azimuths B/K, chords C/E/M, slope S, verticals
V/Z, level L, heights H/R, latitudes I/P, longitudes J/Q) into flat index
arrays, and each fill computes every row of the bucket with columnar numpy
over the geodesy kernels (geodesy/measurements.py — written branch-free so
the same code vectorises and JAX-traces).

Numeric parity: every expression replicates the scalar fill's operation
order exactly (same intermediates, same np ops), so the vectorised A/mmc
are bit-identical to the per-item path — tests/test_vector_fill.py proves
it on the urban (all-terrestrial-types) and gnss sample networks.

Reductions (deflections of the vertical, arc→chord, geoid separations)
follow the reference's reset-style semantics: term1 is recomputed from
pre_adj_meas on every rebuild (InitialiseMeasurement, dnaadjust.cpp:3913),
tracked here in bucket arrays; sync_items() writes them back to the work
items before reporting/statistics.
"""

from __future__ import annotations

import numpy as np

from ..geodesy import measurements as gm
from ..geodesy.conversions import cart_to_geo

TWO_PI = 2.0 * np.pi
E4_SEC_DEFLECTION = 0.0001 * np.pi / 180.0 / 3600.0


class _Bucket:
    """Columnar arrays for one kernel family."""

    __slots__ = ("items", "row", "s1", "s2", "s3", "l1", "l2", "l3",
                 "inst_h", "targ_h", "pre_adj_meas", "term1",
                 "pre_adj_corr", "flag", "defl_mask", "static_corr")

    def __init__(self, items, local, extra_flag=None):
        self.items = items
        n = len(items)
        self.row = np.fromiter((it.row for it in items), np.int64, n)
        self.s1 = np.fromiter((it.s1 for it in items), np.int64, n)
        self.s2 = np.fromiter((it.s2 for it in items), np.int64, n)
        self.s3 = np.fromiter((it.s3 for it in items), np.int64, n)
        self.l1 = np.fromiter((3 * local[it.s1] for it in items),
                              np.int64, n)
        self.l2 = np.fromiter(
            (3 * local[it.s2] if it.s2 >= 0 else -1 for it in items),
            np.int64, n)
        self.l3 = np.fromiter(
            (3 * local[it.s3] if it.s3 >= 0 else -1 for it in items),
            np.int64, n)
        self.inst_h = np.fromiter((it.inst_h for it in items), np.float64, n)
        self.targ_h = np.fromiter((it.targ_h for it in items), np.float64, n)
        self.pre_adj_meas = np.fromiter((it.pre_adj_meas for it in items),
                                        np.float64, n)
        self.term1 = np.fromiter((it.term1 for it in items), np.float64, n)
        self.pre_adj_corr = np.zeros(n)
        if extra_flag is not None:
            self.flag = np.fromiter((extra_flag(it) for it in items),
                                    np.bool_, n)
        else:
            self.flag = None
        self.defl_mask = None
        self.static_corr = None

    def __len__(self):
        return len(self.items)

    def sync(self):
        for i, it in enumerate(self.items):
            it.term1 = self.term1[i]
            it.pre_adj_corr = self.pre_adj_corr[i]


def _gather3(est, l):
    """(n, 3) coordinate triplets at parameter offsets l."""
    return est[l[:, None] + np.arange(3)]


def _wrap_mmc(term1, comp):
    d = term1 - comp
    d = np.where(d < -5.5, d + TWO_PI, d)
    return np.where(d > 5.5, d - TWO_PI, d)


class VectorPlan:
    """Bucketed vectorised fill over an Assembler's compiled items."""

    def __init__(self, asm):
        self.asm = asm
        net = asm.net
        by = {k: [] for k in ("ANG", "AZ", "CH", "S", "VZ", "L",
                              "HR", "IP", "JQ")}
        fam = {"A": "ANG", "D": "ANG", "B": "AZ", "K": "AZ", "C": "CH",
               "E": "CH", "M": "CH", "S": "S", "V": "VZ", "Z": "VZ",
               "L": "L", "H": "HR", "R": "HR", "I": "IP", "P": "IP",
               "J": "JQ", "Q": "JQ"}
        items = list(asm.scalar_items)
        for ds in asm.dirn_sets:
            items.extend(ds.angles)
        for it in items:
            by[fam[it.mtype]].append(it)

        flags = {"CH": lambda it: it.mtype == "E",
                 "AZ": lambda it: it.mtype == "K",
                 "VZ": lambda it: it.mtype == "V",
                 "HR": lambda it: it.mtype == "H",
                 "IP": lambda it: it.mtype == "I",
                 "JQ": lambda it: it.mtype == "J"}
        self.b = {k: _Bucket(v, asm.local, flags.get(k))
                  for k, v in by.items() if v}
        ch = self.b.get("CH")
        if ch is not None:
            ch.static_corr = np.fromiter(
                (it.mtype == "M" for it in ch.items), np.bool_, len(ch))

        # static deflection masks / corrections
        vd, md, gs = net.vertical_def, net.meridian_def, net.geoid_sep
        has_defl = (np.abs(vd) > E4_SEC_DEFLECTION) | \
                   (np.abs(md) > E4_SEC_DEFLECTION)
        for k in ("ANG", "AZ", "VZ"):
            bk = self.b.get(k)
            if bk is not None:
                bk.defl_mask = has_defl[bk.s1]
        lb = self.b.get("L")
        if lb is not None:
            m = (np.abs(gs[lb.s1]) > 1e-4) | (np.abs(gs[lb.s2]) > 1e-4)
            lb.static_corr = np.where(m, gs[lb.s2] - gs[lb.s1], 0.0)
        hb = self.b.get("HR")
        if hb is not None:
            m = hb.flag & (np.abs(gs[hb.s1]) > 1e-4)
            hb.static_corr = np.where(m, gs[hb.s1], 0.0)
        ib = self.b.get("IP")
        if ib is not None:
            m = ib.flag & (np.abs(md[ib.s1]) > E4_SEC_DEFLECTION)
            ib.static_corr = np.where(m, md[ib.s1], 0.0)

    def sync_items(self):
        for bk in self.b.values():
            bk.sync()

    # ------------------------------------------------------------------
    def fill(self, est, apply_reductions):
        asm = self.asm
        A, mmc = asm.A, asm.mmc
        net, ell = asm.net, asm.ell
        cl_, cln_, ch_ = asm.cur_lat, asm.cur_lon, asm.cur_h
        off = np.arange(3)

        def scat(rows, l, vals3):
            """A[rows, l:l+3] = vals3 (vals3: (n,3))."""
            A[rows[:, None], l[:, None] + off] = vals3

        bk = self.b.get("ANG")
        if bk is not None:
            p1 = _gather3(est, bk.l1)
            p2 = _gather3(est, bk.l2)
            p3 = _gather3(est, bk.l3)
            lat1, lon1 = cl_[bk.s1], cln_[bk.s1]
            comp, d12, d13, e12, n12, e13, n13 = gm.horizontal_angle(
                p1[:, 0], p1[:, 1], p1[:, 2], p2[:, 0], p2[:, 1], p2[:, 2],
                p3[:, 0], p3[:, 1], p3[:, 2], lat1, lon1)
            if apply_reductions:
                zen12 = gm.zenith_distance(
                    p1[:, 0], p1[:, 1], p1[:, 2], p2[:, 0], p2[:, 1],
                    p2[:, 2], lat1, lon1, cl_[bk.s2], cln_[bk.s2],
                    bk.inst_h, bk.targ_h)[0]
                zen13 = gm.zenith_distance(
                    p1[:, 0], p1[:, 1], p1[:, 2], p3[:, 0], p3[:, 1],
                    p3[:, 2], lat1, lon1, cl_[bk.s3], cln_[bk.s3],
                    bk.inst_h, bk.targ_h)[0]
                corr = gm.hz_angle_deflection_correction(
                    d12, zen12, d13, zen13, net.vertical_def[bk.s1],
                    net.meridian_def[bk.s1])
                bk.pre_adj_corr = np.where(bk.defl_mask, corr, 0.0)
                bk.term1 = bk.pre_adj_meas - bk.pre_adj_corr
            mmc[bk.row] = _wrap_mmc(bk.term1, comp)
            cl, sl = np.cos(lat1), np.sin(lat1)
            co, so = np.cos(lon1), np.sin(lon1)
            slco, slso = sl * co, sl * so
            c12 = np.cos(d12) ** 2 / (n12 * n12)
            c13 = np.cos(d13) ** 2 / (n13 * n13)
            scat(bk.row, bk.l1, np.stack([
                c13 * (n13 * so - e13 * slco) - c12 * (n12 * so - e12 * slco),
                c13 * (-n13 * co - e13 * slso) -
                c12 * (-n12 * co - e12 * slso),
                c13 * e13 * cl - c12 * e12 * cl], axis=-1))
            scat(bk.row, bk.l2, np.stack([
                c12 * (n12 * so - e12 * slco),
                c12 * (-n12 * co - e12 * slso),
                c12 * e12 * cl], axis=-1))
            scat(bk.row, bk.l3, np.stack([
                -c13 * (n13 * so - e13 * slco),
                -c13 * (-n13 * co - e13 * slso),
                -c13 * e13 * cl], axis=-1))

        bk = self.b.get("AZ")
        if bk is not None:
            p1 = _gather3(est, bk.l1)
            p2 = _gather3(est, bk.l2)
            lat1, lon1 = cl_[bk.s1], cln_[bk.s1]
            comp, e12, n12 = gm.direction(
                p1[:, 0], p1[:, 1], p1[:, 2], p2[:, 0], p2[:, 1], p2[:, 2],
                lat1, lon1)
            if apply_reductions:
                m = bk.flag & bk.defl_mask
                zen = gm.zenith_distance(
                    p1[:, 0], p1[:, 1], p1[:, 2], p2[:, 0], p2[:, 1],
                    p2[:, 2], lat1, lon1, cl_[bk.s2], cln_[bk.s2],
                    bk.inst_h, bk.targ_h)[0]
                corr = gm.laplace_correction(
                    comp, zen, net.vertical_def[bk.s1],
                    net.meridian_def[bk.s1], lat1)
                bk.pre_adj_corr = np.where(m, corr, 0.0)
                bk.term1 = bk.pre_adj_meas - bk.pre_adj_corr
            mmc[bk.row] = _wrap_mmc(bk.term1, comp)
            cl, sl = np.cos(lat1), np.sin(lat1)
            co, so = np.cos(lon1), np.sin(lon1)
            c12 = np.cos(comp) ** 2 / (n12 * n12)
            d = np.stack([c12 * (n12 * so - e12 * sl * co),
                          c12 * (-n12 * co - e12 * sl * so),
                          c12 * e12 * cl], axis=-1)
            scat(bk.row, bk.l1, d)
            scat(bk.row, bk.l2, -d)

        bk = self.b.get("CH")
        if bk is not None:
            p1 = _gather3(est, bk.l1)
            p2 = _gather3(est, bk.l2)
            lat1, lon1 = cl_[bk.s1], cln_[bk.s1]
            lat2 = cl_[bk.s2]
            # E and M re-reduce the arc on EVERY fill
            # (dnaadjust.cpp:5257-5276, 5412-5423)
            is_e, is_m = bk.flag, bk.static_corr
            t_e = gm.ellipsoid_arc_to_chord(
                bk.pre_adj_meas, p1[:, 0], p1[:, 1], p1[:, 2],
                p2[:, 0], p2[:, 1], p2[:, 2], lat1, lon1, lat2, ell)
            t_m = gm.msl_arc_to_ellipsoid_chord(
                bk.pre_adj_meas, lat1, lat2, net.geoid_sep[bk.s1],
                net.geoid_sep[bk.s2], ell)
            bk.term1 = np.where(is_e, t_e, np.where(is_m, t_m,
                                                    bk.pre_adj_meas))
            bk.pre_adj_corr = np.where(is_e | is_m,
                                       bk.term1 - bk.pre_adj_meas, 0.0)
            comp, dx, dy, dz = gm.ellipsoid_chord_distance(
                p1[:, 0], p1[:, 1], p1[:, 2], p2[:, 0], p2[:, 1], p2[:, 2],
                lat1, lat2, ch_[bk.s1], ch_[bk.s2], ell)
            mmc[bk.row] = bk.term1 - comp
            d = np.stack([-dx / comp, -dy / comp, -dz / comp], axis=-1)
            scat(bk.row, bk.l1, d)
            scat(bk.row, bk.l2, -d)

        bk = self.b.get("S")
        if bk is not None:
            p1 = _gather3(est, bk.l1)
            p2 = _gather3(est, bk.l2)
            lat1, lon1 = cl_[bk.s1], cln_[bk.s1]
            comp, dx, dy, dz = gm.slope_distance(
                p1[:, 0], p1[:, 1], p1[:, 2], p2[:, 0], p2[:, 1], p2[:, 2],
                lat1, lon1, bk.inst_h, bk.targ_h)
            mmc[bk.row] = bk.term1 - comp
            d = np.stack([-dx / comp, -dy / comp, -dz / comp], axis=-1)
            scat(bk.row, bk.l1, d)
            scat(bk.row, bk.l2, -d)

        bk = self.b.get("VZ")
        if bk is not None:
            p1 = _gather3(est, bk.l1)
            p2 = _gather3(est, bk.l2)
            lat1, lon1 = cl_[bk.s1], cln_[bk.s1]
            is_v = bk.flag
            if apply_reductions:
                az = gm.direction(
                    p1[:, 0], p1[:, 1], p1[:, 2], p2[:, 0], p2[:, 1],
                    p2[:, 2], lat1, lon1)[0]
                corr = gm.zenith_deflection_correction(
                    az, net.vertical_def[bk.s1], net.meridian_def[bk.s1])
                bk.pre_adj_corr = np.where(bk.defl_mask, corr, 0.0)
                bk.term1 = np.where(is_v,
                                    bk.pre_adj_meas + bk.pre_adj_corr,
                                    bk.pre_adj_meas - bk.pre_adj_corr)
            zen, ez, nz, upz = gm.zenith_distance(
                p1[:, 0], p1[:, 1], p1[:, 2], p2[:, 0], p2[:, 1], p2[:, 2],
                lat1, lon1, cl_[bk.s2], cln_[bk.s2], bk.inst_h, bk.targ_h)
            va, ev, nv, upv = gm.vertical_angle(
                p1[:, 0], p1[:, 1], p1[:, 2], p2[:, 0], p2[:, 1], p2[:, 2],
                lat1, lon1, cl_[bk.s2], cln_[bk.s2], bk.inst_h, bk.targ_h)
            comp = np.where(is_v, zen, va)
            e = np.where(is_v, ez, ev)
            n = np.where(is_v, nz, nv)
            up = np.where(is_v, upz, upv)
            mmc[bk.row] = bk.term1 - comp
            e2n2 = e * e + n * n
            sq = np.sqrt(e2n2)
            cos2v = np.cos(comp) ** 2
            cl, sl = np.cos(lat1), np.sin(lat1)
            co, so = np.cos(lon1), np.sin(lon1)
            se_up2 = sq / (up * up)
            up_se = up * sq
            dV = np.stack([
                cos2v * (((e * so + n * sl * co) / up_se) +
                         cl * co * se_up2),
                cos2v * (((-e * co + n * sl * so) / up_se) +
                         cl * so * se_up2),
                cos2v * ((-n * cl / up_se) + sl * se_up2)], axis=-1)
            se_d = sq / e2n2
            up_d = up / (sq * e2n2)
            dZ = np.stack([
                cos2v * ((-cl * co * se_d) - ((e * so + n * sl * co) * up_d)),
                cos2v * ((-cl * so * se_d) + ((e * co - n * sl * so) * up_d)),
                cos2v * ((-sl * se_d) + (n * cl * up_d))], axis=-1)
            d = np.where(is_v[:, None], dV, dZ)
            scat(bk.row, bk.l1, d)
            scat(bk.row, bk.l2, -d)

        bk = self.b.get("L")
        if bk is not None:
            p1 = _gather3(est, bk.l1)
            p2 = _gather3(est, bk.l2)
            h1, nu1, zn1 = gm.ellipsoid_height(
                p1[:, 0], p1[:, 1], p1[:, 2], cl_[bk.s1], ell)
            h2, nu2, zn2 = gm.ellipsoid_height(
                p2[:, 0], p2[:, 1], p2[:, 2], cl_[bk.s2], ell)
            comp = h2 - h1
            if apply_reductions:
                bk.pre_adj_corr = bk.static_corr
                bk.term1 = bk.pre_adj_meas + bk.pre_adj_corr
            mmc[bk.row] = bk.term1 - comp
            scat(bk.row, bk.l1, np.stack([
                -p1[:, 0] / (nu1 + h1), -p1[:, 1] / (nu1 + h1),
                -(p1[:, 2] + zn1) / (nu1 + h1)], axis=-1))
            scat(bk.row, bk.l2, np.stack([
                p2[:, 0] / (nu2 + h2), p2[:, 1] / (nu2 + h2),
                (p2[:, 2] + zn2) / (nu2 + h2)], axis=-1))

        bk = self.b.get("HR")
        if bk is not None:
            p1 = _gather3(est, bk.l1)
            if apply_reductions:
                bk.pre_adj_corr = bk.static_corr
                bk.term1 = bk.pre_adj_meas + bk.pre_adj_corr
            comp, nu1, zn1 = gm.ellipsoid_height(
                p1[:, 0], p1[:, 1], p1[:, 2], cl_[bk.s1], ell)
            mmc[bk.row] = bk.term1 - comp
            scat(bk.row, bk.l1, np.stack([
                p1[:, 0] / (nu1 + comp), p1[:, 1] / (nu1 + comp),
                (p1[:, 2] + zn1) / (nu1 + comp)], axis=-1))

        bk = self.b.get("IP")
        if bk is not None:
            p1 = _gather3(est, bk.l1)
            if apply_reductions:
                bk.pre_adj_corr = bk.static_corr
                bk.term1 = bk.pre_adj_meas - bk.pre_adj_corr
            # mechanical differentiation, 1e-4 increments
            # (PartialD_Latitude, dnatemplategeodesyfuncs.hpp:281-320)
            inc = 1.0e-4
            lat0 = cart_to_geo(p1[:, 0], p1[:, 1], p1[:, 2], ell)[0]
            cols = []
            for k in range(3):
                q = p1.copy()
                q[:, k] += inc
                cols.append(
                    (cart_to_geo(q[:, 0], q[:, 1], q[:, 2], ell)[0] -
                     lat0) / inc)
            mmc[bk.row] = bk.term1 - lat0
            scat(bk.row, bk.l1, np.stack(cols, axis=-1))

        bk = self.b.get("JQ")
        if bk is not None:
            p1 = _gather3(est, bk.l1)
            lon1 = cln_[bk.s1]
            if apply_reductions:
                corr = net.vertical_def[bk.s1] / np.cos(cl_[bk.s1])
                m = bk.flag & (np.abs(net.vertical_def[bk.s1]) >
                               E4_SEC_DEFLECTION)
                bk.pre_adj_corr = np.where(m, corr, 0.0)
                bk.term1 = bk.pre_adj_meas - bk.pre_adj_corr
            mmc[bk.row] = bk.term1 - lon1
            t = p1[:, 0] * p1[:, 1] / \
                (p1[:, 0] ** 2 + p1[:, 1] ** 2) ** 1.5
            scat(bk.row, bk.l1, np.stack([
                t * -1.0 / np.cos(lon1), t / np.sin(lon1),
                np.zeros_like(t)], axis=-1))
