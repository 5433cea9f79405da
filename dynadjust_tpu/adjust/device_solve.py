"""One-dispatch refined Gauss-Newton solve for the mixed-type path.

The production mixed-type adjustment used to drive its residual
refinement from a HOST loop (schur_solve_device_refined /
schur_solve_nested_factored): per round, a numpy f64 matvec through each
block's design matrix (2 vCPUs) plus a device factor apply — each round
a tunnel round-trip.  Measured at the 10k bench: warm solve 4.09 s of
which actual device work was ~0.16 s.

This module moves the WHOLE refined solve into one jitted program:

  * the f64 design pool A (B, M, P) is scattered on device from the
    same per-iteration tile values the f32 normals build uses
    (device_assembly tile plan), and — on TPU — pre-peeled ONCE into
    bf16 mantissa-slice pools (ops/slicegemm.preslice_pools), so each
    residual matvec y = P·AᵀV⁻¹A·P·x + D·x is nslices exact bf16
    passes over the pools (~HBM speed) instead of XLA's ~3 GFLOP/s f64
    matvec emulation (measured, scripts/probe_f64_matvec.py).  On CPU
    (tests, virtual meshes) the operator is a native f64 einsum.
  * the rhs b = P·AᵀV⁻¹·mmc is computed in-program from the uploaded
    misclosure pool (replacing the host rhs_pools loop);
  * the residual-driven refinement loop (refine floor, rtol target,
    stall detector — the same policy as the host loops) runs as a
    lax.while_loop over f32 factor applies + near-f64 residuals.

Per warm iteration the host↔device traffic is: tile values up (~5 MB at
10k), misclosures up (<1 MB), corrections down (<1 MB) — one dispatch.

The compiled programs are cached at MODULE level keyed by shapes/policy
(not per-solver instance): repeated adjustments of same-shaped networks
(benchmark warm runs, CI replays, report-mode re-runs) re-trace nothing.

This is the mixed-type generalisation of parallel/device_adjust.py's
pure-GNSS architecture (the reference's per-iteration Solve loop,
dnaadjust.cpp:6586, re-planned for a device at the end of a long
PCIe/tunnel link).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


_TIER_LADDER = ((8, 8), (6, 5), (5, 4), (4, 4))


def _solve_tier(da=None):
    """(nslices, cross_max) of the sliced residual operator, or None if
    no tier fits the chip.

    The operator's truncation perturbs the system the refinement
    converges to by ~2^-(6·nslices) relative: the full tier keeps that
    at ~2^-48; the (4,4) floor still reaches ~6e-8 — micrometre-class
    consistency on metre-scale corrections, far inside the Gauss-Newton
    threshold, with the achieved solve residual recorded as evidence
    either way.  Tier selection is HBM-driven: the while-loop program
    holds ~(2·nslices + 8) bytes per design-pool entry (bf16 slice
    pools + the f32 hi/lo scatter transient) plus ~2 GB of factor/misc
    state (calibrated against the measured 102,400-stn compile
    footprints), so the largest tier that fits DTA_SOLVE_HBM_TARGET
    (default 15e9) wins.  DTA_SOLVE_TIER=n,c overrides."""
    from ..ops.slicegemm import NSLICES, CROSS_MAX
    v = os.environ.get("DTA_SOLVE_TIER", "")
    if v:
        n, c = v.split(",")
        return int(n), int(c)
    if da is None:
        return NSLICES, CROSS_MAX
    entries = float(da.Bp) * da.M * da.Pp
    target = float(os.environ.get("DTA_SOLVE_HBM_TARGET", 1.5e10))
    for ns, cm in _TIER_LADDER:
        if (2.0 * ns + 8.0) * entries + 2.0e9 <= target:
            return ns, cm
    return None


def _make_operator(dims, sliced, tier, has_proj,
                   vals, mmc, wdiag, bkt, Pm, jmap, jmask64,
                   db, dc3, dv, tb, tr, tc3):
    """Traced constructor of (rhs, matvec) closures over the scattered
    design pool — called inside the jitted programs.

    dims = (B, M, Pp, ni, nj_total)."""
    B, M, Pp, ni, nj_total = dims
    Pn = Pp // 3

    if sliced:
        from ..ops.slicegemm import preslice_pools, matvec_presliced
        ns, cm = tier
        vhi = vals.astype(jnp.float32)
        vlo = (vals - vhi.astype(jnp.float64)).astype(jnp.float32)
        Ahi = jnp.zeros((B, M, Pp), jnp.float32).at[
            tb[:, None], tr[:, None], tc3].set(vhi)
        Alo = jnp.zeros((B, M, Pp), jnp.float32).at[
            tb[:, None], tr[:, None], tc3].set(vlo)
        SL, sA = preslice_pools(Ahi, Alo, nslices=ns)

        def Ax(x):
            return matvec_presliced(SL, sA, x, nslices=ns, cross_max=cm)

        def ATv(v):
            return matvec_presliced(SL, sA, v, nslices=ns, cross_max=cm,
                                    transa=True)
    else:
        A64 = jnp.zeros((B, M, Pp), jnp.float64).at[
            tb[:, None], tr[:, None], tc3].set(vals)

        def Ax(x):
            return jnp.einsum("bmp,bp->bm", A64, x)

        def ATv(v):
            return jnp.einsum("bmp,bm->bp", A64, v)

    def proj(v):
        if not has_proj:
            return v
        vr = v.reshape(B, Pn, 3)
        return jnp.einsum("bsij,bsj->bsi", Pm, vr).reshape(B, Pp)

    def applyV(u):
        vu = u * wdiag
        for bb, rows, V in bkt:
            ug = u[bb[:, None], rows]
            vu = vu.at[bb[:, None], rows].set(
                jnp.einsum("nik,nk->ni", V, ug))
        return vu

    def rhs():
        b_pool = proj(ATv(applyV(mmc)))
        bi = b_pool[:, :ni]
        bj_b = b_pool[:, ni:] * jmask64
        bj = jnp.zeros((nj_total,), jnp.float64).at[
            jmap.reshape(-1)].add(bj_b.reshape(-1))
        return bi, bj

    def matvec(xi, xj_g):
        xj_b = xj_g[jmap] * jmask64
        x = jnp.concatenate([xi, xj_b], axis=1)
        y = proj(ATv(applyV(Ax(proj(x)))))
        xg = x[db[:, None], dc3]
        y = y.at[db[:, None], dc3].add(
            jnp.einsum("kij,kj->ki", dv, xg))
        yi = y[:, :ni]
        yj_b = y[:, ni:] * jmask64
        yj = jnp.zeros((nj_total,), jnp.float64).at[
            jmap.reshape(-1)].add(yj_b.reshape(-1))
        return yi, yj

    return rhs, matvec


def _refined_loop(policy, apply_fn, matvec_fn, bi, bj_g, imask64):
    """Shared refinement policy (the host loops', in-jit): initial
    apply, then while_loop rounds gated by the f64 relative residual
    with a `refine` floor and a stall detector.
    policy = (refine, max_refine, rtol)."""
    refine, max_refine, rtol = policy
    rhs_scale = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(bi)), jnp.max(jnp.abs(bj_g))),
        1e-30)
    xi, xj = apply_fn(bi, bj_g)

    def residual(xi, xj):
        yi, yj = matvec_fn(xi, xj)
        ri = bi * imask64 - yi
        rj = bj_g - yj
        rel = jnp.maximum(jnp.max(jnp.abs(ri)),
                          jnp.max(jnp.abs(rj))) / rhs_scale
        return ri, rj, rel

    ri, rj, rel = residual(xi, xj)

    def cond(st):
        _, _, _, _, rel, prev, k = st
        return jnp.logical_and(
            k < max_refine,
            jnp.logical_or(k < refine,
                           jnp.logical_and(rel >= rtol,
                                           rel < 0.5 * prev)))

    def body(st):
        xi, xj, ri, rj, rel, _, k = st
        dxi, dxj = apply_fn(ri, rj)
        xi = xi + dxi
        xj = xj + dxj
        ri, rj, rel_n = residual(xi, xj)
        return xi, xj, ri, rj, rel_n, rel, k + 1

    xi, xj, _, _, rel, _, k = jax.lax.while_loop(
        cond, body, (xi, xj, ri, rj, rel,
                     jnp.asarray(np.inf, jnp.float64), jnp.int32(0)))
    return xi, xj, rel, k


@lru_cache(maxsize=64)
def _nested_prog(dims, nested_dims, policy, sliced, tier, has_proj):
    """Module-cached fused nested refined-solve program.
    nested_dims = (SB, ni2, nj2, nsj_total, njg)."""
    from ..parallel.schur import _nested_apply_fwd_jit
    B, M, Pp, ni, nj_total = dims
    SB, ni2, nj2, nsj_total, njg = nested_dims

    def prog(vals, mmc, tb, tr, tc3, wdiag, bkt, Pm, db, dc3, dv,
             jmap, jmask64, imask64, owner64, gidx,
             Ainv, Y, A2inv, Y2, Sinv, di, dj, djg,
             jmask32, sbb, l2slot, j2map, j2mask32):
        rhs, matvec = _make_operator(
            dims, sliced, tier, has_proj, vals, mmc, wdiag, bkt, Pm,
            jmap, jmask64, db, dc3, dv, tb, tr, tc3)
        bi, bj_g = rhs()
        f32 = Ainv.dtype

        def apply_fn(ri, rj_g):
            rjb = rj_g[jmap] * owner64
            w, xi2, xsj = _nested_apply_fwd_jit(
                Ainv, Y, A2inv, Y2, Sinv, di, dj, jmask32,
                sbb, l2slot, j2map, j2mask32,
                ri.astype(f32), rjb.astype(f32),
                SB, ni2, nj2, nsj_total)
            # composed junction reconstruction: ONE constant gather
            # into concat([xi2, xsj]) (host-precomputed index — the
            # two-level where/gather form compiles pathologically on
            # this toolchain)
            flat = jnp.concatenate([xi2.reshape(-1), xsj])
            xj_real = flat[gidx]                     # (njg,) f32
            xj_full = jnp.concatenate(
                [xj_real, jnp.zeros((nj_total - njg,), f32)])
            xj_b = xj_full[jmap] * jmask32
            xi = (w - jnp.einsum("bij,bj->bi", Y, xj_b)) * di
            return (xi.astype(jnp.float64),
                    (xj_full * djg).astype(jnp.float64))

        return _refined_loop(policy, apply_fn, matvec, bi, bj_g,
                             imask64)

    return jax.jit(prog)


@lru_cache(maxsize=64)
def _flat_prog(dims, policy, sliced, tier, has_proj):
    """Module-cached fused flat refined-solve program."""
    from ..parallel.schur import _schur_apply_inv_core
    B, M, Pp, ni, nj_total = dims

    def prog(vals, mmc, tb, tr, tc3, wdiag, bkt, Pm, db, dc3, dv,
             jmap, jmask64, imask64, owner64,
             Ainv, Y, Sinv, di, dj, djg, Nij_s, jmask32):
        rhs, matvec = _make_operator(
            dims, sliced, tier, has_proj, vals, mmc, wdiag, bkt, Pm,
            jmap, jmask64, db, dc3, dv, tb, tr, tc3)
        bi, bj_g = rhs()
        f32 = Ainv.dtype

        def apply_fn(ri, rj_g):
            rjb = rj_g[jmap] * owner64
            xi, xj = _schur_apply_inv_core(
                Ainv, Y, Sinv, di, dj, djg, Nij_s,
                ri.astype(f32), rjb.astype(f32),
                jmap, jmask32, nj_total)
            xj = jnp.concatenate([xj, jnp.zeros((1,), xj.dtype)])
            return xi.astype(jnp.float64), xj.astype(jnp.float64)

        return _refined_loop(policy, apply_fn, matvec, bi, bj_g,
                             imask64)

    return jax.jit(prog)


class DeviceRefinedSolve:
    """Per-topology constant device state + module-cached fused
    refined-solve programs.

    Built once from a DeviceAssembly; `solve_nested(factors, ...)` /
    `solve_flat(factors, ...)` run one full residual-refined solve per
    dispatch.  Policy knobs mirror the host loops: `refine` floor
    rounds, DTA_MAX_REFINE cap, DTA_SOLVE_RTOL target.
    """

    def __init__(self, da, refine: int = 2):
        from ..ops.slicegemm import _use_sliced
        from ..parallel.schur import _owner_mask
        self.da = da
        max_refine = max(refine,
                         int(os.environ.get("DTA_MAX_REFINE", 12)))
        rtol = float(os.environ.get("DTA_SOLVE_RTOL", 1e-10))
        self.policy = (refine, max_refine, rtol)
        self.sliced = _use_sliced()
        self.tier = (_solve_tier(da) or _TIER_LADDER[-1]) \
            if self.sliced else (8, 8)
        self.njg = da.nj_global
        self.nj_total = da.nj_global + 1
        self.dims = (da.Bp, da.M, da.Pp, da.ni, self.nj_total)

        pr = da._putr
        self._jmap = pr(da.jmap_np.astype(np.int32))
        self._jmask64 = pr(da.jmask_np.astype(np.float64))
        self._imask64 = pr(da.imask_np.astype(np.float64))
        self._owner64 = pr(_owner_mask(da.jmap_np, da.jmask_np)
                           .astype(np.float64))
        self._wdiag64 = pr(da._wdiag64_h[:, :da.M].astype(np.float64))
        self._buckets = []
        for k, bb, rr, V in da._v_buckets64_h:
            rows = rr[:, None] + np.arange(k, dtype=np.int32)
            self._buckets.append((pr(bb), pr(rows.astype(np.int32)),
                                  pr(V)))
        self._pm = da.Pmat64 if da._has_proj else None

    # ------------------------------------------------------------------
    def iteration_inputs(self, values64=None):
        """Upload this linearisation's tile values (f64, SCALAR tiles
        only — GPS tiles are device constants, composed on device) and
        the misclosure pool.  The same composed f64 value vector feeds
        the f32 normals build (cast on device) — one transfer serves
        both."""
        da = self.da
        if values64 is not None:
            vals_dev = da._putr(np.ascontiguousarray(values64))
        else:
            dyn = np.ascontiguousarray(da.dyn_values(np.float64))
            vals_dev = da.compose_values(da._putr(dyn))
        mmc = np.zeros((da.Bp, da.M))
        for b, blk in enumerate(da.blocks):
            mmc[b, :blk.asm.nrows] = blk.asm.mmc
        return vals_dev, da._putr(mmc)

    def _common_args(self):
        da = self.da
        return (da._t_b, da._t_r, da._t_c3, self._wdiag64,
                tuple(self._buckets), self._pm, da._d_b, da._d_c3,
                da._d_v64, self._jmap, self._jmask64, self._imask64,
                self._owner64)

    # ------------------------------------------------------------------
    def solve_nested(self, factors, vals_dev, mmc_dev):
        """Fused nested (3-level) refined solve — one dispatch.

        factors: NestedSchurFactors (f32, resident, mesh=None).
        Returns (xi (B, ni) f64 np, xj (njg,) f64 np,
        {"solve_rel": float, "solve_rounds": int})."""
        part = factors.part
        nested_dims = (part.SB, part.ni2, part.nj2, factors.nsj_total,
                       self.njg)
        prog = _nested_prog(self.dims, nested_dims, self.policy,
                            self.sliced, self.tier,
                            self._pm is not None)
        Ainv, Y, A2inv, Y2, Sinv, di, dj, djg = factors.factors
        xi, xj, rel, k = prog(
            vals_dev, mmc_dev, *self._common_args(),
            self._gidx_for(factors),
            Ainv, Y, A2inv, Y2, Sinv, di, dj, djg,
            factors.jmask, factors.sbb, factors.l2slot,
            factors.j2map, factors.j2mask)
        return (np.asarray(xi, dtype=np.float64),
                np.asarray(xj, dtype=np.float64)[:self.njg],
                {"solve_rel": float(rel), "solve_rounds": int(k)})

    def _gidx_for(self, factors):
        """Composed junction-reconstruction gather index (constant per
        topology): global junction param g reads
        concat([xi2.ravel(), xsj])[gidx[g]]."""
        if not hasattr(self, "_gidx_cache"):
            part = factors.part
            ni2 = part.ni2
            njg = self.njg
            kind = np.asarray(part.xj_kind[:njg])
            sb = np.asarray(part.xj_sb[:njg])
            slot = np.asarray(part.xj_slot[:njg])
            gidx = np.where(kind == 0,
                            sb * ni2 + np.minimum(slot, ni2 - 1),
                            part.SB * ni2 + np.minimum(
                                slot, factors.nsj_total - 1))
            self._gidx_cache = self.da._putr(gidx.astype(np.int32))
        return self._gidx_cache

    # ------------------------------------------------------------------
    def solve_flat(self, factors, vals_dev, mmc_dev):
        """Fused flat (2-level) refined solve — one dispatch.

        factors: DeviceSchurFactors with method='inv' (explicit f32
        inverses)."""
        prog = _flat_prog(self.dims, self.policy, self.sliced,
                          self.tier, self._pm is not None)
        Ainv, Y, Sinv, di, dj, djg, Nij_s = factors.factors
        xi, xj, rel, k = prog(
            vals_dev, mmc_dev, *self._common_args(),
            Ainv, Y, Sinv, di, dj, djg, Nij_s, factors.jmask32)
        return (np.asarray(xi, dtype=np.float64),
                np.asarray(xj, dtype=np.float64)[:self.njg],
                {"solve_rel": float(rel), "solve_rounds": int(k)})


def pool_bytes(da, sliced: bool, tier=None) -> float:
    """HBM estimate of the in-program design-pool state: nslices bf16
    slice pools (sliced) or one f64 pool (exact)."""
    base = float(da.Bp) * da.M * da.Pp
    if sliced:
        ns = (tier or _solve_tier())[0]
        return base * (2.0 * ns + 8.0)      # slices + hi/lo transient
    return base * 8.0


def want_device_solve(da, mesh, staged: bool) -> bool:
    """Route the solve through the fused in-jit program?  Gated on the
    design-pool state fitting the HBM budget alongside the factor pools
    (DTA_DEVICE_SOLVE_BYTES), single-process resident mode only (the
    mesh path keeps the host loop: its collectives and host gathers are
    validated by the multichip artifacts; fusing them is a follow-up)."""
    if mesh is not None or staged:
        return False
    v = os.environ.get("DTA_DEVICE_SOLVE", "")
    if v in ("0", "1"):
        return v == "1"
    from ..ops.slicegemm import _use_sliced
    if _use_sliced():
        # HBM-driven tier ladder: route through the fused program at
        # whatever slicing tier fits the chip; only bail to the host
        # loop when even the lowest tier cannot fit
        if _solve_tier(da) is None:
            import sys
            print("device_solve: no slicing tier fits the HBM target "
                  "(DTA_SOLVE_HBM_TARGET) at this design-pool size — "
                  "falling back to the host refinement loop",
                  file=sys.stderr, flush=True)
            return False
        return True
    budget = float(os.environ.get("DTA_DEVICE_SOLVE_BYTES", 8e9))
    return pool_bytes(da, False) <= budget
