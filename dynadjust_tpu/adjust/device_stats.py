"""Device-side adjusted-measurement statistics for blocked adjustments.

The reference's statistics pass multiplies the full design matrix into
the a-posteriori covariance per block (ComputePrecisionAdjMsrs,
dnaadjust.cpp:7784) — an O(m·n²) product per block that the round-2 host
implementation paid in numpy every run (~minutes at national scale).
Here the per-block covariance pools are assembled batched on device from
the Newton-refined Schur factors, and

    adj_prec = diag(A · Ninv · Aᵀ)        (per design row)
    adj_vcv3 = (A · Ninv · Aᵀ)[3x3]       (per GNSS observation triple)
    cov3     = station-diagonal 3×3 blocks of Ninv

are computed with near-f64 sliced MXU products (ops/slicegemm) in block
chunks, leaving only O(m) row bookkeeping on the host.

The whole chunk — design-pool scatter, covariance assembly from the
factors, the A·Ninv·Aᵀ products, the diagonal/row gathers — runs as ONE
jitted program per chunk (uniform shapes via padding), because the
op-by-op form paid a ~25 ms tunnel dispatch per product: at the 10k
bench the unfused stage measured ~12 s of which <1 s was MXU work.

Products run at the reporting tier (nslices=5, cross_max=4 ≈ 2^-30
relative — see _stats_tier): printed statistics carry 3-4 significant
figures, so the full Newton tier (8, 8) would be wasted MXU passes.

Parity: the fused programs express the same 2x2 block-inverse
identities as _block_cov_from_factors/_block_cov_from_nested
(tpu_blocked.py); tests force this path on small networks and compare
against the dense covariance route (tests/test_device_assembly.py).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.slicegemm import mm64, _use_sliced


def _stats_tier():
    """Accuracy tier of the statistics products (nslices, cross_max).

    Reported quantities (adjusted-measurement precisions, N-stats, GNSS
    VCVs, formal SDs) are printed at 3-4 significant figures; the
    default (5, 4) tier carries ~2^-30 relative accuracy at ~2.9x fewer
    MXU passes than the full Newton tier (8, 8).  Override with
    DTA_STATS_TIER=nslices,cross_max (e.g. "8,8" to restore full)."""
    v = os.environ.get("DTA_STATS_TIER", "5,4")
    n, c = v.split(",")
    return int(n), int(c)


_mm = mm64


def _l1_cov(Ainv_c, Y_c, Cj, di_c, djg_sel, mm):
    """Level-1 2x2 block-inverse identities: per-block covariance pool
    from the refined inner inverse, coupling Y and junction covariance
    Cj — the batched form of _block_cov_from_factors."""
    YS = mm(Y_c, Cj)
    cov_ii = (Ainv_c + mm(YS, jnp.swapaxes(Y_c, 1, 2))) \
        * di_c[:, :, None] * di_c[:, None, :]
    cov_ij = -YS * di_c[:, :, None] * djg_sel[:, None, :]
    cov_jj = Cj * djg_sel[:, :, None] * djg_sel[:, None, :]
    top = jnp.concatenate([cov_ii, cov_ij], axis=2)
    bot = jnp.concatenate([jnp.swapaxes(cov_ij, 1, 2), cov_jj], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _finish_chunk(cov, tb, tr, tc3, vhi, vlo, Pmat_c, bb, r3, mm,
                  M: int, Pn: int):
    """Scatter the f64 design pool for the chunk (padded tile plan; pad
    tiles land in the extra row M and are dropped), project constrained
    columns, and derive the three reported quantities."""
    C = cov.shape[0]
    P = 3 * Pn
    shape = (C, M + 1, P)
    Ahi = jnp.zeros(shape, jnp.float32).at[
        tb[:, None], tr[:, None], tc3].set(vhi)
    Alo = jnp.zeros(shape, jnp.float32).at[
        tb[:, None], tr[:, None], tc3].set(vlo)
    A64 = (Ahi.astype(jnp.float64)
           + Alo.astype(jnp.float64))[:, :M]
    if Pmat_c is not None:
        A64 = jnp.einsum("bmsk,bskl->bmsl",
                         A64.reshape(C, M, Pn, 3),
                         Pmat_c).reshape(C, M, P)
    G = mm(A64, cov)                             # (C, M, P)
    ap = jnp.sum(G * A64, axis=2)
    idx = jnp.arange(Pn)
    Cr = cov.reshape(C, Pn, 3, Pn, 3)
    d3 = jnp.transpose(Cr[:, idx, :, idx, :], (1, 0, 2, 3))
    Gg = G[bb[:, None], r3, :]                   # (R, 3, P)
    Ag = A64[bb[:, None], r3, :]
    v = jnp.einsum("nap,nbp->nab", Gg, Ag)
    return ap, d3, v


@partial(jax.jit, static_argnames=("M", "Pn", "sliced", "nslices",
                                   "cross_max"))
def _fused_flat_chunk(Ainv_c, Y_c, Sinv, di_c, djg, jmap_c, jmask_c,
                      tb, tr, tc3, vhi, vlo, Pmat_c, bb, r3,
                      M, Pn, sliced, nslices, cross_max):
    mm = partial(_mm, sliced=sliced, nslices=nslices,
                 cross_max=cross_max)
    Ssel = Sinv[jmap_c[:, :, None], jmap_c[:, None, :]]
    Ssel = Ssel * jmask_c[:, :, None] * jmask_c[:, None, :]
    djg_sel = djg[jmap_c] * jmask_c
    cov = _l1_cov(Ainv_c, Y_c, Ssel, di_c, djg_sel, mm)
    return _finish_chunk(cov, tb, tr, tc3, vhi, vlo, Pmat_c, bb, r3,
                         mm, M, Pn)


@partial(jax.jit, static_argnames=("M", "Pn", "sliced", "nslices",
                                   "cross_max"))
def _fused_nested_chunk(A2h, Y2h, Sd, Ainv_c, Y_c, di_c, djg_sel,
                        sbb, s0, s1, jm2, m2, k0d, k1d,
                        tb, tr, tc3, vhi, vlo, Pmat_c, bb, r3,
                        M, Pn, sliced, nslices, cross_max):
    """Nested (3-level) chunk: junction covariance Cj from the refined
    level-2/3 inverses (the batched nested_junction_cov identities),
    then the level-1 identities and the A-side products — one program."""
    mm = partial(_mm, sliced=sliced, nslices=nslices,
                 cross_max=cross_max)
    Cloc = Sd[jm2[:, :, None], jm2[:, None, :]]
    Cloc = Cloc * m2[:, :, None] * m2[:, None, :]
    U = Y2h[sbb[:, None], s0, :]                 # (C, nj, nj2)
    A2sel = A2h[sbb[:, None, None], s0[:, :, None], s0[:, None, :]]
    UC = mm(U, Cloc)
    C00 = A2sel + mm(UC, jnp.swapaxes(U, 1, 2))
    X01 = -mm(U * m2[:, None, :],
              Sd[jm2[:, :, None], s1[:, None, :]])
    C11 = Sd[s1[:, :, None], s1[:, None, :]]
    Cj = (C00 * k0d[:, :, None] * k0d[:, None, :]
          + X01 * k0d[:, :, None] * k1d[:, None, :]
          + jnp.swapaxes(X01, 1, 2) * k1d[:, :, None] * k0d[:, None, :]
          + C11 * k1d[:, :, None] * k1d[:, None, :])
    cov = _l1_cov(Ainv_c, Y_c, Cj, di_c, djg_sel, mm)
    return _finish_chunk(cov, tb, tr, tc3, vhi, vlo, Pmat_c, bb, r3,
                         mm, M, Pn)


def _nested_chunk_indices(factors, part, jmap_np, jmask_np, sl):
    """Host-side index prep for one nested chunk (cheap numpy)."""
    C, nj = jmap_np.shape
    g = np.minimum(jmap_np, len(part.xj_kind) - 1)
    kind = part.xj_kind[g] * (jmask_np > 0)
    slot = part.xj_slot[g]
    sbb = np.asarray(part.sb_of_block[sl])
    k0 = (kind == 0) & (jmask_np > 0)
    k1 = (kind == 1) & (jmask_np > 0)
    nsj = factors._l2_shape[2]
    s0 = np.where(k0, np.minimum(slot, part.ni2 - 1), 0)
    s1 = np.where(k1, np.minimum(slot, nsj - 1), 0)
    jm2 = part.j2map[sbb]                        # (C, nj2)
    m2 = part.j2mask[sbb]
    return (sbb, s0.astype(np.int32), s1.astype(np.int32),
            jm2.astype(np.int32), m2.astype(np.float64),
            k0.astype(np.float64), k1.astype(np.float64))


def _chunk_tile_plan(da, chunk):
    """Per-chunk padded scatter plans (uniform shapes → one compiled
    program).  Pad tiles write into the extra design row M, dropped by
    the fused program."""
    B, M = da.B, da.M
    plans = []
    Tmax = 0
    for c0 in range(0, B, chunk):
        t0, t1 = int(da._t_range[c0]), int(da._t_range[c0 + chunk])
        Tmax = max(Tmax, t1 - t0)
    for c0 in range(0, B, chunk):
        t0, t1 = int(da._t_range[c0]), int(da._t_range[c0 + chunk])
        T = t1 - t0
        tb = np.zeros(Tmax, dtype=np.int32)
        tr = np.full(Tmax, M, dtype=np.int32)    # pad row
        tc3 = np.zeros((Tmax, 3), dtype=np.int32)
        tb[:T] = da._t_b_h[t0:t1] - c0
        tr[:T] = da._t_r_h[t0:t1]
        tc3[:T] = da._t_c3_h[t0:t1]
        plans.append((t0, t1, da._putr(tb), da._putr(tr),
                      da._putr(tc3)))
    return plans, Tmax


def _chunk_gps_plan(gps_rows, B, chunk):
    """Per-chunk padded GNSS row-triple gather plans."""
    Rmax = 1
    for c0 in range(0, B, chunk):
        Rmax = max(Rmax, sum(len(gps_rows[b])
                             for b in range(c0, c0 + chunk)))
    plans = []
    for c0 in range(0, B, chunk):
        entries = [(bi, b, gps_rows[b])
                   for bi, b in enumerate(range(c0, c0 + chunk))
                   if len(gps_rows[b])]
        bb = np.zeros(Rmax, dtype=np.int32)
        rr = np.zeros(Rmax, dtype=np.int32)
        n = 0
        for bi, _, r in entries:
            bb[n:n + len(r)] = bi
            rr[n:n + len(r)] = r
            n += len(r)
        plans.append((entries, n, bb, rr))
    return plans


def device_block_stats(da, bs, cov_factors=None, nested=None,
                       chunk: int = 16):
    """adj_prec per design row, adj_vcv3 per GNSS observation, and
    station-diagonal 3×3 covariance blocks — one fused device program
    per block chunk.

    da: the DeviceAssembly (projected A pools + tile plans);
    cov_factors: flat refined factors (newton_factors output), or
    nested=(factors, part) for the 3-level path.
    Returns (adj_prec (B, M) np.float64, vcv3 {(b, row0): (3,3)},
    cov3 (B, Pn, 3, 3) np.float64) — cov3 indexed by station slot."""
    from ..ops.slicegemm import split_f32_pair
    B, M, P = da.B, da.M, da.Pp
    Pn = P // 3
    nslices, cross_max = _stats_tier()
    sliced = _use_sliced()
    # one compiled program set: the chunk divides the block count AND
    # fits the HBM budget — the f64 A pool, the G = A·Ninv product, the
    # sliced-matmul transients (~(nslices+2)x f32 of the operands) plus
    # the (C, P, P) covariance pools all scale with the chunk (a 9-block
    # 3.3k-param segmentation OOMs a 16 GB chip if all blocks go at once)
    # 4 GB default: measured bound — an 8 GB budget (3-block chunks at
    # the 10k bench shapes) ResourceExhausted the 16 GB chip alongside
    # the retained covariance pools, so the per-dispatch latency of
    # small chunks is the price of fitting
    budget = float(os.environ.get("DTA_STATS_CHUNK_BYTES", 4e9))
    per_block = ((nslices + 2) * 4.0 + 2 * 8.0) * (M * P + P * P)
    chunk = min(chunk, max(1, int(budget / per_block)))
    chunk = next(c for c in range(min(chunk, B), 0, -1) if B % c == 0)
    adj_prec = np.zeros((B, M))
    cov3 = np.zeros((B, Pn, 3, 3))
    vcv3 = {}
    gps_rows = da.gps_row_plan()          # per block: (rows0 array)
    tile_plans, _ = _chunk_tile_plan(da, chunk)
    gps_plans = _chunk_gps_plan(gps_rows, B, chunk)

    if nested is not None:
        factors, part = nested
        l1d = getattr(factors, "_cov_l1_dev", None)
        Ah, Yh = l1d if l1d is not None else factors._cov_l1_h
        # chunk-invariant level-2/3 pools: the resident refinement now
        # leaves them ON device (_l2_dev_refined — no round-trip); the
        # streamed/host layouts hoist them up ONCE (re-uploading per
        # chunk moved ~18 GB at the 102,400-stn configuration)
        dev = getattr(factors, "_l2_dev_refined", None)
        if dev is None:
            dev = getattr(factors, "_l2_dev", None)
        if dev is None:
            A2h, Y2h, Sh = factors._l2_host
            dev = (jnp.asarray(A2h), jnp.asarray(Y2h), jnp.asarray(Sh))
            factors._l2_dev = dev
        A2d, Y2d, Sd = dev
        factors._l2_shape = (A2d.shape[0], A2d.shape[1], Sd.shape[0])
        djg = factors.djg_np
        di_h = (factors.di_h if hasattr(factors, "di_h")
                else np.asarray(factors.factors[5]))

    for ci, c0 in enumerate(range(0, B, chunk)):
        sl = slice(c0, c0 + chunk)
        jmap_np = bs.jmap[sl].astype(np.int32)
        jmask_np = np.asarray(bs.jmask[sl], dtype=np.float64)
        t0, t1, tb, tr, tc3 = tile_plans[ci]
        vals = da.scalar_values(np.float64, sl.start, sl.stop)
        hi, lo = split_f32_pair(vals)
        T = t1 - t0
        if len(hi) < tb.shape[0]:
            pad = tb.shape[0] - T
            hi = np.concatenate([hi, np.zeros((pad, 3), np.float32)])
            lo = np.concatenate([lo, np.zeros((pad, 3), np.float32)])
        entries, nrows, bb, rr = gps_plans[ci]
        r3 = rr[:, None] + np.arange(3, dtype=np.int32)
        Pmat_c = da.Pmat64[sl] if da._has_proj else None
        common = (tb, tr, tc3, da._putr(hi), da._putr(lo), Pmat_c,
                  da._putr(bb), da._putr(r3))
        if nested is None:
            Ainv, Y, Sinv, di, dj, djgf, _ = cov_factors
            ap, d3, v = _fused_flat_chunk(
                Ainv[sl], Y[sl], Sinv,
                jnp.asarray(np.asarray(di)[sl], dtype=jnp.float64),
                djgf, da._putr(jmap_np), da._putr(jmask_np), *common,
                M=M, Pn=Pn, sliced=sliced, nslices=nslices,
                cross_max=cross_max)
        else:
            idxs = _nested_chunk_indices(factors, part, jmap_np,
                                         jmask_np, sl)
            djg_sel = djg[np.minimum(jmap_np, len(djg) - 1)] * jmask_np
            ap, d3, v = _fused_nested_chunk(
                A2d, Y2d, Sd, jnp.asarray(Ah[sl]), jnp.asarray(Yh[sl]),
                jnp.asarray(np.asarray(di_h[sl]), dtype=jnp.float64),
                da._putr(djg_sel),
                *(da._putr(x) for x in idxs), *common,
                M=M, Pn=Pn, sliced=sliced, nslices=nslices,
                cross_max=cross_max)
        adj_prec[sl] = np.asarray(ap)
        cov3[sl] = np.asarray(d3)
        if nrows:
            v_np = np.asarray(v[:nrows])
            e = 0
            for _, b, rows0 in entries:
                for r0 in rows0:
                    vcv3[(b, int(r0))] = v_np[e]
                    e += 1
    if nested is not None and hasattr(nested[0], "_l2_dev"):
        del nested[0]._l2_dev            # free the hoisted device pools
    return adj_prec, vcv3, cov3
