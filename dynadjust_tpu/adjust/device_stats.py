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

Parity: _block_cov_from_factors/_block_cov_from_nested express the same
2x2 block-inverse identities; tests force this path on small networks
and compare against the dense covariance route.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.slicegemm import xmatmul64


def _chunk_cov_flat(cov_factors, jmap_c, jmask_c):
    """(C, P, P) f64 covariance pools from the flat (2-level) refined
    factors for one chunk of blocks — the batched form of
    _block_cov_from_factors (tpu_blocked.py)."""
    Ainv, Y, Sinv, di, dj, djg, _ = cov_factors
    Ainv_c = jnp.asarray(Ainv)
    Y_c = jnp.asarray(Y)
    Ssel = jnp.asarray(Sinv)[jmap_c[:, :, None], jmap_c[:, None, :]]
    Ssel = Ssel * jmask_c[:, :, None] * jmask_c[:, None, :]
    di_c = jnp.asarray(di)
    djg_sel = jnp.asarray(djg)[jmap_c] * jmask_c
    YS = xmatmul64(Y_c, Ssel)
    cov_ii = (Ainv_c + xmatmul64(YS, jnp.swapaxes(Y_c, 1, 2))) \
        * di_c[:, :, None] * di_c[:, None, :]
    cov_ij = -YS * di_c[:, :, None] * djg_sel[:, None, :]
    cov_jj = Ssel * djg_sel[:, :, None] * djg_sel[:, None, :]
    top = jnp.concatenate([cov_ii, cov_ij], axis=2)
    bot = jnp.concatenate([jnp.swapaxes(cov_ij, 1, 2), cov_jj], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _chunk_cov_nested(factors, part, jmap_c, jmask_c, sl):
    """Nested (3-level) counterpart: per-block junction covariance from
    the level-2/3 refined inverses (the batched nested_junction_cov),
    then the same level-1 identities."""
    # refined L1 pools: prefer the device-resident copies (resident
    # national path keeps them on-chip; the host round-trip cost
    # ~4.8 GB over the tunnel at 102,400 stn)
    l1d = getattr(factors, "_cov_l1_dev", None)
    Ah, Yh = l1d if l1d is not None else factors._cov_l1_h
    # hoist the chunk-invariant level-2/3 pools to the device ONCE —
    # re-uploading A2h/Y2h/Sinv per chunk moved ~18 GB over the tunnel
    # at the 102,400-stn configuration (~40 min of the stats stage)
    dev = getattr(factors, "_l2_dev", None)
    if dev is None:
        A2h, Y2h, Sh = factors._l2_host
        dev = (jnp.asarray(A2h), jnp.asarray(Y2h), jnp.asarray(Sh))
        factors._l2_dev = dev
    A2h, Y2h, Sh = dev
    djg = factors.djg_np
    di_h = (factors.di_h if hasattr(factors, "di_h")
            else np.asarray(factors.factors[5]))

    jmap_np = np.asarray(jmap_c)
    jmask_np = np.asarray(jmask_c)
    C, nj = jmap_np.shape
    g = np.minimum(jmap_np, len(part.xj_kind) - 1)
    kind = part.xj_kind[g] * (jmask_np > 0)
    slot = part.xj_slot[g]
    sbb = np.asarray(part.sb_of_block[sl])
    ni2, nj2 = part.ni2, part.nj2
    k0 = (kind == 0) & (jmask_np > 0)
    k1 = (kind == 1) & (jmask_np > 0)
    s0 = np.where(k0, np.minimum(slot, ni2 - 1), 0)
    s1 = np.where(k1, np.minimum(slot, Sh.shape[0] - 1), 0)

    jm2 = part.j2map[sbb]                       # (C, nj2)
    m2 = part.j2mask[sbb]
    Sd = jnp.asarray(Sh)
    Cloc = Sd[jnp.asarray(jm2)[:, :, None], jnp.asarray(jm2)[:, None, :]]
    Cloc = Cloc * jnp.asarray(m2)[:, :, None] * jnp.asarray(m2)[:, None, :]
    U = jnp.asarray(Y2h)[jnp.asarray(sbb)[:, None], jnp.asarray(s0), :]
    A2sel = jnp.asarray(A2h)[jnp.asarray(sbb)[:, None, None],
                             jnp.asarray(s0)[:, :, None],
                             jnp.asarray(s0)[:, None, :]]
    UC = xmatmul64(U, Cloc)
    C00 = A2sel + xmatmul64(UC, jnp.swapaxes(U, 1, 2))
    X01 = -jnp.einsum("ckj,cjl->ckl", U * jnp.asarray(m2)[:, None, :],
                      Sd[jnp.asarray(jm2)[:, :, None],
                         jnp.asarray(s1)[:, None, :]])
    C11 = Sd[jnp.asarray(s1)[:, :, None], jnp.asarray(s1)[:, None, :]]
    k0d = jnp.asarray(k0.astype(np.float64))
    k1d = jnp.asarray(k1.astype(np.float64))
    Cj = (C00 * k0d[:, :, None] * k0d[:, None, :]
          + X01 * k0d[:, :, None] * k1d[:, None, :]
          + jnp.swapaxes(X01, 1, 2) * k1d[:, :, None] * k0d[:, None, :]
          + C11 * k1d[:, :, None] * k1d[:, None, :])

    Ainv_c = jnp.asarray(Ah[sl])
    Y_c = jnp.asarray(Yh[sl])
    di_c = jnp.asarray(di_h[sl], dtype=jnp.float64)
    djg_sel = jnp.asarray(djg)[jnp.asarray(
        np.minimum(jmap_np, len(djg) - 1))] * jnp.asarray(jmask_np)
    YS = xmatmul64(Y_c, Cj)
    cov_ii = (Ainv_c + xmatmul64(YS, jnp.swapaxes(Y_c, 1, 2))) \
        * di_c[:, :, None] * di_c[:, None, :]
    cov_ij = -YS * di_c[:, :, None] * djg_sel[:, None, :]
    cov_jj = Cj * djg_sel[:, :, None] * djg_sel[:, None, :]
    top = jnp.concatenate([cov_ii, cov_ij], axis=2)
    bot = jnp.concatenate([jnp.swapaxes(cov_ij, 1, 2), cov_jj], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def device_block_stats(da, bs, cov_factors=None, nested=None,
                       chunk: int = 16):
    """adj_prec per design row, adj_vcv3 per GNSS observation, and
    station-diagonal 3×3 covariance blocks — batched on device.

    da: the DeviceAssembly (projected A pools + tile plans);
    cov_factors: flat refined factors (newton_factors output), or
    nested=(factors, part) for the 3-level path.
    Returns (adj_prec (B, M) np.float64, vcv3 {(b, row0): (3,3)},
    cov3 (B, Pn, 3, 3) np.float64) — cov3 indexed by station slot."""
    B, M, P = da.B, da.M, da.Pp
    Pn = P // 3
    # one compiled program set: the chunk divides the block count AND
    # fits the HBM budget — the f64 A pool, the G = A·Ninv product, the
    # sliced-matmul transients (~4x the A pool) plus the (C, P, P)
    # covariance pools all scale with the chunk (a 9-block 3.3k-param
    # segmentation OOMs a 16 GB chip if all blocks go at once)
    budget = float(os.environ.get("DTA_STATS_CHUNK_BYTES", 4e9))
    # the depth-fused sliced products hold ~(NSLICES+2) f32 slice
    # copies of both operands in one program, alongside the f64 A/G
    # pools and the covariance block
    from ..ops.slicegemm import NSLICES
    per_block = ((NSLICES + 2) * 4.0 + 2 * 8.0) * (M * P + P * P)
    chunk = min(chunk, max(1, int(budget / per_block)))
    chunk = next(c for c in range(min(chunk, B), 0, -1) if B % c == 0)
    adj_prec = np.zeros((B, M))
    cov3 = np.zeros((B, Pn, 3, 3))
    vcv3 = {}
    gps_rows = da.gps_row_plan()          # per block: (rows0 array)

    for c0 in range(0, B, chunk):
        sl = slice(c0, min(c0 + chunk, B))
        jmap_c = jnp.asarray(bs.jmap[sl].astype(np.int32))
        jmask_c = jnp.asarray(bs.jmask[sl])
        if nested is None:
            Ainv, Y, Sinv, di, dj, djg, _ = cov_factors
            f = (Ainv[sl], Y[sl], Sinv, di[sl], dj[sl], djg, None)
            cov = _chunk_cov_flat(f, jmap_c, jmask_c)
        else:
            factors, part = nested
            cov = _chunk_cov_nested(factors, part, jmap_c, jmask_c, sl)
        A_c = da.a64_chunk(sl.start, sl.stop)
        G = xmatmul64(A_c, cov)                      # (C, M, P)
        ap = jnp.sum(G * A_c, axis=2)
        adj_prec[sl] = np.asarray(ap)
        # station-diagonal 3x3 blocks
        Cr = cov.reshape(cov.shape[0], Pn, 3, Pn, 3)
        idx = jnp.arange(Pn)
        d3 = Cr[:, idx, :, idx, :]                   # (Pn, C, 3, 3)
        cov3[sl] = np.transpose(np.asarray(d3), (1, 0, 2, 3))
        # GNSS 3x3 adjusted VCVs from gathered row triples
        for bi, b in enumerate(range(sl.start, sl.stop)):
            rows0 = gps_rows[b]
            if not len(rows0):
                continue
            r3 = jnp.asarray(rows0)[:, None] + jnp.arange(3)
            Gg = G[bi][r3, :]                        # (n, 3, P)
            Ag = A_c[bi][r3, :]
            v = np.asarray(jnp.einsum("nap,nbp->nab", Gg, Ag))
            for e, r0 in enumerate(rows0):
                vcv3[(b, int(r0))] = v[e]
    if nested is not None and hasattr(nested[0], "_l2_dev"):
        del nested[0]._l2_dev            # free the hoisted device pools
    return adj_prec, vcv3, cov3
