"""Device-side normals formation: N = AᵀV⁻¹A on the MXU per block.

This moves the reference's per-iteration hot loop — AᵀV⁻¹A assembly
(UpdateNormals_*/UpdateAtVinv, dnaadjust.cpp:1285-1833, multithreaded +
threaded BLAS there) — onto the TPU as batched matmuls over padded block
pools, replacing the host-numpy GEMM + block-system scatter that
dominated the warm iteration.

Design (TPU-first):
  * The design matrix A is filled on host (vectorised, adjust/vector_fill)
    but never shipped dense: its sparsity is ≤3 station tiles per scalar
    row and constant ±I tiles for GPS rows.  A constant base pool
    (GPS entries) is uploaded once; each re-linearisation uploads only
    the scalar-row tile VALUES ((K,3) float32 — a few MB at national
    scale) and a jitted scatter rebuilds the dense (B, M, P) pool.
  * Block columns are PERMUTED to [inner | junction] order up front, so
    the device product lands directly in the Nii/Nij/Njj pool layout —
    build_block_system becomes three slices.
  * The block-diagonal weight matrix V⁻¹ (scalar 1/var rows + direction
    set / GPS cluster k×k blocks) is device-resident and constant per
    topology; WA is a row scale plus a few batched small matmuls.
  * Hard-constraint elimination (constraint_elim.ConstraintBasis) is
    applied as a column projection of A on device (N~ = P N P follows),
    and the first-appearance diagonal terms are a constant 3×3 tile
    scatter-add.
  * Float64 residuals for iterative refinement come from host matvecs
    through the f64 A (O(Σ m·n) — tiny next to the GEMM), so the f32
    device product never limits the converged solution.

The same scatter plan re-used with float64 values gives the one-time
f64 normals pools the covariance stage needs (Newton refinement of the
f32 inverses) without a host GEMM pass.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, donate_argnums=(0,))
def _add_diag_tiles_donated(P, b, c3, v):
    return P.at[b[:, None, None], c3[:, :, None], c3[:, None, :]].add(v)


@jax.jit
def _compose_vals(const_vals, dyn_vals, dyn_pos):
    """Scatter the per-iteration (scalar) tile values into the constant
    (GPS) value vector — the device side of the dynamic/constant value
    split (per-iteration uploads carry only the scalar tiles)."""
    return const_vals.at[dyn_pos].set(dyn_vals.astype(const_vals.dtype))


@partial(jax.jit, donate_argnums=(0,))
def _upd_pool(P, g, b0):
    """Donated chunk write into a device pool (module-level jit — a
    per-call `jax.jit(lambda ...)` recompiles every adjustment)."""
    return jax.lax.dynamic_update_slice_in_dim(P, g, b0, 0)


@partial(jax.jit, static_argnames=("C", "M", "Pp", "ni"))
def _fused_gram_chunk(tb, tr, tc3, vhi, vlo, C, M, Pp, ni):
    """One fused program per f64-gram chunk: padded tile scatter (pad
    tiles land in the extra row M, dropped), the full-tier sliced gram
    (depth chunks unroll in-trace), and the ii/ij/jj split.  The
    scatter-then-op-by-op-gram form paid a tunnel dispatch per depth
    sub-chunk; a function-local jit paid a recompile per call."""
    from ..ops.slicegemm import gram_f64
    shape = (C, M + 1, Pp)
    Bhi = jnp.zeros(shape, jnp.float32).at[
        tb[:, None], tr[:, None], tc3].set(vhi)[:, :M]
    Blo = jnp.zeros(shape, jnp.float32).at[
        tb[:, None], tr[:, None], tc3].set(vlo)[:, :M]
    g = gram_f64(Bhi, Blo)
    return g[:, :ni, :ni], g[:, :ni, ni:], g[:, ni:, ni:]


@partial(jax.jit, donate_argnums=(0,))
def _scatter_scalar_tiles(A_base, bidx, ridx, c3, vals):
    """Write (K, 3) scalar-row tiles into the pooled design matrix.
    The base buffer is donated — callers pass a fresh zeros (or a
    single-use base) so the scatter updates in place instead of
    doubling a national-scale pool."""
    return A_base.at[bidx[:, None], ridx[:, None], c3].set(vals)


@partial(jax.jit, static_argnames=())
def _add_diag_tiles(N_pool, bidx, c3, vals):
    """Scatter-add (K, 3, 3) constraint/padding tiles onto the diagonal."""
    return N_pool.at[bidx[:, None, None], c3[:, :, None],
                     c3[:, None, :]].add(vals)


@lru_cache(maxsize=64)
def _build_prog(shape, ni, nbuckets, bc_budget, dtype_name,
                scatter_add=False, rows_used=None):
    """Module-cached fused normals-build program (scatter + projection
    + weight application + AᵀV⁻¹A + constraint diagonals + slicing).

    Cached at MODULE level keyed by shapes — repeated adjustments of
    same-shaped networks (warm bench runs, CI replays) re-trace
    nothing.  scatter_add=True is the block-chunked variant (pad tiles
    accumulate into a scratch row); rows_used bounds the gram product
    to the real design rows when the pool carries scratch rows."""
    dtype = np.dtype(dtype_name)
    M_used = rows_used if rows_used is not None else shape[1]

    def f(vals, tb, tr, tc3, wdiag, db, dc3, dv, bucket, proj):
        # vals may arrive f64 (shared upload with the fused refined
        # solve, device_solve.py) — cast to the pool dtype in-program
        vals = vals.astype(dtype)
        base = jnp.zeros(shape, vals.dtype)
        sl = base.at[tb[:, None], tr[:, None], tc3]
        A = sl.add(vals) if scatter_add else sl.set(vals)
        prb, prc3, prm = proj
        if prb.shape[0]:
            G = A[prb[:, None], :, prc3]       # (n, 3, rows)
            out = jnp.einsum("nkm,nkl->nlm", G, prm, precision=_HI)
            A = A.at[prb[:, None], :, prc3].set(out)
        WA = A * wdiag[:, :, None]
        for k, (bb, rr, VT) in zip(nbuckets, bucket):
            nE = bb.shape[0]
            ec = max(1, int(bc_budget / (k * shape[2] * 4)))
            for e0 in range(0, nE, ec):
                bbc = bb[e0:e0 + ec]
                rows = rr[e0:e0 + ec][:, None] + jnp.arange(k)
                G = A[bbc[:, None], rows, :]
                out = jnp.einsum("nij,njp->nip", VT[e0:e0 + ec], G,
                                 precision=_HI)
                WA = WA.at[bbc[:, None], rows, :].set(out)
        # row-chunked product: HIGHEST-precision f32 einsums
        # materialise 3x bf16 slice copies of both operands — chunking
        # the contraction keeps those slice transients to a few hundred
        # MB at national scale
        RC = 256
        N = None
        for m0 in range(0, M_used, RC):
            g = jnp.einsum("bmi,bmj->bij", A[:, m0:m0 + RC],
                           WA[:, m0:m0 + RC], precision=_HI)
            N = g if N is None else N + g
        N = N.at[db[:, None, None], dc3[:, :, None],
                 dc3[:, None, :]].add(dv)
        return N[:, :ni, :ni], N[:, :ni, ni:], N[:, ni:, ni:]

    return jax.jit(f)


class DeviceAssembly:
    """Per-topology compiled device assembly of the blocked normals.

    Built once from the blocks/partition; per iteration `build()` turns
    the freshly host-filled A matrices into device-resident
    (Nii, Nij, Njj) f32 pools plus host f64 (bi, bj) rhs pools.
    """

    def __init__(self, blocks, part, basis, first_fwd, dtype=np.float32,
                 mesh: Mesh = None, axis: str = "blocks"):
        self.blocks = blocks
        self.part = part
        self.basis = basis
        self.dtype = dtype
        self.mesh = mesh
        self.axis = axis
        B = len(blocks)
        self.B = B

        ki_l = [len(p[0]) for p in part]
        kj_l = [len(p[1]) for p in part]
        ni = max(ki_l) if ki_l else 3
        # pad an all-inner segmentation's junction dim to 3 (not 1): Pp
        # must stay a multiple of 3 for the per-station-column reshapes
        # (projection, Pmat, device_stats)
        nj = max(max(kj_l), 3) if kj_l else 3
        M = max(blk.asm.nrows for blk in blocks)
        self.ni, self.nj, self.M = ni, nj, M
        self.Pp = ni + nj                      # pooled params per block
        nj_global = int(max((int(np.max(p[2])) for p in part if len(p[2])),
                            default=-1)) + 1
        self.nj_global = nj_global

        # mesh: pad the block axis to a multiple of the device count so
        # every pool shards evenly (padded blocks are all-zero A rows +
        # identity Nii via the pad tiles below)
        if mesh is not None:
            ndev = mesh.shape[axis]
            self.Bp = ((B + ndev - 1) // ndev) * ndev
        else:
            self.Bp = B

        # ---- per-block station-slot permutation -------------------------
        # part[b] indices are station-granular triples; slot of station
        # with local index l: inner stations 0.., junction ni//3 + ..
        self._scol = []                         # (k_b,) station slot per blk
        jmap = np.full((self.Bp, nj), nj_global, dtype=np.int32)
        jmask = np.zeros((self.Bp, nj))
        imask = np.zeros((self.Bp, ni))
        for b, blk in enumerate(blocks):
            inner_p, junc_p, junc_g = part[b]
            k_b = len(blk.stations)
            scol = np.empty(k_b, dtype=np.int64)
            scol[inner_p[::3] // 3] = np.arange(len(inner_p) // 3)
            if len(junc_p):
                scol[junc_p[::3] // 3] = ni // 3 + \
                    np.arange(len(junc_p) // 3)
                jmap[b, :len(junc_g)] = junc_g
                jmask[b, :len(junc_g)] = 1.0
            imask[b, :len(inner_p)] = 1.0
            self._scol.append(scol)
        self.jmap_np, self.jmask_np, self.imask_np = jmap, jmask, imask

        if mesh is not None:
            from ..parallel.multihost import (shard_blocks, put_replicated,
                                              is_multiprocess)
            if is_multiprocess():
                self._putb = lambda x: shard_blocks(np.asarray(x), mesh,
                                                    P(axis))
                self._putr = lambda x: put_replicated(x, mesh)
            else:
                shard = NamedSharding(mesh, P(axis))
                repl = NamedSharding(mesh, P())
                self._putb = lambda x: jax.device_put(jnp.asarray(x),
                                                      shard)
                self._putr = lambda x: jax.device_put(jnp.asarray(x),
                                                      repl)
        else:
            self._putb = self._putr = jnp.asarray

        self._compile_tiles()
        self._compile_weights()
        self.set_constraints(first_fwd,
                             lambda b: blocks[b].Wc)

    # ------------------------------------------------------------------
    def _scalar_row_tiles(self, b):
        """(rows, local-station, flat-A-index) triples of every scalar
        design-row tile of block b, vectorised over the vector-fill
        buckets (row/l1/l2/l3 columnar arrays — no per-item Python)."""
        asm = self.blocks[b].asm
        n = asm.A.shape[1]
        if asm._vector_plan is None:
            from .vector_fill import VectorPlan
            asm._vector_plan = VectorPlan(asm)
        rows, locs = [], []
        for bk in asm._vector_plan.b.values():
            for l in (bk.l1, bk.l2, bk.l3):
                m = l >= 0
                rows.append(bk.row[m])
                locs.append(l[m] // 3)
        rows = (np.concatenate(rows) if rows
                else np.zeros(0, dtype=np.int64))
        locs = (np.concatenate(locs) if locs
                else np.zeros(0, dtype=np.int64))
        order = np.argsort(rows * n + 3 * locs, kind="stable")
        rows, locs = rows[order], locs[order]
        return rows, locs, rows * n + 3 * locs

    def _compile_tiles(self):
        """Tile scatter plan: scalar rows (values gathered from the host
        fill each iteration) + constant GPS ±e_k tiles.  Everything
        scatters into zeros per build — no persistent dense base pool
        (3.2 GB of HBM at national scale)."""
        bidx, ridx, cidx = [], [], []
        self._gather = []                       # per block (Kb, 3) flat idx
        self._gps_vals = []                     # per block (Kg, 3) const
        for b, blk in enumerate(self.blocks):
            asm = blk.asm
            scol = self._scol[b]
            rows, locs, src = self._scalar_row_tiles(b)
            self._gather.append(src[:, None] + np.arange(3))
            # constant GPS design tiles (±e_k at (row0+k, station)),
            # vectorised over the assembler's flat GNSS plan
            if not hasattr(asm, "_gps_rows"):
                asm._compile_gps_plan()
            r0 = asm._gps_rows
            gb_rows, gb_cols, gb_vals = [rows], [scol[locs]], [None]
            if len(r0):
                kk = np.arange(3)
                eye = np.eye(3)
                c1 = scol[asm._gps_l1 // 3]
                ymask = asm._gps_l2 < 0
                sign = np.where(ymask, 1.0, -1.0)
                gb_rows.append((r0[:, None] + kk).reshape(-1))
                gb_cols.append(np.repeat(c1, 3))
                gb_vals.append((sign[:, None, None] * eye).reshape(-1, 3))
                nz = ~ymask
                if nz.any():
                    c2 = scol[asm._gps_l2[nz] // 3]
                    gb_rows.append((r0[nz][:, None] + kk).reshape(-1))
                    gb_cols.append(np.repeat(c2, 3))
                    gb_vals.append(np.broadcast_to(
                        eye, (nz.sum(), 3, 3)).reshape(-1, 3))
            all_rows = np.concatenate(gb_rows)
            all_cols = np.concatenate(gb_cols)
            self._gps_vals.append(
                np.concatenate([v for v in gb_vals[1:]])
                if len(gb_vals) > 1 else np.zeros((0, 3)))
            bidx.append(np.full(len(all_rows), b, dtype=np.int32))
            ridx.append(all_rows)
            cidx.append(all_cols)
        self._t_b_h = np.concatenate(bidx).astype(np.int32)
        self._t_r_h = np.concatenate(ridx).astype(np.int32)
        c = np.concatenate(cidx).astype(np.int32)
        self._t_c3_h = (3 * c[:, None]
                        + np.arange(3, dtype=np.int32))
        self._t_b = self._putr(self._t_b_h)
        self._t_r = self._putr(self._t_r_h)
        self._t_c3 = self._putr(self._t_c3_h)
        # per-block combined tile counts (scalar then gps), for the
        # statistics pass's chunked fused scatter (device_stats)
        self._t_range = np.zeros(self.B + 1, dtype=np.int64)
        for b in range(self.B):
            self._t_range[b + 1] = self._t_range[b] + \
                len(self._gather[b]) + len(self._gps_vals[b])
        # split dynamic (scalar, re-gathered per linearisation) from
        # CONSTANT (GPS ±e_k) tile values: per-iteration uploads then
        # carry only the scalar tiles — roughly half the value traffic
        # on mixed networks (compose_values recombines on device)
        pos, off = [], 0
        const_vals = np.zeros((int(self._t_range[-1]), 3))
        for b in range(self.B):
            k_s = len(self._gather[b])
            k_g = len(self._gps_vals[b])
            pos.append(np.arange(off, off + k_s, dtype=np.int32))
            if k_g:
                const_vals[off + k_s:off + k_s + k_g] = self._gps_vals[b]
            off += k_s + k_g
        self._dyn_pos_h = np.concatenate(pos) if pos else \
            np.zeros(0, dtype=np.int32)
        self._dyn_pos = self._putr(self._dyn_pos_h)
        self._const_vals = self._putr(const_vals)

    def dyn_values(self, dtype=None):
        """Per-iteration (scalar-tile) values only — the dynamic half of
        scalar_values; GPS tiles are device constants."""
        dtype = dtype or self.dtype
        parts = [self.blocks[b].asm.A.ravel()[self._gather[b]]
                 for b in range(self.B)]
        if not parts:
            return np.zeros((0, 3), dtype=dtype)
        return np.concatenate(parts).astype(dtype)

    def compose_values(self, dyn_dev):
        """Device-side full tile-value vector from the uploaded dynamic
        values + the constant GPS tiles."""
        return _compose_vals(self._const_vals, dyn_dev, self._dyn_pos)

    def _compile_weights(self):
        """Device weight plan: scalar 1/var row scale + per-k bucketed
        Vᵀ stacks (constant per topology)."""
        wdiag = np.zeros((self.Bp, self.M))
        buckets = {}
        for b, blk in enumerate(self.blocks):
            asm = blk.asm
            if not hasattr(asm, "_w_rows"):
                asm._compile_weight_plan()
            if len(asm._w_rows):
                wdiag[b, asm._w_rows] = asm._w_diag
            for r0s, VT in asm._w_buckets:
                k = VT.shape[1]
                ent = buckets.setdefault(k, ([], [], []))
                ent[0].extend([b] * len(r0s))
                ent[1].extend(r0s.tolist())
                ent[2].append(VT)
        self.wdiag = self._putb(wdiag.astype(self.dtype))
        self._wdiag64_h = wdiag                 # host f64 master
        # the host plan stores Vᵀ stacks (assembler.py); transpose back to
        # V so WA = V·A and N = AᵀVA exactly matches the host convention
        self._v_buckets64_h = [
            (k, np.asarray(bb, dtype=np.int32),
             np.asarray(rr, dtype=np.int32),
             np.ascontiguousarray(np.concatenate(vv).transpose(0, 2, 1)))
            for k, (bb, rr, vv) in sorted(buckets.items())]
        self._vt_buckets = [
            (k, self._putr(bb), self._putr(rr),
             self._putr(V.astype(self.dtype)))
            for k, bb, rr, V in self._v_buckets64_h]

    def set_constraints(self, first_fwd, Wc_of_block):
        """Finish the constant diagonal tiles once Wc is available.

        Wc_of_block: callable b -> (k_b, 3, 3) per-station constraint
        weights (Block.Wc).  Mirrors phased._add_constraints +
        ConstraintBasis.transform_block's diagonal terms."""
        basis = self.basis
        cb, cc, cv = [], [], []
        for b, blk in enumerate(self.blocks):
            asm = blk.asm
            scol = self._scol[b]
            Wc = Wc_of_block(b)
            for g in first_fwd[b]:
                if g not in asm.local:
                    continue
                l = asm.local[g]
                D = basis.diag.get(g)
                cb.append(b)
                cc.append(scol[l])
                cv.append(D if D is not None else Wc[l])
            # identity padding of unused inner slots
            ki = len(self.part[b][0])
            for q in range(ki // 3, self.ni // 3):
                cb.append(b)
                cc.append(q)
                cv.append(np.eye(3))
        for b in range(self.B, self.Bp):        # mesh padding blocks
            for q in range(self.ni // 3):
                cb.append(b)
                cc.append(q)
                cv.append(np.eye(3))
        self._d_b_h = np.asarray(cb, dtype=np.int32)
        c = np.asarray(cc, dtype=np.int32)
        self._d_c3_h = 3 * c[:, None] + np.arange(3, dtype=np.int32)
        self._d_v_h = (np.stack(cv).astype(self.dtype)
                       if cv else np.zeros((0, 3, 3), dtype=self.dtype))
        self._d_b = self._putr(self._d_b_h)
        self._d_c3 = self._putr(self._d_c3_h)
        self._d_v = self._putr(self._d_v_h)
        self._d_v64_h = (np.stack(cv).astype(np.float64)
                         if cv else np.zeros((0, 3, 3)))
        self._d_v64 = self._putr(np.stack(cv).astype(np.float64)
                                 if cv else np.zeros((0, 3, 3)))

        # per-station projection matrices (identity unless constrained);
        # f64 master — the f32 cast is for the fast path only (a rounded
        # projector perturbs N entries at |N|·eps32, visible in the
        # covariance stage)
        Pm = np.zeros((self.Bp, self.Pp // 3, 3, 3))
        Pm[..., :, :] = np.eye(3)
        self._has_proj = False
        for b, blk in enumerate(self.blocks):
            scol = self._scol[b]
            for g, Pg in basis.proj.items():
                l = blk.asm.local.get(g)
                if l is not None:
                    Pm[b, scol[l]] = Pg
                    self._has_proj = True
        self.Pmat = self._putb(Pm.astype(self.dtype))
        self.Pmat64 = self._putb(Pm)
        del Pm

    # ------------------------------------------------------------------
    def scalar_values(self, dtype=None, b0=None, b1=None):
        """Current tile values — scalar rows gathered from the host A
        fill + constant GPS ±e_k tiles — (K, 3) in tile order, optionally
        restricted to blocks [b0, b1)."""
        dtype = dtype or self.dtype
        rng = range(b0 or 0, self.B if b1 is None else b1)
        parts = []
        for b in rng:
            parts.append(self.blocks[b].asm.A.ravel()[self._gather[b]])
            parts.append(self._gps_vals[b])
        if not parts:
            return np.zeros((0, 3), dtype=dtype)
        return np.concatenate(parts).astype(dtype)

    def _proj_host(self):
        """Host-side sparse constrained-column projection entries
        (block, 3-col index, 3x3 projector)."""
        if not hasattr(self, "_proj_host_cache"):
            pb, pc, pm = [], [], []
            for b, blk in enumerate(self.blocks):
                scol = self._scol[b]
                for g, Pg in self.basis.proj.items():
                    l = blk.asm.local.get(g)
                    if l is not None:
                        pb.append(b)
                        pc.append(int(scol[l]))
                        pm.append(Pg)
            self._proj_host_cache = (
                np.asarray(pb, dtype=np.int32),
                3 * np.asarray(pc, dtype=np.int32)[:, None]
                + np.arange(3, dtype=np.int32),
                np.stack(pm).astype(self.dtype)
                if pm else np.zeros((0, 3, 3), self.dtype))
        return self._proj_host_cache

    def _auto_chunk_blocks(self) -> int:
        """Blocks per fused-build chunk so the build's peak HBM stays
        under DTA_BUILD_HBM_BUDGET (default 6 GB): the fused program
        holds A + WA (each C·M·Pp f32) plus the HIGHEST-einsum bf16
        slice transients — ~3x C·M·Pp·4 bytes total — alongside the
        full output pools and the previous iteration's factors."""
        budget = float(os.environ.get("DTA_BUILD_HBM_BUDGET", 6e9))
        per_block = 3.0 * self.M * self.Pp * 4.0
        out_bytes = self.Bp * (self.ni ** 2 + self.ni * self.nj
                               + self.nj ** 2) * 4.0
        c = int(max(1.0, (budget - 2.0 * out_bytes) / per_block))
        return min(c, self.Bp)

    def build_device(self, values=None):
        """Assemble the (Nii, Nij, Njj) pools on device from the current
        host A fill — ONE fused jitted program (scatter, projection,
        weight application, AᵀV⁻¹A, constraint diagonals, slicing), so
        XLA's buffer assignment reuses the pool-sized intermediates
        instead of a chain of op-by-op dispatches each holding its
        operands live (the difference between ~7 GB and ~13 GB of HBM at
        national scale).  Past DTA_BUILD_HBM_BUDGET the build runs
        block-chunked (_build_device_chunked) — one compiled chunk
        program, uniform shapes — which is what lets the 100k-station
        resident configuration fit the single 16 GB chip."""
        if self.mesh is None:
            C = self._auto_chunk_blocks()
            if C < self.Bp:
                return self._build_device_chunked(C, values)
        vals = self._putr(values if values is not None
                          else self.scalar_values(self.dtype))
        if not hasattr(self, "_build_jit"):
            nbuckets = tuple(int(k) for k, _, _, _ in self._vt_buckets)
            # constrained-station projection as a sparse column update
            # (a full-pool reshape+einsum forces two 3 GB layout copies)
            proj_idx = self._proj_host()
            bc_budget = float(os.environ.get("DTA_BUCKET_CHUNK_BYTES",
                                             4e8))
            self._build_jit = _build_prog(
                (self.Bp, self.M, self.Pp), self.ni, nbuckets,
                bc_budget, np.dtype(self.dtype).name)
            self._proj_idx = tuple(self._putr(x) for x in proj_idx)
        return self._build_jit(
            vals, self._t_b, self._t_r, self._t_c3, self.wdiag,
            self._d_b, self._d_c3, self._d_v,
            tuple((bb, rr, VT) for _, bb, rr, VT in self._vt_buckets),
            self._proj_idx)

    # -- block-chunked fused build (single-chip national scale) ---------
    def _chunk_plan(self, C):
        """Per-chunk index arrays, PADDED to uniform counts so every
        chunk reuses ONE compiled program.  Padding conventions (all
        write-safe): tiles/diag pad to the scratch row / zero values
        with .add; weight-bucket entries pad to the scratch rows
        [M, M+k); projection entries pad with identity projectors."""
        Bp_c = ((self.Bp + C - 1) // C) * C
        nch = Bp_c // C
        B = self.B
        tr_ = self._t_range
        kmax = max([k for k, _, _, _ in self._v_buckets64_h] or [1])
        Ms = self.M + kmax                      # scratch rows at [M, M+k)

        # tiles
        tile_counts = []
        for c in range(nch):
            b0, b1 = c * C, min((c + 1) * C, B)
            tile_counts.append(int(tr_[min(b1, B)] - tr_[min(b0, B)])
                               if b0 < B else 0)
        Kc = max(max(tile_counts), 1)
        tiles = []
        for c in range(nch):
            b0 = c * C
            t0 = int(tr_[min(b0, B)])
            t1 = t0 + tile_counts[c]
            pad = Kc - tile_counts[c]
            tb = np.concatenate([self._t_b_h[t0:t1] - b0,
                                 np.zeros(pad, np.int32)])
            rr = np.concatenate([self._t_r_h[t0:t1],
                                 np.full(pad, self.M, np.int32)])
            c3 = np.concatenate([self._t_c3_h[t0:t1],
                                 np.tile(np.arange(3, dtype=np.int32),
                                         (pad, 1))])
            tiles.append((self._putr(tb.astype(np.int32)),
                          self._putr(rr.astype(np.int32)),
                          self._putr(c3.astype(np.int32)),
                          (t0, t1, pad)))

        # weight buckets, per k: pad entries to the per-k max per chunk
        buckets = []
        for k, bb, rr, V in self._v_buckets64_h:
            sel = [np.nonzero((bb >= c * C) & (bb < (c + 1) * C))[0]
                   for c in range(nch)]
            Ec = max(max(len(s) for s in sel), 1)
            per = []
            for c, s in enumerate(sel):
                pad = Ec - len(s)
                bbc = np.concatenate([bb[s] - c * C,
                                      np.zeros(pad, np.int32)])
                rrc = np.concatenate([rr[s],
                                      np.full(pad, self.M, np.int32)])
                Vc = np.concatenate(
                    [V[s], np.zeros((pad,) + V.shape[1:])]) \
                    .transpose(0, 2, 1)          # back to Vᵀ convention
                per.append((self._putr(bbc.astype(np.int32)),
                            self._putr(rrc.astype(np.int32)),
                            self._putr(np.ascontiguousarray(Vc)
                                       .astype(self.dtype))))
            buckets.append((int(k), per))

        # projection entries (identity padding)
        pb, pc3, pm = self._proj_host()
        psel = [np.nonzero((pb >= c * C) & (pb < (c + 1) * C))[0]
                for c in range(nch)]
        Pc = max(max(len(s) for s in psel), 0)
        projs = []
        eye = np.broadcast_to(np.eye(3, dtype=self.dtype), (1, 3, 3))
        for c, s in enumerate(psel):
            pad = Pc - len(s)
            projs.append((
                self._putr(np.concatenate(
                    [pb[s] - c * C, np.zeros(pad, np.int32)])
                    .astype(np.int32)),
                self._putr(np.concatenate(
                    [pc3[s], np.tile(np.arange(3, dtype=np.int32),
                                     (pad, 1))]).astype(np.int32)),
                self._putr(np.concatenate(
                    [pm[s]] + [np.repeat(eye, pad, 0)]).astype(self.dtype)
                    if pad else pm[s].astype(self.dtype))))

        # constraint/pad diagonal tiles (zero padding, .add)
        dsel = [np.nonzero((self._d_b_h >= c * C)
                           & (self._d_b_h < (c + 1) * C))[0]
                for c in range(nch)]
        Dc = max(max(len(s) for s in dsel), 1)
        diags = []
        for c, s in enumerate(dsel):
            pad = Dc - len(s)
            diags.append((
                self._putr(np.concatenate(
                    [self._d_b_h[s] - c * C, np.zeros(pad, np.int32)])
                    .astype(np.int32)),
                self._putr(np.concatenate(
                    [self._d_c3_h[s], np.tile(np.arange(3, dtype=np.int32),
                                              (pad, 1))]).astype(np.int32)),
                self._putr(np.concatenate(
                    [self._d_v_h[s],
                     np.zeros((pad, 3, 3), self._d_v_h.dtype)]))))

        # wdiag rows extended with zero scratch rows, pre-chunked
        wd = np.zeros((Bp_c, Ms), dtype=self.dtype)
        wd[:self.Bp, :self.M] = np.asarray(self.wdiag)
        wds = [self._putr(wd[c * C:(c + 1) * C]) for c in range(nch)]
        return {"C": C, "nch": nch, "Kc": Kc, "Ms": Ms, "tiles": tiles,
                "buckets": buckets, "projs": projs, "diags": diags,
                "wdiag": wds}

    def _build_device_chunked(self, C, values=None):
        if getattr(self, "_chunk_cache", None) is None or \
                self._chunk_cache["C"] != C:
            self._chunk_cache = self._chunk_plan(C)
            if hasattr(self, "_build_chunk_jit"):
                del self._build_chunk_jit   # chunk shape is baked in
        plan = self._chunk_cache
        Ms, ni = plan["Ms"], self.ni
        shape = (C, Ms, self.Pp)
        vals_all = (values if values is not None
                    else self.scalar_values(self.dtype))
        tr_ = self._t_range

        if not hasattr(self, "_build_chunk_jit"):
            nbuckets = tuple(k for k, _ in plan["buckets"])
            bc_budget = float(os.environ.get("DTA_BUCKET_CHUNK_BYTES",
                                             4e8))
            self._build_chunk_jit = _build_prog(
                shape, ni, nbuckets, bc_budget,
                np.dtype(self.dtype).name, scatter_add=True,
                rows_used=self.M)

        outs = []
        for c in range(plan["nch"]):
            tb, rr, c3, (t0, t1, pad) = plan["tiles"][c]
            v = np.concatenate([vals_all[t0:t1],
                                np.zeros((pad, 3), vals_all.dtype)]) \
                if pad else vals_all[t0:t1]
            db, dc3, dv = plan["diags"][c]
            out = self._build_chunk_jit(
                self._putr(np.ascontiguousarray(v)), tb, rr, c3,
                plan["wdiag"][c], db, dc3, dv,
                tuple(bk[1][c] for bk in plan["buckets"]),
                plan["projs"][c])
            # serialise chunk execution: async enqueue would keep every
            # chunk's A/WA workspaces alive at once (tunnel quirk: only a
            # host materialisation is a real barrier)
            np.asarray(out[0].ravel()[:1])
            outs.append(out)
        Nii = jnp.concatenate([o[0] for o in outs])[:self.Bp]
        Nij = jnp.concatenate([o[1] for o in outs])[:self.Bp]
        Njj = jnp.concatenate([o[2] for o in outs])[:self.Bp]
        return Nii, Nij, Njj

    def build_f64(self):
        """One-time near-f64 pools for the covariance stage.

        Formed as the Gram product N = B̃ᵀB̃ with B̃ = V^{-1/2}A (weighted,
        projected, permuted — assembled on host as sparse double-float
        tiles, scattered on device) through ops/slicegemm.xgram64: on
        TPU that is the mantissa-sliced exact bf16-MXU product (native
        f64 emulation measured ~5 GFLOP/s — unusable); on CPU a native
        f64 einsum.  Constraint/pad diagonal tiles are added exactly in
        f64 afterwards."""
        from ..ops.slicegemm import _use_sliced, NSLICES, split_f32_pair
        if not hasattr(self, "_g_idx"):
            self._compile_gram_plan()
        hi, lo = self._gram_values()
        gb, gr, gc3 = self._g_idx
        if not _use_sliced():
            shape = (self.Bp, self.M, self.Pp)
            Bhi = _scatter_scalar_tiles(jnp.zeros(shape, jnp.float32),
                                        gb, gr, gc3, self._putr(hi))
            Blo = _scatter_scalar_tiles(jnp.zeros(shape, jnp.float32),
                                        gb, gr, gc3, self._putr(lo))
            B64 = Bhi.astype(jnp.float64) + Blo.astype(jnp.float64)
            N = jnp.einsum("bmi,bmj->bij", B64, B64)
        else:
            # chunk scatter AND product over the block axis: the sliced
            # kernel materialises ~NSLICES f32 copies of its operand and
            # a full national-scale pool pair would blow HBM by itself.
            # Each chunk's gram lands in preallocated, DONATED output
            # pools — the former concatenate + full-pool diag add held
            # two extra copies of the 3 GB f64 pools and OOM'd the
            # 102,400-stn stats stage
            budget = float(os.environ.get("DTA_GRAM_CHUNK_BYTES", 2e9))
            per_block = self.M * self.Pp * 4.0 * (NSLICES + 4)
            want = max(1, int(budget / per_block))
            Bp = self.Bp
            C = next(c for c in range(min(want, Bp), 0, -1)
                     if Bp % c == 0)
            gr_np = self._g_range
            B = self.B
            ni, nj, Pp = self.ni, self.nj, self.Pp
            M = self.M
            gbh, grh, gc3h = self._g_idx_h
            upd = _upd_pool
            bounds = [(int(gr_np[min(b0, B)]),
                       int(gr_np[min(b0 + C, B)]))
                      for b0 in range(0, Bp, C)]
            Tmax = max(t1 - t0 for t0, t1 in bounds)
            Nii = jnp.zeros((Bp, ni, ni), jnp.float64)
            Nij = jnp.zeros((Bp, ni, nj), jnp.float64)
            Njj = jnp.zeros((Bp, nj, nj), jnp.float64)
            for ci, b0 in enumerate(range(0, Bp, C)):
                t0, t1 = bounds[ci]
                T = t1 - t0
                tb = np.zeros(Tmax, dtype=np.int32)
                tr = np.full(Tmax, M, dtype=np.int32)   # pad row
                tc3 = np.zeros((Tmax, 3), dtype=np.int32)
                tb[:T] = gbh[t0:t1] - b0
                tr[:T] = grh[t0:t1]
                tc3[:T] = gc3h[t0:t1]
                vhi = np.zeros((Tmax, 3), np.float32)
                vlo = np.zeros((Tmax, 3), np.float32)
                vhi[:T] = hi[t0:t1]
                vlo[:T] = lo[t0:t1]
                gii, gij, gjj = _fused_gram_chunk(
                    self._putr(tb), self._putr(tr), self._putr(tc3),
                    self._putr(vhi), self._putr(vlo),
                    C=C, M=M, Pp=Pp, ni=ni)
                Nii = upd(Nii, gii, b0)
                Nij = upd(Nij, gij, b0)
                Njj = upd(Njj, gjj, b0)
                np.asarray(Njj.ravel()[:1])  # real barrier (tunnel)
            # diagonal constraint/pad tiles, split by inner/junction
            # slot (donated adds — no full-pool copies)
            inner_sel = self._d_c3_h[:, 0] < 3 * (ni // 3)
            add = _add_diag_tiles_donated
            si = np.nonzero(inner_sel)[0]
            sj = np.nonzero(~inner_sel)[0]
            if len(si):
                Nii = add(Nii, self._putr(self._d_b_h[si]),
                          self._putr(self._d_c3_h[si]),
                          self._putr(self._d_v64_h[si]))
            if len(sj):
                Njj = add(Njj, self._putr(self._d_b_h[sj]),
                          self._putr(self._d_c3_h[sj] - ni),
                          self._putr(self._d_v64_h[sj]))
            return Nii, Nij, Njj
        N = _add_diag_tiles(N, self._d_b, self._d_c3, self._d_v64)
        ni = self.ni
        return N[:, :ni, :ni], N[:, :ni, ni:], N[:, ni:, ni:]

    def gps_row_plan(self):
        """Per block: array of GNSS observation base rows (row0 + 3i) —
        the rows whose 3×3 adjusted VCVs the reporting path prints."""
        if not hasattr(self, "_gps_rows_per_block"):
            out = []
            for blk in self.blocks:
                rows = []
                for g in blk.asm.gps_items:
                    rows.extend(g.row0 + 3 * i
                                for i in range(len(g.stations1)))
                out.append(np.asarray(rows, dtype=np.int64))
            self._gps_rows_per_block = out
        return self._gps_rows_per_block

    # -- gram (W^{1/2}A) tile plan --------------------------------------
    def _compile_gram_plan(self):
        """Sparse tile plan for B̃ = V^{-1/2}A: scalar rows keep A's
        sparsity with a √w row scale; direction-set/GPS-cluster rows are
        Lᵀ·A_rows (W = L·Lᵀ) over the union of the entry's stations.
        Tiles are (row, station) 3-vectors; values are recomputed per
        build from the current host A fill (gathers + small batched
        matmuls), and constrained-station tiles are projected on host."""
        self._g_scalar = []        # per block: (gather (K,3), sqrtw (K,),
                                   #            tile offset)
        self._flat_off = np.zeros(len(self.blocks) + 1, dtype=np.int64)
        for b, blk in enumerate(self.blocks):
            self._flat_off[b + 1] = self._flat_off[b] + blk.asm.A.size
        bucket_groups = {}
        T = 0
        scalar_parts = []          # (offset, b, rows, cols)
        self._g_range = np.zeros(len(self.blocks) + 1, dtype=np.int64)
        for b, blk in enumerate(self.blocks):
            self._g_range[b] = T
            asm = blk.asm
            n = asm.A.shape[1]
            scol = self._scol[b]
            if not hasattr(asm, "_w_rows"):
                asm._compile_weight_plan()
            # scalar (diagonal-weight) rows: the vector-plan tiles,
            # filtered to rows carrying a scalar weight (direction-set
            # angles belong to correlated buckets below)
            rows, locs, src = self._scalar_row_tiles(b)
            wrow = np.full(asm.nrows, np.nan)
            if len(asm._w_rows):
                # _w_diag is the weight 1/sigma^2; rows scale by sqrt(w)
                wrow[asm._w_rows] = np.sqrt(asm._w_diag)
            keep = np.isfinite(wrow[rows]) if len(rows) else \
                np.zeros(0, dtype=bool)
            rows, locs, src = rows[keep], locs[keep], src[keep]
            scalar_parts.append((T, b, rows, scol[locs]))
            self._g_scalar.append((src[:, None] + np.arange(3),
                                   wrow[rows], T))
            T += len(rows)
            # correlated-weight entries: direction sets + GPS clusters
            for obj in list(asm.dirn_sets) + list(asm.gps_items):
                k = obj.vinv.shape[0]
                r0 = obj.row0
                if hasattr(obj, "angles"):          # direction set
                    stns = sorted({s for a in obj.angles
                                   for s in (a.s1, a.s2, a.s3) if s >= 0})
                else:                               # GPS cluster
                    stns = sorted(set(obj.stations1) | set(obj.stations2))
                u = len(stns)
                cols = np.asarray([asm.local[s] for s in stns],
                                  dtype=np.int64)
                # block-LOCAL flat index (the gather reads each
                # block's own A view — concatenating all A pools into
                # one 2+ GB buffer measured 15 s on this host for a few
                # MB of gathered tiles)
                gidx = ((r0 + np.arange(k))[:, None] * n +
                        (3 * cols)[None, :])
                grp = bucket_groups.setdefault((k, u), ([], [], [], []))
                grp[0].append(gidx)                  # concat-flat indices
                grp[1].append(np.asarray(obj.vinv, dtype=np.float64))
                grp[2].append(T)                     # this entry's tiles
                grp[3].append((b, r0, scol[cols]))
                T += k * u
        self._g_range[len(self.blocks)] = T
        self._g_total = T
        # position-indexed scatter arrays + one batched Cholesky and one
        # vectorised index fill per (k, u) group — no per-entry Python
        gb_full = np.empty(T, dtype=np.int64)
        gr_full = np.empty(T, dtype=np.int64)
        gc_full = np.empty(T, dtype=np.int64)
        for off, b, rows, cols in scalar_parts:
            gb_full[off:off + len(rows)] = b
            gr_full[off:off + len(rows)] = rows
            gc_full[off:off + len(rows)] = cols
        self._g_buckets = []
        for (k, u), (gidxs, Vs, offs, meta) in sorted(
                bucket_groups.items()):
            offs = np.asarray(offs, dtype=np.int64)
            nE = len(offs)
            pos = offs[:, None] + np.arange(k * u)   # (nE, k*u)
            bs_ = np.asarray([m[0] for m in meta], dtype=np.int64)
            r0s = np.asarray([m[1] for m in meta], dtype=np.int64)
            cs = np.stack([m[2] for m in meta])      # (nE, u)
            p = pos.reshape(-1)
            gb_full[p] = np.repeat(bs_, k * u)
            gr_full[p] = (r0s[:, None, None] + np.arange(k)[:, None]
                          + np.zeros((1, 1, u), dtype=np.int64)) \
                .reshape(nE, -1).reshape(-1)
            gc_full[p] = np.broadcast_to(
                cs[:, None, :], (nE, k, u)).reshape(-1)
            V = np.stack(Vs)
            LT = np.linalg.cholesky(
                0.5 * (V + V.transpose(0, 2, 1))).transpose(0, 2, 1)
            self._g_buckets.append((k, u, np.stack(gidxs),
                                    np.ascontiguousarray(LT), pos, bs_))
        self._g_idx_h = (gb_full.astype(np.int32),
                         gr_full.astype(np.int32),
                         (3 * gc_full[:, None]
                          + np.arange(3)).astype(np.int32))
        self._g_idx = tuple(self._putr(a) for a in self._g_idx_h)
        # constrained-station tiles: projected on host (v ← v·P)
        self._g_proj = None
        if self.basis.proj:
            tile_station = {}       # (b, scol) -> P
            for b, blk in enumerate(self.blocks):
                scol = self._scol[b]
                for g, Pg in self.basis.proj.items():
                    l = blk.asm.local.get(g)
                    if l is not None:
                        tile_station[(b, int(scol[l]))] = Pg
            sel, mats = [], []
            for (b, c), Pg in tile_station.items():
                hit = np.nonzero((gb_full == b) & (gc_full == c))[0]
                sel.append(hit)
                mats.append(np.broadcast_to(Pg, (len(hit), 3, 3)))
            if sel:
                self._g_proj = (np.concatenate(sel),
                                np.concatenate(mats))

    def _gram_values(self):
        """Current B̃ tile values as a double-float (hi, lo) pair."""
        from ..ops.slicegemm import split_f32_pair
        vals = np.zeros((self._g_total, 3))
        for b, blk in enumerate(self.blocks):
            g, w, off = self._g_scalar[b]
            if len(g):
                vals[off:off + len(g)] = \
                    blk.asm.A.ravel()[g] * w[:, None]
        # per (k, u) group: B_rows = Lᵀ @ A_rows over the station union
        # — entries gathered from each block's OWN A view (block-local
        # indices), then one batched matmul
        flats = [blk.asm.A.ravel() for blk in self.blocks]
        for k, u, gidx, LT, pos, bb in self._g_buckets:
            nE = gidx.shape[0]
            idx3 = (gidx[:, :, :, None] + np.arange(3)) \
                .reshape(nE, k, 3 * u)
            G = np.empty((nE, k, 3 * u))
            for b in np.unique(bb):
                m = bb == b
                G[m] = flats[b][idx3[m]]
            out = LT @ G                             # (nE, k, 3u)
            vals[pos.reshape(-1)] = \
                out.reshape(nE, k, u, 3).reshape(-1, 3)
        if self._g_proj is not None:
            sel, mats = self._g_proj
            vals[sel] = np.einsum("tj,tjk->tk", vals[sel], mats)
        return split_f32_pair(vals)

    # ------------------------------------------------------------------
    # host-side f64: rhs pools and the refinement matvec
    # ------------------------------------------------------------------
    def _apply_v(self, asm, u):
        """V⁻¹ @ u on host f64 (scalar rows + bucketed blocks; same Vᵀ
        convention as Assembler.atvinv)."""
        out = np.zeros_like(u)
        if len(asm._w_rows):
            out[asm._w_rows] = u[asm._w_rows] * asm._w_diag
        for r0s, VT in asm._w_buckets:
            k = VT.shape[1]
            idx = r0s[:, None] + np.arange(k)
            # rows of V@u where the stored stack is Vᵀ: V u = Σ_k VT[k,i] u_k
            out[idx] = np.einsum("nki,nk->ni", VT, u[idx])
        return out

    def _project_strips(self, blk, v):
        for g, Pg in self.basis.proj.items():
            l = blk.asm.local.get(g)
            if l is not None:
                v[3 * l:3 * l + 3] = Pg @ v[3 * l:3 * l + 3]
        return v

    def rhs_pools(self):
        """Host f64 (bi, bj) pools: AᵀV⁻¹·mmc, projected + permuted."""
        bi = np.zeros((self.Bp, self.ni))
        bj = np.zeros((self.Bp, self.nj))
        for b, blk in enumerate(self.blocks):
            asm = blk.asm
            if not hasattr(asm, "_w_rows"):
                asm._compile_weight_plan()
            # rhs = Aᵀ (V mmc) — the host path's AtVinv@mmc is
            # (VᵀA)ᵀ mmc = Aᵀ V mmc, identical
            rhs = asm.A.T @ self._apply_v(asm, asm.mmc)
            rhs = self._project_strips(blk, rhs)
            inner_p, junc_p, _ = self.part[b]
            bi[b, :len(inner_p)] = rhs[inner_p]
            bj[b, :len(junc_p)] = rhs[junc_p]
        return bi, bj

    def matvec(self, xi, xj):
        """y = N x in f64 on host through A (the refinement residual
        operator): y = P AᵀV⁻¹A P x + C x per block, junction rows
        accumulated globally — replaces _block_matvec when no host f64
        normals exist."""
        yi = np.zeros((self.Bp, self.ni))
        yj = np.zeros(self.nj_global + 1)
        xj_pad = np.concatenate([np.asarray(xj, dtype=np.float64), [0.0]])
        for b, blk in enumerate(self.blocks):
            asm = blk.asm
            inner_p, junc_p, junc_g = self.part[b]
            n = asm.A.shape[1]
            x = np.zeros(n)
            x[inner_p] = xi[b][:len(inner_p)]
            if len(junc_p):
                x[junc_p] = xj_pad[junc_g]
            px = self._project_strips(blk, x.copy())
            u = asm.A @ px
            vu = self._apply_v(asm, u)
            y = asm.A.T @ vu
            y = self._project_strips(blk, y)
            # constant diagonal terms (constraints / basis pins)
            y += self._diag_matvec(b, x)
            yi[b, :len(inner_p)] = y[inner_p]
            if len(junc_p):
                np.add.at(yj, junc_g, y[junc_p])
        return yi, yj[:self.nj_global]

    def _diag_matvec(self, b, x):
        if not hasattr(self, "_diag_host"):
            self._diag_host = {}
        ent = self._diag_host.get(b)
        if ent is None:
            # rebuild the block's (station, 3x3) diag list from the tiles
            db = np.asarray(self._d_b)
            dc = np.asarray(self._d_c3)[:, 0] // 3
            dv = np.asarray(self._d_v64)
            sel = np.nonzero(db == b)[0]
            scol = self._scol[b]
            inv = {int(s): l for l, s in enumerate(scol)}
            rows, mats = [], []
            for t in sel:
                l = inv.get(int(dc[t]))
                if l is None:
                    continue                    # padding tile
                rows.append(l)
                mats.append(dv[t])
            ent = (np.asarray(rows, dtype=np.int64),
                   np.stack(mats) if mats else np.zeros((0, 3, 3)))
            self._diag_host[b] = ent
        rows, mats = ent
        y = np.zeros_like(x)
        if len(rows):
            xs = x[(3 * rows)[:, None] + np.arange(3)]
            ys = np.einsum("nij,nj->ni", mats, xs)
            np.add.at(y.reshape(-1, 3), rows, ys)
        return y
