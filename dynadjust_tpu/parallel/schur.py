"""TPU-native distributed block adjustment: two-level Schur complement.

This is the scalable redesign of the reference's sequential phased
adjustment (forward/reverse junction sweeps, dnaadjust.cpp:2756/3461).
Instead of a serial chain, every block eliminates its inner stations
independently — a batched dense factorization that maps straight onto the
MXU — and the junction (interface) system is reduced across blocks with a
single collective, solved once, and back-substituted in parallel:

    per block b (batched, sharded over devices):
        N_b = [Nii Nij; Nji Njj],  rhs_b = [bi; bj]
        S_b = Njj − Nji Nii⁻¹ Nij          (Schur complement onto junctions)
        t_b = bj − Nji Nii⁻¹ bi
    global junction system (psum over the mesh):
        S = Σ_b scatter(S_b),  t = Σ_b scatter(t_b)
        x_j = S⁻¹ t
    back-substitution (batched, sharded):
        x_i(b) = Nii⁻¹ (bi − Nij x_j(b))

This is algebraically identical to the simultaneous solution — the
cross-check the reference itself relies on (SURVEY §4.4) — and replaces
O(B) sequential block solves with O(1) batched ones plus one reduced
solve.  Mathematically it is a 2-level nested dissection; deeper trees are
a planned extension for very large junction systems.

Blocks are padded to uniform shapes: identity-padding on the diagonal
keeps padded Cholesky factorizations well-defined and the padded entries
inert (zero couplings, zero rhs).
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Scoped high precision: TPU f32 matmuls default to bfloat16 passes, which
# destroys the Schur-complement cancellation and iterative refinement.
_HI = jax.lax.Precision.HIGHEST


def _hard_sync(x):
    """Actually wait for a device value.  jax.block_until_ready is a
    silent no-op over the tunnel-attached device runtime in this
    environment — chunked dispatch loops that rely on it for workspace
    serialisation instead enqueue everything at once and exhaust HBM at
    national scale.  A 1-element host materialisation genuinely blocks
    (4-byte download).  DTA_SCHUR_NOSYNC=1 disables the barrier for
    small-problem timing runs (each sync costs a ~25 ms tunnel
    round-trip, which would dominate a benchmarked factor call)."""
    if os.environ.get("DTA_SCHUR_NOSYNC", "") == "1":
        return x
    np.asarray(x.ravel()[:1])
    return x


@dataclass
class BlockSystem:
    """Padded batched block normal systems.

    B blocks, ni_max inner params, nj_max junction params per block,
    nj_global total junction params.
    """
    Nii: np.ndarray         # (B, ni, ni)
    Nij: np.ndarray         # (B, ni, nj)
    Njj: np.ndarray         # (B, nj, nj)
    bi: np.ndarray          # (B, ni)
    bj: np.ndarray          # (B, nj)
    jmap: np.ndarray        # (B, nj) global junction param index (or filler)
    jmask: np.ndarray       # (B, nj) 1.0 for real junction params
    imask: np.ndarray       # (B, ni) 1.0 for real inner params
    nj_global: int

    # owner/scatter plans are pure topology — cached per BlockSystem so
    # no per-solve Python proportional to B*nj remains on the iteration
    # path (callers that rebuild normals for an unchanged topology should
    # carry them over via copy_topology_caches)
    _owner_idx_cache: tuple = None
    _owner_mask_cache: np.ndarray = None

    def owner_indices(self):
        """(flat positions, global ids): one owner slot per junction
        param (see _owner_indices)."""
        if self._owner_idx_cache is None:
            self._owner_idx_cache = _owner_indices(self.jmap, self.jmask)
        return self._owner_idx_cache

    def owner_mask(self):
        if self._owner_mask_cache is None:
            self._owner_mask_cache = _owner_mask(self.jmap, self.jmask)
        return self._owner_mask_cache

    def copy_topology_caches(self, other: "BlockSystem"):
        """Adopt another system's cached plans (same jmap/jmask)."""
        self._owner_idx_cache = other._owner_idx_cache
        self._owner_mask_cache = other._owner_mask_cache


def _pad_to(x, shape):
    out = np.zeros(shape, dtype=x.dtype)
    sl = tuple(slice(0, s) for s in x.shape)
    out[sl] = x
    return out


def build_block_system(block_N, block_rhs, block_inner_idx, block_junc_idx,
                       junction_global_idx, dtype=np.float64) -> BlockSystem:
    """Assemble a BlockSystem from per-block dense normals.

    block_N[b]: (n_b, n_b) full block normals (inner+junction params)
    block_rhs[b]: (n_b,)
    block_inner_idx[b]: local param indices of inner params
    block_junc_idx[b]: local param indices of junction params
    junction_global_idx[b]: global junction param index for each junction
        param of block b
    """
    B = len(block_N)
    ni = max((len(i) for i in block_inner_idx), default=1) or 1
    nj = max((len(j) for j in block_junc_idx), default=1) or 1
    nj_global = int(max((np.max(g) for g in junction_global_idx
                         if len(g)), default=-1)) + 1

    Nii = np.zeros((B, ni, ni), dtype=dtype)
    Nij = np.zeros((B, ni, nj), dtype=dtype)
    Njj = np.zeros((B, nj, nj), dtype=dtype)
    bi = np.zeros((B, ni), dtype=dtype)
    bj = np.zeros((B, nj), dtype=dtype)
    jmap = np.zeros((B, nj), dtype=np.int32)
    jmask = np.zeros((B, nj), dtype=dtype)
    imask = np.zeros((B, ni), dtype=dtype)

    for b in range(B):
        ii = np.asarray(block_inner_idx[b], dtype=np.int64)
        jj = np.asarray(block_junc_idx[b], dtype=np.int64)
        N = np.asarray(block_N[b], dtype=dtype)
        r = np.asarray(block_rhs[b], dtype=dtype)
        ki, kj = len(ii), len(jj)
        Nii[b, :ki, :ki] = N[np.ix_(ii, ii)]
        if kj:
            Nij[b, :ki, :kj] = N[np.ix_(ii, jj)]
            Njj[b, :kj, :kj] = N[np.ix_(jj, jj)]
            bj[b, :kj] = r[jj]
            jmap[b, :kj] = junction_global_idx[b]
            jmask[b, :kj] = 1.0
        bi[b, :ki] = r[ii]
        imask[b, :ki] = 1.0
        # identity padding keeps the factorization defined
        for k in range(ki, ni):
            Nii[b, k, k] = 1.0
        # padded junction slots map to a scratch global slot (masked out)
        jmap[b, kj:] = nj_global
    return BlockSystem(Nii=Nii, Nij=Nij, Njj=Njj, bi=bi, bj=bj,
                       jmap=jmap, jmask=jmask, imask=imask,
                       nj_global=nj_global)


# ---------------------------------------------------------------------------
# single-device (or host) batched solve
# ---------------------------------------------------------------------------

def _unity_scale(Nii, Nij, Njj, bi, bj, jmap, jmask, nj_total,
                 axis=None):
    """Diagonal unity scaling of the full blocked system.

    The reference's --scale-normals-to-unity (Solve, dnaadjust.cpp:6614)
    generalised to the blocked layout: junction parameters appear in
    several blocks, so their global diagonal is reduced first (psum over
    the mesh in the sharded path) to keep one consistent scale factor per
    parameter.  Essential for float32 factorizations on the MXU — the
    constraint dynamic range otherwise swamps the f32 mantissa.
    Returns scaled system + (di, dj_block) scale factors."""
    dii = jnp.diagonal(Nii, axis1=-2, axis2=-1)
    djj = jnp.diagonal(Njj, axis1=-2, axis2=-1) * jmask
    dj_global = jnp.zeros((nj_total,), dtype=Njj.dtype)
    dj_global = dj_global.at[jmap.reshape(-1)].add(djj.reshape(-1))
    if axis is not None:
        dj_global = jax.lax.psum(dj_global, axis)
    dj_global = jnp.where(dj_global <= 0.0, 1.0, dj_global)
    djg = 1.0 / jnp.sqrt(dj_global)            # (nj_total,) global factors
    di = 1.0 / jnp.sqrt(jnp.where(dii <= 0.0, 1.0, dii))
    dj = djg[jmap]
    dj = jnp.where(jmask > 0, dj, 1.0)
    Nii = Nii * di[:, :, None] * di[:, None, :]
    Nij = Nij * di[:, :, None] * dj[:, None, :]
    Njj = Njj * dj[:, :, None] * dj[:, None, :]
    bi = bi * di
    bj = bj * dj
    return Nii, Nij, Njj, bi, bj, di, dj, djg


def _block_reduce(Nii, Nij, Njj, bi, bj, jmask):
    """Per-block inner elimination → (S_b, t_b, chol(Nii), Nii⁻¹Nij,
    Nii⁻¹bi).  All batched; runs on the MXU for the triangular solves and
    matmuls."""
    L = jnp.linalg.cholesky(Nii)
    # Y = Nii^-1 Nij via two triangular solves
    Y = jax.scipy.linalg.cho_solve((L, True), Nij)
    w = jax.scipy.linalg.cho_solve((L, True), bi[..., None])[..., 0]
    S_b = Njj - jnp.einsum("bki,bkj->bij", Nij, Y, precision=_HI)
    t_b = bj - jnp.einsum("bki,bk->bi", Nij, w, precision=_HI)
    # mask padded junction rows/cols so scatters stay inert
    S_b = S_b * jmask[:, :, None] * jmask[:, None, :]
    t_b = t_b * jmask
    return S_b, t_b, L, Y, w


def _scatter_junction(S_b, t_b, jmap, nj_total):
    """Scatter-add per-block Schur pieces into the global junction system."""
    B, nj = t_b.shape
    S = jnp.zeros((nj_total, nj_total), dtype=S_b.dtype)
    t = jnp.zeros((nj_total,), dtype=t_b.dtype)
    # flatten scatter: S[jmap[b,i], jmap[b,j]] += S_b[b,i,j]
    idx_i = jnp.repeat(jmap[:, :, None], nj, axis=2).reshape(-1)
    idx_j = jnp.repeat(jmap[:, None, :], nj, axis=1).reshape(-1)
    S = S.at[idx_i, idx_j].add(S_b.reshape(-1))
    t = t.at[jmap.reshape(-1)].add(t_b.reshape(-1))
    return S, t


def _solve_junction(S, t, nj_real):
    """Solve the reduced junction system (identity-pad the scratch slot)."""
    n = S.shape[0]
    # pad diagonal for scratch/unused slots
    diag = jnp.diag(S)
    S = S + jnp.diag(jnp.where(diag == 0.0, 1.0, 0.0))
    Lj = jnp.linalg.cholesky(S)
    xj = jax.scipy.linalg.cho_solve((Lj, True), t)
    return xj, Lj


@partial(jax.jit, static_argnames=("nj_total", "scale", "axis"))
def _schur_solve_jit(Nii, Nij, Njj, bi, bj, jmap, jmask, nj_total,
                     scale=True, axis=None):
    if scale:
        Nii, Nij, Njj, bi, bj, di, dj, djg = _unity_scale(
            Nii, Nij, Njj, bi, bj, jmap, jmask, nj_total, axis)
    S_b, t_b, L, Y, w = _block_reduce(Nii, Nij, Njj, bi, bj, jmask)
    S, t = _scatter_junction(S_b, t_b, jmap, nj_total)
    if axis is not None:
        S = jax.lax.psum(S, axis)
        t = jax.lax.psum(t, axis)
    xj, _ = _solve_junction(S, t, nj_total)
    xj_b = xj[jmap] * jmask                     # (B, nj) gather
    xi = w - jnp.einsum("bij,bj->bi", Y, xj_b, precision=_HI)
    if scale:
        # unscale: xi by block factors, xj by the (replicated) global
        # junction factors
        xi = xi * di
        xj = xj * djg
    return xi, xj


def schur_solve(bs: BlockSystem, scale: bool = True):
    """Solve the full system via batched two-level Schur reduction.

    Returns (xi (B, ni), xj (nj_global,)) — inner corrections per block and
    global junction corrections."""
    nj_total = bs.nj_global + 1     # one scratch slot for padded entries
    xi, xj = _schur_solve_jit(
        jnp.asarray(bs.Nii), jnp.asarray(bs.Nij), jnp.asarray(bs.Njj),
        jnp.asarray(bs.bi), jnp.asarray(bs.bj), jnp.asarray(bs.jmap),
        jnp.asarray(bs.jmask), nj_total, scale)
    return np.asarray(xi), np.asarray(xj)[:bs.nj_global]


# ---------------------------------------------------------------------------
# multi-device sharded solve (blocks sharded over the mesh)
# ---------------------------------------------------------------------------

def schur_solve_sharded(bs: BlockSystem, mesh: Mesh, axis: str = "blocks",
                        scale: bool = True):
    """Mesh-sharded solve: blocks distributed over `axis`; the junction
    reduction rides a psum over ICI; the junction solve is replicated and
    back-substitution runs shard-local.

    The block batch must be padded to a multiple of the mesh axis size.
    """
    ndev = mesh.shape[axis]
    B = bs.Nii.shape[0]
    Bp = ((B + ndev - 1) // ndev) * ndev
    nj_total = bs.nj_global + 1

    def pad(x):
        if x.shape[0] == Bp:
            return x
        pad_width = [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1)
        out = np.pad(x, pad_width)
        return out

    Nii = pad(bs.Nii).copy()
    # identity-pad the extra blocks' Nii so cholesky stays defined
    for b in range(B, Bp):
        Nii[b] = np.eye(Nii.shape[1], dtype=Nii.dtype)
    Nij = pad(bs.Nij)
    Njj = pad(bs.Njj)
    bi = pad(bs.bi)
    bj = pad(bs.bj)
    jmap = pad(bs.jmap)
    jmask = pad(bs.jmask)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                       P(axis), P(axis)),
             out_specs=(P(axis), P()))
    def solve(Nii, Nij, Njj, bi, bj, jmap, jmask):
        return _schur_solve_jit(Nii, Nij, Njj, bi, bj, jmap, jmask,
                                nj_total, scale, axis)

    fn = jax.jit(solve)
    xi, xj = fn(jnp.asarray(Nii), jnp.asarray(Nij), jnp.asarray(Njj),
                jnp.asarray(bi), jnp.asarray(bj), jnp.asarray(jmap),
                jnp.asarray(jmask))
    return np.asarray(xi)[:B], np.asarray(xj)[:bs.nj_global]


# ---------------------------------------------------------------------------
# mixed-precision refined solve (f32 factorization + f64 residuals)
# ---------------------------------------------------------------------------

def _block_matvec(bs: BlockSystem, xi, xj):
    """y = N x for the blocked system, in float64 on host (native C++
    kernel when built — ops.block_matvec — else numpy einsum).

    Junction rows accumulate across blocks (the same scatter structure as
    the Schur reduction)."""
    from ..ops import block_matvec as _native_mv
    xj_pad = np.concatenate([xj, [0.0]])     # scratch slot for padded maps
    xj_b = xj_pad[bs.jmap] * bs.jmask
    yi, yj_b = _native_mv(bs.Nii, bs.Nij, bs.Njj, xi, xj_b)
    yj_b = yj_b * bs.jmask
    yj = np.zeros(bs.nj_global + 1)
    np.add.at(yj, bs.jmap.reshape(-1), yj_b.reshape(-1))
    return yi * bs.imask, yj[:bs.nj_global]


def _gather_rhs_junction(bs: BlockSystem):
    t = np.zeros(bs.nj_global + 1)
    np.add.at(t, bs.jmap.reshape(-1), (bs.bj * bs.jmask).reshape(-1))
    return t[:bs.nj_global]


def schur_solve_refined(bs: BlockSystem, mesh=None, axis: str = "blocks",
                        refine: int = 2, dtype=np.float32):
    """Mixed-precision blocked solve: the factorization-heavy Schur solve
    runs in `dtype` (float32 on the TPU MXU); `refine` rounds of iterative
    refinement with float64 residuals computed on host recover near-f64
    accuracy (contraction ~ kappa_scaled * eps_f32 per round).

    This is the TPU answer to the reference's f64 LAPACK requirement: the
    hardware has no native f64 MXU path, so precision is restored through
    residual refinement instead (SURVEY §7 'hard parts').
    """
    def lowp(b):
        return BlockSystem(
            Nii=b.Nii.astype(dtype), Nij=b.Nij.astype(dtype),
            Njj=b.Njj.astype(dtype), bi=b.bi.astype(dtype),
            bj=b.bj.astype(dtype), jmap=b.jmap,
            jmask=b.jmask.astype(dtype), imask=b.imask.astype(dtype),
            nj_global=b.nj_global)

    def solve_low(rhs_i, rhs_j_blocks):
        low = lowp(BlockSystem(
            Nii=bs.Nii, Nij=bs.Nij, Njj=bs.Njj, bi=rhs_i, bj=rhs_j_blocks,
            jmap=bs.jmap, jmask=bs.jmask, imask=bs.imask,
            nj_global=bs.nj_global))
        if mesh is not None:
            return schur_solve_sharded(low, mesh, axis)
        return schur_solve(low)

    xi, xj = solve_low(bs.bi, bs.bj)
    xi = np.asarray(xi, dtype=np.float64)
    xj = np.asarray(xj, dtype=np.float64)

    rhs_j_global = _gather_rhs_junction(bs)
    for _ in range(refine):
        yi, yj = _block_matvec(bs, xi, xj)
        ri = (bs.bi * bs.imask) - yi
        rj = rhs_j_global - yj
        # distribute the junction residual back to per-block rhs slots:
        # give the full residual to one owner block per junction param
        rj_b = np.zeros_like(bs.bj)
        gi, gg = bs.owner_indices()      # cached per topology
        rj_b.reshape(-1)[gi] = rj[gg]
        di, dj = solve_low(ri, rj_b)
        xi = xi + np.asarray(di, dtype=np.float64)
        xj = xj + np.asarray(dj, dtype=np.float64)
    return xi, xj


# ---------------------------------------------------------------------------
# factor-once / apply-many (iterative refinement fast path)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nj_total",))
def _schur_factor_jit(Nii, Nij, Njj, jmap, jmask, nj_total):
    """Factor the blocked system once: returns (L, Y, Lj, di, dj, djg) —
    block Cholesky factors, eliminated coupling, junction factor, and the
    unity-scaling factors."""
    zero_b = jnp.zeros_like(Nii[..., 0])
    zero_j = jnp.zeros_like(Njj[..., 0])
    Nii_s, Nij_s, Njj_s, _, _, di, dj, djg = _unity_scale(
        Nii, Nij, Njj, zero_b, zero_j, jmap, jmask, nj_total, None)
    L = jnp.linalg.cholesky(Nii_s)
    Y = jax.scipy.linalg.cho_solve((L, True), Nij_s)
    S_b = Njj_s - jnp.einsum("bki,bkj->bij", Nij_s, Y, precision=_HI)
    S_b = S_b * jmask[:, :, None] * jmask[:, None, :]
    S = jnp.zeros((nj_total, nj_total), dtype=S_b.dtype)
    idx_i = jnp.repeat(jmap[:, :, None], jmap.shape[1], axis=2).reshape(-1)
    idx_j = jnp.repeat(jmap[:, None, :], jmap.shape[1], axis=1).reshape(-1)
    S = S.at[idx_i, idx_j].add(S_b.reshape(-1))
    diag = jnp.diag(S)
    S = S + jnp.diag(jnp.where(diag == 0.0, 1.0, 0.0))
    Lj = jnp.linalg.cholesky(S)
    return L, Y, Lj, di, dj, djg, jnp.asarray(Nij_s)


def _schur_apply_core(L, Y, Lj, di, dj, djg, Nij_s, bi, bj, jmap, jmask,
                      nj_total, axis=None):
    """Solve with precomputed factors (triangular solves only)."""
    bi = bi * di
    bj = bj * dj
    w = jax.scipy.linalg.cho_solve((L, True), bi[..., None])[..., 0]
    t_b = (bj - jnp.einsum("bki,bk->bi", Nij_s, w, precision=_HI)) * jmask
    t = jnp.zeros((nj_total,), dtype=t_b.dtype)
    t = t.at[jmap.reshape(-1)].add(t_b.reshape(-1))
    if axis is not None:
        t = jax.lax.psum(t, axis)
    xj = jax.scipy.linalg.cho_solve((Lj, True), t)
    xj_b = xj[jmap] * jmask
    xi = (w - jnp.einsum("bij,bj->bi", Y, xj_b, precision=_HI)) * di
    return xi, xj * djg


_schur_apply_jit = partial(jax.jit, static_argnames=("nj_total",))(
    _schur_apply_core)


@partial(jax.jit, static_argnames=("nj_total", "axis"))
def _schur_factor_inv_jit(Nii, Nij, Njj, jmap, jmask, nj_total,
                          axis=None):
    """Explicit-inverse factorization (the reference's dpotrf+dpotri,
    dnamatrix_contiguous.cpp:963-1006): returns (Ainv, Y, Sinv, di, dj,
    djg, Nij_s).  Uses the blocked tiled factorization (ops/blocked_chol)
    — measured 1.4x faster than XLA's monolithic cholesky+triangular
    solves on TPU — and makes every apply a pure MXU matmul (triangular
    solves are the slow op on TPU)."""
    from ..ops.blocked_chol import block_reduce
    zero_b = jnp.zeros_like(Nii[..., 0])
    zero_j = jnp.zeros_like(Njj[..., 0])
    Nii_s, Nij_s, Njj_s, _, _, di, dj, djg = _unity_scale(
        Nii, Nij, Njj, zero_b, zero_j, jmap, jmask, nj_total, axis)
    Ainv, Y, S_b = block_reduce(Nii_s, Nij_s, Njj_s)
    S_b = S_b * jmask[:, :, None] * jmask[:, None, :]
    S = jnp.zeros((nj_total, nj_total), dtype=S_b.dtype)
    idx_i = jnp.repeat(jmap[:, :, None], jmap.shape[1], axis=2).reshape(-1)
    idx_j = jnp.repeat(jmap[:, None, :], jmap.shape[1], axis=1).reshape(-1)
    S = S.at[idx_i, idx_j].add(S_b.reshape(-1))
    if axis is not None:
        S = jax.lax.psum(S, axis)
    diag = jnp.diag(S)
    S = S + jnp.diag(jnp.where(diag == 0.0, 1.0, 0.0))
    from ..ops.recursive_inv import spd_inverse_rec_safe
    Sinv = spd_inverse_rec_safe(S[None])[0]
    return Ainv, Y, Sinv, di, dj, djg, Nij_s


@partial(jax.jit, static_argnames=("nj_total",))
def _schur_factor_inv64_jit(Nii, Nij, Njj, jmap, jmask, nj_total):
    """Full-f64 explicit-inverse factorization on device (emulated f64 —
    slower than f32+MXU but exact).  Needed for ill-conditioned real
    networks (angular weights + constraints push the scaled condition
    number past what f32 factorization + refinement can recover:
    contraction ~ kappa_s * eps32 stalls near 1)."""
    zero_b = jnp.zeros_like(Nii[..., 0])
    zero_j = jnp.zeros_like(Njj[..., 0])
    Nii_s, Nij_s, Njj_s, _, _, di, dj, djg = _unity_scale(
        Nii, Nij, Njj, zero_b, zero_j, jmap, jmask, nj_total, None)
    L = jnp.linalg.cholesky(Nii_s)
    eye = jnp.eye(Nii_s.shape[1], dtype=Nii_s.dtype)
    Ainv = jax.scipy.linalg.cho_solve(
        (L, True), jnp.broadcast_to(eye, Nii_s.shape))
    Y = jnp.einsum("bij,bjk->bik", Ainv, Nij_s)
    S_b = Njj_s - jnp.einsum("bki,bkj->bij", Nij_s, Y)
    S_b = S_b * jmask[:, :, None] * jmask[:, None, :]
    S = jnp.zeros((nj_total, nj_total), dtype=S_b.dtype)
    idx_i = jnp.repeat(jmap[:, :, None], jmap.shape[1], axis=2).reshape(-1)
    idx_j = jnp.repeat(jmap[:, None, :], jmap.shape[1], axis=1).reshape(-1)
    S = S.at[idx_i, idx_j].add(S_b.reshape(-1))
    diag = jnp.diag(S)
    S = S + jnp.diag(jnp.where(diag == 0.0, 1.0, 0.0))
    Lj = jnp.linalg.cholesky(S)
    Sinv = _chunked_spd_inverse(Lj)
    return Ainv, Y, Sinv, di, dj, djg, Nij_s


@partial(jax.jit, static_argnames=("nj_total", "max_rounds", "tol",
                                   "sliced", "nslices", "cross_max"))
def _newton_flat_junction(S_b, jmap, jmask64, Sinv32, nj_total,
                          max_rounds, tol, sliced, nslices, cross_max):
    """Scatter the per-block refined f64 Schur pieces into the global
    junction system and residual-driven Newton-refine its inverse from
    the f32 one — the junction half of the flat covariance refinement
    (the variance-extraction counterpart of the reference's f64 dpotri,
    dnamatrix_contiguous.cpp:996-1006).  Returns (Sinv64, err) with the
    measured max|I − S·Sinv| as evidence."""
    from ..ops.slicegemm import mm64
    mm = partial(mm64, sliced=sliced, nslices=nslices,
                 cross_max=cross_max)
    S_b = S_b * jmask64[:, :, None] * jmask64[:, None, :]
    S = jnp.zeros((nj_total, nj_total), dtype=jnp.float64)
    nj = jmap.shape[1]
    idx_i = jnp.repeat(jmap[:, :, None], nj, axis=2).reshape(-1)
    idx_j = jnp.repeat(jmap[:, None, :], nj, axis=1).reshape(-1)
    S = S.at[idx_i, idx_j].add(S_b.reshape(-1))
    diag = jnp.diag(S)
    S = S + jnp.diag(jnp.where(diag == 0.0, 1.0, 0.0))
    Si, _, err = _newton_loop(Sinv32, S, mm, max_rounds, tol)
    return Si, err


@jax.jit
def _scale_nij64(Nij64, di, dj):
    """Unity-scaled f64 coupling pool (elementwise — no slice
    transients)."""
    di64 = di.astype(jnp.float64)
    dj64 = dj.astype(jnp.float64)
    return Nij64 * di64[:, :, None] * dj64[:, None, :]


def _schur_apply_inv_core(Ainv, Y, Sinv, di, dj, djg, Nij_s, bi, bj,
                          jmap, jmask, nj_total, axis=None):
    """Solve with explicit inverses — matmuls only (MXU)."""
    bi = bi * di
    bj = bj * dj
    w = jnp.einsum("bij,bj->bi", Ainv, bi, precision=_HI)
    t_b = (bj - jnp.einsum("bki,bk->bi", Nij_s, w, precision=_HI)) * jmask
    t = jnp.zeros((nj_total,), dtype=t_b.dtype)
    t = t.at[jmap.reshape(-1)].add(t_b.reshape(-1))
    if axis is not None:
        t = jax.lax.psum(t, axis)
    xj = jnp.einsum("ij,j->i", Sinv, t, precision=_HI)
    xj_b = xj[jmap] * jmask
    xi = (w - jnp.einsum("bij,bj->bi", Y, xj_b, precision=_HI)) * di
    return xi, xj * djg


class SchurFactors:
    """Device-resident factorization of a BlockSystem (dtype-cast once)."""

    def __init__(self, bs: BlockSystem, dtype=np.float32):
        self.bs = bs
        self.nj_total = bs.nj_global + 1
        self.jmap = jnp.asarray(bs.jmap)
        self.jmask = jnp.asarray(bs.jmask.astype(dtype))
        self.dtype = dtype
        self.factors = _schur_factor_jit(
            jnp.asarray(bs.Nii.astype(dtype)),
            jnp.asarray(bs.Nij.astype(dtype)),
            jnp.asarray(bs.Njj.astype(dtype)),
            self.jmap, self.jmask, self.nj_total)

    def solve(self, bi, bj):
        xi, xj = _schur_apply_jit(*self.factors,
                                  jnp.asarray(bi.astype(self.dtype)),
                                  jnp.asarray(bj.astype(self.dtype)),
                                  self.jmap, self.jmask, self.nj_total)
        return (np.asarray(xi, dtype=np.float64),
                np.asarray(xj, dtype=np.float64)[:self.bs.nj_global])


def schur_solve_factored(bs: BlockSystem, refine: int = 2,
                         dtype=np.float32, factors: SchurFactors = None):
    """Mixed-precision solve with factorization reuse: factor once in
    `dtype`, then 1 + `refine` cheap triangular-solve applications with
    float64 residual refinement on host."""
    if factors is None:
        factors = SchurFactors(bs, dtype)
    xi, xj = factors.solve(bs.bi, bs.bj)
    rhs_j_global = _gather_rhs_junction(bs)
    gi, gg = bs.owner_indices()      # cached per topology
    for _ in range(refine):
        yi, yj = _block_matvec(bs, xi, xj)
        ri = (bs.bi * bs.imask) - yi
        rj = rhs_j_global - yj
        rj_b = np.zeros_like(bs.bj).reshape(-1)
        rj_b[gi] = rj[gg]
        di_, dj_ = factors.solve(ri, rj_b.reshape(bs.bj.shape))
        xi = xi + di_
        xj = xj + dj_
    return xi, xj, factors


# ---------------------------------------------------------------------------
# fully device-resident solve (single dispatch per refined solve)
# ---------------------------------------------------------------------------


def _owner_mask(jmap, jmask):
    """(B, nj) mask with 1.0 at exactly one (block, slot) per global
    junction param — the slot that 'owns' the junction residual when a
    global vector is distributed back to block rhs form.  Array form (not
    flat indices) so it shards over the blocks axis."""
    B, nj = jmap.shape
    mask = np.zeros((B, nj))
    seen = set()
    for b in range(B):
        for k in range(nj):
            g = int(jmap[b, k])
            if jmask[b, k] > 0 and g not in seen:
                seen.add(g)
                mask[b, k] = 1.0
    return mask


def _owner_indices(jmap, jmask):
    """One owner slot per global junction param: (flat positions into the
    (B*nj) block-rhs array, corresponding global param ids)."""
    flat = jmap.reshape(-1)
    mask = jmask.reshape(-1) > 0
    first_idx = {}
    for k in np.nonzero(mask)[0]:
        g = int(flat[k])
        if g not in first_idx:
            first_idx[g] = int(k)
    gi = np.fromiter(first_idx.values(), dtype=np.int32)
    gg = np.fromiter(first_idx.keys(), dtype=np.int32)
    return gi, gg


@partial(jax.jit, static_argnames=("nj_total", "refine", "method",
                                   "axis"))
def _device_solve_refined_jit(L, Y, Lj, di, dj, djg, Nij_s,
                              Nii64, Nij64, Njj64, bi64, bj64,
                              jmap, jmask32, jmask64, imask64,
                              owner64, nj_total, refine, method="chol",
                              axis=None):
    """Factored apply + `refine` rounds of float64 residual refinement, all
    inside one program.  The residual matvecs run in f64 on-device (VPU —
    they are tiny next to the factorization), so a refined solve costs one
    dispatch and rhs/solution-sized transfers only.

    method: 'chol' — factors are (L, Y, Lj) triangular (cho_solve apply);
    'inv' — factors are (Ainv, Y, Sinv) explicit inverses (matmul apply,
    faster on TPU)."""
    f32 = L.dtype
    B, nj = jmap.shape
    apply_core = (_schur_apply_inv_core if method == "inv"
                  else _schur_apply_core)

    def apply(ri64, rjb64):
        xi, xj = apply_core(L, Y, Lj, di, dj, djg, Nij_s,
                            ri64.astype(f32), rjb64.astype(f32),
                            jmap, jmask32, nj_total, axis)
        return xi.astype(bi64.dtype), xj.astype(bi64.dtype)

    xi, xj = apply(bi64, bj64)
    t_glob = jnp.zeros((nj_total,), dtype=bi64.dtype)
    t_glob = t_glob.at[jmap.reshape(-1)].add((bj64 * jmask64).reshape(-1))
    if axis is not None:
        t_glob = jax.lax.psum(t_glob, axis)
    for _ in range(refine):
        xj_b = xj[jmap] * jmask64
        yi = (jnp.einsum("bij,bj->bi", Nii64, xi) +
              jnp.einsum("bij,bj->bi", Nij64, xj_b))
        yj_b = (jnp.einsum("bij,bi->bj", Nij64, xi) +
                jnp.einsum("bij,bj->bi", Njj64, xj_b)) * jmask64
        yj = jnp.zeros((nj_total,), dtype=bi64.dtype)
        yj = yj.at[jmap.reshape(-1)].add(yj_b.reshape(-1))
        if axis is not None:
            yj = jax.lax.psum(yj, axis)
        ri = bi64 * imask64 - yi
        rj = t_glob - yj
        rjb = rj[jmap] * owner64           # one owner slot per junc param
        dxi, dxj = apply(ri, rjb)
        xi = xi + dxi
        xj = xj + dxj
    return xi, xj


@partial(jax.jit, static_argnames=("B", "n1", "n2"))
def _scatter_tiles_jit(idx_b, idx_r, idx_c, vals, B, n1, n2):
    """Rebuild a dense (B, 3*n1, 3*n2) block array from sparse 3x3
    station-pair tiles on device."""
    out = jnp.zeros((B, 3 * n1, 3 * n2), vals.dtype)
    r3 = idx_r[:, None] * 3 + jnp.arange(3)[None, :]
    c3 = idx_c[:, None] * 3 + jnp.arange(3)[None, :]
    return out.at[idx_b[:, None, None], r3[:, :, None],
                  c3[:, None, :]].set(vals)


class _SparseTilePlan:
    """Structural-sparsity upload plan for blocked normals.

    Geodetic block normals couple only measurement-connected station
    pairs: the dense (B, ni, ni) arrays are ~95-98% exact zeros.  The
    plan records the nonzero 3x3 station-pair tiles of each of
    Nii/Nij/Njj once (the pattern is the measurement graph, fixed per
    topology) so re-linearisation uploads only tile VALUES —
    E*9*4 bytes instead of B*ni^2*4 — and a jitted scatter rebuilds the
    dense arrays on device for the MXU factorization.  The pattern is
    detected from the first system's exact zeros; a tile that is
    coincidentally zero there would merely weaken the preconditioner
    (host f64 residual refinement still converges on the true system).
    """

    def __init__(self, bs: BlockSystem):
        self.shapes = {}
        self.idx = {}
        for name, M in (("ii", bs.Nii), ("ij", bs.Nij), ("jj", bs.Njj)):
            B, R, C = M.shape
            n1, n2 = R // 3, C // 3
            t = np.abs(M).reshape(B, n1, 3, n2, 3).max(axis=(2, 4))
            b, r, c = np.nonzero(t)
            self.shapes[name] = (B, n1, n2)
            self.idx[name] = (b.astype(np.int32), r.astype(np.int32),
                              c.astype(np.int32),
                              jnp.asarray(b.astype(np.int32)),
                              jnp.asarray(r.astype(np.int32)),
                              jnp.asarray(c.astype(np.int32)))

    def values(self, M, name):
        b, r, c = self.idx[name][:3]
        B, n1, n2 = self.shapes[name]
        return np.ascontiguousarray(
            M.reshape(B, n1, 3, n2, 3)[b, r, :, c, :], dtype=np.float32)

    def build(self, M, name, dtype):
        B, n1, n2 = self.shapes[name]
        _, _, _, bd, rd, cd = self.idx[name]
        vals = jnp.asarray(self.values(M, name).astype(dtype))
        return _scatter_tiles_jit(bd, rd, cd, vals, B, n1, n2)


@partial(jax.jit, static_argnames=("nj_total", "method"))
def _device_apply_only_jit(F0, F1, F2, di, dj, djg, Nij_s, bi, bj,
                           jmap, jmask, nj_total, method="inv"):
    """Plain factored apply (no in-jit f64 refinement): the traffic-lean
    path used when the f64 normals stay host-resident."""
    core = _schur_apply_inv_core if method == "inv" else _schur_apply_core
    return core(F0, F1, F2, di, dj, djg, Nij_s, bi, bj, jmap, jmask,
                nj_total)


class DeviceSchurFactors:
    """Fully device-resident mixed-precision blocked solver.

    The f64 blocked system is uploaded once; the factorization runs in
    `dtype` (float32 on the MXU) on device-resident casts, and every
    refined solve is a single jitted dispatch — apply + on-device f64
    residual rounds.  Host↔device traffic after construction is limited
    to rhs vectors in and solutions out, which is what makes the solver
    fast over PCIe and usable at all over a tunneled device."""

    def __init__(self, bs: BlockSystem, dtype=np.float32,
                 method: str = "inv", mesh: Mesh = None,
                 axis: str = "blocks", device_f64: bool = True):
        """device_f64=False uploads only the f32 casts of the normals
        (half the link traffic — the win over a thin tunnel) and skips
        the in-jit f64 refinement; callers then drive refinement from the
        host-resident f64 normals (schur_solve_device_refined does this
        via _block_matvec).  The converged solution is identical: host
        refinement against the true f64 normals has the same kappa*eps32
        contraction."""
        self.bs = bs
        self.nj_total = bs.nj_global + 1
        self.method = method
        self.mesh = mesh
        self.axis = axis if mesh is not None else None
        self.B_real = bs.Nii.shape[0]
        # device-assembled normals (adjust/device_assembly.py): the f32
        # pools are already device-resident — no upload, no tile plan;
        # f64 residuals come from the caller's A-based matvec
        self.device_normals = not isinstance(bs.Nii, np.ndarray)
        self.device_f64 = device_f64 or method == "inv64"
        if self.device_normals:
            self.device_f64 = False
        elif mesh is not None:
            self.device_f64 = True

        if self.device_normals:
            self.Nii64 = self.Nij64 = self.Njj64 = None
            self._tile_plan = None
            self._N32 = (bs.Nii.astype(dtype), bs.Nij.astype(dtype),
                         bs.Njj.astype(dtype))
            jmap, jmask, imask = bs.jmap, bs.jmask, bs.imask
            owner = bs.owner_mask()
            if mesh is not None:
                from .multihost import shard_blocks, is_multiprocess
                if is_multiprocess():
                    def put(x):
                        return shard_blocks(np.asarray(x), mesh, P(axis))
                else:
                    shard = NamedSharding(mesh, P(axis))

                    def put(x):
                        return jax.device_put(jnp.asarray(x), shard)
            else:
                def put(x):
                    return jnp.asarray(x)
            self.jmap = put(jmap)
            self.jmask32 = put(jmask.astype(dtype))
            self.jmask64 = put(jmask.astype(np.float64))
            self.imask64 = put(imask.astype(np.float64))
            self.owner64 = put(owner)
            self.dtype = dtype
            self.refactor()
            return

        Nii, Nij, Njj = bs.Nii, bs.Nij, bs.Njj
        jmap, jmask, imask = bs.jmap, bs.jmask, bs.imask
        owner = bs.owner_mask()
        if mesh is not None:
            # pad the block axis to the device count (identity blocks)
            ndev = mesh.shape[axis]
            B = Nii.shape[0]
            Bp = ((B + ndev - 1) // ndev) * ndev
            if Bp != B:
                def padb(x, fill=0.0):
                    pw = [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1)
                    return np.pad(x, pw, constant_values=fill)
                Nii = padb(Nii).copy()
                for b in range(B, Bp):
                    Nii[b] = np.eye(Nii.shape[1], dtype=Nii.dtype)
                Nij, Njj = padb(Nij), padb(Njj)
                jmask, imask, owner = (padb(jmask), padb(imask),
                                       padb(owner))
                jmap = padb(jmap, fill=bs.nj_global)

            shard = NamedSharding(mesh, P(axis))

            def put(x):
                return jax.device_put(jnp.asarray(x), shard)
        else:
            def put(x):
                return jnp.asarray(x)

        if self.device_f64:
            self.Nii64 = put(Nii.astype(np.float64))
            self.Nij64 = put(Nij.astype(np.float64))
            self.Njj64 = put(Njj.astype(np.float64))
            self._N32 = None
            self._tile_plan = None
        else:
            # structural-sparsity upload: tile indices once, values per
            # re-linearisation, dense rebuilt on device
            self.Nii64 = self.Nij64 = self.Njj64 = None
            self._tile_plan = _SparseTilePlan(bs)
            self._N32 = (self._tile_plan.build(bs.Nii, "ii", dtype),
                         self._tile_plan.build(bs.Nij, "ij", dtype),
                         self._tile_plan.build(bs.Njj, "jj", dtype))
        self.jmap = put(jmap)
        self.jmask32 = put(jmask.astype(dtype))
        self.jmask64 = put(jmask.astype(np.float64))
        self.imask64 = put(imask.astype(np.float64))
        self.owner64 = put(owner)
        self.dtype = dtype
        self.refactor()

    def update(self, bs: BlockSystem):
        """Re-linearised normals for the same topology: re-upload only the
        normals (f32 when device_f64 is off) and refactor — the padded
        index/mask/owner arrays stay device-resident."""
        if bs.Nii.shape != self.bs.Nii.shape:
            raise ValueError("update() requires the same block topology")
        if self.device_normals:
            # freshly device-assembled pools (already sharded under a
            # mesh): swap and refactor
            self.bs = bs
            self._N32 = (bs.Nii.astype(self.dtype),
                         bs.Nij.astype(self.dtype),
                         bs.Njj.astype(self.dtype))
            self.refactor()
            return
        if self.mesh is not None:
            raise ValueError("update() is single-device")
        self.bs = bs
        if self.device_f64:
            self.Nii64 = jnp.asarray(bs.Nii.astype(np.float64))
            self.Nij64 = jnp.asarray(bs.Nij.astype(np.float64))
            self.Njj64 = jnp.asarray(bs.Njj.astype(np.float64))
        else:
            p = self._tile_plan
            self._N32 = (p.build(bs.Nii, "ii", self.dtype),
                         p.build(bs.Nij, "ij", self.dtype),
                         p.build(bs.Njj, "jj", self.dtype))
        self.refactor()

    def refactor(self):
        """(Re)factor from the device-resident f64 normals.

        method 'inv64': exact f64 factorization on device (emulated f64;
        for ill-conditioned real networks).  'inv'/'chol': f32 MXU
        factorizations, recovered by f64 refinement in solve_device.
        With a mesh, the factorization runs under shard_map: per-block
        factors stay shard-local, the junction system rides one psum."""
        if self.mesh is not None:
            if self.method != "inv":
                raise ValueError("mesh-sharded factors require "
                                 "method='inv'")
            ax, nj_total = self.axis, self.nj_total

            @partial(jax.shard_map, mesh=self.mesh,
                     in_specs=(P(ax), P(ax), P(ax), P(ax), P(ax)),
                     out_specs=(P(ax), P(ax), P(), P(ax), P(ax), P(),
                                P(ax)))
            def factor(Nii, Nij, Njj, jmap, jmask):
                return _schur_factor_inv_jit(Nii, Nij, Njj, jmap, jmask,
                                             nj_total, ax)

            if self.device_normals:
                N32 = self._N32
            else:
                N32 = (self.Nii64.astype(self.dtype),
                       self.Nij64.astype(self.dtype),
                       self.Njj64.astype(self.dtype))
            self.factors = jax.jit(factor)(*N32, self.jmap, self.jmask32)
            return
        if self.method == "inv64":
            self.factors = _schur_factor_inv64_jit(
                self.Nii64, self.Nij64, self.Njj64, self.jmap,
                self.jmask64, self.nj_total)
            return
        factor = (_schur_factor_inv_jit if self.method == "inv"
                  else _schur_factor_jit)
        if self.device_f64:
            N32 = (self.Nii64.astype(self.dtype),
                   self.Nij64.astype(self.dtype),
                   self.Njj64.astype(self.dtype))
        else:
            N32 = self._N32
        self.factors = factor(*N32, self.jmap, self.jmask32,
                              self.nj_total)

    def solve_device(self, bi64, bj64, refine: int = 2):
        """Refined solve; rhs and results stay on device (f64).

        With a mesh, the factors and normals are block-sharded
        (NamedSharding over the blocks axis): the same jitted program
        compiles SPMD — XLA turns the junction scatters into
        all-reduces over ICI."""
        method = "inv" if self.method == "inv64" else self.method
        if self.method == "inv64":
            refine = 0              # factors are already f64-exact
        if not self.device_f64:
            # no f64 normals on device: single f32 apply (host drives
            # the f64 refinement, schur_solve_device_refined)
            Bp = int(self._N32[0].shape[0])
            bi = np.asarray(bi64, dtype=self.dtype)
            bj = np.asarray(bj64, dtype=self.dtype)
            if bi.shape[0] != Bp:
                bi = np.pad(bi, ((0, Bp - bi.shape[0]), (0, 0)))
                bj = np.pad(bj, ((0, Bp - bj.shape[0]), (0, 0)))
            return _device_apply_only_jit(
                *self.factors, jnp.asarray(bi), jnp.asarray(bj),
                self.jmap, self.jmask32, self.nj_total, method)
        bi64 = np.asarray(bi64, dtype=np.float64)
        bj64 = np.asarray(bj64, dtype=np.float64)
        Bp = int(self.Nii64.shape[0])
        if bi64.shape[0] != Bp:
            bi64 = np.pad(bi64, ((0, Bp - bi64.shape[0]), (0, 0)))
            bj64 = np.pad(bj64, ((0, Bp - bj64.shape[0]), (0, 0)))
        if self.mesh is not None:
            shard = NamedSharding(self.mesh, P(self.axis))
            bi64 = jax.device_put(jnp.asarray(bi64), shard)
            bj64 = jax.device_put(jnp.asarray(bj64), shard)
        return _device_solve_refined_jit(
            *self.factors, self.Nii64, self.Nij64, self.Njj64,
            jnp.asarray(bi64, dtype=jnp.float64),
            jnp.asarray(bj64, dtype=jnp.float64),
            self.jmap,
            (self.jmask64 if self.method == "inv64" else self.jmask32),
            self.jmask64, self.imask64,
            self.owner64, self.nj_total, refine, method)

    def solve(self, bi, bj, refine: int = 2):
        xi, xj = self.solve_device(bi, bj, refine)
        if self.mesh is not None and jax.process_count() > 1:
            from .multihost import gather_to_host
            xi = gather_to_host(xi, self.mesh)
            xj = gather_to_host(xj, self.mesh)
        return (np.asarray(xi, dtype=np.float64)[:self.B_real],
                np.asarray(xj, dtype=np.float64)[:self.bs.nj_global])

    def newton_factors(self, rounds: int = None, N64=None):
        """f64 Newton-refined covariance factors (one-time, for the
        variance-extraction stage after convergence).  For 'inv64' the
        factors are already f64-exact.  N64: device-resident f64 pools
        (DeviceAssembly.build_f64) when the normals were assembled on
        device and no host f64 copy exists.

        Rounds are residual-driven (_newton_loop; evidence stored in
        self.cov_refine_evidence).  The level-1 refinement is chunked
        over the block axis under DTA_NEWTON_CHUNK_BYTES — the fused
        sliced products hold ~(nslices+2) f32 slice copies of every
        (C, ni, ni) operand, which an unchunked program would multiply
        by the full block count.  With a mesh the pools are sharded
        over the block axis, so the single fused call partitions
        per-device (per-shard memory is B/ndev blocks) and chunking is
        skipped."""
        if rounds is None:
            rounds = int(os.environ.get("DTA_NEWTON_ROUNDS", 6))
        tol = float(os.environ.get("DTA_NEWTON_TOL", 3e-9))
        if self.method == "inv64":
            return self.factors
        if self.method != "inv":
            raise ValueError("newton_factors requires method='inv'")
        if N64 is not None:
            pass
        elif self.device_f64:
            N64 = (self.Nii64, self.Nij64, self.Njj64)
        elif self.device_normals:
            raise ValueError("device-assembled normals: pass N64 "
                             "(DeviceAssembly.build_f64())")
        else:
            # one-time f64 upload for the variance-extraction refinement
            # (no mesh => no block padding; shapes match the f32 casts)
            bs = self.bs
            N64 = (jnp.asarray(bs.Nii.astype(np.float64)),
                   jnp.asarray(bs.Nij.astype(np.float64)),
                   jnp.asarray(bs.Njj.astype(np.float64)))
        from ..ops.slicegemm import _use_sliced
        tier = _cov_tier(streamed=False)
        tk = dict(max_rounds=rounds, tol=tol, sliced=_use_sliced(),
                  nslices=tier[0], cross_max=tier[1])
        Ainv, Yf, Sinv, di, dj, djg, _ = self.factors
        B, ni = Ainv.shape[:2]
        per_block = ((2 * (tier[0] + 2) * 4.0 + 6 * 8.0)
                     * float(ni) * ni)
        budget = float(os.environ.get("DTA_NEWTON_CHUNK_BYTES", 3e9))
        want = max(1, int(budget / per_block))
        C = (B if self.mesh is not None else
             next(c for c in range(min(want, B), 0, -1) if B % c == 0))
        evid = {"l1_err": 0.0, "l1_rounds": 0, "tol": tol,
                "max_rounds": rounds, "tier": list(tier)}
        parts = []
        ev_parts = []
        for k in range(B // C):
            s = slice(k * C, (k + 1) * C)
            A_c, Y_c, S_c, k_used, err_c = _newton_l1_chunk(
                N64[0][s], N64[1][s], N64[2][s],
                di[s].astype(jnp.float64), dj[s].astype(jnp.float64),
                Ainv[s], **tk)
            if C < B:
                _hard_sync(S_c)
            ev_parts.append((k_used, err_c))
            parts.append((A_c, Y_c, S_c))
        evid["l1_err"] = max([float(e) for _, e in ev_parts],
                             default=0.0)
        evid["l1_rounds"] = max([int(k) for k, _ in ev_parts],
                                default=0)
        A64 = (parts[0][0] if len(parts) == 1
               else jnp.concatenate([p[0] for p in parts]))
        Y64 = (parts[0][1] if len(parts) == 1
               else jnp.concatenate([p[1] for p in parts]))
        S_b = (parts[0][2] if len(parts) == 1
               else jnp.concatenate([p[2] for p in parts]))
        Si64, j_err = _newton_flat_junction(
            S_b, self.jmap, self.jmask64, Sinv,
            nj_total=self.nj_total, **tk)
        evid["junction_err"] = float(j_err)
        self.cov_refine_evidence = evid
        Nij_s64 = _scale_nij64(N64[1], di, dj)
        return (A64, Y64, Si64, di.astype(jnp.float64),
                dj.astype(jnp.float64), djg.astype(jnp.float64),
                Nij_s64)


def schur_solve_device(bs: BlockSystem, refine: int = 2,
                       dtype=np.float32, factors: DeviceSchurFactors = None):
    """Device-resident mixed-precision solve with factor reuse (the
    single-dispatch counterpart of schur_solve_factored)."""
    if factors is None:
        factors = DeviceSchurFactors(bs, dtype)
    xi, xj = factors.solve(bs.bi, bs.bj, refine)
    return xi, xj, factors


def schur_solve_device_refined(bs: BlockSystem,
                               factors: DeviceSchurFactors,
                               refine: int = 2, max_refine: int = 12,
                               tol: float = 1e-13, matvec=None):
    """Residual-driven mixed-precision solve on f32 device factors.

    Each device dispatch runs `refine` in-jit f64 refinement rounds; the
    host loop then measures the true f64 residual and re-applies the
    factors to it until the relative residual converges (or stalls) —
    the flat-path counterpart of schur_solve_nested_factored's loop.
    This is what lets real (eliminated-constraint) networks at scaled
    condition ~1e6 reach f64-level solutions from f32 MXU factors."""
    if matvec is None:
        matvec = partial(_block_matvec, bs)
    xi, xj = factors.solve(bs.bi, bs.bj, refine)
    rhs_j_global = _gather_rhs_junction(bs)
    gi, gg = bs.owner_indices()
    rhs_scale = max(float(np.abs(bs.bi).max()),
                    float(np.abs(rhs_j_global).max()), 1e-30)
    prev_rel = np.inf
    for _ in range(max_refine):
        yi, yj = matvec(xi, xj)
        ri = (bs.bi * bs.imask) - yi
        rj = rhs_j_global - yj
        rel = max(float(np.abs(ri).max()),
                  float(np.abs(rj).max())) / rhs_scale
        if rel < tol or rel >= 0.5 * prev_rel:
            break
        prev_rel = rel
        rj_b = np.zeros_like(bs.bj).reshape(-1)
        rj_b[gi] = rj[gg]
        di_, dj_ = factors.solve(ri, rj_b.reshape(bs.bj.shape),
                                 refine=refine)
        xi = xi + di_
        xj = xj + dj_
    return xi, xj


# ---------------------------------------------------------------------------
# nested (3-level) Schur: scalable junction solve
# ---------------------------------------------------------------------------
# For national-scale networks the reduced junction system is itself too
# large for one replicated dense solve (GDA2020-scale: ~100k junction
# params).  The fix is one more level of the same elimination: level-1
# blocks are grouped into super-blocks; a junction parameter shared only
# within one super-block is eliminated there (batched, on the MXU), and
# only the super-block interfaces form the final (small) dense system.
# Every level-1 block lies wholly inside one super-block, so each S_b
# scatters into exactly one level-2 block — the dense global junction
# matrix is never formed.  This is nested dissection expressed as two
# batched Schur complements (cf. the reference's strictly sequential
# forward/reverse sweeps, dnaadjust.cpp:2756/3461).


@dataclass
class NestedPartition:
    """Level-2 partition of the global junction parameters.

    Super-block param space layout: [0, ni2) inner-junction slots,
    [ni2, ni2+nj2) super-junction slots, slot ni2+nj2 = scratch."""
    sb_of_block: np.ndarray     # (B,) super-block of each level-1 block
    l2slot: np.ndarray          # (B, nj) slot of each junction param in its
                                # super-block's space (scratch for padding)
    SB: int
    ni2: int
    nj2: int
    j2map: np.ndarray           # (SB, nj2) global super-junction index
    j2mask: np.ndarray          # (SB, nj2)
    i2mask: np.ndarray          # (SB, ni2)
    nsj_global: int             # number of super-junction params
    xj_kind: np.ndarray         # (njg,) 0 = inner2, 1 = super-junction
    xj_sb: np.ndarray           # (njg,) source super-block (kind 0)
    xj_slot: np.ndarray         # (njg,) source slot / global index


def build_nested_partition(bs: BlockSystem,
                           block_super: np.ndarray) -> NestedPartition:
    """Derive the level-2 partition from a super-block assignment of the
    level-1 blocks.  A junction param referenced by blocks of a single
    super-block becomes level-2 inner; one shared across super-blocks
    becomes a super-junction."""
    B, nj = bs.jmap.shape
    njg = bs.nj_global
    block_super = np.asarray(block_super, dtype=np.int64)
    SB = int(block_super.max()) + 1 if B else 1

    touched = [set() for _ in range(njg)]
    for b in range(B):
        sb = block_super[b]
        for k in range(nj):
            if bs.jmask[b, k] > 0:
                touched[int(bs.jmap[b, k])].add(int(sb))

    inner2 = [[] for _ in range(SB)]        # global junc param ids
    junc2 = [[] for _ in range(SB)]
    sj_global = {}                          # param id -> global sj index
    for g, sbs in enumerate(touched):
        if len(sbs) == 1:
            inner2[next(iter(sbs))].append(g)
        else:
            sj_global[g] = len(sj_global)
            for sb in sbs:
                junc2[sb].append(g)

    ni2 = max((len(v) for v in inner2), default=1) or 1
    nj2 = max((len(v) for v in junc2), default=1) or 1
    nsj = len(sj_global)

    # per-super-block slot of every junction param
    slot_of = {}                            # (sb, g) -> slot
    j2map = np.zeros((SB, nj2), dtype=np.int32)
    j2mask = np.zeros((SB, nj2))
    i2mask = np.zeros((SB, ni2))
    for sb in range(SB):
        for q, g in enumerate(inner2[sb]):
            slot_of[(sb, g)] = q
            i2mask[sb, q] = 1.0
        for q, g in enumerate(junc2[sb]):
            slot_of[(sb, g)] = ni2 + q
            j2map[sb, q] = sj_global[g]
            j2mask[sb, q] = 1.0

    scratch = ni2 + nj2
    l2slot = np.full((B, nj), scratch, dtype=np.int32)
    for b in range(B):
        sb = int(block_super[b])
        for k in range(nj):
            if bs.jmask[b, k] > 0:
                l2slot[b, k] = slot_of[(sb, int(bs.jmap[b, k]))]

    xj_kind = np.zeros(njg, dtype=np.int32)
    xj_sb = np.zeros(njg, dtype=np.int32)
    xj_slot = np.zeros(njg, dtype=np.int32)
    for g, sbs in enumerate(touched):
        if len(sbs) == 1:
            sb = next(iter(sbs))
            xj_sb[g] = sb
            xj_slot[g] = slot_of[(sb, g)]
        else:
            xj_kind[g] = 1
            xj_slot[g] = sj_global[g]

    return NestedPartition(
        sb_of_block=block_super.astype(np.int32), l2slot=l2slot, SB=SB,
        ni2=ni2, nj2=nj2, j2map=j2map, j2mask=j2mask, i2mask=i2mask,
        nsj_global=nsj, xj_kind=xj_kind, xj_sb=xj_sb, xj_slot=xj_slot)




def _scatter_l2_mats(S_b, sb_of_block, l2slot, SB, ni2, nj2):
    """Scatter per-block Schur pieces directly into the three level-2
    batched arrays (never materialising the full (SB, m2, m2) matrix —
    essential for HBM at national scale).  Symmetric input: the
    (junction, inner) orientation is recovered from the transpose."""
    B, nj1 = l2slot.shape
    a = l2slot[:, :, None]
    b = l2slot[:, None, :]
    sb = jnp.broadcast_to(sb_of_block[:, None, None], (B, nj1, nj1))
    inner_a, inner_b = a < ni2, b < ni2
    junc_a = (a >= ni2) & (a < ni2 + nj2)
    junc_b = (b >= ni2) & (b < ni2 + nj2)
    ia = jnp.broadcast_to(jnp.where(inner_a, a, ni2), (B, nj1, nj1))
    ib = jnp.broadcast_to(jnp.where(inner_b, b, ni2), (B, nj1, nj1))
    ja = jnp.broadcast_to(jnp.where(junc_a, a - ni2, nj2), (B, nj1, nj1))
    jb = jnp.broadcast_to(jnp.where(junc_b, b - ni2, nj2), (B, nj1, nj1))
    dt = S_b.dtype
    Nii2 = jnp.zeros((SB, ni2 + 1, ni2 + 1), dtype=dt)
    Nij2 = jnp.zeros((SB, ni2 + 1, nj2 + 1), dtype=dt)
    Njj2 = jnp.zeros((SB, nj2 + 1, nj2 + 1), dtype=dt)
    Nii2 = Nii2.at[sb, ia, ib].add(S_b * (inner_a & inner_b))
    Nij2 = Nij2.at[sb, ia, jb].add(S_b * (inner_a & junc_b))
    Njj2 = Njj2.at[sb, ja, jb].add(S_b * (junc_a & junc_b))
    return (Nii2[:, :ni2, :ni2], Nij2[:, :ni2, :nj2],
            Njj2[:, :nj2, :nj2])


def _scatter_l2_rhs(t_b, sb_of_block, l2slot, SB, ni2, nj2):
    B, nj1 = l2slot.shape
    sbv = jnp.broadcast_to(sb_of_block[:, None], (B, nj1))
    inner = l2slot < ni2
    junc = (l2slot >= ni2) & (l2slot < ni2 + nj2)
    ii = jnp.where(inner, l2slot, ni2)
    jj = jnp.where(junc, l2slot - ni2, nj2)
    bi2 = jnp.zeros((SB, ni2 + 1), dtype=t_b.dtype)
    bj2 = jnp.zeros((SB, nj2 + 1), dtype=t_b.dtype)
    bi2 = bi2.at[sbv, ii].add(t_b * inner)
    bj2 = bj2.at[sbv, jj].add(t_b * junc)
    return bi2[:, :ni2], bj2[:, :nj2]


@partial(jax.jit, static_argnames=("SB", "ni2", "nj2", "nsj_total",
                                   "nj_total", "scale", "axis"))
def _schur_solve_nested_jit(Nii, Nij, Njj, bi, bj, jmap, jmask,
                            sb_of_block, l2slot,
                            j2map, j2mask, i2mask,
                            xj_kind, xj_sb, xj_slot,
                            SB, ni2, nj2, nsj_total, nj_total,
                            scale=True, axis=None):
    if scale:
        Nii, Nij, Njj, bi, bj, di, dj, djg = _unity_scale(
            Nii, Nij, Njj, bi, bj, jmap, jmask, nj_total, axis)

    # ---- level 1: eliminate inner stations (batched) --------------------
    S_b, t_b, L, Y, w = _block_reduce(Nii, Nij, Njj, bi, bj, jmask)

    # ---- scatter into level-2 blocked systems ---------------------------
    Nii2, Nij2, Njj2 = _scatter_l2_mats(S_b, sb_of_block, l2slot,
                                        SB, ni2, nj2)
    bi2, bj2 = _scatter_l2_rhs(t_b, sb_of_block, l2slot, SB, ni2, nj2)
    if axis is not None:
        Nii2 = jax.lax.psum(Nii2, axis)
        Nij2 = jax.lax.psum(Nij2, axis)
        Njj2 = jax.lax.psum(Njj2, axis)
        bi2 = jax.lax.psum(bi2, axis)
        bj2 = jax.lax.psum(bj2, axis)
    # identity-pad empty inner slots so the batched Cholesky is defined
    eye = jnp.eye(ni2, dtype=Nii2.dtype)
    Nii2 = Nii2 + eye[None] * (1.0 - i2mask)[:, None, :] * \
        jnp.where(eye[None] > 0, 1.0, 0.0)

    # ---- level 2: eliminate inner-junction params (batched) -------------
    S2_b, t2_b, L2, Y2, w2 = _block_reduce(Nii2, Nij2, Njj2, bi2, bj2,
                                           j2mask)

    # ---- level 3: the (small) super-junction system ---------------------
    S2, t2 = _scatter_junction(S2_b, t2_b, j2map, nsj_total)
    xsj, _ = _solve_junction(S2, t2, nsj_total)

    # ---- back-substitute level 2 ----------------------------------------
    xsj_b = xsj[j2map] * j2mask
    xi2 = w2 - jnp.einsum("bij,bj->bi", Y2, xsj_b, precision=_HI)

    # ---- reconstruct all junction params --------------------------------
    from_inner = xi2[xj_sb, jnp.minimum(xj_slot, ni2 - 1)]
    from_sj = xsj[jnp.minimum(xj_slot, nsj_total - 1)]
    xj_real = jnp.where(xj_kind == 0, from_inner, from_sj)
    xj = jnp.concatenate([xj_real,
                          jnp.zeros((nj_total - xj_real.shape[0],),
                                    dtype=xj_real.dtype)])

    # ---- back-substitute level 1 ----------------------------------------
    xj_b = xj[jmap] * jmask
    xi = w - jnp.einsum("bij,bj->bi", Y, xj_b, precision=_HI)
    if scale:
        xi = xi * di
        xj = xj * djg
    return xi, xj


def schur_solve_nested(bs: BlockSystem, part: NestedPartition,
                       mesh: Mesh = None, axis: str = "blocks",
                       scale: bool = True):
    """Three-level solve: batched inner elimination, batched super-block
    junction elimination, one small super-junction solve.  Sharded over
    `mesh` when given (level-2 systems psum-reduced over ICI)."""
    nj_total = bs.nj_global + 1
    nsj_total = part.nsj_global + 1
    args_np = (bs.Nii, bs.Nij, bs.Njj, bs.bi, bs.bj, bs.jmap, bs.jmask,
               part.sb_of_block, part.l2slot)
    part_np = (part.j2map, part.j2mask.astype(bs.Nii.dtype),
               part.i2mask.astype(bs.Nii.dtype),
               part.xj_kind, part.xj_sb, part.xj_slot)

    if mesh is None:
        xi, xj = _schur_solve_nested_jit(
            *[jnp.asarray(a) for a in args_np],
            *[jnp.asarray(a) for a in part_np],
            part.SB, part.ni2, part.nj2, nsj_total, nj_total, scale, None)
        return np.asarray(xi), np.asarray(xj)[:bs.nj_global]

    ndev = mesh.shape[axis]
    B = bs.Nii.shape[0]
    Bp = ((B + ndev - 1) // ndev) * ndev

    def pad(x, fill=0):
        if x.shape[0] == Bp:
            return x
        pw = [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pw, constant_values=fill)

    Nii = pad(bs.Nii).copy()
    for b in range(B, Bp):
        Nii[b] = np.eye(Nii.shape[1], dtype=Nii.dtype)
    # padded blocks: scratch l2 slots, super-block 0
    scratch = part.ni2 + part.nj2
    sharded = (Nii, pad(bs.Nij), pad(bs.Njj), pad(bs.bi), pad(bs.bj),
               pad(bs.jmap), pad(bs.jmask), pad(part.sb_of_block),
               pad(part.l2slot, fill=scratch))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=tuple([P(axis)] * 9 + [P()] * 6),
             out_specs=(P(axis), P()))
    def solve(Nii, Nij, Njj, bi, bj, jmap, jmask, sbb, l2s,
              j2map, j2mask, i2mask, xj_kind, xj_sb, xj_slot):
        return _schur_solve_nested_jit(
            Nii, Nij, Njj, bi, bj, jmap, jmask, sbb, l2s,
            j2map, j2mask, i2mask, xj_kind, xj_sb, xj_slot,
            part.SB, part.ni2, part.nj2, nsj_total, nj_total, scale, axis)

    xi, xj = jax.jit(solve)(*[jnp.asarray(a) for a in sharded],
                            *[jnp.asarray(a) for a in part_np])
    return np.asarray(xi)[:B], np.asarray(xj)[:bs.nj_global]


def schur_solve_nested_refined(bs: BlockSystem, part: NestedPartition,
                               mesh: Mesh = None, axis: str = "blocks",
                               refine: int = 2, dtype=np.float32):
    """Mixed-precision nested solve: f32 three-level factorizations on the
    MXU + float64 host residual refinement (same contraction argument as
    schur_solve_refined)."""
    def solve_low(rhs_i, rhs_j_blocks):
        low = BlockSystem(
            Nii=bs.Nii.astype(dtype), Nij=bs.Nij.astype(dtype),
            Njj=bs.Njj.astype(dtype), bi=rhs_i.astype(dtype),
            bj=rhs_j_blocks.astype(dtype), jmap=bs.jmap,
            jmask=bs.jmask.astype(dtype), imask=bs.imask.astype(dtype),
            nj_global=bs.nj_global)
        return schur_solve_nested(low, part, mesh, axis)

    xi, xj = solve_low(bs.bi, bs.bj)
    xi = np.asarray(xi, dtype=np.float64)
    xj = np.asarray(xj, dtype=np.float64)

    rhs_j_global = _gather_rhs_junction(bs)
    gi, gg = bs.owner_indices()      # cached per topology
    for _ in range(refine):
        yi, yj = _block_matvec(bs, xi, xj)
        ri = (bs.bi * bs.imask) - yi
        rj = rhs_j_global - yj
        rj_b = np.zeros_like(bs.bj).reshape(-1)
        rj_b[gi] = rj[gg]
        di_, dj_ = solve_low(ri, rj_b.reshape(bs.bj.shape))
        xi = xi + np.asarray(di_, dtype=np.float64)
        xj = xj + np.asarray(dj_, dtype=np.float64)
    return xi, xj


# ---------------------------------------------------------------------------
# nested factor-once / apply-many
# ---------------------------------------------------------------------------

# Factoring at national scale is driven from PYTHON in small chunks, not
# one monolithic jit: XLA sizes a program's temp arena to its peak
# liveness, and a lax.map whose stacked outputs are program outputs pays
# for them TWICE (stacked temps + copies) — measured 9.25G temp for the
# level-1 stage at 250k stations (AOT memory_analysis), on top of 4.6G
# args and 5.4G outputs, against ~15G usable HBM.  Small per-chunk
# programs keep each temp arena at a few hundred MB; the chunk index is
# a traced scalar so the program compiles once.

@partial(jax.jit, static_argnames=("nj_total",))
def _nested_scale_vecs(Nii, Njj, jmap, jmask, nj_total):
    """Unity scale vectors from the blocked diagonals (no scaled copy of
    the normals is ever materialised — scaling happens per chunk)."""
    dii = jnp.diagonal(Nii, axis1=-2, axis2=-1)
    djj = jnp.diagonal(Njj, axis1=-2, axis2=-1) * jmask
    dj_global = jnp.zeros((nj_total,), dtype=Njj.dtype)
    dj_global = dj_global.at[jmap.reshape(-1)].add(djj.reshape(-1))
    dj_global = jnp.where(dj_global <= 0.0, 1.0, dj_global)
    djg = 1.0 / jnp.sqrt(dj_global)
    di = 1.0 / jnp.sqrt(jnp.where(dii <= 0.0, 1.0, dii))
    dj = jnp.where(jmask > 0, djg[jmap], 1.0)
    return di, dj, djg


@partial(jax.jit, static_argnames=("C",))
def _nested_chunk_factor(Nii, Nij, Njj, di, dj, k, C):
    """Scale + factor + invert C level-1 blocks starting at block k·C.
    Explicit inverses (the reference's dpotri, dnaadjust.cpp:6586) make
    every apply a pure MXU matmul.  The factorization itself goes
    through ops/blocked_chol.block_reduce (recursive GEMM-rich backend
    by default — the MFU-critical op)."""
    from ..ops.blocked_chol import block_reduce
    sl = lambda A: jax.lax.dynamic_slice_in_dim(A, k * C, C)
    Nii_c, Nij_c, Njj_c = sl(Nii), sl(Nij), sl(Njj)
    di_c, dj_c = sl(di), sl(dj)
    Nii_c = Nii_c * di_c[:, :, None] * di_c[:, None, :]
    Nij_c = Nij_c * di_c[:, :, None] * dj_c[:, None, :]
    Njj_c = Njj_c * dj_c[:, :, None] * dj_c[:, None, :]
    return block_reduce(Nii_c, Nij_c, Njj_c)


@partial(jax.jit, static_argnames=("SB", "ni2", "nj2"))
def _nested_l2_assemble(S_b, jmask, sb_of_block, l2slot, SB, ni2, nj2):
    S_b = S_b * jmask[:, :, None] * jmask[:, None, :]
    return _scatter_l2_mats(S_b, sb_of_block, l2slot, SB, ni2, nj2)


@partial(jax.jit, static_argnames=("SB", "ni2", "nj2", "nj_total"))
def _nested_factor_stage1_monolithic(Nii, Nij, Njj, jmap, jmask,
                                     sb_of_block, l2slot, SB, ni2, nj2,
                                     nj_total):
    """One-program stage 1 for mesh-sharded inputs: with the block axis
    NamedSharding'd, GSPMD partitions the batched cholesky/inverse per
    shard and turns the level-2 scatter into an all-reduce; the
    python-chunked _nested_factor_stage1 exists for single-chip HBM."""
    from ..ops.blocked_chol import block_reduce
    di, dj, djg = _nested_scale_vecs(Nii, Njj, jmap, jmask,
                                     nj_total=nj_total)
    Nii_s = Nii * di[:, :, None] * di[:, None, :]
    Nij_s = Nij * di[:, :, None] * dj[:, None, :]
    Njj_s = Njj * dj[:, :, None] * dj[:, None, :]
    Ainv, Y, S_b = block_reduce(Nii_s, Nij_s, Njj_s)
    Nii2, Nij2, Njj2 = _nested_l2_assemble(S_b, jmask, sb_of_block,
                                           l2slot, SB=SB, ni2=ni2,
                                           nj2=nj2)
    return Ainv, Y, Nii2, Nij2, Njj2, di, dj, djg


def _nested_factor_stage1(Nii, Nij, Njj, jmap, jmask, sb_of_block,
                          l2slot, SB, ni2, nj2, nj_total):
    """Level-1 factorization + level-2 assembly, python-chunked (see the
    temp-arena note above).  Inputs are device arrays; the caller drops
    its references so they free as soon as the last chunk executes."""
    B, ni = Nii.shape[0], Nii.shape[1]
    di, dj, djg = _nested_scale_vecs(Nii, Njj, jmap, jmask,
                                     nj_total=nj_total)
    C = next(c for c in range(min(16, B), 0, -1) if B % c == 0)
    parts = []
    for k in range(B // C):
        pk = _nested_chunk_factor(Nii, Nij, Njj, di, dj, k, C=C)
        _hard_sync(pk[0])        # serialise chunk workspaces (HBM)
        parts.append(pk)
    # free the unscaled normals before concatenating the factor pieces:
    # the concat transient (one full-size copy) plus the inputs would
    # exceed HBM at national scale (dispatch order guarantees the queued
    # chunk programs run before the concat, so the frees land in time)
    del Nii, Nij, Njj
    Ainv = jnp.concatenate([p[0] for p in parts])
    Y = jnp.concatenate([p[1] for p in parts])
    S_b = jnp.concatenate([p[2] for p in parts])
    del parts
    Nii2, Nij2, Njj2 = _nested_l2_assemble(S_b, jmask, sb_of_block,
                                           l2slot, SB=SB, ni2=ni2,
                                           nj2=nj2)
    return Ainv, Y, Nii2, Nij2, Njj2, di, dj, djg


@jax.jit
def _nested_l2_factor_one(Nii2, Nij2, i2mask, k):
    """Factor + invert ONE level-2 (super-block) system (recursive
    GEMM-rich inverse — ops/recursive_inv)."""
    from ..ops.recursive_inv import spd_inverse_rec_safe
    Nii2b = jax.lax.dynamic_slice_in_dim(Nii2, k, 1)[0]
    Nij2b = jax.lax.dynamic_slice_in_dim(Nij2, k, 1)[0]
    mask_b = jax.lax.dynamic_slice_in_dim(i2mask, k, 1)[0]
    eye = jnp.eye(Nii2b.shape[0], dtype=Nii2b.dtype)
    Nii2b = Nii2b + eye * (1.0 - mask_b)[None, :] * \
        jnp.where(eye > 0, 1.0, 0.0)
    A2invb = spd_inverse_rec_safe(Nii2b[None])[0]
    Y2b = jnp.einsum("ij,jk->ik", A2invb, Nij2b, precision=_HI)
    S2b = - jnp.einsum("ki,kj->ij", Nij2b, Y2b, precision=_HI)
    return A2invb, Y2b, S2b


@partial(jax.jit, static_argnames=("nsj_total",))
def _nested_l3_inv(S2_b, Njj2, j2mask, j2map, nsj_total):
    """Assemble + invert the super-junction system (recursive
    GEMM-rich inverse)."""
    from ..ops.recursive_inv import spd_inverse_rec_safe
    S2_b = (Njj2 + S2_b) * j2mask[:, :, None] * j2mask[:, None, :]
    S2, _ = _scatter_junction(S2_b, jnp.zeros_like(S2_b[..., 0]), j2map,
                              nsj_total)
    diag = jnp.diag(S2)
    S2 = S2 + jnp.diag(jnp.where(diag == 0.0, 1.0, 0.0))
    return spd_inverse_rec_safe(S2[None])[0]


@partial(jax.jit, static_argnames=("chunk",))
def _inv_cols(L, g, chunk):
    """One column-chunk of the SPD inverse from a Cholesky factor —
    XLA's triangular solve materialises temps proportional to rhs width,
    so the identity is solved a slab at a time."""
    n = L.shape[0]
    cols = g * chunk + jnp.arange(chunk)
    E = (jnp.arange(n)[:, None] == cols[None, :]).astype(L.dtype)
    return jax.scipy.linalg.cho_solve((L, True), E)


def _chunked_spd_inverse(L, max_chunk: int = 2048):
    """Inverse from a Cholesky factor, one column slab per dispatch."""
    n = L.shape[0]
    chunk = min(max_chunk, n)
    nchunks = (n + chunk - 1) // chunk
    parts = [_inv_cols(L, g, chunk=chunk) for g in range(nchunks)]
    return jnp.concatenate(parts, axis=1)[:, :n]


def _nested_factor_stage2(Nii2, Nij2, Njj2, i2mask, j2mask, j2map,
                          nsj_total):
    """Level-2 factorization + level-3 assembly/factorization,
    python-chunked (one dispatch per super-block; measured 6.1G temp
    arena for the monolithic jit at 250k stations)."""
    SB = Nii2.shape[0]
    parts = []
    for k in range(SB):
        pk = _nested_l2_factor_one(Nii2, Nij2, i2mask, k)
        _hard_sync(pk[0])
        parts.append(pk)
    del Nii2, Nij2
    A2inv = jnp.stack([p[0] for p in parts])
    Y2 = jnp.stack([p[1] for p in parts])
    S2_b = jnp.stack([p[2] for p in parts])
    del parts
    Sinv = _nested_l3_inv(S2_b, Njj2, j2mask, j2map, nsj_total=nsj_total)
    del S2_b, Njj2
    return A2inv, Y2, Sinv


# The apply is split into three small jitted programs: the monolithic
# version compiles (temp arena ~1.6G) but exhausts HBM at runtime at
# national scale, while the same math as separate programs runs fine —
# smaller per-program arenas and no cross-stage temp pile-up.

@partial(jax.jit, static_argnames=("SB", "ni2", "nj2", "nsj_total",
                                   "nj_total"))
def _nested_factor_full_jit(Nii, Nij, Njj, jmap, jmask, sbb, l2slot,
                            i2mask, j2mask, j2map,
                            SB, ni2, nj2, nsj_total, nj_total):
    """ALL three factor levels in ONE program — for problems whose
    pools fit a small-scale HBM budget.  The python-chunked two-stage
    path exists for national scale (per-chunk arenas); below that
    scale, one dispatch beats ~10 sequential dispatches whose tunnel
    enqueue latency (~15 ms each) dominates the whole factorization."""
    from ..ops.blocked_chol import block_reduce
    di, dj, djg = _nested_scale_vecs(Nii, Njj, jmap, jmask,
                                     nj_total=nj_total)
    Nii_s = Nii * di[:, :, None] * di[:, None, :]
    Nij_s = Nij * di[:, :, None] * dj[:, None, :]
    Njj_s = Njj * dj[:, :, None] * dj[:, None, :]
    Ainv, Y, S_b = block_reduce(Nii_s, Nij_s, Njj_s)
    Nii2, Nij2, Njj2 = _nested_l2_assemble(S_b, jmask, sbb, l2slot,
                                           SB=SB, ni2=ni2, nj2=nj2)
    eye2 = jnp.eye(ni2, dtype=Nii2.dtype)
    Nii2 = Nii2 + eye2[None] * (1.0 - i2mask)[:, None, :] * \
        jnp.where(eye2[None] > 0, 1.0, 0.0)
    A2inv, Y2, S2_b = block_reduce(Nii2, Nij2, jnp.zeros_like(Njj2))
    from ..ops.recursive_inv import spd_inverse_rec_safe
    S2_b = (Njj2 + S2_b) * j2mask[:, :, None] * j2mask[:, None, :]
    S2, _ = _scatter_junction(S2_b, jnp.zeros_like(S2_b[..., 0]), j2map,
                              nsj_total)
    diag = jnp.diag(S2)
    S2 = S2 + jnp.diag(jnp.where(diag == 0.0, 1.0, 0.0))
    Sinv = spd_inverse_rec_safe(S2[None])[0]
    return Ainv, Y, A2inv, Y2, Sinv, di, dj, djg


@partial(jax.jit, static_argnames=("SB", "ni2", "nj2", "nsj_total"))
def _nested_apply_fwd_jit(Ainv, Y, A2inv, Y2, Sinv, di, dj,
                          jmask, sbb, l2slot, j2map, j2mask, bi, bj,
                          SB, ni2, nj2, nsj_total):
    """Forward half of the apply in one program (small-scale path):
    level-1 elimination, level-2 elimination, super-junction solve."""
    bi = bi * di
    bj = bj * dj
    w = jnp.einsum("bij,bj->bi", Ainv, bi)
    t_b = (bj - jnp.einsum("bkj,bk->bj", Y, bi)) * jmask
    bi2, bj2 = _scatter_l2_rhs(t_b, sbb, l2slot, SB, ni2, nj2)
    w2 = jnp.einsum("bij,bj->bi", A2inv, bi2)
    t2_b = (bj2 - jnp.einsum("bkj,bk->bj", Y2, bi2)) * j2mask
    t2 = jnp.zeros((nsj_total,), dtype=t2_b.dtype)
    t2 = t2.at[j2map.reshape(-1)].add(t2_b.reshape(-1))
    xsj = Sinv @ t2
    xsj_b = xsj[j2map] * j2mask
    xi2 = w2 - jnp.einsum("bij,bj->bi", Y2, xsj_b)
    return w, xi2, xsj


@jax.jit
def _nested_apply_bwd_jit(w, Y, di, xj_b):
    return (w - jnp.einsum("bij,bj->bi", Y, xj_b)) * di


class NestedSchurFactors:
    """Device-resident 3-level factorization (factor once, apply many).

    Persistent state: Ainv (level-1 block inverses), Y (eliminated
    coupling), A2inv/Y2 (level-2), Sinv (super-junction inverse), scale
    factors.  Explicit inverses (the reference's dpotri) keep applies
    pure matmuls; f64 refinement absorbs the extra rounding.
    The scaled normals and level-2 assemblies are donated/freed."""

    def __init__(self, bs: BlockSystem, part: NestedPartition,
                 dtype=np.float32, mesh: Mesh = None,
                 axis: str = "blocks"):
        """mesh: shard the level-1 factor pools over the block axis
        (NamedSharding) — the national-scale multi-chip path.  Under
        GSPMD the batched level-1 factorization partitions per shard, the
        level-2 assembly scatters become all-reduces over the mesh, and
        the (small) level-2/3 factors replicate.  Mesh mode uses one
        monolithic stage-1 program (per-device memory is B/ndev blocks;
        the python-chunked path exists for single-chip HBM limits)."""
        self.bs = bs
        self.part = part
        self.dtype = dtype
        self.mesh = mesh
        self.axis = axis
        self.nj_total = bs.nj_global + 1
        self.nsj_total = part.nsj_global + 1
        self.B_real = bs.Nii.shape[0]

        Nii, Nij, Njj = bs.Nii, bs.Nij, bs.Njj
        jmap, jmask = bs.jmap, bs.jmask
        sbb, l2slot = part.sb_of_block, part.l2slot
        if mesh is not None:
            ndev = mesh.shape[axis]
            B = Nii.shape[0]
            Bp = ((B + ndev - 1) // ndev) * ndev
            if Bp != B:
                def padb(x, fill=0.0):
                    pw = [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1)
                    return np.pad(x, pw, constant_values=fill)
                Nii = padb(Nii).copy()
                for b in range(B, Bp):
                    Nii[b] = np.eye(Nii.shape[1], dtype=Nii.dtype)
                Nij, Njj, jmask = padb(Nij), padb(Njj), padb(jmask)
                jmap = padb(jmap, fill=bs.nj_global)
                sbb = padb(sbb)
                l2slot = padb(l2slot)
            shard = NamedSharding(mesh, P(axis))
            repl = NamedSharding(mesh, P())

            def putb(x):
                return jax.device_put(jnp.asarray(x), shard)

            def putr(x):
                return jax.device_put(jnp.asarray(x), repl)
        else:
            putb = putr = jnp.asarray
        self._putb, self._putr = putb, putr
        self.jmap = putb(jmap)
        self.jmask = putb(jmask.astype(dtype))
        self.sbb = putb(np.asarray(sbb))
        self.l2slot = putb(np.asarray(l2slot))
        self.j2map = putr(part.j2map)
        self.j2mask = putr(part.j2mask.astype(dtype))
        self.xj_kind = jnp.asarray(part.xj_kind)
        self.xj_sb = jnp.asarray(part.xj_sb)
        self.xj_slot = jnp.asarray(part.xj_slot)
        # DTA_SCHUR_SYNC=1: surface async device errors at stage
        # boundaries — this runtime defers execution errors to the next
        # device->host transfer, which hides which program OOM'd
        _sync = os.environ.get("DTA_SCHUR_SYNC", "") == "1"

        def _probe(tag, arr):
            if _sync:
                np.asarray(arr.ravel()[:1])
                print(f"schur sync: {tag} ok", file=sys.stderr, flush=True)

        self._probe = _probe
        self._i2mask_dev = putr(part.i2mask.astype(dtype))
        # small-scale fast path: fuse the whole factorization / apply
        # into single programs when the factor pools fit a small HBM
        # budget — below it, per-dispatch tunnel latency dominates the
        # op-by-op national-scale path
        pool_bytes = (np.prod(Nii.shape) + np.prod(Nij.shape)
                      + np.prod(Njj.shape)) * 4.0
        self._small = (mesh is None and pool_bytes <=
                       float(os.environ.get("DTA_NESTED_FUSE_BYTES",
                                            6e8)))
        self._pools = (Nii, Nij, Njj)       # for the initial factor
        self.refactor()
        self._pools = None

    def refactor(self, bs: BlockSystem = None):
        """(Re-)factor from fresh normals pools, reusing every
        device-resident index/mask array — per-iteration refactors
        (re-linearised normals) pay only the factor compute, not the
        topology re-upload a fresh construction would."""
        if bs is not None:
            self.bs = bs
            pools = (bs.Nii, bs.Nij, bs.Njj)
        else:
            pools = self._pools
        dtype, part = self.dtype, self.part
        putb = self._putb
        if self.mesh is not None and pools[0].shape[0] != \
                int(self.jmap.shape[0]):
            Bp = int(self.jmap.shape[0])
            B = pools[0].shape[0]

            def padb(x, eye=False):
                pw = [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1)
                x = np.pad(x, pw)
                if eye:
                    for b in range(B, Bp):
                        x[b] = np.eye(x.shape[1], dtype=x.dtype)
                return x
            pools = (padb(np.asarray(pools[0]).copy(), eye=True),
                     padb(np.asarray(pools[1])),
                     padb(np.asarray(pools[2])))
        # drop the previous factor pools before re-factoring — holding
        # old Ainv/Y alongside the new construction tips HBM over at
        # national scale
        self.factors = None
        if self._small:
            self.factors = _nested_factor_full_jit(
                putb(pools[0].astype(dtype)),
                putb(pools[1].astype(dtype)),
                putb(pools[2].astype(dtype)),
                self.jmap, self.jmask, self.sbb, self.l2slot,
                self._i2mask_dev, self.j2mask, self.j2map,
                part.SB, part.ni2, part.nj2, self.nsj_total,
                self.nj_total)
            self._probe("factor fused", self.factors[0])
        else:
            stage1 = (_nested_factor_stage1_monolithic
                      if self.mesh is not None else _nested_factor_stage1)
            Ainv, Y, Nii2, Nij2, Njj2, di, dj, djg = stage1(
                putb(pools[0].astype(dtype)),
                putb(pools[1].astype(dtype)),
                putb(pools[2].astype(dtype)),
                self.jmap, self.jmask, self.sbb, self.l2slot,
                part.SB, part.ni2, part.nj2, self.nj_total)
            self._probe("factor stage1", Ainv)
            A2inv, Y2, Sinv = _nested_factor_stage2(
                Nii2, Nij2, Njj2, self._i2mask_dev,
                self.j2mask, self.j2map, self.nsj_total)
            self._probe("factor stage2", Sinv)
            self.factors = (Ainv, Y, A2inv, Y2, Sinv, di, dj, djg)
        # refined covariance state (if any) is stale after a refactor
        for attr in ("_cov_l1_h", "_cov_l1_dev", "_l2_host", "_l2_dev",
                     "_l2_dev_refined"):
            if hasattr(self, attr):
                delattr(self, attr)
        return self

    def solve(self, bi, bj):
        """Op-by-op application: fused apply programs compile to larger
        scratch arenas which, stacked on the factor programs', exhaust
        HBM at national scale — individual einsum/scatter dispatches run
        with the same math and minimal arenas."""
        Ainv, Y, A2inv, Y2, Sinv, di, dj, djg = self.factors
        part = self.part
        bi = np.asarray(bi, dtype=self.dtype)
        bj = np.asarray(bj, dtype=self.dtype)
        Bp = int(Ainv.shape[0])
        if bi.shape[0] != Bp:
            bi = np.pad(bi, ((0, Bp - bi.shape[0]), (0, 0)))
            bj = np.pad(bj, ((0, Bp - bj.shape[0]), (0, 0)))
        if self._small:
            # small-scale path: forward half fused into one program —
            # at bench scale the op-by-op path paid 4 tunnel round-trip
            # barriers + ~6 dispatch latencies per apply
            w, xi2, xsj = _nested_apply_fwd_jit(
                Ainv, Y, A2inv, Y2, Sinv, di, dj,
                self.jmask, self.sbb, self.l2slot, self.j2map,
                self.j2mask, self._putb(bi), self._putb(bj),
                part.SB, part.ni2, part.nj2, self.nsj_total)
        else:
            bi = self._putb(bi) * di
            bj = self._putb(bj) * dj
            # level-1 matvecs run at default precision: HIGHEST at this
            # batch size exhausts HBM, and the f64 refinement loop
            # absorbs the extra matvec noise (a round or two slower to
            # converge); serialise the big dispatches: async enqueue
            # keeps several matvec workspaces (transposed operand
            # copies) alive at once, which tips HBM over at national
            # scale
            w = _hard_sync(jnp.einsum("bij,bj->bi", Ainv, bi))
            self._probe("apply w", w)
            t_b = _hard_sync(
                (bj - jnp.einsum("bkj,bk->bj", Y, bi)) * self.jmask)
            self._probe("apply t_b", t_b)
            bi2, bj2 = _scatter_l2_rhs(t_b, self.sbb, self.l2slot,
                                       part.SB, part.ni2, part.nj2)
            w2 = _hard_sync(jnp.einsum("bij,bj->bi", A2inv, bi2))
            self._probe("apply w2", w2)
            t2_b = (bj2 - jnp.einsum("bkj,bk->bj", Y2, bi2)) * self.j2mask
            t2 = jnp.zeros((self.nsj_total,), dtype=t2_b.dtype)
            t2 = t2.at[self.j2map.reshape(-1)].add(t2_b.reshape(-1))
            xsj = _hard_sync(Sinv @ t2)
            self._probe("apply xsj", xsj)
            xsj_b = xsj[self.j2map] * self.j2mask
            xi2 = _hard_sync(w2 - jnp.einsum("bij,bj->bi", Y2, xsj_b))

        # junction reconstruction on host: two-level gathers compile
        # pathologically slowly on the TPU toolchain, and the vectors are
        # tiny compared to the factors
        xi2_h = np.asarray(xi2)
        xsj_h = np.asarray(xsj)
        njg = self.bs.nj_global
        xj = np.where(part.xj_kind == 0,
                      xi2_h[part.xj_sb,
                            np.minimum(part.xj_slot, part.ni2 - 1)],
                      xsj_h[np.minimum(part.xj_slot,
                                       self.nsj_total - 1)])
        xj_pad = np.concatenate([xj, [0.0]]).astype(xi2_h.dtype)
        xj_b = xj_pad[self.bs.jmap] * self.bs.jmask
        if xj_b.shape[0] != Bp:
            xj_b = np.pad(xj_b, ((0, Bp - xj_b.shape[0]), (0, 0)))

        xj_b_d = self._putb(xj_b.astype(self.dtype))
        xi = _nested_apply_bwd_jit(w, Y, di, xj_b_d)
        djg_h = np.asarray(djg)[:njg]
        return (np.asarray(xi, dtype=np.float64)[:self.B_real],
                np.asarray(xj, dtype=np.float64) * djg_h)


def schur_solve_nested_factored(bs: BlockSystem, part: NestedPartition,
                                refine: int = 2, dtype=np.float32,
                                factors: NestedSchurFactors = None,
                                streamed: bool = False,
                                max_refine: int = 12, mesh: Mesh = None,
                                axis: str = "blocks", matvec=None):
    """Nested mixed-precision solve with factor reuse: one 3-level f32
    factorization, then 1 + refine cheap applies with f64 host residual
    refinement.  Pass `factors` back in to skip re-factorizing when the
    normals are unchanged (refinement rounds, repeated rhs).

    streamed=True stages the level-1 factors in host RAM and streams
    them through the chip per chunk — for networks whose factors exceed
    HBM (the reference's staged .mtx mode, dnaadjust-stage.cpp:59)."""
    if factors is None:
        if streamed:
            # inline f64 Newton refinement by default: factor+refine in
            # ONE streamed pass with triangle-packed transfers, refined
            # pools host-resident, applies host-side — the
            # transfer-optimal national-scale pipeline (see
            # _streamed_chunk_factor_refine).  Applies then become
            # near-f64-exact, so streamed solves converge to ~1e-12
            # instead of stalling at the f32 contraction floor
            # (~1e-4 at 200k stations).  DTA_STREAMED_F64=0 keeps the
            # f32-only factors.
            factors = StreamedNestedSchurFactors(
                bs, part, dtype,
                refine_inline=os.environ.get("DTA_STREAMED_F64",
                                             "1") != "0")
        else:
            factors = NestedSchurFactors(bs, part, dtype, mesh=mesh,
                                         axis=axis)
    if matvec is None:
        matvec = partial(_block_matvec, bs)
    xi, xj = factors.solve(bs.bi, bs.bj)
    rhs_j_global = _gather_rhs_junction(bs)
    gi, gg = bs.owner_indices()      # cached per topology
    # residual-driven refinement: the f32 contraction rate is
    # ~kappa_scaled*eps per round, which worsens with network size —
    # iterate until the relative residual converges (up to max_refine),
    # with `refine` as the floor
    rhs_scale = max(float(np.abs(bs.bi).max()),
                    float(np.abs(rhs_j_global).max()), 1e-30)
    # DTA_MAX_REFINE bounds the residual-driven rounds: each streamed
    # apply re-uploads the factor pools over the tunnel (~GBs at
    # national scale), so capacity runs trade tail accuracy for
    # wall-clock explicitly
    max_refine = int(os.environ.get("DTA_MAX_REFINE", max_refine))
    max_refine = max(refine, max_refine)
    prev_rel = np.inf
    # refinement target: 1e-10 relative reaches ~sub-nanometre solve
    # error at national coordinate scales (corrections are metres);
    # DTA_SOLVE_RTOL tightens it for parity studies
    rtol = float(os.environ.get("DTA_SOLVE_RTOL", 1e-10))
    for round_no in range(max_refine):
        yi, yj = matvec(xi, xj)
        ri = (bs.bi * bs.imask) - yi
        rj = rhs_j_global - yj
        rel = max(float(np.abs(ri).max()),
                  float(np.abs(rj).max())) / rhs_scale
        if round_no >= refine and (rel < rtol or rel >= 0.5 * prev_rel):
            break
        prev_rel = rel
        rj_b = np.zeros_like(bs.bj).reshape(-1)
        rj_b[gi] = rj[gg]
        di_, dj_ = factors.solve(ri, rj_b.reshape(bs.bj.shape))
        xi = xi + di_
        xj = xj + dj_
    return xi, xj, factors


# ---------------------------------------------------------------------------
# host-streamed nested factors: networks whose level-1 factors exceed HBM
# ---------------------------------------------------------------------------

@jax.jit
def _streamed_chunk_factor(Nii_c, Nij_c, Njj_c, di_c, dj_c):
    """Scale + factor + invert one host-resident chunk of level-1 blocks.
    Same math as _nested_chunk_factor, but the chunk arrives from host
    RAM instead of being sliced out of device-resident normals."""
    from ..ops.blocked_chol import block_reduce
    Nii_c = Nii_c * di_c[:, :, None] * di_c[:, None, :]
    Nij_c = Nij_c * di_c[:, :, None] * dj_c[:, None, :]
    Njj_c = Njj_c * dj_c[:, :, None] * dj_c[:, None, :]
    return block_reduce(Nii_c, Nij_c, Njj_c)


@partial(jax.jit, static_argnames=("n", "max_rounds", "tol", "sliced",
                                   "nslices", "cross_max"))
def _streamed_chunk_factor_refine(NiiT, Nij_c, Njj_c, di_c, dj_c,
                                  iu0, iu1, n, max_rounds, tol, sliced,
                                  nslices, cross_max):
    """Factor AND Newton-refine one streamed chunk in a single pass —
    the transfer-optimal streamed pipeline (closing round-4's 200k
    ledger, artifacts/national_streamed/ATTEMPT.md):

      * the f64 Nii chunk arrives SYMMETRIC-TRIANGLE packed (halving
        the dominant upload) and is unpacked in-program;
      * the f32 factorization runs on the in-program cast — the f32
        factor pools never cross the link in either direction;
      * the residual-driven Newton refinement (full tier) runs
        immediately against the already-resident f64 pools — no
        N64/Ainv32 re-upload pass;
      * the refined f64 inverse leaves triangle-packed.

    Net per-chunk traffic: up tri(Nii64)+Nij64+Njj64, down
    tri(A64)+Y64 — ~19 GB at the 200,704-stn configuration vs ~57 GB
    for the two-phase (factor, then refine) pipeline."""
    from ..ops.blocked_chol import block_reduce
    from ..ops.slicegemm import mm64
    C = NiiT.shape[0]
    eye = jnp.eye(n, dtype=jnp.float64)
    up = jnp.zeros((C, n, n), jnp.float64).at[:, iu0, iu1].set(NiiT)
    Nii_s = up + jnp.swapaxes(up, 1, 2) * (1.0 - eye)
    Nii_s = Nii_s * di_c[:, :, None] * di_c[:, None, :]
    Nij_s = Nij_c * di_c[:, :, None] * dj_c[:, None, :]
    Njj_s = Njj_c * dj_c[:, :, None] * dj_c[:, None, :]
    Ainv32, _, _ = block_reduce(Nii_s.astype(jnp.float32),
                                Nij_s.astype(jnp.float32),
                                Njj_s.astype(jnp.float32))
    mm = partial(mm64, sliced=sliced, nslices=nslices,
                 cross_max=cross_max)
    A64, k, err = _newton_loop(Ainv32, Nii_s, mm, max_rounds, tol)
    Y64 = mm(A64, Nij_s)
    S_c = Njj_s - mm(Nij_s, Y64, transa=True)
    return A64[:, iu0, iu1], Y64, S_c, k, err


@partial(jax.jit, static_argnames=("SB", "ni2", "nj2"),
         donate_argnums=(0, 1, 2))
def _l2_accumulate(Nii2, Nij2, Njj2, S_c, jmask_c, sbb_c, l2s_c,
                   SB, ni2, nj2):
    """Accumulate one chunk's Schur pieces into the level-2 systems."""
    a, b, c = _nested_l2_assemble(S_c, jmask_c, sbb_c, l2s_c,
                                  SB=SB, ni2=ni2, nj2=nj2)
    return Nii2 + a, Nij2 + b, Njj2 + c


@partial(jax.jit, static_argnames=("SB", "ni2", "nj2"),
         donate_argnums=(0, 1))
def _l2rhs_accumulate(bi2, bj2, t_c, sbb_c, l2s_c, SB, ni2, nj2):
    a, b = _scatter_l2_rhs(t_c, sbb_c, l2s_c, SB, ni2, nj2)
    return bi2 + a, bj2 + b


@jax.jit
def _streamed_fwd_chunk(Ainv_c, Y_c, bi_c, bj_c, jmask_c):
    """Forward elimination of one chunk: w = Nii⁻¹ bi and the junction
    contribution t = (bj − Nji Nii⁻¹ bi)·mask."""
    w_c = jnp.einsum("bij,bj->bi", Ainv_c, bi_c)
    t_c = (bj_c - jnp.einsum("bkj,bk->bj", Y_c, bi_c)) * jmask_c
    return w_c, t_c


@jax.jit
def _streamed_bwd_chunk(Y_c, w_c, xjb_c, di_c):
    """Back-substitution of one chunk: x_i = (w − Nii⁻¹Nij x_j)·di."""
    return (w_c - jnp.einsum("bij,bj->bi", Y_c, xjb_c)) * di_c


@partial(jax.jit, static_argnames=("nsj_total",))
def _streamed_mid_solve(A2inv, Y2, Sinv, bi2, bj2, j2map, j2mask,
                        nsj_total):
    """Level-2 elimination + level-3 solve (all small, device-resident)."""
    w2 = jnp.einsum("bij,bj->bi", A2inv, bi2)
    t2_b = (bj2 - jnp.einsum("bkj,bk->bj", Y2, bi2)) * j2mask
    t2 = jnp.zeros((nsj_total,), dtype=t2_b.dtype)
    t2 = t2.at[j2map.reshape(-1)].add(t2_b.reshape(-1))
    xsj = Sinv @ t2
    xsj_b = xsj[j2map] * j2mask
    xi2 = w2 - jnp.einsum("bij,bj->bi", Y2, xsj_b)
    return xi2, xsj


class StreamedNestedSchurFactors:
    """Host-staged 3-level factorization for national-scale networks.

    The TPU analogue of the reference's staged adjustment
    (--staged-adjustment; per-block matrices memory-mapped to .mtx
    files, dnaadjust-stage.cpp:59, OffloadBlockToMappedFile
    dnaadjust.hpp:530): level-1 normals and their factors (explicit
    inverses + eliminated couplings) live in host RAM, and chunks of C
    blocks stream through the chip for the O(n³) work.  Only the
    level-2/3 factors (junction-sized, tiny) stay device-resident, so
    HBM holds one chunk at a time — network size is bounded by host
    RAM, exactly as the reference's staged mode is bounded by disk.

    Each apply streams the factor pool twice (forward elimination,
    back-substitution): on pod hosts this rides PCIe at tens of GB/s;
    over a tunnel it is link-bound, which is the capacity/latency trade
    the staged mode exists to make.
    """

    def __init__(self, bs: BlockSystem, part: NestedPartition,
                 dtype=np.float32, chunk: int = None,
                 refine_inline: bool = False):
        """refine_inline: factor AND f64-Newton-refine each chunk in one
        streamed pass (_streamed_chunk_factor_refine) with
        triangle-packed transfers — the refined f64 pools land directly
        in _cov_l1_h/_l2_host and applies run host-side f64 (zero
        further link traffic).  False keeps the two-phase pipeline (f32
        factor now, newton_refine_cov later)."""
        self.bs = bs
        self.part = part
        self.dtype = dtype
        self.nj_total = bs.nj_global + 1
        self.nsj_total = part.nsj_global + 1
        B, ni = bs.Nii.shape[:2]
        nj = bs.Njj.shape[1]

        # unity-scale vectors from the diagonals (host, f64)
        dii = np.einsum("bii->bi", bs.Nii)
        djj = np.einsum("bii->bi", bs.Njj) * bs.jmask
        djg = np.zeros((self.nj_total,))
        np.add.at(djg, bs.jmap.reshape(-1), djj.reshape(-1))
        djg = 1.0 / np.sqrt(np.where(djg <= 0.0, 1.0, djg))
        di = 1.0 / np.sqrt(np.where(dii <= 0.0, 1.0, dii))
        dj = np.where(bs.jmask > 0, djg[bs.jmap], 1.0)
        self.di64_h = di
        self.dj64_h = dj
        self.di_h = di.astype(dtype)
        self.dj_h = dj.astype(dtype)
        self.djg_h = djg

        # chunk size: a divisor of B (one compiled program for all
        # chunks) targeting ~DTA_STREAM_CHUNK_BYTES of traffic each;
        # the inline-refine program additionally holds the fused sliced
        # Newton transients (~(nslices+2) f32 slice copies of two f64
        # (C, ni, ni) operands), so its chunk is HBM-budgeted instead
        from ..ops.slicegemm import _use_sliced
        tier = _cov_tier(streamed=True)
        if chunk is None:
            if refine_inline:
                per_block = ((2 * (tier[0] + 2) * 4.0 + 8 * 8.0)
                             * float(ni) * ni)
                budget = float(os.environ.get("DTA_NEWTON_CHUNK_BYTES",
                                              3e9))
                chunk = max(1, int(budget / per_block))
            else:
                per_block = (2 * ni * ni + 2 * ni * nj + nj * nj) * \
                    np.dtype(dtype).itemsize
                target = int(os.environ.get("DTA_STREAM_CHUNK_BYTES",
                                            1 << 30))
                chunk = max(1, min(B, target // max(per_block, 1)))
        self.C = next(c for c in range(min(chunk, B), 0, -1)
                      if B % c == 0)

        C = self.C
        l2_dtype = np.float64 if refine_inline else dtype
        Nii2 = jnp.zeros((part.SB, part.ni2, part.ni2), dtype=l2_dtype)
        Nij2 = jnp.zeros((part.SB, part.ni2, part.nj2), dtype=l2_dtype)
        Njj2 = jnp.zeros((part.SB, part.nj2, part.nj2), dtype=l2_dtype)
        if refine_inline:
            rounds = int(os.environ.get("DTA_NEWTON_ROUNDS", 6))
            tol = float(os.environ.get("DTA_NEWTON_TOL", 1e-10))
            tk = dict(max_rounds=rounds, tol=tol, sliced=_use_sliced(),
                      nslices=tier[0], cross_max=tier[1])
            evid = {"l1_err": 0.0, "l1_rounds": 0, "l2_err": 0.0,
                    "l3_err": 0.0, "tol": tol, "max_rounds": rounds,
                    "tier": list(tier), "inline": True}
            iu0_h, iu1_h = np.triu_indices(ni)
            iu0 = jnp.asarray(iu0_h.astype(np.int32))
            iu1 = jnp.asarray(iu1_h.astype(np.int32))
            Ah = np.empty((B, ni, ni))
            Yh = np.empty((B, ni, nj))
            # the two-phase f32 pools never exist on this path — the
            # attribute stays as the streamed-layout marker (see
            # _nested_newton_refine_cov's hasattr discriminator)
            self.Ainv_h = None
            self.Y_h = None
            for k in range(0, B, C):
                sl = slice(k, k + C)
                A_tri, Y_c, S_c, k_used, err = \
                    _streamed_chunk_factor_refine(
                        jnp.asarray(bs.Nii[sl][:, iu0_h, iu1_h]),
                        jnp.asarray(bs.Nij[sl]),
                        jnp.asarray(bs.Njj[sl]),
                        jnp.asarray(self.di64_h[sl]),
                        jnp.asarray(self.dj64_h[sl]),
                        iu0, iu1, n=ni, **tk)
                _hard_sync(S_c)
                evid["l1_err"] = max(evid["l1_err"], float(err))
                evid["l1_rounds"] = max(evid["l1_rounds"], int(k_used))
                Nii2, Nij2, Njj2 = _l2_accumulate(
                    Nii2, Nij2, Njj2, S_c,
                    jnp.asarray(bs.jmask[sl]),
                    jnp.asarray(part.sb_of_block[sl]),
                    jnp.asarray(part.l2slot[sl]),
                    SB=part.SB, ni2=part.ni2, nj2=part.nj2)
                tri = np.asarray(A_tri)
                Ah[sl][:, iu0_h, iu1_h] = tri
                Ah[sl][:, iu1_h, iu0_h] = tri
                Yh[sl] = np.asarray(Y_c)
                del A_tri, Y_c, S_c
            self._cov_l1_h = (Ah, Yh)
        else:
            # host factor pools (the .mtx analogue)
            self.Ainv_h = np.empty((B, ni, ni), dtype=dtype)
            self.Y_h = np.empty((B, ni, nj), dtype=dtype)
            for k in range(0, B, C):
                sl = slice(k, k + C)
                Ainv_c, Y_c, S_c = _streamed_chunk_factor(
                    jnp.asarray(bs.Nii[sl].astype(dtype)),
                    jnp.asarray(bs.Nij[sl].astype(dtype)),
                    jnp.asarray(bs.Njj[sl].astype(dtype)),
                    jnp.asarray(self.di_h[sl]),
                    jnp.asarray(self.dj_h[sl]))
                Nii2, Nij2, Njj2 = _l2_accumulate(
                    Nii2, Nij2, Njj2, S_c,
                    jnp.asarray(bs.jmask[sl].astype(dtype)),
                    jnp.asarray(part.sb_of_block[sl]),
                    jnp.asarray(part.l2slot[sl]),
                    SB=part.SB, ni2=part.ni2, nj2=part.nj2)
                self.Ainv_h[sl] = np.asarray(Ainv_c)
                self.Y_h[sl] = np.asarray(Y_c)
                del Ainv_c, Y_c, S_c

        self.j2map = jnp.asarray(part.j2map)
        self.j2mask = jnp.asarray(part.j2mask.astype(dtype))
        A2inv, Y2, Sinv = _nested_factor_stage2(
            Nii2.astype(dtype), Nij2.astype(dtype), Njj2.astype(dtype),
            jnp.asarray(part.i2mask.astype(dtype)),
            self.j2mask, self.j2map, self.nsj_total)
        self.l2_factors = (A2inv, Y2, Sinv)
        if refine_inline:
            # refine the level-2/3 inverses against the exact f64
            # assemblies (device-resident, junction-sized)
            i2m = jnp.asarray(part.i2mask, dtype=jnp.float64)
            A2d, Y2d, S2_b, l2err = _newton_l2_batch(
                Nii2, Nij2, i2m, A2inv, **tk)
            evid["l2_err"] = float(l2err)
            Sinv64, l3err = _newton_l3(
                S2_b, Njj2, jnp.asarray(part.j2mask, dtype=jnp.float64),
                self.j2map, Sinv, nsj_total=self.nsj_total, **tk)
            evid["l3_err"] = float(l3err)
            self._l2_host = (np.asarray(A2d), np.asarray(Y2d),
                             np.asarray(Sinv64))
            self.cov_refine_evidence = evid

    def solve(self, bi, bj):
        bs, part = self.bs, self.part
        B, ni = bs.bi.shape
        C = self.C
        # after refine_factors() the Newton-refined f64 pools drive the
        # applies: each apply is then near-f64-exact, so refinement
        # converges in 1-2 rounds instead of stalling at the f32
        # contraction floor — the 0.1 mm-at-national-scale requirement
        # (matvecs are O(n^2): emulated f64 on TPU is fine here)
        refined = getattr(self, "_cov_l1_h", None)
        if refined is not None and \
                os.environ.get("DTA_STREAM_APPLY", "host") != "device":
            return self._solve_host(bi, bj)
        if refined is not None:
            Ah, Yh = refined
            A2inv, Y2, Sinv = [jnp.asarray(a) for a in self._l2_host]
            di_v, dj_v = self.di64_h, self.dj64_h
            dtype = np.float64
        else:
            Ah, Yh = self.Ainv_h, self.Y_h
            A2inv, Y2, Sinv = self.l2_factors
            di_v, dj_v = self.di_h, self.dj_h
            dtype = self.dtype
        bi_s = (np.asarray(bi) * di_v).astype(dtype)
        bj_s = (np.asarray(bj) * dj_v).astype(dtype)

        # forward elimination, streamed
        W = np.empty((B, ni), dtype=dtype)
        bi2 = jnp.zeros((part.SB, part.ni2), dtype=dtype)
        bj2 = jnp.zeros((part.SB, part.nj2), dtype=dtype)
        for k in range(0, B, C):
            sl = slice(k, k + C)
            w_c, t_c = _streamed_fwd_chunk(
                jnp.asarray(Ah[sl]), jnp.asarray(Yh[sl]),
                jnp.asarray(bi_s[sl]), jnp.asarray(bj_s[sl]),
                jnp.asarray(bs.jmask[sl].astype(dtype)))
            bi2, bj2 = _l2rhs_accumulate(
                bi2, bj2, t_c,
                jnp.asarray(part.sb_of_block[sl]),
                jnp.asarray(part.l2slot[sl]),
                SB=part.SB, ni2=part.ni2, nj2=part.nj2)
            W[sl] = np.asarray(w_c)
            del w_c, t_c

        # level-2/3 solve (device-resident, junction-sized)
        xi2, xsj = _streamed_mid_solve(A2inv, Y2, Sinv, bi2, bj2,
                                       self.j2map.astype(jnp.int32),
                                       self.j2mask.astype(dtype),
                                       nsj_total=self.nsj_total)

        # junction reconstruction on host (same as NestedSchurFactors)
        xi2_h = np.asarray(xi2)
        xsj_h = np.asarray(xsj)
        njg = bs.nj_global
        xj = np.where(part.xj_kind == 0,
                      xi2_h[part.xj_sb,
                            np.minimum(part.xj_slot, part.ni2 - 1)],
                      xsj_h[np.minimum(part.xj_slot, self.nsj_total - 1)])
        xj_pad = np.concatenate([xj, [0.0]]).astype(dtype)
        xj_b = (xj_pad[bs.jmap] * bs.jmask).astype(dtype)

        # back-substitution, streamed
        xi = np.empty((B, ni), dtype=np.float64)
        for k in range(0, B, C):
            sl = slice(k, k + C)
            xi_c = _streamed_bwd_chunk(
                jnp.asarray(Yh[sl]), jnp.asarray(W[sl]),
                jnp.asarray(xj_b[sl]),
                jnp.asarray(np.asarray(di_v[sl], dtype=dtype)))
            xi[sl] = np.asarray(xi_c, dtype=np.float64)
            del xi_c
        return xi, np.asarray(xj, dtype=np.float64) * self.djg_h[:njg]

    def _solve_host(self, bi, bj):
        """Apply the refined f64 factors entirely on HOST (numpy BLAS).

        The chip-streamed apply moves the full factor pools through the
        device per solve — tens of GB at national scale, which over a
        tunnel link dwarfs the O(n²) apply FLOPs (~7 GFLOP at 200k:
        ~1 s of host BLAS).  With the refined pools already
        host-resident (refine_inline), the apply is pure RAM bandwidth
        and ZERO link traffic.  DTA_STREAM_APPLY=device restores the
        chip-streamed path (pod-local PCIe, where the link is fast).
        Same philosophy as the reference's staged mode: keep big state
        where it lives, move only what the compute needs
        (dnaadjust-stage.cpp:59)."""
        bs, part = self.bs, self.part
        Ah, Yh = self._cov_l1_h
        A2h, Y2h, Sh = self._l2_host
        SB, ni2, nj2 = part.SB, part.ni2, part.nj2
        bi_s = np.asarray(bi) * self.di64_h
        bj_s = np.asarray(bj) * self.dj64_h
        # level-1 forward elimination
        w = np.matmul(Ah, bi_s[:, :, None])[:, :, 0]
        t_b = (bj_s - np.matmul(bi_s[:, None, :], Yh)[:, 0, :]) \
            * bs.jmask
        # level-2 rhs scatter (host replica of _scatter_l2_rhs)
        l2s = part.l2slot
        sbv = np.broadcast_to(part.sb_of_block[:, None], l2s.shape)
        inner = l2s < ni2
        junc = (l2s >= ni2) & (l2s < ni2 + nj2)
        bi2 = np.zeros((SB, ni2 + 1))
        bj2 = np.zeros((SB, nj2 + 1))
        np.add.at(bi2, (sbv, np.where(inner, l2s, ni2)), t_b * inner)
        np.add.at(bj2, (sbv, np.where(junc, l2s - ni2, nj2)),
                  t_b * junc)
        bi2, bj2 = bi2[:, :ni2], bj2[:, :nj2]
        # level-2 elimination + level-3 solve
        w2 = np.matmul(A2h, bi2[:, :, None])[:, :, 0]
        t2_b = (bj2 - np.matmul(bi2[:, None, :], Y2h)[:, 0, :]) \
            * part.j2mask
        t2 = np.zeros(self.nsj_total)
        np.add.at(t2, part.j2map.reshape(-1), t2_b.reshape(-1))
        xsj = Sh @ t2
        xsj_b = xsj[part.j2map] * part.j2mask
        xi2 = w2 - np.matmul(Y2h, xsj_b[:, :, None])[:, :, 0]
        # junction reconstruction + level-1 back-substitution
        njg = bs.nj_global
        xj = np.where(part.xj_kind == 0,
                      xi2[part.xj_sb,
                          np.minimum(part.xj_slot, ni2 - 1)],
                      xsj[np.minimum(part.xj_slot, self.nsj_total - 1)])
        xj_pad = np.concatenate([xj, [0.0]])
        xj_b = xj_pad[bs.jmap] * bs.jmask
        xi = (w - np.matmul(Yh, xj_b[:, :, None])[:, :, 0]) \
            * self.di64_h
        return xi, xj * self.djg_h[:njg]


# ---------------------------------------------------------------------------
# nested a-posteriori covariance extraction (for adjusted-measurement stats)
# ---------------------------------------------------------------------------

def _cov_tier(streamed: bool):
    """(nslices, cross_max) of the covariance-refinement products.

    Streamed factors back the SOLVE applies (relative-residual bar
    ~1e-12) and stay at the full tier.  Resident refinement feeds only
    reporting consumers (formal SDs, .apu/SINEX block covariances,
    measurement statistics — 3-4 printed figures), where the (6, 5)
    tier suffices at half the MXU passes.  NOTE the achieved inverse
    residual floors at ~C_tier x kappa(scaled system) — C measured in
    tests/test_newton_tiers.py ((8,8): ~3e-13, (6,5): ~3e-8, (5,4):
    ~3e-6) — NOT at a kappa-free constant; the residual-driven loop
    stops at that floor and records it as evidence.
    DTA_COV_TIER=nslices,cross_max overrides."""
    from ..ops.slicegemm import NSLICES, CROSS_MAX
    if streamed:
        return NSLICES, CROSS_MAX
    v = os.environ.get("DTA_COV_TIER", "6,5")
    n, c = v.split(",")
    return int(n), int(c)


def _newton_loop(A0, Nb, mm, max_rounds, tol):
    """Residual-DRIVEN Newton–Schulz A ← A(2I − N·A) (traced helper).

    Rounds are measured, not assumed: each iteration carries the live
    inverse residual err = max|I − N·A| and the loop stops as soon as
    err ≤ tol (or max_rounds is hit).  This replaces the former fixed
    round counts, whose "two squarings suffice" estimate was disproven
    on ill-conditioned networks (the f32 starting error can be ~1e-1,
    leaving ~1e-4-class covariance error after 2 rounds) — accuracy is
    now evidence, returned to the caller: (A, rounds_used, err_final),
    with err_final the MEASURED max|I − N·A| of the refined inverse
    (the rigour bar of the reference's f64 dpotri,
    dnamatrix_contiguous.cpp:996-1006).  Cost per round is unchanged
    (2 products — the residual falls out of the Newton step itself)
    plus one upfront product for the initial measurement."""
    n = A0.shape[-1]
    eye = jnp.eye(n, dtype=jnp.float64)
    eye2 = 2.0 * eye

    def measure(A):
        T = eye2 - mm(Nb, A)          # T = 2I − N·A; I − N·A = T − I
        return T, jnp.max(jnp.abs(T - eye))

    def cond(state):
        _, _, err, prev, k = state
        # stop at the target, at the round cap, or when a round stops
        # halving the residual (the sliced-product tier floor on TPU —
        # below it further rounds only re-measure the product noise)
        return jnp.logical_and(
            jnp.logical_and(k < max_rounds, err > tol),
            err < 0.5 * prev)

    def body(state):
        A, T, err, _, k = state
        A = mm(A, T)
        A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
        T, err_n = measure(A)
        return A, T, err_n, err, k + 1

    T0, err0 = measure(A0.astype(jnp.float64))
    A, _, err, _, k = jax.lax.while_loop(
        cond, body, (A0.astype(jnp.float64), T0, err0,
                     jnp.asarray(np.inf, jnp.float64), jnp.int32(0)))
    return A, k, err


@partial(jax.jit, static_argnames=("max_rounds", "tol", "sliced",
                                   "nslices", "cross_max"))
def _newton_l1_chunk(Nii_c, Nij_c, Njj_c, di_c, dj_c, Ainv_c, max_rounds,
                     tol, sliced, nslices, cross_max):
    """f64 Newton-Schulz on one chunk of level-1 inverses — ONE fused
    program: returns (refined Ainv, Y = Ainv·Nij, Schur piece S,
    rounds_used, err) all f64, with the measured inverse residual as
    accuracy evidence (_newton_loop).  The op-by-op form paid a tunnel
    dispatch + sync per batch/depth sub-chunk of every sliced product
    (~300 round-trips ≈ 10-20 s at the 10k bench); fused, the depth
    loops unroll in-trace into a single dispatch per chunk."""
    from ..ops.slicegemm import mm64
    mm = partial(mm64, sliced=sliced, nslices=nslices,
                 cross_max=cross_max)
    Nii_c = Nii_c * di_c[:, :, None] * di_c[:, None, :]
    Nij_c = Nij_c * di_c[:, :, None] * dj_c[:, None, :]
    Njj_c = Njj_c * dj_c[:, :, None] * dj_c[:, None, :]
    A, k, err = _newton_loop(Ainv_c, Nii_c, mm, max_rounds, tol)
    Y = mm(A, Nij_c)
    S_c = Njj_c - mm(Nij_c, Y, transa=True)
    return A, Y, S_c, k, err


@partial(jax.jit, static_argnames=("max_rounds", "tol", "sliced",
                                   "nslices", "cross_max"))
def _newton_l2_batch(Nii2, Nij2, i2mask, A2inv32, max_rounds, tol,
                     sliced, nslices, cross_max):
    """f64 Newton-Schulz on ALL level-2 inverses (same pinning as
    _nested_l2_factor_one), BATCHED over the SB super-blocks in one
    while_loop (the worst block's residual drives the rounds — a
    Python-unrolled per-block loop compiled to a ~110 MB executable at
    national scale, and over a tunnel every process pays
    executable-size/link-rate to load it); returns stacked
    (A2inv, Y2, S2) f64 + the worst measured inverse residual."""
    from ..ops.slicegemm import mm64
    mm = partial(mm64, sliced=sliced, nslices=nslices,
                 cross_max=cross_max)
    eye = jnp.eye(Nii2.shape[1], dtype=jnp.float64)
    Nii2b = Nii2 + eye[None] * (1.0 - i2mask)[:, None, :]
    A2, _, err = _newton_loop(A2inv32, Nii2b, mm, max_rounds, tol)
    Y2 = mm(A2, Nij2)
    S2 = - mm(Nij2, Y2, transa=True)
    return A2, Y2, S2, err


@partial(jax.jit, static_argnames=("nsj_total", "max_rounds", "tol",
                                   "sliced", "nslices", "cross_max"))
def _newton_l3(S2_b, Njj2, j2mask, j2map, Sinv32, nsj_total, max_rounds,
               tol, sliced, nslices, cross_max):
    """Assemble the f64 super-junction system and Newton-refine its
    inverse from the f32 one — one fused program.  Returns (Sinv, err)
    with the measured inverse residual."""
    from ..ops.slicegemm import mm64
    mm = partial(mm64, sliced=sliced, nslices=nslices,
                 cross_max=cross_max)
    S2_b = (Njj2 + S2_b) * j2mask[:, :, None] * j2mask[:, None, :]
    S2, _ = _scatter_junction(S2_b, jnp.zeros_like(S2_b[..., 0]), j2map,
                              nsj_total)
    diag = jnp.diag(S2)
    S2 = S2 + jnp.diag(jnp.where(diag == 0.0, 1.0, 0.0))
    Si, _, err = _newton_loop(Sinv32, S2, mm, max_rounds, tol)
    return Si, err


def _nested_newton_refine_cov(self, rounds: int = None, N64=None):
    """One-time f64 Newton refinement of the nested f32 factors for the
    variance-extraction stage: level-1 inverses are refined chunk-by-chunk
    (host-streamed, so HBM holds one f64 chunk at a time), the level-2
    systems are re-assembled in f64 from the refined pieces, and the
    level-2/3 inverses are refined against them.  After this call
    level1_block/junction_cov return f64-quality covariances.  No-op when
    the factors are already f64.

    N64: (Nii, Nij, Njj) f64 pools (device or host) overriding bs.* —
    required when the normals were device-assembled in f32
    (DeviceAssembly.build_f64())."""
    if self.dtype == np.float64 or getattr(self, "_cov_l1_h", None) \
            or getattr(self, "_cov_l1_dev", None):
        return
    if rounds is None:
        # rounds are residual-DRIVEN (_newton_loop): each chunk stops
        # when its measured max|I − N·Ainv| ≤ DTA_NEWTON_TOL, up to
        # DTA_NEWTON_ROUNDS.  The former fixed counts assumed the f32
        # starting error ≤1e-2 ("two squarings suffice"), which real
        # ill-conditioned networks violate (urban: ~1e-1 start → ~3e-4
        # covariance error at 2 rounds); measuring closes that class of
        # regression and SAVES rounds on well-conditioned chunks.
        rounds = int(os.environ.get("DTA_NEWTON_ROUNDS", 6))
    # streamed factors back the SOLVE applies, where every extra outer
    # refinement round re-streams the pools through the chip — drive
    # them to the full-tier floor; resident refinement feeds reporting
    # consumers, whose bar is the cross-path covariance agreement
    # (~1e-9 relative, tests/test_device_assembly.py)
    tol = float(os.environ.get(
        "DTA_NEWTON_TOL", 1e-10 if hasattr(self, "Ainv_h") else 3e-9))
    bs, part = self.bs, self.part
    if N64 is None:
        N64 = (bs.Nii, bs.Nij, bs.Njj)
        if not isinstance(bs.Nii, np.ndarray):
            raise ValueError("device-assembled normals: pass N64 "
                             "(DeviceAssembly.build_f64())")
    B, ni = N64[0].shape[:2]
    streamed = hasattr(self, "Ainv_h")
    tier = _cov_tier(streamed)
    from ..ops.slicegemm import _use_sliced
    tk = dict(max_rounds=rounds, tol=tol, sliced=_use_sliced(),
              nslices=tier[0], cross_max=tier[1])
    evid = {"l1_err": 0.0, "l1_rounds": 0, "l2_err": 0.0, "l3_err": 0.0,
            "tol": tol, "max_rounds": rounds, "tier": list(tier)}
    if streamed:                                     # streamed layout
        di_h, dj_h = self.di_h, self.dj_h
        ainv_src = lambda s: self.Ainv_h[s]
        a2_src = self.l2_factors
        keep_dev = False                  # factors exceed HBM by design
    else:
        Ainv, Y, A2inv, Y2, Sinv, di, dj, djg = self.factors
        di_h, dj_h = np.asarray(di), np.asarray(dj)
        ainv_src = lambda s: Ainv[s]      # device slice, no host trip
        a2_src = (A2inv, Y2, Sinv)
        # resident path: keep the refined f64 L1 pools ON DEVICE when
        # they fit — the host round-trip (download per refine chunk +
        # re-upload per stats chunk) cost ~4.8 GB over the tunnel at
        # the 102,400-stn configuration
        njdim = N64[2].shape[1]
        keep_dev = (B * ni * (ni + njdim) * 8.0 <=
                    float(os.environ.get("DTA_COV_DEV_BYTES", 4e9)))

    # chunk the fused L1 refinement under an HBM budget: one program
    # holds ~2 sliced-operand copy sets ((nslices+2) f32 each) plus ~6
    # f64 ni x ni intermediates per block — at bench scale (ni 3.4k)
    # that is ~1.3 GB/block, and the former fixed 16-block chunk OOM'd
    # a 16 GB chip on the warm re-run
    per_block = ((2 * (tier[0] + 2) * 4.0 + 6 * 8.0)
                 * float(ni) * ni)
    budget = float(os.environ.get("DTA_NEWTON_CHUNK_BYTES", 3e9))
    want = min(16, max(1, int(budget / per_block)))
    C = next(c for c in range(min(want, B), 0, -1) if B % c == 0)
    njdim = N64[2].shape[1]
    if keep_dev:
        Ad = jnp.zeros((B, ni, ni), jnp.float64)
        Yd = jnp.zeros((B, ni, njdim), jnp.float64)
        from ..adjust.device_assembly import _upd_pool as upd
    else:
        Ah = np.empty((B, ni, ni))
        Yh = np.empty((B, ni, njdim))
    Nii2 = jnp.zeros((part.SB, part.ni2, part.ni2), dtype=jnp.float64)
    Nij2 = jnp.zeros((part.SB, part.ni2, part.nj2), dtype=jnp.float64)
    Njj2 = jnp.zeros((part.SB, part.nj2, part.nj2), dtype=jnp.float64)
    jmask64 = bs.jmask.astype(np.float64)
    sbb = jnp.asarray(part.sb_of_block)
    l2s = jnp.asarray(part.l2slot)
    import time as _time
    _nt = os.environ.get("DTA_NEWTON_TRACE", "") == "1"
    _t0 = _time.perf_counter()

    def _tr(tag):
        nonlocal _t0
        if _nt:
            now = _time.perf_counter()
            print(f"newton[{tag}] {now - _t0:.2f}s", file=sys.stderr,
                  flush=True)
            _t0 = now

    l1_ev = []        # device scalars; materialised AFTER the loop so
                      # evidence reads don't add two tunnel round-trips
                      # to every chunk (the per-chunk _hard_sync below
                      # already serialises HBM usage)
    for k in range(B // C):
        s = slice(k * C, (k + 1) * C)
        A_c, Y_c, S_c, k_used, err_c = _newton_l1_chunk(
            jnp.asarray(N64[0][s]), jnp.asarray(N64[1][s]),
            jnp.asarray(N64[2][s]),
            jnp.asarray(di_h[s], dtype=jnp.float64),
            jnp.asarray(dj_h[s], dtype=jnp.float64),
            jnp.asarray(ainv_src(s)), **tk)
        l1_ev.append((k_used, err_c))
        _tr(f"l1 chunk {k}")
        if keep_dev:
            Ad = upd(Ad, A_c, s.start)
            Yd = upd(Yd, Y_c, s.start)
            _hard_sync(Yd)
        else:
            Ah[s] = np.asarray(A_c)
            Yh[s] = np.asarray(Y_c)
        _tr(f"l1 store {k}")
        Nii2, Nij2, Njj2 = _l2_accumulate(
            Nii2, Nij2, Njj2, S_c, jnp.asarray(jmask64[s]),
            sbb[s], l2s[s], SB=part.SB, ni2=part.ni2, nj2=part.nj2)
        _tr(f"l1 l2acc {k}")
    evid["l1_err"] = max([float(e) for _, e in l1_ev], default=0.0)
    evid["l1_rounds"] = max([int(k) for k, _ in l1_ev], default=0)
    if keep_dev:
        self._cov_l1_dev = (Ad, Yd)

    i2m = jnp.asarray(part.i2mask, dtype=jnp.float64)
    A2_32 = jnp.asarray(a2_src[0])
    # same HBM budget for the fused level-2 refinement (one unrolled
    # program per super-block chunk)
    per_sb = ((2 * (tier[0] + 2) * 4.0 + 6 * 8.0)
              * float(part.ni2) * part.ni2)
    cs = min(part.SB, max(1, int(budget / per_sb)))
    CS = next(c for c in range(cs, 0, -1) if part.SB % c == 0)
    l2parts = []
    for k0 in range(0, part.SB, CS):
        s2 = slice(k0, k0 + CS)
        out = _newton_l2_batch(Nii2[s2], Nij2[s2], i2m[s2],
                               A2_32[s2], **tk)
        _hard_sync(out[2])
        l2parts.append(out)
        _tr(f"l2 batch {k0}")
    evid["l2_err"] = max(float(o[3]) for o in l2parts)
    A2d = jnp.concatenate([o[0] for o in l2parts])
    Y2d = jnp.concatenate([o[1] for o in l2parts])
    S2_b = jnp.concatenate([o[2] for o in l2parts])
    # the level-3 (super-junction) system is the smallest but worst
    # conditioned piece — at the 102,400-stn configuration the (6,5)
    # tier floors its inverse residual at ~1e-6 (kappa-scaled floor,
    # tests/test_newton_tiers.py) while the full tier costs only
    # O(nsj^3) extra passes on one small matrix: always refine L3 at
    # the full tier
    from ..ops.slicegemm import NSLICES, CROSS_MAX
    tk3 = dict(tk, nslices=max(tier[0], NSLICES),
               cross_max=max(tier[1], CROSS_MAX))
    Sinv64, l3_err = _newton_l3(
        S2_b, Njj2,
        jnp.asarray(part.j2mask, dtype=jnp.float64),
        jnp.asarray(part.j2map), jnp.asarray(a2_src[2]),
        nsj_total=self.nsj_total, **tk3)
    evid["l3_err"] = float(l3_err)
    _tr("l3")
    self.cov_refine_evidence = evid
    if not keep_dev:
        self._cov_l1_h = (Ah, Yh)
    if streamed:
        self._l2_host = (np.asarray(A2d), np.asarray(Y2d),
                         np.asarray(Sinv64))
    else:
        # resident path: KEEP the refined level-2/3 pools on device —
        # the statistics pass consumes them there, and the former
        # download-then-reupload round-trip of ~1.2 GB over the tunnel
        # cost ~240 s of the 102,400-stn stats stage.  The writers'
        # host view (junction_cov) downloads lazily if needed.
        self._l2_dev_refined = (A2d, Y2d, Sinv64)
        self._l2_host = None


def _cov_l1_host(self):
    """Host view of the refined L1 pools — lazily downloaded when they
    were kept device-resident (writers' block-cov path needs numpy)."""
    h = getattr(self, "_cov_l1_h", None)
    if h is not None:
        return h
    d = getattr(self, "_cov_l1_dev", None)
    if d is None:
        return None
    self._cov_l1_h = (np.asarray(d[0]), np.asarray(d[1]))
    return self._cov_l1_h


NestedSchurFactors.cov_l1_host = _cov_l1_host
StreamedNestedSchurFactors.cov_l1_host = _cov_l1_host


def nested_junction_cov(part: NestedPartition, A2inv, Y2, Sinv, gsel):
    """Scaled a-posteriori covariance over global junction params `gsel`.

    The level-2 analogue of reading Sinv blocks on the flat path: with
    W = Y2[sb] and the level-3 inverse Sinv,
        Cov(inner2_sb)      = A2inv[sb] + W Sinv_sel Wᵀ
        Cov(inner2_sb, xsj) = −W Sinv[j2map[sb], :]
        Cov(xsj)            = Sinv
    (the standard 2x2 block-inverse identities, same as the reference's
    combine-pass variance recovery, dnaadjust.cpp:3196).  All params of
    one level-1 block live in a single super-block by construction, so
    any block's junction params are covered.  Returns (k, k) in the
    djg-scaled space."""
    gsel = np.asarray(gsel, dtype=np.int64)
    k = len(gsel)
    kind = part.xj_kind[gsel]
    sbs = {int(s) for s in part.xj_sb[gsel[kind == 0]]}
    if len(sbs) > 1:
        raise ValueError("junction params span multiple super-blocks")
    cov = np.zeros((k, k))
    sj_idx = part.xj_slot[gsel]          # inner2 slot (kind 0) / sj (kind 1)
    if (kind == 0).any():
        sb = next(iter(sbs))
        jm2 = part.j2map[sb]
        Sl = np.asarray(Sinv, dtype=np.float64)
        C_loc = Sl[np.ix_(jm2, jm2)] * np.outer(part.j2mask[sb],
                                                part.j2mask[sb])
        i0 = np.nonzero(kind == 0)[0]
        # only the selected rows of the level-2 covariance are needed:
        # k0 ~ one block's junction width, ni2 ~ thousands — computing
        # U_sel C U_selᵀ instead of the full (ni2, ni2) matrix drops the
        # per-block cost from O(ni2² nj2) to O(k0 nj2² + k0² nj2)
        r0 = np.asarray(sj_idx[i0], dtype=np.int64)
        U_sel = np.asarray(Y2[sb], dtype=np.float64)[r0, :]   # (k0, nj2)
        A2_sel = np.asarray(A2inv[sb], dtype=np.float64)[np.ix_(r0, r0)]
        USC = U_sel @ C_loc
        cov[np.ix_(i0, i0)] = A2_sel + USC @ U_sel.T
        i1 = np.nonzero(kind == 1)[0]
        if len(i1):
            X_sel = -(U_sel * part.j2mask[sb][None, :]) \
                @ Sl[np.ix_(jm2, sj_idx[i1])]                 # (k0, k1)
            cov[np.ix_(i0, i1)] = X_sel
            cov[np.ix_(i1, i0)] = X_sel.T
    i1 = np.nonzero(kind == 1)[0]
    if len(i1):
        Sl = np.asarray(Sinv, dtype=np.float64)
        cov[np.ix_(i1, i1)] = Sl[np.ix_(sj_idx[i1], sj_idx[i1])]
    return cov


def _resident_level1_block(self, b):
    Ainv, Y, A2inv, Y2, Sinv, di, dj, djg = self.factors
    refined = self.cov_l1_host()
    if refined is not None:
        Ah, Yh = refined
        return Ah[b], Yh[b], np.asarray(di[b], dtype=np.float64)
    return (np.asarray(Ainv[b], dtype=np.float64),
            np.asarray(Y[b], dtype=np.float64),
            np.asarray(di[b], dtype=np.float64))


def _resident_junction_cov(self, gsel):
    Ainv, Y, A2inv, Y2, Sinv, di, dj, djg = self.factors
    if getattr(self, "_l2_host", None) is None:
        dev = getattr(self, "_l2_dev_refined", None)
        if dev is not None:
            # lazy host view of the Newton-refined device pools
            self._l2_host = tuple(np.asarray(a, dtype=np.float64)
                                  for a in dev)
        else:
            self._l2_host = (np.asarray(A2inv, dtype=np.float64),
                             np.asarray(Y2, dtype=np.float64),
                             np.asarray(Sinv, dtype=np.float64))
    A2h, Y2h, Sh = self._l2_host
    return nested_junction_cov(self.part, A2h, Y2h, Sh, gsel)


def _resident_djg_np(self):
    return np.asarray(self.factors[7], dtype=np.float64)


NestedSchurFactors.level1_block = _resident_level1_block
NestedSchurFactors.junction_cov = _resident_junction_cov
NestedSchurFactors.djg_np = property(_resident_djg_np)
NestedSchurFactors.newton_refine_cov = _nested_newton_refine_cov


def _streamed_level1_block(self, b):
    if getattr(self, "_cov_l1_h", None):
        Ah, Yh = self._cov_l1_h
        return Ah[b], Yh[b], np.asarray(self.di_h[b], dtype=np.float64)
    return (np.asarray(self.Ainv_h[b], dtype=np.float64),
            np.asarray(self.Y_h[b], dtype=np.float64),
            np.asarray(self.di_h[b], dtype=np.float64))


def _streamed_junction_cov(self, gsel):
    if getattr(self, "_l2_host", None) is None:
        A2inv, Y2, Sinv = self.l2_factors
        self._l2_host = (np.asarray(A2inv, dtype=np.float64),
                         np.asarray(Y2, dtype=np.float64),
                         np.asarray(Sinv, dtype=np.float64))
    A2h, Y2h, Sh = self._l2_host
    return nested_junction_cov(self.part, A2h, Y2h, Sh, gsel)


def _streamed_djg_np(self):
    return np.asarray(self.djg_h, dtype=np.float64)


StreamedNestedSchurFactors.level1_block = _streamed_level1_block
StreamedNestedSchurFactors.junction_cov = _streamed_junction_cov
StreamedNestedSchurFactors.djg_np = property(_streamed_djg_np)
StreamedNestedSchurFactors.newton_refine_cov = _nested_newton_refine_cov
