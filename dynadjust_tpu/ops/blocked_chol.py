"""Blocked batched Cholesky + triangular inverse, tiled for the MXU.

XLA's monolithic `cholesky` + `triangular_solve` on (B, n, n) batches
round-trips HBM per elimination step and materialises batch-wide temps
(at national scale that forces the lax.map chunking in parallel/schur.py).
This module re-expresses the factorization as a right-looking blocked
algorithm over 128x128 tiles at the JAX level:

  * diagonal tiles: batched jnp.linalg.cholesky + a (B, 128, 128)
    triangular inverse — the only non-matmul work, tile-sized;
  * every panel update and the block forward substitution for L^-1 are
    full-f32 einsums — pure MXU.

Measured on TPU v5e at (16, 768, 768): 2.66 ms vs XLA's 3.80 ms (1.43x),
with tile-sized temps instead of batch-wide ones.  A fused Pallas kernel
of the same algorithm (ops/pallas_schur.py) measures 10.3 ms — the
mask-based VPU loops for the 128-wide tiles lose more than VMEM locality
saves — so this is the production factor path and the Pallas kernel is
kept as an alternate backend.

Parity: the reference factors/inverts per-block normals with LAPACK
dpotrf/dpotri (dnamatrix_contiguous.cpp:963-1006); `Linv^T Linv` is the
same explicit inverse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE = 128

_HI = jax.lax.Precision.HIGHEST
_ee = functools.partial(jnp.einsum, precision=_HI)


def _pad_spd(Nii, t=TILE):
    """Pad (B, n, n) to a tile multiple, identity on padded diagonal."""
    n0 = Nii.shape[1]
    r = (-n0) % t
    if not r:
        return Nii, n0
    Nii = jnp.pad(Nii, ((0, 0), (0, r), (0, r)))
    n = n0 + r
    eye = jnp.eye(n, dtype=Nii.dtype)
    mask = jnp.where(jnp.arange(n) >= n0, 1.0, 0.0).astype(Nii.dtype)
    return Nii + eye[None] * mask[None, :], n0


def blocked_cholesky_linv(Nii):
    """(B, n, n) f32 SPD batch -> Linv with Nii = L L^T, L = Linv^-1.

    Tiles of 128; python loops are static (n is trace-time constant).
    Works on any backend (pure jnp) — on TPU the einsums own the MXU."""
    f32 = Nii.dtype
    Nii, n0 = _pad_spd(Nii)
    n = Nii.shape[1]
    nt = n // TILE
    eyeT = jnp.eye(TILE, dtype=f32)

    Lt = [[None] * nt for _ in range(nt)]
    Vt = [[None] * nt for _ in range(nt)]

    def tile(i, j):
        return Nii[:, i * TILE:(i + 1) * TILE, j * TILE:(j + 1) * TILE]

    for k in range(nt):
        D = tile(k, k)
        for j in range(k):
            D = D - _ee("bij,bkj->bik", Lt[k][j], Lt[k][j])
        Lkk = jnp.linalg.cholesky(D)
        Vkk = jax.lax.linalg.triangular_solve(
            Lkk, jnp.broadcast_to(eyeT, Lkk.shape),
            left_side=True, lower=True)
        Lt[k][k], Vt[k][k] = Lkk, Vkk
        for i in range(k + 1, nt):
            P = tile(i, k)
            for j in range(k):
                P = P - _ee("bij,bkj->bik", Lt[i][j], Lt[k][j])
            Lt[i][k] = _ee("bij,bkj->bik", P, Vkk)

    # block forward substitution: Linv[i,:i] = -Linv[i,i] L[i,:i] Linv[:i,:i]
    for i in range(1, nt):
        for kcol in range(i):
            acc = None
            for j in range(kcol, i):
                t = _ee("bij,bjk->bik", Lt[i][j], Vt[j][kcol])
                acc = t if acc is None else acc + t
            Vt[i][kcol] = -_ee("bij,bjk->bik", Vt[i][i], acc)

    zero = None
    rows = []
    for i in range(nt):
        cols = []
        for j in range(nt):
            if j <= i:
                cols.append(Vt[i][j])
            else:
                if zero is None:
                    zero = jnp.zeros_like(Vt[i][i])
                cols.append(zero)
        rows.append(jnp.concatenate(cols, axis=2))
    Linv = jnp.concatenate(rows, axis=1)
    return Linv[:, :n0, :n0]


def blocked_spd_inverse(Nii):
    """Explicit batched SPD inverse via the blocked factorization
    (dpotrf+dpotri parity): Nii^-1 = Linv^T Linv."""
    Linv = blocked_cholesky_linv(Nii)
    return _ee("bki,bkj->bij", Linv, Linv)


def block_reduce(Nii, Nij, Njj, backend: str = None):
    """Per-block inner-station elimination from f32 blocked normals:

        Ainv = Nii^-1;  Y = Ainv Nij;  S_b = Njj - Nij^T Y

    backend: 'rec' (recursive GEMM-rich inversion, ops/recursive_inv —
    default; measured 35% f32 MFU at (9, 3456) vs ~6% for the tiled
    left-looking version), 'blocked' (this module), 'pallas' (fused
    VMEM kernel, ops/pallas_schur.py), 'xla' (monolithic
    cholesky+cho_solve).  DTA_FACTOR_BACKEND overrides.
    """
    import os
    if backend is None:
        backend = os.environ.get("DTA_FACTOR_BACKEND", "rec")
    # preserve the caller's working precision (f64 callers exist: the
    # nested factors built with dtype=float64 on CPU); only the pallas
    # kernel is f32-only
    dt = jnp.promote_types(Nii.dtype, jnp.float32)
    Nii = Nii.astype(dt)
    Nij = Nij.astype(dt)
    Njj = Njj.astype(dt)
    if backend == "rec":
        from .recursive_inv import block_reduce_rec
        return block_reduce_rec(Nii, Nij, Njj)
    if backend == "pallas":
        from .pallas_schur import fused_block_reduce
        return fused_block_reduce(Nii.astype(jnp.float32),
                                  Nij.astype(jnp.float32),
                                  Njj.astype(jnp.float32))
    if backend == "xla":
        L = jnp.linalg.cholesky(Nii)
        eye = jnp.eye(Nii.shape[1], dtype=dt)
        Ainv = jax.scipy.linalg.cho_solve(
            (L, True), jnp.broadcast_to(eye, Nii.shape))
        Y = _ee("bij,bjk->bik", Ainv, Nij)
        S = Njj - _ee("bki,bkj->bij", Nij, Y)
        return Ainv, Y, S
    Linv = blocked_cholesky_linv(Nii)
    W = _ee("bij,bjk->bik", Linv, Nij)
    Ainv = _ee("bki,bkj->bij", Linv, Linv)
    Y = _ee("bki,bkj->bij", Linv, W)
    S = Njj - _ee("bki,bkj->bij", W, W)
    return Ainv, Y, S
