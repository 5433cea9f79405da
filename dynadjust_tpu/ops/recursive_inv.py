"""Recursive blocked Cholesky / SPD inversion — GEMM-rich, MXU-first.

The reference inverts per-block normals with LAPACK dpotrf+dpotri
(dnamatrix_contiguous.cpp:963-1006).  The tiled left-looking blocked
Cholesky in ops/blocked_chol.py is numerically equivalent but emits
O((n/128)^3) tile-sized (B,128,128) einsums, each ~10-40 us of MXU work
— dispatch latency bound, which is why the measured factor MFU sat at
~3% for two rounds.

This module re-expresses dpotrf+dpotri as halving recursions whose work
above the 256-wide base case is a handful of LARGE batched matmuls per
level (panel counts double as sizes halve, staying batch-wide), so XLA
keeps the MXU busy instead of dispatching thousands of tile ops:

    chol_rec(A):   L11 = chol_rec(A11)
                   B   = A21 L11^-T          (GEMM, via tri_inv_rec)
                   L22 = chol_rec(A22 - B B^T)   (GEMM)

    tri_inv_rec(L):  X11 = tri_inv_rec(L11); X22 = tri_inv_rec(L22)
                     X21 = -X22 L21 X11       (2 GEMMs)

    A^-1 = Linv^T Linv                        (GEMM)

Measured on the v5e at (9, 3456, 576): 35% f32 MFU for the full
block_reduce vs ~6% for the tiled version (scripts/factor_mfu_sweep.py).

Numerics: identical quadratic-form structure to LAPACK's blocked
algorithms — in particular the Schur complement S = Njj - W^T W is
assembled from a triangular factor (PSD-safe), which matters for
junction systems whose smallest eigenvalue sits near the f32 assembly
noise.  Every production consumer additionally refines against f64
residuals (parallel/schur.py refinement loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
_ee = functools.partial(jnp.einsum, precision=_HI)

BASE = 256


def _split(n: int) -> int:
    """Split point rounded to a 128 multiple (MXU tile alignment)."""
    return ((n + 1) // 2 + 127) // 128 * 128


def chol_rec(A):
    """Batched lower Cholesky of (B, n, n) SPD, halving recursion."""
    n = A.shape[-1]
    if n <= BASE or _split(n) >= n:
        return jnp.linalg.cholesky(A)
    h = _split(n)
    A11 = A[..., :h, :h]
    A21 = A[..., h:, :h]
    A22 = A[..., h:, h:]
    L11 = chol_rec(A11)
    X11 = tri_inv_rec(L11)
    B = _ee("...ij,...kj->...ik", A21, X11)      # A21 L11^-T
    L22 = chol_rec(A22 - _ee("...ij,...kj->...ik", B, B))
    z = jnp.zeros(A11.shape[:-2] + (h, n - h), dtype=A.dtype)
    top = jnp.concatenate([L11, z], axis=-1)
    bot = jnp.concatenate([B, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def tri_inv_rec(L):
    """Inverse of a batched lower-triangular (B, n, n), halving
    recursion — two GEMMs per level."""
    n = L.shape[-1]
    if n <= BASE or _split(n) >= n:
        eye = jnp.eye(n, dtype=L.dtype)
        return jax.lax.linalg.triangular_solve(
            L, jnp.broadcast_to(eye, L.shape),
            left_side=True, lower=True)
    h = _split(n)
    L11 = L[..., :h, :h]
    L21 = L[..., h:, :h]
    L22 = L[..., h:, h:]
    X11 = tri_inv_rec(L11)
    X22 = tri_inv_rec(L22)
    X21 = -_ee("...ij,...jk->...ik",
               _ee("...ij,...jk->...ik", X22, L21), X11)
    z = jnp.zeros(L11.shape[:-2] + (h, n - h), dtype=L.dtype)
    top = jnp.concatenate([X11, z], axis=-1)
    bot = jnp.concatenate([X21, X22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spd_inverse_rec(A):
    """Explicit inverse of a (B, n, n) SPD batch: Linv^T Linv from the
    recursive Cholesky (dpotrf+dpotri parity)."""
    Linv = tri_inv_rec(chol_rec(A))
    out = _ee("...ki,...kj->...ij", Linv, Linv)
    return 0.5 * (out + jnp.swapaxes(out, -1, -2))


def spd_inverse_rec_safe(A):
    """spd_inverse_rec with a jittered retry: junction Schur complements
    assembled in f32 can be indefinite at working precision (smallest
    eigenvalue below the O(n·eps32·||S||) assembly noise), making the
    Cholesky base case NaN.  On failure, re-invert S + c·I with c at the
    f32 noise floor — the downstream f64 residual refinement absorbs
    the perturbation.  lax.cond runs the retry only on failure."""
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    X = spd_inverse_rec(A)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    c = (8.0 * n) * jnp.finfo(A.dtype).eps * \
        jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
    return jax.lax.cond(
        jnp.isfinite(X).all(),
        lambda: X,
        lambda: spd_inverse_rec(A + c * eye))


def block_reduce_rec(Nii, Nij, Njj):
    """Per-block inner elimination with the recursive factorization:

        Ainv = Nii^-1;  Y = Ainv Nij;  S_b = Njj - W^T W,  W = Linv Nij

    Same contract as ops/blocked_chol.block_reduce — drop-in backend.
    Works in the caller's dtype (f32 on the MXU path; f64 callers on
    CPU keep full precision).
    """
    dt = jnp.promote_types(Nii.dtype, jnp.float32)
    Nii = Nii.astype(dt)
    Nij = Nij.astype(dt)
    Njj = Njj.astype(dt)
    Linv = tri_inv_rec(chol_rec(Nii))
    W = _ee("bij,bjk->bik", Linv, Nij)
    Ainv = _ee("bki,bkj->bij", Linv, Linv)
    Y = _ee("bki,bkj->bij", Linv, W)
    S = Njj - _ee("bki,bkj->bij", W, W)
    return Ainv, Y, S
