"""Pallas TPU kernel: batched Cholesky factor + triangular inverse.

One grid step processes one segmentation block entirely in VMEM:

    L    = chol(Nii)        blocked right-looking Cholesky
    Linv = L^-1             blocked forward substitution (written straight
                            to the output ref)

Everything downstream of Linv is plain batched matmuls that XLA already
runs at MXU speed-of-light (Ainv = Linv^T Linv — the reference's dpotri,
dnamatrix_contiguous.cpp:996-1006 — W = Linv Nij, S = Njj - W^T W), so
the kernel covers exactly the part XLA is bad at: batched factorization,
where XLA dispatches cholesky + triangular solves that round-trip HBM
per step and materialise batch-wide temps (the reason the national-scale
factor path is chunked through lax.map, schur.py).

Diagonal 128x128 tiles are factored with a VPU rank-1 update loop; panel
work runs on the MXU at full-f32 precision.  f32 only — refinement
restores f64 (see schur.py).

Toolchain quirks encoded here (each cost a debugging session):
  * jax_enable_x64 must be OFF around pallas lowering — int64 loop
    indices send Mosaic's convert-element-type lowering into infinite
    recursion, and the compile service 500s on x64 payloads;
  * batch must be expressed as stacked 2D row-blocks — 3D block specs
    crash the Mosaic compiler;
  * no 1D intermediates, no bool->f32 astype (use where with typed
    constants), no weak-typed python literals inside the kernel;
  * hardware rsqrt is approximate — use sqrt + divide;
  * MXU defaults to bf16 multiplies — pin Precision.HIGHEST.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 128             # tile size (MXU native)
MAX_NI = 896        # VMEM ceiling for the fused kernel


def _factor_diag_tile(D):
    """Cholesky of a TxT SPD tile via rank-1 updates (VPU, mask-based:
    no dynamic scalar indexing).  Identity-padded rows are fine — the
    diagonal stays positive."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    one, zero = jnp.float32(1.0), jnp.float32(0.0)

    def step(j, A):
        is_col_j = jnp.where(cols == j, one, zero)              # (T, T)
        on_diag_j = is_col_j * jnp.where(rows == j, one, zero)
        d = one / jnp.sqrt(jnp.sum(A * on_diag_j))
        colA = jnp.sum(A * is_col_j, axis=1, keepdims=True)     # (T, 1)
        col = jnp.where(rows[:, :1] >= j, colA * d, zero)       # (T, 1)
        trail = jnp.where((cols > j) & (rows > j), one, zero)
        A = A - col * jnp.transpose(col) * trail
        return A * (one - is_col_j) + col * is_col_j

    A = jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), step, D)
    return jnp.where(rows >= cols, A, zero)


def _invert_lower_tile(L):
    """Inverse of a TxT lower-triangular tile by row-sweep forward
    substitution (VPU, mask-based)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    one, zero = jnp.float32(1.0), jnp.float32(0.0)
    eye = jnp.where(rows == cols, one, zero)
    strict = jnp.where(rows > cols, L, zero)
    diag_inv = one / jnp.sum(L * eye, axis=1, keepdims=True)    # (T, 1)

    def step(j, X):
        is_row_j = jnp.where(rows == j, one, zero)              # (T, T)
        rowL = jnp.sum(strict * is_row_j, axis=0,
                       keepdims=True)                           # (1, T)
        acc = jnp.sum(jnp.transpose(rowL) * X, axis=0,
                      keepdims=True)                            # (1, T)
        ej = jnp.where(cols[:1, :] == j, one, zero)             # (1, T)
        dinv_j = jnp.sum(jnp.where(rows[:, :1] == j, diag_inv, zero))
        row = (ej - acc) * dinv_j
        return X * (one - is_row_j) + row * is_row_j

    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), step,
                             jnp.zeros_like(L))


def _chol_inv_kernel(nii_ref, linv_ref, lref, nt: int):
    """Grid step: chol + triangular inverse of one block, in VMEM."""
    f32 = jnp.float32
    mm = functools.partial(jax.lax.dot_general,
                           preferred_element_type=f32,
                           precision=jax.lax.Precision.HIGHEST)

    # ---- blocked right-looking Cholesky into lref ------------------------
    lref[:] = nii_ref[:]
    linv_ref[:] = jnp.zeros_like(linv_ref)
    diag_invs = []
    for k in range(nt):
        off = k * T
        if k:
            left = lref[pl.ds(off, T), pl.ds(0, off)]          # (T, off)
            D = (lref[pl.ds(off, T), pl.ds(off, T)] -
                 mm(left, left, (((1,), (1,)), ((), ()))))
        else:
            D = lref[pl.ds(off, T), pl.ds(off, T)]
        Lkk = _factor_diag_tile(D)
        lref[pl.ds(off, T), pl.ds(off, T)] = Lkk
        Linv_kk = _invert_lower_tile(Lkk)
        linv_ref[pl.ds(off, T), pl.ds(off, T)] = Linv_kk

        nrows = (nt - 1 - k) * T
        if nrows:
            roff = off + T
            panel = lref[pl.ds(roff, nrows), pl.ds(off, T)]
            if k:
                below = lref[pl.ds(roff, nrows), pl.ds(0, off)]
                panel = panel - mm(below, left, (((1,), (1,)), ((), ())))
            lref[pl.ds(roff, nrows), pl.ds(off, T)] = mm(
                panel, Linv_kk, (((1,), (1,)), ((), ())))

    # ---- Linv: block-row forward substitution ----------------------------
    # Linv[i, :i] = -Linv[i,i] (L[i, :i] @ Linv[:i, :i]); block-rows in
    # order, so earlier rows are complete when consumed.
    for i in range(1, nt):
        off = i * T
        Lrow = lref[pl.ds(off, T), pl.ds(0, off)]
        prev = linv_ref[pl.ds(0, off), pl.ds(0, off)]
        acc = mm(Lrow, prev, (((1,), (0,)), ((), ())))          # (T, off)
        Dinv = linv_ref[pl.ds(off, T), pl.ds(off, T)]
        linv_ref[pl.ds(off, T), pl.ds(0, off)] = -mm(
            Dinv, acc, (((1,), (0,)), ((), ())))


def _pad_to(x, m, axes):
    pads = [(0, 0)] * x.ndim
    changed = False
    for a in axes:
        r = (-x.shape[a]) % m
        if r:
            pads[a] = (0, r)
            changed = True
    return jnp.pad(x, pads) if changed else x


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_inverse_jit(Nii, interpret: bool = False):
    B, ni0 = Nii.shape[0], Nii.shape[1]
    f32 = jnp.float32
    Nii = _pad_to(Nii.astype(f32), T, (1, 2))
    ni = Nii.shape[1]
    if ni != ni0:
        eye = jnp.eye(ni, dtype=f32)
        mask = jnp.where(jnp.arange(ni) >= ni0, 1.0, 0.0).astype(f32)
        Nii = Nii + eye[None] * mask[None, :]
    nt = ni // T

    kern = functools.partial(_chol_inv_kernel, nt=nt)
    Linv = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((ni, ni), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ni, ni), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * ni, ni), f32),
        scratch_shapes=[pltpu.VMEM((ni, ni), f32)],
        interpret=interpret,
    )(Nii.reshape(B * ni, ni))
    return Linv.reshape(B, ni, ni)[:, :ni0, :ni0]


def batched_cholesky_inverse(Nii, interpret: bool = False):
    """Batched (B, ni, ni) f32 SPD -> Linv = chol(Nii)^-1, one VMEM-
    resident Pallas grid step per block.  Runs under an x64-off scope
    (Pallas breaks under jax_enable_x64 on this toolchain).  Consumers:
    Ainv = Linv^T Linv, solves via two triangular-shaped matmuls."""
    with jax.enable_x64(False):
        return _chol_inverse_jit(Nii.astype(jnp.float32), interpret)


def fused_block_reduce(Nii, Nij, Njj, interpret: bool = False):
    """Per-block inner-station elimination: (Ainv, Y, S_b) from f32
    blocked normals — Pallas factor+inverse, XLA matmuls.

        Ainv = Nii^-1;  Y = Ainv Nij;  S_b = Njj - Nij^T Y
    """
    hi = jax.lax.Precision.HIGHEST
    Linv = batched_cholesky_inverse(Nii, interpret)
    with jax.enable_x64(False):
        f32 = jnp.float32
        Nij = Nij.astype(f32)
        W = jnp.einsum("bij,bjk->bik", Linv, Nij, precision=hi)
        Ainv = jnp.einsum("bki,bkj->bij", Linv, Linv, precision=hi)
        Y = jnp.einsum("bki,bkj->bij", Linv, W, precision=hi)
        S = Njj.astype(f32) - jnp.einsum("bki,bkj->bij", W, W,
                                         precision=hi)
    return Ainv, Y, S
