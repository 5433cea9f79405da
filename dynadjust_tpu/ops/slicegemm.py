"""Near-f64 matrix products on the bf16 MXU via mantissa slicing.

The TPU has no native f64 matmul path: XLA's emulation runs at a few
GFLOP/s on a v5e (measured ~5 GF/s), which makes f64 normals formation
and Newton covariance refinement the wall-clock wall at national scale.
This module implements the Ozaki-style split-product scheme tuned for
the MXU:

  * column-scale the operand by exact powers of two so entries are ≤ 1,
  * peel it into K fixed-point slices of SLICE_BITS mantissa bits each
    (pure f32 elementwise ops; every subtraction is exact),
  * every cross-slice product S_p ᵀ S_q is then EXACT in bf16 MXU
    arithmetic: slice entries carry ≤ 7 mantissa bits (bf16 holds 8),
    products are multiples of a common quantum, and the f32 accumulator
    holds ≤ 2^24 quanta for row depths up to 2^10 per product term —
    so each GEMM runs at full bf16 speed with zero rounding,
  * the exact partial products are combined in f64 (elementwise — cheap)
    with pairs p+q > CROSS_MAX truncated, giving ~2^-(6·CROSS_MAX)
    relative accuracy (≈1e-11 normwise at the defaults).

Used for the covariance-stage normals Gram product (N = BᵀB with
B = V^{-1/2}A) and the f64 Newton–Schulz refinement products — the
TPU-native replacement for the reference's LAPACK dpotri f64 pipeline
(dnamatrix_contiguous.cpp:963-1006) at MXU speed.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

SLICE_BITS = 6          # mantissa bits per slice (bf16-exact with margin)
NSLICES = 8             # 48 bits of the operand captured
CROSS_MAX = 8           # keep products with p + q <= CROSS_MAX


def split_f32_pair(x64: np.ndarray):
    """Host double-float split: x64 ≈ hi + lo with both f32."""
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _pow2_colscale(hi):
    """Exact power-of-two per-column scale: 2^ceil(log2(max|col|)).

    Built with ldexp on an integer exponent — XLA's f32 exp2 is
    approximate even at integer arguments (measured one-ulp error at
    2^-22 on TPU and CPU), which would silently break the exactness of
    the slice grids."""
    m = jnp.max(jnp.abs(hi), axis=-2, keepdims=True)
    e = jnp.ceil(jnp.log2(jnp.maximum(m, jnp.float32(1e-30))))
    e = e.astype(jnp.int32)
    one = jnp.ones((), dtype=hi.dtype)
    return jnp.ldexp(one, e), jnp.ldexp(one, -e)


def _slices(hi, lo, nslices=NSLICES, bits=SLICE_BITS):
    """Peel (hi + lo) — both f32, entries ≤ 1 — into fixed-point slices.

    Slice k holds the bits at positions (k·bits, (k+1)·bits]; every
    extraction and subtraction is exact in f32 (common power-of-two
    grids), so Σ slices reproduces hi + lo to 2^-(bits·nslices)."""
    out = []
    r = hi
    folded = False
    for k in range(nslices):
        q = jnp.float32(2.0 ** (bits * (k + 1)))
        sk = jnp.round(r * q) / q
        out.append(sk)
        r = r - sk
        if not folded and bits * (k + 1) >= 24:
            # the remainder has descended to lo's scale (2^-24): folding
            # lo in now costs ≤ 2^-48 relative — below the slice budget
            r = r + lo
            folded = True
    return out


@partial(jax.jit, static_argnames=("nslices", "cross_max", "bits"))
def _gram_sliced(hi, lo, nslices, cross_max, bits):
    s, sinv = _pow2_colscale(hi)
    sl = _slices(hi * sinv, lo * sinv, nslices, bits)
    P = hi.shape[-1]
    acc = jnp.zeros(hi.shape[:-2] + (P, P), dtype=jnp.float64)
    for p in range(nslices):
        for q in range(p, nslices):
            if p + q > cross_max:
                continue
            a = sl[p].astype(jnp.bfloat16)
            b = sl[q].astype(jnp.bfloat16)
            g = jnp.einsum("...mi,...mj->...ij", a, b,
                           preferred_element_type=jnp.float32)
            g64 = g.astype(jnp.float64)
            acc = acc + (g64 if p == q
                         else g64 + jnp.swapaxes(g64, -1, -2))
    scale = s[..., 0, :]
    return acc * scale[..., :, None] * scale[..., None, :]


def gram_f64(hi, lo, nslices=NSLICES, cross_max=CROSS_MAX,
             bits=SLICE_BITS):
    """N = BᵀB to near-f64 from the double-float pair (hi, lo) of B.

    Batched over leading dims; B is (..., M, P) with M ≤ 2^(24-2·bits)
    rows per product (1024 at the 6-bit default — callers with deeper
    row dims chunk the row axis and sum, which is exact)."""
    M = hi.shape[-2]
    rmax = 1 << (24 - 2 * bits - 2)   # safety margin on the 2^24 bound
    if M <= rmax:
        return _gram_sliced(hi, lo, nslices, cross_max, bits)
    acc = None
    for m0 in range(0, M, rmax):
        g = _sync(_gram_sliced(hi[..., m0:m0 + rmax, :],
                               lo[..., m0:m0 + rmax, :], nslices,
                               cross_max, bits))
        acc = g if acc is None else acc + g
    return acc


@partial(jax.jit, static_argnames=("nslices", "cross_max", "bits",
                                   "transa"))
def _matmul_sliced(ahi, alo, bhi, blo, nslices, cross_max, bits,
                   transa=False):
    if transa:
        # C = Aᵀ B: contraction over A's -2 axis; scale A's columns
        sa, sainv = _pow2_colscale(ahi)
        A_hi, A_lo = ahi * sainv, alo * sainv
    else:
        # C = A B: contraction over A's -1 axis; scale A's rows
        sa, sainv = _pow2_colscale(jnp.swapaxes(ahi, -1, -2))
        sainv_r = jnp.swapaxes(sainv, -1, -2)
        A_hi, A_lo = ahi * sainv_r, alo * sainv_r
    sb, sbinv = _pow2_colscale(bhi)
    B_hi, B_lo = bhi * sbinv, blo * sbinv
    sla = _slices(A_hi, A_lo, nslices, bits)
    slb = _slices(B_hi, B_lo, nslices, bits)
    shape = ((A_hi.shape[:-2] + (A_hi.shape[-1], B_hi.shape[-1]))
             if transa else
             (A_hi.shape[:-2] + (A_hi.shape[-2], B_hi.shape[-1])))
    acc = jnp.zeros(shape, dtype=jnp.float64)
    eq = "...mi,...mj->...ij" if transa else "...im,...mj->...ij"
    for p in range(nslices):
        for q in range(nslices):
            if p + q > cross_max:
                continue
            g = jnp.einsum(eq, sla[p].astype(jnp.bfloat16),
                           slb[q].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            acc = acc + g.astype(jnp.float64)
    sa_out = sa[..., 0, :]
    sb_out = sb[..., 0, :]
    return acc * sa_out[..., :, None] * sb_out[..., None, :]


def matmul_f64(ahi, alo, bhi, blo, nslices=NSLICES,
               cross_max=CROSS_MAX, bits=SLICE_BITS, transa=False):
    """C = A @ B (or Aᵀ @ B with transa) to near-f64 from double-float
    pairs, batched over leading dims.  Contraction depth ≤ 1024 per
    call at the defaults (chunk + sum beyond — exact)."""
    M = ahi.shape[-2] if transa else ahi.shape[-1]
    rmax = 1 << (24 - 2 * bits - 2)
    if M <= rmax:
        return _matmul_sliced(ahi, alo, bhi, blo, nslices, cross_max,
                              bits, transa)
    acc = None
    for m0 in range(0, M, rmax):
        if transa:
            g = _matmul_sliced(ahi[..., m0:m0 + rmax, :],
                               alo[..., m0:m0 + rmax, :],
                               bhi[..., m0:m0 + rmax, :],
                               blo[..., m0:m0 + rmax, :],
                               nslices, cross_max, bits, True)
        else:
            g = _matmul_sliced(ahi[..., :, m0:m0 + rmax],
                               alo[..., :, m0:m0 + rmax],
                               bhi[..., m0:m0 + rmax, :],
                               blo[..., m0:m0 + rmax, :],
                               nslices, cross_max, bits, False)
        _sync(g)
        acc = g if acc is None else acc + g
    return acc


def split_device(x64):
    """Device double-float split of an f64 array."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def mm64(a, b, transa=False, *, sliced, nslices=NSLICES,
         cross_max=CROSS_MAX):
    """Near-f64 product for use INSIDE fused jitted programs.

    `sliced` is resolved by the caller OUTSIDE the jit and passed as a
    static argument — reading DTA_SLICED_F64 at trace time would bake
    the route into a compiled graph that a later env flip (tests) would
    silently reuse.  Depth chunking (matmul_f64) unrolls in-trace."""
    if not sliced:
        eq = "...mi,...mj->...ij" if transa else "...im,...mj->...ij"
        return jnp.einsum(eq, a, b)
    ahi, alo = split_device(a)
    bhi, blo = split_device(b)
    return matmul_f64(ahi, alo, bhi, blo, nslices=nslices,
                      cross_max=cross_max, transa=transa)


# ---------------------------------------------------------------------------
# pre-sliced near-f64 matvecs (residual operators inside fused programs)
# ---------------------------------------------------------------------------
# A refined-solve program applies the SAME operand A in every refinement
# round.  matmul_f64 re-peels its operands per call — fine for one-shot
# products, but a while_loop matvec would pay nslices re-slicing passes
# over the pool per round.  preslice_pools peels A once into persistent
# bf16 slice pools; matvec_presliced then slices only the VECTOR per
# call, so each matvec costs nslices passes over bf16 pools (pure
# bandwidth) with every bf16 product exact and f32 accumulation exact
# under the depth bound — near-f64 residuals at MXU/HBM speed instead
# of XLA's ~3 GFLOP/s f64 matvec emulation (measured,
# scripts/probe_f64_matvec.py).


def preslice_pools(hi, lo, nslices=NSLICES, bits=SLICE_BITS):
    """Column-scale and peel a double-float operand (..., M, P) into
    bf16 slice pools for repeated matvecs.  Returns (slices, scale):
    slices[p] is (..., M, P) bf16, scale is the (..., 1, P) power-of-two
    column scale with A ≈ (Σ_p slices[p]) · scale."""
    s, sinv = _pow2_colscale(hi)
    sl = _slices(hi * sinv, lo * sinv, nslices, bits)
    return [x.astype(jnp.bfloat16) for x in sl], s


def _slice_vector(z, nslices, bits):
    """Power-of-two scale + peel an f64 vector (..., n) into bf16
    slices; returns (slices list, scale (..., 1))."""
    m = jnp.max(jnp.abs(z), axis=-1, keepdims=True)
    e = jnp.ceil(jnp.log2(jnp.maximum(m, 1e-30))).astype(jnp.int32)
    # build the exact power-of-two scale in f32 (f64 ldexp hits XLA's
    # unimplemented X64 bitcast rewrite on TPU) and widen; the exponent
    # clamp keeps both directions representable in f32 — past it the
    # vector is zero at the slice budget anyway
    e = jnp.clip(e, -124, 124)
    one = jnp.ones((), dtype=jnp.float32)
    zs = jnp.ldexp(one, e).astype(z.dtype)
    zsinv = jnp.ldexp(one, -e).astype(z.dtype)
    zn = z * zsinv
    zh = zn.astype(jnp.float32)
    zl = (zn - zh.astype(z.dtype)).astype(jnp.float32)
    return _slices(zh, zl, nslices, bits), zs


def matvec_presliced(slicesA, sA, x64, nslices=NSLICES,
                     cross_max=CROSS_MAX, bits=SLICE_BITS,
                     transa=False):
    """y = A·x (transa: Aᵀ·x) to near-f64 from pre-sliced A pools.

    slicesA/sA from preslice_pools on (..., M, P); x64 is (..., P) f64
    (transa: (..., M)).  Contraction chunks respect the exact-f32
    accumulation depth bound.  Returns f64 (..., M) (transa: (..., P)).

    Accuracy: NORMWISE ~2^-(6·min(nslices, cross_max+1)) of
    ‖|A|‖·‖|x|‖ per batch — the slice window anchors at each column's
    max (as in _matmul_sliced), so per-row relative error on rows far
    below their column maxima is wider.  That is the right bound for a
    residual operator: iterative refinement contracts in the global
    norm."""
    if transa:
        z = x64                          # contraction over M (unscaled)
    else:
        z = x64 * sA[..., 0, :]          # fold A's column scale into x
    slz, zs = _slice_vector(z, nslices, bits)
    Z = jnp.stack(slz, axis=-1).astype(jnp.bfloat16)   # (..., n, K)
    rmax = 1 << (24 - 2 * bits - 2)
    n = Z.shape[-2]
    acc = None
    for p, Sp in enumerate(slicesA):
        qmax = cross_max - p + 1
        if qmax <= 0:
            continue
        qn = min(qmax, nslices)
        part = None
        for c0 in range(0, n, rmax):
            Zc = Z[..., c0:c0 + rmax, :qn]
            if transa:
                g = jnp.einsum("...mp,...mk->...pk",
                               Sp[..., c0:c0 + rmax, :], Zc,
                               preferred_element_type=jnp.float32)
            else:
                g = jnp.einsum("...mp,...pk->...mk",
                               Sp[..., :, c0:c0 + rmax], Zc,
                               preferred_element_type=jnp.float32)
            g64 = g.astype(jnp.float64)
            part = g64 if part is None else part + g64
        psum = jnp.sum(part, axis=-1)
        acc = psum if acc is None else acc + psum
    y = acc * zs
    if transa:
        y = y * sA[..., 0, :]
    return y


# ---------------------------------------------------------------------------
# backend-adaptive near-f64 products
# ---------------------------------------------------------------------------
# On CPU (tests, virtual meshes) native f64 einsums are exact and fast;
# on TPU they fall off the MXU into ~5 GFLOP/s emulation, so the sliced
# kernels take over.  DTA_SLICED_F64=0/1 overrides the choice.

def _use_sliced() -> bool:
    import os
    v = os.environ.get("DTA_SLICED_F64", "")
    if v in ("0", "1"):
        return v == "1"
    return jax.default_backend() not in ("cpu",)


def _sync(x):
    """Genuine completion barrier (block_until_ready is a no-op over
    the tunnel runtime): serialises chunked dispatches so their slice
    transients never coexist in HBM.  Under tracing (the depth-fused
    jitted wrappers) it is a no-op, letting XLA schedule the chunk
    programs itself."""
    import jax.core as _core
    if isinstance(x, _core.Tracer):
        return x
    np.asarray(x.ravel()[:1])
    return x


def _batch_chunks(nbytes_per_batch, n, budget=None):
    """Divisor batch-chunk size keeping the sliced kernel's transient
    slice copies (~(NSLICES+2)x f32 of the operands) under budget."""
    import os
    budget = budget or float(os.environ.get("DTA_SLICE_CHUNK_BYTES", 2e9))
    want = max(1, int(budget / max(nbytes_per_batch, 1)))
    return next(c for c in range(min(want, n), 0, -1) if n % c == 0)


# depth-fused jitted wrappers: the python depth loop (contraction >
# 1024 rows) unrolls INSIDE one program per batch chunk — the former
# op-by-op form paid a dispatch latency + tunnel sync per depth chunk
# (36 round-trips per 3.5k-deep batched product at bench scale)
_gram_f64_jit = partial(jax.jit, static_argnames=("nslices", "cross_max",
                                                  "bits"))(gram_f64)
_matmul_f64_jit = partial(jax.jit,
                          static_argnames=("nslices", "cross_max", "bits",
                                           "transa"))(matmul_f64)


def xgram64(B64, nslices=NSLICES, cross_max=CROSS_MAX):
    """N = BᵀB in near-f64 from an f64 (batched) operand."""
    if not _use_sliced():
        return jnp.einsum("...mi,...mj->...ij", B64, B64)
    hi, lo = split_device(B64)
    if hi.ndim < 3:
        return _gram_f64_jit(hi, lo, nslices=nslices,
                             cross_max=cross_max)
    n = hi.shape[0]
    C = _batch_chunks(hi[0].size * 4 * (nslices + 2), n)
    if C == n:
        return _gram_f64_jit(hi, lo, nslices=nslices,
                             cross_max=cross_max)
    return jnp.concatenate(
        [_sync(_gram_f64_jit(hi[k:k + C], lo[k:k + C], nslices=nslices,
                             cross_max=cross_max))
         for k in range(0, n, C)])


def xmatmul64(A64, B64, transa: bool = False, nslices=NSLICES,
              cross_max=CROSS_MAX):
    """C = A @ B (Aᵀ @ B with transa) in near-f64, batched; the batch
    axis is chunked so the slice transients fit HBM.

    nslices/cross_max select the accuracy↔speed tier: the GEMM count is
    the number of (p, q) slice pairs kept, so e.g. (5, 4) runs ~2.9x
    fewer MXU passes than the (8, 8) default at ~2^-30 relative accuracy
    — ample for reporting-grade statistics products, not for Newton
    refinement (which must stay at the default tier)."""
    if not _use_sliced():
        eq = "...mi,...mj->...ij" if transa else "...im,...mj->...ij"
        return jnp.einsum(eq, A64, B64)
    ahi, alo = split_device(A64)
    bhi, blo = split_device(B64)
    kw = dict(nslices=nslices, cross_max=cross_max, transa=transa)
    if ahi.ndim < 3 or bhi.ndim < 3 or ahi.shape[0] != bhi.shape[0]:
        return _matmul_f64_jit(ahi, alo, bhi, blo, **kw)
    n = ahi.shape[0]
    C = _batch_chunks((ahi[0].size + bhi[0].size) * 4 * (nslices + 2), n)
    if C == n:
        return _matmul_f64_jit(ahi, alo, bhi, blo, **kw)
    return jnp.concatenate(
        [_sync(_matmul_f64_jit(ahi[k:k + C], alo[k:k + C], bhi[k:k + C],
                               blo[k:k + C], **kw))
         for k in range(0, n, C)])
