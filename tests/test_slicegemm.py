"""Mantissa-sliced near-f64 MXU products (ops/slicegemm).

Accuracy is checked normwise against native f64 numpy on operands with
large per-column and per-row dynamic range (the weighted geodetic design
matrices' regime: angle weights span ~10 orders)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dynadjust_tpu.ops.slicegemm import (gram_f64, matmul_f64,
                                         split_f32_pair, xgram64,
                                         xmatmul64)


@pytest.fixture(scope="module")
def stress():
    rng = np.random.default_rng(0)
    B, M, P = 3, 900, 64
    X = rng.standard_normal((B, M, P)) * \
        (10.0 ** rng.uniform(-6, 6, (1, 1, P)))
    X *= 10.0 ** rng.uniform(-3, 3, (1, M, 1))
    return X


def _normwise(err, A_norm_rows, B_norm_cols):
    return (err / np.maximum(A_norm_rows[..., :, None]
                             * B_norm_cols[..., None, :], 1e-300)).max()


def test_gram_accuracy(stress):
    X = stress
    hi, lo = split_f32_pair(X)
    N = np.asarray(gram_f64(jnp.asarray(hi), jnp.asarray(lo)))
    N_ref = np.einsum("bmi,bmj->bij", X, X)
    nrm = np.sqrt(np.abs(np.einsum("bii->bi", N_ref)))
    assert _normwise(np.abs(N - N_ref), nrm, nrm) < 1e-12


def test_matmul_transa_accuracy(stress):
    X = stress
    rng = np.random.default_rng(1)
    A = rng.standard_normal((3, 900, 48)) * \
        (10.0 ** rng.uniform(-4, 4, (1, 1, 48)))
    ahi, alo = split_f32_pair(A)
    bhi, blo = split_f32_pair(X)
    C = np.asarray(matmul_f64(jnp.asarray(ahi), jnp.asarray(alo),
                              jnp.asarray(bhi), jnp.asarray(blo),
                              transa=True))
    C_ref = np.einsum("bmi,bmj->bij", A, X)
    assert _normwise(np.abs(C - C_ref), np.linalg.norm(A, axis=1),
                     np.linalg.norm(X, axis=1)) < 1e-12


def test_matmul_accuracy_and_deep_contraction():
    rng = np.random.default_rng(2)
    # contraction depth beyond the exactness bound forces row chunking
    A = rng.standard_normal((2, 64, 3000)) * \
        (10.0 ** rng.uniform(-5, 5, (2, 64, 1)))
    Bm = rng.standard_normal((2, 3000, 32))
    ahi, alo = split_f32_pair(A)
    bhi, blo = split_f32_pair(Bm)
    C = np.asarray(matmul_f64(jnp.asarray(ahi), jnp.asarray(alo),
                              jnp.asarray(bhi), jnp.asarray(blo)))
    C_ref = A @ Bm
    assert _normwise(np.abs(C - C_ref), np.linalg.norm(A, axis=2),
                     np.linalg.norm(Bm, axis=1)) < 1e-12


def test_reduced_stats_tier_accuracy(stress, monkeypatch):
    """The statistics tier (nslices=5, cross_max=4) trades ~2.9x fewer
    MXU passes for ~2^-30 relative accuracy — verify the bound holds on
    the wide-dynamic-range stress operand, forced through the sliced
    route (the tier device_stats consumes on TPU)."""
    X = jnp.asarray(stress[:1, :256])
    monkeypatch.setenv("DTA_SLICED_F64", "1")
    C_full = np.asarray(xmatmul64(X, X, transa=True))
    C_fast = np.asarray(xmatmul64(X, X, transa=True,
                                  nslices=5, cross_max=4))
    nrm = np.linalg.norm(np.asarray(X), axis=1)
    assert _normwise(np.abs(C_fast - C_full), nrm, nrm) < 3e-8

    from dynadjust_tpu.adjust import device_stats
    monkeypatch.setenv("DTA_STATS_TIER", "6,5")
    assert device_stats._stats_tier() == (6, 5)
    monkeypatch.delenv("DTA_STATS_TIER")
    assert device_stats._stats_tier() == (5, 4)


def test_backend_adaptive_wrappers(stress, monkeypatch):
    """xgram64/xmatmul64 must give near-identical results through both
    the sliced and the native-f64 routes."""
    X = jnp.asarray(stress[:1, :128])
    monkeypatch.setenv("DTA_SLICED_F64", "0")
    N_native = np.asarray(xgram64(X))
    C_native = np.asarray(xmatmul64(X, X, transa=True))
    monkeypatch.setenv("DTA_SLICED_F64", "1")
    N_sliced = np.asarray(xgram64(X))
    C_sliced = np.asarray(xmatmul64(X, X, transa=True))
    sc = np.abs(N_native).max()
    assert np.abs(N_native - N_sliced).max() / sc < 1e-11
    assert np.abs(C_native - C_sliced).max() / sc < 1e-11


def test_matvec_presliced_accuracy(stress):
    """Pre-sliced bf16 matvec (the fused refined solve's residual
    operator, device_solve.py) reaches near-f64 in both directions on
    operands with large column dynamic range."""
    from dynadjust_tpu.ops.slicegemm import (preslice_pools,
                                             matvec_presliced)
    import jax

    X = stress                              # (B, M, P)
    B, M, P = X.shape
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, P)) * 10.0 ** rng.uniform(-3, 3, (B, P))
    v = rng.standard_normal((B, M))

    hi, lo = split_f32_pair(X)
    SL, sA = jax.jit(preslice_pools)(jnp.asarray(hi), jnp.asarray(lo))

    # the kernel's guarantee is NORMWISE (error ≤ ~2^-45·‖|A|‖·‖|x|‖
    # per batch) — the bound iterative refinement needs; per-row
    # relative error on rows far below the column max is wider (the
    # slice window is anchored at each column's max, exactly as in
    # _matmul_sliced)
    y = np.asarray(matvec_presliced(SL, sA, jnp.asarray(x)))
    y_ref = np.einsum("bmp,bp->bm", X, x)
    scale = (np.abs(X) @ np.abs(x)[..., None])[..., 0]
    err = np.abs(y - y_ref).max(axis=-1) / scale.max(axis=-1)
    assert err.max() < 1e-12

    yt = np.asarray(matvec_presliced(SL, sA, jnp.asarray(v),
                                     transa=True))
    yt_ref = np.einsum("bmp,bm->bp", X, v)
    scale_t = np.einsum("bmp,bm->bp", np.abs(X), np.abs(v))
    err_t = np.abs(yt - yt_ref).max(axis=-1) / scale_t.max(axis=-1)
    assert err_t.max() < 1e-12


def test_matvec_presliced_deep_contraction():
    """Contraction depths past the exact-f32 accumulation bound chunk
    and stay exact."""
    from dynadjust_tpu.ops.slicegemm import (preslice_pools,
                                             matvec_presliced)
    rng = np.random.default_rng(2)
    M, P = 2500, 40                        # M > 1024 forces chunking
    X = rng.standard_normal((M, P))
    x = rng.standard_normal((P,))
    v = rng.standard_normal((M,))
    hi, lo = split_f32_pair(X)
    SL, sA = preslice_pools(jnp.asarray(hi), jnp.asarray(lo))
    y = np.asarray(matvec_presliced(SL, sA, jnp.asarray(x)))
    assert np.abs(y - X @ x).max() / np.abs(X @ x).max() < 1e-12
    yt = np.asarray(matvec_presliced(SL, sA, jnp.asarray(v),
                                     transa=True))
    assert np.abs(yt - X.T @ v).max() / np.abs(X.T @ v).max() < 1e-12
