"""Blocked/tiled factorization kernels vs reference linear algebra."""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def spd_batch():
    rng = np.random.default_rng(3)
    B, ni, nj = 3, 200, 70              # deliberately tile-unaligned
    A = rng.normal(size=(B, ni, ni))
    Nii = A @ A.transpose(0, 2, 1) + ni * np.eye(ni)
    Nij = rng.normal(size=(B, ni, nj))
    Njj0 = rng.normal(size=(B, nj, nj))
    Njj = Njj0 + Njj0.transpose(0, 2, 1)
    return Nii, Nij, Njj


def _truth(Nii, Nij, Njj):
    Ainv = np.linalg.inv(Nii)
    Y = Ainv @ Nij
    S = Njj - Nij.transpose(0, 2, 1) @ Y
    return Ainv, Y, S


def test_blocked_cholesky_linv(spd_batch):
    from dynadjust_tpu.ops.blocked_chol import blocked_cholesky_linv
    Nii, _, _ = spd_batch
    Linv = np.asarray(blocked_cholesky_linv(
        jnp.asarray(Nii.astype(np.float32))), dtype=np.float64)
    L = np.linalg.cholesky(Nii)
    eye = np.eye(Nii.shape[1])
    err = max(np.abs(Linv[b] @ L[b] - eye).max() for b in range(len(Nii)))
    assert err < 1e-4          # f32 working precision


@pytest.mark.parametrize("backend", ["rec", "blocked", "xla"])
def test_block_reduce_backends(spd_batch, backend):
    from dynadjust_tpu.ops.blocked_chol import block_reduce
    Nii, Nij, Njj = spd_batch
    out = block_reduce(jnp.asarray(Nii.astype(np.float32)),
                       jnp.asarray(Nij.astype(np.float32)),
                       jnp.asarray(Njj.astype(np.float32)),
                       backend=backend)
    for got, want in zip(out, _truth(Nii, Nij, Njj)):
        got = np.asarray(got, dtype=np.float64)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 5e-5, (backend, rel)


def test_pallas_block_reduce_interpret(spd_batch):
    """The fused Pallas kernel (interpret mode off-TPU) matches numpy."""
    from dynadjust_tpu.ops.pallas_schur import fused_block_reduce
    Nii, Nij, Njj = spd_batch
    out = fused_block_reduce(jnp.asarray(Nii.astype(np.float32)),
                             jnp.asarray(Nij.astype(np.float32)),
                             jnp.asarray(Njj.astype(np.float32)),
                             interpret=True)
    for got, want in zip(out, _truth(Nii, Nij, Njj)):
        got = np.asarray(got, dtype=np.float64)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 5e-5, rel


def test_device_solver_inv_vs_chol_methods():
    """Explicit-inverse device solver == triangular device solver ==
    dense f64 on a real blocked system."""
    from dynadjust_tpu.parallel.blocked_adjust import (BlockedNetwork,
                                                       build_normals)
    from dynadjust_tpu.utils.synthetic import (synthetic_grid_network,
                                               grid_segmentation)
    from dynadjust_tpu.parallel.schur import (schur_solve, schur_solve_device,
                                              DeviceSchurFactors)
    rows = cols = 12
    xyz, pairs, obs, var, x0, fixed = synthetic_grid_network(rows, cols,
                                                             seed=5)
    blocks, junction = grid_segmentation(rows, cols, 4, 4)
    bn = BlockedNetwork(nstations=rows * cols, pairs=pairs, obs=obs,
                        weight=1.0 / var, blocks=blocks,
                        junction_stations=junction, constrained=fixed)
    bs = build_normals(bn, x0, 0.01)
    xi64, xj64 = schur_solve(bs)
    for method in ("inv", "chol"):
        f = DeviceSchurFactors(bs, method=method)
        xi, xj, _ = schur_solve_device(bs, refine=2, factors=f)
        assert np.abs(xi - xi64).max() < 1e-10, method
        assert np.abs(xj - xj64).max() < 1e-10, method
