"""Correctness of the TPU-native two-level Schur solver: blocked solve must
equal the dense simultaneous solution (the reference's own phased-vs-
simultaneous cross-check, SURVEY §4.4), single-device and mesh-sharded."""

import numpy as np
import pytest

import jax

from dynadjust_tpu.parallel.blocked_adjust import BlockedNetwork, \
    adjust_blocked, build_normals
from dynadjust_tpu.parallel.schur import schur_solve, schur_solve_sharded
from dynadjust_tpu.utils.synthetic import synthetic_grid_network, \
    grid_segmentation


@pytest.fixture(scope="module")
def small_net():
    rows, cols = 12, 12
    xyz, pairs, obs, var, x0, fixed = synthetic_grid_network(rows, cols,
                                                             seed=1)
    blocks, junction = grid_segmentation(rows, cols, 4, 4)
    bn = BlockedNetwork(nstations=rows * cols, pairs=pairs, obs=obs,
                        weight=1.0 / var, blocks=blocks,
                        junction_stations=junction, constrained=fixed)
    return xyz, x0, bn, fixed


def _dense_solution(bn: BlockedNetwork, x, free_weight, fixed_weight=1e6):
    """Direct dense solve of the same normal equations."""
    S = bn.nstations
    N = np.zeros((3 * S, 3 * S))
    r = np.zeros(3 * S)
    for m, (i, j) in enumerate(bn.pairs):
        w = bn.weight[m]
        mmc = bn.obs[m] - (x[j] - x[i])
        for k in range(3):
            N[3 * i + k, 3 * i + k] += w
            N[3 * j + k, 3 * j + k] += w
            N[3 * i + k, 3 * j + k] -= w
            N[3 * j + k, 3 * i + k] -= w
            r[3 * i + k] -= w * mmc[k]
            r[3 * j + k] += w * mmc[k]
    wdiag = np.full(3 * S, free_weight)
    if bn.constrained is not None:
        for s in bn.constrained:
            wdiag[3 * s:3 * s + 3] = fixed_weight
    N += np.diag(wdiag)
    return np.linalg.solve(N, r)


def test_schur_equals_dense(small_net):
    xyz, x0, bn, fixed = small_net
    free_weight = 0.01
    dx_dense = _dense_solution(bn, x0, free_weight).reshape(-1, 3)

    bs = build_normals(bn, x0, free_weight)
    xi, xj = schur_solve(bs)

    dx_blocked = np.zeros_like(dx_dense)
    for b, (inner, junc) in enumerate(bn.blocks):
        ki = 3 * len(inner)
        dx_blocked[inner] = xi[b][:ki].reshape(-1, 3)
    dx_blocked[bn.junction_stations] = xj.reshape(-1, 3)

    assert np.abs(dx_blocked - dx_dense).max() < 1e-8


def test_schur_sharded_equals_dense(small_net):
    xyz, x0, bn, fixed = small_net
    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs multiple devices")
    from jax.sharding import Mesh
    mesh = Mesh(np.array(devices[:4]), ("blocks",))

    free_weight = 0.01
    dx_dense = _dense_solution(bn, x0, free_weight).reshape(-1, 3)
    bs = build_normals(bn, x0, free_weight)
    xi, xj = schur_solve_sharded(bs, mesh)

    dx_blocked = np.zeros_like(dx_dense)
    for b, (inner, junc) in enumerate(bn.blocks):
        ki = 3 * len(inner)
        dx_blocked[inner] = xi[b][:ki].reshape(-1, 3)
    dx_blocked[bn.junction_stations] = xj.reshape(-1, 3)

    assert np.abs(dx_blocked - dx_dense).max() < 1e-8


def test_blocked_adjustment_converges(small_net):
    xyz, x0, bn, fixed = small_net
    x, iters, max_corr, _ = adjust_blocked(bn, x0)
    assert max_corr <= 0.0005
    # adjusted minus truth bounded by observation noise
    assert np.abs(x - xyz).max() < 0.15


def test_f32_refined_solve_reaches_f64(small_net):
    """Mixed-precision solve (f32 factorization + f64 residual refinement)
    reproduces the f64 solution to machine precision — the TPU MXU
    strategy for the reference's f64 LAPACK requirement."""
    from dynadjust_tpu.parallel.schur import schur_solve_refined
    xyz, x0, bn, fixed = small_net
    bs = build_normals(bn, x0, 0.01)
    xi64, xj64 = schur_solve(bs)
    xi32, xj32 = schur_solve_refined(bs, refine=2)
    assert np.abs(xi32 - xi64).max() < 1e-10
    assert np.abs(xj32 - xj64).max() < 1e-10


def test_device_resident_solve_reaches_f64(small_net):
    """Single-dispatch device solver (f32 factors + on-device f64
    refinement inside one jit) reproduces the f64 solution, and reusing
    its factors across rhs changes is exact."""
    from dynadjust_tpu.parallel.schur import schur_solve_device
    xyz, x0, bn, fixed = small_net
    bs = build_normals(bn, x0, 0.01)
    xi64, xj64 = schur_solve(bs)
    xi, xj, factors = schur_solve_device(bs, refine=2)
    assert np.abs(xi - xi64).max() < 1e-10
    assert np.abs(xj - xj64).max() < 1e-10
    # factor reuse with a different rhs
    bs2 = build_normals(bn, x0 + 1e-4, 0.01)
    yi64, yj64 = schur_solve(bs2)
    yi, yj, _ = schur_solve_device(bs2, refine=2, factors=factors)
    assert np.abs(yi - yi64).max() < 1e-10
    assert np.abs(yj - yj64).max() < 1e-10


def test_device_adjustment_matches_host(small_net):
    """The fully device-resident Gauss-Newton loop (one dispatch per
    iteration) follows the host-assembled trajectory exactly."""
    from dynadjust_tpu.parallel.device_adjust import adjust_blocked_device
    xyz, x0, bn, fixed = small_net
    x_host, it_h, _, _ = adjust_blocked(bn, x0)
    x_dev, it_d, mc, _ = adjust_blocked_device(bn, x0)
    assert it_d == it_h
    assert mc <= 0.0005
    assert np.abs(x_dev - x_host).max() < 1e-8


def test_blocked_adjustment_f32_refinement(small_net):
    """f32+refined block solves follow the f64 Gauss-Newton trajectory
    to the convergence threshold."""
    xyz, x0, bn, fixed = small_net
    x64, it64, _, _ = adjust_blocked(bn, x0)
    x32, it32, _, _ = adjust_blocked(bn, x0, dtype=np.float32)
    assert it32 == it64
    assert np.abs(x32 - x64).max() < 1e-8


@pytest.fixture(scope="module")
def grid_system():
    rows, cols, blk = 16, 16, 4
    xyz, pairs, obs, var, x0, fixed = synthetic_grid_network(rows, cols,
                                                             seed=3)
    blocks, junction = grid_segmentation(rows, cols, blk, blk)
    bn = BlockedNetwork(nstations=rows * cols, pairs=pairs, obs=obs,
                        weight=1.0 / var, blocks=blocks,
                        junction_stations=junction, constrained=fixed)
    bs = build_normals(bn, x0, 0.01)
    return bs, bn, rows, cols, blk


def test_nested_schur_matches_flat(grid_system):
    """3-level nested solve equals the 2-level solve (and hence the dense
    simultaneous solution)."""
    from dynadjust_tpu.parallel.schur import (
        build_nested_partition, schur_solve, schur_solve_nested,
    )
    from dynadjust_tpu.utils.synthetic import grid_super_assignment

    bs, bn, rows, cols, blk = grid_system
    xi, xj = schur_solve(bs)
    sup = grid_super_assignment(rows, cols, blk, blk, 2, 2)
    part = build_nested_partition(bs, sup)
    assert part.nsj_global < bs.nj_global  # really eliminated something
    xi_n, xj_n = schur_solve_nested(bs, part)
    np.testing.assert_allclose(xi_n, xi, atol=1e-8)
    np.testing.assert_allclose(xj_n, xj, atol=1e-8)


def test_nested_schur_sharded(grid_system):
    from dynadjust_tpu.parallel.schur import (
        build_nested_partition, schur_solve, schur_solve_nested,
    )
    from dynadjust_tpu.utils.synthetic import grid_super_assignment
    import jax
    from jax.sharding import Mesh

    bs, bn, rows, cols, blk = grid_system
    xi, xj = schur_solve(bs)
    sup = grid_super_assignment(rows, cols, blk, blk, 2, 2)
    part = build_nested_partition(bs, sup)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("blocks",))
    xi_n, xj_n = schur_solve_nested(bs, part, mesh=mesh)
    np.testing.assert_allclose(xi_n, xi, atol=1e-8)
    np.testing.assert_allclose(xj_n, xj, atol=1e-8)


def test_nested_schur_refined_f32(grid_system):
    from dynadjust_tpu.parallel.schur import (
        build_nested_partition, schur_solve, schur_solve_nested_refined,
    )
    from dynadjust_tpu.utils.synthetic import grid_super_assignment

    bs, bn, rows, cols, blk = grid_system
    xi, xj = schur_solve(bs)
    sup = grid_super_assignment(rows, cols, blk, blk, 2, 2)
    part = build_nested_partition(bs, sup)
    xi_r, xj_r = schur_solve_nested_refined(bs, part, refine=2)
    np.testing.assert_allclose(xi_r, xi, atol=1e-7)
    np.testing.assert_allclose(xj_r, xj, atol=1e-7)


def test_nested_schur_factored(grid_system):
    from dynadjust_tpu.parallel.schur import (
        build_nested_partition, schur_solve, schur_solve_nested_factored,
    )
    from dynadjust_tpu.utils.synthetic import grid_super_assignment

    bs, bn, rows, cols, blk = grid_system
    xi, xj = schur_solve(bs)
    sup = grid_super_assignment(rows, cols, blk, blk, 2, 2)
    part = build_nested_partition(bs, sup)
    xi_f, xj_f, factors = schur_solve_nested_factored(bs, part, refine=2)
    np.testing.assert_allclose(xi_f, xi, atol=1e-7)
    np.testing.assert_allclose(xj_f, xj, atol=1e-7)
    # factor reuse path
    xi_g, xj_g, _ = schur_solve_nested_factored(bs, part, refine=2,
                                                factors=factors)
    np.testing.assert_allclose(xi_g, xi_f, atol=1e-10)


def test_adjust_blocked_nested(grid_system):
    """Full Gauss-Newton through the nested path converges to the same
    coordinates as the flat path."""
    from dynadjust_tpu.parallel.blocked_adjust import adjust_blocked
    from dynadjust_tpu.utils.synthetic import (
        synthetic_grid_network, grid_segmentation, grid_super_assignment,
    )
    from dynadjust_tpu.parallel.blocked_adjust import BlockedNetwork

    rows, cols, blk = 16, 16, 4
    xyz, pairs, obs, var, x0, fixed = synthetic_grid_network(rows, cols,
                                                             seed=3)
    bn = BlockedNetwork(nstations=rows * cols, pairs=pairs, obs=obs,
                        weight=1.0 / var,
                        blocks=grid_segmentation(rows, cols, blk, blk)[0],
                        junction_stations=grid_segmentation(
                            rows, cols, blk, blk)[1],
                        constrained=fixed)
    x_flat, it_f, mc_f, _ = adjust_blocked(bn, x0)
    sup = grid_super_assignment(rows, cols, blk, blk, 2, 2)
    x_nest, it_n, mc_n, _ = adjust_blocked(bn, x0, block_super=sup)
    assert it_n == it_f
    np.testing.assert_allclose(x_nest, x_flat, atol=1e-6)


def test_device_solver_mesh_sharded(small_net):
    """Device-resident refined solve sharded over an 8-device mesh
    (blocks on devices, junction reduction via psum) equals the f64
    solution."""
    import jax
    from jax.sharding import Mesh
    from dynadjust_tpu.parallel.schur import DeviceSchurFactors
    xyz, x0, bn, fixed = small_net
    bs = build_normals(bn, x0, 0.01)
    xi64, xj64 = schur_solve(bs)
    mesh = Mesh(np.array(jax.devices()), ("blocks",))
    f = DeviceSchurFactors(bs, mesh=mesh)
    xi, xj = f.solve(bs.bi, bs.bj, refine=2)
    assert np.abs(xi - xi64).max() < 1e-10
    assert np.abs(xj - xj64).max() < 1e-10


def test_nested_schur_streamed(grid_system):
    """Host-streamed factors (the staged .mtx analogue) match the
    device-resident nested path and hence the flat/dense solution."""
    from dynadjust_tpu.parallel.schur import (
        build_nested_partition, schur_solve, schur_solve_nested_factored,
    )
    from dynadjust_tpu.utils.synthetic import grid_super_assignment

    bs, bn, rows, cols, blk = grid_system
    xi, xj = schur_solve(bs)
    sup = grid_super_assignment(rows, cols, blk, blk, 2, 2)
    part = build_nested_partition(bs, sup)
    # small chunk forces several streaming round-trips
    from dynadjust_tpu.parallel.schur import StreamedNestedSchurFactors
    factors = StreamedNestedSchurFactors(bs, part, chunk=3)
    assert factors.C < len(bs.Nii)  # really streaming in chunks
    xi_s, xj_s, _ = schur_solve_nested_factored(bs, part, refine=2,
                                                factors=factors)
    np.testing.assert_allclose(xi_s, xi, atol=1e-7)
    np.testing.assert_allclose(xj_s, xj, atol=1e-7)
    # streamed=True construction path
    xi_t, xj_t, f2 = schur_solve_nested_factored(bs, part, refine=2,
                                                 streamed=True)
    np.testing.assert_allclose(xi_t, xi, atol=1e-7)
    np.testing.assert_allclose(xj_t, xj, atol=1e-7)


def test_nested_junction_cov_matches_dense(grid_system):
    """Nested a-posteriori junction covariance (level-2/3 block-inverse
    identities) equals the dense N^-1 junction sub-blocks — the variance
    recovery the reference's combine pass provides (dnaadjust.cpp:3196)."""
    from dynadjust_tpu.parallel.schur import (
        build_nested_partition, NestedSchurFactors,
        StreamedNestedSchurFactors)
    from dynadjust_tpu.utils.synthetic import grid_super_assignment

    bs, bn, rows, cols, blk = grid_system
    sup = grid_super_assignment(rows, cols, blk, blk, 2, 2)
    part = build_nested_partition(bs, sup)

    # dense junction covariance via the full simultaneous inverse
    dx = _dense_solution(bn, np.zeros((bn.nstations, 3)), 0.01)  # noqa
    S = bn.nstations
    N = np.zeros((3 * S, 3 * S))
    for m, (i, j) in enumerate(bn.pairs):
        w = bn.weight[m]
        for k in range(3):
            N[3 * i + k, 3 * i + k] += w
            N[3 * j + k, 3 * j + k] += w
            N[3 * i + k, 3 * j + k] -= w
            N[3 * j + k, 3 * i + k] -= w
    wdiag = np.full(3 * S, 0.01)
    for s in bn.constrained:
        wdiag[3 * s:3 * s + 3] = 1e6
    N += np.diag(wdiag)
    Ninv = np.linalg.inv(N)

    # global junction param g corresponds to station bn.junction_stations
    jstn = np.asarray(bn.junction_stations)
    gparam = np.concatenate([[3 * s, 3 * s + 1, 3 * s + 2] for s in jstn])

    for factors in (NestedSchurFactors(bs, part, dtype=np.float64),
                    StreamedNestedSchurFactors(bs, part,
                                               dtype=np.float64, chunk=3)):
        djg = factors.djg_np
        for b in [0, len(bs.Nii) // 2, len(bs.Nii) - 1]:
            jm = bs.jmap[b][bs.jmask[b] > 0]
            C = factors.junction_cov(jm)
            C = C * np.outer(djg[jm], djg[jm])     # unscale
            sel = gparam[jm]
            np.testing.assert_allclose(
                C, Ninv[np.ix_(sel, sel)], rtol=1e-6, atol=1e-12)


def test_streamed_refined_factors_residual(grid_system):
    """Newton-refined streamed factor pools make each apply near-f64:
    the refined solve's true residual must reach ~1e-12 relative — the
    convergence the 0.1 mm national-scale requirement needs (round-2
    stalled at 2.6e-4 at 200k with f32-only streamed factors)."""
    from dynadjust_tpu.parallel.schur import (
        build_nested_partition, schur_solve_nested_factored,
        StreamedNestedSchurFactors, _block_matvec, _gather_rhs_junction,
    )
    from dynadjust_tpu.utils.synthetic import grid_super_assignment

    bs, bn, rows, cols, blk = grid_system
    part = build_nested_partition(
        bs, grid_super_assignment(rows, cols, blk, blk, 2, 2))
    factors = StreamedNestedSchurFactors(bs, part, chunk=3)
    factors.newton_refine_cov()
    xi, xj, _ = schur_solve_nested_factored(bs, part, refine=1,
                                            factors=factors)
    yi, yj = _block_matvec(bs, xi, xj)
    ri = np.abs(bs.bi * bs.imask - yi).max()
    rj = np.abs(_gather_rhs_junction(bs) - yj).max()
    scale = max(np.abs(bs.bi).max(), 1.0)
    assert max(ri, rj) / scale < 1e-11


def test_nested_junction_cov_selected_rows_vs_full(grid_system):
    """ADVICE r2: the selected-rows covariance recovery
    (U_sel C U_selᵀ, O(k nj2²)) must equal the full-matrix formula
    (A2inv + U C Uᵀ then row/col selection) on a tiny nested
    partition — guards future edits to the C_loc/j2mask handling."""
    from dynadjust_tpu.parallel.schur import (
        build_nested_partition, NestedSchurFactors, nested_junction_cov)
    from dynadjust_tpu.utils.synthetic import grid_super_assignment

    bs, bn, rows, cols, blk = grid_system
    part = build_nested_partition(
        bs, grid_super_assignment(rows, cols, blk, blk, 2, 2))
    f = NestedSchurFactors(bs, part, dtype=np.float64)
    A2h = np.asarray(f.factors[2], dtype=np.float64)
    Y2h = np.asarray(f.factors[3], dtype=np.float64)
    Sh = np.asarray(f.factors[4], dtype=np.float64)

    for b in (0, len(bs.Nii) - 1):
        gsel = bs.jmap[b][bs.jmask[b] > 0]
        C_sel = nested_junction_cov(part, A2h, Y2h, Sh, gsel)

        # full-matrix reference: Cov(inner2_sb) = A2inv + U C Uᵀ over the
        # WHOLE super-block space, then select rows/cols
        kind = part.xj_kind[gsel]
        slot = part.xj_slot[gsel]
        assert (kind == 0).any()
        sb = int(part.xj_sb[gsel[kind == 0][0]])
        jm2 = part.j2map[sb]
        m2 = part.j2mask[sb]
        Cloc = Sh[np.ix_(jm2, jm2)] * np.outer(m2, m2)
        U = Y2h[sb]
        cov_full = A2h[sb] + U @ Cloc @ U.T
        i0 = np.nonzero(kind == 0)[0]
        r0 = slot[i0]
        np.testing.assert_allclose(
            C_sel[np.ix_(i0, i0)], cov_full[np.ix_(r0, r0)],
            rtol=1e-12, atol=1e-15)
        i1 = np.nonzero(kind == 1)[0]
        if len(i1):
            X_full = -(U * m2[None, :]) @ Sh[np.ix_(jm2, slot[i1])]
            np.testing.assert_allclose(
                C_sel[np.ix_(i0, i1)], X_full[r0], rtol=1e-12,
                atol=1e-15)


def test_nested_fused_matches_chunked_paths(grid_system, monkeypatch):
    """The small-scale fused factor/apply programs must reproduce the
    python-chunked national-scale path (same math, different program
    granularity) — both route production solves."""
    from dynadjust_tpu.parallel.schur import (build_nested_partition,
                                              NestedSchurFactors)
    from dynadjust_tpu.utils.synthetic import grid_super_assignment

    bs, bn, rows, cols, blk = grid_system
    part = build_nested_partition(
        bs, grid_super_assignment(rows, cols, blk, blk, 2, 2))

    monkeypatch.setenv("DTA_NESTED_FUSE_BYTES", "1e12")   # force fused
    f_small = NestedSchurFactors(bs, part, dtype=np.float64)
    assert f_small._small
    xi_s, xj_s = f_small.solve(bs.bi, bs.bj)

    monkeypatch.setenv("DTA_NESTED_FUSE_BYTES", "1")      # force chunked
    f_big = NestedSchurFactors(bs, part, dtype=np.float64)
    assert not f_big._small
    xi_b, xj_b = f_big.solve(bs.bi, bs.bj)

    scale = max(np.abs(xi_b).max(), 1e-30)
    assert np.abs(xi_s - xi_b).max() / scale < 1e-12
    assert np.abs(xj_s - xj_b).max() / scale < 1e-12

    # refactor() on fresh pools must equal a fresh construction
    f_small.refactor(bs)
    xi_r, xj_r = f_small.solve(bs.bi, bs.bj)
    assert np.abs(xi_r - xi_s).max() / scale < 1e-12


def test_streamed_inline_refine_matches_two_phase(grid_system):
    """The single-pass streamed factor+refine pipeline
    (_streamed_chunk_factor_refine: triangle-packed f64 transfers, f32
    factor pools never crossing the link, host-side f64 applies) must
    match the two-phase (factor, then newton_refine_cov) pipeline and
    reach the same ~1e-11 refined-solve residual."""
    from dynadjust_tpu.parallel.schur import (
        build_nested_partition, schur_solve_nested_factored,
        StreamedNestedSchurFactors, _block_matvec, _gather_rhs_junction,
    )
    from dynadjust_tpu.utils.synthetic import grid_super_assignment

    bs, bn, rows, cols, blk = grid_system
    part = build_nested_partition(
        bs, grid_super_assignment(rows, cols, blk, blk, 2, 2))

    f2 = StreamedNestedSchurFactors(bs, part, chunk=3)
    f2.newton_refine_cov()
    f1 = StreamedNestedSchurFactors(bs, part, chunk=3,
                                    refine_inline=True)
    # refined pools agree between the pipelines to the scale-vector
    # rounding: the two-phase path refines against f32-ROUNDED unity
    # scales (di_h widened), the inline path against exact f64 scales —
    # the pools are inverses of ~1e-7-relatively different scalings
    # (the refined-solve loop absorbs either; the residual bar below is
    # the meaningful one)
    A2, Y2 = f2._cov_l1_h
    A1, Y1 = f1._cov_l1_h
    assert np.abs(A1 - A2).max() < 1e-6 * np.abs(A2).max()
    assert np.abs(Y1 - Y2).max() < 1e-6 * max(np.abs(Y2).max(), 1.0)
    ev = f1.cov_refine_evidence
    assert ev["inline"] and ev["l1_err"] < 1e-10

    xi, xj, _ = schur_solve_nested_factored(bs, part, refine=1,
                                            factors=f1)
    yi, yj = _block_matvec(bs, xi, xj)
    ri = np.abs(bs.bi * bs.imask - yi).max()
    rj = np.abs(_gather_rhs_junction(bs) - yj).max()
    scale = max(np.abs(bs.bi).max(), 1.0)
    assert max(ri, rj) / scale < 1e-11
