"""Benchmark: blocked TPU adjustment vs reference-style dense host solve.

Builds a synthetic GNSS grid network (the BASELINE.json scaling configs),
adjusts it with the TPU two-level Schur solver (f32 factorizations + f64
residual refinement), and compares one Gauss-Newton solve against the
reference's approach — a dense float64 Cholesky of the full simultaneous
normals on the host CPU (what DynAdjust's MKL path does,
dnaadjust.cpp:6586 Solve → dpotrf/dpotri).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

# Persistent compilation cache: axon remote compiles take minutes (and can
# wedge); cache hits make repeat bench runs start in seconds.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ROWS = int(os.environ.get("BENCH_ROWS", "64"))
COLS = int(os.environ.get("BENCH_COLS", "64"))
BLOCK = int(os.environ.get("BENCH_BLOCK", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))
# BENCH_NESTED=1: use the 3-level nested solver (national-scale path);
# BENCH_SUPER: super-tile size in tiles (default 4)
# BENCH_STREAMED=1: host-staged level-1 factors streamed through the chip
# (the staged .mtx analogue — for networks whose factors exceed HBM)
NESTED = os.environ.get("BENCH_NESTED", "") == "1"
SUPER = int(os.environ.get("BENCH_SUPER", "4"))
STREAMED = os.environ.get("BENCH_STREAMED", "") == "1"


def main():
    from dynadjust_tpu.parallel.blocked_adjust import BlockedNetwork, \
        build_normals
    from dynadjust_tpu.parallel.schur import schur_solve_factored
    from dynadjust_tpu.utils.synthetic import synthetic_grid_network, \
        grid_segmentation

    S = ROWS * COLS
    xyz, pairs, obs, var, x0, fixed = synthetic_grid_network(ROWS, COLS,
                                                             seed=7)
    blocks, junction = grid_segmentation(ROWS, COLS, BLOCK, BLOCK)
    bn = BlockedNetwork(nstations=S, pairs=pairs, obs=obs,
                        weight=1.0 / var, blocks=blocks,
                        junction_stations=junction, constrained=fixed)

    log(f"bench: {S} stations, {len(pairs)} baselines, "
        f"{len(blocks)} blocks")
    t0 = time.time()
    bs = build_normals(bn, x0, 0.01)
    t_assembly = time.time() - t0
    log(f"assembly {t_assembly:.2f}s; block shapes Nii{bs.Nii.shape} "
        f"Njj{bs.Njj.shape}")

    # ---- TPU blocked solve (f32 factor + f64-refined applies) -----------
    t_gn_iter = None
    t_gn_device = None
    if NESTED or STREAMED:
        from dynadjust_tpu.parallel.schur import (
            build_nested_partition, schur_solve_nested_factored)
        from dynadjust_tpu.utils.synthetic import grid_super_assignment
        part = build_nested_partition(bs, grid_super_assignment(
            ROWS, COLS, BLOCK, BLOCK, SUPER, SUPER))
        log(f"nested: SB={part.SB} ni2={part.ni2} nsj={part.nsj_global}"
            + (" (streamed factors)" if STREAMED else ""))

        def solve(factors=None):
            return schur_solve_nested_factored(bs, part, refine=2,
                                               factors=factors,
                                               streamed=STREAMED)

        t0 = time.time()
        xi, xj, factors = solve()                           # compile
        log(f"warm-up (compile) {time.time() - t0:.2f}s")
        t0 = time.time()
        for _ in range(ITERS):
            xi, xj, factors = solve()
        t_blocked = (time.time() - t0) / ITERS
        t0 = time.time()
        for _ in range(ITERS):
            xi, xj, _ = solve(factors=factors)
        t_apply = (time.time() - t0) / ITERS
    else:
        # Device-resident solver: normals uploaded once; a refined solve
        # (apply + 2 on-device f64 refinement rounds) is ONE dispatch; a
        # re-factorization (terrestrial re-linearisation model) runs on
        # device-resident casts — no host↔device matrix traffic either way.
        import jax.numpy as jnp
        from dynadjust_tpu.parallel.schur import (
            DeviceSchurFactors, schur_solve_device)
        t0 = time.time()
        factors = DeviceSchurFactors(bs)
        xi, xj, _ = schur_solve_device(bs, refine=2, factors=factors)
        log(f"warm-up (upload+compile) {time.time() - t0:.2f}s")

        t0 = time.time()
        for _ in range(ITERS):
            factors.refactor()
            xi, xj, _ = schur_solve_device(bs, refine=2, factors=factors)
        t_blocked = (time.time() - t0) / ITERS
        t0 = time.time()
        for _ in range(ITERS):
            xi, xj, _ = schur_solve_device(bs, refine=2, factors=factors)
        t_apply = (time.time() - t0) / ITERS

        # full Gauss-Newton iteration (device rhs assembly + refined
        # solve + coordinate update; only a scalar crosses the link)
        from dynadjust_tpu.parallel.assembly import build_plan
        from dynadjust_tpu.parallel.device_adjust import DeviceAdjustment
        adj = DeviceAdjustment(build_plan(bn, 0.01))
        xd = jnp.asarray(x0)
        _ = adj.step(xd)                                    # compile
        t0 = time.time()
        for _ in range(ITERS):
            _, mc = adj.step(xd)
            float(mc)
        t_gn_iter = (time.time() - t0) / ITERS
        log(f"full GN iteration (on-device assembly) {t_gn_iter:.4f}s")

        # device-only times: K dependent iterations inside one program,
        # so dispatch/link latency (2 RTTs over a tunnel) amortises away
        import jax as _jax
        K = 20

        @_jax.jit
        def _dev_loop(x):
            def body(i, xc):
                xn, _ = adj.step(xc)
                return xn
            return _jax.lax.fori_loop(0, K, body, x)

        _dev_loop(xd).block_until_ready()                   # compile
        t0 = time.time()
        _dev_loop(xd).block_until_ready()
        t_gn_device = (time.time() - t0) / K
        log(f"GN iteration device-only (in-jit x{K}) {t_gn_device:.4f}s")

    log(f"per-solve: factor+apply {t_blocked:.4f}s, "
        f"apply-only {t_apply:.4f}s")

    # ---- reference-style dense f64 host solve ---------------------------
    # Assemble the full simultaneous normals once and Cholesky-solve, as
    # the reference's simultaneous mode does per iteration.  Above ~10k
    # stations the dense matrix no longer fits host RAM (the reference
    # would be in staged mode anyway): the baseline is then extrapolated
    # cubically from a measured 4k-station dense solve, and correctness
    # is checked through the blocked residual norm instead.
    import scipy.linalg as sla
    if 3 * S > 40000:
        from dynadjust_tpu.parallel.schur import (_block_matvec,
                                                  _gather_rhs_junction)
        yi, yj = _block_matvec(bs, xi, np.concatenate([xj]))
        ri = np.abs(bs.bi * bs.imask - yi).max()
        rj = np.abs(_gather_rhs_junction(bs) - yj).max()
        resid = max(ri, rj)
        rhs_scale = max(np.abs(bs.bi).max(), 1.0)
        t_dense_4k = 20.0           # measured dense 12288-param solve (s)
        t_dense = t_dense_4k * (S / 4096.0) ** 3
        result = {
            "metric": (f"streamed_schur_solve_{S}stn_gnss_network"
                       if STREAMED else
                       f"nested_schur_solve_{S}stn_gnss_network" if NESTED
                       else f"blocked_schur_solve_{S}stn_gnss_network"),
            "value": round(1.0 / t_blocked, 3),
            "unit": "solves/s",
            "vs_baseline": round(t_dense / t_blocked, 2),
            "detail": {
                "stations": S, "baselines": int(len(pairs)),
                "blocks": len(blocks),
                "t_blocked_s": round(t_blocked, 4),
                "t_apply_s": round(t_apply, 4),
                "t_assembly_s": round(t_assembly, 4),
                "dense_host_estimated": True,
                "t_dense_host_est_s": round(t_dense, 1),
                "max_residual": float(resid),
                "residual_rel": float(resid / rhs_scale),
                "device": _device_name(),
            },
        }
        print(json.dumps(result))
        return

    N = np.zeros((3 * S, 3 * S))
    r = np.zeros(3 * S)
    w = bn.weight
    i_idx = bn.pairs[:, 0]
    j_idx = bn.pairs[:, 1]
    mmc = bn.obs - (x0[j_idx] - x0[i_idx])
    for k in range(3):
        np.add.at(N, (3 * i_idx + k, 3 * i_idx + k), w)
        np.add.at(N, (3 * j_idx + k, 3 * j_idx + k), w)
        np.add.at(N, (3 * i_idx + k, 3 * j_idx + k), -w)
        np.add.at(N, (3 * j_idx + k, 3 * i_idx + k), -w)
        np.add.at(r, 3 * i_idx + k, -w * mmc[:, k])
        np.add.at(r, 3 * j_idx + k, w * mmc[:, k])
    wdiag = np.full(3 * S, 0.01)
    for s in fixed:
        wdiag[3 * s:3 * s + 3] = 1e6
    N[np.diag_indices_from(N)] += wdiag

    log("dense host solve...")
    t0 = time.time()
    c, low = sla.cho_factor(N, lower=True)
    dx_dense = sla.cho_solve((c, low), r)
    t_dense = time.time() - t0

    # cross-check correctness of the benched solver
    dxb = np.zeros((S, 3))
    for b, (inner, junc) in enumerate(bn.blocks):
        ki = 3 * len(inner)
        dxb[inner] = xi[b][:ki].reshape(-1, 3)
    dxb[bn.junction_stations] = xj.reshape(-1, 3)
    err = np.abs(dxb.reshape(-1) - dx_dense).max()

    result = {
        "metric": (f"streamed_schur_solve_{S}stn_gnss_network"
                   if STREAMED else
                   f"nested_schur_solve_{S}stn_gnss_network" if NESTED
                   else f"blocked_schur_solve_{S}stn_gnss_network"),
        "value": round(1.0 / t_blocked, 3),
        "unit": "solves/s",
        "vs_baseline": round(t_dense / t_blocked, 2),
        "detail": {
            "stations": S,
            "baselines": int(len(pairs)),
            "blocks": len(blocks),
            "t_blocked_s": round(t_blocked, 4),
            "t_apply_s": round(t_apply, 4),
            "t_gn_iteration_s": (round(t_gn_iter, 4)
                                 if t_gn_iter is not None else None),
            "t_gn_iteration_device_s": (round(t_gn_device, 4)
                                        if t_gn_device is not None
                                        else None),
            "t_dense_host_s": round(t_dense, 4),
            "t_assembly_s": round(t_assembly, 4),
            "max_err_vs_dense_m": float(err),
            "device": _device_name(),
        },
    }
    print(json.dumps(result))


def _device_name():
    try:
        import jax
        return str(jax.devices()[0])
    except Exception:
        return "unknown"


if __name__ == "__main__":
    main()
