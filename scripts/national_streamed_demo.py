"""National-scale capability demo: one streamed 3-level Schur solve of a
GDA2020-scale synthetic GNSS network (BASELINE.md north-star config) on a
single chip, with level-1 factors staged in host RAM.

Usage: python scripts/national_streamed_demo.py [ROWS [COLS [BLOCK [SUPER]]]]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np
import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Default 448x448 = ~200k stations: the axon tunnel client leaks every
# uploaded host buffer (~1x traffic), so the demo bounds total upload
# traffic (bounded refinement, one reuse apply) to stay inside host RAM.
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 448
COLS = int(sys.argv[2]) if len(sys.argv) > 2 else 448
BLOCK = int(sys.argv[3]) if len(sys.argv) > 3 else 32
SUPER = int(sys.argv[4]) if len(sys.argv) > 4 else 4


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from dynadjust_tpu.parallel.blocked_adjust import (BlockedNetwork,
                                                       build_normals)
    from dynadjust_tpu.parallel.schur import (
        build_nested_partition, schur_solve_nested_factored,
        _block_matvec, _gather_rhs_junction)
    from dynadjust_tpu.utils.synthetic import (
        synthetic_grid_network, grid_segmentation, grid_super_assignment)

    S = ROWS * COLS
    log(f"building synthetic national network: {S} stations")
    xyz, pairs, obs, var, x0, fixed = synthetic_grid_network(ROWS, COLS,
                                                             seed=7)
    blocks, junction = grid_segmentation(ROWS, COLS, BLOCK, BLOCK)
    bn = BlockedNetwork(nstations=S, pairs=pairs, obs=obs,
                        weight=1.0 / var, blocks=blocks,
                        junction_stations=junction, constrained=fixed)
    log(f"{len(pairs)} baselines, {len(blocks)} blocks")
    t0 = time.time()
    bs = build_normals(bn, x0, 0.01)
    log(f"assembly {time.time()-t0:.1f}s  Nii{bs.Nii.shape} "
        f"Njj{bs.Njj.shape}")
    part = build_nested_partition(bs, grid_super_assignment(
        ROWS, COLS, BLOCK, BLOCK, SUPER, SUPER))
    log(f"partition: SB={part.SB} ni2={part.ni2} nj2={part.nj2} "
        f"nsj={part.nsj_global}")

    gib = (bs.Nii.nbytes + bs.Nij.nbytes + bs.Njj.nbytes) / 2 ** 31
    log(f"f32 level-1 pool ~{gib:.1f} GiB (device={jax.devices()[0]})")

    t0 = time.time()
    xi, xj, factors = schur_solve_nested_factored(bs, part, refine=0,
                                                  streamed=True,
                                                  max_refine=3)
    t_solve = time.time() - t0
    log(f"streamed factor+refined-solve {t_solve:.1f}s (chunk C="
        f"{factors.C})")

    t0 = time.time()
    xi2, xj2 = factors.solve(bs.bi, bs.bj)
    t_apply = time.time() - t0
    log(f"streamed apply (factor reuse, no refinement) {t_apply:.1f}s")

    yi, yj = _block_matvec(bs, xi, xj)
    ri = np.abs(bs.bi * bs.imask - yi).max()
    rj = np.abs(_gather_rhs_junction(bs) - yj).max()
    rhs_scale = max(np.abs(bs.bi).max(), 1.0)
    rel = max(ri, rj) / rhs_scale
    t_dense_est = 20.0 * (S / 4096.0) ** 3
    log(f"relative residual {rel:.2e}; extrapolated dense host solve "
        f"{t_dense_est/86400:.1f} days -> speedup {t_dense_est/t_solve:.0f}x")

    import json
    import resource
    B, ni = bs.Nii.shape[:2]
    nj = bs.Njj.shape[1]
    tri = ni * (ni + 1) // 2
    ledger = {
        "up_tri_Nii64_gb": round(B * tri * 8 / 2 ** 30, 2),
        "up_Nij64_Njj64_gb": round(B * (ni * nj + nj * nj) * 8
                                   / 2 ** 30, 2),
        "down_tri_A64_gb": round(B * tri * 8 / 2 ** 30, 2),
        "down_Y64_gb": round(B * ni * nj * 8 / 2 ** 30, 2),
        "applies": "host f64 (zero link traffic; DTA_STREAM_APPLY)",
        "vs_round4_two_phase_gb": "~57 (factor 16 + refine 41)",
    }
    rec = {
        "stations": S, "baselines": int(len(pairs)),
        "blocks": len(blocks), "super_blocks": int(part.SB),
        "streamed": True,
        "f64_refined_factors":
            os.environ.get("DTA_STREAMED_F64", "1") != "0",
        "refine_evidence": getattr(factors, "cov_refine_evidence",
                                   None),
        "t_factor_refined_solve_s": round(t_solve, 1),
        "t_reuse_apply_s": round(t_apply, 1),
        "relative_residual": float(rel),
        "chunk_blocks": int(factors.C),
        "transfer_ledger": ledger,
        "peak_host_rss_gb": round(resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 2 ** 20, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec))
    out = os.environ.get("OUTDIR", "/tmp")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, f"streamed_{S}stn.json"), "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
