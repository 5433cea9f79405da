"""National-scale END-TO-END adjustment demo: a mixed-measurement-type
synthetic network (G baselines + S slope distances + A angles + V zeniths
+ L level differences + R heights) adjusted by the full production path —
per-iteration 20-type re-linearisation, constraint elimination, batched
f32 Schur factorization (+ nested 3-level junction hierarchy above
SUPER>0), O(S) per-station covariance statistics, and the real output
writers (.adj/.xyz/.apu) — on a single chip.

This is BASELINE.md's north-star configuration (a GDA2020-scale phased
adjustment, reference staged mode dnaadjust-stage.cpp:59) run as one
batched TPU program per iteration instead of sequential block sweeps.

Usage: python scripts/national_mixed_demo.py [ROWS [COLS [BLOCK [SUPER]]]]
  SUPER=0 -> two-level batched Schur; SUPER>0 -> nested three-level.
  STAGED=1 -> level-1 factor pools staged in host RAM (past-HBM sizes).
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
# sitecustomize pins JAX_PLATFORMS=axon; PLATFORM=cpu forces the host
# backend through jax.config (effective before backend init)
if os.environ.get("PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PLATFORM"])

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 320
COLS = int(sys.argv[2]) if len(sys.argv) > 2 else 320
BLOCK = int(sys.argv[3]) if len(sys.argv) > 3 else 16
SUPER = int(sys.argv[4]) if len(sys.argv) > 4 else 16
STAGED = os.environ.get("STAGED", "") == "1"
OUTDIR = os.environ.get("OUTDIR", "/tmp/national_mixed")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    os.environ.setdefault("DTA_PROFILE", "1")
    from dynadjust_tpu.utils.synthetic_mixed import synthetic_mixed_network
    from dynadjust_tpu.adjust import AdjustmentOptions
    from dynadjust_tpu.adjust.tpu_blocked import adjust_tpu_blocked
    from dynadjust_tpu.output import write_adj, write_xyz
    from dynadjust_tpu.output.uncertainty import write_apu

    t0 = time.time()
    net, seg, truth = synthetic_mixed_network(ROWS, COLS, block_rows=BLOCK,
                                              block_cols=BLOCK,
                                              return_truth=True)
    S = net.nstations
    log(f"generated {S} stations, {len(net.measurements)} records, "
        f"{seg.block_count} blocks in {time.time()-t0:.1f}s")

    opts = AdjustmentOptions()
    # 2D super grouping: square super-tiles keep the super-junction
    # frontier O(sqrt(S)); contiguous 1D bands would make it O(S/band)
    block_super = None
    if SUPER > 0:
        from dynadjust_tpu.utils.synthetic import grid_super_assignment
        g = max(1, int(round(SUPER ** 0.5)))
        tr = (ROWS + BLOCK - 1) // BLOCK
        tc = (COLS + BLOCK - 1) // BLOCK
        block_super = grid_super_assignment(
            ROWS, COLS, BLOCK, BLOCK,
            (tr + g - 1) // g, (tc + g - 1) // g)
        nsup = len(np.unique(block_super))
        log(f"super grouping: {nsup} super-blocks ({g}x{g} grid)")
    t0 = time.time()
    res = adjust_tpu_blocked(net, opts, seg=seg, super_blocks=SUPER,
                             staged=STAGED, block_super=block_super)
    t_adjust = time.time() - t0
    log(f"adjust: {res.status} in {res.iterations} iterations, "
        f"sigma0 {res.sigma_zero:.4f} [{res.pass_fail}], "
        f"max_corr {res.max_corr:.2e} m, total {t_adjust:.1f}s")
    for it in res.iteration_log:
        log(f"  iter {it['iteration']}: max_corr {it['max_corr']:+.4f} m "
            f"at {it['station']} (block {it['block']}) "
            f"[{it['elapsed']:.1f}s]")

    os.makedirs(OUTDIR, exist_ok=True)
    base = os.path.join(OUTDIR, f"national_{S}stn")
    t0 = time.time()
    write_adj(base + ".adj", net, res, opts,
              cmdline=" ".join(sys.argv))
    write_xyz(base + ".xyz", net, res)
    write_apu(base + ".apu", net, res)
    log(f"outputs written to {base}.adj/.xyz/.apu "
        f"in {time.time()-t0:.1f}s")

    # plausibility cross-check vs the noise-free truth (returned by the
    # generator itself): with the stated measurement SDs the adjusted
    # coordinates must sit within a few SDs of the generating truth, and
    # the per-station formal SDs must be finite and O(cm).
    err = np.linalg.norm(res.xyz - truth, axis=1)
    sd = np.sqrt(np.maximum(
        res.cov_stn[:, 0, 0] + res.cov_stn[:, 1, 1] + res.cov_stn[:, 2, 2],
        0.0))
    log(f"vs truth: median {np.median(err)*1000:.2f} mm, "
        f"p99 {np.percentile(err, 99)*1000:.2f} mm, "
        f"max {err.max()*1000:.2f} mm")
    log(f"formal SD (3D): median {np.median(sd)*1000:.2f} mm, "
        f"max {sd.max()*1000:.2f} mm; finite: {np.isfinite(sd).all()}")
    import json
    rec = {
        "stations": S, "records": len(net.measurements),
        "blocks": seg.block_count, "super_blocks": SUPER,
        "staged": STAGED,
        "status": res.status, "iterations": res.iterations,
        "sigma0": round(float(res.sigma_zero), 4),
        "pass_fail": res.pass_fail,
        "max_corr_m": float(res.max_corr),
        "t_adjust_s": round(t_adjust, 1),
        "phase_profile_s": ({k: (round(v, 2) if not isinstance(v, dict)
                                 else {kk: round(vv, 2)
                                       for kk, vv in v.items()})
                             for k, v in res.profile.items()}
                            if res.profile else None),
        "stats_share_of_adjust": (round(res.profile["stats"] / t_adjust, 3)
                                  if res.profile else None),
        "iter_s": [round(it["elapsed"], 2) for it in res.iteration_log],
        "err_vs_truth_mm": {"median": round(float(np.median(err))*1e3, 3),
                            "p99": round(float(np.percentile(err, 99))*1e3, 3),
                            "max": round(float(err.max())*1e3, 3)},
        "formal_sd_mm_median": round(float(np.median(sd))*1e3, 3),
        # measured covariance-refinement residuals (max|I - N*Ainv| per
        # level + rounds used) and per-iteration solve residuals — the
        # accuracy of the artifact's formal SDs is recorded, not assumed
        "refine_evidence": res.refine_evidence,
        "solve_evidence": [
            {k: it[k] for k in ("solve_rel", "solve_rounds")
             if k in it}
            for it in res.iteration_log],
    }
    print(json.dumps(rec))
    with open(os.path.join(OUTDIR, f"national_{S}stn.json"), "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
