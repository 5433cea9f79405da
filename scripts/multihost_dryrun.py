"""Multi-host dryrun: N processes x M virtual CPU devices solve one
blocked system through the distributed Schur path and verify bit-level
agreement with the single-process host solve.

Parent mode (default) spawns the child processes, waits, and summarises
to MULTIHOST.json.  Child mode (--process-id) initialises
``jax.distributed`` against the shared coordinator, assembles the SAME
deterministic synthetic system, contributes only its local block shards,
runs ``schur_solve_multihost`` over both the flat 1-D global mesh and
the hierarchical (hosts, local) mesh, and checks both against the
single-device reference solve computed host-side.

Usage:
  python scripts/multihost_dryrun.py [--nproc 2] [--local-devices 4]
                                     [--rows 24] [--cols 24]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def build_system(rows, cols, br, bc):
    import numpy as np
    from dynadjust_tpu.parallel.blocked_adjust import (BlockedNetwork,
                                                       build_normals)
    from dynadjust_tpu.utils.synthetic import (synthetic_grid_network,
                                               grid_segmentation)
    xyz, pairs, obs, var, x0, fixed = synthetic_grid_network(rows, cols,
                                                             seed=3)
    blocks, junction = grid_segmentation(rows, cols, br, bc)
    bn = BlockedNetwork(nstations=rows * cols, pairs=pairs, obs=obs,
                        weight=1.0 / var, blocks=blocks,
                        junction_stations=junction, constrained=fixed)
    return build_normals(bn, x0, 0.01)


def child(args):
    from dynadjust_tpu.parallel import multihost as mh
    mh.init_distributed(coordinator=args.coordinator,
                        num_processes=args.nproc,
                        process_id=args.process_id,
                        cpu_devices_per_process=args.local_devices)
    import jax
    import numpy as np
    assert jax.process_count() == args.nproc
    bs = build_system(args.rows, args.cols, args.block, args.block)

    # single-process host reference (each process computes it locally)
    from dynadjust_tpu.parallel.schur import schur_solve
    xi_ref, xj_ref = schur_solve(bs)

    results = {}
    mesh_flat = mh.global_block_mesh()
    xi, xj = mh.schur_solve_multihost(bs, mesh_flat)
    results["flat"] = {
        "devices": int(len(jax.devices())),
        "max_dxi": float(np.abs(xi - xi_ref).max()),
        "max_dxj": float(np.abs(xj - xj_ref).max()),
    }

    mesh_h = mh.hierarchical_block_mesh()
    xi, xj = mh.schur_solve_multihost(bs, mesh_h)
    results["hierarchical"] = {
        "mesh_shape": {k: int(v) for k, v in mesh_h.shape.items()},
        "max_dxi": float(np.abs(xi - xi_ref).max()),
        "max_dxj": float(np.abs(xj - xj_ref).max()),
    }

    # ---- END-TO-END production adjustment across processes ----------
    # The real pipeline (Assembler -> constraint elimination -> device
    # assembly -> sharded factor/solve -> statistics) over the global
    # mesh, compared against the same adjustment run single-device.
    from dynadjust_tpu.utils.synthetic_mixed import synthetic_mixed_network
    from dynadjust_tpu.adjust import AdjustmentOptions
    from dynadjust_tpu.adjust.tpu_blocked import adjust_tpu_blocked

    net1, seg1 = synthetic_mixed_network(12, 12, block_rows=4,
                                         block_cols=4)
    res_ref = adjust_tpu_blocked(net1, AdjustmentOptions(), seg=seg1)
    net2, seg2 = synthetic_mixed_network(12, 12, block_rows=4,
                                         block_cols=4)
    res_mh = adjust_tpu_blocked(net2, AdjustmentOptions(), seg=seg2,
                                mesh=mesh_flat)
    results["end_to_end_adjustment"] = {
        "stations": int(net1.nstations),
        "blocks": int(seg1.block_count),
        "iterations": int(res_mh.iterations),
        "max_dxyz_m": float(np.abs(res_mh.xyz - res_ref.xyz).max()),
        "d_sigma0": float(abs(res_mh.sigma_zero - res_ref.sigma_zero)),
        "max_dcov": float(np.abs(res_mh.cov_stn - res_ref.cov_stn).max()),
    }

    if args.process_id == 0:
        e2e = results["end_to_end_adjustment"]
        out = {
            "ok": (all(r["max_dxi"] < 1e-8 and r["max_dxj"] < 1e-8
                       for k, r in results.items()
                       if k != "end_to_end_adjustment")
                   and e2e["max_dxyz_m"] < 1e-8
                   and e2e["d_sigma0"] < 1e-9),
            "num_processes": args.nproc,
            "local_devices": args.local_devices,
            "blocks": int(bs.Nii.shape[0]),
            "nj_global": int(bs.nj_global),
            "results": results,
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


def parent(args):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    port = 48621 + (os.getpid() % 1000)
    procs = []
    out = args.out
    logs = []
    for pid in range(args.nproc):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--process-id", str(pid), "--nproc", str(args.nproc),
               "--local-devices", str(args.local_devices),
               "--rows", str(args.rows), "--cols", str(args.cols),
               "--block", str(args.block),
               "--coordinator", f"localhost:{port}", "--out", out]
        log = open(f"{out}.p{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            cmd, env=env,
            stdout=(None if pid == 0 else subprocess.DEVNULL),
            stderr=log))
    deadline = time.time() + args.timeout
    rc = 0
    try:
        for p in procs:
            try:
                rc |= p.wait(max(1.0, deadline - time.time()))
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                print("multihost dryrun TIMED OUT", file=sys.stderr)
                rc = 2
                break
    finally:
        for log in logs:
            log.close()
    if rc == 0 and os.path.exists(out):
        ok = json.load(open(out)).get("ok")
        print(f"multihost dryrun: ok={ok} -> {out}", file=sys.stderr)
        return 0 if ok else 1
    for pid in range(args.nproc):
        try:
            tail = open(f"{out}.p{pid}.log").read()[-1500:]
        except OSError:
            tail = "<no log>"
        print(f"--- child {pid} stderr tail ---\n{tail}", file=sys.stderr)
    return rc or 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--rows", type=int, default=24)
    ap.add_argument("--cols", type=int, default=24)
    ap.add_argument("--block", type=int, default=6)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--out", default=os.path.join(ROOT, "MULTIHOST.json"))
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()
    if args.process_id is None:
        sys.exit(parent(args))
    child(args)


if __name__ == "__main__":
    main()
