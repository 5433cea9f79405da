#!/usr/bin/env python3
"""Export a network's phased block systems to a flat binary file for the
reference-equivalent C++ baseline (native/ref_baseline.cpp).

The dump carries, per block in chain order: the constrained normals N
(huge-weight constraint formulation, exactly the reference's
AddConstraintStationstoNormals), the rhs AtVinv·mmc, and the junction
(JSL) parameter index lists into this block and the next — everything the
reference's AdjustPhased sweeps (dnaadjust.cpp:2756/3461) touch per
iteration, so the C++ harness can replay the same per-block
dpotrf/dpotri/dsymv sequence with OpenBLAS and be timed as the measured
single-node baseline.

Usage:
  python scripts/export_phased_blocks.py --synthetic 100x100 out.blk
  python scripts/export_phased_blocks.py --sample urban out.blk
"""

import argparse
import struct
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dynadjust_tpu.adjust import AdjustmentOptions
from dynadjust_tpu.adjust.phased import (Block, _first_appearances,
                                         _block_normals, _add_constraints)
from dynadjust_tpu.geodesy.conversions import geo_to_cart
from dynadjust_tpu.segment import segment_network


def build_blocks(net, seg, opts):
    B = seg.block_count
    blocks = [Block(net, opts, seg, b) for b in range(B)]
    first_fwd = _first_appearances(blocks, "fwd")
    first_rev = _first_appearances(blocks, "rev")
    x, y, z = geo_to_cart(net.lat, net.lon, net.height, net.datum.ellipsoid)
    est = np.stack([x, y, z], -1)
    for blk in blocks:
        blk.est = est[blk.stations].reshape(-1).copy()
        blk.asm.fill(blk.est, apply_reductions=True)
        blk.Wc = blk.asm.constraint_weights()
    out = []
    for b, blk in enumerate(blocks):
        N, AtVinv = _block_normals(blk)
        rhs = AtVinv @ blk.asm.mmc
        # per-direction constraint weights: the reference adds them at
        # each station's first appearance in the sweep direction
        # (AddConstraintStationstoNormals*, dnaadjust.cpp:1884)
        cw = []
        for direction, first in (("f", first_fwd[b]), ("r", first_rev[b])):
            entries = []
            for g in sorted(first):
                if g not in blk.asm.local:
                    continue
                li = blk.asm.local[g]
                entries.append((3 * li, blk.Wc[li]))
            cw.append(entries)
        if b + 1 < B:
            jsl = [g for g in seg.junction_stations[b]]
            jsl_cur = blk.param_idx_of(jsl)
            jsl_next = blocks[b + 1].param_idx_of(jsl)
        else:
            jsl_cur = jsl_next = np.zeros(0, dtype=np.int64)
        out.append((N, rhs, jsl_cur, jsl_next, cw[0], cw[1]))
    return out


def write_dump(path, blocks):
    with open(path, "wb") as f:
        f.write(struct.pack("<q", len(blocks)))
        for N, rhs, jc, jn, cwf, cwr in blocks:
            k, j = N.shape[0], len(jc)
            f.write(struct.pack("<qqqq", k, j, len(cwf), len(cwr)))
            f.write(np.asarray(jc, dtype=np.int64).tobytes())
            f.write(np.asarray(jn, dtype=np.int64).tobytes())
            for entries in (cwf, cwr):
                for l, W in entries:
                    f.write(struct.pack("<q", l))
                    f.write(np.ascontiguousarray(
                        W, dtype=np.float64).tobytes())
            f.write(np.ascontiguousarray(N, dtype=np.float64).tobytes())
            f.write(np.ascontiguousarray(rhs, dtype=np.float64).tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--synthetic", help="RxC mixed grid, e.g. 100x100")
    ap.add_argument("--sample", help="gnss | urban")
    ap.add_argument("--max-block-stns", type=int, default=150)
    args = ap.parse_args()

    opts = AdjustmentOptions()
    t0 = time.time()
    if args.synthetic:
        from dynadjust_tpu.utils.synthetic_mixed import \
            synthetic_mixed_network
        r, c = map(int, args.synthetic.split("x"))
        net, _ = synthetic_mixed_network(r, c)
    else:
        from dynadjust_tpu.io_formats import (read_dna_stn, read_dna_msr,
                                              NTv2Grid)
        from dynadjust_tpu.network import build_network
        from dynadjust_tpu.geoid import apply_geoid
        S = "/root/reference/sampleData"
        stns, frame, epoch = read_dna_stn(f"{S}/{args.sample}-network.stn")
        recs, _, _ = read_dna_msr(f"{S}/{args.sample}-network.msr")
        stns.sort(key=lambda s: s.name)
        net = build_network(stns, recs, frame, epoch)
        grid = NTv2Grid.read(f"{S}/{args.sample}-network-geoid.gsb")
        apply_geoid(net, grid, convert_heights=(args.sample == "gnss"))
    print(f"network: {net.nstations} stations, "
          f"{len(net.measurements)} records ({time.time()-t0:.1f}s)")

    t0 = time.time()
    seg = segment_network(net, min_inner_stns=args.max_block_stns,
                          max_block_stns=args.max_block_stns)
    print(f"segmented: {seg.block_count} blocks ({time.time()-t0:.1f}s)")

    t0 = time.time()
    blocks = build_blocks(net, seg, opts)
    write_dump(args.out, blocks)
    ks = [b[0].shape[0] for b in blocks]
    js = [len(b[2]) for b in blocks]
    print(f"dump: {args.out} ({time.time()-t0:.1f}s)  "
          f"k min/mean/max {min(ks)}/{int(np.mean(ks))}/{max(ks)}  "
          f"jsl mean/max {int(np.mean(js))}/{max(js)}")


if __name__ == "__main__":
    main()
