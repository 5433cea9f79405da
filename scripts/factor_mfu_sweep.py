"""Measure block_reduce backends / shapes on the real TPU.

Prints per-config: time, achieved TFLOP/s, MFU vs the v5e f32 peak.
Timing materialises one element to host (block_until_ready is a no-op
over the axon tunnel).

Usage: python scripts/factor_mfu_sweep.py [configs...]
  config = BACKEND:B:ni:nj  e.g. rec:49:768:192
  BACKEND in {rec, blocked, xla, jct (junction dense inverse, B=1)}
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PLATFORM"])

V5E_F32_PEAK = 49.0e12


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


def flops_reduce(B, ni, nj):
    return B * (ni ** 3 / 3.0 + ni ** 3 + 2.0 * ni * ni * nj
                + 2.0 * ni * nj * nj)


def flops_inv(n):
    return (4.0 / 3.0) * n ** 3


def make_spd(B, n, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((B, n, 16)).astype(np.float32)
    A = M @ M.transpose(0, 2, 1)
    A += (np.arange(n, dtype=np.float32)[None, :, None] ==
          np.arange(n, dtype=np.float32)[None, None, :]) * (n / 4.0)
    return A


K = int(os.environ.get("SWEEP_K", "8"))    # chained calls per timing


def main():
    cfgs = sys.argv[1:] or [
        "rec:49:768:192", "rec:16:1920:384", "rec:9:3456:576",
        "jct:1:3584:0",
    ]
    print(f"device: {jax.devices()[0]}", flush=True)
    # measure the per-dispatch sync floor over the tunnel once
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8, 128))
    sync(tiny(z))
    t0 = time.time()
    for _ in range(10):
        sync(tiny(z))
    floor = (time.time() - t0) / 10
    print(f"dispatch+sync floor: {floor*1e3:.2f} ms", flush=True)

    for cfg in cfgs:
        be, B, ni, nj = cfg.split(":")
        B, ni, nj = int(B), int(ni), int(nj)
        Nii = jnp.asarray(make_spd(B, ni))
        if be == "jct":
            from dynadjust_tpu.ops.recursive_inv import spd_inverse_rec

            def one(A, _):
                X = spd_inverse_rec(A)
                # data dependency so the K calls can't collapse
                return A + X[..., :1, :1] * 1e-30, X
            fl = flops_inv(ni)
            args = (Nii,)
        else:
            rng = np.random.default_rng(1)
            Nij = jnp.asarray(rng.standard_normal(
                (B, ni, nj)).astype(np.float32))
            Njj = jnp.asarray(make_spd(B, nj, seed=2))
            if be == "rec":
                from dynadjust_tpu.ops.recursive_inv import block_reduce_rec
                red = block_reduce_rec
            else:
                from dynadjust_tpu.ops.blocked_chol import block_reduce
                import functools
                red = functools.partial(block_reduce, backend=be)

            def one(A, _):
                Ainv, Y, S = red(A, Nij, Njj)
                return A + Ainv[..., :1, :1] * 1e-30, (Ainv, Y, S)
            fl = flops_reduce(B, ni, nj)
            args = (Nii,)

        @jax.jit
        def fK(A):
            # K chained calls (fori_loop: one compiled body, no stacked
            # outputs) + one final call whose result we return
            A2 = jax.lax.fori_loop(0, K - 1,
                                   lambda i, c: one(c, None)[0], A)
            return one(A2, None)[1]

        t0 = time.time()
        out = fK(*args)
        sync(out)
        t_compile = time.time() - t0
        t0 = time.time()
        out = fK(*args)
        sync(out)
        t = (time.time() - t0) / K
        Xs = out if be == "jct" else out[0]
        X = np.asarray(Xs[:1])
        err = np.abs(X[0] @ np.asarray(Nii[0]) - np.eye(ni)).max()
        print(f"{cfg:>22}  t={t*1e3:8.2f} ms/call (x{K} chained)  "
              f"{fl/t/1e12:6.2f} TF/s  MFU={fl/t/V5E_F32_PEAK:6.1%}  "
              f"(compile {t_compile:.1f}s, inv_err {err:.1e})",
              flush=True)


if __name__ == "__main__":
    main()
