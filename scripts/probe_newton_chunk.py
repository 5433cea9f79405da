"""Probe: wall-clock anatomy of the national-scale Newton covariance
refinement — is stats.newton dispatch/sync/transfer or device compute?

Times, at the 102,400-stn chunk shapes: one warm _newton_l1_chunk
dispatch (C=40, ni~807), the chunked loop with its per-chunk syncs, and
the L2 batch — separating compile, first dispatch, and steady state.
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
jax.config.update("jax_enable_x64", True)

from dynadjust_tpu.parallel.schur import _newton_l1_chunk, _newton_l2_batch


def sync(x):
    np.asarray(x.ravel()[:1])


def main():
    C, ni, nj = 40, 807, 57
    rng = np.random.default_rng(0)
    A = rng.standard_normal((C, ni, 8))
    Nii = (A @ A.transpose(0, 2, 1)) / 8 + 3.0 * np.eye(ni)
    d = 1.0 / np.sqrt(np.einsum("bii->bi", Nii))
    Nij = rng.standard_normal((C, ni, nj)) * 0.01
    Njj = np.eye(nj)[None] * np.ones((C, 1, 1)) * 3.0
    Ainv0 = np.linalg.inv(Nii * d[:, :, None] * d[:, None, :]) \
        .astype(np.float32)

    tk = dict(max_rounds=6, tol=3e-9, sliced=True, nslices=6,
              cross_max=5)
    args = (jnp.asarray(Nii), jnp.asarray(Nij), jnp.asarray(Njj),
            jnp.asarray(d), jnp.asarray(np.ones((C, nj))),
            jnp.asarray(Ainv0))

    t0 = time.time()
    out = _newton_l1_chunk(*args, **tk)
    sync(out[2])
    t_first = time.time() - t0
    print(f"first call (compile/cache-load + run): {t_first:.1f}s",
          flush=True)

    t0 = time.time()
    out = _newton_l1_chunk(*args, **tk)
    sync(out[2])
    print(f"warm dispatch+sync: {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    for _ in range(3):
        out = _newton_l1_chunk(*args, **tk)
        err = float(out[4])
        k = int(out[3])
        sync(out[2])
    print(f"steady per-chunk (with evidence syncs): "
          f"{(time.time()-t0)/3:.2f}s  rounds={k} err={err:.1e}",
          flush=True)


if __name__ == "__main__":
    main()
