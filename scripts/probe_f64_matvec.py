"""Probe: is an emulated-f64 matvec on the TPU fast enough to serve as
the in-jit residual operator of the mixed-type refined solve?

The refinement residual r = b − N·x needs ~1e-13-relative accuracy (a
f32 product would stall the refinement at 1e-7).  Candidate operators:
  a) f64 einsum on device-resident f64 pools (XLA f64 emulation — known
     ~5 GFLOP/s for MATMULS, but a matvec is bandwidth-bound);
  b) double-float (hi, lo) f32 pools with a compensated 3-product
     matvec (error ~eps32² · depth — borderline);
  c) host numpy f64 (the status quo: 2 vCPUs + tunnel round-trip).

Run on the real TPU: `python scripts/probe_f64_matvec.py`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, n = 9, 3456          # bench-scale level-1 pools
rng = np.random.default_rng(0)
N64 = rng.standard_normal((B, n, n))
N64 = N64 @ np.swapaxes(N64, 1, 2) / n + np.eye(n) * 3.0
x = rng.standard_normal((B, n))

Nd = jnp.asarray(N64)
xd = jnp.asarray(x)
K = 8


@jax.jit
def mv64_chain(N, x0):
    def body(i, v):
        y = jnp.einsum("bij,bj->bi", N, v)
        return v + 1e-20 * y
    return jax.lax.fori_loop(0, K, body, x0)


def sync(a):
    np.asarray(a.ravel()[:1])


t0 = time.time()
out = mv64_chain(Nd, xd)
sync(out)
print(f"compile+first: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
out = mv64_chain(Nd, xd)
sync(out)
dt = (time.time() - t0) / K
fl = 2.0 * B * n * n
print(f"f64 matvec chained: {dt*1e3:.1f} ms/matvec "
      f"({fl/dt/1e9:.1f} GFLOP/s, pool {B*n*n*8/1e9:.2f} GB)", flush=True)

# double-float compensated matvec: y = Nhi xhi (f32) is wrong by
# eps32*|N||x|; instead accumulate with HIGHEST f32 then correct?  Here:
# plain 3-term double-float product for comparison of SPEED only.
Nhi = jnp.asarray(N64.astype(np.float32))
Nlo = jnp.asarray((N64 - np.asarray(Nhi)).astype(np.float32))
xhi32 = jnp.asarray(x.astype(np.float32))


@jax.jit
def mv_df_chain(Nh, Nl, x0):
    def body(i, v):
        v32 = v.astype(jnp.float32)
        y = (jnp.einsum("bij,bj->bi", Nh, v32,
                        preferred_element_type=jnp.float32)
             .astype(jnp.float64)
             + jnp.einsum("bij,bj->bi", Nl, v32,
                          preferred_element_type=jnp.float32)
             .astype(jnp.float64))
        return v + 1e-20 * y
    return jax.lax.fori_loop(0, K, body, x0)


t0 = time.time()
out = mv_df_chain(Nhi, Nlo, xd)
sync(out)
print(f"df compile+first: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
out = mv_df_chain(Nhi, Nlo, xd)
sync(out)
dt = (time.time() - t0) / K
print(f"double-float f32 matvec chained: {dt*1e3:.1f} ms/matvec",
      flush=True)

# accuracy of the f64 emulated matvec vs host numpy
y_dev = np.asarray(jnp.einsum("bij,bj->bi", Nd, xd))
y_host = np.einsum("bij,bj->bi", N64, x)
rel = np.abs(y_dev - y_host).max() / np.abs(y_host).max()
print(f"f64 device matvec vs host rel err: {rel:.2e}", flush=True)
