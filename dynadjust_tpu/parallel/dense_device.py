"""Dense normal-equation solve on the TPU with a Newton-refined inverse.

The CLI's simultaneous/phased modes need the full inverse of the
(unity-scaled) normals for variance propagation — the reference's
dpotrf+dpotri (Solve, dnaadjust.cpp:6586).  mm-level geodesy demands
f64-quality results, and the MXU is f32: this module factors in f32 with
the blocked tiled kernel (ops/blocked_chol.py) and then runs Newton
iterations for the inverse in on-device f64,

    X <- X (2I - N X),

which squares the relative error each step: ~kappa*1e-7 after the f32
inverse, ~1e-13 after two steps for unity-scaled normals.  The whole
solve (scale, factor, refine, unscale, rhs apply) is one jitted
dispatch; N crosses the link once.

This is what `adjust --tpu` routes through — the same .adj bytes as the
host LAPACK path, produced by the TPU.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("scale", "newton"))
def _dense_solve_jit(N64, rhs64, scale: bool = True, newton: int = 2):
    n = N64.shape[0]
    if scale:
        s = 1.0 / jnp.sqrt(jnp.diagonal(N64))
        Ns = N64 * s[:, None] * s[None, :]
    else:
        s = None
        Ns = N64

    from ..ops.blocked_chol import blocked_cholesky_linv
    Linv = blocked_cholesky_linv(Ns.astype(jnp.float32)[None])[0]
    X = jnp.einsum("ki,kj->ij", Linv, Linv,
                   precision=_HI).astype(jnp.float64)

    eye2 = 2.0 * jnp.eye(n, dtype=jnp.float64)
    for _ in range(newton):
        # Newton-Schulz: X <- X (2I - Ns X); f64 on-device (VPU)
        X = X @ (eye2 - Ns @ X)
    # symmetrise (Newton iterates drift asymmetric at roundoff level)
    X = 0.5 * (X + X.T)

    if s is not None:
        X = X * s[:, None] * s[None, :]
    dx = X @ rhs64
    return X, dx


def dense_solve_device(N, rhs, scale_to_unity: bool = True,
                       newton: int = 2):
    """Solve N dx = rhs and return (Ninv, dx), both f64-quality, computed
    on the TPU in a single dispatch."""
    Ninv, dx = _dense_solve_jit(jnp.asarray(N, dtype=jnp.float64),
                                jnp.asarray(rhs, dtype=jnp.float64),
                                scale_to_unity, newton)
    return (np.asarray(Ninv, dtype=np.float64),
            np.asarray(dx, dtype=np.float64))
