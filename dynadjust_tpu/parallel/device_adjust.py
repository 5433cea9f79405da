"""Fully device-resident Gauss-Newton adjustment for blocked GNSS networks.

The reference re-assembles normals and solves on the host every iteration
(PrepareAdjustmentBlock + Solve, dnaadjust.cpp:2873/6586).  Here the whole
loop lives on the TPU: the network topology (measurement scatter plan,
constant GPS normals, factorization) is uploaded once, and each iteration
is ONE jitted dispatch — rhs scatter-assembly, factored Schur apply,
on-device f64 residual refinement, and the coordinate update.  The host
sees a single max-correction scalar per iteration.

This is the architecture PCIe wants and a tunneled device demands: after
setup, per-iteration host↔device traffic is O(1).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .schur import (_schur_factor_jit, _schur_factor_inv_jit,
                    _device_solve_refined_jit, _owner_mask)
from .assembly import AssemblyPlan, build_plan
from .blocked_adjust import BlockedNetwork


@partial(jax.jit, static_argnames=("nj_total", "refine", "B", "ni", "nj",
                                   "method"))
def _gn_step_jit(x, L, Y, Lj, di, dj, djg, Nij_s,
                 Nii64, Nij64, Njj64,
                 pi, pj, obs, weight,
                 bi1, bi2, bj1, bj2,
                 inner_stn, junc_stn,
                 jmap, jmask32, jmask64, imask64, owner64,
                 nj_total, refine, B, ni, nj, method="inv"):
    """One Gauss-Newton iteration on device: assemble rhs, refined solve,
    update coordinates.  Returns (x_new, max_corr)."""
    S = x.shape[0]
    mmc = obs - (x[pj] - x[pi])                     # (M, 3) f64
    wm = weight[:, None] * mmc

    # rhs scatter (scratch slot at the end absorbs remapped -1 indices)
    bi = jnp.zeros((B * ni + 1,), dtype=x.dtype)
    bi = bi.at[bi1.reshape(-1)].add(-wm.reshape(-1))
    bi = bi.at[bi2.reshape(-1)].add(wm.reshape(-1))
    bj = jnp.zeros((B * nj + 1,), dtype=x.dtype)
    bj = bj.at[bj1.reshape(-1)].add(-wm.reshape(-1))
    bj = bj.at[bj2.reshape(-1)].add(wm.reshape(-1))
    bi = bi[:B * ni].reshape(B, ni)
    bj = bj[:B * nj].reshape(B, nj)

    xi, xj = _device_solve_refined_jit(
        L, Y, Lj, di, dj, djg, Nij_s, Nii64, Nij64, Njj64,
        bi, bj, jmap, jmask32, jmask64, imask64, owner64,
        nj_total, refine, method)

    # scatter corrections back to station layout (scratch row S)
    dx = jnp.zeros((S + 1, 3), dtype=x.dtype)
    dxi = (xi * imask64).reshape(B, ni // 3, 3)
    dx = dx.at[inner_stn.reshape(-1)].add(dxi.reshape(-1, 3))
    njg = junc_stn.shape[0]
    dx = dx.at[junc_stn].set(xj[:3 * njg].reshape(-1, 3))
    dx = dx[:S]
    max_corr = jnp.abs(dx).max()
    return x + dx, max_corr


class DeviceAdjustment:
    """Device-resident Gauss-Newton driver over an AssemblyPlan.

    For GPS-baseline networks the design is constant (±I), so the blocked
    normals and their factorization are built once; every iteration costs
    one dispatch.
    """

    def __init__(self, plan: AssemblyPlan, dtype=np.float32,
                 refine: int = 2, method: str = "inv"):
        bn = plan.bn
        self.plan = plan
        self.refine = refine
        B = len(bn.blocks)
        self.B, self.ni, self.nj = B, plan.ni, plan.nj
        self.nj_total = plan.nj_global + 1

        Nii, Nij, Njj = plan.N_struct
        self.Nii64 = jnp.asarray(Nii)
        self.Nij64 = jnp.asarray(Nij)
        self.Njj64 = jnp.asarray(Njj)
        self.jmap = jnp.asarray(plan.jmap)
        self.jmask32 = jnp.asarray(plan.jmask.astype(dtype))
        self.jmask64 = jnp.asarray(plan.jmask)
        self.imask64 = jnp.asarray(plan.imask)
        self.owner64 = jnp.asarray(_owner_mask(plan.jmap, plan.jmask))

        self.pi = jnp.asarray(bn.pairs[:, 0].astype(np.int32))
        self.pj = jnp.asarray(bn.pairs[:, 1].astype(np.int32))
        self.obs = jnp.asarray(bn.obs.astype(np.float64))
        self.weight = jnp.asarray(bn.weight.astype(np.float64))

        def remap(idx, scratch):
            out = idx.astype(np.int32).copy()
            out[out < 0] = scratch
            return jnp.asarray(out)

        self.bi1 = remap(plan.bi_idx_1, B * plan.ni)
        self.bi2 = remap(plan.bi_idx_2, B * plan.ni)
        self.bj1 = remap(plan.bj_idx_1, B * plan.nj)
        self.bj2 = remap(plan.bj_idx_2, B * plan.nj)

        # per-block inner station ids (filler = scratch row S)
        S = bn.nstations
        inner_stn = np.full((B, plan.ni // 3), S, dtype=np.int32)
        for b, (inner, junc) in enumerate(bn.blocks):
            inner_stn[b, :len(inner)] = inner
        self.inner_stn = jnp.asarray(inner_stn)
        self.junc_stn = jnp.asarray(
            np.asarray(bn.junction_stations, dtype=np.int32))

        self.method = method
        factor = (_schur_factor_inv_jit if method == "inv"
                  else _schur_factor_jit)
        self.factors = factor(
            self.Nii64.astype(dtype), self.Nij64.astype(dtype),
            self.Njj64.astype(dtype), self.jmap, self.jmask32,
            self.nj_total)

    def step(self, x_dev):
        return _gn_step_jit(
            x_dev, *self.factors, self.Nii64, self.Nij64, self.Njj64,
            self.pi, self.pj, self.obs, self.weight,
            self.bi1, self.bi2, self.bj1, self.bj2,
            self.inner_stn, self.junc_stn,
            self.jmap, self.jmask32, self.jmask64, self.imask64,
            self.owner64,
            self.nj_total, self.refine, self.B, self.ni, self.nj,
            self.method)

    def run(self, x0, max_iterations: int = 10, threshold: float = 0.0005):
        """Gauss-Newton to convergence.  Returns (x, iterations, max_corr,
        history)."""
        x = jnp.asarray(np.asarray(x0, dtype=np.float64))
        history = []
        max_corr = np.inf
        for it in range(1, max_iterations + 1):
            x, mc = self.step(x)
            max_corr = float(mc)                     # one scalar sync
            history.append(max_corr)
            if max_corr <= threshold:
                return np.asarray(x), it, max_corr, history
        return np.asarray(x), max_iterations, max_corr, history


def adjust_blocked_device(bn: BlockedNetwork, x0, free_sd: float = 10.0,
                          max_iterations: int = 10,
                          threshold: float = 0.0005,
                          dtype=np.float32, refine: int = 2):
    """Device-resident counterpart of adjust_blocked (GPS networks)."""
    plan = build_plan(bn, 1.0 / (free_sd * free_sd))
    adj = DeviceAdjustment(plan, dtype=dtype, refine=refine)
    return adj.run(x0, max_iterations, threshold)
