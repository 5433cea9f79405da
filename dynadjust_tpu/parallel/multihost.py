"""Multi-host (multi-process) distribution of the blocked adjustment.

The reference scales past one machine only by staging blocks to disk on a
single host (dnaadjust-stage.cpp:59, dnafile_mapping.hpp:48) — there is
no distributed mode at all.  The TPU-native design instead runs the same
batched two-level Schur elimination SPMD over a *global* device mesh that
spans processes (hosts): each host holds the blocks of its mesh shard,
the junction reduction rides a psum whose intra-host stage uses ICI and
whose inter-host stage crosses DCN, and the reduced junction solve is
replicated everywhere.

Processes are wired together with ``jax.distributed`` (one coordinator,
N processes x M local devices).  On a real TPU pod slice
``init_distributed()`` with no arguments picks everything up from the
TPU environment; for CI and CPU validation the coordinator address /
process count / process id are passed explicitly and the CPU gloo
collectives backend is selected (see scripts/multihost_dryrun.py and
tests/test_multihost.py).

Data ingest is process-local: every process contributes only the block
slices its own devices own (``jax.make_array_from_process_local_data``),
so a national network's normal equations never need to exist on one
host.  Results come back host-replicated (the solve replicates xj by
construction; xi is all-gathered by XLA on the output sharding).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .schur import BlockSystem, _schur_solve_jit

__all__ = [
    "init_distributed", "is_multiprocess", "global_block_mesh",
    "hierarchical_block_mesh", "shard_blocks", "gather_to_host",
    "schur_solve_multihost",
]


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     cpu_devices_per_process: int | None = None) -> bool:
    """Initialise ``jax.distributed`` for a multi-process run.

    With no arguments, reads ``DTA_COORDINATOR`` / ``DTA_NUM_PROCESSES``
    / ``DTA_PROCESS_ID`` from the environment; on a TPU pod slice where
    none are set, falls through to ``jax.distributed.initialize()``'s
    own auto-detection.  Returns True if a multi-process runtime was
    initialised, False for the (default) single-process case.

    ``cpu_devices_per_process`` selects the CPU backend with that many
    virtual devices per process and gloo cross-process collectives —
    the validation path used by tests and the multihost dryrun.
    """
    coordinator = coordinator or os.environ.get("DTA_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("DTA_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("DTA_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if cpu_devices_per_process:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count="
            f"{cpu_devices_per_process}").strip()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    if coordinator is None and num_processes is None:
        # TPU pod auto-detection only; plain single-process otherwise
        if os.environ.get("TPU_WORKER_HOSTNAMES") and \
                os.environ.get("DTA_DISTRIBUTED") == "1":
            jax.distributed.initialize()
            return jax.process_count() > 1
        return False

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_block_mesh(axis: str = "blocks") -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.array(jax.devices()), (axis,))


def hierarchical_block_mesh(host_axis: str = "hosts",
                            local_axis: str = "blocks") -> Mesh:
    """2-D (hosts, local-devices) mesh.

    Sharding the block batch over BOTH axes (hosts-major) keeps each
    host's blocks on its own devices; a junction psum over
    ``(local_axis, host_axis)`` then reduces intra-host over ICI first
    and crosses DCN once with the already-reduced partials — the
    hierarchical reduction the scaling playbook prescribes (and the
    TPU-native analogue of the reference's single-host staging).
    """
    devs = jax.devices()
    nproc = jax.process_count()
    per = len(devs) // nproc
    grid = np.empty((nproc, per), dtype=object)
    for d in devs:
        # devices enumerate local-major within each process
        k = [x.id for x in devs if x.process_index == d.process_index]
        grid[d.process_index, k.index(d.id)] = d
    return Mesh(grid, (host_axis, local_axis))


def _block_specs(mesh: Mesh):
    """PartitionSpec + psum axis spec for the mesh's block dimension."""
    names = mesh.axis_names
    if len(names) == 1:
        return P(names[0]), names[0]
    # hosts-major hierarchical layout: batch dim split over (hosts, local)
    return P(names), tuple(reversed(names))   # psum local first, then DCN


def shard_blocks(full: np.ndarray, mesh: Mesh,
                 spec: P | None = None) -> jax.Array:
    """Build a global block-sharded array from this process's slice of
    ``full`` (leading dim = padded block batch).  Single-process meshes
    take the fast path (``jax.device_put``)."""
    if spec is None:
        spec, _ = _block_specs(mesh)
    sh = NamedSharding(mesh, spec)
    if not is_multiprocess():
        return jax.device_put(full, sh)
    idx_map = sh.devices_indices_map(full.shape)
    rows = sorted({idx_map[d][0] for d in jax.local_devices()},
                  key=lambda s: s.start)
    local = np.concatenate([full[s] for s in rows], axis=0)
    return jax.make_array_from_process_local_data(sh, local)


def put_replicated(x, mesh: Mesh) -> jax.Array:
    """Place a host array fully replicated on a (possibly multi-process)
    mesh."""
    sh = NamedSharding(mesh, P())
    x = np.asarray(x)
    if not is_multiprocess():
        return jax.device_put(x, sh)
    return jax.make_array_from_process_local_data(sh, x)


def gather_to_host(arr: jax.Array, mesh: Mesh) -> np.ndarray:
    """Replicate a (possibly sharded) global array to every host."""
    out = jax.jit(lambda x: x,
                  out_shardings=NamedSharding(mesh, P()))(arr)
    return np.asarray(jax.device_get(out))


def schur_solve_multihost(bs: BlockSystem, mesh: Mesh | None = None,
                          scale: bool = True):
    """The mesh-sharded two-level Schur solve, multi-process capable.

    Semantics match ``schur_solve_sharded`` (every process passes the
    same logical BlockSystem, deterministically assembled or restored
    from its own ingest); only the local shard of the padded block batch
    is uploaded by each process.  Returns host-replicated
    ``(xi (B, ni), xj (nj_global,))`` on every process.
    """
    mesh = mesh or global_block_mesh()
    spec, psum_axes = _block_specs(mesh)
    ndev = int(np.prod(list(mesh.shape.values())))
    B = bs.Nii.shape[0]
    Bp = ((B + ndev - 1) // ndev) * ndev
    nj_total = bs.nj_global + 1

    def pad(x):
        if x.shape[0] == Bp:
            return x
        return np.pad(x, [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1))

    Nii = pad(bs.Nii).copy()
    for b in range(B, Bp):
        Nii[b] = np.eye(Nii.shape[1], dtype=Nii.dtype)
    parts = [Nii, pad(bs.Nij), pad(bs.Njj), pad(bs.bi), pad(bs.bj),
             pad(bs.jmap), pad(bs.jmask)]
    # padded junction slots must stay on the scratch row of the global
    # junction system
    parts[5] = np.where(parts[6] > 0, parts[5], bs.nj_global)

    garrs = [shard_blocks(p, mesh, spec) for p in parts]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=tuple([spec] * 7), out_specs=(spec, P()))
    def solve(Nii, Nij, Njj, bi, bj, jmap, jmask):
        return _schur_solve_jit(Nii, Nij, Njj, bi, bj, jmap, jmask,
                                nj_total, scale, psum_axes)

    xi, xj = jax.jit(solve)(*garrs)
    xi = gather_to_host(xi, mesh)[:B]
    xj = gather_to_host(xj, mesh)[:bs.nj_global]
    return xi, xj
