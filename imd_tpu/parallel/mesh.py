"""Device-mesh sharding: the MPI domain decomposition, TPU-style.

The reference decomposes space over a 3-D MPI Cartesian topology with
buffer-cell halos and hand-written pack/send/unpack (imd_geom_mpi_3d.c:32,
imd_comm_force_3d.c).  Here the cell grid's leading axes are sharded over a
`jax.sharding.Mesh` and the force sweep's lattice `jnp.roll`s lower to XLA
collective-permutes over ICI — the Plimpton halo exchange is synthesized by
the SPMD partitioner instead of hand-coded.  Atom migration (`fix_cells`) is
the same sort-based rebin; its all-to-all falls out of resharding the sorted
scatter.

Use `scene_shardings(mesh, scene)` to get a matching pytree of
NamedShardings (cells' x/y/z axes mapped to mesh axes), `shard_scene` to
place a Scene, and wrap your step in `jax.jit(..., in_shardings=...,
out_shardings=...)` or rely on sharding propagation from the placed inputs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imd_tpu.scene import Scene


def make_mesh(shape: Tuple[int, ...] = None, axis_names=("x", "y", "z"),
              devices=None) -> Mesh:
    """Mesh over the cell-grid axes; default all devices along x (matching
    the TTM grid's 1-D x decomposition, imd_ttm.c:963)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1, 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, "
                         f"have {len(devices)}")
    return Mesh(devices[:n].reshape(shape), axis_names=axis_names)


def spec_for(arr_ndim: int, mesh: Mesh) -> P:
    """PartitionSpec sharding the leading (up to) 3 cell axes on the mesh."""
    names = []
    for ax, name in enumerate(mesh.axis_names[:3]):
        if ax < arr_ndim and mesh.shape[name] > 1:
            names.append(name)
        else:
            names.append(None)
    names = names[:min(3, arr_ndim)]
    pad = [None] * (arr_ndim - len(names))
    return P(*(names + pad))


def scene_shardings(mesh: Mesh, scene: Scene):
    """Pytree of NamedShardings matching `scene` (cell axes sharded)."""
    def shard_leaf(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 3:
            return NamedSharding(mesh, spec_for(leaf.ndim, mesh))
        return NamedSharding(mesh, P())
    return jax.tree.map(shard_leaf, scene)


def shard_scene(mesh: Mesh, scene: Scene) -> Scene:
    """Place a Scene onto the mesh with cell-block shardings."""
    sh = scene_shardings(mesh, scene)
    return jax.tree.map(jax.device_put, scene, sh)


def check_grid_divisible(grid_dims: Tuple[int, int, int], mesh: Mesh):
    for ax, name in enumerate(mesh.axis_names[:3]):
        n = mesh.shape[name]
        if grid_dims[ax] % n:
            raise ValueError(
                f"cell grid dim {ax} ({grid_dims[ax]}) not divisible by "
                f"mesh axis '{name}' ({n}); choose grid dims_multiple")


def ttm_shardings(mesh: Mesh, ttm_grid):
    """NamedShardings for a models.ttm.TTMGrid: the FD x axis rides the
    mesh's x axis (P8 in SURVEY §2.4: the reference splits the FD grid
    evenly by rank along x, imd_ttm.c:963-977; ghost exchanges and the
    Allgather-of-columns become XLA halo permutes / psums under jit)."""
    def shard_leaf(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and \
                mesh.shape[mesh.axis_names[0]] > 1 and \
                leaf.shape[0] % mesh.shape[mesh.axis_names[0]] == 0 and \
                leaf.shape[0] > 1:
            return NamedSharding(
                mesh, P(mesh.axis_names[0], *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())
    return jax.tree.map(shard_leaf, ttm_grid)


def shard_ttm(mesh: Mesh, ttm_grid):
    """Place a TTMGrid onto the mesh, FD columns block-sharded along x."""
    sh = ttm_shardings(mesh, ttm_grid)
    return jax.tree.map(jax.device_put, ttm_grid, sh)


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None,
                   local_device_ids=None) -> int:
    """Join a multi-host SPMD job (the mpirun/MPI_Init analog,
    imd_mpi_util.c:48).

    Each host process calls this once before any other jax use; after
    it, ``jax.devices()`` is the GLOBAL device list spanning all hosts
    and ``make_mesh`` builds a global mesh whose collectives ride ICI
    within a slice and DCN across slices — no application-level wire
    protocol (the msgbuf layer this replaces: imd_mpi_util.c:850-1065).

    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID) or,
    on Cloud TPU pods, to automatic detection.  Returns this host's
    process index.  Safe to call in single-process runs (no-op when no
    coordinator is configured).
    """
    import os
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator is None and num_processes is None:
        return 0  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_processes,
        process_id=process_id, local_device_ids=local_device_ids)
    return jax.process_index()


def process_local_slab(grid_dims: Tuple[int, int, int],
                       mesh: Mesh) -> Tuple[int, int]:
    """This process's x-slab [lo, hi) of the global cell grid, for
    host-side I/O that writes only locally-addressable shards (the
    rank-local read/write split, imd_io_3d.c:100-690)."""
    nx = grid_dims[0]
    px = int(mesh.shape[mesh.axis_names[0]])
    per = nx // px
    # which mesh x-row contains one of our local devices?
    local = set(d.id for d in jax.local_devices())
    arr = np.asarray(mesh.devices)
    for i in range(px):
        row = arr[i].reshape(-1)
        if any(d.id in local for d in row):
            return i * per, (i + 1) * per
    return 0, nx
