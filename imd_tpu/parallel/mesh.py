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
