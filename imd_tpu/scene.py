"""Scene: the atom state pytree, stored as fixed-capacity per-cell SoA arrays.

The reference stores atoms in dynamically sized per-cell SoA blocks
(`cell` struct, types.h:188-349, realloc'd by alloc_cell).  On TPU every
shape must be static, so a Scene holds padded arrays

    pos, mom, force : [gx, gy, gz, cap, 3]
    epot, mass      : [gx, gy, gz, cap]
    type, vtype, id : [gx, gy, gz, cap]  (int32; type == -1 marks empty slots)

over the linked-cell grid (gx, gy, gz) with per-cell capacity ``cap``.
Neighbor-cell access is a lattice `jnp.roll` (plus a static PBC box shift),
which shards cleanly (roll along a sharded axis lowers to a ppermute halo) —
this replaces both the reference's cell-pair lists and its MPI halo exchange.

Atoms are (re)binned by sorting on cell id (the static-shape equivalent of
`fix_cells`, imd_fix_cells_3d.c:43); overflowing a cell's capacity is
detected and reported, mirroring the reference's "cell too full" errors.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imd_tpu.ops.geometry import Box, CellGrid


class Scene(struct.PyTreeNode):
    # per-atom state, cell-major [gx, gy, gz, cap, ...]
    pos: jnp.ndarray         # [gx, gy, gz, cap, 3] cartesian, wrapped into box
    mom: jnp.ndarray         # [gx, gy, gz, cap, 3] momentum (amu A / time unit)
    force: jnp.ndarray       # [gx, gy, gz, cap, 3]
    epot: jnp.ndarray        # [gx, gy, gz, cap] per-atom potential energy
    mass: jnp.ndarray        # [gx, gy, gz, cap]
    type: jnp.ndarray        # [gx, gy, gz, cap] int32 real type, -1 = empty
    vtype: jnp.ndarray       # [gx, gy, gz, cap] int32 virtual type
    id: jnp.ndarray          # [gx, gy, gz, cap] int32 atom number
    # bookkeeping
    nbl_ref_pos: jnp.ndarray  # positions at last rebin (skin check, forces_nbl:1062)
    overflow: jnp.ndarray     # int32 scalar: atoms dropped by capacity overflow
    # geometry: a pytree whose box matrix is traced but whose dims/capacity
    # are static aux data (CellGrid fields with pytree_node=False)
    grid: CellGrid

    # ------------------------------------------------------------------
    @property
    def mask(self) -> jnp.ndarray:
        """Boolean [gx, gy, gz, cap] — True where a real atom lives."""
        return self.type >= 0

    @property
    def capacity(self) -> int:
        return self.pos.shape[3]

    def n_atoms(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))

    def fmask(self, dtype=None) -> jnp.ndarray:
        return self.mask.astype(dtype or self.pos.dtype)

    # ------------------------------------------------------------------
    def flatten_atoms(self):
        """Return flat [M, ...] views (M = n_cells * cap) plus the mask."""
        cap = self.capacity
        M = int(np.prod(self.pos.shape[:3])) * cap
        return {
            "pos": self.pos.reshape(M, 3),
            "mom": self.mom.reshape(M, 3),
            "force": self.force.reshape(M, 3),
            "epot": self.epot.reshape(M),
            "mass": self.mass.reshape(M),
            "type": self.type.reshape(M),
            "vtype": self.vtype.reshape(M),
            "id": self.id.reshape(M),
            "mask": self.mask.reshape(M),
        }


def _bin_flat(grid: CellGrid, pos, arrays, cap, dtype):
    """Scatter flat per-atom arrays into the padded cell layout.

    ``pos`` [N,3]; arrays is a dict of [N,...] arrays that must include
    'mask'.  Returns cell-shaped dict plus overflow count.  Dead atoms and
    overflow atoms are dropped (scatter mode='drop').
    """
    gx, gy, gz = grid.dims
    n_cells = gx * gy * gz
    N = pos.shape[0]
    mask = arrays["mask"]

    wrapped = grid.box.wrap(pos)
    cidx = grid.cell_index(wrapped)                       # [N] flat cell id
    cidx = jnp.where(mask, cidx, n_cells)                 # dead atoms sort last
    order = jnp.argsort(cidx)
    cidx_s = cidx[order]
    # rank within each run of equal cell ids
    ar = jnp.arange(N, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool),
                                cidx_s[1:] != cidx_s[:-1]])
    run_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(is_start, ar, 0))
    rank = ar - run_start
    alive_s = cidx_s < n_cells
    over = alive_s & (rank >= cap)
    # drop sentinel must be out of bounds PAST the end: .at[] mode="drop"
    # wraps negative indices like normal indexing instead of dropping them,
    # which parked every dead/overflow atom in the last cell's last slot
    target = jnp.where(alive_s & (rank < cap), cidx_s * cap + rank,
                       n_cells * cap)

    out = {}
    for name, a in arrays.items():
        if name == "mask":
            continue
        a_s = a[order]
        fill_shape = (n_cells * cap,) + a.shape[1:]
        if jnp.issubdtype(a.dtype, jnp.integer):
            fill = jnp.full(fill_shape, -1, a.dtype)
        else:
            fill = jnp.zeros(fill_shape, a.dtype)
        binned = fill.at[target].set(a_s, mode="drop")
        out[name] = binned.reshape((gx, gy, gz, cap) + a.shape[1:])
    wrapped_s = wrapped[order]
    pos_binned = jnp.zeros((n_cells * cap, 3), dtype).at[target].set(
        wrapped_s, mode="drop")
    out["pos"] = pos_binned.reshape(gx, gy, gz, cap, 3)
    overflow = jnp.sum(over.astype(jnp.int32))
    return out, overflow


def _bin_flat_host(grid: CellGrid, pos, arrays, cap, dtype):
    """NumPy twin of _bin_flat for setup time.

    make_scene runs once per phase on host inputs; doing the wrap/sort/
    scatter in NumPy keeps setup at one bulk host->device transfer
    instead of ~50 dispatched device ops (which crawl over the remote
    TPU tunnel at 1M atoms and dominated bench start-up).
    """
    from imd_tpu.ops.geometry import host_bin_ijk

    gx, gy, gz = grid.dims
    n_cells = gx * gy * gz
    np_dtype = np.dtype(jnp.zeros((), dtype).dtype.name)
    pos = np.asarray(pos, np.float64)
    mask = np.asarray(arrays["mask"], bool)
    h = np.asarray(grid.box.h, np.float64)
    inv_h = np.asarray(grid.box.inv_h, np.float64)
    period = np.asarray(grid.box.pbc, np.float64)
    frac = pos @ inv_h
    frac = frac - np.floor(frac) * period
    wrapped = (frac @ h).astype(np_dtype)
    # bin from the ROUNDED positions so binning matches what the
    # on-device skin-check/rebin will see (shared with measured_capacity)
    ijk = host_bin_ijk(grid, pos, np_dtype)
    cidx = (ijk[:, 0] * gy + ijk[:, 1]) * gz + ijk[:, 2]
    cidx = np.where(mask, cidx, n_cells)
    order = np.argsort(cidx, kind="stable")
    cidx_s = cidx[order]
    # rank within each run of equal cell ids
    counts = np.bincount(cidx_s, minlength=n_cells + 1)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(len(cidx_s)) - starts[cidx_s]
    alive_s = cidx_s < n_cells
    keep = alive_s & (rank < cap)
    target = (cidx_s * cap + rank)[keep]
    overflow = int(np.sum(alive_s & (rank >= cap)))

    out = {}
    for name, a in arrays.items():
        if name == "mask":
            continue
        a = np.asarray(a)
        a_s = a[order][keep]
        fill_shape = (n_cells * cap,) + a.shape[1:]
        if np.issubdtype(a.dtype, np.integer):
            binned = np.full(fill_shape, -1, np.int32)
        else:
            binned = np.zeros(fill_shape, np_dtype)
        binned[target] = a_s
        out[name] = jnp.asarray(
            binned.reshape((gx, gy, gz, cap) + a.shape[1:]))
    pos_binned = np.zeros((n_cells * cap, 3), np_dtype)
    pos_binned[target] = wrapped[order][keep]
    out["pos"] = jnp.asarray(pos_binned.reshape(gx, gy, gz, cap, 3))
    return out, overflow


def make_scene(grid: CellGrid, pos, *, mom=None, mass=None, type=None,
               vtype=None, id=None, epot=None, mask=None,
               dtype=jnp.float32) -> Scene:
    """Build a Scene from flat per-atom arrays (host-side entry point)."""
    pos = jnp.asarray(pos, dtype)
    N = pos.shape[0]
    mom = jnp.zeros((N, 3), dtype) if mom is None else jnp.asarray(mom, dtype)
    mass = jnp.ones((N,), dtype) if mass is None else jnp.asarray(mass, dtype)
    type_ = jnp.zeros((N,), jnp.int32) if type is None else jnp.asarray(type, jnp.int32)
    vtype = type_ if vtype is None else jnp.asarray(vtype, jnp.int32)
    id_ = jnp.arange(N, dtype=jnp.int32) if id is None else jnp.asarray(id, jnp.int32)
    epot = jnp.zeros((N,), dtype) if epot is None else jnp.asarray(epot, dtype)
    mask = jnp.ones((N,), bool) if mask is None else jnp.asarray(mask, bool)
    type_ = jnp.where(mask, type_, -1)

    cap = grid.capacity
    arrays = {"mask": mask, "mom": mom, "mass": mass, "type": type_,
              "vtype": vtype, "id": id_, "epot": epot}
    concrete = not any(isinstance(a, jax.core.Tracer)
                       for a in (pos, grid.box.h, *arrays.values()))
    bin_fn = _bin_flat_host if concrete else _bin_flat
    out, overflow = bin_fn(grid, pos, arrays, cap, dtype)
    return Scene(
        pos=out["pos"], mom=out["mom"],
        force=jnp.zeros_like(out["pos"]),
        epot=out["epot"], mass=out["mass"], type=out["type"],
        vtype=out["vtype"], id=out["id"],
        nbl_ref_pos=out["pos"], overflow=jnp.asarray(overflow, jnp.int32),
        grid=grid,
    )


def rebin(scene: Scene, grid: Optional[CellGrid] = None) -> Scene:
    """Re-sort all atoms into their current cells (fix_cells equivalent).

    jit-safe: static shapes throughout.  Also resets the skin-check
    reference positions.  ``grid`` overrides the scene's grid (same
    dims/capacity, possibly moved xbounds slab planes) — the load
    balancer's lb_relocateParticles analog.
    """
    scene, _ = rebin_with(scene, None, grid)
    return scene


def rebin_with(scene: Scene, extra, grid: Optional[CellGrid] = None):
    """`rebin` that also re-bins extra per-atom-slot arrays alongside.

    ``extra``: dict of cell-shaped [gx,gy,gz,cap,...] arrays that travel
    with their atoms through the re-sort (dead/dropped slots: -1 for int
    fields, 0 for floats).  The reference moves per-atom side data the
    same way — e.g. the TTM's stored FD cell index fdi/fdj/fdk
    (types.h:327-330) rides move_atom in fix_cells — so state like the
    advection-flux history survives migrations instead of being
    invalidated.  Returns (scene', extra')."""
    grid = scene.grid if grid is None else grid
    flat = scene.flatten_atoms()
    arrays = {"mask": flat["mask"], "mom": flat["mom"], "mass": flat["mass"],
              "type": flat["type"], "vtype": flat["vtype"], "id": flat["id"],
              "epot": flat["epot"]}
    if extra:
        for name, a in extra.items():
            assert name not in arrays
            arrays[name] = a.reshape((-1,) + a.shape[4:])
    out, overflow = _bin_flat(grid, flat["pos"], arrays,
                              scene.capacity, scene.pos.dtype)
    extra_out = None
    if extra:
        extra_out = {name: out[name] for name in extra}
    scene = scene.replace(
        pos=out["pos"], mom=out["mom"], force=jnp.zeros_like(out["pos"]),
        epot=out["epot"], mass=out["mass"], type=out["type"],
        vtype=out["vtype"], id=out["id"], nbl_ref_pos=out["pos"],
        overflow=(scene.overflow + overflow).astype(jnp.int32),
        grid=grid,
    )
    return scene, extra_out


def grow_capacity(scene: Scene, new_cap: int) -> Scene:
    """Return the same Scene with the per-cell capacity axis padded to
    ``new_cap`` (dead slots: -1 for int fields, 0 for float fields).

    The TPU analog of the reference's realloc-style cell growth
    (alloc_cell, imd_alloc.c:551): when a rebin overflows the static
    capacity, the host driver grows the slot axis and retries the block
    from the last known-good state.  Existing slot assignments stay
    valid, so no re-binning is needed — only downstream kernels must be
    re-specialized for the new capacity.
    """
    cap = scene.capacity
    if new_cap <= cap:
        return scene
    extra = new_cap - cap

    def pad(a):
        widths = [(0, 0)] * a.ndim
        widths[3] = (0, extra)
        fill = -1 if jnp.issubdtype(a.dtype, jnp.integer) else 0
        return jnp.pad(a, widths, constant_values=fill)

    return scene.replace(
        pos=pad(scene.pos), mom=pad(scene.mom), force=pad(scene.force),
        epot=pad(scene.epot), mass=pad(scene.mass), type=pad(scene.type),
        vtype=pad(scene.vtype), id=pad(scene.id),
        nbl_ref_pos=pad(scene.nbl_ref_pos),
        grid=scene.grid.replace(capacity=new_cap),
    )


def max_displacement2(scene: Scene) -> jnp.ndarray:
    """Max squared displacement since last rebin (check_nblist, forces_nbl:1062)."""
    d = scene.pos - scene.nbl_ref_pos
    # wrap displacement differences for atoms that crossed the boundary
    d = scene.grid.box.min_image(d)
    d2 = jnp.sum(d * d, axis=-1)
    return jnp.max(jnp.where(scene.mask, d2, 0.0))


def needs_rebin(scene: Scene, margin: float) -> jnp.ndarray:
    """True when an atom moved more than half the skin (forces_nbl:1062)."""
    return max_displacement2(scene) > (0.5 * margin) ** 2
