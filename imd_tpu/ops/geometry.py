"""Box geometry and the linked-cell grid.

Mirrors the behavior of the reference's make_box/init_cells
(imd_geom_3d.c:52/118): a general (triclinic) simulation box given by three
box vectors, with the linked-cell grid laid out in fractional coordinates.
The number of cells per direction is chosen so that the perpendicular height
of one cell is at least sqrt(cellsz) = cutoff + skin, guaranteeing that all
interacting pairs live in adjacent cells (27-stencil).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class Box(struct.PyTreeNode):
    """Simulation box: rows of ``h`` are the box vectors (IMD box_x/y/z)."""
    h: jnp.ndarray        # [3,3] box matrix, rows = box vectors
    inv_h: jnp.ndarray    # [3,3] inverse (fractional = pos @ inv_h)
    pbc: Tuple[int, int, int] = struct.field(pytree_node=False, default=(1, 1, 1))

    @classmethod
    def create(cls, box_x, box_y, box_z, pbc=(1, 1, 1), dtype=jnp.float32) -> "Box":
        h = np.asarray([box_x, box_y, box_z], np.float64)
        if abs(np.linalg.det(h)) < 1e-12:
            raise ValueError("box has zero volume")
        inv_h = np.linalg.inv(h)
        return cls(h=jnp.asarray(h, dtype), inv_h=jnp.asarray(inv_h, dtype),
                   pbc=tuple(int(p) for p in pbc))

    @classmethod
    def cubic(cls, L: float, pbc=(1, 1, 1), dtype=jnp.float32) -> "Box":
        return cls.create([L, 0, 0], [0, L, 0], [0, 0, L], pbc, dtype)

    @property
    def volume(self) -> jnp.ndarray:
        return jnp.abs(jnp.linalg.det(self.h))

    def heights(self) -> np.ndarray:
        """Perpendicular heights of the box along each direction (host)."""
        h = np.asarray(self.h, np.float64)
        v = abs(np.linalg.det(h))
        out = np.empty(3)
        for i in range(3):
            a, b = h[(i + 1) % 3], h[(i + 2) % 3]
            out[i] = v / np.linalg.norm(np.cross(a, b))
        return out

    def to_frac(self, pos):
        # HIGHEST precision: TPU f32 matmuls default to reduced (bf16-ish)
        # MXU precision, which injected ~0.5 A noise into wrapped
        # positions and scrambled the cell binning on every rebin
        return jnp.matmul(pos, self.inv_h,
                          precision=jax.lax.Precision.HIGHEST)

    def to_cart(self, frac):
        return jnp.matmul(frac, self.h,
                          precision=jax.lax.Precision.HIGHEST)

    def wrap(self, pos):
        """Wrap positions into the box along periodic directions."""
        frac = self.to_frac(pos)
        period = jnp.asarray(self.pbc, frac.dtype)
        wrapped = frac - jnp.floor(frac) * period
        return self.to_cart(wrapped)

    def min_image(self, dr):
        """Minimum-image convention for displacement vectors."""
        frac = self.to_frac(dr)
        period = jnp.asarray(self.pbc, frac.dtype)
        frac = frac - jnp.round(frac) * period
        return self.to_cart(frac)


class CellGrid(struct.PyTreeNode):
    """Static linked-cell grid metadata.

    dims/capacity are static (hashable) so jitted code specializes on them;
    the box matrix is a traced leaf so NPT box changes don't retrigger
    compilation.
    """
    box: Box
    dims: Tuple[int, int, int] = struct.field(pytree_node=False)
    capacity: int = struct.field(pytree_node=False)
    cutoff: float = struct.field(pytree_node=False)   # interaction cutoff (A)
    skin: float = struct.field(pytree_node=False)     # nbl_margin (A)
    # optional non-uniform x-partition: [gx+1] fractional slab boundaries
    # (0 .. 1).  A traced LEAF, so the load balancer can move the slab
    # planes every lb_frequency steps without recompiling — the TPU-native
    # balanceOrtho (imd_loadBalance.c:1283).  Every slab must stay at
    # least (cutoff+skin)/Lx wide so the 27-stencil still covers all pairs.
    xbounds: Optional[jnp.ndarray] = None

    @property
    def n_cells(self) -> int:
        return self.dims[0] * self.dims[1] * self.dims[2]

    def _ijk_from_frac(self, frac):
        gx, gy, gz = self.dims
        dims = jnp.asarray(self.dims, frac.dtype)
        ijk = jnp.floor(frac * dims).astype(jnp.int32)
        ijk = jnp.clip(ijk, 0, jnp.asarray(self.dims, jnp.int32) - 1)
        if self.xbounds is not None:
            ix = jnp.searchsorted(self.xbounds.astype(frac.dtype),
                                  frac[..., 0], side="right") - 1
            ix = jnp.clip(ix.astype(jnp.int32), 0, gx - 1)
            ijk = jnp.concatenate([ix[..., None], ijk[..., 1:]], axis=-1)
        return ijk

    def cell_edge_min(self) -> float:
        """Smallest perpendicular cell extent (host scalar): the reach a
        27-stencil sweep covers.  Uniform-partition value (the LB slab
        constraint keeps xbounds slabs at least this wide too)."""
        h = self.box.heights()
        return float(min(h[ax] / self.dims[ax] for ax in range(3)))

    def cell_index(self, pos):
        """Flat cell id for (wrapped) cartesian positions [N,3] -> [N]."""
        gy, gz = self.dims[1], self.dims[2]
        ijk = self._ijk_from_frac(self.box.to_frac(pos))
        return (ijk[..., 0] * gy + ijk[..., 1]) * gz + ijk[..., 2]

    def cell_ijk(self, pos):
        return self._ijk_from_frac(self.box.to_frac(pos))


def choose_grid(box: Box, cutoff: float, skin: float = 0.0,
                capacity: int = 0, n_atoms: int = 0,
                min_dims: Tuple[int, int, int] = (1, 1, 1),
                dims_multiple: Tuple[int, int, int] = (1, 1, 1),
                max_dims: Tuple[int, int, int] = (0, 0, 0),
                headroom: float = 1.6) -> CellGrid:
    """Pick cell-grid dims and capacity (init_cells, imd_geom_3d.c:118).

    Cells must have perpendicular height >= cutoff + skin.  ``capacity`` 0
    lets us size from the mean density with ``headroom`` slack.
    ``dims_multiple`` forces divisibility (for even sharding over a mesh).
    """
    reach = cutoff + skin
    heights = box.heights()
    dims = []
    for d in range(3):
        n = max(1, int(math.floor(heights[d] / reach)))
        if max_dims[d] > 0:
            # coarser-than-cutoff cells: gives the x load balancer slack
            # to move slab planes (every slab must stay >= reach wide)
            n = min(n, max_dims[d])
        n = max(n, min_dims[d])
        m = dims_multiple[d]
        if n % m:
            n = (n // m) * m  # round down to the sharding multiple
        if n < 1 or (n > 1 and heights[d] / n < reach - 1e-9):
            raise ValueError(
                f"box height {heights[d]:.3f} along axis {d} cannot hold "
                f"a multiple of {m} cells of size >= {reach:.3f}")
        dims.append(n)
    dims = tuple(dims)
    n_cells = dims[0] * dims[1] * dims[2]
    if capacity <= 0:
        if n_atoms <= 0:
            raise ValueError("need n_atoms to size cell capacity")
        mean = n_atoms / n_cells
        capacity = max(4, int(math.ceil(mean * headroom)))
        # round to a multiple of 8 for TPU-friendly layouts
        capacity = ((capacity + 7) // 8) * 8
    return CellGrid(box=box, dims=dims, capacity=int(capacity),
                    cutoff=float(cutoff), skin=float(skin))


def host_bin_ijk(grid: CellGrid, pos, dtype=np.float32) -> np.ndarray:
    """Host-side cell indices [N,3], exactly as a Scene of ``dtype`` will
    bin: round positions to the storage dtype FIRST (make_scene converts
    its input with jnp.asarray(pos, dtype) before any wrap), wrap in f64,
    round the wrapped result, then bin.  Skipping either rounding step
    undercounts cells when lattice planes sit exactly on cell boundaries
    (a one-ulp difference tips whole planes into the neighboring cell —
    e.g. fcc layers at multiples of the 1.5*alat cell edge) and capacity
    sizing then silently drops atoms at make_scene time."""
    np_dtype = np.dtype(jnp.zeros((), dtype).dtype.name) \
        if not isinstance(dtype, np.dtype) else dtype
    p = np.asarray(pos, np_dtype).astype(np.float64)
    h = np.asarray(grid.box.h, np.float64)
    inv_h = np.asarray(grid.box.inv_h, np.float64)
    period = np.asarray(grid.box.pbc, np.float64)
    frac = p @ inv_h
    frac = frac - np.floor(frac) * period
    wrapped = (frac @ h).astype(np_dtype)
    gx, gy, gz = grid.dims
    frac2 = (wrapped.astype(np.float64) @ inv_h) * np.array([gx, gy, gz])
    ijk = np.clip(np.floor(frac2).astype(np.int64), 0,
                  np.array([gx - 1, gy - 1, gz - 1]))
    if grid.xbounds is not None:
        xb = np.asarray(grid.xbounds, np.float64)
        ijk[:, 0] = np.clip(np.searchsorted(xb, frac2[:, 0] / gx,
                                            side="right") - 1, 0, gx - 1)
    return ijk


def measured_capacity(grid: CellGrid, pos, safety: float = 1.25,
                      extra: int = 2, multiple: int = 8,
                      dtype=np.float32) -> int:
    """Capacity from the MEASURED max cell occupancy (host-side, at setup).

    Mean-density sizing wastes padded pairs quadratically; for near-uniform
    solids max occupancy is ~30-60% above the mean, so sizing from the
    actual binning (plus migration headroom) typically shrinks the force
    kernel's cap^2 work by 2x.  Overflow during a run is detected
    (scene.overflow) and handled by re-initializing with a larger cap, the
    equivalent of the reference's nbl_size regrowth (imd_forces_nbl.c:75).
    ``dtype`` must match the Scene storage dtype so the measurement bins
    identically to make_scene.
    """
    gx, gy, gz = grid.dims
    ijk = host_bin_ijk(grid, pos, dtype)
    flat = (ijk[:, 0] * gy + ijk[:, 1]) * gz + ijk[:, 2]
    occ = np.bincount(flat, minlength=gx * gy * gz)
    cap = int(np.ceil(occ.max() * safety)) + extra
    return max(multiple, ((cap + multiple - 1) // multiple) * multiple)


def optimize_grid_dims(box: Box, cutoff: float, skin: float, pos,
                       dtype=np.float32,
                       dims_multiple: Tuple[int, int, int] = (1, 1, 1),
                       shrink: float = 0.80,
                       headroom_slots: int = 1,
                       max_capacity: int = 0):
    """Pick cell dims minimizing the dense-sweep cost cap^2 * n_cells.

    The Pallas engines evaluate every (slot_i, slot_j) pair of every
    stencil cell pair, so their work is n_offsets * capacity^2 * n_cells
    regardless of occupancy.  The classical choice (max cells with edge
    >= cutoff+skin, init_cells imd_geom_3d.c:118) minimizes *candidate
    volume*, which is the right objective for a list-driven kernel
    (imd_forces_nbl.c:452) but not for a padded sweep: fewer, fuller
    cells amortize the sublane-rounded capacity over more real atoms
    (e.g. fcc-Al at 1.5*alat commensurate cells: same cap 16, 24% fewer
    cells).  Search every dims in [shrink*n_max, n_max], score with the
    MEASURED max occupancy (+``headroom_slots`` migration slack, rounded
    to the sublane multiple of 8 / half-sublane 4), return
    (dims, capacity) of the cheapest grid.

    ``max_capacity`` > 0 restricts the search to grids whose measured
    capacity fits (the Pallas engines' VMEM tile cap); when no candidate
    fits, returns None instead of raising — the density re-grid path
    (Simulation._regrid_scene, the reference's re-celling on geometry
    change, imd_geom_3d.c:118-170) falls back to the general engine.
    """
    reach = cutoff + skin
    heights = box.heights()
    n_max = [max(1, int(math.floor(heights[d] / reach))) for d in range(3)]

    def snap(n, d):
        m = dims_multiple[d]
        return (n // m) * m if n % m else n

    best = None
    # scale all axes together by a common candidate edge (cells stay
    # near-cubic, which the stencil reach argument requires per-axis)
    cand = set()
    for d in range(3):
        for n in range(max(1, int(n_max[d] * shrink)), n_max[d] + 1):
            cand.add(heights[d] / n)
    for edge in sorted(cand):
        dims = []
        ok = True
        for d in range(3):
            n = snap(min(n_max[d], int(math.floor(heights[d] / edge + 1e-9))), d)
            if n < 1 or heights[d] / n < reach - 1e-9:
                ok = False
                break
            dims.append(n)
        if not ok:
            continue
        dims = tuple(dims)
        g = CellGrid(box=box, dims=dims, capacity=8,
                     cutoff=float(cutoff), skin=float(skin))
        raw = measured_capacity(g, pos, safety=1.0, extra=0, multiple=1,
                                dtype=dtype)
        need = raw + headroom_slots
        cap8 = ((need + 7) // 8) * 8
        cap4 = ((need + 3) // 4) * 4
        cap = max(8, cap8 if cap8 >= need else cap4)
        if max_capacity > 0 and cap > max_capacity:
            continue
        score = cap * cap * dims[0] * dims[1] * dims[2]
        if best is None or score < best[0]:
            best = (score, dims, cap)
    if best is None:
        if max_capacity > 0:
            return None
        raise ValueError("no feasible cell grid for the given box/cutoff")
    return best[1], best[2]


def with_capacity(grid: CellGrid, capacity: int) -> CellGrid:
    return CellGrid(box=grid.box, dims=grid.dims, capacity=int(capacity),
                    cutoff=grid.cutoff, skin=grid.skin,
                    xbounds=grid.xbounds)
