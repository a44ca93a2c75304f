"""FILTER: deletion of ablated/evaporated atoms outside a keep-region.

Rebuild of imd_filter.c: atoms beyond the filter boundaries
(filter_min_x / filter_min_y / filter_max_y..., filter_init:36-72) are
deletion candidates; a candidate survives only if it is still *connected*
to the bulk through a chain of neighbors (the reference walks the
neighbor chain with an explicit stack up to NEIGHDEPTH,
filter_check_neighs:214-320, accumulating a KEEPME flag over pair lists
with its own halo reduction, add_filter/pack_filter/unpack_filter).

TPU re-design: connectivity is a flood fill, and a flood fill is a
fixed-point of "keep |= any neighbor keeps" - here run as ``n_sweeps``
masked OR-stencil iterations over the cell grid (each sweep propagates
the keep flag one bond deeper; ablated vapor is typically isolated, so a
handful of sweeps suffices - the analog of NEIGHDEPTH).  Deletion is
mask-out (type = -1); the next rebin compacts the arrays, which is the
static-shape analog of the reference deleting atoms inside fix_cells
(imd_fix_cells_3d.c:90-120).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from imd_tpu.ops.forces import ALL_OFFSETS, _neighbor_view, _wrap_shift_and_mask
from imd_tpu.scene import Scene


def _neighbor_or(scene: Scene, flag: jnp.ndarray, r2_cut) -> jnp.ndarray:
    """Per-slot bool: any *other* atom within sqrt(r2_cut) has ``flag``."""
    dtype = scene.pos.dtype
    pos = scene.pos
    acc = jnp.zeros(scene.type.shape, bool)
    for off in ALL_OFFSETS:
        pos_n = _neighbor_view(scene.grid, pos, off)
        flag_n = _neighbor_view(scene.grid, flag, off)
        mask_n = _neighbor_view(scene.grid, scene.mask, off)
        shift, valid = _wrap_shift_and_mask(scene.grid, off, dtype)
        d = pos[..., :, None, :] - (pos_n + shift)[..., None, :, :]
        d2 = jnp.sum(d * d, -1)                      # [...,cap,capn]
        ok = (d2 <= r2_cut) & (d2 > 1e-9)
        ok &= (flag_n & mask_n & valid)[..., None, :]
        acc |= jnp.any(ok, axis=-1)
    return acc & scene.mask


def filter_atoms(scene: Scene, bounds, r_cut: float,
                 n_sweeps: int = 8) -> Tuple[Scene, jnp.ndarray]:
    """Delete disconnected atoms outside the keep-region.

    ``bounds``: object with min_x/max_x/min_y/max_y/min_z/max_z (infinite
    = inactive).  ``r_cut``: neighbor (bond) cutoff.  Returns
    (scene, n_deleted).
    """
    x, y, z = scene.pos[..., 0], scene.pos[..., 1], scene.pos[..., 2]
    cand = jnp.zeros(scene.type.shape, bool)
    for lo, hi, c in ((bounds.min_x, bounds.max_x, x),
                      (bounds.min_y, bounds.max_y, y),
                      (bounds.min_z, bounds.max_z, z)):
        if lo is not None and math.isfinite(lo):
            cand |= c < lo
        if hi is not None and math.isfinite(hi):
            cand |= c > hi
    cand &= scene.mask
    keep = scene.mask & ~cand
    r2 = jnp.asarray(r_cut * r_cut, scene.pos.dtype)

    def body(i, k):
        return k | (cand & _neighbor_or(scene, k, r2))

    keep = jax.lax.fori_loop(0, n_sweeps, body, keep)
    delete = cand & ~keep
    n_del = jnp.sum(delete.astype(jnp.int32))
    return scene.replace(type=jnp.where(delete, -1, scene.type)), n_del
