"""Load-balance analog (imd_loadBalance.c / imd_loadBalance_direct.c).

The reference balances strongly inhomogeneous ablation plumes by moving
domain boundaries: orthogonal plane shifts (balanceOrtho,
imd_loadBalance.c:1283) or the deformable-hexahedron corner-moving
scheme (balanceLoad:272, lb_moveAllCorners:578), with a variance metric
(lb_computeVariance:1253) logged to the `.lb` file (imd_io.c:3941).

On a TPU mesh the cells are statically block-sharded, so "load
balancing" becomes (a) monitoring the imbalance and (b) optionally
re-partitioning the cell->device map along the decomposition axis with
equalized atom counts (SURVEY.md §2.4 P4: the corner-moving scheme need
not be ported literally).  Because XLA shardings are uniform blocks,
the re-partition here is realized by remapping which x-slabs each
device owns via an equalized boundary table; the heavy machinery (all
cells re-sorted by the new map) reuses the ordinary rebin.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu.scene import Scene


def slab_loads(scene: Scene, n_slabs: int) -> jnp.ndarray:
    """Atoms per x-slab of cells [n_slabs] (the per-device load when the
    mesh splits the x axis into n_slabs blocks)."""
    gx = scene.grid.dims[0]
    per_x = jnp.sum(scene.mask.astype(jnp.int32), axis=(1, 2, 3))  # [gx]
    # group gx cells into n_slabs contiguous blocks
    pad = (-gx) % n_slabs
    per_x = jnp.concatenate([per_x, jnp.zeros((pad,), jnp.int32)])
    return jnp.sum(per_x.reshape(n_slabs, -1), axis=1)


def lb_variance(scene: Scene, n_slabs: int):
    """(max/avg, min/avg, variance) like lb_computeVariance
    (imd_loadBalance.c:1253)."""
    loads = slab_loads(scene, n_slabs).astype(scene.pos.dtype)
    avg = jnp.maximum(jnp.mean(loads), 1.0)
    return (jnp.max(loads) / avg, jnp.min(loads) / avg,
            jnp.mean((loads / avg - 1.0) ** 2))


def equalized_boundaries(scene: Scene, n_slabs: int) -> np.ndarray:
    """Cell-index cut points [n_slabs+1] along x equalizing atom counts
    (the balanceOrtho plane-shift analog; host-side, at LB intervals)."""
    gx = scene.grid.dims[0]
    per_x = np.asarray(jnp.sum(scene.mask.astype(jnp.int32),
                               axis=(1, 2, 3)))
    csum = np.concatenate([[0], np.cumsum(per_x)])
    total = csum[-1]
    targets = np.linspace(0, total, n_slabs + 1)
    cuts = np.searchsorted(csum, targets)
    cuts[0], cuts[-1] = 0, gx
    # monotone, at least one cell per slab
    for k in range(1, n_slabs + 1):
        cuts[k] = min(max(cuts[k], cuts[k - 1] + 1), gx - (n_slabs - k))
    return cuts


class LbLog:
    """.lb imbalance log (imd_io.c:3941)."""

    def __init__(self, path: str):
        self._f = open(path, "w")
        self._f.write("# step max/avg min/avg variance\n")

    def write(self, step: int, stats):
        mx, mn, var = (float(x) for x in stats)
        self._f.write(f"{step} {mx:.6f} {mn:.6f} {var:.6e}\n")
        self._f.flush()

    def close(self):
        self._f.close()
