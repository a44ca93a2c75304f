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

    def __init__(self, path: str, append: bool = False):
        self._f = open(path, "a" if append else "w")
        if not append:
            self._f.write("# step max/avg min/avg variance\n")

    def write(self, step: int, stats):
        mx, mn, var = (float(x) for x in stats)
        self._f.write(f"{step} {mx:.6f} {mn:.6f} {var:.6e}\n")
        self._f.flush()

    def close(self):
        self._f.close()


def repartition_x(scene: Scene, min_frac: float = 0.0):
    """Move the x slab planes to equalize atoms per slab (jit-safe).

    The TPU-native balanceLoad (imd_loadBalance.c:272): instead of
    deforming rank domains, the cell grid's x-partition (grid.xbounds, a
    traced leaf) is moved to the atom-count quantiles, subject to every
    slab keeping width >= (cutoff+skin)/Lx so the roll stencil stays
    valid.  Returns a new Scene rebinned under the moved planes — no
    recompilation, because dims/capacity are unchanged.

    Call every lb_frequency steps (main_3d:864-914); follow with an
    overflow check exactly like after any rebin.
    """
    from imd_tpu.scene import rebin

    grid = scene.grid
    gx = grid.dims[0]
    dtype = scene.pos.dtype
    if min_frac <= 0.0:
        # fractional minimum slab width from the box height along x
        hx = float(np.asarray(grid.box.h, np.float64)[0, 0]) if not isinstance(
            grid.box.h, jax.core.Tracer) else None
        reach = grid.cutoff + grid.skin
        if hx is not None and hx > 0:
            min_frac = reach / hx
        else:
            min_frac = 1.0 / (2 * gx)
    if gx * min_frac >= 1.0:
        # no slack: every cell is already exactly at the minimum width
        # (gx = floor(Lx/reach) with an exact fit).  LB is a no-op here —
        # do not kill the run mid-flight for a tuning knob.
        import warnings
        warnings.warn("LOADBALANCE: no slab-plane slack (box is an "
                      "exact multiple of cutoff+skin); repartition is "
                      "a no-op", stacklevel=2)
        return scene

    flat = scene.flatten_atoms()
    frac = grid.box.to_frac(flat["pos"])[:, 0]
    frac = jnp.where(flat["mask"], jnp.clip(frac, 0.0, 1.0), 2.0)
    fs = jnp.sort(frac)
    n_alive = jnp.sum(flat["mask"].astype(jnp.int32))
    # sequential constrained quantiles: cut k takes an equal share of the
    # atoms REMAINING right of the (already clamped) previous cut, then
    # clamps to the feasible band.  A one-shot quantile pass goes stale
    # as soon as a clamp binds in a dense region and starves the next
    # slab; this is the plane-shift iteration of balanceOrtho collapsed
    # into one sweep.
    def one_cut(carry, k):
        prev = carry
        n_left = jnp.searchsorted(fs, prev, side="right").astype(jnp.int32)
        remaining = n_alive - n_left
        share = remaining // (gx - k + 1)
        idx = jnp.clip(n_left + share, 0, frac.shape[0] - 1)
        c = fs[idx]
        c = jnp.clip(c, prev + min_frac,
                     1.0 - (gx - k).astype(c.dtype) * min_frac)
        return c, c
    _, cuts = jax.lax.scan(one_cut, jnp.zeros((), fs.dtype),
                           jnp.arange(1, gx, dtype=jnp.int32))
    xb = jnp.concatenate([jnp.zeros((1,), dtype), cuts.astype(dtype),
                          jnp.ones((1,), dtype)])
    new_grid = grid.replace(xbounds=xb)
    return rebin(scene, grid=new_grid)
