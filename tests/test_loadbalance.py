"""Load balancing: variance metric, live x-slab re-partition."""

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu.ops.forces import compute_pair_forces
from imd_tpu.models.potential import lj_table
from imd_tpu.ops.geometry import Box, choose_grid, with_capacity
from imd_tpu.parallel.loadbalance import (equalized_boundaries, lb_variance,
                                          repartition_x, slab_loads)
from imd_tpu.scene import make_scene, rebin


def _clustered_gas(n=600, L=60.0, seed=0):
    """Gas with 80% of atoms in the left quarter of the box (plume-like)."""
    rng = np.random.default_rng(seed)
    nl = int(0.8 * n)
    left = rng.uniform([0, 0, 0], [L / 4, L, L], (nl, 3))
    rest = rng.uniform([L / 4, 0, 0], [L, L, L], (n - nl, 3))
    return np.concatenate([left, rest]).astype(np.float64), L


def test_repartition_equalizes_slab_loads():
    pos, L = _clustered_gas()
    box = Box.cubic(L, dtype=jnp.float64)
    # coarse x slabs (device granularity) so the balancer has slack
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos),
                       max_dims=(5, 0, 0))
    grid = with_capacity(grid, 256)
    scene = make_scene(grid, pos, dtype=jnp.float64)
    n_slabs = 5
    mx0, mn0, var0 = (float(v) for v in lb_variance(scene, n_slabs))
    scene2 = repartition_x(scene)
    assert int(scene2.overflow) == 0
    mx1, mn1, var1 = (float(v) for v in lb_variance(scene2, n_slabs))
    assert var1 < 0.2 * var0          # strong imbalance mostly removed
    assert mx1 < mx0 and mn1 > mn0
    # no atoms lost
    assert int(scene2.n_atoms()) == len(pos)
    # every slab at least reach wide
    xb = np.asarray(scene2.grid.xbounds)
    assert np.all(np.diff(xb) >= (5.5 / L) - 1e-9)


def test_forces_invariant_under_repartition():
    """Same physics from uniform and moved slab planes."""
    pos, L = _clustered_gas(300, 40.0, seed=3)
    box = Box.cubic(L, dtype=jnp.float64)
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    grid = with_capacity(grid, 64)
    scene = make_scene(grid, pos, dtype=jnp.float64)
    pot = lj_table(epsilon=0.0104, sigma=3.4, r_cut=5.0, dtype=jnp.float64)
    r0 = compute_pair_forces(scene, pot, ntypes=1)
    scene2 = repartition_x(scene)
    r1 = compute_pair_forces(scene2, pot, ntypes=1)

    def by_id(scene, arr):
        ids = np.asarray(scene.id).reshape(-1)
        a = np.asarray(arr).reshape(ids.shape[0], -1)
        keep = ids >= 0
        order = np.argsort(ids[keep])
        return a[keep][order]

    np.testing.assert_allclose(by_id(scene, r0.force),
                               by_id(scene2, r1.force), atol=1e-9)
    np.testing.assert_allclose(by_id(scene, r0.epot),
                               by_id(scene2, r1.epot), atol=1e-9)


def test_repartition_is_jittable():
    pos, L = _clustered_gas(200, 40.0, seed=5)
    box = Box.cubic(L, dtype=jnp.float64)
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    grid = with_capacity(grid, 48)
    scene = make_scene(grid, pos, dtype=jnp.float64)
    scene = rebin(scene, grid=grid.replace(
        xbounds=jnp.linspace(0.0, 1.0, grid.dims[0] + 1)))
    jitted = jax.jit(repartition_x)
    s2 = jitted(scene)
    assert int(s2.overflow) == 0
    # second call with moved planes must not recompile (same avals):
    s3 = jitted(s2)
    assert int(s3.n_atoms()) == len(pos)
