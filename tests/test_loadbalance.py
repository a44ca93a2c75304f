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


def _film_eam_scene(dims_multiple=(1, 1, 1)):
    """Inhomogeneous film+vacuum EAM scene (LB has work to do)."""
    from imd_tpu.models.potential import analytic_eam, eam_to_fastpoly
    from imd_tpu.ops.geometry import measured_capacity
    from imd_tpu.utils.generate import fcc

    pos, typ, diag = fcc((8, 6, 6), 4.05)
    Lx = diag[0] * 2.0                    # 50% vacuum on the right
    box = Box.create([Lx, 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos),
                       dims_multiple=dims_multiple)
    grid = with_capacity(grid, measured_capacity(grid, pos))
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.9815),
                    dtype=jnp.float64)
    from imd_tpu import integrate
    sc = integrate.maxwell(sc, 0.04, jax.random.PRNGKey(5))
    eam = eam_to_fastpoly(analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39,
                                       dtype=jnp.float64), deg=12)
    return sc, eam


def test_fused_loop_lb_preserves_physics():
    """Repartitioning mid-run on the FUSED path (xbounds as a CLState
    leaf) is an exact re-binning: the trajectory matches the
    no-repartition run, while the slab widths become non-uniform."""
    from imd_tpu.ops.fused_step import (cl_to_scene, make_fused_step,
                                        scene_to_cl)

    scene, eam = _film_eam_scene()
    step, cl = make_fused_step(scene, eam, 0.1)
    step = jax.jit(step)
    cl_ref = cl
    for i in range(20):
        cl, _ = step(cl)
        cl_ref, _ = step(cl_ref)
    # LB event on one copy only
    sc = repartition_x(cl_to_scene(cl, scene))
    xb = np.asarray(sc.grid.xbounds)
    w = np.diff(xb)
    assert w.max() / w.min() > 1.3, "planes did not move"
    cl = scene_to_cl(sc)
    for i in range(20):
        cl, _ = step(cl)
        cl_ref, _ = step(cl_ref)
    a = cl_to_scene(cl, scene)
    b = cl_to_scene(cl_ref, scene)
    fa, fb = a.flatten_atoms(), b.flatten_atoms()
    ma, mb = np.asarray(fa["mask"]), np.asarray(fb["mask"])
    pa = np.asarray(fa["pos"])[ma][np.argsort(np.asarray(fa["id"])[ma])]
    pb = np.asarray(fb["pos"])[mb][np.argsort(np.asarray(fb["id"])[mb])]
    assert len(pa) == len(pb) == int(scene.n_atoms())
    # the repartition rebin WRAPS positions; compare minimum-image
    d = np.asarray(scene.grid.box.min_image(jnp.asarray(pa - pb)))
    assert np.abs(d).max() < 1e-8


def test_sharded_fused_lb_matches_single_device():
    """LB + mesh on the fused path: the sharded sweep is by CELL-INDEX
    blocks, so moved (non-uniform) slab planes change nothing about the
    halo protocol — sharded == single device through a repartition."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from imd_tpu.ops.fused_step import (cl_to_scene, make_fused_step,
                                        scene_to_cl)
    from imd_tpu.parallel.mesh import make_mesh

    scene, eam = _film_eam_scene(dims_multiple=(8, 1, 1))
    mesh = make_mesh((8, 1, 1))
    step1, cl1 = make_fused_step(scene, eam, 0.1)
    step8, cl8 = make_fused_step(scene, eam, 0.1, mesh=mesh)
    step1, step8 = jax.jit(step1), jax.jit(step8)
    for i in range(10):
        cl1, _ = step1(cl1)
        cl8, _ = step8(cl8)
    sc1 = repartition_x(cl_to_scene(cl1, scene))
    sc8 = repartition_x(cl_to_scene(cl8, scene))
    np.testing.assert_array_equal(np.asarray(sc1.grid.xbounds),
                                  np.asarray(sc8.grid.xbounds))
    cl1, cl8 = scene_to_cl(sc1), scene_to_cl(sc8)
    for i in range(10):
        cl1, _ = step1(cl1)
        cl8, _ = step8(cl8)
    np.testing.assert_allclose(np.asarray(cl8.xi), np.asarray(cl1.xi),
                               rtol=1e-10, atol=1e-10)
