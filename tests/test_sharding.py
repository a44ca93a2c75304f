"""Multi-device == single-device equivalence on a virtual 8-CPU mesh.

The distributed test the reference never had (SURVEY.md §4): the same step
on a sharded Scene must produce bit-compatible physics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu import integrate
from imd_tpu.models.potential import lj_table
from imd_tpu.ops.forces import compute_pair_forces
from imd_tpu.ops.geometry import Box, choose_grid
from imd_tpu.parallel.mesh import (check_grid_divisible, make_mesh,
                                   scene_shardings, shard_scene)
from imd_tpu.scene import make_scene, rebin
from imd_tpu.utils.generate import fcc


def _scene(dims_multiple=(1, 1, 1), nc=(18, 6, 6)):
    pos, typ, box_diag = fcc(nc, 1.5874)
    rng = np.random.default_rng(5)
    pos = pos + rng.normal(scale=0.05, size=pos.shape)
    box = Box.create([box_diag[0], 0, 0], [0, box_diag[1], 0],
                     [0, 0, box_diag[2]], dtype=jnp.float64)
    pot = lj_table(1.0, 1.0, 2.5, res=2000, dtype=jnp.float64)
    grid = choose_grid(box, 2.5, skin=0.3, n_atoms=len(pos),
                       dims_multiple=dims_multiple)
    scene = make_scene(grid, pos, dtype=jnp.float64)
    return scene, pot


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_forces_match_single_device():
    scene, pot = _scene(dims_multiple=(8, 1, 1))
    mesh = make_mesh((8, 1, 1))
    check_grid_divisible(scene.grid.dims, mesh)

    f = jax.jit(lambda s: compute_pair_forces(s, pot, ntypes=1))
    res_single = f(scene)

    scene_sh = shard_scene(mesh, scene)
    res_shard = f(scene_sh)
    np.testing.assert_allclose(np.asarray(res_shard.force),
                               np.asarray(res_single.force),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(float(res_shard.virial),
                               float(res_single.virial), rtol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("shape", [(1, 8, 1), (2, 2, 2)])
def test_sharded_forces_and_step_non_x_meshes(shape):
    """Non-x decompositions (VERDICT r3 #4): the general GSPMD engine
    must be correct on y-slab and full 3-D meshes — the reference's 3-D
    Cartesian torus (imd_geom_mpi_3d.c:32-90).  The FUSED shard path is
    x-only by design (its half-stencil halo protocol needs dx in {0,+1});
    shardable() rejects these meshes and the driver uses this engine."""
    # box long enough along every decomposed axis for >= shape cells
    nc = tuple(max(6, 3 * s) for s in shape)
    scene, pot = _scene(dims_multiple=shape, nc=nc)
    mesh = make_mesh(shape)
    check_grid_divisible(scene.grid.dims, mesh)
    from imd_tpu.parallel.fused_shard import shardable
    assert not shardable(scene.grid, mesh)   # fused path: x-only

    f = jax.jit(lambda s: compute_pair_forces(s, pot, ntypes=1))
    res_single = f(scene)
    res_shard = f(shard_scene(mesh, scene))
    np.testing.assert_allclose(np.asarray(res_shard.force),
                               np.asarray(res_single.force),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(float(res_shard.virial),
                               float(res_single.virial), rtol=1e-12)

    # full step + rebin equivalence
    params = integrate.IntegratorParams(timestep=jnp.float64(0.004))
    sc = integrate.maxwell(scene, 0.03, jax.random.PRNGKey(2))

    @jax.jit
    def step(s):
        res = compute_pair_forces(s, pot, ntypes=1)
        s = s.replace(force=res.force, epot=res.epot)
        s, stats = integrate.nve(s, params)
        return rebin(s), stats.tot_kin_energy

    s1, s2 = sc, shard_scene(mesh, sc)
    for _ in range(5):
        s1, e1 = step(s1)
        s2, e2 = step(s2)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s1.pos), np.asarray(s2.pos),
                               rtol=1e-12, atol=1e-12)
    assert int(s2.overflow) == 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_check_grid_divisible_per_axis():
    """check_grid_divisible rejects every non-divisible axis by name."""
    mesh = make_mesh((2, 2, 2))
    check_grid_divisible((4, 2, 6), mesh)
    for bad, axname in (((5, 2, 2), "'x'"), ((2, 5, 2), "'y'"),
                        ((2, 2, 5), "'z'")):
        with pytest.raises(ValueError, match=axname):
            check_grid_divisible(bad, mesh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_and_rebin_match():
    scene, pot = _scene(dims_multiple=(8, 1, 1))
    mesh = make_mesh((8, 1, 1))
    params = integrate.IntegratorParams(timestep=jnp.float64(0.004))
    scene = integrate.maxwell(scene, 0.03, jax.random.PRNGKey(2))

    @jax.jit
    def step(s):
        res = compute_pair_forces(s, pot, ntypes=1)
        s = s.replace(force=res.force, epot=res.epot)
        s, stats = integrate.nve(s, params)
        return rebin(s), stats.tot_kin_energy

    s1, s2 = scene, shard_scene(mesh, scene)
    for _ in range(5):
        s1, e1 = step(s1)
        s2, e2 = step(s2)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-12)
    # same atoms in same cells
    np.testing.assert_allclose(np.asarray(s1.pos), np.asarray(s2.pos),
                               rtol=1e-12, atol=1e-12)
    assert int(s2.overflow) == 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_ttm_step_matches_single_device():
    """P8: the TTM FD grid sharded along the mesh x axis produces the
    same electron temperatures and coupled forces as one device."""
    from imd_tpu.config import LaserConfig, TTMConfig
    from imd_tpu.models import ttm as ttm_mod
    from imd_tpu.models.eos import FEGEos
    from imd_tpu.parallel.mesh import shard_ttm

    scene, pot = _scene(dims_multiple=(8, 1, 1))
    mesh = make_mesh((8, 1, 1))
    dtype = scene.pos.dtype
    tcfg = TTMConfig(enabled=True, fd_nx=16, fd_min_atoms=2)
    tp = ttm_mod.make_params(tcfg, scene.grid.box, 2.5, dtype)
    eos = FEGEos()
    lcfg = LaserConfig(rescale_mode=4, sigma_e=0.05, sigma_t=50.0,
                       t_0=100.0, mu=0.01)
    params = integrate.IntegratorParams(timestep=jnp.asarray(0.05, dtype))
    fdi0 = -jnp.ones(scene.type.shape, jnp.int32)

    @jax.jit
    def step(scene, tgrid, fdi, t):
        res = compute_pair_forces(scene, pot, ntypes=1,
                                  count_neighbors=True)
        scene = scene.replace(force=res.force, epot=res.epot)
        tgrid, fdi = ttm_mod.calc_ttm(
            tgrid, scene, tp, eos, res.num_neighs, fdi, params.timestep,
            t, laser_cfg=lcfg, first_step=(t == 0))
        xi_a, vcom = ttm_mod.gather_atom_coupling(tgrid, scene, tp)
        scene, stats = integrate.ttm(scene, params, xi_a, vcom)
        return scene, tgrid, fdi

    tg = ttm_mod.make_grid(tp, dtype)
    s1, tg1, _ = step(scene, tg, fdi0, jnp.zeros((), dtype))
    s8, tg8, _ = step(shard_scene(mesh, scene), shard_ttm(mesh, tg),
                      fdi0, jnp.zeros((), dtype))
    np.testing.assert_allclose(np.asarray(tg8.temp), np.asarray(tg1.temp),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s8.mom), np.asarray(s1.mom),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(tg8.xi), np.asarray(tg1.xi),
                               rtol=1e-12, atol=1e-12)


def _eam_scene(dims_multiple=(8, 1, 1)):
    from imd_tpu.models.potential import analytic_eam, eam_to_fastpoly
    from imd_tpu.ops.geometry import measured_capacity, with_capacity
    pos, typ, diag = fcc((16, 6, 6), 4.05)
    rng = np.random.default_rng(11)
    pos = pos + rng.normal(scale=0.05, size=pos.shape)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos),
                       dims_multiple=dims_multiple)
    grid = with_capacity(grid, measured_capacity(grid, pos))
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.9815),
                    dtype=jnp.float64)
    sc = integrate.maxwell(sc, 0.05, jax.random.PRNGKey(3))
    eam = eam_to_fastpoly(analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39,
                                       dtype=jnp.float64), deg=12)
    return sc, eam


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fused_step_matches_unsharded():
    """The production fused Pallas hot loop under an x-mesh (explicit
    ppermute halo protocol, parallel/fused_shard.py) must reproduce the
    single-device fused step — positions, momenta, and the in-loop
    skin-check rebin included (the P2/P3 halo + migration equivalence
    on the benched path, imd_comm_force_3d.c / imd_fix_cells_3d.c)."""
    from imd_tpu.ops.fused_step import make_fused_step

    scene, eam = _eam_scene()
    mesh = make_mesh((8, 1, 1))
    step1, cl1 = make_fused_step(scene, eam, 0.1, engine="split")
    step8, cl8 = make_fused_step(scene, eam, 0.1, mesh=mesh)
    step1 = jax.jit(step1)
    step8 = jax.jit(step8)
    rebins = 0
    prev_ref = np.asarray(cl1.ref_xi)
    for _ in range(40):
        cl1, _ = step1(cl1)
        cl8, _ = step8(cl8)
        new_ref = np.asarray(cl1.ref_xi)
        if not np.array_equal(new_ref, prev_ref):
            rebins += 1
        prev_ref = new_ref
    assert rebins >= 1, "test did not exercise an in-loop rebin"
    np.testing.assert_allclose(np.asarray(cl8.xi), np.asarray(cl1.xi),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cl8.mom), np.asarray(cl1.mom),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(cl8.ids), np.asarray(cl1.ids))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fused_alloy_matches_unsharded():
    """Multi-type EAM on the sharded fused hot loop: per-slot types ride
    the +x halo permute with the positions, the embedding select happens
    between the rho-fold and dF-out exchanges (the sharded analog of the
    reference's per-sorte F(rho) block between send_forces(add_rho) and
    send_cells(copy_dF), imd_forces_nbl.c:745-786)."""
    from imd_tpu.models.potential import EAMPotential, PotTable, to_fastpoly
    from imd_tpu.ops.fused_step import make_fused_step

    scene, eam64 = _eam_scene()

    def scale_cols(pt, scales):
        tab = np.asarray(pt.table)
        n = len(scales)
        table = np.concatenate([tab * s for s in scales], axis=0)
        rep = lambda a: np.concatenate([np.asarray(a)] * n)  # noqa: E731
        return PotTable(table=jnp.asarray(table),
                        begin=jnp.asarray(rep(pt.begin)),
                        end=jnp.asarray(rep(pt.end)),
                        step=jnp.asarray(rep(pt.step)),
                        invstep=jnp.asarray(rep(pt.invstep)),
                        length=jnp.asarray(rep(pt.length)))

    from imd_tpu.models.potential import analytic_eam
    base = analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39, dtype=jnp.float64)
    eam2 = EAMPotential(pair=scale_cols(base.pair, [1.0, 0.8, 0.8, 0.6]),
                        rho=scale_cols(base.rho, [1.0, 0.9, 0.7, 0.5]),
                        embed=scale_cols(base.embed, [1.0, 0.75]))
    eam_run = EAMPotential(pair=to_fastpoly(eam2.pair),
                           rho=to_fastpoly(eam2.rho),
                           embed=to_fastpoly(eam2.embed, vcap=1e9))

    rt = jax.random.bernoulli(jax.random.PRNGKey(7), 0.4,
                              scene.type.shape).astype(jnp.int32)
    scene = scene.replace(type=jnp.where(scene.mask, rt, -1))

    mesh = make_mesh((8, 1, 1))
    step1, cl1 = make_fused_step(scene, eam_run, 0.1, ntypes=2)
    step8, cl8 = make_fused_step(scene, eam_run, 0.1, ntypes=2,
                                 mesh=mesh)
    step1 = jax.jit(step1)
    step8 = jax.jit(step8)
    rebins = 0
    prev_ref = np.asarray(cl1.ref_xi)
    for _ in range(40):
        cl1, _ = step1(cl1)
        cl8, _ = step8(cl8)
        new_ref = np.asarray(cl1.ref_xi)
        if not np.array_equal(new_ref, prev_ref):
            rebins += 1
        prev_ref = new_ref
    assert rebins >= 1, "test did not exercise an in-loop rebin"
    np.testing.assert_allclose(np.asarray(cl8.xi), np.asarray(cl1.xi),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cl8.mom), np.asarray(cl1.mom),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(cl8.typ), np.asarray(cl1.typ))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fused_ttm_step_matches_unsharded():
    """North-star configuration end-to-end under the mesh: the fused
    TTM-coupled step with shard_mapped forces + GSPMD calc_ttm equals
    the single-device fused TTM step."""
    from imd_tpu.config import LaserConfig, TTMConfig
    from imd_tpu.models import ttm as ttm_mod
    from imd_tpu.models.eos import FEGEos
    from imd_tpu.ops.fused_step import make_fused_ttm_step
    from imd_tpu.parallel.mesh import shard_ttm

    scene, eam = _eam_scene()
    mesh = make_mesh((8, 1, 1))
    dtype = scene.pos.dtype
    tcfg = TTMConfig(enabled=True, fd_nx=16, fd_min_atoms=2)
    tp = ttm_mod.make_params(tcfg, scene.grid.box, 5.0, dtype)
    eos = FEGEos()
    lcfg = LaserConfig(rescale_mode=4, sigma_e=0.05, sigma_t=50.0,
                       t_0=100.0, mu=0.01)
    step1, cl1 = make_fused_ttm_step(scene, eam, 0.05, tp, eos, lcfg,
                                     engine="split")
    step8, cl8 = make_fused_ttm_step(scene, eam, 0.05, tp, eos, lcfg,
                                     mesh=mesh)
    step1 = jax.jit(step1)
    step8 = jax.jit(step8)
    tg1 = ttm_mod.make_grid(tp, dtype)
    tg8 = shard_ttm(mesh, tg1)
    fdi = -jnp.ones(cl1.mass.size, jnp.int32)
    c1 = (cl1, tg1, fdi, jnp.zeros((), jnp.int32))
    c8 = (cl8, tg8, fdi, jnp.zeros((), jnp.int32))
    for _ in range(5):
        c1 = step1(*c1)
        c8 = step8(*c8)
    np.testing.assert_allclose(np.asarray(c8[0].xi), np.asarray(c1[0].xi),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(c8[0].mom), np.asarray(c1[0].mom),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(c8[1].temp),
                               np.asarray(c1[1].temp),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fused_flagship_matches_unsharded():
    """The FLAGSHIP build under the mesh: fused TTM step with TMM laser
    + NRB rear boundary, shard_mapped forces + GSPMD calc_ttm, equals
    the single-device fused step bit-for-bit."""
    from imd_tpu.config import TMMConfig, TTMConfig
    from imd_tpu.models import tmm as tmm_mod
    from imd_tpu.models import ttm as ttm_mod
    from imd_tpu.models.eos import FEGEos
    from imd_tpu.models.nrb import init_nrb
    from imd_tpu.ops.fused_step import make_fused_ttm_step
    from imd_tpu.parallel.mesh import shard_ttm

    scene, eam = _eam_scene()
    # open x for the boundary detection (film spans the box here)
    scene = scene.replace(grid=scene.grid.replace(
        box=scene.grid.box.replace(pbc=(0, 1, 1))))
    nrb = init_nrb(scene, 4.05, 5.0, mass=26.9815, pbc=(0, 1, 1))
    assert nrb is not None
    mesh = make_mesh((8, 1, 1))
    dtype = scene.pos.dtype
    tcfg = TTMConfig(enabled=True, fd_nx=16, fd_min_atoms=2,
                     init_t_el=0.026)
    tp = ttm_mod.make_params(tcfg, scene.grid.box, 5.0, dtype)
    eos = FEGEos()
    tmm_cfg = TMMConfig(enabled=True, lambda_m=800e-9, I0=2e17,
                        t0_s=30e-15, sigma_t_s=20e-15)
    tmm_p = tmm_mod.make_tmm_params(tmm_cfg, dtype)
    kw = dict(nrb_state=nrb, tmm_params=tmm_p)
    step1, cl1 = make_fused_ttm_step(scene, eam, 0.05, tp, eos, None,
                                     engine="split", **kw)
    step8, cl8 = make_fused_ttm_step(scene, eam, 0.05, tp, eos, None,
                                     mesh=mesh, **kw)
    step1 = jax.jit(step1)
    step8 = jax.jit(step8)
    tg1 = ttm_mod.make_grid(tp, dtype)
    tg1 = tg1.replace(temp=jnp.full_like(tg1.temp, 0.026),
                      init_done=jnp.ones((), bool))
    tg8 = shard_ttm(mesh, tg1)
    fdi = -jnp.ones(cl1.mass.size, jnp.int32)
    c1 = (cl1, tg1, fdi, jnp.zeros((), jnp.int32))
    c8 = (cl8, tg8, fdi, jnp.zeros((), jnp.int32))
    for _ in range(4):
        c1 = step1(*c1)
        c8 = step8(*c8)
    np.testing.assert_allclose(np.asarray(c8[0].xi), np.asarray(c1[0].xi),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(c8[0].mom),
                               np.asarray(c1[0].mom),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(c8[1].temp),
                               np.asarray(c1[1].temp),
                               rtol=1e-10, atol=1e-10)
