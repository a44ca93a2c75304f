"""Fused cells-last step == Scene-based step."""

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu import integrate
from imd_tpu.models.potential import analytic_eam, eam_to_fastpoly
from imd_tpu.ops.forces_pallas import compute_eam_forces_pallas
from imd_tpu.ops.fused_step import cl_to_scene, make_fused_step, scene_to_cl
from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, \
    with_capacity
from imd_tpu.scene import make_scene, needs_rebin, rebin
from imd_tpu.utils.generate import fcc

EAM = eam_to_fastpoly(analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39,
                                   dtype=jnp.float32), deg=12)


def _scene():
    pos, typ, diag = fcc((5, 4, 4), 4.05)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float32)
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.9815),
                    dtype=jnp.float32)
    return integrate.maxwell(sc, 0.05, jax.random.PRNGKey(3))


def test_fused_rebin_preserves_atoms():
    """Two+ in-loop rebins must not lose atoms or bin phantoms.

    Regression: cl_to_scene used to rebuild the Scene from the static
    template captured at make_fused_step time; after the 2nd rebin the
    slot layout diverged and real atoms were dropped while zeros were
    binned at the origin.
    """
    pos, typ, diag = fcc((5, 4, 4), 4.05)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float32)
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos) + 4)
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.9815),
                    dtype=jnp.float32)
    # hot: large displacements per step force frequent skin-check rebins
    scene = integrate.maxwell(sc, 0.6, jax.random.PRNGKey(7))
    n0 = int(scene.n_atoms())
    ids0 = np.sort(np.asarray(scene.id).reshape(-1))
    ids0 = ids0[ids0 >= 0]

    step_cl, cl = make_fused_step(scene, EAM, 0.1)
    step_cl = jax.jit(step_cl)
    rebins = 0
    prev_ref = np.asarray(cl.ref_xi)
    for i in range(60):
        cl, _ = step_cl(cl)
        new_ref = np.asarray(cl.ref_xi)
        if new_ref.shape == prev_ref.shape and not np.array_equal(
                new_ref, prev_ref):
            rebins += 1
        prev_ref = new_ref
    assert rebins >= 2, f"test did not exercise >=2 rebins (got {rebins})"

    out = cl_to_scene(cl, scene)
    assert int(out.overflow) == 0
    assert int(out.n_atoms()) == n0
    ids1 = np.sort(np.asarray(out.id).reshape(-1))
    ids1 = ids1[ids1 >= 0]
    np.testing.assert_array_equal(ids0, ids1)
    # no phantom atoms parked at the origin with zero mass
    flat = out.flatten_atoms()
    m = np.asarray(flat["mask"])
    assert np.all(np.asarray(flat["mass"])[m] > 1.0)


def test_fused_matches_scene_step():
    scene = _scene()
    dt = 0.1
    params = integrate.IntegratorParams(timestep=jnp.float32(dt))
    step_cl, cl = make_fused_step(scene, EAM, dt)
    step_cl = jax.jit(step_cl)

    @jax.jit
    def step_scene(s):
        res = compute_eam_forces_pallas(s, EAM, need_energy=False)
        s = s.replace(force=res.force)
        s, _ = integrate.nve(s, params)
        return s

    s = scene
    for i in range(25):
        cl, _ = step_cl(cl)
        s = step_scene(s)
        if bool(needs_rebin(s, s.grid.skin)):
            s = rebin(s)

    out = cl_to_scene(cl, scene)
    ids_a = np.asarray(s.id).reshape(-1)
    ids_b = np.asarray(out.id).reshape(-1)

    def by_id(ids, arr):
        a = np.asarray(arr).reshape(len(ids), -1)
        keep = ids >= 0
        return a[keep][np.argsort(ids[keep])]

    pa = by_id(ids_a, s.pos)
    pb = by_id(ids_b, out.pos)
    np.testing.assert_allclose(pa, pb, atol=3e-3)
    ma = by_id(ids_a, s.mom)
    mb = by_id(ids_b, out.mom)
    np.testing.assert_allclose(ma, mb, atol=3e-3)


def test_fused_nrb_matches_general():
    """NRB woven into the fused step == nrb_forces + masked integrator
    (nrb_forces imd_nrb.c:792; skip-p-update imd_integrate.c:254)."""
    from imd_tpu.models.nrb import init_nrb, nrb_forces

    pos, typ, diag = fcc((5, 3, 3), 4.05)
    box = Box.create([diag[0] * 1.5, 0, 0], [0, diag[1], 0],
                     [0, 0, diag[2]], dtype=jnp.float32)
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos) + 4)
    grid = grid.replace(box=box.replace(pbc=(0, 1, 1)))
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.9815),
                    id=np.arange(len(pos)), dtype=jnp.float32)
    scene = integrate.maxwell(sc, 0.04, jax.random.PRNGKey(5))
    state = init_nrb(scene, 4.05, 5.0, mass=26.9815, pbc=(0, 1, 1))
    assert state is not None and len(np.asarray(state.bnd_id)) > 0

    dt = 0.1
    params = integrate.IntegratorParams(timestep=jnp.float32(dt))
    step_cl, cl = make_fused_step(scene, EAM, dt, nrb_state=state)
    step_cl = jax.jit(step_cl)

    @jax.jit
    def step_scene(s):
        res = compute_eam_forces_pallas(s, EAM, need_energy=False)
        s = s.replace(force=res.force)
        s, m = nrb_forces(s, state)
        s, _ = integrate.nve(s, params, nrb_mask=m)
        return s

    s = scene
    for i in range(12):
        cl, _ = step_cl(cl)
        s = step_scene(s)
        if bool(needs_rebin(s, s.grid.skin)):
            s = rebin(s)

    out = cl_to_scene(cl, scene)

    def by_id(sc_):
        f = sc_.flatten_atoms()
        ids = np.asarray(f["id"])
        m = np.asarray(f["mask"])
        o = np.argsort(ids[m])
        return (np.asarray(f["pos"])[m][o], np.asarray(f["mom"])[m][o])

    pa, ma = by_id(s)
    pb, mb = by_id(out)
    np.testing.assert_allclose(pa, pb, atol=2e-4)
    np.testing.assert_allclose(ma, mb, atol=2e-3)


def test_fused_filter_apply_matches_general():
    """make_filter_apply (host-side block-boundary FILTER for the fused
    loop) deletes exactly the atoms filter_atoms deletes."""
    from imd_tpu.config import FilterConfig
    from imd_tpu.models.filter import filter_atoms
    from imd_tpu.ops.fused_step import make_filter_apply

    pos, typ, diag = fcc((4, 3, 3), 4.05)
    # detach two atoms into the vacuum (beyond the filter bound)
    box = Box.create([diag[0] * 2.5, 0, 0], [0, diag[1], 0],
                     [0, 0, diag[2]], dtype=jnp.float32)
    pos = np.concatenate([pos + [diag[0] * 1.5, 0, 0],
                          [[3.0, 2.0, 2.0], [7.0, 5.0, 5.0]]])
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos) + 4)
    grid = grid.replace(box=box.replace(pbc=(0, 1, 1)))
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.9815),
                    id=np.arange(len(pos)), dtype=jnp.float32)
    fcfg = FilterConfig(enabled=True, interval=10, min_x=diag[0] * 1.2)

    sc2, ndel = filter_atoms(sc, fcfg, 5.0)
    assert int(ndel) == 2

    apply = make_filter_apply(sc, fcfg, 5.0)
    cl2 = apply(scene_to_cl(sc))
    out = cl_to_scene(cl2, sc)
    assert int(out.n_atoms()) == int(sc.n_atoms()) - 2
    ids = np.asarray(out.flatten_atoms()["id"])
    m = np.asarray(out.flatten_atoms()["mask"])
    kept = set(ids[m].tolist())
    assert len(pos) - 1 not in kept and len(pos) - 2 not in kept


def test_fused_multitype_matches_scene_step():
    """Alloys on the fused hot loop (ntypes>1 -> eam_kernels_cl_mt)
    == the Scene-based mt engine stepped manually."""
    from imd_tpu.models.potential import (EAMPotential, analytic_eam,
                                          to_fastpoly)
    from imd_tpu.models.potential import PotTable
    from imd_tpu.ops.forces_pallas import compute_eam_forces_pallas_mt

    nt = 2
    e1 = analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39, dtype=jnp.float32)

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

    eam2 = EAMPotential(
        pair=scale_cols(e1.pair, [1.0, 0.8, 0.8, 0.6]),
        rho=scale_cols(e1.rho, [1.0, 0.9, 0.7, 0.5]),
        embed=scale_cols(e1.embed, [1.0, 0.75]))
    eam_run = EAMPotential(pair=to_fastpoly(eam2.pair),
                           rho=to_fastpoly(eam2.rho),
                           embed=to_fastpoly(eam2.embed, vcap=1e9))

    scene = _scene()
    key = jax.random.PRNGKey(9)
    rtypes = jax.random.bernoulli(key, 0.4,
                                  scene.type.shape).astype(jnp.int32)
    scene = scene.replace(type=jnp.where(scene.mask, rtypes, -1))

    dt = 0.1
    params = integrate.IntegratorParams(timestep=jnp.float32(dt))
    step_cl, cl = make_fused_step(scene, eam_run, dt, ntypes=nt)
    step_cl = jax.jit(step_cl)

    @jax.jit
    def step_scene(s):
        res = compute_eam_forces_pallas_mt(s, eam_run, nt,
                                           need_energy=False,
                                           need_stress=False)
        s = s.replace(force=res.force)
        s, _ = integrate.nve(s, params)
        return s

    s = scene
    for i in range(15):
        cl, _ = step_cl(cl)
        s = step_scene(s)
        if bool(needs_rebin(s, s.grid.skin)):
            s = rebin(s)

    out = cl_to_scene(cl, scene)

    def by_id(sc_):
        f = sc_.flatten_atoms()
        ids = np.asarray(f["id"])
        m = np.asarray(f["mask"])
        o = np.argsort(ids[m])
        return (np.asarray(f["pos"])[m][o], np.asarray(f["mom"])[m][o],
                np.asarray(f["type"])[m][o])

    pa, ma, ta = by_id(s)
    pb, mb, tb = by_id(out)
    np.testing.assert_array_equal(ta, tb)
    np.testing.assert_allclose(pa, pb, atol=3e-4)
    np.testing.assert_allclose(ma, mb, atol=3e-3)
