"""Pallas force engine vs the XLA oracle (same fast-poly tables)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu import integrate
from imd_tpu.models.potential import analytic_eam, eam_to_fastpoly
from imd_tpu.ops.forces_fast import compute_eam_forces_fast
from imd_tpu.ops.forces_pallas import compute_eam_forces_pallas
from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, with_capacity
from imd_tpu.scene import make_scene
from imd_tpu.utils.generate import fcc


def _scene(nc=(5, 4, 4), alat=4.05, pbc=(1, 1, 1), temp=0.05):
    pos, typ, diag = fcc(nc, alat)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     pbc=pbc, dtype=jnp.float32)
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.9815),
                    dtype=jnp.float32)
    if temp:
        sc = integrate.maxwell(sc, temp, jax.random.PRNGKey(3))
    return sc


EAM = eam_to_fastpoly(analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39,
                                   dtype=jnp.float32), deg=12)


@pytest.mark.parametrize("pbc", [(1, 1, 1), (0, 1, 1)])
def test_pallas_matches_xla_oracle(pbc):
    sc = _scene(pbc=pbc)
    # jitter so no symmetry hides sign errors
    sc = sc.replace(pos=sc.pos + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), sc.pos.shape))
    r_ref = jax.jit(lambda s: compute_eam_forces_fast(s, EAM, 1,
                                                      count_neighbors=True))(sc)
    r_pal = jax.jit(lambda s: compute_eam_forces_pallas(
        s, EAM, count_neighbors=True))(sc)
    m = np.asarray(sc.mask)
    f1 = np.asarray(r_ref.force)[m]
    f2 = np.asarray(r_pal.force)[m]
    scale = np.abs(f1).max() + 1.0
    assert np.abs(f1 - f2).max() / scale < 1e-4
    e1 = np.asarray(r_ref.epot)[m]
    e2 = np.asarray(r_pal.epot)[m]
    assert np.abs(e1 - e2).max() < 1e-4 * (np.abs(e1).max() + 1.0)
    assert np.array_equal(np.asarray(r_ref.num_neighs)[m],
                          np.asarray(r_pal.num_neighs)[m])
    r1 = np.asarray(r_ref.rho)[m]
    r2 = np.asarray(r_pal.rho)[m]
    assert np.abs(r1 - r2).max() / (np.abs(r1).max() + 1.0) < 1e-4


def test_pallas_virial_matches_xla_oracle():
    """In-kernel virial/presstens partial sums == the XLA engine's
    (imd_forces_nbl.c:997-1016).  Round-1 gap: the Pallas path returned
    virial=0, so .eng pressure and NPT were wrong under the production
    engine."""
    sc = _scene()
    sc = sc.replace(pos=sc.pos + 0.05 * jax.random.normal(
        jax.random.PRNGKey(4), sc.pos.shape))
    r_ref = jax.jit(lambda s: compute_eam_forces_fast(s, EAM, 1))(sc)
    r_pal = jax.jit(lambda s: compute_eam_forces_pallas(
        s, EAM, need_stress=True))(sc)
    v1, v2 = float(r_ref.virial), float(r_pal.virial)
    assert abs(v1 - v2) < 1e-3 * (abs(v1) + 1.0), (v1, v2)
    p1 = np.asarray(r_ref.presstens)
    p2 = np.asarray(r_pal.presstens)
    assert np.abs(p1 - p2).max() < 1e-3 * (np.abs(p1).max() + 1.0), (p1, p2)


def test_split_rf_engine_matches_ab():
    """eam_kernels_cl_split (rho sweep + combined-force sweep) must give
    the same forces/rho/nn as the A/B engine."""
    from imd_tpu.ops.forces_pallas import (eam_kernels_cl,
                                           eam_kernels_cl_split,
                                           prep_neighbors)
    sc = _scene()
    sc = sc.replace(pos=sc.pos + 0.05 * jax.random.normal(
        jax.random.PRNGKey(2), sc.pos.shape))
    xi, nbr, mask = prep_neighbors(sc)
    F1, _, rho1, nn1, _, _ = jax.jit(
        lambda xi, nbr, mask: eam_kernels_cl(
            xi, nbr, mask, EAM, sc.grid, count_neighbors=True,
            need_energy=False))(xi, nbr, mask)
    F2, rho2, nn2 = jax.jit(
        lambda xi, nbr, mask: eam_kernels_cl_split(
            xi, nbr, mask, EAM, sc.grid,
            count_neighbors=True))(xi, nbr, mask)
    scale = float(jnp.abs(F1).max()) + 1.0
    assert float(jnp.abs(F1 - F2).max()) / scale < 1e-4
    assert float(jnp.abs(rho1 - rho2).max()) < 1e-4
    assert float(jnp.abs(nn1 - nn2).max()) == 0.0


def test_multitype_eam_pallas_matches_xla():
    """Alloy EAM on the Pallas engine (one-hot column select in-kernel)
    == the XLA engine's column-indexed path (VERDICT r1 #8)."""
    from imd_tpu.models.potential import (EAMPotential, analytic_eam,
                                          to_fastpoly)
    from imd_tpu.models.potential import PotTable
    from imd_tpu.ops.forces_pallas import compute_eam_forces_pallas_mt

    nt = 2
    # build a 2-species EAM: distinct pair/rho columns per type pair,
    # distinct embedding per type (scale the single-species tables)
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

    sc = _scene()
    # random alloy assignment
    key = jax.random.PRNGKey(9)
    rtypes = jax.random.bernoulli(key, 0.4, sc.type.shape).astype(jnp.int32)
    sc = sc.replace(type=jnp.where(sc.mask, rtypes, -1),
                    pos=sc.pos + 0.05 * jax.random.normal(
                        jax.random.PRNGKey(1), sc.pos.shape))

    r_ref = jax.jit(lambda s: compute_eam_forces_fast(
        s, eam_run, nt, count_neighbors=True))(sc)
    r_pal = jax.jit(lambda s: compute_eam_forces_pallas_mt(
        s, eam_run, nt, count_neighbors=True))(sc)
    m = np.asarray(sc.mask)
    f1 = np.asarray(r_ref.force)[m]
    f2 = np.asarray(r_pal.force)[m]
    scale = np.abs(f1).max() + 1.0
    assert np.abs(f1 - f2).max() / scale < 1e-4
    r1 = np.asarray(r_ref.rho)[m]
    r2 = np.asarray(r_pal.rho)[m]
    assert np.abs(r1 - r2).max() / (np.abs(r1).max() + 1.0) < 1e-4
    e1_ = np.asarray(r_ref.epot)[m]
    e2_ = np.asarray(r_pal.epot)[m]
    assert np.abs(e1_ - e2_).max() < 2e-4 * (np.abs(e1_).max() + 1.0)
    v1, v2 = float(r_ref.virial), float(r_pal.virial)
    assert abs(v1 - v2) < 2e-3 * (abs(v1) + 1.0)
    assert np.array_equal(np.asarray(r_ref.num_neighs)[m],
                          np.asarray(r_pal.num_neighs)[m])


def test_pallas_dead_slots_are_silent():
    """Dead slots (capacity padding) must produce zero force/epot."""
    sc = _scene(temp=0.0)
    r = jax.jit(lambda s: compute_eam_forces_pallas(s, EAM))(sc)
    dead = ~np.asarray(sc.mask)
    assert np.abs(np.asarray(r.force)[dead]).max() == 0.0
    assert np.abs(np.asarray(r.epot)[dead]).max() == 0.0


def test_pallas_energy_conservation_short_md():
    sc = _scene(temp=0.04)
    params = integrate.IntegratorParams(timestep=jnp.float32(0.1))

    @jax.jit
    def step(s):
        r = compute_eam_forces_pallas(s, EAM)
        s = s.replace(force=r.force, epot=r.epot)
        s, stats = integrate.nve(s, params)
        return s, jnp.sum(r.epot), stats

    e0 = None
    for i in range(60):
        sc, ep, stats = step(sc)
        et = float(ep + stats.tot_kin_energy)
        if e0 is None:
            e0 = et
    assert abs(et - e0) / abs(e0) < 5e-4


def test_pair_pallas_matches_oracle():
    from imd_tpu.models.potential import lj_table, to_fastpoly
    from imd_tpu.ops.forces_fast import compute_pair_forces_fast
    from imd_tpu.ops.forces_pallas import compute_pair_forces_pallas
    pot = to_fastpoly(lj_table(1.0, 1.0, 2.5, dtype=jnp.float32), deg=12,
                      vcap=20.0)
    pos, typ, diag = fcc((5, 4, 4), 1.38)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float32)
    grid = choose_grid(box, 2.5, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    sc = make_scene(grid, pos, dtype=jnp.float32)
    sc = sc.replace(pos=sc.pos + 0.03 * jax.random.normal(
        jax.random.PRNGKey(4), sc.pos.shape))
    r1 = jax.jit(lambda s: compute_pair_forces_fast(s, pot, 1,
                                                    count_neighbors=True))(sc)
    r2 = jax.jit(lambda s: compute_pair_forces_pallas(
        s, pot, count_neighbors=True))(sc)
    m = np.asarray(sc.mask)
    f1 = np.asarray(r1.force)[m]
    f2 = np.asarray(r2.force)[m]
    assert np.abs(f1 - f2).max() / (np.abs(f1).max() + 1) < 1e-4
    e1 = np.asarray(r1.epot)[m]
    e2 = np.asarray(r2.epot)[m]
    assert np.abs(e1 - e2).max() < 1e-4 * (np.abs(e1).max() + 1)
    assert np.array_equal(np.asarray(r1.num_neighs)[m],
                          np.asarray(r2.num_neighs)[m])


def test_forces_only_path_matches_full():
    """need_energy=False must produce identical forces and rho."""
    scene = _scene()
    scene = scene.replace(pos=scene.pos + 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), scene.pos.shape))
    full = compute_eam_forces_pallas(scene, EAM, count_neighbors=True)
    fast = compute_eam_forces_pallas(scene, EAM, need_energy=False)
    f1 = np.asarray(full.force)
    f2 = np.asarray(fast.force)
    # same pairs, different f32 evaluation order (grad-only Horner):
    # agreement to engine noise relative to the force scale
    assert np.abs(f1 - f2).max() / (np.abs(f1).max() + 1) < 1e-4
    np.testing.assert_allclose(np.asarray(fast.rho), np.asarray(full.rho),
                               rtol=1e-4, atol=1e-5)
    assert float(jnp.sum(jnp.abs(fast.epot))) == 0.0


def test_pallas2_grid_engine_matches_v1():
    """v2 (offsets on the pallas grid, output revisiting) == v1 exactly."""
    from imd_tpu.ops.forces_pallas import (compute_eam_forces_pallas,
                                           compute_eam_forces_pallas2)

    sc = _scene()
    sc = sc.replace(pos=sc.pos + 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), sc.pos.shape))
    r1 = compute_eam_forces_pallas(sc, EAM, count_neighbors=True)
    r2 = compute_eam_forces_pallas2(sc, EAM, count_neighbors=True)
    np.testing.assert_array_equal(np.asarray(r1.force),
                                  np.asarray(r2.force))
    np.testing.assert_array_equal(np.asarray(r1.epot),
                                  np.asarray(r2.epot))
    np.testing.assert_array_equal(np.asarray(r1.num_neighs),
                                  np.asarray(r2.num_neighs))


@pytest.mark.parametrize("pbc", [(1, 1, 1), (0, 1, 1)])
def test_win_engine_matches_split(pbc):
    """forces_win (in-kernel windowed neighbor views) must reproduce the
    roll-based split engine to f64 rounding: identical sweep math; the
    view construction and the i-side reduction order differ (the win
    engine accumulates pair grids across sweeps and reduces once)."""
    from imd_tpu.ops.forces_pallas import eam_kernels_cl_split, prep_neighbors
    from imd_tpu.ops.forces_win import eam_kernels_win_split
    sc = _scene(pbc=pbc)
    sc = sc.replace(pos=sc.pos + 0.05 * jax.random.normal(
        jax.random.PRNGKey(4), sc.pos.shape))
    xi, nbr, mask = prep_neighbors(sc)
    F1, rho1, nn1 = jax.jit(
        lambda xi, nbr, mask: eam_kernels_cl_split(
            xi, nbr, mask, EAM, sc.grid,
            count_neighbors=True))(xi, nbr, mask)
    F2, rho2, nn2 = jax.jit(
        lambda xi, mask: eam_kernels_win_split(
            xi, mask, EAM, sc.grid, count_neighbors=True))(xi, mask)
    assert float(jnp.abs(F1 - F2).max()) < 1e-10
    assert float(jnp.abs(rho1 - rho2).max()) < 1e-10
    assert float(jnp.abs(nn1 - nn2).max()) == 0.0


def test_optimize_grid_dims_beats_max_cells():
    """The dense-sweep grid chooser must return a feasible grid (edge >=
    cutoff+skin, no overflow at its capacity) whose cap^2*NC cost is <=
    the classical max-cells choice."""
    from imd_tpu.ops.geometry import CellGrid, optimize_grid_dims
    pos, typ, diag = fcc((12, 12, 12), 4.05)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float32)
    grid0 = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    grid0 = with_capacity(grid0, measured_capacity(
        grid0, pos, safety=1.0, extra=1))
    dims, cap = optimize_grid_dims(box, 5.0, 0.5, pos,
                                   dtype=jnp.float32)
    reach = 5.5
    for d in range(3):
        assert diag[d] / dims[d] >= reach - 1e-6
    cost0 = grid0.capacity ** 2 * np.prod(grid0.dims)
    cost1 = cap ** 2 * np.prod(dims)
    assert cost1 <= cost0
    g = CellGrid(box=box, dims=dims, capacity=cap, cutoff=5.0, skin=0.5)
    sc = make_scene(g, pos, mass=np.full(len(pos), 26.9815),
                    dtype=jnp.float32)
    assert int(sc.overflow) == 0


def test_win_engine_vacuum_block_skip():
    """A half-vacuum box (the ablation geometry) must produce identical
    forces with the windowed engine's empty-block skip active: empty
    lane blocks write zeros and are never swept."""
    from imd_tpu.ops.forces_pallas import eam_kernels_cl_split, prep_neighbors
    from imd_tpu.ops.forces_win import eam_kernels_win_split

    pos, typ, diag = fcc((4, 3, 3), 4.05)
    box = Box.create([diag[0] * 2.5, 0, 0], [0, diag[1], 0],
                     [0, 0, diag[2]], pbc=(0, 1, 1), dtype=jnp.float32)
    pos = pos + np.array([diag[0] * 1.5, 0.0, 0.0])   # film at the rear
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.9815),
                    dtype=jnp.float32)
    sc = sc.replace(pos=sc.pos + 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), sc.pos.shape))
    xi, nbr, mask = prep_neighbors(sc)
    # the geometry really has empty cells (vacuum ahead of the film)
    occ = np.asarray(jnp.sum(mask, axis=0))
    assert (occ == 0).sum() > occ.size // 3
    F1, rho1, nn1 = jax.jit(
        lambda xi, nbr, mask: eam_kernels_cl_split(
            xi, nbr, mask, EAM, sc.grid,
            count_neighbors=True))(xi, nbr, mask)
    F2, rho2, nn2 = jax.jit(
        lambda xi, mask: eam_kernels_win_split(
            xi, mask, EAM, sc.grid, count_neighbors=True,
            block=64))(xi, mask)
    assert float(jnp.abs(F1 - F2).max()) < 1e-10
    assert float(jnp.abs(rho1 - rho2).max()) < 1e-10
    assert float(jnp.abs(nn1 - nn2).max()) == 0.0


@pytest.mark.parametrize("pbc", [(1, 1, 1), (0, 1, 1)])
def test_win_mt_engine_matches_roll_mt(pbc):
    """The windowed multi-type engine (in-kernel views + one-hot column
    select) must reproduce the roll-based mt engine: bit-equal densities
    and neighbor counts, forces to f32 summation round-off."""
    from imd_tpu.models.potential import (EAMPotential, analytic_eam,
                                          to_fastpoly)
    from imd_tpu.models.potential import PotTable
    from imd_tpu.ops.forces_fast import _to_cl
    from imd_tpu.ops.forces_pallas import SENTINEL_DEAD, eam_kernels_cl_mt
    from imd_tpu.ops.forces_win import eam_kernels_win_split_mt

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

    eam2 = EAMPotential(pair=scale_cols(e1.pair, [1.0, 0.8, 0.8, 0.6]),
                        rho=scale_cols(e1.rho, [1.0, 0.9, 0.7, 0.5]),
                        embed=scale_cols(e1.embed, [1.0, 0.75]))
    eam_run = EAMPotential(pair=to_fastpoly(eam2.pair),
                           rho=to_fastpoly(eam2.rho),
                           embed=to_fastpoly(eam2.embed, vcap=1e9))

    sc = _scene(pbc=pbc)
    key = jax.random.PRNGKey(9)
    rt = jax.random.bernoulli(key, 0.4, sc.type.shape).astype(jnp.int32)
    sc = sc.replace(type=jnp.where(sc.mask, rt, -1),
                    pos=sc.pos + 0.05 * jax.random.normal(
                        jax.random.PRNGKey(1), sc.pos.shape))
    dims = sc.grid.dims
    typc = _to_cl(sc.type, dims)
    maskc = typc >= 0
    xi = jnp.where(maskc[:, None, :], _to_cl(sc.pos, dims), SENTINEL_DEAD)
    F1, _, r1, n1, _, _ = eam_kernels_cl_mt(
        xi, typc, maskc, eam_run, sc.grid, nt,
        count_neighbors=True, need_energy=False)
    F2, r2, n2 = eam_kernels_win_split_mt(
        xi, typc, maskc, eam_run, sc.grid, nt, count_neighbors=True)
    assert float(jnp.abs(r1 - r2).max()) == 0.0
    assert float(jnp.abs(n1 - n2).max()) == 0.0
    scale = float(jnp.abs(F1).max()) + 1.0
    assert float(jnp.abs(F1 - F2).max()) / scale < 1e-5
