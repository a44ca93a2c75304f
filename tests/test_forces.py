"""Cell-stencil forces vs O(N^2) oracle; Newton's 3rd law; energy conservation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu import integrate
from imd_tpu.models.potential import lj_table
from imd_tpu.ops.forces import (compute_pair_forces, pair_forces_n2)
from imd_tpu.ops.geometry import Box, choose_grid
from imd_tpu.scene import make_scene, rebin
from imd_tpu.utils.generate import fcc


FORCES = jax.jit(compute_pair_forces, static_argnames=("ntypes", "count_neighbors"))
ORACLE = jax.jit(pair_forces_n2, static_argnames=("ntypes", "cutoff"))
REBIN = jax.jit(rebin)


def _lj_scene(nc=(6, 6, 6), alat=1.5874, jitter=0.05, seed=0, pbc=(1, 1, 1),
              cutoff=2.5):
    # fcc at reduced density; alat chosen so nn distance ~ 2^(1/6);
    # box must exceed 2*cutoff for the min-image oracle to be valid
    pos, typ, box_diag = fcc(nc, alat)
    rng = np.random.default_rng(seed)
    pos = pos + rng.normal(scale=jitter, size=pos.shape)
    box = Box.create([box_diag[0], 0, 0], [0, box_diag[1], 0],
                     [0, 0, box_diag[2]], pbc=pbc, dtype=jnp.float64)
    pot = lj_table(1.0, 1.0, cutoff, res=4000, dtype=jnp.float64)
    grid = choose_grid(box, cutoff, skin=0.3, n_atoms=len(pos))
    scene = make_scene(grid, pos, type=typ, mass=np.ones(len(pos)),
                       dtype=jnp.float64)
    return scene, pot, pos


def test_binning_preserves_atoms():
    scene, pot, pos = _lj_scene()
    assert int(scene.overflow) == 0
    assert int(scene.n_atoms()) == len(pos)
    # every original atom id present exactly once
    flat = scene.flatten_atoms()
    ids = np.asarray(flat["id"])[np.asarray(flat["mask"])]
    assert sorted(ids.tolist()) == list(range(len(pos)))


def test_stencil_matches_n2_oracle():
    scene, pot, _ = _lj_scene()
    res = FORCES(scene, pot, ntypes=1)
    flat = scene.flatten_atoms()
    mask = np.asarray(flat["mask"])
    F_ref, epot_ref, virial_ref = ORACLE(
        flat["pos"], flat["type"], flat["mask"], scene.grid.box, pot,
        cutoff=scene.grid.cutoff)
    F = np.asarray(res.force.reshape(-1, 3))[mask]
    order = np.argsort(np.asarray(flat["id"])[mask])
    F_ref_m = np.asarray(F_ref)[mask]
    np.testing.assert_allclose(F, F_ref_m, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.epot.reshape(-1))[mask],
        np.asarray(epot_ref)[mask], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(res.virial), float(virial_ref),
                               rtol=1e-9)


def test_forces_sum_to_zero():
    scene, pot, _ = _lj_scene()
    res = FORCES(scene, pot, ntypes=1)
    total = np.asarray(jnp.sum(res.force, axis=(0, 1, 2, 3)))
    np.testing.assert_allclose(total, 0.0, atol=1e-9)


def test_open_boundaries():
    scene, pot, _ = _lj_scene(pbc=(0, 0, 0))
    res = FORCES(scene, pot, ntypes=1)
    flat = scene.flatten_atoms()
    mask = np.asarray(flat["mask"])
    F_ref, epot_ref, _ = ORACLE(
        flat["pos"], flat["type"], flat["mask"], scene.grid.box, pot,
        cutoff=scene.grid.cutoff)
    np.testing.assert_allclose(
        np.asarray(res.force.reshape(-1, 3))[mask],
        np.asarray(F_ref)[mask], rtol=1e-9, atol=1e-9)


def test_nve_energy_conservation():
    scene, pot, _ = _lj_scene(nc=(3, 3, 3), jitter=0.0)
    key = jax.random.PRNGKey(0)
    scene = integrate.maxwell(scene, 0.02, key)
    params = integrate.IntegratorParams(timestep=jnp.float64(0.002))

    @jax.jit
    def step(scene):
        res = FORCES(scene, pot, ntypes=1)
        scene = scene.replace(force=res.force, epot=res.epot)
        scene, stats = integrate.nve(scene, params)
        return scene, jnp.sum(res.epot), stats

    energies = []
    for i in range(200):
        scene, epot, stats = step(scene)
        energies.append(float(epot) + float(stats.tot_kin_energy))
        if i % 50 == 0:
            scene = REBIN(scene)
    e = np.asarray(energies)
    drift = abs(e[-1] - e[0]) / abs(e[0])
    assert drift < 1e-5, f"energy drift {drift}"
    assert int(scene.overflow) == 0


def test_rebin_after_motion():
    scene, pot, _ = _lj_scene(jitter=0.02)
    key = jax.random.PRNGKey(1)
    scene = integrate.maxwell(scene, 0.1, key)
    params = integrate.IntegratorParams(timestep=jnp.float64(0.005))

    @jax.jit
    def step(scene):
        res = FORCES(scene, pot, ntypes=1)
        scene = scene.replace(force=res.force, epot=res.epot)
        scene, stats = integrate.nve(scene, params)
        return scene

    n0 = int(scene.n_atoms())
    for i in range(50):
        scene = step(scene)
        scene = REBIN(scene)
    assert int(scene.n_atoms()) == n0
    assert int(scene.overflow) == 0
    # after substantial motion forces still match the oracle
    res = FORCES(scene, pot, ntypes=1)
    flat = scene.flatten_atoms()
    mask = np.asarray(flat["mask"])
    F_ref, _, _ = ORACLE(flat["pos"], flat["type"], flat["mask"],
                                 scene.grid.box, pot, cutoff=scene.grid.cutoff)
    np.testing.assert_allclose(np.asarray(res.force.reshape(-1, 3))[mask],
                               np.asarray(F_ref)[mask], rtol=1e-8, atol=1e-8)


def test_asympot_half_bonds_use_own_columns():
    """ASYMPOT (do_forces, imd_forces_eam2.c:31-140): with an asymmetric
    cross-type pair table, atom i takes force/energy from column
    t_i*nt+t_j and atom j from the transposed column; the virial is the
    mean of the two half-gradients."""
    import numpy as np

    from imd_tpu.models.potential import _make_table
    from imd_tpu.ops.forces import compute_pair_forces
    from imd_tpu.ops.geometry import Box, choose_grid
    from imd_tpu.scene import make_scene

    # smooth r^2-sampled columns: phi(r2) = a*(r2 - r2c)^2 inside r2c
    r2 = np.linspace(0.25, 16.0, 800)
    r2c = 16.0

    def col(a):
        return a * (r2 - r2c) ** 2

    # col order [00, 01, 10, 11]; cross columns differ by 2x
    a01, a10 = 0.03, 0.06
    pot = _make_table([col(0.02), col(a01), col(a10), col(0.02)],
                      [r2[0]] * 4, [r2c] * 4, [r2[1] - r2[0]] * 4,
                      dtype=jnp.float64)
    box = Box.create([12.0, 0, 0], [0, 12.0, 0], [0, 0, 12.0],
                     dtype=jnp.float64)
    pos = np.array([[4.0, 6.0, 6.0], [6.5, 6.0, 6.0]])   # r = 2.5
    grid = choose_grid(box, 4.0, skin=0.3, n_atoms=2)
    sc = make_scene(grid, jnp.asarray(pos), type=jnp.asarray([0, 1]),
                    dtype=jnp.float64)
    res = compute_pair_forces(sc, pot, ntypes=2, asympot=True)
    ids = np.asarray(sc.id).reshape(-1)
    order = np.argsort(ids[ids >= 0])
    ep = np.asarray(res.epot).reshape(-1)[ids >= 0][order]
    F = np.asarray(res.force).reshape(-1, 3)[ids >= 0][order]
    rr2 = 2.5 ** 2
    phi = lambda a: a * (rr2 - r2c) ** 2
    dphi2 = lambda a: 2 * a * (rr2 - r2c)       # d phi / d r2
    assert abs(ep[0] - 0.5 * phi(a01)) < 1e-8
    assert abs(ep[1] - 0.5 * phi(a10)) < 1e-8
    # engine grad convention: F_i = -sum 2*dphi/dr2 * dr ... the table
    # interp returns 2*dV/d(r2) (= (1/r) dV/dr); check magnitudes
    assert abs(F[0, 0] - (-2 * dphi2(a01)) * (pos[0, 0] - pos[1, 0])) < 1e-6
    assert abs(F[1, 0] - (2 * dphi2(a10)) * (pos[0, 0] - pos[1, 0])) < 1e-6
    # symmetric table: asympot is a no-op
    pot_s = _make_table([col(0.02), col(a01), col(a01), col(0.02)],
                        [r2[0]] * 4, [r2c] * 4, [r2[1] - r2[0]] * 4,
                        dtype=jnp.float64)
    ra = compute_pair_forces(sc, pot_s, ntypes=2, asympot=True)
    rb = compute_pair_forces(sc, pot_s, ntypes=2, asympot=False)
    assert float(jnp.max(jnp.abs(ra.force - rb.force))) < 1e-12
    assert abs(float(ra.virial - rb.virial)) < 1e-12
