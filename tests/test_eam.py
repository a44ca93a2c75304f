"""EAM2 stencil forces vs O(N^2) oracle and vs autodiff; NVE conservation."""

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu import integrate
from imd_tpu.models.potential import analytic_eam
from imd_tpu.ops.forces import compute_eam_forces, eam_forces_n2
from imd_tpu.ops.geometry import Box, choose_grid
from imd_tpu.scene import make_scene, rebin
from imd_tpu.utils.generate import fcc

EAM_FORCES = jax.jit(compute_eam_forces, static_argnames=("ntypes",))
EAM_ORACLE = jax.jit(eam_forces_n2, static_argnames=("ntypes", "cutoff"))


def _eam_scene(nc=(4, 4, 4), alat=3.615, jitter=0.08, seed=3, pbc=(1, 1, 1),
               cutoff=5.0):
    pos, typ, box_diag = fcc(nc, alat)
    rng = np.random.default_rng(seed)
    pos = pos + rng.normal(scale=jitter, size=pos.shape)
    box = Box.create([box_diag[0], 0, 0], [0, box_diag[1], 0],
                     [0, 0, box_diag[2]], pbc=pbc, dtype=jnp.float64)
    eam = analytic_eam(r_cut=cutoff, res=8000, dtype=jnp.float64)
    grid = choose_grid(box, cutoff, skin=0.5, n_atoms=len(pos))
    scene = make_scene(grid, pos, type=typ, mass=np.full(len(pos), 63.55),
                       dtype=jnp.float64)
    return scene, eam


def test_eam_stencil_matches_oracle():
    scene, eam = _eam_scene()
    res = EAM_FORCES(scene, eam, ntypes=1)
    flat = scene.flatten_atoms()
    mask = np.asarray(flat["mask"])
    F_ref, epot_ref, virial_ref = EAM_ORACLE(
        flat["pos"], flat["type"], flat["mask"], scene.grid.box, eam,
        cutoff=scene.grid.cutoff)
    np.testing.assert_allclose(np.asarray(res.force.reshape(-1, 3))[mask],
                               np.asarray(F_ref)[mask], rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.epot.reshape(-1))[mask],
                               np.asarray(epot_ref)[mask], rtol=1e-8)
    np.testing.assert_allclose(float(res.virial), float(virial_ref), rtol=1e-8)
    # rho positive for all real atoms in a crystal
    rho = np.asarray(res.rho.reshape(-1))[mask]
    assert (rho > 1.0).all()


def test_eam_force_is_minus_grad_energy():
    """EAM stencil force == -d(total epot)/dx by autodiff on the oracle."""
    scene, eam = _eam_scene(nc=(3, 3, 3), jitter=0.05)
    flat = scene.flatten_atoms()
    mask = np.asarray(flat["mask"])

    def etot(pos):
        _, epot, _ = eam_forces_n2(pos, flat["type"], flat["mask"],
                                   scene.grid.box, eam,
                                   cutoff=scene.grid.cutoff)
        return jnp.sum(epot)

    g = jax.jit(jax.grad(etot))(flat["pos"])
    res = EAM_FORCES(scene, eam, ntypes=1)
    np.testing.assert_allclose(np.asarray(res.force.reshape(-1, 3))[mask],
                               -np.asarray(g)[mask], rtol=1e-7, atol=1e-8)


def test_eam_momentum_conservation():
    scene, eam = _eam_scene()
    res = EAM_FORCES(scene, eam, ntypes=1)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(res.force, axis=(0, 1, 2, 3))), 0.0, atol=1e-9)


def test_eam_nve_energy_conservation():
    scene, eam = _eam_scene(nc=(3, 3, 3), jitter=0.0)
    key = jax.random.PRNGKey(7)
    scene = integrate.maxwell(scene, 0.025, key)   # ~300 K
    params = integrate.IntegratorParams(timestep=jnp.float64(0.1))

    @jax.jit
    def step(scene):
        res = compute_eam_forces(scene, eam, ntypes=1)
        scene = scene.replace(force=res.force, epot=res.epot)
        scene, stats = integrate.nve(scene, params)
        return scene, jnp.sum(res.epot), stats

    from imd_tpu.scene import needs_rebin
    rebin_j = jax.jit(rebin)
    energies = []
    for i in range(150):
        scene, epot, stats = step(scene)
        energies.append(float(epot) + float(stats.tot_kin_energy))
        if bool(needs_rebin(scene, scene.grid.skin)):
            scene = rebin_j(scene)
    e = np.asarray(energies)
    # quadratic table interpolation gives piecewise-discontinuous gradients,
    # so allow bounded oscillation; secular drift must stay small
    spread = (e.max() - e.min()) / abs(e[0])
    assert spread < 5e-5, f"EAM energy spread {spread}"
