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


def test_eeam_second_embedding_energy_force_consistency():
    """EEAM (EAM_DM terms, imd_forces_nbl.c:878-882): forces must be the
    exact gradient of epot including the M(p = sum rho^2) term."""
    import numpy as np
    from imd_tpu.models.potential import PotTable, analytic_eam
    from imd_tpu.ops.forces import compute_eam_forces
    from imd_tpu.ops.geometry import Box, choose_grid, with_capacity
    from imd_tpu.scene import make_scene
    from imd_tpu.utils.generate import fcc

    eam = analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39, dtype=jnp.float64)
    # simple analytic second embedding M(p) = 0.05 * p sampled as a table
    import numpy as _np
    from imd_tpu.models.potential import _make_table
    ps = _np.linspace(0.0, 50.0, 400)
    m_tab = _make_table([0.05 * ps], [0.0], [50.0],
                        [ps[1] - ps[0]], dtype=jnp.float64)

    pos, _, diag = fcc((3, 3, 3), 4.05)
    rng = np.random.default_rng(0)
    pos = pos + rng.normal(0, 0.05, pos.shape)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    grid = with_capacity(grid, 24)

    def etot(p):
        sc = make_scene(grid, p, dtype=jnp.float64)
        res = compute_eam_forces(sc, eam, 1, eeam_embed=m_tab)
        return float(jnp.sum(res.epot)), res, sc

    e0, res, sc = etot(pos)
    ids = np.asarray(sc.id).reshape(-1)
    f = np.asarray(res.force).reshape(-1, 3)[ids >= 0]
    f = f[np.argsort(ids[ids >= 0])]
    h = 1e-6
    for idx in [(0, 0), (17, 2)]:
        d = np.zeros(pos.shape)
        d[idx] = h
        fd = -(etot(pos + d)[0] - etot(pos - d)[0]) / (2 * h)
        assert abs(fd - f[idx]) < 1e-6 * max(1.0, abs(fd)), idx
    # and the M term actually contributes
    res0 = compute_eam_forces(make_scene(grid, pos, dtype=jnp.float64),
                              eam, 1)
    assert float(jnp.sum(res.epot)) > float(jnp.sum(res0.epot))
