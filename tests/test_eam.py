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


def test_eeam_fast_engine_matches_oracle():
    """compute_eam_forces_fast(eeam_embed=...) == the oracle engine."""
    import numpy as _np
    from imd_tpu.models.potential import _make_table
    from imd_tpu.ops.forces_fast import compute_eam_forces_fast
    from imd_tpu.ops.geometry import Box, choose_grid, with_capacity

    eam = analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39, dtype=jnp.float64)
    ps = _np.linspace(0.0, 50.0, 400)
    m_tab = _make_table([0.02 * ps + 0.001 * ps ** 2], [0.0], [50.0],
                        [ps[1] - ps[0]], dtype=jnp.float64)
    pos, _, diag = fcc((4, 3, 3), 4.05)
    rng = np.random.default_rng(1)
    pos = pos + rng.normal(0, 0.06, pos.shape)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    grid = with_capacity(choose_grid(box, 5.0, skin=0.4, n_atoms=len(pos)),
                         16)
    sc = make_scene(grid, pos, dtype=jnp.float64)
    a = compute_eam_forces(sc, eam, 1, eeam_embed=m_tab)
    b = compute_eam_forces_fast(sc, eam, 1, eeam_embed=m_tab)
    assert float(jnp.max(jnp.abs(a.force - b.force))) < 1e-10
    assert float(jnp.max(jnp.abs(a.epot - b.epot))) < 1e-10
    assert float(jnp.max(jnp.abs(a.eeam_p - b.eeam_p))) < 1e-10
    assert abs(float(a.virial - b.virial)) < 1e-8


def test_eeam_param_file_driver(tmp_path):
    """eeam_energy_file dispatches the EEAM term from a parameter file
    (imd_param.c:2837) and the checkpoint carries the reference's
    default EAM columns eam_rho + eam_p (imd_io.c:3312-3315), with
    `norhoh 1` suppressing them (NORHOH flag)."""
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.io.chkpt import data_column, read_chkpt
    from imd_tpu.models.potential import _make_table, write_pot_table
    from imd_tpu.simulation import Simulation

    eam = analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39)
    d = tmp_path
    write_pot_table(eam.pair, str(d / "pair.pt"))
    write_pot_table(eam.rho, str(d / "rho.pt"))
    write_pot_table(eam.embed, str(d / "embed.pt"))
    ps = np.linspace(0.0, 80.0, 300)
    write_pot_table(_make_table([0.01 * ps], [0.0], [80.0],
                                [ps[1] - ps[0]], dtype=jnp.float64),
                    str(d / "emod.pt"))
    base = f"""
coordname   _fcc
box_param   3 3 3
box_unit    4.05
ntypes      1
masses      26.9815
ensemble    nve
timestep    0.02
maxsteps    20
starttemp   0.02
eng_int     10
checkpt_int 20
seed        4
core_potential_file pair.pt
embedding_energy_file embed.pt
el_density_file rho.pt
eeam_energy_file emod.pt
"""
    cfg = SimConfig.from_params(parse_param_text(
        base + f"outfiles {d / 'ee'}\n"))
    sim = Simulation(cfg, workdir=str(d), dtype=jnp.float64)
    assert sim.eeam_embed is not None
    sim.run()
    eng = [ln.split() for ln in
           open(str(d / "ee.eng")).read().strip().splitlines()[1:]]
    etots = [float(r[1]) + 1.5 * float(r[2]) for r in eng]
    assert abs(etots[-1] - etots[0]) < 5e-6 * abs(etots[0])
    ck = read_chkpt(str(d / "ee.00001.chkpt"))
    rho = data_column(ck, "eam_rho")
    p2 = data_column(ck, "eam_p")
    assert rho is not None and rho.min() > 0.1
    assert p2 is not None and np.allclose(p2, rho ** 2 / 12, rtol=0.5)
    # norhoh suppresses the density columns
    cfg2 = SimConfig.from_params(parse_param_text(
        base + f"outfiles {d / 'nh'}\nnorhoh 1\n"))
    sim2 = Simulation(cfg2, workdir=str(d), dtype=jnp.float64)
    sim2.run()
    ck2 = read_chkpt(str(d / "nh.00001.chkpt"))
    assert data_column(ck2, "eam_rho") is None
