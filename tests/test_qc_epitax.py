"""Quasicrystal generator, FEFL, EPITAX, bond-boost
(imd_qc.c, imd_fefl.c, imd_epitax.c, imd_bboost.c)."""

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu import integrate
from imd_tpu.models.potential import lj_table
from imd_tpu.ops.forces import compute_pair_forces
from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, \
    with_capacity
from imd_tpu.scene import make_scene
from imd_tpu.utils.generate import fcc, generate_atoms
from imd_tpu.utils.qc import generate_qc, qc_counts


def test_qc_counts_match_analytic():
    for appr in [(1, 1, 1), (2, 2, 2), (1, 2, 3)]:
        np_, no, na, nb, nc = qc_counts(appr)
        pos, typ, box = generate_qc(appr)
        assert len(pos) == na + nb + nc, appr
        counts = np.bincount(typ, minlength=2)
        assert counts[0] == na + nb and counts[1] == nc, appr
        # all atoms inside the periodic box
        assert (pos > 0).all() and (pos < box).all()
        # icosahedral approximant: no two atoms closer than ~0.3 edge
        from scipy.spatial import cKDTree
        t = cKDTree(pos, boxsize=box)
        d, _ = t.query(pos, k=2)
        assert d[:, 1].min() > 0.3


def test_qc_via_generate_atoms_dispatch():
    pos, typ, box = generate_atoms("_qc", (1, 1, 1), 2.0)
    assert len(pos) == 168
    np.testing.assert_allclose(box, 2.0 * 5.50570, rtol=1e-4)


def _lj_scene(cells=(4, 4, 4), temp=0.02):
    pos, typ, diag = fcc(cells, 1.38)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    grid = choose_grid(box, 2.5, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    scene = make_scene(grid, pos, dtype=jnp.float64)
    if temp > 0:
        scene = integrate.maxwell(scene, temp, jax.random.PRNGKey(0))
    return scene, np.asarray(pos), diag


def test_fefl_limits_and_energy():
    from imd_tpu.models.fefl import calc_fefl
    scene, pos, diag = _lj_scene(temp=0.05)
    pot = lj_table(1.0, 1.0, 2.5, dtype=jnp.float64)
    res = compute_pair_forces(scene, pot)
    scene = scene.replace(force=res.force, epot=res.epot)
    ref = jnp.asarray(pos)
    # lambda = 0: unchanged forces, but harm energy measured
    s0, harm = calc_fefl(scene, ref, [3.0], jnp.float64(0.0))
    np.testing.assert_allclose(np.asarray(s0.force), np.asarray(res.force))
    assert float(harm) == 0.0 if np.allclose(
        np.asarray(scene.pos)[np.asarray(scene.mask)], 0) else float(harm) >= 0
    # lambda = 1: pure Einstein forces -k d
    s1, harm1 = calc_fefl(scene, ref, [3.0], jnp.float64(1.0))
    m = np.asarray(scene.mask)
    d = np.asarray(scene.pos - ref[scene.id])
    np.testing.assert_allclose(np.asarray(s1.force)[m], (-3.0 * d)[m],
                               atol=1e-12)
    np.testing.assert_allclose(float(harm1),
                               (3.0 * (d[m] ** 2).sum()), rtol=1e-10)


def test_epitax_deposition_cycle():
    from imd_tpu.models import epitax
    scene, pos, diag = _lj_scene(cells=(4, 4, 2), temp=0.0)
    n0 = int(scene.n_atoms())
    lvl = epitax.substrate_level(scene)
    st = epitax.EpitaxState(height=lvl + 3.0, speed=0.0, level=1.0,
                            cutoff=1.2)
    rng = np.random.default_rng(0)
    scene2 = scene
    for k in range(5):
        scene2, ok = epitax.create_atom(scene2, st, rng, typ=0, mass=1.0,
                                        temp=0.1)
        assert ok
    assert int(scene2.n_atoms()) == n0 + 5
    # new atoms fly downward
    flat = scene2.flatten_atoms()
    m = np.asarray(flat["mask"])
    ids = np.asarray(flat["id"])[m]
    mom = np.asarray(flat["mom"])[m]
    new = ids > st.sub_n
    assert new.sum() == 5
    assert (mom[new][:, 2] < 0).all()
    np.testing.assert_allclose(np.abs(mom[new][:, 2]),
                               np.sqrt(3 * 0.1 * 1.0), rtol=1e-6)
    # trial positions respect the cutoff
    p = np.asarray(flat["pos"])[m]
    from scipy.spatial import cKDTree
    t = cKDTree(p[~new])
    d, _ = t.query(p[new])
    assert d.min() >= 1.2
    # deletion of the top layer removes the beam atoms placed high up
    sc3, killed = epitax.delete_top_atoms(scene2)
    assert killed >= 5 or int(sc3.n_atoms()) < n0 + 5


def test_bond_boost_bias_and_clock():
    from imd_tpu.models import bboost
    scene, pos, diag = _lj_scene(temp=0.0)
    n = len(pos)
    bi, bj, r0 = bboost.init_bboost(scene, rcut=1.1)
    assert len(r0) > 0
    # unstrained: full bias dVmax, zero force
    sc2, dv, eps = bboost.bond_boost(scene, bi, bj, r0,
                                     jnp.float64(0.5), 0.25, n)
    np.testing.assert_allclose(float(dv), 0.5, rtol=1e-10)
    assert float(eps) < 1e-12
    np.testing.assert_allclose(np.asarray(sc2.force), 0.0, atol=1e-10)
    # stretch box+positions by 5%: every bond strained eps = 0.05,
    # bias drops to dVmax (1 - (0.05/0.25)^2) = 0.96 dVmax
    box2 = scene.grid.box
    grid2 = scene.grid.replace(box=box2.replace(h=box2.h * 1.05))
    scene_s = scene.replace(pos=scene.pos * 1.05, grid=grid2)
    sc3, dv3, eps3 = bboost.bond_boost(scene_s, bi, bj, r0,
                                       jnp.float64(0.5), 0.25, n)
    np.testing.assert_allclose(float(dv3), 0.5 * (1 - 0.2 ** 2), rtol=1e-6)
    np.testing.assert_allclose(float(eps3), 0.05, rtol=1e-6)
    assert np.abs(np.asarray(sc3.force)).max() > 0
    # clock multiplier
    f = bboost.boost_factor(dv, jnp.float64(0.05))
    np.testing.assert_allclose(float(f), np.exp(0.5 / 0.05), rtol=1e-6)


def test_sio2_quartz_generator():
    """generate_SiO2 (imd_generate.c:714): density and bond lengths."""
    import numpy as np
    from imd_tpu.utils.generate import generate_atoms

    pos, typ, diag = generate_atoms("_sio2", (2, 2, 2), 1.0)
    assert len(pos) == 144 and (np.bincount(typ) == [48, 96]).all()
    dens = len(pos) / np.prod(diag)
    assert abs(dens - 0.0796) < 0.002        # alpha quartz 2.65 g/cm^3
    d = pos[None] - pos[:, None]
    r = np.linalg.norm(d, axis=-1) + np.eye(len(pos)) * 9
    sio = r[(typ[:, None] == 0) & (typ[None] == 1)].min()
    assert 1.55 < sio < 1.65                 # Si-O bond ~1.61 A


def test_fefl_param_file_driver(tmp_path):
    """FEFL from a parameter file: spring_rate activates the Einstein
    mixing in the step (imd_main_3d.c:422) and .eng grows the harm_eng
    column (imd_io.c:2266/2549, tot_harm_energy/natoms)."""
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.simulation import Simulation

    out = str(tmp_path / "fefl")
    cfg = SimConfig.from_params(parse_param_text(f"""
coordname   _fcc
outfiles    {out}
box_param   3 3 3
box_unit    1.5874
ntypes      1
masses      1.0
ensemble    nve
timestep    0.004
maxsteps    40
starttemp   0.02
eng_int     20
lj_epsilon  1.0
lj_sigma    1.0
r_cut       2.5
pbc_dirs    1 1 1
seed        3
spring_rate 2.5
lambda      0.3
"""))
    assert cfg.spring_rate == (2.5,)
    assert cfg.fefl_lambda == 0.3
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    assert sim.fefl_ref is not None
    sim.run()
    eng = open(out + ".eng").read().strip().splitlines()
    assert eng[0].split()[-1] == "harm_eng"
    rows = [list(map(float, ln.split())) for ln in eng[1:]]
    # thermal motion against the tether: harm energy grows from ~0
    assert rows[-1][-1] > 0.0
    # tether holds the crystal: no melting at this small T
    assert rows[-1][2] < 0.1


def test_epitax_param_file_driver(tmp_path):
    """EPITAX from a parameter file: beam atoms deposit every
    epitax_rate steps between epitax_startstep and epitax_maxsteps
    (imd_main_3d.c:193-202), claiming dead slots host-side without
    recompiling the step."""
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.simulation import Simulation

    out = str(tmp_path / "epi")
    cfg = SimConfig.from_params(parse_param_text(f"""
coordname   _fcc
outfiles    {out}
box_param   4 4 4
box_unit    1.5874
ntypes      1
masses      1.0
ensemble    nve
timestep    0.004
maxsteps    40
starttemp   0.01
eng_int     40
lj_epsilon  1.0
lj_sigma    1.0
r_cut       2.5
pbc_dirs    1 1 0
seed        5
epitax_rate 10
epitax_type 0
epitax_mass 1.0
epitax_temp 0.05
epitax_cutoff 1.0
epitax_height 5.2
epitax_maxsteps 40
"""))
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    n0 = int(sim.scene.n_atoms())
    state = sim.run()
    n1 = int(state.scene.n_atoms())
    # events at steps 10, 20, 30, 40
    assert n1 == n0 + 4
    # deposited atoms carry fresh ids above the substrate's
    flat = state.scene.flatten_atoms()
    m = np.asarray(flat["mask"])
    ids = np.asarray(flat["id"])[m]
    assert ids.max() >= n0 + 3


def test_bboost_param_file_driver(tmp_path):
    """Bond-boost hyperdynamics from a parameter file: bb_* tags add the
    Miron-Fichthorn bias to every step and the .eng bb_boosted_time
    column advances faster than wall time (boost factor exp(dV/T) > 1
    while all bond strains stay below bb_epscrit)."""
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.simulation import Simulation

    out = str(tmp_path / "bb")
    cfg = SimConfig.from_params(parse_param_text(f"""
coordname   _fcc
outfiles    {out}
box_param   3 3 3
box_unit    1.5874
ntypes      1
masses      1.0
ensemble    nve
timestep    0.004
maxsteps    40
starttemp   0.02
eng_int     20
lj_epsilon  1.0
lj_sigma    1.0
r_cut       2.5
pbc_dirs    1 1 1
seed        7
bb_rcut     1.2
bb_tot_bV   0.4
bb_epscrit  0.25
"""))
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    assert sim._bb_tables is not None
    # fcc nearest-neighbor bond count: 6 per atom (half pairs) at
    # alat/sqrt(2) = 1.1224 < 1.2
    n_atoms = 4 * 3 ** 3
    assert int(sim._bb_tables[0].shape[0]) == 6 * n_atoms
    state = sim.run()
    eng = open(out + ".eng").read().strip().splitlines()
    assert eng[0].split()[-1] == "bb_boosted_time"
    bt = float(eng[-1].split()[-1])
    wall = 40 * 0.004
    assert bt > wall          # boosted clock runs ahead of MD time
    assert float(eng[-1].split()[2]) < 0.1   # crystal intact
