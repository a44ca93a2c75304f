"""External indenter/wall potentials (imd_extpot.c)."""

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu import integrate
from imd_tpu.models import extpot
from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, \
    with_capacity
from imd_tpu.scene import make_scene
from imd_tpu.utils.generate import fcc


def _scene(cells=(5, 5, 5), alat=1.38):
    pos, typ, diag = fcc(cells, alat)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    grid = choose_grid(box, 2.5, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    return make_scene(grid, pos, dtype=jnp.float64), [float(d) for d in diag]


def _ep(pos, vel, dirs, n_ind, key=0, rcut=2.0, a=1.0):
    return extpot.ExtPotParams(pos=jnp.asarray(pos, jnp.float64),
                               vel=jnp.asarray(vel, jnp.float64),
                               dirs=jnp.asarray(dirs, jnp.float64),
                               n_ind=n_ind, key=key, rcut=rcut, a=a)


def test_spherical_indenter_harmonic_repulsion():
    scene, diag = _scene()
    c = [diag[0] / 2, diag[1] / 2, diag[2] + 1.0]   # 1 A above the top
    ep = _ep([c], [[0, 0, -0.1]], [[0, 0, -1]], n_ind=1, rcut=2.0, a=3.0)
    f, e, d = extpot.extpot_forces(scene, ep)
    fn = np.asarray(f)
    m = np.asarray(scene.mask)
    # only atoms within rcut of the tip feel it, pushed away (negative z)
    touched = np.abs(fn).sum(-1) > 0
    assert 0 < touched[m].sum() < m.sum()
    assert (fn[touched & m][:, 2] < 0).all()
    assert float(d["fext"][0]) > 0
    assert int(d["n_contact"][0]) == int(touched[m].sum())
    # harmonic magnitude check on the closest atom
    x = np.asarray(scene.pos)
    r = np.linalg.norm(x - np.asarray(c), axis=-1)
    i = np.unravel_index(np.argmin(np.where(m, r, 1e9)), r.shape)
    expect = 3.0 * (2.0 - r[i]) ** 2
    np.testing.assert_allclose(np.linalg.norm(fn[i]), expect, rtol=1e-10)


def test_wall_pushes_along_dir():
    scene, diag = _scene()
    # wall at z = diag[2]-0.5 pushing down: all atoms within rcut of the
    # plane get force along dir
    ep = _ep([[0, 0, diag[2] - 0.5]], [[0, 0, 0]], [[0, 0, -1]],
             n_ind=0, rcut=1.0, a=2.0)
    f, e, d = extpot.extpot_forces(scene, ep)
    fn = np.asarray(f)
    m = np.asarray(scene.mask)
    z = np.asarray(scene.pos[..., 2])
    near = m & (np.abs(z - (diag[2] - 0.5)) < 1.0)
    assert near.sum() > 0
    assert (fn[near][:, 2] < 0).all()
    assert np.abs(fn[near][:, :2]).max() == 0.0
    assert (np.abs(fn[m & ~near]).sum()) == 0.0


def test_juli_exponential_zero_net_impulse():
    scene, diag = _scene()
    c = [diag[0] / 2, diag[1] / 2, diag[2] - 0.2]
    ep = _ep([c], [[0, 0, -0.1]], [[0, 0, -1]], n_ind=1, key=1,
             rcut=3.0, a=0.5)
    f, e, d = extpot.extpot_forces(scene, ep)
    m = np.asarray(scene.mask)
    fn = np.asarray(f)[m]
    # total added impulse subtracted (imd_extpot.c:262-283)
    np.testing.assert_allclose(fn.sum(0), 0.0, atol=1e-9)
    assert float(jnp.sum(e)) > 0          # exponential potential energy
    assert float(d["fext"][0]) > 0
    a = extpot.contact_area(d["bbox"])
    assert float(a[0]) > 0


def test_indenter_moves_and_driver_runs(tmp_path):
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.simulation import Simulation
    param = """
coordname   _fcc
outfiles    {out}
box_param   5 5 5
box_unit    1.38
ntypes      1
masses      1.0
ensemble    nve
timestep    0.004
maxsteps    60
starttemp   0.01
eng_int     0
checkpt_int 0
lj_epsilon  1.0
lj_sigma    1.0
r_cut       2.5
seed        3
ep_n        1
ep_nind     1
ep_key      0
ep_a        5.0
ep_rcut     1.5
ep_pos      0  3.45 3.45 8.4
ep_vel      0  0 0 -2.0
ep_dir      0  0 0 -1
""".format(out=str(tmp_path / "ind"))
    cfg = SimConfig.from_params(parse_param_text(param))
    assert cfg.ep_n == 1 and len(cfg.ep_pos) == 1
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    state = sim.run()
    assert int(state.step) == 60
    # indenter advanced: z = 8.4 - 2.0*0.004*60 = 7.92
    np.testing.assert_allclose(float(state.ep.pos[0, 2]), 8.4 - 0.48,
                               rtol=1e-6)
    assert int(state.scene.overflow) == 0
    assert np.isfinite(float(state.stats.tot_kin_energy))
    # the indenter did push on the sample: kinetic energy rose above
    # the tiny thermal start
    assert float(state.stats.tot_kin_energy) > 0


def test_ind_file(tmp_path):
    """.ind indenter log fires every eng_int (write_fext imd_io.c:2900,
    hook imd_main_3d.c:732): header + per-indenter x y z f area
    n_contact rows, with nonzero contact once the indenter engages."""
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.simulation import Simulation
    param = """
coordname   _fcc
outfiles    {out}
box_param   5 5 5
box_unit    1.38
ntypes      1
masses      1.0
ensemble    nve
timestep    0.004
maxsteps    60
starttemp   0.005
eng_int     20
lj_epsilon  1.0
lj_sigma    1.0
r_cut       2.5
seed        3
ep_n        1
ep_nind     1
ep_key      0
ep_a        5.0
ep_rcut     1.5
ep_pos      0  3.45 3.45 7.5
ep_vel      0  0 0 -2.0
ep_dir      0  0 0 -1
""".format(out=str(tmp_path / "indf"))
    cfg = SimConfig.from_params(parse_param_text(param))
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    sim.run()
    rows = np.loadtxt(tmp_path / "indf.ind", ndmin=2)
    assert rows.shape == (3, 7)      # time x y z f area n_contact
    # indenter z descends at 2.0/unit time; the time column is
    # steps*timestep (write_fext imd_io.c:2949), aligned with the
    # logged (post-move) indenter position
    np.testing.assert_allclose(rows[:, 3], 7.5 - 2.0 * rows[:, 0],
                               rtol=1e-6)
    # by the last write the indenter (rcut 1.5, z ~7) touches the top
    # fcc layer (z ~6.9): nonzero force, contact count, and patch area
    assert rows[-1, 4] > 0 and rows[-1, 6] >= 1 and rows[-1, 5] >= 0
