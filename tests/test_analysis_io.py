"""Laser rescale, deform, distributions, structure analysis, generators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, with_capacity
from imd_tpu.scene import make_scene
from imd_tpu.utils import generate as gen


def _scene_from(pos, box_diag, pbc=(1, 1, 1), cutoff=2.0):
    box = Box.create([box_diag[0], 0, 0], [0, box_diag[1], 0],
                     [0, 0, box_diag[2]], pbc=pbc, dtype=jnp.float64)
    grid = choose_grid(box, cutoff, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    return make_scene(grid, pos, dtype=jnp.float64)


# --------------------------------------------------------------------------
# generators
# --------------------------------------------------------------------------

def test_generators_counts_and_types():
    for name, atoms_per_cell, ntypes in (
            ("_fcc", 4, 1), ("_bcc", 2, 1), ("_b2", 2, 2),
            ("_l12", 4, 2), ("_nacl", 8, 2), ("_diamond", 8, 1),
            ("_hex", 4, 1), ("_laves", 24, 2)):
        pos, typ, box = gen.generate_atoms(name, (3, 3, 3), 4.0)
        assert len(pos) == atoms_per_cell * 27, name
        assert len(set(typ.tolist())) == ntypes, name
        # all atoms inside the box
        assert pos.min() >= -1e-9
        assert np.all(pos.max(0) < box + 1e-9)


def test_b2_nearest_neighbor():
    pos, typ, box = gen.generate_atoms("_b2", (3, 3, 3), 4.0)
    from scipy.spatial import cKDTree
    t = cKDTree(np.mod(pos, box), boxsize=box)
    d, idx = t.query(pos, k=2)
    assert d[:, 1] == pytest.approx(4.0 * np.sqrt(3) / 2, rel=1e-9)
    # nearest neighbor always the other species
    assert np.all(typ[idx[:, 1]] != typ)


# --------------------------------------------------------------------------
# laser
# --------------------------------------------------------------------------

def test_laser_rescale_energy_deposition():
    from imd_tpu.config import LaserConfig
    from imd_tpu.models import laser as L

    pos, typ, diag = gen.fcc((6, 4, 4), 4.05)
    scene = _scene_from(pos, diag, cutoff=5.0)
    lcfg = LaserConfig(rescale_mode=1, sigma_e=0.5, sigma_t=10.0, t_0=50.0,
                       mu=0.05, atom_vol=16.6, dir=(1.0, 0.0, 0.0))
    n = int(scene.n_atoms())
    de = L._de(scene, lcfg, jnp.float64(50.0), 0.1, 0.0)
    expect = float(jnp.sum(de))
    for fn in (L.rescale_1, L.rescale_2):
        s2 = fn(scene, lcfg, jnp.float64(50.0), 0.1, jax.random.PRNGKey(0))
        inv_m = 1.0 / np.maximum(np.asarray(s2.mass), 1e-30)
        ek = 0.5 * float(jnp.sum(jnp.sum(s2.mom ** 2, -1) * inv_m
                                 * s2.fmask()))
        assert ek == pytest.approx(expect, rel=1e-6), fn.__name__
    # exponential depth profile: front cells got more than back cells
    de_np = np.asarray(de)
    x = np.asarray(scene.pos[..., 0])
    m = np.asarray(scene.mask)
    assert de_np[m & (x < 4)].mean() > 2 * de_np[m & (x > 20)].mean()


def test_get_surface():
    from imd_tpu.models import laser as L
    pos, typ, diag = gen.fcc((6, 3, 3), 4.05)
    pos[:, 0] += 10.0
    scene = _scene_from(pos, [diag[0] + 20.0, diag[1], diag[2]],
                        pbc=(0, 1, 1), cutoff=5.0)
    surf = float(L.get_surface(scene))
    assert 7.0 <= surf <= 12.0


def test_intensity_profiles_normalized_peak():
    from imd_tpu.models import laser as L
    y = jnp.linspace(-3, 3, 101)
    z = jnp.zeros_like(y)
    lg00 = L.intensity_profile(y, z, (0, 0), "laguerre", w0=1.0)
    assert float(lg00[50]) == pytest.approx(1.0)
    assert float(lg00[0]) < 1e-6
    tem01 = L.intensity_profile(y, jnp.linspace(-3, 3, 101), (0, 1),
                                "hermite", w0=1.0)
    assert float(tem01[50]) == pytest.approx(0.0, abs=1e-10)  # node on axis


# --------------------------------------------------------------------------
# deform
# --------------------------------------------------------------------------

def test_lin_deform_scales_box_and_atoms():
    from imd_tpu.models import deform as D
    pos, typ, diag = gen.fcc((3, 3, 3), 4.0)
    scene = _scene_from(pos, diag, cutoff=3.0)
    s2 = D.lin_deform(scene, (0.01, 0, 0), (0, 0, 0), (0, 0, 0), 1.0)
    assert float(s2.grid.box.h[0, 0]) == pytest.approx(12.0 * 1.01)
    # fractional coordinates unchanged (affine transform)
    f1 = np.asarray(scene.grid.box.to_frac(scene.pos))
    f2 = np.asarray(s2.grid.box.to_frac(s2.pos))
    m = np.asarray(scene.mask)
    assert np.abs(f1[m] - f2[m]).max() < 1e-10


# --------------------------------------------------------------------------
# distributions
# --------------------------------------------------------------------------

def test_distrib_roundtrip(tmp_path):
    from imd_tpu import integrate
    from imd_tpu.io.distrib import compute_distrib, read_distrib, write_distrib
    pos, typ, diag = gen.fcc((4, 4, 4), 4.0)
    scene = _scene_from(pos, diag, cutoff=3.0)
    scene = integrate.maxwell(scene, 0.03, jax.random.PRNGKey(0))
    fields = compute_distrib(scene, (4, 2, 2))
    assert fields["num"].sum() == 256
    assert fields["Ekin"].sum() == pytest.approx(0.5 * 3 * 256 * 0.03,
                                                 rel=0.05)
    for mode in ("ascii", "binary", "ascii_coord"):
        p = str(tmp_path / f"d_{mode}.dist")
        write_distrib(p, fields, ["num", "Ekin", "mdtemp"], (4, 2, 2),
                      (4.0, 8.0, 8.0), mode=mode)
        meta, data = read_distrib(p)
        assert meta["dim"] == (4, 2, 2)
        assert data[..., 0].sum() == pytest.approx(256)
        np.testing.assert_allclose(data[..., 1].sum(),
                                   fields["Ekin"].sum(), rtol=1e-5)


# --------------------------------------------------------------------------
# structure analysis
# --------------------------------------------------------------------------

def test_cna_and_aj_classify_perfect_lattices():
    from imd_tpu import analysis as A
    # fcc: first shell a/sqrt2 = 2.83, second 4.0 -> rcut 3.4
    pos, typ, diag = gen.fcc((4, 4, 4), 4.0)
    scene = _scene_from(pos, diag, cutoff=3.5)
    cna = A.common_neighbor_analysis(scene, 3.4)
    assert np.all(cna == A.CNA_FCC)
    aj = A.ackland_jones(scene)
    assert (aj == A.CNA_FCC).mean() > 0.95

    # bcc: shells at 3.46, 4.0, 5.66 -> rcut between 2nd and 3rd: 4.8
    posb, _, diagb = gen.bcc((4, 4, 4), 4.0)
    sceneb = _scene_from(posb, diagb, cutoff=5.0)
    cnab = A.common_neighbor_analysis(sceneb, 4.8)
    assert np.all(cnab == A.CNA_BCC)
    ajb = A.ackland_jones(sceneb)
    assert (ajb == A.CNA_BCC).mean() > 0.95

    # hcp (box must exceed 2*rcut + bond or periodic images fake extra
    # common neighbors)
    posh, _, boxh = gen.hex_lattice((4, 3, 3), 2.8)
    sceneh = _scene_from(posh, boxh, cutoff=3.4)
    cnah = A.common_neighbor_analysis(sceneh, 1.35 * 2.8)
    assert np.all(cnah == A.CNA_HCP)


def test_msqd_and_temp_profile():
    from imd_tpu import analysis as A
    from imd_tpu import integrate
    pos, typ, diag = gen.fcc((4, 4, 4), 4.0)
    scene = _scene_from(pos, diag, cutoff=3.0)
    ref = np.zeros((256, 3))
    flat = scene.flatten_atoms()
    m = np.asarray(flat["mask"])
    ref[np.asarray(flat["id"])[m]] = np.asarray(flat["pos"])[m]
    assert A.msqd(scene, ref)[0] == pytest.approx(0.0, abs=1e-12)
    shifted = scene.replace(pos=scene.pos + 0.1)
    assert A.msqd(shifted, ref)[0] == pytest.approx(0.03, rel=1e-6)
    scene = integrate.maxwell(scene, 0.04, jax.random.PRNGKey(1))
    prof = A.temp_profile(scene, 4)
    assert prof.shape == (4,)
    assert abs(prof.mean() - 0.04) < 0.02


def test_loadbalance_metrics_and_pictures(tmp_path):
    from imd_tpu.parallel import loadbalance as lb
    from imd_tpu.io.pictures import write_picture, project
    # inhomogeneous: all atoms in the left half
    pos, typ, diag = gen.fcc((4, 4, 4), 4.0)
    scene = _scene_from(pos, [diag[0] * 2, diag[1], diag[2]], cutoff=3.0)
    mx, mn, var = lb.lb_variance(scene, 4)
    assert float(mx) > 1.5 and float(mn) < 0.5   # badly imbalanced
    cuts = lb.equalized_boundaries(scene, 4)
    assert cuts[0] == 0 and cuts[-1] == scene.grid.dims[0]
    loads = np.asarray(lb.slab_loads(scene, 4))
    # equalized cuts put all boundaries inside the occupied half
    assert cuts[3] <= scene.grid.dims[0] // 2 + 1
    log = lb.LbLog(str(tmp_path / "run.lb"))
    log.write(0, (mx, mn, var))
    log.close()
    assert len(open(tmp_path / "run.lb").readlines()) == 2
    # pictures
    from imd_tpu import integrate
    import jax as J
    scene = integrate.maxwell(scene, 0.03, J.random.PRNGKey(0))
    p = str(tmp_path / "pic.ppm")
    write_picture(p, scene, dims=(32, 32), axis=2, field="Ekin")
    head = open(p, "rb").read(20)
    assert head.startswith(b"P6\n32 32\n255\n")
    f, num = project(scene, (32, 32), 2, "Ekin")
    assert num.sum() == 256
