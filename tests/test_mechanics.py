"""ZAPP / BEND / RIGID / FBC dynamic loading + indexed per-vtype tags.

Reference: zapp() imd_main_3d.c:1466-1520; update_bend 1672-1780;
RIGID superparticles imd_integrate.c:866-920 + calc_superforces
imd_main_3d.c:1881-1930; init_fbc/update_fbc 1192-1291; indexed
param lines imd_param.c:907-1092.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.config import SimConfig, parse_param_text
from imd_tpu.simulation import Simulation

BASE = """
coordname _fcc
box_param 5 4 4
box_unit 4.05
masses 26.9815
ntypes 1
lj_epsilon 0.35
lj_sigma 2.62
r_cut 5.0
timestep 0.1
outfiles {out}
ensemble nve
"""


def _sim(tmp_path, extra, tag, **kw):
    p = tmp_path / f"{tag}.imd"
    p.write_text(BASE.format(out=str(tmp_path / tag)) + extra)
    return Simulation.from_param_file(str(p), dtype=jnp.float32,
                                      engine="xla", **kw)


def test_indexed_per_vtype_tags():
    """Repeated '<vtype> x y z' lines (the reference format) accumulate
    instead of overwriting; the legacy flat form still parses."""
    cfg = SimConfig.from_params(parse_param_text(
        "ntypes 1\ntotal_types 3\n"
        "restrictionvector 0 1 1 1\n"
        "restrictionvector 2 0 0 1\n"
        "extra_startforce 1 0.5 0 0\n"
        "extra_endforce 1 1.5 0 0\n"))
    assert cfg.restrictions == ((1.0, 1.0, 1.0), (1.0, 1.0, 1.0),
                                (0.0, 0.0, 1.0))
    assert cfg.fbc_forces == ((0.0, 0.0, 0.0), (0.5, 0.0, 0.0))
    assert cfg.fbc_endforces == ((0.0, 0.0, 0.0), (1.5, 0.0, 0.0))
    # legacy flat list (one line, 3*vtypes values)
    cfg2 = SimConfig.from_params(parse_param_text(
        "restrictionvector 1 1 0 1 1 1\n"))
    assert cfg2.restrictions == ((1.0, 1.0, 0.0), (1.0, 1.0, 1.0))


def test_rigid_parse_and_intersection():
    cfg = SimConfig.from_params(parse_param_text(
        "total_types 3\nrigid 1 2 1 1 0\n"))
    assert cfg.rigid_groups == (((1, 2), (1, 1, 0)),)
    with pytest.raises(ValueError, match="Intersecting"):
        SimConfig.from_params(parse_param_text(
            "total_types 3\nrigid 1 1 1 1\nrigid 1 2 1 1 1\n"))


def test_zapp_removes_drift(tmp_path):
    """A drifting system gets its mean momentum zeroed every step."""
    sim = _sim(tmp_path, "maxsteps 5\nstarttemp 0.02\n"
                         "zapp_threshold 1e-6\n", "zapp")
    drift = 0.05 * sim.scene.mass[..., None] * sim.scene.fmask()[..., None]
    sim.scene = sim.scene.replace(mom=sim.scene.mom + drift)
    st = sim.run()
    ptot = np.asarray(jnp.sum(st.scene.mom
                              * st.scene.fmask()[..., None], (0, 1, 2, 3)))
    n = int(sim.scene.n_atoms())
    assert np.linalg.norm(ptot) / n < 1e-4, ptot


def test_rigid_superparticle_moves_rigidly(tmp_path):
    """vtype-1 atoms form a fully rigid group: with zero start
    temperature every member gets the same velocity (superforce·m/M),
    so intra-group distances are preserved while free atoms relax."""
    sim = _sim(tmp_path, "maxsteps 20\nstarttemp 0.0\ndo_maxwell 0\n"
                         "total_types 2\nrigid 1 1 1 1\n", "rigid")
    flat = sim.scene.flatten_atoms()
    pos = np.asarray(flat["pos"])
    mask = np.asarray(flat["mask"])
    # slab of atoms near x<4 becomes the superparticle; perturb one free
    # atom so free relative motion is nonzero
    vt = np.where(mask & (pos[:, 0] < 4.0), 1, 0).astype(np.int32)
    n1 = int(vt.sum())
    assert 4 < n1 < mask.sum()
    sim.scene = sim.scene.replace(
        vtype=jnp.asarray(vt.reshape(sim.scene.vtype.shape)))
    pert = np.zeros_like(pos)
    free = np.nonzero(mask & (vt == 0))[0]
    pert[free[0]] = (0.3, 0.2, 0.1)
    sim.scene = sim.scene.replace(
        pos=sim.scene.pos + jnp.asarray(
            pert.reshape(sim.scene.pos.shape), sim.scene.pos.dtype))
    ids0 = np.asarray(flat["id"])[mask & (vt == 1)]
    p0 = pos[mask & (vt == 1)]
    d0 = np.linalg.norm(p0[:1] - p0, axis=1)

    st = sim.run()
    f2 = st.scene.flatten_atoms()
    m2 = np.asarray(f2["mask"])
    v2 = np.asarray(f2["vtype"])[m2]
    id2 = np.asarray(f2["id"])[m2]
    p2 = np.asarray(f2["pos"])[m2]
    grp = v2 == 1
    order = np.argsort(id2[grp])
    assert np.array_equal(np.sort(ids0), id2[grp][order])
    pg = p2[grp][order][np.argsort(np.argsort(ids0))]
    d2 = np.linalg.norm(pg[:1] - pg, axis=1)
    np.testing.assert_allclose(d2, d0, atol=5e-4)
    # the free atoms did move relative to each other
    pf = p2[~grp]
    assert np.abs(pf - pos[mask & (vt == 0)]).max() > 1e-3


def test_bend_force_direction(tmp_path):
    """One bending moment: origin group left, force group right,
    axis z -> the force group is pushed along unit(bend_vec) x z =
    (1,0,0) x (0,0,1) = (0,-1,0) with |extra_startbforce| magnitude."""
    sim = _sim(tmp_path, "maxsteps 1\nstarttemp 0.0\ndo_maxwell 0\n"
                         "total_types 3\n"
                         "bend_nmoments 1\n"
                         "bend_axis 0 0 0 1\n"
                         "bend_vtype_of_origin 0 1\n"
                         "bend_vtype_of_force 0 2\n"
                         "extra_startbforce 2 0.01 0 0\n", "bend")
    flat = sim.scene.flatten_atoms()
    pos = np.asarray(flat["pos"])
    mask = np.asarray(flat["mask"])
    vt = np.zeros(len(pos), np.int32)
    vt[mask & (pos[:, 0] < 2.0)] = 1          # origin group at left
    vt[mask & (pos[:, 0] > 18.0)] = 2         # force group at right
    n2 = int((vt == 2).sum())
    assert (vt == 1).sum() > 0 and n2 > 0
    sim.scene = sim.scene.replace(
        vtype=jnp.asarray(vt.reshape(sim.scene.vtype.shape)))
    st = sim.run()
    f2 = st.scene.flatten_atoms()
    m2 = np.asarray(f2["mask"])
    grp = np.asarray(f2["vtype"])[m2] == 2
    mom = np.asarray(f2["mom"])[m2][grp]
    py = mom[:, 1].sum()
    # bulk interatomic forces cancel within one step at T=0 only
    # approximately; the group's net y momentum must match -|b|*n2*dt
    np.testing.assert_allclose(py, -0.01 * n2 * 0.1, rtol=0.05)


def test_fbc_linear_ramp(tmp_path):
    """extra_endforce ramps the per-vtype FBC force linearly over the
    run (init_fbc, imd_main_3d.c:1233-1240)."""
    sim = _sim(tmp_path, "maxsteps 100\ntotal_types 2\n"
                         "extra_startforce 1 0 0 0\n"
                         "extra_endforce 1 0.4 0 0\n", "ramp")
    p0 = sim.integrator_params(jnp.float32(0.0), jnp.asarray(0))
    pN = sim.integrator_params(jnp.float32(0.0), jnp.asarray(100))
    np.testing.assert_allclose(np.asarray(p0.fbc_forces[1]), [0, 0, 0],
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(pN.fbc_forces[1]),
                               [0.4, 0, 0], rtol=1e-6)


def test_quasi_2d_slab(tmp_path):
    """A 2-D system runs as a thin 3-D slab (the TWOD build's use case;
    MIGRATION.md §2): one-cell-thick grid along z, z motion frozen by
    restrictions, NVE conserves energy and atoms never leave the
    plane."""
    p = tmp_path / "q2d.imd"
    p.write_text(BASE.format(out=str(tmp_path / "q2d")).replace(
        "box_param 5 4 4", "box_param 6 6 2") +
        "maxsteps 40\nstarttemp 0.02\neng_int 10\n"
        "total_types 1\nrestrictionvector 0 1 1 0\n")
    sim = Simulation.from_param_file(str(p), dtype=jnp.float64,
                                     engine="xla")
    f0 = sim.scene.flatten_atoms()
    m0 = np.asarray(f0["mask"])
    z0 = np.sort(np.asarray(f0["pos"])[m0][:, 2])
    sim.run()
    f = sim.scene.flatten_atoms()
    m = np.asarray(f["mask"])
    # frozen z: the z coordinates are exactly the initial plane set
    np.testing.assert_array_equal(np.sort(np.asarray(f["pos"])[m][:, 2]),
                                  z0)
    assert np.all(np.asarray(f["mom"])[m][:, 2] == 0.0)
    eng = np.loadtxt(tmp_path / "q2d.eng", ndmin=2)
    # cols: time Epot/atom T ...; with z frozen n_active = 2N, so
    # Ekin/atom = T * n_active / (2N) = T
    etot = eng[:, 1] + eng[:, 2]
    assert np.abs(etot - etot[0]).max() < 1e-4 * abs(etot[0])


def test_fbc_quasistatic_loading(tmp_path):
    """RELAX FBC protocol (update_fbc, imd_main_3d.c:1243-1270): in a
    relax ensemble with extra_dforce, relaxation events (or the
    max_fbc_int wait cap) increment the FBC force, write .ssdef/.ss,
    reset the relaxer, and CONTINUE to maxsteps instead of stopping at
    the first convergence."""
    sim = _sim(tmp_path,
               "ensemble glok\nmaxsteps 120\ntotal_types 2\n"
               "restrictionvector 1 0 0 0\n"
               "extra_dforce 1 0.02 0 0\n"
               "max_fbc_int 25\nfnorm_threshold 50.0\neng_int 20\n",
               "qfbc")
    st = sim.run()
    # ran to maxsteps (loading continues past relaxation events)
    assert int(st.step) == 120
    # at least two loading increments fired (cap 25 over 120 steps)
    off = np.asarray(st.fbc_offset)
    assert off[1, 0] >= 2 * 0.02 - 1e-6, off
    # .ssdef rows + numbered .ss snapshots exist
    rows = (tmp_path / "qfbc.ssdef").read_text().strip().splitlines()
    assert rows[0].startswith("#C step nfc Epot fnorm")
    assert len(rows) >= 3
    names = {q.name for q in tmp_path.iterdir()}
    assert "qfbc.00000.ss" in names and "qfbc.00000.ssitr" in names
    # the .ssdef logs the reaction force on the held vtype
    assert "tot_force[1].x" in rows[0]


def test_lindef_dynamic_strain(tmp_path):
    """HOMDEF homogeneous strain every lindef_int steps in a dynamic
    ensemble (lin_deform, imd_deform.c:33; hook imd_main_3d.c:296):
    box_x grows by lindef_size per event; atoms follow affinely."""
    sim = _sim(tmp_path,
               "maxsteps 40\nlindef_int 10\nlindef_size 0.002\n"
               "lindef_x 1 0 0\nstarttemp 0.002\n", "lde")
    bx0 = float(np.asarray(sim.box.h)[0, 0])
    st = sim.run()
    bx = float(np.asarray(st.scene.grid.box.h)[0, 0])
    # 4 events at +0.2% each
    np.testing.assert_allclose(bx, bx0 * 1.002 ** 4, rtol=1e-5)
    assert int(st.scene.overflow) == 0
    assert int(st.scene.n_atoms()) == int(sim.scene.n_atoms())


def test_relax_pressure_toward_target(tmp_path):
    """HOMDEF per-step pressure relaxation (relax_pressure,
    imd_deform.c:127, hook main_3d.c:800): with relax_rate and a bulk
    modulus the box rescales toward presstens_ext = 0 every step; the
    residual pressure shrinks."""
    sim = _sim(tmp_path,
               "maxsteps 60\nrelax_rate 0.3\nbulk_module 0.7\n"
               "shear_module 0.3\nrelax_mode iso\nstarttemp 0.0005\n"
               "eng_int 30\n", "rpx")
    st0 = sim.run(steps=2)
    vol0 = float(np.asarray(st0.scene.grid.box.volume))
    p0 = float((2.0 / 3.0 * float(st0.stats.tot_kin_energy)
                + float(st0.virial) / 3.0) / vol0)
    st = sim.run(steps=58)
    vol = float(np.asarray(st.scene.grid.box.volume))
    p1 = float((2.0 / 3.0 * float(st.stats.tot_kin_energy)
                + float(st.virial) / 3.0) / vol)
    assert abs(p1) < abs(p0)
    assert vol != vol0


def test_deform_sample_dynamic(tmp_path):
    """DEFORM group shifts every max_deform_int steps in a dynamic
    ensemble (deform_sample, imd_deform.c:232; hook main_3d.c:307-333
    without RELAX): the flagged vtype moves by deform_size*shift per
    event."""
    sim = _sim(tmp_path,
               "maxsteps 20\ntotal_types 2\nstarttemp 0\n"
               "restrictionvector 1 0 0 0\n"
               "deform_shift 1 0.05 0 0\n"
               "max_deform_int 10\ndeform_size 1.0\n", "dsam")
    flat0 = sim.scene.flatten_atoms()
    m0 = np.asarray(flat0["mask"])
    vt0 = np.asarray(flat0["vtype"])[m0]
    ids0 = np.asarray(flat0["id"])[m0]
    x0 = np.asarray(flat0["pos"])[m0][:, 0]
    st = sim.run()
    flat = st.scene.flatten_atoms()
    m = np.asarray(flat["mask"])
    ids = np.asarray(flat["id"])[m]
    x1 = np.asarray(flat["pos"])[m][:, 0]
    # match by atom id
    o0 = np.argsort(ids0)
    o1 = np.argsort(ids)
    sel = vt0[o0] == 1
    # vtype 1 is fully restricted (no dynamics): its x motion is purely
    # the two deform events of +0.05 each
    np.testing.assert_allclose((x1[o1] - x0[o0])[sel], 0.10, atol=1e-5)


def test_cycle_cyclic_deformation(tmp_path):
    """CYCLE (imd_main_3d.c:234-245 + init_cycle, imd_deform.c:273):
    with lindef_freq set, the lindef strain becomes the cyclic ratio
    increment — box_x tracks (lindef_size-1) sin(2 pi f t) + 1, peaking
    at lindef_size at the quarter period and returning to the original
    length after a full period."""
    # period T = 1/f = 40 steps * dt(0.1) -> f = 0.25
    sim = _sim(tmp_path,
               "maxsteps 40\nlindef_int 1\nlindef_size 1.004\n"
               "lindef_freq 0.25\nlindef_x 1 0 0\nstarttemp 0.001\n",
               "cyc")
    bx0 = float(np.asarray(sim.box.h)[0, 0])
    st = sim.run(steps=10)                     # quarter period: peak
    bx_peak = float(np.asarray(st.scene.grid.box.h)[0, 0])
    np.testing.assert_allclose(bx_peak, bx0 * 1.004, rtol=1e-5)
    st = sim.run(steps=30)                     # full period: back
    bx_full = float(np.asarray(st.scene.grid.box.h)[0, 0])
    np.testing.assert_allclose(bx_full, bx0, rtol=1e-5)
    assert int(st.scene.overflow) == 0
