"""NEB saddle-point search on an analytic 2-D double-well surface and a
small LJ hop problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.models import neb


def test_neb_analytic_double_well():
    """Potential V = (x^2-1)^2 + 2 y^2: minima (+-1, 0), saddle (0,0)
    with barrier 1.  NEB must find it."""
    def force_fn(x):                     # x [1,3]
        xx, yy = x[0, 0], x[0, 1]
        v = (xx ** 2 - 1.0) ** 2 + 2.0 * yy ** 2
        fx = -4.0 * xx * (xx ** 2 - 1.0)
        fy = -4.0 * yy
        return jnp.array([[fx, fy, 0.0]]), v

    x0 = jnp.array([[-1.0, 0.3, 0.0]])   # bent initial path
    x1 = jnp.array([[1.0, -0.3, 0.0]])
    imgs = neb.interpolate_images(x0, x1, 9)
    # relax endpoints exactly onto the minima first
    imgs = imgs.at[0].set(jnp.array([[-1.0, 0.0, 0.0]]))
    imgs = imgs.at[-1].set(jnp.array([[1.0, 0.0, 0.0]]))
    x, e, fmax = jax.jit(lambda im: neb.neb_relax(
        im, force_fn, k_spring=2.0, n_steps=800, dt=0.02,
        climb_after=400))(imgs)
    b = float(neb.barrier(e))
    assert b == pytest.approx(1.0, abs=0.02)
    # the climbing image sits at the saddle
    top = int(jnp.argmax(e))
    assert abs(float(x[top, 0, 0])) < 0.05
    assert abs(float(x[top, 0, 1])) < 0.05


def test_neb_lj_exchange_barrier():
    """Mobile atom between two fixed anchors: symmetric saddle at the
    midpoint; barrier equals V(mid) - V(well) computed directly."""
    from imd_tpu.models.potential import lj_table
    from imd_tpu.ops.forces import pair_forces_n2
    from imd_tpu.ops.geometry import Box

    pot = lj_table(1.0, 1.0, 2.5, dtype=jnp.float64)
    box = Box.create([20, 0, 0], [0, 20, 0], [0, 0, 20], pbc=(0, 0, 0),
                     dtype=jnp.float64)
    anchors = np.array([[8.0, 10.0, 10.0], [12.0, 10.0, 10.0]])
    typ = jnp.zeros(3, jnp.int32)
    mask = jnp.ones(3, bool)

    def force_fn(pos):
        F, ep, _ = pair_forces_n2(pos, typ, mask, box, pot)
        F = F.at[:2].set(0.0)            # anchors fixed
        return F, jnp.sum(ep)

    # wells: mobile atom at distance ~1 from either anchor along x
    x0 = jnp.asarray(np.vstack([anchors, [9.0, 10.0, 10.0]]))
    x1 = jnp.asarray(np.vstack([anchors, [11.0, 10.0, 10.0]]))
    imgs = neb.interpolate_images(x0, x1, 11)
    x, e, fmax = jax.jit(lambda im: neb.neb_relax(
        im, force_fn, k_spring=5.0, n_steps=600, dt=0.01,
        climb_after=300))(imgs)
    # direct saddle energy: mobile atom exactly at the midpoint
    mid = jnp.asarray(np.vstack([anchors, [10.0, 10.0, 10.0]]))
    _, e_mid = force_fn(mid)
    _, e_well = force_fn(x0)
    b_direct = float(e_mid - e_well)
    b_neb = float(neb.barrier(e))
    assert b_direct > 0.01
    assert b_neb == pytest.approx(b_direct, rel=0.05)


def test_neb_cli_driver(tmp_path):
    """End-to-end NEB from a parameter file (imd_neb.c main variant):
    per-image <coordname>.%02d endpoint files, anchors fixed via
    restrictions vtypes, band .eng log, per-image final checkpoints,
    and the same anchored-LJ barrier the module-level test verifies."""
    import os

    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.io.chkpt import ChkptData, read_chkpt, write_chkpt
    from imd_tpu.models.potential import lj_table
    from imd_tpu.neb_driver import run_neb
    from imd_tpu.ops.forces import pair_forces_n2
    from imd_tpu.ops.geometry import Box

    anchors = np.array([[8.0, 10.0, 10.0], [12.0, 10.0, 10.0]])
    bx = np.array([20.0, 0, 0])
    by = np.array([0, 20.0, 0])
    bz = np.array([0, 0, 20.0])

    def write_img(path, mob):
        pos = np.vstack([anchors, mob])
        write_chkpt(path, ChkptData(
            number=np.arange(3), type=np.array([1, 1, 0]),
            mass=np.ones(3), pos=pos, vel=np.zeros((3, 3)),
            data=np.zeros((3, 1)), box_x=bx, box_y=by, box_z=bz))

    write_img(str(tmp_path / "band.00"), [9.0, 10.0, 10.0])
    write_img(str(tmp_path / "band.10"), [11.0, 10.0, 10.0])

    out = str(tmp_path / "nebrun")
    cfg = SimConfig.from_params(parse_param_text(f"""
coordname   band
outfiles    {out}
ntypes      1
total_types 2
masses      1.0
ensemble    mik
timestep    0.01
maxsteps    600
lj_epsilon  1.0
lj_sigma    1.0
r_cut       2.5
pbc_dirs    0 0 0
restrictionvector 0 1 1 1
restrictionvector 1 0 0 0
neb_nrep    11
neb_k       5.0
neb_eng_int 150
neb_cineb_start 300
"""))
    x, e, barr = run_neb(cfg, workdir=str(tmp_path), dtype=jnp.float64)

    # direct saddle for the anchored-LJ exchange (mobile at midpoint)
    pot = lj_table(1.0, 1.0, 2.5, dtype=jnp.float64)
    box = Box.create(bx, by, bz, pbc=(0, 0, 0), dtype=jnp.float64)
    typ3 = jnp.zeros(3, jnp.int32)
    m3 = jnp.ones(3, bool)
    _, e_mid, _ = pair_forces_n2(
        jnp.asarray(np.vstack([anchors, [10.0, 10.0, 10.0]])),
        typ3, m3, box, pot)
    _, e_well, _ = pair_forces_n2(
        jnp.asarray(np.vstack([anchors, [9.0, 10.0, 10.0]])),
        typ3, m3, box, pot)
    b_direct = float(jnp.sum(e_mid) - jnp.sum(e_well))
    assert barr == pytest.approx(b_direct, rel=0.05)

    # anchors did not move in any image (restrictions vtype 1 zeroed)
    assert np.abs(np.asarray(x)[:, :2] - anchors[None]).max() < 1e-12

    # band .eng log: reference header + one row per eng_int block
    eng = open(out + ".eng").read().strip().splitlines()
    assert eng[0].startswith("# nfc fnorm neb_k Epot_0")
    assert len(eng[0].split()) == 4 + 11
    assert len(eng) >= 1 + 4

    # per-image final configs exist and are readable
    d = read_chkpt(out + ".05-final.chkpt")
    assert d.n == 3
