"""Gay-Berne: limits, torque consistency, NVE conservation."""

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu.models.uniax import (GayBerneParams, UniaxSystem,
                                  _gb_pair_energy, gb_energy,
                                  gb_forces_torques, make_uniax,
                                  uniax_step)


def test_spherical_limit_is_lennard_jones():
    """sigma_par == sigma_perp, eps_par == eps_perp -> plain LJ."""
    P = GayBerneParams(sigma_perp=1.0, sigma_par=1.0, eps_perp=1.0,
                      eps_par=1.0)
    e1 = jnp.asarray([0.0, 0.0, 1.0])
    e2 = jnp.asarray([1.0, 0.0, 0.0])
    for r in (1.0, 1.12246, 1.5, 2.0):
        u = float(_gb_pair_energy(jnp.asarray([r, 0.0, 0.0]), e1, e2, P))
        lj = 4.0 * ((1.0 / r) ** 12 - (1.0 / r) ** 6)
        assert abs(u - lj) < 1e-10


def test_side_by_side_deeper_than_end_to_end():
    """eps_perp > eps_par: side-by-side configuration binds stronger."""
    P = GayBerneParams()
    ez = jnp.asarray([0.0, 0.0, 1.0])
    # side-by-side: axes parallel, separation perpendicular to axes
    r_ss = jnp.linspace(0.9, 3.0, 200)
    u_ss = [float(_gb_pair_energy(jnp.asarray([float(r), 0, 0]), ez, ez, P))
            for r in r_ss]
    # end-to-end: separation along the axes
    r_ee = jnp.linspace(2.8, 6.0, 200)
    u_ee = [float(_gb_pair_energy(jnp.asarray([0, 0, float(r)]), ez, ez, P))
            for r in r_ee]
    assert min(u_ss) < min(u_ee) < 0.0


def test_torques_match_finite_differences():
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.uniform(0, 4, (5, 3)), jnp.float64)
    ax = rng.normal(size=(5, 3))
    ax = jnp.asarray(ax / np.linalg.norm(ax, axis=1, keepdims=True),
                     jnp.float64)
    P = GayBerneParams(r_cut=20.0)
    e, f, tq = gb_forces_torques(pos, ax, P)
    h = 1e-6
    # force check
    d = np.zeros(pos.shape)
    d[2, 1] = h
    fd = -(float(gb_energy(pos + d, ax, P)) -
           float(gb_energy(pos - d, ax, P))) / (2 * h)
    assert abs(fd - float(f[2, 1])) < 1e-5 * max(1.0, abs(fd))
    # torque check: rotate axis 3 about z by +/- h, energy slope = -tau_z
    c, s = np.cos(h), np.sin(h)
    Rz = jnp.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float64)
    Rzm = jnp.asarray([[c, s, 0], [-s, c, 0], [0, 0, 1]], jnp.float64)
    axp = ax.at[3].set(Rz @ ax[3])
    axm = ax.at[3].set(Rzm @ ax[3])
    fd_t = -(float(gb_energy(pos, axp, P)) -
             float(gb_energy(pos, axm, P))) / (2 * h)
    assert abs(fd_t - float(tq[3, 2])) < 1e-5 * max(1.0, abs(fd_t))


def test_nve_conserves_total_energy():
    rng = np.random.default_rng(4)
    # gas of 8 molecules in a loose cluster, small random kicks
    pos = rng.uniform(0, 7, (8, 3))
    sys = make_uniax(pos, inertia=2.0, seed=1)
    sys = sys._replace(mom=jnp.asarray(rng.normal(0, 0.05, (8, 3))),
                       angmom=jnp.asarray(rng.normal(0, 0.05, (8, 3))))
    P = GayBerneParams(r_cut=12.0)
    step = jax.jit(lambda s: uniax_step(s, 1e-3, P))
    _, st0 = step(sys)
    e0 = float(st0["epot"] + st0["ekin_trans"] + st0["ekin_rot"])
    for _ in range(200):
        sys, st = step(sys)
    e1 = float(st["epot"] + st["ekin_trans"] + st["ekin_rot"])
    assert abs(e1 - e0) < 5e-3 * max(1.0, abs(e0))
    # axes stay unit length
    norms = jnp.linalg.norm(sys.axis, axis=1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-12)


def test_uniax_param_file_driver(tmp_path):
    """UNIAX from a parameter file (uniax_sig/eps/inert tags divert the
    CLI into the Gay-Berne driver): NVE with orientation dynamics
    conserves E_pot + E_trans + E_rot, and the final checkpoint carries
    restartable axis/angular-momentum columns."""
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.io.chkpt import read_chkpt
    from imd_tpu.uniax_driver import run_uniax

    out = str(tmp_path / "gb")
    cfg = SimConfig.from_params(parse_param_text(f"""
coordname   _fcc
outfiles    {out}
box_param   3 3 3
box_unit    6.0
ntypes      1
masses      1.0
ensemble    nve
timestep    0.002
maxsteps    200
starttemp   0.5
do_maxwell  1
eng_int     50
checkpt_int 200
pbc_dirs    1 1 1
seed        4
uniax_sig   1.0 1.0 3.0
uniax_eps   1.0 1.0 0.2
uniax_inert 1.0
uniax_r_cut 8.0
"""))
    import pathlib
    run_uniax(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    eng = [ln.split() for ln in
           pathlib.Path(out + ".eng").read_text().splitlines()[1:]]
    n_rows = len(eng)
    assert n_rows == 4
    etots = [float(r[1]) + 1.5 * float(r[2]) + float(r[3]) for r in eng]
    assert abs(etots[-1] - etots[0]) < 5e-5 * max(abs(etots[0]), 1.0)
    # rotational DOF are live (thermalized + exchanging)
    assert float(eng[-1][3]) > 0.05
    # restartable: axes + angular momenta in the data columns
    d = read_chkpt(out + "-final.chkpt")
    assert d.data.shape[1] >= 7
    ax = d.data[:, 1:4]
    assert np.allclose(np.linalg.norm(ax, axis=1), 1.0, atol=1e-6)
