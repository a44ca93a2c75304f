"""ADP: finite-difference forces, cubic-symmetry zero of mu/lambda."""

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu.models.adp import adp_demo_funcs, adp_energy, adp_forces
from imd_tpu.ops.geometry import Box
from imd_tpu.utils.generate import fcc


def test_forces_match_finite_differences():
    rng = np.random.default_rng(0)
    pos, _, _ = fcc((2, 2, 2), 4.05)
    pos = jnp.asarray(pos[:14] + rng.normal(0, 0.1, (14, 3)), jnp.float64)
    e, f = adp_forces(pos)
    h = 1e-6
    for idx in [(0, 0), (5, 1), (9, 2)]:
        d = np.zeros(pos.shape)
        d[idx] = h
        fd = -(float(adp_energy(pos + d)) - float(adp_energy(pos - d))) \
            / (2 * h)
        assert abs(fd - float(f[idx])) < 1e-7 * max(1.0, abs(fd)), idx


def test_fcc_dipole_terms_vanish_but_contribute_offcenter():
    """On a perfect fcc lattice inversion symmetry kills mu (and the
    traceless part of lambda is cubic-symmetric): ADP == EAM energy
    difference comes only from the isotropic lambda part; forces zero."""
    pos, _, diag = fcc((3, 3, 3), 4.05)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    pos = jnp.asarray(pos, jnp.float64)
    e, f = adp_forces(pos, box=box)
    assert float(jnp.max(jnp.abs(f))) < 1e-8
    # perturb one atom: dipole term switches on and the energy rises
    funcs = adp_demo_funcs()
    p2 = pos.at[0, 0].add(0.3)
    e2 = adp_energy(p2, box=box, funcs=funcs)
    assert float(e2) > float(e)


def test_mu_zero_on_inversion_symmetric_cluster():
    """An isolated octahedron has mu_i = 0 at the center atom."""
    a = 2.8
    pts = np.array([[0, 0, 0], [a, 0, 0], [-a, 0, 0], [0, a, 0],
                    [0, -a, 0], [0, 0, a], [0, 0, -a]], np.float64)
    funcs = adp_demo_funcs()
    pos = jnp.asarray(pts)
    # energy is finite and the central atom's force vanishes by symmetry
    e, f = adp_forces(pos, funcs=funcs)
    assert np.isfinite(float(e))
    np.testing.assert_allclose(np.asarray(f[0]), 0.0, atol=1e-10)


def test_adp_param_file_driver(tmp_path):
    """ADP from a parameter file: EAM files + adp_upotfile/adp_wpotfile
    select the flat autodiff ADP engine (imd_forces_nbl.c:891-930 at
    runtime); NVE conserves energy and the distortion terms engage on a
    thermally disordered lattice."""
    import jax.numpy as jnp
    import numpy as np

    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.models.potential import (_make_table, analytic_eam,
                                          write_pot_table)
    from imd_tpu.simulation import Simulation

    eam = analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39)
    d = tmp_path
    write_pot_table(eam.pair, str(d / "pair.pt"))
    write_pot_table(eam.rho, str(d / "rho.pt"))
    write_pot_table(eam.embed, str(d / "embed.pt"))
    # smooth u/w distortion tables on the engine's r^2 grid
    r2 = np.linspace(0.09, 25.0, 600)
    r = np.sqrt(r2)
    cutf = np.clip((5.0 - r) / 5.0, 0.0, 1.0) ** 2
    u = 0.08 * np.exp(-2.0 * (r / 2.864 - 1.0)) * cutf
    w = 0.04 * np.exp(-2.5 * (r / 2.864 - 1.0)) * cutf
    step = r2[1] - r2[0]
    write_pot_table(_make_table([u], [r2[0]], [r2[-1]], [step],
                                dtype=jnp.float64), str(d / "u.pt"))
    write_pot_table(_make_table([w], [r2[0]], [r2[-1]], [step],
                                dtype=jnp.float64), str(d / "w.pt"))

    out = str(d / "adp")
    cfg = SimConfig.from_params(parse_param_text(f"""
coordname   _fcc
outfiles    {out}
box_param   3 3 3
box_unit    4.05
ntypes      1
masses      26.9815
ensemble    nve
timestep    0.02
maxsteps    40
starttemp   0.02
eng_int     20
pbc_dirs    1 1 1
seed        8
core_potential_file pair.pt
embedding_energy_file embed.pt
el_density_file rho.pt
adp_upotfile u.pt
adp_wpotfile w.pt
"""))
    sim = Simulation(cfg, workdir=str(d), dtype=jnp.float64)
    assert sim.flat_inter is not None and sim.flat_inter[0] == "adp"
    sim.run()
    eng = [ln.split() for ln in
           open(out + ".eng").read().strip().splitlines()[1:]]
    epots = [float(r_[1]) for r_ in eng]
    temps = [float(r_[2]) for r_ in eng]
    etots = [e + 1.5 * t for e, t in zip(epots, temps)]
    assert epots[0] < -2.5                 # bound EAM crystal
    assert abs(etots[-1] - etots[0]) < 5e-6 * abs(etots[0])
