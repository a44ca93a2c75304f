"""Tangney-Scandolo induced dipoles: SCF fixed point, HF forces."""

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu.models.dipole import (DipoleParams, dipole_energy,
                                   dipole_forces, scf_dipoles,
                                   sio2_demo_params)


def _sio2_cluster(seed=0, n_si=3, n_o=6):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 6.0, (n_si + n_o, 3))
    # spread atoms to avoid unphysical overlaps
    for _ in range(40):
        d = pos[None] - pos[:, None]
        r = np.linalg.norm(d, axis=-1) + np.eye(len(pos)) * 10
        bad = r < 1.6
        if not bad.any():
            break
        i, j = np.argwhere(bad)[0]
        pos[j] += 0.4 * (pos[j] - pos[i]) / r[i, j]
    types = np.array([0] * n_si + [1] * n_o, np.int32)
    return jnp.asarray(pos, jnp.float64), jnp.asarray(types)


def test_scf_converges_to_fixed_point():
    pos, types = _sio2_cluster()
    P = sio2_demo_params()
    p, iters = scf_dipoles(pos, types, P=P)
    assert int(iters) < P.max_iter
    # verify p = alpha * E(p) by one more un-mixed application
    P1 = P._replace(dp_mix=1.0, max_iter=1, dp_tol=0.0)
    from imd_tpu.models.dipole import _field_tensors, _geometry, COUL_EV_A
    dr, r, nb = _geometry(pos, types, None, jnp.ones(len(pos), bool), P)
    E1, T2, q, taper, inv_r = _field_tensors(dr, r, nb, types, P,
                                             jnp.float64)
    E = E1 + jnp.einsum("ijab,jb->ia", T2, p)
    alpha = P.alpha[types]
    np.testing.assert_allclose(np.asarray(p),
                               np.asarray(alpha[:, None] * E), atol=1e-6)
    # silicon (alpha=0) carries no dipole
    np.testing.assert_allclose(np.asarray(p[types == 0]), 0.0, atol=0)


def test_forces_match_finite_differences():
    pos, types = _sio2_cluster(3)
    P = sio2_demo_params()._replace(dp_tol=1e-12)
    e, f, p, iters = dipole_forces(pos, types, P=P)
    assert np.isfinite(float(e))
    h = 1e-6
    for idx in [(0, 0), (4, 1), (7, 2)]:
        d = np.zeros(pos.shape)
        d[idx] = h

        def etot(x):
            return float(dipole_energy(jnp.asarray(x), types, P=P))
        fd = -(etot(pos + d) - etot(pos - d)) / (2 * h)
        assert abs(fd - float(f[idx])) < 2e-5 * max(1.0, abs(fd)), idx


def test_dipole_points_along_field():
    """A lone O between two symmetric Si has zero dipole; breaking the
    symmetry induces one along the broken axis."""
    P = sio2_demo_params()
    types = jnp.asarray([0, 0, 1], jnp.int32)
    sym = jnp.asarray([[-2.0, 0, 0], [2.0, 0, 0], [0.0, 0, 0]],
                      jnp.float64)
    p_sym, _ = scf_dipoles(sym, types, P=P)
    np.testing.assert_allclose(np.asarray(p_sym[2]), 0.0, atol=1e-12)
    asym = sym.at[2, 0].add(0.4)
    p_asym, _ = scf_dipoles(asym, types, P=P)
    assert abs(float(p_asym[2, 0])) > 1e-4
    np.testing.assert_allclose(np.asarray(p_asym[2, 1:]), 0.0, atol=1e-10)


def test_dipole_param_file_driver(tmp_path):
    """Tangney-Scandolo silica from a parameter file (dp_*/ms_* tags,
    imd_param.c:3451-3539 at runtime): SCF dipoles inside the jitted
    step, Hellmann-Feynman forces, NVE conservation on beta-cristobalite
    SiO2."""
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.simulation import Simulation

    out = str(tmp_path / "ts")
    cfg = SimConfig.from_params(parse_param_text(f"""
coordname   _sio2
outfiles    {out}
box_param   2 2 2
box_unit    1.0
ntypes      2
masses      28.0855 15.999
ensemble    nve
timestep    0.02
maxsteps    30
starttemp   0.01
eng_int     15
pbc_dirs    1 1 1
seed        3
charge      1.91 -0.955
dp_alpha    0.0 1.33
dp_b        2.0 2.23 2.6
dp_c        1.0 1.5 2.0
ms_D        0.0022 0.0270 0.0061
ms_gamma    11.39 10.45 8.01
ms_r0       3.54 2.18 3.79
r_cut       4.8
"""))
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    assert sim.flat_inter is not None and sim.flat_inter[0] == "dipole"
    sim.run()
    eng = [ln.split() for ln in
           open(out + ".eng").read().strip().splitlines()[1:]]
    epots = [float(r[1]) for r in eng]
    temps = [float(r[2]) for r in eng]
    etots = [e + 1.5 * t for e, t in zip(epots, temps)]
    assert epots[0] < -1.0          # bound ionic crystal
    assert abs(etots[-1] - etots[0]) < 2e-4 * abs(etots[0])


def test_kermode_yukawa_screening():
    """KERMODE: yuk_beta > 0 switches the electrostatic kernel to
    exp(-beta r) * fc(r) / r with the cosine-integral smooth cutoff
    (yukawa_smooth_function, imd_potential.c; tags imd_param.c:3488).
    Energy stays variational: forces match finite differences."""
    pos, types = _sio2_cluster(5)
    base = sio2_demo_params()._replace(dp_tol=1e-12)
    P = base._replace(yuk_beta=0.4, yuk_smoothlength=1.0,
                      r_cut=base.r_cut + 1.0)
    e0 = float(dipole_energy(pos, types, P=base))
    e1 = float(dipole_energy(pos, types, P=P))
    assert np.isfinite(e1) and abs(e1 - e0) > 1e-6    # screening acts
    # fc window: kernel is exactly zero beyond r_cut, exactly Yukawa
    # below r_cut - 2*d
    from imd_tpu.models.dipole import _field_tensors, _geometry
    two = jnp.asarray([[0.0, 0, 0], [3.0, 0, 0]], jnp.float64)
    t2 = jnp.asarray([0, 1], jnp.int32)
    dr, r, nb = _geometry(two, t2, None, jnp.ones(2, bool), P)
    _, _, _, taper, _ = _field_tensors(dr, r, nb, t2, P, jnp.float64)
    assert abs(float(taper[0, 1]) - np.exp(-0.4 * 3.0)) < 1e-12
    far = jnp.asarray([[0.0, 0, 0], [P.r_cut - 1e-6, 0, 0]], jnp.float64)
    dr, r, nb = _geometry(far, t2, None, jnp.ones(2, bool), P)
    _, _, _, taper, _ = _field_tensors(dr, r, nb, t2, P, jnp.float64)
    assert abs(float(taper[0, 1])) < 1e-9
    # forces remain the exact gradient with the screened kernel
    e, f, p, iters = dipole_forces(pos, types, P=P)
    h = 1e-6
    for idx in [(1, 0), (6, 2)]:
        d = np.zeros(pos.shape)
        d[idx] = h

        def etot(x):
            return float(dipole_energy(jnp.asarray(x), types, P=P))
        fd = -(etot(pos + d) - etot(pos - d)) / (2 * h)
        assert abs(fd - float(f[idx])) < 2e-5 * max(1.0, abs(fd)), idx
