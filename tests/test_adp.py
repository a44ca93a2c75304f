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
