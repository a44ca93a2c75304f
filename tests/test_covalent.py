"""SW / Tersoff validation against published silicon cohesive data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.models import covalent as cv
from imd_tpu.ops.geometry import Box
from imd_tpu.utils.generate import diamond

A_SI = 5.431


def _si(nc=2, a=A_SI):
    pos, typ, boxd = diamond((nc, nc, nc), a)
    box = Box.create([boxd[0], 0, 0], [0, boxd[1], 0], [0, 0, boxd[2]],
                     dtype=jnp.float64)
    return jnp.asarray(pos, jnp.float64), box


def test_sw_silicon_cohesive_energy():
    """SW is fit so diamond Si at a=5.431 A has E_coh = -4.3364 eV/atom
    (2 epsilon per atom by construction, PRB 31, 5262)."""
    pos, box = _si()
    n = pos.shape[0]
    e = float(cv.sw_energy(pos, box)) / n
    assert e == pytest.approx(-2.0 * 2.1683, rel=2e-3)
    # equilibrium: forces vanish on the perfect lattice
    F, _ = cv.covalent_forces(cv.sw_energy, pos, box)
    assert float(jnp.max(jnp.abs(F))) < 1e-8


def test_sw_equilibrium_lattice_constant():
    """Energy minimum sits at the published lattice constant."""
    es = []
    for a in (5.35, 5.431, 5.51):
        pos, box = _si(a=a)
        es.append(float(cv.sw_energy(pos, box)))
    assert es[1] < es[0] and es[1] < es[2]


def test_tersoff_silicon_cohesive_energy():
    """Tersoff T3: E_coh(diamond Si) = -4.63 eV/atom at a = 5.432 A."""
    pos, box = _si(a=5.432)
    n = pos.shape[0]
    e = float(cv.tersoff_energy(pos, box)) / n
    assert e == pytest.approx(-4.63, rel=5e-3)
    F, _ = cv.covalent_forces(cv.tersoff_energy, pos, box)
    assert float(jnp.max(jnp.abs(F))) < 1e-7


def test_sw_forces_match_finite_differences():
    pos, box = _si()
    pos = pos + 0.08 * jax.random.normal(jax.random.PRNGKey(0), pos.shape,
                                         jnp.float64)
    F, e = cv.covalent_forces(cv.sw_energy, pos, box)
    eps = 1e-6
    for idx in [(3, 0), (10, 2)]:
        pp = pos.at[idx].add(eps)
        pm = pos.at[idx].add(-eps)
        fd = -(cv.sw_energy(pp, box) - cv.sw_energy(pm, box)) / (2 * eps)
        assert float(F[idx]) == pytest.approx(float(fd), rel=1e-5)


def test_ttbp_angular_minimum_and_fd_forces():
    """TTBP: energy minimal at cos(theta) = -1/sp; FD force check."""
    import numpy as np
    from imd_tpu.models.covalent import TTBPParams, ttbp_energy

    P = TTBPParams(constant=5.0, sp=3.0, r_cut=3.5)
    d = 2.2

    def tri(theta):
        return jnp.asarray(
            [[0.0, 0, 0], [d, 0, 0],
             [d * np.cos(theta), d * np.sin(theta), 0.0]], jnp.float64)

    th0 = np.arccos(-1.0 / 3.0)           # 109.47 degrees
    e0 = float(ttbp_energy(tri(th0), P=P))
    for th in (th0 - 0.3, th0 + 0.3):
        assert float(ttbp_energy(tri(th), P=P)) > e0
    # FD forces
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 3.5, (6, 3)), jnp.float64)
    e, g = jax.value_and_grad(lambda x: ttbp_energy(x, P=P))(pos)
    h = 1e-6
    dlt = np.zeros(pos.shape)
    dlt[2, 0] = h
    fd = (float(ttbp_energy(pos + dlt, P=P))
          - float(ttbp_energy(pos - dlt, P=P))) / (2 * h)
    assert abs(fd - float(g[2, 0])) < 1e-7 * max(1.0, abs(fd))
