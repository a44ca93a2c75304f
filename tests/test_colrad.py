"""COLRAD kinetics invariants (SURVEY.md §4): Saha equilibrium fixed
point, relaxation toward it, conservation laws."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.models import colrad as C


@pytest.fixture(scope="module")
def setup():
    st = C.aluminium_states(max_z=2, nlev=3)
    tab = C.build_tables(st, dtype=jnp.float64)
    return st, tab


def test_tables_shapes(setup):
    st, tab = setup
    assert tab.n_lev == len(st.z)
    assert tab.k_exc.shape[0] == len(np.asarray(tab.exc_i))
    assert np.all(np.asarray(tab.ion_chi) > 0)


def test_saha_is_near_fixed_point(setup):
    """At Saha/Boltzmann equilibrium, the collisional part of the network
    must balance (radiative recombination pulls weakly away)."""
    st, tab = setup
    ntot, te = 6.0e28, 5.0
    c0, ne0 = C.saha_init(st, ntot, te, jnp.float64)
    # colrad_rhs works in N28 units
    c = jnp.asarray(c0) / C.N28
    dc, dne, pe, _ = C.colrad_rhs(c, jnp.float64(te),
                                  jnp.float64(ne0 / C.N28),
                                  tab, use_ipd=False)
    # collisional rates individually are huge (~n^2 k); equilibrium means
    # cancellation by many orders of magnitude
    kexc = C._interp_rates(tab.k_exc, tab.log_te, jnp.float64(te))
    scale = float(jnp.max(kexc) * (ne0 / C.N28) * (ntot / C.N28))
    assert float(jnp.max(jnp.abs(dc))) < 1e-4 * scale


def test_relaxes_toward_equilibrium_and_conserves(setup):
    st, tab = setup
    ntot, te = 6.0e28, 8.0
    c_eq, ne_eq = C.saha_init(st, ntot, te, jnp.float64)
    # start far from equilibrium: everything neutral ground state
    c0 = np.zeros_like(c_eq)
    c0[0] = ntot
    ne0 = 1e24          # trace seed electrons
    step = C.make_colrad_step(tab, n_sub=32, newton_iters=8, use_ipd=False)
    c = jnp.asarray(c0)[None, :]
    ne = jnp.asarray([ne0])
    tev = jnp.asarray([te])
    for _ in range(6):
        c, ne, pe, diag = jax.jit(step)(c, tev, ne, 1e-13)
    # nuclei conserved (up to the Newton clip tolerance)
    assert float(jnp.sum(c)) == pytest.approx(ntot, rel=1e-4)
    # substantial ionization happened, moving toward the Saha ne
    assert float(ne[0]) > 100 * ne0
    zbar = float(C.mean_charge(c, tab)[0])
    zbar_eq = float(np.sum(st.z[: len(c_eq)] * c_eq) / ntot)
    assert 0.1 * zbar_eq < zbar <= 1.5 * zbar_eq + 0.5
    # all populations stayed non-negative and finite
    assert np.all(np.isfinite(np.asarray(c)))
    assert np.all(np.asarray(c) >= 0)


def test_coupled_ttm_colrad(setup):
    """COLRAD inside calc_ttm: ionization takes over Z/ne, Te evolves."""
    import numpy as np
    from imd_tpu import integrate
    from imd_tpu.models import ttm as ttm_mod
    from imd_tpu.models.eos import FEGEos
    from imd_tpu.config import TTMConfig
    from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, with_capacity
    from imd_tpu.scene import make_scene
    from imd_tpu.utils.generate import fcc

    st, tab = setup
    pos, typ, diag = fcc((6, 3, 3), 4.05)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    gg = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    gg = with_capacity(gg, measured_capacity(gg, pos))
    scene = make_scene(gg, pos, mass=np.full(len(pos), 26.9815),
                       dtype=jnp.float64)
    scene = integrate.maxwell(scene, 0.026, jax.random.PRNGKey(0))
    tcfg = TTMConfig(enabled=True, fd_nx=6, fd_min_atoms=4,
                     init_t_el=5.0)          # hot electrons -> ionization
    params = ttm_mod.make_params(tcfg, box, 5.0, dtype=jnp.float64)
    grid = ttm_mod.make_grid(params, dtype=jnp.float64)
    grid = grid.replace(temp=jnp.full_like(grid.temp, 5.0),
                        init_done=jnp.ones((), bool))
    eos = FEGEos()
    step_fn = C.make_colrad_step(tab, n_sub=8, evolve_te=True)
    cstate = C.init_grid_state(tab, 6, jnp.float64)
    nn = jnp.full(scene.pos.shape[:-1], 12, jnp.int32)
    fdi = jnp.full(scene.pos.shape[:-1], -1, jnp.int32)
    grid, fdi, cstate = ttm_mod.calc_ttm(
        grid, scene, params, eos, nn, fdi, dt=jnp.float64(1.0),
        t=jnp.float64(0.0), first_step=True,
        colrad=(tab, step_fn, cstate))
    act = np.asarray(ttm_mod.active_mask(grid, params))
    assert np.all(np.isfinite(np.asarray(grid.temp)))
    # hot cells started ionizing: ne positive, Z from the populations
    assert float(jnp.max(jnp.where(act, grid.ne, 0.0))) > 1e24
    assert np.all(np.asarray(cstate.c)[act].sum(1) > 0)


def test_energy_bookkeeping_signs(setup):
    """Net ionization must cost electron energy (P_EI < 0)."""
    st, tab = setup
    ntot, te = 6.0e28, 10.0
    c0 = np.zeros(tab.n_lev)
    c0[0] = ntot
    dc, dne, pe, diag = C.colrad_rhs(jnp.asarray(c0) / C.N28,
                                     jnp.float64(te),
                                     jnp.float64(1e26 / C.N28), tab,
                                     use_ipd=False)
    assert float(dne) > 0          # ionizing
    assert float(diag["P_EI"]) < 0  # costs energy


def test_multiphoton_channels():
    """MULTIPHOTON 2-/3-photon ionization (imd_colrad.c:1934-1952 rate
    application, 2710-2730 gating; rate form made dimensionally
    consistent — see the colrad_rhs docstring)."""
    import jax.numpy as jnp
    import numpy as np
    from imd_tpu.models import colrad as cr

    st = cr.aluminium_states(2, 4)
    tab = cr.build_tables(st)
    hnu, inv_nu, sig1ev2 = cr.mpi_constants(800e-9)
    assert 1.4 < hnu < 1.7              # 800 nm photon
    assert sig1ev2 > 0 and inv_nu > 0

    # some population everywhere, cold electrons (collisional rates tiny)
    nlev = tab.n_lev
    c = jnp.full((nlev,), 0.5)          # N28 units
    te, ne = jnp.asarray(0.05), jnp.asarray(0.01)
    phi_hot = jnp.asarray(1e17 / (hnu * 1.602e-19))   # I=1e17 W/m^2

    dc0, dne0, pe0, d0 = cr.colrad_rhs(c, te, ne, tab, use_ipd=False)
    las = (phi_hot, hnu, inv_nu, sig1ev2)
    dc1, dne1, pe1, d1 = cr.colrad_rhs(c, te, ne, tab, use_ipd=False,
                                       laser=las)
    # at least one ionization threshold is within 3 photons
    chi = np.asarray(tab.ion_chi)
    assert (chi <= 3 * hnu).any()
    # photoionization adds electrons and heats them
    assert float(dne1) > float(dne0)
    assert float(d1["P_MPI2"] + d1["P_MPI3"]) > 0
    assert float(d0["P_MPI2"]) == 0 and float(d0["P_MPI3"]) == 0
    # zero flux == no laser
    dc2, dne2, pe2, d2 = cr.colrad_rhs(
        c, te, ne, tab, use_ipd=False,
        laser=(jnp.zeros(()), hnu, inv_nu, sig1ev2))
    np.testing.assert_allclose(np.asarray(dc2), np.asarray(dc0), rtol=1e-6)
    # unreachable thresholds (tiny photon) -> channels closed
    dc3, dne3, _, d3 = cr.colrad_rhs(
        c, te, ne, tab, use_ipd=False,
        laser=(phi_hot, 1e-3, inv_nu, sig1ev2))
    assert float(d3["P_MPI2"]) == 0 and float(d3["P_MPI3"]) == 0

    # the stepper threads phi and reports the power columns
    step = cr.make_colrad_step(tab, evolve_te=True,
                               mpi_const=(hnu, inv_nu, sig1ev2))
    cc = jnp.tile(c * 1e28, (4, 1))
    te_g = jnp.full((4,), 0.05)
    ne_g = jnp.full((4,), 1e26)
    c1, ne1g, te1, diag = step(cc, te_g, ne_g, 1e-15,
                               jnp.full((4,), 1.0), phi_hot)
    assert np.isfinite(np.asarray(c1)).all()
    assert float(jnp.max(diag["P_MPI2"] + diag["P_MPI3"])) > 0
    # vs the same step without the MPI channels: photoionization leaves
    # MORE free electrons (recombination still runs in both)
    step0 = cr.make_colrad_step(tab, evolve_te=True)
    _, ne0g, _, _ = step0(cc, te_g, ne_g, 1e-15, jnp.full((4,), 1.0))
    assert float(jnp.min(ne1g)) > float(jnp.max(ne0g))
