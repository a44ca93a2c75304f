"""COLRAD: collisional-radiative plasma kinetics on the TTM grid.

Rebuild of imd_colrad.c (marked WIP in the reference manual): per-FD-cell
ionization-state kinetics with state vector y = (T_e, T_i, n_e,
c_{z,i}...) over excited levels of charge stages Z = 0..MAXLEVEL
(imd_colrad.c:42,189-290), solving a stiff ODE per cell per MD step.

Differences by design (SURVEY.md §7.2 M8):
- The reference evaluates electron-impact cross-section double integrals
  with a custom OpenMP Gauss-Kronrod integrator at every RHS call
  (colrad_GetCoeffs:2279, imd_colrad.h:196-460) and itself plans to
  pre-tabulate them (imd_colrad.c:88-96).  Here all rate coefficients
  are precomputed host-side on a log-T_e grid and interpolated on
  device: electron-impact excitation after van Regemorter with the
  detailed-balance reverse, electron-impact ionization after Lotz with
  the Saha three-body reverse, and Kramers radiative recombination.
- The per-cell CVODE (BDF + dense LAPACK) becomes a vmapped
  damped-Newton backward-Euler with adaptive substepping: the state
  vector is tiny (~tens), so the batched dense solves map directly onto
  the MXU, and every grid cell integrates in parallel.
- Ionization-potential depression (DOIPD): same Debye-sphere expression
  as the reference (imd_colrad.c:1558-1568); depressed states are
  dissolved into the continuum.
- The reference's atomic level data files are external and absent from
  the mount; `aluminium_states()` builds a compact hydrogen-like level
  set with the tabulated Al ionization energies (NIST ground-state
  values hard-coded); users can supply their own `States`.

Validation invariants: Saha equilibrium is a fixed point of the rate
network (detailed balance), perturbed populations relax toward it,
total nuclei and charge (n_e = sum z c_z) are conserved.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imd_tpu import units

KB = units.KB_J
EV = units.EV_TO_J
EMASS = units.EMASS_KG
H_PLANCK = 6.62607015e-34
RY_EV = 13.605693122994

# float32-safe scaled units (like models/widerange.py): densities in
# N28 = 1e28/m^3, rate coefficients premultiplied by N28 so k28*n28*c28
# stays O(1e15) instead of O(1e42), and the thermal de Broglie volume
# folded host-side (h^2 ~ 4e-67 underflows f32 on device)
N28 = 1e28
_LAM3_N28 = (H_PLANCK ** 2 / (2.0 * math.pi * EMASS * KB
                              * units.EV_TO_K)) ** 1.5 * N28  # *Te^-1.5
# eV*N28/s -> IMD power density eV/(A^3 time-unit)
P_N28_TO_IMD = N28 * 1e-30 * units.IMD_TIME_S
_R0_28_A = (3.0 / (4.0 * math.pi * N28)) ** (1.0 / 3.0) * 1e10
_DEBYE_28_A = math.sqrt(units.EPS0 * EV / (N28 * units.ECHARGE_C ** 2)) \
    * 1e10
# Al ionization energies chi_z (eV), NIST ground states
AL_CHI = (5.98577, 18.82855, 28.44764, 119.9924, 153.8252)


class States(NamedTuple):
    """Flattened level set over charge stages.

    z[i]: charge stage of level i; e_ev[i]: energy above the stage
    ground (eV); g[i]: degeneracy; chi_ev[z]: stage ionization energy;
    ground[z]: index of the stage-z ground level (-1 if absent).
    """
    z: np.ndarray
    e_ev: np.ndarray
    g: np.ndarray
    chi_ev: np.ndarray
    ground: np.ndarray


def aluminium_states(max_z: int = 3, nlev: int = 4) -> States:
    """Hydrogen-like excited ladder per stage: E_n relative to the stage
    ground approaches chi_z as (1 - 1/n^2); g_n = 2 n^2."""
    zs, es, gs = [], [], []
    ground = np.full(max_z + 2, -1, np.int64)
    for z in range(max_z + 1):
        ground[z] = len(zs)
        chi = AL_CHI[z]
        for k in range(nlev):
            n = k + 1
            zs.append(z)
            es.append(chi * (1.0 - 1.0 / n ** 2))
            gs.append(2.0 * n ** 2)
    # bare stage max_z+1: single "ground" with no excited structure
    ground[max_z + 1] = len(zs)
    zs.append(max_z + 1)
    es.append(0.0)
    gs.append(1.0)
    return States(np.asarray(zs), np.asarray(es, float),
                  np.asarray(gs, float),
                  np.asarray(AL_CHI[:max_z + 2], float), ground)


def read_states(dirname: str, element: str = "Al",
                chi_fallback=AL_CHI) -> States:
    """Read the reference's atomic state tables (colrad_read_states,
    imd_colrad.c:523): one ``{element}{z}_states.txt`` per charge stage,
    six tab-separated columns per line — the reference consumes
    col 2 = level energy (eV, CUMULATIVE scale: cross-stage differences
    are ionization energies, imd_colrad.c:1920 groundstate_ioniz),
    col 3 = statistical weight, col 4 = orbital quantum number (the
    allowed-transition kronecker, imd_colrad.c:2509), col 5 = principal
    quantum number (Einstein/Stark widths).

    Maps onto the framework's States: per-stage energies relative to
    the stage ground, stage ionization energies from the ground-to-
    ground deltas; the stage after the last file gets ``chi_fallback``.
    """
    import os
    stages = []
    z = 0
    while True:
        path = os.path.join(dirname, f"{element}{z}_states.txt")
        if not os.path.exists(path):
            break
        rows = np.loadtxt(path, ndmin=2)
        if rows.shape[1] != 6:
            raise ValueError(
                f"{path}: expected 6 columns, got {rows.shape[1]}")
        stages.append(rows)
        z += 1
    if not stages:
        raise FileNotFoundError(
            f"no {element}0_states.txt under {dirname}")
    max_z = len(stages) - 1
    zs, es, gs = [], [], []
    ground = np.full(max_z + 2, -1, np.int64)
    chi = []
    for zi, rows in enumerate(stages):
        e0 = rows[0, 2]
        ground[zi] = len(zs)
        for r in rows:
            zs.append(zi)
            es.append(float(r[2] - e0))
            gs.append(float(r[3]))
        if zi + 1 < len(stages):
            chi.append(float(stages[zi + 1][0, 2] - e0))
        else:
            chi.append(float(chi_fallback[min(zi,
                                              len(chi_fallback) - 1)]))
    ground[max_z + 1] = len(zs)
    zs.append(max_z + 1)
    es.append(0.0)
    gs.append(1.0)
    chi.append(float(chi_fallback[min(max_z + 1, len(chi_fallback) - 1)]))
    return States(np.asarray(zs), np.asarray(es, float),
                  np.asarray(gs, float), np.asarray(chi, float), ground)


# ---------------------------------------------------------------------------
# rate coefficients (host-side tables over log T_e)
# ---------------------------------------------------------------------------

def _k_exc(de_ev, te_ev):
    """van Regemorter electron-impact excitation [m^3/s] with f ~ 1.

    k = 3.2e-13 * f <g> / (dE sqrt(Te)) exp(-dE/Te)  [cgs-oid fit],
    converted to SI; the reference integrates Mott cross sections
    instead (colrad_GetCoeffs) - same functional shape.
    """
    gaunt = 0.2
    k_cm3 = 3.2e-7 * gaunt / (de_ev * np.sqrt(np.maximum(te_ev, 1e-6))) \
        * np.exp(-de_ev / np.maximum(te_ev, 1e-6))
    return k_cm3 * 1e-6


def _k_ion(chi_ev, te_ev):
    """Lotz electron-impact ionization [m^3/s] (a=4.5e-14 cm^2 eV^2)."""
    x = chi_ev / np.maximum(te_ev, 1e-6)
    from scipy.special import exp1
    k_cm3 = 6.7e-7 / (chi_ev * np.sqrt(np.maximum(te_ev, 1e-6))) \
        * exp1(np.maximum(x, 1e-12))
    return k_cm3 * 1e-6


def _k_rr(z_ion, chi_ev, te_ev):
    """Kramers/Seaton radiative recombination [m^3/s]."""
    beta = chi_ev / np.maximum(te_ev, 1e-6)
    k_cm3 = 5.2e-14 * z_ion * np.sqrt(beta) * (
        0.43 + 0.5 * np.log(np.maximum(beta, 1e-12)) + 0.469 / np.maximum(
            beta, 1e-12) ** (1.0 / 3.0))
    return np.maximum(k_cm3, 0.0) * 1e-6


class ColradTables(struct.PyTreeNode):
    """Device-side precomputed rates + level metadata."""
    log_te: jnp.ndarray        # [nt] log10 Te(eV) grid
    k_exc: jnp.ndarray         # [np_exc, nt] forward excitation rates
    exc_i: jnp.ndarray         # [np_exc] lower level index
    exc_j: jnp.ndarray         # [np_exc] upper level index
    exc_de: jnp.ndarray        # [np_exc] dE (eV)
    k_ion: jnp.ndarray         # [np_ion, nt]
    k_rr: jnp.ndarray          # [np_ion, nt]
    ion_i: jnp.ndarray         # [np_ion] level index
    ion_j: jnp.ndarray         # [np_ion] target (ground of z+1)
    ion_chi: jnp.ndarray       # [np_ion] effective chi (eV)
    g: jnp.ndarray             # [nlev]
    zq: jnp.ndarray            # [nlev] charge of each level
    e_ev: jnp.ndarray          # [nlev]
    n_lev: int = struct.field(pytree_node=False)


def build_tables(st: States, te_lo: float = 0.02, te_hi: float = 1000.0,
                 nt: int = 256, dtype=jnp.float32,
                 rates: str = "fit",
                 ref_ne: float = 1.8e29) -> ColradTables:
    """Precompute the rate tables over a log-Te grid.

    ``rates``: "fit" (default) uses the van-Regemorter/Lotz closed
    forms; "ref" integrates the REFERENCE's Mott cross sections over
    the Fermi-Dirac distribution with its Sommerfeld chemical potential
    (models/colrad_ref.py — the defining integrals of colrad_GetCoeffs,
    imd_colrad.c:2279) evaluated at electron density ``ref_ne`` (the
    tables are Te-only, so the degeneracy/Pauli corrections are frozen
    at that density; default ~3 conduction electrons per Al atom at
    solid density, matching the regime the reference targets).
    """
    te = np.logspace(math.log10(te_lo), math.log10(te_hi), nt)
    if rates == "ref":
        from imd_tpu.models import colrad_ref as cr

        def rate_exc(de, te):
            return np.array([cr.k_exc_ref(ref_ne, t * units.EV_TO_K,
                                          de * EV, n=4001)
                             for t in te])

        def rate_ion(chi, te):
            return np.array([cr.k_ion_ref(ref_ne, t * units.EV_TO_K,
                                          chi * EV, n_outer=401,
                                          n_inner=101)
                             for t in te])
    else:
        rate_exc, rate_ion = _k_exc, _k_ion
    nlev = len(st.z)
    exc_i, exc_j, exc_de, kexc = [], [], [], []
    ion_i, ion_j, ion_chi, kion, krr = [], [], [], [], []
    for i in range(nlev):
        for j in range(nlev):
            if st.z[i] == st.z[j] and st.e_ev[j] > st.e_ev[i] + 1e-9:
                de = st.e_ev[j] - st.e_ev[i]
                exc_i.append(i)
                exc_j.append(j)
                exc_de.append(de)
                kexc.append(rate_exc(de, te))
        zi = int(st.z[i])
        if zi + 1 < len(st.ground) and st.ground[zi + 1] >= 0 \
                and zi < len(st.chi_ev):
            chi = st.chi_ev[zi] - st.e_ev[i]
            if chi > 0.1:
                ion_i.append(i)
                ion_j.append(int(st.ground[zi + 1]))
                ion_chi.append(chi)
                kion.append(rate_ion(chi, te))
                krr.append(_k_rr(zi + 1, chi, te))
    return ColradTables(
        log_te=jnp.asarray(np.log10(te), dtype),
        k_exc=jnp.asarray(np.array(kexc) * N28, dtype),
        exc_i=jnp.asarray(exc_i, jnp.int32),
        exc_j=jnp.asarray(exc_j, jnp.int32),
        exc_de=jnp.asarray(exc_de, dtype),
        k_ion=jnp.asarray(np.array(kion) * N28, dtype),
        k_rr=jnp.asarray(np.array(krr) * N28, dtype),
        ion_i=jnp.asarray(ion_i, jnp.int32),
        ion_j=jnp.asarray(ion_j, jnp.int32),
        ion_chi=jnp.asarray(ion_chi, dtype),
        g=jnp.asarray(st.g, dtype), zq=jnp.asarray(st.z, dtype),
        e_ev=jnp.asarray(st.e_ev, dtype), n_lev=nlev)


def _interp_rates(tab2d, log_te_grid, te_ev):
    lt = jnp.log10(jnp.clip(te_ev, 10 ** log_te_grid[0],
                            10 ** log_te_grid[-1]))
    x = (lt - log_te_grid[0]) / (log_te_grid[1] - log_te_grid[0])
    k = jnp.clip(x.astype(jnp.int32), 0, log_te_grid.shape[0] - 2)
    f = x - k
    return tab2d[:, k] * (1.0 - f) + tab2d[:, k + 1] * f


# ---------------------------------------------------------------------------
# the rate network RHS (per cell; vmapped)
# ---------------------------------------------------------------------------

def _debye_ipd(z_ion, ntot28, ne28, te_ev):
    """Debye-sphere IPD [eV] per charge stage (imd_colrad.c:1558-1568;
    standard Debye length, constants folded host-side for f32 safety).
    Densities in N28 units."""
    r0_a = _R0_28_A * jnp.maximum(ntot28, 1e-10) ** (-1.0 / 3.0)
    debye_a = _DEBYE_28_A * jnp.sqrt(
        te_ev / jnp.maximum(ne28 + ntot28, 1e-10))
    x = debye_a / jnp.maximum(r0_a, 1e-3)
    fac = (1.0 + x ** 3) ** (2.0 / 3.0) - x * x
    return (z_ion + 1.0) * 1.5 / jnp.maximum(r0_a, 1e-3) * \
        14.3996 * fac     # e^2/(4 pi eps0) = 14.3996 eV*A


def mpi_constants(lambda_m: float) -> Tuple[float, float, float]:
    """Host-side MULTIPHOTON prefactors for laser wavelength lambda_m.

    Returns (hnu_ev, inv_nu, sig1ev2) with sig1ev2 = sigma_tmp * EV^2 so
    the device computes the Kramers photoionization cross section as
    sigma_1 = sig1ev2 * chi_eV^2 without f32 underflow (the raw
    sigma_tmp formula, imd_colrad.c:1530, chains 1e-188-scale factors).
    """
    c_light = 299792458.0
    eps0 = 8.8541878128e-12
    echarge = 1.602176634e-19
    nu = c_light / lambda_m
    hnu_j = H_PLANCK * nu
    # ordered so every float64 intermediate stays in range
    sigma_tmp = (64.0 * math.pi ** 4 / (3.0 * math.sqrt(3.0))
                 * (echarge * echarge / (4.0 * math.pi * eps0)) ** 5
                 * EMASS / H_PLANCK ** 6 / c_light / nu ** 3
                 / (13.6 * echarge) ** 2)
    return hnu_j / EV, 1.0 / nu, sigma_tmp * EV * EV


def colrad_rhs(c, te_ev, ne, tab: ColradTables, use_ipd: bool = True,
               laser=None):
    """dc/dt, dne/dt, electron energy source P_e, all in N28 units
    (densities in 1e28/m^3, powers in eV N28/s; multiply by
    P_N28_TO_IMD for the TTM source).

    c [nlev] level densities (N28).

    ``laser = (phi, hnu_ev, inv_nu, sig1ev2)`` adds the MULTIPHOTON
    2-/3-photon ionization channels (imd_colrad.c:1934-1952 rate
    application, 2710-2730 coefficients): sigma_1 Kramers cross section
    at the IPD-depressed threshold, gated on 2hv >= chi (resp. 3hv),
    with the excess photon energy heating the electrons.  ``phi`` is
    the instantaneous photon flux I(t)/hv [1/m^2/s].  Deviation from
    the reference, documented: its sigma_MPI_2 multiplies by (hv)^2/nu
    where the standard lowest-order-perturbation form (and dimensional
    consistency, rate in 1/s) requires k2 = (sigma_1 phi)^2 / nu and
    k3 = (sigma_1 phi)^3 / (2 nu^2); the reference's own MULTIPHOTON
    block is compile-disabled WIP with the local intensity hardwired to
    zero (imd_colrad.c:1498), so there is no behavior to match.
    """
    ntot = jnp.sum(c)
    kexc = _interp_rates(tab.k_exc, tab.log_te, te_ev)
    kion = _interp_rates(tab.k_ion, tab.log_te, te_ev)
    krr = _interp_rates(tab.k_rr, tab.log_te, te_ev)

    dc = jnp.zeros_like(c)
    # excitation / de-excitation (detailed balance reverse)
    gi = tab.g[tab.exc_i]
    gj = tab.g[tab.exc_j]
    kfwd = kexc * ne * c[tab.exc_i]
    boltz = jnp.exp(jnp.clip(tab.exc_de / jnp.maximum(te_ev, 1e-4),
                             -60.0, 60.0))
    krev_coeff = kexc * (gi / gj) * boltz
    krev = krev_coeff * ne * c[tab.exc_j]
    dc = dc.at[tab.exc_i].add(krev - kfwd)
    dc = dc.at[tab.exc_j].add(kfwd - krev)
    p_ee = jnp.sum((krev - kfwd) * tab.exc_de)       # eV/m^3/s to electrons

    # ionization / three-body + radiative recombination
    chi_eff = tab.ion_chi
    if use_ipd:
        ipd = _debye_ipd(tab.zq[tab.ion_i], ntot, ne, te_ev)
        chi_eff = jnp.maximum(tab.ion_chi - ipd, 0.05)
    # Saha phase-space factor: (n_i / (n_j ne))_eq = g_i/(2 g_j) L^3 e^{chi/T}
    # (in N28 units; the de Broglie volume is host-folded: h^2 underflows
    # f32 on device)
    lam3_28 = _LAM3_N28 * jnp.maximum(te_ev, 1e-4) ** -1.5
    saha = (tab.g[tab.ion_i] / (2.0 * tab.g[tab.ion_j])) * lam3_28 * jnp.exp(
        jnp.clip(chi_eff / jnp.maximum(te_ev, 1e-4), -60.0, 60.0))
    kf = kion * ne * c[tab.ion_i]
    k3b = kion * saha * ne * ne * c[tab.ion_j]
    krad = krr * ne * c[tab.ion_j]
    dc = dc.at[tab.ion_i].add(k3b + krad - kf)
    dc = dc.at[tab.ion_j].add(kf - k3b - krad)
    dne = jnp.sum(kf - k3b - krad)
    p_ei = jnp.sum(-(kf - k3b) * chi_eff)            # ionization cools e-
    p_rr = jnp.sum(-krad * 1.5 * te_ev)              # radiated away

    p_mpi2 = p_mpi3 = jnp.zeros((), c.dtype)
    if laser is not None:
        phi, hnu_ev, inv_nu, sig1ev2 = laser
        s1phi = sig1ev2 * chi_eff * chi_eff * phi      # sigma_1 * flux
        base2 = s1phi * s1phi * inv_nu                 # [1/s]
        k2 = jnp.where(2.0 * hnu_ev >= chi_eff, base2, 0.0)
        k3 = jnp.where(3.0 * hnu_ev >= chi_eff,
                       base2 * (s1phi * inv_nu) * 0.5, 0.0)
        km2 = k2 * c[tab.ion_i]
        km3 = k3 * c[tab.ion_i]
        km = km2 + km3
        dc = dc.at[tab.ion_i].add(-km)
        dc = dc.at[tab.ion_j].add(km)
        dne = dne + jnp.sum(km)
        # excess photon energy above the (depressed) threshold heats
        # the electrons (imd_colrad.c:1950-1952)
        p_mpi2 = jnp.sum(km2 * (2.0 * hnu_ev - chi_eff))
        p_mpi3 = jnp.sum(km3 * (3.0 * hnu_ev - chi_eff))

    return (dc, dne, p_ee + p_ei + p_mpi2 + p_mpi3,
            dict(P_EE=p_ee, P_EI=p_ei, P_RR=p_rr,
                 P_MPI2=p_mpi2, P_MPI3=p_mpi3))


# ---------------------------------------------------------------------------
# Saha equilibrium initialization (colrad_Saha_init, imd_colrad.c:494)
# ---------------------------------------------------------------------------

def saha_init(st: States, ntot: float, te_ev: float,
              dtype=jnp.float32) -> Tuple[np.ndarray, float]:
    """Populations + ne in Saha/Boltzmann equilibrium (host-side)."""
    nlev = len(st.z)
    zmax = int(st.z.max())

    def stage_pops(ne):
        # Saha ratios between stage GROUND densities, then stage totals
        # via partition functions U_z = sum g_i exp(-E_i/T)
        lam3 = (H_PLANCK ** 2 / (2.0 * math.pi * EMASS * KB
                                 * te_ev * units.EV_TO_K)) ** 1.5
        ground_r = np.ones(zmax + 1)
        for z in range(zmax):
            g0 = st.g[st.ground[z]]
            g1 = st.g[st.ground[z + 1]]
            ground_r[z + 1] = ground_r[z] * (2.0 * g1 / g0) / (ne * lam3) \
                * math.exp(-st.chi_ev[z] / te_ev)
        part = np.zeros(zmax + 1)
        for z in range(zmax + 1):
            idx = np.nonzero(st.z == z)[0]
            part[z] = np.sum(st.g[idx] * np.exp(-st.e_ev[idx] / te_ev)) \
                / st.g[st.ground[z]]
        tot_r = ground_r * part
        stage_n = tot_r / tot_r.sum() * ntot
        c = np.zeros(nlev)
        for z in range(zmax + 1):
            idx = np.nonzero(st.z == z)[0]
            w = st.g[idx] * np.exp(-st.e_ev[idx] / te_ev)
            c[idx] = stage_n[z] * w / w.sum()
        return c

    ne = ntot * 0.1 + 1e20
    for _ in range(200):
        c = stage_pops(ne)
        ne_new = float(np.sum(st.z[:len(c)] * c))
        ne = 0.5 * ne + 0.5 * max(ne_new, 1e15)
    return c, ne


# ---------------------------------------------------------------------------
# the per-cell stiff integrator (vmapped backward Euler + Newton)
# ---------------------------------------------------------------------------

def make_colrad_step(tab: ColradTables, n_sub: int = 16,
                     newton_iters: int = 8, use_ipd: bool = True,
                     max_tries: int = 4096, rtol: float = 1e-6,
                     evolve_te: bool = False, mpi_const=None):
    """Returns step(c [.., nlev], te_ev [..], ne [..], dt_s[, ce]) ->
    (c', ne', P_e / te', diag) integrating the network over dt_s.

    Adaptive backward-Euler with a Newton solve on the (c, ne) block and
    step halving on rejected steps (negative populations or unconverged
    Newton) - the vmapped static-shape analog of the reference's
    per-cell CVODE error control (imd.h:99-113).  ``n_sub`` sets the
    initial substep count; ``max_tries`` bounds the while loop.

    With ``evolve_te`` the electron temperature joins the ODE state
    (like the reference's y[0], imd_colrad.c:189-278): dTe/dt = P_e/C_e
    with ``ce`` the per-cell electron heat capacity in IMD units
    (eV/(eV A^3)); the step then returns te' instead of P_e.

    ``mpi_const = mpi_constants(lambda_m)`` arms the MULTIPHOTON
    channels; the step then takes the instantaneous photon flux as the
    trailing ``phi`` argument.
    """
    nlev = tab.n_lev
    # eV*N28/s -> eV/A^3/s
    p_to_a3 = N28 * 1e-30

    def cell_step(c, te, ne, dt_s, ce, phi):
        laser = None if mpi_const is None else (phi,) + tuple(mpi_const)

        def rhs(y):
            te_cur = y[nlev + 1] if evolve_te else te
            dc, dne, pe, _ = colrad_rhs(y[:nlev], te_cur, y[nlev], tab,
                                        use_ipd, laser)
            if evolve_te:
                dte = pe * p_to_a3 / jnp.maximum(ce, 1e-12)
                return jnp.concatenate([dc, dne[None], dte[None]])
            return jnp.concatenate([dc, dne[None]])

        ndim = nlev + (2 if evolve_te else 1)

        def be_newton(y, tau):
            def newton(_, yk):
                f = yk - y - tau * rhs(yk)
                jac = jnp.eye(ndim, dtype=y.dtype) \
                    - tau * jax.jacfwd(rhs)(yk)
                return yk - jnp.linalg.solve(jac, f)

            y1 = jax.lax.fori_loop(0, newton_iters, newton, y)
            res = jnp.linalg.norm(y1 - y - tau * rhs(y1))
            scale = jnp.linalg.norm(y) + 1.0
            ok = (res <= rtol * scale) & (jnp.min(y1) >= -1e-8 * scale)
            return jnp.maximum(y1, 0.0), ok

        # public API is 1/m^3; solve in N28 units (f32-safe, and the
        # Newton scale heuristic sees O(1-10) numbers)
        c = c * (1.0 / N28)
        ne = ne * (1.0 / N28)
        if evolve_te:
            y0 = jnp.concatenate([c, ne[None], te[None]])
        else:
            y0 = jnp.concatenate([c, ne[None]])
        tau0 = dt_s / n_sub
        tau_min = dt_s / (n_sub * 1024.0)

        def cond(carry):
            t, tau, y, k = carry
            return (t < dt_s * (1.0 - 1e-9)) & (k < max_tries)

        def body(carry):
            t, tau, y, k = carry
            tau_eff = jnp.minimum(tau, dt_s - t)
            y1, ok = be_newton(y, tau_eff)
            accept = ok | (tau <= tau_min)
            t = jnp.where(accept, t + tau_eff, t)
            y = jnp.where(accept, y1, y)
            tau = jnp.where(accept, tau * 2.0, tau * 0.25)
            tau = jnp.clip(tau, tau_min, dt_s)
            return t, tau, y, k + 1

        _, _, y1, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), y0.dtype), jnp.asarray(tau0),
                         y0, jnp.zeros((), jnp.int32)))
        te_out = y1[nlev + 1] if evolve_te else te
        _, _, pe, diag = colrad_rhs(y1[:nlev], te_out, y1[nlev], tab,
                                    use_ipd, laser)
        third = te_out if evolve_te else pe
        return y1[:nlev] * N28, y1[nlev] * N28, third, diag

    inner = jax.vmap(cell_step, in_axes=(0, 0, 0, None, 0, None))

    def step(c, te_ev, ne, dt_s, ce=None, phi=None):
        flat_c = c.reshape(-1, nlev)
        if ce is None:
            ce = jnp.ones_like(te_ev)
        if phi is None:
            phi = jnp.zeros((), te_ev.dtype)
        out_c, out_ne, third, diag = inner(flat_c, te_ev.reshape(-1),
                                           ne.reshape(-1), dt_s,
                                           ce.reshape(-1), phi)
        return (out_c.reshape(c.shape), out_ne.reshape(te_ev.shape),
                third.reshape(te_ev.shape),
                {k: v.reshape(te_ev.shape) for k, v in diag.items()})

    return step


# ---------------------------------------------------------------------------
# TTM-grid coupling (do_colrad, imd_colrad.c:123-290)
# ---------------------------------------------------------------------------

# power-density diagnostic column order (the reference's .ttm extra
# COLRAD columns, imd_ttm.c:1885-1897)
POWER_KEYS = ("P_EE", "P_EI", "P_MPI2", "P_MPI3", "P_RR")


class ColradGridState(struct.PyTreeNode):
    """Per-FD-cell level populations [nx, nlev] in 1/m^3, plus the last
    step's power densities [nx, 5] (P_EE/P_EI/P_MPI2/P_MPI3/P_RR, IMD
    units) for the .ttm output columns (imd_colrad.c:282-292)."""
    c: jnp.ndarray
    p: Optional[jnp.ndarray] = None


def init_grid_state(tab: ColradTables, nx: int,
                    dtype=jnp.float32) -> ColradGridState:
    return ColradGridState(c=jnp.zeros((nx, tab.n_lev), dtype),
                           p=jnp.zeros((nx, len(POWER_KEYS)), dtype))


def apply_colrad(grid, cstate: ColradGridState, tab: ColradTables,
                 params, step_fn, dt_imd, phi=None):
    """One MD step of COLRAD kinetics on the TTM grid.

    Fresh active cells are seeded all-neutral-ground (the reference runs
    a Saha pre-equilibration, colrad_Saha_init; the network itself
    relaxes the seed within a few steps); active cells then evolve
    (c, ne, Te) and write back temp/ne/Z like imd_colrad.c:277-279.
    Returns (grid, cstate, diag).
    """
    from imd_tpu import units as _u
    from imd_tpu.models.ttm import active_mask

    act = active_mask(grid, params)
    ntot = grid.dens / (params.atomic_mass * _u.AMU_TO_KG)   # 1/m^3
    fresh = act & (jnp.sum(cstate.c, -1) <= 0.0)
    seed = jnp.zeros_like(cstate.c).at[:, 0].set(ntot)
    c = jnp.where(fresh[:, None], seed, cstate.c)
    ne0 = jnp.where(fresh, jnp.maximum(1e-4 * ntot, 1e24), grid.ne)

    dt_s = dt_imd * _u.IMD_TIME_S
    c1, ne1, te1, diag = step_fn(c, jnp.maximum(grid.temp, 1e-3),
                                 jnp.maximum(ne0, 1e20), dt_s,
                                 jnp.maximum(grid.Ce, 1e-8), phi)
    zbar = mean_charge(c1, tab)
    new_grid = grid.replace(
        temp=jnp.where(act, te1, grid.temp),
        ne=jnp.where(act, ne1, grid.ne),
        Z=jnp.where(act, zbar, grid.Z))
    # power-density columns in IMD units (eV/A^3/time)
    p = jnp.stack([jnp.where(act, diag[k] * P_N28_TO_IMD, 0.0)
                   for k in POWER_KEYS], axis=-1).astype(cstate.c.dtype)
    return new_grid, ColradGridState(
        c=jnp.where(act[:, None], c1, cstate.c), p=p), diag


def mean_charge(c, tab: ColradTables):
    """<Z> = sum z c / sum c per cell."""
    num = jnp.sum(c * tab.zq, axis=-1)
    den = jnp.maximum(jnp.sum(c, axis=-1), 1.0)
    return num / den
