"""Wide-range electron transport models (imd_ttm.c:2191-2420).

Povarnitsyn-style wide-range electronic thermal conductivity kappa(Te, Ti,
ne, Z) interpolating between the metallic (electron-phonon limited) and
plasma (Spitzer) limits, the corresponding electron-phonon coupling g, and
the More-fit mean ionization <Z>(Te, rho) as used by POLLY-2T.

Unit conventions follow the reference exactly at the API boundary:
- inputs Te, Ti in eV (the reference converts to K internally, factor
  11604.5), ne in 1/m^3, dens in kg/m^3,
- getKappa returns IMD-internal kappa [eV / (A * time-unit * eV)]
  = kappa_SI[W/m/K] * 0.073768115942029  (imd_ttm.c:2398),
- getGamma returns IMD-internal g [eV / (eV * A^3 * time-unit)]
  (imd_ttm.c:2334: 3 kB m_e/(m_atom AMU) ne nu -> 2.7833e-74 prefactor).

float32-safety: the reference's literal SI formulas put constants like
hbar^2 (1.1e-68) and the gamma prefactor (2.8e-74) into device arithmetic,
which underflow to zero in float32 and poison the whole TTM grid with
NaNs (this bit us under the single-precision TPU path).  All internal
arithmetic here therefore runs in scaled units - temperatures in eV,
densities in 1e28/m^3, frequencies in 1e15/s, impact parameters in
Angstrom - with every constant product folded host-side in double
precision.  Every runtime intermediate stays within ~1e-30..1e30.

All functions are elementwise jnp and vmap/jit-safe.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from imd_tpu import units

# SI constants (same values as the reference's constants)
BOLTZMAN = units.KB_J
EMASS = units.EMASS_KG
ECHARGE = units.ECHARGE_C
ECONST = units.EPS0
HBAR = units.HBAR_J
AMU = units.AMU_TO_KG
EV_TO_K = 11604.5          # the reference's rounded conversion
EV = units.EV_TO_J

# Povarnitsyn fit constants (imd_ttm.c getKappa/getGamma)
A1T, A2T, A3T, A4T = 2.95, 0.5, 0.16, 1.2
A1G, A2G, A3G = 50.0, 20.0, 0.25

# ---------------------------------------------------------------------------
# scaled-unit constants (host-side doubles; see module docstring)
# ---------------------------------------------------------------------------
N28 = 1e28                                   # density unit, 1/m^3
NU15 = 1e15                                  # frequency unit, 1/s
# Fermi energy at ne = 1e28: EF = hbar^2 (3 pi^2 ne)^(2/3) / (2 m_e)
_EF0_EV = (HBAR * HBAR * (3.0 * math.pi ** 2 * N28) ** (2.0 / 3.0)
           / (2.0 * EMASS)) / EV             # ~1.6919 eV
_EF0_J = _EF0_EV * EV
# thermal/Fermi speed unit sqrt(eV / m_e)
_VUNIT = math.sqrt(EV / EMASS)               # ~4.1938e5 m/s
# Wigner-Seitz radius at ni = 1e28
_R0_28_M = (3.0 / (4.0 * math.pi * N28)) ** (1.0 / 3.0)   # ~2.879e-10 m
_R0_28_A = _R0_28_M * 1e10
# omega_pl at ne = 1e28, in 1e15/s
_WPL28_15 = math.sqrt(N28 * ECHARGE ** 2 / (EMASS * ECONST)) / NU15
# b_min branches in Angstrom: Z e^2/(kB Te) = Z e / Te_eV meters
_BMIN1_A = ECHARGE * 1e10                    # / Te_eV, * Z
_BMIN2_A = HBAR / math.sqrt(2.0 * EMASS * EV) * 1e10   # / sqrt(Te_eV)
# numet prefactor: 1.3092e11 (kB/hbar) * EV_TO_K / NU15, temps in eV
_NUMET15 = 1.309202957843054e+11 * EV_TO_K / NU15      # ~1.5193
# numax: A3 * vunit / r0(ni) * sqrt(...) -> * ni28^(1/3)
_NUMAX15 = _VUNIT / _R0_28_M / NU15                    # ~1.4567
# nupl: 1.8638e-40 Z ne cl / (kB Te_K)^1.5, temps eV, ne in N28
_NUPL15 = 1.863839656495274e-40 * N28 / (EV ** 1.5) / NU15
# kappa_met: 6.8842e-16 ne Te_K / nu  [W/m/K]
_KMET = 6.884236239621913e-16 * N28 * EV_TO_K / NU15   # ~79.89
# kappa_pl: 4.4288e43 (kB Te)^2.5 / (Z cl)  [W/m/K]
_KPL = 4.428788911416808e+43 * (EV ** 2.5)             # ~4.547e-4
# gamma: 2.7833e-74 / (m AMU) * ne * nu  [IMD units]
_GAM = 2.783313120645740e-74 / AMU * N28 * NU15        # ~1.676e-4 / m_amu

KAPPA_SI_TO_IMD = 0.073768115942029


def fermi_E_eV(ne):
    """Fermi energy [eV] from electron density [1/m^3]."""
    return _EF0_EV * (ne * (1.0 / N28)) ** (2.0 / 3.0)


def fermi_E(ne):
    """Fermi energy [J] (imd_ttm.c:2191); f32-safe (result ~1e-18)."""
    return fermi_E_eV(ne) * EV


def fermi_T(ne):
    """Fermi temperature [K]: 2 EF / (3 kB)."""
    return fermi_E_eV(ne) * (2.0 / 3.0 * EV_TO_K)


def omega_pl(ne):
    """Plasma frequency [1/s]."""
    return (_WPL28_15 * NU15) * jnp.sqrt(ne * (1.0 / N28))


def r0(ni):
    """Wigner-Seitz radius [m] (imd_ttm.c:2236)."""
    return _R0_28_M * (jnp.maximum(ni, 1.0) * (1.0 / N28)) ** (-1.0 / 3.0)


def _b_min_a(Z, Te_eV):
    """min impact parameter [Angstrom]."""
    return jnp.maximum(Z * (_BMIN1_A / jnp.maximum(Te_eV, 1e-10)),
                       _BMIN2_A / jnp.sqrt(jnp.maximum(Te_eV, 1e-10)))


def _b_max_a(omega_las15, Z, ni28, Te_eV, laser_active):
    tf = (2.0 / 3.0) * _EF0_EV * (ni28 * Z) ** (2.0 / 3.0)   # TF in eV
    teff = jnp.sqrt(Te_eV ** 2 + tf ** 2)
    wpl15 = _WPL28_15 * jnp.sqrt(ni28 * Z)
    om15 = jnp.where(laser_active, jnp.maximum(omega_las15, wpl15), wpl15)
    v_over_w = (_VUNIT / NU15 * 1e10) * jnp.sqrt(teff) / jnp.maximum(om15,
                                                                     1e-10)
    return jnp.maximum(_R0_28_A * ni28 ** (-1.0 / 3.0), v_over_w)


def b_min(Z, Te_K):
    """[m] - reference signature (Te in K)."""
    return _b_min_a(Z, Te_K / EV_TO_K) * 1e-10


def b_max(omega_las, Z, ni, Te_K, laser_active):
    """[m] - reference signature."""
    return _b_max_a(omega_las / NU15, Z, ni * (1.0 / N28), Te_K / EV_TO_K,
                    laser_active) * 1e-10


def _coulomb_log(omega_las15, Z, ni28, Te_eV, laser_active):
    return jnp.maximum(2.0, jnp.log(
        _b_max_a(omega_las15, Z, ni28, Te_eV, laser_active)
        / _b_min_a(Z, Te_eV)))


def coulomb_log(omega_las, Z, ni, Te_K, laser_active):
    return _coulomb_log(omega_las / NU15, Z, ni * (1.0 / N28),
                        Te_K / EV_TO_K, laser_active)


def _numet15(A1, A2, Te_eV, Ti_eV, TF_eV):
    """Metallic e-ph collision frequency [1e15/s] (imd_ttm.c:2282)."""
    return _NUMET15 * (A1 * Ti_eV + A2 * Te_eV * Te_eV
                       / jnp.maximum(TF_eV, 1e-10))


def _numax15(A3, EF_eV, Te_eV, ni28):
    """Saturation collision frequency [1e15/s] (imd_ttm.c:2292).

    sqrt(vF^2 + kB Te/m) = vunit sqrt(2 EF + Te)   (temps/energies in eV).
    """
    return A3 * _NUMAX15 * jnp.sqrt(2.0 * EF_eV + Te_eV) * ni28 ** (1.0 / 3.0)


def _nupl15(omega_las15, Z, ni28, ne28, Te_eV, laser_active):
    """Plasma (Spitzer) collision frequency [1e15/s] (imd_ttm.c:2297)."""
    cl = _coulomb_log(omega_las15, Z, ni28, Te_eV, laser_active)
    return _NUPL15 * Z * ne28 * cl / jnp.maximum(Te_eV, 1e-10) ** 1.5


# reference-signature wrappers (Te in K, nu in 1/s) kept for parity checks
def numet(A1, A2, Te_K, Ti_K, TF_K):
    return _numet15(A1, A2, Te_K / EV_TO_K, Ti_K / EV_TO_K,
                    TF_K / EV_TO_K) * NU15


def numax(A3, vf, Te_K, ni):
    # vf = sqrt(2 EF / m)  ->  EF_eV = (vf/vunit)^2 / 2
    ef = (vf / _VUNIT) ** 2 * 0.5
    return _numax15(A3, ef, Te_K / EV_TO_K, ni * (1.0 / N28)) * NU15


def nupl(omega_las, Z, ni, ne, Te_K, laser_active):
    return _nupl15(omega_las / NU15, Z, ni * (1.0 / N28), ne * (1.0 / N28),
                   Te_K / EV_TO_K, laser_active) * NU15


def mean_charge(Te_eV, dens, z0, am):
    """More-fit mean ionization <Z> (imd_ttm.c:2241 MeanCharge).

    Te in eV, dens in kg/m^3, z0 = nuclear charge, am = atomic mass [amu].
    (Already f32-safe: every intermediate is O(1).)
    """
    temp_kK = Te_eV * (EV_TO_K * 1e-3)
    rho_gcc = dens * 1e-3
    YA1, YA2, YA3, YA4 = 0.003323, 0.971832, 0.926148e-5, 3.10165
    YB0, YB1, YB2 = -1.7630, 1.43175, 0.315463
    YC1, YC2 = 0.036666667, 0.983333333
    YAL, YBE = 0.143139e2, 0.6624e0
    t0 = temp_kK / z0 ** (4.0 / 3.0)
    t0 = jnp.maximum(t0, 1e-30)
    rr = jnp.maximum(rho_gcc / (z0 * am), 1e-30)
    ytf = t0 / (1.0 + t0)
    ya = YA1 * t0 ** YA2 + YA3 * t0 ** YA4
    yb = -jnp.exp(YB0 + YB1 * ytf + YB2 * ytf * ytf)
    yc = YC1 * ytf + YC2
    yq1 = ya * rr ** yb
    yq = (rr ** yc + yq1 ** yc) ** (1.0 / yc)
    yx = YAL * yq ** YBE
    return z0 * yx / (1.0 + yx + jnp.sqrt(1.0 + 2.0 * yx))


def get_kappa(Te_eV, Ti_eV, ne, Z, omega_laser=0.0, laser_active=False):
    """Wide-range electronic kappa, IMD units (imd_ttm.c:2356 getKappa)."""
    Z = jnp.maximum(Z, 1e-10)
    ne28 = ne * (1.0 / N28)
    ni28 = ne28 / Z
    om15 = omega_laser / NU15
    EF = _EF0_EV * ne28 ** (2.0 / 3.0)
    TF = (2.0 / 3.0) * EF
    nu15 = jnp.minimum(_numet15(A1T, A2T, Te_eV, Ti_eV, TF),
                       _numax15(A3T, EF, Te_eV, ni28))
    cl = _coulomb_log(om15, Z, ni28, Te_eV, laser_active)
    kappa_met = _KMET * ne28 * Te_eV / jnp.maximum(nu15, 1e-30)
    kappa_pl = _KPL * jnp.maximum(Te_eV, 1e-10) ** 2.5 / (Z * cl)
    kappa_wr = kappa_pl + (kappa_met - kappa_pl) * jnp.exp(-A4T * Te_eV / TF)
    return kappa_wr * KAPPA_SI_TO_IMD   # SI -> IMD units


def get_gamma(Te_eV, Ti_eV, ne, Z, m_atom=26.9815, omega_laser=0.0,
              laser_active=False):
    """Wide-range e-ph coupling g, IMD units (imd_ttm.c:2310 getGamma)."""
    Z = jnp.maximum(Z, 1e-10)
    ne28 = ne * (1.0 / N28)
    ni28 = ne28 / Z
    om15 = omega_laser / NU15
    EF = _EF0_EV * ne28 ** (2.0 / 3.0)
    TF = (2.0 / 3.0) * EF
    nu15 = jnp.minimum(
        _numet15(A1G, A2G, Te_eV, Ti_eV, TF),
        jnp.minimum(_numax15(A3G, EF, Te_eV, ni28),
                    _nupl15(om15, Z, ni28, ne28, Te_eV, laser_active)))
    return (_GAM / m_atom) * ne28 * nu15
