"""Wide-range electron transport models (imd_ttm.c:2191-2420).

Povarnitsyn-style wide-range electronic thermal conductivity kappa(Te, Ti,
ne, Z) interpolating between the metallic (electron-phonon limited) and
plasma (Spitzer) limits, the corresponding electron-phonon coupling g, and
the More-fit mean ionization <Z>(Te, rho) as used by POLLY-2T.

Unit conventions follow the reference exactly:
- inputs Te, Ti in eV (converted to K internally, factor 11604.5),
- ne in 1/m^3, dens in kg/m^3,
- getKappa returns IMD-internal kappa [eV / (A * time-unit * eV)]
  = kappa_SI[W/m/K] * 0.073768115942029  (imd_ttm.c:2398),
- getGamma returns IMD-internal g [eV / (eV * A^3 * time-unit)]
  (imd_ttm.c:2334: 3 kB m_e/(m_atom AMU) ne nu -> 2.7833e-74 prefactor).

All functions are elementwise jnp and vmap/jit-safe.
"""

from __future__ import annotations

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

# Povarnitsyn fit constants (imd_ttm.c getKappa/getGamma)
A1T, A2T, A3T, A4T = 2.95, 0.5, 0.16, 1.2
A1G, A2G, A3G = 50.0, 20.0, 0.25


def fermi_E(ne):
    """Fermi energy [J] from electron density [1/m^3] (imd_ttm.c:2191)."""
    return HBAR * HBAR * (3.0 * jnp.pi ** 2 * ne) ** (2.0 / 3.0) / (2.0 * EMASS)


def fermi_T(ne):
    return 2.0 * fermi_E(ne) / (3.0 * BOLTZMAN)


def omega_pl(ne):
    return jnp.sqrt(ne * ECHARGE * ECHARGE / (EMASS * ECONST))


def r0(ni):
    """Wigner-Seitz radius [m] (imd_ttm.c:2236)."""
    return (3.0 / (4.0 * jnp.pi * jnp.maximum(ni, 1.0))) ** (1.0 / 3.0)


def b_min(Z, Te_K):
    return jnp.maximum(Z * ECHARGE * ECHARGE / (BOLTZMAN * Te_K),
                       HBAR / jnp.sqrt(2.0 * EMASS * BOLTZMAN * Te_K))


def b_max(omega_las, Z, ni, Te_K, laser_active):
    teff = jnp.sqrt(Te_K ** 2 + fermi_T(ni * Z) ** 2)
    om = jnp.where(laser_active,
                   jnp.maximum(omega_las, omega_pl(ni * Z)),
                   omega_pl(ni * Z))
    return jnp.maximum(r0(ni), jnp.sqrt(BOLTZMAN * teff / EMASS) / om)


def coulomb_log(omega_las, Z, ni, Te_K, laser_active):
    return jnp.maximum(2.0, jnp.log(b_max(omega_las, Z, ni, Te_K, laser_active)
                                    / b_min(Z, Te_K)))


def numet(A1, A2, Te_K, Ti_K, TF_K):
    """Metallic e-ph collision frequency [1/s] (imd_ttm.c:2282).

    1.3092e11 = kB/hbar.
    """
    return 1.309202957843054e+11 * (A1 * Ti_K + A2 * Te_K * Te_K / TF_K)


def numax(A3, vf, Te_K, ni):
    """Saturation collision frequency [1/s] (imd_ttm.c:2292)."""
    return A3 / r0(ni) * jnp.sqrt(vf * vf + BOLTZMAN * Te_K / EMASS)


def nupl(omega_las, Z, ni, ne, Te_K, laser_active):
    """Plasma (Spitzer) collision frequency [1/s] (imd_ttm.c:2297)."""
    cl = coulomb_log(omega_las, Z, ni, Te_K, laser_active)
    return 1.863839656495274e-40 * Z * ne * cl / (BOLTZMAN * Te_K) ** 1.5


def mean_charge(Te_eV, dens, z0, am):
    """More-fit mean ionization <Z> (imd_ttm.c:2241 MeanCharge).

    Te in eV, dens in kg/m^3, z0 = nuclear charge, am = atomic mass [amu].
    """
    temp_kK = Te_eV * EV_TO_K * 1e-3
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
    Te = Te_eV * EV_TO_K
    Ti = Ti_eV * EV_TO_K
    Z = jnp.maximum(Z, 1e-10)
    ni = ne / Z
    EF = fermi_E(ne)
    TF = 4.828648689433765e+22 * EF       # 2 EF / (3 kB)
    VF = 1.481734876966785e+15 * jnp.sqrt(EF)
    nu_eff = jnp.minimum(numet(A1T, A2T, Te, Ti, TF), numax(A3T, VF, Te, ni))
    cl = coulomb_log(omega_laser, Z, ni, Te, laser_active)
    kappa_met = 6.884236239621913e-16 * ne * Te / nu_eff
    kappa_pl = 4.428788911416808e+43 * (BOLTZMAN * Te) ** 2.5 / (Z * cl)
    kappa_wr = kappa_pl + (kappa_met - kappa_pl) * jnp.exp(-A4T * Te / TF)
    return kappa_wr * 0.073768115942029   # SI -> IMD units


def get_gamma(Te_eV, Ti_eV, ne, Z, m_atom=26.9815, omega_laser=0.0,
              laser_active=False):
    """Wide-range e-ph coupling g, IMD units (imd_ttm.c:2310 getGamma)."""
    Te = Te_eV * EV_TO_K
    Ti = Ti_eV * EV_TO_K
    Z = jnp.maximum(Z, 1e-10)
    ni = ne / Z
    EF = fermi_E(ne)
    TF = 4.828648689433765e+22 * EF
    VF = 1.481734876966785e+15 * jnp.sqrt(EF)
    nu_eff = jnp.minimum(
        numet(A1G, A2G, Te, Ti, TF),
        jnp.minimum(numax(A3G, VF, Te, ni),
                    nupl(omega_laser, Z, ni, ne, Te, laser_active)))
    return 2.783313120645740e-74 / (m_atom * AMU) * ne * nu_eff
