"""Electron equation-of-state: C_e(rho, T_e), U(T_e), T_e(U).

The reference loads scattered-data text tables (EOS_cve_from_r_te.txt etc.,
imd_interpol.c:1174 via Delaunay interpolation) that are NOT in the repo
(stripped large blobs), with a free-electron-gas (FEG) fallback whose heat
capacity uses Mazhukin's Fermi-integral approximation
(FEG_cve_from_ne_te, imd_ttm.c:3373):

    Cv_class = 1.5 ne kB
    Cv_deg   = pi^2 ne kB^2 T / (2 EF)
    Cv_mix   = (Cv_deg^-2 + Cv_class^-2)^(-1/2)

We make the FEG model the self-contained default and give it *closed-form*
energy and inverse:  with x = T/T*, T* = 3 EF / (pi^2 kB) ... the mix
integrates to  u(T) = Cv_class T* (sqrt(1+x^2) - 1), which inverts
analytically — no Brent minimization (fminbnd3.c) needed on device.

Units match the reference: Ce in eV/(eV A^3) (energy density per eV of
temperature), U in eV/atom, T in eV, dens in kg/m^3, ne in 1/m^3.

External EOS tables, when available, can be loaded with `TabulatedEOS.load`
(regular-grid resampling of the scattered data + bilinear interpolation).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imd_tpu import units
from imd_tpu.models import widerange as wr

EV_TO_K = wr.EV_TO_K


# kB * 1e28: folded so no runtime product ever touches kB^2 ~ 1.9e-46,
# which underflows float32 (poisoned the whole grid with NaNs via Ce=0)
_KB28 = wr.BOLTZMAN * wr.N28


def _cv_mix_si(ne, T_K):
    """Mazhukin mixed heat capacity [J/(K m^3)] (imd_ttm.c:3388-3390).

    cv_deg = pi^2 ne kB^2 T / (2 EF) rewritten as
    (pi^2/2) (ne kB) (T_eV / EF_eV) - float32-safe.
    """
    ne28 = ne * (1.0 / wr.N28)
    EF_eV = wr.fermi_E_eV(ne)
    T_eV = T_K / wr.EV_TO_K
    cv_class = ne28 * (1.5 * _KB28)
    cv_deg = (jnp.pi ** 2 / 2.0 * _KB28) * ne28 * T_eV / jnp.maximum(
        EF_eV, 1e-10)
    return 1.0 / jnp.sqrt(1.0 / cv_deg ** 2 + 1.0 / cv_class ** 2)


def _tstar_K(ne):
    """Crossover temperature T* where Cv_deg == Cv_class: 3 EF/(pi^2 kB)."""
    return wr.fermi_E_eV(ne) * (3.0 * wr.EV_TO_K / math.pi ** 2)


class FEGEos(struct.PyTreeNode):
    """Closed-form free-electron-gas EOS; stateless (all args per-call).

    ``atomic_mass`` in amu (for eV/atom energies).
    """
    atomic_mass: float = struct.field(pytree_node=False, default=26.9815)

    def ce(self, dens, ne, Te_eV):
        """C_e in eV/(eV A^3) (the diffusion's Ce; FEG_cve_from_ne_te)."""
        T_K = Te_eV * EV_TO_K
        cv = _cv_mix_si(ne, jnp.maximum(T_K, 1.0))   # J/(K m^3)
        # J/(K m^3) -> eV/(eV A^3): * 11604.5 K/eV * 1e-30 m^3/A^3 * J2eV
        return cv * EV_TO_K * 1e-30 * units.J_TO_EV

    def u_from_te(self, dens, ne, Te_eV):
        """Internal energy per atom [eV/atom] from T_e [eV].

        Closed form of the Cv_mix integral:  u_vol(T) = Cv_class T*
        (sqrt(1+(T/T*)^2)-1)  [J/m^3], then / (dens/m_atom/AMU) atoms/m^3.
        f32-safe form: per-atom energy = (ne/n_atoms) 1.5 kB_eV T*_K
        (sqrt(1+x^2)-1) with kB in eV/K.
        """
        ts = _tstar_K(ne)                      # K
        x = Te_eV * EV_TO_K / ts
        n_atoms = jnp.maximum(dens, 1e-30) * (1.0 / (self.atomic_mass
                                                     * wr.AMU * wr.N28))
        ne28 = ne * (1.0 / wr.N28)
        kb_ev = 1.0 / EV_TO_K
        return (ne28 / n_atoms) * (1.5 * kb_ev) * ts * (
            jnp.sqrt(1.0 + x * x) - 1.0)

    def pe(self, dens, ne, Te_eV):
        """Electron pressure [IMD units eV/A^3]: free-electron gas
        P_e = (2/3) u_vol (EOS_pe_from_r_te stand-in, imd_ttm.c:2639)."""
        ts = _tstar_K(ne)
        x = Te_eV * EV_TO_K / ts
        ne28 = ne * (1.0 / wr.N28)
        kb_ev = 1.0 / EV_TO_K
        # u_vol in eV per A^3: ne[1/A^3] * 1.5 kb_ev * ts * (...)
        u_a3 = ne28 * (1e28 * 1e-30) * (1.5 * kb_ev) * ts * (
            jnp.sqrt(1.0 + x * x) - 1.0)
        return (2.0 / 3.0) * u_a3

    def te_from_u(self, dens, ne, U_eV_atom):
        """Inverse of u_from_te, closed form, returns T_e [eV]."""
        ts = _tstar_K(ne)
        n_atoms = jnp.maximum(dens, 1e-30) * (1.0 / (self.atomic_mass
                                                     * wr.AMU * wr.N28))
        ne28 = jnp.maximum(ne * (1.0 / wr.N28), 1e-30)
        kb_ev = 1.0 / EV_TO_K
        y = jnp.maximum(U_eV_atom, 0.0) * n_atoms / (
            ne28 * (1.5 * kb_ev) * ts) + 1.0
        T_K = ts * jnp.sqrt(jnp.maximum(y * y - 1.0, 0.0))
        return T_K / EV_TO_K


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TabulatedEOS:
    """Regular-grid (rho, sqrt(Te)) EOS tables with bilinear interpolation.

    Mirrors the reference's EOS_* accessors (imd_ttm.c:2483-2699) but with
    the scattered Delaunay tables resampled onto a regular grid at load
    time (host-side) so lookups are static-shape device code.  Inversion
    T(U) uses vectorized bisection instead of Brent (fminbnd3.c:6).
    """
    rho_grid: jnp.ndarray        # [nr]
    tsq_grid: jnp.ndarray        # [nt]  sqrt(T[K]) samples
    ee: jnp.ndarray              # [nr, nt]  J/kg (reference native unit)
    cve: jnp.ndarray             # [nr, nt]  J/(K kg) (reference native
    #   unit, EOS_cve_from_r_te imd_ttm.c:2586; ce() converts to the
    #   internal eV/(eV A^3) with the same *dens chain the reference uses
    atomic_mass: float

    def tree_flatten(self):
        return ((self.rho_grid, self.tsq_grid, self.ee, self.cve),
                self.atomic_mass)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, atomic_mass=aux)

    def _interp2(self, table, r, tsq):
        rg, tg = self.rho_grid, self.tsq_grid
        r = jnp.clip(r, rg[0], rg[-1])
        tsq = jnp.clip(tsq, tg[0], tg[-1])
        ir = jnp.clip(jnp.searchsorted(rg, r) - 1, 0, len(rg) - 2)
        it = jnp.clip(jnp.searchsorted(tg, tsq) - 1, 0, len(tg) - 2)
        fr = (r - rg[ir]) / (rg[ir + 1] - rg[ir])
        ft = (tsq - tg[it]) / (tg[it + 1] - tg[it])
        v00 = table[ir, it]
        v01 = table[ir, it + 1]
        v10 = table[ir + 1, it]
        v11 = table[ir + 1, it + 1]
        return ((1 - fr) * (1 - ft) * v00 + (1 - fr) * ft * v01
                + fr * (1 - ft) * v10 + fr * ft * v11)

    def ce(self, dens, ne, Te_eV):
        tsq = jnp.sqrt(jnp.maximum(Te_eV, 1e-10) * EV_TO_K)
        cve_kg = self._interp2(self.cve, dens, tsq)   # J/(K kg)
        # J/(K kg) -> eV/(eV A^3): * dens * 11604.5 * 1e-30 * J2eV
        # (the reference's exact chain, imd_ttm.c:2586-2589)
        return cve_kg * dens * (EV_TO_K * 1e-30 * units.J_TO_EV)

    def u_from_te(self, dens, ne, Te_eV):
        tsq = jnp.sqrt(jnp.maximum(Te_eV, 1e-10) * EV_TO_K)
        ee = self._interp2(self.ee, dens, tsq)      # J/kg
        return ee * self.atomic_mass * wr.AMU * units.J_TO_EV

    def pe(self, dens, ne, Te_eV):
        """Electron pressure [IMD units eV/A^3]: free-electron gas
        P_e = (2/3) u_vol (EOS_pe_from_r_te stand-in, imd_ttm.c:2639)."""
        ts = _tstar_K(ne)
        x = Te_eV * EV_TO_K / ts
        ne28 = ne * (1.0 / wr.N28)
        kb_ev = 1.0 / EV_TO_K
        # u_vol in eV per A^3: ne[1/A^3] * 1.5 kb_ev * ts * (...)
        u_a3 = ne28 * (1e28 * 1e-30) * (1.5 * kb_ev) * ts * (
            jnp.sqrt(1.0 + x * x) - 1.0)
        return (2.0 / 3.0) * u_a3

    def te_from_u(self, dens, ne, U_eV_atom):
        """Vectorized bisection on sqrt(T) (replaces Brent, imd_ttm.c:2699)."""
        target = U_eV_atom / (self.atomic_mass * wr.AMU * units.J_TO_EV)
        lo = jnp.full_like(target, self.tsq_grid[0])
        hi = jnp.full_like(target, self.tsq_grid[-1])

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            val = self._interp2(self.ee, dens, mid)
            too_low = val < target
            return (jnp.where(too_low, mid, lo), jnp.where(too_low, hi, mid))

        lo, hi = jax.lax.fori_loop(0, 40, body, (lo, hi))
        tsq = 0.5 * (lo + hi)
        return tsq * tsq / EV_TO_K

    @classmethod
    def load(cls, cve_path: str, ee_path: str, atomic_mass: float,
             nr: int = 128, nt: int = 128, dtype=jnp.float32) -> "TabulatedEOS":
        """Load the reference's scattered (x y z) tables and resample.

        EOS_cve_from_r_te.txt: rho[kg/m^3] Te[K] cve;
        EOS_ee_from_r_tesqrt.txt: rho sqrt(Te) ee[J/kg].
        """
        from scipy.interpolate import griddata  # noqa: deferred heavy import

        def load_xyz(path):
            # the reference format (nn_read_table, imd_interpol.c:1174)
            # carries a 2-line header: "is js" then "xmin xmax ymin ymax"
            with open(path) as f:
                first = f.readline().split()
            return np.loadtxt(path, skiprows=2 if len(first) == 2 else 0)

        cve_raw = load_xyz(cve_path)
        ee_raw = load_xyz(ee_path)
        rho = np.linspace(min(cve_raw[:, 0].min(), ee_raw[:, 0].min()),
                          max(cve_raw[:, 0].max(), ee_raw[:, 0].max()), nr)
        tsq_e = np.linspace(ee_raw[:, 1].min(), ee_raw[:, 1].max(), nt)
        RR, TT = np.meshgrid(rho, tsq_e, indexing="ij")
        ee = griddata(ee_raw[:, :2], ee_raw[:, 2], (RR, TT), method="linear")
        cve_pts = np.column_stack([cve_raw[:, 0], np.sqrt(cve_raw[:, 1])])
        cve = griddata(cve_pts, cve_raw[:, 2], (RR, TT), method="linear")
        ee = np.nan_to_num(ee, nan=0.0)
        cve = np.nan_to_num(cve, nan=0.0)
        return cls(rho_grid=jnp.asarray(rho, dtype),
                   tsq_grid=jnp.asarray(tsq_e, dtype),
                   ee=jnp.asarray(ee, dtype), cve=jnp.asarray(cve, dtype),
                   atomic_mass=float(atomic_mass))
