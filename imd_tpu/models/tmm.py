"""1-D Helmholtz transfer-matrix laser solver (TMM).

Rebuild of the reference's imd_tmm.c (do_tmm:193-454, tmm_get_epsilon:501,
tmm_K1/K2:662-695) as a fully vectorized JAX computation:

- per-FD-cell wide-range permittivity eps(lambda, T_e, T_i, Z, n_e)
  combining a Drude metallic branch (with bound-band/interband term and
  collision-frequency saturation), a collisional-plasma branch with
  Maxwellian-averaged K1/K2 kernels, and an exponential Te/TF blend
  (Povarnitsyn-style wide-range model);
- transfer-matrix scan through the layered profile.  The reference does a
  sequential 2x2 complex matrix product on rank 0 (imd_tmm.c:297-373); here
  it is a `lax.associative_scan` of interface matrices, which yields ALL
  prefix products in log depth - the absorption cutoff (ecut), reflectivity
  and per-layer field amplitudes B+/B- fall out of the same scan with no
  sequential loop at all;
- per-cell absorbed power Q_abs = I(t) k0 Im(eps) <|E|^2>.  The reference
  integrates |E(z)|^2 over the cell with an adaptive Runge-Kutta walker
  (Runge5, imd_tmm.c:36-69); |B+ e^{ikdz} + B- e^{-ikdz}|^2 has a closed
  antiderivative, so we use the exact integral instead.

The K1/K2 kernels are the Maxwellian averages for a nu(v) ~ v^-3 Coulomb
collision frequency,

    K1(xi) = 4/(3 sqrt(pi)) Int_0^inf t^{9/2} e^-t / (t^3 + xi^2) dt
    K2(xi) = Int_0^inf t^3 e^-t / (t^3 + xi^2) dt

whose large-xi expansions reproduce the reference's hard-coded asymptotics
(315/8/xi^2 - 675675/64/xi^4 and 6/xi^2 - 720/xi^4, imd_tmm.c:675,692)
exactly; the reference loads them from a pre-computed table ../K12.dat
(stripped from the mount), we generate the same 1500-row xi = (i+1)/30
table by quadrature at init.

The bound-band (interband) permittivity table ../alu_eps_bb.dat is also
absent from the reference tree; `default_bb_table` synthesizes one from a
Lorentz-oscillator fit for Al (the reference's own static Drude-Lorentz
constants, imd_tmm.c:478-481); a user table (lambda_um, Re, Im) is used
when provided.

Conventions kept from the reference: normal incidence, s-polarization
(imd_tmm.c:83-93 hard-codes the s-branch), cell 0 is the vacuum entry
(km[0]=k0), inactive cells are vacuum, I(t) = I0 [exp(-(t-t0)^2/sigma_t^2)
+ exp(-(t-t1)^2/sigma_t1^2)] in SI seconds.  Deviation: the reference
inserts a 1e10-A vacuum entry layer (imd_tmm.c:323) which only multiplies
all amplitudes by a global phase; we use a zero-thickness entry, which
leaves every observable (R, T, A, |E|^2, Q_abs) unchanged and avoids the
catastrophic phase in single precision.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imd_tpu import units
from imd_tpu.models import widerange as wr

# vacuum impedance (imd_tmm.c:196)
VACUUM_IMPEDANCE = 376.9911184307751
# W/m^3 -> IMD power density eV/(A^3 * time-unit)  (imd_tmm.c:438)
WM3_TO_IMD = 6.3538562638e-26

# wide-range permittivity fit constants (imd_tmm.c:515-518)
A1P, A2P, A3P, A4P = 4.41, 0.8, 0.7, 0.2


# ---------------------------------------------------------------------------
# K1/K2 kernel table generation (replaces ../K12.dat)
# ---------------------------------------------------------------------------

def k12_tables(n: int = 1500) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Generate the K1/K2 table on the reference's grid xi_i = (i+1)/30.

    Composite Simpson on t in [0, 60] (integrand carries e^-t; truncation
    error < 1e-26).  Returns (xi, K1, K2) float64 arrays.
    """
    xi = (np.arange(n, dtype=np.float64) + 1.0) / 30.0
    t = np.linspace(0.0, 60.0, 24001)
    h = t[1] - t[0]
    # Simpson weights
    w = np.ones_like(t)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    w *= h / 3.0
    et = np.exp(-t)
    k1 = np.empty(n)
    k2 = np.empty(n)
    c1 = 4.0 / (3.0 * math.sqrt(math.pi))
    t3 = t ** 3
    f1 = t ** 4.5 * et
    f2 = t3 * et
    for lo in range(0, n, 100):
        hi = min(lo + 100, n)
        den = t3[None, :] + (xi[lo:hi, None]) ** 2
        k1[lo:hi] = c1 * np.sum(w * f1 / den, axis=1)
        k2[lo:hi] = np.sum(w * f2 / den, axis=1)
    return xi, k1, k2


def _k_interp(tab: jnp.ndarray, nu, large_fn):
    """Reference K-table lookup (imd_tmm.c:662-695): linear interpolation on
    the (i+1)/30 grid, 1 below 1/30, asymptotic expansion above 50."""
    i = jnp.clip((nu * 30.0).astype(jnp.int32) - 1, 0, 1498)
    frac = 30.0 * nu - (i + 1).astype(nu.dtype)
    mid = tab[i] + frac * (tab[i + 1] - tab[i])
    out = jnp.where(nu < 1.0 / 30.0, 1.0, mid)
    return jnp.where(nu >= 50.0, large_fn(nu), out)


def k1_of(tab, nu):
    return _k_interp(tab, nu, lambda x: 315.0 / 8.0 / x ** 2
                     - 675675.0 / 64.0 / x ** 4)


def k2_of(tab, nu):
    return _k_interp(tab, nu, lambda x: 6.0 / x ** 2 - 720.0 / x ** 4)


# ---------------------------------------------------------------------------
# bound-band (interband) permittivity
# ---------------------------------------------------------------------------

def default_bb_table(lam_lo_um: float = 0.2, lam_hi_um: float = 2.0,
                     n: int = 512) -> np.ndarray:
    """Synthetic Al interband table (lambda_um, Re eps_bb, Im eps_bb).

    Lorentz oscillator with the reference's static Al Drude-Lorentz fit
    constants (imd_tmm.c:478-481): eps_bb = (eps_inf - 1)
    + wpL^2 / (w0L^2 - w^2 - i gL w).  Stands in for the absent
    ../alu_eps_bb.dat; pass a real table for production runs.
    """
    eps_inf = 2.73
    wp_l = 9.6929256835e15
    g_l = 9.84485242e14
    w0_l = 2.47640578e15
    lam = np.linspace(lam_lo_um, lam_hi_um, n)
    w = 2.0 * math.pi * units.C_SI / (lam * 1e-6)
    eps = (eps_inf - 1.0) + wp_l ** 2 / (w0_l ** 2 - w ** 2 - 1j * g_l * w)
    return np.stack([lam, eps.real, eps.imag], axis=1)


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

class TMMParams(struct.PyTreeNode):
    """TMM solver state-independent inputs (tables are pytree leaves)."""
    # static configuration
    lambda_m: float = struct.field(pytree_node=False)
    i0: float = struct.field(pytree_node=False)            # W/m^2
    t0_s: float = struct.field(pytree_node=False)
    sigma_t_s: float = struct.field(pytree_node=False)
    t1_s: float = struct.field(pytree_node=False, default=0.0)
    sigma_t1_s: float = struct.field(pytree_node=False, default=0.0)
    absorption_threshold: float = struct.field(pytree_node=False, default=20.0)
    laser_threshold: float = struct.field(pytree_node=False, default=1e-5)
    # tables (leaves)
    k1_tab: jnp.ndarray = None
    k2_tab: jnp.ndarray = None
    bb_lam_um: jnp.ndarray = None
    bb_re: jnp.ndarray = None
    bb_im: jnp.ndarray = None

    @property
    def omega(self) -> float:
        return 2.0 * math.pi * units.C_SI / self.lambda_m

    @property
    def k0_per_a(self) -> float:
        """Vacuum wavenumber in 1/Angstrom (imd_tmm.c:151-152)."""
        return 2.0 * math.pi / self.lambda_m * 1e-10


def make_tmm_params(cfg, dtype=jnp.float64) -> TMMParams:
    """Build TMMParams from a TMMConfig (tmm_init, imd_tmm.c:98-191)."""
    xi, k1, k2 = k12_tables()
    if getattr(cfg, "bb_table", ""):
        bb = np.loadtxt(cfg.bb_table)
    else:
        bb = default_bb_table()
    return TMMParams(
        lambda_m=cfg.lambda_m, i0=cfg.I0,
        t0_s=cfg.t0_s, sigma_t_s=cfg.sigma_t_s,
        t1_s=cfg.t1_s, sigma_t1_s=cfg.sigma_t1_s,
        absorption_threshold=cfg.absorption_threshold,
        laser_threshold=cfg.laser_threshold,
        k1_tab=jnp.asarray(k1, dtype), k2_tab=jnp.asarray(k2, dtype),
        bb_lam_um=jnp.asarray(bb[:, 0], dtype),
        bb_re=jnp.asarray(bb[:, 1], dtype),
        bb_im=jnp.asarray(bb[:, 2], dtype))


# ---------------------------------------------------------------------------
# wide-range permittivity (tmm_get_epsilon, imd_tmm.c:501-586)
# ---------------------------------------------------------------------------

def ne_critical(omega_las):
    """Critical electron density [1/m^3]."""
    return (units.EMASS_KG * units.EPS0 / units.ECHARGE_C ** 2) * omega_las ** 2


def wide_range_epsilon(tmm: TMMParams, Te_eV, Ti_eV, Z, ne,
                       bb_off: Optional[jnp.ndarray] = None):
    """Complex permittivity per cell; all args elementwise arrays.

    ``bb_off``: boolean mask switching the interband term off (the
    reference does this for EOS phases |3|,|4|,|5| - molten/vapor/plasma,
    imd_tmm.c:545-548); pass None to keep it on everywhere.
    """
    Te_K = Te_eV * wr.EV_TO_K
    Ti_K = Ti_eV * wr.EV_TO_K
    omega = tmm.omega
    ncr = ne_critical(omega)
    Z = jnp.maximum(Z, 1e-10)
    ni = ne / Z
    EF = wr.fermi_E(ne)
    TF = 2.0 * EF / (3.0 * wr.BOLTZMAN)
    VF = jnp.sqrt(2.0 * EF / wr.EMASS)

    nu_met = wr.numet(A1P, A2P, Te_K, Ti_K, TF)
    nu_max = wr.numax(A3P, VF, Te_K, ni)
    nu_pl = wr.nupl(omega, Z, ni, ne, Te_K, True)
    ksi = 0.75 * math.sqrt(math.pi) * nu_pl / omega

    # interband table lookup at the (static) laser wavelength
    lam_um = tmm.lambda_m * 1e6
    j = jnp.clip(jnp.searchsorted(tmm.bb_lam_um, lam_um) - 1, 0,
                 tmm.bb_lam_um.shape[0] - 2)
    frac = (lam_um - tmm.bb_lam_um[j]) / (tmm.bb_lam_um[j + 1]
                                          - tmm.bb_lam_um[j])
    eps_bb = ((tmm.bb_re[j] + frac * (tmm.bb_re[j + 1] - tmm.bb_re[j]))
              + 1j * (tmm.bb_im[j] + frac * (tmm.bb_im[j + 1]
                                             - tmm.bb_im[j])))
    if bb_off is not None:
        eps_bb = jnp.where(bb_off, 0.0, eps_bb)

    eps_met = eps_bb + 1.0 - (ne / ncr) / (
        1.0 + 1j * jnp.minimum(nu_met, nu_max) / omega)
    eps_pl = 1.0 - (ne / ncr) * (k1_of(tmm.k1_tab, ksi)
                                 - 1j * nu_pl / omega
                                 * k2_of(tmm.k2_tab, ksi))
    return eps_pl + (eps_met - eps_pl) * jnp.exp(-A4P * Te_K / TF)


# ---------------------------------------------------------------------------
# pulse
# ---------------------------------------------------------------------------

def intensity(tmm: TMMParams, t_si):
    """I(t), Gaussian double pulse in SI (imd_tmm.c:197-198)."""
    s1 = max(tmm.sigma_t_s, 1e-300) ** 2
    it = tmm.i0 * jnp.exp(-(t_si - tmm.t0_s) ** 2 / s1)
    if tmm.sigma_t1_s > 0.0:
        it = it + tmm.i0 * jnp.exp(-(t_si - tmm.t1_s) ** 2
                                   / tmm.sigma_t1_s ** 2)
    return it


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------

def _layer_mean_e2(kd, bp, bm):
    """Exact <|B+ e^{ikdz} + B- e^{-ikdz}|^2>_{z in [0,1]}.

    Closed form of the reference's Runge5 adaptive integral
    (imd_tmm.c:36-69); kd = k*d is the complex phase across the layer.
    """
    kap = 2.0 * jnp.imag(kd)          # decay exponent
    phi = 2.0 * jnp.real(kd)          # oscillation exponent
    small_k = jnp.abs(kap) < 1e-8
    small_p = jnp.abs(phi) < 1e-8
    kap_s = jnp.where(small_k, 1.0, kap)
    phi_s = jnp.where(small_p, 1.0, phi)
    e1 = jnp.where(small_k, 1.0 - 0.5 * kap, (1.0 - jnp.exp(-kap_s)) / kap_s)
    e2 = jnp.where(small_k, 1.0 + 0.5 * kap, (jnp.exp(kap_s) - 1.0) / kap_s)
    cross = jnp.where(small_p, 1.0 + 0.5j * phi,
                      (jnp.exp(1j * phi_s) - 1.0) / (1j * phi_s))
    return (jnp.abs(bp) ** 2 * e1 + jnp.abs(bm) ** 2 * e2
            + 2.0 * jnp.real(bp * jnp.conj(bm) * cross))


def solve_layers(k0, eps, cell_on, fd_h_x, it, absorption_threshold):
    """Transfer-matrix solve through a prescribed permittivity profile.

    ``eps`` [nx] complex (1 in vacuum cells), ``fd_h_x`` layer thickness in
    Angstrom, ``it`` the instantaneous intensity (W/m^2).  Returns dict
    with qabs [nx] in W/m^3, refl/trans/absorb, ecut, ok.
    """
    nx = eps.shape[0]
    rdt = jnp.real(eps).dtype
    km = k0 * jnp.sqrt(eps)                      # [nx] complex, per Angstrom

    # interface matrices M_i : layer i -> i+1 across thickness d_i
    d = jnp.full((nx - 1,), fd_h_x, rdt).at[0].set(0.0)  # zero-phase entry
    kl = km[:-1]
    kr = km[1:]
    a = jnp.exp(1j * kl * d)
    rho = kl / kr
    m = jnp.stack([
        jnp.stack([0.5 * (1.0 + rho) * a, 0.5 * (1.0 - rho) / a], -1),
        jnp.stack([0.5 * (1.0 - rho) * a, 0.5 * (1.0 + rho) / a], -1),
    ], -2)                                        # [nx-1, 2, 2]

    # all prefix products W_i = M_i ... M_0 in log depth.  HIGHEST
    # precision is load-bearing: the prefix entries grow like
    # e^{+kappa x/2} while the physical amplitudes are their
    # e^{-kappa x/2} CANCELLATION — TPU's default reduced-precision
    # matmul (bf16 mantissa, eps ~ 4e-3) amplifies to eps * e^{kappa L}
    # garbage past a few absorption lengths (a 1000 A Al film absorbed
    # 1e5x the incident energy before this fix; see the f32-matmul
    # pitfall note in ops/geometry.Box.to_frac)
    w = jax.lax.associative_scan(
        lambda x, y: jnp.matmul(y, x, precision=jax.lax.Precision.HIGHEST),
        m, axis=0)

    w11 = w[:, 1, 1]
    safe = jnp.where(jnp.abs(w11) > 0, w11, 1.0)
    br_i = -w[:, 1, 0] / safe                     # per-prefix reflection amp
    bt_i = w[:, 0, 0] + w[:, 0, 1] * br_i         # per-prefix transmission
    bt2 = jnp.abs(bt_i) ** 2

    # the cancellation also floors the computed bt2 at ~eps^2 e^{kappa x}
    # — in f32 the e^-threshold crossing itself becomes undetectable
    # past ~8 amplitude lengths.  The accumulated optical depth
    # 2 Im(k) dx is exact at any thickness, so the cutoff is the OR of
    # both criteria (the reference integrates left-to-right and cuts on
    # its running transmission the same way, imd_tmm.c:365)
    thresh = jnp.exp(-absorption_threshold)
    depth = jnp.cumsum(2.0 * jnp.imag(kl) * d)
    below = (bt2 < thresh) | (depth > absorption_threshold)
    ok = jnp.any(below)
    first = jnp.argmax(below)                     # index of matrix M_first
    ecut = jnp.where(ok, first + 1, nx - 1)

    br = br_i[ecut - 1]
    bt = bt_i[ecut - 1]
    refl = jnp.abs(br) ** 2
    trans = jnp.abs(bt) ** 2
    absorb = 1.0 - refl - trans

    # per-layer amplitudes: F_j = W_{j-1} (1, BR)^T, F_0 = (1, BR)
    f0 = jnp.stack([jnp.asarray(1.0 + 0.0j, eps.dtype), br])
    f = jnp.concatenate([f0[None],
                         jnp.einsum("nij,j->ni", w, f0,
                                    precision=jax.lax.Precision.HIGHEST)],
                        0)
    bp = f[:nx, 0]
    bm = f[:nx, 1]

    # Q_abs per layer (imd_tmm.c:422-440); layer thickness = fd_h_x.
    # qabs = I(t) k0 Im(eps) <|E|^2> is W/m^2 per Angstrom of depth.
    layer = jnp.arange(nx)
    in_range = layer < ecut
    e2_mean = _layer_mean_e2(km * fd_h_x, bp, bm)
    qabs = it * k0 * jnp.imag(eps) * e2_mean
    qabs = jnp.where(in_range & cell_on, qabs, 0.0).astype(rdt)
    qabs = qabs * 1e10                            # -> W/m^3

    return dict(qabs_wm3=qabs, refl=refl.astype(rdt),
                trans=trans.astype(rdt), absorb=absorb.astype(rdt),
                ok=ok, ecut=ecut)


@partial(jax.jit, static_argnames=("fd_min_atoms",))
def tmm_solve(tmm: TMMParams, natoms, dens, Te_eV, Ti_eV, Z, ne,
              fd_h_x: jnp.ndarray, t_si, fd_min_atoms: int = 1,
              rho_min: float = 2.0, bb_off=None):
    """Full TMM step on the global FD column profile.

    Returns dict with source [nx] (IMD power density), laser_active (bool),
    refl / trans / absorb scalars, I_t, eps (complex), ok (False when the
    sample is too short for the absorption threshold - the reference
    aborts, imd_tmm.c:365).
    """
    rdt = Te_eV.dtype
    cdt = jnp.complex128 if rdt == jnp.float64 else jnp.complex64

    it = intensity(tmm, t_si)
    # E-field-strength threshold (imd_tmm.c:201)
    active_pulse = jnp.sqrt(2.0 * it * VACUUM_IMPEDANCE) >= (
        tmm.laser_threshold * math.sqrt(2.0 * VACUUM_IMPEDANCE) *
        jnp.sqrt(jnp.asarray(tmm.i0, rdt)))

    cell_on = (natoms >= fd_min_atoms) & (dens >= rho_min)
    cell_on = cell_on.at[0].set(False)          # entry cell is vacuum
    eps = jnp.where(cell_on,
                    wide_range_epsilon(tmm, jnp.maximum(Te_eV, 1e-6),
                                       jnp.maximum(Ti_eV, 1e-6),
                                       jnp.maximum(Z, 1e-3),
                                       jnp.maximum(ne, 1.0),
                                       bb_off).astype(cdt),
                    jnp.asarray(1.0 + 0.0j, cdt))

    k0 = jnp.asarray(tmm.k0_per_a, rdt)
    res = solve_layers(k0, eps, cell_on, fd_h_x, it,
                       jnp.asarray(tmm.absorption_threshold, rdt))
    source = res["qabs_wm3"] * WM3_TO_IMD        # -> IMD units
    source = jnp.where(active_pulse, source, 0.0)
    return dict(source=source, laser_active=active_pulse, I_t=it, eps=eps,
                **{k: res[k] for k in ("refl", "trans", "absorb", "ok",
                                       "ecut")})


def do_tmm(grid, params, tmm: TMMParams, t_si, bb_off=None):
    """TTM-facing wrapper: compute the source on a TTMGrid (do_tmm call
    site imd_ttm.c:111-121).  Returns (grid with .source set, diag)."""
    res = tmm_solve(tmm, grid.natoms, grid.dens, grid.temp, grid.md_temp,
                    grid.Z, grid.ne, jnp.asarray(params.fd_h_x,
                                                 grid.temp.dtype),
                    t_si, fd_min_atoms=params.fd_min_atoms,
                    rho_min=params.rho_min, bb_off=bb_off)
    return grid.replace(source=res["source"]), res
