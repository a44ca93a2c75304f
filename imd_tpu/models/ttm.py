"""Two-temperature model: the electron FD grid coupled to the MD atoms.

Re-design of the reference's maintained 1-D TTM (imd_ttm.c; schedule in
calc_ttm:75-156):

  update_fd  -> per-column natoms / v_com / T_i / neighbor-density / fluxes
  do_ADV     -> donor-cell advection of electron energy with atom fluxes
  activation -> (de)activate cells at fd_min_atoms / RHOMIN thresholds
  FILLMESH   -> wide-range Z, n_e, C_e, kappa, g
  CFL        -> dt_max = 0.9 min(C_e dx^2 / (k_i + k_i+1)); substeps
  substep x N: laser source + explicit variable-kappa diffusion
  xi         -> e-ph coupling accumulated for the integrator

TPU re-design decisions:
- per-column reductions are `segment_sum` over the flat atom arrays
  (replacing 4x MPI_Allreduce of global arrays, imd_ttm.c:325-334);
- the per-atom FD index is recomputed from x each step and the previous
  index is carried in a Scene-shaped int array (the reference stores
  fdi/fdj/fdk per atom, types.h:327-330) for advection fluxes;
- the CFL-adaptive substep count is a traced `lax.fori_loop` bound,
  clamped to a static maximum (params.max_substeps);
- cells are active where natoms >= fd_min_atoms AND dens > rho_min
  (RHOMIN = 2 kg/m^3, imd_ttm.c:69); inactive neighbors get zero-flux
  (mirror) boundaries in the diffusion stencil.

Units (same as reference): T in eV, kappa/g/Ce in IMD-internal units (see
models/widerange.py), dens in kg/m^3, U in eV/atom, source in
eV/(A^3 * time-unit).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imd_tpu import units
from imd_tpu.models import widerange as wr
from imd_tpu.models.eos import FEGEos
from imd_tpu.scene import Scene

RHOMIN = 2.0         # kg/m^3 (imd_ttm.c:69)
TE_MIN_EV = 0.0026   # ~30 K: "Temin" sanity floor for fresh cells


class TTMParams(struct.PyTreeNode):
    """Static TTM configuration (hashable; jit-specialized)."""
    nx: int = struct.field(pytree_node=False)
    fd_h_x: float = struct.field(pytree_node=False)      # cell width (A)
    fd_vol: float = struct.field(pytree_node=False)      # cell volume (A^3)
    neigh_vol: float = struct.field(pytree_node=False)   # 4/3 pi rcut^3 (A^3)
    atomic_mass: float = struct.field(pytree_node=False)
    atomic_z: float = struct.field(pytree_node=False)
    fd_min_atoms: int = struct.field(pytree_node=False)
    rho_min: float = struct.field(pytree_node=False, default=RHOMIN)
    # backstop only: the fori_loop bound is traced, so any CFL-demanded
    # count below this runs exactly; clamping below the CFL count would be
    # numerically unstable (this bit us: never set it low)
    max_substeps: int = struct.field(pytree_node=False, default=65536)
    fd_n_timesteps: int = struct.field(pytree_node=False, default=1)
    cfl_safety: float = struct.field(pytree_node=False, default=0.9)
    # constant-coefficient overrides (0 = use wide-range models)
    const_kappa: float = struct.field(pytree_node=False, default=0.0)
    const_gamma: float = struct.field(pytree_node=False, default=0.0)
    const_ce: float = struct.field(pytree_node=False, default=0.0)
    fix_t_el: bool = struct.field(pytree_node=False, default=False)
    omega_laser: float = struct.field(pytree_node=False, default=0.0)
    # diffusion integrator: "explicit" (reference do_DIFF CFL substeps)
    # or "implicit" (backward-Euler tridiagonal, n_sub substeps/step)
    solver: str = struct.field(pytree_node=False, default="explicit")
    n_sub: int = struct.field(pytree_node=False, default=10)


class TTMGrid(struct.PyTreeNode):
    """The 1-D electron grid state (ttm_Element fields as [nx] arrays)."""
    temp: jnp.ndarray        # [nx] T_e (eV)
    md_temp: jnp.ndarray     # [nx] T_i (eV)
    U: jnp.ndarray           # [nx] electron internal energy (eV/atom)
    natoms: jnp.ndarray      # [nx] int32
    natoms_old: jnp.ndarray  # [nx] int32
    dens: jnp.ndarray        # [nx] ambient density (kg/m^3)
    vcom: jnp.ndarray        # [nx,3] center-of-mass velocity
    xi: jnp.ndarray          # [nx] e-ph coupling accumulator (1/time-unit)
    source: jnp.ndarray      # [nx] laser power density
    Z: jnp.ndarray           # [nx] mean ionization
    ne: jnp.ndarray          # [nx] electron density (1/m^3)
    Ce: jnp.ndarray          # [nx] heat capacity
    fd_k: jnp.ndarray        # [nx] conductivity
    fd_g: jnp.ndarray        # [nx] e-ph coupling
    flux_right: jnp.ndarray  # [nx] int32: atoms received from +x
    flux_left: jnp.ndarray   # [nx] int32: atoms received from -x
    eabs: jnp.ndarray        # scalar: absorbed laser energy (eV)
    init_done: jnp.ndarray   # scalar bool: T_e initialized
    # scalar bool: the CFL-demanded diffusion substep count exceeded
    # max_substeps, so the explicit scheme ran beyond its stability limit.
    # This is the returned-status analog of the reference's NaN-guard
    # aborts (imd_ttm.c:1588-1596); check it like scene.overflow.
    cfl_overflow: jnp.ndarray

    @property
    def active(self) -> jnp.ndarray:
        # params must be consulted for thresholds; see `active_mask`
        raise AttributeError("use active_mask(grid, params)")


def active_mask(grid: TTMGrid, params: TTMParams) -> jnp.ndarray:
    return (grid.natoms >= params.fd_min_atoms) & (grid.dens > params.rho_min)


def make_params(cfg_ttm, box, cutoff: float, dtype=jnp.float32) -> TTMParams:
    """Build TTMParams from a config (init_ttm, imd_ttm.c:955-1200)."""
    bx = float(np.asarray(box.h)[0, 0])
    heights = box.heights()
    # python floats, NOT np.float64: a stray np scalar in an expression
    # like `inv_dx2 * f32_array` silently promotes the whole TTM state to
    # f64 when jax_enable_x64 is on (and breaks fori_loop carry types)
    fd_h_x = float(bx / cfg_ttm.fd_nx)
    fd_vol = float(fd_h_x * heights[1] * heights[2])
    neigh_vol = 4.0 / 3.0 * math.pi * cutoff ** 3
    return TTMParams(
        nx=cfg_ttm.fd_nx, fd_h_x=fd_h_x, fd_vol=fd_vol, neigh_vol=neigh_vol,
        atomic_mass=cfg_ttm.atomic_mass, atomic_z=cfg_ttm.atomic_z,
        fd_min_atoms=cfg_ttm.fd_min_atoms,
        max_substeps=cfg_ttm.max_substeps,
        cfl_safety=cfg_ttm.cfl_safety,
        const_kappa=cfg_ttm.fd_k, const_gamma=cfg_ttm.fd_g,
        const_ce=cfg_ttm.fd_c, fix_t_el=cfg_ttm.fix_t_el,
        solver=getattr(cfg_ttm, "solver", "explicit"),
        n_sub=getattr(cfg_ttm, "n_sub", 10),
    )


def make_grid(params: TTMParams, dtype=jnp.float32) -> TTMGrid:
    nx = params.nx
    z = jnp.zeros((nx,), dtype)
    zi = jnp.zeros((nx,), jnp.int32)
    return TTMGrid(temp=z, md_temp=z, U=z, natoms=zi, natoms_old=zi, dens=z,
                   vcom=jnp.zeros((nx, 3), dtype), xi=z, source=z, Z=z,
                   ne=z, Ce=z, fd_k=z, fd_g=z, flux_right=zi, flux_left=zi,
                   eabs=jnp.zeros((), dtype),
                   init_done=jnp.zeros((), bool),
                   cfl_overflow=jnp.zeros((), bool))


# ---------------------------------------------------------------------------
# update_fd: atoms -> grid reductions (imd_ttm.c:161-548)
# ---------------------------------------------------------------------------

def fd_index(scene: Scene, params: TTMParams) -> jnp.ndarray:
    """Per-atom-slot FD column index [gx,gy,gz,cap] (clamped)."""
    return fd_index_from_x(scene.pos[..., 0], params)


def fd_index_from_x(x, params: TTMParams) -> jnp.ndarray:
    """FD column index from x coordinates (any layout)."""
    i = jnp.floor(x / params.fd_h_x).astype(jnp.int32)
    return jnp.clip(i, 0, params.nx - 1)


def update_fd(grid: TTMGrid, scene: Scene, params: TTMParams,
              num_neighs: jnp.ndarray, fdi_prev: jnp.ndarray,
              first_step: jnp.ndarray) -> Tuple[TTMGrid, jnp.ndarray]:
    """Per-column reductions + advection fluxes (Scene entry point).

    ``num_neighs`` is the per-atom neighbor count within the pair cutoff
    (forces pass, NUMNEIGHS); ``fdi_prev`` the previous per-slot FD index
    (-1 for atoms without history).  Returns (grid, fdi_new).
    """
    mask = scene.mask & (scene.type == 0)    # reference counts sorte==0 only
    mom3 = tuple(scene.mom[..., k].reshape(-1) for k in range(3))
    grid, fdi = update_fd_flat(
        grid, params, scene.pos[..., 0].reshape(-1), mom3,
        scene.mass.reshape(-1), mask.reshape(-1),
        num_neighs.reshape(-1), fdi_prev.reshape(-1), first_step)
    return grid, fdi.reshape(scene.type.shape)


def update_fd_flat(grid: TTMGrid, params: TTMParams, x, mom3, mass, mask,
                   num_neighs, fdi_prev, first_step):
    """Core of update_fd on flat component arrays (layout-agnostic: the
    fused cells-last hot loop feeds [cap*NC]-ordered components and the
    Scene wrapper [NC*cap]-ordered ones; only internal consistency
    matters)."""
    dtype = x.dtype
    nx = params.nx
    fm = mask.astype(dtype)
    fdi = fd_index_from_x(x, params)
    seg = jnp.where(mask, fdi, nx)           # dead atoms -> overflow bucket

    # one-hot matmul reductions: scatter-add segment sums over ~10^6
    # atom slots onto ~10^1 columns measured 62 ms/step on v5e; the same
    # contraction as a [M, nx] one-hot matmul rides the MXU in ~1 ms.
    # Per-operand precision: the one-hot operand is EXACT in bf16 (0/1
    # entries), so DEFAULT there costs nothing while HIGHEST keeps the
    # value operand (counts/momenta) from rounding through bf16 — the
    # same numbers as full HIGHEST at half the MXU pass count.
    onehot = (seg[:, None]
              == jnp.arange(nx + 1, dtype=jnp.int32)[None]).astype(dtype)

    # advection fluxes: atoms whose column changed since last step
    moved = mask & (fdi_prev >= 0) & (fdi_prev != fdi) & ~first_step
    from_right = (moved & (fdi_prev > fdi)).astype(dtype)
    from_left = (moved & (fdi_prev < fdi)).astype(dtype)

    mx, my, mz = (m * fm for m in mom3)
    fields = jnp.stack([fm, num_neighs.astype(dtype) * fm, mx, my, mz,
                        from_right, from_left], axis=1)
    sums = jnp.einsum("mk,mf->kf", onehot, fields,
                      precision=(jax.lax.Precision.DEFAULT,
                                 jax.lax.Precision.HIGHEST))[:nx]
    natoms = sums[:, 0].astype(jnp.int32)
    totneighs = sums[:, 1]
    mom_sum = sums[:, 2:5]
    flux_right = sums[:, 5].astype(jnp.int32)
    flux_left = sums[:, 6].astype(jnp.int32)
    totmass = natoms.astype(dtype) * params.atomic_mass
    vcom = jnp.where(totmass[:, None] > 0, mom_sum / totmass[:, None], 0.0)

    # md_temp: sum m (v - vcom)^2 / (3 N); vcom broadcast back to atoms
    # through the same one-hot (an MXU matmul, not a gather)
    vcom_atom = jnp.matmul(onehot[:, :nx], vcom,
                           precision=(jax.lax.Precision.DEFAULT,
                                      jax.lax.Precision.HIGHEST))
    inv_mass = 1.0 / jnp.maximum(mass, 1e-30)
    dv2 = sum((mom3[k] * inv_mass - vcom_atom[:, k]) ** 2 for k in range(3))
    mdt = jnp.einsum("mk,m->k", onehot, dv2 * fm * fm * mass,
                     precision=(jax.lax.Precision.DEFAULT,
                                jax.lax.Precision.HIGHEST))[:nx]
    md_temp = jnp.where(natoms > 0, mdt / (3.0 * jnp.maximum(natoms, 1)), 0.0)

    # ambient density from neighbor counts (imd_ttm.c:418)
    dens = jnp.where(
        natoms > 0,
        totneighs / jnp.maximum(natoms.astype(dtype), 1.0)
        * params.atomic_mass / params.neigh_vol * 1660.53907, 0.0)
    # fallback: nominal cell density when no neighbors counted
    dens = jnp.where((natoms > 0) & (dens == 0.0),
                     natoms.astype(dtype) * params.atomic_mass
                     / params.fd_vol * 1660.53907, dens)

    # first touch: initialize T_e = T_i on active cells (imd_ttm.c:500)
    act = (natoms >= params.fd_min_atoms) & (dens > params.rho_min)
    temp = jnp.where(grid.init_done, grid.temp, jnp.where(act, md_temp, 0.0))

    grid = grid.replace(
        temp=temp, md_temp=md_temp, natoms=natoms,
        natoms_old=jnp.where(first_step, natoms, grid.natoms),
        dens=dens, vcom=vcom, xi=jnp.zeros_like(grid.xi),
        source=jnp.zeros_like(grid.source),
        flux_right=flux_right, flux_left=flux_left,
        init_done=jnp.ones((), bool),
    )
    return grid, jnp.where(mask, fdi, -1)


# ---------------------------------------------------------------------------
# advection (do_ADV, imd_ttm.c:1208) and activation (1311)
# ---------------------------------------------------------------------------

def do_adv(grid: TTMGrid, params: TTMParams, eos: FEGEos,
           first_step: jnp.ndarray, tau=1.0) -> TTMGrid:
    """Donor-cell advection of per-atom electron energy U."""
    n_old = grid.natoms_old.astype(grid.U.dtype)
    n_new = grid.natoms.astype(grid.U.dtype)
    U = grid.U
    U_p = jnp.roll(U, -1)          # U_{i+1}
    U_m = jnp.roll(U, 1)           # U_{i-1}
    fr = grid.flux_right.astype(U.dtype)
    fl = grid.flux_left.astype(U.dtype)
    fr_m = jnp.roll(fr, 1)         # flux_from_right[i-1]
    fl_p = jnp.roll(fl, -1)        # flux_from_left[i+1]
    U2 = jnp.where(
        n_new > 0,
        U * n_old / jnp.maximum(n_new, 1.0)
        + tau * (fr * U_p - fl_p * U + fl * U_m - fr_m * U)
        / jnp.maximum(n_new, 1.0),
        0.0)
    act = active_mask(grid, params)
    temp2 = jnp.where(act, eos.te_from_u(grid.dens, _ne(grid, params), U2),
                      grid.temp)
    temp2 = jnp.where(n_new > 0, temp2, 0.0)
    out = grid.replace(U=U2, temp=jnp.where(first_step, grid.temp, temp2))
    return out


def _ne(grid: TTMGrid, params: TTMParams) -> jnp.ndarray:
    """Quasi-neutral electron density from current Z (imd_ttm.c:678)."""
    Z = wr.mean_charge(jnp.maximum(grid.temp, 1e-6), jnp.maximum(grid.dens, 1e-3),
                       params.atomic_z, params.atomic_mass)
    return jnp.maximum(Z, 1e-3) * jnp.maximum(grid.dens, 1e-3) / (
        params.atomic_mass * wr.AMU)


def cell_activation(grid: TTMGrid, params: TTMParams, eos: FEGEos) -> TTMGrid:
    """Fresh cells with unusable T_e get neighbor-average or T_i
    (do_cell_activation, imd_ttm.c:1311-1425)."""
    act_now = active_mask(grid, params)
    was = grid.natoms_old >= params.fd_min_atoms
    fresh = ~was & (grid.natoms >= params.fd_min_atoms) & (grid.dens > params.rho_min)
    bad = fresh & (jnp.isnan(grid.temp) | (grid.temp <= TE_MIN_EV))
    # neighbor-average of T^2 over active neighbors
    t2 = jnp.where(act_now, grid.temp ** 2, 0.0)
    cnt = act_now.astype(grid.temp.dtype)
    t2_sum = jnp.roll(t2, 1) + jnp.roll(t2, -1)
    n_sum = jnp.roll(cnt, 1) + jnp.roll(cnt, -1)
    t_avg = jnp.sqrt(t2_sum / jnp.maximum(n_sum, 1.0))
    t_new = jnp.where(n_sum > 0, t_avg, grid.md_temp)
    t_new = jnp.where(t_new < TE_MIN_EV, grid.md_temp, t_new)
    temp = jnp.where(bad, t_new, grid.temp)
    ne = _ne(grid.replace(temp=temp), params)
    U = jnp.where(bad, eos.u_from_te(grid.dens, ne, temp), grid.U)
    return grid.replace(temp=temp, U=U)


# ---------------------------------------------------------------------------
# FILLMESH: wide-range properties (imd_ttm.c:629)
# ---------------------------------------------------------------------------

def fill_mesh(grid: TTMGrid, params: TTMParams, eos: FEGEos,
              laser_active=False, keep_zne: bool = False) -> TTMGrid:
    """Wide-range transport properties per cell (do_FILLMESH, ttm:629).

    ``keep_zne``: COLRAD owns Z and n_e (its kinetics supersede the
    More-fit mean charge); only Ce/kappa/g are refreshed."""
    act = active_mask(grid, params)
    temp = jnp.maximum(grid.temp, 1e-6)
    dens = jnp.maximum(grid.dens, 1e-3)
    if keep_zne:
        Z = jnp.maximum(grid.Z, 1e-3)
        ne = jnp.maximum(grid.ne, 1.0)
    else:
        Z = wr.mean_charge(temp, dens, params.atomic_z, params.atomic_mass)
        Z = jnp.maximum(Z, 1e-3)
        ne = Z * dens / (params.atomic_mass * wr.AMU)
    if params.const_ce > 0:
        Ce = params.const_ce * temp        # Sommerfeld gamma*Te fallback
    else:
        Ce = eos.ce(dens, ne, temp)
    if params.const_kappa > 0:
        fd_k = jnp.full_like(temp, params.const_kappa)
    else:
        fd_k = wr.get_kappa(temp, jnp.maximum(grid.md_temp, 1e-6), ne, Z,
                            params.omega_laser, laser_active)
    if params.const_gamma > 0:
        fd_g = jnp.full_like(temp, params.const_gamma)
    else:
        fd_g = wr.get_gamma(temp, jnp.maximum(grid.md_temp, 1e-6), ne, Z,
                            params.atomic_mass, params.omega_laser,
                            laser_active)
    zero = jnp.zeros_like(temp)
    return grid.replace(Z=jnp.where(act, Z, zero),
                        ne=jnp.where(act, ne, zero),
                        Ce=jnp.where(act, Ce, zero),
                        fd_k=jnp.where(act, fd_k, zero),
                        fd_g=jnp.where(act, fd_g, zero))


# ---------------------------------------------------------------------------
# CFL + diffusion substeps (CFL_maxdt imd_ttm.c:2444, do_DIFF 1473)
# ---------------------------------------------------------------------------

def cfl_substeps(grid: TTMGrid, params: TTMParams, dt,
                 first_step) -> jnp.ndarray:
    act = active_mask(grid, params)
    act_p = jnp.roll(act, -1)
    k_p = jnp.where(act_p, jnp.roll(grid.fd_k, -1), grid.fd_k)
    khalf = grid.fd_k + k_p
    dx2 = params.fd_h_x ** 2
    lim = jnp.where(act & (khalf > 0), grid.Ce * dx2 / jnp.maximum(khalf, 1e-30),
                    jnp.inf)
    # (the CFL limit applies on the first step too: fill_mesh has already
    # populated Ce/kappa by the time this runs; overriding it once blew up
    # the wide-range path at ~1000x the stability limit)
    max_dt = params.cfl_safety * jnp.min(lim)
    # ceil in float64-ish range: cap the ratio before the int cast so a
    # huge demand doesn't wrap to INT_MIN
    ratio = jnp.minimum(dt / jnp.maximum(max_dt, 1e-12),
                        2.0 * params.max_substeps)
    sub = jnp.maximum(params.fd_n_timesteps,
                      jnp.ceil(ratio).astype(jnp.int32))
    return jnp.minimum(sub, params.max_substeps), sub > params.max_substeps


def diff_step(grid: TTMGrid, params: TTMParams, tau, substeps,
              laser_active) -> TTMGrid:
    """One explicit conservative variable-kappa diffusion substep."""
    act = active_mask(grid, params)
    T = grid.temp
    k = grid.fd_k
    # mirror (zero-flux) boundaries where the neighbor is inactive
    act_p = jnp.roll(act, -1)
    act_m = jnp.roll(act, 1)
    T_p = jnp.where(act_p, jnp.roll(T, -1), T)
    T_m = jnp.where(act_m, jnp.roll(T, 1), T)
    k_p = jnp.where(act_p, jnp.roll(k, -1), k)
    k_m = jnp.where(act_m, jnp.roll(k, 1), k)
    inv_dx2 = 1.0 / params.fd_h_x ** 2
    Ce = jnp.maximum(grid.Ce, 1e-30)
    lap = ((k + k_p) * 0.5 * (T_p - T) - (k + k_m) * 0.5 * (T - T_m)) * inv_dx2
    dT = tau / Ce * (lap - grid.fd_g * (T - grid.md_temp) + grid.source)
    T2 = jnp.where(act, T + dT, T) if not params.fix_t_el else T
    # energy bookkeeping (eV/atom)
    U2 = grid.U + jnp.where(act, (T2 - T) * Ce * params.fd_vol
                            / jnp.maximum(grid.natoms, 1), 0.0)
    # xi accumulation (imd_ttm.c:1582-1585, "NEU" density-based form)
    xi_fac = params.atomic_mass * wr.AMU / 3.0 * 1e30 / jnp.maximum(substeps, 1)
    dxi = jnp.where(act & (grid.md_temp > 1e-12) & (grid.dens > 0),
                    (T2 - grid.md_temp) * xi_fac * grid.fd_g
                    / jnp.maximum(grid.md_temp, 1e-12)
                    / jnp.maximum(grid.dens, 1e-12), 0.0)
    eabs = grid.eabs + jnp.where(
        laser_active, jnp.sum(jnp.where(act, grid.source, 0.0))
        * params.fd_vol * tau, 0.0)
    return grid.replace(temp=T2, U=U2, xi=grid.xi + dxi, eabs=eabs)


def _thomas(a, b, c, d):
    """Tridiagonal solve (Thomas algorithm) via two lax.scans.

    a/c are the sub-/super-diagonal coefficients (a[0] and c[-1]
    ignored-by-construction: callers zero them).  Diagonally dominant
    systems only (b >= |a| + |c| — true for backward-Euler diffusion)."""
    def fwd(carry, abcd):
        cp_prev, dp_prev = carry
        ai, bi, ci, di = abcd
        denom = bi - ai * cp_prev
        cp = ci / denom
        dp = (di - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    z = jnp.zeros((), d.dtype)
    _, (cps, dps) = jax.lax.scan(fwd, (z, z), (a, b, c, d))

    def bwd(x_next, cpdp):
        cp, dp = cpdp
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, z, (cps, dps), reverse=True)
    return xs


def diff_step_implicit(grid: TTMGrid, params: TTMParams, tau, substeps,
                       laser_active) -> TTMGrid:
    """One UNCONDITIONALLY STABLE backward-Euler diffusion substep.

    The TPU-native alternative to the reference's explicit CFL
    substepping (do_DIFF, imd_ttm.c:1473): at multi-eV electron
    temperatures the metallic kappa/Ce diffusivity demands
    O(1e3-1e5) explicit substeps per MD step (CFL_maxdt,
    imd_ttm.c:2444 — the reference pays exactly this in its ablation
    runs), while one tridiagonal solve integrates the same
    conservative variable-kappa stencil implicitly:

        (Ce/tau + cm + cp + g) T' - cm T'_m - cp T'_p
            = Ce/tau T + g T_i + S

    with the face conductivities cm/cp = (k + k_nbr)/2 dx^-2 zeroed at
    inactive neighbors (the explicit scheme's mirror boundary) and at
    the array ends (the FD grid is non-periodic, like the reference's).
    Coefficients lag at the substep start; n_sub substeps per MD step
    resolve the nonlinearity.  Energy/xi/eabs bookkeeping matches
    diff_step exactly.
    """
    act = active_mask(grid, params)
    T = grid.temp
    k = grid.fd_k
    act_p = jnp.roll(act, -1)
    act_m = jnp.roll(act, 1)
    k_p = jnp.roll(k, -1)
    k_m = jnp.roll(k, 1)
    inv_dx2 = 1.0 / params.fd_h_x ** 2
    nx = T.shape[0]
    idx = jnp.arange(nx)
    cp = jnp.where(act & act_p & (idx < nx - 1),
                   (k + k_p) * 0.5 * inv_dx2, 0.0)
    cm = jnp.where(act & act_m & (idx > 0),
                   (k + k_m) * 0.5 * inv_dx2, 0.0)
    Ce = jnp.maximum(grid.Ce, 1e-30)
    g = grid.fd_g
    a = jnp.where(act, -cm, 0.0)
    c = jnp.where(act, -cp, 0.0)
    b = jnp.where(act, Ce / tau + cm + cp + g, 1.0)
    rhs = jnp.where(act, Ce / tau * T + g * grid.md_temp + grid.source, T)
    T2 = T if params.fix_t_el else _thomas(a, b, c, rhs)
    T2 = jnp.where(act, T2, T)
    U2 = grid.U + jnp.where(act, (T2 - T) * Ce * params.fd_vol
                            / jnp.maximum(grid.natoms, 1), 0.0)
    xi_fac = params.atomic_mass * wr.AMU / 3.0 * 1e30 / jnp.maximum(substeps, 1)
    dxi = jnp.where(act & (grid.md_temp > 1e-12) & (grid.dens > 0),
                    (T2 - grid.md_temp) * xi_fac * grid.fd_g
                    / jnp.maximum(grid.md_temp, 1e-12)
                    / jnp.maximum(grid.dens, 1e-12), 0.0)
    eabs = grid.eabs + jnp.where(
        laser_active, jnp.sum(jnp.where(act, grid.source, 0.0))
        * params.fd_vol * tau, 0.0)
    return grid.replace(temp=T2, U=U2, xi=grid.xi + dxi, eabs=eabs)


# ---------------------------------------------------------------------------
# laser source (laser_rescale_ttm, imd_laser.c:715; mode 4)
# ---------------------------------------------------------------------------

class VlatParams(struct.PyTreeNode):
    """Virtual-lattice continuum tail (VLATTICE, imd_ttm.c:41-59): vlatdim
    continuum-only 2T cells appended behind the sample's rear (+x) so the
    heat sink of the full target depth exists without simulating it
    atomistically."""
    nv: int = struct.field(pytree_node=False)        # vlatdim
    dens0: float = struct.field(pytree_node=False)   # solid density kg/m^3
    ci: float = struct.field(pytree_node=False)      # lattice C_i, eV/(eV A^3)
    atomic_z: float = struct.field(pytree_node=False, default=13.0)
    atomic_mass: float = struct.field(pytree_node=False, default=26.9815)


class VlatState(struct.PyTreeNode):
    te: jnp.ndarray    # [nv] electron temperature (eV)
    ti: jnp.ndarray    # [nv] lattice temperature (eV)


def make_vlat(nv: int, dens0: float = 2700.0, t0: float = 0.0253,
              ci: Optional[float] = None, dtype=jnp.float32,
              atomic_z: float = 13.0, atomic_mass: float = 26.9815):
    """ci defaults to Dulong-Petit 3 n k_B for the given density."""
    n_a3 = dens0 / (atomic_mass * wr.AMU) * 1e-30    # atoms per A^3
    ci = ci if ci is not None else 3.0 * n_a3
    p = VlatParams(nv=nv, dens0=dens0, ci=ci, atomic_z=atomic_z,
                   atomic_mass=atomic_mass)
    s = VlatState(te=jnp.full((nv,), t0, dtype),
                  ti=jnp.full((nv,), t0, dtype))
    return p, s


def _vlat_props(vs: VlatState, vp: VlatParams, eos: FEGEos):
    dens = jnp.full_like(vs.te, vp.dens0)
    Z = jnp.maximum(wr.mean_charge(jnp.maximum(vs.te, 1e-6), dens,
                                   vp.atomic_z, vp.atomic_mass), 1e-3)
    ne = Z * dens / (vp.atomic_mass * wr.AMU)
    kv = wr.get_kappa(jnp.maximum(vs.te, 1e-6), jnp.maximum(vs.ti, 1e-6),
                      ne, Z)
    gv = wr.get_gamma(jnp.maximum(vs.te, 1e-6), jnp.maximum(vs.ti, 1e-6),
                      ne, Z, vp.atomic_mass)
    cev = jnp.maximum(eos.ce(dens, ne, jnp.maximum(vs.te, 1e-6)), 1e-12)
    return kv, gv, cev


def vlat_cfl(vs: VlatState, vp: VlatParams, params: TTMParams,
             eos: FEGEos, dt, safety=0.9):
    """Diffusion-substep demand of the virtual lattice (its cold-electron
    C_e can be far below the hot MD cells', so it often sets the CFL)."""
    kv, gv, cev = _vlat_props(vs, vp, eos)
    lim = jnp.min(cev * params.fd_h_x ** 2 / jnp.maximum(2.0 * kv, 1e-30))
    return jnp.ceil(dt / jnp.maximum(safety * lim, 1e-12)).astype(jnp.int32)


def _thomas(a, b, c, d):
    """Tridiagonal solve (a sub, b diag, c super, d rhs) via lax.scan."""
    def fwd(carry, abcd):
        cp_prev, dp_prev = carry
        ai, bi, ci, di = abcd
        den = bi - ai * cp_prev
        cp = ci / den
        dp = (di - ai * dp_prev) / den
        return (cp, dp), (cp, dp)

    (_, _), (cps, dps) = jax.lax.scan(
        fwd, (jnp.zeros_like(b[0]), jnp.zeros_like(b[0])), (a, b, c, d))

    def bwd(x_next, cd):
        cp, dp = cd
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros_like(b[0]), (cps, dps),
                         reverse=True)
    return xs


def vlat_substep(grid: TTMGrid, vs: VlatState, params: TTMParams,
                 vp: VlatParams, eos: FEGEos, tau):
    """One substep of the virtual lattice + boundary exchange with the
    last active MD cell (imd_ttm.c:1602-1657: the vlat chain continues
    the Te diffusion and runs its own local 2T ODE).

    The chain's Te diffusion is backward-Euler implicit (Thomas solve) -
    the vlat heats from ambient to eV-scale within one MD step when a
    hot sample is attached, so kappa(T) grows orders of magnitude
    mid-loop and any explicit step picked from entry values blows up.
    The e-ph exchange and the MD-edge flux stay explicit.
    """
    kv, gv, cev = _vlat_props(vs, vp, eos)
    inv_dx2 = 1.0 / params.fd_h_x ** 2

    # the rear-most active MD cell joins the implicit chain: the edge-
    # vlat interface flux is then booked consistently on both sides (a
    # one-sided explicit exchange against the vlat's tiny cold C_e was
    # violently unstable and pumped energy)
    act = active_mask(grid, params)
    idx = jnp.arange(params.nx)
    last = jnp.max(jnp.where(act, idx, -1))
    has_edge = last >= 0
    li = jnp.maximum(last, 0)
    te_edge = grid.temp[li]
    k_edge = jnp.where(has_edge, grid.fd_k[li], 0.0)
    ce_edge = jnp.maximum(grid.Ce[li], 1e-12)

    te_c = jnp.concatenate([te_edge[None], vs.te])        # [nv+1]
    k_c = jnp.concatenate([k_edge[None], kv])
    ce_c = jnp.concatenate([ce_edge[None], cev])
    g_c = jnp.concatenate([jnp.zeros_like(gv[:1]), gv])   # edge e-ph in
    ti_c = jnp.concatenate([vs.ti[:1], vs.ti])            # diff_step
    k_m = jnp.concatenate([jnp.zeros_like(k_c[:1]), k_c[:-1]])
    k_p = jnp.concatenate([k_c[1:], jnp.zeros_like(k_c[:1])])
    w_m = (k_c + k_m) * 0.5 * inv_dx2 / ce_c
    w_p = (k_c + k_p) * 0.5 * inv_dx2 / ce_c
    w_m = w_m.at[0].set(0.0)          # edge's grid side: diff_step's job
    w_p = w_p.at[-1].set(0.0)         # zero-flux far end
    a = -tau * w_m
    c = -tau * w_p
    b = 1.0 + tau * (w_m + w_p)
    rhs = te_c - tau / ce_c * g_c * (te_c - ti_c)
    te_new = _thomas(a, b, c, rhs)
    dti = tau / vp.ci * gv * (vs.te - vs.ti)
    new_temp = jnp.where(has_edge,
                         grid.temp.at[li].set(te_new[0]), grid.temp)
    return (grid.replace(temp=new_temp),
            VlatState(te=jnp.where(has_edge, te_new[1:], vs.te),
                      ti=vs.ti + dti))


def lambert_beer_source(grid: TTMGrid, params: TTMParams, laser_cfg, t):
    """Exponential Lambert-Beer volumetric source on the FD grid.

    p_peak = mu sigma_e / (sigma_t sqrt(2 pi)) (imd_laser.c:290);
    source_i = p_peak exp(-(t-t0)^2/(2 sigma_t^2)) exp(-mu depth_i).
    The surface offset is the first active cell (get_surface analog).
    Returns (grid, laser_active).
    """
    dtype = grid.temp.dtype
    mu = laser_cfg.mu
    sig_t = max(laser_cfg.sigma_t, 1e-30)
    p_peak = mu * laser_cfg.sigma_e / sig_t / math.sqrt(2.0 * math.pi)
    g_t = jnp.exp(-((t - laser_cfg.t_0) ** 2) / (2.0 * sig_t ** 2)) * p_peak
    if laser_cfg.sigma_e1 > 0:
        sig_t1 = max(laser_cfg.sigma_t1, 1e-30)
        p1 = mu * laser_cfg.sigma_e1 / sig_t1 / math.sqrt(2.0 * math.pi)
        g_t = g_t + jnp.exp(-((t - laser_cfg.t_1) ** 2)
                            / (2.0 * sig_t1 ** 2)) * p1
    active = g_t >= p_peak * 0.001
    act = active_mask(grid, params)
    idx = jnp.arange(params.nx)
    first_active = jnp.min(jnp.where(act, idx, params.nx))
    x_cell = (idx.astype(dtype) + 0.5) * params.fd_h_x
    depth = jnp.maximum(
        x_cell - first_active.astype(dtype) * params.fd_h_x
        - laser_cfg.offset, 0.0)
    src = jnp.where(act, g_t * jnp.exp(-mu * depth), 0.0)
    return grid.replace(source=src.astype(dtype)), active


# ---------------------------------------------------------------------------
# the full per-MD-step TTM update (calc_ttm, imd_ttm.c:75)
# ---------------------------------------------------------------------------

def calc_ttm(grid: TTMGrid, scene: Scene, params: TTMParams, eos: FEGEos,
             num_neighs, fdi_prev, dt, t, laser_cfg=None,
             first_step=False, tmm_params=None, colrad=None, vlat=None):
    """One MD step's worth of TTM: reductions, advection, substepped
    diffusion.  Returns (grid, fdi_new).

    When ``tmm_params`` (models.tmm.TMMParams) is given, the Helmholtz
    transfer-matrix solver recomputes the volumetric source each diffusion
    substep, like the reference's do_tmm call inside the substep loop
    (imd_ttm.c:111-121); ``t`` advances in IMD time units and is converted
    to SI seconds for the pulse envelope (tmm_time, imd_ttm.c:117).
    """
    first = jnp.asarray(first_step)
    if isinstance(scene, Scene):
        grid, fdi = update_fd(grid, scene, params, num_neighs, fdi_prev,
                              first)
    else:
        # flat-component atoms (x, mom3, mass, mask) from the fused
        # cells-last hot loop (ops/fused_step.py)
        x, mom3, mass, mask = scene
        grid, fdi = update_fd_flat(grid, params, x, mom3, mass, mask,
                                   num_neighs, fdi_prev, first)
    grid = do_adv(grid, params, eos, first)
    grid = cell_activation(grid, params, eos)
    # COLRAD kinetics own Z/ne/Te when enabled (do_colrad hook,
    # imd_ttm.c:101-103; called before FILLMESH)
    keep_zne = colrad is not None
    cstate = None
    if colrad is not None:
        from imd_tpu.models import colrad as colrad_mod
        tab, step_fn, cstate = colrad[:3]
        # MULTIPHOTON photon flux at the step time (surface intensity;
        # the reference's local-intensity plumbing is WIP, colrad.c:1498)
        phi = (colrad[3](t * units.IMD_TIME_S)
               if len(colrad) > 3 and colrad[3] is not None else None)
        grid = fill_mesh(grid, params, eos, False)  # Ce needed for dTe/dt
        grid, cstate, _ = colrad_mod.apply_colrad(grid, cstate, tab,
                                                  params, step_fn, dt, phi)
    laser_active = jnp.asarray(False)
    if laser_cfg is not None and laser_cfg.sigma_e > 0:
        grid, laser_active = lambert_beer_source(grid, params, laser_cfg, t)
    grid = fill_mesh(grid, params, eos, laser_active, keep_zne)
    if params.solver == "implicit":
        # backward-Euler tridiagonal solves: a STATIC n_sub substeps
        # per MD step regardless of the CFL demand (diff_step_implicit)
        substeps = jnp.asarray(max(params.n_sub, 1), jnp.int32)
        clamped = jnp.asarray(False)
        step_fn = diff_step_implicit
    else:
        substeps, clamped = cfl_substeps(grid, params, dt, first)
        step_fn = diff_step

    # (the vlat chain itself is implicit/unconditionally stable; only the
    # explicit MD-edge exchange rides the grid's own CFL count)
    vparams, vstate = vlat if vlat is not None else (None, None)
    grid = grid.replace(cfl_overflow=grid.cfl_overflow | clamped)
    tau = dt / substeps.astype(grid.temp.dtype)

    def substep(i, g, vs):
        if tmm_params is not None:
            from imd_tpu.models import tmm as tmm_mod
            t_si = (t + i * tau) * units.IMD_TIME_S
            g, diag = tmm_mod.do_tmm(g, params, tmm_params, t_si)
            on = diag["laser_active"]
        else:
            on = laser_active
        g = step_fn(g, params, tau, substeps, on)
        if vparams is not None:
            g, vs = vlat_substep(g, vs, params, vparams, eos, tau)
        return fill_mesh(g, params, eos, on, keep_zne), vs

    if vparams is not None:
        grid, vstate = jax.lax.fori_loop(
            0, substeps, lambda i, c: substep(i, *c), (grid, vstate))
    else:
        grid = jax.lax.fori_loop(
            0, substeps, lambda i, g: substep(i, g, None)[0], grid)
    # final U consistent with T via EOS (imd_ttm.c:131-145)
    act = active_mask(grid, params)
    ne = grid.ne if keep_zne else _ne(grid, params)
    U = jnp.where(act, eos.u_from_te(grid.dens, ne, grid.temp), grid.U)
    grid = grid.replace(U=U)
    out = (grid, fdi)
    if colrad is not None:
        out = out + (cstate,)
    if vlat is not None:
        out = out + (vstate,)
    return out


def calc_ttm_fdtd(grid: TTMGrid, fdtd_state, scene: Scene,
                  params: TTMParams, eos: FEGEos, fdtd_params,
                  num_neighs, fdi_prev, dt, t,
                  first_step=False):
    """calc_ttm with the FDTD Maxwell solver as the laser source.

    Mirrors the reference's FDTD-coupled schedule (imd_ttm_3D.c:110-180):
    an outer loop of `fdtd_substeps` Maxwell steps at the light-CFL
    timestep (static count: MD dt / dt_FDTD + 1), each followed by an
    inner loop of diffusion substeps at the electron-CFL timestep.
    Returns (grid, fdi, fdtd_state).
    """
    from imd_tpu.models import fdtd as fdtd_mod

    first = jnp.asarray(first_step)
    if isinstance(scene, Scene):
        grid, fdi = update_fd(grid, scene, params, num_neighs, fdi_prev,
                              first)
    else:
        # flat-component atoms (x, mom3, mass, mask) from the fused
        # cells-last hot loop (ops/fused_step.py)
        x, mom3, mass, mask = scene
        grid, fdi = update_fd_flat(grid, params, x, mom3, mass, mask,
                                   num_neighs, fdi_prev, first)
    grid = do_adv(grid, params, eos, first)
    grid = cell_activation(grid, params, eos)
    grid = fill_mesh(grid, params, eos, True)

    # static outer count from the MD timestep (a Python float in config;
    # imd_ttm_3D.c:112 computes it from dt_FDTD the same way)
    n_fdtd = fdtd_mod.fdtd_substeps_per_md(
        fdtd_params, float(jax.core.concrete_or_error(
            None, dt, "the FDTD outer loop needs a static MD timestep")))
    sub_total, clamped = cfl_substeps(grid, params, dt, first)
    grid = grid.replace(cfl_overflow=grid.cfl_overflow | clamped)
    # ceil, not floor: n_fdtd * n_diff must cover the CFL demand or the
    # explicit diffusion runs unstable
    n_diff = jnp.maximum((sub_total + n_fdtd - 1) // n_fdtd, 1)
    tau = dt / (n_fdtd * n_diff).astype(grid.temp.dtype)

    dl = fdtd_mod.fit_dl(grid, params)
    active = grid.natoms >= params.fd_min_atoms
    t_si0 = t * units.IMD_TIME_S
    laser_active = fdtd_mod.laser_on(fdtd_params, t_si0)

    def outer(i, carry):
        g, fs = carry
        t_si = t_si0 + i * fdtd_params.dt_s
        fs = jax.lax.cond(
            laser_active,
            lambda s: fdtd_mod.step_1d(s, fdtd_params, dl, active, t_si),
            lambda s: s, fs)
        g = g.replace(source=fs.source)

        def inner(k, gg):
            gg = diff_step(gg, params, tau, n_fdtd * n_diff, laser_active)
            return fill_mesh(gg, params, eos, laser_active)

        g = jax.lax.fori_loop(0, n_diff, inner, g)
        return (g, fs)

    grid, fdtd_state = jax.lax.fori_loop(0, n_fdtd, outer,
                                         (grid, fdtd_state))
    act = active_mask(grid, params)
    ne = _ne(grid, params)
    U = jnp.where(act, eos.u_from_te(grid.dens, ne, grid.temp), grid.U)
    grid = grid.replace(U=U)
    return grid, fdi, fdtd_state


def electron_pressure_force(grid: TTMGrid, params: TTMParams,
                            eos: FEGEos) -> jnp.ndarray:
    """Per-cell electron blast force [nx] (do_electronic_pressure,
    imd_ttm.c:554-625): F_x = -dP_e/dx / n_i, central difference; the
    integrator subtracts it from the x momentum update."""
    act = active_mask(grid, params)
    pe = jnp.where(act, eos.pe(jnp.maximum(grid.dens, 1e-3),
                               jnp.maximum(grid.ne, 1.0),
                               jnp.maximum(grid.temp, 1e-6)), 0.0)
    pe_p = jnp.roll(pe, -1)
    pe_m = jnp.roll(pe, 1)
    ni = jnp.maximum(grid.natoms.astype(pe.dtype), 1.0) / params.fd_vol
    f = (pe_p - pe_m) / (2.0 * params.fd_h_x) / ni
    f = jnp.where(act, f, 0.0)
    # one-sided zero at the grid ends
    return f.at[0].set(0.0).at[-1].set(0.0)


def gather_atom_coupling(grid: TTMGrid, scene: Scene, params: TTMParams):
    """Per-atom xi and v_com for move_atoms_ttm (integrate.c:738-748)."""
    fdi = fd_index(scene, params)
    xi_a, vcom_a = gather_atom_coupling_flat(grid, fdi.reshape(-1))
    return xi_a.reshape(fdi.shape), vcom_a.reshape(fdi.shape + (3,))


def gather_atom_coupling_flat(grid: TTMGrid, fdi_flat, extra=None):
    """One-hot matmul instead of a per-slot gather (14.8 ms -> ~1 ms at
    1M atoms on v5e; the column table is tiny, so the contraction is an
    MXU matvec).  Returns flat (xi [M], vcom [M, 3]); with ``extra``
    (a per-cell [nx] column, e.g. the ELECPRESS blast force) also its
    per-atom gather, riding the same one-hot."""
    nx = grid.xi.shape[0]
    onehot = (fdi_flat[:, None]
              == jnp.arange(nx, dtype=jnp.int32)[None]
              ).astype(grid.xi.dtype)
    xi_a = jnp.matmul(onehot, grid.xi[:, None],
                      precision=(jax.lax.Precision.DEFAULT,
                                 jax.lax.Precision.HIGHEST))[:, 0]
    vcom_a = jnp.matmul(onehot, grid.vcom,
                        precision=(jax.lax.Precision.DEFAULT,
                                   jax.lax.Precision.HIGHEST))
    if extra is not None:
        extra_a = jnp.matmul(onehot, extra[:, None],
                             precision=(jax.lax.Precision.DEFAULT,
                                        jax.lax.Precision.HIGHEST))[:, 0]
        return xi_a, vcom_a, extra_a
    return xi_a, vcom_a


def electron_energy_total(grid: TTMGrid, params: TTMParams) -> jnp.ndarray:
    act = active_mask(grid, params)
    return jnp.sum(jnp.where(act, grid.U * grid.natoms, 0.0))
