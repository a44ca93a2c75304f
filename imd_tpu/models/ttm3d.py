"""Three-dimensional TTM variant (imd_ttm_3D.c).

The reference's maintained path is the 1-D LB-compatible TTM
(models/ttm.py); imd_ttm_3D.c is the manual swap-in with the full
l1[i][j][k] grid, 3-D ghost-plane exchange and 2-D advection fluxes
(types.h:463-466).  This module generalizes the same TPU design to
[nx, ny, nz] fields:

- update_fd: per-voxel segment sums over the flat voxel index;
- advection: donor-cell U transport from per-atom voxel-index changes,
  decomposed into the 6 face directions (diagonal hops between updates
  are rare at MD timesteps and folded into the n_old/n_new ratio);
- diffusion: 6-neighbor conservative variable-kappa stencil with
  per-axis spacing, mirror boundaries at inactive neighbors;
- activation: 6-neighbor average of T^2 for fresh cells;
- CFL: dt <= safety * Ce / (2 kappa (1/dx^2 + 1/dy^2 + 1/dz^2));
- Lambert-Beer source along x with per-(y,z)-column surface detection.

Wide-range transport and the EOS are shared with the 1-D module.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from imd_tpu import units
from imd_tpu.models import widerange as wr
from imd_tpu.models.eos import FEGEos
from imd_tpu.models.ttm import RHOMIN, TE_MIN_EV
from imd_tpu.scene import Scene


class TTM3DParams(struct.PyTreeNode):
    dims: Tuple[int, int, int] = struct.field(pytree_node=False)
    fd_h: Tuple[float, float, float] = struct.field(pytree_node=False)
    fd_vol: float = struct.field(pytree_node=False)
    neigh_vol: float = struct.field(pytree_node=False)
    atomic_mass: float = struct.field(pytree_node=False)
    atomic_z: float = struct.field(pytree_node=False)
    fd_min_atoms: int = struct.field(pytree_node=False)
    rho_min: float = struct.field(pytree_node=False, default=RHOMIN)
    max_substeps: int = struct.field(pytree_node=False, default=65536)
    fd_n_timesteps: int = struct.field(pytree_node=False, default=1)
    cfl_safety: float = struct.field(pytree_node=False, default=0.9)
    const_kappa: float = struct.field(pytree_node=False, default=0.0)
    const_gamma: float = struct.field(pytree_node=False, default=0.0)
    const_ce: float = struct.field(pytree_node=False, default=0.0)
    omega_laser: float = struct.field(pytree_node=False, default=0.0)
    # DIRICHLET lateral heat bath (imd_ttm_3D.c:395-408, 1689-1708):
    # outermost active cells at x-rows/y-columns with i >= this index see
    # a room-temperature fixed-Te neighbor instead of the adiabatic
    # mirror; -1 disables (dirichlet_surfx_int = round(surfx/fd_h.x),
    # imd_ttm_3D.c:1183)
    dirichlet_surfx_int: int = struct.field(pytree_node=False, default=-1)

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.dims
        return nx * ny * nz


class TTM3DGrid(struct.PyTreeNode):
    """ttm_Element fields as [nx, ny, nz] arrays."""
    temp: jnp.ndarray
    md_temp: jnp.ndarray
    U: jnp.ndarray
    natoms: jnp.ndarray
    natoms_old: jnp.ndarray
    dens: jnp.ndarray
    vcom: jnp.ndarray          # [nx,ny,nz,3]
    xi: jnp.ndarray
    source: jnp.ndarray
    Z: jnp.ndarray
    ne: jnp.ndarray
    Ce: jnp.ndarray
    fd_k: jnp.ndarray
    fd_g: jnp.ndarray
    eabs: jnp.ndarray
    init_done: jnp.ndarray
    cfl_overflow: jnp.ndarray


def make_params(cfg_ttm, box, cutoff: float, dtype=jnp.float32,
                dirichlet_surfx: float = 0.0):
    heights = box.heights()
    dims = (cfg_ttm.fd_nx, cfg_ttm.fd_ny, cfg_ttm.fd_nz)
    fd_h = tuple(float(heights[a]) / dims[a] for a in range(3))
    return TTM3DParams(
        dims=dims, fd_h=fd_h, fd_vol=fd_h[0] * fd_h[1] * fd_h[2],
        neigh_vol=4.0 / 3.0 * math.pi * cutoff ** 3,
        atomic_mass=cfg_ttm.atomic_mass, atomic_z=cfg_ttm.atomic_z,
        fd_min_atoms=cfg_ttm.fd_min_atoms,
        max_substeps=cfg_ttm.max_substeps, cfl_safety=cfg_ttm.cfl_safety,
        const_kappa=cfg_ttm.fd_k, const_gamma=cfg_ttm.fd_g,
        const_ce=cfg_ttm.fd_c,
        dirichlet_surfx_int=(int(round(dirichlet_surfx / fd_h[0]))
                             if dirichlet_surfx > 0 else -1))


def make_grid(params: TTM3DParams, dtype=jnp.float32) -> TTM3DGrid:
    d = params.dims
    z = jnp.zeros(d, dtype)
    zi = jnp.zeros(d, jnp.int32)
    return TTM3DGrid(temp=z, md_temp=z, U=z, natoms=zi, natoms_old=zi,
                     dens=z, vcom=jnp.zeros(d + (3,), dtype), xi=z,
                     source=z, Z=z, ne=z, Ce=z, fd_k=z, fd_g=z,
                     eabs=jnp.zeros((), dtype),
                     init_done=jnp.zeros((), bool),
                     cfl_overflow=jnp.zeros((), bool))


def active_mask(grid, params):
    return (grid.natoms >= params.fd_min_atoms) & (grid.dens > params.rho_min)


def fd_index(scene: Scene, params: TTM3DParams) -> jnp.ndarray:
    """Flat voxel index per atom slot."""
    nx, ny, nz = params.dims
    ijk = []
    for a in range(3):
        i = jnp.floor(scene.pos[..., a] / params.fd_h[a]).astype(jnp.int32)
        ijk.append(jnp.clip(i, 0, params.dims[a] - 1))
    return (ijk[0] * ny + ijk[1]) * nz + ijk[2]


def update_fd(grid, scene, params, num_neighs, first_step):
    dtype = scene.pos.dtype
    n_cells = params.n_cells
    dims = params.dims
    mask = scene.mask & (scene.type == 0)
    fm = mask.astype(dtype)
    fdi = fd_index(scene, params)
    seg = jnp.where(mask, fdi, n_cells)

    def ssum(x, dt=None):
        flat = x.reshape((-1,) + x.shape[4:]) if x.ndim > 4 else x.reshape(-1)
        out = jax.ops.segment_sum(flat, seg.reshape(-1),
                                  num_segments=n_cells + 1)[:n_cells]
        return out.astype(dt or dtype).reshape(
            dims + out.shape[1:])

    natoms = ssum(fm, jnp.int32)
    totneighs = ssum(num_neighs.astype(dtype) * fm)
    mom_sum = ssum(scene.mom * fm[..., None])
    totmass = natoms.astype(dtype) * params.atomic_mass
    vcom = jnp.where(totmass[..., None] > 0, mom_sum / totmass[..., None],
                     0.0)
    v = scene.mom / jnp.maximum(scene.mass, 1e-30)[..., None]
    vc_at = vcom.reshape(n_cells, 3)[fdi]
    dv = (v - vc_at) * fm[..., None]
    mdt = ssum(jnp.sum(dv * dv, -1) * scene.mass)
    md_temp = jnp.where(natoms > 0,
                        mdt / (3.0 * jnp.maximum(natoms, 1)), 0.0)
    dens = jnp.where(
        natoms > 0,
        totneighs / jnp.maximum(natoms.astype(dtype), 1.0)
        * params.atomic_mass / params.neigh_vol * 1660.53907, 0.0)
    dens = jnp.where((natoms > 0) & (dens == 0.0),
                     natoms.astype(dtype) * params.atomic_mass
                     / params.fd_vol * 1660.53907, dens)

    act = (natoms >= params.fd_min_atoms) & (dens > params.rho_min)
    temp = jnp.where(grid.init_done, grid.temp,
                     jnp.where(act, md_temp, 0.0))
    grid = grid.replace(
        temp=temp, md_temp=md_temp, natoms=natoms,
        natoms_old=jnp.where(first_step, natoms, grid.natoms),
        dens=dens, vcom=vcom, xi=jnp.zeros_like(grid.xi),
        source=jnp.zeros_like(grid.source),
        init_done=jnp.ones((), bool))
    return grid, jnp.where(mask, fdi, -1)


def do_adv(grid, params, eos, fdi, fdi_prev, first_step):
    """Donor-cell U advection from voxel-index changes (do_ADV 3-D).

    Incoming per-atom energy carried at the SOURCE voxel's U; diagonal
    hops contribute via their source voxel directly (no face
    decomposition needed with flat segment keys)."""
    n_cells = params.n_cells
    dims = params.dims
    dtype = grid.U.dtype
    moved = (fdi_prev >= 0) & (fdi >= 0) & (fdi != fdi_prev)
    u_flat = grid.U.reshape(-1)
    # energy arriving at each destination voxel = sum over moved atoms of
    # U(source voxel); energy leaving = count_out * U(self)
    src_u = jnp.where(moved, u_flat[jnp.maximum(fdi_prev, 0)], 0.0)
    inflow = jax.ops.segment_sum(
        src_u.reshape(-1), jnp.where(moved, fdi, n_cells).reshape(-1),
        num_segments=n_cells + 1)[:n_cells].reshape(dims)
    out_cnt = jax.ops.segment_sum(
        moved.astype(dtype).reshape(-1),
        jnp.where(moved, fdi_prev, n_cells).reshape(-1),
        num_segments=n_cells + 1)[:n_cells].reshape(dims)
    n_old = grid.natoms_old.astype(dtype)
    n_new = jnp.maximum(grid.natoms.astype(dtype), 1.0)
    u2 = jnp.where(grid.natoms > 0,
                   (grid.U * (n_old - out_cnt) + inflow) / n_new, 0.0)
    u2 = jnp.where(first_step, grid.U, u2)
    act = active_mask(grid, params)
    ne = _ne(grid, params)
    temp2 = jnp.where(act, eos.te_from_u(grid.dens, ne, u2), grid.temp)
    temp2 = jnp.where(grid.natoms > 0, temp2, 0.0)
    return grid.replace(U=u2,
                        temp=jnp.where(first_step, grid.temp, temp2))


def _ne(grid, params):
    Z = wr.mean_charge(jnp.maximum(grid.temp, 1e-6),
                       jnp.maximum(grid.dens, 1e-3),
                       params.atomic_z, params.atomic_mass)
    return jnp.maximum(Z, 1e-3) * jnp.maximum(grid.dens, 1e-3) / (
        params.atomic_mass * wr.AMU)


def cell_activation(grid, params, eos):
    """Newly-activated cells get the 6-neighbor T^2 average or T_i."""
    act = active_mask(grid, params)
    was = grid.natoms_old >= params.fd_min_atoms
    fresh = ~was & act & (jnp.isnan(grid.temp) | (grid.temp <= TE_MIN_EV))
    t2 = jnp.where(act, grid.temp ** 2, 0.0)
    cnt = act.astype(grid.temp.dtype)
    t2s = jnp.zeros_like(t2)
    ns = jnp.zeros_like(cnt)
    for ax in range(3):
        for off in (-1, 1):
            t2s = t2s + jnp.roll(t2, off, ax)
            ns = ns + jnp.roll(cnt, off, ax)
    t_avg = jnp.sqrt(t2s / jnp.maximum(ns, 1.0))
    t_new = jnp.where(ns > 0, t_avg, grid.md_temp)
    t_new = jnp.where(t_new < TE_MIN_EV, grid.md_temp, t_new)
    temp = jnp.where(fresh, t_new, grid.temp)
    ne = _ne(grid.replace(temp=temp), params)
    U = jnp.where(fresh, eos.u_from_te(grid.dens, ne, temp), grid.U)
    return grid.replace(temp=temp, U=U)


def fill_mesh(grid, params, eos, laser_active=False):
    act = active_mask(grid, params)
    temp = jnp.maximum(grid.temp, 1e-6)
    dens = jnp.maximum(grid.dens, 1e-3)
    Z = jnp.maximum(wr.mean_charge(temp, dens, params.atomic_z,
                                   params.atomic_mass), 1e-3)
    ne = Z * dens / (params.atomic_mass * wr.AMU)
    Ce = (params.const_ce * temp if params.const_ce > 0
          else eos.ce(dens, ne, temp))
    fd_k = (jnp.full_like(temp, params.const_kappa)
            if params.const_kappa > 0
            else wr.get_kappa(temp, jnp.maximum(grid.md_temp, 1e-6), ne, Z,
                              params.omega_laser, laser_active))
    fd_g = (jnp.full_like(temp, params.const_gamma)
            if params.const_gamma > 0
            else wr.get_gamma(temp, jnp.maximum(grid.md_temp, 1e-6), ne, Z,
                              params.atomic_mass, params.omega_laser,
                              laser_active))
    zero = jnp.zeros_like(temp)
    return grid.replace(Z=jnp.where(act, Z, zero),
                        ne=jnp.where(act, ne, zero),
                        Ce=jnp.where(act, Ce, zero),
                        fd_k=jnp.where(act, fd_k, zero),
                        fd_g=jnp.where(act, fd_g, zero))


def cfl_substeps(grid, params, dt, first_step):
    act = active_mask(grid, params)
    inv = sum(1.0 / h ** 2 for h in params.fd_h)
    kmax = grid.fd_k
    for ax in range(3):
        for off in (-1, 1):
            kn = jnp.roll(grid.fd_k, off, ax)
            an = jnp.roll(act, off, ax)
            kmax = jnp.maximum(kmax, jnp.where(an, kn, 0.0))
    lim = jnp.where(act & (kmax > 0),
                    grid.Ce / (2.0 * jnp.maximum(kmax, 1e-30) * inv),
                    jnp.inf)
    max_dt = params.cfl_safety * jnp.min(lim)
    ratio = jnp.minimum(dt / jnp.maximum(max_dt, 1e-12),
                        2.0 * params.max_substeps)
    sub = jnp.maximum(params.fd_n_timesteps,
                      jnp.ceil(ratio).astype(jnp.int32))
    return jnp.minimum(sub, params.max_substeps), sub > params.max_substeps


# DIRICHLET bath constants (imd_ttm_3D.c:1694-1706): room-temperature
# electron bath Te = RT and its wide-range kappa(RT) in internal units
DIRICHLET_TE = 0.025850926
DIRICHLET_KAPPA = 1.933442e+01


def _dirichlet_edges(act, params):
    """Outermost-active-cell masks (imd_ttm_3D.c:397-405): per x-row the
    min/max active y index, per y-column the max active x index —
    generalized per-z-plane (the reference's arrays are z-independent
    because its 3-D grid is a thin slab with nz == 1)."""
    nx, ny, _ = params.dims
    ii = jnp.arange(nx)[:, None, None]
    jj = jnp.arange(ny)[None, :, None]
    maxy = jnp.max(jnp.where(act, jj, -1), axis=1, keepdims=True)
    miny = jnp.min(jnp.where(act, jj, ny + 1), axis=1, keepdims=True)
    maxx = jnp.max(jnp.where(act, ii, -1), axis=0, keepdims=True)
    past = ii >= params.dirichlet_surfx_int   # don't cool ablated matter
    return (act & past & (jj == maxy),        # +y neighbor is the bath
            act & past & (jj == miny),        # -y neighbor is the bath
            act & past & (ii == maxx))        # +x neighbor is the bath


def diff_step(grid, params, tau, substeps, laser_active):
    """6-neighbor conservative variable-kappa substep + coupling."""
    act = active_mask(grid, params)
    T = grid.temp
    k = grid.fd_k
    Ce = jnp.maximum(grid.Ce, 1e-30)
    dirichlet = params.dirichlet_surfx_int >= 0
    if dirichlet:
        edge_py, edge_my, edge_px = _dirichlet_edges(act, params)
    lap = jnp.zeros_like(T)
    for ax in range(3):
        inv_dx2 = 1.0 / params.fd_h[ax] ** 2
        for off in (-1, 1):
            Tn = jnp.roll(T, off, ax)
            kn = jnp.roll(k, off, ax)
            an = jnp.roll(act, off, ax)
            Tn = jnp.where(an, Tn, T)     # mirror at inactive neighbors
            kn = jnp.where(an, kn, k)
            if dirichlet:
                # room-temperature bath past the sample edge
                # (imd_ttm_3D.c:1689-1708)
                edge = (edge_py if (ax, off) == (1, -1)
                        else edge_my if (ax, off) == (1, 1)
                        else edge_px if (ax, off) == (0, -1) else None)
                if edge is not None:
                    Tn = jnp.where(edge, DIRICHLET_TE, Tn)
                    kn = jnp.where(edge, DIRICHLET_KAPPA, kn)
            lap = lap + (k + kn) * 0.5 * (Tn - T) * inv_dx2
    dT = tau / Ce * (lap - grid.fd_g * (T - grid.md_temp) + grid.source)
    T2 = jnp.where(act, T + dT, T)
    U2 = grid.U + jnp.where(act, (T2 - T) * Ce * params.fd_vol
                            / jnp.maximum(grid.natoms, 1), 0.0)
    xi_fac = params.atomic_mass * wr.AMU / 3.0 * 1e30 / jnp.maximum(
        substeps, 1)
    dxi = jnp.where(act & (grid.md_temp > 1e-12) & (grid.dens > 0),
                    (T2 - grid.md_temp) * xi_fac * grid.fd_g
                    / jnp.maximum(grid.md_temp, 1e-12)
                    / jnp.maximum(grid.dens, 1e-12), 0.0)
    eabs = grid.eabs + jnp.where(
        laser_active,
        jnp.sum(jnp.where(act, grid.source, 0.0)) * params.fd_vol * tau,
        0.0)
    return grid.replace(temp=T2, U=U2, xi=grid.xi + dxi, eabs=eabs)


def lambert_beer_source(grid, params, laser_cfg, t):
    """Per-(y,z)-column Lambert-Beer along x with column-wise surface."""
    dtype = grid.temp.dtype
    mu = laser_cfg.mu
    sig_t = max(laser_cfg.sigma_t, 1e-30)
    p_peak = mu * laser_cfg.sigma_e / sig_t / math.sqrt(2.0 * math.pi)
    g_t = jnp.exp(-((t - laser_cfg.t_0) ** 2)
                  / (2.0 * sig_t ** 2)) * p_peak
    active = g_t >= p_peak * 0.001
    act = active_mask(grid, params)
    nx = params.dims[0]
    idx = jnp.arange(nx)[:, None, None]
    first = jnp.min(jnp.where(act, idx, nx), axis=0)      # [ny, nz]
    x_cell = (idx.astype(dtype) + 0.5) * params.fd_h[0]
    depth = jnp.maximum(
        x_cell - first[None].astype(dtype) * params.fd_h[0]
        - laser_cfg.offset, 0.0)
    src = jnp.where(act, g_t * jnp.exp(-mu * depth), 0.0)
    return grid.replace(source=src.astype(dtype)), active


def calc_ttm(grid, scene, params, eos, num_neighs, fdi_prev, dt, t,
             laser_cfg=None, first_step=False):
    """One MD step of the 3-D TTM (calc_ttm, imd_ttm_3D.c:75-230)."""
    first = jnp.asarray(first_step)
    grid, fdi = update_fd(grid, scene, params, num_neighs, first)
    grid = do_adv(grid, params, eos, fdi, fdi_prev, first)
    grid = cell_activation(grid, params, eos)
    laser_active = jnp.asarray(False)
    if laser_cfg is not None and laser_cfg.sigma_e > 0:
        grid, laser_active = lambert_beer_source(grid, params, laser_cfg, t)
    grid = fill_mesh(grid, params, eos, laser_active)
    substeps, clamped = cfl_substeps(grid, params, dt, first)
    grid = grid.replace(cfl_overflow=grid.cfl_overflow | clamped)
    tau = dt / substeps.astype(grid.temp.dtype)

    def body(i, g):
        g = diff_step(g, params, tau, substeps, laser_active)
        return fill_mesh(g, params, eos, laser_active)

    grid = jax.lax.fori_loop(0, substeps, body, grid)
    act = active_mask(grid, params)
    ne = _ne(grid, params)
    U = jnp.where(act, eos.u_from_te(grid.dens, ne, grid.temp), grid.U)
    return grid.replace(U=U), fdi


def calc_ttm_fdtd(grid, fdtd_state, scene, params, eos, fdtd_params,
                  num_neighs, fdi_prev, dt, t, first_step=False):
    """calc_ttm with the 2-D FDTD Maxwell solver as the laser source.

    The reference's experimental FDTD2D mode (imd_fdtd.c:313-560, gated
    on ``global_fd_dim.z == 1``, imd_fdtd.c:14) on the thin-slab 3-D TTM
    grid: an outer loop of Maxwell steps at the light-CFL timestep, each
    followed by an inner loop of diffusion substeps (the same coupled
    schedule as the 1-D path, imd_ttm_3D.c:110-180).  Signature matches
    ttm.calc_ttm_fdtd so the driver dispatch is uniform.
    Returns (grid, fdi, fdtd_state).
    """
    from imd_tpu.models import fdtd as fdtd_mod

    if params.dims[2] != 1:
        raise ValueError("2-D FDTD coupling requires fd_nz == 1")
    first = jnp.asarray(first_step)
    grid, fdi = update_fd(grid, scene, params, num_neighs, first)
    grid = do_adv(grid, params, eos, fdi, fdi_prev, first)
    grid = cell_activation(grid, params, eos)
    grid = fill_mesh(grid, params, eos, True)

    n_fdtd = fdtd_mod.fdtd_substeps_per_md(
        fdtd_params, float(jax.core.concrete_or_error(
            None, dt, "the FDTD outer loop needs a static MD timestep")))
    sub_total, clamped = cfl_substeps(grid, params, dt, first)
    grid = grid.replace(cfl_overflow=grid.cfl_overflow | clamped)
    n_diff = jnp.maximum((sub_total + n_fdtd - 1) // n_fdtd, 1)
    tau = jnp.asarray(dt, grid.temp.dtype) \
        / (n_fdtd * n_diff).astype(grid.temp.dtype)

    dl = fdtd_mod.fit_dl(grid, params)[..., 0]          # [6, nx, ny]
    active2 = (grid.natoms >= params.fd_min_atoms)[..., 0]
    t_si0 = t * units.IMD_TIME_S
    laser_active = fdtd_mod.laser_on(fdtd_params, t_si0)

    def outer(i, carry):
        g, fs = carry
        t_si = t_si0 + i * fdtd_params.dt_s
        fs = jax.lax.cond(
            laser_active,
            lambda s: fdtd_mod.step_2d(s, fdtd_params, dl, active2, t_si),
            lambda s: s, fs)
        g = g.replace(source=fs.source[..., None])

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
    return grid.replace(U=U), fdi, fdtd_state


def electron_pressure_force(grid, params, eos):
    """Per-voxel electron blast force [nx,ny,nz,3]: -grad(P_e)/n_i by
    central differences, zeroed at grid ends and inactive voxels."""
    act = active_mask(grid, params)
    pe = jnp.where(act, eos.pe(jnp.maximum(grid.dens, 1e-3),
                               jnp.maximum(grid.ne, 1.0),
                               jnp.maximum(grid.temp, 1e-6)), 0.0)
    ni = jnp.maximum(grid.natoms.astype(pe.dtype), 1.0) / params.fd_vol
    comps = []
    for ax in range(3):
        f = (jnp.roll(pe, -1, ax) - jnp.roll(pe, 1, ax)) \
            / (2.0 * params.fd_h[ax]) / ni
        f = jnp.where(act, f, 0.0)
        idx = [slice(None)] * 3
        for edge in (0, -1):
            idx[ax] = edge
            f = f.at[tuple(idx)].set(0.0)
        comps.append(f)
    return jnp.stack(comps, -1)


def gather_atom_coupling(grid, scene, params):
    fdi = fd_index(scene, params)
    n = params.n_cells
    return (grid.xi.reshape(n)[fdi], grid.vcom.reshape(n, 3)[fdi])


def electron_energy_total(grid, params):
    act = active_mask(grid, params)
    return jnp.sum(jnp.where(act, grid.U * grid.natoms, 0.0))
