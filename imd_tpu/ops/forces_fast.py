"""Cells-last force engine: the TPU-optimized layout for the stencil sweep.

The reference engine in ops/forces.py computes on arrays shaped
[gx, gy, gz, cap, cap, 3] — the trailing dimensions map to TPU
(sublane, lane) tiles of (24, 3)/(24, 24), wasting >95% of the VPU's
8x128 lanes.  This engine transposes once to cells-last layout

    pos  [cap, 3, NC]      (NC = gx*gy*gz, the lane dimension)
    pair quantities [cap_i, cap_j, NC]

so every elementwise op runs with thousands of lanes, and the j/i
contractions of the force accumulation are batched [NC]-matmuls XLA can
put on the MXU.  Lattice rolls reshape to 5-D, roll, and flatten back —
pure data movement.  Measured ~50-100x faster than the cells-first
layout on v5e for 100k atoms.

Numerics are identical to ops/forces.py (same stencil, same Newton
halving, same interpolation calls); tests assert equality.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu.ops.forces import ALL_OFFSETS, HALF_OFFSETS, ForceResult, _pair_terms
from imd_tpu.scene import Scene


def _to_cl(arr, dims):
    """[gx,gy,gz,cap,...] -> [cap, ..., NC] (cells last)."""
    gx, gy, gz = dims
    nc = gx * gy * gz
    extra = arr.ndim - 4
    # [gx,gy,gz,cap,(3)] -> [cap,(3),gx,gy,gz] -> [cap,(3),NC]
    perm = (3,) + tuple(range(4, 4 + extra)) + (0, 1, 2)
    t = jnp.transpose(arr, perm)
    return t.reshape(t.shape[:1 + extra] + (nc,))


def _from_cl(arr, dims):
    """[cap, ..., NC] -> [gx,gy,gz,cap,...]."""
    gx, gy, gz = dims
    extra = arr.ndim - 2
    t = arr.reshape(arr.shape[:-1] + (gx, gy, gz))
    perm = (1 + extra, 2 + extra, 3 + extra, 0) + tuple(range(1, 1 + extra))
    return jnp.transpose(t, perm)


def _roll_cells(arr, dims, off):
    """Roll the flattened cell axis (last) by a 3-D lattice offset.

    The y/z components are done as flat rolls on the COMBINED gy*gz
    axis plus a static z-wrap select: a true 3-D roll needs the [.., gy,
    gz] view whose gz-lane rows (46 here) pad to 128 and relayout on
    every roll — measured ~0.7 ms per rolled copy at 1M atoms, ~30% of
    the whole force time across the 13 neighbor views and the partner
    roll-backs.  On the combined axis the principal flat roll is exact
    except where z wraps (z+oz outside [0,gz)); those lanes take the
    same roll displaced by -+gz.  Identical results, lane-shift cost.
    """
    gx, gy, gz = dims
    ox, oy, oz = off
    if gy == 1 or gz == 1:
        # degenerate grids: the combined-axis trick needs real y/z rows
        t = arr.reshape(arr.shape[:-1] + (gx, gy, gz))
        shifts, axes = [], []
        base = arr.ndim - 1
        for k, (o, g) in enumerate(zip((ox, oy, oz), (gx, gy, gz))):
            if o and g > 1:
                shifts.append(-o)
                axes.append(base + k)
        if axes:
            t = jnp.roll(t, shifts, axes)
        return t.reshape(arr.shape)

    gyz = gy * gz
    t = arr.reshape(arr.shape[:-1] + (gx, gyz))
    if ox and gx > 1:
        t = jnp.roll(t, -ox, axis=-2)
    k = oy * gz + oz
    if k or oz:
        principal = jnp.roll(t, -k, axis=-1) if k else t
        if oz:
            corr_shift = k - gz if oz > 0 else k + gz
            corr = jnp.roll(t, -corr_shift, axis=-1)
            z = jnp.arange(gyz) % gz
            wrap = (z >= gz - oz) if oz > 0 else (z < -oz)
            shape = (1,) * (t.ndim - 1) + (gyz,)
            principal = jnp.where(wrap.reshape(shape), corr, principal)
        t = principal
    return t.reshape(arr.shape)


def _roll_cells_back(arr, dims, off):
    return _roll_cells(arr, dims, tuple(-o for o in off))


def _wrap_shift_mask_cl(grid, off, dtype):
    """[3, NC] box shift for wrapped neighbors + [NC] validity (cells-last
    version of forces._wrap_shift_and_mask)."""
    gx, gy, gz = grid.dims
    shift_frac = []
    valid = None
    for ax, (g, o) in enumerate(zip((gx, gy, gz), off)):
        idx = jnp.arange(g, dtype=jnp.int32)
        wrap = jnp.floor_divide(idx + o, g)
        shape = [1, 1, 1]
        shape[ax] = g
        wrap = wrap.reshape(shape)
        shift_frac.append(jnp.broadcast_to(wrap, (gx, gy, gz)).astype(dtype))
        if not grid.box.pbc[ax]:
            ok = (wrap == 0)
            valid = ok if valid is None else (valid & ok)
    h = grid.box.h.astype(dtype)
    shift = (shift_frac[0][None] * h[0, :, None, None, None]
             + shift_frac[1][None] * h[1, :, None, None, None]
             + shift_frac[2][None] * h[2, :, None, None, None])  # [3,gx,gy,gz]
    nc = gx * gy * gz
    shift = shift.reshape(3, nc)
    if valid is None:
        validf = jnp.ones((nc,), bool)
    else:
        validf = jnp.broadcast_to(valid, (gx, gy, gz)).reshape(nc)
    return shift, validf


def _pair_quantities(pot, ntypes, ti, tj, r2, valid):
    phi, grad = _pair_terms(pot, ntypes, ti, tj, r2, valid)
    return phi, grad


def compute_pair_forces_fast(scene: Scene, pot, ntypes: int = 1,
                             count_neighbors: bool = False,
                             neigh_r2: float = 0.0) -> ForceResult:
    """Drop-in replacement for forces.compute_pair_forces (cells-last)."""
    grid = scene.grid
    dims = grid.dims
    dtype = scene.pos.dtype
    cap = scene.capacity
    pos = _to_cl(scene.pos, dims)            # [cap, 3, NC]
    typ = _to_cl(scene.type, dims)           # [cap, NC]
    mask = typ >= 0
    rcut2 = jnp.asarray(grid.cutoff ** 2, dtype)
    nr2 = jnp.asarray(neigh_r2 if neigh_r2 > 0 else grid.cutoff ** 2, dtype)

    F = jnp.zeros_like(pos)
    epot = jnp.zeros(typ.shape, dtype)
    virial = jnp.zeros((), dtype)
    presstens = jnp.zeros((6,), dtype)
    nneigh = jnp.zeros(typ.shape, jnp.int32)

    def block(off, self_cell):
        nonlocal F, epot, virial, presstens, nneigh
        if self_cell:
            xj, tj, mj = pos, typ, mask
            shift = jnp.zeros((3, 1), dtype)
            cell_ok = jnp.ones((1,), bool)
        else:
            xj = _roll_cells(pos, dims, off)
            tj = _roll_cells(typ, dims, off)
            mj = _roll_cells(mask, dims, off)
            shift, cell_ok = _wrap_shift_mask_cl(grid, off, dtype)
        xjs = xj + shift[None]                       # [cap,3,NC]
        # dr[i,j,c,NC]; heavy math on [cap,cap,NC]
        dr = pos[:, None] - xjs[None, :]             # [ci,cj,3,NC]
        r2 = jnp.sum(dr * dr, axis=2)                # [ci,cj,NC]
        valid = (mask[:, None] & mj[None, :] & cell_ok[None, None]
                 & (r2 < rcut2))
        if self_cell:
            ii = jnp.arange(cap)
            valid = valid & (ii[:, None, None] < ii[None, :, None])
        phi, grad = _pair_quantities(pot, ntypes, typ[:, None], tj[None, :],
                                     r2, valid)
        fvec = grad[:, :, None, :] * dr              # [ci,cj,3,NC]
        F_i = -jnp.sum(fvec, axis=1)
        F_j = jnp.sum(fvec, axis=0)
        e_i = 0.5 * jnp.sum(phi, axis=1)
        e_j = 0.5 * jnp.sum(phi, axis=0)
        if self_cell:
            F = F + F_i + F_j
            epot = epot + e_i + e_j
        else:
            F = F + F_i + _roll_cells_back(F_j, dims, off)
            epot = epot + e_i + _roll_cells_back(e_j, dims, off)
        gv = jnp.where(valid, grad, 0.0)
        virial = virial - jnp.sum(gv * r2)
        pt = jnp.stack([
            jnp.sum(gv * dr[:, :, 0] * dr[:, :, 0]),
            jnp.sum(gv * dr[:, :, 1] * dr[:, :, 1]),
            jnp.sum(gv * dr[:, :, 2] * dr[:, :, 2]),
            jnp.sum(gv * dr[:, :, 1] * dr[:, :, 2]),
            jnp.sum(gv * dr[:, :, 2] * dr[:, :, 0]),
            jnp.sum(gv * dr[:, :, 0] * dr[:, :, 1]),
        ])
        presstens = presstens - pt
        if count_neighbors:
            near = valid & (r2 < nr2)
            n_i = jnp.sum(near, axis=1).astype(jnp.int32)
            n_j = jnp.sum(near, axis=0).astype(jnp.int32)
            if self_cell:
                nneigh = nneigh + n_i + n_j
            else:
                nneigh = nneigh + n_i + _roll_cells_back(n_j, dims, off)

    block((0, 0, 0), True)
    for off in HALF_OFFSETS:
        block(off, False)

    return ForceResult(
        force=_from_cl(F, dims), epot=_from_cl(epot, dims),
        virial=virial, presstens=presstens,
        num_neighs=_from_cl(nneigh, dims))


def compute_eam_forces_fast(scene: Scene, eam, ntypes: int = 1,
                            count_neighbors: bool = False,
                            neigh_r2: float = 0.0,
                            eeam_embed=None) -> ForceResult:
    """Drop-in replacement for forces.compute_eam_forces (cells-last).

    ``eeam_embed`` arms the EEAM second embedding M(p = sum rho_h^2)
    (EAM_P/EAM_DM accumulation, imd_forces_nbl.c:553-568/878-882)."""
    grid = scene.grid
    dims = grid.dims
    dtype = scene.pos.dtype
    cap = scene.capacity
    pos = _to_cl(scene.pos, dims)
    typ = _to_cl(scene.type, dims)
    mask = typ >= 0
    rcut2 = jnp.asarray(grid.cutoff ** 2, dtype)
    nr2 = jnp.asarray(neigh_r2 if neigh_r2 > 0 else grid.cutoff ** 2, dtype)

    F = jnp.zeros_like(pos)
    epot = jnp.zeros(typ.shape, dtype)
    virial = jnp.zeros((), dtype)
    presstens = jnp.zeros((6,), dtype)
    nneigh = jnp.zeros(typ.shape, jnp.int32)
    rho = jnp.zeros(typ.shape, dtype)
    rho2 = jnp.zeros(typ.shape, dtype)   # EEAM p = sum rho_h^2

    def geometry(off, self_cell):
        if self_cell:
            xj, tj, mj = pos, typ, mask
            shift = jnp.zeros((3, 1), dtype)
            cell_ok = jnp.ones((1,), bool)
        else:
            xj = _roll_cells(pos, dims, off)
            tj = _roll_cells(typ, dims, off)
            mj = _roll_cells(mask, dims, off)
            shift, cell_ok = _wrap_shift_mask_cl(grid, off, dtype)
        dr = pos[:, None] - (xj + shift[None])[None, :]
        r2 = jnp.sum(dr * dr, axis=2)
        valid = (mask[:, None] & mj[None, :] & cell_ok[None, None]
                 & (r2 < rcut2))
        if self_cell:
            ii = jnp.arange(cap)
            valid = valid & (ii[:, None, None] < ii[None, :, None])
        return dr, r2, valid, tj

    def rho_cols(t_i, t_j, r2, valid):
        r2c = jnp.maximum(r2, 1e-12)
        if ntypes == 1:
            v_ij, g_ij = eam.rho.interp(0, r2c)
            v_ji, g_ji = v_ij, g_ij
        else:
            col_ij = jnp.clip(t_j * ntypes + t_i, 0, ntypes * ntypes - 1)
            col_ji = jnp.clip(t_i * ntypes + t_j, 0, ntypes * ntypes - 1)
            v_ij, g_ij = eam.rho.interp(col_ij, r2c)
            v_ji, g_ji = eam.rho.interp(col_ji, r2c)
        z = jnp.zeros_like(v_ij)
        return (jnp.where(valid, v_ij, z), jnp.where(valid, g_ij, z),
                jnp.where(valid, v_ji, z), jnp.where(valid, g_ji, z))

    def add_virial(s, dr, r2):
        nonlocal virial, presstens
        virial = virial - jnp.sum(s * r2)
        pt = jnp.stack([
            jnp.sum(s * dr[:, :, 0] * dr[:, :, 0]),
            jnp.sum(s * dr[:, :, 1] * dr[:, :, 1]),
            jnp.sum(s * dr[:, :, 2] * dr[:, :, 2]),
            jnp.sum(s * dr[:, :, 1] * dr[:, :, 2]),
            jnp.sum(s * dr[:, :, 2] * dr[:, :, 0]),
            jnp.sum(s * dr[:, :, 0] * dr[:, :, 1]),
        ])
        presstens = presstens - pt

    # ---- pass 1 ----------------------------------------------------------
    def pass1(off, self_cell):
        nonlocal F, epot, rho, rho2, nneigh
        dr, r2, valid, tj = geometry(off, self_cell)
        ti_b, tj_b = typ[:, None], tj[None, :]
        phi, grad = _pair_quantities(eam.pair, ntypes, ti_b, tj_b, r2, valid)
        rho_ij, _, rho_ji, _ = rho_cols(ti_b, tj_b, r2, valid)
        fvec = grad[:, :, None, :] * dr
        F_i = -jnp.sum(fvec, axis=1)
        F_j = jnp.sum(fvec, axis=0)
        e_i = 0.5 * jnp.sum(phi, axis=1)
        e_j = 0.5 * jnp.sum(phi, axis=0)
        r_i = jnp.sum(rho_ij, axis=1)
        r_j = jnp.sum(rho_ji, axis=0)
        if self_cell:
            F = F + F_i + F_j
            epot = epot + e_i + e_j
            rho = rho + r_i + r_j
        else:
            F = F + F_i + _roll_cells_back(F_j, dims, off)
            epot = epot + e_i + _roll_cells_back(e_j, dims, off)
            rho = rho + r_i + _roll_cells_back(r_j, dims, off)
        if eeam_embed is not None:
            p_i = jnp.sum(rho_ij * rho_ij, axis=1)
            p_j = jnp.sum(rho_ji * rho_ji, axis=0)
            rho2 = rho2 + p_i + (p_j if self_cell
                                 else _roll_cells_back(p_j, dims, off))
        add_virial(jnp.where(valid, grad, 0.0), dr, r2)
        if count_neighbors:
            near = valid & (r2 < nr2)
            n_i = jnp.sum(near, axis=1).astype(jnp.int32)
            n_j = jnp.sum(near, axis=0).astype(jnp.int32)
            if self_cell:
                nneigh = nneigh + n_i + n_j
            else:
                nneigh = nneigh + n_i + _roll_cells_back(n_j, dims, off)

    pass1((0, 0, 0), True)
    for off in HALF_OFFSETS:
        pass1(off, False)

    # ---- embedding --------------------------------------------------------
    rho_c = jnp.maximum(rho, 1e-12)
    if ntypes == 1:
        f_emb, df_emb = eam.embed.interp(0, rho_c)
    else:
        ecol = jnp.clip(typ, 0, ntypes - 1)
        f_emb, df_emb = eam.embed.interp(ecol, rho_c)
    df_emb = 0.5 * df_emb
    epot = epot + jnp.where(mask, f_emb, 0.0)
    dF = jnp.where(mask, df_emb, 0.0)
    dM = None
    if eeam_embed is not None:
        p_c = jnp.maximum(rho2, 1e-12)
        if ntypes == 1:
            m_v, m_g = eeam_embed.interp(0, p_c)
        else:
            m_v, m_g = eeam_embed.interp(jnp.clip(typ, 0, ntypes - 1), p_c)
        epot = epot + jnp.where(mask, m_v, 0.0)
        dM = jnp.where(mask, 0.5 * m_g, 0.0)     # dM/dp

    # ---- pass 2 ------------------------------------------------------------
    def pass2(off, self_cell):
        nonlocal F
        dr, r2, valid, tj = geometry(off, self_cell)
        ti_b, tj_b = typ[:, None], tj[None, :]
        rho_ij, g_ij, rho_ji, g_ji = rho_cols(ti_b, tj_b, r2, valid)
        dF_j = dF if self_cell else _roll_cells(dF, dims, off)
        s = dF[:, None] * g_ij + dF_j[None, :] * g_ji
        if dM is not None:
            # d(rho^2) chain: + 2 rho dM (EEAM, forces_nbl:878-882)
            dM_j = dM if self_cell else _roll_cells(dM, dims, off)
            s = s + 2.0 * (dM[:, None] * rho_ij * g_ij
                           + dM_j[None, :] * rho_ji * g_ji)
        s = jnp.where(valid, s, 0.0)
        fvec = s[:, :, None, :] * dr
        F_i = -jnp.sum(fvec, axis=1)
        F_j = jnp.sum(fvec, axis=0)
        if self_cell:
            F = F + F_i + F_j
        else:
            F = F + F_i + _roll_cells_back(F_j, dims, off)
        add_virial(s, dr, r2)

    pass2((0, 0, 0), True)
    for off in HALF_OFFSETS:
        pass2(off, False)

    return ForceResult(
        force=_from_cl(F, dims), epot=_from_cl(epot, dims),
        virial=virial, presstens=presstens,
        num_neighs=_from_cl(nneigh, dims),
        rho=_from_cl(rho, dims), embed_dF=_from_cl(dF, dims),
        eeam_p=(_from_cl(rho2, dims) if eeam_embed is not None else None))
