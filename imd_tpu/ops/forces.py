"""Short-range forces over the cell grid — the TPU-native force engine.

Replaces the reference's hottest code (imd_forces_nbl.c:295 calc_forces,
imd_forces.c:33 do_forces, imd_forces_eam2.c): instead of cell-pair lists +
Verlet neighbor lists + MPI halo exchange, each of the 27 (or 14 with
Newton's 3rd law) neighbor-cell offsets is visited by a lattice `jnp.roll`
of the whole padded cell array:

    neighbor data  = roll(cell_array, -offset)      (send_cells equivalent)
    reaction force = roll(accumulated buffer, +offset)  (send_forces equivalent)

All shapes are static, there are no gathers or scatters, and under
`shard_map` the rolls along a sharded axis become ICI `ppermute` halo
exchanges — the Plimpton scheme (imd_comm_force_3d.c) falls out for free.

Per-pair interactions use the tabulated-potential quadratic interpolation
(potaccess.h PAIR_INT2 semantics): `grad` is (1/r) dV/dr = 2 dV/dr^2 so the
force vector is ``-grad * (x_i - x_j)`` with no sqrt in the pair loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imd_tpu.models.potential import PotTable, EAMPotential
from imd_tpu.scene import Scene

# 27-stencil offsets; HALF_OFFSETS = 13 lexicographically-positive offsets
# (the AR/actio=reactio halving, config.h:157-161) + the self cell handled
# separately.
ALL_OFFSETS = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
               for k in (-1, 0, 1)]
HALF_OFFSETS = [o for o in ALL_OFFSETS if o > (0, 0, 0)]


def _neighbor_view(grid, arr, off):
    """Roll ``arr`` so cell c sees cell c+off's data at its own index."""
    ox, oy, oz = off
    shifts, axes = [], []
    for ax, o in enumerate((ox, oy, oz)):
        if o and arr.shape[ax] > 1:
            shifts.append(-o)
            axes.append(ax)
    if axes:
        arr = jnp.roll(arr, shifts, axes)
    return arr


def _wrap_shift_and_mask(grid, off, dtype):
    """Cartesian shift [gx,gy,gz,1,3] for wrapped neighbor cells + validity.

    Cells whose +off neighbor wrapped around a periodic boundary see
    positions shifted by the corresponding box vector; across a
    non-periodic boundary the neighbor is invalid.
    """
    gx, gy, gz = grid.dims
    shift_frac = []
    valid = None
    for ax, (g, o) in enumerate(zip((gx, gy, gz), off)):
        idx = jnp.arange(g, dtype=jnp.int32)
        wrap = jnp.floor_divide(idx + o, g)  # -1, 0, or +1
        shape = [1, 1, 1]
        shape[ax] = g
        wrap = wrap.reshape(shape)
        shift_frac.append(wrap.astype(dtype))
        if not grid.box.pbc[ax]:
            ok = (wrap == 0)
            valid = ok if valid is None else (valid & ok)
    # shift vector = sum_ax wrap_ax * box_vector_ax
    h = grid.box.h.astype(dtype)
    shift = (shift_frac[0][..., None] * h[0]
             + shift_frac[1][..., None] * h[1]
             + shift_frac[2][..., None] * h[2])        # [gx,gy,gz,3] broadcast
    if valid is None:
        valid = jnp.ones((gx, gy, gz), bool)
    else:
        valid = jnp.broadcast_to(valid, (gx, gy, gz))
    return shift[..., None, :], valid[..., None]


def _reverse_roll(grid, arr, off):
    """Send per-neighbor-cell accumulations back: inverse of _neighbor_view."""
    ox, oy, oz = off
    shifts, axes = [], []
    for ax, o in enumerate((ox, oy, oz)):
        if o and arr.shape[ax] > 1:
            shifts.append(o)
            axes.append(ax)
    if axes:
        arr = jnp.roll(arr, shifts, axes)
    return arr


class ForceResult(struct.PyTreeNode):
    force: jnp.ndarray        # [gx,gy,gz,cap,3]
    epot: jnp.ndarray         # [gx,gy,gz,cap] per-atom potential energy
    virial: jnp.ndarray       # scalar  sum_pairs r.f (for pressure)
    presstens: jnp.ndarray    # [6] xx yy zz yz zx xy
    num_neighs: jnp.ndarray   # [gx,gy,gz,cap] int32 (TTM local density probe)
    rho: Optional[jnp.ndarray] = None    # EAM host density
    embed_dF: Optional[jnp.ndarray] = None
    # per-atom virial tensor [gx,gy,gz,cap,6] (STRESS_TENS PRESSTENS,
    # imd_forces_nbl.c:955-975); only filled on request
    presstens_atom: Optional[jnp.ndarray] = None
    # EEAM second host density p = sum rho_h^2 (EAM_P, forces_nbl:553);
    # filled when eeam_embed is active (the 'eam_p' chkpt column)
    eeam_p: Optional[jnp.ndarray] = None


def _pair_terms(pot: PotTable, ntypes, t_i, t_j, r2, valid):
    """Tabulated pair value/grad with per-pair type columns, masked."""
    r2c = jnp.maximum(r2, 1e-12)
    if ntypes == 1:
        phi, grad = pot.interp(0, r2c)
    else:
        col = t_i * ntypes + t_j
        col = jnp.clip(col, 0, ntypes * ntypes - 1)
        phi, grad = pot.interp(col, r2c)
    phi = jnp.where(valid, phi, 0.0)
    grad = jnp.where(valid, grad, 0.0)
    return phi, grad


def compute_pair_forces(scene: Scene, pot: PotTable, ntypes: int = 1,
                        count_neighbors: bool = False,
                        neigh_r2: float = 0.0,
                        per_atom_stress: bool = False,
                        asympot: bool = False) -> ForceResult:
    """Pair-potential forces with Newton's 3rd law over the 14-offset stencil.

    Mirrors calc_forces for PAIR (imd_forces_nbl.c:419-672) including the
    per-atom TTM neighbor counting (forces_nbl:437-483) when
    ``count_neighbors`` is set.

    ``asympot`` evaluates each half-bond from its own type-ordered
    column (ASYMPOT do_forces, imd_forces_eam2.c:31-140): atom i uses
    col = t_i*nt+t_j, atom j the transposed column — forces are not
    equal-and-opposite when the table is asymmetric; the virial takes
    the mean of the two half-gradients (eam2.c:104-109).
    """
    grid = scene.grid
    dtype = scene.pos.dtype
    pos, typ = scene.pos, scene.type
    mask = scene.mask
    cap = scene.capacity
    rcut2 = jnp.asarray(grid.cutoff ** 2, dtype)
    nr2 = jnp.asarray(neigh_r2 if neigh_r2 > 0 else grid.cutoff ** 2, dtype)

    F = jnp.zeros_like(pos)
    epot = jnp.zeros(pos.shape[:-1], dtype)
    virial = jnp.zeros((), dtype)
    presstens = jnp.zeros((6,), dtype)
    nneigh = jnp.zeros(pos.shape[:-1], jnp.int32)
    pt_atom = jnp.zeros(pos.shape[:-1] + (6,), dtype)

    def pair_block(off, self_cell):
        nonlocal F, epot, virial, presstens, nneigh, pt_atom
        if self_cell:
            npos, ntyp, nmask = pos, typ, mask
            shift = jnp.zeros((1, 1, 1, 1, 3), dtype)
            cell_ok = jnp.ones(pos.shape[:3] + (1,), bool)
        else:
            npos = _neighbor_view(grid, pos, off)
            ntyp = _neighbor_view(grid, typ, off)
            nmask = _neighbor_view(grid, mask, off)
            shift, cell_ok = _wrap_shift_and_mask(grid, off, dtype)
        # dr[i,j] = x_i - (x_j + shift)
        dr = pos[..., :, None, :] - (npos[..., None, :, :] + shift[..., None, :, :])
        r2 = jnp.sum(dr * dr, axis=-1)
        valid = (mask[..., :, None] & nmask[..., None, :]
                 & cell_ok[..., None] & (r2 < rcut2))
        if self_cell:
            ii = jnp.arange(cap)
            triangle = ii[:, None] < ii[None, :]   # each in-cell pair once
            valid = valid & triangle
        phi, grad = _pair_terms(pot, ntypes, typ[..., :, None],
                                ntyp[..., None, :], r2, valid)
        if asympot and ntypes > 1:
            # j's half-bond from the transposed column (ASYMPOT)
            phi_t, grad_t = _pair_terms(pot, ntypes, ntyp[..., None, :],
                                        typ[..., :, None], r2, valid)
        else:
            phi_t, grad_t = phi, grad
        # forces: F_i -= grad*dr (sum over j); F_j += grad*dr (sum over i)
        F_i = -jnp.sum(grad[..., None] * dr, axis=-2)
        F_j = jnp.sum(grad_t[..., None] * dr, axis=-3)
        epot_i = 0.5 * jnp.sum(phi, axis=-1)
        epot_j = 0.5 * jnp.sum(phi_t, axis=-2)
        if self_cell:
            F = F + F_i + F_j
            epot = epot + epot_i + epot_j
        else:
            F = F + F_i + _reverse_roll(grid, F_j, off)
            epot = epot + epot_i + _reverse_roll(grid, epot_j, off)
        # virial and stress: sum over pairs of dr (x) f  (f = -grad dr);
        # under ASYMPOT the mean of the two half-gradients
        gv = jnp.where(valid, 0.5 * (grad + grad_t) if asympot and
                       ntypes > 1 else grad, 0.0)
        virial = virial - jnp.sum(gv * r2)
        pt = jnp.stack([
            jnp.sum(gv * dr[..., 0] * dr[..., 0]),
            jnp.sum(gv * dr[..., 1] * dr[..., 1]),
            jnp.sum(gv * dr[..., 2] * dr[..., 2]),
            jnp.sum(gv * dr[..., 1] * dr[..., 2]),
            jnp.sum(gv * dr[..., 2] * dr[..., 0]),
            jnp.sum(gv * dr[..., 0] * dr[..., 1]),
        ])
        presstens = presstens - pt
        if per_atom_stress:
            # half of each pair's d(x)f to i and to j (forces_nbl:959-975)
            comps = ((0, 0), (1, 1), (2, 2), (1, 2), (2, 0), (0, 1))
            pts = jnp.stack([gv * dr[..., a] * dr[..., b]
                             for a, b in comps], axis=-1)
            pt_i = -0.5 * jnp.sum(pts, axis=-2)
            pt_j = -0.5 * jnp.sum(pts, axis=-3)
            if self_cell:
                pt_atom = pt_atom + pt_i + pt_j
            else:
                pt_atom = pt_atom + pt_i + _reverse_roll(grid, pt_j, off)
        if count_neighbors:
            near = valid & (r2 < nr2)
            n_i = jnp.sum(near, axis=-1).astype(jnp.int32)
            n_j = jnp.sum(near, axis=-2).astype(jnp.int32)
            if self_cell:
                nneigh = nneigh + n_i + n_j
            else:
                nneigh = nneigh + n_i + _reverse_roll(grid, n_j, off)

    pair_block((0, 0, 0), True)
    for off in HALF_OFFSETS:
        pair_block(off, False)

    return ForceResult(force=F, epot=epot, virial=virial,
                       presstens=presstens, num_neighs=nneigh,
                       presstens_atom=pt_atom if per_atom_stress else None)


def compute_ordpar(scene: Scene, pot: PotTable, op_rcut, op_weight,
                   ntypes: int = 1) -> jnp.ndarray:
    """Per-atom order parameter (ORDPAR, imd_forces.c:195-198).

    POTENG's ORDPAR variant: each half pair energy contributes
    ``op_weight[col] * 0.5 * phi(r)`` to atom i only when
    ``r2 < op_rcut[col]^2`` with ``col = t_i*ntypes + t_j`` (and the
    transposed column for atom j) — the per-atom Epot column in config
    outputs then holds this weighted short-range bond count instead
    (imd_io.c:1305 ' ordpar type' header, 3283).  ``op_rcut`` and
    ``op_weight`` are flat [ntypes*ntypes] type-pair tables
    (imd_param.c:2737-2750 squares op_rcut on read).

    Computed at I/O boundaries only (the reference recomputes it every
    force call as a side effect; the total potential energy is
    accumulated separately and is unchanged, imd_forces.c:184).
    """
    grid = scene.grid
    dtype = scene.pos.dtype
    pos, typ, mask = scene.pos, scene.type, scene.mask
    cap = scene.capacity
    rcut2 = jnp.asarray(grid.cutoff ** 2, dtype)
    nt = ntypes
    op_r2 = jnp.asarray(op_rcut, dtype) ** 2
    op_w = jnp.asarray(op_weight, dtype)
    op = jnp.zeros(pos.shape[:-1], dtype)

    def block(off, self_cell):
        nonlocal op
        if self_cell:
            npos, ntyp, nmask = pos, typ, mask
            shift = jnp.zeros((1, 1, 1, 1, 3), dtype)
            cell_ok = jnp.ones(pos.shape[:3] + (1,), bool)
        else:
            npos = _neighbor_view(grid, pos, off)
            ntyp = _neighbor_view(grid, typ, off)
            nmask = _neighbor_view(grid, mask, off)
            shift, cell_ok = _wrap_shift_and_mask(grid, off, dtype)
        dr = pos[..., :, None, :] - (npos[..., None, :, :]
                                     + shift[..., None, :, :])
        r2 = jnp.sum(dr * dr, axis=-1)
        valid = (mask[..., :, None] & nmask[..., None, :]
                 & cell_ok[..., None] & (r2 < rcut2))
        if self_cell:
            ii = jnp.arange(cap)
            valid = valid & (ii[:, None] < ii[None, :])
        ti = jnp.clip(typ[..., :, None], 0, nt - 1)
        tj = jnp.clip(ntyp[..., None, :], 0, nt - 1)
        col = ti * nt + tj            # i's column; j's is the transpose
        colj = tj * nt + ti
        phi, _ = _pair_terms(pot, nt, typ[..., :, None],
                             ntyp[..., None, :], r2, valid)
        half = 0.5 * phi
        op_i = jnp.sum(jnp.where(valid & (r2 < op_r2[col]),
                                 op_w[col] * half, 0.0), axis=-1)
        op_j = jnp.sum(jnp.where(valid & (r2 < op_r2[colj]),
                                 op_w[colj] * half, 0.0), axis=-2)
        if self_cell:
            op = op + op_i + op_j
        else:
            op = op + op_i + _reverse_roll(grid, op_j, off)

    block((0, 0, 0), True)
    for off in HALF_OFFSETS:
        block(off, False)
    return op * mask.astype(dtype)


def compute_nbanz(scene: Scene, nb_rcut, ntypes: int = 1) -> jnp.ndarray:
    """Per-atom coordination number NBANZ (NNBR, imd_forces_nbl.c:509-511).

    Counts neighbors of atom i with ``r2 < nb_rcut[col]^2`` where
    ``col = t_i*ntypes + t_j`` (atom j counts with the transposed
    column).  ``nb_rcut`` is the flat [ntypes*ntypes] type-pair table
    the ``nb_rcut`` parameter fills (imd_param.c:663-667 squares it on
    read).  Like the reference's in-force-loop count, pairs beyond the
    cell-stencil reach (potential cutoff + skin) are invisible —
    nb_rcut must not exceed the force cutoff.  Computed on demand at
    I/O boundaries (the .nb writer and the n_nbr chkpt column) instead
    of every step.  Returns int32 [gx,gy,gz,cap].
    """
    grid = scene.grid
    dtype = scene.pos.dtype
    pos, typ, mask = scene.pos, scene.type, scene.mask
    cap = scene.capacity
    rcut2 = jnp.asarray(grid.cutoff ** 2, dtype)
    nt = ntypes
    nb_r2 = jnp.asarray(nb_rcut, dtype) ** 2
    nb = jnp.zeros(pos.shape[:-1], jnp.int32)

    def block(off, self_cell):
        nonlocal nb
        if self_cell:
            npos, ntyp, nmask = pos, typ, mask
            shift = jnp.zeros((1, 1, 1, 1, 3), dtype)
            cell_ok = jnp.ones(pos.shape[:3] + (1,), bool)
        else:
            npos = _neighbor_view(grid, pos, off)
            ntyp = _neighbor_view(grid, typ, off)
            nmask = _neighbor_view(grid, mask, off)
            shift, cell_ok = _wrap_shift_and_mask(grid, off, dtype)
        dr = pos[..., :, None, :] - (npos[..., None, :, :]
                                     + shift[..., None, :, :])
        r2 = jnp.sum(dr * dr, axis=-1)
        valid = (mask[..., :, None] & nmask[..., None, :]
                 & cell_ok[..., None] & (r2 < rcut2))
        if self_cell:
            ii = jnp.arange(cap)
            valid = valid & (ii[:, None] < ii[None, :])
        ti = jnp.clip(typ[..., :, None], 0, nt - 1)
        tj = jnp.clip(ntyp[..., None, :], 0, nt - 1)
        col = ti * nt + tj
        colj = tj * nt + ti
        n_i = jnp.sum(valid & (r2 < nb_r2[col]), axis=-1).astype(jnp.int32)
        n_j = jnp.sum(valid & (r2 < nb_r2[colj]), axis=-2).astype(jnp.int32)
        if self_cell:
            nb = nb + n_i + n_j
        else:
            nb = nb + n_i + _reverse_roll(grid, n_j, off)

    block((0, 0, 0), True)
    for off in HALF_OFFSETS:
        block(off, False)
    return nb * mask.astype(jnp.int32)


def compute_eam_forces(scene: Scene, eam: EAMPotential, ntypes: int = 1,
                       count_neighbors: bool = False,
                       neigh_r2: float = 0.0,
                       eeam_embed=None,
                       asympot: bool = False,
                       per_atom_stress: bool = False) -> ForceResult:
    """EAM2 forces: fused pair + rho pass, embedding, then force pass.

    Follows the 3-phase structure of the reference NBL engine
    (imd_forces_nbl.c:295): loop 1 accumulates pair energy/forces and the
    host density rho (452-671); the embedding energies F(rho) and their
    derivatives dF come from the embed table (748-783); loop 2 adds the
    density-mediated forces with dF_i + dF_j weighting (789-985).  The
    rho/dF halo steps (send_forces(add_rho)/send_cells(copy_dF)) are the
    reverse/forward rolls here.

    Column convention (ENGINE layout, see EAMPotential docstring): the
    density at an atom of type ti contributed by a neighbor of type tj
    uses rho-table column tj*ntypes+ti (source-first).  The reference
    tabulates the same quantity host-first (col = it*ntypes+jt,
    imd_forces_nbl.c:468/551); ``read_eam`` transposes reference files
    on load so this engine's indexing is correct for them.
    """
    grid = scene.grid
    dtype = scene.pos.dtype
    pos, typ, mask = scene.pos, scene.type, scene.mask
    cap = scene.capacity
    rcut2 = jnp.asarray(grid.cutoff ** 2, dtype)
    nr2 = jnp.asarray(neigh_r2 if neigh_r2 > 0 else grid.cutoff ** 2, dtype)

    F = jnp.zeros_like(pos)
    epot = jnp.zeros(pos.shape[:-1], dtype)
    virial = jnp.zeros((), dtype)
    presstens = jnp.zeros((6,), dtype)
    # per-atom pressure tensor: each pair's dr (x) f splits half to i and
    # half to j (PRESSTENS accumulation, imd_forces_nbl.c:652-667)
    pt_atom = (jnp.zeros(pos.shape[:-1] + (6,), dtype)
               if per_atom_stress else None)
    nneigh = jnp.zeros(pos.shape[:-1], jnp.int32)
    rho = jnp.zeros(pos.shape[:-1], dtype)
    # EEAM: second host function p = sum rho^2 with its own embedding M(p)
    # (EAM_DM terms of the NBL loop, imd_forces_nbl.c:878-882)
    rho2 = jnp.zeros(pos.shape[:-1], dtype)

    def views(off, self_cell):
        if self_cell:
            return (pos, typ, mask, jnp.zeros((1, 1, 1, 1, 3), dtype),
                    jnp.ones(pos.shape[:3] + (1,), bool))
        npos = _neighbor_view(grid, pos, off)
        ntyp = _neighbor_view(grid, typ, off)
        nmask = _neighbor_view(grid, mask, off)
        shift, cell_ok = _wrap_shift_and_mask(grid, off, dtype)
        return npos, ntyp, nmask, shift, cell_ok

    def geometry(off, self_cell):
        npos, ntyp, nmask, shift, cell_ok = views(off, self_cell)
        dr = pos[..., :, None, :] - (npos[..., None, :, :] + shift[..., None, :, :])
        r2 = jnp.sum(dr * dr, axis=-1)
        valid = (mask[..., :, None] & nmask[..., None, :]
                 & cell_ok[..., None] & (r2 < rcut2))
        if self_cell:
            ii = jnp.arange(cap)
            valid = valid & (ii[:, None] < ii[None, :])
        return dr, r2, valid, ntyp

    # ---- pass 1: pair forces/energy + rho -------------------------------
    def rho_cols(t_i, t_j, r2, valid):
        r2c = jnp.maximum(r2, 1e-12)
        if ntypes == 1:
            v_ij, g_ij = eam.rho.interp(0, r2c)     # density at i from j
            v_ji, g_ji = v_ij, g_ij
        else:
            col_ij = jnp.clip(t_j * ntypes + t_i, 0, ntypes * ntypes - 1)
            col_ji = jnp.clip(t_i * ntypes + t_j, 0, ntypes * ntypes - 1)
            v_ij, g_ij = eam.rho.interp(col_ij, r2c)
            v_ji, g_ji = eam.rho.interp(col_ji, r2c)
        z = jnp.zeros_like(v_ij)
        return (jnp.where(valid, v_ij, z), jnp.where(valid, g_ij, z),
                jnp.where(valid, v_ji, z), jnp.where(valid, g_ji, z))

    def pass1(off, self_cell):
        nonlocal F, epot, virial, presstens, nneigh, rho, rho2
        dr, r2, valid, ntyp = geometry(off, self_cell)
        t_i, t_j = typ[..., :, None], ntyp[..., None, :]
        phi, grad = _pair_terms(eam.pair, ntypes, t_i, t_j, r2, valid)
        if asympot and ntypes > 1:
            # ASYMPOT: j's pair half from the transposed table column
            # (do_forces, imd_forces_eam2.c:31-140)
            phi_t, grad_t = _pair_terms(eam.pair, ntypes, t_j, t_i,
                                        r2, valid)
        else:
            phi_t, grad_t = phi, grad
        rho_ij, _, rho_ji, _ = rho_cols(t_i, t_j, r2, valid)
        F_i = -jnp.sum(grad[..., None] * dr, axis=-2)
        F_j = jnp.sum(grad_t[..., None] * dr, axis=-3)
        e_i = 0.5 * jnp.sum(phi, axis=-1)
        e_j = 0.5 * jnp.sum(phi_t, axis=-2)
        r_i = jnp.sum(rho_ij, axis=-1)
        r_j = jnp.sum(rho_ji, axis=-2)
        if self_cell:
            F = F + F_i + F_j
            epot = epot + e_i + e_j
            rho = rho + r_i + r_j
        else:
            F = F + F_i + _reverse_roll(grid, F_j, off)
            epot = epot + e_i + _reverse_roll(grid, e_j, off)
            rho = rho + r_i + _reverse_roll(grid, r_j, off)
        if eeam_embed is not None:
            p_i = jnp.sum(rho_ij * rho_ij, axis=-1)
            p_j = jnp.sum(rho_ji * rho_ji, axis=-2)
            if self_cell:
                rho2 = rho2 + p_i + p_j
            else:
                rho2 = rho2 + p_i + _reverse_roll(grid, p_j, off)
        gv = jnp.where(valid, 0.5 * (grad + grad_t) if asympot
                       and ntypes > 1 else grad, 0.0)
        virial_l = -jnp.sum(gv * r2)
        nonlocal_virial(gv, dr, valid, virial_l,
                        off=None if self_cell else off)
        if count_neighbors:
            near = valid & (r2 < nr2)
            n_i = jnp.sum(near, axis=-1).astype(jnp.int32)
            n_j = jnp.sum(near, axis=-2).astype(jnp.int32)
            if self_cell:
                nneigh = nneigh + n_i + n_j
            else:
                nneigh = nneigh + n_i + _reverse_roll(grid, n_j, off)

    def nonlocal_virial(gv, dr, valid, virial_l, off=None):
        nonlocal virial, presstens, pt_atom
        virial = virial + virial_l
        pt = jnp.stack([
            jnp.sum(gv * dr[..., 0] * dr[..., 0]),
            jnp.sum(gv * dr[..., 1] * dr[..., 1]),
            jnp.sum(gv * dr[..., 2] * dr[..., 2]),
            jnp.sum(gv * dr[..., 1] * dr[..., 2]),
            jnp.sum(gv * dr[..., 2] * dr[..., 0]),
            jnp.sum(gv * dr[..., 0] * dr[..., 1]),
        ])
        presstens = presstens - pt
        if pt_atom is not None:
            pt6 = jnp.stack([
                gv * dr[..., 0] * dr[..., 0],
                gv * dr[..., 1] * dr[..., 1],
                gv * dr[..., 2] * dr[..., 2],
                gv * dr[..., 1] * dr[..., 2],
                gv * dr[..., 2] * dr[..., 0],
                gv * dr[..., 0] * dr[..., 1],
            ], axis=-1)
            pa_i = -0.5 * jnp.sum(pt6, axis=-2)
            pa_j = -0.5 * jnp.sum(pt6, axis=-3)
            if off is None:
                pt_atom = pt_atom + pa_i + pa_j
            else:
                pt_atom = pt_atom + pa_i + _reverse_roll(grid, pa_j, off)

    pass1((0, 0, 0), True)
    for off in HALF_OFFSETS:
        pass1(off, False)

    # ---- embedding: F(rho) and dF (do_embedding_energy) ------------------
    rho_c = jnp.maximum(rho, 1e-12)
    if ntypes == 1:
        f_emb, df_emb = eam.embed.interp(0, rho_c)
    else:
        ecol = jnp.clip(typ, 0, ntypes - 1)
        f_emb, df_emb = eam.embed.interp(ecol, rho_c)
    # embed.interp returns 2*dF/drho (radial-table convention); the embedding
    # table is a direct function of rho, so halve to get dF/drho.
    df_emb = 0.5 * df_emb
    fm = scene.fmask()
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

    # ---- pass 2: density-mediated forces (loop 2) ------------------------
    def pass2(off, self_cell):
        nonlocal F, virial, presstens
        dr, r2, valid, ntyp = geometry(off, self_cell)
        t_i, t_j = typ[..., :, None], ntyp[..., None, :]
        rho_ij, g_ij, rho_ji, g_ji = rho_cols(t_i, t_j, r2, valid)
        if self_cell:
            dF_j = dF
        else:
            dF_j = _neighbor_view(grid, dF, off)
        # pair force factor: dF_i * d(rho_i)/dr + dF_j * d(rho_j)/dr, with
        # grads already in (1/r) d/dr form
        s = dF[..., :, None] * g_ij + dF_j[..., None, :] * g_ji
        if dM is not None:
            # d(rho^2) chain: + 2 rho dM (EEAM, forces_nbl:878-882)
            dM_j = dM if self_cell else _neighbor_view(grid, dM, off)
            s = s + 2.0 * (dM[..., :, None] * rho_ij * g_ij
                           + dM_j[..., None, :] * rho_ji * g_ji)
        s = jnp.where(valid, s, 0.0)
        fvec = s[..., None] * dr
        F_i = -jnp.sum(fvec, axis=-2)
        F_j = jnp.sum(fvec, axis=-3)
        if self_cell:
            F = F + F_i + F_j
        else:
            F = F + F_i + _reverse_roll(grid, F_j, off)
        nonlocal_virial(s, dr, valid, -jnp.sum(s * r2),
                        off=None if self_cell else off)

    pass2((0, 0, 0), True)
    for off in HALF_OFFSETS:
        pass2(off, False)

    return ForceResult(force=F, epot=epot, virial=virial,
                       presstens=presstens, num_neighs=nneigh,
                       rho=rho, embed_dF=dF,
                       presstens_atom=pt_atom,
                       eeam_p=(rho2 if eeam_embed is not None else None))


# ---------------------------------------------------------------------------
# O(N^2) oracle (test reference; the reference validates NBL against the
# plain pair loop the same way)
# ---------------------------------------------------------------------------

def pair_forces_n2(pos, typ, mask, box, pot: PotTable, ntypes: int = 1,
                   cutoff: float = 0.0):
    """All-pairs minimum-image oracle. pos [N,3]."""
    N = pos.shape[0]
    dr = pos[:, None, :] - pos[None, :, :]
    dr = box.min_image(dr)
    r2 = jnp.sum(dr * dr, axis=-1)
    rcut2 = cutoff ** 2 if cutoff else pot.max_end
    eye = jnp.eye(N, dtype=bool)
    valid = (~eye) & mask[:, None] & mask[None, :] & (r2 < rcut2)
    phi, grad = _pair_terms(pot, ntypes, typ[:, None], typ[None, :], r2, valid)
    F = -jnp.sum(grad[..., None] * dr, axis=1)
    epot = 0.5 * jnp.sum(phi, axis=1)
    virial = -0.5 * jnp.sum(grad * r2)
    return F, epot, virial


def eam_forces_n2(pos, typ, mask, box, eam: EAMPotential, ntypes: int = 1,
                  cutoff: float = 0.0):
    """All-pairs EAM oracle."""
    N = pos.shape[0]
    dr = pos[:, None, :] - pos[None, :, :]
    dr = box.min_image(dr)
    r2 = jnp.sum(dr * dr, axis=-1)
    rcut2 = cutoff ** 2 if cutoff else eam.cutoff2
    eye = jnp.eye(N, dtype=bool)
    valid = (~eye) & mask[:, None] & mask[None, :] & (r2 < rcut2)
    r2c = jnp.maximum(r2, 1e-12)
    t_i, t_j = typ[:, None], typ[None, :]
    phi, phig = _pair_terms(eam.pair, ntypes, t_i, t_j, r2, valid)
    if ntypes == 1:
        rho_ij, rho_g_ij = eam.rho.interp(0, r2c)
    else:
        col_ij = jnp.clip(t_j * ntypes + t_i, 0, ntypes * ntypes - 1)
        rho_ij, rho_g_ij = eam.rho.interp(col_ij, r2c)
    rho_ij = jnp.where(valid, rho_ij, 0.0)
    rho_g_ij = jnp.where(valid, rho_g_ij, 0.0)
    rho = jnp.sum(rho_ij, axis=1)
    if ntypes == 1:
        f_emb, df = eam.embed.interp(0, jnp.maximum(rho, 1e-12))
    else:
        f_emb, df = eam.embed.interp(jnp.clip(typ, 0, ntypes - 1),
                                     jnp.maximum(rho, 1e-12))
    df = 0.5 * df
    df = jnp.where(mask, df, 0.0)
    s = phig + df[:, None] * rho_g_ij + df[None, :] * jnp.swapaxes(rho_g_ij, 0, 1)
    s = jnp.where(valid, s, 0.0)
    F = -jnp.sum(s[..., None] * dr, axis=1)
    epot = 0.5 * jnp.sum(phi, axis=1) + jnp.where(mask, f_emb, 0.0)
    virial = -0.5 * jnp.sum(s * r2)
    return F, epot, virial
