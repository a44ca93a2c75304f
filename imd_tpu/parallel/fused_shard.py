"""Sharded fused forces: the Pallas hot loop under a device mesh.

The production fused step (ops/fused_step.py) keeps the state cells-last
and sweeps the 14-cell half stencil with Pallas kernels.  This module
runs that same sweep SPMD over an x-decomposed `jax.sharding.Mesh`: the
flat cell axis block-partitions into contiguous x-slabs (x is the
slowest-varying axis of the C-order flatten), each device computes the
pairs whose *i*-cell it owns, and three explicit `lax.ppermute` steps
reproduce the reference's halo protocol over ICI:

    1. positions out  — fetch the right neighbor's first x-plane
       (send_cells(copy_cell), imd_comm_force_3d.c:222),
    2. rho fold back  — return the halo plane's density partials
       (send_forces(add_rho), imd_forces_nbl.c:745),
    3. dF out         — fetch the neighbor's embedding derivative
       (send_cells(copy_dF), imd_forces_nbl.c:786),
    4. force fold back (send_forces(add_forces), forces_nbl:1052).

Only ONE halo plane in the +x direction is needed: HALF_OFFSETS is the
lexicographic upper half of the 27-stencil, so every offset has dx in
{0, +1} — the actio=reactio traffic halving the reference gets from its
`AR` flag (config.h:152) falls out of the same half-stencil here.

Pair-ownership correctness: a global pair (i in cell c, j in cell
c+off) is swept exactly once, on the device owning c.  The neighbor
views are built from the REAL extended positions (owned + halo), while
the *i*-side view replaces the halo plane with a per-slot "sentinel
ladder" (distinct far-away coordinates per slot, so not even the
degenerate r2=0 self-pairs of a uniform sentinel survive) — halo cells
therefore never act as i, and their j-side partial sums are exactly
the fold-back payload.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from imd_tpu.ops.forces import HALF_OFFSETS
from imd_tpu.ops.forces_fast import _roll_cells, _wrap_shift_mask_cl
from imd_tpu.ops.forces_pallas import SENTINEL_CELL, eam_f_pass, eam_r_pass


def shardable(grid, mesh) -> bool:
    """Can the fused Pallas sweep run under this mesh?  Requires an
    x-only decomposition (the TTM-matched default, imd_ttm.c:963),
    uniform slabs, and a divisible cell grid.

    PRODUCTION CONSTRAINT (documented, deliberate): the fused hot loop
    decomposes ONLY along x.  Its one-plane halo protocol relies on the
    half stencil having dx in {0, +1}; a y/z decomposition would need
    two-sided halos (offsets with dx=+1 carry dy/dz in {-1,0,+1}) and
    roughly doubles the fold traffic.  Since the TTM FD grid, the load
    balancer, and the laser axis are all x-aligned (the reference's own
    production layout, imd_ttm.c:963), x-slabs are the intended shape;
    boxes that are short in x should swap the long axis into x at setup.
    Non-x meshes still RUN — the driver falls back to the general GSPMD
    engine, whose correctness on (1,N,1)/(2,2,2) meshes is pinned by
    tests/test_sharding.py::test_sharded_forces_and_step_non_x_meshes —
    they just don't get the fused Pallas kernels.  See docs/manual.md
    §parallel."""
    if mesh is None:
        return False
    ax = mesh.axis_names
    px = mesh.shape[ax[0]]
    if px <= 1:
        return False
    if any(mesh.shape[a] != 1 for a in ax[1:]):
        return False
    # non-uniform x slabs (LOADBALANCE xbounds) are fine: device
    # ownership is by CELL INDEX blocks, and repartition_x keeps every
    # cell at least cutoff+skin wide, so the one-plane halo stays valid
    return grid.dims[0] % px == 0


def make_sharded_eam_forces(mesh, grid, eam_run, cap: int, dtype,
                            count_neighbors: bool = False,
                            block: int = 128, engine: str = "win",
                            ntypes: int = 1):
    """Returns forces(xi, alive[, typ]) -> (F, rho, nneigh) on global
    cells-last arrays ([cap,3,NC], [cap,NC]), computed SPMD over
    ``mesh``'s x axis.

    Matches eam_kernels_cl_split's contract (masked outputs); drop-in
    for the fused step's force stage.

    ``engine`` picks the per-device sweep: "win" (default) runs the
    production in-kernel windowed views on the local extended domain
    (forces_win with owned_nc — no roll materialization, same kernels
    as the single-chip hot loop), "split" the roll-based R/F split.

    ``ntypes > 1`` (windowed engine only) shards the multi-type alloy
    sweep: per-slot types ride the same +x halo ppermute as positions,
    and the embedding derivative is per-type column-selected between
    the two passes (imd_forces_nbl.c:748-783 per-sorte F(rho)).
    """
    if not shardable(grid, mesh):
        raise ValueError("mesh must decompose x only, with dims[0] "
                         f"divisible: dims={grid.dims} mesh={mesh.shape}")
    xname = mesh.axis_names[0]
    px = int(mesh.shape[xname])
    gx, gy, gz = grid.dims
    gyz = gy * gz
    nxl = gx // px
    ncl = nxl * gyz
    ldims = (nxl + 1, gy, gz)
    lgrid = grid.replace(dims=ldims)
    pbc_x = bool(grid.box.pbc[0])

    # replicated static tables: per-offset y/z wrap shifts + validity on
    # the local extended domain (x wraps are handled by the halo planes;
    # the table's x-wrap entries land only on the sentinel i-plane)
    stab, oktab = [], []
    for off in HALF_OFFSETS:
        sh, ok = _wrap_shift_mask_cl(lgrid, off, dtype)
        stab.append(sh)
        oktab.append(ok)
    stab = jnp.stack(stab)                    # [NOF, 3, nc_ext]
    oktab = jnp.stack(oktab)                  # [NOF, nc_ext]
    hx = None
    if pbc_x:
        hx = grid.box.h[0].astype(dtype)      # x lattice vector (wrap shift)

    # sentinel ladder: distinct per-slot far coordinates so the halo
    # i-plane generates no pairs at all (uniform sentinels collide at
    # r2=0 with themselves and with SENTINEL_CELL pads)
    ladder = (5.0e6 + 1.0e3 * jnp.arange(cap, dtype=dtype))
    ladder = jnp.broadcast_to(ladder[:, None, None], (cap, 3, gyz))

    perm_gather = [(s, (s - 1) % px) for s in range(px)]   # recv from right
    perm_fold = [(s, (s + 1) % px) for s in range(px)]     # send to right

    if ntypes > 1 and engine != "win":
        raise ValueError("sharded multi-type EAM needs the windowed "
                         "engine")

    def body(xi_loc, alive_loc, typ_loc, stab, oktab, hx, ladder):
        idx = jax.lax.axis_index(xname)
        halo = jax.lax.ppermute(xi_loc[..., :gyz], xname, perm_gather)
        if pbc_x:
            wrap = (idx == px - 1).astype(dtype)
            halo = halo + wrap * hx[None, :, None]
        else:
            halo = jnp.where(idx == px - 1, SENTINEL_CELL, halo)
        xi_ext = jnp.concatenate([xi_loc, halo], axis=-1)

        def fold(a):
            part = jax.lax.ppermute(a[..., ncl:], xname, perm_fold)
            return a[..., :ncl].at[..., :gyz].add(part)

        maskf = alive_loc.astype(dtype)

        if ntypes > 1:
            # alloy sweep: types ride the halo like positions do
            from imd_tpu.ops.forces_win import eam_kernels_win_split_mt
            typ_halo = jax.lax.ppermute(typ_loc[..., :gyz], xname,
                                        perm_gather)
            typ_ext = jnp.concatenate([typ_loc, typ_halo], axis=-1)
            alive_ext = jnp.concatenate(
                [alive_loc, jnp.zeros_like(alive_loc[..., :gyz])],
                axis=-1)
            _, rho_e, nn_e = eam_kernels_win_split_mt(
                xi_ext, typ_ext, alive_ext, eam_run, lgrid, ntypes,
                count_neighbors=count_neighbors, block=block,
                passes="r", owned_nc=ncl)
            rho = fold(rho_e) * maskf
            nn = fold(nn_e) * maskf if count_neighbors \
                else jnp.zeros_like(rho)
            emb_g = None
            for p in range(ntypes):
                _, g = eam_run.embed.interp(
                    p, jnp.maximum(rho, 1e-12))
                sel = (jnp.clip(typ_loc, 0, ntypes - 1)
                       == p).astype(dtype)
                emb_g = g * sel if emb_g is None else emb_g + g * sel
            dF = 0.5 * emb_g * maskf
            dF_halo = jax.lax.ppermute(dF[..., :gyz], xname,
                                       perm_gather)
            dF_ext = jnp.concatenate([dF, dF_halo], axis=-1)
            F_e, _, _ = eam_kernels_win_split_mt(
                xi_ext, typ_ext, alive_ext, eam_run, lgrid, ntypes,
                count_neighbors=False, block=block,
                passes="f", owned_nc=ncl, dF_in=dF_ext)
            return fold(F_e) * maskf[:, None, :], rho, nn

        if engine == "win":
            # production windowed sweep on the local extended domain:
            # owned_nc deadens the halo plane on the i side in-kernel
            # (sentinel ladder), outputs come back as raw extended
            # partials for the ppermute folds
            from imd_tpu.ops.forces_win import eam_kernels_win_split
            alive_ext = jnp.concatenate(
                [alive_loc, jnp.zeros_like(alive_loc[..., :gyz])],
                axis=-1)
            _, rho_e, nn_e = eam_kernels_win_split(
                xi_ext, alive_ext, eam_run, lgrid,
                count_neighbors=count_neighbors, block=block,
                passes="r", owned_nc=ncl)
            rho = fold(rho_e) * maskf
            nn = fold(nn_e) * maskf if count_neighbors \
                else jnp.zeros_like(rho)
            _, emb_g = eam_run.embed.interp(0, rho)
            dF = 0.5 * emb_g * maskf
            dF_halo = jax.lax.ppermute(dF[..., :gyz], xname,
                                       perm_gather)
            dF_ext = jnp.concatenate([dF, dF_halo], axis=-1)
            F_e, _, _ = eam_kernels_win_split(
                xi_ext, alive_ext, eam_run, lgrid,
                count_neighbors=False, block=block,
                passes="f", owned_nc=ncl, dF_in=dF_ext)
            return fold(F_e) * maskf[:, None, :], rho, nn

        xi_i = jnp.concatenate([xi_loc, ladder], axis=-1)
        nbrs = []
        for k, off in enumerate(HALF_OFFSETS):
            xj = _roll_cells(xi_ext, ldims, off) + stab[k][None]
            xj = jnp.where(oktab[k][None, None, :], xj, SENTINEL_CELL)
            nbrs.append(xj)
        nbr = jnp.stack(nbrs)

        rho_e, nn_e = eam_r_pass(xi_i, nbr, eam_run, lgrid,
                                 count_neighbors=count_neighbors,
                                 block=block)
        rho = fold(rho_e) * maskf
        nn = fold(nn_e) * maskf if count_neighbors \
            else jnp.zeros_like(rho)
        _, emb_g = eam_run.embed.interp(0, rho)
        dF = 0.5 * emb_g * maskf
        dF_halo = jax.lax.ppermute(dF[..., :gyz], xname, perm_gather)
        dF_ext = jnp.concatenate([dF, dF_halo], axis=-1)
        F = fold(eam_f_pass(xi_i, nbr, dF_ext, eam_run, lgrid,
                            block=block))
        return F * maskf[:, None, :], rho, nn

    cspec = P(None, None, xname)   # [cap, 3, NC] — cells axis sharded
    mspec = P(None, xname)         # [cap, NC]
    rep = P()
    # check_vma=False: the inner pallas_calls don't annotate varying-ness
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(cspec, mspec, mspec, rep, rep, rep, rep),
        out_specs=(cspec, mspec, mspec), check_vma=False)

    def forces(xi, alive, typ=None):
        if typ is None:
            typ = jnp.zeros(alive.shape, jnp.int32)
        return fn(xi, alive, typ, stab, oktab,
                  hx if hx is not None else jnp.zeros(3, dtype), ladder)

    return forces
