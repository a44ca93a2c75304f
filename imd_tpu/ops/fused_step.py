"""Fused cells-last MD step: the production hot loop.

Why: the Pallas engines consume cells-last [cap, (3,) NC] views, but the
Scene stores atom-major [gx,gy,gz,cap,...] arrays.  The layout transpose
(_to_cl) costs ~4 ms per call at 1M atoms on v5e and XLA re-fuses it
into each of the 13 neighbor rolls (~10 ms total, 30% of the force
time), while the same rolls on natively cells-last jit inputs cost
0.2 ms.  This module keeps the state cells-last ACROSS steps:

    CLState.xi    [cap, 3, NC]  positions (sentinel-filled dead slots)
    CLState.mom   [cap, 3, NC]
    CLState.mass  [cap, NC]
    CLState.alive [cap, NC]

The leapfrog update is elementwise (layout-agnostic); the skin check is
a reduction; only the occasional rebin round-trips through the Scene
(amortized over the ~20-40 steps between neighbor-list rebuilds,
exactly like the reference's fix_cells cadence, imd_forces_nbl.c:1062).

Single-species fast path, like the Pallas engines themselves.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from imd_tpu.ops.forces import HALF_OFFSETS
from imd_tpu.ops.forces_fast import _from_cl, _to_cl
from imd_tpu.ops.forces_pallas import (SENTINEL_DEAD, _roll_cells,
                                       _wrap_shift_mask_cl)
from imd_tpu.scene import Scene, rebin


class CLState(struct.PyTreeNode):
    xi: jnp.ndarray       # [cap, 3, NC] positions, dead slots = sentinel
    mom: jnp.ndarray      # [cap, 3, NC]
    mass: jnp.ndarray     # [cap, NC] (1e-30 where dead)
    alive: jnp.ndarray    # [cap, NC] bool
    # per-slot identity: the slot layout changes at every rebin, so these
    # MUST travel with the state — rebuilding the Scene from a template
    # captured at make_fused_step time silently drops real atoms and bins
    # phantom zeros once the layout diverges (first in-loop rebin).
    typ: jnp.ndarray      # [cap, NC] int32, -1 = dead slot
    vtyp: jnp.ndarray     # [cap, NC] int32
    ids: jnp.ndarray      # [cap, NC] int32
    ref_xi: jnp.ndarray   # positions at last rebin (skin check)
    overflow: jnp.ndarray
    # LOADBALANCE: the x-slab plane fractions are a traced leaf that
    # travels with the state (repartition_x moves them between blocks;
    # the in-loop rebin must bin under the CURRENT planes, not the ones
    # captured at make_fused_step time)
    xbounds: Optional[jnp.ndarray] = None


def scene_to_cl(scene: Scene) -> CLState:
    dims = scene.grid.dims
    typ = _to_cl(scene.type, dims)
    alive = typ >= 0
    pos = _to_cl(scene.pos, dims)
    xi = jnp.where(alive[:, None, :], pos, SENTINEL_DEAD)
    return CLState(
        xi=xi, mom=_to_cl(scene.mom, dims),
        mass=jnp.maximum(_to_cl(scene.mass, dims), 1e-30),
        alive=alive,
        typ=typ, vtyp=_to_cl(scene.vtype, dims),
        ids=_to_cl(scene.id, dims),
        ref_xi=xi, overflow=scene.overflow,
        xbounds=scene.grid.xbounds)


def cl_to_scene(cl: CLState, template: Scene) -> Scene:
    """Rebuild a Scene from the CURRENT cells-last state.

    ``template`` supplies only the grid/static metadata; every per-slot
    array (pos/mom/mass/type/vtype/id) comes from ``cl`` so the result is
    correct regardless of how many rebins reshuffled the slot layout.
    """
    dims = template.grid.dims
    alive = cl.alive
    pos = jnp.where(alive[:, None, :], cl.xi, 0.0)
    af = alive.astype(cl.mass.dtype)
    if cl.xbounds is not None:
        template = template.replace(
            grid=template.grid.replace(xbounds=cl.xbounds))
    return template.replace(
        pos=_from_cl(pos, dims), mom=_from_cl(cl.mom, dims),
        mass=_from_cl(cl.mass * af, dims),
        type=_from_cl(cl.typ, dims), vtype=_from_cl(cl.vtyp, dims),
        id=_from_cl(cl.ids, dims),
        nbl_ref_pos=_from_cl(jnp.where(alive[:, None, :], cl.ref_xi, 0.0),
                             dims),
        overflow=cl.overflow)


def make_fused_step(template: Scene, eam_run, timestep,
                    count_neighbors: bool = False,
                    block: int = 128, engine: str = "win",
                    mesh=None, nrb_state=None, ntypes: int = 1):
    """Returns (step_fn, cl0): jitted-compatible fused MD step.

    step_fn(cl) -> (cl', num_neighs_cl):  forces (Pallas, forces-only)
    + leapfrog + in-loop skin check with a lax.cond rebin round-trip.
    `eam_run` must be fastpoly (closed over).  ``engine`` selects the
    sweep variant: "win" (production default) = R/F split with
    in-kernel windowed views (forces_win; no roll materialization),
    "split" = R/F split over rolled neighbor views, "ab" = A/B split.
    ``mesh`` (x-decomposed) runs the sweep SPMD with explicit halo
    permutes (parallel/fused_shard.py); the rest of the step stays
    GSPMD-partitioned.  ``nrb_state`` weaves the non-reflecting-boundary
    momentum update into the step (nrb_forces, imd_nrb.c:792): boundary
    atoms get their momenta SET by the impedance-matching rule and skip
    the p += dt F update.
    """
    from imd_tpu.ops import forces_pallas as fp

    grid = template.grid
    dims = grid.dims
    dtype = template.pos.dtype
    cap = template.capacity
    nc = dims[0] * dims[1] * dims[2]
    dt = jnp.asarray(timestep, dtype)
    skin2 = jnp.asarray((0.5 * grid.skin) ** 2, dtype)

    sharded_forces = None
    if mesh is not None:
        from imd_tpu.parallel.fused_shard import make_sharded_eam_forces
        sharded_forces = make_sharded_eam_forces(
            mesh, grid, eam_run, cap, dtype,
            count_neighbors=count_neighbors, block=block, ntypes=ntypes)

    # static per-offset PBC shifts/validity (cells don't move)
    shifts = []
    oks = []
    for off in HALF_OFFSETS:
        sh, ok = _wrap_shift_mask_cl(grid, off, dtype)
        shifts.append(sh)
        oks.append(ok)

    def forces_cl(xi, alive, typ):
        if sharded_forces is not None:
            F, _, nn = sharded_forces(xi, alive, typ)
            return F, nn
        if ntypes > 1:
            # alloy path: type-pair column select inside the windowed
            # sweep (no roll materialization, like the single-species
            # production engine)
            from imd_tpu.ops.forces_win import eam_kernels_win_split_mt
            F, _, nn = eam_kernels_win_split_mt(
                xi, typ, alive, eam_run, grid, ntypes,
                count_neighbors=count_neighbors)
            return F, nn
        if engine == "win":
            from imd_tpu.ops.forces_win import eam_kernels_win_split
            F, _, nn = eam_kernels_win_split(
                xi, alive, eam_run, grid,
                count_neighbors=count_neighbors)
            return F, nn
        nbrs = []
        for k, off in enumerate(HALF_OFFSETS):
            xj = _roll_cells(xi, dims, off)
            xj = xj + shifts[k][None]
            xj = jnp.where(oks[k][None, None, :], xj,
                           fp.SENTINEL_CELL)
            nbrs.append(xj)
        nbr = jnp.stack(nbrs)
        if engine == "split":
            F, _, nn = fp.eam_kernels_cl_split(
                xi, nbr, alive, eam_run, grid,
                count_neighbors=count_neighbors, block=block)
        else:
            F, _, _, nn, _, _ = fp.eam_kernels_cl(
                xi, nbr, alive, eam_run, grid,
                count_neighbors=count_neighbors, block=block,
                need_energy=False)
        return F, nn

    def step(cl: CLState):
        force, nn = forces_cl(cl.xi, cl.alive, cl.typ)
        af = cl.alive.astype(dtype)
        if nrb_state is not None:
            from imd_tpu.models.nrb import nrb_forces_cl
            mom_set, bnd = nrb_forces_cl(cl.xi, cl.mom, cl.alive,
                                         cl.ids, grid.box, nrb_state)
            mom2 = jnp.where(bnd[:, None, :], mom_set,
                             mom_set + dt * force)
        else:
            mom2 = cl.mom + dt * force
        mom2 = mom2 * af[:, None, :]
        xi2 = cl.xi + dt * mom2 / cl.mass[:, None, :]
        # dead slots: keep the sentinel exactly
        xi2 = jnp.where(cl.alive[:, None, :], xi2, cl.xi)
        cl = cl.replace(xi=xi2, mom=mom2)
        # skin check (forces_nbl:1062); rebin via the Scene round-trip
        d = xi2 - cl.ref_xi
        d2 = jnp.sum(d * d, axis=1)
        need = jnp.max(jnp.where(cl.alive, d2, 0.0)) > skin2

        # sort-free migration rebin (ops/rebin_cl.py): ~20x cheaper than
        # the global-sort Scene round-trip at 1M atoms; under a mesh the
        # same 3-phase migration runs in shard_map with the +-x boundary
        # planes riding one ppermute each way (send_atoms analog)
        if mesh is None:
            from imd_tpu.ops.rebin_cl import make_rebin_cl
            do_rebin = make_rebin_cl(grid)
        else:
            from imd_tpu.ops.rebin_cl import make_rebin_cl_sharded
            do_rebin = make_rebin_cl_sharded(grid, mesh)

        cl = jax.lax.cond(need, do_rebin, lambda c: c, cl)
        return cl, nn

    return step, scene_to_cl(template)


def make_fused_ttm_step(template: Scene, eam_run, timestep, tp, eos,
                        laser_cfg, block: int = 128,
                        engine: str = "win", mesh=None, nrb_state=None,
                        tmm_params=None, vlat=None,
                        elecpress: bool = False, colrad=None,
                        fdtd_params=None, ntypes: int = 1):
    """TTM-coupled fused cells-last step (the north-star configuration).

    step(cl, tgrid, fdi, k) -> (cl', tgrid', fdi', k+1): EAM forces with
    neighbor counts (Pallas), calc_ttm on flat component views of the
    cells-last state, xi-coupled leapfrog (move_atoms_ttm,
    imd_integrate.c:581) — all without leaving the kernel layout.
    ``mesh`` (x-decomposed) shard_maps the force sweep with explicit
    halo permutes; calc_ttm and the integrator stay GSPMD (the TTM FD
    grid rides the same x axis, parallel/mesh.shard_ttm).
    ``tmm_params`` routes the laser through the Helmholtz transfer-
    matrix solver each diffusion substep (do_tmm, imd_tmm.c:193);
    ``nrb_state`` weaves the rear-boundary momentum update into the
    step (nrb_forces, imd_nrb.c:792) — together these make the fused
    loop cover the reference's full flagship build
    (eam_nve_nbl_nrb_stress_ttm_tmm_filter, manual.pdf §2).
    ``vlat`` = (VlatParams, VlatState0) appends the continuum virtual-
    lattice tail to the diffusion substeps (imd_ttm.c:41-59); the step
    then takes/returns an extra vstate carry element:
    step(cl, tgrid, fdi, vs, k).  ``elecpress`` adds the electron
    blast-pressure x-force (do_electronic_pressure, imd_ttm.c:554),
    gathered per atom on the same one-hot matmul as xi.  ``colrad``
    = (tables, step_fn[, phi_fn]) runs the collisional-radiative plasma
    kinetics inside calc_ttm (do_colrad hook, imd_ttm.c:101-103; phi_fn
    feeds the MULTIPHOTON photon flux) with a cstate
    carry element ordered BEFORE vstate:
    step(cl, tgrid, fdi[, cs][, vs], k).  ``fdtd_params`` (exclusive
    with tmm/colrad/vlat, like the driver) switches the schedule to
    calc_ttm_fdtd — the Maxwell solver as the laser source
    (imd_ttm_3D.c:110-180) — with an fstate carry element:
    step(cl, tgrid, fdi, fs, k).
    """
    if fdtd_params is not None:
        assert tmm_params is None and colrad is None and vlat is None, \
            "FDTD is exclusive with TMM/COLRAD/VLAT (driver rule)"
    from imd_tpu.models import ttm as ttm_mod
    from imd_tpu.ops import forces_pallas as fp

    grid = template.grid
    dims = grid.dims
    dtype = template.pos.dtype
    dt = jnp.asarray(timestep, dtype)
    skin2 = jnp.asarray((0.5 * grid.skin) ** 2, dtype)

    sharded_forces = None
    if mesh is not None:
        from imd_tpu.parallel.fused_shard import make_sharded_eam_forces
        sharded_forces = make_sharded_eam_forces(
            mesh, grid, eam_run, template.capacity, dtype,
            count_neighbors=True, block=block, ntypes=ntypes)

    shifts, oks = [], []
    for off in HALF_OFFSETS:
        sh, ok = _wrap_shift_mask_cl(grid, off, dtype)
        shifts.append(sh)
        oks.append(ok)

    def _core(cl: CLState, tgrid, fdi, cs, vs, k):
        if sharded_forces is not None:
            F, _, nn = sharded_forces(cl.xi, cl.alive, cl.typ)
        elif ntypes > 1:
            from imd_tpu.ops.forces_win import eam_kernels_win_split_mt
            F, _, nn = eam_kernels_win_split_mt(
                cl.xi, cl.typ, cl.alive, eam_run, grid, ntypes,
                count_neighbors=True)
        elif engine == "win":
            from imd_tpu.ops.forces_win import eam_kernels_win_split
            F, _, nn = eam_kernels_win_split(
                cl.xi, cl.alive, eam_run, grid, count_neighbors=True)
        else:
            nbrs = []
            for i, off in enumerate(HALF_OFFSETS):
                xj = _roll_cells(cl.xi, dims, off)
                xj = xj + shifts[i][None]
                xj = jnp.where(oks[i][None, None, :], xj,
                               jnp.asarray(3.0e6, dtype))
                nbrs.append(xj)
            if engine == "split":
                F, _, nn = fp.eam_kernels_cl_split(
                    cl.xi, jnp.stack(nbrs), cl.alive, eam_run, grid,
                    count_neighbors=True, block=block)
            else:
                F, _, _, nn, _, _ = fp.eam_kernels_cl(
                    cl.xi, jnp.stack(nbrs), cl.alive, eam_run, grid,
                    count_neighbors=True, block=block, need_energy=False)

        # NRB boundary momenta are SET before the TTM reductions see the
        # momenta (reference order: nrb_forces at the end of calc_forces,
        # imd_forces_nbl.c:1019-1048, then calc_ttm, then move_atoms)
        if nrb_state is not None:
            from imd_tpu.models.nrb import nrb_forces_cl
            mom_set, bnd = nrb_forces_cl(cl.xi, cl.mom, cl.alive,
                                         cl.ids, grid.box, nrb_state)
        else:
            mom_set, bnd = cl.mom, None
        x = cl.xi[:, 0, :].reshape(-1)
        mom3 = tuple(mom_set[:, c, :].reshape(-1) for c in range(3))
        massf = cl.mass.reshape(-1)
        maskf = cl.alive.reshape(-1)
        t = k.astype(dtype) * dt
        if fdtd_params is not None:
            # cs carries the FDTD field state on the fdtd schedule
            tgrid, fdi, cs = ttm_mod.calc_ttm_fdtd(
                tgrid, cs, (x, mom3, massf, maskf), tp, eos,
                fdtd_params, nn.reshape(-1), fdi, dt, t,
                first_step=(k == 0))
            vs = None
        else:
            out = ttm_mod.calc_ttm(
                tgrid, (x, mom3, massf, maskf), tp, eos,
                nn.reshape(-1), fdi, dt, t, laser_cfg=laser_cfg,
                first_step=(k == 0), tmm_params=tmm_params,
                colrad=(None if colrad is None
                        else (colrad[0], colrad[1], cs)
                        + tuple(colrad[2:3])),
                vlat=(None if vlat is None else (vlat[0], vs)))
            tgrid, fdi = out[0], out[1]
            j = 2
            if colrad is not None:
                cs = out[j]
                j += 1
            vs = out[j] if vlat is not None else None
        fdidx = ttm_mod.fd_index_from_x(x, tp)
        if elecpress:
            epf = ttm_mod.electron_pressure_force(tgrid, tp, eos)
            xi_a, vcom_a, ep_a = ttm_mod.gather_atom_coupling_flat(
                tgrid, fdidx, extra=epf)
        else:
            xi_a, vcom_a = ttm_mod.gather_atom_coupling_flat(tgrid, fdidx)
            ep_a = None
        # p += dt (F + xi m (v - vcom))  (move_atoms_ttm); NRB boundary
        # atoms keep their SET momenta (imd_integrate.c:254-259)
        af = cl.alive.astype(dtype)
        shape2 = cl.mass.shape
        mom_new = []
        for c in range(3):
            momc = mom_set[:, c, :]
            extra = (xi_a * (mom3[c] - massf * vcom_a[:, c])
                     ).reshape(shape2)
            Fc = F[:, c, :]
            if c == 0 and ep_a is not None:
                # electron blast pressure acts along x only
                # (imd_integrate.c:741-743)
                Fc = Fc - ep_a.reshape(shape2)
            upd = momc + dt * (Fc + extra)
            if bnd is not None:
                upd = jnp.where(bnd, momc, upd)
            mom_new.append(upd * af)
        mom2 = jnp.stack(mom_new, 1)
        xi2 = cl.xi + dt * mom2 / cl.mass[:, None, :]
        xi2 = jnp.where(cl.alive[:, None, :], xi2, cl.xi)
        cl = cl.replace(xi=xi2, mom=mom2)
        d = xi2 - cl.ref_xi
        d2 = jnp.sum(d * d, axis=1)
        need = jnp.max(jnp.where(cl.alive, d2, 0.0)) > skin2

        if mesh is None:
            from imd_tpu.ops.rebin_cl import make_rebin_cl
            rb = make_rebin_cl(grid)
        else:
            from imd_tpu.ops.rebin_cl import make_rebin_cl_sharded
            rb = make_rebin_cl_sharded(grid, mesh)

        def do_rebin(args):
            # the stored FD index rides the migration with its atom
            # (fdi/fdj/fdk through move_atom, types.h:327) so advection
            # fluxes survive rebin steps
            cl, fdi = args
            cl2, fdi2 = rb(cl, fdi.reshape(cl.mass.shape))
            return cl2, fdi2.reshape(fdi.shape)

        cl, fdi = jax.lax.cond(need, do_rebin, lambda a: a, (cl, fdi))
        return cl, tgrid, fdi, cs, vs, k + 1

    has_cs = colrad is not None or fdtd_params is not None
    has_vs = vlat is not None
    if not has_cs and not has_vs:
        def step(cl, tgrid, fdi, k):
            c, g, f, _, _, k2 = _core(cl, tgrid, fdi, None, None, k)
            return c, g, f, k2
    elif has_cs and not has_vs:
        def step(cl, tgrid, fdi, cs, k):
            c, g, f, cs2, _, k2 = _core(cl, tgrid, fdi, cs, None, k)
            return c, g, f, cs2, k2
    elif not has_cs and has_vs:
        def step(cl, tgrid, fdi, vs, k):
            c, g, f, _, vs2, k2 = _core(cl, tgrid, fdi, None, vs, k)
            return c, g, f, vs2, k2
    else:
        step = _core

    return step, scene_to_cl(template)


def make_filter_apply(template: Scene, filter_cfg, cutoff: float):
    """Jitted cl -> cl FILTER application for the fused hot loop.

    The FILTER cadence (filter_int, imd_filter.c:151) is far coarser
    than the step, so the driver applies it host-side at block
    boundaries: round-trip to the Scene layout, delete disconnected
    atoms outside the keep-region, rebin, return to cells-last.
    """
    from imd_tpu.models.filter import filter_atoms
    from imd_tpu.scene import rebin_with

    dims = template.grid.dims

    @jax.jit
    def apply(cl: CLState, fdi=None):
        sc = cl_to_scene(cl, template)
        sc, _ = filter_atoms(sc, filter_cfg, cutoff)
        if fdi is None:
            return scene_to_cl(rebin(sc))
        # the stored FD index travels through the deletion rebin with
        # its atom (move_atom carries fdi, types.h:327); deleted atoms'
        # slots come back -1
        cap = cl.mass.shape[0]
        fdi_sc = _from_cl(fdi.reshape(cap, -1), dims)
        sc2, ex = rebin_with(sc, {"fdi": fdi_sc})
        return scene_to_cl(sc2), _to_cl(ex["fdi"], dims).reshape(-1)

    return apply
