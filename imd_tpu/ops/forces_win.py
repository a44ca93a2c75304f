"""Windowed split EAM engine: neighbor views built INSIDE the kernel.

Why: the roll-based engines (forces_pallas.eam_kernels_cl_split)
materialize 13 rolled neighbor copies of the positions (and of dF)
with XLA before every kernel call — measured 4.3 ms at 1M atoms on
v5e, ~20% of the whole step, plus 240 MB of HBM writes the kernels
immediately re-read.  Here the kernels receive 13 *shifted 128-lane
window blocks* of one flat-padded position array via BlockSpec index
maps and assemble each neighbor view in VMEM with static unaligned
lane slices + PBC wrap selects + a streamed per-cell box-shift table.
The sweep math is identical to the split R/F engine; only the view
construction moves on-chip (~2% of the sweep's vector ops).

Layout of the padded lane axis (P = 17 blocks, Pr = 35 blocks):

    [ wrapped tail: cells NC-P..NC | cells 0..NC | wrapped head: 0..Pr ]

so a slice of the padded array at lane offset ``s`` relative to cell c
yields cell (c+s) mod NC whenever the flat index c+s runs off either
end (the x-axis PBC wrap).  Wraps *interior* to the flat index — the
z axis (period gz) and the combined y axis (period gy*gz) — are fixed
per lane by selecting a corrected slice at s∓gz / s∓gy*gz, the same
correction the combined-axis roll applies (forces_fast._roll_cells),
derived from the flat index identity
    flat(x+ox, (y+oy) mod gy, (z+oz) mod gz)
        = c + doff - wrap_z*oz*gz - wrap_y*oy*gy*gz   (|o*| <= 1).

Box shifts for wrapped neighbors (and the +3e6 sentinel push for
non-periodic invalid neighbors) ride a static [13,3,NC] table streamed
per block — identical semantics to prep_neighbors' shift/cell_ok.

The engine is forces-only (the production hot loop; observables use
the general engine at .eng intervals) and single-species, like the
roll-based split engine it replaces.  Reference: the NBL force loop
imd_forces_nbl.c:452-671; the halo views play the role of send_cells'
buffer cells (imd_comm_force_3d.c:42).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imd_tpu.ops.forces import HALF_OFFSETS
from imd_tpu.ops.forces_fast import _wrap_shift_mask_cl
from imd_tpu.ops.forces_pallas import (NOF, SENTINEL_DEAD, _assemble,
                                       _horner_g2, _horner_v, _poly_consts)

B = 128  # default lane-block size (one vreg row)

# i-side sentinel ladder for halo cells in the sharded local mode:
# distinct per-slot far coordinates, so halo lanes generate no pairs at
# all — 5e6 is disjoint from every j-side value class (real coords
# ~box, dead slots 1e6, invalid-neighbor push 3e6+box, 3e6+1e6).
LADDER0 = 5.0e6
LADDER_STEP = 1.0e3


class WinLayout:
    """Static window/slice plan for a given cell grid (host-side)."""

    def __init__(self, grid, block: int = B):
        gx, gy, gz = (int(d) for d in grid.dims)
        self.dims = (gx, gy, gz)
        gyz = gy * gz
        nc = gx * gyz
        self.nc = nc
        self.block = int(block)
        self.nblk = (nc + self.block - 1) // self.block
        self.ncp = self.nblk * self.block

        # per-offset slice plan: (doff, zcorr|None, ycorr|None, yzcorr|None)
        plans = []
        offs = set()
        for (ox, oy, oz) in HALF_OFFSETS:
            doff = ox * gyz + oy * gz + oz
            zc = doff - oz * gz if oz else None
            yc = doff - oy * gyz if oy else None
            yzc = doff - oz * gz - oy * gyz if (oy and oz) else None
            plans.append((doff, zc, yc, yzc, ox, oy, oz))
            for s in (doff, zc, yc, yzc):
                if s is not None:
                    offs.add(s)
        self.plans = plans

        # window blocks: every slice [s, s+block) touches blocks
        # floor(s/block) and floor((s+block-1)/block) relative to the
        # current block
        bb = self.block
        wset = set()
        for s in offs:
            wset.add(s // bb)
            wset.add((s + bb - 1) // bb)
        self.wblocks = sorted(wset)
        self.widx = {w: k for k, w in enumerate(self.wblocks)}

        # flat pad in whole blocks so index maps never go negative and
        # the largest slice never reads past the buffer
        self.pad_lo = -min(self.wblocks) * bb
        self.pad_hi = (max(self.wblocks) + 2) * bb

    def pad_flat(self, arr):
        """[..., NC] -> [..., pad_lo + NC + pad_hi] with wrapped copies.

        The pads tile the array as many times as needed, so grids
        smaller than the window reach (tiny tests) stay correct: a
        slice at offset s always reads cell (c+s) mod NC.
        """
        nl = -(-self.pad_lo // self.nc)
        nr = -(-self.pad_hi // self.nc)
        left = jnp.concatenate([arr] * nl, axis=-1)[..., -self.pad_lo:]
        right = jnp.concatenate([arr] * nr, axis=-1)[..., :self.pad_hi]
        return jnp.concatenate([left, arr, right], axis=-1)

    def shift_table(self, grid, dtype):
        """[13, 3, ncp] per-cell box shift (+3e6 for invalid neighbors)."""
        rows = []
        for k, off in enumerate(HALF_OFFSETS):
            shift, ok = _wrap_shift_mask_cl(grid, off, dtype)
            row = shift + jnp.where(ok, 0.0, 3.0e6).astype(dtype)[None]
            rows.append(row)
        tab = jnp.stack(rows)                       # [13, 3, nc]
        padn = self.ncp - self.nc
        if padn:
            tab = jnp.pad(tab, ((0, 0), (0, 0), (0, padn)))
        return tab


def _phase_masks(layout, i, dead_from=None):
    """Lane-phase wrap masks for block i: (z==0, z==gz-1, y==0, y==gy-1).

    ``dead_from`` overrides the i-side deadness threshold (default: the
    junk tail past nc).  The sharded local mode passes the OWNED cell
    count so the +x halo plane is dead as i (its pairs belong to the
    neighbor device) while staying live on the j side.
    """
    gx, gy, gz = layout.dims
    bb = layout.block
    c = i * bb + jax.lax.broadcasted_iota(jnp.int32, (1, bb), 1)
    # c may exceed nc (junk tail of the last block); phases of junk lanes
    # are irrelevant (their i-side slots are deadened)
    gzi = jnp.asarray(gz, jnp.int32)
    z = jax.lax.rem(c, gzi)
    y = jax.lax.rem(jax.lax.div(c, gzi), jnp.asarray(gy, jnp.int32))
    return (z == 0, z == gz - 1, y == 0, y == gy - 1,
            c >= (layout.nc if dead_from is None else dead_from))


def _view(layout, wins, comp, plan, masks):
    """Build one neighbor-view component [cap, B] from window refs."""
    doff, zc, yc, yzc, ox, oy, oz = plan
    z0, zg, y0, yg, _ = masks

    bb = layout.block

    def sl(s):
        w = s // bb
        sub = s - w * bb
        a = wins[layout.widx[w]][:, comp, :]
        if sub == 0:
            return a
        bref = wins[layout.widx[w + 1]][:, comp, :]
        return jnp.concatenate([a, bref], axis=-1)[:, sub:sub + bb]

    v = sl(doff)
    zmask = zg if oz > 0 else z0
    ymask = yg if oy > 0 else y0
    if zc is not None:
        v = jnp.where(zmask, sl(zc), v)
    if yc is not None:
        vy = sl(yc) if yzc is None else jnp.where(zmask, sl(yzc), sl(yc))
        v = jnp.where(ymask, vy, v)
    return v


def _view1(layout, wins, plan, masks):
    """Same as _view for [cap, B] (component-free) window refs."""
    doff, zc, yc, yzc, ox, oy, oz = plan
    z0, zg, y0, yg, _ = masks

    bb = layout.block

    def sl(s):
        w = s // bb
        sub = s - w * bb
        a = wins[layout.widx[w]][...]
        if sub == 0:
            return a
        bref = wins[layout.widx[w + 1]][...]
        return jnp.concatenate([a, bref], axis=-1)[:, sub:sub + bb]

    v = sl(doff)
    zmask = zg if oz > 0 else z0
    ymask = yg if oy > 0 else y0
    if zc is not None:
        v = jnp.where(zmask, sl(zc), v)
    if yc is not None:
        vy = sl(yc) if yzc is None else jnp.where(zmask, sl(yzc), sl(yc))
        v = jnp.where(ymask, vy, v)
    return v


def eam_kernels_win_split(xi, mask, eam, grid,
                          count_neighbors: bool = False,
                          neigh_r2: float = 0.0, block: int = B,
                          passes: str = "rf",
                          owned_nc: int | None = None, dF_in=None):
    """Forces-only split EAM on in-kernel windowed neighbor views.

    ``xi`` [cap, 3, NC] sentinel-filled cells-last positions (dead slots
    pushed to SENTINEL_DEAD, as prep_neighbors does), ``mask`` [cap, NC].
    Returns cells-last (F [cap,3,NC], rho [cap,NC], nneigh [cap,NC]) —
    the same contract as eam_kernels_cl_split.

    Sharded local mode (parallel/fused_shard): ``owned_nc`` marks cells
    past it (the +x halo plane of the device-local extended domain) as
    dead on the *i* side — replaced in-kernel by the per-slot sentinel
    ladder, so every global pair is swept exactly once, on the device
    owning its i-cell — while the j side keeps their real (halo)
    positions.  In this mode the outputs are RAW extended partial sums
    (no alive-mask multiply): the caller folds the halo tail back over
    ICI, then masks.  ``passes`` then runs the two kernels separately
    around the rho/dF halo exchanges: "r" = host-density pass only,
    "f" with ``dF_in`` (the halo-extended embedding derivative) = force
    pass only.
    """
    layout = WinLayout(grid, block=block)
    dims = grid.dims
    dtype = xi.dtype
    cap = xi.shape[0]
    nc = layout.nc
    nblk, ncp = layout.nblk, layout.ncp

    rcut2 = float(grid.cutoff) ** 2
    nr2 = float(neigh_r2 if neigh_r2 > 0 else rcut2)
    pair_c = _poly_consts(eam.pair)
    rho_c = _poly_consts(eam.rho)
    interp = jax.default_backend() == "cpu"

    xp = layout.pad_flat(xi)                       # [cap, 3, L]
    stab = layout.shift_table(grid, dtype)         # [13, 3, ncp]
    nw = len(layout.wblocks)
    # base window-block offset in units of the CONFIGURED block size
    # (using the global default B here broke every non-128 block choice:
    # the window index maps pointed at the wrong cells)
    blk0 = layout.pad_lo // layout.block

    def tri_mask(cap):
        ti = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 0)
        tj = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 1)
        return ti < tj

    def build_xj(wins, sref, m, masks):
        plan = layout.plans[m]
        xj = [_view(layout, wins, c, plan, masks) + sref[m, c, :][None]
              for c in range(3)]
        return xj

    def xi_self(wins, masks):
        dead = masks[4]
        w0 = layout.widx[0]
        if owned_nc is None:
            return [jnp.where(dead, SENTINEL_DEAD, wins[w0][:, c, :])
                    for c in range(3)]
        # local mode: halo/junk i-lanes get the per-slot ladder
        lad = LADDER0 + LADDER_STEP * jax.lax.broadcasted_iota(
            dtype, (cap, layout.block), 0)
        return [jnp.where(dead, lad, wins[w0][:, c, :])
                for c in range(3)]

    # ---------------- kernel R: host density (+ neighbor count) ----------
    def sweep_r(xi3, xj3, tri):
        """Per-pair host-density (+ neighbor) terms [cap, cap, B].

        Returns the RAW pair grids; the caller accumulates them across
        all 14 sweeps and does ONE sublane reduction per block — the
        per-sweep jnp.sum over the sublane axis (axis 1) was measured
        at ~45% of the whole kernel on v5e (each reduction packs 16
        one-sublane rows back into a [cap, B] tile = a relayout), while
        accumulating [cap, cap, B] grids costs one vector add per pair.
        The j-side sums (axis 0, across the unrolled dim) are cheap and
        stay per-offset.
        """
        dx = xi3[0][:, None, :] - xj3[0][None, :, :]
        dy = xi3[1][:, None, :] - xj3[1][None, :, :]
        dz = xi3[2][:, None, :] - xj3[2][None, :, :]
        r2 = dx * dx + dy * dy + dz * dz
        inside = r2 < rcut2
        if tri is not None:
            inside = inside & tri
        insf = inside.astype(dtype)
        out = {"rho": _horner_v(r2, rho_c) * insf}
        if count_neighbors:
            out["nn"] = (insf if nr2 >= rcut2
                         else insf * (r2 < nr2).astype(dtype))
        return out

    keys_r = ["rho"] + (["nn"] if count_neighbors else [])
    nkr = len(keys_r)

    def kern_r(occ_ref, *refs):
        wins, rest = refs[:nw], refs[nw:]
        sref = rest[0]
        iref, jref = rest[1:1 + nkr], rest[1 + nkr:]
        i = pl.program_id(0)

        # vacuum skip: a block whose cells hold no atoms contributes
        # nothing on either the i or the j side — ablation boxes are
        # ~50% vacuum and the flat cell order is x-major, so empty
        # blocks are contiguous and whole sweeps vanish
        @pl.when(occ_ref[i] == 0)
        def _zero():
            for k in range(nkr):
                iref[k][...] = jnp.zeros((cap, bb), dtype)
                jref[k][...] = jnp.zeros((NOF, cap, bb), dtype)

        @pl.when(occ_ref[i] > 0)
        def _body():
            masks = _phase_masks(layout, i, dead_from=owned_nc)
            xi3 = xi_self(wins, masks)
            o = sweep_r(xi3, xi3, tri_mask(cap))
            acc3 = {k: o[k] for k in keys_r}
            jself = {k: jnp.sum(o[k], 0) for k in keys_r}
            for m in range(NOF):
                o = sweep_r(xi3, build_xj(wins, sref, m, masks), None)
                for k in keys_r:
                    acc3[k] += o[k]
                    jref[keys_r.index(k)][m] = jnp.sum(o[k], 0)
            for k, name in enumerate(keys_r):
                iref[k][...] = jnp.sum(acc3[name], 1) + jself[name]

    bb = layout.block
    # per-block alive-atom counts for the vacuum skip
    # dtype=int32: under x64 jnp.sum promotes int32 to int64, which the
    # int32 scatter target will reject in future JAX releases
    maskp = jnp.zeros((ncp,), jnp.int32).at[:nc].set(
        jnp.sum(mask.astype(jnp.int32), axis=0, dtype=jnp.int32))
    occ = jnp.sum(maskp.reshape(nblk, bb), axis=1)
    spec_occ = pl.BlockSpec(memory_space=pltpu.SMEM)
    spec_w = [pl.BlockSpec((cap, 3, bb),
                           functools.partial(
                               lambda i, w: (0, 0, i + blk0 + w), w=w),
                           memory_space=pltpu.VMEM)
              for w in layout.wblocks]
    spec_s = pl.BlockSpec((NOF, 3, bb), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((cap, bb), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec_oj = pl.BlockSpec((NOF, cap, bb), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((cap, ncp), dtype)
    shpj = jax.ShapeDtypeStruct((NOF, cap, ncp), dtype)

    maskf = mask.astype(dtype)
    if "r" in passes:
        outs = pl.pallas_call(
            kern_r, grid=(nblk,),
            in_specs=[spec_occ] + spec_w + [spec_s],
            out_specs=[spec_o] * nkr + [spec_oj] * nkr,
            out_shape=[shp] * nkr + [shpj] * nkr,
            interpret=interp,
        )(occ, *([xp] * nw), stab)
        outs = [o[..., :nc] for o in outs]
        acc = {name: _assemble(dims, outs[k], outs[nkr + k])
               for k, name in enumerate(keys_r)}
        rho_t = acc["rho"]
        nneigh = acc["nn"] if count_neighbors else jnp.zeros_like(rho_t)
        if owned_nc is None:
            rho_t, nneigh = rho_t * maskf, nneigh * maskf
        if passes == "r":      # R pass only (profiling / sharded stage)
            return jnp.zeros_like(xi), rho_t, nneigh
    else:
        rho_t = nneigh = jnp.zeros((cap, nc), dtype)

    # embedding derivative (XLA elementwise), then windowed dF views;
    # the sharded caller injects the halo-extended dF instead (the rho
    # fold + copy_dF halo exchanges happen between the two passes)
    if dF_in is None:
        _, emb_g = eam.embed.interp(0, rho_t)
        dF = 0.5 * emb_g * maskf
    else:
        dF = dF_in
    dFp = layout.pad_flat(dF)                      # [cap, L]

    # ---------------- kernel F: combined pair+embedding forces -----------
    def sweep_f(xi3, xj3, tri, dfi, dfj):
        """Per-pair force components gdx/gdy/gdz [cap, cap, B].

        Raw pair grids, accumulated by the caller across all 14 sweeps
        with ONE final sublane reduction per block (see sweep_r).
        """
        dx = xi3[0][:, None, :] - xj3[0][None, :, :]
        dy = xi3[1][:, None, :] - xj3[1][None, :, :]
        dz = xi3[2][:, None, :] - xj3[2][None, :, :]
        r2 = dx * dx + dy * dy + dz * dz
        inside = r2 < rcut2
        if tri is not None:
            inside = inside & tri
        insf = inside.astype(dtype)
        pg, rg = _horner_g2(r2, pair_c, rho_c)
        grad = (pg + (dfi[:, None, :] + dfj[None, :, :]) * rg) * insf
        # single product per component (don't rely on Mosaic CSE for
        # the repeated grad*dx inside the two directional sums)
        return grad * dx, grad * dy, grad * dz

    def kern_f(occ_ref, *refs):
        wins, rest = refs[:nw], refs[nw:]
        dwins = rest[:nw]
        sref = rest[nw]
        fx, fy, fz, fjx, fjy, fjz = rest[nw + 1:]
        i = pl.program_id(0)

        @pl.when(occ_ref[i] == 0)
        def _zero():
            for r in (fx, fy, fz):
                r[...] = jnp.zeros((cap, bb), dtype)
            for r in (fjx, fjy, fjz):
                r[...] = jnp.zeros((NOF, cap, bb), dtype)

        @pl.when(occ_ref[i] > 0)
        def _body():
            masks = _phase_masks(layout, i, dead_from=owned_nc)
            xi3 = xi_self(wins, masks)
            dfi = dwins[layout.widx[0]][...]
            gdx, gdy, gdz = sweep_f(xi3, xi3, tri_mask(cap), dfi, dfi)
            ax, ay, az = gdx, gdy, gdz
            jx = jnp.sum(gdx, 0)
            jy = jnp.sum(gdy, 0)
            jz = jnp.sum(gdz, 0)
            for m in range(NOF):
                dfj = _view1(layout, dwins, layout.plans[m], masks)
                gdx, gdy, gdz = sweep_f(
                    xi3, build_xj(wins, sref, m, masks), None, dfi, dfj)
                ax, ay, az = ax + gdx, ay + gdy, az + gdz
                fjx[m] = jnp.sum(gdx, 0)
                fjy[m] = jnp.sum(gdy, 0)
                fjz[m] = jnp.sum(gdz, 0)
            fx[...] = jx - jnp.sum(ax, 1)
            fy[...] = jy - jnp.sum(ay, 1)
            fz[...] = jz - jnp.sum(az, 1)

    spec_dw = [pl.BlockSpec((cap, bb),
                            functools.partial(
                                lambda i, w: (0, i + blk0 + w), w=w),
                            memory_space=pltpu.VMEM)
               for w in layout.wblocks]

    outs2 = pl.pallas_call(
        kern_f, grid=(nblk,),
        in_specs=[spec_occ] + spec_w + spec_dw + [spec_s],
        out_specs=[spec_o] * 3 + [spec_oj] * 3,
        out_shape=[shp] * 3 + [shpj] * 3,
        interpret=interp,
    )(occ, *([xp] * nw), *([dFp] * nw), stab)
    outs2 = [o[..., :nc] for o in outs2]
    fx = _assemble(dims, outs2[0], outs2[3])
    fy = _assemble(dims, outs2[1], outs2[4])
    fz = _assemble(dims, outs2[2], outs2[5])
    F = jnp.stack([fx, fy, fz], axis=1)
    if owned_nc is None:
        F = F * maskf[:, None, :]
    return F, rho_t, nneigh


def eam_kernels_win_split_mt(xi, typ, mask, eam, grid, ntypes: int,
                             count_neighbors: bool = False,
                             neigh_r2: float = 0.0, block: int = B,
                             passes: str = "rf",
                             owned_nc: int | None = None, dF_in=None):
    """Multi-type windowed split EAM (alloys without roll
    materialization).

    Same in-kernel window machinery as eam_kernels_win_split; the
    type-pair table columns are selected by one-hot weights exactly
    like the roll-based eam_kernels_cl_mt (pair col = ti*nt+tj, host
    densities rho_i += col(tj,ti) / rho_j += col(ti,tj) in the engine's
    source-first rho layout; the reference's host-first equivalent is
    imd_forces_nbl.c:468-470/843-872).  The per-slot types ride the
    same streamed window blocks as the dF views.  Returns cells-last
    (F [cap,3,NC], rho [cap,NC], nneigh [cap,NC]).

    ``owned_nc``/``passes``/``dF_in`` implement the sharded local mode
    exactly as in eam_kernels_win_split (raw extended outputs; the
    caller folds halos and does the per-type embedding select between
    the two passes).
    """
    from imd_tpu.ops.forces_pallas import (_mt_axes, _mt_pair_eval,
                                           _mt_rho_eval, mt_structure)

    nt = ntypes
    layout = WinLayout(grid, block=block)
    dims = grid.dims
    dtype = xi.dtype
    cap = xi.shape[0]
    nc = layout.nc
    nblk, ncp = layout.nblk, layout.ncp

    rcut2 = float(grid.cutoff) ** 2
    nr2 = float(neigh_r2 if neigh_r2 > 0 else rcut2)
    pair_cs = [_poly_consts(eam.pair, c) for c in range(nt * nt)]
    rho_cs = [_poly_consts(eam.rho, c) for c in range(nt * nt)]
    interp = jax.default_backend() == "cpu"

    xp = layout.pad_flat(xi)                       # [cap, 3, L]
    tf = jnp.clip(typ, 0, nt - 1).astype(dtype)    # dead slots -> col 0
    tfp = layout.pad_flat(tf)                      # [cap, L]
    stab = layout.shift_table(grid, dtype)         # [13, 3, ncp]
    nw = len(layout.wblocks)
    blk0 = layout.pad_lo // layout.block
    bb = layout.block

    def tri_mask(cap):
        ti = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 0)
        tj = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 1)
        return ti < tj

    def build_xj(wins, sref, m, masks):
        plan = layout.plans[m]
        return [_view(layout, wins, c, plan, masks) + sref[m, c, :][None]
                for c in range(3)]

    def xi_self(wins, masks):
        dead = masks[4]
        w0 = layout.widx[0]
        if owned_nc is None:
            return [jnp.where(dead, SENTINEL_DEAD, wins[w0][:, c, :])
                    for c in range(3)]
        lad = LADDER0 + LADDER_STEP * jax.lax.broadcasted_iota(
            dtype, (cap, layout.block), 0)
        return [jnp.where(dead, lad, wins[w0][:, c, :])
                for c in range(3)]

    rho_src, pair_sym = mt_structure(pair_cs, rho_cs, nt)

    # ---------------- kernel R: host density (+ neighbor count) ----------
    def sweep_r(xi3, ti_f, xj3, tj_f, tri):
        dx = xi3[0][:, None, :] - xj3[0][None, :, :]
        dy = xi3[1][:, None, :] - xj3[1][None, :, :]
        dz = xi3[2][:, None, :] - xj3[2][None, :, :]
        r2 = dx * dx + dy * dy + dz * dz
        inside = r2 < rcut2
        if tri is not None:
            inside = inside & tri
        insf = inside.astype(dtype)
        wi, wj = _mt_axes(ti_f, tj_f, nt)
        rv_ij, rv_ji = _mt_rho_eval(r2, rho_cs, wi, wj, nt, "v", rho_src)
        rv_ij = rv_ij * insf
        rv_ji = rv_ji * insf
        out = {"rho_i": jnp.sum(rv_ij, 1), "rho_j": jnp.sum(rv_ji, 0)}
        if count_neighbors:
            near = (insf if nr2 >= rcut2
                    else insf * (r2 < nr2).astype(dtype))
            out["nn_i"] = jnp.sum(near, 1)
            out["nn_j"] = jnp.sum(near, 0)
        return out

    keys_r = ["rho"] + (["nn"] if count_neighbors else [])
    nkr = len(keys_r)

    def kern_r(occ_ref, *refs):
        wins, rest = refs[:nw], refs[nw:]
        twins = rest[:nw]
        sref = rest[nw]
        iref, jref = rest[nw + 1:nw + 1 + nkr], rest[nw + 1 + nkr:]
        i = pl.program_id(0)

        @pl.when(occ_ref[i] == 0)
        def _zero():
            for k in range(nkr):
                iref[k][...] = jnp.zeros((cap, bb), dtype)
                jref[k][...] = jnp.zeros((NOF, cap, bb), dtype)

        @pl.when(occ_ref[i] > 0)
        def _body():
            masks = _phase_masks(layout, i, dead_from=owned_nc)
            xi3 = xi_self(wins, masks)
            ti_f = twins[layout.widx[0]][...]
            o = sweep_r(xi3, ti_f, xi3, ti_f, tri_mask(cap))
            for k, name in enumerate(keys_r):
                iref[k][...] = o[name + "_i"] + o[name + "_j"]
            for m in range(NOF):
                tj_f = _view1(layout, twins, layout.plans[m], masks)
                o = sweep_r(xi3, ti_f, build_xj(wins, sref, m, masks),
                            tj_f, None)
                for k, name in enumerate(keys_r):
                    iref[k][...] += o[name + "_i"]
                    jref[k][m] = o[name + "_j"]

    # dtype=int32: under x64 jnp.sum promotes int32 to int64, which the
    # int32 scatter target will reject in future JAX releases
    maskp = jnp.zeros((ncp,), jnp.int32).at[:nc].set(
        jnp.sum(mask.astype(jnp.int32), axis=0, dtype=jnp.int32))
    occ = jnp.sum(maskp.reshape(nblk, bb), axis=1)
    spec_occ = pl.BlockSpec(memory_space=pltpu.SMEM)
    spec_w = [pl.BlockSpec((cap, 3, bb),
                           functools.partial(
                               lambda i, w: (0, 0, i + blk0 + w), w=w),
                           memory_space=pltpu.VMEM)
              for w in layout.wblocks]
    spec_dw = [pl.BlockSpec((cap, bb),
                            functools.partial(
                                lambda i, w: (0, i + blk0 + w), w=w),
                            memory_space=pltpu.VMEM)
               for w in layout.wblocks]
    spec_s = pl.BlockSpec((NOF, 3, bb), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((cap, bb), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec_oj = pl.BlockSpec((NOF, cap, bb), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((cap, ncp), dtype)
    shpj = jax.ShapeDtypeStruct((NOF, cap, ncp), dtype)

    maskf = mask.astype(dtype)
    if "r" in passes:
        outs = pl.pallas_call(
            kern_r, grid=(nblk,),
            in_specs=[spec_occ] + spec_w + spec_dw + [spec_s],
            out_specs=[spec_o] * nkr + [spec_oj] * nkr,
            out_shape=[shp] * nkr + [shpj] * nkr,
            interpret=interp,
        )(occ, *([xp] * nw), *([tfp] * nw), stab)
        outs = [o[..., :nc] for o in outs]
        acc = {name: _assemble(dims, outs[k], outs[nkr + k])
               for k, name in enumerate(keys_r)}
        rho_t = acc["rho"]
        nneigh = acc["nn"] if count_neighbors else jnp.zeros_like(rho_t)
        if owned_nc is None:
            rho_t, nneigh = rho_t * maskf, nneigh * maskf
        if passes == "r":      # R pass only (sharded stage)
            return jnp.zeros_like(xi), rho_t, nneigh
    else:
        rho_t = nneigh = jnp.zeros((cap, nc), dtype)

    # embedding derivative: per-type column select (XLA elementwise);
    # the sharded caller injects the halo-extended dF instead
    if dF_in is None:
        emb_g = None
        for p in range(nt):
            _, g = eam.embed.interp(p, jnp.maximum(rho_t, 1e-12))
            sel = (jnp.clip(typ, 0, nt - 1) == p).astype(dtype)
            emb_g = g * sel if emb_g is None else emb_g + g * sel
        dF = 0.5 * emb_g * maskf
    else:
        dF = dF_in
    dFp = layout.pad_flat(dF)

    # ---------------- kernel F: combined pair+embedding forces -----------
    def sweep_f(xi3, ti_f, xj3, tj_f, tri, dfi, dfj):
        dx = xi3[0][:, None, :] - xj3[0][None, :, :]
        dy = xi3[1][:, None, :] - xj3[1][None, :, :]
        dz = xi3[2][:, None, :] - xj3[2][None, :, :]
        r2 = dx * dx + dy * dy + dz * dz
        inside = r2 < rcut2
        if tri is not None:
            inside = inside & tri
        insf = inside.astype(dtype)
        wi, wj = _mt_axes(ti_f, tj_f, nt)
        pg = _mt_pair_eval(r2, pair_cs, wi, wj, nt, "g", pair_sym)
        g_ij, g_ji = _mt_rho_eval(r2, rho_cs, wi, wj, nt, "g", rho_src)
        grad = (pg + dfi[:, None, :] * g_ij
                + dfj[None, :, :] * g_ji) * insf
        gdx, gdy, gdz = grad * dx, grad * dy, grad * dz
        return {"fx_i": -jnp.sum(gdx, 1),
                "fy_i": -jnp.sum(gdy, 1),
                "fz_i": -jnp.sum(gdz, 1),
                "fx_j": jnp.sum(gdx, 0),
                "fy_j": jnp.sum(gdy, 0),
                "fz_j": jnp.sum(gdz, 0)}

    def kern_f(occ_ref, *refs):
        wins, rest = refs[:nw], refs[nw:]
        twins = rest[:nw]
        dwins = rest[nw:2 * nw]
        sref = rest[2 * nw]
        fx, fy, fz, fjx, fjy, fjz = rest[2 * nw + 1:]
        i = pl.program_id(0)

        @pl.when(occ_ref[i] == 0)
        def _zero():
            for r in (fx, fy, fz):
                r[...] = jnp.zeros((cap, bb), dtype)
            for r in (fjx, fjy, fjz):
                r[...] = jnp.zeros((NOF, cap, bb), dtype)

        @pl.when(occ_ref[i] > 0)
        def _body():
            masks = _phase_masks(layout, i, dead_from=owned_nc)
            xi3 = xi_self(wins, masks)
            ti_f = twins[layout.widx[0]][...]
            dfi = dwins[layout.widx[0]][...]
            o = sweep_f(xi3, ti_f, xi3, ti_f, tri_mask(cap), dfi, dfi)
            fx[...] = o["fx_i"] + o["fx_j"]
            fy[...] = o["fy_i"] + o["fy_j"]
            fz[...] = o["fz_i"] + o["fz_j"]
            for m in range(NOF):
                tj_f = _view1(layout, twins, layout.plans[m], masks)
                dfj = _view1(layout, dwins, layout.plans[m], masks)
                o = sweep_f(xi3, ti_f, build_xj(wins, sref, m, masks),
                            tj_f, None, dfi, dfj)
                fx[...] += o["fx_i"]
                fy[...] += o["fy_i"]
                fz[...] += o["fz_i"]
                fjx[m] = o["fx_j"]
                fjy[m] = o["fy_j"]
                fjz[m] = o["fz_j"]

    outs2 = pl.pallas_call(
        kern_f, grid=(nblk,),
        in_specs=[spec_occ] + spec_w + spec_dw + spec_dw + [spec_s],
        out_specs=[spec_o] * 3 + [spec_oj] * 3,
        out_shape=[shp] * 3 + [shpj] * 3,
        interpret=interp,
    )(occ, *([xp] * nw), *([tfp] * nw), *([dFp] * nw), stab)
    outs2 = [o[..., :nc] for o in outs2]
    fx = _assemble(dims, outs2[0], outs2[3])
    fy = _assemble(dims, outs2[1], outs2[4])
    fz = _assemble(dims, outs2[2], outs2[5])
    F = jnp.stack([fx, fy, fz], axis=1)
    if owned_nc is None:
        F = F * maskf[:, None, :]
    return F, rho_t, nneigh
