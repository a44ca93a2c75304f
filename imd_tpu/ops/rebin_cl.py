"""Sort-free in-layout rebin for the fused cells-last hot loop.

Why: the general rebin (scene.rebin) re-sorts EVERY slot globally —
argsort over n_cells*cap ~1.2M keys plus ~10 random gathers/scatters.
Measured on v5e at 1M atoms that costs ~180 ms inside the step's
lax.cond (~420 ms standalone) — with the hot-matter rebin cadence of
one per ~4-20 steps it dominates sustained ablation throughput (the
18 M vs 94 M atom-steps/s gap in the --compress bench diagnosis).

The reference never sorts: fix_cells moves the few boundary-crossing
atoms to NEIGHBOR cells (imd_fix_cells_3d.c:61-142).  This is the
static-shape TPU analog:

  between rebins every atom moves < skin/2 < one cell edge, so an
  atom's new cell differs from its current cell by at most +-1 per
  axis.  Migrate in three axis phases (the Plimpton staging the
  reference's comm layer uses, imd_comm_force_3d.c): per phase, split
  atoms into stay / +1 / -1 by their target index along that axis,
  shift the two mover groups one cell plane (cheap contiguous rolls),
  and re-compact each cell's <=3*cap candidates into its cap slots
  with a Pallas one-hot select kernel (pure VPU, no gathers).

Atoms whose target is farther than one cell (physically impossible
between skin-triggered rebins: it would need one-step motion of a full
cell edge, >5 A/step) are DROPPED AND COUNTED into ``overflow`` —
never silently misplaced; the driver's overflow machinery surfaces it.
Capacity-overflowing cells likewise count into overflow and the host
grows/retries exactly as with the sort rebin.

Binning math (box.wrap + CellGrid.cell_ijk, including LOADBALANCE
xbounds slabs) is shared with scene.rebin, so both paths bin
bit-identically; only the within-cell slot ORDER differs (migration
is stay-first, the sort is original-index order) — no kernel cares.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imd_tpu.ops.forces_fast import _roll_cells
from imd_tpu.ops.forces_pallas import SENTINEL_DEAD


def _compact_xla(tgt, fields, cap, fills):
    """Reference compaction: scatter rows by target slot (CPU path)."""
    K, NC = tgt.shape
    lane = jnp.broadcast_to(jnp.arange(NC)[None, :], (K, NC))
    outs = []
    for f, fill in zip(fields, fills):
        out = jnp.full((cap + 1, NC), fill, f.dtype)
        out = out.at[tgt, lane].set(f, mode="drop")
        outs.append(out[:cap])
    return outs


def _compact_kernel(cap, K, nf_f, nf_i, tgt_ref, *refs):
    """One-hot slot select: out[s] = candidate row k with tgt[k] == s.

    All VPU selects over VMEM-resident rows — no gather/scatter.  ``tgt``
    is cap for dropped/invalid candidates (matches no slot).
    """
    ins = refs[:nf_f + nf_i]
    outs = refs[nf_f + nf_i:]
    t = tgt_ref[...]
    for s in range(cap):
        accs = []
        for i, ref in enumerate(ins):
            fill = -1 if i >= nf_f else 0
            accs.append(jnp.full_like(ref[0], fill))
        for k in range(K):
            sel = t[k] == s
            for i, ref in enumerate(ins):
                accs[i] = jnp.where(sel, ref[k], accs[i])
        for i, o in enumerate(outs):
            o[s, :] = accs[i]


def _compact_pallas(tgt, fields, cap, fills, block=512):
    if jax.default_backend() == "cpu":
        # the interpreter walks cap*K*13 vector ops per block (minutes
        # + GBs at toy sizes); the XLA scatter reference is exact
        return _compact_xla(tgt, fields, cap, fills)
    K, NC = tgt.shape
    pad = (-NC) % block
    if pad:
        tgt = jnp.pad(tgt, ((0, 0), (0, pad)), constant_values=cap)
        fields = [jnp.pad(f, ((0, 0), (0, pad))) for f in fields]
    ncp = NC + pad
    nblk = ncp // block
    f_f = [f for f in fields if not jnp.issubdtype(f.dtype, jnp.integer)]
    f_i = [f for f in fields if jnp.issubdtype(f.dtype, jnp.integer)]
    spec_in = pl.BlockSpec((K, block), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((cap, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    shapes = ([jax.ShapeDtypeStruct((cap, ncp), f.dtype) for f in f_f]
              + [jax.ShapeDtypeStruct((cap, ncp), f.dtype) for f in f_i])
    kern = functools.partial(_compact_kernel, cap, K, len(f_f), len(f_i))
    outs = pl.pallas_call(
        kern, grid=(nblk,),
        in_specs=[spec_in] * (1 + len(f_f) + len(f_i)),
        out_specs=[spec_out] * (len(f_f) + len(f_i)),
        out_shape=shapes,
        interpret=jax.default_backend() == "cpu",
    )(tgt, *f_f, *f_i)
    # restore caller order (floats then ints were regrouped)
    out_f = list(outs[:len(f_f)])
    out_i = list(outs[len(f_f):])
    res = []
    for f in fields:
        src = out_i if jnp.issubdtype(f.dtype, jnp.integer) else out_f
        res.append(src.pop(0)[:, :NC])
    return res


def make_rebin_cl(grid, use_pallas: bool = True):
    """Build rebin_cl(cl) -> cl' for the fused loop's skin-check rebin.

    Single-device layouts only (the mesh path keeps the Scene
    round-trip: pallas_call under GSPMD does not partition).
    """
    dims = grid.dims
    gx, gy, gz = dims
    cap = grid.capacity
    nc = gx * gy * gz
    ar = jnp.arange(nc, dtype=jnp.int32)
    cur_ax = (ar // (gy * gz), (ar // gz) % gy, ar % gz)
    pbc = tuple(int(b) for b in grid.box.pbc)

    def rebin_cl(cl):
        alive = cl.alive
        grid_l = (grid.replace(xbounds=cl.xbounds)
                  if cl.xbounds is not None else grid)
        p = jnp.moveaxis(cl.xi, 1, -1)               # [cap, NC, 3]
        wrapped = grid_l.box.wrap(p)
        ijk = grid_l.cell_ijk(wrapped)               # [cap, NC, 3]
        wrapped = jnp.moveaxis(wrapped, -1, 1)       # [cap, 3, NC]
        # fields that travel with each atom through the three phases
        fields = [wrapped[:, 0], wrapped[:, 1], wrapped[:, 2],
                  cl.mom[:, 0], cl.mom[:, 1], cl.mom[:, 2],
                  cl.mass,
                  ijk[..., 0], ijk[..., 1], ijk[..., 2],
                  cl.typ, cl.vtyp, cl.ids]
        fills = [0.0] * 7 + [-1] * 6
        overflow = cl.overflow

        active = [a for a in range(3) if dims[a] > 1]
        for axis in range(3):
            n_ax = dims[axis]
            if n_ax == 1:
                continue
            # intermediate phases keep +8 slack slots: migration along x
            # can transiently pack a cell beyond its FINAL occupancy
            # (atoms that still leave along y/z) — only the last phase's
            # occupancy is the one the sort rebin would see
            out_cap = cap if axis == active[-1] else cap + 8
            t = fields[7 + axis]
            d = t - cur_ax[axis][None, :]
            if pbc[axis] and n_ax > 2:
                half = n_ax // 2
                d = jnp.where(d > half, d - n_ax, d)
                d = jnp.where(d < -half, d + n_ax, d)
            far = alive & (jnp.abs(d) > 1)
            overflow = overflow + jnp.sum(
                far.astype(jnp.int32)).astype(jnp.int32)
            ok = alive & ~far
            stay = ok & (d == 0)
            plus = ok & (d == 1)
            minus = ok & (d == -1)

            def shift(a, sgn):
                # arriving at cell c: emigrants of cell c - sgn*e_axis
                off = [0, 0, 0]
                off[axis] = -sgn
                return _roll_cells(a, dims, tuple(off))

            valid = jnp.concatenate(
                [stay, shift(plus, +1), shift(minus, -1)], axis=0)
            cand = [jnp.concatenate([f, shift(f, +1), shift(f, -1)],
                                    axis=0) for f in fields]
            vi = valid.astype(jnp.int32)
            rank = jnp.cumsum(vi, axis=0) - vi      # exclusive
            keep = valid & (rank < out_cap)
            overflow = overflow + jnp.sum(
                (valid & ~keep).astype(jnp.int32)).astype(jnp.int32)
            tgt = jnp.where(keep, rank, out_cap).astype(jnp.int32)
            count = jnp.minimum(jnp.sum(vi, axis=0), out_cap)
            if use_pallas:
                fields = _compact_pallas(tgt, cand, out_cap, fills)
            else:
                fields = _compact_xla(tgt, cand, out_cap, fills)
            alive = (jnp.arange(out_cap, dtype=jnp.int32)[:, None]
                     < count[None])

        xi = jnp.stack(fields[0:3], axis=1)
        xi = jnp.where(alive[:, None, :], xi, SENTINEL_DEAD)
        mom = jnp.stack(fields[3:6], axis=1)
        af = alive.astype(xi.dtype)
        return cl.replace(
            xi=xi, mom=mom * af[:, None, :],
            mass=jnp.maximum(fields[6] * af, 1e-30),
            alive=alive,
            typ=jnp.where(alive, fields[10], -1),
            vtyp=jnp.where(alive, fields[11], -1),
            ids=jnp.where(alive, fields[12], -1),
            ref_xi=xi, overflow=overflow)

    return rebin_cl
