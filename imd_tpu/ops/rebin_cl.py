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

Sharded variant: ``make_rebin_cl_sharded`` runs the identical 3-phase
migration under an x-decomposed mesh — the reference's staged
`send_atoms` (imd_fix_cells_3d.c:311-436) with the boundary planes'
emigrants riding one `lax.ppermute` each way over ICI.
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
    is cap for dropped/invalid candidates (matches no slot).  Loop
    structure: candidates OUTER, all cap destination slots vectorized
    in [cap, block] accumulators — one iota compare + nf selects on
    well-shaped (cap x block) tiles per candidate, K iterations total.
    (The s-outer/k-inner variant emits cap*K scalar-row [1, block]
    selects — measured 48 ms/rebin at 1M atoms vs this layout; a
    stacked-field [K, nf, block] variant paid the stack relayout and
    was slower still.)
    """
    ins = refs[:nf_f + nf_i]
    outs = refs[nf_f + nf_i:]
    t = tgt_ref[...]
    block = t.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (cap, block), 0)
    accs = []
    for i in range(nf_f + nf_i):
        fill = -1 if i >= nf_f else 0
        accs.append(jnp.full((cap, block), fill, ins[i].dtype))
    for k in range(K):
        m = t[k][None, :] == iota                  # [cap, block]
        for i, ref in enumerate(ins):
            accs[i] = jnp.where(m, ref[k][None, :], accs[i])
    for i, o in enumerate(outs):
        o[...] = accs[i]


def _compact_pallas(tgt, fields, cap, fills, block=512,
                    force_interpret=False):
    if jax.default_backend() == "cpu" and not force_interpret:
        # the interpreter walks cap*K vector ops per block (slow at
        # scale); the XLA scatter reference is exact.  force_interpret
        # runs the real kernel through the interpreter anyway — the
        # CPU-side regression hook for the kernel logic itself
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
        interpret=jax.default_backend() == "cpu" or force_interpret,
    )(tgt, *f_f, *f_i)
    # restore caller order (floats then ints were regrouped)
    out_f = list(outs[:len(f_f)])
    out_i = list(outs[len(f_f):])
    res = []
    for f in fields:
        src = out_i if jnp.issubdtype(f.dtype, jnp.integer) else out_f
        res.append(src.pop(0)[:, :NC])
    return res


def _bin_fields(xi, mom, mass, typ, vtyp, ids, xbounds, grid):
    """Wrap positions, bin to (global) ijk, pack the 13 travel fields.

    COMPONENT form on the cells-last layout: the box transforms run as
    per-axis VPU FMAs over [cap, NC] planes instead of matmuls over a
    transposed [cap, NC, 3] — the two `moveaxis` minor-dim relayouts
    cost ~26 ms/rebin at 1M atoms (the binning math itself is <1 ms),
    and elementwise f32 FMAs don't need the HIGHEST-precision matmul
    workaround.  Semantics mirror box.wrap + cell_ijk exactly: frac ->
    wrap periodic axes -> cartesian -> re-derive frac -> floor to ijk
    (the cartesian round trip is what scene.rebin's path does too).
    """
    grid_l = grid.replace(xbounds=xbounds) if xbounds is not None else grid
    box = grid_l.box
    dt = xi.dtype
    inv = box.inv_h.astype(dt)
    h = box.h.astype(dt)
    x = (xi[:, 0], xi[:, 1], xi[:, 2])           # [cap, NC] each

    def mat3(v, m):
        return [v[0] * m[0, c] + v[1] * m[1, c] + v[2] * m[2, c]
                for c in range(3)]

    frac = mat3(x, inv)
    for c in range(3):
        if box.pbc[c]:
            frac[c] = frac[c] - jnp.floor(frac[c])
    wrapped = mat3(frac, h)
    frac2 = mat3(wrapped, inv)
    dims = grid_l.dims
    ijk = [jnp.clip(jnp.floor(frac2[c] * dims[c]).astype(jnp.int32),
                    0, dims[c] - 1) for c in range(3)]
    if grid_l.xbounds is not None:
        ix = jnp.searchsorted(grid_l.xbounds.astype(dt), frac2[0],
                              side="right") - 1
        ijk[0] = jnp.clip(ix.astype(jnp.int32), 0, dims[0] - 1)
    fields = [wrapped[0], wrapped[1], wrapped[2],
              mom[:, 0], mom[:, 1], mom[:, 2],
              mass,
              ijk[0], ijk[1], ijk[2],
              typ, vtyp, ids]
    fills = [0.0] * 7 + [-1] * 6
    return fields, fills


def _run_phase(fields, fills, alive, overflow, axis, cur, n_ax, pbc_ax,
               shift, out_cap, use_pallas, psum_axis=None):
    """One +-1-cell migration phase along ``axis``.

    ``cur`` is the per-cell coordinate along the axis (GLOBAL index for
    a sharded x phase); ``shift(a, sgn)`` realizes result[c] =
    a[c - sgn*e_axis] (a cell-plane roll, or a ppermute-backed roll
    across device boundaries).  ``psum_axis`` sums the overflow counts
    over the mesh so the replicated scalar stays consistent.
    """
    t = fields[7 + axis]
    d = t - cur[None, :]
    if pbc_ax and n_ax > 2:
        half = n_ax // 2
        d = jnp.where(d > half, d - n_ax, d)
        d = jnp.where(d < -half, d + n_ax, d)
    far = alive & (jnp.abs(d) > 1)
    ovf = jnp.sum(far.astype(jnp.int32))
    ok = alive & ~far
    stay = ok & (d == 0)
    plus = ok & (d == 1)
    minus = ok & (d == -1)
    valid = jnp.concatenate(
        [stay, shift(plus, +1), shift(minus, -1)], axis=0)
    cand = [jnp.concatenate([f, shift(f, +1), shift(f, -1)], axis=0)
            for f in fields]
    vi = valid.astype(jnp.int32)
    rank = jnp.cumsum(vi, axis=0) - vi      # exclusive
    keep = valid & (rank < out_cap)
    ovf = ovf + jnp.sum((valid & ~keep).astype(jnp.int32))
    if psum_axis is not None:
        ovf = jax.lax.psum(ovf, psum_axis)
    overflow = overflow + ovf.astype(jnp.int32)
    tgt = jnp.where(keep, rank, out_cap).astype(jnp.int32)
    count = jnp.minimum(jnp.sum(vi, axis=0), out_cap)
    if use_pallas:
        fields = _compact_pallas(tgt, cand, out_cap, fills)
    else:
        fields = _compact_xla(tgt, cand, out_cap, fills)
    alive = (jnp.arange(out_cap, dtype=jnp.int32)[:, None]
             < count[None])
    return fields, alive, overflow


def _finalize(fields, alive):
    xi = jnp.stack(fields[0:3], axis=1)
    xi = jnp.where(alive[:, None, :], xi, SENTINEL_DEAD)
    mom = jnp.stack(fields[3:6], axis=1)
    af = alive.astype(xi.dtype)
    return dict(
        xi=xi, mom=mom * af[:, None, :],
        mass=jnp.maximum(fields[6] * af, 1e-30),
        alive=alive,
        typ=jnp.where(alive, fields[10], -1),
        vtyp=jnp.where(alive, fields[11], -1),
        ids=jnp.where(alive, fields[12], -1),
        ref_xi=xi)


def make_rebin_cl(grid, use_pallas: bool = True):
    """Build rebin_cl(cl[, extra]) -> cl' [, extra'] for the fused
    loop's skin-check rebin (single-device layout;
    ``make_rebin_cl_sharded`` for the mesh path).

    ``extra``: optional [cap, NC] int32 per-slot side array (e.g. the
    TTM's stored FD index) that travels with each atom through the
    migration — the move_atom analog of fdi/fdj/fdk riding fix_cells
    (types.h:327) — returned re-slotted (-1 in dead slots).
    """
    dims = grid.dims
    gx, gy, gz = dims
    cap = grid.capacity
    nc = gx * gy * gz
    ar = jnp.arange(nc, dtype=jnp.int32)
    cur_ax = (ar // (gy * gz), (ar // gz) % gy, ar % gz)
    pbc = tuple(int(b) for b in grid.box.pbc)

    def rebin_cl(cl, extra=None):
        alive = cl.alive
        fields, fills = _bin_fields(cl.xi, cl.mom, cl.mass, cl.typ,
                                    cl.vtyp, cl.ids, cl.xbounds, grid)
        if extra is not None:
            fields.append(extra)
            fills.append(-1)
        overflow = cl.overflow
        active = [a for a in range(3) if dims[a] > 1]
        for axis in range(3):
            if dims[axis] == 1:
                continue
            # intermediate phases keep +8 slack slots: migration along x
            # can transiently pack a cell beyond its FINAL occupancy
            # (atoms that still leave along y/z) — only the last phase's
            # occupancy is the one the sort rebin would see
            out_cap = cap if axis == active[-1] else cap + 8

            def shift(a, sgn, axis=axis):
                # arriving at cell c: emigrants of cell c - sgn*e_axis
                off = [0, 0, 0]
                off[axis] = -sgn
                return _roll_cells(a, dims, tuple(off))

            fields, alive, overflow = _run_phase(
                fields, fills, alive, overflow, axis, cur_ax[axis],
                dims[axis], pbc[axis], shift, out_cap, use_pallas)
        out = _finalize(fields, alive)
        cl2 = cl.replace(overflow=overflow, **out)
        if extra is not None:
            return cl2, jnp.where(alive, fields[13], -1)
        return cl2

    return rebin_cl


def make_rebin_cl_sharded(grid, mesh, use_pallas: bool = True):
    """The 3-phase +-1-cell migration under an x-decomposed mesh.

    This is the reference's staged `send_atoms` (imd_fix_cells_3d.c:
    311-436) on ICI: the y/z phases are device-local plane rolls (an
    x-slab owns whole y/z columns), and the x phase's +-1-plane shifts
    become one `lax.ppermute` each way — the first/last local x-plane's
    emigrants ride to the neighbor device, exactly one plane of traffic
    per direction per rebin.  Slot order (stay-first, then +x arrivals,
    then -x arrivals, in source-slot order) is IDENTICAL to the
    single-device `make_rebin_cl`, so sharded and unsharded runs agree
    slot-for-slot, not just bag-for-bag.

    Returns rebin_fn(cl) -> cl' operating on GLOBAL cells-last arrays;
    internally a `jax.shard_map` over ``mesh``'s x axis (the same
    manual-SPMD wrapping as the force sweep in parallel/fused_shard.py —
    pallas_call does not partition under GSPMD, so the compaction kernel
    must live inside shard_map).
    """
    from jax.sharding import PartitionSpec as P

    xname = mesh.axis_names[0]
    px = int(mesh.shape[xname])
    gx, gy, gz = grid.dims
    if px <= 1 or gx % px or any(
            int(mesh.shape[a]) != 1 for a in mesh.axis_names[1:]):
        raise ValueError("mesh must decompose x only with dims[0] "
                         f"divisible: dims={grid.dims} mesh={mesh.shape}")
    nxl = gx // px
    gyz = gy * gz
    ncl = nxl * gyz
    ldims = (nxl, gy, gz)
    cap = grid.capacity
    pbc = tuple(int(b) for b in grid.box.pbc)
    ar = jnp.arange(ncl, dtype=jnp.int32)
    cur_lx = ar // gyz
    cur_y = (ar // gz) % gy
    cur_z = ar % gz
    # data from source s delivered to s+1 = "receive from my LEFT"
    perm_from_left = [(s, (s + 1) % px) for s in range(px)]
    perm_from_right = [(s, (s - 1) % px) for s in range(px)]
    active = [a for a in range(3) if grid.dims[a] > 1]

    def body(xi, mom, mass, typ, vtyp, ids, alive, overflow, xbounds,
             extra):
        fields, fills = _bin_fields(xi, mom, mass, typ, vtyp, ids,
                                    xbounds, grid)
        if extra is not None:
            fields.append(extra)
            fills.append(-1)
        idx = jax.lax.axis_index(xname)
        cur_gx = idx.astype(jnp.int32) * nxl + cur_lx

        def shift_x(a, sgn):
            # result[plane p] = a[plane p - sgn]; the plane entering at
            # the domain edge comes from the neighbor device (the ring
            # permute wraps device 0 <-> px-1 exactly like the global
            # roll; for open x boundaries the wrapped plane's mover
            # masks are False, so the wrapped data is inert)
            if sgn == +1:
                inc = jax.lax.ppermute(a[..., ncl - gyz:], xname,
                                       perm_from_left)
                return jnp.concatenate([inc, a[..., :ncl - gyz]],
                                       axis=-1)
            inc = jax.lax.ppermute(a[..., :gyz], xname, perm_from_right)
            return jnp.concatenate([a[..., gyz:], inc], axis=-1)

        al = alive
        ovf = overflow
        for axis in range(3):
            if grid.dims[axis] == 1:
                continue
            out_cap = cap if axis == active[-1] else cap + 8
            cur = (cur_gx, cur_y, cur_z)[axis]
            if axis == 0:
                shift = shift_x
            else:
                def shift(a, sgn, axis=axis):
                    off = [0, 0, 0]
                    off[axis] = -sgn
                    return _roll_cells(a, ldims, tuple(off))
            fields, al, ovf = _run_phase(
                fields, fills, al, ovf, axis, cur, grid.dims[axis],
                pbc[axis], shift, out_cap, use_pallas, psum_axis=xname)
        out = _finalize(fields, al)
        res = (out["xi"], out["mom"], out["mass"], out["typ"],
               out["vtyp"], out["ids"], out["alive"], ovf)
        if extra is not None:
            res = res + (jnp.where(al, fields[13], -1),)
        return res

    cspec = P(None, None, xname)
    mspec = P(None, xname)
    rep = P()
    base_specs = (cspec, cspec, mspec, mspec, mspec, mspec, mspec, rep)
    base_out = (cspec, cspec, mspec, mspec, mspec, mspec, mspec, rep)

    def make_fn(with_xb, with_extra):
        in_specs = (base_specs + ((rep,) if with_xb else ())
                    + ((mspec,) if with_extra else ()))
        out_specs = base_out + ((mspec,) if with_extra else ())

        def f(*args):
            i = 8
            xb = args[i] if with_xb else None
            i += int(with_xb)
            ex = args[i] if with_extra else None
            return body(*args[:8], xb, ex)

        # check_vma=False: the inner pallas_call doesn't annotate
        # varying-ness (same stance as the force sweep's shard_map)
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    fns = {}

    def rebin_fn(cl, extra=None):
        key = (cl.xbounds is not None, extra is not None)
        if key not in fns:
            fns[key] = make_fn(*key)
        args = (cl.xi, cl.mom, cl.mass, cl.typ, cl.vtyp, cl.ids,
                cl.alive, cl.overflow)
        if key[0]:
            args = args + (cl.xbounds,)
        if key[1]:
            args = args + (extra,)
        out = fns[key](*args)
        (xi, mom, mass, typ, vtyp, ids, alive, overflow) = out[:8]
        cl2 = cl.replace(xi=xi, mom=mom, mass=mass, typ=typ, vtyp=vtyp,
                         ids=ids, alive=alive, ref_xi=xi,
                         overflow=overflow)
        if key[1]:
            return cl2, out[8]
        return cl2

    return rebin_fn
