"""Pallas blocked force kernels: the production TPU force engine.

Why: the XLA cells-last engine (ops/forces_fast.py) materializes its
[cap, cap, NC] pair tensors to HBM - measured 28 GB of traffic per EAM
call at 108k atoms, pinned at ~700 GB/s = the v5e HBM limit.  These
kernels process the flattened cell axis in VMEM-resident blocks, so the
pair tensors never leave the chip: HBM traffic drops to the O(atom-state)
minimum and the sweep becomes VPU-compute-bound.

Design:
- neighbor access stays the lattice-roll stencil (HBM gathers measured
  ~0.15 G pairs/s on this chip - 300x slower than streaming; a classic
  [N, K] Verlet-gather layout is a non-starter on TPU);
- the 13 half-stencil neighbor views are pre-rolled by XLA (cheap, ~13x
  the atom state in streaming reads) with the PBC box shift added and
  invalid slots/cells pushed to a far sentinel position, which makes the
  kernel completely mask-free: out-of-range pairs land beyond the
  cutoff, where the potential window clamps to zero value and slope;
- the 13 offsets run in a lax.fori_loop inside the kernel so Mosaic
  reuses one sweep's worth of [cap, cap, B] temporaries (a fully
  unrolled body kept ~64 MB live and blew the scoped-VMEM limit);
- potential evaluation is a single-window monomial Horner producing
  value and derivative in one fused loop (models/potential.PolyPotential)
  with the coefficients baked into the kernel as immediates;
- Newton's third law: per-offset partner accumulators [13, cap, ...] are
  rolled back and summed by XLA after the kernel (the send_forces
  counterpart of the reference's AR scheme, imd_comm_force_3d.c:417).

EAM runs as the reference's 3-phase scheme (imd_forces_nbl.c:295):
kernel A accumulates pair forces + host densities rho, XLA applies the
embedding derivative (a [cap, NC] elementwise op), kernel B sweeps the
stencil again for the embedding forces with (dF_i + dF_j) rho'(r).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imd_tpu.ops.forces import HALF_OFFSETS, ForceResult
from imd_tpu.ops.forces_fast import (_from_cl, _roll_cells, _roll_cells_back,
                                     _to_cl, _wrap_shift_mask_cl)
from imd_tpu.scene import Scene

SENTINEL_DEAD = 1.0e6     # dead atom slots
SENTINEL_CELL = 3.0e6     # invalid neighbor cells (open boundaries)
NOF = len(HALF_OFFSETS)   # 13


def _poly_consts(poly, col: int = 0):
    """(coef tuple, begin, end) as python floats for kernel baking."""
    return poly.host[col]


def _horner_vg(x, consts):
    """Fused value+derivative Horner with baked constants.

    Returns (V, 2 dV/dx) like PotTable.interp; clamps outside the window
    (zero force beyond the cutoff because tables end at 0 with 0 slope).
    """
    coef, b, e = consts
    inv_half = 2.0 / (e - b)
    t = _cheb_t(x, b, e)
    v = jnp.full_like(t, coef[-1])
    g = jnp.zeros_like(t)
    for k in range(len(coef) - 2, -1, -1):
        g = g * t + v
        v = v * t + coef[k]
    return v, 2.0 * g * inv_half


def _cheb_t(x, b, e):
    """Window transform as one FMA + clip (saves the x-clip's extra sub;
    clipping t instead of x is exactly equivalent for an affine map)."""
    inv_half = 2.0 / (e - b)
    return jnp.clip(x * inv_half - (b * inv_half + 1.0), -1.0, 1.0)


def _horner_v(x, consts):
    """Value-only Horner (2 flops/term instead of the fused 4)."""
    coef, b, e = consts
    t = _cheb_t(x, b, e)
    v = jnp.full_like(t, coef[-1])
    for k in range(len(coef) - 2, -1, -1):
        v = v * t + coef[k]
    return v


def _horner_g(x, consts):
    """Derivative-only Horner over trace-time-differentiated coefficients
    (2 flops/term; halves the polynomial cost of the embedding sweep and
    of forces-only pair sweeps vs the fused value+grad recurrence).  The
    chain-rule factor 2/(e-b) and the power weights k are baked into the
    coefficients at trace time (no epilogue multiply in the kernel)."""
    coef, b, e = consts
    d = len(coef) - 1
    if d == 0:
        return jnp.zeros_like(x)
    s = 2.0 * 2.0 / (e - b)
    t = _cheb_t(x, b, e)
    g = jnp.full_like(t, coef[d] * d * s)
    for k in range(d - 1, 0, -1):
        g = g * t + coef[k] * k * s
    return g


def prep_neighbors(scene: Scene):
    """Cells-last views with sentinel-pushed invalid positions.

    Returns (xi [cap,3,NC], nbr [13,cap,3,NC], mask_cl [cap,NC]).
    """
    grid = scene.grid
    dims = grid.dims
    dtype = scene.pos.dtype
    pos = _to_cl(scene.pos, dims)
    typ = _to_cl(scene.type, dims)
    mask = typ >= 0
    xi = jnp.where(mask[:, None, :], pos, SENTINEL_DEAD)
    nbrs = []
    for off in HALF_OFFSETS:
        xj = _roll_cells(xi, dims, off)
        shift, cell_ok = _wrap_shift_mask_cl(grid, off, dtype)
        xj = xj + shift[None]
        xj = jnp.where(cell_ok[None, None, :], xj, SENTINEL_CELL)
        nbrs.append(xj)
    return xi, jnp.stack(nbrs), mask


def _assemble(dims, acc_i, accj):
    """Roll back per-offset partner sums and add (XLA side)."""
    total = acc_i
    for k, off in enumerate(HALF_OFFSETS):
        total = total + _roll_cells_back(accj[k], dims, off)
    return total


def _make_sweep(rcut2, nr2, mode, pair_c, rho_c, want_energy=True,
                want_nn=True, want_stress=False):
    """Per-offset sweep closure shared by both kernels.

    ``want_energy``/``want_nn`` gate the phi-value and neighbor-count
    work: the leapfrog integrator needs only forces, so the production
    hot loop skips the epot accumulation (the reference gets it nearly
    free in scalar code, forces_nbl:540; on the VPU it is real work) and
    evaluates the full kernel only at .eng/observable intervals.

    ``want_stress`` adds the virial and the 6 pressure-tensor partial
    sums (imd_forces_nbl.c:997-1016).  These are i-side-only
    accumulators: every pair appears exactly ONCE in the half-stencil
    sweep (tri mask for the self pair), so the whole pair term
    f_pair . r_pair = -grad r^2 is booked on the i side and no partner
    roll-back is needed.
    """

    def sweep(xi_x, xi_y, xi_z, xj, tri, dF_i, dFj):
        dx = xi_x[:, None, :] - xj[:, 0, :][None, :, :]
        dy = xi_y[:, None, :] - xj[:, 1, :][None, :, :]
        dz = xi_z[:, None, :] - xj[:, 2, :][None, :, :]
        r2 = dx * dx + dy * dy + dz * dz
        inside = r2 < rcut2
        if tri is not None:
            inside = inside & tri
        insf = inside.astype(dx.dtype)
        out = {}
        if mode in ("A", "P"):
            if want_energy:
                phi, grad = _horner_vg(r2, pair_c)
                phi = phi * insf
                out["e_i"] = 0.5 * jnp.sum(phi, 1)
                out["e_j"] = 0.5 * jnp.sum(phi, 0)
            else:
                grad = _horner_g(r2, pair_c)
            grad = grad * insf
            if mode == "A":
                rv = _horner_v(r2, rho_c) * insf
                out["rho_i"] = jnp.sum(rv, 1)
                out["rho_j"] = jnp.sum(rv, 0)
            if want_nn:
                # the TTM counts neighbors within the pair cutoff
                # (NUMNEIGHS, imd_ttm.c:418): when the radii coincide the
                # extra compare is redundant with `inside`
                near = (insf if nr2 >= rcut2
                        else insf * (r2 < nr2).astype(dx.dtype))
                out["nn_i"] = jnp.sum(near, 1)
                out["nn_j"] = jnp.sum(near, 0)
        else:
            rg = _horner_g(r2, rho_c)
            grad = (dF_i[:, None, :] + dFj[None, :, :]) * rg * insf
        out["fx_i"] = -jnp.sum(grad * dx, 1)
        out["fy_i"] = -jnp.sum(grad * dy, 1)
        out["fz_i"] = -jnp.sum(grad * dz, 1)
        out["fx_j"] = jnp.sum(grad * dx, 0)
        out["fy_j"] = jnp.sum(grad * dy, 0)
        out["fz_j"] = jnp.sum(grad * dz, 0)
        if want_stress:
            # Voigt xx yy zz yz zx xy; f_c = -grad*d_c so p_cc' = f_c d_c'
            out["vxx_i"] = -jnp.sum(grad * dx * dx, 1)
            out["vyy_i"] = -jnp.sum(grad * dy * dy, 1)
            out["vzz_i"] = -jnp.sum(grad * dz * dz, 1)
            out["vyz_i"] = -jnp.sum(grad * dy * dz, 1)
            out["vzx_i"] = -jnp.sum(grad * dz * dx, 1)
            out["vxy_i"] = -jnp.sum(grad * dx * dy, 1)
        return out

    return sweep


STRESS_KEYS = ["vxx", "vyy", "vzz", "vyz", "vzx", "vxy"]


def eam_kernels_cl(xi, nbr, mask, eam, grid, count_neighbors: bool = False,
                   neigh_r2: float = 0.0, block: int = 256,
                   need_energy: bool = True, need_stress: bool = False):
    """Kernel core on prebuilt cells-last views.

    ``xi`` [cap,3,NC] sentinel-filled positions, ``nbr`` [13,cap,3,NC]
    shifted neighbor views, ``mask`` [cap,NC].  Returns cells-last
    (F [cap,3,NC], epot, rho, nneigh).  Used by compute_eam_forces_pallas
    (Scene entry) and by ops.fused_step (state kept cells-last so the
    _to_cl transpose and its re-fusion into 13 rolls — measured 10 ms at
    1M atoms — never happen in the hot loop).
    """
    dims = grid.dims
    dtype = xi.dtype
    cap = xi.shape[0]
    nc = dims[0] * dims[1] * dims[2]

    # scale the block down for larger capacities so the kernel's live set
    # stays inside the 16 MB scoped-VMEM limit: it grows ~ ci*cj_pad*b
    # (cj is a sublane dim, padded to a multiple of 8)
    cap_pad = ((cap + 7) // 8) * 8
    budget = block * 16 * 16
    b = max(128, (budget // (cap * cap_pad)) // 128 * 128)
    ncp = ((nc + b - 1) // b) * b
    nblk = ncp // b

    pad = ncp - nc
    if pad:
        xi = jnp.pad(xi, ((0, 0), (0, 0), (0, pad)),
                     constant_values=SENTINEL_CELL)
        nbr = jnp.pad(nbr, ((0, 0), (0, 0), (0, 0), (0, pad)),
                      constant_values=SENTINEL_CELL)

    rcut2 = float(grid.cutoff) ** 2
    nr2 = float(neigh_r2 if neigh_r2 > 0 else rcut2)
    pair_c = _poly_consts(eam.pair)
    rho_c = _poly_consts(eam.rho)
    interp = jax.default_backend() == "cpu"

    def tri_mask(cap):
        ti = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 0)
        tj = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 1)
        return ti < tj

    # ---------------- kernel A: pair forces + host density ----------------
    sweep_a = _make_sweep(rcut2, nr2, "A", pair_c, rho_c,
                          want_energy=need_energy,
                          want_nn=count_neighbors,
                          want_stress=need_stress)
    keys_a = ["fx", "fy", "fz", "rho"]
    if need_energy:
        keys_a.append("e")
    if count_neighbors:
        keys_a.append("nn")
    nk = len(keys_a)
    # i-side-only accumulators (whole pair term booked on i; no rollback)
    ikeys = [*STRESS_KEYS] if need_stress else []
    nik = len(ikeys)

    def kern_a(xi_ref, nbr_ref, *refs):
        iref, sref, jref = (refs[:nk], refs[nk:nk + nik],
                            refs[nk + nik:])
        xi_x = xi_ref[:, 0, :]
        xi_y = xi_ref[:, 1, :]
        xi_z = xi_ref[:, 2, :]
        o = sweep_a(xi_x, xi_y, xi_z, xi_ref[...], tri_mask(cap),
                    None, None)
        for k, name in enumerate(keys_a):
            iref[k][...] = o[name + "_i"] + o[name + "_j"]
        for k, name in enumerate(ikeys):
            sref[k][...] = o[name + "_i"]

        def body(m, _):
            o = sweep_a(xi_x, xi_y, xi_z, nbr_ref[m], None, None, None)
            for k, name in enumerate(keys_a):
                iref[k][...] += o[name + "_i"]
                jref[k][m] = o[name + "_j"]
            for k, name in enumerate(ikeys):
                sref[k][...] += o[name + "_i"]
            return 0

        jax.lax.fori_loop(0, NOF, body, 0)

    spec_i = pl.BlockSpec((cap, 3, b), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((NOF, cap, 3, b), lambda i: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((cap, b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec_oj = pl.BlockSpec((NOF, cap, b), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((cap, ncp), dtype)
    shpj = jax.ShapeDtypeStruct((NOF, cap, ncp), dtype)

    outs = pl.pallas_call(
        kern_a, grid=(nblk,),
        in_specs=[spec_i, spec_n],
        out_specs=[spec_o] * (nk + nik) + [spec_oj] * nk,
        out_shape=[shp] * (nk + nik) + [shpj] * nk,
        interpret=interp,
    )(xi, nbr)
    outs = [o[..., :nc] for o in outs]
    acc = {name: _assemble(dims, outs[k], outs[nk + nik + k])
           for k, name in enumerate(keys_a)}
    stress_a = {name: outs[nk + k] for k, name in enumerate(ikeys)}
    fx, fy, fz, rho_t = acc["fx"], acc["fy"], acc["fz"], acc["rho"]
    maskf = mask.astype(dtype)
    epot = acc["e"] if need_energy else jnp.zeros_like(rho_t)
    nneigh = acc["nn"] if count_neighbors else jnp.zeros_like(rho_t)

    # ---------------- embedding (XLA elementwise) --------------------------
    emb_v, emb_g = eam.embed.interp(0, rho_t)
    if need_energy:
        epot = (epot + emb_v) * maskf
    dF = 0.5 * emb_g * maskf        # interp returns 2*dV/dx

    # pre-rolled dF neighbor views (send_cells(copy_dF) analog)
    dF_n = jnp.stack([_roll_cells(dF, dims, off) for off in HALF_OFFSETS])
    dF_p, dF_np = dF, dF_n
    if pad:
        dF_p = jnp.pad(dF, ((0, 0), (0, pad)))
        dF_np = jnp.pad(dF_n, ((0, 0), (0, 0), (0, pad)))

    # ---------------- kernel B: embedding forces ---------------------------
    sweep_b = _make_sweep(rcut2, nr2, "B", None, rho_c,
                          want_stress=need_stress)
    keys_b = ["fx", "fy", "fz"]
    nkb = len(keys_b)

    def kern_b(xi_ref, nbr_ref, dfi_ref, dfn_ref, *refs):
        iref, sref, jref = (refs[:nkb], refs[nkb:nkb + nik],
                            refs[nkb + nik:])
        xi_x = xi_ref[:, 0, :]
        xi_y = xi_ref[:, 1, :]
        xi_z = xi_ref[:, 2, :]
        dfi = dfi_ref[...]
        o = sweep_b(xi_x, xi_y, xi_z, xi_ref[...], tri_mask(cap),
                    dfi, dfi)
        for k, name in enumerate(keys_b):
            iref[k][...] = o[name + "_i"] + o[name + "_j"]
        for k, name in enumerate(ikeys):
            sref[k][...] = o[name + "_i"]

        def body(m, _):
            o = sweep_b(xi_x, xi_y, xi_z, nbr_ref[m], None, dfi,
                        dfn_ref[m])
            for k, name in enumerate(keys_b):
                iref[k][...] += o[name + "_i"]
                jref[k][m] = o[name + "_j"]
            for k, name in enumerate(ikeys):
                sref[k][...] += o[name + "_i"]
            return 0

        jax.lax.fori_loop(0, NOF, body, 0)

    outs2 = pl.pallas_call(
        kern_b, grid=(nblk,),
        in_specs=[spec_i, spec_n, spec_o, spec_oj],
        out_specs=[spec_o] * (nkb + nik) + [spec_oj] * nkb,
        out_shape=[shp] * (nkb + nik) + [shpj] * nkb,
        interpret=interp,
    )(xi, nbr, dF_p, dF_np)
    outs2 = [o[..., :nc] for o in outs2]
    fx = fx + _assemble(dims, outs2[0], outs2[nkb + nik + 0])
    fy = fy + _assemble(dims, outs2[1], outs2[nkb + nik + 1])
    fz = fz + _assemble(dims, outs2[2], outs2[nkb + nik + 2])

    F = jnp.stack([fx, fy, fz], axis=1) * maskf[:, None, :]
    if need_stress:
        presstens = jnp.stack(
            [jnp.sum(stress_a[n]) + jnp.sum(outs2[nkb + k])
             for k, n in enumerate(ikeys)])
        virial = presstens[0] + presstens[1] + presstens[2]
    else:
        presstens = jnp.zeros((6,), dtype)
        virial = jnp.zeros((), dtype)
    return F, epot * maskf, rho_t * maskf, nneigh * maskf, virial, presstens


def compute_eam_forces_pallas(scene: Scene, eam, ntypes: int = 1,
                              count_neighbors: bool = False,
                              neigh_r2: float = 0.0,
                              block: int = 256,
                              need_energy: bool = True,
                              need_stress: Optional[bool] = None
                              ) -> ForceResult:
    """3-phase EAM with Pallas blocked sweeps (ntypes == 1 fast path).

    ``eam`` must hold PolyPotential tables (models.potential.
    eam_to_fastpoly) and must be CLOSED OVER (concrete) at trace time -
    the polynomial coefficients are baked into the kernel as immediates.
    Callers jit the surrounding step function; do not pass ``eam`` as a
    jit argument.  Multi-type systems use the XLA engine.

    ``need_stress`` (default: follows need_energy) adds the global
    virial + pressure tensor from in-kernel pair partial sums
    (imd_forces_nbl.c:997-1016) — observable mode; the forces-only hot
    loop skips it.
    """
    if need_stress is None:
        need_stress = need_energy
    grid = scene.grid
    dims = grid.dims
    xi, nbr, mask = prep_neighbors(scene)
    F, epot, rho_t, nneigh, virial, presstens = eam_kernels_cl(
        xi, nbr, mask, eam, grid, count_neighbors=count_neighbors,
        neigh_r2=neigh_r2, block=block, need_energy=need_energy,
        need_stress=need_stress)
    return ForceResult(
        force=_from_cl(F, dims), epot=_from_cl(epot, dims),
        virial=virial, presstens=presstens,
        num_neighs=_from_cl(nneigh.astype(jnp.int32), dims),
        rho=_from_cl(rho_t, dims))


def compute_pair_forces_pallas(scene: Scene, pot, ntypes: int = 1,
                               count_neighbors: bool = False,
                               neigh_r2: float = 0.0,
                               block: int = 256,
                               need_energy: bool = True,
                               need_stress: Optional[bool] = None
                               ) -> ForceResult:
    """Pair-potential Pallas engine (single species fast path).

    ``pot`` must be a PolyPotential (models.potential.to_fastpoly),
    closed over at trace time like the EAM variant.
    """
    if need_stress is None:
        need_stress = need_energy
    grid = scene.grid
    dims = grid.dims
    dtype = scene.pos.dtype
    cap = scene.capacity
    nc = dims[0] * dims[1] * dims[2]

    cap_pad = ((cap + 7) // 8) * 8
    budget = block * 16 * 16
    b = max(128, (budget // (cap * cap_pad)) // 128 * 128)
    ncp = ((nc + b - 1) // b) * b
    nblk = ncp // b

    xi, nbr, mask = prep_neighbors(scene)
    pad = ncp - nc
    if pad:
        xi = jnp.pad(xi, ((0, 0), (0, 0), (0, pad)),
                     constant_values=SENTINEL_CELL)
        nbr = jnp.pad(nbr, ((0, 0), (0, 0), (0, 0), (0, pad)),
                      constant_values=SENTINEL_CELL)

    rcut2 = float(grid.cutoff) ** 2
    nr2 = float(neigh_r2 if neigh_r2 > 0 else rcut2)
    pair_c = _poly_consts(pot)
    interp = jax.default_backend() == "cpu"
    sweep_p = _make_sweep(rcut2, nr2, "P", pair_c, None,
                          want_energy=need_energy,
                          want_nn=count_neighbors,
                          want_stress=need_stress)
    keys_p = ["fx", "fy", "fz"]
    if need_energy:
        keys_p.append("e")
    if count_neighbors:
        keys_p.append("nn")
    nk = len(keys_p)
    ikeys = [*STRESS_KEYS] if need_stress else []
    nik = len(ikeys)

    def tri_mask(cap):
        ti = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 0)
        tj = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 1)
        return ti < tj

    def kern(xi_ref, nbr_ref, *refs):
        iref, sref, jref = (refs[:nk], refs[nk:nk + nik],
                            refs[nk + nik:])
        xi_x = xi_ref[:, 0, :]
        xi_y = xi_ref[:, 1, :]
        xi_z = xi_ref[:, 2, :]
        o = sweep_p(xi_x, xi_y, xi_z, xi_ref[...], tri_mask(cap),
                    None, None)
        for k, name in enumerate(keys_p):
            iref[k][...] = o[name + "_i"] + o[name + "_j"]
        for k, name in enumerate(ikeys):
            sref[k][...] = o[name + "_i"]

        def body(m, _):
            o = sweep_p(xi_x, xi_y, xi_z, nbr_ref[m], None, None, None)
            for k, name in enumerate(keys_p):
                iref[k][...] += o[name + "_i"]
                jref[k][m] = o[name + "_j"]
            for k, name in enumerate(ikeys):
                sref[k][...] += o[name + "_i"]
            return 0

        jax.lax.fori_loop(0, NOF, body, 0)

    spec_i = pl.BlockSpec((cap, 3, b), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((NOF, cap, 3, b), lambda i: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((cap, b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec_oj = pl.BlockSpec((NOF, cap, b), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((cap, ncp), dtype)
    shpj = jax.ShapeDtypeStruct((NOF, cap, ncp), dtype)

    outs = pl.pallas_call(
        kern, grid=(nblk,),
        in_specs=[spec_i, spec_n],
        out_specs=[spec_o] * (nk + nik) + [spec_oj] * nk,
        out_shape=[shp] * (nk + nik) + [shpj] * nk,
        interpret=interp,
    )(xi, nbr)
    outs = [o[..., :nc] for o in outs]
    acc = {name: _assemble(dims, outs[k], outs[nk + nik + k])
           for k, name in enumerate(keys_p)}
    fx, fy, fz = acc["fx"], acc["fy"], acc["fz"]
    maskf = mask.astype(dtype)
    epot = acc["e"] if need_energy else jnp.zeros_like(fx)
    nneigh = acc["nn"] if count_neighbors else jnp.zeros_like(fx)
    F = jnp.stack([fx, fy, fz], axis=1) * maskf[:, None, :]
    if need_stress:
        presstens = jnp.stack([jnp.sum(outs[nk + k])
                               for k in range(nik)])
        virial = presstens[0] + presstens[1] + presstens[2]
    else:
        presstens = jnp.zeros((6,), dtype)
        virial = jnp.zeros((), dtype)
    return ForceResult(
        force=_from_cl(F, dims), epot=_from_cl(epot * maskf, dims),
        virial=virial, presstens=presstens,
        num_neighs=_from_cl((nneigh * maskf).astype(jnp.int32), dims))


# ---------------------------------------------------------------------------
# split R/F engine: rho sweep, then ONE combined force sweep
# ---------------------------------------------------------------------------

def _horner_g2(x, c1, c2):
    """Two derivative-only Horners, sharing the window transform when
    the tables span the same (begin, end) — saves ops/slot; falls back
    to independent transforms otherwise (trace-time decision).  Like
    _horner_g, the chain-rule scale is baked into the coefficients."""
    coef1, b, e = c1
    coef2, b2, e2 = c2
    s1 = 2.0 * 2.0 / (e - b)
    t = _cheb_t(x, b, e)
    if (b, e) == (b2, e2):
        t2 = t
    else:
        t2 = _cheb_t(x, b2, e2)
    s2 = 2.0 * 2.0 / (e2 - b2)
    d1, d2 = len(coef1) - 1, len(coef2) - 1
    g1 = jnp.full_like(t, coef1[d1] * d1 * s1)
    for k in range(d1 - 1, 0, -1):
        g1 = g1 * t + coef1[k] * k * s1
    g2 = jnp.full_like(t2, coef2[d2] * d2 * s2)
    for k in range(d2 - 1, 0, -1):
        g2 = g2 * t2 + coef2[k] * k * s2
    return g1, g2


def _split_geometry(xi, grid, block):
    """Shared lane-block padding plan for the R/F split passes."""
    dims = grid.dims
    cap = xi.shape[0]
    nc = dims[0] * dims[1] * dims[2]
    cap_pad = ((cap + 7) // 8) * 8
    budget = block * 16 * 16
    b = max(128, (budget // (cap * cap_pad)) // 128 * 128)
    ncp = ((nc + b - 1) // b) * b
    return nc, b, ncp // b, ncp - nc


def eam_r_pass(xi, nbr, eam, grid,
               count_neighbors: bool = False,
               neigh_r2: float = 0.0, block: int = 128,
               unroll: int = 1):
    """Kernel R of the R/F split: UNMASKED assembled host density rho
    (+ neighbor counts) over the stencil.  Exposed separately so the
    sharded fused step can halo-fold rho and exchange dF between the
    passes (the send_forces(add_rho)/send_cells(copy_dF) halo steps,
    imd_forces_nbl.c:745/786)."""
    dims = grid.dims
    dtype = xi.dtype
    cap = xi.shape[0]
    nc, b, nblk, pad = _split_geometry(xi, grid, block)
    ncp = nblk * b
    if pad:
        xi = jnp.pad(xi, ((0, 0), (0, 0), (0, pad)),
                     constant_values=SENTINEL_CELL)
        nbr = jnp.pad(nbr, ((0, 0), (0, 0), (0, 0), (0, pad)),
                      constant_values=SENTINEL_CELL)

    rcut2 = float(grid.cutoff) ** 2
    nr2 = float(neigh_r2 if neigh_r2 > 0 else rcut2)
    rho_c = _poly_consts(eam.rho)
    interp = jax.default_backend() == "cpu"

    def tri_mask(cap):
        ti = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 0)
        tj = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 1)
        return ti < tj

    def sweep_r(xi_x, xi_y, xi_z, xj, tri):
        dx = xi_x[:, None, :] - xj[:, 0, :][None, :, :]
        dy = xi_y[:, None, :] - xj[:, 1, :][None, :, :]
        dz = xi_z[:, None, :] - xj[:, 2, :][None, :, :]
        r2 = dx * dx + dy * dy + dz * dz
        inside = r2 < rcut2
        if tri is not None:
            inside = inside & tri
        insf = inside.astype(dx.dtype)
        rv = _horner_v(r2, rho_c) * insf
        out = {"rho_i": jnp.sum(rv, 1), "rho_j": jnp.sum(rv, 0)}
        if count_neighbors:
            near = (insf if nr2 >= rcut2
                    else insf * (r2 < nr2).astype(dx.dtype))
            out["nn_i"] = jnp.sum(near, 1)
            out["nn_j"] = jnp.sum(near, 0)
        return out

    keys_r = ["rho"] + (["nn"] if count_neighbors else [])
    nkr = len(keys_r)

    def kern_r(xi_ref, nbr_ref, *refs):
        iref, jref = refs[:nkr], refs[nkr:]
        xi_x = xi_ref[:, 0, :]
        xi_y = xi_ref[:, 1, :]
        xi_z = xi_ref[:, 2, :]
        o = sweep_r(xi_x, xi_y, xi_z, xi_ref[...], tri_mask(cap))
        for k, name in enumerate(keys_r):
            iref[k][...] = o[name + "_i"] + o[name + "_j"]

        def body(m, _):
            o = sweep_r(xi_x, xi_y, xi_z, nbr_ref[m], None)
            for k, name in enumerate(keys_r):
                iref[k][...] += o[name + "_i"]
                jref[k][m] = o[name + "_j"]
            return 0

        jax.lax.fori_loop(0, NOF, body, 0, unroll=unroll)

    spec_i = pl.BlockSpec((cap, 3, b), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((NOF, cap, 3, b), lambda i: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((cap, b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec_oj = pl.BlockSpec((NOF, cap, b), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((cap, ncp), dtype)
    shpj = jax.ShapeDtypeStruct((NOF, cap, ncp), dtype)

    outs = pl.pallas_call(
        kern_r, grid=(nblk,),
        in_specs=[spec_i, spec_n],
        out_specs=[spec_o] * nkr + [spec_oj] * nkr,
        out_shape=[shp] * nkr + [shpj] * nkr,
        interpret=interp,
    )(xi, nbr)
    outs = [o[..., :nc] for o in outs]
    acc = {name: _assemble(dims, outs[k], outs[nkr + k])
           for k, name in enumerate(keys_r)}
    rho_t = acc["rho"]
    nneigh = acc["nn"] if count_neighbors else jnp.zeros_like(rho_t)
    return rho_t, nneigh


def eam_f_pass(xi, nbr, dF, eam, grid, block: int = 128,
               unroll: int = 1):
    """Kernel F of the R/F split: UNMASKED assembled forces from the
    combined gradient phi' + (dF_i + dF_j) rho'.  ``dF`` is the
    per-slot half embedding derivative [cap, NC] (already masked by the
    caller)."""
    dims = grid.dims
    dtype = xi.dtype
    cap = xi.shape[0]
    nc, b, nblk, pad = _split_geometry(xi, grid, block)
    ncp = nblk * b
    if pad:
        xi = jnp.pad(xi, ((0, 0), (0, 0), (0, pad)),
                     constant_values=SENTINEL_CELL)
        nbr = jnp.pad(nbr, ((0, 0), (0, 0), (0, 0), (0, pad)),
                      constant_values=SENTINEL_CELL)

    rcut2 = float(grid.cutoff) ** 2
    pair_c = _poly_consts(eam.pair)
    rho_c = _poly_consts(eam.rho)
    interp = jax.default_backend() == "cpu"

    def tri_mask(cap):
        ti = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 0)
        tj = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 1)
        return ti < tj

    spec_i = pl.BlockSpec((cap, 3, b), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((NOF, cap, 3, b), lambda i: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((cap, b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec_oj = pl.BlockSpec((NOF, cap, b), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((cap, ncp), dtype)
    shpj = jax.ShapeDtypeStruct((NOF, cap, ncp), dtype)

    dF_n = jnp.stack([_roll_cells(dF, dims, off) for off in HALF_OFFSETS])
    dF_p, dF_np = dF, dF_n
    if pad:
        dF_p = jnp.pad(dF, ((0, 0), (0, pad)))
        dF_np = jnp.pad(dF_n, ((0, 0), (0, 0), (0, pad)))

    def sweep_f(xi_x, xi_y, xi_z, xj, tri, dfi, dfj):
        dx = xi_x[:, None, :] - xj[:, 0, :][None, :, :]
        dy = xi_y[:, None, :] - xj[:, 1, :][None, :, :]
        dz = xi_z[:, None, :] - xj[:, 2, :][None, :, :]
        r2 = dx * dx + dy * dy + dz * dz
        inside = r2 < rcut2
        if tri is not None:
            inside = inside & tri
        insf = inside.astype(dx.dtype)
        pg, rg = _horner_g2(r2, pair_c, rho_c)
        grad = (pg + (dfi[:, None, :] + dfj[None, :, :]) * rg) * insf
        return {"fx_i": -jnp.sum(grad * dx, 1),
                "fy_i": -jnp.sum(grad * dy, 1),
                "fz_i": -jnp.sum(grad * dz, 1),
                "fx_j": jnp.sum(grad * dx, 0),
                "fy_j": jnp.sum(grad * dy, 0),
                "fz_j": jnp.sum(grad * dz, 0)}

    def kern_f(xi_ref, nbr_ref, dfi_ref, dfn_ref, fx, fy, fz,
               fjx, fjy, fjz):
        xi_x = xi_ref[:, 0, :]
        xi_y = xi_ref[:, 1, :]
        xi_z = xi_ref[:, 2, :]
        dfi = dfi_ref[...]
        o = sweep_f(xi_x, xi_y, xi_z, xi_ref[...], tri_mask(cap),
                    dfi, dfi)
        fx[...] = o["fx_i"] + o["fx_j"]
        fy[...] = o["fy_i"] + o["fy_j"]
        fz[...] = o["fz_i"] + o["fz_j"]

        def body(m, _):
            o = sweep_f(xi_x, xi_y, xi_z, nbr_ref[m], None, dfi,
                        dfn_ref[m])
            fx[...] += o["fx_i"]
            fy[...] += o["fy_i"]
            fz[...] += o["fz_i"]
            fjx[m] = o["fx_j"]
            fjy[m] = o["fy_j"]
            fjz[m] = o["fz_j"]
            return 0

        jax.lax.fori_loop(0, NOF, body, 0, unroll=unroll)

    outs2 = pl.pallas_call(
        kern_f, grid=(nblk,),
        in_specs=[spec_i, spec_n, spec_o, spec_oj],
        out_specs=[spec_o] * 3 + [spec_oj] * 3,
        out_shape=[shp] * 3 + [shpj] * 3,
        interpret=interp,
    )(xi, nbr, dF_p, dF_np)
    outs2 = [o[..., :nc] for o in outs2]
    fx = _assemble(dims, outs2[0], outs2[3])
    fy = _assemble(dims, outs2[1], outs2[4])
    fz = _assemble(dims, outs2[2], outs2[5])
    return jnp.stack([fx, fy, fz], axis=1)


def eam_kernels_cl_split(xi, nbr, mask, eam, grid,
                         count_neighbors: bool = False,
                         neigh_r2: float = 0.0, block: int = 128,
                         unroll: int = 1):
    """Forces-only EAM via an R/F split instead of the A/B split.

    Kernel R sweeps the stencil for host density rho (+ neighbor
    counts) only; after the XLA embedding derivative, kernel F sweeps
    ONCE with the COMBINED gradient phi'(r^2) + (dF_i + dF_j) rho'(r^2)
    — the reference's loop-2 force expression with the pair term folded
    in (imd_forces_nbl.c:905-930 computes exactly this sum when PAIR and
    EAM2 are both active).  vs the A/B split: the pair-force work moves
    from the rho pass into the (mandatory) second pass, so the sweeps
    drop from [forces+rho] + [forces] to [rho] + [forces], cutting
    ~12% of VPU flops and 38% of the j-accumulator HBM traffic.

    Hot-loop only: no energies/virial here (observable intervals use
    eam_kernels_cl with need_energy=True).
    Returns cells-last (F [cap,3,NC], rho, nneigh).
    """
    maskf = mask.astype(xi.dtype)
    rho_t, nneigh = eam_r_pass(xi, nbr, eam, grid,
                               count_neighbors=count_neighbors,
                               neigh_r2=neigh_r2, block=block,
                               unroll=unroll)
    _, emb_g = eam.embed.interp(0, rho_t)
    dF = 0.5 * emb_g * maskf
    F = eam_f_pass(xi, nbr, dF, eam, grid, block=block, unroll=unroll)
    return (F * maskf[:, None, :], rho_t * maskf, nneigh * maskf)


# ---------------------------------------------------------------------------
# multi-type EAM engine (alloys): one-hot column select inside the sweep
# ---------------------------------------------------------------------------

def _mt_eval(x, consts_list, w_list, mode):
    """Evaluate per-column polynomials and one-hot-combine.

    ``consts_list``[c] = (coef, b, e) baked immediates; ``w_list``[c]
    the matching [ci,cj,b] one-hot weight.  mode 'v'|'g'|'vg'.  The
    per-column evaluations are dense (every column for every slot) —
    the TPU has no per-lane gather, so selecting by weighted sum is the
    idiomatic translation of per-type-pair table indexing (the
    reference gathers a column per pair, imd_forces_nbl.c:468-470; the
    column ORDER here is the engine layout, see EAMPotential).
    """
    v_tot = g_tot = None
    for consts, w in zip(consts_list, w_list):
        if mode == "v":
            v = _horner_v(x, consts)
            v_tot = v * w if v_tot is None else v_tot + v * w
        elif mode == "g":
            g = _horner_g(x, consts)
            g_tot = g * w if g_tot is None else g_tot + g * w
        else:
            v, g = _horner_vg(x, consts)
            v_tot = v * w if v_tot is None else v_tot + v * w
            g_tot = g * w if g_tot is None else g_tot + g * w
    if mode == "v":
        return v_tot
    if mode == "g":
        return g_tot
    return v_tot, g_tot


def _mt_axes(ti_f, tj_f, nt):
    """Per-axis one-hot factors: wi[p] = [ci,1,b] (i-slot type == p),
    wj[q] = [1,cj,b].  The full [ci,cj,b] col weight is wi[p]*wj[q];
    building the factors once lets the structured evaluators below skip
    whole products (source-only rho needs only one axis)."""
    wi = [(ti_f[:, None, :] == float(p)).astype(ti_f.dtype)
          for p in range(nt)]
    wj = [(tj_f[None, :, :] == float(q)).astype(ti_f.dtype)
          for q in range(nt)]
    return wi, wj


def mt_structure(pair_cs, rho_cs, nt):
    """Host-side column-structure detection over baked consts.

    - ``rho_src``: every rho column depends only on its SOURCE type
      (col s*nt+h identical across h) — true for every eam.alloy-style
      potential and for bench's tiled tables; the density sums then
      need nt polynomial evaluations instead of nt² and only ONE-AXIS
      weights (imd_forces_nbl.c pays ~nothing for type dispatch; this
      is the TPU counterpart).
    - ``pair_sym``: phi columns symmetric (the physical norm; ASYMPOT
      is the documented exception and runs the oracle engine) — pair
      needs nt(nt+1)/2 evaluations.
    """
    rho_src = all(rho_cs[s * nt + h] == rho_cs[s * nt]
                  for s in range(nt) for h in range(nt))
    pair_sym = all(pair_cs[a * nt + b] == pair_cs[b * nt + a]
                   for a in range(nt) for b in range(a + 1, nt))
    return rho_src, pair_sym


def _mt_pair_eval(x, pair_cs, wi, wj, nt, mode, pair_sym):
    """Pair-table select: Σ_cols poly_col(x)·wi[ti]·wj[tj].

    Symmetric tables evaluate each distinct column once; for nt == 2
    the cross weight falls out of partition-of-unity (wi/wj each sum
    to 1 over types) as 1 - w00 - w11 — no extra products."""
    if not pair_sym:
        w = [wi[p] * wj[q] for p in range(nt) for q in range(nt)]
        return _mt_eval(x, pair_cs, w, mode)
    if nt == 2:
        w00, w11 = wi[0] * wj[0], wi[1] * wj[1]
        return _mt_eval(x, [pair_cs[0], pair_cs[3], pair_cs[1]],
                        [w00, w11, 1.0 - w00 - w11], mode)
    ws, cs = [], []
    for a in range(nt):
        for b in range(a, nt):
            cs.append(pair_cs[a * nt + b])
            ws.append(wi[a] * wj[a] if a == b
                      else wi[a] * wj[b] + wi[b] * wj[a])
    return _mt_eval(x, cs, ws, mode)


def _mt_rho_eval(x, rho_cs, wi, wj, nt, mode, rho_src):
    """Density-table select, BOTH orientations from one set of
    polynomial evaluations.

    Returns (r_ij, r_ji): r_ij is the density at the i slot from the j
    slot (col tj*nt+ti → weight wi[q]·wj[p] for col (p,q)), r_ji the
    reverse.  Source-only tables need one poly per SOURCE type and a
    single-axis weight (no [ci,cj,b] weight products at all)."""
    if rho_src:
        ij = ji = None
        for s in range(nt):
            p = (_horner_v(x, rho_cs[s * nt]) if mode == "v"
                 else _horner_g(x, rho_cs[s * nt]))
            ij = p * wj[s] if ij is None else ij + p * wj[s]
            ji = p * wi[s] if ji is None else ji + p * wi[s]
        return ij, ji
    ij = ji = None
    for p in range(nt):
        for q in range(nt):
            v = (_horner_v(x, rho_cs[p * nt + q]) if mode == "v"
                 else _horner_g(x, rho_cs[p * nt + q]))
            wt = wi[q] * wj[p]            # col (p,q) seen from i
            w = wi[p] * wj[q]             # col (p,q) seen from j
            ij = v * wt if ij is None else ij + v * wt
            ji = v * w if ji is None else ji + v * w
    return ij, ji


def eam_kernels_cl_mt(xi, typ, mask, eam, grid, ntypes: int,
                      count_neighbors: bool = False,
                      neigh_r2: float = 0.0,
                      block: int = 128,
                      need_energy: bool = True,
                      need_stress: bool = False):
    """Cells-last multi-type EAM kernels (alloys on the fused hot loop).

    ``xi`` [cap, 3, NC] sentinel-filled positions (dead slots pushed to
    SENTINEL_DEAD), ``typ`` [cap, NC] int32 (-1 = dead), ``mask``
    [cap, NC] bool.  Builds the rolled neighbor views internally and
    returns cells-last (F, epot, rho_t, nneigh, virial, presstens).
    Type-pair table columns are selected in-kernel by one-hot weights:
    pair phi/grad use col = ti*nt+tj, the host densities use the
    engine's source-first rho layout (rho_i += col[tj,ti], rho_j +=
    col[ti,tj]; the reference accumulates the same quantities from its
    host-first table, imd_forces_nbl.c:468-470/843-872 — read_eam
    transposes on load), and the embedding
    derivative is selected per type on the XLA side.  Cost grows
    ~linearly with ntypes^2 polynomial evaluations; intended for
    nt <= 4.
    """
    nt = ntypes
    dims = grid.dims
    dtype = xi.dtype
    cap = xi.shape[0]
    nc = dims[0] * dims[1] * dims[2]
    cap_pad = ((cap + 7) // 8) * 8
    budget = block * 16 * 16
    b = max(128, (budget // (cap * cap_pad)) // 128 * 128)
    ncp = ((nc + b - 1) // b) * b
    nblk = ncp // b

    # rolled neighbor views with PBC shifts + invalid-cell sentinels
    # (prep_neighbors' logic on raw cells-last inputs)
    nbrs = []
    for off in HALF_OFFSETS:
        xj = _roll_cells(xi, dims, off)
        shift, cell_ok = _wrap_shift_mask_cl(grid, off, dtype)
        xj = xj + shift[None]
        xj = jnp.where(cell_ok[None, None, :], xj, SENTINEL_CELL)
        nbrs.append(xj)
    nbr = jnp.stack(nbrs)
    tf = jnp.clip(typ, 0, nt - 1).astype(dtype)      # dead slots -> col 0
    tf_n = jnp.stack([_roll_cells(tf, dims, off) for off in HALF_OFFSETS])
    pad = ncp - nc
    if pad:
        xi = jnp.pad(xi, ((0, 0), (0, 0), (0, pad)),
                     constant_values=SENTINEL_CELL)
        nbr = jnp.pad(nbr, ((0, 0), (0, 0), (0, 0), (0, pad)),
                      constant_values=SENTINEL_CELL)
        tf = jnp.pad(tf, ((0, 0), (0, pad)))
        tf_n = jnp.pad(tf_n, ((0, 0), (0, 0), (0, pad)))

    rcut2 = float(grid.cutoff) ** 2
    nr2 = float(neigh_r2 if neigh_r2 > 0 else rcut2)
    pair_cs = [_poly_consts(eam.pair, c) for c in range(nt * nt)]
    rho_cs = [_poly_consts(eam.rho, c) for c in range(nt * nt)]
    interp = jax.default_backend() == "cpu"

    def tri_mask(cap):
        ti = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 0)
        tj = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 1)
        return ti < tj

    rho_src, pair_sym = mt_structure(pair_cs, rho_cs, nt)

    def sweep_a(xi_x, xi_y, xi_z, ti_f, xj, tj_f, tri):
        dx = xi_x[:, None, :] - xj[:, 0, :][None, :, :]
        dy = xi_y[:, None, :] - xj[:, 1, :][None, :, :]
        dz = xi_z[:, None, :] - xj[:, 2, :][None, :, :]
        r2 = dx * dx + dy * dy + dz * dz
        inside = r2 < rcut2
        if tri is not None:
            inside = inside & tri
        insf = inside.astype(dx.dtype)
        wi, wj = _mt_axes(ti_f, tj_f, nt)
        out = {}
        if need_energy:
            phi, grad = _mt_pair_eval(r2, pair_cs, wi, wj, nt, "vg",
                                      pair_sym)
            phi = phi * insf
            out["e_i"] = 0.5 * jnp.sum(phi, 1)
            out["e_j"] = 0.5 * jnp.sum(phi, 0)
        else:
            grad = _mt_pair_eval(r2, pair_cs, wi, wj, nt, "g", pair_sym)
        grad = grad * insf
        # rho_i += col(tj,ti); rho_j += col(ti,tj) — one poly eval per
        # distinct column, both orientations combined (_mt_rho_eval)
        rv_ij, rv_ji = _mt_rho_eval(r2, rho_cs, wi, wj, nt, "v", rho_src)
        rv_ij = rv_ij * insf
        rv_ji = rv_ji * insf
        out["rho_i"] = jnp.sum(rv_ij, 1)
        out["rho_j"] = jnp.sum(rv_ji, 0)
        if count_neighbors:
            near = insf * (r2 < nr2).astype(dx.dtype)
            out["nn_i"] = jnp.sum(near, 1)
            out["nn_j"] = jnp.sum(near, 0)
        out["fx_i"] = -jnp.sum(grad * dx, 1)
        out["fy_i"] = -jnp.sum(grad * dy, 1)
        out["fz_i"] = -jnp.sum(grad * dz, 1)
        out["fx_j"] = jnp.sum(grad * dx, 0)
        out["fy_j"] = jnp.sum(grad * dy, 0)
        out["fz_j"] = jnp.sum(grad * dz, 0)
        if need_stress:
            out["vxx_i"] = -jnp.sum(grad * dx * dx, 1)
            out["vyy_i"] = -jnp.sum(grad * dy * dy, 1)
            out["vzz_i"] = -jnp.sum(grad * dz * dz, 1)
            out["vyz_i"] = -jnp.sum(grad * dy * dz, 1)
            out["vzx_i"] = -jnp.sum(grad * dz * dx, 1)
            out["vxy_i"] = -jnp.sum(grad * dx * dy, 1)
        return out

    keys = ["fx", "fy", "fz", "rho"]
    if need_energy:
        keys.append("e")
    if count_neighbors:
        keys.append("nn")
    nk = len(keys)
    ikeys = [*STRESS_KEYS] if need_stress else []
    nik = len(ikeys)

    def kern_a(xi_ref, ti_ref, nbr_ref, tn_ref, *refs):
        iref, sref, jref = (refs[:nk], refs[nk:nk + nik],
                            refs[nk + nik:])
        xi_x = xi_ref[:, 0, :]
        xi_y = xi_ref[:, 1, :]
        xi_z = xi_ref[:, 2, :]
        ti_f = ti_ref[...]
        o = sweep_a(xi_x, xi_y, xi_z, ti_f, xi_ref[...], ti_f,
                    tri_mask(cap))
        for k, name in enumerate(keys):
            iref[k][...] = o[name + "_i"] + o[name + "_j"]
        for k, name in enumerate(ikeys):
            sref[k][...] = o[name + "_i"]

        def body(m, _):
            o = sweep_a(xi_x, xi_y, xi_z, ti_f, nbr_ref[m], tn_ref[m],
                        None)
            for k, name in enumerate(keys):
                iref[k][...] += o[name + "_i"]
                jref[k][m] = o[name + "_j"]
            for k, name in enumerate(ikeys):
                sref[k][...] += o[name + "_i"]
            return 0

        jax.lax.fori_loop(0, NOF, body, 0)

    spec_i = pl.BlockSpec((cap, 3, b), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_t = pl.BlockSpec((cap, b), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((NOF, cap, 3, b), lambda i: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_tn = pl.BlockSpec((NOF, cap, b), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    spec_o = spec_t
    spec_oj = spec_tn
    shp = jax.ShapeDtypeStruct((cap, ncp), dtype)
    shpj = jax.ShapeDtypeStruct((NOF, cap, ncp), dtype)

    outs = pl.pallas_call(
        kern_a, grid=(nblk,),
        in_specs=[spec_i, spec_t, spec_n, spec_tn],
        out_specs=[spec_o] * (nk + nik) + [spec_oj] * nk,
        out_shape=[shp] * (nk + nik) + [shpj] * nk,
        interpret=interp,
    )(xi, tf, nbr, tf_n)
    outs = [o[..., :nc] for o in outs]
    acc = {name: _assemble(dims, outs[k], outs[nk + nik + k])
           for k, name in enumerate(keys)}
    stress_a = {name: outs[nk + k] for k, name in enumerate(ikeys)}
    fx, fy, fz, rho_t = acc["fx"], acc["fy"], acc["fz"], acc["rho"]
    maskf = mask.astype(dtype)
    epot = acc["e"] if need_energy else jnp.zeros_like(rho_t)
    nneigh = acc["nn"] if count_neighbors else jnp.zeros_like(rho_t)

    # ---- embedding: per-type column select (XLA elementwise) ----------
    emb_v = emb_g = None
    for p in range(nt):
        v, g = eam.embed.interp(p, jnp.maximum(rho_t, 1e-12))
        sel = (jnp.clip(typ, 0, nt - 1) == p).astype(dtype)
        emb_v = v * sel if emb_v is None else emb_v + v * sel
        emb_g = g * sel if emb_g is None else emb_g + g * sel
    if need_energy:
        epot = (epot + emb_v) * maskf
    dF = 0.5 * emb_g * maskf

    dF_n = jnp.stack([_roll_cells(dF, dims, off) for off in HALF_OFFSETS])
    dF_p, dF_np = dF, dF_n
    if pad:
        dF_p = jnp.pad(dF, ((0, 0), (0, pad)))
        dF_np = jnp.pad(dF_n, ((0, 0), (0, 0), (0, pad)))

    def sweep_b(xi_x, xi_y, xi_z, ti_f, xj, tj_f, tri, dfi, dfj):
        dx = xi_x[:, None, :] - xj[:, 0, :][None, :, :]
        dy = xi_y[:, None, :] - xj[:, 1, :][None, :, :]
        dz = xi_z[:, None, :] - xj[:, 2, :][None, :, :]
        r2 = dx * dx + dy * dy + dz * dz
        inside = r2 < rcut2
        if tri is not None:
            inside = inside & tri
        insf = inside.astype(dx.dtype)
        wi, wj = _mt_axes(ti_f, tj_f, nt)
        # drho_{col(tj,ti)} / drho_{col(ti,tj)} from one eval per column
        g_ij, g_ji = _mt_rho_eval(r2, rho_cs, wi, wj, nt, "g", rho_src)
        grad = (dfi[:, None, :] * g_ij + dfj[None, :, :] * g_ji) * insf
        out = {"fx_i": -jnp.sum(grad * dx, 1),
               "fy_i": -jnp.sum(grad * dy, 1),
               "fz_i": -jnp.sum(grad * dz, 1),
               "fx_j": jnp.sum(grad * dx, 0),
               "fy_j": jnp.sum(grad * dy, 0),
               "fz_j": jnp.sum(grad * dz, 0)}
        if need_stress:
            out["vxx_i"] = -jnp.sum(grad * dx * dx, 1)
            out["vyy_i"] = -jnp.sum(grad * dy * dy, 1)
            out["vzz_i"] = -jnp.sum(grad * dz * dz, 1)
            out["vyz_i"] = -jnp.sum(grad * dy * dz, 1)
            out["vzx_i"] = -jnp.sum(grad * dz * dx, 1)
            out["vxy_i"] = -jnp.sum(grad * dx * dy, 1)
        return out

    keys_b = ["fx", "fy", "fz"]
    nkb = len(keys_b)

    def kern_b(xi_ref, ti_ref, nbr_ref, tn_ref, dfi_ref, dfn_ref, *refs):
        iref, sref, jref = (refs[:nkb], refs[nkb:nkb + nik],
                            refs[nkb + nik:])
        xi_x = xi_ref[:, 0, :]
        xi_y = xi_ref[:, 1, :]
        xi_z = xi_ref[:, 2, :]
        ti_f = ti_ref[...]
        dfi = dfi_ref[...]
        o = sweep_b(xi_x, xi_y, xi_z, ti_f, xi_ref[...], ti_f,
                    tri_mask(cap), dfi, dfi)
        for k, name in enumerate(keys_b):
            iref[k][...] = o[name + "_i"] + o[name + "_j"]
        for k, name in enumerate(ikeys):
            sref[k][...] = o[name + "_i"]

        def body(m, _):
            o = sweep_b(xi_x, xi_y, xi_z, ti_f, nbr_ref[m], tn_ref[m],
                        None, dfi, dfn_ref[m])
            for k, name in enumerate(keys_b):
                iref[k][...] += o[name + "_i"]
                jref[k][m] = o[name + "_j"]
            for k, name in enumerate(ikeys):
                sref[k][...] += o[name + "_i"]
            return 0

        jax.lax.fori_loop(0, NOF, body, 0)

    outs2 = pl.pallas_call(
        kern_b, grid=(nblk,),
        in_specs=[spec_i, spec_t, spec_n, spec_tn, spec_o, spec_oj],
        out_specs=[spec_o] * (nkb + nik) + [spec_oj] * nkb,
        out_shape=[shp] * (nkb + nik) + [shpj] * nkb,
        interpret=interp,
    )(xi, tf, nbr, tf_n, dF_p, dF_np)
    outs2 = [o[..., :nc] for o in outs2]
    fx = fx + _assemble(dims, outs2[0], outs2[nkb + nik + 0])
    fy = fy + _assemble(dims, outs2[1], outs2[nkb + nik + 1])
    fz = fz + _assemble(dims, outs2[2], outs2[nkb + nik + 2])

    F = jnp.stack([fx, fy, fz], axis=1) * maskf[:, None, :]
    if need_stress:
        presstens = jnp.stack(
            [jnp.sum(stress_a[n]) + jnp.sum(outs2[nkb + k])
             for k, n in enumerate(ikeys)])
        virial = presstens[0] + presstens[1] + presstens[2]
    else:
        presstens = jnp.zeros((6,), dtype)
        virial = jnp.zeros((), dtype)
    return (F, epot * maskf, rho_t * maskf, nneigh * maskf, virial,
            presstens)


def compute_eam_forces_pallas_mt(scene: Scene, eam, ntypes: int,
                                 count_neighbors: bool = False,
                                 neigh_r2: float = 0.0,
                                 block: int = 128,
                                 need_energy: bool = True,
                                 need_stress: Optional[bool] = None
                                 ) -> ForceResult:
    """Multi-type (alloy) EAM with Pallas blocked sweeps (Scene wrapper
    around eam_kernels_cl_mt; round-1 gap: alloys fell back to the
    slower XLA engine)."""
    if need_stress is None:
        need_stress = need_energy
    grid = scene.grid
    dims = grid.dims
    typ = _to_cl(scene.type, dims)
    mask = typ >= 0
    pos = _to_cl(scene.pos, dims)
    xi = jnp.where(mask[:, None, :], pos, SENTINEL_DEAD)
    F, epot, rho_t, nneigh, virial, presstens = eam_kernels_cl_mt(
        xi, typ, mask, eam, grid, ntypes,
        count_neighbors=count_neighbors, neigh_r2=neigh_r2, block=block,
        need_energy=need_energy, need_stress=need_stress)
    return ForceResult(
        force=_from_cl(F, dims), epot=_from_cl(epot, dims),
        virial=virial, presstens=presstens,
        num_neighs=_from_cl(nneigh.astype(jnp.int32), dims),
        rho=_from_cl(rho_t, dims))


# ---------------------------------------------------------------------------
# v2 engine: the 13-offset loop rides the pallas grid (output revisiting)
# ---------------------------------------------------------------------------

def compute_eam_forces_pallas2(scene: Scene, eam, ntypes: int = 1,
                               count_neighbors: bool = False,
                               neigh_r2: float = 0.0,
                               block: int = 512,
                               need_energy: bool = True) -> ForceResult:
    """EAM engine with grid = (cell-blocks, offsets) instead of an
    in-kernel fori_loop over the 13 stencil offsets.

    Why: v1 keeps the full [13, cap, 3, b] neighbor stack resident in
    VMEM (6.4 MB at cap 16, b 256), which caps the lane-block size.  Here
    each grid step streams ONE offset's neighbor view (Mosaic
    double-buffers the DMA across grid steps) while the i-side
    accumulators revisit the same output block (index map constant in m,
    so they stay VMEM-resident across the inner grid dimension).  The
    freed VMEM buys 2-4x larger b - fewer grid iterations and less
    per-block overhead.  Numerics identical to v1.
    """
    grid_g = scene.grid
    dims = grid_g.dims
    dtype = scene.pos.dtype
    cap = scene.capacity
    nc = dims[0] * dims[1] * dims[2]

    b = max(128, block // 128 * 128)
    ncp = ((nc + b - 1) // b) * b
    nblk = ncp // b

    xi, nbr, mask = prep_neighbors(scene)
    pad = ncp - nc
    if pad:
        xi = jnp.pad(xi, ((0, 0), (0, 0), (0, pad)),
                     constant_values=SENTINEL_CELL)
        nbr = jnp.pad(nbr, ((0, 0), (0, 0), (0, 0), (0, pad)),
                      constant_values=SENTINEL_CELL)

    rcut2 = float(grid_g.cutoff) ** 2
    nr2 = float(neigh_r2 if neigh_r2 > 0 else rcut2)
    pair_c = _poly_consts(eam.pair)
    rho_c = _poly_consts(eam.rho)
    interp = jax.default_backend() == "cpu"

    sweep_a = _make_sweep(rcut2, nr2, "A", pair_c, rho_c,
                          want_energy=need_energy,
                          want_nn=count_neighbors)
    keys = ["fx", "fy", "fz", "rho"]
    if need_energy:
        keys.append("e")
    if count_neighbors:
        keys.append("nn")
    nk = len(keys)

    def tri_mask(cap):
        ti = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 0)
        tj = jax.lax.broadcasted_iota(jnp.int32, (cap, cap, 1), 1)
        return ti < tj

    def kern_a(xi_ref, nbr_ref, *refs):
        iref, jref = refs[:nk], refs[nk:]
        m = pl.program_id(1)
        xi_x = xi_ref[:, 0, :]
        xi_y = xi_ref[:, 1, :]
        xi_z = xi_ref[:, 2, :]

        @pl.when(m == 0)
        def _():
            o = sweep_a(xi_x, xi_y, xi_z, xi_ref[...], tri_mask(cap),
                        None, None)
            for k, name in enumerate(keys):
                iref[k][...] = o[name + "_i"] + o[name + "_j"]

        @pl.when(m > 0)
        def _():
            o = sweep_a(xi_x, xi_y, xi_z, nbr_ref[0], None, None, None)
            for k, name in enumerate(keys):
                iref[k][...] += o[name + "_i"]
                jref[k][0] = o[name + "_j"]

    spec_i = pl.BlockSpec((cap, 3, b), lambda i, m: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((1, cap, 3, b),
                          lambda i, m: (jnp.maximum(m - 1, 0), 0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((cap, b), lambda i, m: (0, i),
                          memory_space=pltpu.VMEM)
    spec_oj = pl.BlockSpec((1, cap, b),
                           lambda i, m: (jnp.maximum(m - 1, 0), 0, i),
                           memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((cap, ncp), dtype)
    shpj = jax.ShapeDtypeStruct((NOF, cap, ncp), dtype)

    outs = pl.pallas_call(
        kern_a, grid=(nblk, NOF + 1),
        in_specs=[spec_i, spec_n],
        out_specs=[spec_o] * nk + [spec_oj] * nk,
        out_shape=[shp] * nk + [shpj] * nk,
        interpret=interp,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xi, nbr)
    outs = [o[..., :nc] for o in outs]
    acc = {name: _assemble(dims, outs[k], outs[nk + k])
           for k, name in enumerate(keys)}
    fx, fy, fz, rho_t = acc["fx"], acc["fy"], acc["fz"], acc["rho"]
    maskf = mask.astype(dtype)
    epot = acc["e"] if need_energy else jnp.zeros_like(rho_t)
    nneigh = acc["nn"] if count_neighbors else jnp.zeros_like(rho_t)

    emb_v, emb_g = eam.embed.interp(0, rho_t)
    if need_energy:
        epot = (epot + emb_v) * maskf
    dF = 0.5 * emb_g * maskf

    dF_n = jnp.stack([_roll_cells(dF, dims, off) for off in HALF_OFFSETS])
    dF_p, dF_np = dF, dF_n
    if pad:
        dF_p = jnp.pad(dF, ((0, 0), (0, pad)))
        dF_np = jnp.pad(dF_n, ((0, 0), (0, 0), (0, pad)))

    sweep_b = _make_sweep(rcut2, nr2, "B", None, rho_c)

    def kern_b(xi_ref, nbr_ref, dfi_ref, dfn_ref, fx, fy, fz,
               fjx, fjy, fjz):
        m = pl.program_id(1)
        xi_x = xi_ref[:, 0, :]
        xi_y = xi_ref[:, 1, :]
        xi_z = xi_ref[:, 2, :]
        dfi = dfi_ref[...]

        @pl.when(m == 0)
        def _():
            o = sweep_b(xi_x, xi_y, xi_z, xi_ref[...], tri_mask(cap),
                        dfi, dfi)
            fx[...] = o["fx_i"] + o["fx_j"]
            fy[...] = o["fy_i"] + o["fy_j"]
            fz[...] = o["fz_i"] + o["fz_j"]

        @pl.when(m > 0)
        def _():
            o = sweep_b(xi_x, xi_y, xi_z, nbr_ref[0], None, dfi,
                        dfn_ref[0])
            fx[...] += o["fx_i"]
            fy[...] += o["fy_i"]
            fz[...] += o["fz_i"]
            fjx[0] = o["fx_j"]
            fjy[0] = o["fy_j"]
            fjz[0] = o["fz_j"]

    spec_df = pl.BlockSpec((cap, b), lambda i, m: (0, i),
                           memory_space=pltpu.VMEM)
    spec_dfn = pl.BlockSpec((1, cap, b),
                            lambda i, m: (jnp.maximum(m - 1, 0), 0, i),
                            memory_space=pltpu.VMEM)
    outs2 = pl.pallas_call(
        kern_b, grid=(nblk, NOF + 1),
        in_specs=[spec_i, spec_n, spec_df, spec_dfn],
        out_specs=[spec_o] * 3 + [spec_oj] * 3,
        out_shape=[shp] * 3 + [shpj] * 3,
        interpret=interp,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xi, nbr, dF_p, dF_np)
    outs2 = [o[..., :nc] for o in outs2]
    fx = fx + _assemble(dims, outs2[0], outs2[3])
    fy = fy + _assemble(dims, outs2[1], outs2[4])
    fz = fz + _assemble(dims, outs2[2], outs2[5])

    F = jnp.stack([fx, fy, fz], axis=1) * maskf[:, None, :]
    virial = jnp.zeros((), dtype)
    return ForceResult(
        force=_from_cl(F, dims), epot=_from_cl(epot * maskf, dims),
        virial=virial, presstens=jnp.zeros((6,), dtype),
        num_neighs=_from_cl((nneigh * maskf).astype(jnp.int32), dims),
        rho=_from_cl(rho_t * maskf, dims))
