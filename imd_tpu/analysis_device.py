"""Device-side structure analysis: neighbor lists + CNA at scale.

Why: the host analysis plugins (analysis.py) mirror the reference's
per-atom loops (imd_cna.c:32-460) faithfully but in Python-with-sets —
fine for dump-sized systems, hours at 1M atoms.  This module keeps the
whole pipeline on the TPU:

1. ``neighbor_lists``: padded [N, K] neighbor index lists built from the
   Scene's cell structure with the same 27-offset rolled-view sweep the
   force kernels use (no KD-tree, no host round-trip), chunked over
   cells so the candidate tensor stays VMEM/HBM-friendly.
2. ``cna_classes``: per-atom common-neighbor-analysis classification
   (fcc/hcp/bcc/other).  The reference's recursive "domino"
   longest-chain search (imd_cna.c:300-420) is replaced by closed-form
   graph tests that distinguish the signature triplets the classifier
   actually uses:

      (4,2,1) vs (4,2,2): two bonds share a vertex  <=> max degree 2
      (4,4,4): four bonds on four common neighbors, all degrees 2
               (a single 4-ring has longest chain 4)
      (6,6,6): six bonds on six common neighbors, all degrees 2 AND
               connected (one 6-ring, chain 6) — two disjoint
               triangles (chain 3) are rejected by a 3-step boolean
               reachability closure.

   Everything is batched boolean algebra on [chunk, K, K] tensors —
   no data-dependent control flow, so XLA maps it onto the VPU.

Atom order in all outputs is the flat cells-last slot order
``n = slot * n_cells + cell`` with an ``alive`` mask; use ``scene_ids``
to map back to atom numbers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu.ops.forces_fast import _roll_cells, _to_cl
from imd_tpu.ops.forces_pallas import _wrap_shift_mask_cl

# all 26 neighbor-cell offsets + the home cell
OFFSETS27 = [(ox, oy, oz)
             for ox in (-1, 0, 1) for oy in (-1, 0, 1) for oz in (-1, 0, 1)]

CNA_OTHER, CNA_FCC, CNA_HCP, CNA_BCC = 0, 1, 2, 3


def _cl_arrays(scene):
    dims = scene.grid.dims
    typ = _to_cl(scene.type, dims)
    alive = typ >= 0
    pos = _to_cl(scene.pos, dims)
    xi = jnp.where(alive[:, None, :], pos, 3.0e6)
    return xi, alive, dims


def scene_ids(scene):
    """[N] atom numbers in the flat slot order of this module (-1 dead)."""
    dims = scene.grid.dims
    ids = _to_cl(scene.id, dims)
    return ids.reshape(-1)


@functools.partial(jax.jit, static_argnames=("kmax", "chunk", "r_cut"))
def _neighbor_lists_impl(xi, alive, grid, r_cut, kmax, chunk):
    dims = grid.dims
    nc = dims[0] * dims[1] * dims[2]
    cap = xi.shape[0]
    rc2 = jnp.asarray(float(r_cut) ** 2, xi.dtype)

    views = []
    ids = []
    slot_cell = (jnp.arange(cap, dtype=jnp.int32)[:, None] * nc
                 + jnp.arange(nc, dtype=jnp.int32)[None, :])
    for off in OFFSETS27:
        sh, ok = _wrap_shift_mask_cl(grid, off, xi.dtype)
        xj = _roll_cells(xi, dims, off) + sh[None]
        xj = jnp.where(ok[None, None, :], xj, 3.0e6)
        views.append(xj)
        ids.append(_roll_cells(slot_cell, dims, off))
    xj = jnp.concatenate(views, axis=0)          # [27*cap, 3, NC]
    idj = jnp.concatenate(ids, axis=0)           # [27*cap, NC]

    ncp = ((nc + chunk - 1) // chunk) * chunk
    padn = ncp - nc
    if padn:
        xi = jnp.pad(xi, ((0, 0), (0, 0), (0, padn)),
                     constant_values=3.0e6)
        xj = jnp.pad(xj, ((0, 0), (0, 0), (0, padn)),
                     constant_values=-3.0e6)
        idj = jnp.pad(idj, ((0, 0), (0, padn)))
        slot_cell = jnp.pad(slot_cell, ((0, 0), (0, padn)))
    nchunk = ncp // chunk
    xic = xi.reshape(cap, 3, nchunk, chunk)
    xjc = xj.reshape(27 * cap, 3, nchunk, chunk)
    idc = idj.reshape(27 * cap, nchunk, chunk)
    sic = slot_cell.reshape(cap, nchunk, chunk)

    def one_chunk(args):
        xi_c, xj_c, id_c, si_c = args                 # [cap,3,C] ...
        d = xi_c[:, None] - xj_c[None]                # [cap, 27cap, 3, C]
        r2 = jnp.sum(d * d, axis=2)
        mask = (r2 < rc2) & (id_c[None] != si_c[:, None])
        # stable partition: real neighbors first (order irrelevant)
        order = jnp.argsort(~mask, axis=1, stable=True)[:, :kmax]
        nidx = jnp.take_along_axis(
            jnp.broadcast_to(id_c[None], mask.shape), order, axis=1)
        nvalid = jnp.take_along_axis(mask, order, axis=1)
        count = jnp.sum(mask, axis=1)
        return nidx, nvalid, count

    nidx, nvalid, count = jax.lax.map(
        one_chunk,
        (jnp.moveaxis(xic, 2, 0), jnp.moveaxis(xjc, 2, 0),
         jnp.moveaxis(idc, 1, 0), jnp.moveaxis(sic, 1, 0)))
    # [nchunk, cap, K|/, chunk] -> [cap, K, ncp] -> [N, K]
    nidx = jnp.moveaxis(nidx, 0, 2).reshape(cap, kmax, ncp)
    nvalid = jnp.moveaxis(nvalid, 0, 2).reshape(cap, kmax, ncp)
    count = jnp.moveaxis(count, 0, 1).reshape(cap, ncp)
    nidx = nidx[:, :, :nc].transpose(0, 2, 1).reshape(-1, kmax)
    nvalid = nvalid[:, :, :nc].transpose(0, 2, 1).reshape(-1, kmax)
    count = count[:, :nc].reshape(-1)
    alive_f = alive.reshape(-1)
    nvalid = nvalid & alive_f[:, None]
    overflow = jnp.max(jnp.where(alive_f, count, 0)) > kmax
    return nidx, nvalid, overflow


def neighbor_lists(scene, r_cut: float, kmax: int = 20, chunk: int = 1024):
    """Padded neighbor lists [N, kmax] in flat slot order + validity mask.

    Returns (nbr_idx, nbr_valid, alive, overflow): ``overflow`` is True
    when some atom has more than ``kmax`` neighbors (raise kmax).  The
    sweep is the same 27-offset rolled-view pattern as the force
    kernels (imd_forces_nbl.c:136's make_nblist, cells-last redesign).
    """
    xi, alive, _ = _cl_arrays(scene)
    nidx, nvalid, overflow = _neighbor_lists_impl(
        xi, alive, scene.grid, float(r_cut), kmax, chunk)
    return nidx, nvalid, alive.reshape(-1), overflow


@functools.partial(jax.jit, static_argnames=("chunk",))
def _cna_impl(nbr, nmask, alive, chunk):
    n, K = nbr.shape
    npad = ((n + chunk - 1) // chunk) * chunk - n
    nbr_p = jnp.pad(nbr, ((0, npad), (0, 0)))
    nmask_p = jnp.pad(nmask, ((0, npad), (0, 0)))

    def one_chunk(args):
        ni, mi = args                      # [C,K] int32, bool
        # gathered neighbor lists of my neighbors: [C,K,K]
        G = nbr_p[ni]
        Gm = nmask_p[ni] & mi[:, :, None]
        # A[a,b]: nbr[i,b] is a neighbor of nbr[i,a]
        eq = (G[:, :, :, None] == ni[:, None, None, :])   # [C,K,K,K]
        A = jnp.any(eq & Gm[:, :, :, None], axis=2)
        A = A & mi[:, :, None] & mi[:, None, :]
        # per bond k: common-neighbor mask = A[k, :]
        ncn = jnp.sum(A, axis=2)                          # [C,K]
        # bonds among common neighbors of (i, k):
        # B_k[a,b] = A[a,b] & A[k,a] & A[k,b]
        Bk = (A[:, None, :, :] & A[:, :, :, None]
              & A[:, :, None, :])                         # [C,K,K,K]
        nb = jnp.sum(Bk, axis=(2, 3)) // 2                # [C,K]
        deg = jnp.sum(Bk, axis=3)                         # [C,K,K]
        maxdeg = jnp.max(deg, axis=2)
        # all common members have degree exactly 2 (ring condition)
        common = A                                        # [C,K,K]
        all2 = jnp.all((deg == 2) | ~common, axis=2)
        # connectivity for the 666 case: 3-step boolean closure over Bk
        R = Bk | jnp.eye(K, dtype=bool)[None, None]
        for _ in range(3):
            R = jnp.einsum("ckab,ckbd->ckad", R.astype(jnp.int32),
                           R.astype(jnp.int32)) > 0
        conn = jnp.all(R | ~(common[:, :, :, None]
                             & common[:, :, None, :]), axis=(2, 3))
        s421 = (ncn == 4) & (nb == 2) & (maxdeg <= 1)
        s422 = (ncn == 4) & (nb == 2) & (maxdeg == 2)
        s444 = (ncn == 4) & (nb == 4) & all2
        s666 = (ncn == 6) & (nb == 6) & all2 & conn
        nn = jnp.sum(mi, axis=1)
        c421 = jnp.sum(s421 & mi, axis=1)
        c422 = jnp.sum(s422 & mi, axis=1)
        c444 = jnp.sum(s444 & mi, axis=1)
        c666 = jnp.sum(s666 & mi, axis=1)
        cls = jnp.where((c421 == 12) & (nn == 12), CNA_FCC,
                        jnp.where((c421 == 6) & (c422 == 6) & (nn == 12),
                                  CNA_HCP,
                                  jnp.where((c444 == 6) & (c666 == 8)
                                            & (nn == 14), CNA_BCC,
                                            CNA_OTHER)))
        return cls.astype(jnp.int32)

    nchunk = (n + npad) // chunk
    cls = jax.lax.map(one_chunk,
                      (nbr_p.reshape(nchunk, chunk, K),
                       nmask_p.reshape(nchunk, chunk, K)))
    return cls.reshape(-1)[:n] * alive.astype(jnp.int32)


def cna_classes(scene, r_cut: float, kmax: int = 20,
                chunk: int = 512) -> jnp.ndarray:
    """Per-atom CNA class [N] in flat slot order (imd_cna.c signatures:
    fcc = 12x(421), hcp = 6x(421)+6x(422), bcc = 6x(444)+8x(666)),
    entirely on device."""
    nbr, nmask, alive, overflow = neighbor_lists(scene, r_cut, kmax=kmax)
    cls = _cna_impl(nbr, nmask, alive, chunk)
    return jnp.where(overflow, -jnp.ones_like(cls), cls)


CNA_ICO = 4


@functools.partial(jax.jit, static_argnames=("chunk",))
def _aj_impl(pos_flat, box, nbr, nmask, alive, chunk):
    n, K = nbr.shape
    npad = ((n + chunk - 1) // chunk) * chunk - n
    pos_p = jnp.pad(pos_flat, ((0, npad), (0, 0)))
    nbr_p = jnp.pad(nbr, ((0, npad), (0, 0)))
    nmask_p = jnp.pad(nmask, ((0, npad), (0, 0)))
    edges = np.asarray([-1.01, -0.945, -0.915, -0.755, -0.195, 0.195,
                        0.245, 0.795, 1.01])
    kio = jnp.arange(K, dtype=jnp.int32)

    def one_chunk(args):
        ni, mi, pi = args                       # [C,K], [C,K], [C,3]
        pj = pos_p[ni]                          # [C,K,3]
        d = box.min_image(pj - pi[:, None, :])
        r2 = jnp.sum(d * d, axis=2)
        r2m = jnp.where(mi, r2, 1e30)
        # adaptive cutoff: (1.204 r0)^2 ~ 1.45 <r0^2 of 6 closest>
        r0sq = jnp.mean(jnp.sort(r2m, axis=1)[:, :6], axis=1)
        sel = mi & (r2m <= 1.45 * r0sq[:, None])
        n0 = jnp.sum(sel, axis=1)
        u = d / jnp.sqrt(jnp.maximum(r2, 1e-30))[..., None]
        cosg = jnp.einsum("cka,cla->ckl", u, u)
        pair = (sel[:, :, None] & sel[:, None, :]
                & (kio[None, :, None] < kio[None, None, :]))
        chi = []
        for b in range(8):
            inb = (cosg >= edges[b]) & (cosg < edges[b + 1]) & pair
            chi.append(jnp.sum(inb, axis=(1, 2)))
        c = [x.astype(pos_p.dtype) for x in chi]
        denom = c[5] + c[6] + c[7] - c[4]
        d_bcc = jnp.where(denom > 0, 0.35 * c[4]
                          / jnp.where(denom > 0, denom, 1.0), 100.0)
        d_cp = jnp.abs(1.0 - c[6] / 24.0)
        d_fcc = 0.61 * (jnp.abs(c[0] + c[1] - 6.0) + c[2]) / 6.0
        d_hcp = (jnp.abs(c[0] - 3.0)
                 + jnp.abs(c[0] + c[1] + c[2] + c[3] - 9.0)) / 12.0
        d_bcc = jnp.where(chi[0] == 7, 0.0, d_bcc)
        d_fcc = jnp.where(chi[0] == 6, 0.0, d_fcc)
        d_hcp = jnp.where(chi[0] <= 3, 0.0, d_hcp)
        # decision ladder (AJ 2006 Fig. 6 / imd_ada.c:120-210), applied
        # innermost-first so earlier conditions override later ones
        cls = jnp.where(d_hcp < d_fcc, CNA_HCP, CNA_FCC)
        cls = jnp.where((n0 == 11) | (n0 == 12), cls, CNA_OTHER)
        cls = jnp.where(d_bcc <= d_cp,
                        jnp.where(n0 >= 11, CNA_BCC, CNA_OTHER), cls)
        cls = jnp.where(c[4] < 3,
                        jnp.where((n0 >= 11) & (n0 <= 13), CNA_ICO,
                                  CNA_OTHER), cls)
        cls = jnp.where(c[7] > 0, CNA_OTHER, cls)
        cls = jnp.where(jnp.sum(mi, axis=1) < 6, CNA_OTHER, cls)
        return cls.astype(jnp.int32)

    nchunk = (n + npad) // chunk
    cls = jax.lax.map(one_chunk,
                      (nbr_p.reshape(nchunk, chunk, K),
                       nmask_p.reshape(nchunk, chunk, K),
                       pos_p.reshape(nchunk, chunk, 3)))
    return cls.reshape(-1)[:n] * alive.astype(jnp.int32)


def ackland_jones_classes(scene, r_cut: float = 0.0, kmax: int = 24,
                          chunk: int = 512) -> jnp.ndarray:
    """Per-atom Ackland-Jones class [N] in flat slot order (imd_ada.c;
    PRB 73, 054104 (2006)), entirely on device: candidate neighbors from
    the cell sweep, adaptive 1.45*<r0^2> cutoff, chi angular histogram
    as batched boolean bin tests, published decision ladder.

    ``r_cut``: candidate search radius (0 = 1.6x the mean atomic
    spacing, like the host plugin's guess).  Same class codes as
    analysis.ackland_jones (0=other 1=fcc 2=hcp 3=bcc 4=ico).
    """
    if r_cut <= 0:
        box_diag = np.diag(np.asarray(scene.grid.box.h))
        n_alive = max(int(scene.n_atoms()), 1)
        r_cut = 1.6 * float(np.prod(box_diag) / n_alive) ** (1.0 / 3.0)
    nbr, nmask, alive, overflow = neighbor_lists(scene, r_cut, kmax=kmax)
    xi, _, _ = _cl_arrays(scene)
    cap = xi.shape[0]
    nc = xi.shape[2]
    pos_flat = xi.transpose(0, 2, 1).reshape(-1, 3)
    cls = _aj_impl(pos_flat, scene.grid.box, nbr, nmask, alive, chunk)
    return jnp.where(overflow, -jnp.ones_like(cls), cls)


def hops_to_defect_device(scene, defect_flat, r_cut: float,
                          rounds: int = 3, kmax: int = 20) -> jnp.ndarray:
    """Bond-graph distance to the nearest defect atom, capped at
    ``rounds`` (imd_ada.c:300-349; 127 = farther) — the device twin of
    analysis.hops_to_defect for 1M-atom ablation snapshots.

    ``defect_flat``: per-slot bool in this module's flat order (e.g.
    ackland_jones_classes(scene) != 1).  Returns [N] int32 hop counts
    in flat slot order (0 = defect itself), 127 past ``rounds``.
    """
    nbr, nmask, alive, overflow = neighbor_lists(scene, r_cut, kmax=kmax)
    hops = jnp.where(jnp.asarray(defect_flat) & alive, 0, 127
                     ).astype(jnp.int32)

    def one_round(h, _):
        hn = jnp.where(nmask, jnp.take(h, nbr, axis=0), 127)
        best = jnp.min(hn, axis=1) + 1
        h2 = jnp.minimum(h, jnp.minimum(best, 127))
        return jnp.where(alive, h2, 127), None

    hops, _ = jax.lax.scan(one_round, hops, None, length=rounds)
    return jnp.where(overflow, -jnp.ones_like(hops), hops)


def nye_tensor_device(scene, ref_vectors, r_cut: float,
                      angle_cos: float = 0.9396926207859084,
                      kmax: int = 20):
    """Per-atom Nye tensor on device (calculateLcm/calculateNye,
    imd_nyeTensorAnalysis_3d.c:237/300; Hartley & Mishin) — the device
    twin of analysis.nye_tensor, batched 3x3 solves instead of per-atom
    host loops.

    Returns (alpha [N,3,3], lcm [N,3,3], alive [N]) in flat slot order.
    Orthorhombic minimum-image convention like the host plugin.
    """
    dtype = scene.pos.dtype
    refs = jnp.asarray(ref_vectors, dtype)
    nbr, nmask, alive, overflow = neighbor_lists(scene, r_cut, kmax=kmax)
    xi, _, _ = _cl_arrays(scene)
    pos = xi.transpose(0, 2, 1).reshape(-1, 3)          # flat [N, 3]
    box_diag = jnp.asarray(
        np.abs(np.diag(np.asarray(scene.grid.box.h))), dtype)

    d = jnp.take(pos, nbr, axis=0) - pos[:, None, :]    # [N, K, 3]
    # minimum image (periodic axes only)
    per = jnp.asarray([float(p) for p in scene.grid.box.pbc], dtype)
    d = d - jnp.round(d / box_diag) * box_diag * per
    vf = nmask.astype(dtype)[..., None]
    d = d * vf

    # pass 1: match neighbor vectors to the reference set
    lref = jnp.linalg.norm(refs, axis=-1)               # [R]
    l = jnp.linalg.norm(d, axis=-1)                     # [N, K]
    cosang = (d @ refs.T) / jnp.maximum(l[..., None] * lref, 1e-30)
    best = jnp.argmax(cosang, axis=-1)                  # [N, K]
    ok = (jnp.max(cosang, axis=-1) > angle_cos) & nmask
    perf = jnp.take(refs, best, axis=0)                 # [N, K, 3]
    okf = ok.astype(dtype)[..., None, None]
    A = jnp.sum(okf * d[..., :, None] * perf[..., None, :], axis=1)
    Bm = jnp.sum(okf * d[..., :, None] * d[..., None, :], axis=1)
    eye = jnp.eye(3, dtype=dtype)
    solvable = jnp.abs(jnp.linalg.det(A)) > 1e-10
    Asafe = jnp.where(solvable[:, None, None], A, eye)
    lcm = jnp.where(solvable[:, None, None],
                    jnp.linalg.solve(Asafe, Bm), eye)

    # pass 2: spatial gradient of the LCM over ALL neighbors
    A2 = jnp.sum(vf[..., None] * d[..., :, None] * d[..., None, :],
                 axis=1)
    de = jnp.take(lcm, nbr, axis=0) - lcm[:, None]      # [N, K, 3, 3]
    de = de * vf[..., None]
    C = jnp.sum(de[..., None] * d[:, :, None, None, :], axis=1)
    solv2 = jnp.abs(jnp.linalg.det(A2)) > 1e-10
    A2safe = jnp.where(solv2[:, None, None], A2, eye)
    # solve A2 g = C[:, i, j] for each of the 9 components
    Cflat = C.reshape(-1, 9, 3)                          # [N, ij, axis]
    g = jnp.linalg.solve(A2safe[:, None, :, :],
                         Cflat[..., None])[..., 0]       # [N, 9, 3]
    grd = jnp.where(solv2[:, None, None, None],
                    g.reshape(-1, 3, 3, 3), 0.0)
    alpha = jnp.stack([
        -grd[:, 2, :, 1] + grd[:, 1, :, 2],
        -grd[:, 0, :, 2] + grd[:, 2, :, 0],
        -grd[:, 1, :, 0] + grd[:, 0, :, 1],
    ], axis=1)
    af = alive.astype(dtype)[:, None, None]
    bad = jnp.broadcast_to(overflow, alpha.shape[:1])
    alpha = jnp.where(bad[:, None, None], jnp.nan, alpha * af)
    return alpha, lcm, alive
