"""Non-reflecting boundary conditions (NRB).

Rebuild of the reference's imd_nrb.c (impedance-matching boundary after
Comput. Mech. 50:645-655 (2012); fcc(100), in-plane atoms):

- `init_nrb` auto-detects the boundary layers of the (perfect) fcc
  lattice: atoms within alat/4 of the global x-max are type-1, of the
  y-min/y-max type-2/3 when y is open (init_nrb, imd_nrb.c:210-265), and
  captures each boundary atom's reference position and the ids of its 12
  in-plane fcc nearest neighbors by the component-wise +-alat/2 offset
  test (imd_nrb.c:330-520, `approx`);
- every step AFTER the force pass, each boundary atom's momentum is
  *computed* (not integrated):

      p_bnd/m = -k' D U_self + k' sum_r W U_r - 0.25 sum_r V_r

  with k' = sqrt(nrb_k/m), D = diag(4, 2 sqrt2, 2 sqrt2) and
  W = diag(1, sqrt2/2, sqrt2/2) for x-boundaries (axes permuted for y),
  U = displacement from the reference position and V the neighbor's
  pre-update velocity (nrb_forces, imd_nrb.c:792-1130); the integrator
  skips p += dt F for boundary atoms (imd_integrate.c:254-259).

TPU re-design: the reference tracks bnd/neigh pairs by scanning every
neighbor list for matching atom ids each step and weaves extra halo
exchanges into send_cells/send_forces (nrb_send_cells:1589).  Here the
boundary set is static after init, so we keep compact [n_bnd] / [n_bnd,12]
id tables plus captured reference positions, and each step build the
id -> flat-slot map with one scatter over scene.id (atoms move between
cells, ids do not), then gather/scatter-update the boundary momenta.
Under shard_map the gathers ride the same halo pattern as forces.

Restart: `write_nrb` / `read_nrb` persist the tables
(nrb_writerestart/readrestart, imd_nrb.c:2143/2217).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imd_tpu.scene import Scene

SQRT2HALF = 0.70710678118655     # globals.h:426
DBLSQRT2 = 2.82842712474619      # globals.h:427

# per-boundary-type neighbor sites, offsets in units of alat/2.  Each
# boundary atom couples only to its 4 INWARD fcc nearest neighbors (the
# site-matching conditions in imd_nrb.c:340-520 assign, e.g. for type 1 /
# x-hi, only the d.x = -nd sites 0/1/8/9); the NRBI array is sized 12 but
# at most 4 slots are filled per atom.
_TYPE_SITES = {
    1: [(0, (-1, 1, 0)), (1, (-1, -1, 0)),
        (8, (-1, 0, 1)), (9, (-1, 0, -1))],          # x-hi: inward = -x
    2: [(0, (-1, 1, 0)), (3, (1, 1, 0)),
        (7, (0, 1, 1)), (6, (0, 1, -1))],            # y-lo: inward = +y
    3: [(1, (-1, -1, 0)), (2, (1, -1, 0)),
        (4, (0, -1, 1)), (5, (0, -1, -1))],          # y-hi: inward = -y
}


class NRBState(struct.PyTreeNode):
    """Static boundary tables (leaves; shapes fixed at init)."""
    bnd_id: jnp.ndarray       # [nb] int32 atom ids of boundary atoms
    bnd_type: jnp.ndarray     # [nb] int32 1=x-hi, 2=y-lo, 3=y-hi
    bnd_ref: jnp.ndarray      # [nb, 3] reference positions
    neigh_id: jnp.ndarray     # [nb, 12] int32, -1 = missing
    neigh_ref: jnp.ndarray    # [nb, 12, 3]
    nrbk: jnp.ndarray         # scalar sqrt(nrb_k / mass)
    mass: jnp.ndarray         # scalar
    n_ids: int = struct.field(pytree_node=False)   # id-space size


def init_nrb(scene: Scene, alat: float, nrb_k: float, eps: float = 0.1,
             mass: float = 26.9815,
             pbc: Tuple[int, int, int] = (0, 1, 1)) -> Optional[NRBState]:
    """Detect boundary layers + capture neighbor ids (host-side, one-time;
    the reference also does this serially at init, imd_nrb.c:125-791)."""
    flat = scene.flatten_atoms()
    mask = np.asarray(flat["mask"])
    pos = np.asarray(flat["pos"])[mask]
    ids = np.asarray(flat["id"])[mask]
    n_ids = int(ids.max()) + 1 if ids.size else 0

    xhi = pos[:, 0].max() - alat / 4.0
    btype = np.zeros(len(pos), np.int32)
    btype[pos[:, 0] > xhi] = 1
    if not pbc[1]:
        ylo = pos[:, 1].min() + alat / 4.0
        yhi = pos[:, 1].max() - alat / 4.0
        btype[(btype == 0) & (pos[:, 1] < ylo)] = 2
        btype[(btype == 0) & (pos[:, 1] > yhi)] = 3

    bnd = np.nonzero(btype > 0)[0]
    if len(bnd) == 0:
        return None

    # neighbor capture by component-wise offset match (approx(), nrb.c:778)
    from scipy.spatial import cKDTree
    box = np.asarray(scene.grid.box.h)
    box_diag = np.diag(box)
    pbc_b = np.asarray(pbc, bool)
    if pbc_b.any():
        # cKDTree needs finite boxsize; a huge period on open axes is
        # equivalent to non-periodic (positions are wrapped into the box)
        tree = cKDTree(pos, boxsize=np.where(pbc_b, box_diag,
                                             1e6 * box_diag.max()))
    else:
        tree = cKDTree(pos)
    nd = alat / 2.0
    r_neigh = alat / math.sqrt(2.0) + eps * 3
    neigh_id = np.full((len(bnd), 12), -1, np.int32)
    neigh_ref = np.zeros((len(bnd), 12, 3))
    cand = tree.query_ball_point(pos[bnd], r_neigh)
    for b, (ai, cands) in enumerate(zip(bnd, cand)):
        d = pos[cands] - pos[ai]
        # minimum image on periodic axes
        for ax in range(3):
            if pbc[ax]:
                d[:, ax] -= box_diag[ax] * np.round(d[:, ax] / box_diag[ax])
        for s, off in _TYPE_SITES[int(btype[ai])]:
            hit = np.all(np.abs(d - np.asarray(off, float) * nd) < eps,
                         axis=1)
            j = np.nonzero(hit)[0]
            if len(j):
                cj = cands[j[0]]
                neigh_id[b, s] = ids[cj]
                neigh_ref[b, s] = pos[cj]

    dtype = scene.pos.dtype
    return NRBState(
        bnd_id=jnp.asarray(ids[bnd], jnp.int32),
        bnd_type=jnp.asarray(btype[bnd], jnp.int32),
        bnd_ref=jnp.asarray(pos[bnd], dtype),
        neigh_id=jnp.asarray(neigh_id, jnp.int32),
        neigh_ref=jnp.asarray(neigh_ref, dtype),
        nrbk=jnp.asarray(math.sqrt(nrb_k / mass), dtype),
        mass=jnp.asarray(mass, dtype),
        n_ids=n_ids)


def slot_of_id(scene: Scene, n_ids: int) -> jnp.ndarray:
    """[n_ids] flat-slot index of each atom id (-1 where id absent)."""
    flat = scene.flatten_atoms()
    m = flat["mask"]
    slots = jnp.arange(flat["id"].shape[0], dtype=jnp.int32)
    idx = jnp.full((n_ids,), -1, jnp.int32)
    return idx.at[jnp.where(m, flat["id"], n_ids)].set(
        jnp.where(m, slots, -1), mode="drop")


def bnd_mask(scene: Scene, state: NRBState) -> jnp.ndarray:
    """Scene-shaped bool: True for NRB boundary atoms (the integrator
    skips their momentum update, imd_integrate.c:254-259)."""
    idx = slot_of_id(scene, state.n_ids)
    slots = idx[state.bnd_id]
    m = jnp.zeros(scene.type.size, bool)
    m = m.at[jnp.where(slots >= 0, slots, scene.type.size)].set(
        True, mode="drop")
    return m.reshape(scene.type.shape)


def _weights(btype, nrbk, dtype):
    """Per-bnd-atom (D, W) diagonal weight rows [nb, 3]."""
    is_x = (btype == 1)[:, None]
    d_x = jnp.asarray([4.0, DBLSQRT2, DBLSQRT2], dtype)
    d_y = jnp.asarray([DBLSQRT2, 4.0, DBLSQRT2], dtype)
    w_x = jnp.asarray([1.0, SQRT2HALF, SQRT2HALF], dtype)
    w_y = jnp.asarray([SQRT2HALF, 1.0, SQRT2HALF], dtype)
    return (jnp.where(is_x, d_x, d_y) * nrbk,
            jnp.where(is_x, w_x, w_y) * nrbk)


def nrb_forces(scene: Scene, state: NRBState):
    """Set boundary-atom momenta (nrb_forces, imd_nrb.c:792-1130).

    Call after the force computation, before the integrator.  Returns
    (scene, bnd_mask) - pass the mask to the integrator so it skips
    p += dt F for boundary atoms.
    """
    dtype = scene.pos.dtype
    idx = slot_of_id(scene, state.n_ids)
    flat_pos = scene.pos.reshape(-1, 3)
    flat_mom = scene.mom.reshape(-1, 3)
    box = scene.grid.box

    b_slot = idx[state.bnd_id]                       # [nb]
    b_ok = b_slot >= 0
    b_pos = flat_pos[jnp.maximum(b_slot, 0)]
    u_self = box.min_image(b_pos - state.bnd_ref)

    n_slot = idx[jnp.maximum(state.neigh_id, 0)]     # [nb, 12]
    n_ok = (state.neigh_id >= 0) & (n_slot >= 0)
    n_pos = flat_pos[jnp.maximum(n_slot, 0)]         # [nb, 12, 3]
    n_mom = flat_mom[jnp.maximum(n_slot, 0)]
    u_n = box.min_image(n_pos - state.neigh_ref)
    okf = n_ok.astype(dtype)[..., None]

    d_row, w_row = _weights(state.bnd_type, state.nrbk, dtype)
    u_dot = (-d_row * u_self
             + jnp.sum(w_row[:, None, :] * u_n * okf, axis=1)
             - 0.25 * jnp.sum(n_mom / state.mass * okf, axis=1))
    p_new = jnp.where(b_ok[:, None], u_dot * state.mass,
                      flat_mom[jnp.maximum(b_slot, 0)])

    flat_mom = flat_mom.at[jnp.where(b_ok, b_slot, flat_mom.shape[0])].set(
        p_new, mode="drop")
    m = jnp.zeros(scene.type.size, bool)
    m = m.at[jnp.where(b_ok, b_slot, scene.type.size)].set(True, mode="drop")
    return (scene.replace(mom=flat_mom.reshape(scene.mom.shape)),
            m.reshape(scene.type.shape))


def nrb_forces_cl(xi, mom, alive, ids, box, state: NRBState):
    """Cells-last twin of nrb_forces for the fused hot loop
    (ops/fused_step.py): same impedance-matching update on the
    [cap, 3, NC] component layout, without the Scene round-trip.

    Returns (mom_set [cap, 3, NC], bnd [cap, NC]): ``mom_set`` has the
    boundary-atom momenta overwritten with the computed p_bnd; the
    integrator must keep those values (skip p += dt F) via ``bnd``.
    """
    dtype = xi.dtype
    cap, _, nc = xi.shape
    M = cap * nc
    ids_f = ids.reshape(M)
    alive_f = alive.reshape(M)
    slots = jnp.arange(M, dtype=jnp.int32)
    idx = jnp.full((state.n_ids,), -1, jnp.int32)
    idx = idx.at[jnp.where(alive_f, ids_f, state.n_ids)].set(
        jnp.where(alive_f, slots, -1), mode="drop")
    pos_f = [xi[:, c, :].reshape(M) for c in range(3)]
    mom_f = [mom[:, c, :].reshape(M) for c in range(3)]

    b_slot = idx[state.bnd_id]                       # [nb]
    b_ok = b_slot >= 0
    bs = jnp.maximum(b_slot, 0)
    b_pos = jnp.stack([p[bs] for p in pos_f], -1)    # [nb, 3]
    b_mom = jnp.stack([p[bs] for p in mom_f], -1)
    u_self = box.min_image(b_pos - state.bnd_ref)

    n_slot = idx[jnp.maximum(state.neigh_id, 0)]     # [nb, 12]
    n_ok = (state.neigh_id >= 0) & (n_slot >= 0)
    ns = jnp.maximum(n_slot, 0)
    n_pos = jnp.stack([p[ns] for p in pos_f], -1)    # [nb, 12, 3]
    n_mom = jnp.stack([p[ns] for p in mom_f], -1)
    u_n = box.min_image(n_pos - state.neigh_ref)
    okf = n_ok.astype(dtype)[..., None]

    d_row, w_row = _weights(state.bnd_type, state.nrbk, dtype)
    u_dot = (-d_row * u_self
             + jnp.sum(w_row[:, None, :] * u_n * okf, axis=1)
             - 0.25 * jnp.sum(n_mom / state.mass * okf, axis=1))
    p_new = jnp.where(b_ok[:, None], u_dot * state.mass, b_mom)

    tgt = jnp.where(b_ok, b_slot, M)
    mom_out = [mom_f[c].at[tgt].set(p_new[:, c], mode="drop")
               .reshape(cap, nc) for c in range(3)]
    bnd = jnp.zeros((M,), bool).at[tgt].set(True, mode="drop")
    return jnp.stack(mom_out, 1), bnd.reshape(cap, nc)


# ---------------------------------------------------------------------------
# restart files (nrb_writerestart/readrestart, imd_nrb.c:2143/2217)
# ---------------------------------------------------------------------------

def write_nrb(path: str, state: NRBState) -> None:
    """Text format: id type refx refy refz n0..n11 (one boundary atom per
    line, like the reference's .nrb files)."""
    with open(path, "w") as f:
        f.write(f"#NRB {len(np.asarray(state.bnd_id))} {state.n_ids}\n")
        bid = np.asarray(state.bnd_id)
        bt = np.asarray(state.bnd_type)
        br = np.asarray(state.bnd_ref)
        ni = np.asarray(state.neigh_id)
        nr = np.asarray(state.neigh_ref).reshape(len(bid), -1)
        for k in range(len(bid)):
            f.write(f"{bid[k]} {bt[k]} "
                    + " ".join(f"{x:.10g}" for x in br[k]) + " "
                    + " ".join(str(x) for x in ni[k]) + " "
                    + " ".join(f"{x:.10g}" for x in nr[k]) + "\n")
        f.write(f"#K {float(state.nrbk):.12g} {float(state.mass):.12g}\n")


def read_nrb(path: str, dtype=jnp.float32) -> NRBState:
    with open(path) as f:
        header = f.readline().split()
        nb, n_ids = int(header[1]), int(header[2])
        bid = np.zeros(nb, np.int32)
        bt = np.zeros(nb, np.int32)
        br = np.zeros((nb, 3))
        ni = np.zeros((nb, 12), np.int32)
        nr = np.zeros((nb, 36))
        for k in range(nb):
            tok = f.readline().split()
            bid[k] = int(tok[0]); bt[k] = int(tok[1])
            br[k] = [float(x) for x in tok[2:5]]
            ni[k] = [int(x) for x in tok[5:17]]
            nr[k] = [float(x) for x in tok[17:53]]
        tail = f.readline().split()
    return NRBState(bnd_id=jnp.asarray(bid), bnd_type=jnp.asarray(bt),
                    bnd_ref=jnp.asarray(br, dtype),
                    neigh_id=jnp.asarray(ni),
                    neigh_ref=jnp.asarray(nr.reshape(nb, 12, 3), dtype),
                    nrbk=jnp.asarray(float(tail[1]), dtype),
                    mass=jnp.asarray(float(tail[2]), dtype),
                    n_ids=n_ids)
