"""EPITAX beam deposition (imd_epitax.c).

- ``create_atom`` (imd_epitax.c:25-160): place a new atom at a random
  x-y position at the current beam height, rejecting trials closer than
  ``epitax_cutoff`` to any existing atom, with downward momentum
  p_z = -sqrt(3 T m); the beam height rises by
  epitax_level * epitax_speed / (natoms - nepitax) per trial.
- ``delete_top_atoms`` (166-230): atoms reaching the top cell layer
  (reflected beam atoms) are removed.
- ``substrate_level`` (237-260): maximum z of the sample.

TPU design: insertion events are rare (one atom every 1/rate steps), so
they run host-side against the flat scene arrays; the Scene keeps its
static shape - a new atom just claims a dead slot in its target cell,
so the jitted step never recompiles.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu.scene import Scene


def substrate_level(scene: Scene) -> float:
    z = jnp.where(scene.mask, scene.pos[..., 2], -jnp.inf)
    return float(jnp.max(z))


def insert_atom(scene: Scene, pos, mom, typ: int, mass: float,
                new_id: int) -> Tuple[Scene, bool]:
    """Claim a dead slot in the cell containing ``pos`` (static shapes)."""
    grid = scene.grid
    box_diag = np.diag(np.asarray(grid.box.h))
    dims = np.asarray(grid.dims)
    cell_of = np.minimum(
        (np.asarray(pos) / box_diag * dims).astype(int), dims - 1)
    cx, cy, cz = (int(cell_of[0]), int(cell_of[1]), int(cell_of[2]))
    free = np.flatnonzero(~np.asarray(scene.mask[cx, cy, cz]))
    if len(free) == 0:
        return scene, False               # cell full - caller may rebin
    s = int(free[0])
    idx = (cx, cy, cz, s)
    dt = scene.pos.dtype
    return scene.replace(
        pos=scene.pos.at[idx].set(jnp.asarray(pos, dt)),
        mom=scene.mom.at[idx].set(jnp.asarray(mom, dt)),
        force=scene.force.at[idx].set(0.0),
        epot=scene.epot.at[idx].set(0.0),
        mass=scene.mass.at[idx].set(mass),
        type=scene.type.at[idx].set(typ),     # type >= 0 marks the slot live
        vtype=scene.vtype.at[idx].set(typ),
        id=scene.id.at[idx].set(new_id),
        nbl_ref_pos=scene.nbl_ref_pos.at[idx].set(
            jnp.asarray(pos, dt))), True


class EpitaxState:
    """Host-side beam bookkeeping (epitax_height/number/nepitax)."""

    def __init__(self, height: float, speed: float = 1.0,
                 level: float = 1.0, cutoff: float = 2.0,
                 sub_n: Optional[int] = None):
        self.height = height
        self.speed = speed
        self.level = level
        self.cutoff = cutoff
        self.number = 0        # atoms created so far
        self.nepitax = 0
        self.sub_n = sub_n     # ids <= sub_n are substrate atoms


def create_atom(scene: Scene, st: EpitaxState, rng: np.random.Generator,
                typ: int, mass: float, temp: float,
                max_trials: int = 10000) -> Tuple[Scene, bool]:
    """Deposit one beam atom (create_atom, imd_epitax.c:25)."""
    flat = scene.flatten_atoms()
    m = np.asarray(flat["mask"])
    pos_all = np.asarray(flat["pos"])[m]
    ids = np.asarray(flat["id"])[m]
    box_diag = np.diag(np.asarray(scene.grid.box.h))
    n_active = len(pos_all)
    from scipy.spatial import cKDTree
    bs = np.asarray([box_diag[0], box_diag[1], 1e6 * box_diag.max()],
                    float)
    wrapped = np.mod(pos_all.astype(float), bs)
    # f32 wrap can land exactly on the upper edge; cKDTree needs [0, bs)
    wrapped = np.where(wrapped >= bs, 0.0, wrapped)
    tree = cKDTree(wrapped, boxsize=bs)
    for j in range(max_trials):
        st.height += st.level * st.speed / max(n_active - st.nepitax, 1)
        trial = np.array([rng.random() * box_diag[0],
                          rng.random() * box_diag[1], st.height])
        d, _ = tree.query(np.mod(trial, bs))
        if d >= st.cutoff:
            break
    else:
        raise RuntimeError("EPITAX: 10000 search loops")
    if st.sub_n is None:
        st.sub_n = int(ids.max())
    new_id = st.sub_n + st.number + 1
    mom = np.array([0.0, 0.0, -np.sqrt(3.0 * temp * mass)])
    scene, ok = insert_atom(scene, trial, mom, typ, mass, new_id)
    if ok:
        st.number += 1
        st.nepitax += 1
    return scene, ok


def delete_top_atoms(scene: Scene) -> Tuple[Scene, int]:
    """Remove every atom binned in the top cell layer (delete_atoms)."""
    top = jnp.zeros(scene.mask.shape, bool).at[:, :, -1, :].set(True)
    kill = scene.mask & top
    n = int(jnp.sum(kill))
    return scene.replace(type=jnp.where(kill, -1, scene.type)), n
