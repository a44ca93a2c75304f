"""Bond-boost hyperdynamics (imd_bboost.c; Miron & Fichthorn,
J. Chem. Phys. 119, 6210 (2003)).

The reference's imd_bboost.c relaxes the start configuration
(bb_minimize, :194) and records the reference bond table within
bb_rcut (do_bb_neightab, :124); the boost bias then lives on the
relative bond strains eps_b = (r_b - r_b^0)/r_b^0:

    dV(eps) = (dVmax / N_b) sum_b (1 - (eps_b/q)^2)   for |eps_b| < q

which vanishes smoothly as any bond approaches the strain threshold q
(a transition state), so dynamics on the boosted surface crosses
barriers unbiased.  The hyperdynamics clock advances by
dt * exp(dV / T) per step.

TPU design: the bond list is static after init; per-step bias energy
and forces come from one gather + jax.grad - fully jittable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu.scene import Scene


def init_bboost(scene: Scene, rcut: float):
    """Reference bond table (i_id, j_id, r0) within rcut (host side)."""
    flat = scene.flatten_atoms()
    m = np.asarray(flat["mask"])
    pos = np.asarray(flat["pos"])[m]
    ids = np.asarray(flat["id"])[m]
    box_diag = np.diag(np.asarray(scene.grid.box.h))
    from scipy.spatial import cKDTree
    pbc_b = np.asarray(scene.grid.box.pbc, bool)
    bs = np.where(pbc_b, box_diag, 1e6 * box_diag.max()).astype(float)
    wrapped = np.mod(pos.astype(float), bs)
    wrapped = np.where(wrapped >= bs, 0.0, wrapped)
    tree = cKDTree(wrapped, boxsize=bs)
    pairs = tree.query_pairs(rcut, output_type="ndarray")
    d = pos[pairs[:, 1]] - pos[pairs[:, 0]]
    for ax in range(3):
        if pbc_b[ax]:
            d[:, ax] -= box_diag[ax] * np.round(d[:, ax] / box_diag[ax])
    r0 = np.linalg.norm(d, axis=-1)
    return (jnp.asarray(ids[pairs[:, 0]]), jnp.asarray(ids[pairs[:, 1]]),
            jnp.asarray(r0))


def _pos_by_id(scene: Scene, n_ids: int) -> jnp.ndarray:
    flat_pos = scene.pos.reshape(-1, 3)
    flat_id = jnp.where(scene.mask, scene.id, n_ids).reshape(-1)
    return jnp.zeros((n_ids + 1, 3), scene.pos.dtype
                     ).at[flat_id].set(flat_pos)[:n_ids]


def bond_boost(scene: Scene, bi, bj, r0, dvmax, q, n_ids: int
               ) -> Tuple[Scene, jnp.ndarray, jnp.ndarray]:
    """Add the boost force; returns (scene, dV, max_strain)."""
    box_diag = jnp.diag(scene.grid.box.h)
    pbc = jnp.asarray(scene.grid.box.pbc)

    def bias(pid):
        d = pid[bi] - pid[bj]
        d = d - jnp.where(pbc, box_diag * jnp.round(d / box_diag), 0.0)
        r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-30))
        eps = (r - r0) / r0
        x = eps / q
        per_bond = jnp.where(jnp.abs(x) < 1.0, 1.0 - x * x, 0.0)
        return dvmax / bi.shape[0] * jnp.sum(per_bond)

    pid = _pos_by_id(scene, n_ids)
    dv, g = jax.value_and_grad(bias)(pid)
    # scatter -grad back onto the slots
    f_slot = -g[jnp.clip(scene.id, 0, n_ids - 1)]
    f_slot = f_slot * scene.fmask()[..., None]
    max_eps = _max_strain(pid, bi, bj, r0, box_diag, pbc)
    return scene.replace(force=scene.force + f_slot), dv, max_eps


def _max_strain(pid, bi, bj, r0, box_diag, pbc):
    d = pid[bi] - pid[bj]
    d = d - jnp.where(pbc, box_diag * jnp.round(d / box_diag), 0.0)
    r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-30))
    return jnp.max(jnp.abs((r - r0) / r0))


def boost_factor(dv, temperature):
    """Per-step hyperdynamics time multiplier exp(dV / k_B T)."""
    return jnp.exp(dv / jnp.maximum(temperature, 1e-30))
