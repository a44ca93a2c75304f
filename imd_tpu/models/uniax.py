"""UNIAX: Gay-Berne uniaxial-molecule dynamics.

Reference: imd_gay_berne.c (pair potential + hand-derived force/torques,
:23-248) and imd_forces_uniax.c (cell-pair loop); integrator
move_atoms_nve UNIAX blocks (imd_integrate.c:378-386, 455-470): leapfrog
with angular momentum projected perpendicular to the axis and axis
renormalization each step.

TPU-native design: the standard Gay-Berne energy U(r12, e1, e2) with
exponents mu=2, nu=1 (gay_berne.c:34-41) written once; forces AND
torques come from `jax.grad` (torque_i = -e_i x dU/de_i), replacing the
reference's ~200 lines of chain-rule algebra.  All-pairs masked oracle
scale, matching the liquid-crystal workloads UNIAX targets.

State lives in a flat UniaxSystem pytree (axis/angular momentum are
per-molecule fields the cell Scene does not carry).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GayBerneParams(NamedTuple):
    """uniax_sigma = (s_perp, s_perp, s_par), uniax_eps = well depths
    (e_perp, e_perp, e_par) — the reference's s1/w1 shape vectors."""
    sigma_perp: float = 1.0
    sigma_par: float = 3.0
    eps_perp: float = 1.0     # side-to-side well depth
    eps_par: float = 0.2      # end-to-end well depth
    mu: float = 2.0
    nu: float = 1.0
    r_cut: float = 8.0


class UniaxSystem(NamedTuple):
    pos: jnp.ndarray       # [N, 3]
    axis: jnp.ndarray      # [N, 3] unit orientation (ACHSE)
    mom: jnp.ndarray       # [N, 3] linear momentum (IMPULS)
    angmom: jnp.ndarray    # [N, 3] angular momentum (DREH_IMPULS)
    mass: float
    inertia: float         # uniax_inert


def _gb_pair_energy(r12, e1, e2, P: GayBerneParams):
    """Gay-Berne pair energy; differentiable in r12, e1, e2."""
    sig0 = P.sigma_perp
    eps0 = P.eps_perp
    s_par2 = P.sigma_par ** 2
    s_perp2 = P.sigma_perp ** 2
    chi = (s_par2 - s_perp2) / (s_par2 + s_perp2)
    ep = P.eps_perp ** (1.0 / P.mu)
    ee = P.eps_par ** (1.0 / P.mu)
    chip = (ep - ee) / (ep + ee)

    rr = jnp.sqrt(jnp.sum(r12 * r12))
    rhat = r12 / rr
    a = jnp.dot(rhat, e1)
    b = jnp.dot(rhat, e2)
    c = jnp.dot(e1, e2)
    apb = (a + b) ** 2
    amb = (a - b) ** 2

    def aniso(x):
        return 1.0 - 0.5 * x * (apb / (1.0 + x * c) + amb / (1.0 - x * c))

    sig = sig0 / jnp.sqrt(aniso(chi))
    eps1 = 1.0 / jnp.sqrt(1.0 - (chi * c) ** 2)
    eps = eps0 * eps1 ** P.nu * aniso(chip) ** P.mu
    u = sig0 / (rr - sig + sig0)
    u6 = u ** 6
    return 4.0 * eps * (u6 * u6 - u6)


def gb_energy(pos, axis, P: GayBerneParams = GayBerneParams(),
              box=None, mask=None):
    """Total Gay-Berne energy over all pairs (masked O(N^2))."""
    n = pos.shape[0]
    if mask is None:
        mask = jnp.ones(n, bool)
    dr = pos[None, :, :] - pos[:, None, :]
    if box is not None:
        dr = box.min_image(dr)
    r2 = jnp.sum(dr * dr, -1)
    iu = jnp.triu_indices(n, 1)
    pairm = (mask[:, None] & mask[None, :])[iu] & (r2[iu] < P.r_cut ** 2)
    # keep masked pairs numerically tame: far separation along x
    drp = jnp.where(pairm[:, None], dr[iu[0], iu[1]],
                    jnp.asarray([10.0 * P.r_cut, 0.0, 0.0], pos.dtype))
    e = jax.vmap(lambda d, ea, eb: _gb_pair_energy(d, ea, eb, P))(
        drp, axis[iu[0]], axis[iu[1]])
    return jnp.sum(jnp.where(pairm, e, 0.0))


def gb_forces_torques(pos, axis, P: GayBerneParams = GayBerneParams(),
                      box=None, mask=None):
    """(epot, force, torque): torque_i = -e_i x dU/de_i."""
    e, (gp, ga) = jax.value_and_grad(gb_energy, argnums=(0, 1))(
        pos, axis, P, box, mask)
    force = -gp
    torque = -jnp.cross(axis, ga)
    return e, force, torque


def uniax_step(sys: UniaxSystem, dt: float,
               P: GayBerneParams = GayBerneParams(), box=None,
               mask=None):
    """Leapfrog NVE step (integrate.c:378-386, 413-417, 455-470).

    Returns (new_system, dict(epot, ekin_trans, ekin_rot)).
    """
    epot, force, torque_vec = gb_forces_torques(sys.pos, sys.axis, P, box,
                                                mask)
    # torque from grad is r x F-like already; the reference applies
    # dreh_moment directly, then removes the axis-parallel component of L
    L_half = sys.angmom + dt * torque_vec
    dot = 2.0 * jnp.sum(L_half * sys.axis, -1, keepdims=True)
    L_new = L_half - dot * sys.axis
    mom_new = sys.mom + dt * force
    pos_new = sys.pos + dt * mom_new / sys.mass
    omega = jnp.cross(L_new, sys.axis) / sys.inertia
    ax = sys.axis + dt * omega
    ax = ax / jnp.linalg.norm(ax, axis=-1, keepdims=True)
    ekin_t = 0.5 * jnp.sum(mom_new * mom_new) / sys.mass
    ekin_r = 0.5 * jnp.sum(L_new * L_new) / sys.inertia
    new = sys._replace(pos=pos_new, axis=ax, mom=mom_new, angmom=L_new)
    return new, {"epot": epot, "ekin_trans": ekin_t, "ekin_rot": ekin_r}


def make_uniax(pos, axis=None, mass=1.0, inertia=1.0, seed=0,
               dtype=jnp.float64) -> UniaxSystem:
    pos = jnp.asarray(pos, dtype)
    n = pos.shape[0]
    if axis is None:
        rng = np.random.default_rng(seed)
        ax = rng.normal(size=(n, 3))
        ax /= np.linalg.norm(ax, axis=1, keepdims=True)
        axis = jnp.asarray(ax, dtype)
    else:
        axis = jnp.asarray(axis, dtype)
    return UniaxSystem(pos=pos, axis=axis,
                       mom=jnp.zeros((n, 3), dtype),
                       angmom=jnp.zeros((n, 3), dtype),
                       mass=float(mass), inertia=float(inertia))
