"""MEAM: modified embedded-atom method with angular screening.

Reference: imd_forces_meam.c (do_forces2, :25-608; init_meam :609) —
Baskes-style MEAM over per-atom neighbor tables with hand-derived
four-loop forces.  The TPU-native design is energy-first: the total
energy is one masked all-interaction expression and `jax.grad` supplies
exact forces (same stance as models/covalent.py).  The pieces, matching
the reference term by term:

- many-body screening  S_ij = prod_k s_kij  with the elliptic parameter
  C_kij = (2(x_ik+x_jk) - (x_ik-x_jk)^2 - 1)/(1 - (x_ik-x_jk)^2),
  s = [1-(1-c_red)^4]^2 on cmin<C<cmax  (meam:143-222);
- radial cutoff  fc = [1-(1-(rcut-r)/deltar)^4]^2  band (meam:227-244);
- atomic densities rho_a^(l) = S fc f0 exp(-beta_l (r/r0-1)), l=0..3
  (meam:246-260; tabulated el_density for l=0 supported via `rho0_fn`);
- angular partial densities via Legendre sums
  rho2_l = sum_j fl_l[j] rho_a_l[j],  fl_l[j] = sum_k rho_a_l[k] P_l(cos)
  with P_1=c, P_2=c^2-1/3, P_3=c^3-0.6c  (meam:262-344, k-loop includes
  k=j as in the reference);
- gamma = (t1 rho2_1 + t2 rho2_2 + t3 rho2_3)/rho_0^2, g = 2/(1+e^-gamma),
  rho = rho_0 g, optional t-averaging by rho_a0 weights (meam:346-372);
- embedding F = E A (rho/rho0) ln(rho/rho0) (pre_embed, meam:383-390) or
  a user-supplied tabulated F;
- screened pair term 0.5 sum_j S_ij phi(r_ij) (meam:423-436).

O(N * n_neigh^2)-masked like the reference's triple loops; intended for
the same 10^2-10^4-atom workloads as the covalent oracles.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

_EPS = 1e-10


class MEAMParams(NamedTuple):
    """Single- or multi-species MEAM constants (meam_* tags, imd_param.c).

    Per-type arrays have shape [ntypes]; cmin/cmax are [nt, nt, nt]
    indexed [k_typ, i_typ, j_typ]; rcut/deltar are [nt, nt].
    """
    t1: jnp.ndarray
    t2: jnp.ndarray
    t3: jnp.ndarray
    f0: jnp.ndarray
    r0: jnp.ndarray
    beta0: jnp.ndarray
    beta1: jnp.ndarray
    beta2: jnp.ndarray
    beta3: jnp.ndarray
    cmin: jnp.ndarray
    cmax: jnp.ndarray
    rcut: jnp.ndarray
    deltar: jnp.ndarray
    e: jnp.ndarray          # cohesive-energy scale of F
    a: jnp.ndarray          # embedding prefactor A
    rho0: jnp.ndarray       # reference density of F
    t_average: bool = False


def meam_al_params(dtype=jnp.float64) -> MEAMParams:
    """Baskes PRB 46, 2727 (1992) table-I aluminium, single species."""
    one = lambda v: jnp.asarray([v], dtype)  # noqa: E731
    return MEAMParams(
        t1=one(1.78), t2=one(2.21), t3=one(8.01), f0=one(1.0),
        r0=one(2.8637), beta0=one(2.21), beta1=one(2.59), beta2=one(6.0),
        beta3=one(2.59), cmin=jnp.full((1, 1, 1), 0.8, dtype),
        cmax=jnp.full((1, 1, 1), 2.8, dtype),
        rcut=jnp.full((1, 1), 4.5, dtype),
        deltar=jnp.full((1, 1), 0.45, dtype),
        e=one(3.353), a=one(1.07), rho0=one(1.0))


def _legendre(c):
    return c, c * c - 1.0 / 3.0, c * (c * c - 0.6)


def meam_energy(pos, types=None, box=None, mask=None,
                P: Optional[MEAMParams] = None,
                pair_fn: Optional[Callable] = None,
                rho0_fn: Optional[Callable] = None,
                embed_fn: Optional[Callable] = None):
    """Total MEAM energy; differentiable (forces = -grad).

    ``pair_fn(r, ti, tj)`` is the screened pair potential (phi in
    meam:429); default 0.  ``rho0_fn(r, ti, tj)`` optionally replaces the
    exponential l=0 density (have_eldensity_file path, meam:249-254).
    ``embed_fn(rho, ti)`` optionally replaces the analytic embedding.
    """
    n = pos.shape[0]
    dtype = pos.dtype
    if mask is None:
        mask = jnp.ones(n, bool)
    if types is None:
        types = jnp.zeros(n, jnp.int32)
    if P is None:
        P = meam_al_params(dtype)
    P = MEAMParams(*[jnp.asarray(v, dtype) for v in P[:-1]], P.t_average)

    dr = pos[:, None, :] - pos[None, :, :]          # [i, j, 3] = x_j - x_i
    dr = -dr                                         # d[j] in ref: x_j - x_i
    if box is not None:
        dr = box.min_image(dr)
    r2 = jnp.sum(dr * dr, -1)
    off = ~jnp.eye(n, dtype=bool) & mask[:, None] & mask[None, :]
    rcut_ij = P.rcut[types[:, None], types[None, :]]
    nb = off & (r2 < rcut_ij * rcut_ij)              # [i, j] neighbor mask
    r2s = jnp.where(nb, r2, 1.0)
    r = jnp.sqrt(r2s)
    invr = 1.0 / r
    invr2 = 1.0 / r2s

    # ---- screening S_ij = prod_k s_kij (meam:143-222) -------------------
    # geometry of the k-th neighbor relative to pair (i, j)
    d_jk = dr[:, None, :, :] - dr[:, :, None, :]     # [i, j, k, 3]
    r2_jk = jnp.sum(d_jk * d_jk, -1)
    cosjk = jnp.einsum("ijc,ikc->ijk", dr, dr) * invr[:, :, None] \
        * invr[:, None, :]
    considered = (nb[:, :, None] & nb[:, None, :]
                  & ~jnp.eye(n, dtype=bool)[None, :, :]
                  & (cosjk > _EPS)
                  & (jnp.einsum("ijkc,ijc->ijk", d_jk, dr) < -_EPS))
    x_ik = r2s[:, None, :] * invr2[:, :, None]       # r_k^2 / r_j^2
    x_jk = r2_jk * invr2[:, :, None]
    t1m = x_ik - x_jk
    t2m = 1.0 - t1m * t1m
    c_full = (2.0 * (x_ik + x_jk) - t1m * t1m - 1.0) / \
        jnp.where(jnp.abs(t2m) > _EPS, t2m, 1.0)
    cmin = P.cmin[types[None, None, :], types[:, None, None],
                  types[None, :, None]]
    cmax = P.cmax[types[None, None, :], types[:, None, None],
                  types[None, :, None]]
    c_red = (c_full - cmin) / (cmax - cmin)
    c_red_c = jnp.clip(c_red, 0.0, 1.0)
    om = 1.0 - c_red_c
    s_kij = (1.0 - om * om * om * om) ** 2
    s_kij = jnp.where(considered, s_kij, 1.0)
    S = jnp.prod(s_kij, axis=2) * nb.astype(dtype)   # [i, j]

    # ---- radial cutoff band (meam:227-244) ------------------------------
    deltar_ij = P.deltar[types[:, None], types[None, :]]
    tmp = jnp.clip(1.0 - (rcut_ij - r) / deltar_ij, 0.0, 1.0)
    t4 = tmp * tmp * tmp * tmp
    fc = (1.0 - t4) ** 2 * nb.astype(dtype)

    # ---- atomic densities (meam:246-260) --------------------------------
    tj = types[None, :].repeat(n, 0)
    sfc = S * fc
    pre = sfc * P.f0[tj]
    x = r * (1.0 / P.r0[tj]) - 1.0
    if rho0_fn is not None:
        rho_a0 = S * jnp.where(nb, rho0_fn(r, types[:, None], tj), 0.0)
    else:
        rho_a0 = pre * jnp.exp(-P.beta0[tj] * x)
    rho_a1 = pre * jnp.exp(-P.beta1[tj] * x)
    rho_a2 = pre * jnp.exp(-P.beta2[tj] * x)
    rho_a3 = pre * jnp.exp(-P.beta3[tj] * x)

    # ---- angular partial densities (meam:262-344) -----------------------
    l1, l2, l3 = _legendre(jnp.where(nb[:, :, None] & nb[:, None, :],
                                     cosjk, 0.0))
    rho_0 = jnp.sum(rho_a0, 1)
    fl1 = jnp.einsum("ik,ijk->ij", rho_a1, l1)
    fl2 = jnp.einsum("ik,ijk->ij", rho_a2, l2)
    fl3 = jnp.einsum("ik,ijk->ij", rho_a3, l3)
    rho2_1 = jnp.sum(fl1 * rho_a1, 1)
    rho2_2 = jnp.sum(fl2 * rho_a2, 1)
    rho2_3 = jnp.sum(fl3 * rho_a3, 1)

    has_rho = rho_0 > 0.0
    rho_0s = jnp.where(has_rho, rho_0, 1.0)
    if P.t_average:
        t1a = jnp.sum(P.t1[tj] * rho_a0, 1) / rho_0s
        t2a = jnp.sum(P.t2[tj] * rho_a0, 1) / rho_0s
        t3a = jnp.sum(P.t3[tj] * rho_a0, 1) / rho_0s
    else:
        t1a, t2a, t3a = P.t1[types], P.t2[types], P.t3[types]
    gamma = (t1a * rho2_1 + t2a * rho2_2 + t3a * rho2_3) / (rho_0s * rho_0s)
    g = 2.0 / (1.0 + jnp.exp(-gamma))
    rho = rho_0s * g

    # ---- embedding (meam:374-395) ---------------------------------------
    if embed_fn is not None:
        f_emb = embed_fn(rho, types)
    else:
        t_rel = rho / P.rho0[types]
        f_emb = P.e[types] * P.a[types] * t_rel * \
            jnp.log(jnp.where(has_rho, t_rel, 1.0))
    e_embed = jnp.sum(jnp.where(has_rho & mask, f_emb, 0.0))

    # ---- screened pair term (meam:423-436) ------------------------------
    if pair_fn is not None:
        phi = jnp.where(nb, pair_fn(r, types[:, None], tj), 0.0)
        e_pair = 0.5 * jnp.sum(S * phi)
    else:
        e_pair = jnp.zeros((), dtype)
    return e_embed + e_pair


def meam_forces(pos, types=None, box=None, mask=None, P=None,
                pair_fn=None, rho0_fn=None, embed_fn=None):
    """(energy, forces) via autodiff; forces are exact gradients."""
    def efn(p):
        return meam_energy(p, types, box, mask, P, pair_fn, rho0_fn,
                           embed_fn)
    e, grad = jax.value_and_grad(efn)(pos)
    return e, -grad
