"""ADP: Mishin's angular-dependent potential (EAM + dipole/quadrupole).

Reference: the ADP blocks of the primary NBL engine
(imd_forces_nbl.c:891-930 force terms; mu/lambda accumulation in loop 1
and adp_upot/adp_wpot tables read via setup_potentials,
imd_potential.c).  Energy functional (Mishin et al., Acta Mater. 53,
4041 (2005)):

    E = sum_i F(rho_i) + 1/2 sum_ij phi(r_ij)
        + 1/2 sum_i |mu_i|^2 + 1/2 sum_i sum_ab lambda_i,ab^2
        - 1/6 sum_i nu_i^2
    mu_i     = sum_j u(r_ij) d_ij                (dipole distortion)
    lambda_i = sum_j w(r_ij) d_ij (x) d_ij       (quadrupole distortion)
    nu_i     = tr lambda_i

TPU-native stance: the energy is one masked all-pairs expression and
`jax.grad` yields the exact forces, replacing the reference's
hand-derived mu/lambda force algebra (forces_nbl:892-930).  Oracle
O(N^2) scale like models/covalent.py; the production path stays the
EAM Pallas engine.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class ADPFuncs(NamedTuple):
    """Callables of r (masked entries are fed r=1): phi/rho/u/w + embed.

    Mirrors the five tabulated functions of the ADP setfl format
    (adp_upot/adp_wpot + the EAM phi/rho/F, imd_potential.c).
    """
    phi: Callable        # pair potential phi(r)
    rho: Callable        # host density rho(r)
    embed: Callable      # embedding F(rho_total)
    u: Callable          # dipole weight u(r)
    w: Callable          # quadrupole weight w(r)
    r_cut: float


def adp_demo_funcs(r_cut: float = 5.0, r0: float = 2.86,
                   ec: float = 3.0) -> ADPFuncs:
    """Smooth analytic demo parameterization (Al-like scales) with the
    standard (r_cut - r)^2-type cutoff smoothing on every radial part."""
    def cut(r):
        x = jnp.clip((r_cut - r) / r_cut, 0.0, 1.0)
        return x * x * (3.0 - 2.0 * x)

    def phi(r):
        return 0.4 * ((r0 / r) ** 8 - 2.0 * (r0 / r) ** 4) * cut(r)

    def rho(r):
        return jnp.exp(-1.7 * (r / r0 - 1.0)) * cut(r)

    def embed(rho_t):
        rs = jnp.maximum(rho_t, 1e-12)
        return -ec * jnp.sqrt(rs)

    def u(r):
        return 0.1 * jnp.exp(-2.0 * (r / r0 - 1.0)) * cut(r)

    def w(r):
        return 0.05 * jnp.exp(-2.5 * (r / r0 - 1.0)) * cut(r)

    return ADPFuncs(phi=phi, rho=rho, embed=embed, u=u, w=w, r_cut=r_cut)


def adp_energy(pos, box=None, mask=None,
               funcs: Optional[ADPFuncs] = None):
    """Total ADP energy; differentiable (forces = -grad)."""
    n = pos.shape[0]
    dtype = pos.dtype
    if mask is None:
        mask = jnp.ones(n, bool)
    if funcs is None:
        funcs = adp_demo_funcs()

    dr = pos[None, :, :] - pos[:, None, :]            # d_ij = x_j - x_i
    if box is not None:
        dr = box.min_image(dr)
    r2 = jnp.sum(dr * dr, -1)
    off = ~jnp.eye(n, dtype=bool) & mask[:, None] & mask[None, :]
    nb = off & (r2 < funcs.r_cut ** 2)
    r = jnp.sqrt(jnp.where(nb, r2, 1.0))
    nbf = nb.astype(dtype)

    # EAM parts
    e_pair = 0.5 * jnp.sum(funcs.phi(r) * nbf)
    rho_t = jnp.sum(funcs.rho(r) * nbf, 1)
    e_embed = jnp.sum(jnp.where(mask, funcs.embed(rho_t), 0.0))

    # dipole distortion mu_i = sum_j u(r) d  (forces_nbl:895-903)
    uw = funcs.u(r) * nbf
    mu = jnp.einsum("ij,ijc->ic", uw, dr)
    e_mu = 0.5 * jnp.sum(jnp.where(mask[:, None], mu, 0.0) ** 2)

    # quadrupole lambda_i = sum_j w(r) d(x)d  (forces_nbl:907-929)
    ww = funcs.w(r) * nbf
    lam = jnp.einsum("ij,ija,ijb->iab", ww, dr, dr)
    nu = jnp.trace(lam, axis1=1, axis2=2)
    lam2 = jnp.sum(lam * lam, axis=(1, 2))
    e_lam = jnp.sum(jnp.where(mask, 0.5 * lam2 - nu * nu / 6.0, 0.0))

    return e_pair + e_embed + e_mu + e_lam


def adp_forces(pos, box=None, mask=None, funcs=None):
    """(energy, forces) via autodiff."""
    e, g = jax.value_and_grad(
        lambda p: adp_energy(p, box, mask, funcs))(pos)
    return e, -g
