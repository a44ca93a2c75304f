"""Covalent / angular potentials: Stillinger-Weber and Tersoff.

The reference implements these with hand-derived 3-body force loops over
per-atom neighbor tables (do_forces2/do_neightab,
imd_forces_covalent.c).  The TPU-native design is the functional one:
define the total ENERGY as a masked all-interaction expression and let
`jax.grad` produce exact forces - no hand-coded 3-body force algebra,
no neighbor-table second pass, and the gradient compiles into the same
fused XLA program.

These oracles are O(N^2)/O(N^3)-masked and meant for the covalent
workloads the reference targets (10^2-10^4-atom Si/C systems,
relaxation, NEB); the large-scale production path remains the EAM/pair
Pallas engine.

Parameter sets:
- SW: Stillinger & Weber, PRB 31, 5262 (1985) silicon (the reference
  reads the same constants from sw_* tags, imd_param.c).
- Tersoff: T3 silicon, PRB 38, 9902 (1988) (ters_* tags).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SWParams(NamedTuple):
    """Stillinger-Weber (single species; eV / Angstrom units)."""
    epsilon: float = 2.1683      # eV
    sigma: float = 2.0951        # A
    a: float = 1.80              # cutoff in sigma
    A: float = 7.049556277
    B: float = 0.6022245584
    p: float = 4.0
    q: float = 0.0
    lam: float = 21.0
    gamma: float = 1.20
    cos0: float = -1.0 / 3.0
    a2: float = 0.0       # 3-body cutoff in sigma (stiweb_a2); 0 -> a


class TersoffParams(NamedTuple):
    """Tersoff T3 silicon (PRB 38, 9902 (1988))."""
    A: float = 1830.8            # eV
    B: float = 471.18            # eV
    lam1: float = 2.4799         # 1/A
    lam2: float = 1.7322         # 1/A
    beta: float = 1.1e-6
    n: float = 0.78734
    c: float = 1.0039e5
    d: float = 16.217
    h: float = -0.59825
    R: float = 2.7               # cutoff start
    D: float = 0.3               # cutoff half-width


def _pairs(pos, box, mask):
    dr = pos[:, None, :] - pos[None, :, :]
    if box is not None:
        dr = box.min_image(dr)
    r2 = jnp.sum(dr * dr, -1)
    n = pos.shape[0]
    off = ~jnp.eye(n, dtype=bool) & mask[:, None] & mask[None, :]
    r = jnp.sqrt(jnp.where(off, r2, 1.0))
    return dr, r, off


def _ternbcc_g(c):
    """Piecewise angular function g(cos t) of the ternary-BCC variant
    (imd_forces_covalent.c:578-593): five parabolic segments favoring
    the BCC bond angles instead of SW's (cos t + 1/3)^2.  Forces here
    are the exact autodiff gradient of this energy; the reference's
    hand-coded dg (covalent.c:601-616) is half the analytic derivative
    in every branch — a factor-2 defect we deliberately do not copy."""
    return jnp.where(
        c < -5.0 / 6.0, (c + 1.0) ** 2,
        jnp.where(c < -0.5, 1.0 / 18.0 - (c + 2.0 / 3.0) ** 2,
                  jnp.where(c < -1.0 / 6.0, (c + 1.0 / 3.0) ** 2,
                            jnp.where(c < 1.0 / 6.0, 1.0 / 18.0 - c * c,
                                      (c - 1.0 / 3.0) ** 2))))


def sw_energy(pos, box=None, mask=None, P: SWParams = SWParams(),
              ternbcc: bool = False):
    """Total SW energy; differentiable (forces = -grad).

    ``ternbcc`` swaps the angular term for the ternary-BCC g(cos t)
    (TERNBCC, imd_forces_covalent.c:461-477)."""
    if mask is None:
        mask = jnp.ones(pos.shape[0], bool)
    P = SWParams(*[jnp.asarray(v, pos.dtype) for v in P])
    dr, r, off = _pairs(pos, box, mask)
    rc = P.a * P.sigma
    inside = off & (r < rc)
    x = r / P.sigma
    # two-body: A eps (B x^-p - x^-q) exp(1/(x-a)), cut at x = a
    expf = jnp.where(inside, jnp.exp(1.0 / jnp.where(inside, x - P.a, -1.0)),
                     0.0)
    v2 = P.A * P.epsilon * (P.B * x ** -P.p - x ** -P.q) * expf
    e2 = 0.5 * jnp.sum(jnp.where(inside, v2, 0.0))

    # three-body: lam eps (cos t - cos0)^2 exp(g/(x_ij-a2)) exp(g/(x_ik-a2))
    # with its OWN cutoff a2 (stiweb_a2, imd_param.c:2030; defaults to a)
    a3 = jnp.where(P.a2 > 0, P.a2, P.a)
    in3 = off & (r < a3 * P.sigma)
    g = jnp.where(in3, jnp.exp(P.gamma / jnp.where(in3, x - a3, -1.0)),
                  0.0)
    u = dr / (r * P.sigma)[..., None] * P.sigma   # unit vectors
    cosjk = jnp.einsum("ijc,ikc->ijk", dr, dr) / (r[:, :, None]
                                                  * r[:, None, :])
    hjk = _ternbcc_g(cosjk) if ternbcc else (cosjk - P.cos0) ** 2
    wjk = g[:, :, None] * g[:, None, :]
    valid3 = in3[:, :, None] & in3[:, None, :] \
        & ~jnp.eye(pos.shape[0], dtype=bool)[None, :, :]
    e3 = 0.5 * P.lam * P.epsilon * jnp.sum(jnp.where(valid3, hjk * wjk, 0.0))
    return e2 + e3


def tersoff_energy(pos, box=None, mask=None,
                   P: TersoffParams = TersoffParams()):
    """Total Tersoff energy; differentiable."""
    if mask is None:
        mask = jnp.ones(pos.shape[0], bool)
    P = TersoffParams(*[jnp.asarray(v, pos.dtype) for v in P])
    dr, r, off = _pairs(pos, box, mask)
    rc_hi = P.R + P.D
    inside = off & (r < rc_hi)
    # smooth cutoff fc
    fc = jnp.where(r < P.R - P.D, 1.0,
                   jnp.where(r < rc_hi,
                             0.5 - 0.5 * jnp.sin(0.5 * math.pi
                                                 * (r - P.R) / P.D), 0.0))
    fc = jnp.where(inside, fc, 0.0)
    f_rep = P.A * jnp.exp(-P.lam1 * r)
    f_att = -P.B * jnp.exp(-P.lam2 * r)

    cosjk = jnp.einsum("ijc,ikc->ijk", dr, dr) / (r[:, :, None]
                                                  * r[:, None, :])
    gth = 1.0 + (P.c / P.d) ** 2 - P.c ** 2 / (P.d ** 2
                                               + (P.h - cosjk) ** 2)
    valid3 = inside[:, :, None] & inside[:, None, :] \
        & ~jnp.eye(pos.shape[0], dtype=bool)[None, :, :]
    zeta = jnp.sum(jnp.where(valid3, fc[:, None, :] * gth, 0.0), axis=2)
    bij = (1.0 + (P.beta * jnp.maximum(zeta, 0.0)) ** P.n) ** (-0.5 / P.n)
    e = 0.5 * jnp.sum(fc * (f_rep + bij * f_att))
    return e


class TersoffMultiParams(NamedTuple):
    """Multi-species Tersoff with [nt, nt] pair-matrix parameters
    (init_tersoff, imd_forces_covalent.c:1447-1514).  ``B`` already
    carries the absorbed chi mixing factor; ``om`` has unit diagonal.
    The angular parameters ga/n/c2/d2/h are ALSO [nt, nt] matrices:
    for the reference's base TERSOFF build g(cos t) depends only on
    the center type (rows broadcast a per-type value,
    imd_forces_covalent.c:731-734), while the TERSOFF2 build fits them
    per type pair (covalent.c:726-730) — both are the same matrix
    gather here."""
    r0: jnp.ndarray       # fc == 1 below (ter_r0)
    r_cut: jnp.ndarray    # fc == 0 above (ter_r_cut)
    A: jnp.ndarray        # repulsive prefactor (ter_a)
    B: jnp.ndarray        # attractive prefactor x chi (ter_b)
    la: jnp.ndarray       # repulsive decay (ter_la)
    mu: jnp.ndarray       # attractive decay (ter_mu)
    om: jnp.ndarray       # zeta weight omega (ter_om, diag 1)
    ga: jnp.ndarray       # gamma in b_ij (ter_ga)
    n: jnp.ndarray        # exponent n (ter_n)
    c2: jnp.ndarray       # c^2 (ter_c2)
    d2: jnp.ndarray       # d^2 (ter_d2)
    h: jnp.ndarray        # angular offset (ter_h)


def tersoff_multi_energy(pos, types, box=None, mask=None,
                         P: TersoffMultiParams = None):
    """Total multi-species Tersoff energy; differentiable.

    The half-cosine cutoff runs ter_r0..ter_r_cut per type pair
    (imd_forces_covalent.c:685-699); zeta sums fc_ik om[ti,tk]
    g(cos theta_jik) over k != j with the angular function indexed by
    the (ti, tj) bond (covalent.c:723-736)."""
    if mask is None:
        mask = jnp.ones(pos.shape[0], bool)
    P = TersoffMultiParams(*[jnp.asarray(v, pos.dtype) for v in P])
    dr, r, off = _pairs(pos, box, mask)
    ti, tj = types[:, None], types[None, :]

    def pp(m):
        return m[ti, tj]

    r0, rc = pp(P.r0), pp(P.r_cut)
    inside = off & (r < rc)
    t = math.pi * (r - r0) / jnp.maximum(rc - r0, 1e-12)
    fc = jnp.where(r < r0, 1.0,
                   jnp.where(r < rc, 0.5 * (1.0 + jnp.cos(t)), 0.0))
    fc = jnp.where(inside, fc, 0.0)
    phi_r = pp(P.A) * jnp.exp(-pp(P.la) * r)
    phi_a = -pp(P.B) * jnp.exp(-pp(P.mu) * r)

    cosjk = jnp.einsum("ijc,ikc->ijk", dr, dr) / (r[:, :, None]
                                                  * r[:, None, :])
    h, c2, d2 = (pp(P.h)[:, :, None], pp(P.c2)[:, :, None],
                 pp(P.d2)[:, :, None])
    gth = 1.0 + c2 / d2 - c2 / (d2 + (h - cosjk) ** 2)
    w_ik = (fc * pp(P.om))[:, None, :]          # fc_ik om[ti,tk], k last
    valid3 = inside[:, None, :] \
        & ~jnp.eye(pos.shape[0], dtype=bool)[None, :, :]
    zeta = jnp.sum(jnp.where(valid3, w_ik * gth, 0.0), axis=2)
    # zeta == 0 (lone bond): b_ij = 1 exactly; the guarded where keeps
    # the n<1 power's gradient finite there (the reference special-cases
    # this with tmp_5 = 0, covalent.c:794-795)
    ga, n_ = pp(P.ga), pp(P.n)
    lone = zeta <= 0.0
    tmp4 = jnp.where(lone, 0.0, (ga * jnp.where(lone, 1.0, zeta)) ** n_)
    b_ij = (1.0 + tmp4) ** (-0.5 / n_)
    return 0.5 * jnp.sum(fc * (phi_r + b_ij * phi_a))


class TersoffModMultiParams(NamedTuple):
    """Multi-species modified Tersoff, [nt, nt] matrices throughout
    (init_tersoffmod, imd_forces_covalent.c:1525-1573; the base
    TERSOFFMOD build broadcasts per-type angular values across rows,
    TERSOFFMOD2 fits them per pair).  ``beta`` holds small integer
    exponents (1..3)."""
    r0: jnp.ndarray
    r_cut: jnp.ndarray
    A: jnp.ndarray
    B: jnp.ndarray
    la: jnp.ndarray
    mu: jnp.ndarray
    eta: jnp.ndarray
    delta: jnp.ndarray
    alpha: jnp.ndarray
    beta: jnp.ndarray     # integer exponent matrix
    c1: jnp.ndarray
    c2: jnp.ndarray
    c3: jnp.ndarray
    c4: jnp.ndarray
    c5: jnp.ndarray
    h: jnp.ndarray


def tersoffmod_multi_energy(pos, types, box=None, mask=None,
                            P: TersoffModMultiParams = None):
    """Total multi-species MOD-Tersoff energy; differentiable."""
    if mask is None:
        mask = jnp.ones(pos.shape[0], bool)
    beta_i = np.asarray(P.beta, np.int32)
    P = TersoffModMultiParams(*[jnp.asarray(v, pos.dtype) for v in P])
    dr, r, off = _pairs(pos, box, mask)
    ti, tj = types[:, None], types[None, :]

    def pp(m):
        return m[ti, tj]

    r0, rc = pp(P.r0), pp(P.r_cut)
    inside = off & (r < rc)
    fc = jnp.where(inside, _tersoffmod_fc(r, r0, rc), 0.0)

    cosjk = jnp.einsum("ijc,ikc->ijk", dr, dr) / (r[:, :, None]
                                                  * r[:, None, :])
    ht = pp(P.h)[:, :, None] - cosjk
    c1, c2, c3 = (pp(P.c1)[:, :, None], pp(P.c2)[:, :, None],
                  pp(P.c3)[:, :, None])
    c4, c5 = pp(P.c4)[:, :, None], pp(P.c5)[:, :, None]
    g = c1 + c2 * ht * ht / (c3 + ht * ht) \
        * (1.0 + c4 * jnp.exp(-c5 * ht * ht))
    # exp(alpha (r_ij - r_ik)^beta) with per-pair INTEGER beta: the
    # difference can be negative, so select among the small-integer
    # powers instead of a float pow (sign must survive odd exponents)
    drik = r[:, :, None] - r[:, None, :]
    bmat = jnp.asarray(beta_i)[ti, tj][:, :, None]
    powb = jnp.where(bmat == 1, drik,
                     jnp.where(bmat == 2, drik * drik,
                               drik * drik * drik))
    ex = jnp.exp(pp(P.alpha)[:, :, None] * powb)
    valid3 = inside[:, None, :] \
        & ~jnp.eye(pos.shape[0], dtype=bool)[None, :, :]
    zeta = jnp.sum(jnp.where(valid3, fc[:, None, :] * g * ex, 0.0),
                   axis=2)
    eta, delta = pp(P.eta), pp(P.delta)
    lone = zeta <= 0.0
    zpow = jnp.where(lone, 0.0, jnp.where(lone, 1.0, zeta) ** eta)
    b = (1.0 + zpow) ** (-delta)
    phi = 0.5 * (pp(P.A) * jnp.exp(-pp(P.la) * r)
                 - b * pp(P.B) * jnp.exp(-pp(P.mu) * r))
    return jnp.sum(fc * phi)


# ---------------------------------------------------------------------------
# neighbor-list (large-N) variants: the same energies over the fixed-K
# per-atom lists of ops/neighbors.py instead of the O(N^2) masks — the
# TPU analog of the reference's do_neightab/do_forces2 two-pass scheme
# (imd_forces_covalent.c:60-180 builds neightab once, the force loop
# walks it at O(N*k)).  Work is blocked over atoms with `lax.map` so
# the [B, K, K] angular scratch stays VMEM/HBM-bounded at any N.
# ---------------------------------------------------------------------------

def _blocked_sum(fn, arrs, block: int):
    """sum(fn(*rows)) over row blocks of ``block`` atoms (lax.map)."""
    M = arrs[0].shape[0]
    nb = max(1, -(-M // block))
    pad = nb * block - M
    xs = tuple(
        jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)).reshape(
            (nb, block) + a.shape[1:])
        for a in arrs)
    return jnp.sum(jax.lax.map(lambda t: fn(*t), xs))


def _sw_block(dr, r, nmask, P: SWParams, ternbcc: bool):
    """SW energy of one atom block over its neighbor rows."""
    r = jnp.where(nmask, r, 1.0)
    rc = P.a * P.sigma
    inside = nmask & (r < rc)
    x = r / P.sigma
    expf = jnp.where(
        inside, jnp.exp(1.0 / jnp.where(inside, x - P.a, -1.0)), 0.0)
    v2 = P.A * P.epsilon * (P.B * x ** -P.p - x ** -P.q) * expf
    e2 = 0.5 * jnp.sum(jnp.where(inside, v2, 0.0))

    a3 = jnp.where(P.a2 > 0, P.a2, P.a)
    in3 = nmask & (r < a3 * P.sigma)
    g = jnp.where(in3, jnp.exp(P.gamma / jnp.where(in3, x - a3, -1.0)),
                  0.0)
    cosjk = jnp.einsum("ijc,ikc->ijk", dr, dr) / (r[:, :, None]
                                                  * r[:, None, :])
    hjk = _ternbcc_g(cosjk) if ternbcc else (cosjk - P.cos0) ** 2
    wjk = g[:, :, None] * g[:, None, :]
    K = r.shape[1]
    valid3 = in3[:, :, None] & in3[:, None, :] \
        & ~jnp.eye(K, dtype=bool)[None]
    e3 = 0.5 * P.lam * P.epsilon * jnp.sum(
        jnp.where(valid3, hjk * wjk, 0.0))
    return e2 + e3


def sw_energy_nbr(pos, nbr, box, P: SWParams = SWParams(),
                  ternbcc: bool = False, block: int = 4096):
    """SW total energy over a NeighborList; == sw_energy at large N
    (every in-range pair/triple listed), O(N*K^2) instead of O(N^3)."""
    from imd_tpu.ops.neighbors import gather_neighbors
    P = SWParams(*[jnp.asarray(v, pos.dtype) for v in P])
    dr, r = gather_neighbors(pos, box, nbr)
    return _blocked_sum(
        lambda d, rr, m: _sw_block(d, rr, m, P, ternbcc),
        (dr, r, nbr.mask), block)


def _tersoff_block(dr, r, nmask, P: TersoffParams):
    r = jnp.where(nmask, r, 1.0)
    rc_hi = P.R + P.D
    inside = nmask & (r < rc_hi)
    fc = jnp.where(r < P.R - P.D, 1.0,
                   jnp.where(r < rc_hi,
                             0.5 - 0.5 * jnp.sin(0.5 * math.pi
                                                 * (r - P.R) / P.D), 0.0))
    fc = jnp.where(inside, fc, 0.0)
    f_rep = P.A * jnp.exp(-P.lam1 * r)
    f_att = -P.B * jnp.exp(-P.lam2 * r)
    cosjk = jnp.einsum("ijc,ikc->ijk", dr, dr) / (r[:, :, None]
                                                  * r[:, None, :])
    gth = 1.0 + (P.c / P.d) ** 2 - P.c ** 2 / (P.d ** 2
                                               + (P.h - cosjk) ** 2)
    K = r.shape[1]
    valid3 = inside[:, :, None] & inside[:, None, :] \
        & ~jnp.eye(K, dtype=bool)[None]
    zeta = jnp.sum(jnp.where(valid3, fc[:, None, :] * gth, 0.0), axis=2)
    bij = (1.0 + (P.beta * jnp.maximum(zeta, 0.0)) ** P.n) ** (-0.5 / P.n)
    return 0.5 * jnp.sum(fc * (f_rep + bij * f_att))


def tersoff_energy_nbr(pos, nbr, box, P: TersoffParams = TersoffParams(),
                       block: int = 4096):
    """Tersoff total energy over a NeighborList (== tersoff_energy)."""
    from imd_tpu.ops.neighbors import gather_neighbors
    P = TersoffParams(*[jnp.asarray(v, pos.dtype) for v in P])
    dr, r = gather_neighbors(pos, box, nbr)
    return _blocked_sum(lambda d, rr, m: _tersoff_block(d, rr, m, P),
                        (dr, r, nbr.mask), block)


def covalent_forces(energy_fn, pos, box=None, mask=None, params=None):
    """(F, E) via autodiff (replaces do_forces2's hand-derived 3-body
    force assembly, imd_forces_covalent.c)."""
    kw = {} if params is None else {"P": params}
    e, grad = jax.value_and_grad(
        lambda x: energy_fn(x, box, mask, **kw))(pos)
    return -grad, e


class KeatingParams(NamedTuple):
    """Keating valence force field (keating_* tags, imd_param.c;
    do_forces Keating branch of imd_forces_covalent.c)."""
    alpha: float = 2.965     # bond-stretch (eV/A^2 scale-folded below)
    beta: float = 0.285 * 2.965   # angle-bend
    d: float = 2.35          # equilibrium bond length (A)
    r_cut: float = 3.0       # bond cutoff


def keating_energy(pos, box=None, mask=None,
                   P: KeatingParams = KeatingParams()):
    """Keating energy (PRB 145, 637 (1966)):

        E = 3 alpha/(16 d^2) sum_bonds (r.r - d^2)^2
          + 3 beta /(8  d^2) sum_angles (r_ij.r_ik + d^2/3)^2

    Differentiable; bonds are pairs within r_cut (the reference uses the
    covalent neighbor tables the same way).
    """
    if mask is None:
        mask = jnp.ones(pos.shape[0], bool)
    P = KeatingParams(*[jnp.asarray(v, pos.dtype) for v in P])
    dr, r, off = _pairs(pos, box, mask)
    bond = off & (r < P.r_cut)
    bf = bond.astype(pos.dtype)
    d2 = P.d * P.d
    r2 = jnp.sum(dr * dr, -1)
    e_bond = 3.0 * P.alpha / (16.0 * d2) * 0.5 * jnp.sum(
        bf * (r2 - d2) ** 2)
    # angles at i between bonds (i,j) and (i,k), j != k
    dots = jnp.einsum("ijc,ikc->ijk", dr, dr)
    valid3 = bond[:, :, None] & bond[:, None, :] \
        & ~jnp.eye(pos.shape[0], dtype=bool)[None, :, :]
    e_ang = 3.0 * P.beta / (8.0 * d2) * 0.5 * jnp.sum(
        jnp.where(valid3, (dots + d2 / 3.0) ** 2, 0.0))
    return e_bond + e_ang


class TTBPParams(NamedTuple):
    """TTBP three-body (do_forces2, imd_forces_covalent.c:183-373):
    E3 = sum_i sum_{j<k} c_i (cos theta_jik + 1/sp_i)^2 f(r_ij) f(r_ik)
    with f the tabulated smoothing potential (ttbp_* tags)."""
    constant: float = 10.0       # ttbp_constant (eV)
    sp: float = 3.0              # 1/sp is -cos theta_0 (sp=3: 109.47 deg)
    r_cut: float = 3.2           # smoothing cutoff


def _ttbp_smooth(r, r_cut):
    """Default smoothing f(r): 1 at short range, smooth C1 decay to the
    cutoff (the reference reads this as a table, smooth_pot)."""
    x = jnp.clip(r / r_cut, 0.0, 1.0)
    return (1.0 - x * x) ** 2


def ttbp_energy(pos, box=None, mask=None, P: TTBPParams = TTBPParams(),
                pair_fn=None, smooth_fn=None, xt: bool = False):
    """Total TTBP energy (3-body + optional tabulated pair term);
    differentiable.

    ``xt`` (the XT flag, imd_forces_covalent.c:265-270) swaps the
    Fourier angular term (cos t + 1/sp)^2 for the piecewise ternary-BCC
    g(cos t) shared with TERNBCC."""
    if mask is None:
        mask = jnp.ones(pos.shape[0], bool)
    P = TTBPParams(*[jnp.asarray(v, pos.dtype) for v in P])
    dr, r, off = _pairs(pos, box, mask)
    nb = off & (r < P.r_cut)
    f = smooth_fn(r) if smooth_fn is not None else _ttbp_smooth(r, P.r_cut)
    f = jnp.where(nb, f, 0.0)
    cosjk = jnp.einsum("ijc,ikc->ijk", dr, dr) / (r[:, :, None]
                                                  * r[:, None, :])
    ang = _ternbcc_g(cosjk) if xt else (cosjk + 1.0 / P.sp) ** 2
    w = f[:, :, None] * f[:, None, :]
    valid3 = nb[:, :, None] & nb[:, None, :] \
        & ~jnp.eye(pos.shape[0], dtype=bool)[None, :, :]
    # j<k once <=> half the symmetric double sum
    e3 = 0.5 * P.constant * jnp.sum(jnp.where(valid3, ang * w, 0.0))
    e2 = jnp.zeros((), pos.dtype)
    if pair_fn is not None:
        e2 = 0.5 * jnp.sum(jnp.where(nb, pair_fn(r), 0.0))
    return e2 + e3


class TersoffModParams(NamedTuple):
    """Modified Tersoff (Kumagai/MOD form; do_forces2 under TERSOFFMOD,
    imd_forces_covalent.c:909-1237).  Single-species defaults are the
    MOD silicon fit (Kumagai et al., Comput. Mater. Sci. 39 (2007) 457):

        E = sum_ij fc(r_ij) [ A e^(-la r) - b_ij B e^(-mu r) ] / 2
        b_ij = (1 + zeta^eta)^(-delta)
        zeta = sum_k fc(r_ik) g(cos th) exp(alpha (r_ij - r_ik)^beta)
        g(c) = c1 + c2 ht^2/(c3 + ht^2) (1 + c4 e^(-c5 ht^2)),  ht = h - c

    with the reference's smoother cutoff
        fc = 0.5 (1 + 9/8 cos t - 1/8 cos 3t),  t = pi (r-r0)/(rcut-r0)
    (imd_forces_covalent.c:984; a C3-continuous variant of the Tersoff
    half-cosine)."""
    A: float = 3281.5905        # ter_a (eV)
    B: float = 121.00047        # ter_b (eV)
    la: float = 3.2300135       # ter_la, repulsive decay (1/A)
    mu: float = 1.3457970       # ter_mu, attractive decay (1/A)
    eta: float = 1.0            # ters_eta
    delta: float = 0.53298909   # ters_delta
    alpha: float = 2.3890327    # ters_alpha
    beta: int = 1               # ters_beta (integer exponent)
    c1: float = 0.20173476
    c2: float = 730418.72
    c3: float = 1.0e6
    c4: float = 1.0
    c5: float = 26.0
    h: float = -0.36500000      # ters_h
    r0: float = 2.70            # ter_r0: fc == 1 below this
    r_cut: float = 3.30         # ter_r_cut: fc == 0 above this


def _tersoffmod_fc(r, r0, r_cut):
    t = math.pi * (r - r0) / (r_cut - r0)
    mid = 0.5 * (1.0 + 1.125 * jnp.cos(t) - 0.125 * jnp.cos(3.0 * t))
    return jnp.where(r < r0, 1.0, jnp.where(r > r_cut, 0.0, mid))


def tersoffmod_energy(pos, box=None, mask=None,
                      P: TersoffModParams = TersoffModParams()):
    """Total modified-Tersoff energy; differentiable (forces/virial via
    covalent_forces autodiff instead of the hand-derived gradk_zeta
    assembly, imd_forces_covalent.c:1083-1147)."""
    if mask is None:
        mask = jnp.ones(pos.shape[0], bool)
    beta = int(P.beta)
    P = TersoffModParams(*[jnp.asarray(v, pos.dtype) for v in P])
    dr, r, off = _pairs(pos, box, mask)
    inside = off & (r < P.r_cut)
    fc = jnp.where(inside, _tersoffmod_fc(r, P.r0, P.r_cut), 0.0)

    cosjk = jnp.einsum("ijc,ikc->ijk", dr, dr) / (r[:, :, None]
                                                  * r[:, None, :])
    ht = P.h - cosjk
    g = P.c1 + P.c2 * ht * ht / (P.c3 + ht * ht) \
        * (1.0 + P.c4 * jnp.exp(-P.c5 * ht * ht))
    # exp(alpha (r_ij - r_ik)^beta); integer beta so the sign survives
    drik = r[:, :, None] - r[:, None, :]
    ex = jnp.exp(P.alpha * drik ** beta)
    valid3 = inside[:, :, None] & inside[:, None, :] \
        & ~jnp.eye(pos.shape[0], dtype=bool)[None, :, :]
    zeta = jnp.sum(jnp.where(valid3, fc[:, None, :] * g * ex, 0.0), axis=2)
    b = (1.0 + jnp.maximum(zeta, 0.0) ** P.eta) ** (-P.delta)
    phi = 0.5 * (P.A * jnp.exp(-P.la * r) - b * P.B * jnp.exp(-P.mu * r))
    return jnp.sum(fc * phi)


def _tersoffmod_block(dr, r, nmask, P: TersoffModParams, beta: int):
    r = jnp.where(nmask, r, 1.0)
    inside = nmask & (r < P.r_cut)
    fc = jnp.where(inside, _tersoffmod_fc(r, P.r0, P.r_cut), 0.0)
    cosjk = jnp.einsum("ijc,ikc->ijk", dr, dr) / (r[:, :, None]
                                                  * r[:, None, :])
    ht = P.h - cosjk
    g = P.c1 + P.c2 * ht * ht / (P.c3 + ht * ht) \
        * (1.0 + P.c4 * jnp.exp(-P.c5 * ht * ht))
    drik = r[:, :, None] - r[:, None, :]
    ex = jnp.exp(P.alpha * drik ** beta)
    K = r.shape[1]
    valid3 = inside[:, :, None] & inside[:, None, :] \
        & ~jnp.eye(K, dtype=bool)[None]
    zeta = jnp.sum(jnp.where(valid3, fc[:, None, :] * g * ex, 0.0),
                   axis=2)
    b = (1.0 + jnp.maximum(zeta, 0.0) ** P.eta) ** (-P.delta)
    phi = 0.5 * (P.A * jnp.exp(-P.la * r) - b * P.B * jnp.exp(-P.mu * r))
    return jnp.sum(fc * phi)


def tersoffmod_energy_nbr(pos, nbr, box,
                          P: TersoffModParams = TersoffModParams(),
                          block: int = 4096):
    """MOD-Tersoff total energy over a NeighborList
    (== tersoffmod_energy once every in-range pair is listed)."""
    from imd_tpu.ops.neighbors import gather_neighbors
    beta = int(P.beta)
    P = TersoffModParams(*[jnp.asarray(v, pos.dtype) for v in P])
    dr, r = gather_neighbors(pos, box, nbr)
    return _blocked_sum(
        lambda d, rr, m: _tersoffmod_block(d, rr, m, P, beta),
        (dr, r, nbr.mask), block)
