"""Ewald summation for Coulomb interactions (imd_forces_ewald.c) and
Streitz-Mintmire variable-charge equilibration (imd_sm.c).

Units as the reference (init_ewald, imd_forces_ewald.c:457): lengths in
Angstrom, energies in eV, charges in elementary charges;
COUL = e^2 / (4 pi eps0) = 14.40 eV A (globals.h coul_eng).

Split with parameter kappa (ew_kappa):
- reciprocal space (do_forces_ewald_fourier, :134): half-space k-vector
  list inside ew_kcut with weights
  w_k = (4 pi COUL / V) exp(-k^2/4 kappa^2)/k^2 (half-space doubling
  folded in); energy  E_k = 1/2 sum_k w_k |S(k)|^2 with the structure
  factor S(k) = sum_i q_i exp(i k.r_i); forces from grad E_k.
- real space (do_forces_ewald_real, :300): q_i q_j COUL erfc(kappa r)/r
  evaluated with the cell-stencil pair engine via a per-type-pair
  radial table (ewald_real_table).
- self energy (do_forces_ewald:103-118):
  E_self = -COUL kappa/sqrt(pi) sum q_i^2, plus the neutralizing
  background term -COUL pi/(2 kappa^2 V) (sum q_i)^2.

TPU design: S(k) is two [N, K] matmuls (cos/sin of pos @ k^T) - MXU
work; the real-space part reuses the streaming stencil engine; no
per-atom neighbor lists anywhere.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

COUL = 14.399645             # e^2/(4 pi eps0) in eV A (coul_eng)


class EwaldParams(struct.PyTreeNode):
    kvek: jnp.ndarray        # [K, 3] reciprocal vectors (half space)
    wk: jnp.ndarray          # [K] energy weights (doubling included)
    kappa: float = struct.field(pytree_node=False, default=0.3)
    volume: float = struct.field(pytree_node=False, default=1.0)


def make_ewald(box_h, kappa: float, kcut: float,
               dtype=jnp.float32) -> EwaldParams:
    """Half-space k-vector list inside kcut (init_ewald:495-520)."""
    h = np.asarray(box_h, float)
    volume = abs(np.linalg.det(h))
    tbox = np.linalg.inv(h).T        # reciprocal basis / 2pi
    twopi = 2.0 * math.pi
    nx = int(kcut * np.linalg.norm(h[:, 0]) / twopi) + 1
    ny = int(kcut * np.linalg.norm(h[:, 1]) / twopi) + 1
    nz = int(kcut * np.linalg.norm(h[:, 2]) / twopi) + 1
    ks, ws = [], []
    for i in range(-nx, nx + 1):
        for j in range(-ny, ny + 1):
            for k in range(0, nz + 1):
                if k == 0 and (j < 0 or (j == 0 and i < 1)):
                    continue   # half space (init_ewald:516)
                kv = twopi * (i * tbox[0] + j * tbox[1] + k * tbox[2])
                k2 = float(kv @ kv)
                if k2 > kcut * kcut or k2 == 0.0:
                    continue
                ks.append(kv)
                # 4 pi C / V with half-space doubling (2x the full-space
                # 2 pi C / V), times the Gaussian screen
                ws.append(4.0 * math.pi * COUL / volume
                          * math.exp(-k2 / (4.0 * kappa * kappa)) / k2)
    return EwaldParams(kvek=jnp.asarray(np.asarray(ks), dtype),
                       wk=jnp.asarray(np.asarray(ws), dtype),
                       kappa=kappa, volume=volume)


def _flat_q_pos(scene, charges):
    q_type = jnp.asarray(charges, scene.pos.dtype)
    q = q_type[jnp.clip(scene.type, 0, len(charges) - 1)] * scene.fmask()
    return q.reshape(-1), scene.pos.reshape(-1, 3)


def _kspace(q, pos, ew: EwaldParams):
    """Shared reciprocal-space kernel on a flat charge vector.

    E = sum_k w_k |S(k)|^2 (wk carries the half-space doubling),
    F_i = 2 q_i sum_k w_k k (sin(kr_i) Sc - cos(kr_i) Ss), and the
    uniform-strain virial W_k = sum_k w_k |S|^2 (1 - k^2/(2 kappa^2))
    (k.r is strain-invariant; w_k scales as exp(-k^2/4kappa^2 l^2)/l).
    Returns (energy, force [N,3], virial).
    """
    kr = jnp.matmul(pos, ew.kvek.T,
                    precision=jax.lax.Precision.HIGHEST)     # [N, K]
    c, s = jnp.cos(kr), jnp.sin(kr)
    Sc, Ss = q @ c, q @ s                                    # [K]
    s2 = Sc * Sc + Ss * Ss
    energy = jnp.sum(ew.wk * s2)
    coeff = 2.0 * (s * (ew.wk * Sc) - c * (ew.wk * Ss))      # [N, K]
    F = q[:, None] * jnp.matmul(coeff, ew.kvek,
                                precision=jax.lax.Precision.HIGHEST)
    k2 = jnp.sum(ew.kvek * ew.kvek, -1)
    virial = jnp.sum(ew.wk * s2 * (1.0 - k2 / (2.0 * ew.kappa ** 2)))
    return energy, F, virial


def _self_background(q, ew: EwaldParams):
    """Self + neutralizing-background energies; the background ~1/V
    carries a strain derivative (W_bg = 3 E_bg), the self term none."""
    e_self = -COUL * ew.kappa / math.sqrt(math.pi) * jnp.sum(q * q)
    e_bg = (-COUL * math.pi / (2.0 * ew.kappa ** 2 * ew.volume)
            * jnp.sum(q) ** 2)
    return e_self, e_bg


def ewald_fourier(scene, charges, ew: EwaldParams):
    """Reciprocal-space energy and per-slot forces.

    Returns (energy, force [gx,gy,gz,cap,3]).
    """
    q, pos = _flat_q_pos(scene, charges)
    energy, F, _ = _kspace(q, pos, ew)
    return energy, F.reshape(scene.pos.shape)


def ewald_kspace_terms_q(scene, q_slot, ew: EwaldParams):
    """ewald_kspace_terms with PER-ATOM charges [gx,gy,gz,cap] (the
    Streitz-Mintmire path: q from charge equilibration, imd_sm.c)."""
    q = (q_slot * scene.fmask()).reshape(-1)
    energy, F, virial = _kspace(q, scene.pos.reshape(-1, 3), ew)
    e_self, e_bg = _self_background(q, ew)
    return (energy + e_self + e_bg, F.reshape(scene.pos.shape),
            virial + 3.0 * e_bg)


def coulomb_real_dense(scene, q_slot, kappa: float, r_cut: float):
    """Real-space erfc Coulomb with per-atom charges, dense min-image
    over the padded slots (do_forces_ewald_real with SM charges; exact
    and MXU-shaped — SM/qeq system sizes).  Cutoff-shifted to match
    ewald_real_table.  Returns (F, epot_per_slot, virial)."""
    dtype = scene.pos.dtype
    m = scene.fmask().reshape(-1)
    q = (q_slot.reshape(-1) * m).astype(dtype)
    pos = scene.pos.reshape(-1, 3)
    d = scene.grid.box.min_image(pos[:, None, :] - pos[None, :, :])
    r2 = jnp.sum(d * d, -1)
    n = r2.shape[0]
    valid = (~jnp.eye(n, dtype=bool)) & (m > 0)[:, None] \
        & (m > 0)[None, :] & (r2 < r_cut * r_cut)
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    qq = q[:, None] * q[None, :]
    from scipy.special import erfc as _herfc
    shift = float(_herfc(kappa * r_cut)) / r_cut
    phi = COUL * qq * (jax.scipy.special.erfc(kappa * r) / r - shift)
    phi = jnp.where(valid, phi, 0.0)
    # dV/dr of the (constant-shifted) erfc/r term
    dv = -COUL * qq * (jax.scipy.special.erfc(kappa * r) / r2
                       + 2.0 * kappa / math.sqrt(math.pi)
                       * jnp.exp(-(kappa * r) ** 2) / r)
    dv = jnp.where(valid, dv, 0.0)
    F = -jnp.sum((dv / r)[..., None] * d, axis=1)
    epot = 0.5 * jnp.sum(phi, axis=1)
    virial = -0.5 * jnp.sum(dv * r)
    return (F.reshape(scene.pos.shape),
            epot.reshape(scene.type.shape), virial)


def ewald_kspace_terms(scene, charges, ew: EwaldParams):
    """(energy, force, virial) of the reciprocal sum + self/background
    for fixed per-type charges (see _kspace/_self_background)."""
    q, pos = _flat_q_pos(scene, charges)
    energy, F, virial = _kspace(q, pos, ew)
    e_self, e_bg = _self_background(q, ew)
    return (energy + e_self + e_bg, F.reshape(scene.pos.shape),
            virial + 3.0 * e_bg)


def ewald_self_energy(scene, charges, ew: EwaldParams):
    """Self + neutralizing-background terms (do_forces_ewald:103)."""
    q, _ = _flat_q_pos(scene, charges)
    e_self = -COUL * ew.kappa / math.sqrt(math.pi) * jnp.sum(q * q)
    e_bg = (-COUL * math.pi / (2.0 * ew.kappa ** 2 * ew.volume)
            * jnp.sum(q) ** 2)
    return e_self + e_bg


def ewald_real_table(charges, kappa: float, r_cut: float,
                     nr: int = 1024, r_min: float = 0.3,
                     dtype=jnp.float64):
    """Per-type-pair erfc table for the stencil pair engine.

    V_ab(r) = COUL q_a q_b [erfc(kappa r)/r - erfc(kappa rc)/rc]
    (shifted to zero at the cutoff), sampled on the engine's r^2 grid.
    """
    from imd_tpu.models.potential import _make_table
    from scipy.special import erfc
    ntypes = len(charges)
    r2 = np.linspace(r_min * r_min, r_cut * r_cut, nr)
    r = np.sqrt(r2)
    base = COUL * (erfc(kappa * r) / r - erfc(kappa * r_cut) / r_cut)
    cols, begin, end, step = [], [], [], []
    for a in range(ntypes):
        for b in range(ntypes):
            cols.append(charges[a] * charges[b] * base)
            begin.append(r2[0])
            end.append(r2[-1])
            step.append(r2[1] - r2[0])
    return _make_table(cols, begin, end, step, dtype=dtype)


def ewald_energy(scene, charges, ew: EwaldParams, pair_result=None):
    """Total Ewald energy: fourier + self (+ real-space epot if given)."""
    e_k, _ = ewald_fourier(scene, charges, ew)
    e = e_k + ewald_self_energy(scene, charges, ew)
    if pair_result is not None:
        e = e + jnp.sum(pair_result.epot)
    return e


# ---------------------------------------------------------------------------
# Streitz-Mintmire variable charges (imd_sm.c: calc_sm_pot/chi 1103/1191,
# CG charge equilibration do_electronegativity imd_sm.c:335-620)
# ---------------------------------------------------------------------------

def sm_equilibrate(scene, chi, j0, ew: EwaldParams, n_iter: int = 50
                   ) -> jnp.ndarray:
    """Charge equilibration: minimize
        E(q) = sum_i chi_i q_i + 1/2 sum_i J0_i q_i^2 + E_coul(q)
    subject to sum q = 0, via projected conjugate gradient on the
    k-space Coulomb operator (the reference's CG loop, imd_sm.c).

    ``chi``/``j0``: per-type electronegativity (eV) and hardness (eV).
    Returns per-slot charges [gx,gy,gz,cap].
    """
    dtype = scene.pos.dtype
    m = scene.fmask().reshape(-1)
    n_act = jnp.maximum(jnp.sum(m), 1.0)
    chi_i = jnp.asarray(chi, dtype)[
        jnp.clip(scene.type, 0, len(chi) - 1)].reshape(-1) * m
    j0_i = jnp.asarray(j0, dtype)[
        jnp.clip(scene.type, 0, len(j0) - 1)].reshape(-1) * m
    pos = scene.pos.reshape(-1, 3)
    kr = jnp.matmul(pos, ew.kvek.T,
                    precision=jax.lax.Precision.HIGHEST)
    c, s = jnp.cos(kr), jnp.sin(kr)
    diag_self = 2.0 * (-COUL * ew.kappa / math.sqrt(math.pi))
    # dense min-image real-space operator COUL erfc(kappa r)/r - exact
    # and MXU-shaped; the [N, N] matrix is fine at qeq system sizes
    # (the reference's CG also touches all pairs via its Ewald matvec)
    box_diag = jnp.diag(scene.grid.box.h)
    pbc = jnp.asarray(scene.grid.box.pbc)
    d = pos[:, None, :] - pos[None, :, :]
    d = d - jnp.where(pbc, box_diag * jnp.round(d / box_diag), 0.0)
    r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-12))
    j_real = COUL * jax.scipy.special.erfc(ew.kappa * r) / r
    j_real = j_real * (1.0 - jnp.eye(r.shape[0], dtype=dtype))
    j_real = j_real * m[:, None] * m[None, :]

    def matvec(q):
        """(J q)_i with J = k-space + real-space Coulomb + self +
        hardness."""
        Sc, Ss = q @ c, q @ s
        # dE_k/dq_i = 2 sum_k wk (c_i Sc + s_i Ss)
        coul = 2.0 * (jnp.matmul(c, ew.wk * Sc,
                                 precision=jax.lax.Precision.HIGHEST)
                      + jnp.matmul(s, ew.wk * Ss,
                                   precision=jax.lax.Precision.HIGHEST))
        coul = coul + jnp.matmul(j_real, q,
                                 precision=jax.lax.Precision.HIGHEST)
        return (coul + (j0_i + diag_self) * q) * m

    def project(v):
        return (v - jnp.sum(v * m) / n_act) * m

    b = project(-chi_i)
    q = jnp.zeros_like(b)
    r = b - project(matvec(q))
    p = r
    rs = jnp.sum(r * r)

    def body(i, st):
        q, r, p, rs = st
        Ap = project(matvec(p))
        alpha = rs / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        q2 = q + alpha * p
        r2 = r - alpha * Ap
        rs2 = jnp.sum(r2 * r2)
        p2 = r2 + (rs2 / jnp.maximum(rs, 1e-30)) * p
        return q2, r2, p2, rs2

    q, r, p, rs = jax.lax.fori_loop(0, n_iter, body, (q, r, p, rs))
    return q.reshape(scene.type.shape)
