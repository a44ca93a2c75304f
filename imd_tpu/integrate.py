"""Integrators / ensembles (imd_integrate.c re-designed functionally).

All reference ensembles are leapfrog ("velocity-Verlet-style"):
``p += dt * F`` then ``x += dt * p / m`` (imd_integrate.c:260-420), with the
time-centered kinetic energy ``(p_old^2 + p_new^2) / (4 m)`` accumulated for
the .eng output (integrate.c:390-397).  Per-virtual-type restriction masks
zero forces (integrate.c:209-213), FBC adds per-vtype external forces
(173-189), viscous friction and the PDECAY absorbing ramp damp momenta
(191-206, 232-249).

Each ensemble here is a pure function Scene -> (Scene, StepStats); the
dispatch that the reference does via a `move_atoms` function pointer
(imd_param.c:5288-5301) happens in simulation.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from imd_tpu.scene import Scene


class StepStats(struct.PyTreeNode):
    tot_kin_energy: jnp.ndarray     # time-centered Ekin (eV)
    fnorm: jnp.ndarray              # sum F.F
    pnorm: jnp.ndarray              # sum p.p
    pxf: jnp.ndarray                # sum p.F (GLOK/MIK criterion)
    ekin_new: jnp.ndarray           # Ekin of the new momenta


class IntegratorParams(struct.PyTreeNode):
    """Traced per-step knobs shared by all ensembles."""
    timestep: jnp.ndarray
    temperature: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    # Nose-Hoover
    eta: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    isq_tau_eta: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    # Berendsen
    tau_berendsen: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    # viscous / Langevin
    viscous_friction: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    # PDECAY ramp
    xipdecay: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    ramp_start: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    ramp_end: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    # per-vtype tables (padded to vtypes); zeros when unused
    restrictions: Optional[jnp.ndarray] = None   # [vtypes, 3] 0/1 mask
    fbc_forces: Optional[jnp.ndarray] = None     # [vtypes, 3]
    # BEND per-vtype bending forces, recomputed every step from the
    # moment geometry (update_bend, imd_main_3d.c:1672-1780); added on
    # top of fbc_forces like the reference (integrate.c:182-188)
    bend_forces: Optional[jnp.ndarray] = None    # [vtypes, 3]
    # RIGID superparticle tables (imd_integrate.c:866-920): members of a
    # group share the group's mass-weighted net force along the group's
    # restricted directions
    superatom: Optional[jnp.ndarray] = None      # [vtypes] int, -1=free
    supermass: Optional[jnp.ndarray] = None      # [nsuper]
    superrestrictions: Optional[jnp.ndarray] = None  # [nsuper, 3] 0/1


def _apply_rigid(scene: Scene, params: IntegratorParams,
                 F: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """RIGID superparticles: Σ(F_i + fbc[vt_i]) over each group
    (calc_superforces, imd_main_3d.c:1881-1930) replaces the member
    force as superforce·m_i/M along the group-restricted components
    (imd_integrate.c:904-918).  Matches the reference in that plain
    per-atom FBC is disabled when RIGID is active (the
    `#if defined(FBC) && !defined(RIGID)` guard, integrate.c:173):
    fbc only enters through the group sum."""
    vt = jnp.clip(scene.vtype, 0, params.superatom.shape[0] - 1)
    sa = params.superatom[vt]                       # [..., cap]
    nsuper = params.supermass.shape[0]
    member = (sa >= 0) & (m[..., 0] > 0)
    onehot = (jax.nn.one_hot(jnp.clip(sa, 0), nsuper, dtype=F.dtype)
              * member[..., None].astype(F.dtype))
    Fg = F
    if params.fbc_forces is not None:
        vtf = jnp.clip(scene.vtype, 0, params.fbc_forces.shape[0] - 1)
        Fg = Fg + params.fbc_forces[vtf] * m
    superforce = jnp.einsum("...s,...c->sc", onehot, Fg,
                            precision=jax.lax.Precision.HIGHEST)
    sac = jnp.clip(sa, 0)
    relmass = scene.mass / jnp.maximum(params.supermass[sac], 1e-30)
    Fsuper = superforce[sac] * relmass[..., None]
    use = (member[..., None]
           & (params.superrestrictions[sac] > 0))
    return jnp.where(use, Fsuper, F)


def _apply_force_mods(scene: Scene, params: IntegratorParams,
                      pdecay: bool = False) -> jnp.ndarray:
    """FBC extra forces, viscous damping, PDECAY ramp, restriction masks."""
    F = scene.force
    m = scene.fmask()[..., None]
    if params.superatom is not None:
        F = _apply_rigid(scene, params, F, m)
    elif params.fbc_forces is not None:
        vt = jnp.clip(scene.vtype, 0, params.fbc_forces.shape[0] - 1)
        F = F + params.fbc_forces[vt] * m
    if params.bend_forces is not None:
        vt = jnp.clip(scene.vtype, 0, params.bend_forces.shape[0] - 1)
        F = F + params.bend_forces[vt] * m
    if params.viscous_friction is not None:
        # viscous: F -= p * friction / dt (integrate.c:201-206)
        sfric = params.viscous_friction / params.timestep
        F = F - scene.mom * sfric * m
    if pdecay:
        # quadratic momentum-damping ramp toward +x (integrate.c:232-249)
        a = 1.0 / jnp.maximum(params.ramp_end - params.ramp_start, 1e-30) ** 2
        x = scene.pos[..., 0]
        ramp = jnp.where(x > params.ramp_start,
                         params.xipdecay * a * (x - params.ramp_start) ** 2,
                         0.0)
        F = F.at[..., 0].add(-scene.mom[..., 0] / jnp.maximum(scene.mass, 1e-30)
                             * ramp * m[..., 0])
    if params.restrictions is not None:
        vt = jnp.clip(scene.vtype, 0, params.restrictions.shape[0] - 1)
        F = F * params.restrictions[vt]
    return F * m


def _finish(scene: Scene, params, F, p_new) -> Tuple[Scene, StepStats]:
    mask = scene.fmask()
    inv_m = jnp.where(scene.mask, 1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
    p_old = scene.mom
    x_new = scene.pos + params.timestep * p_new * inv_m[..., None]
    k1 = jnp.sum(jnp.sum(p_old * p_old, -1) * inv_m)
    k2 = jnp.sum(jnp.sum(p_new * p_new, -1) * inv_m)
    stats = StepStats(
        tot_kin_energy=(k1 + k2) / 4.0,
        fnorm=jnp.sum(F * F * mask[..., None]),
        pnorm=jnp.sum(p_new * p_new * mask[..., None]),
        pxf=jnp.sum(p_new * F * mask[..., None]),
        ekin_new=k2 / 2.0,
    )
    new_scene = scene.replace(pos=x_new, mom=p_new)
    return new_scene, stats


def nve(scene: Scene, params: IntegratorParams,
        pdecay: bool = False, nrb_mask=None) -> Tuple[Scene, StepStats]:
    """Plain leapfrog NVE (move_atoms_nve, integrate.c:35).

    ``nrb_mask`` [gx,gy,gz,cap] bool: NRB boundary atoms keep the momenta
    set by nrb_forces instead of integrating p += dt F
    (imd_integrate.c:254-259); their positions advance normally.
    """
    F = _apply_force_mods(scene, params, pdecay)
    p_new = scene.mom + params.timestep * F
    if nrb_mask is not None:
        p_new = jnp.where(nrb_mask[..., None], scene.mom, p_new)
    return _finish(scene, params, F, p_new)


def mik(scene: Scene, params: IntegratorParams) -> Tuple[Scene, StepStats]:
    """Microconvergence relaxation: zero p where p.F < 0 (integrate.c:831)."""
    F = _apply_force_mods(scene, params)
    p_new = scene.mom + params.timestep * F
    pf = jnp.sum(p_new * F, axis=-1, keepdims=True)
    p_new = jnp.where(pf < 0.0, 0.0, p_new)
    return _finish(scene, params, F, p_new)


def berendsen(scene: Scene, params: IntegratorParams, nactive,
              tot_kin_energy) -> Tuple[Scene, StepStats]:
    """NVE + Berendsen velocity rescale (Ju Li variant, integrate.c:60-68).

    ``tot_kin_energy`` is last step's kinetic energy (the reference uses the
    running global).
    """
    eps = 8.6174101569719990e-06  # reference's additive epsilon (~0.1 K)
    cc = 1.0 - params.timestep / params.tau_berendsen * (
        (2.0 * tot_kin_energy / nactive + eps) / (params.temperature + eps) - 1.0)
    cc = jnp.sqrt(jnp.clip(cc, 0.5, 2.0))
    F = _apply_force_mods(scene, params)
    p_new = (scene.mom + params.timestep * F) * cc
    return _finish(scene, params, F, p_new)


def nvt(scene: Scene, params: IntegratorParams, nactive,
        eta) -> Tuple[Scene, StepStats, jnp.ndarray]:
    """Nose-Hoover NVT (move_atoms_nvt, integrate.c:1047).

    Discretization matches the reference: momenta are advanced with the
    friction half-implicitly,
        p_new = p_old * (1 - dt*eta/2)/(1 + dt*eta/2) + dt * F * 1/(1+dt*eta/2)
    and eta integrates d(eta)/dt = (T_cur/T_ext - 1) / tau_eta^2.
    Returns the updated eta as third output.
    """
    F = _apply_force_mods(scene, params)
    dt = params.timestep
    reib = 0.5 * dt * eta
    fac1 = (1.0 - reib) / (1.0 + reib)
    fac2 = dt / (1.0 + reib)
    p_new = scene.mom * fac1 + fac2 * F
    scene2, stats = _finish(scene, params, F, p_new)
    t_cur = 2.0 * stats.tot_kin_energy / jnp.maximum(nactive, 1)
    eta_new = eta + dt * params.isq_tau_eta * (
        t_cur / jnp.maximum(params.temperature, 1e-30) - 1.0)
    return scene2, stats, eta_new


def ttm(scene: Scene, params: IntegratorParams, xi_atom: jnp.ndarray,
        vcom_atom: jnp.ndarray, pdecay: bool = False, nrb_mask=None,
        epress_atom=None) -> Tuple[Scene, StepStats]:
    """TTM electron-phonon coupled leapfrog (move_atoms_ttm, integrate.c:581).

    ``xi_atom`` [gx,gy,gz,cap] is the per-atom coupling strength gathered
    from the FD grid, ``vcom_atom`` [gx,gy,gz,cap,3] the center-of-mass
    velocity of the atom's FD cell:   p += dt (F + xi m (v - v_com)).
    """
    F = _apply_force_mods(scene, params, pdecay)
    m = scene.fmask()
    v = scene.mom / jnp.maximum(scene.mass, 1e-30)[..., None]
    F_coupled = F + (xi_atom * scene.mass * m)[..., None] * (v - vcom_atom)
    if epress_atom is not None:
        if epress_atom.ndim == F_coupled.ndim:
            # full-vector blast force (3-D TTM grid)
            F_coupled = F_coupled - epress_atom * m[..., None]
        else:
            # electron blast pressure, x only (imd_integrate.c:741-743)
            F_coupled = F_coupled.at[..., 0].add(-epress_atom * m)
    p_new = scene.mom + params.timestep * F_coupled
    if nrb_mask is not None:
        p_new = jnp.where(nrb_mask[..., None], scene.mom, p_new)
    return _finish(scene, params, F_coupled, p_new)


def nvx(scene: Scene, params: IntegratorParams, hc_nlayers: int,
        hc_heatcurr) -> Tuple[Scene, StepStats, jnp.ndarray]:
    """NVX heat-flux ensemble (move_atoms_nvx, integrate.c:2917):
    NVE step, then withdraw delta_E = hc_heatcurr * 2 A dt of kinetic
    energy from layer 0 and deposit it in layer nlayers/2 by momentum
    rescale; the steady temperature gradient gives the conductivity.
    Returns (scene, stats, delta_E) - accumulate delta_E for kappa.
    """
    F = _apply_force_mods(scene, params)
    p_new = scene.mom + params.timestep * F
    scene2, stats = _finish(scene, params, F, p_new)

    box = scene.grid.box
    bx = box.h[0, 0]
    area = box.h[1, 1] * box.h[2, 2]
    delta_e = hc_heatcurr * 2.0 * area * params.timestep
    nhalf = hc_nlayers // 2
    xx = jnp.where(scene2.pos[..., 0] < 0,
                   scene2.pos[..., 0] + bx, scene2.pos[..., 0])
    layer = (hc_nlayers * xx / bx).astype(jnp.int32) % hc_nlayers
    inv_m = jnp.where(scene2.mask, 1.0 / jnp.maximum(scene2.mass, 1e-30),
                      0.0)
    ek2 = jnp.sum(scene2.mom ** 2, -1) * inv_m    # 2*Ekin per atom
    in_cold = scene2.mask & (layer == 0)
    in_hot = scene2.mask & (layer == nhalf)
    ek_cold = jnp.sum(jnp.where(in_cold, ek2, 0.0))
    ek_hot = jnp.sum(jnp.where(in_hot, ek2, 0.0))
    r_cold = jnp.sqrt(jnp.maximum(1.0 - delta_e / jnp.maximum(ek_cold,
                                                              1e-30),
                                  0.0))
    r_hot = jnp.sqrt(1.0 + delta_e / jnp.maximum(ek_hot, 1e-30))
    fac = jnp.where(in_cold, r_cold, jnp.where(in_hot, r_hot, 1.0))
    return (scene2.replace(mom=scene2.mom * fac[..., None]), stats,
            delta_e)


def stadium_dampf(pos, center, stadium, stadium2):
    """Smoothed stadium damping profile 0..1 (DAMP, integrate.c:293-305):
    0 inside the elliptical core, ramping to 1 at the outer stadium."""
    maxax = jnp.max(jnp.asarray(stadium))
    maxax2 = jnp.max(jnp.asarray(stadium2))
    t = jnp.zeros(pos.shape[:-1], pos.dtype)
    for ax in range(3):
        s2 = stadium2[ax]
        t = t + jnp.where(s2 != 0,
                          ((pos[..., ax] - center[ax]) / (2.0 * s2)) ** 2,
                          0.0)
    f = (t - (maxax / (2.0 * maxax2)) ** 2) / (
        0.25 - (maxax / (2.0 * maxax2)) ** 2)
    f = jnp.clip(f, 0.0, 1.0)
    return 0.5 * (1.0 + jnp.sin(-jnp.pi / 2.0 + jnp.pi * f))


def damp(scene: Scene, params: IntegratorParams, center, stadium, stadium2,
         zeta0, damptemp, delta_finnis: float = 10.0
         ) -> Tuple[Scene, StepStats]:
    """NVE + local Finnis stadium thermostat (move_atoms_nve DAMP branch,
    integrate.c:279-356; also the FRAC/FTG/STM family's damping core):
    atoms in the damping stadium feel friction
    zeta = zeta0 (T_loc - T_ramp)/sqrt(T_loc^2 + (T_ramp d)^2) * dampf,
    with the target temperature ramped to zero across the stadium."""
    F = _apply_force_mods(scene, params)
    dampf = stadium_dampf(scene.pos, center, stadium, stadium2)
    inv_m = jnp.where(scene.mask, 1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
    t_loc = jnp.sum(scene.mom ** 2, -1) * inv_m / 3.0
    t_ramp = damptemp * (1.0 - dampf)
    zeta = jnp.where(
        t_ramp > 0,
        zeta0 * (t_loc - t_ramp)
        / jnp.sqrt(t_loc ** 2 + (t_ramp * delta_finnis) ** 2) * dampf,
        zeta0 * dampf)
    p_new = scene.mom + params.timestep * (
        F - zeta[..., None] * scene.mom)
    return _finish(scene, params, F, p_new)


def _dof_per_atom(scene: Scene, params: IntegratorParams):
    """Active degrees of freedom per atom (restriction-vector sum / 3)."""
    if params.restrictions is None:
        return jnp.where(scene.mask, 3.0, 0.0)
    vt = jnp.clip(scene.vtype, 0, params.restrictions.shape[0] - 1)
    return jnp.sum(params.restrictions[vt], -1) * scene.fmask()


def stadium2d_f(pos, center, stadium, stadium2):
    """FRAC's x-y bath-tub profile (move_atoms_frac, integrate.c:2188-2205):
    0 inside the ellipse with half-axes ``stadium``, smoothly ramping to 1
    at ``stadium2``; 1 everywhere when stadium[0] <= 0 (global damping)."""
    if stadium[0] <= 0.0:
        return jnp.ones(pos.shape[:-1], pos.dtype)
    s = (stadium[0] / (2.0 * stadium2[0])) ** 2
    t = (((pos[..., 0] - center[0]) / (2.0 * stadium2[0])) ** 2
         + ((pos[..., 1] - center[1]) / (2.0 * stadium2[1])) ** 2)
    f = jnp.clip((t - s) / (0.25 - s), 0.0, 1.0)
    return 0.5 * (1.0 + jnp.sin(-jnp.pi / 2.0 + jnp.pi * f))


def _frac_kick(scene, params, F, gamma_atom, dotepsilon):
    """Shared FRAC/FTG semi-implicit friction kick + homogeneous y
    expansion (integrate.c:2251-2282): x/z feel gamma, y feels
    gamma + dotepsilon; y positions additionally stretch by
    (1 + eps dt/2)/(1 - eps dt/2)."""
    dt = params.timestep
    rei = 1.0 - gamma_atom * dt / 2.0
    inv = 1.0 / (1.0 + gamma_atom * dt / 2.0)
    rei_y = 1.0 - (gamma_atom + dotepsilon) * dt / 2.0
    inv_y = 1.0 / (1.0 + (gamma_atom + dotepsilon) * dt / 2.0)
    p = scene.mom
    p_new = jnp.stack(
        [(p[..., 0] * rei + dt * F[..., 0]) * inv,
         (p[..., 1] * rei_y + dt * F[..., 1]) * inv_y,
         (p[..., 2] * rei + dt * F[..., 2]) * inv], -1)
    if params.restrictions is not None:
        vt = jnp.clip(scene.vtype, 0, params.restrictions.shape[0] - 1)
        p_new = p_new * params.restrictions[vt]
    p_new = p_new * scene.fmask()[..., None]
    # positions: x/z leapfrog, y with expansion scaling
    inv_m = jnp.where(scene.mask, 1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
    eps_p = 1.0 + dotepsilon * dt / 2.0
    eps_m = 1.0 / (1.0 - dotepsilon * dt / 2.0)
    x = scene.pos
    x_new = jnp.stack(
        [x[..., 0] + dt * p_new[..., 0] * inv_m,
         (dt * p_new[..., 1] * inv_m + eps_p * x[..., 1]) * eps_m,
         x[..., 2] + dt * p_new[..., 2] * inv_m], -1)
    mask = scene.fmask()
    p_old = scene.mom
    k1 = jnp.sum(jnp.sum(p_old * p_old, -1) * inv_m)
    k2 = jnp.sum(jnp.sum(p_new * p_new, -1) * inv_m)
    stats = StepStats(tot_kin_energy=(k1 + k2) / 4.0,
                      fnorm=jnp.sum(F * F * mask[..., None]),
                      pnorm=jnp.sum(p_new * p_new * mask[..., None]),
                      pxf=jnp.sum(p_new * F * mask[..., None]),
                      ekin_new=k2 / 2.0)
    return scene.replace(pos=x_new, mom=p_new), stats


def expansion_rate(dotepsilon0, expansionmode, step, timestep):
    """Time-decaying homogeneous strain rate (integrate.c:2153-2155)."""
    if expansionmode == 1:
        return dotepsilon0 / (1.0 + dotepsilon0 * step * timestep)
    return dotepsilon0


def frac(scene: Scene, params: IntegratorParams, center, stadium, stadium2,
         gamma_damp, gamma_bar, dotepsilon=0.0, dampingmode: int = 0
         ) -> Tuple[Scene, StepStats, jnp.ndarray]:
    """Fracture ensemble (move_atoms_frac, imd_integrate.c:2134-2341):
    viscous damping gamma_damp * f(pos) in the stadium rim, feedback-
    controlled so the damped zone's kinetic energy tracks the target
    temperature.  Returns (scene, stats, gamma_new)."""
    F = _apply_force_mods(scene, params)
    f = stadium2d_f(scene.pos, center, stadium, stadium2) * scene.fmask()
    scene2, stats = _frac_kick(scene, params, F,
                               gamma_damp * f, dotepsilon)
    # constraint evolution from the NEW kinetic energy in the damped zone
    inv_m = jnp.where(scene.mask, 1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
    ek2 = jnp.sum(scene2.mom ** 2, -1) * inv_m
    e_damp2 = jnp.sum(jnp.where(f > 0, f * ek2, 0.0))
    sum_f = jnp.sum(f * _dof_per_atom(scene, params) / 3.0)
    ttt = 3.0 * params.temperature * sum_f
    if dampingmode == 1:
        gamma_new = gamma_damp + params.timestep * (
            e_damp2 / jnp.maximum(ttt, 1e-30) - 1.0) * gamma_bar
    else:
        gamma_new = jnp.where(e_damp2 != 0.0,
                              (1.0 - ttt / jnp.maximum(e_damp2, 1e-30))
                              * gamma_bar, 0.0)
    return scene2, stats, gamma_new


def ftg(scene: Scene, params: IntegratorParams, nslices: int,
        ns_left: int, ns_right: int, tleft, tright, gamma_ftg,
        gamma_bar, gamma_min, delta_ftg, dotepsilon=0.0,
        dampingmode: int = 0, center=None, stadium=None, stadium2=None
        ) -> Tuple[Scene, StepStats, jnp.ndarray]:
    """Fracture with temperature gradient (move_atoms_ftg,
    imd_integrate.c:2361-2646): the box is cut into ``nslices`` x-slabs
    with target temperatures ramping Tleft -> Tright; each slab carries a
    feedback friction gamma_ftg[slice].  When ``stadium`` is given
    (stadium[1] != 0), damping is local per atom: Finnis-form friction
    scaled by the y-distance ramp between stadium and stadium2.
    Returns (scene, stats, gamma_ftg_new)."""
    F = _apply_force_mods(scene, params)
    bx = scene.grid.box.h[0, 0]
    frac_x = scene.pos[..., 0] / bx
    sl = jnp.clip((nslices * frac_x).astype(jnp.int32), 0, nslices - 1)
    denom = max(nslices - ns_left - ns_right, 1)
    local = stadium is not None and stadium[1] != 0.0
    if local:
        # per-atom target temperature + y-ramped Finnis friction
        t_tgt = jnp.clip(tleft + (tright - tleft)
                         * (nslices * frac_x - ns_left) / denom,
                         min(tleft, tright), max(tleft, tright))
        inv_m = jnp.where(scene.mask,
                          1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
        dof = jnp.maximum(_dof_per_atom(scene, params), 1.0)
        t_at = jnp.sum(scene.mom ** 2, -1) * inv_m / dof
        g_pos = jnp.clip((jnp.abs(scene.pos[..., 1] - center[1])
                          - stadium[1]) / (stadium2[1] - stadium[1]),
                         0.0, 1.0)
        g_pos = 0.5 * (1.0 + jnp.sin(-jnp.pi / 2.0 + jnp.pi * g_pos))
        gamma_atom = ((gamma_min + gamma_bar * g_pos)
                      * (t_at - t_tgt)
                      / jnp.sqrt(t_at ** 2 + (t_tgt / delta_ftg) ** 2
                                 + 1e-30))
    else:
        gamma_atom = gamma_ftg[sl]
    scene2, stats = _frac_kick(scene, params, F, gamma_atom, dotepsilon)
    # per-slice feedback from the new kinetic energy
    inv_m = jnp.where(scene.mask, 1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
    ek2 = jnp.sum(scene2.mom ** 2, -1) * inv_m
    seg = jnp.where(scene.mask, sl, nslices).reshape(-1)
    e2_sl = jax.ops.segment_sum(ek2.reshape(-1), seg,
                                num_segments=nslices + 1)[:nslices]
    n_sl = jax.ops.segment_sum(_dof_per_atom(scene, params).reshape(-1),
                               seg, num_segments=nslices + 1)[:nslices]
    j = jnp.arange(nslices)
    t_sl = tleft + (tright - tleft) * (j - ns_left + 1.0) / (denom + 1.0
                                                             if denom > 0
                                                             else 1.0)
    t_sl = jnp.where(j < ns_left, tleft, t_sl)
    t_sl = jnp.where(j >= nslices - ns_right, tright, t_sl)
    ttt = t_sl * n_sl
    if dampingmode == 1:
        g_new = gamma_ftg + params.timestep * (
            e2_sl / jnp.maximum(ttt, 1e-30) - 1.0) * gamma_bar
    else:
        g_new = (1.0 - ttt / jnp.maximum(e2_sl, 1e-30)) * gamma_bar
    g_new = jnp.where(ttt == 0.0, 0.0, g_new)
    return scene2, stats, (gamma_ftg if local else g_new)


def finnis(scene: Scene, params: IntegratorParams, zeta0, delta_finnis
           ) -> Tuple[Scene, StepStats]:
    """Local Finnis thermostat everywhere (move_atoms_finnis,
    imd_integrate.c:2661-2810): per-atom friction
    zeta = zeta_0 (T_at - T)/sqrt(T_at^2 + (T delta)^2), explicit kick."""
    F = _apply_force_mods(scene, params)
    inv_m = jnp.where(scene.mask, 1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
    dof = _dof_per_atom(scene, params)
    t_at = jnp.where(dof > 0,
                     jnp.sum(scene.mom ** 2, -1) * inv_m
                     / jnp.maximum(dof, 1.0), 0.0)
    t_tgt = jnp.where(dof > 0, dof / 3.0 * params.temperature, 1e-10)
    zeta = zeta0 * (t_at - t_tgt) / jnp.sqrt(
        t_at ** 2 + (t_tgt * delta_finnis) ** 2 + 1e-30)
    p_new = scene.mom + params.timestep * (
        F - zeta[..., None] * scene.mom) * scene.fmask()[..., None]
    return _finish(scene, params, F, p_new)


def stm(scene: Scene, params: IntegratorParams, center, stadium,
        nactive, eta) -> Tuple[Scene, StepStats, jnp.ndarray]:
    """Stadium thermostat (move_atoms_stm, imd_integrate.c:2813-2912):
    NVE inside the x-y ellipse, Nose-Hoover NVT outside; eta evolves from
    the outside atoms' kinetic energy.  Returns (scene, stats, eta_new)."""
    F = _apply_force_mods(scene, params)
    dt = params.timestep
    inside = (((scene.pos[..., 0] - center[0]) / stadium[0]) ** 2
              + ((scene.pos[..., 1] - center[1]) / stadium[1]) ** 2) <= 1.0
    inside = inside & scene.mask
    rei = jnp.where(inside, 1.0, 1.0 - eta * dt / 2.0)
    inv = jnp.where(inside, 1.0, 1.0 / (1.0 + eta * dt / 2.0))
    p_new = (scene.mom * rei[..., None] + dt * F) * inv[..., None]
    p_new = p_new * scene.fmask()[..., None]
    scene2, stats = _finish(scene, params, F, p_new)
    inv_m = jnp.where(scene.mask, 1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
    ek2 = jnp.sum(p_new ** 2, -1) * inv_m
    e2_out = jnp.sum(jnp.where(inside, 0.0, ek2))
    n_stadium = jnp.sum(jnp.where(inside, 3.0, 0.0))
    ttt = jnp.maximum((nactive - n_stadium) * params.temperature, 1e-30)
    eta_new = eta + dt * (e2_out / ttt - 1.0) * params.isq_tau_eta
    return scene2, stats, eta_new


def langevin(scene: Scene, params: IntegratorParams, key: jax.Array,
             pdecay: bool = False, nrb_mask=None) -> Tuple[Scene, StepStats]:
    """Langevin thermostat (imd_integrate.c:191-198): uniform random kicks
    with sigma = sqrt(24 T (gamma/dt)/dt m) on top of the viscous damping
    (set params.viscous_friction = gamma).  The reference uses drand48
    uniform noise; we use jax.random.uniform - same first two moments."""
    sigma = jnp.sqrt(24.0 * params.temperature
                     * (params.viscous_friction / params.timestep)
                     / params.timestep * jnp.maximum(scene.mass, 1e-30))
    noise = (jax.random.uniform(key, scene.force.shape,
                                scene.force.dtype) - 0.5)
    scene = scene.replace(force=scene.force
                          + noise * sigma[..., None] * scene.fmask()[..., None])
    return nve(scene, params, pdecay=pdecay, nrb_mask=nrb_mask)


class NPTState(struct.PyTreeNode):
    """Nose-Hoover thermostat + Andersen barostat state (xi may be a
    scalar for npt_iso or a [3] vector for npt_axial)."""
    eta: jnp.ndarray
    xi: jnp.ndarray
    ekin_old: jnp.ndarray


def npt_iso(scene: Scene, params: IntegratorParams, st: NPTState,
            nactive, virial, isq_tau_xi, pressure_ext
            ) -> Tuple[Scene, StepStats, NPTState]:
    """Isotropic NPT (move_atoms_npt_iso, imd_integrate.c:1631-1770):
    semi-implicit friction (xi_old + eta) on momenta, xi-scaled position
    update, box rescale by (1 + xi dt/2)/(1 - xi dt/2)."""
    dt = params.timestep
    box = scene.grid.box
    volume = box.volume
    pressure = (st.ekin_old + virial) / (3.0 * volume)
    xi_old = st.xi
    xi = st.xi + dt * (pressure - pressure_ext) * volume * isq_tau_xi / nactive

    pfric = 1.0 - (xi_old + st.eta) * dt * 0.5
    pifric = 1.0 / (1.0 + (xi + st.eta) * dt * 0.5)
    rfric = 1.0 + xi * dt * 0.5
    rifric = 1.0 / (1.0 - xi * dt * 0.5)

    F = _apply_force_mods(scene, params)
    p_new = (pfric * scene.mom + dt * F) * pifric
    inv_m = jnp.where(scene.mask, 1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
    x_new = (rfric * scene.pos + p_new * (dt * inv_m)[..., None]) * rifric
    k1 = jnp.sum(jnp.sum(scene.mom ** 2, -1) * inv_m)
    k2 = jnp.sum(jnp.sum(p_new ** 2, -1) * inv_m)

    ttt = (1.0 + xi * dt * 0.5) / (1.0 - xi * dt * 0.5)
    new_box = box.replace(h=box.h * ttt, inv_h=box.inv_h / ttt)
    new_grid = scene.grid.replace(box=new_box)
    eta = st.eta + dt * (k2 / (nactive * jnp.maximum(params.temperature,
                                                     1e-30)) - 1.0
                         ) * params.isq_tau_eta
    mask = scene.fmask()
    stats = StepStats(tot_kin_energy=(k1 + k2) / 4.0,
                      fnorm=jnp.sum(F * F * mask[..., None]),
                      pnorm=jnp.sum(p_new * p_new * mask[..., None]),
                      pxf=jnp.sum(p_new * F * mask[..., None]),
                      ekin_new=k2 / 2.0)
    return (scene.replace(pos=x_new, mom=p_new, grid=new_grid), stats,
            NPTState(eta=eta, xi=xi, ekin_old=k2))


def npt_axial(scene: Scene, params: IntegratorParams, st: NPTState,
              nactive, presstens, isq_tau_xi, pressure_ext
              ) -> Tuple[Scene, StepStats, NPTState]:
    """Anisotropic NPT (move_atoms_npt_axial, integrate.c:1903): per-axis
    barostat friction xi[3] driven by the diagonal dynamic stress
    (kinetic + virial part per axis); each box vector scales with its own
    factor.  ``presstens`` [6] from the force pass (xx yy zz yz zx xy);
    ``pressure_ext`` [3]."""
    dt = params.timestep
    box = scene.grid.box
    volume = box.volume
    inv_m = jnp.where(scene.mask, 1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
    ekin_ax = jnp.sum(scene.mom ** 2 * inv_m[..., None],
                      axis=tuple(range(scene.mom.ndim - 1)))   # [3] 2*Ekin_a
    stress = (ekin_ax + presstens[:3]) / volume
    xi_old = st.xi
    xi = st.xi + dt * (stress - pressure_ext) * volume * (
        3.0 * isq_tau_xi / nactive)

    pfric = 1.0 - (xi_old + st.eta) * dt * 0.5
    pifric = 1.0 / (1.0 + (xi + st.eta) * dt * 0.5)
    rfric = 1.0 + xi * dt * 0.5
    rifric = 1.0 / (1.0 - xi * dt * 0.5)

    F = _apply_force_mods(scene, params)
    p_new = (pfric * scene.mom + dt * F) * pifric
    x_new = (rfric * scene.pos + p_new * (dt * inv_m)[..., None]) * rifric
    k1 = jnp.sum(jnp.sum(scene.mom ** 2, -1) * inv_m)
    k2 = jnp.sum(jnp.sum(p_new ** 2, -1) * inv_m)

    ttt = (1.0 + xi * dt * 0.5) / (1.0 - xi * dt * 0.5)   # [3]
    # h' = diag(ttt) h  =>  h'^-1 = h^-1 diag(1/ttt)
    new_box = box.replace(h=box.h * ttt[:, None],
                          inv_h=box.inv_h / ttt[None, :])
    new_grid = scene.grid.replace(box=new_box)
    eta = st.eta + dt * (k2 / (nactive * jnp.maximum(params.temperature,
                                                     1e-30)) - 1.0
                         ) * params.isq_tau_eta
    mask = scene.fmask()
    stats = StepStats(tot_kin_energy=(k1 + k2) / 4.0,
                      fnorm=jnp.sum(F * F * mask[..., None]),
                      pnorm=jnp.sum(p_new * p_new * mask[..., None]),
                      pxf=jnp.sum(p_new * F * mask[..., None]),
                      ekin_new=k2 / 2.0)
    return (scene.replace(pos=x_new, mom=p_new, grid=new_grid), stats,
            NPTState(eta=eta, xi=xi, ekin_old=k2))


def sllod(scene: Scene, params: IntegratorParams, nactive, eta,
          shear_rate, shear_rate2) -> Tuple[Scene, StepStats, jnp.ndarray]:
    """Homogeneous shear-flow NVT (move_atoms_sllod, integrate.c:1324).

    ``shear_rate``/``shear_rate2`` [3]: off-diagonal velocity-gradient
    entries per the reference's convention (x += sr.z*y + sr2.y*z, etc.);
    momenta get per-component friction eta + shear terms.
    """
    dt = params.timestep
    fric = jnp.stack([eta + shear_rate[2] + shear_rate2[1],
                      eta + shear_rate[0] + shear_rate2[2],
                      eta + shear_rate[1] + shear_rate2[0]])
    reib = 1.0 - fric * dt * 0.5
    ireib = 1.0 / (1.0 + fric * dt * 0.5)
    F = _apply_force_mods(scene, params)
    inv_m = jnp.where(scene.mask, 1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
    k1 = jnp.sum(jnp.sum(scene.mom ** 2, -1) * inv_m)
    p_new = (scene.mom * reib + dt * F) * ireib
    k2 = jnp.sum(jnp.sum(p_new ** 2, -1) * inv_m)
    x = scene.pos + p_new * (dt * inv_m)[..., None]
    x = x.at[..., 0].add(shear_rate[2] * x[..., 1]
                         + shear_rate2[1] * x[..., 2])
    x = x.at[..., 1].add(shear_rate[0] * x[..., 2]
                         + shear_rate2[2] * x[..., 0])
    x = x.at[..., 2].add(shear_rate[1] * x[..., 0]
                         + shear_rate2[0] * x[..., 1])
    mask = scene.fmask()
    stats = StepStats(tot_kin_energy=(k1 + k2) / 4.0,
                      fnorm=jnp.sum(F * F * mask[..., None]),
                      pnorm=jnp.sum(p_new * p_new * mask[..., None]),
                      pxf=jnp.sum(p_new * F * mask[..., None]),
                      ekin_new=k2 / 2.0)
    eta_new = eta + dt * params.isq_tau_eta * (
        k2 / (nactive * jnp.maximum(params.temperature, 1e-30)) - 1.0)
    return scene.replace(pos=x, mom=p_new), stats, eta_new


# ---------------------------------------------------------------------------
# velocity initialization (imd_maxwell.c:45)
# ---------------------------------------------------------------------------

def zapp(scene: Scene, restrictions: Optional[jnp.ndarray],
         threshold) -> Scene:
    """ZAPP total-momentum zeroing (zapp(), imd_main_3d.c:1466-1520):
    when the per-active-DOF mean momentum exceeds ``zapp_threshold``,
    subtract it from every atom along its unrestricted directions.  The
    component-wise active counts follow init_zapp (imd_main_3d.c:1402),
    the reference's MPI_Allreduce pair is a plain masked sum here."""
    m = scene.fmask()[..., None]
    if restrictions is not None:
        vt = jnp.clip(scene.vtype, 0, restrictions.shape[0] - 1)
        rest = restrictions[vt] * m
    else:
        rest = jnp.broadcast_to(m, scene.mom.shape)
    axes = tuple(range(scene.mom.ndim - 1))
    total = jnp.sum(scene.mom * m, axis=axes)
    nact = jnp.sum(rest, axis=axes)
    pmean = jnp.where(nact > 0, total / jnp.maximum(nact, 1.0), 0.0)
    do = jnp.sum(pmean * pmean) >= jnp.asarray(threshold,
                                               pmean.dtype) ** 2
    return scene.replace(mom=jnp.where(do, scene.mom - pmean * rest,
                                       scene.mom))


def bend_force_table(scene: Scene, origin_vt: jnp.ndarray,
                     force_vt: jnp.ndarray, axes_mom: jnp.ndarray,
                     n_origin: jnp.ndarray, n_force: jnp.ndarray,
                     bforce_mag: jnp.ndarray, vtypes: int) -> jnp.ndarray:
    """Per-vtype bending-moment force table (update_bend,
    imd_main_3d.c:1672-1780): for each moment the force direction is
    ``unit(cog_force − cog_origin) × bend_axis`` scaled by the magnitude
    of the moment's b-FBC force; group atom counts are captured at init
    (init_bend, imd_main_3d.c:1528) and stay fixed like the reference's.

    origin_vt/force_vt [nmom] int; axes_mom [nmom,3] unit vectors;
    n_origin/n_force [nmom] counts; bforce_mag [nmom].
    """
    m = scene.fmask()
    vt = scene.vtype
    w_o = ((vt[..., None] == origin_vt) * m[..., None]).astype(
        scene.pos.dtype)
    w_f = ((vt[..., None] == force_vt) * m[..., None]).astype(
        scene.pos.dtype)
    hi = jax.lax.Precision.HIGHEST
    com_o = (jnp.einsum("...m,...c->mc", w_o, scene.pos, precision=hi)
             / jnp.maximum(n_origin, 1.0)[:, None])
    com_f = (jnp.einsum("...m,...c->mc", w_f, scene.pos, precision=hi)
             / jnp.maximum(n_force, 1.0)[:, None])
    bv = com_f - com_o
    bv = bv / jnp.maximum(jnp.linalg.norm(bv, axis=1, keepdims=True),
                          1e-30)
    tf = jnp.cross(bv, axes_mom) * bforce_mag[:, None]   # [nmom, 3]
    table = jnp.zeros((vtypes, 3), scene.pos.dtype)
    return table.at[force_vt].set(tf)


def maxwell(scene: Scene, temperature, key: jax.Array,
            restrictions: Optional[jnp.ndarray] = None,
            exact: bool = True) -> Scene:
    """Maxwell-Boltzmann momenta at (k_B T) = ``temperature`` (eV).

    Momenta are Gaussian with variance m*T per component, the total momentum
    is removed, and (like the reference's rescale) the temperature is made
    exact over the active degrees of freedom.
    """
    dtype = scene.pos.dtype
    mask = scene.fmask()
    g = jax.random.normal(key, scene.mom.shape, dtype)
    sigma = jnp.sqrt(jnp.maximum(scene.mass, 0.0) *
                     jnp.asarray(temperature, dtype))[..., None]
    p = g * sigma * mask[..., None]
    if restrictions is not None:
        vt = jnp.clip(scene.vtype, 0, restrictions.shape[0] - 1)
        active = restrictions[vt] * mask[..., None]
    else:
        active = jnp.broadcast_to(mask[..., None], p.shape)
    p = p * active
    # remove center-of-mass drift of the active components
    n_act = jnp.maximum(jnp.sum(active, axis=(0, 1, 2, 3)), 1.0)
    mass_tot = jnp.sum(scene.mass * mask)
    p_tot = jnp.sum(p, axis=(0, 1, 2, 3))
    p = p - (p_tot / jnp.maximum(mass_tot, 1e-30)) * scene.mass[..., None] * active
    if exact:
        inv_m = jnp.where(scene.mask, 1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
        ekin = 0.5 * jnp.sum(jnp.sum(p * p, -1) * inv_m)
        ndof = jnp.sum(active)
        t_cur = 2.0 * ekin / jnp.maximum(ndof, 1.0)
        scale = jnp.sqrt(jnp.asarray(temperature, dtype) /
                         jnp.maximum(t_cur, 1e-30))
        p = p * jnp.where(temperature > 0, scale, 0.0)
    return scene.replace(mom=p)


def clone_sync(scene: Scene, nclones: int, n_groups: int,
               id_base: int = 0) -> Scene:
    """CLONE lockstep replicas (imd_integrate.c:118-132).

    Before moving, every clone j = 1..nclones-1 takes its group
    leader's force AND momentum, so clone groups follow identical
    trajectories from their initial offsets (Maxwell init equalizes
    velocities the same way, imd_maxwell.c:240-273).  The reference
    identifies clones by consecutive storage order inside a cell; the
    padded-cell layout has no stable order, so clones are identified by
    atom id instead: group g = (id - id_base) // nclones, leader
    (id - id_base) % nclones == 0 (generate consecutive ids per clone
    stack, as the reference's config files do).  ``id_base`` is the
    smallest atom id, so 1-based checkpoint numbering pairs the same
    stacks as 0-based.  An atom whose group has no alive leader (the
    leader was FILTERed away, or ids aren't consecutive) keeps its own
    force/momentum instead of being silently zeroed.
    """
    shape = scene.pos.shape
    m = int(shape[0] * shape[1] * shape[2] * shape[3])
    ids = jnp.maximum(scene.id.reshape(m) - id_base, 0)
    alive = scene.mask.reshape(m)
    group = jnp.clip(ids // nclones, 0, n_groups - 1)
    # EPITAX-inserted atoms past the groups sized at build time have no
    # leader of their own; never borrow the clamped last group's
    in_range = ids // nclones < n_groups
    leader = alive & in_range & (ids % nclones == 0)
    # per-group alive-leader indicator: groups without one keep self
    has_lead = jax.ops.segment_sum(
        leader.astype(scene.pos.dtype), group, num_segments=n_groups)

    def sync(a):
        flat = a.reshape(m, 3)
        lead = jax.ops.segment_sum(
            jnp.where(leader[:, None], flat, 0.0), group,
            num_segments=n_groups)
        take = alive & in_range & (has_lead[group] > 0)
        return jnp.where(take[:, None], lead[group], flat).reshape(shape)

    return scene.replace(force=sync(scene.force), mom=sync(scene.mom))


def count_active_dof(scene: Scene,
                     restrictions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """nactive: number of unrestricted degrees of freedom (imd_misc.c)."""
    mask = scene.fmask()
    if restrictions is None:
        return 3.0 * jnp.sum(mask)
    vt = jnp.clip(scene.vtype, 0, restrictions.shape[0] - 1)
    return jnp.sum(restrictions[vt] * mask[..., None])


# ---------------------------------------------------------------------------
# SHOCK: piston/mirror shock loading (imd_maxwell.c:221-235 init;
# imd_integrate.c:434-452 step mirrors)
# ---------------------------------------------------------------------------

def shock_init(scene: Scene, mode: int, shock_speed, strip=0.0) -> Scene:
    """Superimpose the shock drift on the thermal velocities.

    mode 1: plate (x < shock_strip) against bulk; mode 2: two halves
    against each other; mode 3: whole bulk against a wall.
    """
    m = scene.fmask()
    x = scene.pos[..., 0]
    dp = jnp.asarray(shock_speed, scene.pos.dtype) * scene.mass * m
    if mode == 1:
        dp = jnp.where(x < strip, dp, 0.0)
    elif mode == 2:
        bx = scene.grid.box.h[0, 0]
        dp = jnp.where(x < 0.5 * bx, dp, -dp)
    elif mode != 3:
        raise ValueError(f"shock_mode {mode} has no velocity init")
    mom = scene.mom.at[..., 0].add(dp)
    return scene.replace(mom=mom)


def shock_mirrors(scene: Scene, mode: int, step, timestep,
                  shock_speed_l=0.0, shock_speed_r=0.0) -> Scene:
    """Post-step reflecting walls (imd_integrate.c:434-452).

    mode 3: fixed wall at box_x (atoms crossing bounce back); mode 4:
    two pistons moving inward at shock_speed_l/r.

    Deliberate deviation from the reference: imd_integrate.c:449 places
    the RIGHT piston at box_x - shock_speed_l*t (it reuses the `rand`
    variable computed from the left speed), which is only correct for
    symmetric pistons.  We place it at box_x - shock_speed_r*t so that
    asymmetric speeds behave as documented; results differ from the
    reference only when shock_speed_l != shock_speed_r.
    """
    x = scene.pos[..., 0]
    px = scene.mom[..., 0]
    bx = scene.grid.box.h[0, 0]
    dtype = scene.pos.dtype
    if mode == 3:
        hit = (x > bx) & scene.mask & (step > 0)
        px = jnp.where(hit, -px, px)
        x = jnp.where(hit, 2.0 * bx - x, x)
    elif mode == 4:
        rand = jnp.asarray(shock_speed_l, dtype) * timestep * step
        hit_l = (x < rand) & scene.mask
        px = jnp.where(hit_l, -px + 2.0 * shock_speed_l * scene.mass, px)
        x = jnp.where(hit_l, 2.0 * rand - x, x)
        randr = bx - jnp.asarray(shock_speed_r, dtype) * timestep * step
        hit_r = (x > randr) & scene.mask
        px = jnp.where(hit_r, -px - 2.0 * shock_speed_r * scene.mass, px)
        x = jnp.where(hit_r, 2.0 * randr - x, x)
    else:
        raise ValueError(f"shock_mode {mode} has no step mirrors")
    return scene.replace(mom=scene.mom.at[..., 0].set(px),
                         pos=scene.pos.at[..., 0].set(x))
