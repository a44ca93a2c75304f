"""Structural relaxation: GLOK/FIRE quasi-dynamics and conjugate gradient.

Rebuilds:
- GLOK / adaptive GLOK / MIX = the reference's FIRE-family relaxator
  (update_glok, imd_main_3d.c:1018-1111; MIX momentum mixing,
  imd_integrate.c:367-374): run NVE steps; whenever P.F < 0 (or Ekin/atom
  exceeds glok_ekin_threshold), move positions half a step back and zero
  all momenta; adapt the timestep up after sustained downhill motion and
  down after uphill events; mix momenta toward the force direction
  p <- (1-mix) p + mix sqrt(pnorm/fnorm) F.
- CG relaxation (imd_cg.c:46-545): Polak-Ribiere directions with a
  line minimization along h; the reference brackets+bisects on the
  directional derivative (linmin/zbrent); here one secant step on the
  directional derivative (two force evaluations per CG step) which is
  the same first-order optimum for a locally quadratic PES.
- check_relaxed (imd_main_3d.c:1787-1870): fnorm / ekin / delta-epot
  convergence thresholds end a quasistatic relaxation phase.

All functions are jit-safe; force_fn: Scene -> (force, epot) pytrees.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from imd_tpu import integrate
from imd_tpu.scene import Scene


class FireState(struct.PyTreeNode):
    timestep: jnp.ndarray       # adaptive dt (ADAPTGLOK)
    mix: jnp.ndarray            # MIX mixing factor
    glok_int: jnp.ndarray       # steps since last reset (int32)
    n_pxf: jnp.ndarray          # uphill-event counter (int32)


class FireConfig(struct.PyTreeNode):
    """Static FIRE knobs (glok_* / fire_* params)."""
    incfac: float = struct.field(pytree_node=False, default=1.1)
    decfac: float = struct.field(pytree_node=False, default=0.5)
    mix0: float = struct.field(pytree_node=False, default=0.1)
    mixdec: float = struct.field(pytree_node=False, default=0.99)
    minsteps: int = struct.field(pytree_node=False, default=5)
    min_n_pxf: int = struct.field(pytree_node=False, default=1)
    max_timestep: float = struct.field(pytree_node=False, default=0.0)
    ekin_threshold: float = struct.field(pytree_node=False, default=1e30)


def fire_init(dt0, cfg: FireConfig) -> FireState:
    return FireState(timestep=jnp.asarray(dt0),
                     mix=jnp.asarray(cfg.mix0, jnp.result_type(dt0)),
                     glok_int=jnp.zeros((), jnp.int32),
                     n_pxf=jnp.zeros((), jnp.int32))


def fire_update(scene: Scene, stats: integrate.StepStats, st: FireState,
                cfg: FireConfig, nactive) -> Tuple[Scene, FireState]:
    """Post-step GLOK correction + timestep adaptation (update_glok)."""
    dtr = st.timestep.dtype
    ekin = 2.0 * stats.tot_kin_energy / jnp.maximum(nactive, 1)
    uphill = (stats.pxf < 0.0) | (ekin > cfg.ekin_threshold)

    # half-step-back + momentum reset on uphill (main_3d.c:1081-1097)
    inv_m = jnp.where(scene.mask, 1.0 / jnp.maximum(scene.mass, 1e-30), 0.0)
    x_back = scene.pos - 0.5 * st.timestep * scene.mom * inv_m[..., None]
    scene = scene.replace(
        pos=jnp.where(uphill, x_back, scene.pos),
        mom=jnp.where(uphill, 0.0, scene.mom))

    max_dt = cfg.max_timestep if cfg.max_timestep > 0 else 1e30
    grown = jnp.minimum(st.timestep * cfg.incfac, jnp.asarray(max_dt, dtr))
    can_grow = (st.n_pxf >= cfg.min_n_pxf) & (st.glok_int > cfg.minsteps)
    dt_new = jnp.where(uphill, st.timestep * cfg.decfac,
                       jnp.where(can_grow, grown, st.timestep))
    mix_new = jnp.where(uphill, jnp.asarray(cfg.mix0, dtr),
                        st.mix * cfg.mixdec)

    # MIX momentum steering (imd_integrate.c:367-374)
    scale = jnp.sqrt(stats.pnorm / jnp.maximum(stats.fnorm, 1e-20))
    mixed = (1.0 - st.mix) * scene.mom + st.mix * scale * scene.force
    scene = scene.replace(mom=jnp.where(uphill, scene.mom, mixed)
                          * scene.fmask()[..., None])

    return scene, FireState(
        timestep=dt_new, mix=mix_new,
        glok_int=jnp.where(uphill, 0, st.glok_int + 1),
        n_pxf=st.n_pxf + uphill.astype(jnp.int32))


def fire_step(scene: Scene, st: FireState, cfg: FireConfig,
              force_fn: Callable, params: integrate.IntegratorParams,
              nactive):
    """One NVE step + GLOK correction; returns (scene, stats, state)."""
    res = force_fn(scene)
    scene = scene.replace(force=res.force, epot=res.epot)
    scene, stats = integrate.nve(scene,
                                 params.replace(timestep=st.timestep))
    scene, st = fire_update(scene, stats, st, cfg, nactive)
    return scene, stats, st


# ---------------------------------------------------------------------------
# conjugate gradient (imd_cg.c)
# ---------------------------------------------------------------------------

def cg_relax(scene: Scene, force_fn: Callable, n_steps: int,
             trial_step: float = 0.02, restart_every: int = 50,
             max_move: float = 0.2):
    """Polak-Ribiere CG with a secant line search (cg_step/linmin,
    imd_cg.c:46-210).  Two force evaluations per iteration; jit-safe.

    The search direction is displacement-normalized: the trial probe
    moves the fastest atom by ``trial_step`` Å and the accepted step is
    clamped to ``max_move`` Å per atom (the role of the reference's
    linmin bracketing, which an unnormalized secant step lacks — raw
    alpha*h steps explode a perturbed lattice).  Non-descent directions
    restart with steepest descent, like cg_reset_int.

    Returns (scene, epot_trace [n_steps], fnorm_final).
    """
    res0 = force_fn(scene)
    g0 = res0.force * scene.fmask()[..., None]

    def body(carry, i):
        scene, g_prev, h = carry
        res = force_fn(scene)
        g = res.force * scene.fmask()[..., None]
        # Polak-Ribiere beta, restarted periodically (cg_reset_int)
        num = jnp.sum(g * (g - g_prev))
        den = jnp.maximum(jnp.sum(g_prev * g_prev), 1e-30)
        beta = jnp.maximum(num / den, 0.0)
        beta = jnp.where(i % restart_every == 0, 0.0, beta)
        h = g + beta * h
        # restart with steepest descent when h is not a descent direction
        d0 = jnp.sum(g * h)
        h = jnp.where(d0 > 0.0, h, g)
        d0 = jnp.where(d0 > 0.0, d0, jnp.sum(g * g))
        # secant linmin on the directional derivative (linmin, cg:96):
        # probe at a displacement of trial_step A for the fastest atom
        hmax = jnp.maximum(jnp.max(jnp.abs(h)), 1e-30)
        s = trial_step / hmax
        trial = force_fn(scene.replace(pos=scene.pos + s * h))
        d1 = jnp.sum(trial.force * scene.fmask()[..., None] * h)
        denom = d0 - d1
        alpha = jnp.where(jnp.abs(denom) > 1e-30, s * d0 / denom, s)
        # clamp: no atom moves more than max_move A in one iteration
        alpha = jnp.clip(alpha, 0.0, max_move / hmax)
        scene = scene.replace(pos=scene.pos + alpha * h)
        return (scene, g, h), jnp.sum(res.epot)

    (scene, g, h), epots = jax.lax.scan(
        body, (scene, g0, jnp.zeros_like(g0)),
        jnp.arange(n_steps))
    res = force_fn(scene)
    fnorm = jnp.sum(res.force * res.force * scene.fmask()[..., None])
    return scene.replace(force=res.force, epot=res.epot), epots, fnorm


def check_relaxed(stats: integrate.StepStats, epot, epot_prev, nactive,
                  fnorm_threshold: float = 0.0,
                  ekin_threshold: float = 0.0,
                  delta_epot_threshold: float = 0.0):
    """Quasistatic convergence test (check_relaxed, main_3d.c:1787-1870)."""
    ok = jnp.asarray(False)
    if fnorm_threshold > 0:
        ok = ok | (jnp.sqrt(stats.fnorm / jnp.maximum(nactive, 1))
                   < fnorm_threshold)
    if ekin_threshold > 0:
        ok = ok | (2.0 * stats.tot_kin_energy / jnp.maximum(nactive, 1)
                   < ekin_threshold)
    if delta_epot_threshold > 0:
        ok = ok | (jnp.abs(epot - epot_prev) / jnp.maximum(nactive, 1)
                   < delta_epot_threshold)
    return ok
