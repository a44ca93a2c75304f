"""Legacy laser energy deposition: rescale modes + beam profiles.

Rebuild of imd_laser.c / imd_laser_profiles.c:

- `get_surface`: 1-D density histogram along x (bin ~2.5 A) to locate the
  irradiated surface for the Lambert-Beer depth origin (imd_laser.c:117-279);
- `rescale_1`: add dE = exp(-mu depth) * p_peak * exp(-(t-t0)^2/(2 s^2))
  * dt * atom_vol of kinetic energy to every atom by rescaling its
  momentum (random direction for resting atoms), imd_laser.c:457-603;
- `rescale_2`: add the momentum increment in a random direction, then
  rescale to the exact energy (imd_laser.c:606-685);
- rescale mode 3 is an empty stub in the reference (imd_laser.c:688-696)
  and mode 4 feeds the TTM source instead (laser_rescale_ttm:715 ->
  models/ttm.lambert_beer_source);
- transverse beam profiles (LASERYZ, imd_laser_profiles.c): Laguerre-
  Gaussian LG00/01/02 and Hermite-Gaussian TEM00/01/02 intensity
  profiles in the (y, z) plane; the reference stores 1/w0^2 in
  laser_sigma_w0 (imd_laser.c comment at profiles.c:41).

The stochastic directions use jax.random instead of drand48; statistics
match (uniform unit vectors).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from imd_tpu.scene import Scene


def p_peak(mu: float, sigma_e: float, sigma_t: float) -> float:
    """Peak power density (imd_laser.c:290): mu sigma_e/(sigma_t sqrt(2pi))."""
    return mu * sigma_e / (max(sigma_t, 1e-30) * math.sqrt(2.0 * math.pi))


def get_surface(scene: Scene, deltax: float = 2.5,
                threshold_frac: float = 0.5) -> jnp.ndarray:
    """Locate the left surface by a 1-D x-density histogram
    (get_surface, imd_laser.c:117-279).

    Returns the x coordinate of the first bin (from -x) whose occupation
    exceeds ``threshold_frac`` of the bulk (median nonzero) occupation.
    """
    bx = scene.grid.box.h[0, 0]
    n_bins = int(float(bx) / deltax)
    x = scene.pos[..., 0].reshape(-1)
    m = scene.mask.reshape(-1)
    b = jnp.clip((x / deltax).astype(jnp.int32), 0, n_bins - 1)
    hist = jax.ops.segment_sum(m.astype(jnp.int32),
                               jnp.where(m, b, n_bins),
                               num_segments=n_bins + 1)[:n_bins]
    bulk = jnp.max(hist)
    first = jnp.argmax(hist >= threshold_frac * bulk)
    return first.astype(scene.pos.dtype) * deltax


def _pulse_factor(lcfg, t, dt):
    """exp_gauss_time_etc (imd_laser.c:461-472): both pulses."""
    pp = p_peak(lcfg.mu, lcfg.sigma_e, lcfg.sigma_t)
    g = jnp.exp(-(t - lcfg.t_0) ** 2
                / (2.0 * max(lcfg.sigma_t, 1e-30) ** 2)) * pp
    if lcfg.sigma_e1 > 0 and lcfg.t_1 > 0:
        pp1 = p_peak(lcfg.mu, lcfg.sigma_e1, lcfg.sigma_t1)
        g = g + jnp.exp(-(t - lcfg.t_1) ** 2
                        / (2.0 * max(lcfg.sigma_t1, 1e-30) ** 2)) * pp1
    return g * dt * lcfg.atom_vol


def intensity_profile(y, z, mode: Tuple[int, int] = (0, 0),
                      kind: str = "laguerre", w0: float = 1.0,
                      yc: float = 0.0, zc: float = 0.0):
    """Transverse intensity profile I(y,z)/I0 (imd_laser_profiles.c).

    ``kind``: 'laguerre' (LG0l) or 'hermite' (TEM 0m along z).  ``w0`` is
    the 1/e^2 waist radius.
    """
    inv_w2 = 1.0 / (w0 * w0)
    dy = y - yc
    dz = z - zc
    rho = (dy * dy + dz * dz) * inv_w2
    l = mode[1]
    if kind == "laguerre":
        if l == 0:
            return jnp.exp(-2.0 * rho)          # profiles.c:27-45
        phi = jnp.arctan2(dy, dz)
        if l == 1:
            return 2.0 * rho * jnp.cos(phi) ** 2 * jnp.exp(-rho)
        if l == 2:
            r2 = 2.0 * rho
            return (r2 * r2 * jnp.cos(2.0 * phi) ** 2 * jnp.exp(-r2)
                    / (2.0 * math.pi))
        raise ValueError(f"laguerre mode {l} not implemented")
    # hermite: TEM_0m along z (profiles.c:465-545)
    zher = math.sqrt(2.0) * dz / w0
    if l == 0:
        return jnp.exp(-2.0 * rho)
    if l == 1:
        return zher ** 2 * jnp.exp(-2.0 * rho)
    if l == 2:
        return (zher ** 2 - 1.0) ** 2 * jnp.exp(-2.0 * rho)
    raise ValueError(f"hermite mode {l} not implemented")


def _depth(scene: Scene, lcfg, offset):
    d = (lcfg.dir[0] * scene.pos[..., 0] + lcfg.dir[1] * scene.pos[..., 1]
         + lcfg.dir[2] * scene.pos[..., 2]) - offset
    return jnp.maximum(d, 0.0)


def _rand_uvec(key, shape, dtype):
    v = jax.random.normal(key, shape + (3,), dtype)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


def _de(scene, lcfg, t, dt, offset, profile_fn=None):
    de = jnp.exp(-lcfg.mu * _depth(scene, lcfg, offset)) * _pulse_factor(
        lcfg, t, dt)
    if profile_fn is not None:
        de = de * profile_fn(scene.pos[..., 1], scene.pos[..., 2])
    return de * scene.fmask()


def rescale_1(scene: Scene, lcfg, t, dt, key, offset=0.0,
              profile_fn=None) -> Scene:
    """Deposit dE by momentum rescaling (laser_rescale_1)."""
    de = _de(scene, lcfg, t, dt, offset, profile_fn)
    p2 = jnp.sum(scene.mom ** 2, -1)
    resting = p2 < 1e-24
    scale = jnp.sqrt(de * 2.0 * scene.mass / jnp.where(resting, 1.0, p2)
                     + 1.0)
    p_scaled = scene.mom * scale[..., None]
    p_rand = _rand_uvec(key, scene.type.shape, scene.pos.dtype) * \
        jnp.sqrt(de * 2.0 * scene.mass)[..., None]
    mom = jnp.where(resting[..., None], p_rand, p_scaled)
    return scene.replace(mom=mom * scene.fmask()[..., None])


def rescale_2(scene: Scene, lcfg, t, dt, key, offset=0.0,
              profile_fn=None) -> Scene:
    """Random-direction momentum increment, then exact-energy rescale
    (laser_rescale_2)."""
    de = _de(scene, lcfg, t, dt, offset, profile_fn)
    p2 = jnp.sum(scene.mom ** 2, -1)
    p0 = jnp.sqrt(p2)
    dp = jnp.sqrt(p2 + 2.0 * de * scene.mass) - p0
    u = _rand_uvec(key, scene.type.shape, scene.pos.dtype)
    p_new = scene.mom + u * dp[..., None]
    norm = jnp.maximum(jnp.linalg.norm(p_new, axis=-1), 1e-30)
    p_new = p_new * ((p0 + dp) / norm)[..., None]
    return scene.replace(mom=p_new * scene.fmask()[..., None])
