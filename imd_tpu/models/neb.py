"""Nudged elastic band (imd_neb.c): saddle-point search over replicas.

The reference runs neb_nrep MPI process groups, one image each, and
exchanges neighbor-image positions every step (neb_sendrecv_pos,
imd_neb.c:151); the NEB force assembly is calc_forces_neb (188).  The
TPU analog is a vmap over the image axis: all images' force evaluations
batch into one device program, and the neighbor-image differences are
just shifted slices - no communication at all on a single chip (and a
sharded image axis + ppermute on a mesh).

Implementation notes:
- improved tangent after Henkelman & Jonsson (JCP 113, 9978 (2000)):
  forward/backward difference picked by neighbor energies, mixed at
  extrema;
- spring force k (|x_{i+1}-x_i| - |x_i-x_{i-1}|) along the tangent,
  true force orthogonalized against it;
- optional climbing image (highest image feels F - 2(F.t)t);
- endpoints stay fixed; relaxation is MIK/quickmin per image (the
  reference couples NEB with its relaxators the same way);
- the per-image force oracle defaults to the all-pairs engine
  (ops/forces.pair_forces_n2) on flat [N,3] coordinates: NEB images
  need stable atom correspondence, which flat id-ordered arrays give
  for free (re-binned cell layouts do not).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


def interpolate_images(x0, x1, n_images: int, box=None):
    """Linear interpolation between endpoint configurations [N,3] ->
    [R, N, 3] including endpoints (minimum-image displacement)."""
    d = x1 - x0
    if box is not None:
        d = box.min_image(d)
    w = jnp.linspace(0.0, 1.0, n_images)[:, None, None]
    return x0[None] + w * d[None]


def neb_tangent(x, e, box=None):
    """Improved tangents [R,N,3] (zero at endpoints)."""
    def disp(a, b):
        d = a - b
        return box.min_image(d) if box is not None else d

    d_fwd = disp(jnp.roll(x, -1, 0), x)        # x_{i+1} - x_i
    d_bwd = disp(x, jnp.roll(x, 1, 0))         # x_i - x_{i-1}
    e_fwd = jnp.roll(e, -1)
    e_bwd = jnp.roll(e, 1)
    up = (e_fwd > e) & (e > e_bwd)
    dn = (e_fwd < e) & (e < e_bwd)
    dmax = jnp.maximum(jnp.abs(e_fwd - e), jnp.abs(e_bwd - e))
    dmin = jnp.minimum(jnp.abs(e_fwd - e), jnp.abs(e_bwd - e))
    wmax = jnp.where(e_fwd > e_bwd, dmax, dmin)[:, None, None]
    wmin = jnp.where(e_fwd > e_bwd, dmin, dmax)[:, None, None]
    t = jnp.where(up[:, None, None], d_fwd,
                  jnp.where(dn[:, None, None], d_bwd,
                            d_fwd * wmax + d_bwd * wmin))
    norm = jnp.sqrt(jnp.sum(t * t, axis=(1, 2), keepdims=True))
    return t / jnp.maximum(norm, 1e-30)


def vark_spring(e, kmin: float, kmax: float):
    """Energy-dependent spring constants (imd_neb.c:260-270, after
    JCP 113, 9901): k_i = (k_max+k_min)/2 - (k_max-k_min)/2 *
    cos(pi (E_i - E_min)/(E_max - E_min)).  Returns [R]."""
    emin, emax = jnp.min(e), jnp.max(e)
    de = jnp.maximum(emax - emin, 1e-12)
    return 0.5 * ((kmax + kmin)
                  - (kmax - kmin) * jnp.cos(jnp.pi * (e - emin) / de))


def neb_forces(x, f_true, e, k_spring, box=None,
               climb: bool = False, climb_image: int = -1):
    """Assemble NEB forces for all images (calc_forces_neb analog).

    x [R,N,3], f_true [R,N,3], e [R].  Endpoint images get zero force.
    ``k_spring`` may be a scalar or a per-image [R] array (variable
    springs); per-pair constants are neighbor averages kr/kl
    (imd_neb.c:286-287).  ``climb_image`` pins the climbing image to a
    fixed index (neb_climbing_image tag); -1 climbs the energy maximum.
    """
    r = x.shape[0]
    tang = neb_tangent(x, e, box)

    def disp(a, b):
        d = a - b
        return box.min_image(d) if box is not None else d

    d_fwd = disp(jnp.roll(x, -1, 0), x)
    d_bwd = disp(x, jnp.roll(x, 1, 0))
    l_fwd = jnp.sqrt(jnp.sum(d_fwd ** 2, (1, 2)))
    l_bwd = jnp.sqrt(jnp.sum(d_bwd ** 2, (1, 2)))
    f_par = jnp.sum(f_true * tang, (1, 2))
    f_perp = f_true - f_par[:, None, None] * tang
    k = jnp.broadcast_to(jnp.asarray(k_spring, x.dtype), (r,))
    kr = 0.5 * (k + jnp.roll(k, -1))
    kl = 0.5 * (k + jnp.roll(k, 1))
    f_spr = (kr * l_fwd - kl * l_bwd)[:, None, None] * tang
    f_neb = f_perp + f_spr
    if climb:
        top = jnp.where(climb_image >= 0, climb_image, jnp.argmax(e))
        f_climb = f_true - 2.0 * f_par[:, None, None] * tang
        f_neb = jnp.where(jnp.arange(r)[:, None, None] == top, f_climb,
                          f_neb)
    interior = ((jnp.arange(r) > 0) & (jnp.arange(r) < r - 1))
    return f_neb * interior[:, None, None]


def neb_relax(x_images, force_fn: Callable, k_spring: float = 1.0,
              n_steps: int = 500, dt: float = 0.05, box=None,
              climb_after: int = 0, mass: float = 1.0,
              vark_after: int = 0, kmin: float = 0.0,
              kmax: float = 0.0, maxmove: float = 0.0,
              climb_image: int = -1, step0: int = 0):
    """Quickmin (MIK) NEB relaxation, fully jitted.

    ``force_fn(x [N,3]) -> (F [N,3], epot scalar)`` per image (vmapped).
    ``vark_after`` > 0 switches to energy-dependent spring constants
    kmin..kmax past that step (neb_vark_start); ``maxmove`` caps the
    per-step displacement of any coordinate (constrain_move,
    imd_main_3d.c:953); ``step0`` offsets the step counter so chunked
    calls honor the climb/vark start steps globally.
    Returns (x_images, energies, fmax_trace)."""
    fbatch = jax.vmap(force_fn)

    def step(carry, i):
        x, v = carry
        f, e = fbatch(x)
        climb = (climb_after > 0) & (i >= climb_after)
        if vark_after > 0 and kmin > 0 and kmax > 0:
            k = jnp.where(i >= vark_after, vark_spring(e, kmin, kmax),
                          jnp.full(e.shape, k_spring, x.dtype))
        else:
            k = jnp.asarray(k_spring, x.dtype)
        fn = jax.lax.cond(
            climb,
            lambda: neb_forces(x, f, e, k, box, True, climb_image),
            lambda: neb_forces(x, f, e, k, box, False))
        v = v + dt * fn / mass
        # quickmin: keep only the velocity component along the force
        vf = jnp.sum(v * fn, (1, 2), keepdims=True)
        f2 = jnp.maximum(jnp.sum(fn * fn, (1, 2), keepdims=True), 1e-30)
        v = jnp.where(vf > 0, vf / f2 * fn, 0.0)
        dx = dt * v
        if maxmove > 0:
            dx = jnp.clip(dx, -maxmove, maxmove)
        x = x + dx
        fmax = jnp.max(jnp.abs(fn))
        return (x, v), (e, fmax)

    (x, _), (es, fmaxs) = jax.lax.scan(
        step, (x_images, jnp.zeros_like(x_images)),
        step0 + jnp.arange(n_steps))
    f, e = fbatch(x)
    return x, e, fmaxs


def barrier(e: jnp.ndarray) -> jnp.ndarray:
    """Forward activation energy max(E) - E[0]."""
    return jnp.max(e) - e[0]
