"""Deformation drivers (imd_deform.c): homogeneous strain, per-vtype
shear, pressure relaxation.

- `lin_deform` (imd_deform.c:33-120): x += scale * D x for every atom and
  every box vector (D rows = lindef_x/y/z), applied every lindef_interval
  steps for quasistatic straining;
- `deform_sample` (232-270): move per-virtual-type atom groups by
  deform_shift (optionally modulated by a shear profile around
  deform_base) - the indenter/crack driver;
- `relax_pressure` (127-215): isotropic (or axial) box rescale toward a
  target pressure using the current bulk-modulus estimate.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from imd_tpu.scene import Scene


def lin_deform(scene: Scene, dx, dy, dz, scale) -> Scene:
    """Apply the homogeneous deformation x += scale*D x; box h += scale D h.

    ``dx/dy/dz``: rows of the deformation matrix D (lindef_x/y/z tags).
    Follows with a wrap so re-binning stays valid; caller should rebin.
    """
    D = jnp.stack([jnp.asarray(dx, scene.pos.dtype),
                   jnp.asarray(dy, scene.pos.dtype),
                   jnp.asarray(dz, scene.pos.dtype)])
    pos = scene.pos + scale * jnp.einsum("ij,...j->...i", D, scene.pos)
    box = scene.grid.box
    # box vectors are rows of h: each transforms like a position
    h_new = box.h + scale * jnp.einsum("ij,kj->ki", D, box.h)
    inv_h = jnp.linalg.inv(h_new)
    grid = scene.grid.replace(box=box.replace(h=h_new, inv_h=inv_h))
    return scene.replace(pos=pos, grid=grid)


def deform_sample(scene: Scene, deform_shift, deform_size,
                  shear_def=None, deform_shear=None,
                  deform_base=None) -> Scene:
    """Per-virtual-type rigid shift (deform_sample, imd_deform.c:232).

    ``deform_shift`` [vtypes,3]; optional shear modulation: for vtypes
    with shear_def[vt]==1, shift scales with deform_shear[vt].(x - base).
    """
    vt = jnp.clip(scene.vtype, 0, deform_shift.shape[0] - 1)
    shift = deform_shift[vt]                      # [..., cap, 3]
    if shear_def is not None:
        sd = shear_def[vt]
        rel = scene.pos - deform_base[vt]
        shear = jnp.sum(deform_shear[vt] * rel, -1)
        factor = jnp.where(sd > 0, shear, 1.0)
    else:
        factor = jnp.ones(scene.type.shape, scene.pos.dtype)
    pos = scene.pos + (deform_size * factor)[..., None] * shift \
        * scene.fmask()[..., None]
    return scene.replace(pos=pos)


def relax_pressure_tensor(scene: Scene, presstens, presstens_ext,
                          bulk_module, shear_module, relax_mode: int,
                          relax_dirs, relax_rate) -> Scene:
    """Stress-tensor pressure relaxation (relax_pressure with
    STRESS_TENS, imd_deform.c:140-176): strain the box toward an
    external stress target every step, scaled by relax_rate.

    ``presstens`` [6] xx yy zz yz zx xy EXTENSIVE sums (the per-step
    accumulators); divided by the box volume here like the reference's
    tot_presstens/volume.  relax_mode: 0=full (deviatoric + shear
    components via the shear modulus), 1=axial (diagonal only, masked by
    relax_dirs), 2=iso (hydrostatic only)."""
    dtype = scene.pos.dtype
    vol = scene.grid.box.volume
    ext = jnp.asarray(presstens_ext, dtype)
    pt = presstens / vol - ext
    dirs = jnp.asarray(relax_dirs, dtype)
    pp = jnp.sum(pt[:3] * dirs) / jnp.maximum(jnp.sum(dirs), 1.0)
    b = 1.0 / jnp.maximum(jnp.asarray(bulk_module, dtype), 1e-30)
    g = 1.0 / jnp.maximum(jnp.asarray(shear_module, dtype), 1e-30)
    if relax_mode in (0, 1):          # full / axial: deviatoric diagonal
        diag = pp * b + (pt[:3] - pp) * g
    else:                             # iso
        diag = jnp.full((3,), pp * b, dtype)
    if relax_mode == 1:               # axial: strain only relax_dirs
        diag = diag * dirs
    if relax_mode == 0:               # full: shear components too
        yz, zx, xy = pt[3] * g, pt[4] * g, pt[5] * g
    else:
        yz = zx = xy = jnp.zeros((), dtype)
    dxr = jnp.stack([diag[0], xy, zx])
    dyr = jnp.stack([xy, diag[1], yz])
    dzr = jnp.stack([zx, yz, diag[2]])
    return lin_deform(scene, dxr, dyr, dzr, relax_rate)


def relax_pressure(scene: Scene, ekin2, virial, pressure_target,
                   bulk_module, relax_rate=1.0) -> Scene:
    """One isotropic box-rescale step toward the target pressure
    (relax_pressure, imd_deform.c:127-215): linear-elastic estimate
    dV/V = (P - P_ext)/B, applied with a damping factor."""
    box = scene.grid.box
    vol = box.volume
    pressure = (ekin2 + virial) / (3.0 * vol)
    dvol = relax_rate * (pressure - pressure_target) / jnp.maximum(
        bulk_module, 1e-30)
    lin = jnp.cbrt(1.0 + dvol)
    new_box = box.replace(h=box.h * lin, inv_h=box.inv_h / lin)
    return scene.replace(pos=scene.pos * lin,
                         grid=scene.grid.replace(box=new_box))
