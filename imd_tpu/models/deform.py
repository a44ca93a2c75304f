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
