"""Interpolation utilities (imd_interpol.c + nn_interpol/).

The reference carries bicubic 2-D (read_bc_interp), bilinear scattered
(read_lin_interp), tricubic 3-D with a 12.5 kLoC coefficient matrix
(read_tricub_interp / tricub_coeffmat.h), and a Delaunay
natural-neighbor library - all to evaluate material tables (EOS,
Drude-Lorentz fits) at runtime.

TPU-native replacements:
- scattered tables are resampled host-side onto regular grids at load
  (scipy.interpolate.griddata, see models/eos.TabulatedEOS.load);
- regular-grid device lookups: `interp_linear` (bi/trilinear) and
  `interp_cubic` (separable Catmull-Rom, C^1 - the role the tricubic
  64-coefficient scheme plays in fitDL table evaluation) - static-shape
  jnp, vmappable.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _axis_locate(g0, dg, n, x):
    """Uniform-grid locate: (index, fraction), clamped."""
    t = (x - g0) / dg
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    return i, t - i


def interp_linear(table, origins: Sequence[float], steps: Sequence[float],
                  *coords):
    """Multilinear interpolation on a uniform N-D grid (N = 1..3)."""
    nd = len(coords)
    idx, frac = [], []
    for d in range(nd):
        i, f = _axis_locate(origins[d], steps[d], table.shape[d], coords[d])
        idx.append(i)
        frac.append(jnp.clip(f, 0.0, 1.0))
    out = 0.0
    for corner in range(1 << nd):
        w = 1.0
        ix = []
        for d in range(nd):
            b = (corner >> d) & 1
            w = w * (frac[d] if b else (1.0 - frac[d]))
            ix.append(idx[d] + b)
        out = out + w * table[tuple(ix)]
    return out


def _catmull_rom_w(f):
    """Catmull-Rom weights for samples at -1, 0, 1, 2."""
    f2 = f * f
    f3 = f2 * f
    return (-0.5 * f3 + f2 - 0.5 * f,
            1.5 * f3 - 2.5 * f2 + 1.0,
            -1.5 * f3 + 2.0 * f2 + 0.5 * f,
            0.5 * f3 - 0.5 * f2)


def interp_cubic(table, origins: Sequence[float], steps: Sequence[float],
                 *coords):
    """Separable Catmull-Rom cubic on a uniform N-D grid (N = 1..3).

    C^1-continuous and exact for cubics along each axis - the device
    stand-in for the reference's tricubic scheme (tricub_get_coeff,
    imd_interpol.c:1088); edge cells clamp the stencil.
    """
    nd = len(coords)
    idx, wts = [], []
    for d in range(nd):
        n = table.shape[d]
        i, f = _axis_locate(origins[d], steps[d], n, coords[d])
        f = jnp.clip(f, 0.0, 1.0)
        w = _catmull_rom_w(f)
        # stencil indices i-1..i+2, clamped
        ix = [jnp.clip(i + k, 0, n - 1) for k in (-1, 0, 1, 2)]
        idx.append(ix)
        wts.append(w)
    out = 0.0
    # up to 4^nd terms; nd <= 3 -> 64, matching the reference's 64-coeff
    for corner in range(4 ** nd):
        w = 1.0
        ix = []
        c = corner
        for d in range(nd):
            k = c % 4
            c //= 4
            w = w * wts[d][k]
            ix.append(idx[d][k])
        out = out + w * table[tuple(ix)]
    return out
