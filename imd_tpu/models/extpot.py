"""External indenter / wall potentials (imd_extpot.c).

The reference supports ``ep_n`` external potentials, the first
``ep_nind`` spherical indenters and the rest planar walls, each with a
position, a drive velocity and a unit direction:

- ``ep_key 0`` (calc_extpot, imd_extpot.c:64-137): harmonic repulsion
  F = ep_a (R - r)^2 / r inside radius R = ep_rcut; walls use the
  normal distance d.n only.
- ``ep_key 1`` (139-286): Ju Li's smooth exponential indenter
  (PRB 67, 104105): V = exp(c - 1/c), c = (R - r)/ep_a clipped, with
  the total added impulse subtracted from all atoms so the sample's
  center of mass does not accelerate.
- ``ep_key 2`` (288-): the flat (planar) version of key 1, distance
  measured only along the non-zero components of ep_dir.

Diagnostics per potential: normal force on the indenter, atoms in
contact, and the contact-patch bounding box extents (54-60) used for
hardness A = pi/4 (xmax-xmin)(ymax-ymin).

TPU design: the per-atom/per-indenter interaction is a dense
[atoms, ep_n] broadcast (ep_n is tiny), fully vectorized; indenter
motion (move_extpot, 595) is a pure host-side parameter update.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from imd_tpu.scene import Scene

_UPPER_EXP = 80.0
_LOWER_EXP = 1e-4


class ExtPotParams(struct.PyTreeNode):
    pos: jnp.ndarray            # [n, 3] current positions
    vel: jnp.ndarray            # [n, 3] drive velocities
    dirs: jnp.ndarray           # [n, 3] unit directions
    n_ind: int = struct.field(pytree_node=False, default=1)
    key: int = struct.field(pytree_node=False, default=0)
    rcut: float = struct.field(pytree_node=False, default=5.0)
    a: float = struct.field(pytree_node=False, default=1.0)


def make_extpot(cfg) -> ExtPotParams:
    """Build from SimConfig.extpot (param tags ep_*, imd_param.c:3612)."""
    n = cfg.ep_n

    def rows(entries):
        out = [[0.0, 0.0, 0.0] for _ in range(n)]
        for row in entries:
            i = int(row[0])
            if i >= n:
                raise ValueError(f"extpot index {i} >= ep_n {n}")
            out[i] = [float(v) for v in row[1:4]]
        return jnp.asarray(out)

    dirs = rows(cfg.ep_dir)
    norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.where(norm > 1e-6, dirs / jnp.maximum(norm, 1e-30), dirs)
    return ExtPotParams(pos=rows(cfg.ep_pos), vel=rows(cfg.ep_vel),
                        dirs=dirs, n_ind=cfg.ep_nind, key=cfg.ep_key,
                        rcut=cfg.ep_rcut, a=cfg.ep_a)


def move_extpot(ep: ExtPotParams, dt) -> ExtPotParams:
    """Advance indenter positions by one step (move_extpot, 595-612)."""
    return ep.replace(pos=ep.pos + dt * ep.vel)


def extpot_forces(scene: Scene, ep: ExtPotParams):
    """Per-atom external forces + diagnostics.

    Returns (force [..,3], epot_add [..], diag) where diag carries
    fext[n] (normal force on each indenter), n_contact[n], and the
    contact bounding boxes [n, 4] (xmin, xmax, ymin, ymax in the plane
    perpendicular to the axis-aligned component of ep_dir).
    """
    x = scene.pos                                    # [...,3]
    mb = scene.mask                                  # [...] bool
    m = scene.fmask()                                # [...] float
    n = ep.pos.shape[0]
    R = ep.rcut
    # broadcast [..., n, 3]
    d_to = ep.pos - x[..., None, :]                  # indenter - atom
    d_from = -d_to                                   # atom - indenter
    dn_to = jnp.sum(d_to * ep.dirs, -1)              # [..., n]
    dn_from = -dn_to
    is_ind = (jnp.arange(n) < ep.n_ind)

    force = jnp.zeros_like(x)
    epot = jnp.zeros(x.shape[:-1], x.dtype)
    fext = jnp.zeros((n,), x.dtype)
    contact = jnp.zeros(x.shape[:-1] + (n,), bool)

    if ep.key == 0:
        r2 = jnp.sum(d_to * d_to, -1)
        r1 = jnp.sqrt(jnp.maximum(r2, 1e-30))
        # spherical: one-sided (dn > -R) harmonic shell repulsion
        act_s = is_ind & (dn_to > -R) & (r1 < R) & mb[..., None]
        f_s = jnp.where(act_s, ep.a * (R - r1) ** 2 / r1, 0.0)
        force = force - jnp.sum(f_s[..., None] * d_to, -2)
        fext = fext + jnp.sum((f_s * jnp.abs(dn_to)).reshape(-1, n), 0)
        # walls: harmonic on the normal distance, pushing along +dir
        act_w = (~is_ind) & (jnp.abs(dn_to) < R) & mb[..., None]
        d1 = jnp.maximum(jnp.abs(dn_to), 1e-30)
        f_w = jnp.where(act_w, ep.a * (R - d1) ** 2 / d1, 0.0)
        force = force + jnp.sum(f_w[..., None] * ep.dirs, -2)
        fext = fext + jnp.sum(f_w.reshape(-1, n), 0)
        contact = act_s | act_w
    else:
        # keys 1/2: Ju Li exponential; key 2 measures distance only
        # along the non-zero direction components
        d = (jnp.where(jnp.abs(ep.dirs) > 1e-12, d_from, 0.0)
             if ep.key == 2 else d_from)
        r2 = jnp.sum(d * d, -1)
        r1 = jnp.sqrt(jnp.maximum(r2, 1e-30))
        act = is_ind & (r2 < R * R) & mb[..., None]
        cc = jnp.clip((R - r1) / ep.a, _LOWER_EXP, _UPPER_EXP)
        ee = jnp.where(act, jnp.exp(cc - 1.0 / cc), 0.0)
        grad = ee / ep.a / r1 * (1.0 + 1.0 / (cc * cc))
        grad = jnp.where(act, grad, 0.0)
        epot = epot + jnp.sum(ee, -1)
        force = force + jnp.sum(grad[..., None] * d, -2)
        fext = fext + jnp.sum((grad * jnp.abs(dn_from)).reshape(-1, n), 0)
        contact = act
        # subtract the net added impulse (key 1/2, imd_extpot.c:262-283)
        tot = jnp.sum(force.reshape(-1, 3), 0)
        n_atoms = jnp.maximum(jnp.sum(m), 1.0)
        force = force - (tot / n_atoms) * m[..., None]

    n_contact = jnp.sum(contact.reshape(-1, n), 0)
    # contact bounding box in the plane perpendicular to the drive axis
    axis = jnp.argmax(jnp.abs(ep.dirs), -1)          # [n]
    plane = jnp.stack([(axis + 1) % 3, (axis + 2) % 3], -1)  # [n, 2]
    xb = jnp.broadcast_to(x[..., None, :], contact.shape + (3,))
    u = jnp.take_along_axis(
        xb, jnp.broadcast_to(plane[..., 0], contact.shape)[..., None],
        -1)[..., 0]
    v = jnp.take_along_axis(
        xb, jnp.broadcast_to(plane[..., 1], contact.shape)[..., None],
        -1)[..., 0]
    big = jnp.asarray(1e8, x.dtype)
    flat_c = contact.reshape(-1, n)
    uf, vf = u.reshape(-1, n), v.reshape(-1, n)
    bbox = jnp.stack([
        jnp.min(jnp.where(flat_c, uf, big), 0),
        jnp.max(jnp.where(flat_c, uf, -big), 0),
        jnp.min(jnp.where(flat_c, vf, big), 0),
        jnp.max(jnp.where(flat_c, vf, -big), 0)], -1)
    diag = {"fext": fext, "n_contact": n_contact, "bbox": bbox}
    return force, epot, diag


def contact_area(bbox: jnp.ndarray, ep_key: int = 0) -> jnp.ndarray:
    """Contact-patch area from the bounding box: elliptic pi/4 dx dy for
    the spherical indenters (ep_key <= 1), plain rectangular dx dy for
    the flat ep_key 2 (imd_io.c:2930-2933)."""
    dx = jnp.maximum(bbox[..., 1] - bbox[..., 0], 0.0)
    dy = jnp.maximum(bbox[..., 3] - bbox[..., 2], 0.0)
    fac = math.pi / 4.0 if ep_key <= 1 else 1.0
    return fac * dx * dy
