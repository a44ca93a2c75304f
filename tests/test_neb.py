"""NEB saddle-point search on an analytic 2-D double-well surface and a
small LJ hop problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.models import neb


def test_neb_analytic_double_well():
    """Potential V = (x^2-1)^2 + 2 y^2: minima (+-1, 0), saddle (0,0)
    with barrier 1.  NEB must find it."""
    def force_fn(x):                     # x [1,3]
        xx, yy = x[0, 0], x[0, 1]
        v = (xx ** 2 - 1.0) ** 2 + 2.0 * yy ** 2
        fx = -4.0 * xx * (xx ** 2 - 1.0)
        fy = -4.0 * yy
        return jnp.array([[fx, fy, 0.0]]), v

    x0 = jnp.array([[-1.0, 0.3, 0.0]])   # bent initial path
    x1 = jnp.array([[1.0, -0.3, 0.0]])
    imgs = neb.interpolate_images(x0, x1, 9)
    # relax endpoints exactly onto the minima first
    imgs = imgs.at[0].set(jnp.array([[-1.0, 0.0, 0.0]]))
    imgs = imgs.at[-1].set(jnp.array([[1.0, 0.0, 0.0]]))
    x, e, fmax = jax.jit(lambda im: neb.neb_relax(
        im, force_fn, k_spring=2.0, n_steps=800, dt=0.02,
        climb_after=400))(imgs)
    b = float(neb.barrier(e))
    assert b == pytest.approx(1.0, abs=0.02)
    # the climbing image sits at the saddle
    top = int(jnp.argmax(e))
    assert abs(float(x[top, 0, 0])) < 0.05
    assert abs(float(x[top, 0, 1])) < 0.05


def test_neb_lj_exchange_barrier():
    """Mobile atom between two fixed anchors: symmetric saddle at the
    midpoint; barrier equals V(mid) - V(well) computed directly."""
    from imd_tpu.models.potential import lj_table
    from imd_tpu.ops.forces import pair_forces_n2
    from imd_tpu.ops.geometry import Box

    pot = lj_table(1.0, 1.0, 2.5, dtype=jnp.float64)
    box = Box.create([20, 0, 0], [0, 20, 0], [0, 0, 20], pbc=(0, 0, 0),
                     dtype=jnp.float64)
    anchors = np.array([[8.0, 10.0, 10.0], [12.0, 10.0, 10.0]])
    typ = jnp.zeros(3, jnp.int32)
    mask = jnp.ones(3, bool)

    def force_fn(pos):
        F, ep, _ = pair_forces_n2(pos, typ, mask, box, pot)
        F = F.at[:2].set(0.0)            # anchors fixed
        return F, jnp.sum(ep)

    # wells: mobile atom at distance ~1 from either anchor along x
    x0 = jnp.asarray(np.vstack([anchors, [9.0, 10.0, 10.0]]))
    x1 = jnp.asarray(np.vstack([anchors, [11.0, 10.0, 10.0]]))
    imgs = neb.interpolate_images(x0, x1, 11)
    x, e, fmax = jax.jit(lambda im: neb.neb_relax(
        im, force_fn, k_spring=5.0, n_steps=600, dt=0.01,
        climb_after=300))(imgs)
    # direct saddle energy: mobile atom exactly at the midpoint
    mid = jnp.asarray(np.vstack([anchors, [10.0, 10.0, 10.0]]))
    _, e_mid = force_fn(mid)
    _, e_well = force_fn(x0)
    b_direct = float(e_mid - e_well)
    b_neb = float(neb.barrier(e))
    assert b_direct > 0.01
    assert b_neb == pytest.approx(b_direct, rel=0.05)
