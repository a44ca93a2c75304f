"""NRB non-reflecting boundary + FILTER deletion tests.

The NRB validation mirrors the physics claim of the method (Comput. Mech.
50:645): a compression wave hitting the boundary is absorbed instead of
reflected, so the post-transit kinetic energy is far below the
rigid-boundary case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu import integrate
from imd_tpu.models import nrb as nrb_mod
from imd_tpu.models.potential import analytic_eam
from imd_tpu.ops.forces import compute_eam_forces
from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, with_capacity
from imd_tpu.scene import make_scene, needs_rebin, rebin
from imd_tpu.utils.generate import fcc

ALAT = 4.05


def _rod(nc=(10, 3, 3), pbc=(0, 1, 1)):
    pos, typ, diag = fcc(nc, ALAT)
    # open x: pad vacuum so the rod does not touch its own image
    box = Box.create([diag[0] + 20.0, 0, 0], [0, diag[1], 0],
                     [0, 0, diag[2]], pbc=pbc, dtype=jnp.float64)
    pos[:, 0] += 2.0
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    scene = make_scene(grid, pos, mass=np.full(len(pos), 26.9815),
                       dtype=jnp.float64)
    return scene, grid


def test_init_nrb_finds_boundary_layer():
    scene, grid = _rod()
    st = nrb_mod.init_nrb(scene, ALAT, nrb_k=2.0, eps=0.1,
                          pbc=(0, 1, 1))
    assert st is not None
    nb = len(np.asarray(st.bnd_id))
    # one fcc(100) layer at x-max: 2 atoms per cell face * 3*3 cells
    assert nb == 18
    assert np.all(np.asarray(st.bnd_type) == 1)
    # every boundary atom couples to exactly its 4 inward neighbors
    found = np.sum(np.asarray(st.neigh_id) >= 0, axis=1)
    assert found.min() == 4 and found.max() == 4


def test_static_lattice_stays_static():
    """At the reference positions U=V=0, so NRB momenta must stay zero."""
    scene, grid = _rod()
    st = nrb_mod.init_nrb(scene, ALAT, nrb_k=2.0, pbc=(0, 1, 1))
    scene2, mask = nrb_mod.nrb_forces(scene, st)
    assert float(jnp.max(jnp.abs(scene2.mom))) < 1e-12
    assert int(jnp.sum(mask)) == 18


def test_shock_absorption():
    """A +x momentum pulse must NOT bounce back from the NRB face."""
    eam = analytic_eam(r_cut=5.0, r0=ALAT / np.sqrt(2.0), E_c=3.39,
                       dtype=jnp.float64)

    def run(with_nrb, steps=1000):
        scene, grid = _rod((12, 3, 3))
        st = nrb_mod.init_nrb(scene, ALAT, nrb_k=0.5,
                              pbc=(0, 1, 1)) if with_nrb else None
        # kick the leftmost 2 layers toward +x (weak, linear-regime pulse)
        kick = (scene.pos[..., 0] < 6.0) & scene.mask
        mom = scene.mom.at[..., 0].add(jnp.where(kick, 2.0, 0.0))
        scene = scene.replace(mom=mom)
        params = integrate.IntegratorParams(timestep=jnp.float64(0.1))

        @jax.jit
        def step(s):
            res = compute_eam_forces(s, eam, 1)
            s = s.replace(force=res.force, epot=res.epot)
            if st is not None:
                s, m = nrb_mod.nrb_forces(s, st)
            else:
                m = None
            s, stats = integrate.nve(s, params, nrb_mask=m)
            return s, stats

        for i in range(steps):
            scene, stats = step(scene)
            if bool(needs_rebin(scene, grid.skin)):
                scene = rebin(scene)
        return float(stats.ekin_new)

    e_nrb = run(True)
    e_rigid = run(False)
    # after a few transits the absorbing boundary has drained most of the
    # pulse energy (the rigid system keeps all of it forever)
    assert e_nrb < 0.3 * e_rigid


def test_filter_deletes_disconnected_keeps_connected():
    from imd_tpu.models import filter as filter_mod

    pos, typ, diag = fcc((6, 3, 3), ALAT)
    pos[:, 0] += 30.0            # bulk sits right of x = 30
    extra = []
    # connected finger poking left across the filter boundary
    for k in range(6):
        extra.append([30.0 - 2.0 * (k + 1), 6.0, 6.0])
    # isolated vapor far left
    extra += [[5.0, 2.0, 2.0], [8.0, 9.0, 4.0], [3.0, 11.0, 9.0]]
    allpos = np.vstack([pos, np.array(extra)])
    box = Box.create([diag[0] + 40.0, 0, 0], [0, diag[1], 0],
                     [0, 0, diag[2]], pbc=(0, 1, 1), dtype=jnp.float64)
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=len(allpos))
    grid = with_capacity(grid, measured_capacity(grid, allpos))
    scene = make_scene(grid, allpos, dtype=jnp.float64)

    class B:
        min_x, max_x = 28.0, np.inf
        min_y = max_y = min_z = max_z = np.inf * np.array([-1, 1, -1, 1])[0]
    B.min_y = -np.inf; B.max_y = np.inf; B.min_z = -np.inf; B.max_z = np.inf

    n0 = int(scene.n_atoms())
    scene2, ndel = filter_mod.filter_atoms(scene, B, r_cut=3.0, n_sweeps=8)
    assert int(ndel) == 3                      # only the vapor atoms
    assert int(scene2.n_atoms()) == n0 - 3
