"""Device-side neighbor lists + CNA (analysis_device.py) vs the host
reference implementation (analysis.py, mirroring imd_cna.c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu import analysis as an
from imd_tpu import analysis_device as ad
from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, \
    with_capacity
from imd_tpu.scene import make_scene
from imd_tpu.utils.generate import bcc, fcc, hex_lattice


def _scene(gen, nc, alat, cutoff):
    pos, typ, diag = gen(nc, alat)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float32)
    grid = choose_grid(box, cutoff, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    return make_scene(grid, pos, mass=np.full(len(pos), 26.98),
                      dtype=jnp.float32)


@pytest.mark.parametrize("gen,nc,alat,rc,want", [
    (fcc, (4, 4, 4), 4.05, 3.4, ad.CNA_FCC),
    (bcc, (5, 5, 5), 2.87, 3.4, ad.CNA_BCC),
    (hex_lattice, (4, 4, 3), 3.21, 3.85, ad.CNA_HCP),
])
def test_device_cna_perfect_lattices(gen, nc, alat, rc, want):
    sc = _scene(gen, nc, alat, rc + 0.5)
    cls = np.asarray(ad.cna_classes(sc, rc))
    alive = np.asarray(ad.neighbor_lists(sc, rc)[2])
    assert (cls[alive] == want).all(), np.bincount(cls[alive], minlength=4)


def test_device_cna_matches_host_with_defect():
    """Remove one atom: device CNA must agree with the host domino
    implementation class-by-class (order-independent compare by id)."""
    pos, typ, diag = fcc((4, 4, 4), 4.05)
    pos = pos[1:]  # vacancy
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float32)
    grid = choose_grid(box, 3.9, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.98),
                    dtype=jnp.float32)
    cls_d = np.asarray(ad.cna_classes(sc, 3.4))
    ids_d = np.asarray(ad.scene_ids(sc))
    alive = ids_d >= 0
    by_id_dev = dict(zip(ids_d[alive], cls_d[alive]))
    host = an.common_neighbor_analysis(sc, 3.4)
    flat = sc.flatten_atoms()
    m = np.asarray(flat["mask"])
    ids_h = np.asarray(flat["id"])[m]
    # host returns classes in flatten_atoms order
    mismatches = sum(int(by_id_dev[i] != c) for i, c in zip(ids_h, host))
    assert mismatches == 0


def test_device_neighbor_lists_counts():
    sc = _scene(fcc, (3, 3, 3), 4.05, 3.9)
    nbr, nmask, alive, overflow = ad.neighbor_lists(sc, 3.4)
    assert not bool(overflow)
    counts = np.asarray(jnp.sum(nmask, 1))[np.asarray(alive)]
    assert (counts == 12).all()


@pytest.mark.parametrize("gen,nc,alat,want", [
    (fcc, (4, 4, 4), 4.05, ad.CNA_FCC),
    (bcc, (5, 5, 5), 2.87, ad.CNA_BCC),
    (hex_lattice, (4, 4, 3), 3.21, ad.CNA_HCP),
])
def test_device_ackland_perfect_lattices(gen, nc, alat, want):
    sc = _scene(gen, nc, alat, 4.5)
    cls = np.asarray(ad.ackland_jones_classes(sc))
    alive = np.asarray(ad.neighbor_lists(sc, 3.4)[2])
    assert (cls[alive] == want).all(), np.bincount(
        cls[alive], minlength=5)


def test_device_ackland_matches_host_perturbed():
    """Thermally-jittered fcc with a vacancy: device AJ must agree with
    the host plugin atom-by-atom (same adaptive cutoff + ladder)."""
    pos, typ, diag = fcc((4, 4, 4), 4.05)
    pos = pos[1:]
    rng = np.random.default_rng(3)
    pos = pos + rng.normal(scale=0.03, size=pos.shape)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float32)
    grid = choose_grid(box, 3.9, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.98),
                    dtype=jnp.float32)
    cls_d = np.asarray(ad.ackland_jones_classes(sc))
    ids_d = np.asarray(ad.scene_ids(sc))
    alive = ids_d >= 0
    by_id_dev = dict(zip(ids_d[alive], cls_d[alive]))
    host = an.ackland_jones(sc)
    flat = sc.flatten_atoms()
    m = np.asarray(flat["mask"])
    ids_h = np.asarray(flat["id"])[m]
    mismatches = sum(int(by_id_dev[i] != c) for i, c in zip(ids_h, host))
    # borderline chi-bin atoms may flip under f32 vs f64 cos rounding
    assert mismatches <= len(ids_h) // 50, mismatches
