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


def test_device_hops_matches_host():
    """Device flood fill == host bond-graph hops, atom-by-atom."""
    pos, typ, diag = fcc((4, 4, 4), 4.05)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float32)
    grid = choose_grid(box, 3.2, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.98),
                    dtype=jnp.float32)
    ids_d = np.asarray(ad.scene_ids(sc))
    alive = ids_d >= 0
    # mark two atoms (by id) as defects
    defect_ids = {3, 101}
    dflat = np.isin(ids_d, list(defect_ids)) & alive
    hops_d = np.asarray(ad.hops_to_defect_device(
        sc, jnp.asarray(dflat), r_cut=3.2, rounds=3))
    flat = sc.flatten_atoms()
    m = np.asarray(flat["mask"])
    ids_h = np.asarray(flat["id"])[m]
    dh = np.isin(ids_h, list(defect_ids))
    hops_h = an.hops_to_defect(sc, dh, r_cut=3.2, rounds=3)
    by_id_dev = dict(zip(ids_d[alive], hops_d[alive]))
    for i, h in zip(ids_h, hops_h):
        assert by_id_dev[i] == h, (i, by_id_dev[i], h)


def test_device_nye_matches_host():
    """Device Nye/LCM == host plugin (f32 tolerance) on a strained
    jittered fcc block."""
    pos, typ, diag = fcc((4, 4, 4), 4.05)
    rng = np.random.default_rng(5)
    pos = pos + rng.normal(scale=0.02, size=pos.shape)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float32)
    grid = choose_grid(box, 3.2, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.98),
                    dtype=jnp.float32)
    ref = an.fcc_reference_vectors(4.05)
    alpha_d, lcm_d, alive_d = (np.asarray(a) for a in
                               ad.nye_tensor_device(sc, ref, r_cut=3.2))
    ids_d = np.asarray(ad.scene_ids(sc))
    alive = np.asarray(alive_d, bool)
    alpha_h, lcm_h = an.nye_tensor(sc, ref, r_cut=3.2)
    flat = sc.flatten_atoms()
    m = np.asarray(flat["mask"])
    ids_h = np.asarray(flat["id"])[m]
    dev_by_id = {i: (alpha_d[k], lcm_d[k])
                 for k, i in enumerate(ids_d) if alive[k]}
    scale = max(np.abs(lcm_h).max(), 1.0)
    for k, i in enumerate(ids_h):
        da, dl = dev_by_id[i]
        assert np.abs(dl - lcm_h[k]).max() / scale < 5e-3, i
        assert np.abs(da - alpha_h[k]).max() < 5e-3 * max(
            np.abs(alpha_h).max(), 1e-3), i
