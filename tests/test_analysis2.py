"""van Hove, ATDIST, DIFFPAT, Nye tensor (imd_correl.c, imd_distrib.c,
imd_nyeTensorAnalysis_3d.c)."""

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu import analysis as A
from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, \
    with_capacity
from imd_tpu.scene import make_scene
from imd_tpu.utils.generate import fcc


def _scene(cells=(6, 6, 6), alat=4.05, pos=None):
    if pos is None:
        pos, typ, diag = fcc(cells, alat)
    else:
        diag = [cells[i] * alat for i in range(3)]
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    grid = choose_grid(box, 6.0, skin=0.5, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    return make_scene(grid, pos, dtype=jnp.float64), np.asarray(pos), diag


def test_van_hove_self_counts_displacements():
    scene, pos, diag = _scene()
    n = len(pos)
    # ref is indexed by atom id; make_scene assigns id = generator row,
    # so ref[id] = pos[id].  Shift the first half (by id) 0.35 A in x.
    ref = np.array(pos, float)
    ref[: n // 2, 0] -= 0.35
    gs = A.van_hove_self(scene, ref, n_r=20, dr=0.1)
    assert gs.shape == (1, 20)
    assert gs.sum() == n
    assert gs[0, 0] == n - n // 2          # unmoved -> r in [0, 0.1)
    assert gs[0, 3] == n // 2              # moved -> r in [0.3, 0.4)


def test_atdist_accumulates_density():
    scene, pos, diag = _scene(cells=(4, 4, 4))
    ad = A.AtDist(ll=(0, 0, 0), ur=diag, dims=(4, 4, 4))
    ad.update(scene)
    ad.update(scene)
    # every atom binned twice
    assert ad.hist.sum() == 2 * len(pos)
    # fcc is homogeneous at this bin size: all bins equal
    assert ad.hist.std() / ad.hist.mean() < 1e-6
    # rotation by +90 deg: x' = y in [0, d1], y' = -x in [-d0, 0];
    # a window matching the rotated sample still bins every atom
    ad2 = A.AtDist(ll=(-0.1, -diag[0] - 0.1, -0.1),
                   ur=(diag[1] + 0.1, 0.1, diag[2] + 0.1),
                   dims=(4, 4, 4), phi=np.pi / 2)
    ad2.update(scene)
    assert ad2.hist.sum() == len(pos)


def test_diffpat_bragg_peaks():
    scene, pos, diag = _scene(cells=(8, 8, 8))
    dp = A.DiffPat(ll=(0, 0, 0), ur=diag, dims=(16, 16, 16),
                   weights=[1.0], interval=1)
    dp.update(scene)
    pat = dp.pattern
    # DC peak = (total weight)^2
    np.testing.assert_allclose(pat[0, 0, 0], float(len(pos)) ** 2,
                               rtol=1e-5)
    # fcc with 2 bins per cube edge: Bragg peak at (8,8,8) reciprocal
    # index (the lattice repeats every 2 bins) -> strong peak at [8,8,8]
    assert pat[8, 8, 8] > 0.5 * pat[0, 0, 0]
    # generic non-lattice k almost dark
    assert pat[3, 5, 7] < 1e-6 * pat[0, 0, 0]


def test_nye_zero_for_perfect_and_uniform_strain():
    scene, pos, diag = _scene(cells=(5, 5, 5), alat=4.05)
    ref = A.fcc_reference_vectors(4.05)
    alpha, lcm = A.nye_tensor(scene, ref, r_cut=3.2)
    assert np.abs(alpha).max() < 1e-10
    # lcm of the perfect crystal maps neighbors onto reference: identity
    np.testing.assert_allclose(lcm, np.tile(np.eye(3), (len(pos), 1, 1)),
                               atol=1e-8)
    # uniform small strain: lcm constant != I, alpha still ~0
    F = np.eye(3) + np.asarray([[0.01, 0.004, 0], [0, -0.006, 0],
                                [0, 0, 0.002]])
    pos2 = np.asarray(pos) @ F.T
    sc2, _, _ = _scene(cells=(5, 5, 5), alat=4.2, pos=jnp.asarray(pos2))
    alpha2, lcm2 = A.nye_tensor(sc2, ref, r_cut=3.2)
    assert np.abs(alpha2).max() < 1e-8
    spread = np.abs(lcm2 - lcm2.mean(0)).max()
    assert spread < 1e-8 and np.abs(lcm2[0] - np.eye(3)).max() > 1e-3


def test_nye_detects_dislocation_core():
    """Volterra edge dislocation (line along z, b = b x): alpha_zx
    localizes at the core and the area integral recovers ~b."""
    alat = 4.05
    nx = 12
    pos, typ, diag = fcc((nx, nx, 2), alat)
    pos = np.asarray(pos, float)
    c = np.asarray([diag[0] / 2 + 0.3, diag[1] / 2 + 0.3])
    b = alat / np.sqrt(2.0)
    nu = 0.3
    dx = pos[:, 0] - c[0]
    dy = pos[:, 1] - c[1]
    r2 = dx ** 2 + dy ** 2
    th = np.arctan2(dy, dx)
    ux = b / (2 * np.pi) * (th + dx * dy / (2 * (1 - nu) * r2))
    uy = -b / (2 * np.pi) * ((1 - 2 * nu) / (4 * (1 - nu)) * np.log(r2)
                             + (dx ** 2 - dy ** 2)
                             / (4 * (1 - nu) * r2))
    pos2 = pos.copy()
    pos2[:, 0] += ux
    pos2[:, 1] += uy
    # open boundaries in x/y (the displacement field is not periodic)
    box = Box.create([diag[0] * 2, 0, 0], [0, diag[1] * 2, 0],
                     [0, 0, diag[2]], pbc=(False, False, True),
                     dtype=jnp.float64)
    grid = choose_grid(box, 6.0, skin=0.5, n_atoms=len(pos2))
    grid = with_capacity(grid, measured_capacity(grid, pos2 + 1.0))
    scene = make_scene(grid, jnp.asarray(pos2 + 1.0), dtype=jnp.float64)
    ref = A.fcc_reference_vectors(alat)
    alpha, lcm = A.nye_tensor(scene, ref, r_cut=3.2)
    flat = scene.flatten_atoms()
    m = np.asarray(flat["mask"])
    ids = np.asarray(flat["id"])[m]
    azx = np.zeros(len(pos2))
    azx[ids] = alpha[:, 2, 0]
    r = np.sqrt(r2)
    core = r < 1.5 * alat
    far = r > 4 * alat
    assert np.abs(azx[core]).max() > 5 * np.abs(azx[far]).max()
    # Burgers circuit: integral of alpha_zx over the slab area / layers
    cell_area = diag[0] * diag[1] / len(pos2) * diag[2] / alat * 2
    # area per atom in an x-y plane: (diag0*diag1)/(atoms per plane)
    planes = len(np.unique(np.round(pos[:, 2], 3)))
    a_per_atom = diag[0] * diag[1] / (len(pos2) / planes)
    b_est = azx.sum() * a_per_atom / planes
    assert 0.4 * b < abs(b_est) < 2.0 * b


def test_local_order_fcc_vs_gas():
    """LOD (imd_forces.c:61-140): ~1 on perfect fcc, ~0 in a gas."""
    import jax.numpy as jnp
    from imd_tpu.analysis import local_order
    from imd_tpu.ops.geometry import Box, choose_grid
    from imd_tpu.scene import make_scene
    from imd_tpu.utils.generate import fcc

    alat = 4.05
    pos, _, diag = fcc((4, 4, 4), alat)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    grid = choose_grid(box, 3.2, skin=0.3, n_atoms=len(pos))
    sc = make_scene(grid, pos, dtype=jnp.float64)
    lod = local_order(sc, alat, r_cut=3.2)
    np.testing.assert_allclose(lod, 1.0, atol=1e-6)

    rng = np.random.default_rng(0)
    gas = rng.uniform(0, diag[0], (256, 3))
    sc2 = make_scene(grid, gas, dtype=jnp.float64)
    lod2 = local_order(sc2, alat, r_cut=3.2)
    assert np.mean(lod2) < 0.35


def test_keating_minimum_at_diamond():
    """Keating energy vanishes on the ideal diamond lattice and rises
    under strain; autodiff forces match finite differences."""
    import jax
    import jax.numpy as jnp
    from imd_tpu.models.covalent import KeatingParams, keating_energy
    from imd_tpu.utils.generate import diamond

    a0 = 5.431
    P = KeatingParams(d=a0 * np.sqrt(3) / 4.0, r_cut=2.8)
    pos, _, diag = diamond((2, 2, 2), a0)
    from imd_tpu.ops.geometry import Box
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    p64 = jnp.asarray(pos, jnp.float64)
    e0 = float(keating_energy(p64, box=box, P=P))
    assert abs(e0) < 1e-18 * len(pos) + 1e-12
    # isotropic strain raises the energy
    e1 = float(keating_energy(p64 * 1.02,
                              box=Box.create([diag[0] * 1.02, 0, 0],
                                             [0, diag[1] * 1.02, 0],
                                             [0, 0, diag[2] * 1.02],
                                             dtype=jnp.float64), P=P))
    assert e1 > 1e-4
    # FD force check on a perturbed cluster
    rng = np.random.default_rng(1)
    clus = jnp.asarray(pos[:10] + rng.normal(0, 0.05, (10, 3)),
                       jnp.float64)
    e, g = jax.value_and_grad(lambda x: keating_energy(x, P=P))(clus)
    h = 1e-6
    dlt = np.zeros(clus.shape)
    dlt[3, 1] = h
    fd = (float(keating_energy(clus + dlt, P=P))
          - float(keating_energy(clus - dlt, P=P))) / (2 * h)
    assert abs(fd - float(g[3, 1])) < 1e-7 * max(1.0, abs(fd))
