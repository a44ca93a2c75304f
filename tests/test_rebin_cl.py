"""Sort-free migration rebin (ops/rebin_cl.py) == the sort rebin.

Same binning, same atom set per cell (slot ORDER differs: migration is
stay-first, the sort keeps original-index order — no kernel cares).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.ops.fused_step import cl_to_scene, scene_to_cl
from imd_tpu.ops.geometry import Box, choose_grid
from imd_tpu.ops.rebin_cl import make_rebin_cl
from imd_tpu.scene import make_scene, rebin
from imd_tpu.utils.generate import fcc


def _mkscene(pbc=(1, 1, 1), nc=(6, 5, 4), jitter=0.05, cap=None,
             dtype=jnp.float64):
    pos, _, bd = fcc(nc, 2.86)
    rng = np.random.default_rng(4)
    pos = pos + rng.normal(scale=jitter, size=pos.shape)
    box = Box.create([bd[0], 0, 0], [0, bd[1], 0], [0, 0, bd[2]],
                     pbc=pbc, dtype=dtype)
    grid = choose_grid(box, 2.5, skin=0.4, n_atoms=len(pos))
    if cap:
        grid = grid.replace(capacity=cap)
    mom = rng.normal(size=pos.shape)
    scene = make_scene(grid, pos, mom=mom,
                       mass=rng.uniform(1.0, 2.0, len(pos)),
                       type=rng.integers(0, 2, len(pos)),
                       dtype=dtype)
    return scene


def _bags(cl, dims):
    """Per-cell frozenset of ids + id -> (pos, mom, typ, mass) maps."""
    ids = np.asarray(cl.ids)
    alive = np.asarray(cl.alive)
    xi = np.asarray(cl.xi)
    mom = np.asarray(cl.mom)
    cells = {}
    vals = {}
    cap, _, NC = xi.shape
    for c in range(NC):
        s = frozenset(int(i) for k in range(cap)
                      for i in [ids[k, c]] if alive[k, c])
        cells[c] = s
        for k in range(cap):
            if alive[k, c]:
                vals[int(ids[k, c])] = (xi[:, :, c][k], mom[:, :, c][k],
                                        int(np.asarray(cl.typ)[k, c]),
                                        float(np.asarray(cl.mass)[k, c]))
    return cells, vals


@pytest.mark.parametrize("pbc,use_pallas", [
    ((1, 1, 1), False), ((0, 1, 1), False), ((0, 0, 0), False),
    # the Pallas compaction kernel runs interpreted on CPU (slow):
    # one representative case; TPU runs exercise it for real
    ((1, 1, 1), True),
])
def test_migration_matches_sort_rebin(pbc, use_pallas):
    # cap 24: the drift below packs a worst cell to 18 — overflow-free
    # so the atom BAGS must match exactly (overflow victim selection
    # differs by slot order and is covered by the capacity test)
    scene = _mkscene(pbc=pbc, cap=24)
    template = scene
    cl = scene_to_cl(scene)
    # drift atoms enough to cross cell boundaries (but < one edge)
    rng = np.random.default_rng(9)
    drift = jnp.asarray(rng.normal(scale=0.45, size=(1, 3, 1)) +
                        rng.normal(scale=0.3, size=cl.xi.shape))
    xi2 = jnp.where(cl.alive[:, None, :], cl.xi + drift, cl.xi)
    cl = cl.replace(xi=xi2)

    fast = jax.jit(make_rebin_cl(scene.grid, use_pallas=use_pallas))
    a = fast(cl)
    b = scene_to_cl(rebin(cl_to_scene(cl, template)))

    assert int(a.overflow) == int(b.overflow) == 0
    dims = scene.grid.dims
    ca, va = _bags(a, dims)
    cb, vb = _bags(b, dims)
    assert ca == cb                      # same atoms in same cells
    assert set(va) == set(vb)
    for i in va:
        np.testing.assert_allclose(va[i][0], vb[i][0], rtol=1e-12,
                                   atol=1e-12)       # wrapped positions
        np.testing.assert_allclose(va[i][1], vb[i][1], rtol=1e-12)
        assert va[i][2] == vb[i][2]
        assert va[i][3] == pytest.approx(vb[i][3])
    # ref positions reset
    np.testing.assert_array_equal(np.asarray(a.ref_xi), np.asarray(a.xi))


def test_migration_counts_capacity_overflow():
    # bin a comfortably-fitting scene, then re-bin it under a SMALLER
    # capacity: dense cells overflow, every drop is counted, nothing is
    # silently duplicated or misplaced
    scene = _mkscene(cap=16)
    cl = scene_to_cl(scene)
    tight = scene.grid.replace(capacity=4)
    out = make_rebin_cl(tight, use_pallas=False)(cl)
    assert int(out.overflow) > 0
    n0 = int(jnp.sum(cl.alive))
    assert int(jnp.sum(out.alive)) + int(out.overflow) == n0
    assert out.alive.shape[0] == 4


def test_far_mover_is_dropped_loudly():
    scene = _mkscene()
    cl = scene_to_cl(scene)
    # teleport one atom by two cells (not physically reachable between
    # skin-triggered rebins) — must be counted, never misplaced
    edge = np.diag(np.asarray(scene.grid.box.h))[0] / scene.grid.dims[0]
    k, c = 0, 0
    assert bool(cl.alive[k, c])
    xi = cl.xi.at[k, 0, c].add(2.2 * edge)
    out = make_rebin_cl(scene.grid, use_pallas=False)(cl.replace(xi=xi))
    assert int(out.overflow) == 1
    assert int(jnp.sum(out.alive)) == int(jnp.sum(cl.alive)) - 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("pbc", [(1, 1, 1), (0, 1, 1)])
def test_sharded_migration_matches_single_device(pbc):
    """make_rebin_cl_sharded == make_rebin_cl SLOT-FOR-SLOT: the x phase's
    boundary-plane ppermutes (the send_atoms analog,
    imd_fix_cells_3d.c:311-436) must reproduce the single-device plane
    rolls exactly, including the stay-first slot order."""
    from imd_tpu.ops.rebin_cl import make_rebin_cl_sharded
    from imd_tpu.parallel.mesh import make_mesh

    pos, _, bd = fcc((16, 5, 4), 2.86)
    rng = np.random.default_rng(4)
    pos = pos + rng.normal(scale=0.05, size=pos.shape)
    box = Box.create([bd[0], 0, 0], [0, bd[1], 0], [0, 0, bd[2]],
                     pbc=pbc, dtype=jnp.float64)
    grid = choose_grid(box, 2.5, skin=0.4, n_atoms=len(pos),
                       dims_multiple=(8, 1, 1))
    grid = grid.replace(capacity=24)
    mom = rng.normal(size=pos.shape)
    scene = make_scene(grid, pos, mom=mom,
                       mass=rng.uniform(1.0, 2.0, len(pos)),
                       type=rng.integers(0, 2, len(pos)),
                       dtype=jnp.float64)
    cl = scene_to_cl(scene)
    drift = jnp.asarray(rng.normal(scale=0.45, size=(1, 3, 1)) +
                        rng.normal(scale=0.3, size=cl.xi.shape))
    cl = cl.replace(xi=jnp.where(cl.alive[:, None, :], cl.xi + drift,
                                 cl.xi))

    mesh = make_mesh((8, 1, 1))
    a = jax.jit(make_rebin_cl(grid, use_pallas=False))(cl)
    b = jax.jit(make_rebin_cl_sharded(grid, mesh, use_pallas=False))(cl)
    assert int(a.overflow) == int(b.overflow)
    np.testing.assert_array_equal(np.asarray(a.alive), np.asarray(b.alive))
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_allclose(np.asarray(a.xi), np.asarray(b.xi),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(a.mom), np.asarray(b.mom),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(a.typ), np.asarray(b.typ))


def test_compact_pallas_kernel_interpret_matches_xla():
    """The sublane-stacked compaction kernel (one [nf, block] select
    per candidate instead of 13 per-field [1, block] selects) must
    reproduce the XLA scatter reference — run through the Pallas
    interpreter so the kernel logic itself is pinned on CPU."""
    import jax.numpy as jnp
    import numpy as np

    from imd_tpu.ops.rebin_cl import _compact_pallas, _compact_xla

    rng = np.random.default_rng(5)
    K, NC, cap = 12, 160, 4
    # targets: per column, a random subset of candidates fills DISTINCT
    # slots (the rank construction guarantees uniqueness in real use;
    # duplicate targets would hit undefined scatter order in the
    # reference), the rest are dropped (== cap)
    tgt = np.full((K, NC), cap, np.int32)
    for c in range(NC):
        n = rng.integers(0, cap + 1)
        ks = rng.choice(K, size=n, replace=False)
        tgt[ks, c] = rng.permutation(cap)[:n]
    f_f = [jnp.asarray(rng.normal(size=(K, NC)), jnp.float32)
           for _ in range(7)]
    f_i = [jnp.asarray(rng.integers(0, 99, size=(K, NC)), jnp.int32)
           for _ in range(6)]
    fields = f_f + f_i
    fills = [0.0] * 7 + [-1] * 6
    ref = _compact_xla(jnp.asarray(tgt), fields, cap, fills)
    got = _compact_pallas(jnp.asarray(tgt), fields, cap, fills,
                          block=128, force_interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
