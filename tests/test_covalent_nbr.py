"""Large-N covalent path: fixed-K neighbor lists == the O(N^2) oracles.

The reference runs SW/Tersoff over per-atom neighbor tables
(do_neightab + do_forces2, imd_forces_covalent.c:60-180) at O(N*k);
ops/neighbors.py + the *_nbr energies are the TPU analog.  These tests
pin (a) list completeness (energy/force equality with the masked
all-pairs oracles), (b) exact periodic-image bookkeeping on small grid
dims (a dims==2 axis must see the one neighbor cell twice as distinct
images), and (c) the driver auto-dispatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.models import covalent as cov
from imd_tpu.ops.geometry import Box, choose_grid
from imd_tpu.ops.neighbors import neighbor_list, suggest_K
from imd_tpu.scene import make_scene
from imd_tpu.utils.generate import diamond


def _si_scene(reps=(4, 4, 4), cutoff=3.771, jitter=0.08, seed=0,
              skin=0.0):
    pos, typ, box_diag = diamond(reps, 5.431)
    rng = np.random.default_rng(seed)
    pos = np.asarray(pos) + rng.normal(scale=jitter,
                                       size=np.asarray(pos).shape)
    box = Box.create([box_diag[0], 0, 0], [0, box_diag[1], 0],
                     [0, 0, box_diag[2]], dtype=jnp.float64)
    grid = choose_grid(box, cutoff, skin=skin, n_atoms=len(pos))
    scene = make_scene(grid, pos, dtype=jnp.float64)
    assert int(scene.overflow) == 0
    M = int(np.prod(scene.pos.shape[:4]))
    return scene, scene.pos.reshape(M, 3), scene.mask.reshape(M), box


def _nbr(scene, cutoff, K=None):
    rc2 = float(cutoff) ** 2
    if K is None:
        probe = neighbor_list(scene.pos, scene.mask, scene.grid, rc2, 8)
        K = suggest_K(int(probe.max_count), 27 * scene.capacity)
    return neighbor_list(scene.pos, scene.mask, scene.grid, rc2, K)


def test_sw_nbr_matches_oracle():
    P = cov.SWParams()
    cut = P.a * P.sigma
    scene, pos, mask, box = _si_scene(cutoff=float(cut))
    nbr = _nbr(scene, cut)
    e_o = cov.sw_energy(pos, box, mask, P)
    e_n = cov.sw_energy_nbr(pos, nbr, box, P)
    assert abs(float(e_o - e_n)) < 1e-9 * abs(float(e_o))
    f_o = -jax.grad(lambda p: cov.sw_energy(p, box, mask, P))(pos)
    f_n = -jax.grad(lambda p: cov.sw_energy_nbr(p, nbr, box, P))(pos)
    scale = float(jnp.max(jnp.abs(f_o)))
    assert float(jnp.max(jnp.abs(f_o - f_n))) < 1e-9 * scale


def test_tersoff_nbr_matches_oracle():
    P = cov.TersoffParams()
    cut = P.R + P.D
    scene, pos, mask, box = _si_scene(cutoff=float(cut))
    nbr = _nbr(scene, cut)
    e_o = cov.tersoff_energy(pos, box, mask, P)
    e_n = cov.tersoff_energy_nbr(pos, nbr, box, P)
    assert abs(float(e_o - e_n)) < 1e-9 * abs(float(e_o))
    f_o = -jax.grad(lambda p: cov.tersoff_energy(p, box, mask, P))(pos)
    f_n = -jax.grad(lambda p: cov.tersoff_energy_nbr(p, nbr, box, P))(pos)
    scale = float(jnp.max(jnp.abs(f_o)))
    assert float(jnp.max(jnp.abs(f_o - f_n))) < 1e-9 * scale


def test_tersoffmod_nbr_matches_oracle():
    P = cov.TersoffModParams()
    scene, pos, mask, box = _si_scene(cutoff=float(P.r_cut))
    nbr = _nbr(scene, P.r_cut)
    e_o = cov.tersoffmod_energy(pos, box, mask, P)
    e_n = cov.tersoffmod_energy_nbr(pos, nbr, box, P)
    assert abs(float(e_o - e_n)) < 1e-9 * abs(float(e_o))


def test_nbr_small_dims_images():
    """A thin slab whose y axis has only TWO cells: the neighbor cell
    appears as both the +1 and -1 image and both contribute distinct
    wrapped pairs.  The oracle's min_image is exact here (box >=
    2*cutoff), so equality proves the wrap bookkeeping."""
    P = cov.SWParams()
    cut = float(P.a * P.sigma)
    pos, typ, box_diag = diamond((4, 2, 4), 5.431)
    rng = np.random.default_rng(3)
    pos = np.asarray(pos) + rng.normal(scale=0.05,
                                       size=np.asarray(pos).shape)
    box = Box.create([box_diag[0], 0, 0], [0, box_diag[1], 0],
                     [0, 0, box_diag[2]], dtype=jnp.float64)
    grid = choose_grid(box, cut, n_atoms=len(pos))
    assert grid.dims[1] == 2, grid.dims
    scene = make_scene(grid, pos, dtype=jnp.float64)
    M = int(np.prod(scene.pos.shape[:4]))
    pf, mf = scene.pos.reshape(M, 3), scene.mask.reshape(M)
    nbr = _nbr(scene, cut)
    e_o = cov.sw_energy(pf, box, mf, P)
    e_n = cov.sw_energy_nbr(pf, nbr, box, P)
    assert abs(float(e_o - e_n)) < 1e-9 * abs(float(e_o))


def test_nbr_virial_matches_oracle():
    """flat_force_result's strain-derivative virial must agree between
    the oracle and the nbr path (wraps scale with the box)."""
    from imd_tpu.models.interactions import flat_force_result

    P = cov.SWParams()
    cut = float(P.a * P.sigma)
    scene, pos, mask, box = _si_scene(cutoff=cut, reps=(3, 3, 3))
    nbr = _nbr(scene, cut)

    def efn(p, t, m, b):
        return cov.sw_energy(p, b, m, P)

    efn.nbr = lambda p, t, m, b, nb: cov.sw_energy_nbr(p, nb, b, P)
    r_o, e_o = flat_force_result(scene, efn, 1)
    r_n, e_n = flat_force_result(scene, efn, 1, nbr=nbr)
    assert abs(float(e_o - e_n)) < 1e-9 * abs(float(e_o))
    assert np.allclose(np.asarray(r_o.virial), np.asarray(r_n.virial),
                       rtol=1e-9)
    assert np.allclose(np.asarray(r_o.force), np.asarray(r_n.force),
                       atol=1e-9 * float(jnp.max(jnp.abs(r_o.force))))


def test_driver_auto_dispatch(tmp_path):
    """A >4096-slot SW run engages the neighbor-list engine
    automatically and conserves energy; forcing the oracle off via
    covalent_nbl 0 reproduces the same Epot."""
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.simulation import Simulation

    out = str(tmp_path / "sw")
    text = f"""
coordname   _dia
outfiles    {out}
box_param   5 5 5
box_unit    5.431
ntypes      1
masses      28.0855
ensemble    nve
timestep    0.02
maxsteps    20
starttemp   0.01
eng_int     10
pbc_dirs    1 1 1
seed        2
stiweb_a    7.049556277
stiweb_b    0.6022245584
stiweb_p    4.0
stiweb_q    0.0
stiweb_a1   1.8
stiweb_la   21.0
stiweb_ga   1.2
stiweb_de   2.1683
"""
    cfg = SimConfig.from_params(parse_param_text(text))
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    assert sim._cov_nbr_K > 0, "auto rule should pick the nbr engine"
    sim.run()
    eng = [ln.split() for ln in
           open(out + ".eng").read().strip().splitlines()[1:]]
    epots = [float(r[1]) for r in eng]
    temps = [float(r[2]) for r in eng]
    etots = [e + 1.5 * t for e, t in zip(epots, temps)]
    assert -4.6 < epots[0] < -4.0
    assert abs(etots[-1] - etots[0]) < 5e-6 * abs(etots[0])

    # same first Epot with the oracle forced (covalent_nbl 0)
    cfg2 = SimConfig.from_params(parse_param_text(
        text.replace(f"outfiles    {out}", f"outfiles    {out}2")
        + "covalent_nbl 0\nmaxsteps 1\n"))
    sim2 = Simulation(cfg2, workdir=str(tmp_path), dtype=jnp.float64)
    assert sim2._cov_nbr_K == 0
    res2 = sim2._compute_forces(sim2.scene)
    # compare the two engines on the identical (fresh) scene
    res1b = sim._compute_forces(sim2.scene)
    assert np.allclose(float(jnp.sum(res1b.epot)),
                       float(jnp.sum(res2.epot)), rtol=1e-9)
