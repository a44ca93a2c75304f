"""Density-adaptive re-gridding (VERDICT r3 #1).

When laser-shock compression packs cells past the Pallas VMEM capacity
cap (32), the fused hot loop must re-derive the cell grid for the
current density (the reference re-cells from the box on geometry change,
imd_geom_3d.c:118-170) instead of surrendering to the general engine.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from imd_tpu.models.potential import analytic_eam, write_pot_table
from imd_tpu.ops.geometry import CellGrid, optimize_grid_dims
from imd_tpu.scene import make_scene
from imd_tpu.simulation import Simulation

PARAM = """
coordname _fcc
box_param 8 4 4
box_unit 4.05
masses 26.9815
ntypes 1
core_potential_file pair.pt
embedding_energy_file embed.pt
el_density_file rho.pt
starttemp 0
timestep 0.1
maxsteps {steps}
eng_int 10
outfiles {out}
ensemble nve
"""


@pytest.fixture(scope="module")
def eam_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("regrid")
    eam = analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39)
    write_pot_table(eam.pair, str(d / "pair.pt"))
    write_pot_table(eam.rho, str(d / "rho.pt"))
    write_pot_table(eam.embed, str(d / "embed.pt"))
    return d


def _flat(scene):
    f = scene.flatten_atoms()
    m = np.asarray(f["mask"])
    return {k: np.asarray(v)[m] for k, v in f.items() if k != "mask"}


def test_optimize_grid_dims_max_capacity(eam_dir):
    """max_capacity filters the candidate grids; infeasible -> None."""
    import math
    from imd_tpu.ops.geometry import Box
    from imd_tpu.utils.generate import fcc
    pos, _, bd = fcc((8, 4, 4), 4.05)
    box = Box.create([bd[0], 0, 0], [0, bd[1], 0], [0, 0, bd[2]])
    dims, cap = optimize_grid_dims(box, 5.0, 0.3, pos, max_capacity=32)
    assert cap <= 32
    # a cap no grid can reach (fcc cell holds > 2 atoms per min cell)
    assert optimize_grid_dims(box, 5.0, 0.3, pos, max_capacity=2) is None


def test_regrid_scene_compressed(eam_dir):
    """_regrid_scene finds a finer grid for a compressed distribution
    and preserves every atom attribute."""
    p = eam_dir / "u.imd"
    p.write_text(PARAM.format(steps=1, out="u"))
    sim = Simulation.from_param_file(str(p), dtype=jnp.float32,
                                     engine="pallas")
    f = _flat(sim.scene)
    # squeeze x toward the center: local density doubles
    bd = np.diag(np.asarray(sim.box.h))
    cx = bd[0] / 2
    pos = f["pos"].copy()
    pos[:, 0] = cx + (pos[:, 0] - cx) / 1.5
    # park the squeezed atoms on a coarse over-capacity grid (the state
    # the fused loop is in right before a >32 growth)
    coarse = CellGrid(box=sim.box, dims=(3, 2, 2), capacity=96,
                      cutoff=sim.grid.cutoff, skin=sim.grid.skin)
    mom = f["mom"].copy()
    mom[:, 0] = 7.0          # nonzero so preservation is observable
    squeezed = make_scene(coarse, pos, mom=mom, mass=f["mass"],
                          type=f["type"], vtype=f["vtype"], id=f["id"],
                          dtype=jnp.float32)
    assert int(squeezed.overflow) == 0
    sim.grid = coarse
    out = sim._regrid_scene(squeezed, max_capacity=32)
    assert out is not None
    assert out.grid.capacity <= 32
    assert tuple(out.grid.dims) != (3, 2, 2)
    g = _flat(out)
    assert len(g["id"]) == len(f["id"])
    o1, o2 = np.argsort(g["id"]), np.argsort(f["id"])
    np.testing.assert_array_equal(g["id"][o1], f["id"][o2])
    np.testing.assert_allclose(g["pos"][o1], pos[o2], rtol=1e-6)
    np.testing.assert_allclose(g["mom"][o1][:, 0], 7.0, rtol=1e-6)
    np.testing.assert_array_equal(g["type"][o1], f["type"][o2])


def test_fused_run_survives_capacity_cliff(eam_dir, capsys):
    """A compressing run that would cross cap>32 re-grids and FINISHES
    on the fused Pallas path (no general-engine fallback)."""
    p = eam_dir / "c.imd"
    p.write_text(PARAM.format(steps=40, out="c"))
    sim = Simulation.from_param_file(str(p), dtype=jnp.float32,
                                     engine="pallas")
    assert sim._fused_eligible()
    f = _flat(sim.scene)
    n0 = len(f["id"])
    bd = np.diag(np.asarray(sim.box.h))
    # park on a COARSE grid near the cap (models mid-ablation state:
    # next growth would exceed 32) with a uniformly compressing
    # velocity field v_x = -a (x - cx)
    coarse = CellGrid(box=sim.box, dims=(4, 2, 3), capacity=32,
                      cutoff=sim.grid.cutoff, skin=sim.grid.skin)
    a = 0.15
    vel = np.zeros_like(f["pos"])
    vel[:, 0] = -a * (f["pos"][:, 0] - bd[0] / 2)
    sim.grid = coarse
    sim.scene = make_scene(coarse, f["pos"],
                           mom=vel * f["mass"][:, None],
                           mass=f["mass"], type=f["type"],
                           vtype=f["vtype"], id=f["id"],
                           dtype=jnp.float32)
    assert int(sim.scene.overflow) == 0
    sim._select_engine()
    st = sim.run()
    outp = capsys.readouterr().out
    assert "# density re-grid:" in outp, outp
    assert "general engine" not in outp, outp
    assert int(st.scene.n_atoms()) == n0
    assert sim.grid.capacity <= 32
