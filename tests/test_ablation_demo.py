"""The flagship ablation demo (examples/ablation) runs end-to-end.

Miniaturized version of the reference's headline configuration
(imd_mpi_eam_nve_nbl_nrb_stress_ttm_tmm_filter_lb, manual.pdf S2):
EAM-Al + TTM + TMM laser + NRB rear boundary + FILTER plume deletion,
driven from one parameter file through the CLI code path.
"""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
DEMO = REPO / "examples" / "ablation"


@pytest.fixture(scope="module")
def demo_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ablation")
    import math
    from imd_tpu.io.chkpt import ChkptData, write_chkpt
    from imd_tpu.models.potential import analytic_eam, write_pot_table
    from imd_tpu.utils.generate import fcc

    alat = 4.05
    eam = analytic_eam(r_cut=5.0, r0=alat / math.sqrt(2.0), E_c=3.39)
    write_pot_table(eam.pair, str(d / "pair.pt"))
    write_pot_table(eam.rho, str(d / "rho.pt"))
    write_pot_table(eam.embed, str(d / "embed.pt"))
    pos, typ, box_diag = fcc((10, 3, 3), alat)
    box_x = box_diag[0] * 2.0                      # 50% vacuum in front
    pos = pos + np.array([box_x - box_diag[0], 0.0, 0.0])
    pos[:, 0] = np.minimum(pos[:, 0], box_x - 1e-3)
    n = len(pos)
    write_chkpt(str(d / "start.chkpt"), ChkptData(
        number=np.arange(n, dtype=np.int64), type=np.zeros(n, np.int64),
        mass=np.full(n, 26.9815), pos=pos, vel=np.zeros((n, 3)),
        data=np.zeros((n, 1)),
        box_x=np.array([box_x, 0, 0]), box_y=np.array([0, box_diag[1], 0]),
        box_z=np.array([0, 0, box_diag[2]])))

    # the shipped param file, miniaturized (same tags, smaller numbers)
    text = (DEMO / "ablation.imd").read_text()
    for a, b in (("ttmdimx 48", "ttmdimx 12"),
                 ("maxsteps 2000", "maxsteps 14"),
                 ("filter_min_x 150.0", "filter_min_x 20.0"),
                 ("filter_int 50", "filter_int 7"),
                 ("eng_int 20", "eng_int 7"),
                 ("ttm_int 100", "ttm_int 7"),
                 ("checkpt_int 1000", "checkpt_int 14"),
                 ("I0 2.0e17", "I0 5.0e17"),
                 ("laser_t_0 300e-15", "laser_t_0 60e-15"),
                 ("laser_sigma_t 100e-15", "laser_sigma_t 40e-15")):
        assert a in text, a
        text = text.replace(a, b)
    (d / "mini.imd").write_text(text)
    return d


@pytest.mark.slow
def test_ablation_demo_end_to_end(demo_dir):
    import jax.numpy as jnp
    from imd_tpu.simulation import Simulation

    sim = Simulation.from_param_file(str(demo_dir / "mini.imd"),
                                     dtype=jnp.float32, engine="xla")
    # all four subsystems of the flagship build are armed
    assert sim.cfg.ttm.enabled and sim.cfg.tmm.enabled
    assert sim.cfg.nrb.enabled and sim.cfg.filter.enabled
    assert sim.nrb_state is not None
    n0 = int(sim.scene.n_atoms())
    st = sim.run()

    # laser energy was absorbed into the electron system
    assert float(jnp.max(st.ttm_grid.temp)) > 0.1      # T_e >> 300 K
    assert bool(jnp.all(jnp.isfinite(st.ttm_grid.temp)))
    # absorption-side gradient: T_e is (weakly) higher at the film front
    temp = np.asarray(st.ttm_grid.temp)
    act = np.nonzero(np.asarray(st.ttm_grid.natoms) > 0)[0]
    assert temp[act[0]] >= temp[act[-1]]
    # the lattice heats through the e-ph coupling
    assert float(st.stats.tot_kin_energy) > 0.0
    # atom bookkeeping: nothing created; FILTER may delete a few
    n1 = int(st.scene.n_atoms())
    assert n0 - 40 <= n1 <= n0
    assert int(st.scene.overflow) == 0

    outs = {p.name for p in demo_dir.iterdir()}
    assert "ablation.eng" in outs
    assert any(n.endswith(".ttm") for n in outs), outs
    assert "ablation.00001.chkpt" in outs and "ablation.00001.nrb" in outs

    # .eng records the electron-energy column rising (laser absorption)
    lines = [ln.split() for ln in
             (demo_dir / "ablation.eng").read_text().splitlines()
             if not ln.startswith("#")]
    ttm_eng = [float(r[-1]) for r in lines]
    assert ttm_eng[-1] > 0.0


def test_fused_capacity_cap_falls_back_to_general(tmp_path, capsys):
    """When in-run compression pushes a cell past the Pallas capacity
    cap (32), the fused loop grows the slot axis, switches to the
    general XLA engine, and CONTINUES — the reference's alloc_cell
    never fails (imd_alloc.c:551).  Two near-ideal-gas clusters drift
    ballistically into one empty cell (30 + 30 atoms > cap 32)."""
    import jax.numpy as jnp
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.io.chkpt import ChkptData, write_chkpt
    from imd_tpu.models.potential import analytic_eam, write_pot_table
    from imd_tpu.simulation import Simulation

    eam = analytic_eam(r_cut=2.4, r0=1.2, E_c=1e-7)   # ~free particles
    for nm, pt in (("pair", eam.pair), ("rho", eam.rho),
                   ("embed", eam.embed)):
        write_pot_table(pt, str(tmp_path / f"{nm}.pt"))

    rng = np.random.default_rng(0)
    L = 9.0                      # 3 cells of ~3 A at cutoff 2.4+skin
    mid = L / 2.0
    left = rng.uniform([0.3, 0.6, 0.6], [2.2, 2.4, 2.4], (30, 3))
    right = rng.uniform([6.8, 0.6, 0.6], [8.7, 2.4, 2.4], (30, 3))
    pos = np.vstack([left, right])
    vel = np.zeros((60, 3))
    vel[:30, 0] = +0.12          # meet in the middle cell
    vel[30:, 0] = -0.12
    n = 60
    write_chkpt(str(tmp_path / "gas.chkpt"), ChkptData(
        number=np.arange(n), type=np.zeros(n, np.int64),
        mass=np.ones(n), pos=pos, vel=vel, data=np.zeros((n, 1)),
        box_x=np.array([L, 0, 0]), box_y=np.array([0, L, 0]),
        box_z=np.array([0, 0, L])))

    out = str(tmp_path / "gas")
    cfg = SimConfig.from_params(parse_param_text(f"""
coordname   gas.chkpt
outfiles    {out}
ntypes      1
masses      1.0
ensemble    nve
timestep    0.1
maxsteps    400
starttemp   0
do_maxwell  0
eng_int     100
pbc_dirs    1 1 1
cell_capacity 32
core_potential_file pair.pt
embedding_energy_file embed.pt
el_density_file rho.pt
"""))
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float32,
                     engine="pallas")
    assert sim.use_pallas and sim.grid.capacity == 32
    st = sim.run()
    # the run crossed the cap: fell back to the general loop, grew the
    # capacity as far as the density demanded, finished with no loss
    # (engine='pallas' is user-forced, so use_pallas stays set; 'auto'
    # would re-select XLA past the cap)
    out = capsys.readouterr().out
    assert "fused-path capacity cap reached" in out
    assert sim.grid.capacity >= 40
    assert int(st.scene.n_atoms()) == n
    assert int(st.scene.overflow) == 0
    assert int(st.step) == 400
