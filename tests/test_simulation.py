"""End-to-end param-file-driven runs: generator, chkpt round-trip, .eng."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu.config import SimConfig, parse_param_text
from imd_tpu.io.chkpt import read_chkpt
from imd_tpu.simulation import Simulation

PARAM_LJ = """
coordname   _fcc
outfiles    {out}
box_param   4 4 4
box_unit    1.5874
ntypes      1
masses      1.0
ensemble    nve
timestep    0.004
maxsteps    60
starttemp   0.03
eng_int     20
checkpt_int 60
lj_epsilon  1.0
lj_sigma    1.0
r_cut       2.5
pbc_dirs    1 1 1
seed        11
"""


def test_param_file_run(tmp_path):
    out = str(tmp_path / "run")
    cfg = SimConfig.from_params(parse_param_text(PARAM_LJ.format(out=out)))
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    state = sim.run()
    assert int(state.step) == 60
    # .eng exists with 3 data lines
    eng = open(out + ".eng").read().strip().splitlines()
    assert eng[0].startswith("# time Epot temperature")
    assert len(eng) == 1 + 3
    vals = [float(x) for x in eng[-1].split()]
    assert vals[1] < 0            # bound LJ crystal
    assert 0 < vals[2] < 0.1      # sane temperature
    # checkpoint written and readable
    d = read_chkpt(out + ".00001.chkpt")
    assert d.n == 4 * 4 * 4 * 4
    assert d.box_x is not None and abs(d.box_x[0] - 4 * 1.5874) < 1e-10


def test_checkpoint_restart_continuity(tmp_path):
    out = str(tmp_path / "runA")
    cfg = SimConfig.from_params(parse_param_text(PARAM_LJ.format(out=out)))
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    sim.run()

    # restart from the checkpoint; energy must continue smoothly
    cfg2 = SimConfig.from_params(parse_param_text(PARAM_LJ.format(out=str(tmp_path / "runB"))))
    cfg2.coordname = out + ".00001.chkpt"
    cfg2.itrname = out + ".00001.itr"
    cfg2.maxsteps = 20
    cfg2.starttemp = 0.0   # no re-thermalization
    cfg2.do_maxwell = False
    sim2 = Simulation(cfg2, workdir=str(tmp_path), dtype=jnp.float64)
    # .itr says "startstep 61" (the reference's next-step label,
    # imd_io_3d.c:1007); step_count counts COMPLETED steps = 60
    assert sim2.step_count == 60
    st1 = sim2.init_state()
    step_fn = sim2.make_step_fn()
    st2 = jax.jit(step_fn)(st1)
    e1 = float(st2.epot_total) + float(st2.stats.tot_kin_energy)
    # compare with the original runs' final energy per atom from .eng
    eng = open(out + ".eng").read().strip().splitlines()
    epot_end = float(eng[-1].split()[1])
    n = 256
    assert abs(float(st2.epot_total) / n - epot_end) < 5e-3


def test_binary_checkpoint_roundtrip(tmp_path):
    from imd_tpu.io.chkpt import ChkptData, write_chkpt
    rng = np.random.default_rng(0)
    n = 17
    d = ChkptData(number=np.arange(n), type=np.zeros(n, np.int32),
                  mass=np.full(n, 26.98), pos=rng.uniform(0, 10, (n, 3)),
                  vel=rng.normal(size=(n, 3)), data=rng.normal(size=(n, 1)),
                  box_x=np.array([10., 0, 0]), box_y=np.array([0, 10., 0]),
                  box_z=np.array([0, 0, 10.]))
    p = str(tmp_path / "b.chkpt")
    write_chkpt(p, d, binary=True, double=True)
    d2 = read_chkpt(p)
    np.testing.assert_array_equal(d.number, d2.number)
    np.testing.assert_allclose(d.pos, d2.pos, rtol=1e-15)
    np.testing.assert_allclose(d.vel, d2.vel, rtol=1e-15)
    # single precision too
    write_chkpt(p, d, binary=True, double=False)
    d3 = read_chkpt(p)
    np.testing.assert_allclose(d.pos, d3.pos, rtol=1e-6)


PARAM_TTM = """
coordname   _fcc
outfiles    {out}
box_param   8 4 4
box_unit    4.05
ntypes      1
masses      26.9815
ensemble    ttm
timestep    0.2
maxsteps    40
starttemp   0.026
eng_int     20
ttm_int     40
checkpt_int 0
lj_epsilon  0.35
lj_sigma    2.55
r_cut       5.0
pbc_dirs    1 1 1
seed        3
ttmdimx     8
fd_min_atoms 5
init_t_el   0.8
laser_sigma_e 0
atomic_z    13
"""


def test_param_file_ttm_run(tmp_path):
    import jax.numpy as jnp
    from imd_tpu.io.ttm_io import read_ttm
    out = str(tmp_path / "ttmrun")
    cfg = SimConfig.from_params(parse_param_text(PARAM_TTM.format(out=out)))
    assert cfg.ttm.enabled and cfg.ensemble == "ttm"
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    state = sim.run()
    assert int(state.step) == 40
    # electrons cooled toward the lattice
    import numpy as np
    tgrid = state.ttm_grid
    act = np.asarray(tgrid.natoms) >= 5
    te = np.asarray(tgrid.temp)[act]
    assert (te < 0.8).all() and (te > 0.02).all()
    # .ttm output written with the reference header and readable back
    d = read_ttm(out + ".1.ttm")
    assert len(d["temp"]) == 8
    np.testing.assert_allclose(np.sort(d["temp"])[-len(te):],
                               np.sort(te), rtol=1e-6)
    # .eng has the ttm_eng column
    eng = open(out + ".eng").read().splitlines()
    assert "ttm_eng" in eng[0]
    assert float(eng[-1].split()[-1]) > 0


def test_cli_two_phase_run(tmp_path):
    """python -m imd_tpu -p file: phases run, atoms conserved, files out."""
    import imd_tpu.__main__ as cli

    param = tmp_path / "run.imd"
    # phase-2 maxsteps is ABSOLUTE (reference: phases run steps_min..
    # steps_max with steps_min = previous phase's end + 1, imd.c:294-310;
    # imd_main_3d.c:151): 80 means 20 further mik steps after the 60 nve
    param.write_text(PARAM_LJ.format(out=str(tmp_path / "cli"))
                     + "\nsimulation 2\nensemble mik\nmaxsteps 80\n")
    assert cli.count_phases(param.read_text()) == 2
    cli.main(["-p", str(param), "--dtype", "float32"])
    eng = (tmp_path / "cli.eng").read_text().strip().splitlines()
    assert len(eng) >= 4
    d = read_chkpt(str(tmp_path / "cli.00001.chkpt"))
    assert d.n == 4 * 4 * 4 * 4      # all atoms survived (f32 binning)
    # end-of-run -final checkpoint (write_config(-1), imd_io_3d.c:995)
    assert (tmp_path / "cli-final.chkpt").exists()
    assert "checkpoint -1" in (tmp_path / "cli-final.itr").read_text()


def test_grow_capacity_preserves_atoms():
    """grow_capacity pads dead slots only; rebin after growth keeps every
    atom (the alloc_cell realloc analog, imd_alloc.c:551)."""
    from imd_tpu.models.potential import analytic_eam  # noqa: F401
    from imd_tpu.ops.geometry import Box, CellGrid
    from imd_tpu.scene import grow_capacity, make_scene, rebin
    from imd_tpu.utils.generate import fcc

    pos, typ, box_diag = fcc((4, 4, 4), 4.05)
    box = Box.create([box_diag[0], 0, 0], [0, box_diag[1], 0],
                     [0, 0, box_diag[2]])
    grid = CellGrid(box=box, dims=(3, 3, 3), capacity=16,
                    cutoff=5.0, skin=0.5)
    sc = make_scene(grid, pos, mass=np.full(len(pos), 26.9815),
                    id=np.arange(len(pos)))
    n0 = int(sc.n_atoms())
    ids0 = np.sort(np.asarray(sc.flatten_atoms()["id"])[
        np.asarray(sc.flatten_atoms()["mask"])])
    g = grow_capacity(sc, 24)
    assert g.capacity == 24 and g.grid.capacity == 24
    assert int(g.n_atoms()) == n0
    assert int(g.overflow) == 0
    # the padded slots are dead and survive a rebin
    g2 = rebin(g)
    assert int(g2.n_atoms()) == n0
    assert int(g2.overflow) == 0
    ids2 = np.sort(np.asarray(g2.flatten_atoms()["id"])[
        np.asarray(g2.flatten_atoms()["mask"])])
    np.testing.assert_array_equal(ids0, ids2)
    # momenta/positions of live atoms unchanged by the pad
    f0, f2 = sc.flatten_atoms(), g.flatten_atoms()
    m0 = np.asarray(f0["mask"])
    p0 = np.asarray(f0["pos"])[m0]
    m2 = np.asarray(f2["mask"])
    p2 = np.asarray(f2["pos"])[m2]
    i0 = np.argsort(np.asarray(f0["id"])[m0])
    i2 = np.argsort(np.asarray(f2["id"])[m2])
    np.testing.assert_allclose(p0[i0], p2[i2], rtol=0, atol=0)


def test_ensemble_cg_relaxes(tmp_path):
    """`ensemble cg` runs the Polak-Ribiere CG relaxation from the
    driver (move_atoms_cg dispatch, imd_param.c:5288) and lowers Epot
    monotonically to a near-zero-force state."""
    out = str(tmp_path / "cg")
    text = PARAM_LJ.format(out=out).replace("ensemble    nve",
                                            "ensemble    cg")
    text = text.replace("starttemp   0.03", "starttemp   0")
    # more line-min cycles than the NVE base: the 5%-of-f0 bound below
    # needs CG to actually converge, not just descend
    text = text.replace("maxsteps    60", "maxsteps    200")
    text += "fnorm_threshold 1e-6\n"
    p = tmp_path / "cg.imd"
    p.write_text(text)
    sim = Simulation.from_param_file(str(p))
    # perturb the lattice so there is something to relax
    key = jax.random.PRNGKey(2)
    sim.scene = sim.scene.replace(
        pos=sim.scene.pos + 0.05 * jax.random.normal(
            key, sim.scene.pos.shape))
    res0 = sim._compute_forces(sim.scene)
    e0 = float(jnp.sum(res0.epot))
    m = sim.scene.fmask()[..., None]
    f0 = float(jnp.sum(res0.force * res0.force * m))
    st = sim.run()
    e1 = float(st.epot_total)
    assert e1 < e0 - 1e-3
    # the force norm collapses toward the relaxed state
    assert float(st.stats.fnorm) < 0.05 * f0
    assert (tmp_path / "cg.eng").exists()


def test_cli_restart_runs_to_absolute_maxsteps(tmp_path):
    """Reference semantics: maxsteps is the ABSOLUTE final step — a
    restart continues steps_min..maxsteps (imd_main_3d.c:151), it does
    not run maxsteps additional steps."""
    import imd_tpu.__main__ as cli

    out = str(tmp_path / "r")
    p = tmp_path / "r.imd"
    p.write_text(PARAM_LJ.format(out="r"))
    cli.main(["-p", str(p), "--engine", "xla"])
    # restart from checkpoint 1 (written at step 60); startstep = 61
    text = PARAM_LJ.format(out="r").replace("maxsteps    60",
                                            "maxsteps    80")
    p.write_text(text)
    cli.main(["-p", str(p), "-r", "1", "--engine", "xla"])
    eng = [ln for ln in open(out + ".eng").read().splitlines()
           if ln and not ln.startswith("#")]
    times = [float(ln.split()[0]) for ln in eng]
    # the restarted run appended only up to t = 80 * dt, not 140 * dt
    assert max(times) <= 80 * 0.004 + 1e-9, max(times)
    assert max(times) >= 79 * 0.004
