"""Subsystem restart: TTM grid, COLRAD populations, FDTD fields, VLAT
(VERDICT r1 #9 — a laser run with these enabled must be resumable).

write_checkpoint emits <base>.{chkpt,itr,ttm,ttmaux.npz}; a Simulation
constructed with cfg.restart_base restores every piece.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu.simulation import Simulation

BASE = """
coordname _fcc
box_param 6 4 4
box_unit 4.05
masses 26.9815
ntypes 1
lj_epsilon 0.35
lj_sigma 2.62
r_cut 5.0
starttemp 0.026
timestep 0.1
ensemble ttm
maxsteps 4
checkpt_int 4
ttmdimx 8
fd_min_atoms 4
init_t_el 0.5
outfiles {out}
"""


def _roundtrip(tmp_path, extra, tag):
    p = tmp_path / f"{tag}.imd"
    p.write_text(BASE.format(out=str(tmp_path / tag)) + extra)
    sim = Simulation.from_param_file(str(p), dtype=jnp.float32,
                                     engine="xla")
    st = sim.run()
    base = tmp_path / f"{tag}.00001"
    assert (base.parent / (base.name + ".ttm")).exists()

    # restart: same param file, restart_base pointing at the checkpoint
    p2 = tmp_path / f"{tag}_r.imd"
    p2.write_text(BASE.format(out=str(tmp_path / tag)) + extra)
    from imd_tpu.config import SimConfig
    cfg = SimConfig.from_file(str(p2))
    cfg.coordname = f"{tag}.00001.chkpt"
    cfg.itrname = f"{tag}.00001.itr"
    cfg.restart_base = f"{tag}.00001"
    sim2 = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float32,
                      engine="xla")
    st2 = sim2.init_state()
    return st, st2


def test_ttm_grid_restart(tmp_path):
    st, st2 = _roundtrip(tmp_path, "", "plain")
    np.testing.assert_allclose(np.asarray(st2.ttm_grid.temp),
                               np.asarray(st.ttm_grid.temp), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.ttm_grid.U),
                               np.asarray(st.ttm_grid.U), rtol=1e-5)
    # .itr records startstep = checkpointed step + 1 (the reference's
    # next-step label, imd_io_3d.c:1007); step_count/state.step count
    # COMPLETED iterations, so the restart resumes AT the checkpointed
    # step and runs exactly the missing iterations to absolute maxsteps
    assert int(st2.step) == int(st.step)


def test_colrad_populations_restart(tmp_path):
    st, st2 = _roundtrip(tmp_path, "colrad\n", "col")
    assert st.cstate is not None and st2.cstate is not None
    a, b = np.asarray(st.cstate.c), np.asarray(st2.cstate.c)
    assert a.max() > 0          # populations were actually seeded
    np.testing.assert_allclose(b, a, rtol=1e-4)


def test_fdtd_vlat_restart(tmp_path):
    extra = ("vlatdim 4\n")
    st, st2 = _roundtrip(tmp_path, extra, "vl")
    np.testing.assert_allclose(np.asarray(st2.vstate.te),
                               np.asarray(st.vstate.te), rtol=1e-5)
    extra = ("Sc 0.5\nlambda 800e-9\nI0 1e16\nlaser_t_0 1e-15\n"
             "laser_sigma_t 20e-15\n")
    st, st2 = _roundtrip(tmp_path, extra, "fd")
    assert st.fdtd is not None and st2.fdtd is not None
    np.testing.assert_allclose(np.asarray(st2.fdtd.ezx),
                               np.asarray(st.fdtd.ezx), rtol=1e-5,
                               atol=1e-12)
