"""The CLI/driver must run the benched fused path (VERDICT r1 #3).

bench.py measures the fused cells-last step; Simulation.run() now
dispatches to the same path (run_fused) whenever the configuration fits,
so a user's `python -m imd_tpu -p file` gets the benched throughput.
On CPU the Pallas kernels run interpreted, so shapes are tiny here.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.models.potential import analytic_eam, write_pot_table
from imd_tpu.simulation import Simulation

BASE = """
coordname _fcc
box_param 5 4 4
box_unit 4.05
masses 26.9815
ntypes 1
core_potential_file pair.pt
embedding_energy_file embed.pt
el_density_file rho.pt
starttemp 0.026
timestep 0.1
maxsteps 8
eng_int 4
checkpt_int 8
outfiles {out}
ensemble {ens}
"""


@pytest.fixture(scope="module")
def eam_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("eamtab")
    eam = analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39)
    write_pot_table(eam.pair, str(d / "pair.pt"))
    write_pot_table(eam.rho, str(d / "rho.pt"))
    write_pot_table(eam.embed, str(d / "embed.pt"))
    return d


def test_fused_cli_nve_matches_general(eam_dir):
    p = eam_dir / "f.imd"
    p.write_text(BASE.format(out="f", ens="nve"))
    sim = Simulation.from_param_file(str(p), dtype=jnp.float32,
                                     engine="pallas")
    assert sim._fused_eligible()
    st = sim.run()
    assert np.isfinite(float(st.epot_total)) and float(st.epot_total) < 0
    names = {q.name for q in eam_dir.iterdir()}
    assert "f.eng" in names and "f.00001.chkpt" in names, names
    # pressure column is real: the observe() kernel returns the virial
    assert float(st.virial) != 0.0

    p2 = eam_dir / "g.imd"
    p2.write_text(BASE.format(out="g", ens="nve"))
    sim2 = Simulation.from_param_file(str(p2), dtype=jnp.float32,
                                      engine="pallas")
    st2 = sim2.run(allow_fused=False)
    e1, e2 = float(st.epot_total), float(st2.epot_total)
    assert abs(e1 - e2) < 1e-3 * abs(e1)
    # fused observe() reports instantaneous Ekin at the block edge; the
    # general path reports the leapfrog time-centered (k1+k2)/4 — they
    # differ during the equilibration transient, so compare loosely
    k1 = float(st.stats.tot_kin_energy)
    k2 = float(st2.stats.tot_kin_energy)
    assert abs(k1 - k2) < 0.2 * max(abs(k1), 1e-6)


def test_fused_cli_ttm(eam_dir):
    p = eam_dir / "t.imd"
    p.write_text(BASE.format(out="t", ens="ttm")
                 + "ttmdimx 6\nfd_min_atoms 4\ninit_t_el 0.3\nttm_int 8\n"
                 "laser_rescale_mode 4\nlaser_sigma_e 0.05\n"
                 "laser_sigma_t 50\nlaser_t_0 100\nlaser_mu 0.01\n")
    sim = Simulation.from_param_file(str(p), dtype=jnp.float32,
                                     engine="pallas")
    assert sim._fused_eligible()
    st = sim.run()
    assert bool(jnp.all(jnp.isfinite(st.ttm_grid.temp)))
    names = {q.name for q in eam_dir.iterdir()}
    assert "t.1.ttm" in names, names


def test_fused_cli_flagship(eam_dir):
    """The reference's flagship build (TTM + TMM Helmholtz laser + NRB +
    FILTER, manual.pdf §2) runs on the FUSED hot loop and matches the
    general step."""
    extra = ("pbc_dirs 0 1 1\n"
             "ttmdimx 6\nfd_min_atoms 4\nwide_range 1\ninit_t_el 0.026\n"
             "ttm_int 8\n"
             "tmm\nlambda 800e-9\nI0 2.0e17\n"
             "laser_t_0 30e-15\nlaser_sigma_t 20e-15\n"
             "nrb_alat 4.05\nnrb_k 5.0\n"
             "filter_int 4\nfilter_min_x 1.0\n")
    p = eam_dir / "fl.imd"
    p.write_text(BASE.format(out="fl", ens="ttm") + extra)
    sim = Simulation.from_param_file(str(p), dtype=jnp.float32,
                                     engine="pallas")
    assert sim.tmm_params is not None and sim.nrb_state is not None
    assert sim.cfg.filter.enabled
    assert sim._fused_eligible()
    st = sim.run()
    assert bool(jnp.all(jnp.isfinite(st.ttm_grid.temp)))
    assert int(st.scene.n_atoms()) > 0

    p2 = eam_dir / "fl2.imd"
    p2.write_text(BASE.format(out="fl2", ens="ttm") + extra)
    sim2 = Simulation.from_param_file(str(p2), dtype=jnp.float32,
                                      engine="pallas")
    st2 = sim2.run(allow_fused=False)
    # same physics on both paths
    assert int(st.scene.n_atoms()) == int(st2.scene.n_atoms())
    te1 = np.asarray(st.ttm_grid.temp)
    te2 = np.asarray(st2.ttm_grid.temp)
    np.testing.assert_allclose(te1, te2, rtol=2e-3, atol=2e-5)
    e1, e2 = float(st.epot_total), float(st2.epot_total)
    assert abs(e1 - e2) < 1e-3 * abs(e1)


def test_fused_cli_ttm_vlat_elecpress(eam_dir):
    """VLATTICE continuum tail + ELECPRESS blast force ride the fused
    hot loop (imd_ttm.c:41-59 / 554) and match the general step."""
    extra = ("pbc_dirs 0 1 1\n"
             "ttmdimx 6\nfd_min_atoms 4\ninit_t_el 0.3\nttm_int 8\n"
             "laser_rescale_mode 4\nlaser_sigma_e 0.05\n"
             "laser_sigma_t 50\nlaser_t_0 100\nlaser_mu 0.01\n"
             "vlatdim 4\nelecpress 1\n")
    p = eam_dir / "vl.imd"
    p.write_text(BASE.format(out="vl", ens="ttm") + extra)
    sim = Simulation.from_param_file(str(p), dtype=jnp.float32,
                                     engine="pallas")
    assert sim.vlat_params is not None and sim.cfg.ttm.elecpress
    assert sim._fused_eligible()
    st = sim.run()
    assert bool(jnp.all(jnp.isfinite(st.ttm_grid.temp)))
    assert st.vstate is not None
    assert bool(jnp.all(jnp.isfinite(st.vstate.te)))

    p2 = eam_dir / "vl2.imd"
    p2.write_text(BASE.format(out="vl2", ens="ttm") + extra)
    sim2 = Simulation.from_param_file(str(p2), dtype=jnp.float32,
                                      engine="pallas")
    st2 = sim2.run(allow_fused=False)
    np.testing.assert_allclose(np.asarray(st.ttm_grid.temp),
                               np.asarray(st2.ttm_grid.temp),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st.vstate.te),
                               np.asarray(st2.vstate.te),
                               rtol=2e-3, atol=2e-5)
    e1, e2 = float(st.epot_total), float(st2.epot_total)
    assert abs(e1 - e2) < 1e-3 * abs(e1)


def test_fused_cli_ttm_colrad(eam_dir):
    """COLRAD plasma kinetics ride the fused hot loop (do_colrad hook,
    imd_ttm.c:101-103) and match the general step."""
    extra = ("ttmdimx 6\nfd_min_atoms 4\ninit_t_el 0.5\nttm_int 8\n"
             "laser_rescale_mode 4\nlaser_sigma_e 0.05\n"
             "laser_sigma_t 50\nlaser_t_0 100\nlaser_mu 0.01\n"
             "colrad\ncolrad_maxz 2\ncolrad_nlev 3\n")
    p = eam_dir / "cr.imd"
    p.write_text(BASE.format(out="cr", ens="ttm") + extra)
    sim = Simulation.from_param_file(str(p), dtype=jnp.float32,
                                     engine="pallas")
    assert sim.colrad_tab is not None
    assert sim._fused_eligible()
    st = sim.run()
    assert st.cstate is not None
    assert bool(jnp.all(jnp.isfinite(st.cstate.c)))
    assert bool(jnp.all(jnp.isfinite(st.ttm_grid.temp)))

    p2 = eam_dir / "cr2.imd"
    p2.write_text(BASE.format(out="cr2", ens="ttm") + extra)
    sim2 = Simulation.from_param_file(str(p2), dtype=jnp.float32,
                                      engine="pallas")
    st2 = sim2.run(allow_fused=False)
    np.testing.assert_allclose(np.asarray(st.ttm_grid.temp),
                               np.asarray(st2.ttm_grid.temp),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st.cstate.c),
                               np.asarray(st2.cstate.c),
                               rtol=2e-3, atol=1e-6)


def test_fused_cli_ttm_fdtd(eam_dir):
    """The FDTD Maxwell laser source rides the fused hot loop
    (calc_ttm_fdtd schedule, imd_ttm_3D.c:110-180) and matches the
    general step."""
    extra = ("ttmdimx 6\nfd_min_atoms 4\ninit_t_el 0.1\nttm_int 8\n"
             "fdtd\nlambda 800e-9\nI0 5.0e16\n"
             "laser_t_0 30e-15\nlaser_sigma_t 20e-15\n")
    p = eam_dir / "fd.imd"
    p.write_text(BASE.format(out="fd", ens="ttm") + extra)
    sim = Simulation.from_param_file(str(p), dtype=jnp.float32,
                                     engine="pallas")
    assert sim.fdtd_params is not None
    assert sim._fused_eligible()
    st = sim.run()
    assert st.fdtd is not None
    assert bool(jnp.all(jnp.isfinite(st.ttm_grid.temp)))

    p2 = eam_dir / "fd2.imd"
    p2.write_text(BASE.format(out="fd2", ens="ttm") + extra)
    sim2 = Simulation.from_param_file(str(p2), dtype=jnp.float32,
                                      engine="pallas")
    st2 = sim2.run(allow_fused=False)
    np.testing.assert_allclose(np.asarray(st.ttm_grid.temp),
                               np.asarray(st2.ttm_grid.temp),
                               rtol=2e-3, atol=2e-5)


def test_fused_select_observers(eam_dir):
    """.avp/.dsp/.dem observers fire on the fused hot loop too — the
    observe() kernel supplies the per-atom Epot the writers need."""
    p = eam_dir / "sel.imd"
    p.write_text(BASE.format(out="sel", ens="nve") +
                 "avpos_int 4\ndsp_int 4\nmin_dsp2 1e-12\n"
                 "dem_int 4\ncalc_Epot_ref 1\nmin_dpot -1.0\n")
    sim = Simulation.from_param_file(str(p), dtype=jnp.float32,
                                     engine="pallas")
    assert sim._fused_eligible()
    sim.run()
    names = {q.name for q in eam_dir.iterdir()}
    assert "sel.1.avp" in names and "sel.2.avp" in names, names
    assert "sel.4.dsp" in names and "sel.8.dsp" in names, names
    assert "sel.4.dem" in names and "sel.8.dem" in names, names
    n = int(sim.scene.n_atoms())
    dsp = np.loadtxt(eam_dir / "sel.8.dsp")
    assert len(dsp) == n
    assert 0 < np.linalg.norm(dsp[:, 4:7], axis=1).max() < 0.5


def test_fused_socket_quit(eam_dir, tmp_path):
    """Socket steering on the FUSED path: the quit command stops a
    pallas fused run early and checkpoints (check_socket, socket_io.c —
    previously socket_int forced the general step)."""
    import socket as pysock
    import threading

    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.io import socket_io
    from imd_tpu.simulation import Simulation

    out = str(tmp_path / "fsock")
    cfg = SimConfig.from_params(parse_param_text(f"""
coordname   _fcc
outfiles    {out}
box_param   4 4 4
box_unit    4.05
ntypes      1
masses      26.9815
ensemble    nve
timestep    0.1
maxsteps    2000
starttemp   0.026
eng_int     10
checkpt_int 2000
pbc_dirs    1 1 1
seed        1
socket_int  10
socket_port 0
core_potential_file {eam_dir}/pair.pt
embedding_energy_file {eam_dir}/embed.pt
el_density_file {eam_dir}/rho.pt
"""))
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64,
                     engine="pallas")
    assert sim._fused_eligible(), "socket run should stay on the fused path"

    state = {}
    orig = socket_io.SocketServer

    def wrapper(*a, **k):
        srv = orig(*a, **k)
        state["port"] = srv.port
        return srv

    def drive():
        import time
        for _ in range(600):
            if "port" in state:
                break
            time.sleep(0.05)
        s = pysock.create_connection(("127.0.0.1", state["port"]),
                                     timeout=10)
        s.sendall(b"quit\n")
        s.close()

    th = threading.Thread(target=drive, daemon=True)
    socket_io.SocketServer = wrapper
    try:
        th.start()
        st = sim.run()
    finally:
        socket_io.SocketServer = orig
    assert int(st.step) < 2000
    assert any(q.name.endswith(".chkpt") for q in tmp_path.iterdir())
