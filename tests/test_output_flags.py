"""Runtime switches for the reference's output compile flags:
WRITEF (.wf force dumps, imd_io.c:944-1046), NNBR (.nb coordination
filter + n_nbr chkpt column, imd_io.c:805-934), RELAXINFO (extra .eng
columns, imd_io.c:2454-2457), GETMIN/GETSADDLE (PxF-crossing configs,
imd_main_3d.c:508-522), HPO (high-precision output, imd_io.c:2297)."""

import numpy as np
import pytest

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
ensemble nve
outfiles {out}
"""


def test_wf_nb_relaxinfo_hpo(tmp_path):
    p = tmp_path / "t.imd"
    p.write_text(BASE.format(out=tmp_path / "out") + """
maxsteps 6
eng_int 2
force_int 3
force_all 1
nb_rcut 3.2
nb_checkpt_int 3
nb_cut_lower 11
nb_cut_upper 13
relaxinfo 1
hpo 1
checkpt_int 6
""")
    sim = Simulation.from_param_file(str(p), engine="xla")
    sim.run()
    # .wf: all 384 atoms (force_all), force columns near equilibrium
    wf = (tmp_path / "out.1.wf").read_text().splitlines()
    assert wf[1] == "#C number type mass x y z fx fy fz Epot"
    rows = [ln.split() for ln in wf if not ln.startswith("#")]
    assert len(rows) == 384
    F = np.array([[float(v) for v in r[6:9]] for r in rows])
    assert np.abs(F.sum(axis=0)).max() < 1e-3   # momentum conservation
    # .nb: perfect fcc at T~0 has coordination 12 within 3.2 A for every
    # atom -> strictly inside (11, 13) -> nothing written
    nb = [ln for ln in (tmp_path / "out.1.nb").read_text().splitlines()
          if not ln.startswith("#")]
    assert nb == []
    # relaxinfo .eng columns
    eng = (tmp_path / "out.eng").read_text().splitlines()
    assert eng[0].split()[-3:] == ["delta_epot", "xnorm", "xmax"]
    row = [float(v) for v in eng[2].split()]
    assert row[-2] > 0 and row[-1] > row[-2]    # xmax >= xnorm > 0
    # hpo: checkpoint carries >12 significant digits
    ck = (tmp_path / "out.00001.chkpt").read_text().splitlines()
    body = [ln for ln in ck if not ln.startswith("#")][0]
    assert any(len(tok.split("e")[0].replace("-", "").replace(".", ""))
               >= 15 for tok in body.split()[2:])


def test_nb_selects_defect_coordination(tmp_path):
    """With the band placed off the bulk coordination, .nb writes the
    out-of-band atoms (the reference's defect-by-coordination filter,
    write_atoms_nb imd_io.c:876-877)."""
    p = tmp_path / "t.imd"
    p.write_text(BASE.format(out=tmp_path / "out") + """
maxsteps 2
nb_rcut 3.2
nb_checkpt_int 2
nb_cut_lower 12
nb_cut_upper 14
""")
    sim = Simulation.from_param_file(str(p), engine="xla")
    sim.run()
    nb = [ln for ln in (tmp_path / "out.1.nb").read_text().splitlines()
          if not ln.startswith("#")]
    assert len(nb) == 384        # 12 is not strictly above lower=12


def test_getmin_writes_config_at_pxf_crossing(tmp_path):
    """A vibrating crystal's sum(p.F) oscillates; getmin must write a
    min<Epot> config at a +->- crossing (write_minconfig)."""
    p = tmp_path / "t.imd"
    p.write_text(BASE.format(out=tmp_path / "out") + """
maxsteps 40
getmin 1
""")
    sim = Simulation.from_param_file(str(p), engine="xla")
    sim.run()
    mins = [f for f in tmp_path.iterdir() if ".min" in f.name]
    assert mins, "no min config written over 40 steps"
    # the file is a readable checkpoint
    from imd_tpu.io.chkpt import read_chkpt
    d = read_chkpt(str(mins[0]))
    assert d.n == 384


def test_force_potfit_file(tmp_path):
    """`force_potfit 1` adds the potfit reference-configuration .force
    file at the force_int cadence (write_config_force, imd_io.c:1909)."""
    p = tmp_path / "t.imd"
    p.write_text(BASE.format(out=tmp_path / "out") + """
maxsteps 4
force_int 4
force_potfit 1
eng_int 4
""")
    sim = Simulation.from_param_file(str(p), engine="xla")
    sim.run()
    txt = (tmp_path / "out.1.force").read_text().splitlines()
    assert txt[0] == "#N 384 1"
    assert txt[5].startswith("#E ")
    assert txt[6].startswith("#S ")
    assert txt[7] == "#F"
    rows = np.array([[float(v) for v in ln.split()] for ln in txt[8:]])
    assert rows.shape == (384, 7)
    assert np.abs(rows[:, 4:].sum(axis=0)).max() < 1e-3
