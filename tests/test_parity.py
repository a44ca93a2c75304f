"""Numerical parity vs the REFERENCE BINARY (BASELINE north star: <=1e-6).

tests/data/parity/ref.eng is golden output produced by the reference
itself: a serial `imd_eam_nve_nbl` (gcc -DNBL -DEAM2 -DNVE, real =
double) built unmodified from /root/reference and run on the committed
fixture (start.chkpt with baked-in velocities + analytic-EAM tables in
IMD format 2 + parity.imd).  The fixture generator is recorded in
tools/make_parity_fixture.py.

Here the same fixture runs through imd_tpu in validation mode (float64,
fast=False = the reference-exact 3-point quadratic r^2 table
interpolation, potaccess.h) and the .eng time series must agree to
1e-6 — same initial state, same tables, same leapfrog.
"""

import pathlib
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

DATA = pathlib.Path(__file__).parent / "data" / "parity"


def _read_eng(path):
    rows = []
    with open(path) as f:
        header = f.readline().lstrip("#").split()
        for line in f:
            if line.strip():
                rows.append([float(x) for x in line.split()])
    return header, np.asarray(rows)


def test_energy_parity_vs_reference_binary(tmp_path):
    from imd_tpu.simulation import Simulation

    for f in DATA.iterdir():
        shutil.copy(f, tmp_path / f.name)
    sim = Simulation.from_param_file(str(tmp_path / "parity.imd"),
                                     dtype=jnp.float64, engine="xla",
                                     fast=False)
    sim.workdir = str(tmp_path)
    sim.run()

    h_ref, ref = _read_eng(DATA / "ref.eng")
    h_us, us = _read_eng(tmp_path / "run.eng")
    # align on the time column (the reference writes a t=0 line)
    t_ref, t_us = ref[:, 0], us[:, 0]
    common = sorted(set(np.round(t_ref, 9)) & set(np.round(t_us, 9)))
    assert len(common) >= 40, (t_ref[:3], t_us[:3])
    i_ref = {round(t, 9): k for k, t in enumerate(t_ref)}
    i_us = {round(t, 9): k for k, t in enumerate(t_us)}
    e_col_ref = h_ref.index("Epot")
    e_col_us = h_us.index("Epot")
    max_rel = 0.0
    for t in common:
        a = ref[i_ref[t], e_col_ref]
        b = us[i_us[t], e_col_us]
        max_rel = max(max_rel, abs(a - b) / abs(a))
    assert max_rel <= 1e-6, f"Epot mismatch {max_rel:.2e} > 1e-6"

    # temperature agreement (time-centered Ekin convention on both sides)
    tcol_ref = [i for i, n in enumerate(h_ref) if "temp" in n][0]
    tcol_us = [i for i, n in enumerate(h_us) if "temp" in n][0]
    worst_t = max(abs(ref[i_ref[t], tcol_ref] - us[i_us[t], tcol_us])
                  / max(abs(ref[i_ref[t], tcol_ref]), 1e-12)
                  for t in common)
    assert worst_t <= 1e-5, f"temperature mismatch {worst_t:.2e}"


def test_f32_production_drift_budget(tmp_path):
    """Documented f32 drift budget: the production dtype tracks the f64
    validation path to ~1e-4 relative Epot over the same 50 steps
    (measured ~4e-5; the budget leaves headroom for RNG/layout jitter)."""
    from imd_tpu.simulation import Simulation

    for f in DATA.iterdir():
        shutil.copy(f, tmp_path / f.name)
    sim = Simulation.from_param_file(str(tmp_path / "parity.imd"),
                                     dtype=jnp.float32, engine="xla",
                                     fast=False)
    sim.workdir = str(tmp_path)
    sim.run()
    _, ref = _read_eng(DATA / "ref.eng")
    _, us = _read_eng(tmp_path / "run.eng")
    e_ref = ref[-1, 1]
    e_us = us[-1, 1]
    assert abs(e_ref - e_us) / abs(e_ref) < 1e-4
