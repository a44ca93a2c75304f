"""DYNAMO setfl/funcfl readers (models/setfl.py) — the native path for
the OpenKIM EAM_Dynamo_* parameter files (imd_forces_kim.c use case)."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.models.potential import analytic_eam
from imd_tpu.models.setfl import read_funcfl, read_setfl


def _sample_radial(pt, col, rs):
    """Evaluate an r²-table column at radial points rs (f64 host)."""
    vals = []
    for r in rs:
        v, _ = pt.interp(col, jnp.asarray(r * r, jnp.float64))
        vals.append(float(v))
    return np.array(vals)


def _make_setfl_text(eam, nelem=1, nrho=600, nr=800, cutoff=5.0,
                     fs=False):
    """Synthesize a setfl text from the analytic EAM tables."""
    drho = 40.0 / (nrho - 1)
    dr = cutoff / (nr - 1)
    rs = dr * np.arange(nr)
    rs_eval = np.maximum(rs, 1e-6)
    out = io.StringIO()
    out.write("synthetic setfl\nfrom analytic_eam\n#\n")
    out.write(f"{nelem} " + " ".join(["Al"] * nelem) + "\n")
    out.write(f"{nrho} {drho:.10e} {nr} {dr:.10e} {cutoff:.10e}\n")
    rhos = drho * np.arange(nrho)
    emb = [float(eam.embed.interp(0, jnp.asarray(q, jnp.float64))[0])
           for q in rhos]
    rho_r = _sample_radial(eam.rho, 0, rs_eval)
    phi_r = _sample_radial(eam.pair, 0, rs_eval)
    for _ in range(nelem):
        out.write("13 26.9815 4.05 fcc\n")
        out.write("\n".join(f"{v:.10e}" for v in emb) + "\n")
        nsrc = nelem if fs else 1
        for _ in range(nsrc):
            out.write("\n".join(f"{v:.10e}" for v in rho_r) + "\n")
    for i in range(nelem):
        for _ in range(i + 1):
            out.write("\n".join(f"{v:.10e}" for v in phi_r * rs)
                      + "\n")
    return out.getvalue()


@pytest.mark.smoke
def test_setfl_roundtrip_matches_source_tables():
    eam = analytic_eam(dtype=jnp.float64)
    text = _make_setfl_text(eam)
    got, meta = read_setfl(text, dtype=jnp.float64)
    assert meta["nelem"] == 1 and meta["masses"][0] == pytest.approx(
        26.9815)
    # compare in the physically sampled range r in [2.0, 4.8]
    rs = np.linspace(2.0, 4.8, 60)
    for name, a, b in (("pair", eam.pair, got.pair),
                       ("rho", eam.rho, got.rho)):
        va = _sample_radial(a, 0, rs)
        vb = _sample_radial(b, 0, rs)
        err = np.max(np.abs(va - vb)) / (np.max(np.abs(va)) + 1e-30)
        assert err < 2e-3, (name, err)
    qs = np.linspace(1.0, 30.0, 40)
    va = np.array([float(eam.embed.interp(0, jnp.asarray(q))[0])
                   for q in qs])
    vb = np.array([float(got.embed.interp(0, jnp.asarray(q))[0])
                   for q in qs])
    assert np.max(np.abs(va - vb)) / np.max(np.abs(va)) < 2e-3


def test_setfl_fs_two_elements():
    eam = analytic_eam(dtype=jnp.float64)
    text = _make_setfl_text(eam, nelem=2, fs=True)
    got, meta = read_setfl(text, dtype=jnp.float64)
    assert meta["fs"] and meta["nelem"] == 2
    assert got.pair.ncols == 4 and got.rho.ncols == 4
    assert got.embed.ncols == 2
    # symmetric pair columns
    rs = np.linspace(2.0, 4.5, 20)
    np.testing.assert_allclose(_sample_radial(got.pair, 1, rs),
                               _sample_radial(got.pair, 2, rs),
                               rtol=1e-12)


def test_setfl_wrong_count_raises():
    eam = analytic_eam(dtype=jnp.float64)
    text = _make_setfl_text(eam, nelem=2)
    # chop some numbers off the tail
    toks = text.rsplit("\n", 40)[0]
    with pytest.raises(ValueError, match="expected"):
        read_setfl(toks, dtype=jnp.float64)


def test_funcfl_reads_and_pair_prefactor():
    nrho, nr, cutoff = 100, 200, 5.0
    drho, dr = 0.1, cutoff / (nr - 1)
    rs = dr * np.arange(nr)
    z = np.exp(-rs)                      # Z(r)
    rho = np.exp(-2 * rs)
    emb = -np.sqrt(drho * np.arange(nrho))
    text = ("funcfl test\n13 26.98 4.05 fcc\n"
            f"{nrho} {drho} {nr} {dr} {cutoff}\n"
            + "\n".join(f"{v:.8e}" for v in emb) + "\n"
            + "\n".join(f"{v:.8e}" for v in z) + "\n"
            + "\n".join(f"{v:.8e}" for v in rho))
    got, meta = read_funcfl(text, dtype=jnp.float64)
    r = 2.0
    v, _ = got.pair.interp(0, jnp.asarray(r * r, jnp.float64))
    want = 27.2 * 0.529 * np.exp(-r) ** 2 / r
    assert float(v) == pytest.approx(want, rel=2e-3)


def test_setfl_drives_simulation(tmp_path):
    """End-to-end: a core_potential_file=*.setfl parameter file runs."""
    from imd_tpu.simulation import Simulation

    eam = analytic_eam(dtype=jnp.float64)
    (tmp_path / "al.setfl").write_text(_make_setfl_text(eam))
    (tmp_path / "run.param").write_text(
        "coordname _fcc\n"
        "box_param 4 4 4\n"
        "box_unit 4.05\n"
        "core_potential_file al.setfl\n"
        "ensemble nve\ntimestep 0.05\nmaxsteps 5\nntypes 1\n"
        "starttemp 0.02\n"
        "masses 26.9815\n"
        f"outfiles {tmp_path}/out\n")
    sim = Simulation.from_param_file(str(tmp_path / "run.param"))
    state = sim.run()
    assert float(state.scene.overflow) == 0
