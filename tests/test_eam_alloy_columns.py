"""Multi-element EAM rho-column orientation (ADVICE r3 high finding).

The engines index the rho table SOURCE-first (density at a host atom of
type h from a source neighbor of type s reads col = s*ntypes+h —
forces.py rho_cols, forces_pallas/_win one-hot select).  These tests pin
that convention independently:

- eam.alloy parsing maps each element's single rho function to every
  HOST column of that SOURCE (a cross-species neighbor contributes ITS
  OWN density, not the host's);
- engine forces on a mixed cluster equal -grad of an independently
  written all-pairs energy over the parsed tables;
- an eam.alloy file and its expanded eam.fs equivalent give identical
  forces;
- read_eam transposes the reference's host-first el_density_file layout
  (col = it*ntypes+jt, imd_forces_nbl.c:468/551) into the engine layout.
"""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.models.potential import (_make_table, read_eam,
                                      transpose_pair_columns,
                                      write_pot_table)
from imd_tpu.models.setfl import read_setfl
from imd_tpu.ops.forces import compute_eam_forces
from imd_tpu.ops.geometry import Box, choose_grid
from imd_tpu.scene import make_scene
from imd_tpu.utils.generate import fcc

RC = 5.0


def _phi(a, b):
    return lambda r: a * (r - RC) ** 2 * np.exp(-b * r)


# distinct per-element density shapes (the bug collapsed them per host)
RHO_A = lambda r: 1.2 * (r - RC) ** 2 * np.exp(-0.8 * r)
RHO_B = lambda r: 0.6 * (r - RC) ** 2 * np.exp(-0.5 * r)
PHI = {(0, 0): _phi(0.4, 0.9), (0, 1): _phi(0.3, 1.1),
       (1, 0): _phi(0.3, 1.1), (1, 1): _phi(0.5, 1.0)}
EMB_A = lambda q: -1.3 * np.sqrt(np.maximum(q, 0.0))
EMB_B = lambda q: -0.9 * np.sqrt(np.maximum(q, 0.0)) + 0.02 * q


def _alloy_text(fs=False, nrho=500, nr=1200):
    drho = 40.0 / (nrho - 1)
    dr = RC / (nr - 1)
    rs = dr * np.arange(nr)
    qs = drho * np.arange(nrho)
    out = io.StringIO()
    out.write("two-element synthetic\nalloy columns test\n#\n")
    out.write("2 A B\n")
    out.write(f"{nrho} {drho:.10e} {nr} {dr:.10e} {RC:.10e}\n")
    for el, (emb, rho) in enumerate(((EMB_A, RHO_A), (EMB_B, RHO_B))):
        out.write(f"{13 + el} {26.98 + el} 4.05 fcc\n")
        out.write("\n".join(f"{v:.10e}" for v in emb(qs)) + "\n")
        # fs block el: one array per HOST type; for an alloy-equivalent
        # fs file every host column is the same source function
        for _ in range(2 if fs else 1):
            out.write("\n".join(f"{v:.10e}" for v in rho(rs)) + "\n")
    for i in range(2):
        for j in range(i + 1):
            out.write("\n".join(f"{v:.10e}" for v in PHI[(i, j)](rs) * rs)
                      + "\n")
    return out.getvalue()


def _sample(pt, col, rs):
    v, _ = pt.interp(jnp.asarray(col), jnp.asarray(rs * rs, jnp.float64))
    return np.asarray(v)


@pytest.mark.smoke
def test_alloy_rho_columns_are_source_indexed():
    eam, meta = read_setfl(_alloy_text(), dtype=jnp.float64)
    assert meta["nelem"] == 2 and not meta["fs"]
    rs = np.linspace(1.5, 4.5, 40)
    # engine col = s*nt+h: source decides the function, host doesn't
    for host in range(2):
        np.testing.assert_allclose(_sample(eam.rho, 0 * 2 + host, rs),
                                   RHO_A(rs), rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(_sample(eam.rho, 1 * 2 + host, rs),
                                   RHO_B(rs), rtol=2e-3, atol=1e-6)
    # and the two sources genuinely differ over the sampled range
    assert np.max(np.abs(RHO_A(rs) - RHO_B(rs))) > 0.05


def _mixed_scene(dtype=jnp.float64):
    pos, _, box_diag = fcc((3, 3, 3), 3.6)
    rng = np.random.default_rng(7)
    pos = pos + rng.normal(scale=0.08, size=pos.shape)
    typ = np.arange(len(pos)) % 2            # interleaved species
    box = Box.create([box_diag[0], 0, 0], [0, box_diag[1], 0],
                     [0, 0, box_diag[2]], dtype=dtype)
    grid = choose_grid(box, RC, skin=0.3, n_atoms=len(pos))
    scene = make_scene(grid, jnp.asarray(pos), type=jnp.asarray(typ),
                       mass=np.ones(len(pos)), dtype=dtype)
    return scene, pos, typ, np.asarray(box_diag)


def _indep_energy(posf, typ, eam, box_diag):
    """All-pairs EAM energy straight off the parsed tables (engine
    column convention), independent of every force engine."""
    nt = 2
    disp = posf[:, None, :] - posf[None, :, :]
    disp = disp - box_diag * jnp.round(disp / box_diag)
    r2 = jnp.sum(disp * disp, axis=-1)
    n = posf.shape[0]
    valid = (~jnp.eye(n, dtype=bool)) & (r2 < RC * RC)
    r2c = jnp.where(valid, r2, RC * RC * 0.98)
    ti, tj = typ[:, None], typ[None, :]
    phi = eam.pair.interp(ti * nt + tj, r2c)[0]
    epair = 0.5 * jnp.sum(jnp.where(valid, phi, 0.0))
    rho_ij = eam.rho.interp(tj * nt + ti, r2c)[0]   # density at i from j
    rho_i = jnp.sum(jnp.where(valid, rho_ij, 0.0), axis=1)
    emb = eam.embed.interp(typ, rho_i)[0]
    return epair + jnp.sum(emb)


def test_alloy_forces_match_autodiff_oracle():
    eam, _ = read_setfl(_alloy_text(), dtype=jnp.float64)
    scene, pos, typ, box_diag = _mixed_scene()
    res = compute_eam_forces(scene, eam, ntypes=2)
    ids = np.asarray(scene.id).reshape(-1)
    sel = ids >= 0
    order = np.argsort(ids[sel])
    F_eng = np.asarray(res.force).reshape(-1, 3)[sel][order]
    ep_eng = float(jnp.sum(res.epot))
    posf = jnp.asarray(np.asarray(scene.pos).reshape(-1, 3)[sel][order],
                       jnp.float64)
    typf = jnp.asarray(typ, jnp.int32)
    bd = jnp.asarray(box_diag, jnp.float64)
    e0 = float(_indep_energy(posf, typf, eam, bd))
    F_ind = -np.asarray(jax.grad(_indep_energy)(posf, typf, eam, bd))
    assert abs(ep_eng - e0) < 1e-8 * max(1.0, abs(e0))
    np.testing.assert_allclose(F_eng, F_ind, rtol=1e-7, atol=1e-9)
    # forces are nonzero and cross-species coupling matters: swapping the
    # two rho sources must change the forces (guards against any future
    # host-indexed regression silently passing symmetric setups)
    swapped = eam.__class__(pair=eam.pair,
                            rho=transpose_pair_columns(eam.rho, 2),
                            embed=eam.embed)
    res_sw = compute_eam_forces(scene, swapped, ntypes=2)
    F_sw = np.asarray(res_sw.force).reshape(-1, 3)[sel][order]
    assert np.max(np.abs(F_sw - F_eng)) > 1e-3


def test_alloy_equals_expanded_fs():
    ea, _ = read_setfl(_alloy_text(fs=False), dtype=jnp.float64)
    ef, meta = read_setfl(_alloy_text(fs=True), dtype=jnp.float64)
    assert meta["fs"]
    np.testing.assert_allclose(np.asarray(ea.rho.table),
                               np.asarray(ef.rho.table), rtol=1e-12)
    scene, _, _, _ = _mixed_scene()
    ra = compute_eam_forces(scene, ea, ntypes=2)
    rf = compute_eam_forces(scene, ef, ntypes=2)
    assert float(jnp.max(jnp.abs(ra.force - rf.force))) < 1e-12


def test_read_eam_transposes_reference_rho(tmp_path):
    """Reference el_density_file layout is host-first (col = it*nt+jt,
    imd_forces_nbl.c:468/551); read_eam must hand the engines
    source-first columns."""
    r2 = np.linspace(0.25, RC * RC, 600)
    step = r2[1] - r2[0]

    def col(f):
        r = np.sqrt(r2)
        return f(r)

    # host-first file order [h0s0, h0s1, h1s0, h1s1]
    host_first = [col(RHO_A), col(RHO_B), col(RHO_A), col(RHO_B)]
    rho_tab = _make_table(host_first, [r2[0]] * 4, [RC * RC] * 4,
                          [step] * 4, dtype=jnp.float64)
    pair_tab = _make_table([col(PHI[(0, 0)]), col(PHI[(0, 1)]),
                            col(PHI[(1, 0)]), col(PHI[(1, 1)])],
                           [r2[0]] * 4, [RC * RC] * 4, [step] * 4,
                           dtype=jnp.float64)
    qs = np.linspace(0.0, 40.0, 400)
    emb_tab = _make_table([EMB_A(qs), EMB_B(qs)], [0.0] * 2,
                          [qs[-1]] * 2, [qs[1] - qs[0]] * 2,
                          dtype=jnp.float64)
    for name, t in (("pair.pt", pair_tab), ("rho.pt", rho_tab),
                    ("emb.pt", emb_tab)):
        write_pot_table(t, str(tmp_path / name))
    eam = read_eam(str(tmp_path / "pair.pt"), str(tmp_path / "emb.pt"),
                   str(tmp_path / "rho.pt"), ntypes=2, dtype=jnp.float64)
    rs = np.linspace(1.5, 4.5, 30)
    # engine col s*nt+h must now be the SOURCE's function
    for host in range(2):
        np.testing.assert_allclose(_sample(eam.rho, 0 * 2 + host, rs),
                                   RHO_A(rs), rtol=1e-5)
        np.testing.assert_allclose(_sample(eam.rho, 1 * 2 + host, rs),
                                   RHO_B(rs), rtol=1e-5)


def test_setfl_missing_path_raises_oserror():
    with pytest.raises(OSError):
        read_setfl("/nonexistent/dir/al.setfl")


def test_funcfl_truncated_raises():
    from imd_tpu.models.setfl import read_funcfl
    nrho, nr = 50, 60
    body = "\n".join(f"{v:.6e}" for v in np.zeros(nrho + 2 * nr - 7))
    text = (f"t\n13 26.98 4.05 fcc\n{nrho} 0.1 {nr} 0.05 3.0\n" + body)
    with pytest.raises(ValueError, match="funcfl body"):
        read_funcfl(text)
