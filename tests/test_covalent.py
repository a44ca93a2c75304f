"""SW / Tersoff validation against published silicon cohesive data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu.models import covalent as cv
from imd_tpu.ops.geometry import Box
from imd_tpu.utils.generate import diamond

A_SI = 5.431


def _si(nc=2, a=A_SI):
    pos, typ, boxd = diamond((nc, nc, nc), a)
    box = Box.create([boxd[0], 0, 0], [0, boxd[1], 0], [0, 0, boxd[2]],
                     dtype=jnp.float64)
    return jnp.asarray(pos, jnp.float64), box


def test_sw_silicon_cohesive_energy():
    """SW is fit so diamond Si at a=5.431 A has E_coh = -4.3364 eV/atom
    (2 epsilon per atom by construction, PRB 31, 5262)."""
    pos, box = _si()
    n = pos.shape[0]
    e = float(cv.sw_energy(pos, box)) / n
    assert e == pytest.approx(-2.0 * 2.1683, rel=2e-3)
    # equilibrium: forces vanish on the perfect lattice
    F, _ = cv.covalent_forces(cv.sw_energy, pos, box)
    assert float(jnp.max(jnp.abs(F))) < 1e-8


def test_sw_equilibrium_lattice_constant():
    """Energy minimum sits at the published lattice constant."""
    es = []
    for a in (5.35, 5.431, 5.51):
        pos, box = _si(a=a)
        es.append(float(cv.sw_energy(pos, box)))
    assert es[1] < es[0] and es[1] < es[2]


def test_tersoff_silicon_cohesive_energy():
    """Tersoff T3: E_coh(diamond Si) = -4.63 eV/atom at a = 5.432 A."""
    pos, box = _si(a=5.432)
    n = pos.shape[0]
    e = float(cv.tersoff_energy(pos, box)) / n
    assert e == pytest.approx(-4.63, rel=5e-3)
    F, _ = cv.covalent_forces(cv.tersoff_energy, pos, box)
    assert float(jnp.max(jnp.abs(F))) < 1e-7


def test_sw_forces_match_finite_differences():
    pos, box = _si()
    pos = pos + 0.08 * jax.random.normal(jax.random.PRNGKey(0), pos.shape,
                                         jnp.float64)
    F, e = cv.covalent_forces(cv.sw_energy, pos, box)
    eps = 1e-6
    for idx in [(3, 0), (10, 2)]:
        pp = pos.at[idx].add(eps)
        pm = pos.at[idx].add(-eps)
        fd = -(cv.sw_energy(pp, box) - cv.sw_energy(pm, box)) / (2 * eps)
        assert float(F[idx]) == pytest.approx(float(fd), rel=1e-5)


def test_ttbp_angular_minimum_and_fd_forces():
    """TTBP: energy minimal at cos(theta) = -1/sp; FD force check."""
    import numpy as np
    from imd_tpu.models.covalent import TTBPParams, ttbp_energy

    P = TTBPParams(constant=5.0, sp=3.0, r_cut=3.5)
    d = 2.2

    def tri(theta):
        return jnp.asarray(
            [[0.0, 0, 0], [d, 0, 0],
             [d * np.cos(theta), d * np.sin(theta), 0.0]], jnp.float64)

    th0 = np.arccos(-1.0 / 3.0)           # 109.47 degrees
    e0 = float(ttbp_energy(tri(th0), P=P))
    for th in (th0 - 0.3, th0 + 0.3):
        assert float(ttbp_energy(tri(th), P=P)) > e0
    # FD forces
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 3.5, (6, 3)), jnp.float64)
    e, g = jax.value_and_grad(lambda x: ttbp_energy(x, P=P))(pos)
    h = 1e-6
    dlt = np.zeros(pos.shape)
    dlt[2, 0] = h
    fd = (float(ttbp_energy(pos + dlt, P=P))
          - float(ttbp_energy(pos - dlt, P=P))) / (2 * h)
    assert abs(fd - float(g[2, 0])) < 1e-7 * max(1.0, abs(fd))


def test_tersoffmod_silicon_cohesive_energy_and_fd_forces():
    """MOD-Si (Kumagai 2007): diamond at a=5.429 A, E_coh = -4.630
    eV/atom; autodiff forces match finite differences and vanish on the
    perfect lattice (do_forces2 under TERSOFFMOD,
    imd_forces_covalent.c:909-1237)."""
    pos, box = _si(a=5.429)
    n = pos.shape[0]
    e = float(cv.tersoffmod_energy(pos, box)) / n
    assert e == pytest.approx(-4.630, rel=2e-3)
    F0, _ = cv.covalent_forces(cv.tersoffmod_energy, pos, box)
    assert float(jnp.max(jnp.abs(F0))) < 1e-8
    # displaced config: FD check
    key = jax.random.PRNGKey(7)
    pos = pos + 0.08 * jax.random.normal(key, pos.shape, pos.dtype)
    F, _ = cv.covalent_forces(cv.tersoffmod_energy, pos, box)
    h = 1e-6
    for (i, c) in [(0, 0), (3, 1), (10, 2)]:
        dp = jnp.zeros_like(pos).at[i, c].set(h)
        fd = -(float(cv.tersoffmod_energy(pos + dp, box))
               - float(cv.tersoffmod_energy(pos - dp, box))) / (2 * h)
        assert fd == pytest.approx(float(F[i, c]), rel=1e-5, abs=1e-8)


def test_brenner_pair_table():
    """Brenner repulsive pair table: value A e^(-lam r) below r0, 0 above
    r_cut, continuous in between (pair_int_brenner)."""
    import numpy as np

    from imd_tpu.models.potential import brenner_table
    pt = brenner_table(1000.0, 3.0, 1.7, 2.0)
    for r, want in [(1.0, 1000.0 * np.exp(-3.0)),
                    (1.5, 1000.0 * np.exp(-4.5))]:
        v, _ = pt.interp(0, jnp.asarray([r * r]))
        assert float(v[0]) == pytest.approx(want, rel=1e-3)
    r = 1.99
    t = np.pi * (r - 1.7) / 0.3
    want = 0.5 * (1 + np.cos(t)) * 1000.0 * np.exp(-3.0 * r)
    v, _ = pt.interp(0, jnp.asarray([r * r]))
    assert float(v[0]) == pytest.approx(want, rel=5e-2, abs=1e-4)


def test_sw_param_file_driver(tmp_path):
    """Stillinger-Weber from a parameter file: stiweb_* tags select the
    autodiff all-pairs engine (the runtime analog of the reference's SW
    compile flag); NVE on a silicon diamond lattice conserves energy and
    the strain-derivative virial feeds a finite pressure column."""
    import jax.numpy as jnp

    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.simulation import Simulation

    out = str(tmp_path / "sw")
    cfg = SimConfig.from_params(parse_param_text(f"""
coordname   _dia
outfiles    {out}
box_param   2 2 2
box_unit    5.431
ntypes      1
masses      28.0855
ensemble    nve
timestep    0.02
maxsteps    60
starttemp   0.01
eng_int     20
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
"""))
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    assert sim.flat_inter is not None and sim.flat_inter[0] == "stiweb"
    sim.run()
    eng = [ln.split() for ln in
           open(out + ".eng").read().strip().splitlines()[1:]]
    epots = [float(r[1]) for r in eng]
    temps = [float(r[2]) for r in eng]
    etots = [e + 1.5 * t for e, t in zip(epots, temps)]
    # diamond Si SW cohesive energy ~ -4.336 eV/atom near equilibrium
    assert -4.6 < epots[0] < -4.0
    # NVE total energy conserved
    assert abs(etots[-1] - etots[0]) < 5e-6 * abs(etots[0])


def test_tersoff_param_file_driver(tmp_path):
    """Tersoff T3 from ters_* tags (runtime analog of the TERSOFF flag);
    the bare tag group without MOD-only tags selects the T3 form."""
    import jax.numpy as jnp

    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.simulation import Simulation

    out = str(tmp_path / "ters")
    cfg = SimConfig.from_params(parse_param_text(f"""
coordname   _dia
outfiles    {out}
box_param   2 2 2
box_unit    5.432
ntypes      1
masses      28.0855
ensemble    nve
timestep    0.02
maxsteps    40
starttemp   0.01
eng_int     20
pbc_dirs    1 1 1
seed        4
ters_r0     2.4
ters_r_cut  3.0
"""))
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    assert sim.flat_inter is not None and sim.flat_inter[0] == "tersoff"
    sim.run()
    eng = [ln.split() for ln in
           open(out + ".eng").read().strip().splitlines()[1:]]
    epots = [float(r[1]) for r in eng]
    temps = [float(r[2]) for r in eng]
    etots = [e + 1.5 * t for e, t in zip(epots, temps)]
    # Tersoff T3 silicon cohesive energy ~ -4.63 eV/atom
    assert -5.0 < epots[0] < -4.2
    assert abs(etots[-1] - etots[0]) < 5e-6 * abs(etots[0])


def test_ternbcc_angular_function_and_forces():
    """TERNBCC g(cos t) (imd_forces_covalent.c:578-593): branch values
    and continuity; sw_energy(ternbcc=True) forces are the exact
    gradient (the reference's dg is half the analytic derivative — a
    documented defect we do not copy)."""
    import numpy as np

    from imd_tpu.models.covalent import SWParams, _ternbcc_g, sw_energy
    from imd_tpu.ops.geometry import Box

    # branch-point continuity and the BCC angles as minima:
    # cos = -1 (180 deg), -1/3 (109.5), +1/3 (70.5) give g = 0
    for c, want in [(-1.0, 0.0), (-1.0 / 3.0, 0.0), (1.0 / 3.0, 0.0),
                    (0.0, 1.0 / 18.0), (-2.0 / 3.0, 1.0 / 18.0)]:
        assert abs(float(_ternbcc_g(jnp.asarray(c, jnp.float64))) -
                   want) < 1e-12
    for b in (-5.0 / 6.0, -0.5, -1.0 / 6.0, 1.0 / 6.0):
        lo = float(_ternbcc_g(jnp.asarray(b - 1e-9, jnp.float64)))
        hi = float(_ternbcc_g(jnp.asarray(b + 1e-9, jnp.float64)))
        assert abs(lo - hi) < 1e-7

    rng = np.random.default_rng(0)
    # small bcc cluster, jittered
    a = 3.0
    base = np.array([[i, j, k] for i in range(2) for j in range(2)
                     for k in range(2)], float) * a
    pos = np.concatenate([base, base + a / 2]) + rng.normal(0, 0.05,
                                                            (16, 3))
    box = Box.create([10 * a, 0, 0], [0, 10 * a, 0], [0, 0, 10 * a],
                     dtype=jnp.float64)
    P = SWParams()
    mask = jnp.ones(16, bool)

    def e(p, tern):
        return sw_energy(jnp.asarray(p, jnp.float64), box, mask, P,
                         ternbcc=tern)

    assert abs(float(e(pos, True)) - float(e(pos, False))) > 1e-3
    g = jax.grad(lambda p: e(p, True))(jnp.asarray(pos, jnp.float64))
    h = 1e-6
    for idx in [(0, 0), (9, 2)]:
        d = np.zeros_like(pos)
        d[idx] = h
        fd = (float(e(pos + d, True)) - float(e(pos - d, True))) / (2 * h)
        assert abs(fd - float(g[idx])) < 1e-6 * max(1.0, abs(fd))


def test_ternbcc_param_file_driver(tmp_path):
    """`ternbcc 1` + stiweb_* tags select the ternary-BCC angular term
    from a parameter file."""
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.simulation import Simulation

    out = str(tmp_path / "tb")
    cfg = SimConfig.from_params(parse_param_text(f"""
coordname   _bcc
outfiles    {out}
box_param   3 3 3
box_unit    3.0
ntypes      1
masses      28.0
ensemble    nve
timestep    0.02
maxsteps    20
starttemp   0.005
eng_int     10
pbc_dirs    1 1 1
seed        2
ternbcc     1
stiweb_a    7.049556277
stiweb_b    0.6022245584
stiweb_p    4.0
stiweb_q    0.0
stiweb_a1   1.8
stiweb_la   21.0
stiweb_ga   1.2
stiweb_de   2.1683
"""))
    sim = Simulation(cfg, workdir=str(tmp_path), dtype=jnp.float64)
    assert sim.flat_inter[0] == "stiweb-ternbcc"
    sim.run()
    eng = [ln.split() for ln in
           open(out + ".eng").read().strip().splitlines()[1:]]
    etots = [float(r[1]) + 1.5 * float(r[2]) for r in eng]
    assert abs(etots[-1] - etots[0]) < 1e-4 * max(abs(etots[0]), 1e-3)


def test_xt_ttbp_angular_variant():
    """XT (imd_forces_covalent.c:265): TTBP's angular term becomes the
    piecewise ternary-BCC g(cos t); autodiff forces stay exact."""
    import numpy as np

    from imd_tpu.models.covalent import TTBPParams, ttbp_energy

    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 5.0, (10, 3))
    for _ in range(30):
        d = pos[None] - pos[:, None]
        r = np.linalg.norm(d, axis=-1) + np.eye(10) * 9
        i, j = divmod(int(np.argmin(r)), 10)
        if r[i, j] > 1.5:
            break
        pos[j] += 0.3 * (pos[j] - pos[i]) / r[i, j]
    P = TTBPParams()
    mask = jnp.ones(10, bool)

    def e(p, xtf):
        return ttbp_energy(jnp.asarray(p, jnp.float64), None, mask, P,
                           xt=xtf)

    assert abs(float(e(pos, True)) - float(e(pos, False))) > 1e-6
    g = jax.grad(lambda p: e(p, True))(jnp.asarray(pos, jnp.float64))
    h = 1e-6
    for idx in [(0, 1), (7, 0)]:
        d = np.zeros_like(pos)
        d[idx] = h
        fd = (float(e(pos + d, True)) - float(e(pos - d, True))) / (2 * h)
        assert abs(fd - float(g[idx])) < 1e-6 * max(1.0, abs(fd))
