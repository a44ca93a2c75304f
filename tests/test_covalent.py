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


def _full(nt, v):
    return np.full((nt, nt), float(v))


def _tersoff_multi_uniform(nt):
    d = cv.TersoffParams()
    return cv.TersoffMultiParams(
        r0=_full(nt, d.R - d.D), r_cut=_full(nt, d.R + d.D),
        A=_full(nt, d.A), B=_full(nt, d.B), la=_full(nt, d.lam1),
        mu=_full(nt, d.lam2), om=_full(nt, 1.0), ga=_full(nt, d.beta),
        n=_full(nt, d.n), c2=_full(nt, d.c * d.c),
        d2=_full(nt, d.d * d.d), h=_full(nt, d.h))


def test_tersoff_multi_reduces_to_single():
    """With uniform pair matrices the multi-species engine reproduces
    the single-species T3 energy bit-for-bit (same functional form;
    the half-cosine r0..r_cut window equals the sin form at R +/- D)."""
    pos, box = _si(a=5.432)
    n = pos.shape[0]
    types = jnp.asarray(np.arange(n) % 2)
    e_multi = float(cv.tersoff_multi_energy(
        pos, types, box, P=_tersoff_multi_uniform(2)))
    e_single = float(cv.tersoff_energy(pos, box))
    assert e_multi == pytest.approx(e_single, rel=1e-12, abs=1e-10)


def test_tersoff_multi_fd_forces_and_pair_asymmetry():
    """TERSOFF2-style per-pair parameters: autodiff forces match finite
    differences, and perturbing only the (0,1) bond channel leaves a
    pure type-0 system's energy unchanged."""
    pos, box = _si()
    n = pos.shape[0]
    rng = np.random.default_rng(3)
    pos = pos + jnp.asarray(0.06 * rng.standard_normal((n, 3)),
                            jnp.float64)
    types = jnp.asarray(rng.integers(0, 2, n))
    P = _tersoff_multi_uniform(2)
    # per-pair asymmetry: soften the 0-1 bond, shift its angular h
    B = P.B.copy(); B[0, 1] = B[1, 0] = 0.8 * B[0, 1]
    h = P.h.copy(); h[0, 1] = h[1, 0] = -0.4
    P = P._replace(B=B, h=h)

    def efn(p):
        return cv.tersoff_multi_energy(p, types, box, P=P)

    F = -jax.grad(efn)(pos)
    e0 = efn(pos)
    eps = 1e-6
    for idx in [(1, 0), (7, 2), (12, 1)]:
        pp = pos.at[idx].add(eps)
        pm = pos.at[idx].add(-eps)
        f_fd = -(efn(pp) - efn(pm)) / (2 * eps)
        assert float(F[idx]) == pytest.approx(float(f_fd), rel=1e-5,
                                              abs=1e-8)
    # pure type-0 system never touches the perturbed 0-1/1-1 channels
    t0 = jnp.zeros(n, jnp.int32)
    e_pert = float(cv.tersoff_multi_energy(pos, t0, box, P=P))
    e_base = float(cv.tersoff_multi_energy(pos, t0, box,
                                           P=_tersoff_multi_uniform(2)))
    assert e_pert == pytest.approx(e_base, rel=1e-14)
    assert float(e0) != pytest.approx(e_base, rel=1e-6)


def test_tersoffmod_multi_reduces_and_fd():
    """Multi-species MOD-Tersoff: uniform matrices reproduce the
    single-species Kumagai energy; forces match finite differences
    with a per-pair integer-beta mix (odd exponent sign preserved)."""
    d = cv.TersoffModParams()
    nt = 2

    def mk(beta01=1):
        beta = np.ones((nt, nt), np.int32)
        beta[0, 1] = beta[1, 0] = beta01
        return cv.TersoffModMultiParams(
            r0=_full(nt, d.r0), r_cut=_full(nt, d.r_cut),
            A=_full(nt, d.A), B=_full(nt, d.B), la=_full(nt, d.la),
            mu=_full(nt, d.mu), eta=_full(nt, d.eta),
            delta=_full(nt, d.delta), alpha=_full(nt, d.alpha),
            beta=beta, c1=_full(nt, d.c1), c2=_full(nt, d.c2),
            c3=_full(nt, d.c3), c4=_full(nt, d.c4),
            c5=_full(nt, d.c5), h=_full(nt, d.h))

    pos, box = _si(a=5.429)
    n = pos.shape[0]
    types = jnp.asarray(np.arange(n) % 2)
    e_multi = float(cv.tersoffmod_multi_energy(pos, types, box,
                                               P=mk(1)))
    e_single = float(cv.tersoffmod_energy(pos, box))
    assert e_multi == pytest.approx(e_single, rel=1e-12)

    rng = np.random.default_rng(5)
    pos = pos + jnp.asarray(0.05 * rng.standard_normal((n, 3)),
                            jnp.float64)
    P = mk(beta01=3)   # cubic exponent on the 0-1 channel

    def efn(p):
        return cv.tersoffmod_multi_energy(p, types, box, P=P)

    F = -jax.grad(efn)(pos)
    e = efn(pos)
    assert np.isfinite(float(e))
    eps = 1e-6
    for idx in [(0, 1), (9, 0)]:
        pp = pos.at[idx].add(eps)
        pm = pos.at[idx].add(-eps)
        f_fd = -(efn(pp) - efn(pm)) / (2 * eps)
        assert float(F[idx]) == pytest.approx(float(f_fd), rel=1e-5,
                                              abs=1e-8)


def test_tersoff2_param_file_dispatch(tmp_path):
    """ters_* tags with ntypes 2 route through the multi-species engine;
    `interaction tersoff2` forces the per-pair angular layout
    (imd_param.c:5094-5108: nvalues = ntypepairs for TERSOFF2)."""
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.models.interactions import select_flat_interaction

    base = """
coordname   _dia
ntypes      2
masses      28.0855 28.0855
ensemble    nve
timestep    0.02
maxsteps    1
ters_r0     2.4 2.4 2.4
ters_r_cut  3.0 3.0 3.0
"""
    cfg = SimConfig.from_params(parse_param_text(base))
    got = select_flat_interaction(cfg, jnp.float64)
    assert got is not None and got[0] == "tersoff"
    assert got[1] == pytest.approx(3.0)

    # 3 = ntypepairs angular values -> inferred pair layout even
    # without the override; explicit tersoff2 gives the same
    cfg2 = SimConfig.from_params(parse_param_text(
        base + "ters_h -0.6 -0.4 -0.6\ninteraction tersoff2\n"))
    name2, _, efn2, _ = select_flat_interaction(cfg2, jnp.float64)
    assert name2 == "tersoff2"
    pos, box = _si()
    n = pos.shape[0]
    types = jnp.asarray(np.arange(n) % 2)
    mask = jnp.ones(n, bool)
    e2 = float(efn2(pos, types, mask, box))
    cfg1 = SimConfig.from_params(parse_param_text(
        base + "ters_h -0.6 -0.6\n"))
    _, _, efn1, _ = select_flat_interaction(cfg1, jnp.float64)
    e1 = float(efn1(pos, types, mask, box))
    # the pair-indexed h on the 0-1 bond changes the mixed-bond energy
    assert e1 != pytest.approx(e2, rel=1e-9)
    assert np.isfinite(e1) and np.isfinite(e2)
