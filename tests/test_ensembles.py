"""Ensemble/integrator tests: Langevin, Andersen, NPT, SLLOD, FIRE, CG."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu import integrate, relax
from imd_tpu.models.potential import lj_table
from imd_tpu.ops.forces import compute_pair_forces
from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, with_capacity
from imd_tpu.scene import make_scene
from imd_tpu.utils.generate import fcc


# IMD LJ convention: V = eps((sig/r)^12 - 2(sig/r)^6), minimum at r=sig,
# so the stress-free fcc lattice constant is ~1.38 sig (NOT 2^(1/6) sqrt2)
def _crystal(nc=(4, 4, 4), alat=1.38, jitter=0.0, seed=0):
    pos, typ, diag = fcc(nc, alat)
    if jitter:
        pos = pos + np.random.RandomState(seed).uniform(
            -jitter, jitter, pos.shape)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    grid = choose_grid(box, 2.5, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    return make_scene(grid, pos, dtype=jnp.float64)


POT = lj_table(1.0, 1.0, 2.5, dtype=jnp.float64)


def _force_fn(s):
    return compute_pair_forces(s, POT)


def test_langevin_thermalizes():
    scene = _crystal()
    n = float(scene.n_atoms())
    params = integrate.IntegratorParams(
        timestep=jnp.float64(0.004), temperature=jnp.float64(0.05),
        viscous_friction=jnp.float64(0.02))
    key = jax.random.PRNGKey(0)

    @jax.jit
    def step(s, k):
        k1, k2 = jax.random.split(k)
        res = _force_fn(s)
        s = s.replace(force=res.force, epot=res.epot)
        s, stats = integrate.langevin(s, params, k2)
        return s, stats, k1

    for i in range(600):
        scene, stats, key = step(scene, key)
    t = 2.0 * stats.tot_kin_energy / (3.0 * n)
    assert 0.02 < float(t) < 0.09    # heated from 0 toward T=0.05


def test_npt_iso_relaxes_pressure():
    scene = _crystal()
    n = float(scene.n_atoms())
    params = integrate.IntegratorParams(
        timestep=jnp.float64(0.004), temperature=jnp.float64(0.02),
        isq_tau_eta=jnp.float64(1.0 / 50.0 ** 2))
    scene = integrate.maxwell(scene, 0.02, jax.random.PRNGKey(1))
    st = integrate.NPTState(eta=jnp.float64(0.0), xi=jnp.float64(0.0),
                            ekin_old=jnp.float64(3.0 * n * 0.02))
    isq_tau_xi = jnp.float64(1.0 / 100.0 ** 2)
    p_ext = jnp.float64(0.0)
    v0 = float(scene.grid.box.volume)

    @jax.jit
    def step(s, st):
        res = _force_fn(s)
        s = s.replace(force=res.force, epot=res.epot)
        return integrate.npt_iso(s, params, st, 3.0 * n, res.virial,
                                 isq_tau_xi, p_ext)

    vols, press = [], []
    for i in range(400):
        scene, stats, st = step(scene, st)
        vols.append(float(scene.grid.box.volume))
    assert np.isfinite(vols[-1])
    # the box actually moved and stayed sane
    assert 0.5 * v0 < vols[-1] < 2.0 * v0
    assert abs(vols[-1] - v0) > 1e-6 * v0
    # wrapped positions still inside the (rescaled) box
    frac = np.asarray(scene.grid.box.to_frac(scene.pos.reshape(-1, 3)))
    mask = np.asarray(scene.mask).reshape(-1)
    assert frac[mask].min() > -0.6 and frac[mask].max() < 1.6


def test_sllod_shear_profile():
    scene = _crystal((4, 4, 4))
    n = float(scene.n_atoms())
    params = integrate.IntegratorParams(
        timestep=jnp.float64(0.002), temperature=jnp.float64(0.02),
        isq_tau_eta=jnp.float64(1.0 / 50.0 ** 2))
    scene = integrate.maxwell(scene, 0.02, jax.random.PRNGKey(2))
    eta = jnp.float64(0.0)
    # dv_x/dy via the reference's x += shear_rate.z * y convention
    sr = jnp.asarray([0.0, 0.0, 1e-4], jnp.float64)
    sr2 = jnp.zeros(3, jnp.float64)

    @jax.jit
    def step(s, eta):
        res = _force_fn(s)
        s = s.replace(force=res.force, epot=res.epot)
        return integrate.sllod(s, params, 3.0 * n, eta, sr, sr2)

    x0 = np.asarray(scene.pos[..., 0]).copy()
    for i in range(100):
        scene, stats, eta = step(scene, eta)
    dx = np.asarray(scene.pos[..., 0]) - x0
    y = np.asarray(scene.pos[..., 1])
    m = np.asarray(scene.mask)
    # top half drifted +x more than bottom half
    ymid = np.median(y[m])
    drift_hi = dx[m & (y > ymid)].mean()
    drift_lo = dx[m & (y < ymid)].mean()
    assert drift_hi > drift_lo


def test_fire_relaxes_perturbed_crystal():
    scene = _crystal(jitter=0.02)
    n = float(scene.n_atoms())
    cfg = relax.FireConfig(max_timestep=0.01)
    st = relax.fire_init(jnp.float64(0.004), cfg)
    params = integrate.IntegratorParams(timestep=jnp.float64(0.004))

    e0 = float(jnp.sum(_force_fn(scene).epot))
    step = jax.jit(lambda s, st: relax.fire_step(s, st, cfg, _force_fn,
                                                 params, 3.0 * n))
    for i in range(300):
        scene, stats, st = step(scene, st)
    e1 = float(jnp.sum(_force_fn(scene).epot))
    assert e1 < e0 - 0.5                 # went downhill substantially
    assert float(stats.fnorm) / n < 1e-6  # fully converged


def test_cg_relaxes_perturbed_crystal():
    scene = _crystal(jitter=0.05, seed=3)
    e0 = float(jnp.sum(_force_fn(scene).epot))
    scene2, epots, fnorm = jax.jit(
        lambda s: relax.cg_relax(s, _force_fn, 80))(scene)
    e1 = float(jnp.sum(scene2.epot))
    assert e1 < e0 - 0.5
    n = float(scene.n_atoms())
    assert float(fnorm) / n < 1e-2
    # monotone-ish decrease (allow tiny line-search overshoots)
    ep = np.asarray(epots)
    assert ep[-1] < ep[0]


def test_shock_init_and_mirrors():
    """SHOCK: drift superposition and reflecting pistons."""
    import numpy as np
    from imd_tpu.integrate import shock_init, shock_mirrors
    from imd_tpu.ops.geometry import Box, choose_grid
    from imd_tpu.scene import make_scene
    from imd_tpu.utils.generate import fcc

    pos, _, diag = fcc((4, 4, 4), 1.5874)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    grid = choose_grid(box, 2.5, skin=0.3, n_atoms=len(pos))
    scene = make_scene(grid, pos, dtype=jnp.float64)
    # mode 2: two halves approach: net momentum ~ 0, nonzero per half
    s2 = shock_init(scene, 2, 0.5)
    px = np.asarray(s2.mom[..., 0])[np.asarray(s2.mask)]
    xs = np.asarray(s2.pos[..., 0])[np.asarray(s2.mask)]
    assert (px[xs < float(diag[0]) / 2] > 0).all()
    assert (px[xs >= float(diag[0]) / 2] < 0).all()
    # mode 4 mirrors: an atom pushed past the left moving piston bounces
    s = scene.replace(mom=scene.mom.at[..., 0].add(-5.0 * scene.fmask()))
    s = s.replace(pos=s.pos.at[..., 0].add(-0.9 * s.fmask()))
    sm = shock_mirrors(s, 4, jnp.asarray(10.0), jnp.asarray(0.01),
                       shock_speed_l=1.0, shock_speed_r=1.0)
    xs2 = np.asarray(sm.pos[..., 0])[np.asarray(sm.mask)]
    assert xs2.min() >= 0.1 - 1e-9    # nothing left of the piston plane
    px2 = np.asarray(sm.mom[..., 0])[np.asarray(sm.mask)]
    assert (px2[xs2 < 0.5] > 0).all()  # bounced forward with piston boost


def test_clone_sync_one_based_ids_and_missing_leader():
    """clone_sync pairs stacks by id relative to the smallest id (1-based
    checkpoint numbering must behave like 0-based), and a group without
    an alive leader keeps its own force/momentum instead of being zeroed
    (imd_integrate.c:118-132)."""
    scene = _crystal()
    key = jax.random.PRNGKey(3)
    kf, km = jax.random.split(key)
    scene = scene.replace(
        force=jax.random.normal(kf, scene.pos.shape, scene.pos.dtype),
        mom=jax.random.normal(km, scene.pos.shape, scene.pos.dtype),
        id=jnp.where(scene.mask, scene.id + 1, scene.id))  # 1-based

    ids_h = np.asarray(scene.id)
    alive = np.asarray(scene.mask)
    base = int(ids_h[alive].min())
    assert base == 1
    ngroups = (int(ids_h[alive].max()) - base) // 2 + 1

    out = integrate.clone_sync(scene, 2, ngroups, id_base=base)
    of = np.asarray(out.force)[alive]
    om = np.asarray(out.mom)[alive]
    ids = ids_h[alive] - base
    order = np.argsort(ids)
    of, om = of[order], om[order]
    # every clone matches its leader exactly
    np.testing.assert_array_equal(of[1::2], of[0::2])
    np.testing.assert_array_equal(om[1::2], om[0::2])
    # leaders kept their own values
    f0 = np.asarray(scene.force)[alive][order]
    np.testing.assert_array_equal(of[0::2], f0[0::2])

    # kill one leader (type -1 = dead slot): its partner must keep its
    # own force, not get zeros
    lead_id = base  # group 0's leader
    dead = scene.replace(
        type=jnp.where(scene.id == lead_id, -1, scene.type))
    out2 = integrate.clone_sync(dead, 2, ngroups, id_base=base)
    a2 = np.asarray(dead.mask)
    sel = np.asarray(dead.id)[a2] == base + 1   # the orphaned clone
    np.testing.assert_array_equal(
        np.asarray(out2.force)[a2][sel],
        np.asarray(dead.force)[a2][sel])
    assert np.abs(np.asarray(out2.force)[a2][sel]).max() > 0
