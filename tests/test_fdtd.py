"""FDTD Maxwell solver tests.

Invariants: PML reflection floor, pulse propagation at c, absorbed
fraction agrees with the TMM Helmholtz solution for the same
Drude-Lorentz slab (the reference's MATLAB cross-checks, fdtd:18).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu import units
from imd_tpu.models import fdtd as F

C0 = units.C_SI


def _params(nx=1200, dx_a=100.0, i0=1e16, sigma_t=20e-15, t0=60e-15,
            lambda_m=800e-9, bw=10, srcx_cells=25):
    from imd_tpu.config import FDTDConfig
    from imd_tpu.models.ttm import TTMParams
    tp = TTMParams(nx=nx, fd_h_x=dx_a, fd_vol=1.0, neigh_vol=1.0,
                   atomic_mass=26.98, atomic_z=13.0, fd_min_atoms=1)
    cfg = FDTDConfig(enabled=True, Sc=1.0, pml=bw,
                     srcx=srcx_cells * dx_a, lambda_m=lambda_m, I0=i0,
                     t0_s=t0, sigma_t_s=sigma_t)
    return F.make_fdtd_params(cfg, tp, jnp.float64)


def _static_dl(nx):
    return jnp.stack([jnp.full((nx,), v, jnp.float64) for v in F.DL_STATIC])


def test_vacuum_pulse_absorbed_by_pml():
    """A pulse launched into pure vacuum must end up fully in the PMLs."""
    p = _params(nx=800, dx_a=100.0, sigma_t=10e-15, t0=30e-15)
    state = F.make_state(p, jnp.float64)
    active = jnp.zeros((p.nx,), bool)
    dl = _static_dl(p.nx)
    n_cross = int(2.5 * p.nx * p.fd_dx_m / C0 / p.dt_s) + int(
        120e-15 / p.dt_s)

    @jax.jit
    def run(s, t0i, n):
        return F.run_substeps(s, p, dl, active, t0i, n)

    # peak field while the pulse is in flight
    n_half = int((p.t0_s + 20e-15) / p.dt_s)
    state = run(state, 0.0, n_half)
    peak = float(jnp.max(jnp.abs(state.ezx)))
    assert peak > 0.3 * p.e0          # source actually injects ~E0
    state = run(state, n_half * p.dt_s, n_cross)
    residual = float(jnp.max(jnp.abs(state.ezx)))
    # a 10-cell PML is only ~lambda/8 deep here, so the discrete
    # reflection floor is ~1e-4 in amplitude, not the 1e-12 continuum
    # design value; the reference runs equally thin PMLs
    assert residual < 1e-3 * peak


def test_pulse_travels_forward_at_c():
    """TF/SF: the pulse goes +x only, at speed c."""
    p = _params(nx=1500, dx_a=100.0, sigma_t=8e-15, t0=25e-15)
    state = F.make_state(p, jnp.float64)
    active = jnp.zeros((p.nx,), bool)
    dl = _static_dl(p.nx)
    t_run = 55e-15     # peak travels (55-25)fs * c = 900 cells from srcx
    n = int(t_run / p.dt_s)
    state = jax.jit(F.run_substeps, static_argnames="n_steps")(
        state, p, dl, active, 0.0, n)
    e = np.abs(np.asarray(state.ezx))
    peak_cell = int(np.argmax(e))
    expect = p.srcx + (t_run - p.t0_s) * C0 / p.fd_dx_m
    assert abs(peak_cell - expect) < 12   # within a few cells
    # essentially nothing behind the source (TF/SF suppression ~1%)
    behind = e[: p.srcx - 5].max()
    assert behind < 0.05 * e.max()


def test_absorption_matches_tmm():
    """Total Joule heating == TMM absorption for the same DL slab."""
    lam = 800e-9
    dx_a = 100.0                      # 10 nm, N_lambda = 80
    nx = 2200
    sigma_t = 15e-15
    i0 = 1e16
    p = _params(nx=nx, dx_a=dx_a, i0=i0, sigma_t=sigma_t, t0=45e-15,
                lambda_m=lam)
    slab0 = 1000
    active = (jnp.arange(nx) >= slab0)
    dl = _static_dl(nx)
    state = F.make_state(p, jnp.float64)

    # run until the pulse is gone and fields decayed
    t_end = 160e-15
    n = int(t_end / p.dt_s)
    dt = p.dt_s

    @jax.jit
    def run(s):
        def body(i, carry):
            s, eabs = carry
            s = F.step_1d(s, p, dl, active, i * dt)
            # qe (source) is in IMD units; convert back to W/m^3
            eabs = eabs + jnp.sum(s.source) / F.WM3_TO_IMD * (
                p.fd_dx_m * dt)
            return (s, eabs)
        return jax.lax.fori_loop(0, n, body, (s, jnp.float64(0.0)))

    state, eabs = run(state)           # J/m^2 absorbed
    fluence = i0 * sigma_t * math.sqrt(math.pi)   # J/m^2 incident

    # TMM reference for the same static Drude-Lorentz permittivity
    from imd_tpu.models import tmm as T
    eps_inf, g_p, wpl_l, w0_l, g_l, wpl_d = F.DL_STATIC
    w = 2 * math.pi * C0 / lam
    eps = (eps_inf - wpl_d**2 / (w**2 + 1j * g_p * w)
           + wpl_l**2 / (w0_l**2 - w**2 - 1j * g_l * w))
    prof = np.ones(nx, complex)
    prof[slab0:] = eps
    on = np.zeros(nx, bool)
    on[slab0:] = True
    res = T.solve_layers(jnp.float64(2 * math.pi / lam * 1e-10),
                         jnp.asarray(prof), jnp.asarray(on),
                         jnp.float64(dx_a), jnp.float64(i0),
                         jnp.float64(25.0))
    a_tmm = float(res["absorb"])
    a_fdtd = float(eabs) / fluence
    assert 0.01 < a_tmm < 0.99
    assert a_fdtd == pytest.approx(a_tmm, rel=0.08)


def test_2d_vacuum_pml_and_slab_heating():
    """2-D TMZ: beam propagates, PML absorbs, a Drude slab picks up qe."""
    from imd_tpu.config import FDTDConfig
    from imd_tpu.models.ttm import TTMParams
    nx, ny = 300, 120
    dx_a = 100.0
    tp = TTMParams(nx=nx, fd_h_x=dx_a, fd_vol=1.0, neigh_vol=1.0,
                   atomic_mass=26.98, atomic_z=13.0, fd_min_atoms=1)
    cfg = FDTDConfig(enabled=True, mode=2, Sc=0.7, pml=8,
                     srcx=20 * dx_a, srcw=15 * dx_a, lambda_m=800e-9,
                     I0=1e16, t0_s=25e-15, sigma_t_s=8e-15)
    p = F.make_fdtd_params_2d(cfg, tp, ny=ny, fd_dy_a=dx_a,
                              dtype=jnp.float64)
    state = F.make_state_2d(p, jnp.float64)
    active = np.zeros((nx, ny), bool)
    active[200:, :] = True           # slab in the right third
    active = jnp.asarray(active)
    dl = jnp.stack([jnp.full((nx, ny), v, jnp.float64)
                    for v in F.DL_STATIC])
    dt = p.dt_s

    @jax.jit
    def run(s, n, t0i):
        def body(i, carry):
            s, eabs = carry
            s = F.step_2d(s, p, dl, active, t0i + i * dt)
            return s, eabs + jnp.sum(s.source)
        return jax.lax.fori_loop(0, n, body, (s, jnp.float64(0.0)))

    n1 = int(40e-15 / dt)
    state, eabs1 = run(state, n1, 0.0)
    peak = float(jnp.max(jnp.abs(state.ezx + state.ezy)))
    assert peak > 0.05 * p.e0
    assert np.isfinite(peak)
    # pulse reaches the slab and deposits energy
    n2 = int(120e-15 / dt)
    state, eabs2 = run(state, n2, n1 * dt)
    assert float(eabs2) > 0.0
    # after the pulse, fields decay (PML + absorber)
    resid = float(jnp.max(jnp.abs(state.ezx + state.ezy)))
    assert resid < 0.05 * peak


def test_coupled_ttm_fdtd_heats_electrons():
    import numpy as np
    from imd_tpu.models import ttm as ttm_mod
    from imd_tpu.models.eos import FEGEos
    from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, with_capacity
    from imd_tpu.scene import make_scene
    from imd_tpu.utils.generate import fcc
    from imd_tpu.config import TTMConfig, FDTDConfig
    from imd_tpu import integrate

    pos, typ, diag = fcc((8, 4, 4), 4.05)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    gg = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    gg = with_capacity(gg, measured_capacity(gg, pos))
    scene = make_scene(gg, pos, mass=np.full(len(pos), 26.9815),
                       dtype=jnp.float64)
    scene = integrate.maxwell(scene, 0.026, jax.random.PRNGKey(0))

    tcfg = TTMConfig(enabled=True, fd_nx=64, fd_min_atoms=4)
    tp = ttm_mod.make_params(tcfg, box, 5.0, dtype=jnp.float64)
    grid = ttm_mod.make_grid(tp, dtype=jnp.float64)
    eos = FEGEos()
    fcfg = FDTDConfig(enabled=True, Sc=1.0, pml=5, srcx=16 * tp.fd_h_x,
                      lambda_m=800e-9, I0=5e16, t0_s=40e-15,
                      sigma_t_s=20e-15)
    fp = F.make_fdtd_params(fcfg, tp, jnp.float64)
    fstate = F.make_state(fp, jnp.float64)

    nn = jnp.full(scene.pos.shape[:-1], 12, jnp.int32)
    fdi = jnp.full(scene.pos.shape[:-1], -1, jnp.int32)
    grid, fdi, fstate = ttm_mod.calc_ttm_fdtd(
        grid, fstate, scene, tp, eos, fp, nn, fdi,
        dt=jnp.float64(1.0), t=jnp.float64(-1e6), first_step=True)
    te0 = float(jnp.max(grid.temp))
    assert te0 < 0.1
    t_peak = fp.t0_s / units.IMD_TIME_S
    grid, fdi, fstate = ttm_mod.calc_ttm_fdtd(
        grid, fstate, scene, tp, eos, fp, nn, fdi,
        dt=jnp.float64(1.0), t=jnp.float64(t_peak))
    assert np.isfinite(float(jnp.max(grid.temp)))
    assert float(jnp.max(grid.temp)) > te0


def test_coupled_ttm3d_fdtd2d_heats_electrons():
    """The reference's experimental FDTD2D mode: 2-D Maxwell on a
    thin-slab 3-D TTM grid (imd_fdtd.c:14 requires global_fd_dim.z == 1).
    The coupled schedule must deposit laser energy into T_e."""
    import numpy as np
    from imd_tpu import integrate
    from imd_tpu.config import FDTDConfig, TTMConfig
    from imd_tpu.models import ttm3d as ttm_mod
    from imd_tpu.models.eos import FEGEos
    from imd_tpu.ops.geometry import (Box, choose_grid, measured_capacity,
                                      with_capacity)
    from imd_tpu.scene import make_scene
    from imd_tpu.utils.generate import fcc

    pos, typ, diag = fcc((12, 8, 2), 4.05)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    gg = choose_grid(box, 5.0, skin=0.5, n_atoms=len(pos))
    gg = with_capacity(gg, measured_capacity(gg, pos))
    scene = make_scene(gg, pos, mass=np.full(len(pos), 26.9815),
                       dtype=jnp.float64)
    scene = integrate.maxwell(scene, 0.026, jax.random.PRNGKey(0))

    tcfg = TTMConfig(enabled=True, fd_nx=48, fd_ny=16, fd_nz=1,
                     fd_min_atoms=1)
    tp = ttm_mod.make_params(tcfg, box, 5.0, dtype=jnp.float64)
    assert tp.dims == (48, 16, 1)
    grid = ttm_mod.make_grid(tp, dtype=jnp.float64)
    eos = FEGEos()
    # PML bw=5 leaves a populated transverse band (ny=16 > 2*bw+1);
    # srcx clamps to bw+10=15 < nx
    fcfg = FDTDConfig(enabled=True, mode=2, Sc=0.7, pml=5,
                      srcx=15 * tp.fd_h[0], srcw=4 * tp.fd_h[1],
                      lambda_m=800e-9, I0=1e17, t0_s=6e-15,
                      sigma_t_s=3e-15)
    fp = F.make_fdtd_params_2d_from3d(fcfg, tp, jnp.float64)
    fstate = F.make_state_2d(fp, jnp.float64)

    nn = jnp.full(scene.pos.shape[:-1], 12, jnp.int32)
    fdi0 = jnp.full(scene.pos.shape[:-1], -1, jnp.int32)

    first = jax.jit(lambda g, fs, fdi, t: ttm_mod.calc_ttm_fdtd(
        g, fs, scene, tp, eos, fp, nn, fdi, 0.1, t, first_step=True))
    step = jax.jit(lambda g, fs, fdi, t: ttm_mod.calc_ttm_fdtd(
        g, fs, scene, tp, eos, fp, nn, fdi, 0.1, t, first_step=False))

    # laser far in the past: no heating, but the full schedule runs
    grid, fdi, fstate = first(grid, fstate, fdi0, jnp.float64(-1e6))
    te0 = float(jnp.max(grid.temp))
    assert te0 < 0.1
    t_peak = fp.t0_s / units.IMD_TIME_S
    grid, fdi, fstate = step(grid, fstate, fdi, jnp.float64(t_peak))
    assert np.isfinite(float(jnp.max(grid.temp)))
    assert float(jnp.max(grid.temp)) > te0
    assert float(grid.eabs) > 0.0
