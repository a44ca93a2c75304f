"""Stadium damping, socket steering, graceful stop, native IO."""

import os
import socket
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imd_tpu import integrate
from imd_tpu.models.potential import lj_table
from imd_tpu.ops.forces import compute_pair_forces
from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, with_capacity
from imd_tpu.scene import make_scene
from imd_tpu.utils.generate import fcc


def test_stadium_damp_cools_rim_keeps_core():
    pos, typ, diag = fcc((6, 6, 6), 1.38)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    grid = choose_grid(box, 2.5, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    scene = make_scene(grid, pos, dtype=jnp.float64)
    scene = integrate.maxwell(scene, 0.1, jax.random.PRNGKey(0))
    pot = lj_table(1.0, 1.0, 2.5, dtype=jnp.float64)
    params = integrate.IntegratorParams(timestep=jnp.float64(0.004))
    c = [float(d) / 2 for d in diag]
    stad = (diag[0] / 4, diag[1] / 4, diag[2] / 4)    # free core
    stad2 = (diag[0] / 2, diag[1] / 2, diag[2] / 2)   # damped rim

    @jax.jit
    def step(s):
        r = compute_pair_forces(s, pot)
        s = s.replace(force=r.force, epot=r.epot)
        return integrate.damp(s, params, c, stad, stad2,
                              zeta0=jnp.float64(5.0),
                              damptemp=jnp.float64(0.0))

    for _ in range(200):
        scene, stats = step(scene)
    # rim atoms much colder than core atoms
    dampf = integrate.stadium_dampf(scene.pos, c, stad, stad2)
    inv_m = 1.0 / np.maximum(np.asarray(scene.mass), 1e-30)
    t_loc = np.asarray(jnp.sum(scene.mom ** 2, -1)) * inv_m / 3.0
    m = np.asarray(scene.mask)
    df = np.asarray(dampf)
    rim = m & (df > 0.9)
    core = m & (df < 0.1)
    assert rim.sum() > 10 and core.sum() > 10
    assert t_loc[rim].mean() < 0.3 * t_loc[core].mean()


def test_socket_steering(tmp_path):
    from imd_tpu.io.socket_io import SocketServer, poll

    class FakeSim:
        class cfg:
            starttemp = endtemp = 0.02
        wrote = []

        def write_checkpoint(self, state, n):
            self.wrote.append(n)

    class FakeState:
        step = 7

        class scene:
            @staticmethod
            def n_atoms():
                return 10

        class stats:
            tot_kin_energy = 1.5
        epot_total = -20.0

    srv = SocketServer(port=0)
    cl = socket.create_connection(("127.0.0.1", srv.port), timeout=2)
    cl.sendall(b"eng\nwrite\ntemp 0.05\nquit\n")
    time.sleep(0.6)
    sim = FakeSim()
    stop = poll(srv, sim, FakeState())
    assert stop
    assert sim.wrote == [7, 7]      # write + quit both checkpoint
    assert FakeSim.cfg.starttemp == 0.05
    time.sleep(0.6)
    cl.settimeout(2)
    reply = cl.recv(4096)
    assert b"step 7" in reply and b"epot" in reply
    cl.close()
    srv.close()


def test_graceful_stop_file(tmp_path):
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.simulation import Simulation

    param = """
coordname   _fcc
outfiles    {out}
box_param   3 3 3
box_unit    1.38
ntypes      1
masses      1.0
ensemble    nve
timestep    0.004
maxsteps    400
starttemp   0.02
eng_int     10
lj_epsilon  1.0
lj_sigma    1.0
r_cut       2.5
seed        3
""".format(out=str(tmp_path / "run"))
    cfg = SimConfig.from_params(parse_param_text(param))
    sim = Simulation(cfg, workdir=str(tmp_path))
    stopped = {}

    def hook(sim_, state):
        if int(state.step) >= 30 and not stopped.get("done"):
            open(os.path.join(str(tmp_path), "stop"), "w").close()
            stopped["done"] = True

    state = sim.run(on_interval=hook)
    assert int(state.step) < 400           # ended early
    # stop checkpointed
    chk = [f for f in os.listdir(tmp_path) if f.endswith(".chkpt")]
    assert chk


def test_interp_cubic_exactness_and_linear():
    from imd_tpu.utils.interpol import interp_cubic, interp_linear
    # Catmull-Rom reproduces quadratics exactly (interior)
    xs = np.linspace(0, 4, 21)
    tab = jnp.asarray(3.0 * xs ** 2 - 2 * xs + 0.5)
    q = jnp.asarray([1.23, 2.71, 3.3])
    got = interp_cubic(tab, [0.0], [0.2], q)
    ref = 3.0 * q ** 2 - 2 * q + 0.5
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-8, atol=1e-8)
    # trilinear on a 3-D linear field is exact
    g = np.linspace(0, 1, 5)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    t3 = jnp.asarray(2 * X - 3 * Y + 0.5 * Z)
    v = interp_linear(t3, [0, 0, 0], [0.25] * 3,
                      jnp.asarray(0.3), jnp.asarray(0.6), jnp.asarray(0.9))
    assert float(v) == pytest.approx(2 * 0.3 - 3 * 0.6 + 0.5 * 0.9, abs=1e-6)
    # tricubic on a smooth field beats trilinear
    t3s = jnp.asarray(np.sin(3 * X) * np.cos(2 * Y) + Z ** 2)
    pt = (jnp.asarray(0.33), jnp.asarray(0.57), jnp.asarray(0.71))
    exact = np.sin(3 * 0.33) * np.cos(2 * 0.57) + 0.71 ** 2
    e_lin = abs(float(interp_linear(t3s, [0, 0, 0], [0.25] * 3, *pt)) - exact)
    e_cub = abs(float(interp_cubic(t3s, [0, 0, 0], [0.25] * 3, *pt)) - exact)
    assert e_cub < 0.5 * e_lin


def test_sharded_checkpoint_roundtrip(tmp_path):
    from imd_tpu.io.sharded import save_state, restore_state
    pos, typ, diag = fcc((3, 3, 3), 1.38)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]])
    grid = choose_grid(box, 2.5, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    sc = integrate.maxwell(make_scene(grid, pos), 0.03,
                           jax.random.PRNGKey(0))
    p = str(tmp_path / "ckpt")
    save_state(p, sc)
    sc2 = restore_state(p, sc)
    np.testing.assert_array_equal(np.asarray(sc.pos), np.asarray(sc2.pos))
    np.testing.assert_array_equal(np.asarray(sc.mom), np.asarray(sc2.mom))
    assert int(sc2.n_atoms()) == int(sc.n_atoms())


def test_nvx_builds_temperature_gradient():
    """NVX: withdrawing heat at layer 0 and depositing at nlayers/2 must
    build a temperature gradient; the transferred energy is accounted."""
    from imd_tpu import analysis as A
    pos, typ, diag = fcc((8, 4, 4), 1.38)
    box = Box.create([diag[0], 0, 0], [0, diag[1], 0], [0, 0, diag[2]],
                     dtype=jnp.float64)
    grid = choose_grid(box, 2.5, skin=0.3, n_atoms=len(pos))
    grid = with_capacity(grid, measured_capacity(grid, pos))
    scene = make_scene(grid, pos, dtype=jnp.float64)
    scene = integrate.maxwell(scene, 0.05, jax.random.PRNGKey(0))
    pot = lj_table(1.0, 1.0, 2.5, dtype=jnp.float64)
    params = integrate.IntegratorParams(timestep=jnp.float64(0.004))
    nlay = 8

    @jax.jit
    def step(s):
        r = compute_pair_forces(s, pot)
        s = s.replace(force=r.force, epot=r.epot)
        return integrate.nvx(s, params, nlay, jnp.float64(0.1))

    from imd_tpu.scene import needs_rebin, rebin
    for i in range(1200):
        scene, stats, de = step(scene)
        if bool(needs_rebin(scene, grid.skin)):
            scene = rebin(scene)
    prof = A.temp_profile(scene, nlay)
    cold = prof[0]
    hot = prof[nlay // 2]
    assert hot > 1.5 * cold and cold > 0   # gradient established
    assert np.isfinite(prof).all()


def test_host_device_binning_equivalence_and_drop_sentinel():
    """_bin_flat_host (setup path) must agree with the jit _bin_flat, and
    dead/overflow atoms must be DROPPED, not wrapped into the last slot
    (negative scatter indices wrap under mode='drop')."""
    from imd_tpu.scene import _bin_flat, _bin_flat_host

    rng = np.random.default_rng(3)
    box = Box.cubic(30.0)
    grid = choose_grid(box, 5.0, skin=0.5, n_atoms=500)
    grid = with_capacity(grid, 8)
    pos = rng.uniform(-5.0, 35.0, (500, 3)).astype(np.float32)
    mask = rng.random(500) > 0.2          # dead atoms present
    arrays = {"mask": mask, "id": np.arange(500, dtype=np.int32),
              "mass": rng.random(500).astype(np.float32)}
    oj, ovj = _bin_flat(grid, jnp.asarray(pos),
                        {k: jnp.asarray(v) for k, v in arrays.items()},
                        8, jnp.float32)
    oh, ovh = _bin_flat_host(grid, pos, arrays, 8, jnp.float32)
    assert int(ovj) == int(ovh)
    ids_dev = np.asarray(oj["id"]).reshape(-1)
    ids_host = np.asarray(oh["id"]).reshape(-1)
    dead = set(np.nonzero(~mask)[0].tolist())
    assert not (set(ids_dev[ids_dev >= 0].tolist()) & dead)
    assert set(ids_dev[ids_dev >= 0].tolist()) == \
        set(ids_host[ids_host >= 0].tolist())
    n_cells = grid.n_cells
    for k in ("id", "mass", "pos"):
        a = np.sort(np.asarray(oj[k]).reshape(n_cells, 8, -1), axis=1)
        b = np.sort(np.asarray(oh[k]).reshape(n_cells, 8, -1), axis=1)
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_timers_report():
    from imd_tpu.utils.timers import Timers
    t = Timers()
    t.start("total")
    with t.section("forces"):
        time.sleep(0.01)
    with t.section("io"):
        time.sleep(0.005)
    t.stop("total")
    rep = t.report(n_atoms=100, n_steps=10)
    assert "forces" in rep and "%" in rep
    assert "seconds per step and atom" in rep
    assert t.get("forces") >= 0.01
