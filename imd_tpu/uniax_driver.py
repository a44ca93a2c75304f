"""UNIAX main variant: Gay-Berne uniaxial-molecule dynamics.

The reference's UNIAX builds (imd_forces_uniax.c + gay_berne.c, with
the rotational leapfrog woven into move_atoms, imd_integrate.c:378-470)
carry per-molecule orientation axes (ACHSE) and angular momenta
(DREH_IMPULS) in the cell arrays.  Here the whole system runs as the
flat UniaxSystem pytree (models/uniax.py) through a jitted lax.scan —
Gay-Berne systems are mesogen-scale (10^3-10^4 molecules), so the
all-pairs autodiff engine is the right tool, exactly like the covalent
families (models/interactions.py).

Activation: `uniax_sig`/`uniax_eps`/`uniax_r_cut` tags in the parameter
file (imd_param.c:1327-1345, 3596) divert `python -m imd_tpu` into this
driver.  Start axes come from the checkpoint's extra data columns
(axis_x axis_y axis_z, written back by this driver's checkpoints) or,
for fresh starts, random unit vectors from `seed`.  Momenta and angular
momenta thermalize to `starttemp` (maxwell's rotational branch,
imd_maxwell.c:45: 2 rotational DOF per uniaxial molecule).

Outputs: .eng with the reference's rotational-energy accounting
(time Epot T_trans T_rot), plus restartable checkpoints whose data
columns carry the axes and angular momenta.
"""

from __future__ import annotations

import os

import numpy as np


def run_uniax(cfg, workdir: str = ".", dtype=None):
    import jax
    import jax.numpy as jnp

    from imd_tpu.io.chkpt import ChkptData, read_chkpt, write_chkpt
    from imd_tpu.models.uniax import (GayBerneParams, UniaxSystem,
                                      uniax_step)
    from imd_tpu.ops.geometry import Box
    from imd_tpu.utils.generate import generate_atoms

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    rng = np.random.default_rng(cfg.seed or 0)
    axis = angmom = None
    if cfg.coordname.startswith("_"):
        pos, typ, box_diag = generate_atoms(cfg.coordname, cfg.box_param,
                                            cfg.box_unit, cfg.ntypes)
        typ = np.asarray(typ, np.int64)
        ids = np.arange(len(pos))
        bx, by, bz = ([box_diag[0], 0, 0], [0, box_diag[1], 0],
                      [0, 0, box_diag[2]])
        mass = np.full(len(pos), cfg.masses[0] if cfg.masses else 1.0)
        vel = np.zeros_like(pos)
    else:
        d = read_chkpt(os.path.join(workdir, cfg.coordname))
        order = np.argsort(d.number, kind="stable")
        pos, ids, mass = d.pos[order], d.number[order], d.mass[order]
        typ = d.type[order]
        vel = d.vel[order]
        bx, by, bz = d.box_x, d.box_y, d.box_z
        if d.data.shape[1] >= 7:
            # axis + angular momentum written by our checkpoints
            axis = d.data[order, 1:4]
            angmom = d.data[order, 4:7]
    n = len(pos)
    if axis is None:
        axis = rng.normal(size=(n, 3))
        axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    box = Box.create(bx, by, bz, pbc=cfg.pbc_dirs, dtype=dtype)

    sig = cfg.uniax_sig if cfg.uniax_sig else cfg.uniax_sigma
    eps = cfg.uniax_eps
    P = GayBerneParams(
        sigma_perp=float(sig[0]), sigma_par=float(sig[2]),
        eps_perp=float(eps[0]), eps_par=float(eps[2]),
        r_cut=(cfg.uniax_r_cut if cfg.uniax_r_cut > 0
               else 3.0 * float(sig[2])))
    m0 = float(np.mean(mass)) or 1.0
    inertia = float(cfg.uniax_inert) or 1.0

    # Maxwell init: 3 translational + 2 rotational DOF per molecule
    # (imd_maxwell.c uniax branch); angular momentum orthogonal to axis
    T = float(cfg.starttemp)
    if cfg.do_maxwell and T > 0:
        mom = rng.normal(scale=np.sqrt(T * m0), size=(n, 3))
    else:
        mom = vel * m0
    if angmom is None:
        L = rng.normal(scale=np.sqrt(T * inertia) if T > 0 else 1e-12,
                       size=(n, 3))
        angmom = L - np.sum(L * axis, -1, keepdims=True) * axis

    sys = UniaxSystem(pos=jnp.asarray(pos, dtype),
                      axis=jnp.asarray(axis, dtype),
                      mom=jnp.asarray(mom, dtype),
                      angmom=jnp.asarray(angmom, dtype),
                      mass=m0, inertia=inertia)
    dt = float(cfg.timestep)
    maxsteps = int(cfg.maxsteps)
    eng_int = int(cfg.eng_int) if cfg.eng_int > 0 else maxsteps

    @jax.jit
    def run_block(sys, k):
        def body(i, s):
            s2, _ = uniax_step(s, dt, P, box)
            return s2
        sys = jax.lax.fori_loop(0, k, body, sys)
        _, obs = uniax_step(sys, 0.0, P, box)
        return sys, obs

    eng_path = os.path.join(workdir, f"{cfg.outfiles}.eng")
    with open(eng_path, "w") as f:
        f.write("# time Epot T_trans T_rot\n")

    done = 0
    obs = None
    while done < maxsteps:
        k = min(eng_int, maxsteps - done)
        sys, obs = run_block(sys, k)
        done += k
        et = 2.0 * float(obs["ekin_trans"]) / (3.0 * n)
        er = float(obs["ekin_rot"]) / n           # 2 rot DOF
        with open(eng_path, "a") as f:
            f.write(f"{done * dt:.6e} "
                    f"{float(obs['epot']) / n:.10e} {et:.6e} {er:.6e}\n")
        print(f"# uniax step {done}: epot/mol="
              f"{float(obs['epot']) / n:.6f} T_trans={et:.4f} "
              f"T_rot={er:.4f}", flush=True)

    if cfg.checkpt_int > 0:
        data = np.concatenate(
            [np.zeros((n, 1)), np.asarray(sys.axis),
             np.asarray(sys.angmom)], axis=1)
        write_chkpt(os.path.join(workdir,
                                 f"{cfg.outfiles}-final.chkpt"),
                    ChkptData(number=ids,
                              type=np.asarray(typ, np.int64),
                              mass=mass, pos=np.asarray(sys.pos),
                              vel=np.asarray(sys.mom) / m0,
                              data=data,
                              box_x=np.asarray(box.h[0]),
                              box_y=np.asarray(box.h[1]),
                              box_z=np.asarray(box.h[2])))
    return sys, obs
