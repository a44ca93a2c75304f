"""CLI NEB mode: the reference's imd_neb main variant (imd_neb.c).

The reference launches exactly neb_nrep MPI ranks, one band image each
(imd_param.c:559 "We need exactly neb_nrep MPI processes"), reads
per-image start files ``<coordname>.%02d`` (read_atoms_neb,
imd_neb.c:92-141), relaxes the band with its MIK/GLOK relaxators plus
calc_forces_neb (imd_neb.c:188), logs ``# nfc fnorm neb_k Epot_0 ...
Epot_nrep`` to ``<outfiles>.eng`` (write_neb_eng_file, imd_neb.c:548),
and writes each image's output under ``<outfiles>.%02d`` (imd_neb.c:141).

TPU-native analog: the image axis is a vmap batch — all images' force
evaluations fuse into one device program (models/neb.py), neighbor-image
differences are shifted slices, and the whole quickmin relaxation runs
as a lax.scan.  One process replaces the per-image MPI groups.

Supported reference knobs: neb_k, variable springs neb_kmin/neb_kmax
after neb_vark_start (JCP 113, 9901 cosine schedule, imd_neb.c:260-270),
climbing image after neb_cineb_start (auto energy-max or pinned
neb_climbing_image), neb_maxmove displacement cap (constrain_move,
imd_main_3d.c:953), neb_eng_int log cadence, fnorm_threshold
termination (check_relaxed, imd_main_3d.c:1787).

Deviation from the reference (documented): interior image files may be
omitted — missing images are linearly interpolated between the nearest
provided ones (the reference requires all neb_nrep files).
"""

from __future__ import annotations

import os

import numpy as np


def _read_image(path):
    from imd_tpu.io.chkpt import read_chkpt
    d = read_chkpt(path)
    order = np.argsort(d.number, kind="stable")
    return d, order


def run_neb(cfg, workdir: str = ".", dtype=None):
    """Relax a nudged-elastic band from a parameter file's neb_* tags.

    Returns (final positions [R,N,3], energies [R], barrier).
    """
    import jax
    import jax.numpy as jnp

    from imd_tpu.models.neb import barrier, interpolate_images, neb_relax
    from imd_tpu.ops.forces import eam_forces_n2, pair_forces_n2
    from imd_tpu.simulation import Simulation

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    nrep = int(cfg.neb_nrep)
    if nrep < 3:
        raise ValueError("neb_nrep must be >= 3 (two endpoints + "
                         "interior images)")

    base = cfg.coordname

    def img_path(i):
        return os.path.join(workdir, f"{base}.{i:02d}")

    for i in (0, nrep - 1):
        if not os.path.exists(img_path(i)):
            raise FileNotFoundError(
                f"NEB endpoint image missing: {img_path(i)} "
                "(read_atoms_neb reads <coordname>.%02d, imd_neb.c:102)")

    d0, order0 = _read_image(img_path(0))
    ids = d0.number[order0]
    n = len(ids)
    have = {}
    for i in range(nrep):
        p = img_path(i)
        if not os.path.exists(p):
            continue
        d, order = _read_image(p)
        if not np.array_equal(d.number[order], ids):
            raise ValueError(f"image {i}: atom ids differ from image 0 "
                             "(NEB needs a fixed atom correspondence)")
        have[i] = d.pos[order]

    # potential + box via the normal Simulation setup on image 0
    cfg.coordname = f"{base}.00"
    sim = Simulation(cfg, workdir=workdir, dtype=dtype, engine="xla")
    cfg.coordname = base
    box = sim.box
    vtyp = d0.type[order0].clip(0)
    types_map = np.asarray(
        cfg.types if cfg.types else range(max(cfg.vtypes,
                                              int(vtyp.max()) + 1)),
        np.int32)
    typ = jnp.asarray(types_map[vtyp], jnp.int32)    # vtype -> sorte
    mask = jnp.ones((n,), bool)
    mass = float(np.mean(d0.mass[order0])) or 1.0

    # per-vtype restriction masks fix anchor atoms (integrate.c:209)
    restr = sim._restrictions()
    rfac = (jnp.asarray(np.asarray(restr)[np.minimum(
        vtyp, cfg.vtypes - 1)], dtype) if restr is not None else None)

    if sim.eam is not None:
        eam, ntypes = sim.eam, cfg.ntypes

        def raw_forces(x):
            F, epot, _ = eam_forces_n2(x, typ, mask, box, eam,
                                       ntypes=ntypes)
            return F, jnp.sum(epot)
    else:
        pot, ntypes = sim.pair, cfg.ntypes

        def raw_forces(x):
            F, epot, _ = pair_forces_n2(x, typ, mask, box, pot,
                                        ntypes=ntypes)
            return F, jnp.sum(epot)

    def force_fn(x):
        F, e = raw_forces(x)
        if rfac is not None:
            F = F * rfac
        return F, e

    # assemble the band: provided images + linear interpolation between
    # the nearest provided neighbors for the gaps
    anchors = sorted(have)
    x = np.zeros((nrep, n, 3))
    for a, b in zip(anchors[:-1], anchors[1:]):
        seg = interpolate_images(jnp.asarray(have[a], dtype),
                                 jnp.asarray(have[b], dtype),
                                 b - a + 1, box=box)
        x[a:b + 1] = np.asarray(seg)
    x = jnp.asarray(x, dtype)

    k = float(cfg.neb_k) if cfg.neb_k > 0 else 1.0
    eng_int = int(cfg.neb_eng_int) if cfg.neb_eng_int > 0 else 50
    maxsteps = int(cfg.maxsteps) if cfg.maxsteps > 0 else 1000
    dt = float(cfg.timestep) if cfg.timestep > 0 else 0.05
    fthr = float(getattr(cfg.relax, "fnorm_threshold", 0.0) or 0.0)

    eng_path = os.path.join(workdir, f"{cfg.outfiles}.eng")
    with open(eng_path, "w") as f:
        f.write("# nfc fnorm neb_k "
                + " ".join(f"Epot_{i}" for i in range(nrep)) + "\n")

    relax = jax.jit(lambda xi, s0, nst: neb_relax(
        xi, force_fn, k_spring=k, n_steps=nst, dt=dt, box=box,
        climb_after=int(cfg.neb_cineb_start), mass=mass,
        vark_after=int(cfg.neb_vark_start),
        kmin=float(cfg.neb_kmin), kmax=float(cfg.neb_kmax),
        maxmove=float(cfg.neb_maxmove),
        climb_image=int(cfg.neb_climbing_image), step0=s0),
        static_argnums=(2,))

    from imd_tpu.models.neb import neb_forces, vark_spring

    def band_fnorm(x, step):
        """2-norm of the assembled NEB force (the relaxation measure the
        reference's .eng fnorm column tracks, imd_neb.c:548)."""
        f, e = jax.vmap(force_fn)(x)
        climb = cfg.neb_cineb_start > 0 and step >= cfg.neb_cineb_start
        kk = (vark_spring(e, cfg.neb_kmin, cfg.neb_kmax)
              if (cfg.neb_vark_start > 0 and cfg.neb_kmin > 0
                  and cfg.neb_kmax > 0 and step >= cfg.neb_vark_start)
              else k)
        fn = neb_forces(x, f, e, kk, box, climb,
                        int(cfg.neb_climbing_image))
        return float(jnp.sqrt(jnp.sum(fn ** 2)))

    e = None
    step = 0
    while step < maxsteps:
        nst = min(eng_int, maxsteps - step)
        x, e, fmaxs = relax(x, step, nst)
        step += nst
        fnorm = band_fnorm(x, step)
        row = " ".join(f"{float(v):.10e}" for v in e)
        with open(eng_path, "a") as f:
            f.write(f"{step} {fnorm:.6e} {k:.4f} {row}\n")
        print(f"# neb step {step}: fnorm={fnorm:.3e} "
              f"barrier={float(barrier(e)):.6f}", flush=True)
        if fthr > 0 and fnorm < fthr:
            break

    # per-image final configurations (<outfiles>.%02d, imd_neb.c:141)
    from imd_tpu.io.chkpt import ChkptData, write_chkpt
    xn = np.asarray(x)
    for i in range(nrep):
        out = os.path.join(workdir, f"{cfg.outfiles}.{i:02d}-final.chkpt")
        write_chkpt(out, ChkptData(
            number=ids, type=d0.type[order0], mass=d0.mass[order0],
            pos=xn[i], vel=np.zeros_like(xn[i]),
            data=np.zeros((n, 1)),
            box_x=np.asarray(box.h[0]), box_y=np.asarray(box.h[1]),
            box_z=np.asarray(box.h[2])))
    return x, e, float(barrier(e))
