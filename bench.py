"""Benchmark: atom-steps/sec on the flagship EAM-Al MD step.

Reports the same metric as the reference's end-of-run summary
(imd.c:387-392: "cpuseconds per step and atom" and its inverse), as one
JSON line.  The baseline target (BASELINE.json north_star) is 5e8
atom-steps/sec/chip for 1M-atom EAM-Al (+TTM once coupled here).
"""

import argparse
import json
import math
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from imd_tpu import integrate
    from imd_tpu.ops.forces_fast import compute_eam_forces_fast as compute_eam_forces
    from imd_tpu.scene import needs_rebin, rebin

    from __graft_entry__ import _build

    from imd_tpu.models.potential import eam_to_chebyshev

    # fcc Al: 4 atoms per unit cell
    ncell = max(2, round((args.atoms / 4) ** (1 / 3)))
    dtype = getattr(jnp, args.dtype)
    scene, eam, grid = _build((ncell, ncell, ncell), dtype=dtype)
    # Chebyshev-compiled potentials: gather-free evaluation (table gathers
    # are ~1000x slower on TPU)
    eam = eam_to_chebyshev(eam, deg=24)
    n_atoms = int(scene.n_atoms())
    scene = integrate.maxwell(scene, 0.026, jax.random.PRNGKey(0))
    params = integrate.IntegratorParams(
        timestep=jnp.asarray(0.1, dtype))  # ~1 fs

    def one_step(scene):
        do_it = needs_rebin(scene, grid.skin)
        scene = jax.lax.cond(do_it, rebin, lambda s: s, scene)
        res = compute_eam_forces(scene, eam, ntypes=1)
        scene = scene.replace(force=res.force, epot=res.epot)
        scene, stats = integrate.nve(scene, params)
        return scene

    @jax.jit
    def run_block(scene, k):
        return jax.lax.fori_loop(0, k, lambda i, s: one_step(s), scene)

    # warmup & compile
    scene = run_block(scene, args.warmup)
    jax.block_until_ready(scene.pos)

    t0 = time.perf_counter()
    scene = run_block(scene, args.steps)
    jax.block_until_ready(scene.pos)
    dt = time.perf_counter() - t0

    atom_steps_per_sec = n_atoms * args.steps / dt
    sec_per_step_atom = dt / (args.steps * n_atoms)
    baseline = 5e8
    print(json.dumps({
        "metric": "atom-steps/sec/chip (EAM-Al MD step)",
        "value": atom_steps_per_sec,
        "unit": "atom-steps/s",
        "vs_baseline": atom_steps_per_sec / baseline,
        "detail": {
            "n_atoms": n_atoms,
            "steps": args.steps,
            "wall_s": dt,
            "sec_per_step_and_atom": sec_per_step_atom,
            "grid": list(grid.dims),
            "capacity": grid.capacity,
            "dtype": args.dtype,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
