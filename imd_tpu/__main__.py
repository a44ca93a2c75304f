"""CLI driver: the `imd_<target> -p paramfile [-r N]` equivalent.

Reference surface: read_command_line (imd_param.c:4077: `-p file`,
`-r restart#`) and the per-phase main loop of main() (imd.c:31-405,
`simulation N` sections).  One binary replaces the reference's
compile-time product line: every feature is runtime-configured from the
parameter file.

Usage:
    python -m imd_tpu -p params.imd [-r N] [--dtype float32|float64]
                      [--engine auto|pallas|xla] [--steps-override N]

Phases: the parameter file may contain `simulation K` sections; each
phase re-reads the file at that phase (imd_param.c:314-318) and
continues from the previous phase's final state (handed over via an
in-memory scene transplant, matching the reference's keep-in-memory
behavior).
"""

from __future__ import annotations

import argparse
import sys


def count_phases(text: str) -> int:
    mx = 1
    for line in text.splitlines():
        toks = line.split()
        if toks and toks[0].lower() == "simulation" and len(toks) > 1:
            try:
                mx = max(mx, int(toks[1]))
            except ValueError:
                pass
    return mx


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="imd_tpu", description="TPU-native IMD/lasMD")
    ap.add_argument("-p", "--paramfile", required=True)
    ap.add_argument("-r", "--restart", type=int, default=None,
                    help="restart number: read <outfiles>.<N>.{chkpt,itr}")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float64"])
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "pallas", "xla"])
    ap.add_argument("--steps-override", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the TPU plugin ignores "
                         "JAX_PLATFORMS; this applies the config update "
                         "before any jax computation)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    # multi-host: join the job BEFORE any other jax use (mpirun analog;
    # no-op unless JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES are set)
    from imd_tpu.parallel.mesh import init_multihost
    init_multihost()

    import jax.numpy as jnp
    from imd_tpu.config import SimConfig, parse_param_text
    from imd_tpu.simulation import Simulation

    with open(args.paramfile) as f:
        text = f.read()
    n_phases = count_phases(text)
    dtype = getattr(jnp, args.dtype)

    import os
    workdir = os.path.dirname(os.path.abspath(args.paramfile)) or "."

    # UNIAX main variant (imd_forces_uniax.c): Gay-Berne molecules with
    # orientation dynamics run their own flat driver
    cfg0 = SimConfig.from_params(parse_param_text(text, phase=1))
    if any(cfg0.uniax_sig) or cfg0.uniax_r_cut > 0:
        from imd_tpu.uniax_driver import run_uniax
        cfg0.validate()
        _, obs = run_uniax(cfg0, workdir=workdir, dtype=dtype)
        print(f"# uniax done: Epot={float(obs['epot']):.6f} "
              f"Ekin_rot={float(obs['ekin_rot']):.6f}", flush=True)
        return 0

    # NEB main variant (imd_neb.c): neb_nrep images relax as one band,
    # replacing the per-step phase loop entirely
    if cfg0.neb_nrep > 1:
        from imd_tpu.neb_driver import run_neb
        cfg0.validate()
        _, e, barr = run_neb(cfg0, workdir=workdir, dtype=dtype)
        print(f"# neb done: barrier={barr:.6f} eV "
              f"(Epot_max - Epot_0, imd_neb.c .eng log)", flush=True)
        return 0

    prev_scene = None
    prev_step = 0
    for phase in range(1, n_phases + 1):
        cfg = SimConfig.from_params(parse_param_text(text, phase=phase))
        cfg.simulation_phase = phase
        # completeness checks with the reference's messages
        # (check_parameters_complete, imd_param.c:3746)
        cfg.validate()
        if args.restart is not None and phase == 1:
            # the reference tries the plain `%d` name first and falls
            # back to the zero-padded `%05d` form (imd_param.c:4178/4184)
            for fz in (str(args.restart), f"{args.restart:05d}"):
                cand = os.path.join(workdir, f"{cfg.outfiles}.{fz}.chkpt")
                if os.path.exists(cand):
                    cfg.coordname = f"{cfg.outfiles}.{fz}.chkpt"
                    cfg.itrname = f"{cfg.outfiles}.{fz}.itr"
                    cfg.restart_base = f"{cfg.outfiles}.{fz}"
                    break
            else:
                raise SystemExit(
                    f"restart {args.restart}: neither "
                    f"{cfg.outfiles}.{args.restart}.chkpt nor "
                    f"{cfg.outfiles}.{args.restart:05d}.chkpt exists "
                    f"in {workdir}")
        sim = Simulation(cfg, workdir=workdir, dtype=dtype,
                         engine=args.engine)
        if prev_scene is not None:
            # phase handover: keep the evolved atoms (imd.c re-reads
            # params per phase but keeps the cell contents).  The new
            # phase may have a different cutoff/box/grid, so the atoms
            # are re-binned into the grid THIS phase computed instead of
            # transplanting the previous phase's Scene object.
            sim.adopt_scene(prev_scene)
            sim.step_count = prev_step
        steps = args.steps_override if args.steps_override else None
        # reference semantics: maxsteps is the ABSOLUTE final step
        # (main_loop runs steps_min..steps_max, imd_main_3d.c:151); a
        # restart or later phase continues to maxsteps, not for maxsteps
        # more.  Simulation._steps_to_run applies this when steps=None.
        n_run = steps if steps is not None else sim._steps_to_run(None)
        print(f"# phase {phase}/{n_phases}: ensemble={cfg.ensemble} "
              f"steps={n_run}", flush=True)
        state = sim.run(steps=steps)
        if phase == n_phases and cfg.checkpt_int > 0:
            # end-of-run "-final" checkpoint + .itr so `imdcontinue`-style
            # workflows can pick up the last state (imd_io_3d.c:995)
            sim.write_checkpoint(state, -1)
        prev_scene, prev_step = sim.scene, sim.step_count
        n = int(prev_scene.n_atoms())
        print(f"# phase {phase} done: step={prev_step} atoms={n} "
              f"epot/atom={float(state.epot_total) / max(n, 1):.6f}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
