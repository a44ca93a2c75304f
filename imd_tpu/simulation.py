"""Simulation driver: the main_loop equivalent (imd.c:31, imd_main_3d.c:35).

Orchestrates per-step work: forces -> (laser/TTM hooks) -> integrate ->
temperature ramp -> periodic I/O -> rebin check.  The whole step is one
jitted function; rebinning happens inside jit under a `lax.cond` so steady
state runs without host round-trips.  A `run_block` path scans many steps
per dispatch for benchmarking/production throughput.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
import warnings
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imd_tpu import integrate
from imd_tpu.config import SimConfig
from imd_tpu.io.chkpt import ChkptData, read_chkpt, write_chkpt, write_itr, read_itr
from imd_tpu.io.eng import EngWriter
from imd_tpu.models.potential import (EAMPotential, PotTable, lj_table,
                                      read_eam, read_pot_table)
from imd_tpu.ops import forces as forces_mod
from imd_tpu.ops.geometry import Box, CellGrid, choose_grid
from imd_tpu.scene import Scene, make_scene, needs_rebin, rebin
from imd_tpu.utils.generate import generate_atoms


class SimState(struct.PyTreeNode):
    """Traced per-run state threaded through the jitted step."""
    scene: Scene
    step: jnp.ndarray                 # int32 global step counter
    eta: jnp.ndarray                  # Nose-Hoover friction
    epot_total: jnp.ndarray
    virial: jnp.ndarray
    presstens: jnp.ndarray            # [6]
    stats: integrate.StepStats
    nbl_count: jnp.ndarray            # number of rebins so far
    ttm_grid: Optional["object"] = None   # TTMGrid when ensemble == ttm
    fdi: Optional[jnp.ndarray] = None     # per-atom-slot FD column index
    xi: Optional[jnp.ndarray] = None      # NPT barostat friction (scalar/[3])
    ekin_old: Optional[jnp.ndarray] = None  # NPT 2*Ekin of previous step
    rng: Optional[jnp.ndarray] = None     # PRNG key (Langevin/Andersen)
    gamma: Optional[jnp.ndarray] = None   # FRAC scalar / FTG [nslices]
    ep: Optional["object"] = None         # ExtPotParams (moving indenters)
    fire: Optional["object"] = None       # FireState (ensemble glok)
    # quasistatic RELAX loading offsets (update_fbc, imd_main_3d.c:1243):
    # incremented on the host at relaxation events, traced leaves so the
    # jitted step needs no retrace per increment
    fbc_offset: Optional[jnp.ndarray] = None    # [vtypes, 3]
    bfbc_offset: Optional[jnp.ndarray] = None   # [vtypes, 3] bend forces
    fdtd: Optional["object"] = None       # FDTDState (Maxwell laser source)
    cstate: Optional["object"] = None     # ColradGridState (plasma kinetics)
    vstate: Optional["object"] = None     # VlatState (virtual lattice tail)
    bb_time: Optional[jnp.ndarray] = None  # hyperdynamics boosted clock
    charges: Optional[jnp.ndarray] = None  # SM per-slot charges (qeq)


def _iv_pair(iv):
    """Normalize an interval spec to (interval, phase): observers that
    fire on an offset lattice (AVPOS: (steps - avpos_start) % int == 0,
    imd_main_3d.c:629-639) pass (interval, phase) tuples."""
    return iv if isinstance(iv, tuple) else (int(iv), 0)


def _iv_due(gstep: int, iv) -> bool:
    i, ph = _iv_pair(iv)
    return i > 0 and (gstep - ph) % i == 0


def _clamp_block(b: int, cur: int, intervals, specials=()) -> int:
    """Shrink a dispatch block so it ends exactly on the next due I/O
    step: the next multiple of ANY active interval (on its phase
    lattice), or a one-off capture step.  The reference checks cadences
    every step (imd_main_3d.c:623-793); we dispatch jitted blocks, so
    with non-commensurate intervals (e.g. eng_int 10 + nmoldyn_int 4) a
    fixed min(intervals) block would silently skip boundaries that are
    not multiples of the smallest interval."""
    cands = []
    for iv in intervals:
        i, ph = _iv_pair(iv)
        if i > 0:
            cands.append(i - (cur - ph) % i)
    cands += [s - cur for s in specials if s > cur]
    return min([b] + cands) if cands else b


def _initial_stats(dtype):
    z = jnp.zeros((), dtype)
    return integrate.StepStats(tot_kin_energy=z, fnorm=z, pnorm=z, pxf=z,
                               ekin_new=z)


class Simulation:
    """Host-side driver owning config, potentials, I/O, and the jitted step."""

    def __init__(self, cfg: SimConfig, workdir: str = ".",
                 dtype=jnp.float32, grid_dims_multiple=(1, 1, 1),
                 fast: bool = True, engine: str = "auto",
                 mesh_shape: Optional[Tuple[int, int, int]] = None):
        self.cfg = cfg
        self.workdir = workdir
        self.dtype = dtype
        # DISLOC references loaded from a restart checkpoint's
        # x_ref/Epot_ref columns (seeded into SelectWriters at run())
        self._disloc_ref = None
        self._sel = None
        # fast: cells-last force engine + Chebyshev-compiled potentials
        # (gather-free; ~1e-5 deviation from exact table interpolation).
        # fast=False keeps the reference-exact table path (validation mode).
        self.fast = fast
        # engine: "auto" picks the Pallas blocked kernels on TPU for
        # single-type EAM (the production hot path), XLA otherwise;
        # "pallas"/"xla" force a choice.
        self.engine = engine
        self.eng: Optional[EngWriter] = None
        # device mesh: the production multi-chip path (the reference's
        # MPI_Cart domain decomposition, imd_geom_mpi_3d.c:32; cpu_dim
        # tag, imd_param.c:1817).  Cells shard in blocks over the mesh;
        # the lattice rolls in the force sweep lower to ICI collective
        # permutes (parallel/mesh.py).
        shape = tuple(mesh_shape) if mesh_shape else tuple(cfg.cpu_dim)
        self.mesh = None
        if shape and int(np.prod(shape)) > 1:
            from imd_tpu.parallel.mesh import make_mesh
            n_dev = len(jax.devices())
            if int(np.prod(shape)) > n_dev:
                raise ValueError(
                    f"cpu_dim/mesh {shape} needs {int(np.prod(shape))} "
                    f"devices, have {n_dev}")
            self.mesh = make_mesh(shape)
            grid_dims_multiple = tuple(
                max(m, s) if m % s == 0 else m * s
                for m, s in zip(grid_dims_multiple, shape))
        self._grid_dims_multiple = tuple(grid_dims_multiple)
        self._load_potential()
        self._load_atoms(grid_dims_multiple)
        self._init_coulomb()
        self._select_engine()
        self._select_integrator()
        self._step_jit = None
        self.ttm = None          # attached by imd_tpu.models.ttm when enabled
        self.laser = None
        self.start_time = time.time()

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def _path(self, name: str) -> str:
        return name if os.path.isabs(name) else os.path.join(self.workdir, name)

    def _load_potential(self):
        cfg = self.cfg
        self.eam: Optional[EAMPotential] = None
        self.pair: Optional[PotTable] = None
        # analytic interaction families from their tag groups (SW /
        # Tersoff(+mod) / Keating / TTBP / MEAM — the reference's
        # compile-time covalent variants, models/interactions.py).
        # TTBP is additive (pair table + 3-body term); MEAM consumes the
        # pair table INSIDE its screened phi (imd_forces_meam.c:416), so
        # tables load first and the flat selection closes over them.
        from imd_tpu.models.interactions import select_flat_interaction
        self.flat_inter = select_flat_interaction(cfg, self.dtype)
        # pot_interp: table-interpolation mode for the table-driven
        # engines (reference compile flags FOURPOINT/SPLINE,
        # potaccess.h:23-35).  The Pallas engines fit polynomials from
        # the interpolated table, so the mode also shapes their fit.
        def _mode(pt, radial=True):
            from imd_tpu.models.potential import with_interpolation
            return with_interpolation(pt, cfg.pot_interp, radial=radial)

        self.eeam_embed = None
        if cfg.core_potential_file:
            # DYNAMO setfl/funcfl files (the payload of the OpenKIM
            # EAM_Dynamo_* model family) run natively: one file carries
            # all three EAM tables (models/setfl.py; the reference
            # reaches these parameterizations only through the KIM
            # bridge, imd_forces_kim.c)
            from imd_tpu.models.setfl import maybe_read_dynamo
            dyn = maybe_read_dynamo(self._path(cfg.core_potential_file),
                                    self.dtype)
            if dyn is not None:
                eam, meta = dyn
                # the tables have nelem² columns with stride nelem;
                # every engine indexes col = s*ntypes+h, so any
                # nelem != ntypes silently reads wrong pair columns
                if meta["nelem"] != cfg.ntypes:
                    raise ValueError(
                        f"{cfg.core_potential_file}: {meta['nelem']} "
                        f"element(s) but ntypes={cfg.ntypes}; set ntypes "
                        f"to the file's element count (or trim the file)")
            else:
                eam = read_eam(self._path(cfg.core_potential_file),
                               self._path(cfg.embedding_energy_file),
                               self._path(cfg.el_density_file),
                               cfg.ntypes, self.dtype)
            self.eam = EAMPotential(pair=_mode(eam.pair),
                                    rho=_mode(eam.rho),
                                    embed=_mode(eam.embed, radial=False))
            self.cutoff = math.sqrt(self.eam.cutoff2)
            if cfg.eeam_energy_file:
                # EEAM second embedding M(p) over p = sum rho_h^2
                # (eeam_energy_file, imd_param.c:2837; EAM_P/EAM_DM
                # terms in the NBL loop, imd_forces_nbl.c:553-882)
                self.eeam_embed = _mode(
                    read_pot_table(self._path(cfg.eeam_energy_file),
                                   cfg.ntypes, False, self.dtype),
                    radial=False)
            if cfg.adp_upotfile and cfg.adp_wpotfile:
                # ADP: EAM + dipole/quadrupole distortion tables run as
                # a flat autodiff interaction (models/interactions.py)
                from imd_tpu.models.interactions import \
                    make_adp_interaction
                nc = cfg.ntypes * cfg.ntypes
                u_tab = read_pot_table(self._path(cfg.adp_upotfile), nc,
                                       True, self.dtype)
                w_tab = read_pot_table(self._path(cfg.adp_wpotfile), nc,
                                       True, self.dtype)
                self.flat_inter = make_adp_interaction(cfg, eam, u_tab,
                                                       w_tab)
        elif cfg.potfile:
            self.pair = _mode(read_pot_table(self._path(cfg.potfile),
                                             cfg.ntypes * cfg.ntypes, True,
                                             self.dtype))
            self.cutoff = math.sqrt(self.pair.max_end)
        elif cfg.lj_epsilon and any(cfg.ljg_eps):
            # Lennard-Jones-Gauss (pair_int_ljg, imd_potential.c:1457)
            from imd_tpu.models.potential import ljg_table
            rc = cfg.r_cut or tuple(2.5 * s for s in cfg.lj_sigma)
            self.pair = _mode(ljg_table(list(cfg.lj_epsilon),
                                        list(cfg.lj_sigma),
                                        list(cfg.ljg_eps),
                                        list(cfg.ljg_r0),
                                        list(cfg.ljg_sig),
                                        list(rc), cfg.ntypes,
                                        dtype=self.dtype))
            self.cutoff = math.sqrt(self.pair.max_end)
        elif cfg.lj_epsilon:
            rc = cfg.r_cut or tuple(2.5 * s for s in cfg.lj_sigma)
            self.pair = _mode(lj_table(list(cfg.lj_epsilon),
                                       list(cfg.lj_sigma),
                                       list(rc), cfg.ntypes,
                                       dtype=self.dtype))
            self.cutoff = math.sqrt(self.pair.max_end)
        elif cfg.morse_epsilon:
            # analytic Morse generation (create_pot_table MORSE branch,
            # imd_potential.c:874-882)
            from imd_tpu.models.potential import morse_table
            rc = cfg.r_cut or tuple(2.5 * s for s in cfg.morse_sigma)
            self.pair = _mode(morse_table(list(cfg.morse_epsilon),
                                          list(cfg.morse_alpha),
                                          list(cfg.morse_sigma),
                                          list(rc), cfg.ntypes,
                                          dtype=self.dtype))
            self.cutoff = math.sqrt(self.pair.max_end)
        elif cfg.buck_a:
            # analytic Buckingham (pair_int_buck, imd_potential.c:1503)
            from imd_tpu.models.potential import buckingham_table
            rc = cfg.r_cut or tuple(2.5 * s for s in cfg.buck_sigma)
            self.pair = _mode(buckingham_table(list(cfg.buck_a),
                                               list(cfg.buck_c),
                                               list(cfg.buck_sigma),
                                               list(rc), cfg.ntypes,
                                               dtype=self.dtype))
            self.cutoff = math.sqrt(self.pair.max_end)
        elif self.flat_inter is None:
            raise ValueError("no potential configured "
                             "(potfile / EAM files / lj_* parameters)")
        else:
            self.cutoff = 0.0        # standalone analytic interaction
        if self.flat_inter is not None:
            name, cut, _, additive = self.flat_inter
            if additive and self.pair is None and self.eam is None:
                raise ValueError(
                    f"{name} is an additive three-body term on top of a "
                    "pair potential: provide potfile / lj_* tags "
                    "(the reference's TTBP builds are PAIR+TTBP, "
                    "config.h)")
            if self.pair is not None:
                # re-select with the pair table (MEAM screened phi)
                self.flat_inter = select_flat_interaction(
                    cfg, self.dtype, pair_table=self.pair)
                name, cut, _, additive = self.flat_inter
            self.cutoff = max(self.cutoff, cut)
            if not additive:
                print(f"# interaction: {name} (autodiff all-pairs "
                      f"engine; intended for covalent-scale systems "
                      f"<~20000 atoms)", flush=True)
        # Ewald Coulomb (imd_forces_ewald.c): per-type `charge` +
        # ew_kappa/ew_kcut arm the k-space sum; the real-space erfc part
        # rides the pair engine on its own table, so the cell grid must
        # cover its reach (ew_rcut, default the potential cutoff)
        self._coul_pending = ((any(cfg.charge) or bool(cfg.sm_chi_0))
                              and (cfg.ew_kappa > 0 or cfg.ew_kcut > 0))
        if self._coul_pending:
            rc = cfg.ew_rcut if cfg.ew_rcut > 0 else self.cutoff
            self.cutoff = max(self.cutoff, rc)
        # engine selection is finished in _select_engine() once the grid
        # capacity is known (_load_atoms)

    def _init_coulomb(self):
        """Ewald Coulomb machinery (imd_forces_ewald.c; models/ewald.py):
        k-vector list from the (now known) box, real-space erfc table for
        the pair engine, constant self/background energy."""
        cfg = self.cfg
        self.coulomb = None
        if not getattr(self, "_coul_pending", False):
            return
        from imd_tpu.models import ewald as ew_mod
        kappa = cfg.ew_kappa if cfg.ew_kappa > 0 else 0.3
        kcut = cfg.ew_kcut if cfg.ew_kcut > 0 else 4.0 * kappa
        rc = cfg.ew_rcut if cfg.ew_rcut > 0 else self.cutoff
        ew = ew_mod.make_ewald(self.box.h, kappa, kcut, self.dtype)
        charges = list(cfg.charge) + [0.0] * max(
            cfg.ntypes - len(cfg.charge), 0)
        rtab = ew_mod.ewald_real_table(charges[:cfg.ntypes], kappa, rc,
                                       dtype=jnp.float64)
        self.coulomb = {"ew": ew, "charges": tuple(charges[:cfg.ntypes]),
                        "raw": rtab, "rc": rc}
        if cfg.sm_chi_0 and not cfg.sm_fixed_charges:
            # Streitz-Mintmire variable charges: per-atom q from CG
            # electronegativity equilibration every charge_update_steps
            # (imd_sm.c:335); the real-space part then runs the dense
            # per-atom-charge operator instead of the type-pair table
            chi = list(cfg.sm_chi_0) + [0.0] * max(
                cfg.ntypes - len(cfg.sm_chi_0), 0)
            j0 = (list(cfg.sm_J_0) + [10.0] * max(
                cfg.ntypes - len(cfg.sm_J_0), 0)) if cfg.sm_J_0 \
                else [10.0] * cfg.ntypes
            self.coulomb["sm"] = (tuple(chi[:cfg.ntypes]),
                                  tuple(j0[:cfg.ntypes]))
        print(f"# coulomb: ewald kappa={kappa} kcut={kcut} rcut={rc} "
              f"K={int(ew.kvek.shape[0])}"
              + (" + SM charge equilibration"
                 if "sm" in self.coulomb else ""), flush=True)

    def _select_covalent_nbl(self):
        """Decide the covalent engine form: O(N^2) oracle vs fixed-K
        neighbor lists (ops/neighbors.py — the do_neightab/do_forces2
        analog, imd_forces_covalent.c:60-180).

        Auto rule (covalent_nbl = -1): lists once the padded slot count
        outgrows the oracle's O(N^2) scratch (> 4096 slots).  K is sized
        from the initial configuration's true max neighbor count with
        reference-style headroom (neigh_len growth, imd_alloc.c);
        covalent_nbl > 0 forces that K, 0 forces the oracle."""
        self._cov_nbr_K = 0
        name, cut, efn, additive = self.flat_inter
        if additive or not hasattr(efn, "nbr"):
            return
        knob = int(getattr(self.cfg, "covalent_nbl", -1))
        n_slots = int(np.prod(self.scene.pos.shape[:4]))
        if knob == 0 or (knob < 0 and n_slots <= 4096):
            return
        if self.grid.cell_edge_min() < cut:
            print(f"# interaction: {name} cell edge "
                  f"{self.grid.cell_edge_min():.2f} < cutoff {cut:.2f}; "
                  f"neighbor lists need cutoff-covering cells — "
                  f"falling back to the all-pairs oracle", flush=True)
            return
        from imd_tpu.ops.neighbors import neighbor_list, suggest_K
        rc2 = float(cut) ** 2
        cap27 = 27 * self.scene.capacity
        if knob > 0:
            K = min(knob, cap27)
        else:
            probe = neighbor_list(self.scene.pos, self.scene.mask,
                                  self.grid, rc2, min(8, cap27))
            K = suggest_K(int(probe.max_count), cap27)
        self._cov_nbr_K = K
        self._cov_nbr_rc2 = rc2
        print(f"# interaction: {name} neighbor-list engine K={K} "
              f"(O(N*K^2); {n_slots} slots)", flush=True)

    def _select_engine(self):
        """Pick the force engine.  The Pallas blocked kernels require the
        per-cell [cap, cap, 128] pair tiles to fit VMEM, which caps the
        cell capacity at ~32; bigger capacities (tiny boxes with few
        huge cells) use the XLA engine."""
        import jax as _jax
        if self.flat_inter is not None and not self.flat_inter[3]:
            # standalone analytic interaction: no table engines
            self.use_pallas = False
            self.eam_run = self.pair_run = None
            self._select_covalent_nbl()
            return
        use_pallas = (self.engine == "pallas"
                      or (self.engine == "auto"
                          and _jax.default_backend() not in ("cpu",)
                          and self.cfg.ntypes <= 4
                          and self.grid.capacity <= 32))
        if getattr(self, "eeam_embed", None) is not None:
            use_pallas = False       # EEAM runs the XLA engines
        if self.cfg.asympot and self.cfg.ntypes > 1:
            use_pallas = False       # ASYMPOT runs the oracle engine
        self.use_pallas = use_pallas
        if getattr(self, "coulomb", None):
            # engine-matched representation of the erfc real-space table.
            # The Pallas pair engine is single-species (bakes column 0),
            # so multi-type charge tables run the fast XLA engine even
            # when the main potential uses Pallas — q_a*q_b columns
            # matter (unlike-type attraction!)
            from imd_tpu.models.potential import to_chebyshev, to_fastpoly
            raw = self.coulomb["raw"]
            if use_pallas and self.cfg.ntypes == 1:
                self.coulomb["rtab"] = to_fastpoly(raw, vcap=50.0)
                self.coulomb["engine"] = "pallas"
            elif self.fast:
                self.coulomb["rtab"] = to_chebyshev(raw)
                self.coulomb["engine"] = "fast"
            else:
                self.coulomb["rtab"] = raw
                self.coulomb["engine"] = "oracle"
        if use_pallas:
            from imd_tpu.models.potential import eam_to_fastpoly, to_fastpoly
            if self.eam is not None:
                self.eam_run = eam_to_fastpoly(self.eam)
                self.pair_run = None
            else:
                self.pair_run = to_fastpoly(self.pair, vcap=50.0)
                self.eam_run = None
        elif self.fast:
            # idempotent: _select_engine may be re-run (adopt_scene)
            from imd_tpu.models.potential import (ChebPotential,
                                                  eam_to_chebyshev,
                                                  to_chebyshev)
            if self.eam is not None and not isinstance(self.eam.pair,
                                                       ChebPotential):
                self.eam = eam_to_chebyshev(self.eam)
            if self.pair is not None and not isinstance(self.pair,
                                                        ChebPotential):
                self.pair = to_chebyshev(self.pair)
            if (getattr(self, "eeam_embed", None) is not None
                    and not isinstance(self.eeam_embed, ChebPotential)):
                self.eeam_embed = to_chebyshev(self.eeam_embed)

    def _apply_generate_shifts(self, pos, typ, box_diag, shf, shr):
        """Vacuum margins on an internally generated lattice.

        Reference semantics (imd_generate.c:314-365 + the generate_fcc
        margin filter 533-540): x and y are enlarged by front+rear and
        rounded UP to a whole number of lattice cells, the rounding
        excess widening the rear margin; the enlarged box is filled and
        atoms inside the x/y margins dropped.  z only enlarges the box
        (vacuum at the rear; box_param.z is never updated there, so no
        filter).  Departure: the reference rounds x/y up to multiples of
        cpu_dim*box_unit for MPI divisibility; here grid divisibility is
        choose_grid's job, so we round to whole box_unit cells only.
        """
        cfg = self.cfg
        bp = np.asarray(cfg.box_param, int)
        if bp.size < 3 or np.any(bp[:3] <= 0) or \
                cfg.coordname.lstrip("_").lower() in ("qc", "quasi"):
            raise ValueError("shift*_front/rear need a 3-component "
                             "box_param cubic-family generator")
        bu_ax = box_diag[:3] / bp[:3]              # per-axis cell size
        newbp = bp.copy()
        rear = shr.copy()
        for ax in (0, 1):
            enlarged = box_diag[ax] + shf[ax] + shr[ax]
            newbp[ax] = int(math.ceil(enlarged / bu_ax[ax] - 1e-9))
            rear[ax] += newbp[ax] * bu_ax[ax] - enlarged
        pos, typ, box_diag = generate_atoms(cfg.coordname, tuple(newbp),
                                            cfg.box_unit, cfg.ntypes)
        box_diag = np.asarray(box_diag, float)
        pos = np.asarray(pos, float)
        keep = np.ones(len(pos), bool)
        for ax in (0, 1):
            if shf[ax] > 0:
                keep &= pos[:, ax] >= shf[ax]
            if rear[ax] > 0:
                keep &= pos[:, ax] <= box_diag[ax] - rear[ax]
        box_diag[2] += shf[2] + shr[2]
        return pos[keep], np.asarray(typ)[keep], box_diag

    def _load_atoms(self, grid_dims_multiple):
        cfg = self.cfg
        itr = {}
        shf = np.array([cfg.shiftx_front, cfg.shifty_front,
                        cfg.shiftz_front], float)
        shr = np.array([cfg.shiftx_rear, cfg.shifty_rear,
                        cfg.shiftz_rear], float)
        have_shift = bool(np.any(shf > 0) or np.any(shr > 0))
        if cfg.coordname.startswith("_"):
            pos, typ, box_diag = generate_atoms(cfg.coordname, cfg.box_param,
                                                cfg.box_unit, cfg.ntypes)
            if have_shift:
                pos, typ, box_diag = self._apply_generate_shifts(
                    pos, typ, np.asarray(box_diag, float), shf, shr)
            number = np.arange(len(pos))
            mass = np.asarray(cfg.masses)[typ]
            vel = None
            box_x = [box_diag[0], 0, 0]
            box_y = [0, box_diag[1], 0]
            box_z = [0, 0, box_diag[2]]
            self.do_maxwell = True
        else:
            d = read_chkpt(self._path(cfg.coordname))
            if cfg.itrname:
                itr = read_itr(self._path(cfg.itrname))
            pos, vel, typ, number = d.pos, d.vel, d.type, d.number
            # DISLOC observer references ride the checkpoint as extra
            # columns (x_ref y_ref z_ref Epot_ref, imd_io.c:3300) so
            # .dsp/.dem survive restarts without rebasing
            from imd_tpu.io.chkpt import data_column
            xr = [data_column(d, n) for n in ("x_ref", "y_ref", "z_ref")]
            er = data_column(d, "Epot_ref")
            if all(c is not None for c in xr) or er is not None:
                self._disloc_ref = (
                    number,
                    np.stack(xr, axis=1)
                    if all(c is not None for c in xr) else None,
                    er)
            mass = d.mass
            box_x = itr.get("box_x", d.box_x if d.box_x is not None
                            else cfg.box_x)
            box_y = itr.get("box_y", d.box_y if d.box_y is not None
                            else cfg.box_y)
            box_z = itr.get("box_z", d.box_z if d.box_z is not None
                            else cfg.box_z)
            if have_shift:
                # vacuum margins on checkpoint read: box diagonal grows
                # by front+rear, positions shift by `front`
                # (imd_io_3d.c:87-89,341-345; diagonal components only —
                # the reference mod assumes an orthogonal box)
                box_x = [box_x[0] + shf[0] + shr[0], box_x[1], box_x[2]]
                box_y = [box_y[0], box_y[1] + shf[1] + shr[1], box_y[2]]
                box_z = [box_z[0], box_z[1], box_z[2] + shf[2] + shr[2]]
                pos = np.asarray(pos, float) + shf[None, :]
            self.do_maxwell = cfg.do_maxwell or not d.have_vel
        if not np.any(np.asarray(box_x)):
            raise ValueError("no box: neither header #X/#Y/#Z nor box_x params")
        self.box = Box.create(box_x, box_y, box_z, pbc=cfg.pbc_dirs,
                              dtype=self.dtype)
        n = len(pos)
        self.grid = choose_grid(self.box, self.cutoff, skin=cfg.nbl_margin,
                                capacity=cfg.cell_capacity, n_atoms=n,
                                dims_multiple=grid_dims_multiple,
                                headroom=1.6 * cfg.nbl_size)
        if cfg.cell_capacity <= 0:
            # dense-sweep grid: dims+capacity minimizing the Pallas/XLA
            # cell-sweep cost cap^2 * n_cells over the measured occupancy
            # (fewer, fuller cells beat the classical max-cells choice by
            # ~25% at 1M fcc-Al; see optimize_grid_dims)
            from imd_tpu.ops.geometry import optimize_grid_dims
            dims, capv = optimize_grid_dims(
                self.box, self.cutoff, cfg.nbl_margin, pos,
                dtype=self.dtype, dims_multiple=grid_dims_multiple,
                headroom_slots=2)
            self.grid = CellGrid(box=self.box, dims=dims, capacity=capv,
                                 cutoff=self.cutoff, skin=cfg.nbl_margin)
        # vtype -> real type map (cfg.types); vtype kept for restrictions/FBC
        vtyp = np.asarray(typ, np.int32)
        types_map = np.asarray(cfg.types if cfg.types else range(max(cfg.vtypes, vtyp.max() + 1)), np.int32)
        rtyp = types_map[np.clip(vtyp, 0, len(types_map) - 1)]
        mom = None
        if vel is not None and not self.do_maxwell:
            mom = np.asarray(vel) * np.asarray(mass)[:, None]
        self.scene = make_scene(self.grid, pos, mom=mom, mass=mass,
                                type=rtyp, vtype=vtyp, id=number,
                                dtype=self.dtype)
        # setup must NEVER drop atoms: capacity sizing measures the same
        # binning make_scene performs, but defend against any residual
        # mismatch by growing the slot axis until every atom binned
        # (alloc_cell analog, imd_alloc.c:551).  A stale nonzero
        # scene.overflow here would also wedge the run loop's in-block
        # growth retry (it can only recover atoms still in the state).
        for _ in range(6):
            if int(self.scene.overflow) == 0:
                break
            new_cap = self.grid.capacity + 8
            print(f"# setup overflow {int(self.scene.overflow)}: "
                  f"growing capacity {self.grid.capacity} -> {new_cap}",
                  flush=True)
            self.grid = self.grid.replace(capacity=new_cap)
            self.scene = make_scene(self.grid, pos, mom=mom, mass=mass,
                                    type=rtyp, vtype=vtyp, id=number,
                                    dtype=self.dtype)
        else:
            raise RuntimeError(
                f"make_scene still drops {int(self.scene.overflow)} atoms "
                f"at capacity {self.grid.capacity}")
        # the .itr records the reference's "next step to execute"
        # (write_itr_file prints steps+1, imd_io_3d.c:1007); step_count
        # here counts COMPLETED iterations, so a restart resumes at
        # startstep-1 and runs exactly maxsteps - (startstep-1) further
        # iterations to the absolute maxsteps — one per missing label,
        # preserving trajectory continuity with the uninterrupted run
        if "startstep" in itr:
            self.step_count = int(itr["startstep"]) - 1
        else:
            self.step_count = cfg.startstep
        self._itr_hc_count = int(itr.get("hc_count", 0))
        if self.do_maxwell and cfg.starttemp > 0:
            key = jax.random.PRNGKey(cfg.seed)
            self.scene = integrate.maxwell(
                self.scene, cfg.starttemp, key,
                restrictions=self._restrictions())
        if cfg.shock_mode in (1, 2, 3) and cfg.shock_speed:
            self.scene = integrate.shock_init(
                self.scene, cfg.shock_mode,
                jnp.asarray(cfg.shock_speed, self.dtype), cfg.shock_strip)
        if self.mesh is not None:
            from imd_tpu.parallel.mesh import (check_grid_divisible,
                                               shard_scene)
            check_grid_divisible(self.grid.dims, self.mesh)
            self.scene = shard_scene(self.mesh, self.scene)

    def adopt_scene(self, prev: Scene):
        """Phase handover: re-bin another phase's atoms into THIS phase's
        grid (cutoff/box/capacity may differ between `simulation K`
        sections; transplanting the old Scene would run forces on cells
        smaller than the new cutoff and silently miss pairs)."""
        flat = prev.flatten_atoms()
        mask = np.asarray(flat["mask"])
        n = int(mask.sum())
        if self.cfg.cell_capacity <= 0:
            from imd_tpu.ops.geometry import measured_capacity, with_capacity
            self.grid = with_capacity(
                self.grid,
                measured_capacity(self.grid, np.asarray(flat["pos"])[mask],
                                  safety=1.2 * self.cfg.nbl_size,
                                  dtype=self.dtype))
        self.scene = make_scene(
            self.grid, np.asarray(flat["pos"])[mask],
            mom=np.asarray(flat["mom"])[mask],
            mass=np.asarray(flat["mass"])[mask],
            type=np.asarray(flat["type"])[mask],
            vtype=np.asarray(flat["vtype"])[mask],
            id=np.asarray(flat["id"])[mask],
            dtype=self.dtype)
        if int(self.scene.overflow):
            raise RuntimeError(
                f"phase handover: {int(self.scene.overflow)} atoms "
                f"overflowed cell capacity {self.grid.capacity}")
        if int(self.scene.n_atoms()) != n:
            raise RuntimeError("phase handover lost atoms")
        self._select_engine()   # capacity may have crossed the Pallas cap
        # FEFL/BBOOST reference state keys on the handed-over scene (the
        # standard protocol relaxes in phase 1, tethers/boosts in phase 2)
        self._capture_static_refs()
        # NRB neighbor ids were captured against the OLD slot layout
        if self.nrb_state is not None:
            from imd_tpu.models import nrb as nrb_mod
            mass = (float(self.cfg.masses[0]) if self.cfg.masses
                    else 26.9815)
            self.nrb_state = nrb_mod.init_nrb(
                self.scene, self.cfg.nrb.alat, self.cfg.nrb.k,
                self.cfg.nrb.eps, mass, self.cfg.pbc_dirs)

    def _restrictions(self):
        cfg = self.cfg
        if not cfg.restrictions:
            return None
        r = np.ones((cfg.vtypes, 3), np.float64)
        for i, v in enumerate(cfg.restrictions[:cfg.vtypes]):
            r[i] = v
        return jnp.asarray(r, self.dtype)

    def _fbc(self):
        cfg = self.cfg
        if not cfg.fbc_forces:
            return None
        r = np.zeros((cfg.vtypes, 3), np.float64)
        for i, v in enumerate(cfg.fbc_forces[:cfg.vtypes]):
            r[i] = v
        return jnp.asarray(r, self.dtype)

    def _select_eos(self, FEGEos):
        """Tabulated EOS when EOS_cve/EOS_ee tables exist under eos_dir
        (the reference loads them unconditionally, imd_ttm.c:1130-1135;
        here absence falls back to the closed-form FEG model)."""
        d = self.cfg.ttm.eos_dir
        cve = self._path(os.path.join(d, "EOS_cve_from_r_te.txt"))
        ee = self._path(os.path.join(d, "EOS_ee_from_r_tesqrt.txt"))
        if os.path.exists(cve) and os.path.exists(ee):
            from imd_tpu.models.eos import TabulatedEOS
            try:
                return TabulatedEOS.load(cve, ee,
                                         self.cfg.ttm.atomic_mass,
                                         dtype=self.dtype)
            except Exception as e:    # malformed table: fail loudly
                raise RuntimeError(f"EOS table load failed: {e}") from e
        return FEGEos(atomic_mass=self.cfg.ttm.atomic_mass)

    def _select_integrator(self):
        ens = self.cfg.ensemble
        known = ("nve", "nvt", "mik", "glok", "ttm", "ber", "and", "lang",
                 "npt_iso", "npt_axial", "sllod", "damp", "frac", "ftg",
                 "finnis", "stm", "nvx", "cg")
        if ens not in known:
            raise NotImplementedError(f"ensemble '{ens}' not yet implemented")
        self.ensemble = ens
        if ens == "ttm" or self.cfg.ttm.enabled:
            from imd_tpu.models.eos import FEGEos
            # [nx] LB-compatible grid (imd_ttm.c) by default; the full
            # [nx,ny,nz] variant (imd_ttm_3D.c) when ttmdimy/z > 1
            self.ttm_3d = self.cfg.ttm.fd_ny > 1 or self.cfg.ttm.fd_nz > 1
            if self.ttm_3d:
                from imd_tpu.models import ttm3d as ttm_mod
                if self.cfg.tmm.enabled:
                    raise NotImplementedError(
                        "TMM laser source requires the 1-D TTM grid "
                        "(ttmdimy = ttmdimz = 1)")
            else:
                from imd_tpu.models import ttm as ttm_mod
            self.ttm_mod = ttm_mod
            self.cfg.ttm.enabled = True
            kw = {}
            if self.cfg.dirichlet_surfx > 0:
                # lateral room-temperature bath (imd_ttm_3D.c only)
                if self.ttm_3d:
                    kw["dirichlet_surfx"] = self.cfg.dirichlet_surfx
                else:
                    warnings.warn("dirichlet_surfx needs the 3-D TTM grid "
                                  "(ttmdimy/ttmdimz > 1); ignored on the "
                                  "1-D grid (imd_ttm_3D.c:1689)")
            self.ttm_params = ttm_mod.make_params(self.cfg.ttm, self.box,
                                                  self.cutoff, self.dtype,
                                                  **kw)
            # EOS: tabulated when the reference's EOS_*.txt tables are on
            # disk (the reference default, imd_ttm.c:1130-1135), FEG
            # closed-form otherwise
            self.eos = self._select_eos(FEGEos)
        else:
            self.ttm_params = None
            self.eos = None
            self.ttm_mod = None
            self.ttm_3d = False
        if self.cfg.tmm.enabled and self.cfg.ttm.enabled:
            from imd_tpu.models import tmm as tmm_mod
            self.tmm_params = tmm_mod.make_tmm_params(self.cfg.tmm,
                                                      self.dtype)
        else:
            self.tmm_params = None
        # FDTD Maxwell laser solver (init_fdtd, imd.c:252; do_fdtd
        # dispatch imd_main_3d.c:526-532).  1-D grid only from the driver.
        if self.cfg.fdtd.enabled and self.cfg.ttm.enabled:
            if self.tmm_params is not None:
                raise ValueError("enable either TMM or FDTD, not both")
            from imd_tpu.models import fdtd as fdtd_mod
            self.fdtd_mod = fdtd_mod
            if self.ttm_3d:
                # the reference's experimental FDTD2D mode: 2-D Maxwell
                # on a thin-slab 3-D TTM grid (imd_fdtd.c:14 requires
                # global_fd_dim.z == 1)
                if self.cfg.ttm.fd_nz != 1:
                    raise NotImplementedError(
                        "2-D FDTD coupling requires ttmdimz == 1 "
                        "(imd_fdtd.c:14); full 3-D FDTD does not exist "
                        "in the reference either")
                self.fdtd_params = fdtd_mod.make_fdtd_params_2d_from3d(
                    self.cfg.fdtd, self.ttm_params, self.dtype)
            else:
                self.fdtd_params = fdtd_mod.make_fdtd_params(
                    self.cfg.fdtd, self.ttm_params, self.dtype)
        else:
            self.fdtd_params = None
            self.fdtd_mod = None
        # COLRAD per-cell plasma kinetics (colrad_init, imd.c:268;
        # do_colrad hook of calc_ttm, imd_ttm.c:101-103)
        if self.cfg.colrad and self.cfg.ttm.enabled:
            if self.ttm_3d:
                raise NotImplementedError(
                    "COLRAD driver coupling requires the 1-D TTM grid")
            from imd_tpu.models import colrad as colrad_mod
            self.colrad_mod = colrad_mod
            # rate source selection (VERDICT r4 weak #7): prefer the
            # reference's Mott/Fermi-Dirac rate integrals when its state
            # tables are on disk; always say which source is active —
            # the closed-form fits deviate up to ~25x from the
            # reference's rates in the hot regime (test_colrad_rates.py)
            rates_mode = self.cfg.colrad_rates
            states_dir = None
            if rates_mode in ("auto", "ref"):
                cands = ([self.cfg.colrad_states_dir]
                         if self.cfg.colrad_states_dir else
                         [self.workdir,
                          os.path.join(self.workdir, "..")])
                for d in cands:
                    if d and os.path.exists(
                            os.path.join(d, "Al0_states.txt")):
                        states_dir = d
                        break
                if rates_mode == "ref" and states_dir is None:
                    raise FileNotFoundError(
                        "colrad_rates ref: no Al0_states.txt under "
                        f"{cands} (colrad_read_states, imd_colrad.c:523)")
            if states_dir is not None:
                st = colrad_mod.read_states(states_dir)
                print(f"# COLRAD rates: reference Mott/Fermi-Dirac "
                      f"integrals over state tables in {states_dir}",
                      flush=True)
                self.colrad_tab = colrad_mod.build_tables(st, rates="ref")
            else:
                st = colrad_mod.aluminium_states(self.cfg.colrad_maxz,
                                                 self.cfg.colrad_nlev)
                print("# COLRAD rates: van-Regemorter/Lotz closed-form "
                      "fits (no reference state tables found; they "
                      "deviate up to ~25x from the reference's "
                      "integrated rates in the hot-plasma regime — "
                      "provide Al*_states.txt or set colrad_rates)",
                      flush=True)
                self.colrad_tab = colrad_mod.build_tables(st)
            # MULTIPHOTON channels: photon flux phi(t) = I(t)/hv from the
            # wave solver's pulse tags (the reference's local-intensity
            # plumbing is WIP, imd_colrad.c:1498 — surface intensity here)
            mpi_const = None
            self.colrad_phi = None
            if self.cfg.colrad_mpi:
                pulse = (self.cfg.tmm if self.cfg.tmm.enabled
                         else self.cfg.fdtd if self.cfg.fdtd.enabled
                         else None)
                if pulse is None or pulse.I0 <= 0:
                    warnings.warn("colrad_mpi needs a wave-solver laser "
                                  "(lambda/I0/laser_t_0/laser_sigma_t); "
                                  "multiphoton channels disabled")
                else:
                    mpi_const = colrad_mod.mpi_constants(pulse.lambda_m)
                    inv_hnu_j = 1.0 / (mpi_const[0] * 1.602176634e-19)
                    i0, t0, sg = pulse.I0, pulse.t0_s, pulse.sigma_t_s
                    s2 = max(sg, 1e-300) ** 2
                    # second pulse of the Gaussian double pulse
                    # (TMM tags laser_t_1/laser_sigma_t1; FDTD has none)
                    t1 = getattr(pulse, "t1_s", 0.0)
                    s21 = getattr(pulse, "sigma_t1_s", 0.0) ** 2

                    def _phi(t_si, i0=i0, t0=t0, s2=s2, t1=t1, s21=s21,
                             ih=inv_hnu_j):
                        # same envelope as tmm.intensity (imd_tmm.c:197-198)
                        it = i0 * jnp.exp(-(t_si - t0) ** 2 / s2)
                        if s21 > 0.0:
                            it = it + i0 * jnp.exp(-(t_si - t1) ** 2 / s21)
                        return it * ih
                    self.colrad_phi = _phi
            # evolve_te=True is REQUIRED through apply_colrad: the step's
            # third output is written into grid.temp (imd_colrad.c:277)
            self.colrad_step = colrad_mod.make_colrad_step(
                self.colrad_tab, evolve_te=True, mpi_const=mpi_const)
        else:
            self.colrad_mod = None
            self.colrad_tab = None
            self.colrad_step = None
            self.colrad_phi = None
        # VLATTICE continuum tail (vlatdim tag; imd_ttm.c:41-59)
        if (self.cfg.ttm.enabled and self.cfg.ttm.vlatdim > 0
                and not self.ttm_3d):
            # solid density from the atomic mass at the fcc-Al reference
            # volume (amu -> kg/m^3: m_amu * 1.66054e-27 / (a0^3/4) 1e-30)
            dens0 = (self.cfg.ttm.atomic_mass * 1.66054e-27
                     / (4.05e-10 ** 3 / 4.0))
            # the reference initializes the virtual lattice at room
            # temperature (0.0264 eV hardcoded, imd_ttm.c:1038) — a
            # restart config without a starttemp tag must not seed the
            # continuum tail at ~12 K
            self.vlat_params, self.vlat_state0 = self.ttm_mod.make_vlat(
                self.cfg.ttm.vlatdim, dens0=dens0,
                t0=(self.cfg.starttemp if self.cfg.starttemp > 0
                    else 0.0264),
                dtype=self.dtype,
                atomic_z=self.cfg.ttm.atomic_z,
                atomic_mass=self.cfg.ttm.atomic_mass)
        else:
            self.vlat_params = None
            self.vlat_state0 = None
        # GLOK = adaptive-timestep FIRE relaxation (update_glok,
        # imd_main_3d.c:1018-1111), NOT plain NVE
        if ens == "glok":
            from imd_tpu import relax as relax_mod
            R = self.cfg.relax
            self.fire_cfg = relax_mod.FireConfig(
                incfac=R.fire_incfac, decfac=R.fire_decfac,
                mix0=R.fire_mix, mixdec=R.fire_mixdec,
                minsteps=R.fire_minsteps,
                max_timestep=(R.fire_maxtimestep * self.cfg.timestep
                              if R.fire_maxtimestep > 0 else 0.0),
                ekin_threshold=(R.glok_ekin_threshold
                                if R.glok_ekin_threshold > 0 else 1e30))
        else:
            self.fire_cfg = None
        if self.cfg.ep_n > 0:
            from imd_tpu.models import extpot as extpot_mod
            self.extpot0 = extpot_mod.make_extpot(self.cfg)
        else:
            self.extpot0 = None
        # FEFL Einstein tether (imd_fefl.c): REF_POS = start positions
        # (the reference reads refpos chkpt columns when present,
        # imd_io_3d.c:410; a fresh lattice start is the standard use).
        # BBOOST reference bonds (do_bb_neightab, imd_bboost.c:124).
        # Both re-capture on adopt_scene: a relax phase may precede.
        self.fefl_ref = None
        self._bb_tables = None
        self._capture_static_refs()
        if self.cfg.nrb.enabled:
            from imd_tpu.models import nrb as nrb_mod
            nrb_file = (self._path(self.cfg.restart_base + ".nrb")
                        if self.cfg.restart_base else "")
            if nrb_file and os.path.exists(nrb_file):
                # nrb_readrestart (imd_nrb.c:2217): the boundary-layer
                # detection must NOT rerun on a deformed restart config
                self.nrb_state = nrb_mod.read_nrb(nrb_file, self.dtype)
            else:
                mass = (float(self.cfg.masses[0]) if self.cfg.masses
                        else 26.9815)
                self.nrb_state = nrb_mod.init_nrb(
                    self.scene, self.cfg.nrb.alat, self.cfg.nrb.k,
                    self.cfg.nrb.eps, mass, self.cfg.pbc_dirs)
        else:
            self.nrb_state = None

    def _capture_static_refs(self):
        """FEFL reference positions + BBOOST reference bond table from
        the CURRENT scene (called again after phase handover)."""
        cfg = self.cfg
        if any(cfg.spring_rate):
            flat = self.scene.flatten_atoms()
            m = np.asarray(flat["mask"])
            ids = np.asarray(flat["id"])[m]
            ref = np.zeros((int(ids.max()) + 1, 3))
            ref[ids] = np.asarray(flat["pos"])[m]
            self.fefl_ref = jnp.asarray(ref, self.dtype)
        if cfg.bb_epscrit > 0 and cfg.bb_rcut > 0 and cfg.bb_tot_bV > 0:
            from imd_tpu.models import bboost as bb_mod
            bi, bj, r0 = bb_mod.init_bboost(self.scene, cfg.bb_rcut)
            flat = self.scene.flatten_atoms()
            m = np.asarray(flat["mask"])
            n_ids = int(np.asarray(flat["id"])[m].max()) + 1
            self._bb_tables = (bi, bj,
                               jnp.asarray(r0, self.dtype), n_ids)

    # ------------------------------------------------------------------
    # the jitted step
    # ------------------------------------------------------------------
    def _compute_forces(self, scene: Scene, count_neighbors: bool = False,
                        charges=None):
        # HOMDEF pressure relaxation consumes the stress tensor every
        # step (relax_pressure, imd_deform.c:140)
        ns = True if self.cfg.relax_rate > 0 else None
        if self.flat_inter is not None:
            from imd_tpu.models.interactions import flat_force_result
            name, _, efn, additive = self.flat_inter
            nbr = None
            if getattr(self, "_cov_nbr_K", 0):
                # large-N covalent path: fixed-K neighbor lists
                # (do_neightab/do_forces2 analog, ops/neighbors.py)
                from imd_tpu.ops.neighbors import neighbor_list
                nbr = neighbor_list(scene.pos, scene.mask, scene.grid,
                                    self._cov_nbr_rc2, self._cov_nbr_K)
            res, _ = flat_force_result(scene, efn, self.cfg.ntypes,
                                       nbr=nbr)
            if not additive:
                return res
            # TTBP: 3-body term on top of the tabulated pair engine
            base = self._compute_forces_tables(scene, count_neighbors, ns)
            return base.replace(force=base.force + res.force,
                                epot=base.epot + res.epot,
                                virial=base.virial + res.virial)
        res = self._compute_forces_tables(scene, count_neighbors, ns)
        if getattr(self, "coulomb", None):
            res = self._add_coulomb(scene, res, charges)
        return res

    def _add_coulomb(self, scene: Scene, res, charges=None):
        """Add the Ewald Coulomb terms (imd_forces_ewald.c): k-space on
        the MXU + real-space erfc through the engine-matched pair table
        (fixed per-type charges) or the dense per-atom-charge operator
        (SM variable charges).  The k-space/self/background energy is
        booked as a per-atom average (the reference accumulates it into
        tot_pot_energy the same global way)."""
        from imd_tpu.models import ewald as ew_mod
        cb = self.coulomb
        m = scene.fmask()
        n_alive = jnp.maximum(jnp.sum(m), 1.0)
        if "sm" in cb:
            if charges is None:
                chi, j0 = cb["sm"]
                charges = ew_mod.sm_equilibrate(scene, chi, j0, cb["ew"])
            e_k, F_k, w_k = ew_mod.ewald_kspace_terms_q(scene, charges,
                                                        cb["ew"])
            F_r, e_r, w_r = ew_mod.coulomb_real_dense(
                scene, charges, cb["ew"].kappa, cb["rc"])
            return res.replace(
                force=res.force + F_r + F_k,
                epot=res.epot + e_r + (e_k / n_alive) * m,
                virial=res.virial + w_r + w_k)
        if cb.get("engine") == "pallas":
            from imd_tpu.ops.forces_pallas import compute_pair_forces_pallas
            rr = compute_pair_forces_pallas(scene, cb["rtab"])
        elif cb.get("engine") == "fast":
            from imd_tpu.ops.forces_fast import compute_pair_forces_fast
            rr = compute_pair_forces_fast(scene, cb["rtab"],
                                          self.cfg.ntypes)
        else:
            rr = forces_mod.compute_pair_forces(
                scene, cb.get("rtab", cb["raw"]), self.cfg.ntypes)
        e_k, F_k, w_k = ew_mod.ewald_kspace_terms(scene, cb["charges"],
                                                  cb["ew"])
        return res.replace(
            force=res.force + rr.force + F_k,
            epot=res.epot + rr.epot + (e_k / n_alive) * m,
            virial=res.virial + rr.virial + w_k)

    def _compute_forces_tables(self, scene: Scene, count_neighbors, ns):
        if self.cfg.asympot and self.cfg.ntypes > 1:
            # asymmetric half-bond columns: oracle engine only (the
            # fast/Pallas sweeps assume grad_ij == grad_ji)
            if self.eam is not None:
                return forces_mod.compute_eam_forces(
                    scene, self.eam, self.cfg.ntypes,
                    count_neighbors=count_neighbors,
                    eeam_embed=self.eeam_embed, asympot=True)
            return forces_mod.compute_pair_forces(
                scene, self.pair, self.cfg.ntypes,
                count_neighbors=count_neighbors, asympot=True)
        if getattr(self, "use_pallas", False):
            from imd_tpu.ops.forces_pallas import (
                compute_eam_forces_pallas, compute_eam_forces_pallas_mt,
                compute_pair_forces_pallas)
            if self.eam_run is not None:
                if self.cfg.ntypes > 1:
                    return compute_eam_forces_pallas_mt(
                        scene, self.eam_run, self.cfg.ntypes,
                        count_neighbors=count_neighbors, need_stress=ns)
                return compute_eam_forces_pallas(
                    scene, self.eam_run, count_neighbors=count_neighbors,
                    need_stress=ns)
            return compute_pair_forces_pallas(
                scene, self.pair_run, count_neighbors=count_neighbors,
                need_stress=ns)
        if self.fast:
            from imd_tpu.ops import forces_fast as fm
            eam_fn, pair_fn = (fm.compute_eam_forces_fast,
                               fm.compute_pair_forces_fast)
        else:
            eam_fn, pair_fn = (forces_mod.compute_eam_forces,
                               forces_mod.compute_pair_forces)
        if self.eam is not None:
            return eam_fn(scene, self.eam, self.cfg.ntypes,
                          count_neighbors=count_neighbors,
                          eeam_embed=self.eeam_embed)
        return pair_fn(scene, self.pair, self.cfg.ntypes,
                       count_neighbors=count_neighbors)

    def _per_vtype_table(self, rows):
        if not rows:
            return None
        r = np.zeros((self.cfg.vtypes, 3), np.float64)
        for i, v in enumerate(rows[:self.cfg.vtypes]):
            r[i] = v
        return jnp.asarray(r, self.dtype)

    def _fbc_ramp(self):
        """Dynamic-loading FBC increment per step (init_fbc,
        imd_main_3d.c:1222-1240): df = (end − begin)/(steps_max −
        steps_min) for non-relaxing ensembles.  Returns a [vtypes,3]
        per-step increment or None."""
        cfg = self.cfg
        if self.ensemble in ("mik", "glok", "cg"):
            return None           # RELAX path: stepwise host increments
        end = self._per_vtype_table(cfg.fbc_endforces)
        if end is None:
            return None
        begin = self._fbc()
        if begin is None:
            begin = jnp.zeros_like(end)
        steps_diff = max(cfg.maxsteps - cfg.startstep, 1)
        return (end - begin) / steps_diff

    def _relax_drivers(self):
        """Active quasistatic loading drivers for relax ensembles
        (the RELAX protocol, imd_main_3d.c:208-330 + update_fbc 1243):
        each maps name -> per-event wait cap in steps (0 = only fire on
        relaxation)."""
        cfg = self.cfg
        if self.ensemble not in ("mik", "glok", "cg"):
            return {}
        d = {}
        if cfg.fbc_dforces and any(any(x != 0 for x in r)
                                   for r in cfg.fbc_dforces):
            d["fbc"] = cfg.max_fbc_int
        if (cfg.bend_nmoments > 0 and cfg.fbc_bdforces
                and any(any(x != 0 for x in r) for r in cfg.fbc_bdforces)):
            # the reference's bend branch also waits on max_fbc_int
            # (imd_main_3d.c:1362)
            d["bend"] = cfg.max_fbc_int
        if self.extpot0 is not None and cfg.ep_max_int > 0:
            d["extpot"] = cfg.ep_max_int
        if cfg.max_deform_int > 0 and cfg.deform_shift:
            d["deform"] = cfg.max_deform_int
        if (cfg.lindef_interval > 0
                and any(any(x != 0 for x in r) for r in
                        (cfg.lindef_x, cfg.lindef_y, cfg.lindef_z))):
            d["lindef"] = cfg.lindef_interval
        return d

    def _deform_tables(self):
        """deform_shift/shear/base as [vtypes,3] arrays (imd_param.c
        deform_shift family; deform_sample imd_deform.c:232)."""
        cfg = self.cfg
        shift = self._per_vtype_table(cfg.deform_shift)
        shear = self._per_vtype_table(cfg.deform_shear)
        base = self._per_vtype_table(cfg.deform_base)
        sd = None
        if shear is not None:
            sd = jnp.asarray(
                [1 if any(x != 0 for x in r) else 0
                 for r in (list(cfg.deform_shear)
                           + [(0.0, 0.0, 0.0)] * cfg.vtypes)[
                     :cfg.vtypes]], jnp.int32)
        return shift, shear, base, sd

    def _apply_loading_event(self, state: SimState, names):
        """Apply one quasistatic loading increment per driver in
        ``names`` and return the updated state (host-side, traced-leaf
        updates only: no retrace)."""
        cfg = self.cfg
        from imd_tpu.models import deform as deform_mod
        from imd_tpu.models import extpot as extpot_mod
        from imd_tpu.scene import rebin
        if "fbc" in names and state.fbc_offset is not None:
            df = self._per_vtype_table(cfg.fbc_dforces)
            state = state.replace(fbc_offset=state.fbc_offset + df)
        if "bend" in names and state.bfbc_offset is not None:
            df = self._per_vtype_table(cfg.fbc_bdforces)
            state = state.replace(bfbc_offset=state.bfbc_offset + df)
        if "extpot" in names and state.ep is not None:
            state = state.replace(ep=extpot_mod.move_extpot(
                state.ep, jnp.asarray(1.0, self.dtype)))
        if "deform" in names:
            shift, shear, base, sd = self._deform_tables()
            sc = deform_mod.deform_sample(
                state.scene, shift, jnp.asarray(cfg.deform_size,
                                                self.dtype),
                shear_def=sd, deform_shear=shear, deform_base=base)
            state = state.replace(scene=rebin(sc))
        if "lindef" in names:
            sc = deform_mod.lin_deform(
                state.scene, cfg.lindef_x, cfg.lindef_y, cfg.lindef_z,
                jnp.asarray(cfg.lindef_size, self.dtype))
            state = state.replace(scene=rebin(sc))
        # reset the relaxation machinery like reset_glok/reset_cg
        # (imd_main_3d.c:1111): fresh FIRE state, zeroed momenta handled
        # by FIRE's own uphill reset on the next step
        if state.fire is not None:
            from imd_tpu import relax as relax_mod
            state = state.replace(fire=relax_mod.fire_init(
                jnp.asarray(cfg.timestep, self.dtype), self.fire_cfg))
        return state

    def _write_ss(self, state: SimState, sscount: int, ssdef,
                  nactive: float):
        """One quasistatic event record: .ssdef row + .ss config snapshot
        (write_ssdef imd_io.c:2665, write_ssconfig imd_io.c:210)."""
        cfg = self.cfg
        flat = state.scene.flatten_atoms()
        mask = np.asarray(flat["mask"])
        vt = np.asarray(flat["vtype"])[mask]
        force = np.asarray(flat["force"])[mask]
        vt_force = np.zeros((cfg.vtypes, 3))
        np.add.at(vt_force, np.clip(vt, 0, cfg.vtypes - 1), force)
        fbc = self._fbc()
        fbc = None if fbc is None else np.asarray(fbc)
        if state.fbc_offset is not None:
            fbc = (np.asarray(state.fbc_offset) if fbc is None
                   else fbc + np.asarray(state.fbc_offset))
        # pressure columns are intensive (tot_presstens/volume,
        # imd_io.c:2755-2762)
        vol = float(np.asarray(state.scene.grid.box.volume))
        ssdef.write(int(state.step), int(state.step),
                    float(state.epot_total), float(state.stats.fnorm),
                    np.asarray(state.scene.grid.box.h), fbc,
                    np.asarray(state.presstens) / max(vol, 1e-30),
                    vt_force)
        mass = np.asarray(flat["mass"])[mask]
        d = ChkptData(
            number=np.asarray(flat["id"])[mask],
            type=vt, mass=mass,
            pos=np.asarray(flat["pos"])[mask],
            vel=np.asarray(flat["mom"])[mask] / mass[:, None],
            data=np.asarray(flat["epot"])[mask][:, None],
            box_x=np.asarray(state.scene.grid.box.h)[0],
            box_y=np.asarray(state.scene.grid.box.h)[1],
            box_z=np.asarray(state.scene.grid.box.h)[2])
        base = self._path(f"{cfg.outfiles}.{sscount:05d}")
        write_chkpt(base + ".ss", d,
                    binary=bool(self.cfg.binary_output))
        write_itr(base + ".ssitr", checkpoint=sscount,
                  startstep=int(state.step) + 1,
                  box_x=d.box_x, box_y=d.box_y, box_z=d.box_z)

    def _rigid_tables(self):
        """superatom / supermass / superrestrictions from the parsed
        rigid groups (imd_param.c:818-844).  supermass is the total
        mass of the group's atoms in the initial scene."""
        cfg = self.cfg
        if not cfg.rigid_groups:
            return None, None, None
        sa = -np.ones(cfg.vtypes, np.int32)
        restr = np.zeros((len(cfg.rigid_groups), 3), np.float64)
        for s, (vts, rmask) in enumerate(cfg.rigid_groups):
            for v in vts:
                if v >= cfg.vtypes:
                    raise ValueError(
                        "Atom type in superparticle does not exist")
                sa[v] = s
            restr[s] = rmask
        flat = self.scene.flatten_atoms()
        mask = np.asarray(flat["mask"])
        vt = np.asarray(flat["vtype"])[mask]
        ms = np.asarray(flat["mass"])[mask]
        group = sa[np.clip(vt, 0, cfg.vtypes - 1)]
        smass = np.zeros(len(cfg.rigid_groups))
        np.add.at(smass, group[group >= 0], ms[group >= 0])
        return (jnp.asarray(sa), jnp.asarray(smass, self.dtype),
                jnp.asarray(restr, self.dtype))

    def _bend_static(self):
        """Static bend-moment tables: vtype ids, unit axes, group atom
        counts captured from the initial scene (init_bend,
        imd_main_3d.c:1528-1670) and the per-moment b-FBC magnitude."""
        cfg = self.cfg
        if cfg.bend_nmoments <= 0:
            return None
        flat = self.scene.flatten_atoms()
        mask = np.asarray(flat["mask"])
        vt = np.asarray(flat["vtype"])[mask]
        n_o = np.array([np.sum(vt == v) for v in cfg.bend_origin_vtype],
                       np.float64)
        n_f = np.array([np.sum(vt == v) for v in cfg.bend_force_vtype],
                       np.float64)
        if np.any(n_o == 0):
            raise ValueError("bending moment defined without atoms at "
                             "origin")
        if np.any(n_f == 0):
            raise ValueError("bending moment defined without atoms to "
                             "apply force to")
        bf_begin = self._per_vtype_table(cfg.fbc_bforces)
        if bf_begin is None:
            bf_begin = jnp.zeros((cfg.vtypes, 3), self.dtype)
        bf_df = None
        bf_end = self._per_vtype_table(cfg.fbc_endbforces)
        if bf_end is not None and self.ensemble not in ("mik", "glok",
                                                        "cg"):
            # b-FBC dynamic loading (init_bfbc, imd_main_3d.c:1328-1340)
            bf_df = (bf_end - bf_begin) / max(cfg.maxsteps
                                              - cfg.startstep, 1)
        return dict(
            origin_vt=jnp.asarray(cfg.bend_origin_vtype, jnp.int32),
            force_vt=jnp.asarray(cfg.bend_force_vtype, jnp.int32),
            axes_mom=jnp.asarray(cfg.bend_axes, self.dtype),
            n_origin=jnp.asarray(n_o, self.dtype),
            n_force=jnp.asarray(n_f, self.dtype),
            bf_begin=bf_begin, bf_df=bf_df)

    def integrator_params(self, temperature: jnp.ndarray, step=None,
                          rigid=None, fbc_offset=None) -> integrate.IntegratorParams:
        cfg = self.cfg
        fbc = self._fbc()
        fbc_df = self._fbc_ramp()
        if fbc_df is not None and step is not None:
            # linear dynamic loading (update_fbc, imd_main_3d.c:1280-88)
            t = (step - cfg.startstep).astype(self.dtype)
            fbc = (jnp.zeros_like(fbc_df) if fbc is None else fbc) \
                + fbc_df * t
        if fbc_offset is not None:
            # quasistatic RELAX increments accumulated at relaxation
            # events (update_fbc, imd_main_3d.c:1255-1270)
            fbc = (jnp.zeros_like(fbc_offset) if fbc is None else fbc) \
                + fbc_offset
        # rigid tables are host-derived from the initial scene; callers
        # inside a trace must pass them in (computed in make_step_fn)
        superatom, supermass, superrestr = (
            rigid if rigid is not None else self._rigid_tables())
        return integrate.IntegratorParams(
            timestep=jnp.asarray(cfg.timestep, self.dtype),
            temperature=jnp.asarray(temperature, self.dtype),
            isq_tau_eta=jnp.asarray(cfg.isq_tau_eta, self.dtype),
            tau_berendsen=jnp.asarray(cfg.tau_berendsen, self.dtype),
            viscous_friction=jnp.asarray(cfg.viscous_friction, self.dtype),
            xipdecay=jnp.asarray(cfg.xipdecay, self.dtype),
            ramp_start=jnp.asarray(cfg.ramp_start, self.dtype),
            ramp_end=jnp.asarray(cfg.ramp_end, self.dtype),
            restrictions=self._restrictions(),
            fbc_forces=fbc,
            superatom=superatom,
            supermass=supermass,
            superrestrictions=superrestr,
        )

    def _ramp_temperature(self, step):
        cfg = self.cfg
        if cfg.endtemp > 0 and cfg.maxsteps > 0 and cfg.endtemp != cfg.starttemp:
            frac = jnp.clip(step.astype(self.dtype) / cfg.maxsteps, 0.0, 1.0)
            return cfg.starttemp + (cfg.endtemp - cfg.starttemp) * frac
        return jnp.asarray(max(cfg.starttemp, 0.0), self.dtype)

    def make_step_fn(self) -> Callable[[SimState], SimState]:
        """Build the pure jittable step; ensembles without extra subsystem
        state close over static config."""
        cfg = self.cfg
        nactive = integrate.count_active_dof(self.scene, self._restrictions())
        pdecay = cfg.pdecay_mode > 0 or cfg.xipdecay > 0
        nclones = max(int(cfg.nclones), 1)
        if nclones > 1:
            ids_h = np.asarray(self.scene.id)
            alive_h = np.asarray(self.scene.mask)
            clone_id_base = int(ids_h[alive_h].min()) if alive_h.any() else 0
            clone_ngroups = (int(ids_h[alive_h].max()) - clone_id_base) \
                // nclones + 1
        bend = self._bend_static()
        rigid = self._rigid_tables()

        if cfg.ttm.enabled:
            ttm_mod = self.ttm_mod
        if self.nrb_state is not None:
            from imd_tpu.models import nrb as nrb_mod
        if cfg.filter.enabled and cfg.filter.interval > 0:
            from imd_tpu.models import filter as filter_mod

        def step_fn(state: SimState) -> SimState:
            scene = state.scene
            ttm_grid, fdi = state.ttm_grid, state.fdi
            # every re-sort (skin rebin, FILTER deletion) permutes the
            # slot layout; the stored per-atom FD index travels WITH its
            # atom through them (move_atom carries fdi/fdj/fdk,
            # types.h:327; imd_fix_cells_3d.c) so advection fluxes
            # survive rebin steps instead of being suppressed — and so
            # the fdi <-> slot correspondence never goes stale
            carry_fdi = (fdi is not None
                         and fdi.shape == scene.type.shape)
            from imd_tpu.scene import rebin_with
            # FILTER: delete disconnected plume atoms every filter_int
            # steps (imd_filter.c; deletion realized at the rebin)
            if cfg.filter.enabled and cfg.filter.interval > 0:
                filter_now = ((state.step > 0)
                              & (state.step % cfg.filter.interval == 0))
                if carry_fdi:
                    def do_filter(args):
                        s, f = args
                        s2, _ = filter_mod.filter_atoms(s, cfg.filter,
                                                        self.cutoff)
                        s3, ex = rebin_with(s2, {"fdi": f})
                        return s3, ex["fdi"]
                    scene, fdi = jax.lax.cond(filter_now, do_filter,
                                              lambda a: a, (scene, fdi))
                else:
                    def do_filter1(s):
                        s2, _ = filter_mod.filter_atoms(s, cfg.filter,
                                                        self.cutoff)
                        return rebin(s2)
                    scene = jax.lax.cond(filter_now, do_filter1,
                                         lambda s: s, scene)
            do_it = needs_rebin(scene, self.grid.skin)
            if carry_fdi:
                def do_rebin(args):
                    s, f = args
                    s2, ex = rebin_with(s, {"fdi": f})
                    return s2, ex["fdi"]

                scene, fdi = jax.lax.cond(do_it, do_rebin,
                                          lambda a: a, (scene, fdi))
            else:
                scene = jax.lax.cond(do_it, rebin, lambda s: s, scene)
            nbl_count = state.nbl_count + do_it.astype(jnp.int32)
            charges = state.charges
            if charges is not None:
                # SM charge equilibration every charge_update_steps
                # (imd_sm.c:335); forced after a rebin, which permutes
                # the slot <-> charge correspondence
                from imd_tpu.models.ewald import sm_equilibrate
                chi, j0 = self.coulomb["sm"]
                upd = max(cfg.charge_update_steps, 1)
                charges = jax.lax.cond(
                    (state.step % upd == 0) | do_it,
                    lambda s: sm_equilibrate(s, chi, j0,
                                             self.coulomb["ew"]),
                    lambda s: charges, scene)
            res = self._compute_forces(scene,
                                       count_neighbors=cfg.ttm.enabled,
                                       charges=charges)
            scene = scene.replace(force=res.force, epot=res.epot)
            if self.fefl_ref is not None:
                # Frenkel-Ladd mixing right after the force call
                # (imd_main_3d.c:422-423)
                from imd_tpu.models.fefl import calc_fefl
                scene, _ = calc_fefl(scene, self.fefl_ref,
                                     cfg.spring_rate, cfg.fefl_lambda)
            bb_dv = None
            if self._bb_tables is not None:
                # bond-boost bias on the reference bond strains
                # (imd_bboost.c; Miron-Fichthorn envelope)
                from imd_tpu.models import bboost as bb_mod
                bbi, bbj, bbr0, bb_nids = self._bb_tables
                scene, bb_dv, _ = bb_mod.bond_boost(
                    scene, bbi, bbj, bbr0,
                    jnp.asarray(cfg.bb_tot_bV, self.dtype),
                    jnp.asarray(cfg.bb_epscrit, self.dtype), bb_nids)
            ep = state.ep
            if ep is not None:
                from imd_tpu.models import extpot as extpot_mod
                f_ep, e_ep, _ = extpot_mod.extpot_forces(scene, ep)
                scene = scene.replace(force=scene.force + f_ep,
                                      epot=scene.epot + e_ep)
                if not (self.ensemble in ("mik", "glok", "cg")
                        and cfg.ep_max_int > 0):
                    # dynamic indenter motion; in quasistatic RELAX mode
                    # (ep_max_int > 0) the indenter only steps at
                    # relaxation events, by move_extpot(1.0) on the host
                    # (imd_main_3d.c:210-231)
                    ep = extpot_mod.move_extpot(
                        ep, jnp.asarray(cfg.timestep, self.dtype))
            nrb_mask = None
            if self.nrb_state is not None:
                scene, nrb_mask = nrb_mod.nrb_forces(scene, self.nrb_state)
            if nclones > 1:
                # CLONE lockstep replicas (imd_integrate.c:118-132)
                scene = integrate.clone_sync(scene, nclones, clone_ngroups,
                                             clone_id_base)
            temp = self._ramp_temperature(state.step)
            params = self.integrator_params(temp, state.step, rigid,
                                            fbc_offset=state.fbc_offset)
            if bend is not None:
                # per-step bending-force directions (update_bend,
                # imd_main_3d.c:615)
                bfv = bend["bf_begin"]
                if bend["bf_df"] is not None:
                    bfv = bfv + bend["bf_df"] * (
                        state.step - cfg.startstep).astype(self.dtype)
                if state.bfbc_offset is not None:
                    # quasistatic bend increments (imd_main_3d.c:1362)
                    bfv = bfv + state.bfbc_offset
                mag = jnp.linalg.norm(bfv[bend["force_vt"]], axis=1)
                params = params.replace(
                    bend_forces=integrate.bend_force_table(
                        scene, bend["origin_vt"], bend["force_vt"],
                        bend["axes_mom"], bend["n_origin"],
                        bend["n_force"], mag, cfg.vtypes))
            eta = state.eta
            new_fdtd, new_cstate, new_vstate = (state.fdtd, state.cstate,
                                                state.vstate)
            if cfg.ttm.enabled:
                # (fdi survives the rebin above — no invalidation)
                t = state.step.astype(self.dtype) * cfg.timestep
                dt_j = jnp.asarray(cfg.timestep, self.dtype)
                if self.fdtd_params is not None:
                    # FDTD Maxwell laser source (do_fdtd dispatch,
                    # imd_main_3d.c:526-532 / imd_ttm_3D.c:110-180)
                    ttm_grid, fdi, new_fdtd = ttm_mod.calc_ttm_fdtd(
                        ttm_grid, state.fdtd, scene, self.ttm_params,
                        self.eos, self.fdtd_params, res.num_neighs, fdi,
                        cfg.timestep, t, first_step=(state.step == 0))
                else:
                    kw = {} if self.ttm_3d else {
                        "tmm_params": self.tmm_params}
                    if self.colrad_tab is not None:
                        kw["colrad"] = (self.colrad_tab, self.colrad_step,
                                        state.cstate, self.colrad_phi)
                    if self.vlat_params is not None:
                        kw["vlat"] = (self.vlat_params, state.vstate)
                    out = ttm_mod.calc_ttm(
                        ttm_grid, scene, self.ttm_params, self.eos,
                        res.num_neighs, fdi, dt_j, t,
                        laser_cfg=(cfg.laser if cfg.laser.sigma_e > 0
                                   else None),
                        first_step=(state.step == 0), **kw)
                    ttm_grid, fdi = out[0], out[1]
                    k = 2
                    if self.colrad_tab is not None:
                        new_cstate = out[k]
                        k += 1
                    if self.vlat_params is not None:
                        new_vstate = out[k]
                xi_atom, vcom = ttm_mod.gather_atom_coupling(
                    ttm_grid, scene, self.ttm_params)
                epress_atom = None
                if cfg.ttm.elecpress:
                    ep_cell = ttm_mod.electron_pressure_force(
                        ttm_grid, self.ttm_params, self.eos)
                    if self.ttm_3d:    # [nx,ny,nz,3] -> flat gather
                        ep_cell = ep_cell.reshape(
                            self.ttm_params.n_cells, 3)
                    epress_atom = ep_cell[ttm_mod.fd_index(
                        scene, self.ttm_params)]
                scene, stats = integrate.ttm(scene, params, xi_atom, vcom,
                                             pdecay=pdecay,
                                             nrb_mask=nrb_mask,
                                             epress_atom=epress_atom)
            elif self.ensemble == "glok":
                # GLOK = NVE at the FIRE-adaptive timestep + post-step
                # half-step-back/momentum-mix correction (update_glok,
                # imd_main_3d.c:1018-1111) — NOT plain NVE
                from imd_tpu import relax as relax_mod
                scene, stats = integrate.nve(
                    scene, params.replace(timestep=state.fire.timestep),
                    pdecay=pdecay, nrb_mask=nrb_mask)
                scene, fire = relax_mod.fire_update(
                    scene, stats, state.fire, self.fire_cfg, nactive)
            elif self.ensemble == "nve":
                scene, stats = integrate.nve(scene, params, pdecay=pdecay,
                                             nrb_mask=nrb_mask)
            elif self.ensemble == "mik":
                scene, stats = integrate.mik(scene, params)
            elif self.ensemble == "ber":
                scene, stats = integrate.berendsen(
                    scene, params, nactive, state.stats.tot_kin_energy)
            elif self.ensemble == "nvt":
                scene, stats, eta = integrate.nvt(scene, params, nactive, eta)
            elif self.ensemble == "lang":
                key, sub = jax.random.split(state.rng)
                scene, stats = integrate.langevin(scene, params, sub,
                                                  pdecay=pdecay,
                                                  nrb_mask=nrb_mask)
            elif self.ensemble == "and":
                # Andersen: NVE + periodic rethermalization
                # (imd_integrate.c:555-559)
                scene, stats = integrate.nve(scene, params, pdecay=pdecay,
                                             nrb_mask=nrb_mask)
                key = state.rng
                if cfg.tempintv > 0:
                    key, sub = jax.random.split(state.rng)
                    scene = jax.lax.cond(
                        (state.step + 1) % cfg.tempintv == 0,
                        lambda s: integrate.maxwell(
                            s, params.temperature, sub,
                            restrictions=params.restrictions),
                        lambda s: s, scene)
            elif self.ensemble in ("npt_iso", "npt_axial"):
                frac = jnp.clip(state.step.astype(self.dtype)
                                / max(cfg.maxsteps, 1), 0.0, 1.0)
                p_ext = cfg.pressure_start + (
                    cfg.pressure_end - cfg.pressure_start) * frac
                npt = integrate.NPTState(eta=eta, xi=state.xi,
                                         ekin_old=state.ekin_old)
                if self.ensemble == "npt_iso":
                    scene, stats, npt = integrate.npt_iso(
                        scene, params, npt, nactive, res.virial,
                        jnp.asarray(cfg.isq_tau_xi, self.dtype), p_ext)
                else:
                    scene, stats, npt = integrate.npt_axial(
                        scene, params, npt, nactive, res.presstens,
                        jnp.asarray(cfg.isq_tau_xi, self.dtype),
                        jnp.full((3,), p_ext, self.dtype))
                eta = npt.eta
            elif self.ensemble == "sllod":
                scene, stats, eta = integrate.sllod(
                    scene, params, nactive, eta,
                    jnp.asarray(cfg.shear_rate, self.dtype),
                    jnp.asarray(cfg.shear_rate2, self.dtype))
            elif self.ensemble == "damp":
                scene, stats = integrate.damp(
                    scene, params, self._stadium_center(),
                    cfg.stadium, cfg.stadium2,
                    jnp.asarray(cfg.zeta_0, self.dtype),
                    jnp.asarray(cfg.damptemp, self.dtype),
                    cfg.delta_finnis)
            elif self.ensemble == "frac":
                deps = integrate.expansion_rate(
                    cfg.dotepsilon0, cfg.expansionmode,
                    state.step.astype(self.dtype), cfg.timestep)
                scene, stats, gamma = integrate.frac(
                    scene, params, self._stadium_center(),
                    cfg.stadium, cfg.stadium2, state.gamma,
                    jnp.asarray(cfg.gamma_bar, self.dtype), deps,
                    cfg.dampingmode)
            elif self.ensemble == "ftg":
                deps = integrate.expansion_rate(
                    cfg.dotepsilon0, cfg.expansionmode,
                    state.step.astype(self.dtype), cfg.timestep)
                scene, stats, gamma = integrate.ftg(
                    scene, params, cfg.nslices, cfg.nslices_left,
                    cfg.nslices_right,
                    jnp.asarray(cfg.tleft, self.dtype),
                    jnp.asarray(cfg.tright, self.dtype), state.gamma,
                    jnp.asarray(cfg.gamma_bar, self.dtype),
                    jnp.asarray(cfg.gamma_min, self.dtype),
                    cfg.delta_ftg, deps, cfg.dampingmode,
                    center=self._stadium_center(),
                    stadium=cfg.stadium if cfg.stadium[1] != 0 else None,
                    stadium2=cfg.stadium2)
            elif self.ensemble == "finnis":
                scene, stats = integrate.finnis(
                    scene, params, jnp.asarray(cfg.zeta_0, self.dtype),
                    cfg.delta_finnis)
            elif self.ensemble == "stm":
                scene, stats, eta = integrate.stm(
                    scene, params, self._stadium_center(), cfg.stadium,
                    nactive, eta)
            elif self.ensemble == "nvx":
                scene, stats, _ = integrate.nvx(
                    scene, params, cfg.hc_nlayers,
                    jnp.asarray(cfg.hc_heatcurr, self.dtype))
            else:
                raise NotImplementedError(self.ensemble)
            if cfg.zapp_threshold > 0:
                # total-momentum zeroing (zapp(), imd_main_3d.c:611)
                scene = integrate.zapp(scene, params.restrictions,
                                       cfg.zapp_threshold)
            if cfg.shock_mode in (3, 4):
                scene = integrate.shock_mirrors(
                    scene, cfg.shock_mode, state.step.astype(self.dtype),
                    params.timestep,
                    jnp.asarray(cfg.shock_speed_left or cfg.shock_speed,
                                self.dtype),
                    jnp.asarray(cfg.shock_speed_right or cfg.shock_speed,
                                self.dtype))
            new_xi = state.xi
            new_ekin = state.ekin_old
            gamma = (gamma if self.ensemble in ("frac", "ftg")
                     else state.gamma)
            if self.ensemble in ("npt_iso", "npt_axial"):
                new_xi, new_ekin = npt.xi, npt.ekin_old
            new_rng = state.rng
            if self.ensemble in ("lang", "and") and state.rng is not None:
                new_rng = key
            new_fire = fire if self.ensemble == "glok" else state.fire
            if cfg.relax_rate > 0 and cfg.bulk_module > 0:
                # HOMDEF pressure relaxation toward presstens_ext EVERY
                # step (main loop hook imd_main_3d.c:800,
                # relax_pressure imd_deform.c:127): box.h is a traced
                # Scene leaf, so the per-step rescale stays inside jit
                from imd_tpu.models.deform import relax_pressure_tensor
                scene = relax_pressure_tensor(
                    scene, res.presstens,
                    jnp.asarray(cfg.presstens_ext, self.dtype),
                    cfg.bulk_module,
                    cfg.shear_module if cfg.shear_module > 0
                    else cfg.bulk_module,
                    cfg.relax_mode, cfg.relax_dirs, cfg.relax_rate)
            bb_time = state.bb_time
            if bb_time is not None and bb_dv is not None:
                # hyperdynamics clock: dt * exp(dV / k_B T) per step.
                # T = thermostat target when set, else the instantaneous
                # kinetic temperature (NVE from a checkpoint has no
                # target; dividing by ~0 overflowed the clock to inf)
                from imd_tpu.models.bboost import boost_factor
                t_bb = jnp.where(
                    temp > 1e-12, temp,
                    2.0 * stats.tot_kin_energy / jnp.maximum(nactive,
                                                             1.0))
                bb_time = bb_time + (jnp.asarray(cfg.timestep, self.dtype)
                                     * boost_factor(bb_dv, t_bb))
            return SimState(scene=scene, step=state.step + 1, eta=eta,
                            epot_total=jnp.sum(res.epot), virial=res.virial,
                            presstens=res.presstens, stats=stats,
                            nbl_count=nbl_count, ttm_grid=ttm_grid, fdi=fdi,
                            xi=new_xi, ekin_old=new_ekin, rng=new_rng,
                            gamma=gamma, ep=ep, fire=new_fire,
                            fdtd=new_fdtd, cstate=new_cstate,
                            vstate=new_vstate,
                            fbc_offset=state.fbc_offset,
                            bfbc_offset=state.bfbc_offset,
                            bb_time=bb_time, charges=charges)

        return step_fn

    def _stadium_center(self):
        """Config `center`, defaulting to the box center when unset."""
        if any(self.cfg.center):
            return self.cfg.center
        h = self.box.heights()
        return (float(h[0]) / 2, float(h[1]) / 2, float(h[2]) / 2)

    def init_state(self) -> SimState:
        z = jnp.zeros((), self.dtype)
        ttm_grid = fdi = None
        fdtd_state = cstate = vstate = fire = None
        if self.cfg.ttm.enabled:
            ttm_grid = self.ttm_mod.make_grid(self.ttm_params, self.dtype)
            if self.cfg.ttm.init_t_el > 0:
                ttm_grid = ttm_grid.replace(
                    temp=jnp.full_like(ttm_grid.temp, self.cfg.ttm.init_t_el),
                    init_done=jnp.ones((), bool))
            if self.mesh is not None and not self.ttm_3d:
                from imd_tpu.parallel.mesh import shard_ttm
                ttm_grid = shard_ttm(self.mesh, ttm_grid)
            fdi = -jnp.ones(self.scene.type.shape, jnp.int32)
            if self.fdtd_params is not None:
                mk = (self.fdtd_mod.make_state_2d if self.ttm_3d
                      else self.fdtd_mod.make_state)
                fdtd_state = mk(self.fdtd_params, self.dtype)
            if self.colrad_tab is not None:
                cstate = self.colrad_mod.init_grid_state(
                    self.colrad_tab, self.ttm_params.nx, self.dtype)
            if self.vlat_params is not None:
                vstate = self.vlat_state0
            # restart: restore the grid + subsystem state written by
            # write_checkpoint (ttm_read, imd_ttm.c:1983; colrad_read,
            # imd_colrad.c:3028; FDTD field columns)
            rb = self.cfg.restart_base
            if rb:
                from imd_tpu.io.ttm_io import (colrad_from_ttm,
                                               grid_from_ttm,
                                               read_ttm_aux)
                ttm_file = self._path(rb + ".ttm")
                if os.path.exists(ttm_file):
                    ttm_grid = grid_from_ttm(ttm_file, ttm_grid,
                                             self.dtype)
                    if cstate is not None:
                        c = colrad_from_ttm(ttm_file,
                                            self.colrad_tab.n_lev,
                                            self.dtype)
                        if c is not None:
                            cstate = cstate.replace(
                                c=c.reshape(cstate.c.shape))
                aux_file = self._path(rb + ".ttmaux.npz")
                if os.path.exists(aux_file):
                    from imd_tpu.io.ttm_io import (fdi_from_aux,
                                                   grid_overlay_from_aux)
                    # undo the text .ttm's %e truncation with the
                    # full-precision binary snapshot (restart
                    # continuity at f64; reference .ttm-only restarts
                    # still work without the sidecar)
                    ttm_grid = grid_overlay_from_aux(aux_file, ttm_grid)
                    fdi_r = fdi_from_aux(aux_file, self.scene.id,
                                         self.scene.mask)
                    if fdi_r is not None:
                        fdi = jnp.asarray(fdi_r)
                    f2, v2 = read_ttm_aux(aux_file,
                                          fdtd_template=fdtd_state,
                                          vlat_template=vstate)
                    fdtd_state = f2 if f2 is not None else fdtd_state
                    vstate = v2 if v2 is not None else vstate
                elif vstate is not None and os.path.exists(ttm_file):
                    # reference-written .ttm: vlat rides as natoms=-2
                    # rows (imd_ttm.c:1926)
                    from imd_tpu.io.ttm_io import vlat_from_ttm
                    v2 = vlat_from_ttm(ttm_file, vstate)
                    vstate = v2 if v2 is not None else vstate
        # fused-path capacity-cap fallback: continue with the evolved
        # TTM/aux state instead of re-initializing
        ov = getattr(self, "_handover", None)
        if ov:
            ttm_grid = ov.get("ttm_grid", ttm_grid)
            fdtd_state = ov.get("fdtd", fdtd_state)
            cstate = ov.get("cstate", cstate)
            vstate = ov.get("vstate", vstate)
        if self.ensemble == "glok":
            from imd_tpu import relax as relax_mod
            fire = relax_mod.fire_init(
                jnp.asarray(self.cfg.timestep, self.dtype), self.fire_cfg)
        xi = ekin_old = rng = None
        if self.cfg.ensemble in ("npt_iso", "npt_axial"):
            xi = (jnp.asarray(self.cfg.xi[0], self.dtype)
                  if self.cfg.ensemble == "npt_iso"
                  else jnp.asarray(self.cfg.xi, self.dtype))
            ekin_old = z
        if self.cfg.ensemble in ("lang", "and"):
            rng = jax.random.PRNGKey(self.cfg.seed + 1)
        gamma = None
        if self.cfg.ensemble == "frac":
            gamma = jnp.asarray(self.cfg.gamma_damp, self.dtype)
        elif self.cfg.ensemble == "ftg":
            gamma = jnp.full((self.cfg.nslices,), self.cfg.gamma_damp,
                             self.dtype)
        fbc_offset = bfbc_offset = None
        drv = self._relax_drivers()
        if "fbc" in drv:
            fbc_offset = jnp.zeros((self.cfg.vtypes, 3), self.dtype)
        if "bend" in drv:
            bfbc_offset = jnp.zeros((self.cfg.vtypes, 3), self.dtype)
        return SimState(scene=self.scene,
                        step=jnp.asarray(self.step_count, jnp.int32),
                        eta=jnp.asarray(self.cfg.eta, self.dtype),
                        epot_total=z, virial=z,
                        presstens=jnp.zeros((6,), self.dtype),
                        stats=_initial_stats(self.dtype),
                        nbl_count=jnp.zeros((), jnp.int32),
                        ttm_grid=ttm_grid, fdi=fdi,
                        xi=xi, ekin_old=ekin_old, rng=rng, gamma=gamma,
                        ep=self.extpot0, fire=fire, fdtd=fdtd_state,
                        cstate=cstate, vstate=vstate,
                        fbc_offset=fbc_offset, bfbc_offset=bfbc_offset,
                        bb_time=(jnp.zeros((), self.dtype)
                                 if self._bb_tables is not None else None),
                        charges=(jnp.zeros(self.scene.type.shape,
                                           self.dtype)
                                 if (getattr(self, "coulomb", None)
                                     and "sm" in self.coulomb)
                                 else None))

    # ------------------------------------------------------------------
    # host loop with I/O
    # ------------------------------------------------------------------
    def _fused_eligible(self) -> bool:
        """The benched fused cells-last hot loop (ops/fused_step.py)
        covers plain NVE and 1-D-TTM runs — including the reference's
        flagship configuration (TTM + TMM Helmholtz laser + NRB rear
        boundary + FILTER plume deletion); the remaining per-step
        subsystems use the general step."""
        cfg = self.cfg
        if not getattr(self, "use_pallas", False) or self.eam_run is None:
            return False
        if cfg.ntypes > 4:       # mt kernels are one-hot column selects
            return False
        if self.mesh is not None:
            # x-only decompositions run the sharded fused hot loop
            # (shard_mapped Pallas sweeps + explicit halo permutes,
            # parallel/fused_shard.py); other mesh shapes fall back to
            # the general GSPMD step
            from imd_tpu.parallel.fused_shard import shardable
            if not shardable(self.grid, self.mesh):
                return False
        if cfg.filter.enabled and cfg.filter.interval <= 0:
            return False
        if cfg.getmin or cfg.getsaddle:
            return False  # PxF sign tracking needs per-step host stats
        if cfg.nclones > 1:
            return False             # CLONE syncs clones in the step
        if self.extpot0 is not None or cfg.shock_mode:
            return False
        if cfg.pdecay_mode or cfg.xipdecay:
            return False
        if self._restrictions() is not None or self._fbc() is not None:
            return False
        if (cfg.zapp_threshold > 0 or cfg.bend_nmoments > 0
                or cfg.rigid_groups or cfg.fbc_endforces
                or cfg.fbc_dforces or cfg.fbc_bdforces):
            return False
        if (cfg.relax_rate > 0 or cfg.lindef_interval > 0
                or cfg.max_deform_int > 0 or cfg.ep_max_int > 0):
            # HOMDEF/DEFORM deformation drivers and quasistatic loading
            # run through the general step
            return False
        if any(cfg.spring_rate):     # FEFL mixes forces per step
            return False
        if cfg.epitax_rate and any(r > 0 for r in cfg.epitax_rate):
            return False             # EPITAX inserts atoms host-side
        if self._bb_tables is not None:
            return False             # BBOOST biases forces per step
        if self.flat_inter is not None:
            return False             # analytic interactions: flat engine
        if getattr(self, "coulomb", None):
            return False             # Ewald terms add to every step
        if cfg.endtemp > 0 and cfg.endtemp != cfg.starttemp:
            return False
        if self.ensemble == "nve":
            return not cfg.ttm.enabled
        if self.ensemble == "ttm":
            return (not self.ttm_3d
                    and cfg.laser.rescale_mode in (0, 4))
        return False

    def _regrid_scene(self, scene: Scene,
                      max_capacity: int = 32) -> Optional[Scene]:
        """Density-adaptive re-gridding: re-derive the cell grid for the
        CURRENT atom distribution and re-bin, keeping the capacity under
        the Pallas VMEM cap.

        The reference re-derives its cell grid whenever the geometry
        changes (init_cells re-runs from the box, imd_geom_3d.c:118-170)
        and grows per-cell storage freely (alloc_cell, imd_alloc.c:551).
        Our static-shape analog under a capacity cap: when laser-shock
        compression packs cells past cap 32, search the grid-dims space
        again with the MEASURED current occupancy (optimize_grid_dims
        max_capacity) — finer cells lower per-cell occupancy by the
        volume ratio, so the fused Pallas hot loop survives the whole
        ablation instead of falling back to the general engine.

        Returns the re-binned Scene (sharded when a mesh is active), or
        None when no feasible grid exists / re-gridding cannot help —
        the caller then falls back to the general engine.
        """
        from imd_tpu.ops.geometry import optimize_grid_dims
        flat = scene.flatten_atoms()
        mask = np.asarray(flat["mask"])
        pos = np.asarray(flat["pos"], np.float64)[mask]
        got = optimize_grid_dims(
            self.box, self.grid.cutoff, self.grid.skin, pos,
            dtype=self.dtype, dims_multiple=self._grid_dims_multiple,
            headroom_slots=2, max_capacity=max_capacity)
        if got is None:
            return None
        dims, cap = got
        same_dims = tuple(dims) == tuple(self.grid.dims)
        if same_dims and cap <= self.grid.capacity:
            return None            # nothing a re-bin could change
        new_grid = CellGrid(box=self.box, dims=tuple(dims),
                            capacity=int(cap), cutoff=self.grid.cutoff,
                            skin=self.grid.skin)
        kw = dict(mom=np.asarray(flat["mom"])[mask],
                  mass=np.asarray(flat["mass"])[mask],
                  type=np.asarray(flat["type"])[mask],
                  vtype=np.asarray(flat["vtype"])[mask],
                  id=np.asarray(flat["id"])[mask],
                  dtype=self.dtype)
        new_scene = make_scene(new_grid, pos, **kw)
        while int(new_scene.overflow) > 0:
            # occupancy measurement and binning should agree; defend
            # against one-ulp boundary flips like the setup path does
            cap = ((cap + 8 + 7) // 8) * 8
            if cap > max_capacity:
                return None
            new_grid = new_grid.replace(capacity=cap)
            new_scene = make_scene(new_grid, pos, **kw)
        print(f"# density re-grid: {tuple(self.grid.dims)} cap "
              f"{self.grid.capacity} -> {tuple(dims)} cap {cap} "
              f"({len(pos)} atoms)", flush=True)
        if self.mesh is not None:
            from imd_tpu.parallel.mesh import (check_grid_divisible,
                                               shard_scene)
            check_grid_divisible(new_grid.dims, self.mesh)
            new_scene = shard_scene(self.mesh, new_scene)
        return new_scene

    def _grow_cells(self, state: SimState, extra: int = 8) -> SimState:
        """Grow the cell capacity after an in-run overflow and return the
        (pre-overflow) state re-padded for the new capacity.

        The reference never drops atoms on a full cell — it reallocs
        (alloc_cell, imd_alloc.c:551).  Our static-shape analog: pad the
        slot axis (multiple of 8 keeps f32 sublane tiling), point the
        driver's grid/template at the grown scene, and re-specialize the
        engine (capacity may cross the Pallas VMEM cap).
        """
        from imd_tpu.scene import grow_capacity
        old = self.grid.capacity
        new_cap = ((old + extra + 7) // 8) * 8
        print(f"# cell overflow: growing capacity {old} -> {new_cap} "
              f"and retrying the block", flush=True)
        scene = grow_capacity(state.scene, new_cap)
        self.grid = scene.grid
        self.scene = grow_capacity(self.scene, new_cap)
        self._select_engine()
        fdi = state.fdi
        if fdi is not None and fdi.shape == state.scene.type.shape:
            pad = [(0, 0)] * fdi.ndim
            pad[3] = (0, new_cap - old)
            fdi = jnp.pad(fdi, pad, constant_values=-1)
        return state.replace(scene=scene, fdi=fdi)

    def _run_cg(self, steps: Optional[int] = None) -> SimState:
        """`ensemble cg`: quasistatic Polak-Ribiere CG relaxation
        (move_atoms_cg dispatch, imd_param.c:5288; cg_step/linmin,
        imd_cg.c:46-210), block-scanned on device with check_relaxed
        termination between blocks (imd_main_3d.c:1787-1870)."""
        from imd_tpu import relax as relax_mod
        cfg = self.cfg
        steps = self._steps_to_run(steps)
        R = cfg.relax
        if self._relax_drivers():
            import warnings
            warnings.warn(
                "quasistatic loading drivers (extra_dforce/ep_max_int/"
                "max_deform_int/lindef_int) are wired for the glok/mik "
                "relax ensembles; `ensemble cg` relaxes without applying "
                "loading increments (update_fbc ENS_CG branch, "
                "imd_main_3d.c:1254) — use ensemble glok for quasistatic "
                "loading")
        block = cfg.eng_int if cfg.eng_int > 0 else min(steps, 50)
        block = max(1, min(block, steps))
        # cg_mode != 0 selects the reference's ACG/steepest-descent
        # variant (acg_step, imd_cg.c:70): CG memory off every iteration
        restart_every = (1 if R.cg_mode else
                         (cfg.cg_reset_int if cfg.cg_reset_int > 0
                          else 50))

        @jax.jit
        def blk(scene):
            return relax_mod.cg_relax(scene, self._compute_forces, block,
                                      restart_every=restart_every)

        from imd_tpu.utils.timers import Timers
        timers = Timers()
        timers.start("total")
        nactive = float(integrate.count_active_dof(self.scene,
                                                   self._restrictions()))
        if cfg.eng_int > 0 and self.eng is None:
            self.eng = EngWriter(self._path(cfg.outfiles + ".eng"),
                                 append=cfg.simulation_phase > 1)
        scene = self.scene
        epot_prev = None
        done = 0
        fnorm = jnp.zeros((), self.dtype)
        while done < steps:
            with timers.section("main"):
                scene, epots, fnorm = blk(scene)
                jax.block_until_ready(scene.pos)
            if bool(needs_rebin(scene, self.grid.skin)):
                scene = rebin(scene)
            done += block
            ep = float(epots[-1])
            if cfg.eng_int > 0:
                n = max(int(scene.n_atoms()), 1)
                self.eng.write(
                    time=float(self.step_count + done) * cfg.timestep,
                    epot_per_atom=ep / n, temperature=0.0,
                    pressure=0.0,
                    volume=float(scene.grid.box.volume))
            st = _initial_stats(self.dtype).replace(fnorm=fnorm)
            if epot_prev is not None and bool(relax_mod.check_relaxed(
                    st, ep, epot_prev, nactive,
                    R.fnorm_threshold, 0.0, R.delta_epot_threshold)):
                print(f"# relaxed at step {self.step_count + done}",
                      flush=True)
                break
            epot_prev = ep
        state = SimState(
            scene=scene,
            step=jnp.asarray(self.step_count + done, jnp.int32),
            eta=jnp.zeros((), self.dtype),
            epot_total=jnp.asarray(float(epots[-1]), self.dtype),
            virial=jnp.zeros((), self.dtype),
            presstens=jnp.zeros((6,), self.dtype),
            stats=_initial_stats(self.dtype).replace(fnorm=fnorm),
            nbl_count=jnp.zeros((), jnp.int32))
        if cfg.checkpt_int > 0:
            self.write_checkpoint(state, (self.step_count + done)
                                  // cfg.checkpt_int)
        self.scene = state.scene
        self.step_count = int(state.step)
        timers.stop("total")
        self.timers = timers
        return state

    def _steps_to_run(self, steps: Optional[int]) -> int:
        """Reference maxsteps semantics: the main loop runs the ABSOLUTE
        step range startstep..maxsteps (imd_main_3d.c:151 `for (steps =
        steps_min; steps <= steps_max; ..)`), so a restarted or
        later-phase run continues TO cfg.maxsteps rather than running
        maxsteps more steps.  An explicit ``steps`` argument overrides
        (relative count)."""
        if steps is not None:
            return steps
        return max(self.cfg.maxsteps - self.step_count, 0)

    def run(self, steps: Optional[int] = None, block: int = 0,
            on_interval: Optional[Callable] = None,
            allow_fused: bool = True) -> SimState:
        """Run ``steps`` (default: up to the absolute cfg.maxsteps) steps
        with periodic I/O.

        ``block`` > 1 scans that many steps per device dispatch (I/O
        intervals must divide into blocks).  When the configuration fits
        the fused cells-last hot loop (the benched path), it is used
        automatically so CLI throughput matches bench.py.
        """
        if self.ensemble == "cg":
            return self._run_cg(steps)
        if allow_fused and self._fused_eligible():
            return self.run_fused(steps=steps, block=block,
                                  on_interval=on_interval)
        cfg = self.cfg
        steps = self._steps_to_run(steps)
        step_fn = self.make_step_fn()
        # selected-config observers (.avp/.dsp/.dem, imd_main_3d.c:629/760)
        sel = None
        from imd_tpu.io.select import SelectWriters
        if SelectWriters.wanted(cfg):
            sel = SelectWriters(cfg, self.box.h, self.box.pbc, self._path)
            if self._disloc_ref is not None:
                sel.preload_refs(*self._disloc_ref)
        self._sel = sel
        intervals = [i for i in (cfg.eng_int, cfg.checkpt_int, cfg.dist_int,
                                 cfg.pic_int, cfg.ttm_int, cfg.socket_int,
                                 cfg.lb_frequency, cfg.force_int,
                                 cfg.press_int,
                                 cfg.nb_checkpt_int) if i > 0]
        # NVX temperature-profile output (write_temp_dist,
        # imd_transport.c; accumulation windows keyed to hc_start)
        hc = None
        if self.ensemble == "nvx" and cfg.hc_int > 0 and cfg.hc_nlayers > 1:
            from imd_tpu.io.hc import HCProfile
            restart = cfg.startstep > 0 or cfg.simulation_phase > 1
            hc = getattr(self, "_hc", None) or HCProfile(
                cfg.hc_nlayers, float(np.asarray(self.box.h)[0, 0]),
                cfg.hc_heatcurr,
                self._path(cfg.outfiles + ".hcgrad"),
                self._path(cfg.outfiles + ".hcprof"),
                count=getattr(self, "_itr_hc_count", 0), restart=restart)
            self._hc = hc
            intervals.append((cfg.hc_int, cfg.hc_start))
        if cfg.getmin or cfg.getsaddle:
            intervals.append(1)    # PxF crossings need per-step dispatch
        if sel is not None:
            intervals += sel.intervals()
        if block <= 0:
            block = (min([steps] + [_iv_pair(i)[0] for i in intervals])
                     if intervals else min(steps, 100))
            block = max(block, 1)

        def make_run_block(fn):
            @jax.jit
            def run_block(state, k):
                return jax.lax.fori_loop(0, k, lambda i, s: fn(s), state)
            return run_block

        run_block = make_run_block(step_fn)

        from imd_tpu.utils.timers import Timers
        timers = Timers()
        timers.start("total")
        state = self.init_state()
        nactive = float(integrate.count_active_dof(self.scene,
                                                   self._restrictions()))
        if cfg.eng_int > 0 and self.eng is None:
            xcols = []
            if self.fefl_ref is not None:
                xcols.append("harm_eng")
            if self._bb_tables is not None:
                xcols.append("bb_boosted_time")
            if cfg.relaxinfo:
                xcols += ["delta_epot", "xnorm", "xmax"]
            self.eng = EngWriter(self._path(cfg.outfiles + ".eng"),
                                 nvt=(self.ensemble == "nvt"),
                                 ttm=cfg.ttm.enabled,
                                 extra_cols=tuple(xcols),
                                 append=cfg.simulation_phase > 1)
        # indenter/wall force log (write_fext every eng_int,
        # imd_main_3d.c:732 + imd_io.c:2846)
        ind = None
        if self.extpot0 is not None and cfg.eng_int > 0:
            from imd_tpu.io.ind import IndWriter
            ind = IndWriter(self._path(cfg.outfiles + ".ind"),
                            cfg.ep_nind, cfg.ep_n, self.box.h,
                            relax=self.ensemble in ("mik", "glok", "cg"),
                            append=cfg.simulation_phase > 1)
        # socket steering server (init_socket, socket_io.c; polled every
        # socket_int steps like check_socket in the main loop)
        sock = None
        if cfg.socket_int > 0:
            from imd_tpu.io import socket_io
            sock = socket_io.SocketServer(port=cfg.socket_port)
        lb_log = None
        if cfg.lb_frequency > 0 and cfg.lb_write_status:
            # one log per Simulation: the fused->general fallback and
            # later phases append to the same run's file
            if getattr(self, "_lb_log", None) is None:
                from imd_tpu.parallel.loadbalance import LbLog
                self._lb_log = LbLog(self._path(cfg.outfiles + ".lb"),
                                     append=cfg.simulation_phase > 1)
            lb_log = self._lb_log
        if sel is not None:
            sel.init_refs(state.scene, self.step_count)
        epot_prev = None
        # quasistatic / dynamic loading drivers (RELAX protocol +
        # HOMDEF/DEFORM lattices)
        relax_drivers = self._relax_drivers()
        relax_waits = {k: 0 for k in relax_drivers}
        ssdef = None
        sscount = 0
        if relax_drivers:
            # event granularity is the dispatch block: cap it by the
            # smallest wait cap so ep_int/fbc_int-style counters
            # (imd_main_3d.c:228/1269) fire close to the reference step
            caps = [c for c in relax_drivers.values() if c > 0]
            if caps:
                block = max(1, min(block, min(caps)))
        dyn_deform = set()
        if cfg.lindef_interval > 0 and any(
                any(x != 0 for x in r)
                for r in (cfg.lindef_x, cfg.lindef_y, cfg.lindef_z)):
            dyn_deform.add("lindef")
            intervals.append(cfg.lindef_interval)
        if cfg.max_deform_int > 0 and cfg.deform_shift:
            dyn_deform.add("deform")
            intervals.append(cfg.max_deform_int)
        # EPITAX beam deposition: per-type insertion events on the
        # (steps - steps_min) % epitax_rate lattice (imd_main_3d.c:193-202)
        epitax_st = None
        steps_min = int(state.step)
        if cfg.epitax_rate and any(r > 0 for r in cfg.epitax_rate):
            from imd_tpu.models import epitax as epitax_mod
            lvl = epitax_mod.substrate_level(self.scene)
            epitax_st = epitax_mod.EpitaxState(
                height=(cfg.epitax_height if cfg.epitax_height > 0
                        else lvl),
                speed=(cfg.epitax_speed if cfg.epitax_speed > 0 else 1.0),
                level=lvl,
                cutoff=(cfg.epitax_cutoff if cfg.epitax_cutoff > 0
                        else 2.0))
            self._epitax_rng = np.random.default_rng(cfg.seed or 0)
            for r in cfg.epitax_rate:
                if r > 0:
                    intervals.append((int(r), steps_min))
        done = 0
        grow_tries = 0
        while done < steps:
            prev_state = state
            b = min(block, steps - done)
            b = _clamp_block(b, int(state.step), intervals,
                             sel.special_steps() if sel else ())
            with timers.section("main"):
                state = run_block(state, b)
                jax.block_until_ready(state.scene.pos)
            if int(state.scene.overflow) > 0:
                # a rebin inside the block overflowed the static cell
                # capacity (the reference grows cells in place,
                # alloc_cell imd_alloc.c:551): grow the slot axis and
                # retry the block from the pre-block state
                grow_tries += 1
                if grow_tries > 6:
                    raise RuntimeError(
                        f"cell capacity overflow persists after "
                        f"{grow_tries - 1} growths (capacity "
                        f"{self.grid.capacity}) — pathological density?")
                state = self._grow_cells(prev_state)
                step_fn = self.make_step_fn()
                run_block = make_run_block(step_fn)
                continue
            done += b
            # I/O cadence keys on the GLOBAL step like the reference's
            # main loop (imd_main_3d.c:623-793) so restarted runs keep
            # the original file schedule
            gstep = int(state.step)
            if cfg.eng_int > 0 and gstep % cfg.eng_int == 0:
                self._write_eng(state, nactive)
                if ind is not None:
                    # instantaneous indenter diagnostics at the write
                    # step (the reference accumulates them inside the
                    # force pass and flushes here, write_fext)
                    from imd_tpu.models import extpot as extpot_mod
                    _, _, diag = extpot_mod.extpot_forces(state.scene,
                                                          state.ep)
                    area = extpot_mod.contact_area(diag["bbox"],
                                                   cfg.ep_key)
                    # time column: steps*timestep; relax ensembles log
                    # the raw step count only under quasistatic stepping
                    # (ep_max_int > 0), imd_io.c:2943-2949
                    relax_col = (self.ensemble in ("mik", "glok", "cg")
                                 and cfg.ep_max_int > 0)
                    trow = gstep if relax_col else gstep * cfg.timestep
                    ind.write(trow, np.asarray(state.ep.pos),
                              np.asarray(diag["fext"]),
                              np.asarray(area),
                              np.asarray(diag["n_contact"]))
            if hc is not None and gstep > cfg.hc_start:
                # block-boundary sample of the folded layer histogram
                # (write_temp_dist accumulation, imd_transport.c:185-216)
                sc = state.scene
                m = np.asarray(sc.mask.reshape(-1))
                x = np.asarray(sc.pos.reshape(-1, 3))[m, 0]
                mom = np.asarray(sc.mom.reshape(-1, 3))[m]
                mass = np.asarray(sc.mass.reshape(-1))[m]
                hc.sample(x, 0.5 * np.sum(mom * mom, 1)
                          / np.maximum(mass, 1e-30))
                if (gstep - cfg.hc_start) % cfg.hc_int == 0:
                    hc.write()
            if cfg.checkpt_int > 0 and gstep % cfg.checkpt_int == 0:
                self.write_checkpoint(state, gstep // cfg.checkpt_int)
            self._write_periodic_extras(state, gstep)
            if cfg.getmin or cfg.getsaddle:
                self._check_pxf_crossing(state, gstep)
            if (cfg.ttm.enabled and cfg.ttm_int > 0
                    and gstep % cfg.ttm_int == 0):
                from imd_tpu.io.ttm_io import write_ttm
                cs = state.cstate
                write_ttm(self._path(
                    f"{cfg.outfiles}.{gstep // cfg.ttm_int}.ttm"),
                    state.ttm_grid,
                    colrad_c=cs.c if cs is not None else None,
                    colrad_p=cs.p if cs is not None else None)
            if cfg.dist_int > 0 and gstep % cfg.dist_int == 0:
                # binned-field snapshot (write_distrib, imd_distrib.c:33)
                from imd_tpu.io.distrib import compute_distrib, write_distrib
                fields = compute_distrib(state.scene, cfg.dist_dim)
                names = [n for n, on in cfg.dist_flags.items()
                         if on and n in fields] or ["num", "Ekin", "Epot"]
                bh = np.abs(np.diag(np.asarray(self.box.h, np.float64)))
                write_distrib(
                    self._path(
                        f"{cfg.outfiles}.{gstep // cfg.dist_int}.dist"),
                    fields, names, cfg.dist_dim,
                    bh / np.asarray(cfg.dist_dim, np.float64),
                    mode="binary" if cfg.binary_output else "ascii")
            if cfg.pic_int > 0 and gstep % cfg.pic_int == 0:
                from imd_tpu.io.pictures import write_picture
                write_picture(
                    self._path(f"{cfg.outfiles}.{gstep // cfg.pic_int}.ppm"),
                    state.scene)
            if epitax_st is not None and gstep >= cfg.epitax_startstep:
                # beam deposition events (create_atom imd_epitax.c:25;
                # past epitax_maxsteps reflected atoms are deleted
                # instead, imd_main_3d.c:200-202)
                from imd_tpu.models import epitax as epitax_mod
                sc_h = state.scene
                changed = False
                for ty, rate in enumerate(cfg.epitax_rate):
                    if rate <= 0 or (gstep - steps_min) % rate != 0:
                        continue
                    if (cfg.epitax_maxsteps > 0
                            and gstep > cfg.epitax_maxsteps):
                        sc_h, nd = epitax_mod.delete_top_atoms(sc_h)
                        changed = changed or nd > 0
                        continue
                    mass = (cfg.epitax_mass[ty]
                            if ty < len(cfg.epitax_mass) else 1.0)
                    temp = (cfg.epitax_temp[ty]
                            if ty < len(cfg.epitax_temp) else 0.0)
                    sc_h, ok = epitax_mod.create_atom(
                        sc_h, epitax_st, self._epitax_rng, ty, mass,
                        temp)
                    if not ok:
                        # target cell full: grow the slot axis like the
                        # overflow path (alloc_cell analog) and retry
                        state = self._grow_cells(
                            state.replace(scene=sc_h))
                        step_fn = self.make_step_fn()
                        run_block = make_run_block(step_fn)
                        sc_h, ok = epitax_mod.create_atom(
                            state.scene, epitax_st, self._epitax_rng,
                            ty, mass, temp)
                        if not ok:
                            raise RuntimeError(
                                "EPITAX: insertion failed after "
                                "capacity growth")
                    changed = True
                if changed:
                    state = state.replace(scene=rebin(sc_h))
                    nactive = float(integrate.count_active_dof(
                        state.scene, self._restrictions()))
            if sel is not None:
                # ORDPAR sweep only when an epot-consuming observer fires
                sel.step(self._with_ordpar(state.scene)
                         if sel.needs_epot(gstep) else state.scene, gstep)
            if cfg.lb_frequency > 0 and gstep % cfg.lb_frequency == 0:
                # x-slab repartition (balanceLoad every lb_frequency,
                # imd_main_3d.c:864-914) — moves grid.xbounds (a traced
                # leaf: no recompilation) and rebins
                from imd_tpu.parallel import loadbalance as lb
                n_slabs = (self.mesh.shape["x"] if self.mesh is not None
                           else self.grid.dims[0])
                if lb_log is not None:
                    lb_log.write(gstep,
                                 lb.lb_variance(state.scene, n_slabs))
                sc_lb = lb.repartition_x(state.scene)
                if int(sc_lb.overflow) > 0:
                    # a widened slab packed a cell past capacity: grow
                    # the slot axis from the PRE-LB state (never drop
                    # atoms, alloc_cell imd_alloc.c:551) and retry
                    state = self._grow_cells(state)
                    step_fn = self.make_step_fn()
                    run_block = make_run_block(step_fn)
                    sc_lb = lb.repartition_x(state.scene)
                state = state.replace(scene=sc_lb)
            if on_interval is not None:
                on_interval(self, state)
            if (sock is not None and gstep % cfg.socket_int == 0):
                from imd_tpu.io import socket_io
                if socket_io.poll(sock, self, state):
                    break
            # dynamic (non-relax) deformation drivers fire on their
            # step lattices (HOMDEF/DEFORM without RELAX,
            # imd_main_3d.c:296-333)
            if not relax_drivers:
                if ("lindef" in dyn_deform
                        and gstep % cfg.lindef_interval == 0):
                    from imd_tpu.models import deform as deform_mod
                    from imd_tpu.scene import rebin as _rebin
                    scale = cfg.lindef_size
                    if cfg.lindef_freq > 0:
                        # CYCLE: cyclic strain of amplitude lindef_size
                        # at frequency lindef_freq — the per-step ratio
                        # increment ri (imd_main_3d.c:234-245)
                        # our hook fires AFTER step gstep (the
                        # reference's fires before), so the increment is
                        # sin(w gstep)/sin(w (gstep-1)) — the cumulative
                        # box trajectory (amp sin(w t) + 1) is identical
                        w = 2.0 * math.pi * cfg.lindef_freq * cfg.timestep
                        amp = cfg.lindef_size - 1.0
                        scale = ((amp * math.sin(w * gstep) + 1.0)
                                 / (amp * math.sin(w * (gstep - 1)) + 1.0)
                                 - 1.0)
                    state = state.replace(scene=_rebin(
                        deform_mod.lin_deform(
                            state.scene, cfg.lindef_x, cfg.lindef_y,
                            cfg.lindef_z,
                            jnp.asarray(scale, self.dtype))))
                if ("deform" in dyn_deform
                        and gstep % cfg.max_deform_int == 0):
                    from imd_tpu.models import deform as deform_mod
                    from imd_tpu.scene import rebin as _rebin
                    shift, shear, base, sd = self._deform_tables()
                    state = state.replace(scene=_rebin(
                        deform_mod.deform_sample(
                            state.scene, shift,
                            jnp.asarray(cfg.deform_size, self.dtype),
                            shear_def=sd, deform_shear=shear,
                            deform_base=base)))
            # quasistatic convergence (check_relaxed, main_3d.c:1787)
            R = cfg.relax
            relaxed = False
            if (self.ensemble in ("glok", "mik")
                    and (R.fnorm_threshold > 0 or R.ekin_threshold > 0
                         or R.delta_epot_threshold > 0)):
                from imd_tpu.relax import check_relaxed
                ep_now = float(state.epot_total)
                relaxed = epot_prev is not None and bool(check_relaxed(
                    state.stats, ep_now, epot_prev, nactive,
                    R.fnorm_threshold, R.ekin_threshold,
                    R.delta_epot_threshold))
                if relaxed and not relax_drivers:
                    print(f"# relaxed at step {gstep}", flush=True)
                    break
                epot_prev = ep_now
            if relax_drivers:
                # quasistatic RELAX loading: on relaxation (or a
                # driver's wait cap, which ticks regardless of whether
                # convergence thresholds are configured) apply one
                # loading increment, log .ssdef + .ss snapshot, reset
                # the relaxation machinery, and CONTINUE
                # (imd_main_3d.c:208-330, update_fbc 1243-1270)
                for k in relax_waits:
                    relax_waits[k] += b
                due = [k for k, cap in relax_drivers.items()
                       if relaxed or (cap > 0 and relax_waits[k] > cap)]
                if due:
                    if ssdef is None:
                        from imd_tpu.io.ssdef import SsdefWriter
                        restr = self._restrictions()
                        ssdef = SsdefWriter(
                            self._path(cfg.outfiles + ".ssdef"),
                            cfg.vtypes,
                            np.asarray(restr) if restr is not None
                            else None,
                            append=cfg.simulation_phase > 1)
                    self._write_ss(state, sscount, ssdef, nactive)
                    sscount += 1
                    state = self._apply_loading_event(state, due)
                    for k in due:
                        relax_waits[k] = 0
                    epot_prev = None
                    continue
            # graceful-stop machinery (check_write/check_stop/
            # check_walltime, imd_main_3d.c:1938-1992): an (empty) `write`
            # file triggers an immediate checkpoint, a `stop` file or the
            # maxwalltime budget checkpoints and ends the run
            wfile = self._path("write")
            sfile = self._path("stop")
            if os.path.exists(wfile):
                os.remove(wfile)
                self.write_checkpoint(state, gstep)
            stop = False
            if os.path.exists(sfile):
                os.remove(sfile)
                stop = True
            if (self.cfg.maxwalltime > 0
                    and time.time() - self.start_time > self.cfg.maxwalltime):
                stop = True
            if stop:
                self.write_checkpoint(state, gstep)
                break
        if sock is not None:
            sock.close()
        if lb_log is not None:
            lb_log.close()
            self._lb_log = None
        self.scene = state.scene
        self.step_count = int(state.step)
        timers.stop("total")
        self.timers = timers
        # end-of-run summary like the reference (imd.c:387-401)
        n = max(int(state.scene.n_atoms()), 1)
        print(timers.report(n_atoms=n, n_steps=max(steps, 1)), flush=True)
        return state

    def run_fused(self, steps: Optional[int] = None, block: int = 0,
                  on_interval: Optional[Callable] = None) -> SimState:
        """Production hot loop: the fused cells-last step from
        ops/fused_step.py — the SAME path bench.py measures, so the CLI
        delivers the benched throughput (round-1 gap: the CLI ran the
        unfused per-step path with _to_cl transposes, ~10 ms/step slower
        at 1M atoms).

        Observables (epot/virial/pressure) are evaluated with the full
        kernel only at .eng intervals; the in-loop kernel is forces-only,
        mirroring the reference where energy accumulation is free in
        scalar code but costs real VPU work here.
        """
        cfg = self.cfg
        steps = self._steps_to_run(steps)
        filter_int = (cfg.filter.interval if cfg.filter.enabled else 0)
        intervals = [i for i in (cfg.eng_int, cfg.checkpt_int, cfg.ttm_int,
                                 cfg.dist_int, cfg.pic_int, filter_int,
                                 cfg.lb_frequency, cfg.socket_int,
                                 cfg.force_int, cfg.press_int,
                                 cfg.nb_checkpt_int)
                     if i > 0]
        lb_log = None
        if cfg.lb_frequency > 0 and cfg.lb_write_status:
            # one log per Simulation: the fused->general fallback and
            # later phases append to the same run's file
            if getattr(self, "_lb_log", None) is None:
                from imd_tpu.parallel.loadbalance import LbLog
                self._lb_log = LbLog(self._path(cfg.outfiles + ".lb"),
                                     append=cfg.simulation_phase > 1)
            lb_log = self._lb_log
        sock = None
        if cfg.socket_int > 0:
            from imd_tpu.io import socket_io
            sock = socket_io.SocketServer(port=cfg.socket_port)
        # selected-config observers (.avp/.dsp/.dem, imd_main_3d.c:629/760)
        sel = None
        from imd_tpu.io.select import SelectWriters
        if SelectWriters.wanted(cfg):
            sel = SelectWriters(cfg, self.box.h, self.box.pbc, self._path)
            if self._disloc_ref is not None:
                sel.preload_refs(*self._disloc_ref)
            intervals += sel.intervals()
        self._sel = sel
        if block <= 0:
            block = (min([steps] + [_iv_pair(i)[0] for i in intervals])
                     if intervals else min(steps, 100))
            block = max(block, 1)

        from imd_tpu.ops.fused_step import (cl_to_scene, make_filter_apply,
                                            make_fused_step,
                                            make_fused_ttm_step,
                                            scene_to_cl)
        from imd_tpu.ops.forces_pallas import compute_eam_forces_pallas

        template = self.scene
        dt = cfg.timestep
        ttm_on = self.ensemble == "ttm"
        state0 = self.init_state()
        laser = cfg.laser if cfg.laser.sigma_e > 0 else None
        has_vlat = ttm_on and self.vlat_params is not None
        has_colrad = ttm_on and self.colrad_tab is not None
        has_fdtd = ttm_on and self.fdtd_params is not None
        # the colrad and fdtd states share the first aux carry slot
        # (they are mutually exclusive, driver rule)
        has_aux0 = has_colrad or has_fdtd

        def build(template, ttm_grid, step0, vstate=None, cstate=None):
            """(Re)build the fused step/observe closures for the current
            template — called once up front and again after a capacity
            growth (overflow recovery re-specializes every kernel)."""
            if ttm_on:
                step_cl, cl = make_fused_ttm_step(
                    template, self.eam_run, dt, self.ttm_params, self.eos,
                    laser, mesh=self.mesh, nrb_state=self.nrb_state,
                    tmm_params=self.tmm_params, ntypes=cfg.ntypes,
                    vlat=((self.vlat_params, self.vlat_state0)
                          if has_vlat else None),
                    elecpress=bool(cfg.ttm.elecpress),
                    colrad=((self.colrad_tab, self.colrad_step,
                             self.colrad_phi)
                            if has_colrad else None),
                    fdtd_params=self.fdtd_params)
                sfdi = state0.fdi
                if (sfdi is not None
                        and sfdi.shape == template.type.shape):
                    # restart: continue from the restored per-atom FD
                    # index (aux sidecar) instead of suppressing the
                    # first step's advection fluxes
                    from imd_tpu.ops.forces_fast import _to_cl
                    fdi = _to_cl(sfdi, template.grid.dims).reshape(-1)
                else:
                    fdi = -jnp.ones(cl.mass.size, jnp.int32)
                aux = []
                if has_colrad:
                    aux.append(cstate if cstate is not None
                               else state0.cstate)
                elif has_fdtd:
                    aux.append(cstate if cstate is not None
                               else state0.fdtd)
                if has_vlat:
                    aux.append(vstate if vstate is not None
                               else self.vlat_state0)
                carry = (cl, ttm_grid, fdi, *aux,
                         jnp.asarray(step0, jnp.int32))

                @jax.jit
                def run_block(carry, k):
                    return jax.lax.fori_loop(
                        0, k, lambda i, c: step_cl(*c), carry)
            else:
                step_cl, cl = make_fused_step(template, self.eam_run, dt,
                                              mesh=self.mesh,
                                              nrb_state=self.nrb_state,
                                              ntypes=cfg.ntypes)
                carry = (cl,)

                @jax.jit
                def run_block(carry, k):
                    return (jax.lax.fori_loop(
                        0, k, lambda i, c: step_cl(c)[0], carry[0]),)

            filt_apply = (make_filter_apply(template, cfg.filter,
                                            self.cutoff)
                          if filter_int > 0 else None)

            @jax.jit
            def observe(cl):
                scene = cl_to_scene(cl, template)
                if cfg.ntypes > 1:
                    from imd_tpu.ops.forces_pallas import \
                        compute_eam_forces_pallas_mt
                    res = compute_eam_forces_pallas_mt(
                        scene, self.eam_run, cfg.ntypes,
                        need_energy=True, need_stress=True)
                else:
                    res = compute_eam_forces_pallas(scene, self.eam_run,
                                                    need_energy=True,
                                                    need_stress=True)
                af = cl.alive.astype(cl.mass.dtype)
                ekin = 0.5 * jnp.sum(
                    jnp.sum(cl.mom * cl.mom, 1) * af / cl.mass)
                return scene.replace(force=res.force, epot=res.epot), \
                    jnp.sum(res.epot), ekin, res.virial, res.presstens

            return carry, run_block, observe, filt_apply

        carry, run_block, observe, filt_apply = build(
            template, state0.ttm_grid, self.step_count,
            vstate=state0.vstate, cstate=state0.cstate)

        from imd_tpu.utils.timers import Timers
        timers = Timers()
        timers.start("total")
        nactive = float(integrate.count_active_dof(self.scene, None))
        if cfg.eng_int > 0 and self.eng is None:
            self.eng = EngWriter(self._path(cfg.outfiles + ".eng"),
                                 ttm=cfg.ttm.enabled,
                                 extra_cols=(("delta_epot", "xnorm",
                                              "xmax") if cfg.relaxinfo
                                             else ()),
                                 append=cfg.simulation_phase > 1)

        def mk_state(scene, epot, ekin, virial, presstens, gstep):
            st = _initial_stats(self.dtype)
            st = st.replace(tot_kin_energy=ekin)
            fdi_live = state0.fdi
            if ttm_on:
                # live per-slot FD index from the carry, remapped from
                # the cells-last flat layout to the Scene layout so the
                # checkpoint sidecar can key it by atom id (restart
                # advection continuity)
                from imd_tpu.ops.forces_fast import _from_cl
                gx, gy, gz, capn = scene.type.shape
                fdi_live = _from_cl(
                    carry[2].reshape(capn, gx * gy * gz), (gx, gy, gz))
            return SimState(
                scene=scene, step=jnp.asarray(gstep, jnp.int32),
                eta=jnp.zeros((), self.dtype), epot_total=epot,
                virial=virial, presstens=presstens, stats=st,
                nbl_count=jnp.zeros((), jnp.int32),
                ttm_grid=(carry[1] if ttm_on else None),
                fdi=fdi_live,
                cstate=(carry[3] if has_colrad else state0.cstate),
                fdtd=(carry[3] if has_fdtd else state0.fdtd),
                vstate=(carry[3 + has_aux0] if has_vlat
                        else state0.vstate))

        if sel is not None:
            sel.init_refs(state0.scene, self.step_count)
        done = 0
        state = None
        grow_tries = 0
        regrid_at = -1      # block offset of the last density re-grid
        while done < steps:
            prev_carry = carry
            b = min(block, steps - done)
            b = _clamp_block(b, self.step_count + done, intervals,
                             sel.special_steps() if sel else ())
            with timers.section("main"):
                carry = run_block(carry, b)
                jax.block_until_ready(carry[0].xi)
            if int(carry[0].overflow) > 0:
                # in-loop rebin overflowed the cell capacity: grow the
                # slot axis (alloc_cell analog, imd_alloc.c:551), rebuild
                # the fused kernels, retry the block from pre-block state
                grow_tries += 1
                if grow_tries > 6:
                    raise RuntimeError(
                        f"cell capacity overflow persists after "
                        f"{grow_tries - 1} growths (capacity "
                        f"{self.grid.capacity})")
                from imd_tpu.scene import grow_capacity
                old = self.grid.capacity
                new_cap = ((old + 8 + 7) // 8) * 8
                print(f"# cell overflow: growing capacity {old} -> "
                      f"{new_cap} and retrying the block", flush=True)
                if new_cap > 32:
                    # the Pallas sweeps cap at cap<=32 ([cap,cap,B] VMEM
                    # tiles).  First try density-adaptive re-gridding:
                    # re-derive the cell grid for the compressed
                    # distribution (finer cells lower occupancy) exactly
                    # as the reference re-cells on geometry change
                    # (imd_geom_3d.c:118-170) — the fused Pallas loop
                    # then survives the whole ablation
                    sc_prev = cl_to_scene(prev_carry[0], template)
                    sc_prev = sc_prev.replace(
                        overflow=jnp.zeros((), jnp.int32))
                    if regrid_at != done:
                        regridded = self._regrid_scene(sc_prev)
                        if regridded is not None:
                            regrid_at = done
                            grow_tries = 0
                            template = regridded
                            self.grid = regridded.grid
                            self.scene = regridded
                            self._select_engine()
                            carry, run_block, observe, filt_apply = \
                                build(template,
                                      prev_carry[1] if ttm_on else None,
                                      self.step_count + done,
                                      cstate=(prev_carry[3]
                                              if has_aux0 else None),
                                      vstate=(prev_carry[3 + has_aux0]
                                              if has_vlat else None))
                            continue
                    # even re-gridding can't fit cap<=32: fall back to
                    # the general XLA engine and CONTINUE — the
                    # reference's alloc_cell never fails
                    # (imd_alloc.c:551), so neither do we
                    print("# fused-path capacity cap reached: "
                          "continuing on the general engine "
                          f"(capacity {old} -> {new_cap})", flush=True)
                    grown = grow_capacity(sc_prev, new_cap)
                    self.grid = grown.grid
                    self.scene = grown
                    self._select_engine()     # capacity > 32 -> XLA
                    self.step_count += done
                    hand = {}
                    if ttm_on:
                        hand["ttm_grid"] = prev_carry[1]
                        if has_colrad:
                            hand["cstate"] = prev_carry[3]
                        elif has_fdtd:
                            hand["fdtd"] = prev_carry[3]
                        if has_vlat:
                            hand["vstate"] = prev_carry[3 + has_aux0]
                    self._handover = hand
                    if sock is not None:
                        sock.close()      # the general run rebinds it
                    try:
                        return self.run(steps=steps - done, block=block,
                                        on_interval=on_interval,
                                        allow_fused=False)
                    finally:
                        self._handover = None
                scene_prev = cl_to_scene(prev_carry[0], template)
                scene_prev = scene_prev.replace(
                    overflow=jnp.zeros((), jnp.int32))
                template = grow_capacity(scene_prev, new_cap)
                self.grid = template.grid
                self.scene = template
                self._select_engine()
                carry, run_block, observe, filt_apply = build(
                    template,
                    prev_carry[1] if ttm_on else None,
                    self.step_count + done,
                    cstate=(prev_carry[3] if has_aux0 else None),
                    vstate=(prev_carry[3 + has_aux0]
                            if has_vlat else None))
                continue
            done += b
            gstep = self.step_count + done
            sel_due = sel is not None and (
                any(_iv_due(gstep, i) for i in sel.intervals())
                or gstep in sel.special_steps())
            io_due = sel_due or any(i > 0 and gstep % i == 0
                                    for i in intervals)
            wfile, sfile = self._path("write"), self._path("stop")
            stop = os.path.exists(sfile)
            force_write = os.path.exists(wfile)
            walltime_up = (cfg.maxwalltime > 0 and
                           time.time() - self.start_time > cfg.maxwalltime)
            if io_due or stop or force_write or walltime_up \
                    or done >= steps:
                scene, epot, ekin, virial, presstens = observe(carry[0])
                state = mk_state(scene, epot, ekin, virial, presstens,
                                 gstep)
                if cfg.eng_int > 0 and gstep % cfg.eng_int == 0:
                    self._write_eng(state, nactive)
                if cfg.checkpt_int > 0 and gstep % cfg.checkpt_int == 0:
                    self.write_checkpoint(state,
                                          gstep // cfg.checkpt_int)
                self._write_periodic_extras(state, gstep)
                if (ttm_on and cfg.ttm_int > 0
                        and gstep % cfg.ttm_int == 0):
                    from imd_tpu.io.ttm_io import write_ttm
                    cs = state.cstate
                    write_ttm(self._path(
                        f"{cfg.outfiles}.{gstep // cfg.ttm_int}.ttm"),
                        state.ttm_grid,
                        colrad_c=cs.c if cs is not None else None,
                        colrad_p=cs.p if cs is not None else None)
                if cfg.dist_int > 0 and gstep % cfg.dist_int == 0:
                    from imd_tpu.io.distrib import (compute_distrib,
                                                    write_distrib)
                    fields = compute_distrib(scene, cfg.dist_dim)
                    names = [n for n, on in cfg.dist_flags.items()
                             if on and n in fields] \
                        or ["num", "Ekin", "Epot"]
                    bh = np.abs(np.diag(np.asarray(self.box.h,
                                                   np.float64)))
                    write_distrib(
                        self._path(f"{cfg.outfiles}."
                                   f"{gstep // cfg.dist_int}.dist"),
                        fields, names, cfg.dist_dim,
                        bh / np.asarray(cfg.dist_dim, np.float64),
                        mode="binary" if cfg.binary_output else "ascii")
                if cfg.pic_int > 0 and gstep % cfg.pic_int == 0:
                    from imd_tpu.io.pictures import write_picture
                    write_picture(
                        self._path(f"{cfg.outfiles}."
                                   f"{gstep // cfg.pic_int}.ppm"),
                        scene)
                if sel_due:
                    sel.step(self._with_ordpar(scene)
                             if sel.needs_epot(gstep) else scene, gstep)
                if on_interval is not None:
                    on_interval(self, state)
                if (sock is not None and gstep % cfg.socket_int == 0):
                    # online steering (check_socket, socket_io.c)
                    from imd_tpu.io import socket_io
                    if socket_io.poll(sock, self, state):
                        break
                if force_write:
                    os.remove(wfile)
                    self.write_checkpoint(state, gstep)
                if stop:
                    os.remove(sfile)
                if stop or walltime_up:
                    self.write_checkpoint(state, gstep)
                    break
            if (filt_apply is not None and done < steps
                    and gstep % filter_int == 0):
                # FILTER cadence (filter_atoms every filter_int,
                # imd_filter.c:151): applied at the block boundary so
                # the next block starts from the filtered, rebinned
                # state (block size is aligned to filter_int above)
                if ttm_on:
                    cl_f, fdi_f = filt_apply(carry[0], carry[2])
                    carry = (cl_f, carry[1], fdi_f, *carry[3:])
                else:
                    carry = (filt_apply(carry[0]),)
            if (cfg.lb_frequency > 0 and done < steps
                    and gstep % cfg.lb_frequency == 0):
                # LOADBALANCE on the fused path (balanceLoad every
                # lb_frequency, imd_main_3d.c:864-914): move the x-slab
                # planes to the atom quantiles and rebin; xbounds is a
                # CLState leaf, so the compiled step keeps binning under
                # the CURRENT planes with no retrace
                from imd_tpu.parallel import loadbalance as lb
                sc_pre = cl_to_scene(carry[0], template)
                n_slabs = (self.mesh.shape["x"] if self.mesh is not None
                           else self.grid.dims[0])
                if lb_log is not None:
                    lb_log.write(gstep, lb.lb_variance(sc_pre, n_slabs))
                sc_lb = lb.repartition_x(sc_pre)
                if int(sc_lb.overflow) > 0:
                    # a widened slab packed a cell past capacity: grow
                    # the slot axis FROM THE PRE-LB STATE (the dropped
                    # atoms only exist there), rebuild, redo the
                    # repartition — alloc_cell never loses atoms
                    from imd_tpu.scene import grow_capacity
                    new_cap = ((self.grid.capacity + 15) // 8) * 8
                    print("# LB overflow: growing capacity "
                          f"{self.grid.capacity} -> {new_cap} and "
                          "repartitioning again", flush=True)
                    sc_pre = sc_pre.replace(
                        overflow=jnp.zeros((), jnp.int32))
                    if new_cap > 32:
                        # try the density re-grid before surrendering
                        # the fused path (same protocol as the in-loop
                        # overflow above)
                        regridded = self._regrid_scene(sc_pre)
                        if regridded is not None:
                            template = regridded
                            self.grid = regridded.grid
                            self.scene = regridded
                            self._select_engine()
                            carry, run_block, observe, filt_apply = \
                                build(template,
                                      carry[1] if ttm_on else None,
                                      self.step_count + done,
                                      cstate=(carry[3]
                                              if has_aux0 else None),
                                      vstate=(carry[3 + has_aux0]
                                              if has_vlat else None))
                            sc_lb = lb.repartition_x(
                                cl_to_scene(carry[0], template))
                            if int(sc_lb.overflow) > 0:
                                raise RuntimeError(
                                    "LB repartition still overflows "
                                    "after density re-grid")
                            cl_lb = scene_to_cl(sc_lb)
                            if ttm_on:
                                carry = (cl_lb, carry[1],
                                         -jnp.ones_like(carry[2]),
                                         *carry[3:])
                            else:
                                carry = (cl_lb,)
                            continue
                    grown = grow_capacity(sc_pre, new_cap)
                    self.grid = grown.grid
                    self.scene = grown
                    self._select_engine()
                    if new_cap > 32:
                        # past the Pallas cap: continue on the general
                        # engine with the evolved TTM/aux state (same
                        # protocol as the in-loop overflow fallback)
                        self.step_count += done
                        hand = {}
                        if ttm_on:
                            hand["ttm_grid"] = carry[1]
                            if has_colrad:
                                hand["cstate"] = carry[3]
                            elif has_fdtd:
                                hand["fdtd"] = carry[3]
                            if has_vlat:
                                hand["vstate"] = carry[3 + has_aux0]
                        self._handover = hand
                        if sock is not None:
                            sock.close()  # the general run rebinds it
                        try:
                            return self.run(steps=steps - done,
                                            block=block,
                                            on_interval=on_interval,
                                            allow_fused=False)
                        finally:
                            self._handover = None
                    template = grown
                    carry, run_block, observe, filt_apply = build(
                        template,
                        carry[1] if ttm_on else None,
                        self.step_count + done,
                        cstate=(carry[3] if has_aux0 else None),
                        vstate=(carry[3 + has_aux0]
                                if has_vlat else None))
                    sc_lb = lb.repartition_x(
                        cl_to_scene(carry[0], template))
                    if int(sc_lb.overflow) > 0:
                        raise RuntimeError(
                            "LB repartition still overflows after "
                            "capacity growth")
                cl_lb = scene_to_cl(sc_lb)
                if ttm_on:
                    # per-slot FD indices are stale after the re-bin
                    carry = (cl_lb, carry[1],
                             -jnp.ones_like(carry[2]), *carry[3:])
                else:
                    carry = (cl_lb,)
        if state is None:
            scene, epot, ekin, virial, presstens = observe(carry[0])
            state = mk_state(scene, epot, ekin, virial, presstens,
                             self.step_count + done)
        if sock is not None:
            sock.close()
        if lb_log is not None:
            lb_log.close()
            self._lb_log = None
        self.scene = state.scene
        self.step_count = int(state.step)
        timers.stop("total")
        self.timers = timers
        n = max(int(state.scene.n_atoms()), 1)
        print(timers.report(n_atoms=n, n_steps=max(done, 1)), flush=True)
        return state

    def _write_eng(self, state: SimState, nactive: float):
        n = max(int(state.scene.n_atoms()), 1)
        if (state.ttm_grid is not None
                and getattr(state.ttm_grid, "cfl_overflow", None) is not None
                and not getattr(self, "_cfl_warned", False)
                and bool(state.ttm_grid.cfl_overflow)):
            self._cfl_warned = True
            print("# WARNING: TTM diffusion CFL demand exceeded "
                  "max_substeps — the electron grid is integrated at "
                  "the clamped substep count (raise ttm max_substeps "
                  "or coarsen ttmdimx)", flush=True)
        vol = float(state.scene.grid.box.volume)
        ekin = float(state.stats.tot_kin_energy)
        ttm_eng = None
        if self.cfg.ttm.enabled:
            ttm_eng = float(self.ttm_mod.electron_energy_total(
                state.ttm_grid, self.ttm_params))
        # the epot in `state` was computed by the force call at the START
        # of the last step (positions after step-1 moves); the reference
        # labels that line (steps)*dt with steps = that iteration index
        # (write_eng_file(steps) after move_atoms, imd_main_3d.c:716)
        extra = []
        if self.fefl_ref is not None:
            # harm_eng column = tot_harm_energy/natoms (imd_io.c:2549);
            # recomputed here at .eng cadence (sum k d^2, no 1/2 —
            # imd_fefl.c:62 parity)
            from imd_tpu.models.fefl import calc_fefl
            _, harm = calc_fefl(state.scene, self.fefl_ref,
                                self.cfg.spring_rate,
                                self.cfg.fefl_lambda)
            extra.append(float(harm) / n)
        if state.bb_time is not None:
            extra.append(float(state.bb_time))
        if self.cfg.relaxinfo:
            # RELAXINFO columns (imd_io.c:2454-2457): |delta Epot| since
            # the previous line, sqrt(xnorm/nactive), sqrt(x_max2) with
            # xnorm = sum (dt p/m)^2 and x_max2 the max squared per-
            # component step displacement (imd_integrate.c:425-430) —
            # reconstructed from the current momenta (leapfrog: the last
            # position increment was dt*p_new/m), checked at eng cadence
            ep_a = float(state.epot_total) / n
            extra.append(ep_a - getattr(self, "_old_epot_eng", ep_a))
            self._old_epot_eng = ep_a
            flat = state.scene.flatten_atoms()
            m = np.asarray(flat["mask"])
            dx = (self.cfg.timestep * np.asarray(flat["mom"])[m]
                  / np.asarray(flat["mass"])[m, None])
            extra.append(float(np.sqrt((dx * dx).sum()
                                       / max(nactive, 1.0))))
            extra.append(float(np.sqrt((dx * dx).max(initial=0.0))))
        self.eng.write(
            time=float(state.step - 1) * self.cfg.timestep,
            epot_per_atom=float(state.epot_total) / n,
            temperature=2.0 * ekin / max(nactive, 1.0),
            pressure=(2.0 * ekin + float(state.virial)) / (3.0 * vol),
            volume=vol,
            eta=float(state.eta) * self.cfg.tau_eta
            if self.ensemble == "nvt" else None,
            ttm_eng=ttm_eng,
            extra=extra,
        )

    def _ordpar_active(self) -> bool:
        return bool(self.cfg.op_weight) and (
            self.pair is not None or self.eam is not None)

    def _with_ordpar(self, scene):
        """ORDPAR: config outputs carry the weighted short-range order
        parameter in the Epot column (imd_io.c:3283 'ordpar'; the
        reference computes it as a POTENG side effect of every force
        call, imd_forces.c:195-198 — here at I/O boundaries only, the
        total potential energy in .eng is unchanged either way)."""
        if not self._ordpar_active():
            return scene
        from imd_tpu.ops.forces import compute_ordpar
        pot = self.pair if self.pair is not None else self.eam.pair
        nt = max(int(self.cfg.ntypes), 1)
        nn = nt * nt
        w = (list(self.cfg.op_weight) + [0.0] * nn)[:nn]
        rc = list(self.cfg.op_rcut) or [self.cutoff] * nn
        rc = (rc + [rc[-1]] * nn)[:nn]
        op = compute_ordpar(scene, pot, rc, w, ntypes=nt)
        return scene.replace(epot=op)

    def _chkpt_data(self, state: SimState) -> ChkptData:
        """Assemble the checkpoint record with the reference's optional
        extra columns in its order (write_header_config, imd_io.c:3266-
        3336): Epot/ordpar, n_nbr (NNBR), DISLOC refs, eam_rho [eam_p]
        (EAM2 default unless ``norhoh``)."""
        cfg = self.cfg
        if self._ordpar_active():
            state = state.replace(scene=self._with_ordpar(state.scene))
        flat = state.scene.flatten_atoms()
        mask = np.asarray(flat["mask"])
        mass = np.asarray(flat["mass"])[mask]
        pos = np.asarray(flat["pos"])[mask]
        epot = np.asarray(flat["epot"])[mask]
        columns = "number type mass x y z vx vy vz Epot".split()
        data = epot[:, None]
        if any(cfg.nb_rcut):
            # coordination column (NNBR, imd_io.c:3296); recomputed at
            # the write boundary instead of every force call
            from imd_tpu.ops.forces import compute_nbanz
            nb = compute_nbanz(state.scene, self._nb_rcut_table(),
                               cfg.ntypes)
            data = np.concatenate(
                [data, np.asarray(nb).reshape(-1)[mask, None]], axis=1)
            columns.append("n_nbr")
        sel = getattr(self, "_sel", None)
        if sel is not None and (sel.ort_ref is not None
                                or sel.epot_ref is not None):
            # persist the DISLOC references like the reference's extra
            # config columns (imd_io.c:3300-3311): uncaptured ids fall
            # back to their current state (zero displacement on reload)
            ids = np.asarray(flat["id"])[mask].astype(int)
            n = ids.max() + 1 if len(ids) else 0
            oref = sel._ensure(sel.ort_ref, n, 3, fill=np.nan)[ids]
            m = np.isnan(oref[:, 0])
            oref[m] = pos[m]
            eref = sel._ensure(sel.epot_ref, n, fill=np.nan)[ids]
            eref[np.isnan(eref)] = epot[np.isnan(eref)]
            data = np.concatenate([data, oref, eref[:, None]], axis=1)
            columns += "x_ref y_ref z_ref Epot_ref".split()
        if self.eam is not None and not cfg.norhoh:
            # EAM2 writes the host density by default (imd_io.c:3312,
            # suppressed by the NORHOH flag -> `norhoh` tag); EEAM adds
            # the second density p (eam_p, imd_io.c:3315)
            res = self._compute_forces_tables(state.scene, False, False)
            data = np.concatenate(
                [data, np.asarray(res.rho).reshape(-1)[mask, None]],
                axis=1)
            columns.append("eam_rho")
            if res.eeam_p is not None:
                data = np.concatenate(
                    [data, np.asarray(res.eeam_p).reshape(-1)[mask, None]],
                    axis=1)
                columns.append("eam_p")
        if self._ordpar_active():
            # the Epot column holds the order parameter (imd_io.c:3283)
            columns = ["ordpar" if c == "Epot" else c for c in columns]
        return ChkptData(
            number=np.asarray(flat["id"])[mask],
            type=np.asarray(flat["vtype"])[mask],
            mass=mass,
            pos=pos,
            vel=np.asarray(flat["mom"])[mask] / mass[:, None],
            data=data,
            columns=columns,
            box_x=np.asarray(self.box.h)[0],
            box_y=np.asarray(self.box.h)[1],
            box_z=np.asarray(self.box.h)[2],
        )

    def _nb_rcut_table(self):
        """nb_rcut padded/clipped to [ntypes*ntypes] (imd_param.c:663)."""
        nn = self.cfg.ntypes * self.cfg.ntypes
        rc = list(self.cfg.nb_rcut)
        rc = (rc + [rc[-1] if rc else 0.0] * nn)[:nn]
        return rc

    def write_checkpoint(self, state: SimState, fzhlr: int):
        d = self._chkpt_data(state)
        # fzhlr == -1: the reference's end-of-run "-final" checkpoint
        # (write_config(-1) naming, imd_io_3d.c:995-999)
        base = self._path(self.cfg.outfiles + "-final" if fzhlr == -1
                          else f"{self.cfg.outfiles}.{fzhlr:05d}")
        write_chkpt(base + ".chkpt", d, binary=bool(self.cfg.binary_output),
                    double=bool(self.cfg.hpo),
                    precision=17 if self.cfg.hpo else 12)
        # hc_count rides the .itr so the .hcgrad line numbering survives
        # restarts (imd_io_3d.c:1108)
        extra = ({"hc_count": self._hc.count}
                 if getattr(self, "_hc", None) is not None else None)
        write_itr(base + ".itr", checkpoint=fzhlr,
                  startstep=int(state.step) + 1,
                  box_x=d.box_x, box_y=d.box_y, box_z=d.box_z,
                  extra=extra)
        # subsystem restart state rides the same numbering so `-r N` is
        # self-contained (the reference cross-links imdrestart to
        # ttm_int/checkpt_int instead, imd_ttm.c:1170-1195)
        if self.cfg.ttm.enabled and state.ttm_grid is not None:
            from imd_tpu.io.ttm_io import write_ttm, write_ttm_aux
            write_ttm(base + ".ttm", state.ttm_grid,
                      colrad_c=(state.cstate.c if state.cstate is not None
                                else None),
                      colrad_p=(state.cstate.p if state.cstate is not None
                                else None),
                      vlat=state.vstate)
            write_ttm_aux(base + ".ttmaux.npz", fdtd=state.fdtd,
                          vlat=state.vstate, grid=state.ttm_grid,
                          fdi=state.fdi, ids=state.scene.id,
                          alive=state.scene.mask)
        if self.nrb_state is not None:
            from imd_tpu.models.nrb import write_nrb
            write_nrb(base + ".nrb", self.nrb_state)

    def _write_named_config(self, state: SimState, kind: str, gstep: int):
        """GETMIN/GETSADDLE configs at PxF sign crossings
        (write_minconfig/write_saddleconfig, imd_io.c:235-283): a full
        checkpoint named `<outfiles>.<step>.<kind><Epot/atom>`."""
        n = max(int(state.scene.n_atoms()), 1)
        d = self._chkpt_data(state)
        name = f"{self.cfg.outfiles}.{gstep}." \
               f"{kind}{float(state.epot_total) / n:.8f}"
        write_chkpt(self._path(name), d,
                    binary=bool(self.cfg.binary_output),
                    precision=17 if self.cfg.hpo else 12)

    def _check_pxf_crossing(self, state: SimState, gstep: int):
        """Write min/saddle configs when sum(p.F) changes sign
        (imd_main_3d.c:508-522; compile flags GETMIN/GETSADDLE ->
        runtime tags).  Needs per-step dispatch (interval 1)."""
        pxf = float(state.stats.pxf)
        last = getattr(self, "_last_pxf", None)
        self._last_pxf = pxf
        if last is None:
            return
        if self.cfg.getsaddle and last < 0.0 <= pxf:
            self._write_named_config(state, "saddle", gstep)
        if self.cfg.getmin and last >= 0.0 > pxf:
            self._write_named_config(state, "min", gstep)

    def _write_laser_log(self, state: SimState, gstep: int):
        """Per-interval laser-energy accounting — the reference's
        per-step printf (imd_ttm.c:150-155: step, I_t, Eabs, t-t0,
        Refl, laser_active) as a `.laser` log file.  Eabs is the
        cumulative absorbed fluence (grid.eabs over the y*z spot
        area, eV -> J/m^2); I_t and the TMM reflectivity come from a
        diagnostic tmm_solve on the CURRENT grid profile."""
        from imd_tpu import units
        cfg = self.cfg
        g = getattr(state, "ttm_grid", None)
        if g is None:
            return
        t_si = gstep * float(cfg.timestep) * units.TIME_UNIT_S
        it = refl = float("nan")
        active = ""
        if getattr(self, "tmm_params", None) is not None:
            from imd_tpu.models import tmm as tmm_mod
            _, diag = tmm_mod.do_tmm(g, self.ttm_params, self.tmm_params,
                                     t_si)
            it = float(diag["I_t"])
            refl = float(diag["refl"])
            active = f" {int(diag['laser_active'])}"
        hts = self.box.heights()
        area = float(hts[1] * hts[2]) * 1e-20          # A^2 -> m^2
        eabs = float(g.eabs) * units.EV_TO_J / max(area, 1e-300)
        path = self._path(cfg.outfiles + ".laser")
        header = not os.path.exists(path)
        with open(path, "a") as f:
            if header:
                f.write("# step t_fs I_t_Wm2 Eabs_Jm2 refl"
                        + (" laser_active" if active else "") + "\n")
            f.write(f"{gstep} {t_si * 1e15:.4f} {it:.6e} {eabs:.6e} "
                    f"{refl:.6e}{active}\n")

    def _write_periodic_extras(self, state: SimState, gstep: int):
        """Periodic `.wf` force dumps (WRITEF, imd_main_3d.c:436-440)
        and `.nb` coordination-filtered configs (NNBR, 750-752)."""
        cfg = self.cfg
        if (cfg.ttm.enabled and cfg.eng_int > 0
                and gstep % cfg.eng_int == 0):
            self._write_laser_log(state, gstep)
        wf_due = cfg.force_int > 0 and gstep % cfg.force_int == 0
        nb_due = (cfg.nb_checkpt_int > 0 and any(cfg.nb_rcut)
                  and gstep % cfg.nb_checkpt_int == 0)
        press_due = cfg.press_int > 0 and gstep % cfg.press_int == 0
        if not (wf_due or nb_due or press_due):
            return
        flat = state.scene.flatten_atoms()
        m = np.asarray(flat["mask"])
        fl = {k: np.asarray(v)[m] for k, v in flat.items() if k != "mask"}
        if press_due:
            # per-atom pressure tensors from the oracle engine at I/O
            # cadence (STRESS_TENS, write_config_press imd_io.c:1264)
            from imd_tpu.io.select import write_press
            from imd_tpu.ops.forces import (compute_eam_forces,
                                            compute_pair_forces)
            if self.eam is not None:
                res = compute_eam_forces(state.scene, self.eam,
                                         ntypes=cfg.ntypes,
                                         per_atom_stress=True)
            elif self.pair is not None:
                res = compute_pair_forces(state.scene, self.pair,
                                          ntypes=cfg.ntypes,
                                          per_atom_stress=True)
            else:
                res = None
            if res is not None and res.presstens_atom is not None:
                pt = np.asarray(res.presstens_atom).reshape(-1, 6)[m]
                write_press(self._path(
                    f"{cfg.outfiles}.{gstep // cfg.press_int}.stress"),
                    fl, pt, np.asarray(self.box.h), self.box.pbc)
        if wf_due:
            from imd_tpu.io.select import write_force_potfit, write_wf
            write_wf(self._path(
                f"{cfg.outfiles}.{gstep // cfg.force_int}.wf"),
                fl, np.asarray(self.box.h), self.box.pbc,
                force_all=bool(cfg.force_all))
            if cfg.force_potfit:
                n = max(len(fl["epot"]), 1)
                write_force_potfit(self._path(
                    f"{cfg.outfiles}.{gstep // cfg.force_int}.force"),
                    fl, np.asarray(self.box.h), self.box.pbc,
                    float(fl["epot"].sum()) / n,
                    presstens=np.asarray(state.presstens),
                    volume=float(state.scene.grid.box.volume))
        if nb_due:
            from imd_tpu.io.select import write_nb
            from imd_tpu.ops.forces import compute_nbanz
            nb = np.asarray(compute_nbanz(
                state.scene, self._nb_rcut_table(),
                self.cfg.ntypes)).reshape(-1)[m]
            write_nb(self._path(
                f"{cfg.outfiles}.{gstep // cfg.nb_checkpt_int}.nb"),
                fl, nb, np.asarray(self.box.h), self.box.pbc,
                [int(v) for v in cfg.nb_cut_lower],
                [int(v) for v in cfg.nb_cut_upper],
                cfg.pic_ll, cfg.pic_ur)

    # convenience constructors ------------------------------------------------
    @classmethod
    def from_param_file(cls, path: str, phase: int = 1, **kw) -> "Simulation":
        cfg = SimConfig.from_file(path, phase)
        kw.setdefault("workdir", os.path.dirname(os.path.abspath(path)))
        return cls(cfg, **kw)
