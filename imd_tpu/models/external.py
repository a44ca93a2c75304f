"""External-library force bridges: OpenKIM and ScaFaCoS analogs.

Reference: imd_forces_kim.c (OpenKIM model bridge, 1217 LoC) and
imd_forces_fcs.c (ScaFaCoS long-range Coulomb solver bridge, 576 LoC).
Both delegate the force computation to an external native library that
is not part of the reference tree (and not present in this image); the
IMD side is marshalling: pack neighbor lists/positions, call, unpack
forces.

Here the bridge is gated: if the host environment provides `kimpy`
(OpenKIM) the KIM path marshals through it on host via pure_callback;
otherwise a clear ImportError explains the optional dependency.  The
ScaFaCoS use case (long-range Coulomb) is served natively by
imd_tpu.models.ewald (the TPU-resident Ewald/Wolf solvers), which is
the recommended path; `fcs_forces` dispatches to it.
"""

from __future__ import annotations

import importlib
import importlib.util

import jax
import jax.numpy as jnp
import numpy as np


def have_kim() -> bool:
    return importlib.util.find_spec("kimpy") is not None


def _host_neighbor_list(pos, cutoff, box_diag):  # pragma: no cover
    """Padded [N, K] neighbor ids on host (cell-list O(N)); -1 pads.

    KIM models consume per-particle neighbor lists (the reference packs
    its NBL into the KIM API the same way, imd_forces_kim.c:600-700).
    Periodic images are handled by ghost replication of atoms within
    `cutoff` of a face, as the KIM neighbor-list helper does.
    """
    n = len(pos)
    ghosts = [pos]
    gmap = [np.arange(n)]
    for d in range(3):
        allp = np.concatenate(ghosts)
        allm = np.concatenate(gmap)
        lo = allp[:, d] < cutoff
        hi = allp[:, d] > box_diag[d] - cutoff
        shift = np.zeros(3)
        shift[d] = box_diag[d]
        ghosts = [allp, allp[lo] + shift, allp[hi] - shift]
        gmap = [allm, allm[lo], allm[hi]]
    allp = np.concatenate(ghosts)
    allm = np.concatenate(gmap)
    # brute cell binning
    cell = np.floor(allp / cutoff).astype(np.int64)
    key = (cell[:, 0] << 42) + (cell[:, 1] << 21) + cell[:, 2]
    from collections import defaultdict
    buckets = defaultdict(list)
    for i, k in enumerate(key):
        buckets[int(k)].append(i)
    neigh = [[] for _ in range(len(allp))]
    offs = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
            for k in (-1, 0, 1)]
    c2 = cutoff * cutoff
    for i in range(n):            # neighbors needed for real atoms only
        ci = cell[i]
        for o in offs:
            kk = (int(ci[0] + o[0]) << 42) + (int(ci[1] + o[1]) << 21) \
                + int(ci[2] + o[2])
            for j in buckets.get(kk, ()):
                if j == i:
                    continue
                d = allp[j] - allp[i]
                if d @ d < c2:
                    neigh[i].append(j)
    kmax = max((len(x) for x in neigh[:n]), default=1)
    out = np.full((len(allp), kmax), -1, np.int32)
    for i in range(n):
        out[i, :len(neigh[i])] = neigh[i]
    return allp, allm, out


def kim_forces(pos, types, box, model_name: str, cutoff=None):
    """OpenKIM bridge (imd_forces_kim.c analog).

    Requires the optional `kimpy` package + a KIM model install; the
    computation runs on host inside a jax.pure_callback (KIM models are
    native CPU code — there is no TPU path for arbitrary KIM models).
    Marshalling follows the reference: build a neighbor list, hand the
    model coordinates/species/contributing flags, collect forces + epot
    (imd_forces_kim.c:215-470 init, 600-720 neighbor callback).
    Returns (forces [N,3], epot [N]).
    """
    if not have_kim():
        raise ImportError(
            "OpenKIM support needs the optional 'kimpy' package and a "
            "KIM API install; neither ships in this image.  Use the "
            "native potentials (models.potential / covalent / meam / "
            "adp) instead, or install kimpy in your own environment.")
    kimpy = importlib.import_module("kimpy")  # pragma: no cover

    def _host_call(pos_np, types_np):        # pragma: no cover
        import kimpy.neighlist  # noqa: F401
        units_accepted, model = kimpy.model.create(
            kimpy.numbering.zeroBased,
            kimpy.length_unit.A, kimpy.energy_unit.eV,
            kimpy.charge_unit.e, kimpy.temperature_unit.K,
            kimpy.time_unit.ps, model_name)
        if not units_accepted:
            raise RuntimeError(f"KIM model {model_name} rejected "
                               "A/eV/e/K/ps units")
        rc = cutoff or float(model.get_influence_distance())
        box_diag = np.abs(np.diag(np.asarray(box)))
        allp, allm, nl = _host_neighbor_list(
            np.asarray(pos_np, np.float64), rc, box_diag)
        ntot = len(allp)
        compute_args = model.compute_arguments_create()
        coords = np.asarray(allp, np.float64)
        species = np.asarray(types_np, np.int32)[allm]
        contributing = np.zeros(ntot, np.int32)
        contributing[:len(pos_np)] = 1
        forces = np.zeros((ntot, 3), np.float64)
        energy_per = np.zeros(ntot, np.float64)
        can = kimpy.compute_argument_name
        compute_args.set_argument_pointer(
            can.numberOfParticles, np.array([ntot], np.int32))
        compute_args.set_argument_pointer(
            can.particleSpeciesCodes, species)
        compute_args.set_argument_pointer(
            can.particleContributing, contributing)
        compute_args.set_argument_pointer(can.coordinates, coords)
        compute_args.set_argument_pointer(can.partialForces, forces)
        compute_args.set_argument_pointer(
            can.partialParticleEnergy, energy_per)

        def get_neigh(data, cutoffs, neighbor_list_index, particle):
            row = nl[particle]
            row = row[row >= 0]
            return (row.astype(np.int32), kimpy.error_codes_ok
                    if hasattr(kimpy, "error_codes_ok") else 0)

        compute_args.set_callback_pointer(
            kimpy.compute_callback_name.GetNeighborList, get_neigh, nl)
        model.compute(compute_args)
        model.compute_arguments_destroy(compute_args)
        kimpy.model.destroy(model)
        # fold ghost forces back onto their home atoms
        n = len(pos_np)
        f = forces[:n].copy()
        np.add.at(f, allm[n:], forces[n:])
        e = energy_per[:n].copy()
        return (f.astype(pos_np.dtype), e.astype(pos_np.dtype))

    out_shape = (jax.ShapeDtypeStruct(pos.shape, pos.dtype),
                 jax.ShapeDtypeStruct(pos.shape[:-1], pos.dtype))
    return jax.pure_callback(_host_call, out_shape, pos,
                             types)  # pragma: no cover


def fcs_forces(pos, charges, box, method: str = "ewald", **kwargs):
    """ScaFaCoS bridge analog (imd_forces_fcs.c).

    The reference offloads long-range Coulomb to ScaFaCoS (P3M, FMM,
    ...).  The TPU-native equivalent is the resident Ewald summation —
    dense k-space sums map onto the MXU far better than an external
    CPU library call.  `method` accepts 'ewald' (models.ewald).
    """
    if method != "ewald":
        raise ValueError(
            f"fcs method '{method}' is not available: ScaFaCoS is not "
            "part of this image.  The TPU-native long-range solver is "
            "'ewald' (imd_tpu.models.ewald).")
    from imd_tpu.models import ewald as ewald_mod
    from imd_tpu.ops.geometry import choose_grid
    from imd_tpu.scene import make_scene

    kappa = kwargs.pop("kappa", 0.3)
    kcut = kwargs.pop("kcut", 1.2)
    r_cut = kwargs.pop("r_cut", 8.0)
    dtype = jnp.zeros(0, jnp.float64).dtype if np.asarray(
        pos).dtype == np.float64 else jnp.float32
    grid = choose_grid(box, r_cut, n_atoms=len(pos))
    # per-atom charges ride the per-type charge table by giving every
    # atom its own type index
    scene = make_scene(grid, pos, type=np.arange(len(pos), dtype=np.int32),
                       dtype=dtype)
    ew = ewald_mod.make_ewald(np.asarray(box.h), kappa, kcut, dtype=dtype)
    charges = jnp.asarray(charges, dtype)
    e, g = jax.value_and_grad(
        lambda p: ewald_mod.ewald_energy(scene.replace(pos=p), charges,
                                         ew))(scene.pos)
    return e, -g, scene
