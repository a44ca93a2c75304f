"""imd_tpu — a TPU-native molecular-dynamics / two-temperature-model framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of lasMD
(E. Eisfeld's laser-ablation fork of ITAP IMD; reference at
fmqeisfeld/IMD): classical short-range MD (pair + EAM potentials) coupled
to a finite-difference electron-temperature grid (TTM) with wide-range
transport models, 1D Helmholtz (TMM) and FDTD Maxwell laser solvers,
non-reflecting boundaries, and ablation hygiene (filtering, absorbing
ramps) — built TPU-first:

- fixed-capacity per-cell SoA atom arrays (static shapes everywhere),
- neighbor access by lattice `roll` instead of gather/scatter,
- `shard_map` + `ppermute` halo exchange over a device mesh (the MPI
  equivalent of the reference's Plimpton scheme),
- Pallas kernels for the hot force loops, pure-XLA oracles for testing.
"""

__version__ = "0.1.0"

from imd_tpu import units  # noqa: F401
