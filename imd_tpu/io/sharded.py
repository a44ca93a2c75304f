"""Sharded binary checkpointing (the MPI-IO analog).

The reference's MPI-IO restart path (write_atoms_config_mpiio /
read_atoms_mpiio, imd_mpiio.c:54/171 + the bin_to_chkpt converter)
exists so large runs checkpoint without the rank-0 ASCII bottleneck.
The TPU-native equivalent is a tensorstore-backed orbax checkpoint of
the whole SimState pytree: every shard writes its own chunk, restore
re-shards onto the current mesh, and the .chkpt ASCII path stays for
reference interchange.
"""

from __future__ import annotations

import os
from typing import Any


def save_state(path: str, state: Any) -> None:
    """Write a pytree (SimState/Scene/TTMGrid/...) as an orbax checkpoint."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)


def restore_state(path: str, target: Any) -> Any:
    """Restore into the structure (and shardings) of ``target``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path, item=target)
