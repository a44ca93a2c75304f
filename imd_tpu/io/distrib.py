"""Spatial distribution (binned field) output (imd_distrib.c).

`compute_distrib` bins per-atom quantities onto a dist_dim grid with
`segment_sum` (the reference loops atoms into float arrays and reduces
over MPI, make_distrib_density:400-440); `write_distrib` emits the
reference's file format exactly (write_distrib_header, imd_distrib.c:805):

    #F <A|B|L> dim n_coord n_data
    #C <contents>
    #D nx ny nz
    #S sx sy sz
    #E
    <data: x-major loop order, ASCII columns or float32 binary>

Supported fields (dist_*_flag tags): num/dens, Ekin, Epot, mdtemp
(kinetic temperature with the bin's COM motion removed), vx/vy/vz,
press (trace of the per-atom kinetic+virial stress is not stored
per-atom; the kinetic part is used, like dist_press_fun's momentum
term).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imd_tpu.scene import Scene


def compute_distrib(scene: Scene, dist_dim: Tuple[int, int, int],
                    ll=None, ur=None) -> Dict[str, np.ndarray]:
    """Bin atoms onto the dist grid; returns field arrays [nx,ny,nz]."""
    nx, ny, nz = dist_dim
    n_bins = nx * ny * nz
    box = scene.grid.box
    dtype = scene.pos.dtype
    ll = jnp.zeros((3,), dtype) if ll is None else jnp.asarray(ll, dtype)
    if ur is None:
        ur = jnp.diag(box.h)
    ur = jnp.asarray(ur, dtype)
    width = (ur - ll) / jnp.asarray(dist_dim, dtype)

    flat = scene.flatten_atoms()
    m = flat["mask"]
    ijk = jnp.floor((flat["pos"] - ll) / width).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, jnp.asarray(dist_dim, jnp.int32) - 1)
    b = (ijk[:, 0] * ny + ijk[:, 1]) * nz + ijk[:, 2]
    seg = jnp.where(m, b, n_bins)

    def ssum(x):
        return jax.ops.segment_sum(x, seg, num_segments=n_bins + 1)[:n_bins]

    fm = m.astype(dtype)
    num = ssum(fm)
    inv_mass = jnp.where(m, 1.0 / jnp.maximum(flat["mass"], 1e-30), 0.0)
    ekin = ssum(0.5 * jnp.sum(flat["mom"] ** 2, -1) * inv_mass)
    epot = ssum(flat["epot"] * fm)
    mom = ssum(flat["mom"] * fm[:, None])
    mass = ssum(flat["mass"] * fm)
    vcom = jnp.where(mass[:, None] > 0, mom / mass[:, None], 0.0)
    # kinetic temperature with bin COM removed (make_distrib_temperature)
    v = flat["mom"] * inv_mass[:, None]
    dv = (v - vcom[seg.clip(0, n_bins - 1)]) * fm[:, None]
    mdt = ssum(jnp.sum(dv * dv, -1) * flat["mass"])
    mdtemp = jnp.where(num > 0, mdt / (3.0 * jnp.maximum(num, 1.0)), 0.0)

    out = {
        "num": num, "Ekin": ekin, "Epot": epot,
        "mdtemp": mdtemp,
        "vx": vcom[:, 0], "vy": vcom[:, 1], "vz": vcom[:, 2],
    }
    return {k: np.asarray(v, np.float32).reshape(dist_dim)
            for k, v in out.items()}


def write_distrib(path: str, fields: Dict[str, np.ndarray],
                  names: Sequence[str], dist_dim, bin_size,
                  mode: str = "ascii") -> None:
    """Write selected fields in the reference layout (one file, n_data
    columns).  mode: 'ascii', 'ascii_coord', or 'binary'."""
    nx, ny, nz = dist_dim
    n = len(names)
    fmt = {"binary": ("L" if np.little_endian else "B"),
           "ascii": "A", "ascii_coord": "A"}[mode]
    n_coord = 3 if mode == "ascii_coord" else 0
    with open(path, "wb") as f:
        hdr = (f"#F {fmt} 3 {n_coord} {n}\n"
               + ("#C x y z " if n_coord else "#C ")
               + " ".join(names) + "\n"
               + f"#D {nx} {ny} {nz}\n"
               + "#S " + " ".join(f"{s:e}" for s in bin_size) + "\n"
               + f"## Generated on {time.ctime()}\n"
               + "## by imd_tpu\n#E\n")
        f.write(hdr.encode())
        data = np.stack([np.asarray(fields[k], np.float32).reshape(-1)
                         for k in names], axis=1)
        if mode == "binary":
            f.write(data.astype("<f4" if fmt == "L" else ">f4").tobytes())
        else:
            lines = []
            for idx in range(data.shape[0]):
                row = ""
                if n_coord:
                    i = idx // (ny * nz)
                    j = (idx // nz) % ny
                    k = idx % nz
                    row = f"{i} {j} {k} "
                row += " ".join(f"{v:.6e}" for v in data[idx])
                lines.append(row)
            f.write(("\n".join(lines) + "\n").encode())


def read_distrib(path: str):
    """Read back a distribution file (both formats)."""
    with open(path, "rb") as f:
        raw = f.read()
    head, _, rest = raw.partition(b"#E\n")
    meta = {}
    for line in head.decode().splitlines():
        if line.startswith("#F"):
            tok = line.split()
            meta["fmt"], meta["n"] = tok[1], int(tok[4])
            meta["n_coord"] = int(tok[3])
        elif line.startswith("#D"):
            meta["dim"] = tuple(int(x) for x in line.split()[1:])
        elif line.startswith("#S"):
            meta["size"] = tuple(float(x) for x in line.split()[1:])
        elif line.startswith("#C"):
            meta["contents"] = line.split()[1:]
    if meta["fmt"] in ("L", "B"):
        dt = "<f4" if meta["fmt"] == "L" else ">f4"
        data = np.frombuffer(rest, dt).reshape(-1, meta["n"])
    else:
        data = np.loadtxt(rest.decode().splitlines(), ndmin=2)
        if meta["n_coord"]:
            data = data[:, meta["n_coord"]:]
    return meta, data.reshape(meta["dim"] + (meta["n"],))
