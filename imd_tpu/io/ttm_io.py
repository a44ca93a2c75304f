"""`.ttm` grid output / restart input (ttm_writeout / ttm_read,
imd_ttm.c:1683/1983).

Text table, one row per FD cell, header (imd_ttm.c:1885):
    #x y z natoms temp md_temp U xi source dens vx vy vz fd_k fd_g Z proc Ce
The same file doubles as the TTM restart input.
"""

from __future__ import annotations

import numpy as np

COLUMNS = ("x", "y", "z", "natoms", "temp", "md_temp", "U", "xi", "source",
           "dens", "vx", "vy", "vz", "fd_k", "fd_g", "Z", "proc", "Ce")


def write_ttm(path: str, grid) -> None:
    """Write a TTMGrid (host transfer) in the reference's layout."""
    nx = len(np.asarray(grid.temp))
    cols = {
        "natoms": np.asarray(grid.natoms, np.int64),
        "temp": np.asarray(grid.temp), "md_temp": np.asarray(grid.md_temp),
        "U": np.asarray(grid.U), "xi": np.asarray(grid.xi),
        "source": np.asarray(grid.source), "dens": np.asarray(grid.dens),
        "vx": np.asarray(grid.vcom)[:, 0], "vy": np.asarray(grid.vcom)[:, 1],
        "vz": np.asarray(grid.vcom)[:, 2],
        "fd_k": np.asarray(grid.fd_k), "fd_g": np.asarray(grid.fd_g),
        "Z": np.asarray(grid.Z), "Ce": np.asarray(grid.Ce),
    }
    with open(path, "w") as f:
        f.write("#" + " ".join(COLUMNS) + "\n")
        for i in range(nx):
            vals = [str(i), "0", "0", str(int(cols["natoms"][i]))]
            for name in COLUMNS[4:]:
                if name == "proc":
                    vals.append("0")
                else:
                    vals.append("%e" % float(cols[name][i]))
            f.write(" ".join(vals) + "\n")


def read_ttm(path: str) -> dict:
    """Read a .ttm file into a dict of numpy columns (restart input)."""
    with open(path) as f:
        header = f.readline().lstrip("#").split()
        data = np.loadtxt(f)
    data = np.atleast_2d(data)
    return {name: data[:, i] for i, name in enumerate(header)}


def grid_from_ttm(path: str, grid, dtype=None):
    """Restore a TTMGrid's restartable fields from a .ttm file."""
    import jax.numpy as jnp
    d = read_ttm(path)
    nx = len(np.asarray(grid.temp))
    if len(d["temp"]) < nx:
        raise ValueError(f".ttm file has {len(d['temp'])} cells, grid has {nx}")
    dt = dtype or grid.temp.dtype

    def a(name):
        return jnp.asarray(d[name][:nx], dt)

    return grid.replace(
        temp=a("temp"), md_temp=a("md_temp"), U=a("U"),
        natoms=jnp.asarray(d["natoms"][:nx], jnp.int32),
        natoms_old=jnp.asarray(d["natoms"][:nx], jnp.int32),
        dens=a("dens"),
        vcom=jnp.stack([a("vx"), a("vy"), a("vz")], axis=-1),
        xi=a("xi"), source=a("source"), Z=a("Z"),
        fd_k=a("fd_k"), fd_g=a("fd_g"), Ce=a("Ce"),
        init_done=jnp.ones((), bool),
    )
