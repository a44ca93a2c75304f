"""`.ttm` grid output / restart input (ttm_writeout / ttm_read,
imd_ttm.c:1683/1983).

Text table, one row per FD cell, header (imd_ttm.c:1885):
    #x y z natoms temp md_temp U xi source dens vx vy vz fd_k fd_g Z proc Ce
The same file doubles as the TTM restart input.  Works for both the 1-D
[nx] grid (y = z = 0) and the 3-D [nx,ny,nz] variant (row-major voxel
order, matching the reference's i/j/k loop nest).
"""

from __future__ import annotations

import numpy as np

COLUMNS = ("x", "y", "z", "natoms", "temp", "md_temp", "U", "xi", "source",
           "dens", "vx", "vy", "vz", "fd_k", "fd_g", "Z", "proc", "Ce")


def _dims(grid):
    shape = np.asarray(grid.temp).shape
    return shape if len(shape) == 3 else (shape[0], 1, 1)


def write_ttm(path: str, grid) -> None:
    """Write a TTM grid (host transfer) in the reference's layout."""
    nx, ny, nz = _dims(grid)
    n = nx * ny * nz
    vcom = np.asarray(grid.vcom).reshape(n, 3)
    cols = {
        "natoms": np.asarray(grid.natoms, np.int64).reshape(n),
        "temp": np.asarray(grid.temp).reshape(n),
        "md_temp": np.asarray(grid.md_temp).reshape(n),
        "U": np.asarray(grid.U).reshape(n),
        "xi": np.asarray(grid.xi).reshape(n),
        "source": np.asarray(grid.source).reshape(n),
        "dens": np.asarray(grid.dens).reshape(n),
        "vx": vcom[:, 0], "vy": vcom[:, 1], "vz": vcom[:, 2],
        "fd_k": np.asarray(grid.fd_k).reshape(n),
        "fd_g": np.asarray(grid.fd_g).reshape(n),
        "Z": np.asarray(grid.Z).reshape(n),
        "Ce": np.asarray(grid.Ce).reshape(n),
    }
    with open(path, "w") as f:
        f.write("#" + " ".join(COLUMNS) + "\n")
        for i in range(n):
            ix, rem = divmod(i, ny * nz)
            iy, iz = divmod(rem, nz)
            vals = [str(ix), str(iy), str(iz), str(int(cols["natoms"][i]))]
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
    """Restore a TTM grid's restartable fields from a .ttm file."""
    import jax.numpy as jnp
    d = read_ttm(path)
    shape = np.asarray(grid.temp).shape
    n = int(np.prod(shape))
    if len(d["temp"]) < n:
        raise ValueError(f".ttm file has {len(d['temp'])} cells, "
                         f"grid has {n}")
    dt = dtype or grid.temp.dtype

    def a(name):
        return jnp.asarray(d[name][:n], dt).reshape(shape)

    return grid.replace(
        temp=a("temp"), md_temp=a("md_temp"), U=a("U"),
        natoms=jnp.asarray(d["natoms"][:n], jnp.int32).reshape(shape),
        natoms_old=jnp.asarray(d["natoms"][:n], jnp.int32).reshape(shape),
        dens=a("dens"),
        vcom=jnp.stack([a("vx"), a("vy"), a("vz")], axis=-1),
        xi=a("xi"), source=a("source"), Z=a("Z"),
        fd_k=a("fd_k"), fd_g=a("fd_g"), Ce=a("Ce"),
        init_done=jnp.ones((), bool),
    )
