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


def write_ttm(path: str, grid, colrad_c=None, vlat=None,
              colrad_p=None, ref_ranks: int = 1) -> None:
    """Write a TTM grid (host transfer) in the reference's layout.

    ``colrad_c`` [n, nlev]: COLRAD level populations appended as extra
    self-describing columns c0..c{nlev-1} (the reference appends its
    COLRAD power columns to the same file, imd_ttm.c:1885-1897; the
    populations themselves go to colrad_write's own file,
    imd_colrad.c:2991 — here one file carries both).

    ``vlat`` (VlatState): virtual-lattice cells appended as extra rows
    with the reference's natoms = -2 sentinel (imd_ttm.c:1926-1947),
    so the file restarts reference runs with VLATTICE enabled.

    ``ref_ranks``: write the proc column as the owning rank of an
    N-rank reference run (x-block decomposition, imd_ttm.c:963) — the
    reference's restart reader routes rows by ``buf[l].proc == myid``
    (ttm_read copy loop), so a reference with cpu_dim N needs real rank
    numbers here.  The vlat rows carry the rank owning the last active
    cell (cur_vlattice_proc is read from the file) and that cell's
    density (FILLMESH feeds vlat dens to the EOS)."""
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
    names = list(COLUMNS)
    if colrad_c is not None:
        cc = np.asarray(colrad_c).reshape(n, -1)
        for lev in range(cc.shape[1]):
            names.append(f"c{lev}")
            cols[f"c{lev}"] = cc[:, lev]
    if colrad_p is not None:
        # the reference's 5 COLRAD power columns (imd_ttm.c:1885-1897)
        from imd_tpu.models.colrad import POWER_KEYS
        pp = np.asarray(colrad_p).reshape(n, -1)
        for k, key in enumerate(POWER_KEYS[:pp.shape[1]]):
            names.append(key)
            cols[key] = pp[:, k]
    per_rank = max(1, nx // max(1, ref_ranks))
    active = np.nonzero(cols["natoms"] > 0)[0]
    last_dens = float(cols["dens"][active[-1]]) if len(active) else 0.0
    last_rank = (min(int(active[-1] // (ny * nz)) // per_rank,
                     ref_ranks - 1) if len(active) else 0)
    with open(path, "w") as f:
        f.write("#" + " ".join(names) + "\n")
        for i in range(n):
            ix, rem = divmod(i, ny * nz)
            iy, iz = divmod(rem, nz)
            vals = [str(ix), str(iy), str(iz), str(int(cols["natoms"][i]))]
            for name in names[4:]:
                if name == "proc":
                    vals.append(str(min(ix // per_rank, ref_ranks - 1)))
                else:
                    vals.append("%e" % float(cols[name][i]))
            f.write(" ".join(vals) + "\n")
        if vlat is not None:
            te = np.asarray(vlat.te)
            ti = np.asarray(vlat.ti)
            for k in range(len(te)):
                row = [str(nx + k), "0", "0", "-2", "%e" % te[k],
                       "%e" % ti[k]]
                for name in names[6:]:
                    if name == "dens":
                        row.append("%e" % last_dens)
                    elif name == "proc":
                        row.append(str(last_rank))
                    else:
                        row.append("0.000000e+00")
                f.write(" ".join(row) + "\n")


def read_ttm(path: str) -> dict:
    """Read a .ttm file into a dict of numpy columns (restart input)."""
    with open(path) as f:
        header = f.readline().lstrip("#").split()
        data = np.loadtxt(f)
    data = np.atleast_2d(data)
    return {name: data[:, i] for i, name in enumerate(header)}


def vlat_from_ttm(path: str, vlat_template):
    """Restore VLATTICE temperatures from the natoms = -2 rows the
    reference appends to .ttm files (imd_ttm.c:1926); returns the
    template with te/ti replaced, or None when the file has no vlat
    rows."""
    import jax.numpy as jnp
    d = read_ttm(path)
    m = np.asarray(d["natoms"]) == -2
    if not m.any():
        return None
    te = np.asarray(d["temp"])[m]
    ti = np.asarray(d["md_temp"])[m]
    nv = len(np.asarray(vlat_template.te))
    if len(te) < nv:
        return None
    return vlat_template.replace(
        te=jnp.asarray(te[:nv], vlat_template.te.dtype),
        ti=jnp.asarray(ti[:nv], vlat_template.ti.dtype))


def colrad_from_ttm(path: str, nlev: int, dtype=None):
    """Restore COLRAD populations [n, nlev] from the c* columns, or None
    if the file carries none (imd_colrad.c:3028 colrad_read analog)."""
    import jax.numpy as jnp
    d = read_ttm(path)
    if "c0" not in d:
        return None
    cols = [d[f"c{k}"] for k in range(nlev) if f"c{k}" in d]
    return jnp.asarray(np.stack(cols, axis=-1),
                       dtype or jnp.float32)


def write_ttm_aux(path: str, fdtd=None, vlat=None, grid=None,
                  fdi=None, ids=None, alive=None) -> None:
    """Sidecar with FDTD field state and VLATTICE temperatures.

    The reference packs FDTD fields as 10 extra .ttm columns and vlat
    cells as extra rows (imd_ttm.c:1683-2100); here they live in one
    .npz next to the .ttm — same restart capability, self-describing
    (the FDTD arrays include PML cells, so their length differs from
    the grid's).

    ``grid`` additionally snapshots the TTM grid's restartable fields
    at FULL binary precision: the text `.ttm` stores %e (6 significant
    digits), which truncates Te/U by ~1e-6 relative on restart — enough
    to break f64 restart-continuity tests (the reference has the same
    truncation; our own restarts shouldn't)."""
    arrs = {}
    if fdtd is not None:
        for name in fdtd.__dataclass_fields__:
            arrs[f"fdtd_{name}"] = np.asarray(getattr(fdtd, name))
    if vlat is not None:
        arrs["vlat_te"] = np.asarray(vlat.te)
        arrs["vlat_ti"] = np.asarray(vlat.ti)
    if grid is not None:
        # natoms_old is dynamic state the text .ttm cannot carry: the
        # PREVIOUS step's per-cell counts feed the advection U-scaling
        # (U' = U*N_old/N_new, do_ADV, imd_ttm.c:1208) — restoring it
        # as natoms would skew the first restarted step by 1/N per
        # migrated atom
        for name in ("temp", "md_temp", "U", "natoms", "natoms_old",
                     "dens", "source", "xi"):
            v = getattr(grid, name, None)
            if v is not None:
                arrs[f"grid_{name}"] = np.asarray(v)
    if fdi is not None and ids is not None:
        # per-atom FD cell index of the LAST update_fd (the reference
        # stores fdi/fdj/fdk per atom, types.h:327-330, but loses them
        # over a restart — its documented restart advection glitch);
        # keyed by atom id so the restart's re-binned slot layout can
        # look them up
        f = np.asarray(fdi).ravel()
        i = np.asarray(ids).ravel()
        keep = (np.asarray(alive).ravel() if alive is not None
                else i >= 0)
        arrs["fdi_ids"] = i[keep]
        arrs["fdi_vals"] = f[keep]
    np.savez(path, **arrs)


def read_ttm_aux(path: str, fdtd_template=None, vlat_template=None):
    """Returns (fdtd_state, vlat_state) restored onto the templates
    (None where the file has no entry)."""
    import jax.numpy as jnp
    d = np.load(path)
    fdtd = vlat = None
    if fdtd_template is not None and any(k.startswith("fdtd_")
                                         for k in d.files):
        kw = {}
        for name in fdtd_template.__dataclass_fields__:
            key = f"fdtd_{name}"
            ref = getattr(fdtd_template, name)
            kw[name] = (jnp.asarray(d[key], ref.dtype)
                        if key in d.files else ref)
        fdtd = type(fdtd_template)(**kw)
    if vlat_template is not None and "vlat_te" in d.files:
        vlat = vlat_template.replace(
            te=jnp.asarray(d["vlat_te"], vlat_template.te.dtype),
            ti=jnp.asarray(d["vlat_ti"], vlat_template.ti.dtype))
    return fdtd, vlat


def grid_overlay_from_aux(path: str, grid):
    """Overlay the FULL-precision grid snapshot from a .ttmaux.npz (if
    present) onto a grid already restored from the text .ttm — undoing
    the %e truncation for imd_tpu-written restarts while staying able
    to restart from reference-written .ttm files alone."""
    import jax.numpy as jnp
    d = np.load(path)
    kw = {}
    for name in ("temp", "md_temp", "U", "dens", "source", "xi"):
        key = f"grid_{name}"
        if key in d.files:
            ref = getattr(grid, name)
            kw[name] = jnp.asarray(d[key], ref.dtype).reshape(ref.shape)
    if "grid_natoms" in d.files:
        nat = jnp.asarray(d["grid_natoms"], jnp.int32).reshape(
            grid.natoms.shape)
        kw["natoms"] = nat
        kw["natoms_old"] = nat
    if "grid_natoms_old" in d.files:
        kw["natoms_old"] = jnp.asarray(
            d["grid_natoms_old"], jnp.int32).reshape(grid.natoms.shape)
    return grid.replace(**kw) if kw else grid


def fdi_from_aux(path: str, scene_ids, scene_alive):
    """Rebuild the per-atom FD index array for the restart's (re-binned)
    slot layout by atom id; -1 (= "no previous index") for dead slots
    and ids the sidecar doesn't know (FILTER-deleted since the write).
    Returns None if the sidecar predates the fdi snapshot."""
    d = np.load(path)
    if "fdi_ids" not in d.files:
        return None
    saved_ids = np.asarray(d["fdi_ids"])
    saved_fdi = np.asarray(d["fdi_vals"])
    order = np.argsort(saved_ids)
    sid = saved_ids[order]
    sfd = saved_fdi[order]
    ids = np.asarray(scene_ids)
    shape = ids.shape
    flat = ids.ravel()
    pos = np.searchsorted(sid, flat)
    pos = np.clip(pos, 0, len(sid) - 1)
    ok = (len(sid) > 0) & (sid[pos] == flat) & np.asarray(
        scene_alive).ravel()
    out = np.where(ok, sfd[pos], -1).astype(np.int32)
    return out.reshape(shape)


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
