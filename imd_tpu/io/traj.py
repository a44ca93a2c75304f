"""nMoldyn trajectory export and dynamical-structure-factor sampling.

Reference: the main loop's periodic hooks (imd_main_3d.c:783-787) drive
two trajectory-level observers —

- **NMOLDYN** (`.nmoldyn`): a binary trajectory for the nMoldyn MD
  analysis package.  `init_nmoldyn` (imd_io.c:3606) writes a one-off
  binary header (ntypes, orth-box flag, velocity flag, per-vtype atom
  counts, box edge lengths) and zeroes per-atom wrap offsets;
  `write_nmoldyn` (imd_io.c:3664) appends, every ``nmoldyn_int`` steps,
  a float32 frame ``time, (x y z [vx vy vz]) * n_at`` ordered by atom
  number, with positions UNWRAPPED across periodic boundaries (the
  reference maintains REF_POS wrap offsets in do_boundaries,
  imd_main_3d.c:2043-2095, and writes ORT − REF_POS).
- **DSF** (`.dsf`): incoherent/coherent intermediate scattering input
  ``rho(k,t) = Σ_i w_i exp(i k·r_i)`` sampled on rays of k-points
  ``k = 2π (m0 + j·mdir)·tbox, j = 0..kmax`` (write_dsf,
  imd_io.c:3749-3892): a text header at the first firing, then raw
  float64 ``(Re, Im)`` pairs appended per frame.

TPU-native design: the nMoldyn frame assembly is a host-side observer
(one device→host fetch per firing, like io/select.py — the PBC unwrap
uses minimum-image deltas between consecutive frames, exact while no
atom travels more than half a box edge per interval).  The DSF Fourier
sums run ON DEVICE: fractional coordinates via one HIGHEST-precision
[N,3]×[3,3] matmul, then one [N,3]×[3,kmax+1] integer-coefficient
matmul per ray on the MXU, phases wrapped mod 1 BEFORE the 2π scaling
so float32 trig never sees large arguments; only the 2·Σ(kmax+1)
reduced sums cross to the host.
"""

from __future__ import annotations

import os
import sys
import time as _time

import numpy as np


class NmoldynWriter:
    """Appends unwrapped-position (and optional velocity) float32 frames
    to ``<outfiles>.nmoldyn`` every ``nmoldyn_int`` steps
    (init_nmoldyn/write_nmoldyn, imd_io.c:3606/3664)."""

    def __init__(self, cfg, box_h, pbc, path_fn):
        self.cfg = cfg
        self.box_h = np.asarray(box_h, np.float64)
        self.inv_h = np.linalg.inv(self.box_h)
        self.pbc = tuple(int(b) for b in pbc)
        self._path = path_fn
        self.prev = None          # [maxid+1, 3] last wrapped positions
        self.offs = None          # [maxid+1, 3] accumulated wrap offsets
        self.count = 0
        self.n_at = 0

    def _fname(self):
        return self._path(self.cfg.outfiles + ".nmoldyn")

    def init(self, f):
        """Write the binary header from the initial config and capture
        the unwrap reference (REF_POS zeroing, imd_io.c:3617-3624)."""
        ids = f["id"].astype(int)
        vt = f["vtype"].astype(int)
        ntypes = self.cfg.ntypes
        nt = np.bincount(vt[vt < ntypes], minlength=ntypes)[:ntypes]
        self.n_at = int(nt.sum())
        h = self.box_h
        orth = int(np.all(np.abs(h - np.diag(np.diag(h))) < 1e-6))
        with open(self._fname(), "wb") as out:
            np.asarray([ntypes, orth, int(self.cfg.nmoldyn_veloc)],
                       np.int32).tofile(out)
            nt.astype(np.int32).tofile(out)
            if orth:
                np.asarray([h[0, 0], h[1, 1], h[2, 2]],
                           np.float32).tofile(out)
        n = ids.max() + 1 if len(ids) else 0
        self.prev = np.zeros((n, 3))
        self.offs = np.zeros((n, 3))
        self.prev[ids] = f["pos"]
        self.count = 0

    def _grow(self, n):
        for name in ("prev", "offs"):
            a = getattr(self, name)
            if len(a) < n:
                b = np.zeros((n, 3))
                b[:len(a)] = a
                setattr(self, name, b)

    def step(self, f, gstep: int):
        ids = f["id"].astype(int)
        n = ids.max() + 1 if len(ids) else 0
        self._grow(n)
        # track wrap offsets: the minimum-image delta is the physical
        # displacement; the raw delta minus it is the wrap jump
        from imd_tpu.io.select import min_image
        d_raw = f["pos"] - self.prev[ids]
        d_mi = min_image(d_raw, self.box_h, self.inv_h, self.pbc)
        self.offs[ids] += d_raw - d_mi       # REF_POS += i*box analog
        self.prev[ids] = f["pos"]

        nitems = 6 if self.cfg.nmoldyn_veloc else 3
        nml = np.zeros((max(self.n_at, n), nitems), np.float32)
        sel = f["vtype"].astype(int) < self.cfg.ntypes
        unwrapped = f["pos"] - self.offs[ids]
        nml[ids[sel], :3] = unwrapped[sel]
        if self.cfg.nmoldyn_veloc:
            nml[ids[sel], 3:] = (f["mom"][sel]
                                 / f["mass"][sel, None])
        with open(self._fname(), "ab") as out:
            t = self.count * self.cfg.nmoldyn_int * self.cfg.timestep
            np.float32(t).tofile(out)
            nml[:self.n_at].tofile(out)
        self.count += 1


def _dsf_device_sums(scene, inv_h, weights, rays):
    """Per-ray weighted Fourier sums on device.

    ``rays`` is a host list of (m0[3] int, mdir[3] int, kmax int).
    Returns a host float64 array [2 * Σ(kmax+1)] of (Re, Im) pairs in
    ray order (the reference's ``data`` layout, imd_io.c:3805-3833).
    """
    import jax.numpy as jnp
    from jax import lax

    f = scene.flatten_atoms()
    pos = f["pos"]
    w = (jnp.asarray(weights, pos.dtype)[f["type"]]
         * f["mask"].astype(pos.dtype))
    frac = jnp.dot(pos, jnp.asarray(inv_h, pos.dtype),
                   precision=lax.Precision.HIGHEST)
    out = []
    for m0, mdir, kmax in rays:
        # integer k-grid of the ray: M[j] = m0 + j*mdir, j = 0..kmax
        j = np.arange(kmax + 1)[:, None]
        M = np.asarray(m0)[None, :] + j * np.asarray(mdir)[None, :]
        ph = jnp.dot(frac, jnp.asarray(M.T, pos.dtype),
                     precision=lax.Precision.HIGHEST)
        ph = ph - jnp.floor(ph)            # wrap before 2π: f32-safe trig
        ph = (2.0 * np.pi) * ph
        re = jnp.sum(w[:, None] * jnp.cos(ph), axis=0)
        im = jnp.sum(w[:, None] * jnp.sin(ph), axis=0)
        out.append(np.stack([np.asarray(re, np.float64),
                             np.asarray(im, np.float64)], axis=1).ravel())
    return np.concatenate(out) if out else np.zeros(0)


class DsfWriter:
    """Appends per-frame Fourier sums to ``<outfiles>.dsf``
    (write_dsf, imd_io.c:3749-3892)."""

    def __init__(self, cfg, box_h, path_fn):
        self.cfg = cfg
        self.box_h = np.asarray(box_h, np.float64)
        self.inv_h = np.linalg.inv(self.box_h)
        self._path = path_fn
        self.count = 0
        self.weights = None
        self.rays = []
        for line in cfg.dsf_k:
            v = [int(x) for x in line]
            if len(v) != 7:
                raise ValueError(
                    f"dsf_k expects 'k0x k0y k0z dirx diry dirz kmax', "
                    f"got {line!r}")
            self.rays.append((v[0:3], v[3:6], v[6]))
        if cfg.dsf_nk and len(self.rays) > cfg.dsf_nk:
            raise ValueError("number of k-point series exceeds dsf_nk")

    def _fname(self):
        return self._path(self.cfg.outfiles + ".dsf")

    def _normalize(self, f):
        ntypes = self.cfg.ntypes
        w = np.asarray(self.cfg.dsf_weight if self.cfg.dsf_weight
                       else [1.0] * ntypes, np.float64)
        if len(w) < ntypes:
            w = np.concatenate([w, np.ones(ntypes - len(w))])
        typ = f["type"].astype(int)
        num_sort = np.bincount(typ[typ < ntypes], minlength=ntypes)
        wtot = float(np.sum(num_sort * w[:ntypes]))
        self.weights = w / (wtot if wtot else 1.0)

    def _write_header(self, out):
        twopi = 2.0 * np.pi
        tbox = self.inv_h.T            # rows = reciprocal basis vectors
        endian = "B" if sys.byteorder == "big" else "L"
        out.write(f"#F {endian} 3 {len(self.rays)}\n".encode())
        out.write(f"#T {self.cfg.dsf_int * self.cfg.timestep:e}\n"
                  .encode())
        for tag, row in zip("XYZ", tbox):
            out.write((f"#{tag} {twopi * row[0]:e} {twopi * row[1]:e} "
                       f"{twopi * row[2]:e}\n").encode())
        for m0, mdir, kmax in self.rays:
            out.write((f"#K {m0[0]} {m0[1]} {m0[2]}   "
                       f"{mdir[0]} {mdir[1]} {mdir[2]}  {kmax}\n")
                      .encode())
        out.write(f"## Generated on {_time.ctime()}\n".encode())
        out.write(b"## by imd_tpu\n#E\n")

    def step(self, scene, flat, gstep: int):
        if not self.rays:
            return
        if self.weights is None:
            self._normalize(flat)
        data = _dsf_device_sums(scene, self.inv_h, self.weights,
                                self.rays)
        fname = self._fname()
        if self.count == 0 and os.path.exists(fname):
            os.unlink(fname)
        with open(fname, "ab") as out:
            if self.count == 0:
                self._write_header(out)
            data.tofile(out)
        self.count += 1


def read_dsf(path: str):
    """Parse a ``.dsf`` file back into (header dict, frames [T, nk*2])."""
    with open(path, "rb") as f:
        raw = f.read()
    end = raw.index(b"#E\n") + 3
    hdr_lines = raw[:end].decode().splitlines()
    hdr = {"rays": []}
    for ln in hdr_lines:
        if ln.startswith("#K"):
            v = [int(x) for x in ln[2:].split()]
            hdr["rays"].append((v[0:3], v[3:6], v[6]))
        elif ln.startswith("#T"):
            hdr["dt"] = float(ln[2:])
    nk = sum(k + 1 for _, _, k in hdr["rays"])
    frames = np.frombuffer(raw[end:], np.float64).reshape(-1, 2 * nk)
    return hdr, frames


def read_nmoldyn(path: str):
    """Parse a ``.nmoldyn`` file back into (header dict, times [T],
    frames [T, n_at, nitems])."""
    with open(path, "rb") as f:
        ntypes, orth, veloc = np.fromfile(f, np.int32, 3)
        nt = np.fromfile(f, np.int32, ntypes)
        box = np.fromfile(f, np.float32, 3) if orth else None
        rest = np.fromfile(f, np.float32)
    n_at = int(nt.sum())
    nitems = 6 if veloc else 3
    frames = rest.reshape(-1, 1 + n_at * nitems)
    return ({"ntypes": int(ntypes), "orth": int(orth),
             "veloc": int(veloc), "nt": nt, "box": box},
            frames[:, 0],
            frames[:, 1:].reshape(-1, n_at, nitems))
