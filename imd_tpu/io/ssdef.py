"""Quasistatic stress-strain log (.ssdef) for RELAX loading runs.

Reference: `write_ssdef_header` / `write_ssdef` (imd_io.c:2585/2665) —
one row per quasistatic loading event (FBC/BEND increment, indenter
step, deformation step): step counter, force-call count, Epot, fnorm,
box diagonal, the per-vtype FBC forces, the pressure tensor, and the
total force on every restricted vtype component (the reaction force the
loading measures).  Written alongside the `.ss` config snapshots
(`write_ssconfig`, imd_io.c:210: a plain checkpoint numbered by the
event counter with an `.ssitr` sidecar, imd_io_3d.c:993-995).
"""

from __future__ import annotations

import numpy as np


class SsdefWriter:
    def __init__(self, path: str, vtypes: int, restrictions,
                 append: bool = False):
        """``restrictions``: [vtypes, 3] 0/1 mask (0 = component held —
        its reaction force is logged, imd_io.c:2638-2648) or None."""
        self.path = path
        self.vtypes = vtypes
        self.restr = (np.asarray(restrictions)
                      if restrictions is not None else None)
        if not append:
            cols = ["step", "nfc", "Epot", "fnorm",
                    "box_x.x", "box_y.y", "box_z.z"]
            for n in range(vtypes):
                cols += [f"fbc_f[{n}].x", f"fbc_f[{n}].y", f"fbc_f[{n}].z"]
            cols += ["Press_xx", "Press_yy", "Press_zz",
                     "Press_yz", "Press_xz", "Press_xy"]
            if self.restr is not None:
                ax = "xyz"
                for n in range(vtypes):
                    for a in range(3):
                        if self.restr[n, a] == 0:
                            cols.append(f"tot_force[{n}].{ax[a]}")
            with open(self.path, "w") as f:
                f.write("#C " + " ".join(cols) + "\n")

    def write(self, step: int, nfc: int, epot: float, fnorm: float,
              box_h, fbc, presstens, vt_force=None):
        h = np.asarray(box_h, np.float64)
        row = [float(step), float(nfc), epot, fnorm,
               h[0, 0], h[1, 1], h[2, 2]]
        fbc = (np.zeros((self.vtypes, 3))
               if fbc is None else np.asarray(fbc, np.float64))
        row += list(fbc[:self.vtypes].reshape(-1))
        row += list(np.asarray(presstens, np.float64))
        if self.restr is not None and vt_force is not None:
            vt_force = np.asarray(vt_force, np.float64)
            for n in range(self.vtypes):
                for a in range(3):
                    if self.restr[n, a] == 0:
                        row.append(vt_force[n, a])
        with open(self.path, "a") as f:
            f.write(" ".join(f"{x:.10e}" for x in row) + "\n")
