"""NVX heat-conductivity profile output (.hcgrad / .hcprof).

Reference: ``write_temp_dist`` (imd_transport.c:128-264), called every
step of an NVX run once ``steps > hc_start`` (imd_main_3d.c:768-769):
it accumulates a FOLDED per-layer kinetic-temperature histogram (the
NVX geometry heats layer 0 and cools layer nhalf, so layers num and
hc_nlayers-num are equivalent and averaged together) plus the running
sums of a least-squares line fit over the interior layers, and every
``hc_int`` accumulated steps appends

- ``.hcgrad``: ``count gradT deltaT kappa kappa[W/mK]`` where gradT is
  the fitted temperature gradient a, deltaT = 0.5*a*box_x, kappa =
  hc_heatcurr / a, and the SI conversion factor is the reference's
  literal 1.6022e-19/(1.0179e-14*1e-10*11605) (imd_transport.c:247);
- ``.hcprof``: the folded profile, one ``x T`` line per layer with
  T = (2/DIM) * <p^2/2m> (imd_transport.c:258-264).

``hc_count`` numbers the .hcgrad lines and survives restarts through
the .itr sidecar (imd_io_3d.c:1108).

Departure from the reference: sampling happens at dispatch-block
boundaries instead of literally every MD step (the hot loop runs
jitted multi-step blocks; the run loop clamps block length to hc_int
so every write window contains >= 1 sample, and other active I/O
intervals add more).  For the steady-state gradient fit this is a
noise-level difference; shrink other intervals to densify sampling.
"""

from __future__ import annotations

import numpy as np

# kappa -> W/(m K): eV -> J, IMD time unit 10.18 fs, A -> m, eV -> K
SI_FACT = 1.6022e-19 / (1.0179e-14 * 1e-10 * 11605)


class HCProfile:
    def __init__(self, nlayers: int, box_x: float, heatcurr: float,
                 grad_path: str, prof_path: str, count: int = 0,
                 restart: bool = False):
        self.nlayers = int(nlayers)
        self.nhalf = self.nlayers // 2
        self.box_x = float(box_x)
        self.scale = self.nlayers / self.box_x
        self.heatcurr = float(heatcurr)
        self.grad_path, self.prof_path = grad_path, prof_path
        self.count = int(count)
        self.temp = np.zeros(self.nhalf + 1)
        self.num = np.zeros(self.nhalf + 1, np.int64)
        self.grad = np.zeros(5)
        if not restart:
            with open(grad_path, "w") as f:
                f.write("# count gradT deltaT kappa kappa[W/mK]\n")
            with open(prof_path, "w") as f:
                f.write("# %d %14.4e\n" % (self.nhalf + 1, self.heatcurr))

    def sample(self, x, ekin):
        """Accumulate one snapshot: ``x`` [N] positions along box_x,
        ``ekin`` [N] per-atom p^2/2m (imd_transport.c:185-216)."""
        x = np.asarray(x, np.float64)
        ekin = np.asarray(ekin, np.float64)
        x = np.where(x < 0.0, x + self.box_x, x)
        num = (self.scale * x).astype(np.int64)
        num = np.where(num >= self.nlayers, num - self.nlayers, num)
        fold = num > self.nhalf
        xx = np.where(fold, self.box_x - x + self.box_x / self.nlayers, x)
        num = np.where(fold, self.nlayers - num, num)
        np.add.at(self.temp, num, ekin)
        np.add.at(self.num, num, 1)
        interior = (num > 2) & (num < self.nhalf - 2)
        xi, ti = xx[interior], ekin[interior]
        self.grad += [xi.sum(), ti.sum(), (ti * xi).sum(),
                      (xi * xi).sum(), interior.sum()]

    def write(self):
        """Fit the gradient, append both files, reset the accumulators
        (imd_transport.c:229-276).  Like the reference, both files are
        written even when the interior-layer fit window is empty (few
        layers) — the gradient columns are then nan."""
        if self.grad[4] > 0:
            sxi, sti, sxiti, sxi2 = self.grad[:4] / self.grad[4]
            denom = sxi2 - sxi * sxi
            a = (sxiti - sxi * sti) / denom if denom else np.nan
        else:
            a = np.nan
        kappa = self.heatcurr / a if a else np.nan
        with open(self.grad_path, "a") as f:
            f.write("%d %10.4e %10.4e %10.4e %10.4e\n"
                    % (self.count, a, 0.5 * a * self.box_x, kappa,
                       SI_FACT * kappa))
        self.count += 1
        with open(self.prof_path, "a") as f:
            f.write("\n")
            t = np.where(self.num > 0, self.temp / np.maximum(self.num, 1),
                         0.0) * (2.0 / 3.0)
            for i in range(self.nhalf + 1):
                f.write("%10.4e %10.4e\n" % ((i + 0.5) / self.scale, t[i]))
            f.write("\n")
        self.temp[:] = 0.0
        self.num[:] = 0
        self.grad[:] = 0.0
