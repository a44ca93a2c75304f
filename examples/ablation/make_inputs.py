"""Generate the inputs for the flagship laser-ablation demo.

Writes into the current directory (or --out DIR):
  pair.pt / rho.pt / embed.pt  -- EAM-Al potential tables (IMD format 1)
  start.chkpt                  -- Al thin film with a vacuum gap in front

Geometry (mirrors the reference's standard ablation setup: manual.pdf
usage example; laser enters from low x, imd_tmm.c:323 vacuum entry
layer):

      x=0 .................... x0 ................. box_x
      |   vacuum (laser path)  |  fcc-Al film      |
                                ^ front surface     ^ rear = NRB plane

The film is anchored at the box rear so the NRB boundary detector
(imd_nrb.c:125; models/nrb.py init_nrb) finds a perfect-lattice layer at
max-x.  y/z are periodic.

Usage: python make_inputs.py [--film-cells 60 8 8] [--vacuum 0.6]
"""

import argparse
import math
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--film-cells", type=int, nargs=3, default=[60, 8, 8],
                    help="fcc unit cells of the film (x y z)")
    ap.add_argument("--alat", type=float, default=4.05)
    ap.add_argument("--vacuum", type=float, default=0.6,
                    help="vacuum fraction of box_x in front of the film")
    ap.add_argument("--rear-vacuum", type=float, default=0.08,
                    help="vacuum fraction BEHIND the film: the NRB "
                         "boundary absorbs the shock but the film "
                         "creeps backward under sustained recoil; "
                         "without rear room the drifting atoms clamp "
                         "into the last cell plane and blow up its "
                         "occupancy (the reference keeps vacuum at "
                         "both box ends for the same reason).  The "
                         "NRB detector keys on the atoms' own x-max, "
                         "so the boundary layer is still found")
    ap.add_argument("--out", default=".")
    args = ap.parse_args()

    from imd_tpu.io.chkpt import ChkptData, write_chkpt
    from imd_tpu.models.potential import analytic_eam, write_pot_table
    from imd_tpu.utils.generate import fcc

    eam = analytic_eam(r_cut=5.0, r0=args.alat / math.sqrt(2.0), E_c=3.39)
    write_pot_table(eam.pair, os.path.join(args.out, "pair.pt"))
    write_pot_table(eam.rho, os.path.join(args.out, "rho.pt"))
    write_pot_table(eam.embed, os.path.join(args.out, "embed.pt"))

    pos, typ, box_diag = fcc(tuple(args.film_cells), args.alat)
    film_x = box_diag[0]
    box_x = film_x / (1.0 - args.vacuum - args.rear_vacuum)
    x0 = box_x * args.vacuum
    pos = pos + np.array([x0, 0.0, 0.0])
    pos[:, 0] = np.minimum(pos[:, 0], box_x - 1e-3)

    n = len(pos)
    d = ChkptData(
        number=np.arange(n, dtype=np.int64),
        type=np.zeros(n, np.int64),
        mass=np.full(n, 26.9815),
        pos=pos,
        vel=np.zeros((n, 3)),
        data=np.zeros((n, 1)),
        box_x=np.array([box_x, 0.0, 0.0]),
        box_y=np.array([0.0, box_diag[1], 0.0]),
        box_z=np.array([0.0, 0.0, box_diag[2]]),
        have_vel=True,
    )
    write_chkpt(os.path.join(args.out, "start.chkpt"), d)
    print(f"wrote start.chkpt: {n} atoms, film x=[{x0:.1f},"
          f"{x0 + film_x:.1f}] A of box_x={box_x:.1f} A "
          f"(front vacuum {args.vacuum:.0%}, rear "
          f"{args.rear_vacuum:.0%})")


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
