"""chkpt format converter: binary <-> ASCII (bin_to_chkpt.c analog).

Usage: python -m imd_tpu.tools.convert in.chkpt out.chkpt [--binary]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="imd_tpu.tools.convert")
    ap.add_argument("infile")
    ap.add_argument("outfile")
    ap.add_argument("--binary", action="store_true",
                    help="write binary output (default ASCII)")
    args = ap.parse_args(argv)
    from imd_tpu.io.chkpt import read_chkpt, write_chkpt
    d = read_chkpt(args.infile)
    write_chkpt(args.outfile, d, binary=args.binary)
    print(f"{args.infile} -> {args.outfile} "
          f"({d.n} atoms, {'binary' if args.binary else 'ASCII'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
