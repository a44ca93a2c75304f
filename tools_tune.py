"""On-chip tuning sweep for the Pallas EAM engine.

Runs bench.py across (deg, block, capacity) and prints a compact table;
use after kernel changes to re-locate the performance optimum.
"""

import itertools
import json
import subprocess
import sys

ATOMS = int(sys.argv[1]) if len(sys.argv) > 1 else 108000

for deg, block, cap in itertools.product((8, 10, 12), (128, 256, 512),
                                         (0, 16, 20)):
    cmd = [sys.executable, "bench.py", "--atoms", str(ATOMS),
           "--steps", "10", "--deg", str(deg), "--block", str(block)]
    if cap:
        cmd += ["--capacity", str(cap)]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=900).stdout.strip().splitlines()
        d = json.loads(out[-1])
        print(f"deg={deg} block={block} cap={d['detail']['capacity']:3d} "
              f"-> {d['value'] / 1e6:8.2f} M atom-steps/s "
              f"(overflow {d['detail']['overflow']})", flush=True)
    except Exception as e:
        print(f"deg={deg} block={block} cap={cap} -> FAIL {e}", flush=True)
