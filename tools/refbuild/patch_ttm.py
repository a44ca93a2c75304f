"""Produce a defects-neutralized copy of the reference's imd_ttm.c.

The refbuild cross-validation (README.md) root-caused two genuine
reference-side defects that bound the coupled-TTM agreement at ~2.5e-5:

A. do_DIFF VLATTICE neighbor override (imd_ttm.c:1548): under the
   hard-#defined VLATTICE, EVERY fd cell on the rank owning the last
   active cell gets its +x diffusion neighbor replaced by vlattice1[0]
   — intended semantics (and what imd_tpu implements) is that ONLY the
   last active cell couples to the vlat chain.

B. Restart advection glitch (imd_ttm.c:296): update_fd's atomic-flux
   counting trusts p->fdi from the previous step whenever steps > 0,
   but after a restart fdi is uninitialized — the first do_ADV sees
   phantom inter-cell fluxes of order natoms and redistributes U
   wildly.  imd_tpu initializes fdi = -1 and suppresses advection on
   index-invalid steps; the patch skips flux counting on the first
   update_fd call of a process lifetime.

C. TTM restart never restores the electron grid (root-caused in round
   4 — THE defect that made every post-restart comparison start from a
   wrong Te): ttm_read sizes its read as global_fd_dim.x*y*z
   (imd_ttm.c:1986), but in the TTM1D build y and z are NEVER assigned
   (globals zero-init, only .x is set in init_ttm:963) — lines
   evaluates to 0 (+vlatdim), so the reader consumes the header and at
   most the vlat row and silently discards the entire .ttm state; Te
   restarts from the init value and "collapses" toward the lattice
   (the 0.09 -> 0.019 eV transient previously mis-attributed to the
   advection glitch; confirmed by an ADVMODE=0 build reproducing it
   bit-identically).  Even with lines fixed, the copy loop indexes
   l1[i] with i left at lines+1 by the preceding read loop (heap
   overflow + one-cell shift).  The patch sizes the read by
   global_fd_dim.x and resets i=j=k=1 before the copy loop.

This script copies /root/reference/imd_ttm.c (read-only mount) with
those two minimal fixes applied, so the 1e-6 parity claim can be tested
against a reference whose OWN defects are out of the way
(VERDICT r3 #3).  Nothing else is modified.

Usage: python patch_ttm.py OUTPUT_PATH [REFERENCE_TTM_C]
"""

import sys

PATCH_A_OLD = """\
    if(cur_vlattice_proc==myid)
    {
      xmaxTe = vlattice1[0].temp;
      xmaxk  = vlattice1[0].fd_k;
    }
"""
PATCH_A_NEW = """\
    /* NEUTRALIZED DEFECT A: only the LAST ACTIVE cell couples to the
       vlat chain (the unpatched code overrides the +x neighbor of
       EVERY cell on the owning rank). */
    if(cur_vlattice_proc==myid && i_global == last_active_cell_global)
    {
      xmaxTe = vlattice1[0].temp;
      xmaxk  = vlattice1[0].fd_k;
    }
"""

PATCH_B1_OLD = "void update_fd()"
PATCH_B1_NEW = ("/* NEUTRALIZED DEFECT B: p->fdi is uninitialized on the "
                "first update_fd\n   call after a (re)start; skip flux "
                "counting until fdi has been written once. */\n"
                "static int fdi_valid = 0;\n"
                "void update_fd()")

PATCH_B2_OLD = """\
      if (steps > 0)
      {
        if (p->fdi[l] != i_global)
"""
PATCH_B2_NEW = """\
      if (steps > 0 && fdi_valid)
      {
        if (p->fdi[l] != i_global)
"""

PATCH_B3_OLD = (" MPI_Allreduce(natomslocal, natomsglobal, "
                "global_fd_dim.x, MPI_INT, MPI_SUM, cpugrid);")
PATCH_B3_NEW = (" fdi_valid = 1;\n" + PATCH_B3_OLD)

PATCH_C1_OLD = ("  int lines = global_fd_dim.x * global_fd_dim.y "
                "* global_fd_dim.z;")
PATCH_C1_NEW = ("""  /* NEUTRALIZED DEFECT C: global_fd_dim.y/.z are never
     assigned in the TTM1D build (zero-initialized globals), so the
     product is 0 and the restart read discards the whole .ttm. */
  int lines = global_fd_dim.x;""")

PATCH_C2_OLD = """\
  // *****************************************
  for (l = 0; l < lines; l++)
"""
PATCH_C2_NEW = """\
  // *****************************************
  /* NEUTRALIZED DEFECT C (cont.): i was left at lines+1 by the read
     loop; the first copied row indexed l1 out of bounds and every
     later row landed one cell off. */
  i = j = k = 1;
  for (l = 0; l < lines; l++)
"""


def patch(text: str) -> str:
    for old, new, tag in ((PATCH_A_OLD, PATCH_A_NEW, "A"),
                          (PATCH_B1_OLD, PATCH_B1_NEW, "B1"),
                          (PATCH_B2_OLD, PATCH_B2_NEW, "B2"),
                          (PATCH_B3_OLD, PATCH_B3_NEW, "B3"),
                          (PATCH_C1_OLD, PATCH_C1_NEW, "C1"),
                          (PATCH_C2_OLD, PATCH_C2_NEW, "C2")):
        n = text.count(old)
        if n != 1:
            raise SystemExit(
                f"patch {tag}: expected exactly 1 occurrence, found {n} "
                "(reference source changed?)")
        text = text.replace(old, new)
    return text


def main():
    out = sys.argv[1]
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/imd_ttm.c"
    with open(src) as f:
        text = f.read()
    with open(out, "w") as f:
        f.write(patch(text))
    print(f"wrote {out} (defects A+B neutralized)")


if __name__ == "__main__":
    main()
