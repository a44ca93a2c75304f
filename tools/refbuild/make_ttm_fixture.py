import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from imd_tpu.models.potential import analytic_eam, write_pot_table
from imd_tpu.io.chkpt import ChkptData, write_chkpt
from imd_tpu.utils.generate import fcc
from imd_tpu import integrate, units
from imd_tpu.scene import make_scene
from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, with_capacity
from imd_tpu.models.eos import FEGEos
from imd_tpu.models import tmm as tmm_mod
from imd_tpu.models import widerange as wr

OUT = os.environ.get("TTMFIX_OUT", "/tmp/ttmfix")
RUN = os.environ.get("TTMFIX_RUN", OUT + "/run")
os.makedirs(RUN, exist_ok=True)

eam = analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39, dtype=jnp.float64)
write_pot_table(eam.pair, f"{RUN}/pair.pt")
write_pot_table(eam.rho, f"{RUN}/rho.pt")
write_pot_table(eam.embed, f"{RUN}/embed.pt")

pos, typ, diag = fcc((20, 3, 3), 4.05)
N = len(pos)
# film spans FD cells 2..6 of the 12-cell grid (box 194.4 A): vacuum at
# both ends keeps the edge cells inactive (the reference reads past its
# natoms array there), and the film ENDS at the 2-rank boundary so the
# vlat-owning rank has exactly one active cell -- the reference's
# do_DIFF vlattice neighbor override (imd_ttm.c:1546, applied to every
# cell of that rank) then only touches the last active cell, which is
# its intended semantics
lx = 48 * 4.05
box = Box.create([lx,0,0],[0,diag[1],0],[0,0,diag[2]], dtype=jnp.float64)
pos = pos + np.array([2 * 16.2, 0.0, 0.0])
grid = choose_grid(box, 5.0, skin=0.5, n_atoms=N)
grid = with_capacity(grid, measured_capacity(grid, pos))
mass = np.full(N, 26.9815)
sc = make_scene(grid, pos + 0.5, mass=mass, dtype=jnp.float64)
sc = integrate.maxwell(sc, 0.026, jax.random.PRNGKey(11))
flat = sc.flatten_atoms()
m = np.asarray(flat["mask"])
order = np.argsort(np.asarray(flat["id"])[m])
p = np.asarray(flat["pos"])[m][order]
v = (np.asarray(flat["mom"])[m] / mass[0])[order]
d = ChkptData(number=np.arange(N), type=np.zeros(N, np.int32),
              mass=mass, pos=p, vel=v, data=np.zeros((N,1)),
              box_x=np.asarray([lx,0,0]), box_y=np.asarray([0,diag[1],0]),
              box_z=np.asarray([0,0,diag[2]]))
write_chkpt(f"{RUN}/start.chkpt", d, binary=False)

# ---- EOS tables from the FEG closed form (dense grids so both codes'
# interpolants converge to the same function) ------------------------
eos = FEGEos(atomic_mass=26.9815)
m_kg = 26.9815 * wr.AMU
Z = 3.0
rho = np.linspace(300.0, 8000.0, 150)          # kg/m^3
# keep the (rho, Te) aspect ratio moderate: the reference interpolates
# these tables with Delaunay triangulations and sliver triangles from
# anisotropic point clouds produce garbage values
# dense at low Te: the reference's EOS round-trip plausibility check
# (imd_ttm.c:770-804, 1% tolerance) probes room temperature
Te_K = np.concatenate([np.linspace(20.0, 2000.0, 250),
                       np.linspace(2100.0, 5.8e4, 300)])           # K

def write_nn(path, xs, ys, zfun):
    # header bounds one grid line INSIDE the data: the reference clamps
    # out-of-range queries to the header bounds and the Delaunay
    # interpolator NaNs on exact hull-boundary points
    with open(path, "w") as f:
        f.write(f"{len(xs)} {len(ys)}\n")
        x0 = xs[1] + 0.37 * (xs[2] - xs[1])
        x1 = xs[-2] - 0.37 * (xs[-2] - xs[-3])
        y0 = ys[1] + 0.37 * (ys[2] - ys[1])
        y1 = ys[-2] - 0.37 * (ys[-2] - ys[-3])
        f.write(f"{x0:.10e} {x1:.10e} {y0:.10e} {y1:.10e}\n")
        for x in xs:
            for y in ys:
                f.write(f"{x:.10e} {y:.10e} {zfun(x, y):.10e}\n")

EV_TO_K = wr.EV_TO_K
def cve(r, tK):
    # the reference's native table unit is J/(K*kg): it converts
    # *r*11604.5*1e-30*J2eV to its internal eV/(eV*A^3)
    # (EOS_cve_from_r_te, imd_ttm.c:2586-2589).  eos.ce returns the
    # internal unit, so divide the conversion back out.  (Round-4 fix:
    # writing the internal unit raw fed the reference a ~4000x too
    # small Ce — the root cause of its 'Te collapse' and 1e5-substep
    # CFL blow-ups in every earlier coupled comparison.)
    ne = Z * r / m_kg
    ce_imd = float(eos.ce(jnp.float64(r), jnp.float64(ne),
                          jnp.float64(tK / EV_TO_K)))
    return ce_imd / (r * EV_TO_K * 1e-30 * units.J_TO_EV)
write_nn(f"{OUT}/EOS_cve_from_r_te.txt", rho, Te_K, cve)

tsq = np.sqrt(Te_K)
def ee(r, ts):
    ne = Z * r / m_kg
    u = float(eos.u_from_te(jnp.float64(r), jnp.float64(ne),
                            jnp.float64(ts * ts / EV_TO_K)))  # eV/atom
    return u * units.EV_TO_J / m_kg                           # J/kg
write_nn(f"{OUT}/EOS_ee_from_r_tesqrt.txt", rho, tsq, ee)

Ti_K = np.concatenate([np.linspace(20.0, 2000.0, 250),
                       np.linspace(2100.0, 5.8e4, 300)])
write_nn(f"{OUT}/EOS_phase_from_r_ti.txt", rho, Ti_K, lambda r, t: 1.0)

# ---- TMM tables ----------------------------------------------------
bb = tmm_mod.default_bb_table()
np.savetxt(f"{OUT}/alu_eps_bb.dat", bb, fmt="%.10e")
xi, k1, k2 = tmm_mod.k12_tables()
np.savetxt(f"{OUT}/K12.dat", np.stack([k1, k2], 1), fmt="%.12e")
print("fixture written:", N, "atoms")
