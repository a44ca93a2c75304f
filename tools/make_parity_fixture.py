# NOTE: the serial reference binary consumed below (/tmp/refbin) can be
# rebuilt reproducibly with the recipe in tools/refbuild/README.md
# (gcc -fcommon -DNBL -DEAM2 -DNVE over the SRC_NVE list, no MPI), or
# via the 2-rank variant exercised by tests/test_refbuild_parity.py.
import os, sys, subprocess, pathlib, shutil
sys.path.insert(0, '/root/repo')
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from imd_tpu.models.potential import analytic_eam, write_pot_table
from imd_tpu.io.chkpt import ChkptData, write_chkpt
from imd_tpu.utils.generate import fcc
from imd_tpu import integrate
from imd_tpu.scene import make_scene
from imd_tpu.ops.geometry import Box, choose_grid, measured_capacity, with_capacity

OUT = pathlib.Path('/root/repo/tests/data/parity')
OUT.mkdir(exist_ok=True)
eam = analytic_eam(r_cut=5.0, r0=2.864, E_c=3.39, dtype=jnp.float64)
write_pot_table(eam.pair, str(OUT/'pair.pt'))
write_pot_table(eam.rho, str(OUT/'rho.pt'))
write_pot_table(eam.embed, str(OUT/'embed.pt'))

# small FCC Al block with thermal velocities baked into the chkpt
pos, typ, diag = fcc((4, 4, 4), 4.05)
N = len(pos)
box = Box.create([diag[0],0,0],[0,diag[1],0],[0,0,diag[2]], dtype=jnp.float64)
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
              box_x=np.asarray([diag[0],0,0]), box_y=np.asarray([0,diag[1],0]),
              box_z=np.asarray([0,0,diag[2]]))
write_chkpt(str(OUT/'start.chkpt'), d, binary=False)

PARAM = """\
coordname start.chkpt
outfiles run
ntypes 1
total_types 1
masses 26.9815
core_potential_file pair.pt
embedding_energy_file embed.pt
atomic_e-density_file rho.pt
box_from_header 1
pbc_dirs 1 1 1
ensemble nve
timestep 0.1
maxsteps 50
eng_int 1
nbl_margin 0.5
"""
(OUT/'parity.imd').write_text(PARAM)

# run the reference serial binary in a scratch dir
scratch = pathlib.Path('/tmp/parity_ref')
if scratch.exists(): shutil.rmtree(scratch)
scratch.mkdir()
for f in ('pair.pt','rho.pt','embed.pt','start.chkpt','parity.imd'):
    shutil.copy(OUT/f, scratch/f)
r = subprocess.run(['/tmp/refbin/imd_eam_nve_nbl','-p','parity.imd'],
                   cwd=scratch, capture_output=True, text=True, timeout=600)
print("ref rc:", r.returncode)
print(r.stdout[-1500:])
print(r.stderr[-800:])
eng = scratch/'run.eng'
if eng.exists():
    shutil.copy(eng, OUT/'ref.eng')
    print("ref.eng lines:", len(eng.read_text().splitlines()))
    print(eng.read_text().splitlines()[:4])
