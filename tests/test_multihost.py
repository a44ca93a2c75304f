"""Multi-host SPMD: two OS processes join via jax.distributed and run a
psum across the global mesh (the mpirun analog; imd_mpi_util.c:48).

Runs real subprocesses on the CPU backend (coordinator on localhost) —
the closest a single box gets to the reference's multi-node testing.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from imd_tpu.parallel.mesh import init_multihost, make_mesh
pid = init_multihost()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())  # 2 local x 2 procs
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = make_mesh((4, 1, 1))
x = jnp.arange(8.0).reshape(4, 1, 2)
xs = jax.device_put(x, NamedSharding(mesh, P("x")))
total = jax.jit(lambda a: jnp.sum(a))(xs)
assert float(total) == 28.0, float(total)
print("WORKER_OK", pid)
"""


@pytest.mark.skipif(os.environ.get("IMD_SKIP_MULTIPROC") == "1",
                    reason="multiprocess test disabled")
def test_two_process_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    w = tmp_path / "worker.py"
    w.write_text(WORKER)
    env0 = dict(os.environ,
                JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                JAX_NUM_PROCESSES="2",
                XLA_FLAGS="--xla_force_host_platform_device_count=2",
                PYTHONPATH=os.getcwd())
    env0.pop("JAX_PLATFORMS", None)
    procs = []
    for pid in range(2):
        env = dict(env0, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(w)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "WORKER_OK" in out
