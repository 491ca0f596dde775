"""Multi-host smoke: two real processes, jax.distributed, one global mesh.

Covers SURVEY §7.7 (data-parallel over views across hosts) and the env://
init parity with the reference's my_ext/distributed.py:50-76: the worker
reads MASTER_ADDR/WORLD_SIZE/RANK (torch-style) through
``sk_gs_tpu.parallel.init_distributed`` and builds the ('view', 'gs') mesh
over the 4 global devices (2 processes x 2 virtual CPU devices each).
"""
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
sys.path.insert(0, sys.argv[1])
import jax
jax.config.update('jax_platforms', 'cpu')
from sk_gs_tpu.parallel import init_distributed, make_mesh

info = init_distributed()  # from MASTER_ADDR / WORLD_SIZE / RANK env
assert info['process_count'] == 2, info
assert info['device_count'] == 4, info

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh(n_view=2, n_gs=2)
assert mesh.devices.shape == (2, 2)

# view-sharded global batch from process-local shards; global sum crosses
# the process boundary, proving collectives ride the distributed runtime
sharding = NamedSharding(mesh, P('view', None))
local = np.full((2, 8), info['process_index'] + 1.0, np.float32)
xg = jax.make_array_from_process_local_data(sharding, local)
total = jax.jit(lambda a: jnp.sum(a),
                out_shardings=NamedSharding(mesh, P()))(xg)
expect = 2 * 8 * 1.0 + 2 * 8 * 2.0
assert abs(float(total) - expect) < 1e-6, float(total)
print('MULTIHOST_OK', info['process_index'])
"""


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_mesh(tmp_path):
    script = tmp_path / 'worker.py'
    script.write_text(WORKER)
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(MASTER_ADDR='127.0.0.1', MASTER_PORT=str(port),
                   WORLD_SIZE='2', RANK=str(rank),
                   PATH='/usr/bin:/bin', HOME='/tmp')
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(REPO)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank {rank} failed:\n{out}\n{err}'
        assert f'MULTIHOST_OK {rank}' in out
