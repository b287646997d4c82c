"""Multi-host (2-process) smoke test on CPU — no TPU hardware needed.

Spawns two processes that rendezvous via ``jax.distributed.initialize``
(the DCN analogue), each owning 4 virtual CPU devices, and runs one global
jitted reduction over a process-sharded batch — exercising
``fer_vit_tpu.core.distributed`` end-to-end (VERDICT r1 #9).
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp
from fer_vit_tpu.core.distributed import initialize, process_local_batch_slice

pid = int(sys.argv[1])
initialize(coordinator_address=sys.argv[2], num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

GLOBAL_BATCH = 32
sl = process_local_batch_slice(GLOBAL_BATCH)
assert sl == slice(pid * 16, pid * 16 + 16), sl

full = np.arange(GLOBAL_BATCH, dtype=np.float32)
local = full[sl]

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
sharding = NamedSharding(mesh, P("data"))
garr = jax.make_array_from_process_local_data(sharding, local,
                                              (GLOBAL_BATCH,))

@jax.jit
def total(x):
    return jnp.sum(x)

got = float(total(garr))
want = float(full.sum())
assert abs(got - want) < 1e-6, (got, want)
print(f"MULTIHOST_OK pid={pid} sum={got}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_reduction():
    port = _free_port()
    coord = f"localhost:{port}"
    from tests.env_utils import cpu_env

    env = cpu_env(REPO, "--xla_force_host_platform_device_count=4")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), coord],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
        assert "MULTIHOST_OK" in out
