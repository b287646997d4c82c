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


_GENLAT_WORKER = r"""
import sys
import numpy as np
import jax
from fer_vit_tpu.core.distributed import initialize
from fer_vit_tpu.data.generate_latents import generate_latents

pid, coord, data, out = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()

class _Enc:
    def encode_batch(self, imgs):
        x = np.asarray(imgs, np.float32)
        seed = x.mean(axis=(1, 2, 3))
        return np.tile(seed[:, None, None], (1, 18, 512)).astype(np.float32)

# num_shards=0 → auto-resolve the partition from the process topology
n = generate_latents(data, out, encoder=_Enc(), batch_size=2, shard_size=4,
                     num_shards=0, shard_id=-1)
print(f"GENLAT_MULTIHOST_OK pid={pid} n={n}")
"""


def test_two_process_generate_latents_shared_output(tmp_path):
    """SURVEY §2.7's named DCN use case: two jax.distributed processes
    run generate_latents CONCURRENTLY into one output dir; the process
    topology auto-partitions the input and the per-worker pack/manifest
    namespaces prevent any write collision. The merged result must read
    back complete through LatentStore."""
    import numpy as np
    from PIL import Image

    from tests.env_utils import cpu_env

    data = str(tmp_path / "data")
    out = str(tmp_path / "latents")
    classes = ["angry", "disgust", "fear", "happy", "neutral"]
    rng = np.random.default_rng(0)
    for cls in classes:
        d = f"{data}/{cls}"
        import os as _os

        _os.makedirs(d)
        for i in range(2):
            arr = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(f"{d}/im{i}.png")

    port = _free_port()
    coord = f"localhost:{port}"
    env = cpu_env(REPO, "--xla_force_host_platform_device_count=1")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _GENLAT_WORKER, str(pid), coord,
             data, out],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    for p in procs:
        stdout, stderr = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        assert "GENLAT_MULTIHOST_OK" in stdout
        assert "n=5" in stdout  # each process owns exactly half

    import os

    npzs = sorted(f for f in os.listdir(out) if f.endswith(".npz"))
    assert npzs and all(
        f.startswith(("latents_pack_w00_", "latents_pack_w01_"))
        for f in npzs), npzs
    assert os.path.exists(os.path.join(out, "manifest_w00_of_02.json"))
    assert os.path.exists(os.path.join(out, "manifest_w01_of_02.json"))

    from fer_vit_tpu.data.latent_store import LatentStore

    store = LatentStore.load(out, pack_cache=False)
    assert len(store) == 10
    all_paths = []
    for f in npzs:
        with np.load(os.path.join(out, f)) as z:
            all_paths.extend(z["paths"].tolist())
    assert len(all_paths) == len(set(all_paths)) == 10
