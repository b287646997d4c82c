"""Multi-device (simulated mesh) tests, run in 8-virtual-CPU-device
subprocesses — the fake-backend strategy of SURVEY.md §4(c)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_in_8dev(code: str, timeout: int = 560) -> str:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=timeout,
    )
    assert result.returncode == 0, (
        f"subprocess failed:\n{result.stdout}\n{result.stderr}"
    )
    return result.stdout


class TestMultichip:
    def test_dryrun_multichip_8(self):
        """The driver's dry run: full DP×TP train step on a 4×2 mesh."""
        out = _run_in_8dev(
            "import __graft_entry__ as g; g.dryrun_multichip(8)"
        )
        assert "one train step OK" in out
        assert "'data': 4" in out and "'model': 2" in out

    def test_dp_batch_sharding_propagates(self):
        out = _run_in_8dev(
            """
import jax, jax.numpy as jnp, numpy as np
from fer_vit_tpu.core import make_mesh, shard_batch
from fer_vit_tpu.models import LatentViT
mesh = make_mesh()
assert dict(mesh.shape) == {"data": 8, "model": 1}, mesh.shape
model = LatentViT(depth=1, embed_dim=64, heads=2, mlp_dim=128)
v = model.init(jax.random.key(0), jnp.zeros((1, 18, 512)))
x = shard_batch(mesh, np.random.default_rng(0)
                .normal(size=(64, 18, 512)).astype(np.float32))
out = jax.jit(model.apply)(v, x)
spec = out.sharding.spec
print("out spec:", spec)
assert spec[0] == "data", spec
print("DP_OK")
"""
        )
        assert "DP_OK" in out

    def test_dp_matches_single_device_loss(self):
        """Same data, same seed: a DP-sharded train step must produce the
        same loss as unsharded execution (collectives correctness)."""
        out = _run_in_8dev(
            """
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from fer_vit_tpu.core import make_mesh
from fer_vit_tpu.models import LatentViT
from fer_vit_tpu.train.harness import Harness, TrainConfig

rng = np.random.default_rng(0)
x = rng.normal(size=(32, 18, 512)).astype(np.float32)
y = (np.arange(32) % 7).astype(np.int32)

def run(mesh):
    model = LatentViT(depth=1, embed_dim=64, heads=2, mlp_dim=128)
    h = Harness(model=model, cfg=TrainConfig(batch_size=32, mixup=0.0),
                mesh=mesh)
    state = h.init_state(jax.random.key(0), jnp.zeros((1, 18, 512)))
    xb, yb = jnp.asarray(x), jnp.asarray(y)
    if mesh is not None:
        xb = jax.device_put(xb, NamedSharding(mesh, P("data", None, None)))
        yb = jax.device_put(yb, NamedSharding(mesh, P("data")))
    state, stats = jax.jit(h.train_step)(
        state, jax.random.key(1), xb, yb,
        jnp.ones(32, bool), jnp.float32(1e-3), None)
    return float(stats["loss_sum"]) / float(stats["n"])

l_single = run(None)
l_dp = run(make_mesh())
print(f"single={l_single:.6f} dp={l_dp:.6f}")
assert abs(l_single - l_dp) < 1e-4, (l_single, l_dp)
print("DP_LOSS_OK")
"""
        )
        assert "DP_LOSS_OK" in out
