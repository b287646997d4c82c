"""Torch-checkpoint interop (VERDICT r2 #3): bidirectional
state_dict ↔ pytree conversion for every FER model family, verified against
the REFERENCE's actual torch model classes — strict load_state_dict, logits
parity, and bit-exact roundtrip — plus the eval-CLI path on a
reference-format torch checkpoint.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fer_vit_tpu.interop import (  # noqa: E402
    from_torch_state_dict,
    model_kind_from_config,
    to_torch_state_dict,
)

REFERENCE_ROOT = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference tree not present")


@pytest.fixture(scope="module")
def ref_models():
    """Import the reference's model modules (torch-side only)."""
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models_fer_vit.latent_cnn import create_latent_cnn
        from models_fer_vit.latent_vit import LatentViT
        from models_fer_vit.latent_vit_v2 import LatentViTv2
        from models_fer_vit.image_vit import ImageViT

        yield {
            "latent_vit": LatentViT,
            "latent_vit_v2": LatentViTv2,
            "image_vit": ImageViT,
            "create_latent_cnn": create_latent_cnn,
        }
    finally:
        sys.path.remove(REFERENCE_ROOT)


def _roundtrip(kind, params, batch_stats, config):
    sd = to_torch_state_dict(kind, params, batch_stats, config=config)
    p2, bs2 = from_torch_state_dict(kind, sd, params, batch_stats,
                                    config=config)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(ka))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(batch_stats or {}),
            jax.tree_util.tree_leaves_with_path(bs2 or {})):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    return sd


def _check_family(our_model, torch_model, kind, config, x_jax, x_torch,
                  rtol=1e-4, atol=1e-4):
    """Export our random init → strict-load into the REFERENCE torch model
    → logits must agree → reimport must be bit-exact."""
    variables = our_model.init(jax.random.key(0), x_jax[:1])
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    batch_stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {}))
    # randomize batch_stats so a mean/var mapping bug can't hide behind 0/1
    rng = np.random.default_rng(5)
    batch_stats = jax.tree_util.tree_map(
        lambda a: (np.abs(rng.normal(size=a.shape)) + 0.5).astype(a.dtype),
        batch_stats)

    sd = _roundtrip(kind, params, batch_stats, config)
    missing_unexpected = torch_model.load_state_dict(sd, strict=True)
    assert not missing_unexpected.missing_keys
    assert not missing_unexpected.unexpected_keys
    torch_model.eval()
    with torch.no_grad():
        expected = torch_model(x_torch).numpy()

    apply_vars = {"params": params}
    if batch_stats:
        apply_vars["batch_stats"] = batch_stats
    with jax.default_matmul_precision("highest"):
        got = np.asarray(our_model.apply(apply_vars, x_jax,
                                         deterministic=True))
    np.testing.assert_allclose(got, expected, rtol=rtol, atol=atol)
    np.testing.assert_array_equal(got.argmax(1), expected.argmax(1))


@needs_reference
def test_latent_vit_interop(ref_models):
    from fer_vit_tpu.models import LatentViT

    cfg = dict(latent_dim=512, seq_len=18, embed_dim=64, depth=2, heads=4,
               mlp_dim=128, num_classes=7, dropout=0.0)
    ours = LatentViT(**cfg)
    theirs = ref_models["latent_vit"](**cfg)
    x = np.random.default_rng(0).normal(size=(4, 18, 512)).astype(np.float32)
    _check_family(ours, theirs, "latent_vit", cfg, jnp.asarray(x),
                  torch.tensor(x))


@needs_reference
def test_latent_vit_v2_interop(ref_models):
    from fer_vit_tpu.models import LatentViTv2

    flags = dict(use_lwn=True, use_lwn_residual=True, use_spe=True,
                 use_leam=True)
    cfg = dict(latent_dim=512, seq_len=18, embed_dim=64, depth=1, heads=4,
               mlp_dim=128, num_classes=7, dropout=0.0)
    ours = LatentViTv2(**cfg, **flags)
    theirs = ref_models["latent_vit_v2"](**cfg, **flags)
    x = np.random.default_rng(1).normal(size=(4, 18, 512)).astype(np.float32)
    _check_family(ours, theirs, "latent_vit_v2", {**cfg, **flags},
                  jnp.asarray(x), torch.tensor(x))


def test_lwn_gate_flag_mismatch_fails_loudly():
    """Converting a checkpoint trained without the LWN residual gate into
    a template built WITH it must raise, not leave the gate at random init
    (the ('params','lwn') coverage exemption would otherwise hide it)."""
    from fer_vit_tpu.interop import (
        from_torch_state_dict,
        to_torch_state_dict,
    )
    from fer_vit_tpu.models import LatentViTv2

    cfg = dict(latent_dim=512, seq_len=18, embed_dim=64, depth=1, heads=4,
               mlp_dim=128, num_classes=7, dropout=0.0, use_lwn=True,
               use_spe=False, use_leam=False)
    no_gate = LatentViTv2(**cfg, use_lwn_residual=False)
    with_gate = LatentViTv2(**cfg, use_lwn_residual=True)
    sd = to_torch_state_dict(
        "latent_vit_v2",
        no_gate.init(jax.random.key(0), jnp.zeros((1, 18, 512)))["params"],
        None, config=dict(cfg, use_lwn_residual=False))
    tmpl = with_gate.init(jax.random.key(1), jnp.zeros((1, 18, 512)))
    with pytest.raises(KeyError, match="lwn.gate"):
        from_torch_state_dict("latent_vit_v2", sd, tmpl["params"],
                              config=dict(cfg, use_lwn_residual=True))

    # reverse direction: a trained gate must not be silently dropped
    sd_gate = to_torch_state_dict(
        "latent_vit_v2", tmpl["params"], None,
        config=dict(cfg, use_lwn_residual=True))
    tmpl_no_gate = no_gate.init(jax.random.key(2), jnp.zeros((1, 18, 512)))
    with pytest.raises(KeyError, match="lwn.gate"):
        from_torch_state_dict("latent_vit_v2", sd_gate,
                              tmpl_no_gate["params"],
                              config=dict(cfg, use_lwn_residual=False))


@needs_reference
@pytest.mark.parametrize("model_type", ["standard", "light", "deep", "2d"])
def test_latent_cnn_interop(ref_models, model_type):
    from fer_vit_tpu.models import create_latent_cnn

    ours = create_latent_cnn(model_type, dropout=0.0)
    theirs = ref_models["create_latent_cnn"](model_type)
    x = np.random.default_rng(2).normal(size=(4, 18, 512)).astype(np.float32)
    _check_family(ours, theirs, f"latent_cnn_{model_type}",
                  {"model_type": model_type}, jnp.asarray(x),
                  torch.tensor(x), atol=5e-4)


@needs_reference
def test_image_vit_interop(ref_models):
    from fer_vit_tpu.models import ImageViT

    cfg = dict(img_size=32, patch_size=16, embed_dim=64, depth=2, heads=4,
               mlp_dim=128, num_classes=7, dropout=0.0)
    ours = ImageViT(**cfg)
    theirs = ref_models["image_vit"](**cfg)
    x = np.random.default_rng(3).normal(size=(4, 32, 32, 3)).astype(np.float32)
    _check_family(ours, theirs, "image_vit", cfg, jnp.asarray(x),
                  torch.tensor(x.transpose(0, 3, 1, 2)))


def test_hybrid_roundtrip_and_keyset():
    """Hybrid can't be instantiated reference-side here (timm missing), so:
    bit-exact roundtrip + the exported key set matches the reference
    HybridLatentViT module structure (hybrid_latent_vit.py:79-114,249-265)."""
    from fer_vit_tpu.models import create_hybrid_latent_vit

    m = create_hybrid_latent_vit(model_size="tiny", use_adapter=True,
                                 adapter_dim=8)
    v = m.init(jax.random.key(0), jnp.zeros((1, 18, 512)))
    params = jax.tree_util.tree_map(np.asarray, v["params"])
    sd = _roundtrip("hybrid", params, {}, {})
    keys = set(sd)
    assert "input_proj.weight" in keys and "cls_token" in keys
    assert "pos_embed" in keys
    assert "transformer.0.attn.qkv.weight" in keys
    assert "transformer.11.mlp.fc2.bias" in keys
    assert "adapters.0.adapter.0.weight" in keys
    assert "adapters.11.alpha" in keys
    assert "head.0.weight" in keys and "head.2.weight" in keys


def test_model_kind_discrimination():
    assert model_kind_from_config({"model_size": "small"}) == "hybrid"
    assert model_kind_from_config({"model_type": "deep"}) == "latent_cnn_deep"
    assert model_kind_from_config({"use_leam": True}) == "latent_vit_v2"
    assert model_kind_from_config({"img_size": 224}) == "image_vit"
    assert model_kind_from_config({"depth": 6}) == "latent_vit"


@needs_reference
def test_eval_cli_loads_reference_torch_checkpoint(ref_models, tmp_path):
    """End-to-end (VERDICT r2 #3 'done when'): a torch checkpoint in the
    reference's on-disk schema evaluates through OUR eval CLI with logits
    identical to the torch model's."""
    from fer_vit_tpu.eval.evaluate_model import build_parser, load_model, main

    cfg = dict(latent_dim=512, seq_len=18, embed_dim=64, depth=2, heads=4,
               mlp_dim=128, num_classes=7, dropout=0.0)
    torch.manual_seed(0)
    ref_model = ref_models["latent_vit"](**cfg).eval()
    ckpt_path = str(tmp_path / "ref_checkpoint.pt")
    torch.save({
        "epoch": 7,
        "model_state_dict": ref_model.state_dict(),
        "metrics": {"f1_macro": 0.5},
        "config": {"model": cfg},
    }, ckpt_path)

    # tiny latent test set
    rng = np.random.default_rng(0)
    x = rng.normal(size=(20, 18, 512)).astype(np.float32)
    y = (np.arange(20) % 7).astype(np.int32)
    test_dir = tmp_path / "test"
    test_dir.mkdir()
    np.savez(str(test_dir / "latents_pack.npz"), latents=x, labels=y)

    model, variables, config = load_model(ckpt_path)
    with torch.no_grad():
        expected = ref_model(torch.tensor(x)).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got.argmax(1), expected.argmax(1))

    out_dir = str(tmp_path / "eval_out")
    report = main(build_parser().parse_args([
        "--checkpoint_path", ckpt_path, "--latent_test_dir", str(test_dir),
        "--output_dir", out_dir, "--visualize_samples", "0"]))
    torch_acc = float((expected.argmax(1) == y).mean())
    assert report["accuracy"] == pytest.approx(torch_acc)
    assert os.path.exists(os.path.join(out_dir, "evaluation_report.json"))


@needs_reference
def test_export_roundtrips_through_reference_loader(ref_models, tmp_path):
    """Our training checkpoint → export_torch_checkpoint → the REFERENCE
    torch model strict-loads it and produces identical predictions."""
    from fer_vit_tpu.models import LatentViT
    from fer_vit_tpu.train.harness import Harness, TrainConfig
    from fer_vit_tpu.interop.export_torch_checkpoint import export_checkpoint
    from fer_vit_tpu.utils.experiment_logger import ExperimentLogger

    cfg = dict(latent_dim=512, seq_len=18, embed_dim=32, depth=1, heads=2,
               mlp_dim=64, num_classes=7, dropout=0.0)
    h = Harness(model=LatentViT(**cfg),
                cfg=TrainConfig(epochs=1, batch_size=8, mixup=0.0))
    state = h.init_state(jax.random.key(0), jnp.zeros((1, 18, 512)))
    logger = ExperimentLogger("export_rt", base_dir=str(tmp_path))
    logger.log_config({"model": cfg, "training": {}})
    logger.save_checkpoint(state, 1, {"f1_macro": 0.1}, is_best=True)
    logger.close()
    ours_ckpt = os.path.join(logger.run_dir, "checkpoints", "best_model.pt")

    out_pt = str(tmp_path / "exported.pt")
    export_checkpoint(ours_ckpt, out_pt)

    ckpt = torch.load(out_pt, map_location="cpu", weights_only=False)
    ref_model = ref_models["latent_vit"](**cfg)
    ref_model.load_state_dict(ckpt["model_state_dict"], strict=True)
    ref_model.eval()
    x = np.random.default_rng(4).normal(size=(6, 18, 512)).astype(np.float32)
    with torch.no_grad():
        expected = ref_model(torch.tensor(x)).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(h.model.apply({"params": state.params},
                                       jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


class _RefTimmMlp(torch.nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = torch.nn.Linear(dim, hidden)
        self.fc2 = torch.nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x),
                                                 approximate="none"))


class _RefTimmAttn(torch.nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = torch.nn.Linear(dim, dim * 3)
        self.proj = torch.nn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, D // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = (q @ k.transpose(-2, -1)) * (D // self.heads) ** -0.5
        out = (a.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(out)


class _RefTimmBlock(torch.nn.Module):
    def __init__(self, dim, heads, mlp_dim):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.attn = _RefTimmAttn(dim, heads)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _RefTimmMlp(dim, mlp_dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _RefAdapter(torch.nn.Module):
    """Reference AdapterModule (hybrid_latent_vit.py:249-265) — identical
    module names so state_dict keys match the reference exactly."""

    def __init__(self, dim, adapter_dim):
        super().__init__()
        self.adapter = torch.nn.Sequential(
            torch.nn.Linear(dim, adapter_dim), torch.nn.GELU(),
            torch.nn.Linear(adapter_dim, dim))
        self.alpha = torch.nn.Parameter(torch.ones(1) * 0.1)

    def forward(self, x):
        return x + self.alpha * self.adapter(x)


class TorchHybridReplica(torch.nn.Module):
    """Structural replica of the reference HybridLatentViT
    (hybrid_latent_vit.py:79-239) with the same attribute names, so its
    state_dict keys equal a reference-trained hybrid checkpoint's."""

    def __init__(self, latent_dim=512, seq_len=18, dim=96, depth=3, heads=3,
                 mlp_dim=384, num_classes=7, adapter_dim=8):
        super().__init__()
        self.input_proj = torch.nn.Linear(latent_dim, dim)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = torch.nn.Parameter(
            torch.randn(1, seq_len + 1, dim) * 0.02)
        self.transformer = torch.nn.ModuleList(
            [_RefTimmBlock(dim, heads, mlp_dim) for _ in range(depth)])
        self.adapters = torch.nn.ModuleList(
            [_RefAdapter(dim, adapter_dim) for _ in range(depth)])
        self.head = torch.nn.Sequential(
            torch.nn.LayerNorm(dim), torch.nn.Dropout(0.0),
            torch.nn.Linear(dim, num_classes))

    def forward(self, x):
        x = self.input_proj(x)
        cls = self.cls_token.expand(x.size(0), -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for block, adapter in zip(self.transformer, self.adapters):
            x = adapter(block(x))
        return self.head(x[:, 0])


def test_hybrid_interop_forward_parity():
    """Hybrid interop beyond roundtrip/keyset: our export strict-loads into
    a reference-structured torch hybrid (same module names as
    hybrid_latent_vit.py) and the logits agree."""
    from fer_vit_tpu.models.hybrid_latent_vit import HybridLatentViT

    ours = HybridLatentViT(latent_dim=512, seq_len=18, embed_dim=96,
                           depth=3, num_heads=3, mlp_dim=384,
                           adapter_dim=8, head_dropout=0.0)
    v = ours.init(jax.random.key(0), jnp.zeros((1, 18, 512)))
    params = jax.tree_util.tree_map(np.asarray, v["params"])
    sd = to_torch_state_dict("hybrid", params, {}, config={})

    theirs = TorchHybridReplica()
    res = theirs.load_state_dict(sd, strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    theirs.eval()

    x = np.random.default_rng(7).normal(size=(4, 18, 512)).astype(np.float32)
    with torch.no_grad():
        expected = theirs(torch.tensor(x)).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                    deterministic=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got.argmax(1), expected.argmax(1))

    # and back: a replica-trained checkpoint imports bit-consistently
    p2, _ = from_torch_state_dict("hybrid", theirs.state_dict(), params, {},
                                  config={})
    with jax.default_matmul_precision("highest"):
        got2 = np.asarray(ours.apply({"params": p2}, jnp.asarray(x),
                                     deterministic=True))
    np.testing.assert_allclose(got2, expected, rtol=1e-4, atol=1e-4)


@needs_reference
def test_style_extractor_interop():
    """AFS StyleExtractor interop: our stacked-leaf (vmapped) layout ↔ the
    reference's per-block naming (reference afs/style_extractor.py:76-116).
    Strict load into the reference's own class, eval-mode forward parity,
    and a bit-exact roundtrip incl. BatchNorm running stats."""
    from tests.torch_refs_aux import (
        install_fake_psp_modules,
        install_fake_torchvision,
    )

    from fer_vit_tpu.afs.style_extractor import StyleExtractor
    from fer_vit_tpu.interop import (
        style_extractor_from_torch_state_dict,
        style_extractor_to_torch_state_dict,
    )

    n_layers = 5
    h = StyleExtractor(n_layers=n_layers)
    variables = h.init(jax.random.key(0), jnp.zeros((2, n_layers, 512)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    # one train-mode forward so the running stats are non-trivial
    rng = np.random.default_rng(0)
    _, upd = h.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(rng.normal(size=(4, n_layers, 512)).astype(np.float32)),
        deterministic=False, mutable=["batch_stats"])
    batch_stats = upd["batch_stats"]

    sd = style_extractor_to_torch_state_dict(params, batch_stats)

    # afs/__init__ imports losses/image_provider → stub the absent
    # third_party pSp modules and torchvision before importing
    install_fake_torchvision()
    install_fake_psp_modules(arcface_plan=[(64, 64, 1)], feat_hw=7)
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from afs.style_extractor import StyleExtractor as RefStyleExtractor
    finally:
        sys.path.remove(REFERENCE_ROOT)
    h_ref = RefStyleExtractor(n_layers=n_layers)
    res = h_ref.load_state_dict(sd, strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    h_ref.eval()

    x = np.random.default_rng(1).normal(
        size=(3, n_layers, 512)).astype(np.float32)
    with torch.no_grad():
        ref_out = h_ref(torch.from_numpy(x)).numpy()
    with jax.default_matmul_precision("highest"):
        ours_out = np.asarray(h.apply(
            {"params": params, "batch_stats": batch_stats}, jnp.asarray(x)))
    np.testing.assert_allclose(ours_out, ref_out, atol=5e-6)

    p2, bs2 = style_extractor_from_torch_state_dict(sd, params, batch_stats)
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(ka))
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(batch_stats),
            jax.tree_util.tree_leaves_with_path(bs2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(ka))


def test_model_kind_image_config_with_model_size():
    """Real ImageViT checkpoints carry BOTH model_size (tiny/small/base/
    custom) and img_size/patch_size (reference train/train_image_vit.py:
    237-246, 317-328) — the image route must win over the hybrid one,
    which matches on model_size alone."""
    assert model_kind_from_config(
        {"model_size": "tiny", "img_size": 224, "patch_size": 16,
         "embed_dim": 192, "depth": 12}) == "image_vit"
    assert model_kind_from_config({"model_size": "small"}) == "hybrid"


def test_evaluate_model_builds_image_vit_from_image_config():
    """evaluate_model's config discrimination routes image-geometry
    configs to ImageViT even when model_size is present."""
    from fer_vit_tpu.eval.evaluate_model import model_from_config
    from fer_vit_tpu.models import ImageViT

    m = model_from_config({"model_size": "custom", "img_size": 32,
                           "patch_size": 8, "embed_dim": 64, "depth": 2,
                           "heads": 4, "mlp_dim": 128})
    assert isinstance(m, ImageViT)
    assert m.img_size == 32


def test_evaluate_model_honors_image_vit_size_presets():
    """Both trainers save the raw CLI embed_dim/depth/heads even when
    --model_size tiny built a 192-dim model (reference
    train/train_image_vit.py:233-246,315-327) — evaluate_model must apply
    the preset override like evaluate_image_vit does, else preset-size
    checkpoints rebuild with mismatched shapes."""
    from fer_vit_tpu.eval.evaluate_model import model_from_config

    m = model_from_config({"model_size": "tiny", "img_size": 224,
                           "patch_size": 16,
                           # raw CLI defaults (wrong for tiny):
                           "embed_dim": 384, "depth": 12, "heads": 6,
                           "mlp_dim": 1536})
    assert m.embed_dim == 192 and m.heads == 3 and m.mlp_dim == 768
