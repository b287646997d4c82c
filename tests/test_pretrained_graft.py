"""Pretrained-trunk graft coverage: the converted-timm ``.npz`` →
``graft_pretrained`` route used by the hybrid AND expression-aware
trainers (reference loads timm inside the model ctor,
hybrid_latent_vit.py:68-114; here weights graft into fresh init)."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fer_vit_tpu.encoders.convert_psp import (  # noqa: E402
    _flatten,
    load_npz_variables,
    save_npz_variables,
)
from fer_vit_tpu.encoders.convert_timm import convert_timm_state_dict  # noqa: E402
from fer_vit_tpu.models.hybrid_latent_vit import (  # noqa: E402
    create_hybrid_latent_vit,
    graft_pretrained,
)
from tests.torch_refs_aux import TimmViTStub  # noqa: E402


def _tiny_npz(tmp_path, depth=12):
    """A tiny-preset (192-dim) timm state_dict → converted .npz file."""
    stub = TimmViTStub(embed_dim=192, depth=depth, num_heads=3,
                       mlp_hidden=768, n_patches=196)
    sd = {k: np.asarray(v.detach(), np.float32)
          for k, v in stub.state_dict().items()}
    # the latent-token stub has no conv patch embed; the converter expects
    # a full timm checkpoint (graft_pretrained then ignores the key)
    rng = np.random.default_rng(0)
    sd["patch_embed.proj.weight"] = rng.normal(
        size=(192, 3, 16, 16)).astype(np.float32)
    sd["patch_embed.proj.bias"] = np.zeros(192, np.float32)
    variables = convert_timm_state_dict(sd)
    out = str(tmp_path / "timm_tiny.npz")
    save_npz_variables(variables, out)
    return out, sd


def test_graft_pretrained_roundtrip(tmp_path):
    npz_path, sd = _tiny_npz(tmp_path, depth=2)
    pretrained = _flatten(load_npz_variables(npz_path)["params"])

    model = create_hybrid_latent_vit(model_size="tiny", seq_len=18)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 18, 512)))["params"]
    fresh_proj = np.asarray(params["input_proj"]["kernel"]).copy()
    grafted = graft_pretrained(params, pretrained, 18)

    # trunk leaves come from the checkpoint (blocks 0-1; the rest of the
    # 12 tiny blocks stay fresh — graft is name-driven)
    np.testing.assert_array_equal(
        np.asarray(grafted["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.transpose(sd["blocks.0.attn.qkv.weight"]))
    np.testing.assert_array_equal(
        np.asarray(grafted["cls_token"]), sd["cls_token"])
    # pos-emb interpolated 196→18 tokens (+CLS)
    assert grafted["pos_embed"].shape == (1, 19, 192)
    # input_proj / head stay freshly initialized (reference trains them
    # from scratch)
    np.testing.assert_array_equal(
        np.asarray(grafted["input_proj"]["kernel"]), fresh_proj)


def test_expression_aware_cli_grafts_pretrained(tmp_path):
    """--use_pretrained --pretrained_npz on the expression-aware trainer
    must actually load the trunk (it used to parse-and-ignore the flags):
    with --freeze_transformer the grafted block weights survive training
    bit-exact into the checkpoint."""
    from flax import serialization

    from fer_vit_tpu.train.train_expression_aware_vit import (
        build_parser,
        main,
    )
    from tests.test_train_cli import make_latent_dirs, run_cli

    npz_path, sd = _tiny_npz(tmp_path)
    dirs = make_latent_dirs(tmp_path)
    directions = {
        "directions": {i: torch.randn(18, 512) for i in range(7)},
        "emotion_names": ["angry", "disgust", "fear", "happy", "neutral",
                          "sad", "surprise"],
        "seq_len": 18, "latent_dim": 512, "method": "binary",
    }
    dir_path = str(tmp_path / "directions.pt")
    torch.save(directions, dir_path)
    exp_dir = str(tmp_path / "experiments")

    run_cli(main, build_parser(), [
        "--latent_train_dir", dirs["train"],
        "--latent_val_dir", dirs["val"],
        "--directions_path", dir_path,
        "--model_size", "tiny", "--epochs", "1", "--batch_size", "16",
        "--use_pretrained", "--pretrained_npz", npz_path,
        "--freeze_transformer", "--experiments_dir", exp_dir, "--no_bf16",
    ])

    ckpts = glob.glob(os.path.join(exp_dir, "*", "*", "checkpoints",
                                   "best_model.pt"))
    assert len(ckpts) == 1
    payload = serialization.msgpack_restore(open(ckpts[0], "rb").read())
    state = serialization.msgpack_restore(payload["state"]) \
        if isinstance(payload["state"], bytes) else payload["state"]
    params = state["params"]
    np.testing.assert_array_equal(
        np.asarray(params["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.transpose(sd["blocks.0.attn.qkv.weight"]))
    np.testing.assert_array_equal(
        np.asarray(params["blocks_11"]["fc2"]["bias"]),
        sd["blocks.11.mlp.fc2.bias"])
