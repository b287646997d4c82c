"""Shape/dtype unit tests for the model zoo (SURVEY.md §4 implication (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fer_vit_tpu.models import (
    ExpressionAwareViT,
    HybridLatentViT,
    ImageViT,
    LatentCNN,
    LatentCNN2D,
    LatentCNNDeep,
    LatentCNNLight,
    LatentDecomposer,
    LatentViT,
    LatentViTv2,
    create_hybrid_latent_vit,
    create_latent_cnn,
)

KEY = jax.random.key(0)
B, L, D = 4, 18, 512


def _latents():
    return jax.random.normal(jax.random.key(1), (B, L, D))


class TestLatentViT:
    def test_forward_shape(self):
        model = LatentViT(depth=2)
        variables = model.init(KEY, _latents())
        logits = model.apply(variables, _latents())
        assert logits.shape == (B, 7)
        assert logits.dtype == jnp.float32

    def test_train_mode_dropout(self):
        model = LatentViT(depth=2, dropout=0.5)
        variables = model.init(KEY, _latents())
        out1 = model.apply(
            variables, _latents(), deterministic=False,
            rngs={"dropout": jax.random.key(2)},
        )
        out2 = model.apply(
            variables, _latents(), deterministic=False,
            rngs={"dropout": jax.random.key(3)},
        )
        assert not np.allclose(out1, out2)

    def test_deterministic_eval(self):
        model = LatentViT(depth=2)
        variables = model.init(KEY, _latents())
        out1 = model.apply(variables, _latents())
        out2 = model.apply(variables, _latents())
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_jit(self):
        model = LatentViT(depth=2)
        variables = model.init(KEY, _latents())
        fn = jax.jit(lambda v, x: model.apply(v, x))
        logits = fn(variables, _latents())
        assert logits.shape == (B, 7)

    def test_param_count_matches_reference_arch(self):
        # d=6 h=8 mlp=2048 embed=512: the reference LatentViT has
        # input_proj + cls + pos + 6 torch encoder layers + LN + head.
        model = LatentViT()
        variables = model.init(KEY, _latents())
        n = sum(x.size for x in jax.tree_util.tree_leaves(variables))
        # torch: sum(p.numel()) for the same config = 19,191,815
        assert n == 19_191_815


class TestLatentViTv2:
    @pytest.mark.parametrize(
        "flags",
        [
            dict(),
            dict(use_lwn=True),
            dict(use_lwn=True, use_lwn_residual=True),
            dict(use_spe=True),
            dict(use_leam=True),
            dict(use_lwn=True, use_spe=True, use_leam=True),
        ],
    )
    def test_ablation_flags(self, flags):
        model = LatentViTv2(depth=2, **flags)
        variables = model.init(KEY, _latents())
        logits = model.apply(variables, _latents())
        assert logits.shape == (B, 7)

    def test_leam_weights_extraction(self):
        model = LatentViTv2(depth=1, use_leam=True)
        variables = model.init(KEY, _latents())
        w = LatentViTv2.get_leam_weights(variables["params"])
        assert w.shape == (18,)
        # init: sigmoid(1.0) mid layers, sigmoid(0.5) coarse/fine
        np.testing.assert_allclose(np.asarray(w[:4]), 1 / (1 + np.exp(-0.5)), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(w[5]), 1 / (1 + np.exp(-1.0)), rtol=1e-5)

    def test_no_leam_returns_none(self):
        model = LatentViTv2(depth=1)
        variables = model.init(KEY, _latents())
        assert LatentViTv2.get_leam_weights(variables["params"]) is None


class TestImageViT:
    def test_forward_shape(self):
        model = ImageViT(img_size=32, patch_size=16, embed_dim=64, depth=2,
                         heads=2, mlp_dim=128)
        x = jax.random.normal(KEY, (2, 32, 32, 3))
        variables = model.init(KEY, x)
        logits = model.apply(variables, x)
        assert logits.shape == (2, 7)

    def test_n_patches(self):
        model = ImageViT(img_size=224, patch_size=16)
        assert model.n_patches == 196


class TestLatentCNNs:
    @pytest.mark.parametrize("mtype", ["light", "standard", "deep", "2d"])
    def test_forward_shape(self, mtype):
        model = create_latent_cnn(mtype)
        variables = model.init(KEY, _latents())
        logits = model.apply(variables, _latents())
        assert logits.shape == (B, 7)

    def test_batch_stats_update(self):
        model = LatentCNNLight()
        variables = model.init(KEY, _latents())
        out, updates = model.apply(
            variables, _latents(), deterministic=False,
            rngs={"dropout": jax.random.key(4)},
            mutable=["batch_stats"],
        )
        assert out.shape == (B, 7)
        assert "batch_stats" in updates
        # running stats must have moved off the init values
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(not np.allclose(o, n) for o, n in zip(old, new))

    def test_gradients_flow(self):
        model = create_latent_cnn("standard")
        variables = model.init(KEY, _latents())

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                _latents(),
            )
            return jnp.sum(out)

        grads = jax.grad(loss_fn)(variables["params"])
        norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
        assert sum(norms) > 0


class TestLatentDecomposer:
    def _decomposer(self):
        dirs = np.random.default_rng(0).normal(size=(7, L, D)).astype(np.float32)
        return LatentDecomposer.from_array(dirs)

    def test_directions_normalized(self):
        dec = self._decomposer()
        flat = np.asarray(dec.directions).reshape(7, -1)
        np.testing.assert_allclose(np.linalg.norm(flat, axis=1), 1.0, rtol=1e-5)

    def test_decompose_reconstruction(self):
        dec = self._decomposer()
        w = _latents()
        w_expr, w_id = dec.decompose(w)
        np.testing.assert_allclose(
            np.asarray(w_expr + w_id), np.asarray(w), rtol=1e-4, atol=1e-4
        )

    def test_max_class_mode(self):
        dec = self._decomposer()
        w_expr, w_id = dec.decompose(_latents(), mode="max_class")
        assert w_expr.shape == (B, L, D)

    def test_output_modes(self):
        dec = self._decomposer()
        w = _latents()
        assert dec(w, "expr_only").shape == (B, L, D)
        assert dec(w, "id_only").shape == (B, L, D)
        assert dec(w, "enhanced").shape == (B, L, D)
        assert dec(w, "concat").shape == (B, 2 * L, D)

    def test_enhance_alpha_one_is_identity(self):
        dec = self._decomposer()
        w = _latents()
        np.testing.assert_allclose(
            np.asarray(dec.enhance_expression(w, alpha=1.0)),
            np.asarray(w), rtol=1e-4, atol=1e-4,
        )

    def test_npz_roundtrip(self, tmp_path):
        dec = self._decomposer()
        path = str(tmp_path / "dirs.npz")
        dec.save_npz(path, method="binary_svm")
        dec2 = LatentDecomposer.from_file(path)
        np.testing.assert_allclose(
            np.asarray(dec.directions), np.asarray(dec2.directions), rtol=1e-6
        )


class TestHybridLatentViT:
    def test_forward_shape(self):
        model = HybridLatentViT(embed_dim=64, depth=2, num_heads=2, mlp_dim=128)
        variables = model.init(KEY, _latents())
        logits = model.apply(variables, _latents())
        assert logits.shape == (B, 7)

    def test_adapter_params_exist(self):
        model = HybridLatentViT(embed_dim=64, depth=2, num_heads=2, mlp_dim=128,
                                adapter_dim=16)
        variables = model.init(KEY, _latents())
        assert "adapters_0" in variables["params"]
        assert "adapters_1" in variables["params"]

    def test_trainable_mask_freeze_all(self):
        from fer_vit_tpu.models.hybrid_latent_vit import trainable_mask

        model = HybridLatentViT(embed_dim=64, depth=2, num_heads=2, mlp_dim=128,
                                adapter_dim=16)
        variables = model.init(KEY, _latents())
        mask = trainable_mask(variables["params"], freeze_transformer=True)
        assert not any(jax.tree_util.tree_leaves(mask["blocks_0"]))
        assert all(jax.tree_util.tree_leaves(mask["adapters_0"]))
        assert all(jax.tree_util.tree_leaves(mask["head"]))

    def test_trainable_mask_freeze_stages(self):
        from fer_vit_tpu.models.hybrid_latent_vit import trainable_mask

        model = HybridLatentViT(embed_dim=64, depth=3, num_heads=2, mlp_dim=128)
        variables = model.init(KEY, _latents())
        mask = trainable_mask(variables["params"], freeze_stages=2)
        assert not any(jax.tree_util.tree_leaves(mask["blocks_0"]))
        assert not any(jax.tree_util.tree_leaves(mask["blocks_1"]))
        assert all(jax.tree_util.tree_leaves(mask["blocks_2"]))

    def test_pos_embed_interpolation(self):
        from fer_vit_tpu.models.hybrid_latent_vit import interpolate_pos_embed

        pos = np.random.default_rng(0).normal(size=(1, 197, 64)).astype(np.float32)
        out = interpolate_pos_embed(pos, 18)
        assert out.shape == (1, 19, 64)
        np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # CLS untouched


class TestExpressionAwareViT:
    def test_from_config_and_forward(self, tmp_path):
        dirs = np.random.default_rng(0).normal(size=(7, L, D)).astype(np.float32)
        dec = LatentDecomposer.from_array(dirs)
        path = str(tmp_path / "dirs.npz")
        dec.save_npz(path)

        model = ExpressionAwareViT.from_config(
            path, model_size="tiny", embed_dim=64, depth=2, num_heads=2, mlp_dim=128,
        )
        w = _latents()
        variables = model.init(KEY, w)
        logits = model.apply(variables, w)
        assert logits.shape == (B, 7)

    def test_concat_doubles_seq_len(self, tmp_path):
        dirs = np.random.default_rng(0).normal(size=(7, L, D)).astype(np.float32)
        LatentDecomposer.from_array(dirs).save_npz(str(tmp_path / "d.npz"))
        model = ExpressionAwareViT.from_config(
            str(tmp_path / "d.npz"), output_mode="concat",
            embed_dim=64, depth=1, num_heads=2, mlp_dim=128,
        )
        assert model.vit.seq_len == 36
        w = _latents()
        variables = model.init(KEY, w)
        assert model.apply(variables, w).shape == (B, 7)
