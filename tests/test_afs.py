"""AFS-stack tests: style extractor, pair sampling, adaptive pooling parity,
loss semantics."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fer_vit_tpu.afs.losses import AFSLoss
from fer_vit_tpu.afs.pair_sampling import sample_pair_indices
from fer_vit_tpu.afs.style_extractor import StyleExtractor
from fer_vit_tpu.encoders.arcface import adaptive_avg_pool


class TestStyleExtractor:
    def test_shapes_and_per_layer_params(self):
        m = StyleExtractor(n_layers=4, latent_dim=32, mid_dim=16)
        w = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4, 32)),
                        jnp.float32)
        v = m.init(jax.random.key(0), w)
        out = m.apply(v, w)
        assert out.shape == (3, 4, 32)
        # vmapped blocks: params stacked over the layer axis
        assert v["params"]["blocks"]["down"]["kernel"].shape == (4, 32, 16)

    def test_layers_independent(self):
        """Different layers must go through different parameters."""
        m = StyleExtractor(n_layers=2, latent_dim=16, mid_dim=8)
        v = m.init(jax.random.key(0), jnp.zeros((1, 2, 16)))
        same_tok = jnp.asarray(
            np.tile(np.random.default_rng(0).normal(size=(1, 1, 16)), (1, 2, 1)),
            jnp.float32,
        )
        out = m.apply(v, same_tok)
        assert not np.allclose(np.asarray(out[0, 0]), np.asarray(out[0, 1]))

    def test_bn_stats_update_in_train(self):
        m = StyleExtractor(n_layers=2, latent_dim=16, mid_dim=8)
        w = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2, 16)),
                        jnp.float32)
        v = m.init(jax.random.key(0), w)
        _, upd = m.apply(v, w, deterministic=False, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(v["batch_stats"])[0]
        after = jax.tree_util.tree_leaves(upd["batch_stats"])[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestPairSampling:
    def test_never_self_pair(self):
        src, tgt = sample_pair_indices(jax.random.key(0), n=7, batch=512)
        assert not np.any(np.asarray(src) == np.asarray(tgt))

    def test_uniform_over_others(self):
        src, tgt = sample_pair_indices(jax.random.key(1), n=5, batch=20000)
        src, tgt = np.asarray(src), np.asarray(tgt)
        # conditional distribution of tgt given src should be ~uniform
        for s in range(5):
            t = tgt[src == s]
            counts = np.bincount(t, minlength=5)
            assert counts[s] == 0
            others = counts[np.arange(5) != s]
            assert others.min() > 0.8 * others.mean()


class TestAdaptivePool:
    @pytest.mark.parametrize("in_s,out_s", [(188, 112), (64, 256), (8, 8)])
    def test_matches_torch(self, in_s, out_s):
        import torch

        x = np.random.default_rng(0).normal(size=(2, in_s, in_s, 3)).astype(np.float32)
        expected = (
            torch.nn.AdaptiveAvgPool2d((out_s, out_s))(
                torch.tensor(x.transpose(0, 3, 1, 2))
            ).numpy().transpose(0, 2, 3, 1)
        )
        got = np.asarray(adaptive_avg_pool(jnp.asarray(x), out_s))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


class TestAFSLoss:
    @pytest.fixture(scope="class")
    def criterion(self):
        return AFSLoss(lambda_cons=0.1)  # random frozen nets: fine for semantics

    def test_identical_images_zero_id_lpips(self, criterion):
        img = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, size=(2, 256, 256, 3)),
            jnp.float32,
        )
        sty = jnp.zeros((2, 18, 512))
        loss, metrics = criterion(img, img, img, sty, sty)
        assert float(metrics["id"]) == pytest.approx(0.0, abs=1e-5)
        assert float(metrics["lpips"]) == pytest.approx(0.0, abs=1e-6)
        assert float(metrics["cons"]) == pytest.approx(0.0, abs=1e-7)
        assert float(loss) == pytest.approx(0.0, abs=1e-4)

    def test_consistency_gradient_only_through_new(self, criterion):
        """L_cons must push w_sty_new toward w_sty_tgt, never the reverse
        (stop_gradient on the target, reference afs/losses.py:128-131)."""
        img = jnp.zeros((1, 256, 256, 3))
        w_new = jnp.ones((1, 18, 512)) * 0.5
        w_tgt = jnp.zeros((1, 18, 512))

        def f(w_new, w_tgt):
            loss, _ = criterion(img, img, img, w_new, w_tgt)
            return loss

        g_new, g_tgt = jax.grad(f, argnums=(0, 1))(w_new, w_tgt)
        assert float(jnp.abs(g_new).sum()) > 0
        assert float(jnp.abs(g_tgt).sum()) == 0.0


class TestDiskImageProvider:
    def test_remap_keeps_class_dir(self, tmp_path):
        """--img_root remapping rebuilds from the last TWO components
        (img_root/class/filename — reference afs/image_provider.py:108-113);
        keeping only the basename would drop the class dir and collide
        same-named files across classes."""
        from fer_vit_tpu.afs.image_provider import DiskImageProvider

        p = DiskImageProvider(img_root="/new/root")
        assert p._remap("/old/ds/train/angry/001.jpg") \
            == os.path.join("/new/root", "angry", "001.jpg")
        # no img_root → stored path resolved as-is (absolute)
        p2 = DiskImageProvider()
        assert os.path.isabs(p2._remap("rel/angry/001.jpg"))

    def test_unreadable_image_raises(self, tmp_path):
        """The reference raises on a bad path (Image.open) — a silent
        black frame would train the AFS losses against garbage."""
        from fer_vit_tpu.afs.image_provider import DiskImageProvider

        p = DiskImageProvider()
        with pytest.raises(Exception):
            p.get_images(None, [str(tmp_path / "missing" / "x.jpg")])


class TestPairStorePaths:
    def test_pt_dir_img_paths_reach_pair_store(self, tmp_path):
        """Reference .pt latent dirs carry img_path per record — provider B
        needs them, so PairLatentStore must surface them (they also survive
        the auto-written pack cache)."""
        import torch

        from fer_vit_tpu.afs.pair_sampling import PairLatentStore

        d = tmp_path / "latents"
        d.mkdir()
        for i in range(4):
            torch.save({"latent": torch.randn(18, 512), "label": i % 7,
                        "img_path": f"/ds/train/angry/{i}.jpg"},
                       str(d / f"s{i}.pt"))
        ps = PairLatentStore.load(str(d))
        assert ps.img_paths == [f"/ds/train/angry/{i}.jpg" for i in range(4)]
        # second load goes through the pack cache written by the first —
        # paths must survive it
        ps2 = PairLatentStore.load(str(d))
        assert ps2.img_paths == ps.img_paths
