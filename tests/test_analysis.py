"""Analysis-stack tests: SVM direction quality vs sklearn, SeFa eigh,
vmapped direction verification, offline/online latent augmentation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fer_vit_tpu.analysis.expression_directions import (
    compute_binary_directions,
    directions_accuracy,
    save_directions,
)
from fer_vit_tpu.analysis.sefa import (
    factorize_weights,
    verify_non_expression_directions,
)


def _separable_data(n_per=40, d=64, seed=0):
    """7 classes with distinct mean directions — linearly separable."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(7, d)) * 3.0
    xs, ys = [], []
    for c in range(7):
        xs.append(centers[c] + rng.normal(size=(n_per, d)) * 0.5)
        ys.append(np.full(n_per, c))
    return (np.concatenate(xs).astype(np.float32),
            np.concatenate(ys).astype(np.int64), centers)


class TestSVMDirections:
    def test_jax_backend_separates(self):
        x, y, centers = _separable_data()
        dirs = compute_binary_directions(x, y, backend="jax", steps=300)
        acc = directions_accuracy(x, y, dirs)
        assert acc > 0.95
        for c in range(7):
            assert np.linalg.norm(dirs[c]) == pytest.approx(1.0, rel=1e-5)

    def test_jax_close_to_sklearn(self):
        x, y, _ = _separable_data()
        jax_dirs = compute_binary_directions(x, y, backend="jax", steps=2000)
        sk_dirs = compute_binary_directions(x, y, backend="sklearn")
        for c in range(7):
            cos = float(np.dot(jax_dirs[c], sk_dirs[c]))
            assert cos > 0.995, f"class {c}: cos={cos:.4f}"

    def test_save_and_load_roundtrip(self, tmp_path):
        from fer_vit_tpu.models import LatentDecomposer

        x, y, _ = _separable_data(d=18 * 16)
        dirs = compute_binary_directions(x, y, backend="jax", steps=100)
        path = save_directions(dirs, str(tmp_path), "binary",
                               seq_len=18, latent_dim=16)
        dec = LatentDecomposer.from_file(path)
        assert dec.directions.shape == (7, 18, 16)


class TestSeFa:
    def test_factorize_orthonormal_topk(self):
        rng = np.random.default_rng(0)
        weight = rng.normal(size=(128, 64)).astype(np.float32)
        out = factorize_weights(weight, num_semantics=5)
        dirs, eig = out["directions"], out["eigenvalues"]
        assert dirs.shape == (5, 64)
        assert eig.shape == (5,)
        # eigenvalues descending, eigenvectors unit + orthogonal
        assert np.all(np.diff(eig) <= 1e-3)
        gram = dirs @ dirs.T
        np.testing.assert_allclose(gram, np.eye(5), atol=1e-4)
        # matches numpy reference
        ata = weight.T @ weight
        ev, _ = np.linalg.eigh(ata)
        np.testing.assert_allclose(eig, ev[::-1][:5], rtol=1e-3)  # f32 eigh

    def test_layer_idx_slicing(self):
        weight = np.random.default_rng(1).normal(size=(32, 16)).astype(np.float32)
        out = factorize_weights(weight, layer_idx=[0, 1, 2], num_semantics=3)
        assert out["directions"].shape == (3, 16)


class TestVerifyDirections:
    def test_insensitive_direction_low_change_rate(self):
        """A model reading only dims 0-3 must be insensitive to a direction
        living in dims 10+, and sensitive to one along dim 0."""
        def fer_apply(w):  # (B, 2, 8) → logits from first dims only
            return jnp.stack(
                [w[:, 0, 0], w[:, 0, 1], w[:, 0, 2]], axis=-1
            ) * 10.0

        rng = np.random.default_rng(0)
        latents = rng.normal(size=(20, 2, 8)).astype(np.float32)
        insensitive = np.zeros(8, np.float32); insensitive[6] = 1.0
        sensitive = np.zeros(8, np.float32); sensitive[0] = 1.0
        results = verify_non_expression_directions(
            np.stack([insensitive, sensitive]), latents, fer_apply,
        )
        assert results[0]["label_change_rate"] < 0.05
        assert results[1]["label_change_rate"] > 0.5


class TestAugmentLatents:
    def test_offline_broadcast(self):
        from fer_vit_tpu.data.augment_latents import augment_latents_array

        latents = np.random.default_rng(0).normal(size=(5, 18, 512)).astype(np.float32)
        dirs = np.random.default_rng(1).normal(size=(2, 512)).astype(np.float32)
        aug = augment_latents_array(latents, dirs, step_sizes=[-1.0, 1.0])
        assert aug.shape == (5, 2, 2, 18, 512)
        np.testing.assert_allclose(
            aug[0, 1, 1], latents[0] + dirs[1][None, :], rtol=1e-5
        )

    def test_offline_file_api(self, tmp_path):
        from fer_vit_tpu.data.augment_latents import (
            augment_latents_with_directions,
        )
        from fer_vit_tpu.data.latent_store import LatentStore

        src = tmp_path / "src"
        src.mkdir()
        lat = np.random.default_rng(0).normal(size=(4, 18, 512)).astype(np.float32)
        np.savez(str(src / "latents_pack.npz"), latents=lat,
                 labels=np.arange(4, dtype=np.int32))
        dirs = np.random.default_rng(1).normal(size=(5, 512)).astype(np.float32)
        total = augment_latents_with_directions(
            str(src), str(tmp_path / "out"), dirs, [0, 2],
            step_sizes=[-2.0, -1.0, 1.0, 2.0],
        )
        assert total == 4 + 4 * 2 * 4
        # idempotent
        total2 = augment_latents_with_directions(
            str(src), str(tmp_path / "out"), dirs, [0, 2],
        )
        assert total2 == total
        store = LatentStore.load(str(tmp_path / "out" / "latents_pack_augmented.npz"))
        assert len(store) == total

    def test_online_augment(self):
        from fer_vit_tpu.data.augment_latents import online_direction_augment

        latents = jnp.asarray(
            np.random.default_rng(0).normal(size=(16, 18, 32)), jnp.float32
        )
        dirs = jnp.asarray(
            np.random.default_rng(1).normal(size=(3, 32)), jnp.float32
        )
        out = online_direction_augment(jax.random.key(0), latents, dirs,
                                       prob=1.0)
        assert out.shape == latents.shape
        assert not np.allclose(np.asarray(out), np.asarray(latents))
        # per-sample delta constant across layers (direction broadcast)
        delta = np.asarray(out - latents)
        np.testing.assert_allclose(delta[:, 0], delta[:, 5], rtol=1e-5)
