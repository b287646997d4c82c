"""CPU tests for the generate_latents pipeline: resumable-manifest
durability (only shard-flushed samples are marked processed — a crash
must never skip buffered-but-unwritten samples on resume), reference
per-image naming, and the pack/LatentStore roundtrip. The on-chip
version of this pipeline is validated by scripts/validate_tpu.py
(genlat stage)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fer_vit_tpu.data.generate_latents import generate_latents
from fer_vit_tpu.data.latent_store import LatentStore

CLASSES = ["angry", "disgust", "fear", "happy", "neutral", "sad",
           "surprise"]


class _StubEncoder:
    """Deterministic encode_batch: latent derived from the image mean so
    resumed re-encodes reproduce identical latents."""

    def __init__(self, fail_after_batches=None):
        self.fail_after = fail_after_batches
        self.calls = 0

    def encode_batch(self, imgs):
        self.calls += 1
        if self.fail_after is not None and self.calls > self.fail_after:
            raise RuntimeError("simulated crash")
        x = np.asarray(imgs, np.float32)
        seed = x.mean(axis=(1, 2, 3))  # (B,)
        out = np.tile(seed[:, None, None], (1, 18, 512))
        return out.astype(np.float32)


def _make_tree(root, n_per_class=2, img=32):
    rng = np.random.default_rng(0)
    for ci, cls in enumerate(CLASSES[:5]):
        d = os.path.join(root, cls)
        os.makedirs(d)
        for i in range(n_per_class):
            arr = rng.integers(0, 255, size=(img, img, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"im{i}.png"))


def test_crash_then_resume_loses_nothing(tmp_path):
    data = str(tmp_path / "data")
    out = str(tmp_path / "latents")
    os.makedirs(data)
    _make_tree(data, n_per_class=2)  # 10 images

    # batch 2, shard 4: after 2 batches shard 0 flushes (4 durable),
    # the 3rd encode raises → 2 buffered samples were NOT yet durable
    enc = _StubEncoder(fail_after_batches=2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        generate_latents(data, out, encoder=enc, batch_size=2,
                         shard_size=4)

    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert len(manifest["processed"]) == 4  # only the flushed shard
    assert manifest["next_shard"] == 1
    assert os.path.exists(os.path.join(out, "latents_pack_0000.npz"))

    # resume with a healthy encoder: the 6 remaining images (including
    # the 2 that were buffered at crash time) are encoded exactly once
    n = generate_latents(data, out, encoder=_StubEncoder(), batch_size=2,
                         shard_size=4)
    assert n == 6
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert len(manifest["processed"]) == 10

    store = LatentStore.load(out, pack_cache=False)
    assert len(store) == 10
    # no duplicates across shards: every source path appears exactly once
    all_paths = []
    for f in sorted(os.listdir(out)):
        if f.endswith(".npz"):
            with np.load(os.path.join(out, f)) as z:
                all_paths.extend(z["paths"].tolist())
    assert len(all_paths) == len(set(all_paths)) == 10
    assert store.latents.shape == (10, 18, 512)
    assert sorted(np.bincount(store.labels, minlength=7)[:5].tolist()) \
        == [2, 2, 2, 2, 2]


def test_sharded_workers_share_output_dir_without_collisions(tmp_path):
    # SURVEY §2.7 multi-host use case: N workers pointed at ONE output
    # dir must partition the input disjointly, write namespaced packs
    # and per-worker manifests, and LatentStore must read the merger.
    data = str(tmp_path / "data")
    out = str(tmp_path / "latents")
    os.makedirs(data)
    _make_tree(data, n_per_class=2)  # 10 images

    for sid in range(2):
        n = generate_latents(data, out, encoder=_StubEncoder(),
                             batch_size=2, shard_size=4,
                             num_shards=2, shard_id=sid)
        assert n == 5

    # per-worker namespaces: no latents_pack_0000.npz collision
    npzs = sorted(f for f in os.listdir(out) if f.endswith(".npz"))
    assert all(f.startswith(("latents_pack_w00_", "latents_pack_w01_"))
               for f in npzs), npzs
    assert json.load(open(os.path.join(
        out, "manifest_w00_of_02.json")))["processed"]
    assert json.load(open(os.path.join(
        out, "manifest_w01_of_02.json")))["processed"]

    # merged read: every image exactly once, labels intact
    store = LatentStore.load(out, pack_cache=False)
    assert len(store) == 10
    all_paths = []
    for f in npzs:
        with np.load(os.path.join(out, f)) as z:
            all_paths.extend(z["paths"].tolist())
    assert len(all_paths) == len(set(all_paths)) == 10
    assert sorted(np.bincount(store.labels, minlength=7)[:5].tolist()) \
        == [2, 2, 2, 2, 2]

    # resume: both partitions are fully durable → nothing to re-encode
    for sid in range(2):
        assert generate_latents(data, out, encoder=_StubEncoder(),
                                batch_size=2, shard_size=4,
                                num_shards=2, shard_id=sid) == 0


def test_resolve_worker_shard_validation():
    from fer_vit_tpu.data.generate_latents import resolve_worker_shard

    assert resolve_worker_shard(2, 1) == (2, 1)
    assert resolve_worker_shard(3, -1) == (3, 0)  # explicit count, auto id
    # auto from the (single-process) JAX topology
    assert resolve_worker_shard(0, -1) == (1, 0)
    with pytest.raises(ValueError, match="out of range"):
        resolve_worker_shard(2, 2)
    with pytest.raises(ValueError, match="out of range"):
        resolve_worker_shard(2, -3)


def test_per_image_pt_reference_naming_no_collisions(tmp_path):
    import torch

    data = str(tmp_path / "data")
    out = str(tmp_path / "latents")
    os.makedirs(data)
    # two classes with the SAME basename — must not collide
    _make_tree(data, n_per_class=1)
    n = generate_latents(data, out, encoder=_StubEncoder(), batch_size=4,
                         per_image_pt=True)
    assert n == 5
    pts = sorted(f for f in os.listdir(out) if f.endswith(".pt"))
    # reference naming: {cls}_{base}.pt (reference data/generate_latents.py:137)
    assert pts == [f"{cls}_im0.pt" for cls in sorted(CLASSES[:5])]
    rec = torch.load(os.path.join(out, "angry_im0.pt"),
                     weights_only=False)
    assert rec["latent"].shape == (18, 512)
    assert rec["label"] == 0
    assert rec["img_path"].endswith("im0.png")
