"""uint8 image packs (fer_vit_tpu/data/image_packs.py): the JPEG-free
serving input path (VERDICT r3 #1). Rebuild extension — the reference's
only input path is per-sample PIL decode in DataLoader workers
(reference: data/image_dataset.py:117-130)."""

import json

import numpy as np
import pytest
from PIL import Image

from fer_vit_tpu.data.image_packs import (
    MANIFEST,
    build_parser,
    iter_packed_batches,
    main as pack_main,
    read_manifest,
    write_image_pack,
)


def _write_images(tmp_path, n, size=32, seed=0):
    rng = np.random.default_rng(seed)
    paths, arrays = [], []
    for i in range(n):
        img = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        p = str(tmp_path / f"img_{i:03d}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
        arrays.append(img)
    return paths, np.stack(arrays)


def test_pack_roundtrip_lossless(tmp_path):
    """PNG at the native size decodes losslessly, so the packed bytes must
    equal the source pixels, across shard boundaries."""
    src = tmp_path / "src"
    src.mkdir()
    paths, expected = _write_images(src, 10)
    pack = str(tmp_path / "pack")
    manifest = write_image_pack(paths, pack, size=32, shard_size=4,
                                decode_batch_size=3)
    assert manifest["num_images"] == 10
    assert [s["n"] for s in manifest["shards"]] == [4, 4, 2]
    assert manifest["decode_ok"] == [True] * 10

    got, valid = [], []
    for imgs, k in iter_packed_batches(pack, batch_size=3):
        assert imgs.shape == (3, 32, 32, 3) and imgs.dtype == np.uint8
        got.append(imgs[:k])
        valid.append(k)
    assert valid == [3, 3, 3, 1]
    np.testing.assert_array_equal(np.concatenate(got), expected)


def test_pack_flags_corrupt_files(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    paths, _ = _write_images(src, 2)
    bad = str(src / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not a png")
    manifest = write_image_pack(paths + [bad], str(tmp_path / "pack"),
                                size=32)
    assert manifest["decode_ok"] == [True, True, False]


def test_read_manifest_validates(tmp_path):
    with pytest.raises(FileNotFoundError, match="image pack"):
        read_manifest(str(tmp_path))
    pack = tmp_path / "pack"
    pack.mkdir()
    with open(pack / MANIFEST, "w") as f:
        json.dump({"size": 32, "num_images": 5,
                   "shards": [{"file": "x.npy", "n": 3}]}, f)
    with pytest.raises(ValueError, match="corrupt pack"):
        read_manifest(str(pack))


def test_labels_length_checked(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    paths, _ = _write_images(src, 2)
    with pytest.raises(ValueError, match="labels"):
        write_image_pack(paths, str(tmp_path / "pack"), size=32, labels=[0])
    m = write_image_pack(paths, str(tmp_path / "pack2"), size=32,
                         labels=[3, 5])
    assert m["labels"] == [3, 5]


def test_pack_cli(tmp_path, capsys):
    src = tmp_path / "src"
    src.mkdir()
    _write_images(src, 5)
    out = str(tmp_path / "pack")
    args = build_parser().parse_args(
        ["--input", str(src), "--output", out, "--size", "32"])
    manifest = pack_main(args)
    assert manifest["num_images"] == 5
    assert "packed 5 images" in capsys.readouterr().out
    assert read_manifest(out)["size"] == 32
