"""Serving-layer tests (fer_vit_tpu/serve.py): Predictor routing and
padding, offline file prediction, dynamic request batching, and the HTTP
server end-to-end. Rebuild extension — the reference has no serving
surface (closest: reference scripts/measure_full_pipeline.py:17-45)."""

import io
import json
import os
import threading
import time
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fer_vit_tpu.encoders.psp import EncoderWrapper, PSpEncoder
from fer_vit_tpu.models import LatentViT
from fer_vit_tpu.serve import (
    Batcher,
    Predictor,
    QueueFullError,
    _collect_inputs,
    build_predict_parser,
    make_server,
    predict_main,
)

TINY_PLAN = ((64, 16, 1), (16, 32, 2), (32, 32, 2), (32, 64, 1))
MODEL_KW = dict(latent_dim=16, seq_len=18, embed_dim=32, depth=1, heads=2,
                mlp_dim=64, num_classes=7, dropout=0.0)


@pytest.fixture(scope="module")
def tiny_psp():
    enc = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                     n_styles=18, dtype=jnp.float32)
    return EncoderWrapper(encoder=enc, seed=0, fold_bn=False)


@pytest.fixture(scope="module")
def tiny_model():
    model = LatentViT(**MODEL_KW)
    variables = model.init(jax.random.key(1), jnp.zeros((1, 18, 16)))
    return model, variables


@pytest.fixture(scope="module")
def latent_predictor(tiny_psp, tiny_model):
    model, variables = tiny_model
    return Predictor(model, variables, psp=tiny_psp, batch_size=4)


def _images(n, size=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)


# -- Predictor: latent route ---------------------------------------------------


def test_predict_matches_manual_composition(latent_predictor, tiny_psp,
                                            tiny_model):
    model, variables = tiny_model
    images = _images(5)
    labels, probs = latent_predictor.predict(images)

    w = tiny_psp.encode_batch(images)
    logits = model.apply(variables, w)
    expected_probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    assert labels.shape == (5,)
    assert probs.shape == (5, 7)
    np.testing.assert_allclose(probs, expected_probs, atol=2e-5)
    np.testing.assert_array_equal(labels,
                                  np.asarray(jnp.argmax(logits, axis=-1)))


def test_padding_invariance_across_batch_sizes(tiny_psp, tiny_model):
    """N not a multiple of the compiled batch gives the same answers."""
    model, variables = tiny_model
    images = _images(5, seed=3)
    outs = []
    for bs in (4, 5, 8):
        p = Predictor(model, variables, psp=tiny_psp, batch_size=bs)
        outs.append(p.predict(images))
    for labels, probs in outs[1:]:
        np.testing.assert_array_equal(labels, outs[0][0])
        np.testing.assert_allclose(probs, outs[0][1], atol=2e-5)


def test_pipeline_depth_invariance(tiny_psp, tiny_model):
    """Pipelined async dispatch (depth > 1) must return exactly the
    per-chunk-synchronous (depth=1) answers, across many chunks and a
    ragged tail — the ordering is carried by the in-flight deque."""
    model, variables = tiny_model
    images = _images(11, seed=5)  # batch 4 → 2 full chunks + ragged 3
    outs = []
    for depth in (1, 2, 4):
        p = Predictor(model, variables, psp=tiny_psp, batch_size=4,
                      pipeline_depth=depth)
        outs.append(p.predict(images))
    for labels, probs in outs[1:]:
        np.testing.assert_array_equal(labels, outs[0][0])
        np.testing.assert_allclose(probs, outs[0][1], atol=2e-5)
    with pytest.raises(ValueError, match="pipeline_depth"):
        Predictor(model, variables, psp=tiny_psp, pipeline_depth=0)


def test_predict_single_image_and_bad_shapes(latent_predictor):
    labels, probs = latent_predictor.predict(_images(1)[0])  # (S, S, 3)
    assert labels.shape == (1,) and probs.shape == (1, 7)
    with pytest.raises(ValueError):
        latent_predictor.predict(np.zeros((2, 32, 32), np.uint8))
    # a valid-but-empty batch returns empty outputs, not a crash
    labels0, probs0 = latent_predictor.predict(
        np.zeros((0, 32, 32, 3), np.uint8))
    assert labels0.shape == (0,) and probs0.shape == (0, 7)


def test_predict_files_matches_array_predict(latent_predictor, tmp_path):
    from PIL import Image

    images = _images(6, seed=5)
    paths = []
    for i, img in enumerate(images):
        p = str(tmp_path / f"img_{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    labels_f, probs_f = latent_predictor.predict_files(paths)
    labels_a, probs_a = latent_predictor.predict(images)
    # PNG roundtrip at the native size is lossless, so the decode route
    # must reproduce the array route exactly (up to jit-order noise)
    np.testing.assert_array_equal(labels_f, labels_a)
    np.testing.assert_allclose(probs_f, probs_a, atol=2e-5)

    empty_labels, empty_probs = latent_predictor.predict_files([])
    assert empty_labels.shape == (0,) and empty_probs.shape == (0, 7)


def test_latent_route_rejects_input_size_mismatch(tiny_psp, tiny_model):
    """ADVICE r3: a caller-supplied input_size != encoder input size would
    silently double-resample (host decode to input_size, device resize to
    enc.input_size) — it must be rejected instead."""
    model, variables = tiny_model
    with pytest.raises(ValueError, match="input_size"):
        Predictor(model, variables, psp=tiny_psp, batch_size=4,
                  input_size=64)
    p = Predictor(model, variables, psp=tiny_psp, batch_size=4,
                  input_size=32)  # matching value is fine
    assert p.input_size == 32


def test_predict_files_flags_decode_failures(latent_predictor, tmp_path):
    """ADVICE r3: fervit-predict must not emit confident-looking garbage
    for an undecodable file with no flag in the output."""
    from PIL import Image

    images = _images(3, seed=19)
    paths = []
    for i, img in enumerate(images):
        p = str(tmp_path / f"ok_{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"definitely not a png")
    paths.insert(1, bad)

    labels, probs, ok = latent_predictor.predict_files(
        paths, return_decode_ok=True)
    assert labels.shape == (4,) and probs.shape == (4, 7)
    assert ok.tolist() == [True, False, True, True]

    # default 2-tuple API unchanged
    labels2, probs2 = latent_predictor.predict_files(paths)
    np.testing.assert_array_equal(labels, labels2)

    out = latent_predictor.predict_files([], return_decode_ok=True)
    assert len(out) == 3 and out[2].shape == (0,)


def test_predict_packed_matches_array_predict(latent_predictor, tmp_path):
    """The JPEG-free packed input path (VERDICT r3 #1) must reproduce the
    array route exactly (PNG→pack roundtrip at native size is lossless),
    including the padded final batch, and must reject a size mismatch."""
    from PIL import Image

    from fer_vit_tpu.data.image_packs import write_image_pack

    images = _images(6, seed=29)
    src = tmp_path / "src"
    src.mkdir()
    paths = []
    for i, img in enumerate(images):
        p = str(src / f"{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    pack = str(tmp_path / "pack")
    write_image_pack(paths, pack, size=32, shard_size=4)

    labels_p, probs_p = latent_predictor.predict_packed(pack)
    labels_a, probs_a = latent_predictor.predict(images)
    np.testing.assert_array_equal(labels_p, labels_a)
    np.testing.assert_allclose(probs_p, probs_a, atol=2e-5)

    bad = str(tmp_path / "pack64")
    write_image_pack(paths, bad, size=64)
    with pytest.raises(ValueError, match="repack"):
        latent_predictor.predict_packed(bad)


def test_pipeline_depth_invariance_on_file_and_packed_routes(
        latent_predictor, tmp_path):
    """The file and packed routes share _run_pipelined with predict();
    their answers must be depth-invariant too, and mutating
    pipeline_depth on a live Predictor must take effect per call
    (scripts/measure_pipeline_depth.py relies on exactly that)."""
    from PIL import Image

    from fer_vit_tpu.data.image_packs import write_image_pack

    images = _images(11, seed=37)  # batch 4 → 2 full chunks + ragged 3
    src = tmp_path / "src"
    src.mkdir()
    paths = []
    for i, img in enumerate(images):
        p = str(src / f"{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    pack = str(tmp_path / "pack")
    write_image_pack(paths, pack, size=32, shard_size=4)

    baseline = latent_predictor.predict(images)
    orig_depth = latent_predictor.pipeline_depth
    try:
        for depth in (1, 3):
            latent_predictor.pipeline_depth = depth
            for labels, probs in (latent_predictor.predict_files(paths),
                                  latent_predictor.predict_packed(pack)):
                np.testing.assert_array_equal(labels, baseline[0])
                np.testing.assert_allclose(probs, baseline[1], atol=2e-5)
    finally:
        latent_predictor.pipeline_depth = orig_depth


# -- Predictor: checkpoint construction ----------------------------------------


def _write_checkpoint(tmp_path, model, model_cfg, sample, name):
    from fer_vit_tpu.train.harness import Harness, TrainConfig
    from fer_vit_tpu.utils.experiment_logger import ExperimentLogger

    h = Harness(model=model, cfg=TrainConfig(epochs=1, batch_size=4,
                                             mixup=0.0))
    state = h.init_state(jax.random.key(0), sample)
    logger = ExperimentLogger(name, base_dir=str(tmp_path))
    logger.log_config({"model": model_cfg, "training": {}})
    logger.save_checkpoint(state, 1, {"f1_macro": 0.1}, is_best=True)
    logger.close()
    return (os.path.join(logger.run_dir, "checkpoints", "best_model.pt"),
            state)


def test_from_checkpoint_latent_route(tmp_path, tiny_psp):
    model = LatentViT(**MODEL_KW)
    ckpt, state = _write_checkpoint(tmp_path, model, dict(MODEL_KW),
                                    jnp.zeros((1, 18, 16)), "serve_latent")
    predictor = Predictor.from_checkpoint(ckpt, psp=tiny_psp, batch_size=4)
    assert predictor.describe()["route"] == "latent"

    images = _images(3, seed=7)
    labels, probs = predictor.predict(images)
    direct = Predictor(model, {"params": state.params}, psp=tiny_psp,
                       batch_size=4)
    labels_d, probs_d = direct.predict(images)
    np.testing.assert_array_equal(labels, labels_d)
    np.testing.assert_allclose(probs, probs_d, atol=2e-5)

    with pytest.raises(ValueError, match="pSp"):
        Predictor.from_checkpoint(ckpt)


IMAGE_CFG = dict(img_size=32, patch_size=8, embed_dim=32, depth=1, heads=2,
                 mlp_dim=64, num_classes=7, dropout=0.0)


@pytest.fixture(scope="module")
def image_checkpoint(tmp_path_factory):
    from fer_vit_tpu.eval.evaluate_image_vit import model_from_config

    tmp = tmp_path_factory.mktemp("serve_image_ckpt")
    model = model_from_config(dict(IMAGE_CFG))
    ckpt, _ = _write_checkpoint(tmp, model, dict(IMAGE_CFG),
                                jnp.zeros((1, 32, 32, 3)), "serve_image")
    return ckpt


def test_from_checkpoint_image_route(image_checkpoint):
    predictor = Predictor.from_checkpoint(image_checkpoint, batch_size=4)
    d = predictor.describe()
    assert d["route"] == "image" and d["input_size"] == 32

    images = _images(5, seed=11)
    labels, probs = predictor.predict(images)
    assert labels.shape == (5,) and probs.shape == (5, 7)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)

    # the uint8/float input-scale heuristic: 0-255 floats == uint8
    labels_f, probs_f = predictor.predict(images.astype(np.float32))
    np.testing.assert_array_equal(labels, labels_f)
    np.testing.assert_allclose(probs, probs_f, atol=2e-5)


# -- dynamic batching -----------------------------------------------------------


class _FakePredictor:
    """Records per-call batch sizes; 'label' = image[0,0,0]."""

    input_size = 8
    batch_size = 16
    num_classes = 7

    def __init__(self, delay=0.0):
        self.calls = []
        self.delay = delay

    def predict(self, images):
        self.calls.append(len(images))
        if self.delay:
            time.sleep(self.delay)
        labels = np.asarray([int(img[0, 0, 0]) % 7 for img in images])
        probs = np.eye(7, dtype=np.float32)[labels]
        return labels, probs


def test_batcher_coalesces_concurrent_requests():
    fake = _FakePredictor(delay=0.3)
    batcher = Batcher(fake, max_batch=8, max_wait_ms=50.0)
    try:
        results = {}

        def call(i):
            img = np.full((8, 8, 3), i, np.uint8)
            results[i] = batcher.submit(img, timeout=10.0)

        threads = [threading.Thread(target=call, args=(0,))]
        threads[0].start()
        time.sleep(0.1)  # first request is now mid-predict (0.3s sleep)
        for i in range(1, 4):
            threads.append(threading.Thread(target=call, args=(i,)))
            threads[-1].start()
        for t in threads:
            t.join(timeout=15)
        for i in range(4):
            assert results[i]["label"] == i % 7
            assert results[i]["label_name"]
        assert sum(fake.calls) == 4
        # requests 1-3 queued while the first ran → coalesced afterwards
        assert len(fake.calls) <= 3
    finally:
        batcher.close()


def test_batcher_propagates_predictor_errors():
    class BoomOnce(_FakePredictor):
        def predict(self, images):
            if not self.calls:
                self.calls.append(len(images))
                raise RuntimeError("kaboom")
            return _FakePredictor.predict(self, images)

    batcher = Batcher(BoomOnce(), max_wait_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="kaboom"):
            batcher.submit(np.zeros((8, 8, 3), np.uint8), timeout=10.0)
        # the loop keeps serving after an error
        ok = batcher.submit(np.full((8, 8, 3), 3, np.uint8), timeout=10.0)
        assert ok["label"] == 3
    finally:
        batcher.close()
    with pytest.raises(RuntimeError, match="closed"):
        batcher.submit(np.zeros((8, 8, 3), np.uint8))


def test_batcher_rejects_bad_shape_individually():
    """ADVICE r3: one malformed direct-API submit must not poison the
    whole coalesced batch via np.stack."""
    fake = _FakePredictor()
    batcher = Batcher(fake, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="expected"):
            batcher.submit(np.zeros((4, 4, 3), np.uint8))
        assert not fake.calls  # rejected before it ever reached a batch
        ok = batcher.submit(np.full((8, 8, 3), 2, np.uint8), timeout=10.0)
        assert ok["label"] == 2
    finally:
        batcher.close()


def test_batcher_submit_timeout_configurable():
    """ADVICE r3: the per-request timeout is a constructor parameter (and
    the default when submit() is called without one)."""
    fake = _FakePredictor(delay=0.5)
    batcher = Batcher(fake, max_batch=1, submit_timeout=0.05)
    try:
        assert batcher.submit_timeout == 0.05
        with pytest.raises(TimeoutError):
            batcher.submit(np.zeros((8, 8, 3), np.uint8))
    finally:
        batcher.close()


def test_batcher_sheds_load_when_queue_full():
    """VERDICT r3 #6: bounded pending queue — beyond max_queue, submit
    raises QueueFullError instead of growing latency without bound."""
    fake = _FakePredictor(delay=1.0)
    batcher = Batcher(fake, max_batch=1, max_wait_ms=0.0, max_queue=2)
    try:
        results, errors = [], []

        def call():
            try:
                results.append(batcher.submit(
                    np.zeros((8, 8, 3), np.uint8), timeout=30.0))
            except Exception as e:  # pragma: no cover - failure path
                errors.append(e)

        t0 = threading.Thread(target=call)
        t0.start()
        deadline = time.monotonic() + 10
        while not fake.calls and time.monotonic() < deadline:
            time.sleep(0.01)  # wait until the loop is inside predict()
        assert fake.calls, "batcher loop never picked up the first request"

        waiters = [threading.Thread(target=call) for _ in range(2)]
        for t in waiters:
            t.start()
        deadline = time.monotonic() + 5
        while batcher._q.qsize() < 2 and time.monotonic() < deadline:
            time.sleep(0.01)  # both queued behind the in-flight request
        with pytest.raises(QueueFullError):
            batcher.submit(np.zeros((8, 8, 3), np.uint8), timeout=1.0)

        t0.join(timeout=15)
        for t in waiters:
            t.join(timeout=15)
        assert len(results) == 3 and not errors
    finally:
        batcher.close()


# -- HTTP server -----------------------------------------------------------------


def _png_bytes(img):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def server(latent_predictor):
    srv = make_server(latent_predictor, host="127.0.0.1", port=0,
                      max_wait_ms=20.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()
    srv.batcher.close()
    srv.server_close()
    thread.join(timeout=5)


def _url(srv, path):
    return f"http://127.0.0.1:{srv.server_port}{path}"


def test_server_healthz(server, latent_predictor):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        body = json.loads(r.read())
    assert body["ok"] is True
    assert body["model"] == latent_predictor.describe()


def test_server_predict_end_to_end(server, latent_predictor):
    images = _images(3, seed=13)
    expected_labels, expected_probs = latent_predictor.predict(images)

    results = [None] * 3
    errors = []

    def post(i):
        req = urllib.request.Request(
            _url(server, "/predict"), data=_png_bytes(images[i]),
            headers={"Content-Type": "image/png"})
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                results[i] = json.loads(r.read())
        except Exception as e:  # surfaced below
            errors.append((i, e))

    threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=90)
    assert not errors, errors
    for i in range(3):
        assert results[i]["label"] == int(expected_labels[i])
        np.testing.assert_allclose(np.asarray(results[i]["probs"]),
                                   expected_probs[i], atol=1e-4)


def test_server_error_routes(server):
    # undecodable image → 400
    req = urllib.request.Request(_url(server, "/predict"),
                                 data=b"not an image")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # unknown route → 404
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(_url(server, "/nope"), timeout=30)
    assert e.value.code == 404
    # empty body → 400
    req = urllib.request.Request(_url(server, "/predict"), data=b"")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # oversized Content-Length → 413 before the body is buffered
    from fer_vit_tpu.serve import MAX_REQUEST_BYTES

    req = urllib.request.Request(
        _url(server, "/predict"), data=b"x",
        headers={"Content-Length": str(MAX_REQUEST_BYTES + 1)})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 413


def test_server_predict_batch_route(server, latent_predictor):
    """POST /predict_batch with one .npy payload == one device call ==
    predictor.predict on the same array; malformed payloads get 400."""
    images = _images(5, seed=37)
    expected_labels, expected_probs = latent_predictor.predict(images)

    buf = io.BytesIO()
    np.save(buf, images)
    req = urllib.request.Request(_url(server, "/predict_batch"),
                                 data=buf.getvalue())
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read())
    preds = body["predictions"]
    assert [p["label"] for p in preds] == [int(l) for l in expected_labels]
    np.testing.assert_allclose(
        np.asarray([p["probs"] for p in preds]), expected_probs, atol=1e-4)

    # wrong shape → 400 (not a poisoned batch)
    buf = io.BytesIO()
    np.save(buf, _images(2, size=16))
    req = urllib.request.Request(_url(server, "/predict_batch"),
                                 data=buf.getvalue())
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # not npy → 400
    req = urllib.request.Request(_url(server, "/predict_batch"),
                                 data=b"garbage")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_server_sheds_load_with_429():
    """VERDICT r3 #6: overload → 429 (with Retry-After), not unbounded
    queueing; admitted requests still succeed."""
    fake = _FakePredictor(delay=0.4)
    srv = make_server(fake, host="127.0.0.1", port=0, max_batch=1,
                      max_wait_ms=0.0, max_queue=1)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        assert srv.batcher.max_queue == 1  # plumbed through make_server
        img = _png_bytes(np.zeros((8, 8, 3), np.uint8))
        codes, lock = [], threading.Lock()

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.server_port}/predict", data=img)
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    code, retry = r.status, None
            except urllib.error.HTTPError as e:
                code, retry = e.code, e.headers.get("Retry-After")
            with lock:
                codes.append((code, retry))

        clients = [threading.Thread(target=post) for _ in range(8)]
        for t in clients:
            t.start()
        for t in clients:
            t.join(timeout=90)
        got = [c for c, _ in codes]
        assert len(got) == 8
        assert got.count(200) >= 1, codes
        assert got.count(429) >= 1, codes  # load was actually shed
        assert set(got) <= {200, 429}, codes
        for code, retry in codes:
            if code == 429:
                assert retry == "1"
    finally:
        srv.shutdown()
        srv.batcher.close()
        srv.server_close()
        thread.join(timeout=5)


def test_server_submit_timeout_plumbed():
    fake = _FakePredictor()
    srv = make_server(fake, host="127.0.0.1", port=0, submit_timeout=12.5,
                      max_queue=5)
    try:
        assert srv.batcher.submit_timeout == 12.5
        assert srv.batcher.max_queue == 5
    finally:
        srv.batcher.close()
        srv.server_close()


def test_server_concurrent_latency_distribution(server, latent_predictor):
    """VERDICT r3 #6: drive the server with concurrent clients and check
    every request completes; the p50/p99 protocol here is the same one
    scripts/measure_full_pipeline.py --serving-latency reports on TPU."""
    latent_predictor.warmup()
    images = _images(4, seed=23)
    latencies, errors = [], []
    lock = threading.Lock()

    def client(i):
        for j in range(2):
            body = _png_bytes(images[(i + j) % 4])
            req = urllib.request.Request(_url(server, "/predict"),
                                         data=body)
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    json.loads(r.read())
            except Exception as e:  # pragma: no cover - failure path
                with lock:
                    errors.append(e)
                return
            with lock:
                latencies.append(time.perf_counter() - t0)

    clients = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in clients:
        t.start()
    for t in clients:
        t.join(timeout=300)
    assert not errors, errors
    assert len(latencies) == 12
    p50, p99 = np.percentile(latencies, [50, 99])
    assert p99 < 120.0  # sanity; real numbers come from the TPU harness
    assert p50 <= p99


# -- CLI ---------------------------------------------------------------------------


def test_collect_inputs(tmp_path):
    from PIL import Image

    (tmp_path / "sub").mkdir()
    img = _images(1)[0]
    Image.fromarray(img).save(str(tmp_path / "b.png"))
    Image.fromarray(img).save(str(tmp_path / "sub" / "a.jpg"))
    (tmp_path / "notes.txt").write_text("skip me")

    got = _collect_inputs([str(tmp_path)])
    assert [os.path.basename(p) for p in got] == ["b.png", "a.jpg"]
    # explicit file + duplicate dir entry dedups, order preserved
    got2 = _collect_inputs([str(tmp_path / "sub" / "a.jpg"), str(tmp_path)])
    assert [os.path.basename(p) for p in got2] == ["a.jpg", "b.png"]
    with pytest.raises(FileNotFoundError):
        _collect_inputs([str(tmp_path / "missing.png")])


def test_predict_cli_reports_decode_failures(image_checkpoint, tmp_path):
    """ADVICE r3: the prediction report flags undecodable files instead of
    silently emitting a confident-looking row for a black-filled image."""
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(_images(1)[0]).save(str(img_dir / "good.png"))
    (img_dir / "bad.png").write_bytes(b"nope")

    out = tmp_path / "preds.json"
    args = build_predict_parser().parse_args([
        "--checkpoint_path", image_checkpoint,
        "--input", str(img_dir), "--output", str(out), "--batch_size", "4",
    ])
    report = predict_main(args)
    by_name = {os.path.basename(p["path"]): p for p in report["predictions"]}
    assert by_name["good.png"]["decode_ok"] is True
    assert by_name["bad.png"]["decode_ok"] is False
    assert ([os.path.basename(p) for p in report["decode_failures"]]
            == ["bad.png"])


def test_predict_cli_packed_route(image_checkpoint, tmp_path):
    """fervit-predict --packed must give the same report rows as --input
    over the same files (PNG/pack roundtrip is lossless)."""
    from PIL import Image

    from fer_vit_tpu.data.image_packs import write_image_pack

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images = _images(5, seed=31)
    paths = []
    for i, img in enumerate(images):
        p = str(img_dir / f"{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    pack = str(tmp_path / "pack")
    write_image_pack(paths, pack, size=32)

    args_files = build_predict_parser().parse_args([
        "--checkpoint_path", image_checkpoint,
        "--input", str(img_dir), "--batch_size", "4",
        "--output", str(tmp_path / "a.json")])
    args_packed = build_predict_parser().parse_args([
        "--checkpoint_path", image_checkpoint,
        "--packed", pack, "--batch_size", "4",
        "--output", str(tmp_path / "b.json")])
    rep_files = predict_main(args_files)
    rep_packed = predict_main(args_packed)
    assert ([p["label"] for p in rep_packed["predictions"]]
            == [p["label"] for p in rep_files["predictions"]])
    assert all(p["decode_ok"] for p in rep_packed["predictions"])

    # exactly one of --input / --packed
    with pytest.raises(SystemExit, match="exactly one"):
        predict_main(build_predict_parser().parse_args(
            ["--checkpoint_path", image_checkpoint]))
    with pytest.raises(SystemExit, match="exactly one"):
        predict_main(build_predict_parser().parse_args(
            ["--checkpoint_path", image_checkpoint,
             "--input", str(img_dir), "--packed", pack]))


def test_predict_cli_image_route(image_checkpoint, tmp_path):
    from PIL import Image

    images = _images(5, seed=17)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i, img in enumerate(images):
        Image.fromarray(img).save(str(img_dir / f"{i}.png"))

    out = tmp_path / "preds.json"
    args = build_predict_parser().parse_args([
        "--checkpoint_path", image_checkpoint,
        "--input", str(img_dir),
        "--output", str(out),
        "--batch_size", "4", "--top_k", "3",
    ])
    report = predict_main(args)
    assert report["num_images"] == 5
    on_disk = json.loads(out.read_text())
    assert on_disk["predictions"] == report["predictions"]
    for pred in report["predictions"]:
        assert len(pred["top_k"]) == 3
        assert pred["top_k"][0]["label"] == pred["label"]
        probs = [t["prob"] for t in pred["top_k"]]
        assert probs == sorted(probs, reverse=True)
        assert pred["label_name"]
