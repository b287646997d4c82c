"""Production inference: offline batch prediction + HTTP serving.

Rebuild extension — the reference ships no serving surface; its closest
analogues are the latency protocol (reference:
scripts/measure_full_pipeline.py:17-45) and the offline evaluators
(reference: eval/evaluate_model.py, eval/evaluate_image_vit.py), which
require pre-generated latents / labeled directory trees. This module
turns the compiled pipelines into a deployable inference surface:

- :class:`Predictor` — ONE jitted static-shape function
  ``(B, S, S, 3) images → (labels, probs)``. Latent checkpoints run
  preprocess → pSp encode → classify fused into a single XLA program
  (bf16 trunk on TPU); image checkpoints (ImageViT) run
  normalize → forward. Checkpoint routing/loading reuses the
  checkpoint-polymorphic loader (both this framework's msgpack files and
  reference-format torch ``.pt`` via ``fer_vit_tpu.interop``). Arbitrary
  request counts are padded to the compiled batch so the chip never
  recompiles.
- ``fervit-predict`` — offline CLI: image files/dirs → JSON predictions;
  native C++ batch decode with background prefetch (double-buffered
  feed, same machinery as ``generate_latents``).
- ``fervit-serve`` — stdlib ``ThreadingHTTPServer`` with dynamic request
  batching: concurrent ``POST /predict`` requests are coalesced (up to
  ``--max_batch`` / ``--max_wait_ms``) onto the static-shape compiled
  function, so independent clients still feed the MXU full batches.

On TPU backends the hot jits compile with the tuned compiler options
(measured +3.7 % end-to-end — ``fer_vit_tpu.utils.compile_opts``);
override or disable with the ``FERVIT_COMPILER_OPTIONS`` env var.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import queue
import threading
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fer_vit_tpu import EMOTION_NAMES
from fer_vit_tpu.utils.compile_opts import (
    resolve_compiler_options as _compiler_options,
)

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _label_name(label: int) -> str:
    return (EMOTION_NAMES[label] if 0 <= label < len(EMOTION_NAMES)
            else str(label))


class Predictor:
    """End-to-end FER inference behind one jitted static-shape function.

    Build directly (``Predictor(model, variables, psp=...)``) or from a
    checkpoint file (:meth:`from_checkpoint`). ``psp`` is required for
    latent-space checkpoints (LatentViT/v2/CNN/Hybrid) and must be an
    :class:`fer_vit_tpu.encoders.psp.EncoderWrapper`; image checkpoints
    (ImageViT) take the image route and need no encoder.
    """

    def __init__(self, model, variables, *, psp=None,
                 batch_size: int = 64, image_route: bool = False,
                 input_size: Optional[int] = None, mesh=None,
                 pipeline_depth: int = 2):
        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        if pipeline_depth < 1:
            raise ValueError(
                f"pipeline_depth must be >= 1, got {pipeline_depth}")
        self.model = model
        self._model_name = type(model).__name__
        self._input_dtypes = None  # set by from_exported: pinned dtypes
        self.batch_size = int(batch_size)
        # multi-chunk predict() keeps up to this many async dispatches in
        # flight (each holds one input batch on device — ~50 MB at
        # 64×256²×3 f32); 2 = double buffering, the decode-feed default
        self.pipeline_depth = int(pipeline_depth)
        self.image_route = bool(image_route)
        self.num_classes = int(getattr(model, "num_classes",
                                       len(EMOTION_NAMES)))
        # multi-chip serving: params replicated, request batches sharded
        # over the mesh's data axis — per-image inference has no cross-image
        # communication, so DP sharding is the whole scaling story
        # (tests/test_multichip.py proves ≥95% per-device FLOP scaling for
        # the pSp→LatentViT pipeline)
        self.mesh = mesh
        if mesh is not None:
            from fer_vit_tpu.core.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            if self.batch_size % n_data != 0:
                raise ValueError(
                    f"batch_size ({self.batch_size}) must be a multiple of "
                    f"the mesh data axis ({n_data}) for even sharding")

        if image_route:
            from fer_vit_tpu.data.image_pipeline import normalize_images
            from fer_vit_tpu.encoders.psp import to_unit_floats

            size = int(input_size or getattr(model, "img_size", 224))

            def fn(cls_vars, images):
                logits = model.apply(cls_vars, normalize_images(
                    to_unit_floats(images), out_size=size, already_01=True))
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                return jnp.argmax(logits, axis=-1), probs

            self._fn = jax.jit(fn, compiler_options=_compiler_options())
            self._fn_args = (variables,)
        else:
            if psp is None:
                raise ValueError(
                    "latent checkpoints need a pSp encoder: pass "
                    "psp=EncoderWrapper(...) or use from_checkpoint("
                    "psp_weights=<converted .npz>)")
            from fer_vit_tpu.encoders.psp import preprocess_images

            enc = psp.encoder
            if input_size is not None and int(input_size) != enc.input_size:
                # preprocess_images always resizes to the encoder's size, so
                # honoring a different input_size here would mean a silent
                # double resample (host decode to input_size, then device
                # resize to enc.input_size) — reject it instead, matching
                # the strictness of the ImageViT --img_size guard.
                raise ValueError(
                    f"latent route: input_size ({input_size}) must equal "
                    f"the pSp encoder's input size ({enc.input_size})")
            size = enc.input_size

            def fn(enc_vars, cls_vars, images):
                x = preprocess_images(images, size=enc.input_size)
                w = enc.apply(enc_vars, x)
                logits = model.apply(cls_vars, w)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                return jnp.argmax(logits, axis=-1), probs

            self._fn = jax.jit(fn, compiler_options=_compiler_options())
            self._fn_args = (psp.variables, variables)
        self.input_size = size
        if mesh is not None:
            from fer_vit_tpu.core.mesh import replicated

            self._fn_args = tuple(
                jax.device_put(a, replicated(mesh)) for a in self._fn_args)

    # -- construction ------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, checkpoint_path: str, *,
                        psp_weights: Optional[str] = None, psp=None,
                        batch_size: int = 64, mesh=None,
                        dtype=jnp.bfloat16,
                        pipeline_depth: int = 2) -> "Predictor":
        """Load any FER checkpoint (ours or reference-format torch) and
        route it: image configs → image route, latent configs → pSp route
        (``psp_weights``: a converted encoder ``.npz``, see
        ``fer_vit_tpu/encoders/convert_psp.py``)."""
        from fer_vit_tpu.eval.evaluate_model import (
            is_image_config,
            load_model,
        )

        model, variables, config = load_model(checkpoint_path)
        model_config = (config.get("model", config)
                        if isinstance(config, dict) else {})
        image_route = is_image_config(model_config)
        if image_route:
            return cls(model, variables, batch_size=batch_size, mesh=mesh,
                       image_route=True,
                       input_size=model_config.get("img_size", 224),
                       pipeline_depth=pipeline_depth)
        if psp is None:
            if psp_weights is None:
                raise ValueError(
                    "this is a latent-space checkpoint; pass "
                    "psp_weights=<converted pSp .npz> (convert the torch "
                    "checkpoint via fer_vit_tpu/encoders/convert_psp.py)")
            from fer_vit_tpu.encoders.psp import EncoderWrapper

            psp = EncoderWrapper.from_npz(psp_weights, dtype=dtype)
        return cls(model, variables, psp=psp, batch_size=batch_size,
                   mesh=mesh, pipeline_depth=pipeline_depth)

    @classmethod
    def from_exported(cls, artifact_dir: str, *,
                      pipeline_depth: int = 2) -> "Predictor":
        """Load an AOT artifact (``fervit-export`` /
        :func:`fer_vit_tpu.export.export_predictor`) — the full pipeline
        reloads from serialized StableHLO + a weights file, with no model
        code, converters, or torch on the path. Batch size, input size,
        and the input-dtype set are pinned by the artifact; calls
        dispatch to the matching exported program per dtype, and
        unsupported dtypes are rejected loudly in :meth:`_put`.
        Single-device only (an exported module is a closed program): for
        multi-chip serving use ``from_checkpoint`` with a mesh."""
        from fer_vit_tpu.export import load_exported

        calls_by_dtype, weight_args, meta = load_exported(artifact_dir)
        self = cls.__new__(cls)
        self.model = None
        self._model_name = meta["model"]
        self._input_dtypes = tuple(calls_by_dtype)
        self.batch_size = int(meta["batch_size"])
        self.pipeline_depth = int(pipeline_depth)
        self.image_route = meta["route"] == "image"
        self.num_classes = int(meta["num_classes"])
        self.mesh = None

        def dispatch(*args):
            return calls_by_dtype[np.dtype(args[-1].dtype)](*args)

        self._fn = dispatch
        # msgpack_restore yields host (numpy) arrays; commit them to
        # device ONCE — leaving them host-side would re-upload every
        # weight on every call (jit does not cache numpy operands)
        self._fn_args = jax.device_put(weight_args)
        self.input_size = int(meta["input_size"])
        return self

    def describe(self) -> dict:
        return {
            "route": "image" if self.image_route else "latent",
            "model": self._model_name,
            "batch_size": self.batch_size,
            "input_size": self.input_size,
            "num_classes": self.num_classes,
            "mesh": (dict(self.mesh.shape) if self.mesh is not None
                     else None),
        }

    # -- inference ---------------------------------------------------------

    def predict(self, images) -> Tuple[np.ndarray, np.ndarray]:
        """(N, S, S, 3) images (uint8 0-255, or float 0-1 / 0-255) →
        (labels (N,), probs (N, C)). N is arbitrary: chunks are padded to
        the compiled batch size, so only the first call compiles."""
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        if images.ndim != 4 or images.shape[-1] != 3:
            raise ValueError(
                f"expected (N, H, W, 3) images, got {images.shape}")
        if len(images) == 0:
            return (np.zeros((0,), np.int32),
                    np.zeros((0, self.num_classes), np.float32))

        def chunks():
            for i in range(0, len(images), self.batch_size):
                chunk = images[i:i + self.batch_size]
                k = len(chunk)
                if k < self.batch_size:
                    pad = np.zeros((self.batch_size - k,) + chunk.shape[1:],
                                   chunk.dtype)
                    chunk = np.concatenate([chunk, pad])
                yield chunk, k

        return self._run_pipelined(chunks())

    def _run_pipelined(self, batch_iter) -> Tuple[np.ndarray, np.ndarray]:
        """Run ``(images, n_valid)`` batches through the jitted fn with up
        to ``pipeline_depth`` async dispatches in flight: jax dispatch
        returns before the device finishes, so the next batch's
        host→device transfer + compute overlaps the previous fetch (the
        same double-buffer discipline as the decode feed). Matters most
        through a remote-PJRT tunnel, where each synchronous round-trip
        costs ~0.7 s; the depth bound keeps at most depth+1 input batches
        resident on device (~50 MB each at 64×256²×3 f32)."""
        from collections import deque

        labels_out: List[np.ndarray] = []
        probs_out: List[np.ndarray] = []
        inflight: deque = deque()

        def drain_one() -> None:
            k0, l0, p0 = inflight.popleft()
            labels_out.append(np.asarray(l0[:k0]))
            probs_out.append(np.asarray(p0[:k0], np.float32))

        for imgs, k in batch_iter:
            labels, probs = self._fn(*self._fn_args, self._put(imgs))
            inflight.append((k, labels, probs))
            if len(inflight) > self.pipeline_depth:
                drain_one()
        while inflight:
            drain_one()
        if not labels_out:
            return (np.zeros((0,), np.int32),
                    np.zeros((0, self.num_classes), np.float32))
        return np.concatenate(labels_out), np.concatenate(probs_out)

    def _put(self, chunk: np.ndarray) -> jax.Array:
        if (self._input_dtypes is not None
                and chunk.dtype not in self._input_dtypes):
            # exported artifacts pin their input signatures; a silent
            # cast here could change values (float 0-1 vs uint8 0-255),
            # so reject instead and name the fix.
            raise ValueError(
                f"this exported predictor pins input dtypes "
                f"{[d.name for d in self._input_dtypes]}, got "
                f"{chunk.dtype}; re-export with --input_dtypes including "
                f"{chunk.dtype}, or feed a supported dtype")
        if self.mesh is None:
            return jnp.asarray(chunk)
        from fer_vit_tpu.core.mesh import batch_sharding

        return jax.device_put(chunk, batch_sharding(self.mesh, chunk.ndim))

    def predict_files(self, paths: Sequence[str], prefetch: int = 2,
                      return_decode_ok: bool = False):
        """Decode → predict with a double-buffered feed: the next batch
        decodes on a background thread (native C++ batch decoder when
        available, PIL otherwise) while the device runs the current one.

        ``return_decode_ok=True`` appends a bool array flagging files the
        decoder black-filled: both decode routes fall back to an all-zero
        image on a corrupt file (reference data/image_dataset.py:125-130
        behavior — fine for training loaders, misleading in a prediction
        CLI), so an all-black decoded image marks a failed decode."""
        from fer_vit_tpu.data.generate_latents import _decode_batches

        items = [(p, 0) for p in paths]
        ok_out: List[np.ndarray] = []

        def batches():
            for imgs, _labels, _paths, k in _decode_batches(
                    items, self.batch_size, self.input_size,
                    prefetch=prefetch):
                if return_decode_ok:
                    ok_out.append(imgs[:k].reshape(k, -1).any(axis=1))
                yield imgs, k

        out = self._run_pipelined(batches())
        if return_decode_ok:
            ok = (np.concatenate(ok_out) if ok_out
                  else np.zeros((0,), bool))
            return out + (ok,)
        return out

    def predict_packed(self, pack_dir: str,
                       prefetch: int = 2) -> Tuple[np.ndarray, np.ndarray]:
        """Predict from a pre-decoded uint8 image pack
        (:mod:`fer_vit_tpu.data.image_packs` — written once by
        ``fervit-pack-images``). This is the JPEG-free serving input
        path: batch assembly is a memory copy, so one feeder core
        sustains many chips where raw JPEG decode sustains ~1.5
        (feed-budget table: docs/SERVING.md)."""
        from fer_vit_tpu.data.image_packs import (iter_packed_batches,
                                                  read_manifest)

        manifest = read_manifest(pack_dir)
        if manifest["size"] != self.input_size:
            raise ValueError(
                f"pack decoded at {manifest['size']}px but this predictor "
                f"expects {self.input_size}px — repack with "
                f"--size {self.input_size}")
        return self._run_pipelined(
            iter_packed_batches(pack_dir, self.batch_size,
                                prefetch=prefetch))

    def warmup(self) -> None:
        """Compile the pipeline before serving traffic."""
        self.predict(np.zeros(
            (1, self.input_size, self.input_size, 3), np.uint8))


# -- dynamic request batching ------------------------------------------------


class _Request:
    __slots__ = ("image", "event", "result", "error")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.event = threading.Event()
        self.result: Optional[dict] = None
        self.error: Optional[Exception] = None


class QueueFullError(RuntimeError):
    """Raised by :meth:`Batcher.submit` when the pending-request queue is
    at its bound — the server maps it to HTTP 429 (load shedding)."""


class Batcher:
    """Coalesce concurrent single-image requests into device batches.

    A background thread blocks on the queue; on the first request it
    waits up to ``max_wait_ms`` (or until ``max_batch`` requests are
    queued) before running the predictor, so bursts ride one XLA call.

    Backpressure: at most ``max_queue`` requests may be pending (default
    ``8 × max_batch``); beyond that :meth:`submit` sheds load with
    :class:`QueueFullError` instead of growing the queue (and its
    latency) without bound. ``submit_timeout`` is the default per-request
    wall-clock bound — raise it for servers built without ``warmup()``,
    where the first request pays the XLA compile.
    """

    def __init__(self, predictor: Predictor, max_batch: Optional[int] = None,
                 max_wait_ms: float = 5.0, max_queue: Optional[int] = None,
                 submit_timeout: float = 30.0):
        self.predictor = predictor
        self.max_batch = int(max_batch or predictor.batch_size)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.max_queue = int(max_queue if max_queue is not None
                             else 8 * self.max_batch)
        if self.max_queue < 1:
            raise ValueError(f"max_queue must be >= 1, got {self.max_queue}")
        self.submit_timeout = float(submit_timeout)
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._stop = threading.Event()
        # serializes the closed-check+enqueue against close(), so a request
        # can never slip into the queue after the drain — without it a
        # submit racing close() would block its full timeout
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(
            target=self._loop, name="fervit-batcher", daemon=True)
        self._thread.start()

    def submit(self, image: np.ndarray,
               timeout: Optional[float] = None) -> dict:
        timeout = self.submit_timeout if timeout is None else timeout
        image = np.asarray(image)
        s = self.predictor.input_size
        if image.shape != (s, s, 3):
            # reject malformed direct-API submissions individually — inside
            # the batch loop a wrong shape would make np.stack raise and
            # fail every coalesced request, not just the offender
            raise ValueError(
                f"expected a ({s}, {s}, 3) image, got {image.shape}")
        req = _Request(image)
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("batcher is closed")
            if self._q.qsize() >= self.max_queue:
                raise QueueFullError(
                    f"request queue full ({self.max_queue} pending)")
            self._q.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError(f"inference did not finish in {timeout}s")
        if req.error is not None:
            raise req.error
        assert req.result is not None
        return req.result

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            if first is None:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    req = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if req is not None:
                    batch.append(req)
            try:
                images = np.stack([r.image for r in batch])
                labels, probs = self.predictor.predict(images)
            except Exception as e:  # report to every waiter, keep serving
                for r in batch:
                    r.error = e
                    r.event.set()
                continue
            for r, label, prob in zip(batch, labels, probs):
                r.result = {
                    "label": int(label),
                    "label_name": _label_name(int(label)),
                    "probs": [float(p) for p in prob],
                }
                r.event.set()

    def close(self) -> None:
        with self._submit_lock:
            self._stop.set()
            self._q.put(None)
        self._thread.join(timeout=5.0)
        # fail any request still queued when the loop exited, instead of
        # leaving its waiter to block out its timeout
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                req.error = RuntimeError("batcher is closed")
                req.event.set()


# -- HTTP server --------------------------------------------------------------


def _decode_request_image(body: bytes, size: int) -> np.ndarray:
    """Request bytes (any PIL-readable format) → (size, size, 3) uint8."""
    from PIL import Image

    with Image.open(io.BytesIO(body)) as im:
        im = im.convert("RGB").resize((size, size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


# request-body cap: encoded images are at most a few MB; anything larger
# is a mistake or a memory-exhaustion attempt and is rejected before the
# body is buffered
MAX_REQUEST_BYTES = 32 * 1024 * 1024


def make_server(predictor: Predictor, host: str = "127.0.0.1",
                port: int = 8000, max_batch: Optional[int] = None,
                max_wait_ms: float = 5.0, quiet: bool = True,
                max_queue: Optional[int] = None,
                submit_timeout: float = 30.0):
    """→ a ``ThreadingHTTPServer`` (``.batcher`` attached for shutdown).

    Routes: ``GET /healthz`` → model/device info; ``POST /predict`` with
    raw image bytes → ``{"label", "label_name", "probs"}``. More than
    ``max_queue`` pending requests → 429 (load shedding); a request older
    than ``submit_timeout`` seconds → 503. Call ``predictor.warmup()``
    before serving traffic (the CLI does), or raise ``submit_timeout``
    past the first-request XLA compile time.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    batcher = Batcher(predictor, max_batch=max_batch,
                      max_wait_ms=max_wait_ms, max_queue=max_queue,
                      submit_timeout=submit_timeout)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *fmt_args):  # noqa: N802
            if not quiet:
                BaseHTTPRequestHandler.log_message(self, fmt, *fmt_args)

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path in ("/healthz", "/health"):
                self._json(200, {
                    "ok": True,
                    "platform": jax.devices()[0].platform,
                    "model": predictor.describe(),
                })
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path == "/predict_batch":
                self._predict_batch()
                return
            if self.path != "/predict":
                self._json(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                length = 0
            if length <= 0:
                self._json(400, {"error": "empty body; POST image bytes"})
                return
            if length > MAX_REQUEST_BYTES:
                self._json(413, {"error": (
                    f"body too large ({length} bytes; "
                    f"max {MAX_REQUEST_BYTES})")})
                return
            body = self.rfile.read(length)
            try:
                image = _decode_request_image(body, predictor.input_size)
            except Exception as e:
                self._json(400, {"error": f"undecodable image: {e}"})
                return
            try:
                result = batcher.submit(image)
            except QueueFullError as e:
                self.send_response(429)
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Retry-After", "1")
                self.end_headers()
                self.wfile.write(body)
                return
            except TimeoutError as e:
                self._json(503, {"error": str(e)})
                return
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._json(200, result)

        def _predict_batch(self) -> None:
            """Bulk route: one ``.npy`` payload of (N, H, W, 3) uint8 →
            one device call → a JSON list. Per-image HTTP pays one
            host↔device round-trip per coalesced batch (~0.7 s through
            this image's TPU tunnel — SERVING_LATENCY.json), so bulk
            clients should ship whole arrays instead."""
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                length = 0
            if length <= 0 or length > MAX_REQUEST_BYTES:
                self._json(400 if length <= 0 else 413,
                           {"error": f"bad Content-Length {length} "
                                     f"(max {MAX_REQUEST_BYTES})"})
                return
            try:
                images = np.load(io.BytesIO(self.rfile.read(length)),
                                 allow_pickle=False)
            except Exception as e:
                self._json(400, {"error": f"not a .npy payload: {e}"})
                return
            s = predictor.input_size
            if (images.ndim != 4 or images.shape[1:] != (s, s, 3)
                    or images.dtype != np.uint8):
                self._json(400, {"error": (
                    f"expected uint8 (N, {s}, {s}, 3), got "
                    f"{images.dtype} {images.shape}")})
                return
            try:
                labels, probs = predictor.predict(images)
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._json(200, {"predictions": [
                {"label": int(l), "label_name": _label_name(int(l)),
                 "probs": [float(p) for p in pr]}
                for l, pr in zip(labels, probs)]})

    # stdlib default listen backlog is 5: a 32-client burst overflows the
    # accept queue and clients see ECONNRESET before the batcher can even
    # shed load (observed under the concurrent-latency harness) — raise it
    # past max_queue so backpressure is the 429 path, not kernel drops
    class _Server(ThreadingHTTPServer):
        request_queue_size = max(128, batcher.max_queue + batcher.max_batch)

    server = _Server((host, port), Handler)
    server.batcher = batcher
    return server


# -- CLIs ----------------------------------------------------------------------


def _collect_inputs(inputs: Sequence[str]) -> List[str]:
    """Files and/or directories (recursive) → ordered unique image paths."""
    out: List[str] = []
    seen = set()

    def add(path: str) -> None:
        if path not in seen:
            seen.add(path)
            out.append(path)

    for item in inputs:
        if os.path.isdir(item):
            for root, dirs, files in os.walk(item):
                dirs.sort()  # deterministic traversal across filesystems
                for name in sorted(files):
                    if name.lower().endswith(IMG_EXTS):
                        add(os.path.join(root, name))
        elif os.path.isfile(item):
            add(item)
        else:
            raise FileNotFoundError(f"--input entry not found: {item}")
    return out


def build_predict_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Offline batch FER prediction over image files")
    p.add_argument("--checkpoint_path", default=None,
                   help="FER checkpoint (ours or reference-format torch); "
                        "mutually exclusive with --exported")
    p.add_argument("--exported", default=None,
                   help="AOT artifact directory (fervit-export) — reloads "
                        "the compiled pipeline without model code; "
                        "mutually exclusive with --checkpoint_path")
    p.add_argument("--input", default=None, nargs="+",
                   help="image files and/or directories (recursive)")
    p.add_argument("--packed", default=None,
                   help="pre-decoded uint8 image pack directory "
                        "(fervit-pack-images) — the JPEG-free input path; "
                        "mutually exclusive with --input")
    p.add_argument("--output", default=None,
                   help="write predictions JSON here (default: stdout)")
    p.add_argument("--psp_weights", default=None,
                   help="converted pSp encoder .npz (required for "
                        "latent-space checkpoints)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--top_k", type=int, default=1)
    p.add_argument("--pipeline_depth", type=int, default=2,
                   help="async device dispatches kept in flight "
                        "(overlaps transfer+compute with fetch; 1 = "
                        "minimal overlap: one dispatch stays in flight "
                        "while the next is issued)")
    _add_dp_flag(p)
    return p


def _add_dp_flag(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dp_devices", type=int, default=1,
                   help="shard request batches over this many devices "
                        "(data-parallel; -1 = all devices, 1 = no mesh)")


def _mesh_from_flag(dp_devices: int):
    if dp_devices == 1:
        return None
    if dp_devices < 1 and dp_devices != -1:
        raise SystemExit(
            f"--dp_devices must be a positive device count or -1 (all "
            f"devices), got {dp_devices}")
    from fer_vit_tpu.core.mesh import MeshConfig, make_mesh

    n = len(jax.devices()) if dp_devices == -1 else dp_devices
    return make_mesh(MeshConfig(data=n, model=1))


def _predictor_from_args(args) -> "Predictor":
    exported = getattr(args, "exported", None)
    if (args.checkpoint_path is None) == (exported is None):
        raise SystemExit(
            "pass exactly one of --checkpoint_path or --exported")
    if exported is not None:
        if getattr(args, "dp_devices", 1) != 1:
            raise SystemExit(
                "--exported is a closed single-device program and cannot "
                "shard over --dp_devices; use --checkpoint_path for "
                "multi-chip serving")
        return Predictor.from_exported(
            exported, pipeline_depth=getattr(args, "pipeline_depth", 2))
    return Predictor.from_checkpoint(
        args.checkpoint_path, psp_weights=args.psp_weights,
        batch_size=args.batch_size, mesh=_mesh_from_flag(args.dp_devices),
        pipeline_depth=getattr(args, "pipeline_depth", 2))


def predict_main(args) -> dict:
    if (args.input is None) == (getattr(args, "packed", None) is None):
        raise SystemExit("pass exactly one of --input or --packed")
    predictor = _predictor_from_args(args)
    if args.packed is not None:
        from fer_vit_tpu.data.image_packs import read_manifest

        manifest = read_manifest(args.packed)
        paths = manifest["paths"]
        decode_ok = np.asarray(manifest["decode_ok"], bool)
        labels, probs = predictor.predict_packed(args.packed)
    else:
        paths = _collect_inputs(args.input)
        if not paths:
            raise SystemExit("no images found under --input")
        labels, probs, decode_ok = predictor.predict_files(
            paths, return_decode_ok=True)
    top_k = max(1, args.top_k)
    predictions = []
    for path, label, prob, ok in zip(paths, labels, probs, decode_ok):
        order = np.argsort(prob)[::-1][:top_k]
        predictions.append({
            "path": path,
            "label": int(label),
            "label_name": _label_name(int(label)),
            # False = the decoder black-filled this file (corrupt /
            # unreadable): the prediction row is garbage, not a face
            "decode_ok": bool(ok),
            "top_k": [{"label": int(j), "label_name": _label_name(int(j)),
                       "prob": float(prob[j])} for j in order],
        })
    failures = [p for p, ok in zip(paths, decode_ok) if not ok]
    report = {
        "checkpoint": args.checkpoint_path or getattr(args, "exported",
                                                      None),
        "model": predictor.describe(),
        "num_images": len(paths),
        "decode_failures": failures,
        "predictions": predictions,
    }
    if failures:
        print(f"WARNING: {len(failures)} file(s) failed to decode "
              f"(black-filled; see report['decode_failures'])")
    text = json.dumps(report, indent=2)
    if args.output:
        os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
        with open(args.output, "w") as f:
            f.write(text + "\n")
        print(f"wrote {len(paths)} predictions to {args.output}")
    else:
        print(text)
    return report


def build_serve_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="FER inference HTTP server with dynamic batching")
    p.add_argument("--checkpoint_path", default=None,
                   help="FER checkpoint (ours or reference-format torch); "
                        "mutually exclusive with --exported")
    p.add_argument("--exported", default=None,
                   help="AOT artifact directory (fervit-export); "
                        "mutually exclusive with --checkpoint_path")
    p.add_argument("--psp_weights", default=None,
                   help="converted pSp encoder .npz (required for "
                        "latent-space checkpoints)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch_size", type=int, default=64,
                   help="compiled device batch size")
    p.add_argument("--max_batch", type=int, default=None,
                   help="max requests coalesced per device call "
                        "(default: batch_size)")
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="batching window after the first queued request")
    p.add_argument("--max_queue", type=int, default=None,
                   help="pending-request bound before 429 load shedding "
                        "(default: 8 * max_batch)")
    p.add_argument("--submit_timeout", type=float, default=30.0,
                   help="per-request wall-clock bound in seconds before "
                        "a 503 is returned")
    _add_dp_flag(p)
    return p


def serve_main(args) -> None:
    predictor = _predictor_from_args(args)
    print(f"compiling {predictor.describe()} ...")
    predictor.warmup()
    server = make_server(predictor, host=args.host, port=args.port,
                         max_batch=args.max_batch,
                         max_wait_ms=args.max_wait_ms, quiet=False,
                         max_queue=args.max_queue,
                         submit_timeout=args.submit_timeout)
    print(f"serving on http://{args.host}:{server.server_port} "
          f"(POST /predict, GET /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.batcher.close()
        server.server_close()


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "serve":
        serve_main(build_serve_parser().parse_args(sys.argv[2:]))
    else:
        predict_main(build_predict_parser().parse_args())
