"""AOT export: freeze a compiled Predictor pipeline into a portable artifact.

Rebuild extension — the reference (yuki-ominato/FER-ViT) deploys by
shipping model code + a torch checkpoint and re-building the module tree
at process start (reference: eval/evaluate_model.py:60-104 re-imports the
model class from its config). On TPU the natural deployment unit is the
*compiled program*: this module serializes the whole jitted
preprocess → pSp-encode → classify function to StableHLO via
``jax.export``, so a serving host reloads and runs it WITHOUT the model
zoo, the converters, or torch on the path — only jax and the artifact.

Artifact layout (one directory)::

    predict_fn_<dtype>.stablehlo
                           one serialized jax.export.Exported per input
                           dtype — weights stay *arguments* (not baked
                           constants), so a fine-tuned weights.msgpack
                           can be swapped in without re-tracing, and the
                           modules stay small
    weights.msgpack        the weight pytrees (flax msgpack; bf16-safe),
                           shared by all input signatures
    meta.json              route/shapes/classes/platforms/versions

Design notes:

- Input signatures are pinned at export time: ``(batch_size, S, S, 3)``
  per dtype in ``input_dtypes`` (default uint8 + float32 — the HTTP/
  packed feeds produce uint8, the file-decode feed produces float32;
  one exported program per dtype keeps exact parity with the live
  predictor's trace-time dtype handling instead of a lossy cast).
  ``Predictor.predict`` already pads arbitrary request counts to the
  compiled batch, so the pin costs nothing at run time;
  :meth:`fer_vit_tpu.serve.Predictor.from_exported` dispatches on the
  incoming dtype and rejects unsupported ones with a loud error instead
  of letting XLA produce a signature mismatch.
- Weight pytrees are canonicalized to plain nested dicts
  (``flax.serialization.to_state_dict``) *before* export so the treedef
  recorded in the artifact is exactly what ``msgpack_restore`` rebuilds
  at load time (FrozenDict vs dict would otherwise diverge).
- ``platforms`` defaults to the exporting process's backend. Pass
  ``("tpu", "cpu")`` to build one artifact that runs on both — note the
  ImageViT route picks a TPU Pallas attention kernel at trace time when
  exported from a TPU process (nn/transformer.py:98), which cannot lower
  for CPU; export errors loudly in that case rather than mis-lowering.
- Multi-chip serving should reload weights via ``from_checkpoint`` and
  shard under a mesh; an exported module is a closed single-device
  program, so ``export_predictor`` refuses mesh-bound predictors.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from flax import serialization
from jax import export as jax_export

FORMAT_VERSION = 1
_FN_FILE_TMPL = "predict_fn_{dtype}.stablehlo"
_WEIGHTS_FILE = "weights.msgpack"
_META_FILE = "meta.json"
DEFAULT_INPUT_DTYPES = ("uint8", "float32")


def export_predictor(predictor, out_dir: str, *,
                     platforms: Optional[Sequence[str]] = None,
                     input_dtypes: Sequence = DEFAULT_INPUT_DTYPES) -> dict:
    """Serialize ``predictor``'s jitted pipeline + weights to ``out_dir``.

    One StableHLO module per dtype in ``input_dtypes`` (the weight file
    is shared — input-dtype handling is the only trace-time difference).
    Returns the meta dict that was written. ``platforms`` is the
    ``jax.export`` lowering-platform list (None = current backend).
    """
    if getattr(predictor, "mesh", None) is not None:
        raise ValueError(
            "cannot export a mesh-bound Predictor: the exported StableHLO "
            "module is a closed single-device program. Export a mesh=None "
            "predictor; multi-chip serving reloads via from_checkpoint + "
            "--dp_devices.")
    dtypes = [np.dtype(d) for d in input_dtypes]
    if not dtypes:
        raise ValueError("input_dtypes must name at least one dtype")

    # Canonicalize weight pytrees to plain nested dicts of host arrays so
    # the exported treedef == what msgpack_restore rebuilds at load time.
    host_args = tuple(
        jax.tree.map(np.asarray, serialization.to_state_dict(a))
        for a in predictor._fn_args)
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), host_args)

    os.makedirs(out_dir, exist_ok=True)
    exported_platforms = None
    for dtype in dtypes:
        img_spec = jax.ShapeDtypeStruct(
            (predictor.batch_size, predictor.input_size,
             predictor.input_size, 3), dtype)
        exported = jax_export.export(
            predictor._fn,
            platforms=tuple(platforms) if platforms is not None else None,
        )(*specs, img_spec)
        exported_platforms = list(exported.platforms)
        fn_file = _FN_FILE_TMPL.format(dtype=dtype.name)
        with open(os.path.join(out_dir, fn_file), "wb") as f:
            f.write(exported.serialize())
    with open(os.path.join(out_dir, _WEIGHTS_FILE), "wb") as f:
        f.write(serialization.msgpack_serialize(list(host_args)))

    meta = {
        "format_version": FORMAT_VERSION,
        "model": predictor.describe()["model"],
        "route": "image" if predictor.image_route else "latent",
        "batch_size": int(predictor.batch_size),
        "input_size": int(predictor.input_size),
        "num_classes": int(predictor.num_classes),
        "input_dtypes": [d.name for d in dtypes],
        "num_weight_args": len(host_args),
        "platforms": exported_platforms,
        "jax_version": jax.__version__,
        "calling_convention_version": int(
            getattr(exported, "calling_convention_version", 0)),
    }
    with open(os.path.join(out_dir, _META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def load_exported(path: str) -> Tuple[dict, tuple, dict]:
    """Load an exported artifact → ``(calls_by_dtype, weight_args, meta)``.

    ``calls_by_dtype[np.dtype]`` maps each exported input dtype to a
    callable ``call(*weight_args, images)`` reproducing the original
    predictor function; each is wrapped in ``tuned_jit`` (inference
    class) so repeat calls hit one compiled executable with the tuned
    TPU compiler options.
    """
    meta_path = os.path.join(path, _META_FILE)
    if not os.path.isfile(meta_path):
        raise FileNotFoundError(
            f"{path} is not an exported-predictor directory "
            f"(missing {_META_FILE}) — create one with fervit-export")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"artifact format_version {meta.get('format_version')} != "
            f"supported {FORMAT_VERSION} — re-export with this build")

    backend = jax.default_backend()
    if backend not in meta["platforms"]:
        raise ValueError(
            f"artifact was exported for platforms {meta['platforms']} but "
            f"this process runs on {backend!r} — re-export with "
            f"--platforms {backend} (or including it)")

    from fer_vit_tpu.utils.compile_opts import tuned_jit

    calls_by_dtype = {}
    for name in meta["input_dtypes"]:
        fn_file = os.path.join(path, _FN_FILE_TMPL.format(dtype=name))
        with open(fn_file, "rb") as f:
            exported = jax_export.deserialize(f.read())
        calls_by_dtype[np.dtype(name)] = tuned_jit(
            exported.call, program_class="inference")
    with open(os.path.join(path, _WEIGHTS_FILE), "rb") as f:
        weight_args = tuple(serialization.msgpack_restore(f.read()))
    if len(weight_args) != meta["num_weight_args"]:
        raise ValueError(
            f"weights.msgpack holds {len(weight_args)} weight args, meta "
            f"says {meta['num_weight_args']} — mixed artifact files?")
    return calls_by_dtype, weight_args, meta


# -- CLI ----------------------------------------------------------------------


def build_parser():
    import argparse

    p = argparse.ArgumentParser(
        description="Export a FER checkpoint to a portable AOT serving "
                    "artifact (StableHLO + weights); reload with "
                    "fervit-predict/fervit-serve --exported DIR")
    p.add_argument("--checkpoint_path", required=True,
                   help="FER checkpoint (ours or reference-format torch)")
    p.add_argument("--psp_weights", default=None,
                   help="converted pSp encoder .npz (required for "
                        "latent-space checkpoints)")
    p.add_argument("--output", required=True,
                   help="artifact directory to create")
    p.add_argument("--batch_size", type=int, default=64,
                   help="compiled batch size pinned into the artifact")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="jax.export lowering platforms (default: this "
                        "process's backend), e.g. --platforms tpu cpu")
    p.add_argument("--input_dtypes", nargs="+",
                   default=list(DEFAULT_INPUT_DTYPES),
                   choices=("uint8", "float32"),
                   help="pinned image input dtypes, one exported program "
                        "each (uint8 = HTTP/packed feeds, float32 = the "
                        "file-decode feed)")
    return p


def main(args) -> dict:
    from fer_vit_tpu.serve import Predictor

    predictor = Predictor.from_checkpoint(
        args.checkpoint_path, psp_weights=args.psp_weights,
        batch_size=args.batch_size)
    meta = export_predictor(predictor, args.output,
                            platforms=args.platforms,
                            input_dtypes=args.input_dtypes)
    print(f"exported {meta['model']} ({meta['route']} route, batch "
          f"{meta['batch_size']}, input {meta['input_dtypes']}, "
          f"platforms {meta['platforms']}) to {args.output}")
    return meta


if __name__ == "__main__":
    main(build_parser().parse_args())
