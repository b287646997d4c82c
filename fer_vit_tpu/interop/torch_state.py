"""Bidirectional torch ``state_dict`` ↔ Flax pytree converters.

One mapping table per FER model family; the table is the single source of
truth for both directions. Reference key names come from the reference
module structure (reference: models_fer_vit/latent_vit.py:5-48,
latent_vit_v2.py:7-101, latent_cnn.py:14-438, image_vit.py:47-166,
hybrid_latent_vit.py:18-265); our paths are the Flax trees of
:mod:`fer_vit_tpu.models`.

Transforms (torch layout → flax layout):

* ``lin``    — Linear weight (O, I) ↔ kernel (I, O)
* ``conv1d`` — Conv1d weight (O, I, k) ↔ kernel (k, I, O)
* ``conv2d`` — Conv2d weight (O, I, kh, kw) ↔ kernel (kh, kw, I, O)
* ``copy``   — identical layout (biases, norms, tokens, embeddings)

BatchNorm ``running_mean/var`` map to the ``batch_stats`` collection;
``num_batches_tracked`` is dropped on import and written as 0 on export
(torch's strict ``load_state_dict`` wants the key, never the value).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

# (torch_key, collection, path-in-tree, transform)
Entry = Tuple[str, str, Tuple[str, ...], str]


def _t2j(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "lin":
        return arr.T
    if kind == "conv1d":
        return arr.transpose(2, 1, 0)
    if kind == "conv2d":
        return arr.transpose(2, 3, 1, 0)
    return arr


def _j2t(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "lin":
        return arr.T
    if kind == "conv1d":
        return arr.transpose(2, 1, 0)
    if kind == "conv2d":
        return arr.transpose(3, 2, 0, 1)
    return arr


# -- per-family mapping tables ----------------------------------------------


def _linear(tk: str, path: Tuple[str, ...], bias: bool = True) -> List[Entry]:
    out = [(f"{tk}.weight", "params", path + ("kernel",), "lin")]
    if bias:
        out.append((f"{tk}.bias", "params", path + ("bias",), "copy"))
    return out


def _norm(tk: str, path: Tuple[str, ...]) -> List[Entry]:
    """LayerNorm / BN affine: torch weight/bias → flax scale/bias."""
    return [
        (f"{tk}.weight", "params", path + ("scale",), "copy"),
        (f"{tk}.bias", "params", path + ("bias",), "copy"),
    ]


def _bn(tk: str, path: Tuple[str, ...]) -> List[Entry]:
    return _norm(tk, path) + [
        (f"{tk}.running_mean", "batch_stats", path + ("mean",), "copy"),
        (f"{tk}.running_var", "batch_stats", path + ("var",), "copy"),
    ]


def _conv1d(tk: str, path: Tuple[str, ...], bias: bool = False) -> List[Entry]:
    out = [(f"{tk}.weight", "params", path + ("kernel",), "conv1d")]
    if bias:
        out.append((f"{tk}.bias", "params", path + ("bias",), "copy"))
    return out


def _conv2d(tk: str, path: Tuple[str, ...], bias: bool = True) -> List[Entry]:
    out = [(f"{tk}.weight", "params", path + ("kernel",), "conv2d")]
    if bias:
        out.append((f"{tk}.bias", "params", path + ("bias",), "copy"))
    return out


def _encoder_layer(tk: str, path: Tuple[str, ...]) -> List[Entry]:
    """torch.nn.TransformerEncoderLayer → our TransformerEncoderLayer."""
    a = path + ("self_attn",)
    return [
        (f"{tk}.self_attn.in_proj_weight", "params",
         a + ("in_proj_kernel",), "lin"),
        (f"{tk}.self_attn.in_proj_bias", "params",
         a + ("in_proj_bias",), "copy"),
        (f"{tk}.self_attn.out_proj.weight", "params",
         a + ("out_proj_kernel",), "lin"),
        (f"{tk}.self_attn.out_proj.bias", "params",
         a + ("out_proj_bias",), "copy"),
        *_linear(f"{tk}.linear1", path + ("linear1",)),
        *_linear(f"{tk}.linear2", path + ("linear2",)),
        *_norm(f"{tk}.norm1", path + ("norm1",)),
        *_norm(f"{tk}.norm2", path + ("norm2",)),
    ]


def _latent_vit_entries(depth: int, prefix_t: str = "",
                        prefix_j: Tuple[str, ...] = ()) -> List[Entry]:
    """Reference LatentViT (models_fer_vit/latent_vit.py:19-36)."""
    p, j = prefix_t, prefix_j
    entries: List[Entry] = [
        (f"{p}cls_token", "params", j + ("cls_token",), "copy"),
        (f"{p}pos_emb", "params", j + ("pos_emb",), "copy"),
        *_linear(f"{p}input_proj", j + ("input_proj",)),
        *_norm(f"{p}mlp_head.0", j + ("head_norm",)),
        *_linear(f"{p}mlp_head.1", j + ("head",)),
    ]
    for i in range(depth):
        entries += _encoder_layer(
            f"{p}transformer.layers.{i}",
            j + ("transformer", f"layers_{i}"))
    return entries


def _latent_vit_v2_entries(depth: int, flags: Dict[str, Any]) -> List[Entry]:
    """Reference LatentViTv2 (models_fer_vit/latent_vit_v2.py:28-75): the
    LWN's 18 per-layer norms are STACKED into our (18, D) scale/bias —
    handled by the multi-key transform below."""
    entries = _latent_vit_entries(depth, "backbone.", ("backbone",))
    if flags.get("use_leam"):
        entries.append(("leam.layer_weights", "params",
                        ("leam", "layer_weights"), "copy"))
    if flags.get("use_spe"):
        entries += [
            ("spe.group_embed.weight", "params",
             ("spe", "group_embed"), "copy"),
            ("spe.layer_embed.weight", "params",
             ("spe", "layer_embed"), "copy"),
        ]
    # use_lwn handled separately (stacked); see _convert_lwn
    return entries


def _latent_cnn_entries(model_type: str, n_conv: int = 4,
                        n_res: int = 2) -> List[Entry]:
    e: List[Entry] = []
    if model_type == "standard":
        for i in range(n_conv):
            e += _conv1d(f"conv_layers.{i}.conv", (f"conv_{i}", "conv"))
            e += _bn(f"conv_layers.{i}.bn", (f"conv_{i}", "bn"))
        for i in range(n_res):
            e += _conv1d(f"res_blocks.{i}.conv1", (f"res_{i}", "conv1"))
            e += _bn(f"res_blocks.{i}.bn1", (f"res_{i}", "bn1"))
            e += _conv1d(f"res_blocks.{i}.conv2", (f"res_{i}", "conv2"))
            e += _bn(f"res_blocks.{i}.bn2", (f"res_{i}", "bn2"))
        e += _linear("classifier.1", ("classifier", "fc1"))
        e += _bn("classifier.2", ("classifier", "bn"))
        e += _linear("classifier.5", ("classifier", "fc2"))
    elif model_type == "light":
        for i, t in enumerate((0, 4, 8)):
            e += _conv1d(f"encoder.{t}", (f"conv_{i}",), bias=True)
            e += _bn(f"encoder.{t + 1}", (f"bn_{i}",))
        e += _linear("classifier.1", ("fc1",))
        e += _linear("classifier.4", ("fc2",))
    elif model_type == "deep":
        e += _linear("input_proj.0", ("input_proj",))
        e += _norm("input_proj.1", ("input_norm",))
        for s in range(3):
            e += _conv1d(f"conv_block{s + 1}.0.conv",
                         (f"stage{s}_conv", "conv"))
            e += _bn(f"conv_block{s + 1}.0.bn", (f"stage{s}_conv", "bn"))
            n_res_s = 2 if s == 2 else 1
            for r in range(n_res_s):
                tk = f"conv_block{s + 1}.{r + 1}"
                jk = f"stage{s}_res{r}"
                e += _conv1d(f"{tk}.conv1", (jk, "conv1"))
                e += _bn(f"{tk}.bn1", (jk, "bn1"))
                e += _conv1d(f"{tk}.conv2", (jk, "conv2"))
                e += _bn(f"{tk}.bn2", (jk, "bn2"))
        e += _conv1d("attention.0", ("attn",), bias=True)
        e += _linear("classifier.0", ("classifier", "fc1"))
        e += _bn("classifier.1", ("classifier", "bn"))
        e += _linear("classifier.4", ("classifier", "fc2"))
    elif model_type == "2d":
        for i, t in enumerate((0, 4, 9)):
            e += _conv2d(f"features.{t}", (f"conv_{i}",))
            e += _bn(f"features.{t + 1}", (f"bn_{i}",))
        e += _linear("classifier.1", ("classifier", "fc1"))
        e += _bn("classifier.2", ("classifier", "bn"))
        e += _linear("classifier.5", ("classifier", "fc2"))
    else:
        raise ValueError(f"unknown latent_cnn model_type: {model_type!r}")
    return e


def _image_vit_entries(depth: int) -> List[Entry]:
    entries: List[Entry] = [
        ("cls_token", "params", ("cls_token",), "copy"),
        ("pos_embed", "params", ("pos_embed",), "copy"),
        *_conv2d("patch_embed.proj", ("patch_embed", "proj")),
        *_norm("norm", ("norm",)),
        *_linear("head", ("head",)),
    ]
    for i in range(depth):
        entries += _encoder_layer(f"transformer.layers.{i}",
                                  ("transformer", f"layers_{i}"))
    return entries


def _hybrid_entries(depth: int, use_adapter: bool) -> List[Entry]:
    """Reference HybridLatentViT (models_fer_vit/hybrid_latent_vit.py:79-114):
    the trunk is extracted timm Blocks (transformer.{i}.attn.qkv ...)."""
    entries: List[Entry] = [
        ("cls_token", "params", ("cls_token",), "copy"),
        ("pos_embed", "params", ("pos_embed",), "copy"),
        *_linear("input_proj", ("input_proj",)),
        *_norm("head.0", ("head_norm",)),
        *_linear("head.2", ("head",)),
    ]
    for i in range(depth):
        t, j = f"transformer.{i}", (f"blocks_{i}",)
        entries += [
            *_norm(f"{t}.norm1", j + ("norm1",)),
            *_linear(f"{t}.attn.qkv", j + ("attn", "qkv")),
            *_linear(f"{t}.attn.proj", j + ("attn", "proj")),
            *_norm(f"{t}.norm2", j + ("norm2",)),
            *_linear(f"{t}.mlp.fc1", j + ("fc1",)),
            *_linear(f"{t}.mlp.fc2", j + ("fc2",)),
        ]
    if use_adapter:
        for i in range(depth):
            t, j = f"adapters.{i}", (f"adapters_{i}",)
            entries += [
                *_linear(f"{t}.adapter.0", j + ("down",)),
                *_linear(f"{t}.adapter.2", j + ("up",)),
                (f"{t}.alpha", "params", j + ("alpha",), "copy"),
            ]
    return entries


# -- tree access --------------------------------------------------------------


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def _infer_depth(params: Dict[str, Any], key: str, prefix: str) -> int:
    sub = _get(params, key.split("/")) if key else params
    return sum(1 for k in sub if str(k).startswith(prefix))


def entries_for(model_kind: str, params: Dict[str, Any],
                config: Dict[str, Any]) -> List[Entry]:
    """The mapping table for one model family, sized from the live tree."""
    if model_kind == "latent_vit":
        depth = _infer_depth(params, "transformer", "layers_")
        return _latent_vit_entries(depth)
    if model_kind == "latent_vit_v2":
        depth = _infer_depth(params, "backbone/transformer", "layers_")
        return _latent_vit_v2_entries(depth, config)
    if model_kind.startswith("latent_cnn_"):
        return _latent_cnn_entries(model_kind[len("latent_cnn_"):])
    if model_kind == "image_vit":
        depth = _infer_depth(params, "transformer", "layers_")
        return _image_vit_entries(depth)
    if model_kind == "hybrid":
        depth = sum(1 for k in params if str(k).startswith("blocks_"))
        use_adapter = any(str(k).startswith("adapters_") for k in params)
        return _hybrid_entries(depth, use_adapter)
    raise ValueError(f"unknown model kind: {model_kind!r}")


def model_kind_from_config(model_config: Dict[str, Any]) -> str:
    """The reference's checkpoint-discrimination logic as a kind string
    (reference: eval/evaluate_model.py:50-114 + our evaluate_model)."""
    # Image configs carry BOTH model_size (tiny/small/base/custom,
    # reference train/train_image_vit.py:237-246) and img_size/patch_size,
    # so the image check must come before the hybrid one (hybrid configs
    # never store image geometry). Lazy import: evaluate_model owns THE
    # image-vs-latent predicate and imports interop lazily, so no cycle.
    from fer_vit_tpu.eval.evaluate_model import is_image_config

    if is_image_config(model_config):
        return "image_vit"
    if "model_size" in model_config:
        return "hybrid"
    if "model_type" in model_config:
        return "latent_cnn_" + str(model_config["model_type"])
    if any(model_config.get(k) for k in
           ("use_lwn", "use_spe", "use_leam", "use_lwn_residual")):
        return "latent_vit_v2"
    return "latent_vit"


# -- LWN: 18 torch LayerNorms ↔ one stacked (L, D) pair ----------------------


def _convert_lwn_from_torch(sd, params) -> None:
    if "lwn" not in params:
        return
    L = params["lwn"]["scale"].shape[0]
    params["lwn"]["scale"] = np.stack(
        [np.asarray(sd[f"lwn.norms.{i}.weight"]) for i in range(L)])
    params["lwn"]["bias"] = np.stack(
        [np.asarray(sd[f"lwn.norms.{i}.bias"]) for i in range(L)])
    # the ("params","lwn") coverage exemption below would hide a gate
    # mismatch in either direction — fail loudly on use_lwn_residual skew
    if "gate" in params["lwn"]:
        if "lwn.gate" not in sd:
            raise KeyError(
                "template has lwn residual gate but state_dict lacks "
                "'lwn.gate' (use_lwn_residual mismatch?)")
        params["lwn"]["gate"] = np.asarray(sd["lwn.gate"])
    elif "lwn.gate" in sd:
        raise KeyError(
            "state_dict carries a trained 'lwn.gate' but the template has "
            "no residual gate — converting would silently drop it "
            "(use_lwn_residual mismatch?)")


def _convert_lwn_to_torch(params, out: Dict[str, np.ndarray]) -> None:
    if "lwn" not in params:
        return
    scale = np.asarray(params["lwn"]["scale"])
    for i in range(scale.shape[0]):
        out[f"lwn.norms.{i}.weight"] = scale[i]
        out[f"lwn.norms.{i}.bias"] = np.asarray(params["lwn"]["bias"])[i]
    if "gate" in params["lwn"]:
        out["lwn.gate"] = np.asarray(params["lwn"]["gate"])


# -- public API ---------------------------------------------------------------


def read_torch_checkpoint(path: str):
    """torch.load a reference-format checkpoint and extract
    ``(ckpt, config, model_config, state_dict)`` with the reference's
    container fallbacks (reference eval/evaluate_model.py:36-60,115-122:
    ``config`` takes precedence over legacy ``args``; state dict under
    ``model_state_dict`` then ``model_state``). Single source of truth for
    every eval/export CLI that reads torch checkpoints."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except TypeError:  # torch < 2.6 has no weights_only kwarg
        ckpt = torch.load(path, map_location="cpu")
    if "config" in ckpt:
        config = ckpt["config"]
        model_config = config.get("model", config)
    elif "args" in ckpt:
        config = vars(ckpt["args"])
        model_config = config
    else:
        print("Warning: Config not found in checkpoint, using default values")
        config = {}
        model_config = {}
    if "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
    elif "model_state" in ckpt:
        sd = ckpt["model_state"]
    else:
        raise KeyError("Model state dict not found in checkpoint")
    return ckpt, config, model_config, sd


def from_torch_state_dict(model_kind: str, sd: Dict[str, Any],
                          template_params: Dict[str, Any],
                          template_batch_stats: Dict[str, Any] | None = None,
                          config: Dict[str, Any] | None = None):
    """torch state_dict → (params, batch_stats) matching the templates.

    ``sd`` values may be torch tensors or numpy arrays. Every template leaf
    must be covered by the mapping (missing torch keys raise), so a
    reference checkpoint either converts completely or fails loudly.
    """
    import jax

    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    params = jax.tree_util.tree_map(np.asarray, template_params)
    batch_stats = jax.tree_util.tree_map(
        np.asarray, template_batch_stats or {})
    entries = entries_for(model_kind, params, config or {})
    for tk, coll, path, kind in entries:
        tree = params if coll == "params" else batch_stats
        if tk not in sd:
            raise KeyError(f"{model_kind}: torch key {tk!r} missing "
                           f"(wanted for {'/'.join(path)})")
        target = _get(tree, path)
        arr = _t2j(sd[tk], kind).astype(np.asarray(target).dtype)
        if arr.shape != np.asarray(target).shape:
            raise ValueError(
                f"{model_kind}: {tk} → {'/'.join(path)} shape "
                f"{arr.shape} != template {np.asarray(target).shape}")
        _set(tree, path, arr)
    if model_kind == "latent_vit_v2":
        _convert_lwn_from_torch(sd, params)
    # Loud coverage check (the docstring's promise): every template leaf
    # must have been written by the mapping table (or the v2 stacked-LWN
    # special case above) — an uncovered leaf would silently keep its
    # random-init value and yield a wrong-but-plausible model.
    covered = {(coll,) + tuple(path) for _, coll, path, _ in entries}
    special = {("params", "lwn"), ("params", "spe", "groups")}
    uncovered = []
    for coll_name, tree in (("params", params),
                            ("batch_stats", batch_stats)):
        for kp, _leaf in jax.tree_util.tree_leaves_with_path(tree):
            path = tuple(str(getattr(k, "key", k)) for k in kp)
            full = (coll_name,) + path
            if full in covered or any(
                    full[:len(s)] == s for s in special):
                continue
            uncovered.append("/".join(full))
    if uncovered:
        raise KeyError(
            f"{model_kind}: template leaves not covered by the torch "
            f"mapping: {sorted(uncovered)}")
    return params, batch_stats


def to_torch_state_dict(model_kind: str, params: Dict[str, Any],
                        batch_stats: Dict[str, Any] | None = None,
                        config: Dict[str, Any] | None = None,
                        as_tensors: bool = True) -> Dict[str, Any]:
    """(params, batch_stats) → a reference-keyed torch state_dict."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats or {})
    out: Dict[str, np.ndarray] = {}
    bn_prefixes = set()
    for tk, coll, path, kind in entries_for(model_kind, params, config or {}):
        tree = params if coll == "params" else batch_stats
        out[tk] = _j2t(np.asarray(_get(tree, path)), kind)
        if tk.endswith(".running_mean"):
            bn_prefixes.add(tk[: -len(".running_mean")])
    for p in bn_prefixes:
        out[f"{p}.num_batches_tracked"] = np.asarray(0, np.int64)
    if model_kind == "latent_vit_v2":
        _convert_lwn_to_torch(params, out)
        if "spe" in params:
            # the reference SPE registers a constant group-index buffer
            # (modules/semantic_pe.py) — reproduce it for strict loading
            L = np.asarray(params["spe"]["layer_embed"]).shape[0]
            groups = np.zeros(L, np.int64)
            groups[4:12] = 1
            groups[12:] = 2
            out["spe.groups"] = groups
    if as_tensors:
        import torch

        out = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
               for k, v in out.items()}
    return out


# -- AFS StyleExtractor (vmapped, stacked-leaf layout) ------------------------


def style_extractor_to_torch_state_dict(params: Dict[str, Any],
                                        batch_stats: Dict[str, Any] | None = None,
                                        as_tensors: bool = True
                                        ) -> Dict[str, Any]:
    """Our vmapped StyleExtractor → the reference's per-block naming.

    Our layout stacks every leaf over the W+ layer axis (axis 0, via
    nn.vmap); the reference registers independent per-layer modules
    (reference afs/style_extractor.py:76-116): ``blocks.{i}.down/up`` and
    ``blocks.{i}.highways.{j}.{nonlinear.0, nonlinear.1, linear, gate}``
    where ``nonlinear`` is Sequential(Linear, BatchNorm1d).
    """
    import jax

    p = jax.tree_util.tree_map(np.asarray, params)["blocks"]
    bs_all = jax.tree_util.tree_map(np.asarray, batch_stats or {})
    bs = bs_all.get("blocks", {})
    n_layers = p["down"]["kernel"].shape[0]
    num_highway = sum(1 for k in p if str(k).startswith("highway_"))
    out: Dict[str, np.ndarray] = {}
    for i in range(n_layers):
        pre = f"blocks.{i}"
        lin_map = [("down", p["down"]), ("up", p["up"])]
        for j in range(num_highway):
            hw = p[f"highway_{j}"]
            lin_map += [
                (f"highways.{j}.nonlinear.0", hw["nonlinear"]),
                (f"highways.{j}.linear", hw["linear"]),
                (f"highways.{j}.gate", hw["gate"]),
            ]
        for sub, node in lin_map:
            out[f"{pre}.{sub}.weight"] = np.ascontiguousarray(
                node["kernel"][i].T)
            out[f"{pre}.{sub}.bias"] = node["bias"][i]
        for j in range(num_highway):
            bn = p[f"highway_{j}"]["bn"]
            b = f"{pre}.highways.{j}.nonlinear.1"
            out[f"{b}.weight"] = bn["scale"][i]
            out[f"{b}.bias"] = bn["bias"][i]
            hb = bs[f"highway_{j}"]["bn"] if bs else None
            out[f"{b}.running_mean"] = (hb["mean"][i] if hb
                                        else np.zeros_like(bn["scale"][i]))
            out[f"{b}.running_var"] = (hb["var"][i] if hb
                                       else np.ones_like(bn["scale"][i]))
            out[f"{b}.num_batches_tracked"] = np.asarray(0, np.int64)
    if as_tensors:
        import torch

        out = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
               for k, v in out.items()}
    return out


def style_extractor_from_torch_state_dict(sd: Dict[str, Any],
                                          template_params: Dict[str, Any],
                                          template_batch_stats: Dict[str, Any]):
    """Reference per-block state_dict → our stacked (params, batch_stats)."""
    import jax

    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    params = jax.tree_util.tree_map(np.asarray, template_params)
    batch_stats = jax.tree_util.tree_map(np.asarray, template_batch_stats)
    p = params["blocks"]
    bs = batch_stats["blocks"]
    n_layers = p["down"]["kernel"].shape[0]
    num_highway = sum(1 for k in p if str(k).startswith("highway_"))

    def stack(keys, transpose=False):
        arrs = [sd[k] for k in keys]
        return np.stack([a.T if transpose else a for a in arrs], axis=0)

    def keys_for(sub, leaf):
        return [f"blocks.{i}.{sub}.{leaf}" for i in range(n_layers)]

    lin_map = [("down", ("down",)), ("up", ("up",))]
    for j in range(num_highway):
        lin_map += [
            (f"highways.{j}.nonlinear.0", (f"highway_{j}", "nonlinear")),
            (f"highways.{j}.linear", (f"highway_{j}", "linear")),
            (f"highways.{j}.gate", (f"highway_{j}", "gate")),
        ]
    for sub, path in lin_map:
        node = _get(p, path)
        node["kernel"] = stack(keys_for(sub, "weight"), transpose=True).astype(
            node["kernel"].dtype)
        node["bias"] = stack(keys_for(sub, "bias")).astype(node["bias"].dtype)
    for j in range(num_highway):
        bn = p[f"highway_{j}"]["bn"]
        hb = bs[f"highway_{j}"]["bn"]
        sub = f"highways.{j}.nonlinear.1"
        bn["scale"] = stack(keys_for(sub, "weight")).astype(bn["scale"].dtype)
        bn["bias"] = stack(keys_for(sub, "bias")).astype(bn["bias"].dtype)
        hb["mean"] = stack(keys_for(sub, "running_mean")).astype(
            hb["mean"].dtype)
        hb["var"] = stack(keys_for(sub, "running_var")).astype(
            hb["var"].dtype)
    return params, batch_stats
