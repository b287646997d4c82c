"""Convert a pSp (pixel2style2pixel) PyTorch checkpoint to this framework's
variables pytree.

The reference loads the third-party pSp checkpoint with torch and runs its
encoder on GPU (reference: models_fer_vit/encoder_wrapper.py:58-89). Here
the checkpoint is converted **once**, host-side, into an ``.npz`` holding
the :class:`fer_vit_tpu.encoders.psp.PSpEncoder` variables; TPU inference
then never touches torch.

Key mapping (third-party ``encoder.*`` state_dict → our tree):

    input_layer.0/1/2            → backbone/{input_conv,input_bn,input_prelu}
    body.{i}.res_layer.0..5      → backbone/body_{i}/{bn1,conv1,prelu,conv2,bn2,se}
    body.{i}.shortcut_layer.0/1  → backbone/body_{i}/{shortcut_conv,shortcut_bn}
    styles.{k}.convs.{2j}        → {coarse|middle|fine}/heads/conv_{j} (stacked
                                   over the head axis — our heads are vmapped)
    styles.{k}.linear            → .../heads/linear
    latlayer1/2                  → latlayer1/2
    ckpt['latent_avg']           → constants/latent_avg

Tensor layout transforms: conv (O,I,kh,kw) → (kh,kw,I,O); linear (O,I) →
(I,O); BN weight/bias → scale/bias, running stats → ``batch_stats``.

CLI:
    python -m fer_vit_tpu.encoders.convert_psp psp_ffhq.pt psp_weights.npz
"""

from __future__ import annotations

import sys
from typing import Dict, Tuple

import numpy as np

from fer_vit_tpu.encoders.irse import IR_SE_50_PLAN

N_STYLES = 18
COARSE_IND = 3
MIDDLE_IND = 7


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[dict, dict]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def convert_encoder_state_dict(sd: Dict[str, np.ndarray],
                               plan=IR_SE_50_PLAN,
                               input_size: int = 256) -> dict:
    """torch ``encoder.*`` state_dict (already stripped of the ``encoder.``
    prefix, values as numpy) → {'params': ..., 'batch_stats': ...}."""
    params: dict = {"backbone": {}}
    stats: dict = {"backbone": {}}

    bb_p, bb_s = params["backbone"], stats["backbone"]
    bb_p["input_conv"] = {"kernel": _conv(sd["input_layer.0.weight"])}
    bb_p["input_bn"], bb_s["input_bn"] = _bn(sd, "input_layer.1")
    bb_p["input_prelu"] = {"alpha": sd["input_layer.2.weight"]}

    n_units = sum(n for _, _, n in plan)
    unit = 0
    for in_c, out_c, n in plan:
        for u in range(n):
            pfx = f"body.{unit}"
            b: dict = {}
            bs: dict = {}
            b["bn1"], bs["bn1"] = _bn(sd, f"{pfx}.res_layer.0")
            b["conv1"] = {"kernel": _conv(sd[f"{pfx}.res_layer.1.weight"])}
            b["prelu"] = {"alpha": sd[f"{pfx}.res_layer.2.weight"]}
            b["conv2"] = {"kernel": _conv(sd[f"{pfx}.res_layer.3.weight"])}
            b["bn2"], bs["bn2"] = _bn(sd, f"{pfx}.res_layer.4")
            b["se"] = {
                "fc1": {"kernel": _conv(sd[f"{pfx}.res_layer.5.fc1.weight"])},
                "fc2": {"kernel": _conv(sd[f"{pfx}.res_layer.5.fc2.weight"])},
            }
            if u == 0 and in_c != out_c:
                b["shortcut_conv"] = {
                    "kernel": _conv(sd[f"{pfx}.shortcut_layer.0.weight"])
                }
                b["shortcut_bn"], bs["shortcut_bn"] = _bn(
                    sd, f"{pfx}.shortcut_layer.1"
                )
            bb_p[f"body_{unit}"] = b
            bb_s[f"body_{unit}"] = bs
            unit += 1
    assert unit == n_units

    for name in ("latlayer1", "latlayer2"):
        params[name] = {
            "kernel": _conv(sd[f"{name}.weight"]),
            "bias": sd[f"{name}.bias"],
        }

    # Style heads: stack per pyramid level over the vmapped head axis.
    import math

    base = int(math.log2(input_size // 16))  # 4 convs at 256 input
    groups = {
        "coarse": (range(0, COARSE_IND), base),           # c3-level heads
        "middle": (range(COARSE_IND, MIDDLE_IND), base + 1),
        "fine": (range(MIDDLE_IND, N_STYLES), base + 2),
    }
    for gname, (head_range, n_convs) in groups.items():
        heads = list(head_range)
        g: dict = {}
        for j in range(n_convs):
            g[f"conv_{j}"] = {
                "kernel": np.stack(
                    [_conv(sd[f"styles.{k}.convs.{2 * j}.weight"]) for k in heads]
                ),
                "bias": np.stack(
                    [sd[f"styles.{k}.convs.{2 * j}.bias"] for k in heads]
                ),
            }
        g["linear"] = {
            "kernel": np.stack(
                [_linear(sd[f"styles.{k}.linear.weight"]) for k in heads]
            ),
            "bias": np.stack([sd[f"styles.{k}.linear.bias"] for k in heads]),
        }
        params[gname] = {"heads": g}

    return {
        "params": params,
        "batch_stats": stats,
        # zeros placeholder; convert_checkpoint overwrites with the real one
        "constants": {"latent_avg": np.zeros((N_STYLES, 512), np.float32)},
    }


def convert_checkpoint(ckpt_path: str) -> dict:
    """Load a pSp .pt checkpoint and convert its encoder + latent_avg."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd_raw = ckpt.get("state_dict", ckpt)
    sd = {
        k[len("encoder."):]: np.asarray(v.detach().cpu(), dtype=np.float32)
        for k, v in sd_raw.items()
        if k.startswith("encoder.")
    }
    variables = convert_encoder_state_dict(sd)
    latent_avg = ckpt.get("latent_avg")
    if latent_avg is not None:
        la = np.asarray(latent_avg.detach().cpu(), dtype=np.float32)
        if la.ndim == 1:  # (512,) → broadcast to (18, 512)
            la = np.tile(la[None], (N_STYLES, 1))
    else:
        la = np.zeros((N_STYLES, 512), np.float32)
    variables["constants"] = {"latent_avg": la}
    return variables


# -- npz (de)serialization of a variables pytree ---------------------------


def _flatten(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        name = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, name))
        else:
            out[name] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for name, arr in flat.items():
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def save_npz_variables(variables: dict, path: str) -> None:
    np.savez(path, **_flatten(variables))


def load_npz_variables(path: str) -> dict:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(
            "usage: python -m fer_vit_tpu.encoders.convert_psp <psp.pt> <out.npz>"
        )
    variables = convert_checkpoint(sys.argv[1])
    save_npz_variables(variables, sys.argv[2])
    n = sum(v.size for v in _flatten(variables).values())
    print(f"wrote {sys.argv[2]} ({n / 1e6:.1f}M values)")


if __name__ == "__main__":
    main()
