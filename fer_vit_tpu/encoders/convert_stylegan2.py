"""Convert a rosinality-format StyleGAN2 generator state_dict (the
``decoder.*`` keys of a pSp checkpoint, reference:
train/train_style_extractor.py:50-79) into
:class:`fer_vit_tpu.encoders.stylegan2.Generator` variables.

Key mapping:

    style.{1..8}.{weight,bias}        → params/style_{0..7}
    input.input (1,C,4,4)             → params/input (1,4,4,C)
    conv1.conv.weight (1,O,I,k,k)     → params/conv1/conv/weight (k,k,I,O)
    conv1.conv.modulation.{w,b}       → params/conv1/conv/modulation
    conv1.noise.weight (1,)           → params/conv1/noise_weight ()
    conv1.activate.bias               → params/conv1/bias
    convs.{i}.* / to_rgbs.{i}.*       → params/convs_{i}/* / to_rgbs_{i}/*
    to_rgb1.bias (1,3,1,1)            → params/to_rgb1/bias (3,)
    noises.noise_{i} (1,1,H,W)        → noises/noise_{i} (1,H,W,1)

CLI:
    python -m fer_vit_tpu.encoders.convert_stylegan2 psp_ffhq.pt g.npz
"""

from __future__ import annotations

import sys
from typing import Dict

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    # (1, out, in, k, k) → (k, k, in, out)
    return np.ascontiguousarray(np.transpose(w[0], (2, 3, 1, 0)))


def _lin_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w))


def _modconv(sd: Dict[str, np.ndarray], pfx: str) -> dict:
    return {
        "weight": _conv_w(sd[f"{pfx}.weight"]),
        "modulation": {
            "kernel": _lin_w(sd[f"{pfx}.modulation.weight"]),
            "bias": sd[f"{pfx}.modulation.bias"],
        },
    }


def _styled_conv(sd: Dict[str, np.ndarray], pfx: str) -> dict:
    return {
        "conv": _modconv(sd, f"{pfx}.conv"),
        "noise_weight": np.asarray(sd[f"{pfx}.noise.weight"]).reshape(()),
        "bias": sd[f"{pfx}.activate.bias"],
    }


def _to_rgb(sd: Dict[str, np.ndarray], pfx: str) -> dict:
    return {
        "conv": _modconv(sd, f"{pfx}.conv"),
        "bias": np.asarray(sd[f"{pfx}.bias"]).reshape(3),
    }


def convert_generator_state_dict(sd: Dict[str, np.ndarray],
                                 n_mlp: int = 8) -> dict:
    params: dict = {}
    for i in range(n_mlp):
        params[f"style_{i}"] = {
            "kernel": _lin_w(sd[f"style.{i + 1}.weight"]),
            "bias": sd[f"style.{i + 1}.bias"],
        }
    params["input"] = np.ascontiguousarray(
        np.transpose(sd["input.input"], (0, 2, 3, 1))
    )
    params["conv1"] = _styled_conv(sd, "conv1")
    params["to_rgb1"] = _to_rgb(sd, "to_rgb1")
    i = 0
    while f"convs.{i}.conv.weight" in sd:
        params[f"convs_{i}"] = _styled_conv(sd, f"convs.{i}")
        i += 1
    j = 0
    while f"to_rgbs.{j}.conv.weight" in sd:
        params[f"to_rgbs_{j}"] = _to_rgb(sd, f"to_rgbs.{j}")
        j += 1

    noises: dict = {}
    k = 0
    while f"noises.noise_{k}" in sd:
        noises[f"noise_{k}"] = np.ascontiguousarray(
            np.transpose(sd[f"noises.noise_{k}"], (0, 2, 3, 1))
        )
        k += 1
    return {"params": params, "noises": noises}


def convert_psp_decoder(ckpt_path: str) -> dict:
    """Extract decoder.* from a pSp checkpoint and convert."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    sd = {
        k[len("decoder."):]: np.asarray(v.detach().cpu(), np.float32)
        for k, v in state.items()
        if k.startswith("decoder.")
    }
    if not sd:  # a bare generator checkpoint (g_ema)
        sd = {k: np.asarray(v.detach().cpu(), np.float32)
              for k, v in state.items()}
    return convert_generator_state_dict(sd)


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(1)
    from fer_vit_tpu.encoders.convert_psp import save_npz_variables

    variables = convert_psp_decoder(sys.argv[1])
    save_npz_variables(variables, sys.argv[2])
    print(f"wrote {sys.argv[2]}")


if __name__ == "__main__":
    main()
