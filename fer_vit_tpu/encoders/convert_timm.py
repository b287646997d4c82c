"""Convert timm ViT weights (torch state_dict) → this framework's ``.npz``.

Run wherever timm/torch weights are available (this image has neither timm
nor network access — reference: models_fer_vit/hybrid_latent_vit.py:54-55
has the same hard timm dependency):

    python -m fer_vit_tpu.encoders.convert_timm vit_small_patch16_224 out.npz
    # or from a saved state_dict file:
    python -m fer_vit_tpu.encoders.convert_timm sd.pt out.npz

The output tree matches :class:`fer_vit_tpu.models.timm_vit.TimmViT` params
and the flat-key format expected by
:func:`fer_vit_tpu.models.hybrid_latent_vit.graft_pretrained`.
"""

from __future__ import annotations

import sys
from typing import Dict

import numpy as np


def convert_timm_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """timm ViT state_dict (numpy values) → TimmViT params tree."""
    params: dict = {}
    params["patch_embed"] = {
        "kernel": np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
        "bias": sd["patch_embed.proj.bias"],
    }
    params["cls_token"] = sd["cls_token"]
    params["pos_embed"] = sd["pos_embed"]

    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        pfx = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": {"scale": sd[f"{pfx}.norm1.weight"],
                      "bias": sd[f"{pfx}.norm1.bias"]},
            "attn": {
                "qkv": {"kernel": np.transpose(sd[f"{pfx}.attn.qkv.weight"]),
                        "bias": sd[f"{pfx}.attn.qkv.bias"]},
                "proj": {"kernel": np.transpose(sd[f"{pfx}.attn.proj.weight"]),
                         "bias": sd[f"{pfx}.attn.proj.bias"]},
            },
            "norm2": {"scale": sd[f"{pfx}.norm2.weight"],
                      "bias": sd[f"{pfx}.norm2.bias"]},
            "fc1": {"kernel": np.transpose(sd[f"{pfx}.mlp.fc1.weight"]),
                    "bias": sd[f"{pfx}.mlp.fc1.bias"]},
            "fc2": {"kernel": np.transpose(sd[f"{pfx}.mlp.fc2.weight"]),
                    "bias": sd[f"{pfx}.mlp.fc2.bias"]},
        }
        i += 1

    if "norm.weight" in sd:
        params["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    if "head.weight" in sd:
        params["head"] = {"kernel": np.transpose(sd["head.weight"]),
                          "bias": sd["head.bias"]}
    return {"params": params}


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(1)
    src, out = sys.argv[1], sys.argv[2]

    import torch

    if src.endswith((".pt", ".pth", ".bin")):
        sd_t = torch.load(src, map_location="cpu", weights_only=False)
        if hasattr(sd_t, "state_dict"):
            sd_t = sd_t.state_dict()
        if "state_dict" in sd_t:
            sd_t = sd_t["state_dict"]
    else:  # a timm model name — requires timm + network
        import timm

        sd_t = timm.create_model(src, pretrained=True).state_dict()

    sd = {k: np.asarray(v.detach().cpu(), np.float32) for k, v in sd_t.items()}
    variables = convert_timm_state_dict(sd)

    from fer_vit_tpu.encoders.convert_psp import save_npz_variables

    save_npz_variables(variables, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
