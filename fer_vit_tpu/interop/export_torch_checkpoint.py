"""Export a framework checkpoint to the reference's torch ``.pt`` format.

The inverse interop direction: a model trained here becomes loadable by the
reference's checkpoint-polymorphic eval stack (reference:
eval/evaluate_model.py:30-132 expects ``{epoch, model_state_dict, metrics,
config, run_id}`` with reference module key names).

Usage:
    python -m fer_vit_tpu.interop.export_torch_checkpoint \
        experiments/<run>/checkpoints/best_model.pt --output model_torch.pt
"""

from __future__ import annotations

import argparse


def export_checkpoint(checkpoint_path: str, output_path: str) -> dict:
    import torch

    from fer_vit_tpu.eval.evaluate_model import (
        _is_torch_checkpoint,
        load_model,
    )
    from fer_vit_tpu.interop import (
        model_kind_from_config,
        to_torch_state_dict,
    )

    if _is_torch_checkpoint(checkpoint_path):
        raise SystemExit(
            f"{checkpoint_path} is already a torch-format checkpoint; "
            "export converts this framework's flax-msgpack checkpoints "
            "only (the reference can read it as-is).")
    model, variables, config, meta = load_model(checkpoint_path,
                                                with_meta=True)
    model_config = config.get("model", config)
    kind = model_kind_from_config(model_config)
    sd = to_torch_state_dict(kind, variables["params"],
                             variables.get("batch_stats"),
                             config=model_config)
    payload = {
        "epoch": meta["epoch"],
        "model_state_dict": sd,
        "metrics": meta["metrics"],
        "config": config,
        "run_id": meta["run_id"],
    }
    torch.save(payload, output_path)
    print(f"Exported {kind} checkpoint → {output_path} "
          f"({len(sd)} state_dict entries)")
    return payload


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Export a fer_vit_tpu checkpoint to reference torch "
                    "format")
    parser.add_argument("checkpoint")
    parser.add_argument("--output", required=True)
    return parser


def main(args) -> dict:
    return export_checkpoint(args.checkpoint, args.output)


if __name__ == "__main__":
    main(build_parser().parse_args())
