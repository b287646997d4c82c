"""Torch-checkpoint interop for the FER model zoo (VERDICT r2 #3).

The reference's eval stack is polymorphic over *torch* checkpoints
(reference: eval/evaluate_model.py:30-132). This package provides
bidirectional ``state_dict ↔ Flax pytree`` converters for every FER model
family so a reference-trained ``.pt`` evaluates in this framework and a
framework-trained model exports to a reference-readable ``.pt``.
"""

from fer_vit_tpu.interop.torch_state import (  # noqa: F401
    from_torch_state_dict,
    model_kind_from_config,
    read_torch_checkpoint,
    style_extractor_from_torch_state_dict,
    style_extractor_to_torch_state_dict,
    to_torch_state_dict,
)
