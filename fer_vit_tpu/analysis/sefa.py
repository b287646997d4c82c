"""SeFa: closed-form semantic direction discovery + direction verification.

Capability parity with the reference ``sefa/`` package:

* :func:`factorize_weights` — eigendecomposition of AᵀA for the StyleGAN2
  mapping-network first-layer weight (reference: sefa/factorize.py:44-59),
  as a batched XLA ``jnp.linalg.eigh``.
* :func:`verify_non_expression_directions` — perturb sample latents along
  each direction by several step sizes and measure how often a trained FER
  model's predicted label changes (reference: sefa/verify_directions.py:
  38-78). The reference runs a triple Python loop (direction × sample ×
  step) of single-image forwards; here it is ONE vmapped forward over the
  whole (K × S × N) perturbation tensor.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from fer_vit_tpu.utils.compile_opts import tuned_jit

DEFAULT_STEPS = (-3.0, -1.5, 0.0, 1.5, 3.0)


def factorize_weights(
    weight: np.ndarray,  # (D_out, D_in) mapping fc0 weight
    layer_idx: Sequence[int] | None = None,
    num_semantics: int = 10,
) -> Dict[str, np.ndarray]:
    """SeFa: top eigenvectors of AᵀA as semantic directions."""
    w = jnp.asarray(np.asarray(weight, np.float32))
    if layer_idx is not None:
        w = w[np.asarray(layer_idx)]
    ata = jnp.einsum("od,oe->de", w, w, preferred_element_type=jnp.float32)
    eigenvalues, eigenvectors = jnp.linalg.eigh(ata)  # ascending
    order = jnp.argsort(eigenvalues)[::-1]
    eigenvalues = eigenvalues[order]
    eigenvectors = eigenvectors[:, order]
    return {
        "directions": np.asarray(eigenvectors[:, :num_semantics].T),
        "eigenvalues": np.asarray(eigenvalues[:num_semantics]),
    }


def factorize_stylegan_weights(
    stylegan_pkl_path: str,
    layer_idx: List[int] | None = None,
    num_semantics: int = 10,
) -> Dict[str, np.ndarray]:
    """Load a StyleGAN2 checkpoint host-side and factorize its mapping fc0
    weight (reference API: sefa/factorize.py:6-59). Accepts a pickle with
    G_ema (needs the stylegan2 code importable), a torch .pt state_dict, or
    an .npz holding the weight directly."""
    if stylegan_pkl_path.endswith(".npz"):
        with np.load(stylegan_pkl_path) as data:
            weight = np.asarray(data["weight"])
    elif stylegan_pkl_path.endswith((".pt", ".pth")):
        import torch

        sd = torch.load(stylegan_pkl_path, map_location="cpu",
                        weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        for key in ("mapping.fc0.weight", "style.1.weight", "G_ema.mapping.fc0.weight"):
            if key in sd:
                weight = np.asarray(sd[key].detach().cpu())
                break
        else:
            raise KeyError("no mapping fc0 weight found in checkpoint")
    else:
        import pickle

        with open(stylegan_pkl_path, "rb") as f:
            g = pickle.load(f)["G_ema"]
        weight = g.mapping.fc0.weight.detach().cpu().numpy()
    return factorize_weights(weight, layer_idx, num_semantics)


def verify_non_expression_directions(
    directions: np.ndarray,  # (K, D)
    sample_latents: np.ndarray,  # (N, 18, 512)
    fer_apply: Callable[[jax.Array], jax.Array],  # (B,18,512) → (B,C) logits
    step_sizes: Sequence[float] = DEFAULT_STEPS,
    max_samples: int = 50,
) -> List[dict]:
    """Label-change rate per direction, one batched forward.

    ``fer_apply`` is any jittable logits function (e.g.
    ``lambda w: model.apply(variables, w)``). A direction with LOW change
    rate is a usable non-expression direction.
    """
    w = jnp.asarray(sample_latents[:max_samples], jnp.float32)  # (N, L, D)
    d = jnp.asarray(np.asarray(directions, np.float32))  # (K, Dl)
    steps = jnp.asarray([s for s in step_sizes if s != 0.0], jnp.float32)
    n, l, dim = w.shape
    k, s = d.shape[0], steps.shape[0]

    @tuned_jit
    def run(w, d, steps):
        base_pred = jnp.argmax(fer_apply(w), axis=-1)  # (N,)
        # perturbations: (K, S, N, L, D) in one broadcast
        pert = w[None, None] + (steps[None, :, None, None, None]
                                * d[:, None, None, None, :])
        flat = pert.reshape(k * s * n, l, dim)
        preds = jnp.argmax(fer_apply(flat), axis=-1).reshape(k, s, n)
        changed = jnp.any(preds != base_pred[None, None, :], axis=1)  # (K, N)
        return jnp.mean(changed.astype(jnp.float32), axis=1)  # (K,)

    rates = np.asarray(run(w, d, steps))
    results = []
    for d_idx in range(k):
        results.append({"direction_idx": d_idx,
                        "label_change_rate": float(rates[d_idx])})
        print(f"Direction {d_idx:02d}: label change rate = {rates[d_idx]:.3f}")
    return results
