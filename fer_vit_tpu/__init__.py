"""fer_vit_tpu — a TPU-native facial-expression-recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
``yuki-ominato/FER-ViT`` reference (facial expression recognition from
StyleGAN2 ``w+`` latent codes produced by a pSp encoder).

Design principles (TPU-first, not a port):

* All compute paths are pure functions under ``jax.jit``: models are Flax
  modules, training steps are jitted closures, whole epochs run as
  ``lax.scan`` over HBM-resident data — no per-step host I/O.
* Scaling is expressed through ``jax.sharding.Mesh`` + ``NamedSharding``
  (data/model axes); XLA inserts the collectives.
* bf16 compute / f32 params by default on TPU (MXU-friendly); hot ops have
  Pallas kernels under :mod:`fer_vit_tpu.ops`.

Package map (mirrors SURVEY.md §7):

* :mod:`fer_vit_tpu.core`      — mesh/runtime: device init, sharding policy, PRNG, dtype policy
* :mod:`fer_vit_tpu.ops`       — Pallas TPU kernels + op-level building blocks
* :mod:`fer_vit_tpu.nn`        — reusable pure layers (transformer, LEAM/SPE/LWN, convs)
* :mod:`fer_vit_tpu.models`    — the FER model zoo
* :mod:`fer_vit_tpu.encoders`  — pSp / IR-SE50 / StyleGAN2 / ArcFace JAX ports
* :mod:`fer_vit_tpu.parallel`  — DP/TP partition specs over a device mesh
* :mod:`fer_vit_tpu.data`      — HBM-resident latent store, image pipeline, augmentation
* :mod:`fer_vit_tpu.train`     — train-step factory + CLI entry points
* :mod:`fer_vit_tpu.eval`      — evaluation + plotting CLIs
* :mod:`fer_vit_tpu.analysis`  — SVM expression directions, SeFa factorization
* :mod:`fer_vit_tpu.afs`       — AFS style-extractor training stack
* :mod:`fer_vit_tpu.utils`     — experiment logger, metrics, config helpers
"""

__version__ = "0.1.0"

# The 7 emotion classes, fixed everywhere in the reference
# (reference: data/image_dataset.py:30-38, models_fer_vit/latent_decomposer.py:24-27).
EMOTION_NAMES = ("angry", "disgust", "fear", "happy", "neutral", "sad", "surprise")
EMOTION_TO_INDEX = {name: i for i, name in enumerate(EMOTION_NAMES)}
NUM_CLASSES = len(EMOTION_NAMES)
