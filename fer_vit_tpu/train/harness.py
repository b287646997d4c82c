"""The shared training engine: jitted train/eval epochs as ``lax.scan``.

Every reference trainer shares one template (SURVEY.md §2.4): seeded
determinism, class-balanced subsetting, inverse-frequency class weights,
AdamW + none/cosine/plateau schedules, mixup with a second clean forward for
train metrics (reference: train/train_latent_vit.py:108-148), best
checkpoint on val macro-F1, unified 6-metric logging. This module is that
template built TPU-first:

* The full dataset lives in HBM (:mod:`fer_vit_tpu.data.latent_store`); an
  **entire epoch** is one jitted ``lax.scan`` over shuffled index batches —
  augmentation, mixup, forward/backward, optimizer update, and metric
  accumulation (confusion matrix) all fuse into a single XLA program with
  zero per-step host round-trips.
* The last partial batch is padded to static shape and masked (the
  reference's DataLoader keeps partial batches; loss/metric normalization
  accounts for the mask exactly).
* LR arrives each epoch as a scalar argument (plateau schedules can't be
  baked into the program); the optimizer runs at lr=1 and the step scales
  updates by ``lr × per-leaf multiplier`` — which also implements layer-wise
  LR groups and optax-mask freezing without recompilation.
* Data parallelism: batches are sharding-constrained over the mesh ``data``
  axis inside the step; XLA inserts the gradient all-reduce over ICI.

Under mixup the reference does a second, clean (non-mixed) forward in train
mode for the train metrics (train/train_latent_vit.py:138-141) — reproduced
here, including its BatchNorm running-stat update side effect.
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import PartitionSpec as P

from fer_vit_tpu.core.mesh import DATA_AXIS
from fer_vit_tpu.data.latent_augment import LatentAugmentConfig, latent_augment
from fer_vit_tpu.train.losses import cross_entropy
from fer_vit_tpu.utils.compile_opts import tuned_jit
from fer_vit_tpu.utils.metrics import confusion_update


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any  # {} for BN-free models
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 60
    batch_size: int = 64
    lr: float = 1e-4
    weight_decay: float = 1e-2
    optimizer: str = "adamw"  # adamw | sgd
    momentum: float = 0.9  # sgd only
    scheduler: str = "plateau"  # none | cosine | plateau | warmup_cosine
    label_smoothing: float = 0.1
    mixup: float = 1.0  # Beta(α, α); 0 disables
    grad_clip: float = 0.0  # 0 disables
    use_class_weights: bool = False
    num_classes: int = 7
    seed: int = 42
    augment: Optional[LatentAugmentConfig] = None
    eta_min: float = 0.0  # cosine floor (image trainer uses lr*0.01)
    # Train-metric source: the reference LATENT trainers run a clean
    # no-grad forward after the step UNCONDITIONALLY (even with mixup 0 —
    # reference train/train_latent_vit.py:138-141, train_latent_cnn.py:134)
    # while the image/hybrid trainers take metrics from the training
    # forward itself. None = auto (clean forward iff mixup > 0; the
    # pre-flag behavior); latent trainers pass True.
    clean_metrics_forward: Optional[bool] = None


def make_optimizer(cfg: TrainConfig,
                   wd_mask=None) -> optax.GradientTransformation:
    """Optimizer producing the descent direction at lr=1; the step multiplies
    by the per-epoch lr (and per-leaf multipliers). AdamW's weight decay is
    inside the direction, so it scales with lr exactly as torch couples them.
    ``wd_mask``: optional bool pytree — False leaves get no weight decay
    (the reference's pos/CLS group, train_hybrid_latent_vit.py:108-113)."""
    chain = []
    if cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.optimizer == "adamw":
        chain.append(
            optax.adamw(1.0, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=cfg.weight_decay, mask=wd_mask)
        )
    elif cfg.optimizer == "sgd":
        # torch SGD: grad += wd·p, then momentum buffer, then −lr·buf.
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
        if cfg.momentum > 0:
            chain.append(optax.trace(decay=cfg.momentum))
        chain.append(optax.scale(-1.0))
    else:
        raise ValueError(f"unknown optimizer: {cfg.optimizer!r}")
    return optax.chain(*chain)


@dataclasses.dataclass(eq=False)  # identity hash: instances key the jit cache
class Harness:
    """Jitted train/eval epoch runners for one model + config.

    ``apply_fn(variables, x, deterministic, rngs, mutable)`` is the Flax
    apply; ``lr_mult`` is an optional per-leaf multiplier pytree (layer-wise
    LR and/or 0.0-freezing).
    """

    model: Any
    cfg: TrainConfig
    class_weights: Optional[np.ndarray] = None
    lr_mult: Any = None  # pytree matching params, or None
    mesh: Any = None  # optional jax.sharding.Mesh for DP constraints
    augment_fn: Any = None  # (key, xb) -> xb; overrides cfg.augment
    eval_transform: Any = None  # (xb) -> xb applied before eval forwards
    wd_mask: Any = None  # bool pytree: False = no weight decay on that leaf
    has_batch_stats: bool = dataclasses.field(default=False, init=False)
    accepts_mask: bool = dataclasses.field(default=False, init=False)
    _predict_jit: Any = dataclasses.field(default=None, init=False)

    # -- state --------------------------------------------------------------

    def init_state(self, rng: jax.Array, sample_input: jax.Array) -> TrainState:
        variables = self.model.init(rng, sample_input)
        params = variables["params"]
        # torch nn.TransformerEncoder deep-copies one layer, so the
        # reference's layers start identical at init; models that inherit
        # that quirk declare torch_clone_init ("full" / "in_proj") and the
        # fresh init is patched to match the reference's joint distribution
        clone_mode = getattr(self.model, "torch_clone_init", None)
        if clone_mode:
            from fer_vit_tpu.nn.transformer import clone_torch_encoder_init

            params = clone_torch_encoder_init(params, clone_mode)
        self.has_batch_stats = "batch_stats" in variables
        # Models with MaskedBatchNorm accept mask= so the padded final
        # batch's zero rows are excluded from batch statistics (the
        # reference shrinks that batch instead; see nn/masked_batchnorm.py).
        try:
            sig = inspect.signature(type(self.model).__call__)
            self.accepts_mask = "mask" in sig.parameters
        except (TypeError, ValueError):
            self.accepts_mask = False
        batch_stats = variables.get("batch_stats", {})
        tx = make_optimizer(self.cfg, self.wd_mask)
        opt_state = tx.init(params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state)

    # -- model application --------------------------------------------------

    def _apply_train(self, params, batch_stats, x, rng, mask=None):
        variables = {"params": params}
        kw = {}
        if mask is not None and self.accepts_mask:
            kw["mask"] = mask
        if self.has_batch_stats:
            variables["batch_stats"] = batch_stats
            logits, upd = self.model.apply(
                variables, x, deterministic=False, rngs={"dropout": rng},
                mutable=["batch_stats"], **kw,
            )
            return logits, upd["batch_stats"]
        logits = self.model.apply(
            variables, x, deterministic=False, rngs={"dropout": rng}, **kw
        )
        return logits, batch_stats

    def _apply_eval(self, params, batch_stats, x):
        variables = {"params": params}
        if self.has_batch_stats:
            variables["batch_stats"] = batch_stats
        return self.model.apply(variables, x, deterministic=True)

    def _constrain_batch(self, x):
        if self.mesh is None:
            return x
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(self.mesh, spec)
        )

    # -- single steps -------------------------------------------------------

    def train_step(
        self,
        state: TrainState,
        key: jax.Array,
        xb: jax.Array,
        yb: jax.Array,
        mask: jax.Array,
        lr: jax.Array,
        class_weights: Optional[jax.Array],
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        cfg = self.cfg
        tx = make_optimizer(cfg, self.wd_mask)
        k_aug, k_mix, k_perm, k_drop, k_drop2 = jax.random.split(key, 5)

        xb = self._constrain_batch(xb)
        if self.augment_fn is not None:
            xb = self.augment_fn(k_aug, xb)
        elif cfg.augment is not None and cfg.augment.enabled:
            xb = latent_augment(k_aug, xb, cfg.augment)

        b = xb.shape[0]
        if cfg.mixup > 0:
            lam = jax.random.beta(k_mix, cfg.mixup, cfg.mixup)
        else:
            lam = jnp.asarray(1.0, jnp.float32)
        perm0 = jax.random.permutation(k_perm, b)
        # Pad-safe pairing: a row keeps its sampled partner only when BOTH
        # rows are real; otherwise it self-mixes (input stays exact,
        # lam·CE + (1−lam)·CE = plain CE — no contamination in either
        # direction: real rows never see pad content, pad slots never
        # absorb real content). Pad rows are additionally zeroed so their
        # values are deterministic. For full batches perm == perm0,
        # identical to the reference's randperm mixing; only the final
        # partial batch differs (the reference shrinks the batch there).
        # BN models: the row mask is threaded into the forward so
        # MaskedBatchNorm excludes the zero pad rows from batch
        # statistics, matching the reference's shrunken final batch
        # (see nn/masked_batchnorm.py for the measured impact).
        perm = jnp.where((mask > 0) & (mask[perm0] > 0),
                         perm0, jnp.arange(b))
        row_mask = mask.reshape((b,) + (1,) * (xb.ndim - 1)).astype(xb.dtype)
        xb = xb * row_mask
        lam_x = lam.astype(xb.dtype)
        x_mixed = lam_x * xb + (1.0 - lam_x) * xb[perm]
        yb_perm = yb[perm]

        def loss_fn(params):
            logits, new_bs = self._apply_train(params, state.batch_stats,
                                               x_mixed, k_drop, mask=mask)
            loss_a = cross_entropy(logits, yb, class_weights,
                                   cfg.label_smoothing, mask)
            # after the redirect both label streams share the row's own
            # validity (real rows mix with real rows, pads with pads)
            loss_b = cross_entropy(logits, yb_perm, class_weights,
                                   cfg.label_smoothing, mask)
            return lam * loss_a + (1.0 - lam) * loss_b, (new_bs, logits)

        (loss, (new_bs, logits_mixed)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if self.lr_mult is None:
            updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        else:
            updates = jax.tree_util.tree_map(
                lambda u, m: u * (lr * m), updates, self.lr_mult
            )
        new_params = optax.apply_updates(state.params, updates)

        clean_fwd = (cfg.mixup > 0 if cfg.clean_metrics_forward is None
                     else cfg.clean_metrics_forward)
        if clean_fwd:
            # Clean post-step forward in train mode for train metrics
            # (reference: train/train_latent_vit.py:138-141 — run there
            # unconditionally, so latent trainers set the flag even for
            # --mixup 0).
            logits_clean, new_bs2 = self._apply_train(new_params, new_bs, xb,
                                                      k_drop2, mask=mask)
            preds = jnp.argmax(logits_clean, axis=-1)
        else:
            # The image/hybrid reference trainers record metrics from the
            # training forward itself (train/train_image_vit.py:128-137).
            preds = jnp.argmax(logits_mixed, axis=-1)
            new_bs2 = new_bs

        new_state = state.replace(params=new_params, batch_stats=new_bs2,
                                  opt_state=new_opt)
        n_valid = jnp.sum(mask.astype(jnp.float32))
        stats = {
            "loss_sum": loss * n_valid,
            "n": n_valid,
            "preds": preds,
            "labels": yb,
            "mask": mask,
        }
        return new_state, stats

    def eval_step(self, state, xb, yb, mask, class_weights):
        xb = self._constrain_batch(xb)
        if self.eval_transform is not None:
            xb = self.eval_transform(xb)
        logits = self._apply_eval(state.params, state.batch_stats, xb)
        loss = cross_entropy(logits, yb, class_weights,
                             self.cfg.label_smoothing, mask)
        preds = jnp.argmax(logits, axis=-1)
        n_valid = jnp.sum(mask.astype(jnp.float32))
        return {"loss_sum": loss * n_valid, "n": n_valid, "preds": preds,
                "labels": yb, "mask": mask, "logits": logits}

    # -- whole-epoch scans --------------------------------------------------

    def _batched_indices(self, key: Optional[jax.Array], n: int):
        """(steps, B) index array padded with −1; shuffled when key given."""
        bs = self.cfg.batch_size
        steps = -(-n // bs)
        if key is not None:
            perm = jax.random.permutation(key, n)
        else:
            perm = jnp.arange(n)
        pad = steps * bs - n
        idx = jnp.concatenate([perm, jnp.full((pad,), -1, perm.dtype)])
        return idx.reshape(steps, bs)

    @tuned_jit(program_class="train", static_argnums=0, donate_argnums=1)
    def train_epoch(self, state, key, data_x, data_y, lr, class_weights):
        """One full epoch: shuffle → scan(train_step) → (state, loss, cm)."""
        n = data_x.shape[0]
        k_shuffle, k_steps = jax.random.split(key)
        idx = self._batched_indices(k_shuffle, n)

        def body(carry, scan_in):
            state, loss_sum, n_sum, cm = carry
            step_i, idx_b = scan_in
            mask = idx_b >= 0
            safe = jnp.maximum(idx_b, 0)
            xb = jnp.take(data_x, safe, axis=0)
            yb = jnp.take(data_y, safe, axis=0)
            k = jax.random.fold_in(k_steps, step_i)
            state, stats = self.train_step(state, k, xb, yb, mask, lr,
                                           class_weights)
            cm = confusion_update(cm, stats["preds"], stats["labels"],
                                  stats["mask"])
            return (state, loss_sum + stats["loss_sum"],
                    n_sum + stats["n"], cm), None

        c = self.cfg.num_classes
        steps = idx.shape[0]
        init = (state, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                jnp.zeros((c, c), jnp.float32))
        (state, loss_sum, n_sum, cm), _ = jax.lax.scan(
            body, init, (jnp.arange(steps), idx)
        )
        return state, loss_sum / jnp.maximum(n_sum, 1.0), cm

    @tuned_jit(program_class="train", static_argnums=0)
    def eval_epoch(self, state, data_x, data_y, class_weights):
        n = data_x.shape[0]
        idx = self._batched_indices(None, n)

        def body(carry, idx_b):
            loss_sum, n_sum, cm = carry
            mask = idx_b >= 0
            safe = jnp.maximum(idx_b, 0)
            xb = jnp.take(data_x, safe, axis=0)
            yb = jnp.take(data_y, safe, axis=0)
            stats = self.eval_step(state, xb, yb, mask, class_weights)
            cm = confusion_update(cm, stats["preds"], stats["labels"],
                                  stats["mask"])
            return (loss_sum + stats["loss_sum"], n_sum + stats["n"], cm), None

        c = self.cfg.num_classes
        init = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                jnp.zeros((c, c), jnp.float32))
        (loss_sum, n_sum, cm), _ = jax.lax.scan(body, init, idx)
        return loss_sum / jnp.maximum(n_sum, 1.0), cm

    def predictions(self, state, data_x, batch_size: Optional[int] = None):
        """Full-dataset predictions + probabilities (for reports/eval CLIs).

        The final chunk is zero-padded to the static batch size and the
        padding rows are sliced off after the forward, so the whole dataset
        costs exactly one XLA compile — consistent with the pad-to-static
        discipline of the epoch scans above (previously the ragged tail
        triggered one extra compile per distinct remainder size)."""
        bs = batch_size or self.cfg.batch_size
        if self._predict_jit is None:
            def _fn(params, batch_stats, x):
                if self.eval_transform is not None:
                    x = self.eval_transform(x)
                return self._apply_eval(params, batch_stats, x)

            # tuned_jit re-resolves per (platform, env) on every call, so
            # a CPU-first call or a later FERVIT_COMPILER_OPTIONS flip
            # can't pin stale options on this path (unlike a one-shot
            # jax.jit cached on the instance).
            self._predict_jit = tuned_jit(_fn, program_class="inference")
        outs = []
        for i in range(0, data_x.shape[0], bs):
            xb = np.asarray(data_x[i : i + bs])
            valid = xb.shape[0]
            if valid < bs:
                pad = np.zeros((bs - valid,) + xb.shape[1:], xb.dtype)
                xb = np.concatenate([xb, pad])
            logits = self._predict_jit(state.params, state.batch_stats,
                                       jnp.asarray(xb))
            outs.append(np.asarray(logits)[:valid])
        logits = np.concatenate(outs) if outs else np.zeros((0, self.cfg.num_classes))
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        return logits.argmax(axis=-1), probs
