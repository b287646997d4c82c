"""The shared fit loop used by every trainer CLI.

Reproduces the reference's per-epoch protocol (reference:
train/train_latent_vit.py:307-382): train epoch → eval → unified 6-metric
logging → LR logging → param/grad histograms every 10 epochs → best
checkpoint on val macro-F1 → scheduler step → final classification report +
confusion matrix + summary JSON.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from fer_vit_tpu import EMOTION_NAMES
from fer_vit_tpu.train.harness import Harness, TrainState
from fer_vit_tpu.train.schedulers import make_scheduler
from fer_vit_tpu.utils.experiment_logger import ExperimentLogger
from fer_vit_tpu.utils.metrics import classification_report, metrics_from_confusion
from fer_vit_tpu.utils.compile_opts import tuned_jit


@tuned_jit(program_class="train", static_argnums=0)
def _grad_snapshot(harness, state, xb, yb, class_weights):
    """Gradients of the plain CE loss on one batch — for the every-10-epoch
    gradient histograms (reference: train/train_latent_vit.py:342-344)."""
    from fer_vit_tpu.train.losses import cross_entropy

    def loss_fn(params):
        variables = {"params": params}
        if harness.has_batch_stats:
            variables["batch_stats"] = state.batch_stats
        x = xb if harness.eval_transform is None else harness.eval_transform(xb)
        logits = harness.model.apply(variables, x, deterministic=True)
        return cross_entropy(logits, yb, class_weights,
                             harness.cfg.label_smoothing)

    return jax.grad(loss_fn)(state.params)


def fit(
    harness: Harness,
    state: TrainState,
    train_x: np.ndarray,
    train_y: np.ndarray,
    val_x: np.ndarray,
    val_y: np.ndarray,
    logger: ExperimentLogger,
    best_metric: str = "f1_macro",
    hist_every: int = 10,
    verbose: bool = True,
    start_epoch: int = 1,
    initial_best_f1: float = 0.0,
    scheduler_state: Dict | None = None,
    lr_group_mults=None,
) -> Dict:
    # The checkpoint summary key ('best_f1_macro'), the resume seed
    # (initial_best_f1) and the plateau scheduler's monitored quantity all
    # encode macro-F1 (the reference's fixed best criterion,
    # reference train/train_latent_vit.py:346-356). Until a caller needs a
    # different criterion AND those three are plumbed together, reject
    # anything else rather than silently mixing metrics.
    if best_metric != "f1_macro":
        raise ValueError(
            f"best_metric={best_metric!r} unsupported: checkpoint summary, "
            "resume seeding and plateau stepping are wired to 'f1_macro'")
    cfg = harness.cfg
    train_x = jnp.asarray(train_x)
    train_y = jnp.asarray(train_y, jnp.int32)
    val_x = jnp.asarray(val_x)
    val_y = jnp.asarray(val_y, jnp.int32)

    class_weights = None
    if harness.class_weights is not None:
        class_weights = jnp.asarray(harness.class_weights)

    sched = make_scheduler(cfg.scheduler, cfg.lr, cfg.epochs, eta_min=cfg.eta_min)
    base_key = jax.random.key(cfg.seed)

    best_f1 = initial_best_f1
    history = []
    if scheduler_state is not None:
        # Exact resume: checkpoints carry Scheduler.state_dict() captured
        # after that epoch's step, so restoring it replays the identical LR
        # sequence (incl. plateau decay history).
        sched.load_state_dict(scheduler_state)
    else:
        # Legacy checkpoints without scheduler state: conservatively
        # re-observe best_f1 once (approximate — plateau decays are lost).
        # 'none'/'cosine' are closed-form in the epoch index, so legacy
        # resume replays them exactly — only plateau loses history.
        if start_epoch > 1 and cfg.scheduler == "plateau":
            print(
                "WARNING: resuming from a legacy checkpoint without saved "
                "scheduler state — plateau decay history is lost; the LR "
                "sequence will NOT exactly match an uninterrupted run. "
                "Re-save with this version for exact resume.",
                flush=True)
        for past in range(1, start_epoch):
            sched.step(best_f1 if past == start_epoch - 1 else None)
    for epoch in range(start_epoch, cfg.epochs + 1):
        lr = sched.epoch_lr(epoch)
        key = jax.random.fold_in(base_key, epoch)
        state, train_loss, train_cm = harness.train_epoch(
            state, key, train_x, train_y, jnp.asarray(lr, jnp.float32),
            class_weights,
        )
        val_loss, val_cm = harness.eval_epoch(state, val_x, val_y, class_weights)

        tm = metrics_from_confusion(np.asarray(train_cm))
        vm = metrics_from_confusion(np.asarray(val_cm))
        metrics = {
            "train_loss": float(train_loss),
            "train_acc": tm["accuracy"],
            "train_f1": tm["f1_macro"],
            "val_loss": float(val_loss),
            "val_acc": vm["accuracy"],
            "val_f1": vm["f1_macro"],
        }
        history.append(metrics)
        if verbose:
            print(
                f"Epoch {epoch}/{cfg.epochs}: "
                f"train_loss={metrics['train_loss']:.4f} "
                f"train_acc={metrics['train_acc']:.4f} "
                f"train_f1={metrics['train_f1']:.4f} "
                f"val_loss={metrics['val_loss']:.4f} "
                f"val_acc={metrics['val_acc']:.4f} "
                f"val_f1={metrics['val_f1']:.4f}"
            )
        logger.log_metrics(metrics, epoch)
        # layer-wise-LR runs emit the reference's per-group tags
        # (Learning_Rate/Group_i, reference utils/experiment_logger.py:173-177)
        logger.log_learning_rate(
            [lr * m for m in lr_group_mults] if lr_group_mults else lr,
            epoch)

        if hist_every and epoch % hist_every == 0:
            bs = min(cfg.batch_size, train_x.shape[0])
            grads = _grad_snapshot(harness, state, train_x[:bs], train_y[:bs],
                                   class_weights)
            logger.log_parameters(state.params, epoch)
            logger.log_gradients(grads, epoch)

        current = vm[best_metric]
        is_best = current > best_f1
        if is_best:
            best_f1 = current
            if verbose:
                print(f"  → Best model (F1: {best_f1:.4f})")
        # Step the scheduler before checkpointing so the saved
        # scheduler_state is exactly the state a resume at epoch+1 needs.
        # (The LR for this epoch was already fetched above; the reference
        # steps after saving, but its checkpoints hold no scheduler state,
        # so the ordering is unobservable on its side.)
        sched.step(metrics["val_f1"])

        # EVERY epoch: the logger overwrites last_model.pt each call and
        # best_model.pt on is_best. The reference's trainers only call
        # their logger on best epochs (train_latent_vit.py:346-350), but
        # its logger's own contract says last_model.pt should hold the
        # FINAL epoch (utils/experiment_logger.py:134-136) — and this
        # rebuild's --resume extension is only sound if it does: a crash
        # after the last improvement must not lose those epochs, and a
        # resumed run that never improves must still leave a checkpoint.
        val_summary = {
            "loss": metrics["val_loss"],
            "accuracy": metrics["val_acc"],
            "f1_macro": metrics["val_f1"],
            "f1_weighted": vm["f1_weighted"],
            # running best, so resume restores best-model tracking
            # exactly (this epoch's f1 alone would understate it when
            # the checkpointed epoch isn't the best one)
            "best_f1_macro": best_f1,
        }
        logger.save_checkpoint(state, epoch, val_summary, is_best,
                               scheduler_state=sched.state_dict())

    # Final evaluation + report (reference: train_latent_vit.py:358-382).
    # The last loop iteration already evaluated this exact state (nothing
    # mutates it afterwards), so only re-evaluate when no epoch ran
    # (e.g. resuming a checkpoint at or past cfg.epochs).
    if not history:
        val_loss, val_cm = harness.eval_epoch(state, val_x, val_y, class_weights)
        vm = metrics_from_confusion(np.asarray(val_cm))
    names = [n.capitalize() for n in EMOTION_NAMES]
    if verbose:
        print("\nClassification Report:")
        print(classification_report(np.asarray(val_cm), names))
    logger.log_confusion_matrix(None, None, names, cfg.epochs,
                                cm=np.asarray(val_cm))
    final_metrics = {
        "accuracy": vm["accuracy"],
        "f1_macro": vm["f1_macro"],
        "f1_weighted": vm["f1_weighted"],
        "best_f1_macro": best_f1,
    }
    return {
        "state": state,
        "best_f1": best_f1,
        "final_metrics": final_metrics,
        "final_confusion": np.asarray(val_cm),
        "history": history,
    }
