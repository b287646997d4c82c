"""Training-harness tests: loss parity vs torch, metrics parity vs sklearn,
epoch mechanics, schedulers, checkpoint roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fer_vit_tpu.models import LatentViT
from fer_vit_tpu.train.harness import Harness, TrainConfig
from fer_vit_tpu.train.losses import cross_entropy
from fer_vit_tpu.train.schedulers import make_scheduler
from fer_vit_tpu.utils.metrics import (
    classification_report,
    confusion_update,
    metrics_from_confusion,
)


class TestCrossEntropyTorchParity:
    """Our CE must equal torch's CrossEntropyLoss bit-for-bit in semantics
    (weighted mean normalization + label smoothing interaction)."""

    @pytest.mark.parametrize("smoothing", [0.0, 0.1])
    @pytest.mark.parametrize("weighted", [False, True])
    def test_matches_torch(self, smoothing, weighted):
        import torch

        rng = np.random.default_rng(0)
        logits = rng.normal(size=(16, 7)).astype(np.float32)
        labels = rng.integers(0, 7, size=16)
        weights = rng.uniform(0.5, 2.0, size=7).astype(np.float32) if weighted else None

        crit = torch.nn.CrossEntropyLoss(
            weight=torch.tensor(weights) if weighted else None,
            label_smoothing=smoothing,
        )
        expected = crit(torch.tensor(logits), torch.tensor(labels)).item()

        got = float(
            cross_entropy(
                jnp.asarray(logits),
                jnp.asarray(labels),
                jnp.asarray(weights) if weighted else None,
                smoothing,
            )
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5)


class TestMetricsSklearnParity:
    def test_matches_sklearn(self):
        from sklearn.metrics import accuracy_score, f1_score

        rng = np.random.default_rng(1)
        y_true = rng.integers(0, 7, size=500)
        y_pred = rng.integers(0, 7, size=500)

        cm = np.asarray(
            confusion_update(
                jnp.zeros((7, 7)), jnp.asarray(y_pred), jnp.asarray(y_true),
                jnp.ones(500),
            )
        )
        m = metrics_from_confusion(cm)
        np.testing.assert_allclose(m["accuracy"], accuracy_score(y_true, y_pred))
        np.testing.assert_allclose(
            m["f1_macro"], f1_score(y_true, y_pred, average="macro"), rtol=1e-9
        )
        np.testing.assert_allclose(
            m["f1_weighted"], f1_score(y_true, y_pred, average="weighted"),
            rtol=1e-9,
        )

    def test_matches_sklearn_with_absent_class(self):
        """sklearn's macro-F1 (labels=None) averages only over labels seen
        in y_true ∪ y_pred; a class absent from the val split must not
        deflate macro-F1 (ADVICE r1: best-ckpt selection depends on it)."""
        from sklearn.metrics import f1_score

        rng = np.random.default_rng(2)
        # classes 5 and 6 never appear in labels or predictions
        y_true = rng.integers(0, 5, size=300)
        y_pred = rng.integers(0, 5, size=300)
        cm = np.asarray(
            confusion_update(
                jnp.zeros((7, 7)), jnp.asarray(y_pred), jnp.asarray(y_true),
                jnp.ones(300),
            )
        )
        m = metrics_from_confusion(cm)
        np.testing.assert_allclose(
            m["f1_macro"], f1_score(y_true, y_pred, average="macro"),
            rtol=1e-9,
        )

    def test_report_runs(self):
        cm = np.eye(7) * 10
        rep = classification_report(cm, [f"c{i}" for i in range(7)])
        assert "accuracy" in rep


def _toy_problem(n=96):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 18, 512)).astype(np.float32)
    y = x[:, 0, :7].argmax(axis=1).astype(np.int32)
    return x, y


def _harness(**cfg_kw):
    model = LatentViT(depth=1, embed_dim=64, heads=2, mlp_dim=128)
    cfg = TrainConfig(epochs=3, batch_size=32, lr=1e-3, **cfg_kw)
    h = Harness(model=model, cfg=cfg)
    state = h.init_state(jax.random.key(0), jnp.zeros((1, 18, 512)))
    return h, state


class TestHarness:
    def test_loss_decreases(self):
        x, y = _toy_problem()
        h, state = _harness(mixup=0.0)
        tx, ty = jnp.asarray(x), jnp.asarray(y)
        losses = []
        for e in range(4):
            state, loss, _ = h.train_epoch(
                state, jax.random.key(e), tx, ty, jnp.float32(1e-3), None
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_partial_batch_counts_every_sample_once(self):
        x, y = _toy_problem(n=70)  # 70/32 → 3 padded batches
        h, state = _harness()
        vl, cm = h.eval_epoch(state, jnp.asarray(x), jnp.asarray(y), None)
        assert float(np.asarray(cm).sum()) == 70

    def test_mixup_gradients_independent_of_pad_content(self):
        """Mixup on a padded partial batch must not leak pad-slot CONTENT
        into the update: real rows whose sampled partner is padding
        self-mix and the (1−lam) loss stream is masked per row, so two
        train_steps that differ only in pad-slot values produce identical
        parameters (the reference mixes within the shrunk real batch)."""
        h, state = _harness(mixup=1.0)
        b, n_real = 32, 5
        rng = np.random.default_rng(3)
        xr = rng.normal(size=(n_real, 18, 512)).astype(np.float32)
        yr = (np.arange(n_real) % 7).astype(np.int32)
        mask = jnp.asarray((np.arange(b) < n_real).astype(np.float32))

        def step_with_pads(pad_fill):
            xb = np.concatenate(
                [xr, np.full((b - n_real, 18, 512), pad_fill, np.float32)])
            yb = np.concatenate([yr, np.zeros(b - n_real, np.int32)])
            new_state, _ = h.train_step(
                state, jax.random.key(7), jnp.asarray(xb), jnp.asarray(yb),
                mask, jnp.float32(1e-3), None)
            return new_state.params

        p_a = step_with_pads(0.0)
        p_b = step_with_pads(1e3)  # wildly different pad content
        for la, lb in zip(jax.tree_util.tree_leaves(p_a),
                          jax.tree_util.tree_leaves(p_b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_mixup_and_augment_path(self):
        from fer_vit_tpu.data.latent_augment import get_latent_train_transforms

        x, y = _toy_problem()
        h, state = _harness(
            mixup=1.0, augment=get_latent_train_transforms(0.1, (0.9, 1.1), 0.1)
        )
        state, loss, cm = h.train_epoch(
            state, jax.random.key(0), jnp.asarray(x), jnp.asarray(y),
            jnp.float32(1e-3), None,
        )
        assert np.isfinite(float(loss))
        assert float(np.asarray(cm).sum()) == x.shape[0]

    def test_clean_metrics_forward_flag(self):
        """The flag controls the train-metric source (ADVICE r2): latent
        trainers run a clean POST-step forward even with mixup 0 (reference
        train/train_latent_vit.py:138-141); image/hybrid trainers take
        metrics from the training forward itself. Observable with dropout 0:
        flag=True preds match the updated params, flag=False the pre-step
        params."""
        x, y = _toy_problem(n=32)
        xb, yb = jnp.asarray(x), jnp.asarray(y)
        mask = jnp.ones(32)
        results = {}
        for flag in (True, False):
            model = LatentViT(depth=1, embed_dim=64, heads=2, mlp_dim=128,
                              dropout=0.0)
            cfg = TrainConfig(epochs=1, batch_size=32, lr=1e-1, mixup=0.0,
                              clean_metrics_forward=flag)
            h = Harness(model=model, cfg=cfg)
            state = h.init_state(jax.random.key(0), jnp.zeros((1, 18, 512)))
            new_state, stats = h.train_step(
                state, jax.random.key(1), xb, yb, mask, jnp.float32(1e-1),
                None)
            results[flag] = (h, state, new_state, np.asarray(stats["preds"]))

        h, _, new_state, preds_clean = results[True]
        post = np.asarray(jnp.argmax(
            h._apply_eval(new_state.params, new_state.batch_stats, xb), -1))
        np.testing.assert_array_equal(preds_clean, post)

        h0, state0, _, preds_train = results[False]
        pre = np.asarray(jnp.argmax(
            h0._apply_eval(state0.params, state0.batch_stats, xb), -1))
        np.testing.assert_array_equal(preds_train, pre)
        # the lr is big enough that the two sources genuinely disagree
        assert (preds_clean != preds_train).any()

    def test_determinism_same_seed(self):
        x, y = _toy_problem()
        outs = []
        for _ in range(2):
            h, state = _harness()
            state, loss, cm = h.train_epoch(
                state, jax.random.key(7), jnp.asarray(x), jnp.asarray(y),
                jnp.float32(1e-3), None,
            )
            outs.append((float(loss), np.asarray(cm)))
        assert outs[0][0] == outs[1][0]
        np.testing.assert_array_equal(outs[0][1], outs[1][1])

    def test_grad_clip_config(self):
        x, y = _toy_problem()
        h, state = _harness(grad_clip=1.0)
        state, loss, _ = h.train_epoch(
            state, jax.random.key(0), jnp.asarray(x), jnp.asarray(y),
            jnp.float32(1e-3), None,
        )
        assert np.isfinite(float(loss))

    def test_lr_mult_freezes(self):
        """A 0.0 lr multiplier must keep those params bit-identical."""
        x, y = _toy_problem()
        model = LatentViT(depth=1, embed_dim=64, heads=2, mlp_dim=128)
        cfg = TrainConfig(epochs=1, batch_size=32, lr=1e-3, mixup=0.0)
        h = Harness(model=model, cfg=cfg)
        state = h.init_state(jax.random.key(0), jnp.zeros((1, 18, 512)))
        mult = jax.tree_util.tree_map(lambda _: 1.0, state.params)
        mult["input_proj"] = jax.tree_util.tree_map(
            lambda _: 0.0, mult["input_proj"]
        )
        h.lr_mult = mult
        before = np.asarray(state.params["input_proj"]["kernel"])
        state, _, _ = h.train_epoch(
            state, jax.random.key(0), jnp.asarray(x), jnp.asarray(y),
            jnp.float32(1e-3), None,
        )
        np.testing.assert_array_equal(
            before, np.asarray(state.params["input_proj"]["kernel"])
        )
        # and something else did move
        assert not np.allclose(
            np.asarray(state.params["head"]["kernel"]),
            np.asarray(h.init_state(jax.random.key(0),
                                    jnp.zeros((1, 18, 512))).params["head"]["kernel"]),
        )


class TestSchedulers:
    def test_cosine_matches_torch_closed_form(self):
        s = make_scheduler("cosine", 1e-3, epochs=10)
        assert s.epoch_lr(1) == pytest.approx(1e-3)
        assert s.epoch_lr(11) == pytest.approx(0.0, abs=1e-12)
        assert s.epoch_lr(6) == pytest.approx(1e-3 * 0.5 * (1 + np.cos(np.pi / 2)))

    def test_plateau_halves_after_patience(self):
        s = make_scheduler("plateau", 1e-3, epochs=100)
        s.step(0.5)  # best
        for _ in range(5):
            s.step(0.4)
        assert s.epoch_lr(7) == pytest.approx(1e-3)  # patience not yet exceeded
        s.step(0.4)  # 6th bad epoch > patience 5
        assert s.epoch_lr(8) == pytest.approx(5e-4)

    def test_warmup_cosine(self):
        s = make_scheduler("warmup_cosine", 1e-3, epochs=100)
        assert s.warmup == 10
        assert s.epoch_lr(1) == pytest.approx(1e-4)
        assert s.epoch_lr(10) == pytest.approx(1e-3)
        assert s.epoch_lr(100) < 1e-4


class TestSchedulerStateResume:
    def test_plateau_state_dict_preserves_decay_history(self):
        """Round-tripping state_dict must preserve the decayed LR and the
        bad-epoch counter — the round-1 replay lost both."""
        s = make_scheduler("plateau", 1e-3, epochs=100)
        s.step(0.5)  # best
        for _ in range(6):  # 6 bad epochs > patience 5 → halve
            s.step(0.4)
        s.step(0.45)  # 1 more bad epoch after the decay
        assert s.lr == pytest.approx(5e-4)
        assert s.num_bad == 1

        s2 = make_scheduler("plateau", 1e-3, epochs=100)
        s2.load_state_dict(s.state_dict())
        # continuing both with the same metrics yields the same LR sequence
        for m in [0.4] * 7:
            s.step(m)
            s2.step(m)
            assert s2.lr == pytest.approx(s.lr)
        assert s.lr == pytest.approx(2.5e-4)  # a second decay happened

    def test_fit_resume_identical_to_straight_run(self, tmp_path):
        """Resume at epoch k must replay the exact LR sequence and metrics
        of an uninterrupted run (VERDICT r1 #7)."""
        import json
        import os

        from fer_vit_tpu.train.loop import fit
        from fer_vit_tpu.utils.experiment_logger import ExperimentLogger

        rng = np.random.default_rng(0)
        x = rng.normal(size=(64, 18, 512)).astype(np.float32)
        y = (np.arange(64) % 7).astype(np.int32)
        vx = rng.normal(size=(32, 18, 512)).astype(np.float32)
        vy = (np.arange(32) % 7).astype(np.int32)

        def build(epochs):
            model = LatentViT(depth=1, embed_dim=32, heads=2, mlp_dim=64)
            cfg = TrainConfig(epochs=epochs, batch_size=32, lr=1e-3,
                              mixup=0.0, scheduler="plateau")
            h = Harness(model=model, cfg=cfg)
            state = h.init_state(jax.random.key(0), jnp.zeros((1, 18, 512)))
            return h, state

        def lr_sequence(logger):
            lrs = {}
            with open(os.path.join(logger.run_dir, "logs",
                                   "scalars.jsonl")) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["tag"] == "Learning_Rate/Group_0":
                        lrs[rec["step"]] = rec["value"]
            return lrs

        # Straight 6-epoch run.
        h, state = build(6)
        log_a = ExperimentLogger("straight", base_dir=str(tmp_path))
        res_a = fit(h, state, x, y, vx, vy, log_a, hist_every=0,
                    verbose=False)
        log_a.close()

        # Interrupted: 3 epochs, then resume 4..6 from the checkpoint.
        h, state = build(3)
        log_b1 = ExperimentLogger("part1", base_dir=str(tmp_path))
        fit(h, state, x, y, vx, vy, log_b1, hist_every=0, verbose=False)
        log_b1.close()
        ckpt = os.path.join(log_b1.run_dir, "checkpoints", "last_model.pt")

        h2, template = build(6)
        loaded = ExperimentLogger.load_checkpoint(ckpt,
                                                  state_template=template)
        assert loaded["scheduler_state"] is not None
        assert loaded["epoch"] == 3
        log_b2 = ExperimentLogger("part2", base_dir=str(tmp_path))
        res_b = fit(
            h2, loaded["state"], x, y, vx, vy, log_b2, hist_every=0,
            verbose=False,
            start_epoch=4,
            initial_best_f1=float(loaded["metrics"]["best_f1_macro"]),
            scheduler_state=loaded["scheduler_state"],
        )
        log_b2.close()

        # Epochs 4-6 of the resumed run == epochs 4-6 of the straight run.
        for ea, eb in zip(res_a["history"][3:], res_b["history"]):
            for k in ea:
                assert ea[k] == pytest.approx(eb[k], abs=1e-6), (k, ea, eb)
        lrs_a, lrs_b = lr_sequence(log_a), lr_sequence(log_b2)
        for epoch in (4, 5, 6):
            assert lrs_a[epoch] == pytest.approx(lrs_b[epoch])
        assert res_a["best_f1"] == pytest.approx(res_b["best_f1"])


class TestGroupLRTags:
    def test_fit_emits_per_group_lr_tags(self, tmp_path):
        """A layer-wise-LR run must emit the reference's per-group TB tags
        (Learning_Rate/Group_i, a frozen contract — reference
        utils/experiment_logger.py:173-177) with lr × group multiplier."""
        import json
        import os

        from fer_vit_tpu.train.loop import fit
        from fer_vit_tpu.utils.experiment_logger import ExperimentLogger

        rng = np.random.default_rng(0)
        x = rng.normal(size=(32, 18, 512)).astype(np.float32)
        y = (np.arange(32) % 7).astype(np.int32)
        model = LatentViT(depth=1, embed_dim=32, heads=2, mlp_dim=64)
        cfg = TrainConfig(epochs=2, batch_size=32, lr=1e-3, mixup=0.0,
                          scheduler="none")
        h = Harness(model=model, cfg=cfg)
        state = h.init_state(jax.random.key(0), jnp.zeros((1, 18, 512)))
        logger = ExperimentLogger("groups", base_dir=str(tmp_path))
        fit(h, state, x, y, x, y, logger, hist_every=0, verbose=False,
            lr_group_mults=[10.0, 1.0, 5.0])
        logger.close()

        tags = {}
        with open(os.path.join(logger.run_dir, "logs", "scalars.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if rec["tag"].startswith("Learning_Rate/"):
                    tags.setdefault(rec["tag"], {})[rec["step"]] = rec["value"]
        assert set(tags) == {"Learning_Rate/Group_0", "Learning_Rate/Group_1",
                             "Learning_Rate/Group_2"}
        for epoch in (1, 2):
            assert tags["Learning_Rate/Group_0"][epoch] == pytest.approx(1e-2)
            assert tags["Learning_Rate/Group_1"][epoch] == pytest.approx(1e-3)
            assert tags["Learning_Rate/Group_2"][epoch] == pytest.approx(5e-3)


class TestCheckpointRoundtrip:
    def test_save_and_load(self, tmp_path):
        from fer_vit_tpu.utils.experiment_logger import ExperimentLogger

        h, state = _harness()
        logger = ExperimentLogger("test_exp", base_dir=str(tmp_path))
        logger.log_config({"model": {"depth": 1}})
        logger.save_checkpoint(state, epoch=3, metrics={"f1_macro": 0.5},
                               is_best=True)
        import os

        ckpt_dir = os.path.join(logger.run_dir, "checkpoints")
        assert os.path.exists(os.path.join(ckpt_dir, "last_model.pt"))
        assert os.path.exists(os.path.join(ckpt_dir, "best_model.pt"))

        template = h.init_state(jax.random.key(1), jnp.zeros((1, 18, 512)))
        loaded = ExperimentLogger.load_checkpoint(
            os.path.join(ckpt_dir, "best_model.pt"), state_template=template
        )
        assert loaded["epoch"] == 3
        assert loaded["metrics"]["f1_macro"] == 0.5
        np.testing.assert_array_equal(
            np.asarray(loaded["state"].params["head"]["kernel"]),
            np.asarray(state.params["head"]["kernel"]),
        )
        logger.close()


class TestPredictionsPadding:
    def test_final_chunk_padded_to_static_shape(self):
        """VERDICT r3 #9: the ragged tail must not trigger an extra XLA
        compile — every chunk is padded to the static batch size and the
        padding rows are sliced off."""
        h, state = _harness()
        traced_shapes = []

        def transform(x):  # runs at trace time only: one entry per compile
            traced_shapes.append(tuple(x.shape))
            return x

        h.eval_transform = transform
        x = np.random.default_rng(0).normal(
            size=(50, 18, 512)).astype(np.float32)
        preds, probs = h.predictions(state, x)
        assert preds.shape == (50,)
        assert probs.shape == (50, 7)
        assert traced_shapes == [(32, 18, 512)]  # one compile, static shape

        # padding rows must not leak into real outputs
        direct = h._apply_eval(state.params, state.batch_stats,
                               jnp.asarray(x))
        np.testing.assert_array_equal(preds, np.argmax(np.asarray(direct),
                                                       axis=-1))


class TestLogModelArchitecture:
    def test_summary_written_and_counts_match(self, tmp_path):
        """VERDICT r3 #7: the one missing logger method — JAX analogue of
        the reference's add_graph (reference utils/experiment_logger.py:64-68)."""
        from fer_vit_tpu.utils.experiment_logger import (ExperimentLogger,
                                                         flatten_params)

        h, state = _harness()
        logger = ExperimentLogger("arch", base_dir=str(tmp_path))
        summary = logger.log_model_architecture(h.model, (18, 512))
        logger.close()

        sidecar = os.path.join(logger.run_dir, "logs",
                               "model_architecture.txt")
        assert os.path.exists(sidecar)
        with open(sidecar) as f:
            on_disk = f.read()
        assert summary in on_disk
        total = sum(a.size for a in flatten_params(state.params).values())
        assert f"{total:,}" in summary  # param total matches a real init
        assert "equations" in summary and "Jaxpr:" in summary
        assert "LatentViT" in summary

    def test_variables_and_apply_fn_overrides(self, tmp_path):
        from fer_vit_tpu.utils.experiment_logger import ExperimentLogger

        h, state = _harness()
        logger = ExperimentLogger("arch2", base_dir=str(tmp_path))
        calls = []

        def apply_fn(v, x):
            calls.append(x.shape)
            return h.model.apply(v, x, deterministic=True)

        summary = logger.log_model_architecture(
            h.model, (18, 512), variables={"params": state.params},
            apply_fn=apply_fn)
        logger.close()
        assert calls and calls[0] == (1, 18, 512)
        assert "TOTAL" in summary


class TestLatentStore:
    def test_pt_dir_interop_and_pack(self, tmp_path):
        import torch

        from fer_vit_tpu.data.latent_store import LatentStore

        d = tmp_path / "latents"
        d.mkdir()
        rng = np.random.default_rng(0)
        for i in range(10):
            torch.save(
                {"latent": torch.tensor(rng.normal(size=(18, 512)).astype(np.float32)),
                 "label": int(i % 7)},
                str(d / f"sample_{i:03d}.pt"),
            )
        store = LatentStore.load(str(d))
        assert store.latents.shape == (10, 18, 512)
        assert store.labels.tolist() == [i % 7 for i in range(10)]
        # pack cache written; second load goes through the npz fast path
        store2 = LatentStore.load(str(d))
        np.testing.assert_array_equal(store.latents, store2.latents)

    def test_balanced_subset(self):
        from fer_vit_tpu.data.latent_store import LatentStore

        labels = np.repeat(np.arange(7), 20).astype(np.int32)
        store = LatentStore(np.zeros((140, 18, 512), np.float32), labels)
        idx = store.balanced_subset_indices(0.5, seed=42)
        sub = store.subset(idx)
        counts = sub.get_class_counts()
        assert all(v == 10 for v in counts.values())
        # reproducible
        idx2 = store.balanced_subset_indices(0.5, seed=42)
        np.testing.assert_array_equal(idx, idx2)

    def test_class_weights(self):
        from fer_vit_tpu.data.latent_store import LatentStore

        labels = np.asarray([0] * 70 + [1] * 30 + [2] * 10 + [3, 4, 5, 6] * 5,
                            dtype=np.int32)
        store = LatentStore(np.zeros((len(labels), 18, 512), np.float32), labels)
        w = store.class_weights()
        total = len(labels)
        np.testing.assert_allclose(w[0], total / (7 * 70))
        np.testing.assert_allclose(w[2], total / (7 * 10))
