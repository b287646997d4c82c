"""Trainer equivalence vs the REFERENCE's actual torch code (VERDICT r2 #1).

Runs scripts/verify_reference_equivalence.py in CI-quick mode: Part A
drives the reference's own ``train_epoch``/``evaluate`` (imported from
/root/reference) against our engine with identical converted weights and
identical batches; Part B races the two CLIs as subprocesses on the same
synthetic dataset. See the script docstring for the exact claims.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference tree not present")

sys.path.insert(0, os.path.join(REPO, "scripts"))


@needs_reference
@pytest.mark.parametrize("trainer",
                         ["latent_vit", "latent_vit_v2", "latent_cnn",
                          "hybrid", "expression_aware", "image_vit"])
def test_step_level_equivalence(trainer):
    """Identical weights + identical batches → per-step losses within 5e-5,
    final params within the Adam drift envelope, val LOGITS within 5e-2
    with any argmax flip margin-limited (knife-edge samples only)."""
    import verify_reference_equivalence as vre

    res = vre.part_a(trainer, epochs=1)
    assert res["pass"], res
    assert res["per_step_loss"]["max_abs_diff"] < 5e-5
    assert res["val_metric_abs_diffs"]["loss"] < 1e-5
    assert res["val_logit_max_abs_diff"] < 5e-2
    if res["val_argmax_flips"]:
        assert all(m <= 4.0 * res["val_logit_max_abs_diff"]
                   for m in res["val_flip_margins"]), res


@needs_reference
def test_style_extractor_step_level_equivalence():
    """The 7th trainer (AFS): the reference's run_epoch/evaluate drive a
    torch race vs our fused jitted AFS step — identical extractor init,
    shared frozen StyleGAN2/ArcFace/LPIPS donors through the
    real-checkpoint converters, fixed pairs. Per-step losses, epoch loss
    components, val metrics and final params+BN running stats agree."""
    import verify_reference_equivalence as vre

    res = vre.part_c_style_extractor(epochs=1)
    assert res["pass"], res
    assert res["per_step_loss"]["max_abs_diff"] < 1e-4
    assert max(res["val_component_abs_diffs"].values()) < 1e-4


@needs_reference
def test_expression_directions_match_reference_cli():
    """The reference's latent_analysis SVM CLI (sklearn LinearSVC) vs our
    on-device vmapped squared-hinge SVM on the same synthetic latent dir:
    saved per-class directions align to cosine ≥ 0.98 (measured ≥0.9999),
    both binary and multiclass methods."""
    import verify_reference_equivalence as vre

    res = vre.part_d_expression_directions()
    assert res["pass"], res
    assert res["min_cosine_overall"] >= 0.98


@needs_reference
def test_sefa_matches_reference_package():
    """The reference's OWN sefa package vs fer_vit_tpu.analysis.sefa:
    factorize on the same mapping-fc0 weight (full + layer_idx-sliced)
    agrees to |cosine| ≥ 0.9999 per direction with matching eigenvalues,
    and the reference's triple-loop direction verification — driving its
    own LatentViT loaded with our converted weights — yields the same
    per-direction label-change rates as our single vmapped forward."""
    import verify_reference_equivalence as vre

    res = vre.part_e_sefa()
    assert res["pass"], res
    assert res["verify_max_rate_diff"] <= 1.0 / 20


@needs_reference
def test_eval_cli_output_contract_matches_reference():
    """The reference's eval/evaluate_model.py CLI vs ours on the SAME
    reference-format torch checkpoint and latent dir: identical
    evaluation_results.json schema, identical accuracy and
    classification_report numbers (measured diff 0.0), and every reference
    plot/JSON artifact filename produced."""
    import verify_reference_equivalence as vre

    res = vre.part_f_eval_cli()
    assert res["pass"], res
    assert res["accuracy_abs_diff"] <= 1.0 / 140 + 1e-9
    assert not res["missing_artifacts"]


@needs_reference
def test_image_eval_cli_output_contract_matches_reference():
    """Same race for eval/evaluate_image_vit.py on a shared torch ImageViT
    checkpoint + class-dir PNG tree (the reference side runs on a faithful
    functional torchvision stub; PNGs are written at the eval size so
    Resize is identity): identical schema, identical numbers."""
    import verify_reference_equivalence as vre

    res = vre.part_f2_eval_image_cli()
    assert res["pass"], res
    assert not res["missing_artifacts"]


@needs_reference
@pytest.mark.parametrize("trainer",
                         ["latent_vit", "latent_cnn", "latent_vit_v2"])
def test_full_run_trajectory_band(trainer):
    """Both CLIs (subprocesses, native init/shuffle each; the CNN race
    includes live mixup — hardcoded α=1.0 on both sides) land in the same
    val-metric band on the same synthetic dataset."""
    import verify_reference_equivalence as vre

    # The band criteria compare the trajectory tail, and on this tiny set
    # both frameworks are still in their noisy ramp at epoch ≤3 (val-set
    # sampling noise alone is ~0.04 acc). The v2 race (full LWN/SPE/LEAM
    # stack) ramps slowest — its 5-epoch tail straddles the noisy knee
    # (measured mean-acc diff 0.10 at 5 epochs vs 0.074/0.068 at 7/8), so
    # it gets two more epochs.
    res = vre.part_b(trainer, epochs=7 if trainer == "latent_vit_v2" else 5)
    assert res["pass"], {
        k: res[k] for k in ("tail_val_acc_mean_abs_diff",
                            "tail_val_loss_mean_abs_diff")}


def test_part_h_permutation_test_is_exact():
    """The part-H gate's permutation test, pinned on known orderings:
    full separation at n=m=5 must give exactly 2/C(10,5), interleaved
    samples must be clearly non-significant, identical samples p=1."""
    import verify_reference_equivalence as vre

    sep = vre._exact_permutation_p([1.0] * 5, [0.0] * 5)
    assert abs(sep - 2 / 252) < 1e-12, sep
    inter = vre._exact_permutation_p([0.70, 0.72, 0.69, 0.71, 0.70],
                                     [0.71, 0.69, 0.71, 0.70, 0.70])
    assert inter > 0.3, inter
    assert vre._exact_permutation_p([0.5] * 5, [0.5] * 5) == 1.0
