"""BN-folding parity: a fuse_bn=True encoder with folded variables must
reproduce the unfused encoder's output exactly (same math, fewer HBM
passes). Run on a tiny plan so the CPU compile stays fast."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fer_vit_tpu.encoders.folding import fold_psp_variables
from fer_vit_tpu.encoders.irse import IRSEBackbone
from fer_vit_tpu.encoders.psp import PSpEncoder

# first in_c is 64 (the trunk input conv's fixed width); channels ≥ 16 so
# SE's C/16 squeeze stays non-empty
TINY_PLAN = ((64, 16, 1), (16, 32, 2), (32, 32, 2), (32, 64, 1))


def _randomize(variables, seed=0):
    """Non-trivial params AND running stats (init stats are mean 0 / var 1,
    which would make folding trivially correct)."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    rng = np.random.default_rng(seed)
    out = []
    for leaf in leaves:
        arr = rng.normal(0.0, 0.5, size=leaf.shape).astype(np.float32)
        out.append(jnp.asarray(np.abs(arr) + 0.5))  # positive: valid var
    return jax.tree_util.tree_unflatten(treedef, out)


class TestBNFolding:
    def test_psp_fused_matches_unfused(self):
        enc = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                         n_styles=18)
        enc_fused = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                               n_styles=18, fuse_bn=True)
        variables = _randomize(
            enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        )
        folded = fold_psp_variables(variables)

        # the folded tree must match the fused module's expected structure
        expected = jax.eval_shape(
            lambda: enc_fused.init(jax.random.key(0),
                                   jnp.zeros((1, 32, 32, 3)))
        )
        got_paths = set(jax.tree_util.tree_flatten_with_path(folded)[0][i][0]
                        for i in range(len(jax.tree_util.tree_leaves(folded))))
        want_paths = set(
            jax.tree_util.tree_flatten_with_path(expected)[0][i][0]
            for i in range(len(jax.tree_util.tree_leaves(expected)))
        )
        assert got_paths == want_paths

        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 32, 32, 3)), jnp.float32
        )
        with jax.default_matmul_precision("highest"):
            ref = enc.apply(variables, x)
            got = enc_fused.apply(folded, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_backbone_fused_matches_unfused(self):
        bb = IRSEBackbone(plan=TINY_PLAN, taps=(0, 2))
        bb_fused = IRSEBackbone(plan=TINY_PLAN, taps=(0, 2), fuse_bn=True)
        variables = _randomize(
            bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3))), seed=3
        )
        from fer_vit_tpu.encoders.folding import fold_backbone_variables

        p, s = fold_backbone_variables(variables["params"],
                                       variables["batch_stats"])
        folded = {"params": p, "batch_stats": s}
        x = jnp.asarray(
            np.random.default_rng(4).normal(size=(2, 32, 32, 3)), jnp.float32
        )
        with jax.default_matmul_precision("highest"):
            ref = bb.apply(variables, x)
            got = bb_fused.apply(folded, x)
        # all-positive randomized params blow activations up to ~1e5, so
        # this check is relative-error dominated
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-3, atol=1e-3)

    def test_s2_modes_match_unfused(self):
        """Both stride-2 conv rewrites (space-to-depth and polyphase — the
        inference perf variants) must be numerically exact vs the plain
        encoder, loading the same folded variables."""
        enc = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                         n_styles=18)
        variables = _randomize(
            enc.init(jax.random.key(5), jnp.zeros((1, 32, 32, 3))), seed=6
        )
        folded = fold_psp_variables(variables)
        x = jnp.asarray(
            np.random.default_rng(7).normal(size=(2, 32, 32, 3)), jnp.float32
        )
        with jax.default_matmul_precision("highest"):
            ref = enc.apply(variables, x)
            for mode in ("s2d", "poly"):
                enc_alt = PSpEncoder(plan=TINY_PLAN, input_size=32,
                                     style_dim=16, n_styles=18,
                                     fuse_bn=True, s2_mode=mode)
                got = enc_alt.apply(folded, x)
                np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                           rtol=1e-3, atol=1e-3,
                                           err_msg=mode)

    def test_fold_bn1_matches_unfused(self):
        """Full bn1 folding (kernel-scaled conv1 + border-exact bias map)
        must be numerically exact vs the plain encoder — including the
        1-px border ring where zero padding drops taps."""
        enc = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                         n_styles=18)
        enc_f = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                           n_styles=18, fuse_bn=True, fold_bn1=True)
        variables = _randomize(
            enc.init(jax.random.key(8), jnp.zeros((1, 32, 32, 3))), seed=9
        )
        folded = fold_psp_variables(variables, fold_bn1=True)

        expected = jax.eval_shape(
            lambda: enc_f.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3))))
        got_paths = {p for p, _ in
                     jax.tree_util.tree_leaves_with_path(folded)}
        want_paths = {p for p, _ in
                      jax.tree_util.tree_leaves_with_path(expected)}
        assert got_paths == want_paths

        x = jnp.asarray(
            np.random.default_rng(10).normal(size=(2, 32, 32, 3)),
            jnp.float32)
        with jax.default_matmul_precision("highest"):
            ref = enc.apply(variables, x)
            got = enc_f.apply(folded, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)

    def test_fold_bn1_exact_for_dead_bn_scale(self):
        """A bn1 channel with γ == 0 but β != 0 (dead scale under weight
        decay) still contributes conv1(β·1) to every output — the folded
        tap_bias is computed from the PRE-fold kernel, so no information
        is lost when the folded conv1 kernel zeroes that input channel."""
        enc = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                         n_styles=18)
        enc_f = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                           n_styles=18, fuse_bn=True, fold_bn1=True)
        variables = _randomize(
            enc.init(jax.random.key(13), jnp.zeros((1, 32, 32, 3))),
            seed=14)
        # kill bn1 scales of body_0 entirely; offsets stay nonzero
        p = variables["params"]["backbone"]["body_0"]["bn1"]
        p["scale"] = jnp.zeros_like(p["scale"])
        folded = fold_psp_variables(variables, fold_bn1=True)
        x = jnp.asarray(
            np.random.default_rng(15).normal(size=(2, 32, 32, 3)),
            jnp.float32)
        with jax.default_matmul_precision("highest"):
            ref = enc.apply(variables, x)
            got = enc_f.apply(folded, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)

    def test_fold_bn1_flag_exclusivity(self):
        enc = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                         n_styles=18, fuse_bn=True, fold_bn1=True,
                         fused_residual=True, fused_interpret=True)
        with pytest.raises(ValueError, match="mutually exclusive"):
            enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        enc2 = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                          n_styles=18, fuse_bn=False, fold_bn1=True)
        with pytest.raises(ValueError, match="requires fuse_bn"):
            enc2.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))

    def test_no_batchnorm_after_convs_in_fused_tree(self):
        enc_fused = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                               fuse_bn=True)
        variables = jax.eval_shape(
            lambda: enc_fused.init(jax.random.key(0),
                                   jnp.zeros((1, 32, 32, 3)))
        )
        bb = variables["params"]["backbone"]
        assert "input_bn" not in bb
        assert "bias" in bb["input_conv"]
        for scope, sub in bb.items():
            if scope.startswith("body_"):
                assert "bn2" not in sub and "shortcut_bn" not in sub
                assert "bn1" in sub  # pre-conv BN must survive
                assert "bias" in sub["conv2"]
