"""Pallas fused IR-SE residual-branch kernel: numerics vs the XLA
reference, gradients through the custom VJP, and drop-in equivalence of
the fused encoder path (same folded variables, same outputs).

The kernel computes bn1-affine → conv1 3×3 → PReLU → conv2 3×3 (s1/s2,
+bias) → SE spatial sums in one pass over the reference trunk unit
(reference bottleneck_IR_SE loaded by models_fer_vit/encoder_wrapper.py).
All tests run the kernel in interpret mode — Mosaic-lowering constraints
(Cin % 128) were validated on hardware separately (PARITY.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fer_vit_tpu.encoders.folding import fold_psp_variables
from fer_vit_tpu.encoders.psp import PSpEncoder
from fer_vit_tpu.ops.fused_irse_unit import (
    fused_irse_residual,
    fused_irse_residual_reference,
)
from tests.test_folding import TINY_PLAN, _randomize


def _unit_args(H, W, cin, cout, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(batch, H, W, cin)), jnp.float32),
        jnp.asarray(rng.normal(size=cin) * 0.2 + 1.0, jnp.float32),
        jnp.asarray(rng.normal(size=cin) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(3, 3, cin, cout)) / np.sqrt(9 * cin),
                    jnp.float32),
        jnp.asarray(rng.uniform(0.1, 0.4, size=cout), jnp.float32),
        jnp.asarray(rng.normal(size=(3, 3, cout, cout)) / np.sqrt(9 * cout),
                    jnp.float32),
        jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32),
    )


class TestFusedKernel:
    @pytest.mark.parametrize(
        "H,W,cin,cout,stride",
        [
            (16, 16, 8, 8, 1),
            (16, 16, 8, 16, 2),   # channel change + stride
            (32, 32, 64, 64, 2),  # multi-row-block grid
            (16, 16, 8, 256, 2),  # grouped stride-2 scratch (cout % 128)
            (8, 8, 8, 8, 2),      # window larger than image (whole-image DMA)
        ],
    )
    def test_matches_reference(self, H, W, cin, cout, stride):
        args = _unit_args(H, W, cin, cout)
        # exactness-sensitive: CPU AMX runs default-precision f32 matmuls
        # in bf16 (CLAUDE.md) and earlier tests may leave the default
        # lowered — pin highest for the parity check
        with jax.default_matmul_precision("highest"):
            ref, sref = fused_irse_residual_reference(*args, stride=stride)
            got, sgot = fused_irse_residual(*args, stride=stride,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sgot), np.asarray(sref),
                                   rtol=1e-3, atol=1e-3)

    def test_every_row_block_size(self):
        """rb (grid row-block) must not change results — exercises the
        DMA halo alignment at every boundary case."""
        H = W = 16
        args = _unit_args(H, W, 8, 8)
        for stride in (1, 2):
            with jax.default_matmul_precision("highest"):
                ref, _ = fused_irse_residual_reference(*args, stride=stride)
            for rb in (1, 2, 4, 8):
                if (H // stride) % rb:
                    continue
                with jax.default_matmul_precision("highest"):
                    got, _ = fused_irse_residual(*args, stride=stride, rb=rb,
                                                 interpret=True)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4,
                    err_msg=f"stride={stride} rb={rb}")

    def test_gradients_flow_through_custom_vjp(self):
        """jax.grad through the kernel must equal the reference gradient —
        the backward is defined to recompute via the XLA oracle (the
        round-1 advisor found fused attention crashing under grad; the
        same failure mode is designed out here)."""
        args = _unit_args(16, 16, 8, 8, seed=3)

        def loss_fused(*p):
            r, s = fused_irse_residual(*p, stride=2, interpret=True)
            return jnp.sum(r ** 2) + jnp.sum(s)

        def loss_ref(*p):
            r, s = fused_irse_residual_reference(*p, stride=2)
            return jnp.sum(r ** 2) + jnp.sum(s)

        gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
        gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-2, atol=1e-2)


class TestFusedEncoderPath:
    def test_variable_structure_identical_to_fuse_bn(self):
        """fused_residual declares the exact same variables as the plain
        fuse_bn module — checkpoints are interchangeable."""
        kw = dict(plan=TINY_PLAN, input_size=32, style_dim=16, n_styles=18,
                  fuse_bn=True)
        base = jax.eval_shape(lambda: PSpEncoder(**kw).init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3))))
        fused = jax.eval_shape(lambda: PSpEncoder(
            fused_residual=True, fused_interpret=True, **kw).init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3))))
        bpaths = {p: l.shape for p, l in
                  jax.tree_util.tree_leaves_with_path(base)}
        fpaths = {p: l.shape for p, l in
                  jax.tree_util.tree_leaves_with_path(fused)}
        assert bpaths == fpaths

    def test_encoder_matches_unfused(self):
        """Full pSp encoder with fused residual branches == the plain
        encoder, loading the same folded variables."""
        enc = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                         n_styles=18)
        enc_fused = PSpEncoder(plan=TINY_PLAN, input_size=32, style_dim=16,
                               n_styles=18, fuse_bn=True,
                               fused_residual=True, fused_interpret=True)
        variables = _randomize(
            enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3))), seed=11)
        folded = fold_psp_variables(variables)
        x = jnp.asarray(
            np.random.default_rng(12).normal(size=(2, 32, 32, 3)),
            jnp.float32)
        with jax.default_matmul_precision("highest"):
            ref = enc.apply(variables, x)
            got = enc_fused.apply(folded, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)
