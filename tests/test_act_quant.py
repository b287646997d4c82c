"""int8 activation storage for the bandwidth-bound trunk (VERDICT r2 perf
item (a)): scale calibration, bounded quantization error, int8 tensors
actually materialized in the compiled program, and default-off invariance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fer_vit_tpu.encoders.irse import ActQuant
from fer_vit_tpu.encoders.psp import (
    PSpEncoder,
    calibrate_act_quant,
    preprocess_images,
)

TINY = ((64, 16, 1), (16, 32, 2), (32, 32, 2), (32, 64, 1))


def _setup(min_hw=8):
    enc = PSpEncoder(plan=TINY, input_size=32, style_dim=16, n_styles=18)
    v = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    imgs = np.random.default_rng(0).uniform(
        0, 255, size=(8, 32, 32, 3)).astype(np.float32)
    enc_q = PSpEncoder(plan=TINY, input_size=32, style_dim=16, n_styles=18,
                       act_quant_min_hw=min_hw)
    vq = calibrate_act_quant(enc_q, dict(v), imgs)
    return enc, v, enc_q, vq, imgs


class TestActQuantUnit:
    def test_roundtrip_error_bounded_by_half_step(self):
        aq = ActQuant()
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(4, 8, 8, 16)).astype(np.float32) * 3.0)
        scale = float(jnp.max(jnp.abs(x))) / 127.0
        out = aq.apply({"act_quant": {"scale": jnp.float32(scale)}}, x)
        # each element within half a quantization step
        assert float(jnp.max(jnp.abs(out - x))) <= scale * 0.5 + 1e-6

    def test_calibrate_records_max_over_127(self):
        aq = ActQuant(calibrate=True)
        x = jnp.asarray(np.linspace(-5.0, 3.0, 64, dtype=np.float32))
        out, upd = aq.apply({"act_quant": {"scale": jnp.float32(1.0)}}, x,
                            mutable=["act_quant"])
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
        assert float(upd["act_quant"]["scale"]) == pytest.approx(5.0 / 127.0)


class TestEncoderActQuant:
    def test_calibration_populates_expected_taps(self):
        _, _, enc_q, vq, _ = _setup()
        flat = jax.tree_util.tree_leaves_with_path(vq["act_quant"])
        names = {jax.tree_util.keystr(p) for p, _ in flat}
        # input-layer tap + per-unit mid taps + inter-unit taps (not the
        # style-head taps) must exist, with positive calibrated scales
        assert any("aq_input" in n for n in names)
        assert any("aq_mid" in n for n in names)
        assert any("aq_out_" in n for n in names)
        assert all(float(s) > 0 for _, s in flat)

    def test_w_plus_error_within_band(self):
        enc, v, enc_q, vq, imgs = _setup()
        x = preprocess_images(jnp.asarray(imgs), size=32)
        w = np.asarray(enc.apply(v, x))
        w_q = np.asarray(enc_q.apply(vq, x))
        rel = np.abs(w_q - w).max() / np.abs(w).max()
        assert rel < 0.05, rel  # lossy by design; band documented

    def test_compiled_program_materializes_int8(self):
        """The whole point is STORAGE: the lowered program must carry s8
        tensors between fusions (otherwise the quant pair got folded away
        and no bandwidth is saved)."""
        _, _, enc_q, vq, imgs = _setup()
        x = preprocess_images(jnp.asarray(imgs), size=32)
        txt = jax.jit(enc_q.apply).lower(vq, x).compile().as_text()
        assert "s8[" in txt

    def test_default_off_means_no_collection(self):
        enc = PSpEncoder(plan=TINY, input_size=32, style_dim=16, n_styles=18)
        v = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        assert "act_quant" not in v  # checkpoints/variables unchanged

    def test_calibrate_accepts_off_resolution_samples(self):
        """calibrate_act_quant resizes samples to encoder.input_size; the
        act_quant seed init must also run at input_size, not the raw
        sample resolution (a 64px sample used to crash/mis-tap the 32px
        encoder's init)."""
        enc_q = PSpEncoder(plan=TINY, input_size=32, style_dim=16,
                           n_styles=18, act_quant_min_hw=8)
        v = enc_q.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        v.pop("act_quant", None)
        imgs64 = np.random.default_rng(1).uniform(
            0, 255, size=(2, 64, 64, 3)).astype(np.float32)
        vq = calibrate_act_quant(enc_q, dict(v), imgs64)
        assert "act_quant" in vq and vq["act_quant"]
