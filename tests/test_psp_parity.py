"""Numerical-parity tests of the JAX pSp encoder against an independent
PyTorch implementation of the same (public) architecture — SURVEY.md §4
implication (b) and hard part #1: weight-faithful port verification.

The heavy check runs in a single-device CPU subprocess
(``psp_parity_check.py``): the suite's 8-virtual-device env makes XLA CPU
conv compiles pathologically slow and perturbs accumulation order. On one
device the ported encoder matches torch to ~1e-6 eager / ~1e-3 jitted
(conv-algorithm noise).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fer_vit_tpu.encoders.convert_psp import convert_encoder_state_dict  # noqa: E402
from fer_vit_tpu.encoders.psp import PSpEncoder  # noqa: E402
from tests.torch_psp_ref import PLAN, GradualStyleEncoderRef  # noqa: E402


class TestPSpParity:
    def test_parity_subprocess(self):
        script = os.path.join(os.path.dirname(__file__), "psp_parity_check.py")
        from tests.env_utils import cpu_env

        env = cpu_env()
        result = subprocess.run(
            [sys.executable, script], env=env,
            capture_output=True, text=True, timeout=500,
        )
        assert result.returncode == 0, (
            f"parity check failed:\n{result.stdout}\n{result.stderr}"
        )
        assert "PARITY_OK" in result.stdout
        print(result.stdout)


class TestConverterFullPlan:
    def test_ir_se50_state_dict_converts(self):
        """Full 24-unit plan: converter consumes every key and the resulting
        tree matches a fresh full-encoder init's shapes exactly."""
        torch.manual_seed(0)
        ref = GradualStyleEncoderRef(n_styles=18, plan=PLAN)
        sd = {k: v.detach().numpy().astype(np.float32)
              for k, v in ref.state_dict().items()}
        variables = convert_encoder_state_dict(sd)
        enc = PSpEncoder()
        init_vars = jax.eval_shape(
            lambda: enc.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)))
        )
        got = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
        want = jax.tree_util.tree_map(lambda x: x.shape, init_vars["params"])
        assert got == want


def test_preprocess_uint8_dark_batch_scales_correctly():
    """Integer inputs are always 0-255: a uniformly dark uint8 batch
    (max <= 2) must still be divided by 255 — the old batch-max heuristic
    skipped the division and produced wildly out-of-range inputs."""
    import numpy as np

    from fer_vit_tpu.encoders.psp import preprocess_images

    dark = jnp.asarray(np.full((2, 8, 8, 3), 2, np.uint8))
    out = preprocess_images(dark, size=8)
    expected = (2.0 / 255.0 - 0.5) / 0.5
    assert float(jnp.max(jnp.abs(out - expected))) < 1e-6

    # float inputs keep the value heuristic (0-1 passes through)
    f01 = jnp.asarray(np.full((1, 8, 8, 3), 0.5, np.float32))
    out01 = preprocess_images(f01, size=8)
    assert float(jnp.max(jnp.abs(out01))) < 1e-6
