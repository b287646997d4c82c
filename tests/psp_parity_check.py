"""Standalone pSp parity check, run by test_psp_parity in a SINGLE-device CPU
subprocess (the suite's 8-virtual-device env makes XLA CPU conv compilation
pathologically slow and changes accumulation order; one device matches torch
to ~1e-6).

Exit 0 on success; prints max diffs.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.pop("XLA_FLAGS", None)

import numpy as np  # noqa: E402
import torch  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fer_vit_tpu.encoders.convert_psp import (  # noqa: E402
    convert_encoder_state_dict,
    load_npz_variables,
    save_npz_variables,
)
from fer_vit_tpu.encoders.psp import PSpEncoder  # noqa: E402
from tests.torch_psp_ref import GradualStyleEncoderRef  # noqa: E402

SMALL_PLAN = [(64, 64, 1), (64, 128, 1), (128, 256, 1), (256, 512, 1)]
INPUT = 32


def main() -> None:
    torch.manual_seed(0)
    ref = GradualStyleEncoderRef(n_styles=18, plan=SMALL_PLAN,
                                 input_size=INPUT).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in ref.state_dict().items()}
    variables = convert_encoder_state_dict(sd, plan=SMALL_PLAN,
                                           input_size=INPUT)
    enc = PSpEncoder(plan=tuple(SMALL_PLAN), input_size=INPUT)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, INPUT, INPUT)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.tensor(x)).numpy()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))

    got = np.asarray(enc.apply(variables, xj, add_latent_avg=False))
    assert got.shape == expected.shape == (2, 18, 512)
    d_eager = np.abs(got - expected).max()
    print(f"eager max|diff| = {d_eager:.2e}")
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    got_jit = np.asarray(
        jax.jit(lambda v, x: enc.apply(v, x, add_latent_avg=False))(
            variables, xj
        )
    )
    d_jit = np.abs(got_jit - expected).max()
    print(f"jit   max|diff| = {d_jit:.2e}")
    np.testing.assert_allclose(got_jit, expected, rtol=2e-2, atol=2e-3)

    # latent_avg add
    la = np.random.default_rng(1).normal(size=(18, 512)).astype(np.float32)
    v2 = dict(variables, constants={"latent_avg": jnp.asarray(la)})
    x0 = np.zeros((1, INPUT, INPUT, 3), np.float32)
    without = np.asarray(enc.apply(v2, x0, add_latent_avg=False))
    with_avg = np.asarray(enc.apply(v2, x0))
    np.testing.assert_allclose(with_avg - without, la[None],
                               rtol=1e-4, atol=1e-5)
    print("latent_avg add OK")

    # npz roundtrip
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "psp.npz")
        save_npz_variables(variables, path)
        loaded = load_npz_variables(path)
        a = np.asarray(enc.apply(variables, xj, add_latent_avg=False))
        b = np.asarray(enc.apply(loaded, xj, add_latent_avg=False))
        np.testing.assert_array_equal(a, b)
    print("npz roundtrip OK")
    print("PARITY_OK")


if __name__ == "__main__":
    main()
