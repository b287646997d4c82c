"""Standalone StyleGAN2 parity check (single-device CPU subprocess; see
psp_parity_check.py for why). Verifies the JAX generator + converter against
the independent torch reimplementation at size=64.
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

from fer_vit_tpu.encoders.convert_stylegan2 import (  # noqa: E402
    convert_generator_state_dict,
)
from fer_vit_tpu.encoders.stylegan2 import Generator  # noqa: E402
from tests.torch_stylegan2_ref import GeneratorRef  # noqa: E402

SIZE = 64


def main() -> None:
    torch.manual_seed(0)
    ref = GeneratorRef(SIZE).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in ref.state_dict().items()}
    variables = convert_generator_state_dict(sd)
    variables = {k: v for k, v in variables.items()}
    gen = Generator(size=SIZE)

    rng = np.random.default_rng(0)
    b = 2
    w_plus = rng.normal(size=(b, ref.n_latent, 512)).astype(np.float32) * 0.5

    with torch.no_grad():
        img_t, _ = ref([torch.tensor(w_plus)], input_is_latent=True,
                       randomize_noise=False)
    img_t = img_t.numpy().transpose(0, 2, 3, 1)

    img_j, _ = gen.apply(variables, [jnp.asarray(w_plus)],
                         input_is_latent=True, randomize_noise=False)
    img_j = np.asarray(img_j)

    assert img_j.shape == img_t.shape == (b, SIZE, SIZE, 3), (
        img_j.shape, img_t.shape)
    d = np.abs(img_j - img_t).max()
    scale = np.abs(img_t).max()
    print(f"synthesis max|diff| = {d:.2e} (scale {scale:.2f})")
    np.testing.assert_allclose(img_j, img_t, rtol=1e-3, atol=1e-3)

    # mapping network parity
    z = rng.normal(size=(3, 512)).astype(np.float32)
    with torch.no_grad():
        w_t = ref.style(torch.tensor(z)).numpy()
    w_j = np.asarray(gen.apply(variables, jnp.asarray(z),
                               method=Generator.mapping))
    dm = np.abs(w_j - w_t).max()
    print(f"mapping   max|diff| = {dm:.2e}")
    np.testing.assert_allclose(w_j, w_t, rtol=1e-4, atol=1e-5)

    # z-input path (mapping + broadcast)
    with torch.no_grad():
        img_t2, _ = ref([torch.tensor(z[:1])], input_is_latent=False,
                        randomize_noise=False)
    img_j2, _ = gen.apply(variables, [jnp.asarray(z[:1])],
                          input_is_latent=False, randomize_noise=False)
    d2 = np.abs(np.asarray(img_j2) - img_t2.numpy().transpose(0, 2, 3, 1)).max()
    print(f"z-path    max|diff| = {d2:.2e}")
    assert d2 < 2e-3, d2
    print("STYLEGAN2_PARITY_OK")


if __name__ == "__main__":
    main()
