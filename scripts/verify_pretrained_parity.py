"""One-command pretrained-weight fidelity harness (VERDICT r1 #5).

For each pretrained component of the reference pipeline — pSp encoder,
StyleGAN2 generator, ArcFace IR-SE50, LPIPS(alex), timm ViT — this script
converts the torch weights, runs per-stage activation comparisons against
the torch oracle, and prints/writes a full parity report.

With REAL checkpoints (the reference's pipeline weights, reference:
models_fer_vit/encoder_wrapper.py:58-89, afs/losses.py:56-70):

    python scripts/verify_pretrained_parity.py \
        --psp psp_ffhq_encode.pt --arcface model_ir_se50.pth \
        --lpips_alex alexnet.pth --lpips_lin lpips_alex_lins.pth \
        --timm vit_small_sd.pt --out report.json

Without arguments it runs every component in SYNTHETIC mode — the test
suite's independent torch reimplementations (tests/torch_psp_ref.py,
tests/torch_stylegan2_ref.py, tests/torch_refs_aux.py) with randomized
weights and running stats — which exercises the identical converter and
comparison code paths, so the real-weights invocation is just a matter of
pointing at files.

Run single-device CPU (conv accumulation-order parity); forced below.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("FERVIT_PARITY_PLATFORM", "cpu")
os.environ["JAX_PLATFORM_NAME"] = os.environ["JAX_PLATFORMS"]
os.environ.pop("XLA_FLAGS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _maxdiff(a, b) -> float:
    return float(np.abs(np.asarray(a, np.float64) -
                        np.asarray(b, np.float64)).max())


def _report_row(report, component, stage, diff, tol):
    ok = diff <= tol
    report.append({"component": component, "stage": stage,
                   "max_abs_diff": diff, "tolerance": tol, "ok": ok})
    print(f"  {component:10s} {stage:28s} max|diff|={diff:.3e} "
          f"tol={tol:.0e}  {'OK' if ok else 'FAIL'}")
    return ok


# --------------------------------------------------------------- pSp ------

def check_psp(path, report, batch=2):
    import torch

    import jax.numpy as jnp
    from fer_vit_tpu.encoders.convert_psp import (convert_checkpoint,
                                                  convert_encoder_state_dict)
    from fer_vit_tpu.encoders.irse import IRSEBackbone
    from fer_vit_tpu.encoders.psp import PSpEncoder
    from tests.torch_psp_ref import PLAN, GradualStyleEncoderRef

    if path:
        variables = convert_checkpoint(path)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd_raw = ckpt.get("state_dict", ckpt)
        ref = GradualStyleEncoderRef(n_styles=18, plan=PLAN, input_size=256)
        ref.load_state_dict({k[len("encoder."):]: v for k, v in sd_raw.items()
                             if k.startswith("encoder.")})
        plan, input_size = PLAN, 256
    else:
        plan, input_size = [(64, 64, 1), (64, 128, 1), (128, 256, 1),
                            (256, 512, 1)], 32
        torch.manual_seed(0)
        ref = GradualStyleEncoderRef(n_styles=18, plan=plan,
                                     input_size=input_size)
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.6, 1.4)
        sd = {k: v.detach().numpy().astype(np.float32)
              for k, v in ref.state_dict().items()}
        variables = convert_encoder_state_dict(sd, plan=plan,
                                               input_size=input_size)
    ref = ref.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, 3, input_size, input_size)).astype(np.float32)
    xt = torch.tensor(x)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))

    # torch per-stage taps (replicating GradualStyleEncoderRef.forward)
    with torch.no_grad():
        h = ref.input_layer(xt)
        taps = {}
        for i, m in enumerate(ref.body):
            h = m(h)
            if i == ref.tap1:
                taps["c1"] = h.numpy().transpose(0, 2, 3, 1)
            elif i == ref.tap2:
                taps["c2"] = h.numpy().transpose(0, 2, 3, 1)
        taps["c3"] = h.numpy().transpose(0, 2, 3, 1)
        w_ref = ref(xt).numpy()

    enc = PSpEncoder(plan=tuple(plan), input_size=input_size)
    bb = IRSEBackbone(plan=tuple(plan), taps=enc.taps)
    c1, c2, c3 = bb.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]}, xj)
    ok = True
    ok &= _report_row(report, "psp", "backbone c1", _maxdiff(c1, taps["c1"]), 1e-3)
    ok &= _report_row(report, "psp", "backbone c2", _maxdiff(c2, taps["c2"]), 1e-3)
    ok &= _report_row(report, "psp", "backbone c3", _maxdiff(c3, taps["c3"]), 1e-3)
    w = enc.apply(variables, xj, add_latent_avg=False)
    ok &= _report_row(report, "psp", "w+ (no latent_avg)",
                      _maxdiff(w, w_ref), 1e-3)
    # fused-BN inference variant must agree with the unfused port
    from fer_vit_tpu.encoders.folding import fold_psp_variables

    enc_f = PSpEncoder(plan=tuple(plan), input_size=input_size, fuse_bn=True)
    w_f = enc_f.apply(fold_psp_variables(variables), xj, add_latent_avg=False)
    ok &= _report_row(report, "psp", "w+ fused-BN", _maxdiff(w_f, w), 1e-3)
    return ok


# --------------------------------------------------------- StyleGAN2 ------

def check_stylegan2(path, report, size=64):
    import torch

    import jax.numpy as jnp
    from fer_vit_tpu.encoders.convert_stylegan2 import (
        convert_generator_state_dict, convert_psp_decoder)
    from fer_vit_tpu.encoders.stylegan2 import Generator
    from tests.torch_stylegan2_ref import GeneratorRef

    if path:
        variables = convert_psp_decoder(path)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd_raw = ckpt.get("state_dict", ckpt)
        size = 1024
        ref = GeneratorRef(size)
        ref.load_state_dict({k[len("decoder."):]: v for k, v in sd_raw.items()
                             if k.startswith("decoder.")})
    else:
        torch.manual_seed(0)
        ref = GeneratorRef(size)
        sd = {k: v.detach().numpy().astype(np.float32)
              for k, v in ref.state_dict().items()}
        variables = convert_generator_state_dict(sd)
    ref = ref.eval()

    rng = np.random.default_rng(0)
    w_plus = rng.normal(size=(2, ref.n_latent, 512)).astype(np.float32) * 0.5
    with torch.no_grad():
        img_t, _ = ref([torch.tensor(w_plus)], input_is_latent=True,
                       randomize_noise=False)
    img_t = img_t.numpy().transpose(0, 2, 3, 1)
    gen = Generator(size=size)
    img_j, _ = gen.apply(variables, [jnp.asarray(w_plus)],
                         input_is_latent=True, randomize_noise=False)
    return _report_row(report, "stylegan2", f"image {size}px",
                       _maxdiff(img_j, img_t), 1e-3)


# ----------------------------------------------------------- ArcFace ------

def check_arcface(path, report):
    import torch

    import jax
    import jax.numpy as jnp
    from fer_vit_tpu.encoders.arcface import (ArcFaceBackbone,
                                              convert_arcface_checkpoint,
                                              convert_arcface_state_dict)
    from tests.torch_refs_aux import ArcFaceBackboneRef

    if path:
        variables = convert_arcface_checkpoint(path)
        plan = None  # full ir_se50
        ref = ArcFaceBackboneRef()
        sd_t = torch.load(path, map_location="cpu", weights_only=False)
        ref.load_state_dict(sd_t if isinstance(sd_t, dict)
                            else sd_t.state_dict())
        input_size, feat_hw = 112, 7
        backbone = ArcFaceBackbone()
    else:
        plan = [(64, 64, 1), (64, 128, 1), (128, 256, 1), (256, 512, 1)]
        input_size, feat_hw = 32, 2
        torch.manual_seed(1)
        ref = ArcFaceBackboneRef(plan=plan, feat_hw=feat_hw)
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.6, 1.4)
        sd = {k: v.detach().numpy().astype(np.float32)
              for k, v in ref.state_dict().items()}
        variables = convert_arcface_state_dict(sd, plan=plan)
        backbone = ArcFaceBackbone(plan=tuple(plan))
    ref = ref.eval()

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, input_size, input_size)).astype(np.float32)
    with torch.no_grad():
        emb_ref = ref(torch.tensor(x)).numpy()
    emb = backbone.apply(
        {"params": variables["params"]["net"],
         "batch_stats": variables["batch_stats"]["net"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    return _report_row(report, "arcface", "embedding",
                       _maxdiff(emb, emb_ref), 1e-3)


# ------------------------------------------------------------- LPIPS ------

def check_lpips(alex_path, lin_path, report):
    import torch

    import jax.numpy as jnp
    from fer_vit_tpu.encoders.lpips import (LPIPS, convert_lpips_checkpoint,
                                            convert_lpips_state_dict)
    from tests.torch_refs_aux import AlexFeaturesRef, LPIPSRef

    if alex_path:
        variables = convert_lpips_checkpoint(alex_path, lin_path)
        alex = AlexFeaturesRef()
        alex.load_state_dict(torch.load(alex_path, map_location="cpu",
                                        weights_only=False))
        ref = LPIPSRef(alex)
        lin_sd = torch.load(lin_path, map_location="cpu", weights_only=False)
        for i, l in enumerate(ref.lins):
            l[1].weight.data = lin_sd[f"lin{i}.model.1.weight"]
    else:
        torch.manual_seed(3)
        alex = AlexFeaturesRef()
        ref = LPIPSRef(alex)
        alex_sd = {k: v.detach().numpy().astype(np.float32)
                   for k, v in alex.state_dict().items()}
        lin_sd = {k: v.numpy().astype(np.float32)
                  for k, v in ref.lin_state_dict().items()}
        variables = convert_lpips_state_dict(alex_sd, lin_sd)
    ref = ref.eval()

    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        d_ref = float(ref(torch.tensor(x), torch.tensor(y)))
    d = float(LPIPS().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                            jnp.asarray(y.transpose(0, 2, 3, 1))))
    return _report_row(report, "lpips", "distance", abs(d - d_ref), 1e-4)


# ---------------------------------------------------------- timm ViT ------

def check_timm(path, report):
    import torch

    import jax
    import jax.numpy as jnp
    from fer_vit_tpu.encoders.convert_timm import convert_timm_state_dict
    from fer_vit_tpu.models.timm_vit import TimmViT
    from tests.torch_refs_aux import TimmViTRef

    if path:
        sd_t = torch.load(path, map_location="cpu", weights_only=False)
        sd = {k: np.asarray(v, np.float32) for k, v in sd_t.items()}
        dim = sd["cls_token"].shape[-1]
        depth = len([k for k in sd if k.endswith(".norm1.weight")])
        n = sd["pos_embed"].shape[1] - 1
        img = int(np.sqrt(n)) * 16
        heads = {192: 3, 384: 6, 768: 12}[dim]
        ref = TimmViTRef(img_size=img, dim=dim, depth=depth, heads=heads,
                         num_classes=sd["head.weight"].shape[0])
        ref.load_state_dict(
            {("patch_proj" + k[len("patch_embed.proj"):]) if
             k.startswith("patch_embed.proj") else
             k.replace(".mlp.fc1", ".mlp_fc1").replace(".mlp.fc2", ".mlp_fc2"):
             torch.tensor(v) for k, v in sd.items()})
        num_classes = sd["head.weight"].shape[0]
    else:
        torch.manual_seed(5)
        img, dim, depth, heads, num_classes = 32, 192, 2, 3, 7
        ref = TimmViTRef(img_size=img, dim=dim, depth=depth, heads=heads,
                         num_classes=num_classes)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in ref.timm_state_dict().items()}
    ref = ref.eval()

    converted = convert_timm_state_dict(sd)["params"]
    model = TimmViT(img_size=img, patch_size=16, embed_dim=dim, depth=depth,
                    num_heads=heads, mlp_dim=dim * 4, num_classes=num_classes)
    init = model.init(jax.random.key(0), jnp.zeros((1, img, img, 3)))
    params = jax.tree_util.tree_map(lambda _, v: jnp.asarray(v),
                                    init["params"], converted)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref(torch.tensor(x)).numpy()
    logits = model.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    return _report_row(report, "timm_vit", "logits",
                       _maxdiff(logits, logits_ref), 1e-3)


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--psp", default=None, help="pSp .pt checkpoint")
    p.add_argument("--arcface", default=None, help="model_ir_se50.pth")
    p.add_argument("--lpips_alex", default=None,
                   help="torchvision alexnet features state_dict")
    p.add_argument("--lpips_lin", default=None,
                   help="lpips package lin weights")
    p.add_argument("--timm", default=None, help="timm ViT state_dict .pt")
    p.add_argument("--skip", nargs="*", default=[],
                   choices=["psp", "stylegan2", "arcface", "lpips", "timm"])
    p.add_argument("--out", default=None, help="write JSON report here")
    args = p.parse_args()

    import jax

    # exact f32 matmuls: AMX/TPU default quantizes to bf16 (~1e-3 noise)
    jax.config.update("jax_default_matmul_precision", "highest")

    report, ok = [], True
    mode = {}
    if "psp" not in args.skip:
        mode["psp"] = "real" if args.psp else "synthetic"
        print(f"pSp encoder ({mode['psp']}):")
        ok &= check_psp(args.psp, report)
    if "stylegan2" not in args.skip:
        mode["stylegan2"] = "real" if args.psp else "synthetic"
        print(f"StyleGAN2 generator ({mode['stylegan2']}):")
        ok &= check_stylegan2(args.psp, report)
    if "arcface" not in args.skip:
        mode["arcface"] = "real" if args.arcface else "synthetic"
        print(f"ArcFace IR-SE50 ({mode['arcface']}):")
        ok &= check_arcface(args.arcface, report)
    if "lpips" not in args.skip:
        mode["lpips"] = "real" if args.lpips_alex else "synthetic"
        print(f"LPIPS alex ({mode['lpips']}):")
        ok &= check_lpips(args.lpips_alex, args.lpips_lin, report)
    if "timm" not in args.skip:
        mode["timm"] = "real" if args.timm else "synthetic"
        print(f"timm ViT ({mode['timm']}):")
        ok &= check_timm(args.timm, report)

    summary = {"ok": bool(ok), "modes": mode, "rows": report}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"report written to {args.out}")
    print("PARITY_HARNESS_OK" if ok else "PARITY_HARNESS_FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
