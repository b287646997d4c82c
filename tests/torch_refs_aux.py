"""Independent PyTorch reimplementations of the remaining pretrained
components — ArcFace IR-SE50 Backbone, LPIPS(alex), timm ViT — used ONLY as
test/parity oracles. Each emits a state_dict with the upstream key naming
(InsightFace / lpips-package / timm) so the converters and JAX ports can be
verified numerically without the real repos or checkpoints."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_psp_ref import PLAN, BottleneckIRSE


class ArcFaceBackboneRef(nn.Module):
    """InsightFace ``Backbone(input_size=112, mode='ir_se')`` naming:
    input_layer.{0,1,2}, body.{i}.*, output_layer.{0:BN2d,3:Linear,4:BN1d}."""

    def __init__(self, plan=None, embedding_size=512, feat_hw=7):
        super().__init__()
        plan = plan or PLAN
        self.input_layer = nn.Sequential(
            nn.Conv2d(3, 64, 3, 1, 1, bias=False),
            nn.BatchNorm2d(64),
            nn.PReLU(64),
        )
        units = []
        for in_c, out_c, n in plan:
            for u in range(n):
                units.append(BottleneckIRSE(in_c if u == 0 else out_c,
                                            out_c, 2 if u == 0 else 1))
        self.body = nn.Sequential(*units)
        out_ch = plan[-1][1]
        self.output_layer = nn.Sequential(
            nn.BatchNorm2d(out_ch),
            nn.Dropout(0.0),
            nn.Flatten(),
            nn.Linear(out_ch * feat_hw * feat_hw, embedding_size),
            nn.BatchNorm1d(embedding_size),
        )

    def forward(self, x):
        return self.output_layer(self.body(self.input_layer(x)))


_ALEX_CFG = [
    (3, 64, 11, 4, 2, True),
    (64, 192, 5, 1, 2, True),
    (192, 384, 3, 1, 1, False),
    (384, 256, 3, 1, 1, False),
    (256, 256, 3, 1, 1, False),
]


class AlexFeaturesRef(nn.Module):
    """torchvision ``alexnet().features`` naming: features.{0,3,6,8,10}."""

    def __init__(self):
        super().__init__()
        layers = []
        for in_c, out_c, k, s, p, pool in _ALEX_CFG:
            layers.append(nn.Conv2d(in_c, out_c, k, s, p))
            layers.append(nn.ReLU(inplace=False))
            if pool:
                layers.append(nn.MaxPool2d(3, 2))
        self.features = nn.Sequential(*layers)
        # indices of ReLU outputs (the 5 lpips slices)
        self.relu_idx = [i for i, m in enumerate(self.features)
                         if isinstance(m, nn.ReLU)]

    def forward(self, x):
        feats = []
        for i, m in enumerate(self.features):
            x = m(x)
            if i in self.relu_idx:
                feats.append(x)
        return feats


class LPIPSRef(nn.Module):
    """lpips-package semantics with ``lin{i}.model.1.weight`` naming."""

    SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def __init__(self, alex: AlexFeaturesRef):
        super().__init__()
        self.alex = alex
        chans = [64, 192, 384, 256, 256]
        self.lins = nn.ModuleList()
        for c in chans:
            lin = nn.Sequential(nn.Identity(),
                                nn.Conv2d(c, 1, 1, bias=False))
            with torch.no_grad():
                lin[1].weight.abs_()  # lpips keeps lins >= 0
            self.lins.append(lin)

    def lin_state_dict(self):
        return {f"lin{i}.model.1.weight": l[1].weight.detach()
                for i, l in enumerate(self.lins)}

    @staticmethod
    def _unit(t):
        n = torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True))
        return t / torch.clamp(n, min=1e-10)

    def forward(self, x, y):
        xn = (x - self.SHIFT) / self.SCALE
        yn = (y - self.SHIFT) / self.SCALE
        total = 0.0
        for fx, fy, lin in zip(self.alex(xn), self.alex(yn), self.lins):
            d = (self._unit(fx) - self._unit(fy)) ** 2
            total = total + lin(d).mean(dim=(1, 2, 3)).mean()
        return total


class _TimmAttn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, D // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = (q @ k.transpose(-2, -1)) * (D // self.heads) ** -0.5
        a = a.softmax(dim=-1)
        out = (a @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(out)


class _TimmBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TimmAttn(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.ModuleDict({})  # placeholder for naming below
        self.mlp_fc1 = nn.Linear(dim, hidden)
        self.mlp_fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        h = self.mlp_fc2(F.gelu(self.mlp_fc1(self.norm2(x)), approximate="none"))
        return x + h


class TimmViTRef(nn.Module):
    """Pre-norm ViT with timm state-dict naming (patch_embed.proj, cls_token,
    pos_embed, blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2},
    norm, head)."""

    def __init__(self, img_size=224, patch=16, dim=192, depth=2, heads=3,
                 num_classes=7):
        super().__init__()
        self.patch_embed = nn.ModuleDict({})
        self.patch_proj = nn.Conv2d(3, dim, patch, patch)
        n = (img_size // patch) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [_TimmBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)

    def timm_state_dict(self):
        sd = {}
        sd["patch_embed.proj.weight"] = self.patch_proj.weight.detach()
        sd["patch_embed.proj.bias"] = self.patch_proj.bias.detach()
        sd["cls_token"] = self.cls_token.detach()
        sd["pos_embed"] = self.pos_embed.detach()
        for i, b in enumerate(self.blocks):
            p = f"blocks.{i}"
            sd[f"{p}.norm1.weight"] = b.norm1.weight.detach()
            sd[f"{p}.norm1.bias"] = b.norm1.bias.detach()
            sd[f"{p}.attn.qkv.weight"] = b.attn.qkv.weight.detach()
            sd[f"{p}.attn.qkv.bias"] = b.attn.qkv.bias.detach()
            sd[f"{p}.attn.proj.weight"] = b.attn.proj.weight.detach()
            sd[f"{p}.attn.proj.bias"] = b.attn.proj.bias.detach()
            sd[f"{p}.norm2.weight"] = b.norm2.weight.detach()
            sd[f"{p}.norm2.bias"] = b.norm2.bias.detach()
            sd[f"{p}.mlp.fc1.weight"] = b.mlp_fc1.weight.detach()
            sd[f"{p}.mlp.fc1.bias"] = b.mlp_fc1.bias.detach()
            sd[f"{p}.mlp.fc2.weight"] = b.mlp_fc2.weight.detach()
            sd[f"{p}.mlp.fc2.bias"] = b.mlp_fc2.bias.detach()
        sd["norm.weight"] = self.norm.weight.detach()
        sd["norm.bias"] = self.norm.bias.detach()
        sd["head.weight"] = self.head.weight.detach()
        sd["head.bias"] = self.head.bias.detach()
        return sd

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_proj(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for b in self.blocks:
            x = b(x)
        return self.head(self.norm(x)[:, 0])


class _TimmMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x), approximate="none"))


class TimmBlockNamed(nn.Module):
    """timm Block with EXACT timm attribute naming (norm1, attn.qkv,
    attn.proj, norm2, mlp.fc1, mlp.fc2) so a wrapper module that registers
    these blocks (reference HybridLatentViT keeps them as ``transformer``,
    models_fer_vit/hybrid_latent_vit.py:158-169) produces timm-compatible
    state_dict keys like ``transformer.0.mlp.fc1.weight``."""

    def __init__(self, dim, heads, mlp_hidden):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TimmAttn(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TimmMlp(dim, mlp_hidden)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TimmViTStub(nn.Module):
    """Minimal stand-in for ``timm.create_model(...)``: exposes exactly the
    surface the reference HybridLatentViT consumes (``embed_dim``,
    ``cls_token``, ``pos_embed``, ``blocks`` — hybrid_latent_vit.py:68-93)
    with faithful timm block semantics (pre-norm residual, packed qkv,
    exact GELU)."""

    def __init__(self, embed_dim, depth, num_heads, mlp_hidden, n_patches=18):
        super().__init__()
        self.embed_dim = embed_dim
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, n_patches + 1, embed_dim))
        self.blocks = nn.ModuleList(
            [TimmBlockNamed(embed_dim, num_heads, mlp_hidden)
             for _ in range(depth)])


# NOTE: every name an installer below registers must be listed in
# tests/env_utils.FAKE_MODULE_NAMES — the conftest autouse fixture is the
# single restore mechanism (it snapshots/restores those sys.modules
# entries around each test). Outside pytest (the equivalence harness
# script) the stubs intentionally stay installed for the process lifetime.


def _register(name, mod):
    import sys

    from tests.env_utils import FAKE_MODULE_NAMES

    assert name in FAKE_MODULE_NAMES, (
        f"{name!r} missing from env_utils.FAKE_MODULE_NAMES — the conftest "
        "leak guard would not restore it")
    sys.modules[name] = mod


def install_fake_timm(cfg_by_name):
    """Register a stub ``timm`` module (timm is absent from this image) so
    the reference's hybrid-family model code imports and constructs. Every
    learned weight is overwritten by ``load_state_dict`` afterwards, so only
    the stub's *architecture* (shapes + forward semantics) matters.

    Args:
        cfg_by_name: maps timm model names (e.g. ``vit_tiny_patch16_224``)
            to :class:`TimmViTStub` kwargs.
    """
    import types

    mod = types.ModuleType("timm")

    def create_model(name, pretrained=False, num_classes=0, **kw):
        return TimmViTStub(**cfg_by_name[name])

    mod.create_model = create_model
    _register("timm", mod)


def install_fake_torchvision():
    """Register a stub ``torchvision`` (absent from this image) so the
    reference's image trainer imports. ``data/image_dataset.py`` touches
    only ``transforms.<Name>`` lazily inside functions (plus ``Compose``
    in return annotations); any attribute resolves to a placeholder
    class. The equivalence harness never runs these transforms — both
    sides consume pre-built tensors."""
    import types

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    def _placeholder(name):
        # inspect.getmodule scans sys.modules probing __file__ etc. —
        # dunders must miss like a normal module.
        if name.startswith("__"):
            raise AttributeError(name)
        # instantiable with any args: afs/image_provider.py builds a
        # transforms.Compose([...]) pipeline at import time.
        return type(name, (), {"__init__": lambda self, *a, **k: None,
                               "__call__": lambda self, *a, **k: None})

    tr.__getattr__ = _placeholder
    tv.transforms = tr
    _register("torchvision", tv)
    _register("torchvision.transforms", tr)


def install_fake_torchvision_functional():
    """Register a torchvision stub whose val-transform pieces (Compose /
    Resize / ToTensor / Normalize) are faithful FUNCTIONAL implementations,
    enough for the reference's ImageFERDataset eval path to produce exact
    tensors: Resize is identity at matching size (the equivalence race
    writes PNGs at the target size) and PIL-bilinear otherwise; ToTensor
    and Normalize mirror torchvision's arithmetic exactly."""
    import types

    import torch as _torch
    from PIL import Image as _Image

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, ts):
            self.ts = list(ts)

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size, **kw):
            self.size = ((size, size) if isinstance(size, int)
                         else tuple(size))  # (H, W)

        def __call__(self, img):
            if img.size == (self.size[1], self.size[0]):  # PIL is (W, H)
                return img
            return img.resize((self.size[1], self.size[0]),
                              _Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return (_torch.from_numpy(arr.transpose(2, 0, 1).copy())
                    .to(_torch.float32).div(255.0))

    class Normalize:
        def __init__(self, mean, std, **kw):
            self.mean = _torch.tensor(mean,
                                      dtype=_torch.float32).view(-1, 1, 1)
            self.std = _torch.tensor(std,
                                     dtype=_torch.float32).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    for n_, c in (("Compose", Compose), ("Resize", Resize),
                  ("ToTensor", ToTensor), ("Normalize", Normalize)):
        setattr(tr, n_, c)
    tv.transforms = tr
    _register("torchvision", tv)
    _register("torchvision.transforms", tr)


def install_fake_psp_modules(arcface_plan, feat_hw=7):
    """Register stub ``models.encoders.model_irse`` / ``criteria.lpips.lpips``
    modules — the reference's AFS losses import them from the absent
    ``third_party/pixel2style2pixel`` repo (reference afs/losses.py:29-37).
    The stubs are the oracle replicas above with a configurable reduced
    plan; checked-in naming matches InsightFace / lpips-package, so weights
    flow through the same converters both frameworks use for the real
    checkpoints."""
    import types

    m_root = types.ModuleType("models")
    m_enc = types.ModuleType("models.encoders")
    m_irse = types.ModuleType("models.encoders.model_irse")

    class Backbone(ArcFaceBackboneRef):
        # reference signature: Backbone(input_size, num_layers, drop_ratio,
        # mode) — the stub pins the reduced donor plan instead; dropout is
        # position-preserved and inert (the extractor runs eval()).
        def __init__(self, input_size=112, num_layers=50, drop_ratio=0.6,
                     mode="ir_se"):
            super().__init__(plan=arcface_plan, feat_hw=feat_hw)

    m_irse.Backbone = Backbone
    m_root.encoders = m_enc
    m_enc.model_irse = m_irse

    c_root = types.ModuleType("criteria")
    c_lp = types.ModuleType("criteria.lpips")
    c_lpl = types.ModuleType("criteria.lpips.lpips")

    class LPIPS(LPIPSRef):
        def __init__(self, net_type="alex"):
            super().__init__(AlexFeaturesRef())

    c_lpl.LPIPS = LPIPS
    c_lp.lpips = c_lpl
    c_root.lpips = c_lp
    for name, mod in [("models", m_root), ("models.encoders", m_enc),
                      ("models.encoders.model_irse", m_irse),
                      ("criteria", c_root), ("criteria.lpips", c_lp),
                      ("criteria.lpips.lpips", c_lpl)]:
        _register(name, mod)
