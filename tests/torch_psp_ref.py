"""Independent PyTorch reimplementation of the public pSp GradualStyleEncoder
architecture (pixel2style2pixel / InsightFace IR-SE), used ONLY as a test
oracle: it generates a state_dict with the third-party key naming and
reference outputs, so the converter + JAX encoder can be verified for
numerical parity without the third-party repo or its checkpoints.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class SEModule(nn.Module):
    def __init__(self, channels, reduction=16):
        super().__init__()
        self.avg_pool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(channels, channels // reduction, 1, bias=False)
        self.relu = nn.ReLU(inplace=True)
        self.fc2 = nn.Conv2d(channels // reduction, channels, 1, bias=False)
        self.sigmoid = nn.Sigmoid()

    def forward(self, x):
        s = self.avg_pool(x)
        s = self.relu(self.fc1(s))
        s = self.sigmoid(self.fc2(s))
        return x * s


class BottleneckIRSE(nn.Module):
    def __init__(self, in_channel, depth, stride):
        super().__init__()
        if in_channel == depth:
            self.shortcut_layer = nn.MaxPool2d(1, stride)
        else:
            self.shortcut_layer = nn.Sequential(
                nn.Conv2d(in_channel, depth, 1, stride, bias=False),
                nn.BatchNorm2d(depth),
            )
        self.res_layer = nn.Sequential(
            nn.BatchNorm2d(in_channel),
            nn.Conv2d(in_channel, depth, 3, 1, 1, bias=False),
            nn.PReLU(depth),
            nn.Conv2d(depth, depth, 3, stride, 1, bias=False),
            nn.BatchNorm2d(depth),
            SEModule(depth, 16),
        )

    def forward(self, x):
        return self.res_layer(x) + self.shortcut_layer(x)


class EqualLinear(nn.Module):
    def __init__(self, in_dim, out_dim, lr_mul=1.0):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(out_dim, in_dim).div_(lr_mul))
        self.bias = nn.Parameter(torch.zeros(out_dim))
        self.scale = (1 / math.sqrt(in_dim)) * lr_mul
        self.lr_mul = lr_mul

    def forward(self, x):
        return F.linear(x, self.weight * self.scale, bias=self.bias * self.lr_mul)


class GradualStyleBlock(nn.Module):
    def __init__(self, in_c, out_c, spatial):
        super().__init__()
        self.out_c = out_c
        num_pools = int(math.log2(spatial))
        modules = []
        modules += [nn.Conv2d(in_c, out_c, 3, 2, 1), nn.LeakyReLU()]
        for _ in range(num_pools - 1):
            modules += [nn.Conv2d(out_c, out_c, 3, 2, 1), nn.LeakyReLU()]
        self.convs = nn.Sequential(*modules)
        self.linear = EqualLinear(out_c, out_c, lr_mul=1)

    def forward(self, x):
        x = self.convs(x)
        x = x.view(-1, self.out_c)
        return self.linear(x)


PLAN = [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)]


class GradualStyleEncoderRef(nn.Module):
    """state_dict keys match the third-party pSp encoder."""

    def __init__(self, n_styles=18, plan=None, input_size=256):
        super().__init__()
        plan = plan or PLAN
        s16 = input_size // 16
        self.input_layer = nn.Sequential(
            nn.Conv2d(3, 64, 3, 1, 1, bias=False),
            nn.BatchNorm2d(64),
            nn.PReLU(64),
        )
        units = []
        for in_c, out_c, n in plan:
            for u in range(n):
                units.append(
                    BottleneckIRSE(in_c if u == 0 else out_c, out_c,
                                   2 if u == 0 else 1)
                )
        self.body = nn.ModuleList(units)
        n_units = len(units)
        # taps: after stage2 (c1), after stage3 (c2), final (c3)
        self.tap1 = plan[0][2] + plan[1][2] - 1
        self.tap2 = self.tap1 + plan[2][2]
        self.tap3 = n_units - 1

        self.coarse_ind = 3
        self.middle_ind = 7
        self.styles = nn.ModuleList()
        for i in range(n_styles):
            if i < self.coarse_ind:
                self.styles.append(GradualStyleBlock(512, 512, s16))
            elif i < self.middle_ind:
                self.styles.append(GradualStyleBlock(512, 512, 2 * s16))
            else:
                self.styles.append(GradualStyleBlock(512, 512, 4 * s16))
        self.latlayer1 = nn.Conv2d(256, 512, 1)
        self.latlayer2 = nn.Conv2d(128, 512, 1)

    @staticmethod
    def _upsample_add(x, y):
        _, _, h, w = y.size()
        return (
            F.interpolate(x, size=(h, w), mode="bilinear", align_corners=True)
            + y
        )

    def forward(self, x):
        x = self.input_layer(x)
        c1 = c2 = c3 = None
        for i, m in enumerate(self.body):
            x = m(x)
            if i == self.tap1:
                c1 = x
            elif i == self.tap2:
                c2 = x
            elif i == self.tap3:
                c3 = x
        latents = []
        for j in range(self.coarse_ind):
            latents.append(self.styles[j](c3))
        p2 = self._upsample_add(c3, self.latlayer1(c2))
        for j in range(self.coarse_ind, self.middle_ind):
            latents.append(self.styles[j](p2))
        p1 = self._upsample_add(p2, self.latlayer2(c1))
        for j in range(self.middle_ind, len(self.styles)):
            latents.append(self.styles[j](p1))
        return torch.stack(latents, dim=1)
