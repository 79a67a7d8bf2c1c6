"""PyTorch replicas of the native Flax architectures (validation scaffolding).

These twins exist so the framework can be checked against a genuinely
independent runtime: the same weights run through torch's C++ kernels, the
real TorchScript ONNX exporter (onnx/export_shim.py), the framework's own
graph executor (onnx/runner.py), and the native Flax modules after weight
transplant (onnx/transplant.py). tests/test_transplant.py pins the numeric
agreement; the torch-CPU reference-style baseline (bench_torch_baseline.py)
uses them as the independent-runtime stand-in for the reference's CPU
ONNXRuntime sessions (reference: BDRC/inference.py:128,294 — onnxruntime is
not installable in this sandbox).

Architecture twins:
  TEaster2  <-> models.recognition.Easter2 (base variant)
  TUNet     <-> models.segmentation.UNet
"""

from __future__ import annotations

import torch
import torch.nn as tnn
import torch.nn.functional as F


def same_pads(length: int, k: int, stride: int, dilation: int = 1):
    """XLA SAME padding (lo, hi) for a known static length."""
    k_eff = (k - 1) * dilation + 1
    out = -(-length // stride)
    total = max((out - 1) * stride + k_eff - length, 0)
    lo = total // 2
    return lo, total - lo


class TConvBN1D(tnn.Module):
    """Torch twin of models.layers.ConvBN1D (SAME padding replicated as
    explicit asymmetric F.pad for the fixed export length)."""

    def __init__(self, cin, cout, k, length, stride=1, dilation=1, act=True):
        super().__init__()
        self.pads = same_pads(length, k, stride, dilation)
        self.conv = tnn.Conv1d(cin, cout, k, stride=stride,
                               dilation=dilation, bias=False)
        self.bn = tnn.BatchNorm1d(cout)
        self.act = act

    def forward(self, x):
        x = F.pad(x, self.pads)
        x = self.bn(self.conv(x))
        return F.relu(x) if self.act else x


class TEaster2Block(tnn.Module):
    """Torch twin of models.recognition.Easter2Block."""

    def __init__(self, cin, cout, k, length):
        super().__init__()
        self.res_conv = tnn.Conv1d(cin, cout, 1, bias=False)
        self.res_bn = tnn.BatchNorm1d(cout)
        self.c1 = TConvBN1D(cin, cout, k, length)
        self.c2 = TConvBN1D(cout, cout, k, length)
        self.c3 = TConvBN1D(cout, cout, k, length, act=False)
        self.fc1 = tnn.Linear(cout, max(cout // 8, 8))
        self.fc2 = tnn.Linear(max(cout // 8, 8), cout)

    def forward(self, x):
        r = self.res_bn(self.res_conv(x))
        y = self.c3(self.c2(self.c1(x)))
        s = y.mean(dim=2)
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
        y = y * s[:, :, None]
        return F.relu(y + r)


class TEaster2(tnn.Module):
    """Torch twin of models.recognition.Easter2 (base variant)."""

    def __init__(self, height, width, vocab, stem=128):
        super().__init__()
        w2, w4 = -(-width // 2), -(-width // 4)
        self.stem1 = TConvBN1D(height, stem, 3, width, stride=2)
        self.stem2 = TConvBN1D(stem, stem, 3, w2, stride=2)
        self.b1 = TEaster2Block(stem, 256, 5, w4)
        self.b2 = TEaster2Block(256, 256, 7, w4)
        self.b3 = TEaster2Block(256, 512, 9, w4)
        self.post1 = TConvBN1D(512, 512, 11, w4, dilation=2)
        self.post2 = TConvBN1D(512, 512, 1, w4)
        self.head = tnn.Conv1d(512, vocab, 1, bias=True)

    def forward(self, x):  # x: (B, H, W) = (B, C, L)
        x = self.stem2(self.stem1(x))
        x = self.b3(self.b2(self.b1(x)))
        x = self.post2(self.post1(x))
        return self.head(x)  # (B, V, T)


class TConvBN2D(tnn.Module):
    """Torch twin of models.layers.ConvBN (3x3 SAME, stride 1)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TUNet(tnn.Module):
    """Torch twin of models.segmentation.UNet."""

    def __init__(self, width=8, classes=1, in_ch=3):
        super().__init__()
        feats = [width, width * 2, width * 4, width * 8]
        downs = []
        cin = in_ch
        for f in feats:
            downs.append(tnn.ModuleList([TConvBN2D(cin, f), TConvBN2D(f, f)]))
            cin = f
        self.downs = tnn.ModuleList(downs)
        self.mid1 = TConvBN2D(cin, width * 16)
        self.mid2 = TConvBN2D(width * 16, width * 16)
        ups = []
        cin = width * 16
        for f in reversed(feats):
            ups.append(tnn.ModuleList([
                tnn.Conv2d(cin, f, 2, bias=True),  # SAME(0,1) via F.pad
                TConvBN2D(f + f, f),
                TConvBN2D(f, f),
            ]))
            cin = f
        self.ups = tnn.ModuleList(ups)
        self.head = tnn.Conv2d(feats[0], classes, 1, bias=True)

    def forward(self, x):  # NCHW
        skips = []
        for c1, c2 in self.downs:
            x = c2(c1(x))
            skips.append(x)
            x = F.max_pool2d(x, 2)
        x = self.mid2(self.mid1(x))
        for (up_conv, c1, c2), skip in zip(self.ups, reversed(skips)):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = up_conv(F.pad(x, (0, 1, 0, 1)))
            x = torch.cat([x, skip], dim=1)
            x = c2(c1(x))
        return self.head(x)
