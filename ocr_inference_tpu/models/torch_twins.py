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
  TEaster2          <-> models.recognition.Easter2 (base variant)
  TEaster2Attention <-> models.recognition.Easter2 (attention variant)
  TUNet             <-> models.segmentation.UNet
  TCRNN             <-> models.recognition.CRNN
  TDeepLabV3Plus    <-> models.segmentation.DeepLabV3Plus
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

    def __init__(self, height, width, vocab, stem=128, width_mult=1.0):
        super().__init__()
        w2, w4 = -(-width // 2), -(-width // 4)
        c256 = max(int(256 * width_mult), 8)
        c512 = max(int(512 * width_mult), 8)
        self.stem1 = TConvBN1D(height, stem, 3, width, stride=2)
        self.stem2 = TConvBN1D(stem, stem, 3, w2, stride=2)
        self.b1 = TEaster2Block(stem, c256, 5, w4)
        self.b2 = TEaster2Block(c256, c256, 7, w4)
        self.b3 = TEaster2Block(c256, c512, 9, w4)
        self.post1 = TConvBN1D(c512, c512, 11, w4, dilation=2)
        self.post2 = TConvBN1D(c512, c512, 1, w4)
        self.head = tnn.Conv1d(c512, vocab, 1, bias=True)

    def forward(self, x):  # x: (B, H, W) = (B, C, L)
        x = self.stem2(self.stem1(x))
        x = self.b3(self.b2(self.b1(x)))
        x = self.post2(self.post1(x))
        return self.head(x)  # (B, V, T)


class TMHSABlock(tnn.Module):
    """Torch twin of models.recognition.MHSABlock: pre-norm MHSA + MLP over
    (B, T, C). Separate q/k/v/out Linears in flax's execution order (the
    transplanter matches weighted ops positionally), query scaled by
    1/sqrt(head_dim), tanh-approximate GELU (flax nn.gelu's default)."""

    def __init__(self, dim, heads=8, ln_eps=1e-6):
        super().__init__()
        self.heads = heads
        self.ln1 = tnn.LayerNorm(dim, eps=ln_eps)
        self.q = tnn.Linear(dim, dim)
        self.k = tnn.Linear(dim, dim)
        self.v = tnn.Linear(dim, dim)
        self.o = tnn.Linear(dim, dim)
        self.ln2 = tnn.LayerNorm(dim, eps=ln_eps)
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):  # (B, T, C)
        y = self.ln1(x)
        b, t, c = y.shape
        h = self.heads
        d = c // h
        q = self.q(y).reshape(b, t, h, d)
        k = self.k(y).reshape(b, t, h, d)
        v = self.v(y).reshape(b, t, h, d)
        att = torch.einsum("bthd,bshd->bhts", q, k) / (d ** 0.5)
        att = att.softmax(dim=-1)
        z = torch.einsum("bhts,bshd->bthd", att, v).reshape(b, t, c)
        x = x + self.o(z)
        y = self.ln2(x)
        y = self.fc2(F.gelu(self.fc1(y), approximate="tanh"))
        return x + y


class TEaster2Attention(tnn.Module):
    """Torch twin of models.recognition.Easter2(variant="attention"): the
    TEaster2 trunk with MHSA blocks between the conv blocks and the post
    convs (flax runs attention on (B, T, C); the trunk is channel-major, so
    the blocks are bracketed by transposes)."""

    def __init__(self, height, width, vocab, stem=128, depth=2, heads=8,
                 ln_eps=1e-6):
        super().__init__()
        w2, w4 = -(-width // 2), -(-width // 4)
        self.stem1 = TConvBN1D(height, stem, 3, width, stride=2)
        self.stem2 = TConvBN1D(stem, stem, 3, w2, stride=2)
        self.b1 = TEaster2Block(stem, 256, 5, w4)
        self.b2 = TEaster2Block(256, 256, 7, w4)
        self.b3 = TEaster2Block(256, 512, 9, w4)
        self.attn = tnn.ModuleList(
            [TMHSABlock(512, heads=heads, ln_eps=ln_eps)
             for _ in range(depth)]
        )
        self.post1 = TConvBN1D(512, 512, 11, w4, dilation=2)
        self.post2 = TConvBN1D(512, 512, 1, w4)
        self.head = tnn.Conv1d(512, vocab, 1, bias=True)

    def forward(self, x):  # (B, H, W)
        x = self.stem2(self.stem1(x))
        x = self.b3(self.b2(self.b1(x)))
        x = x.transpose(1, 2)  # (B, T, C)
        for blk in self.attn:
            x = blk(x)
        x = x.transpose(1, 2)  # (B, C, T)
        x = self.post2(self.post1(x))
        return self.head(x)  # (B, V, T)


class TCRNN(tnn.Module):
    """Torch twin of models.recognition.CRNN: conv stack collapsing height
    16x, feature Linear, two bidirectional GRU layers, vocab head. The
    height-then-channel feature collapse order and the [fwd, bwd] output
    concatenation mirror the Flax module exactly so transplanted weights
    are numerically interchangeable."""

    def __init__(self, height, vocab, hidden=256):
        super().__init__()
        chans = [(64, (2, 2)), (128, (2, 2)), (256, (2, 1)),
                 (256, (2, 1)), (512, None)]
        convs = []
        cin = 1
        for cout, pool in chans:
            convs.append(tnn.ModuleList([
                tnn.Conv2d(cin, cout, 3, padding=1, bias=False),
                tnn.BatchNorm2d(cout),
            ]))
            cin = cout
        self.convs = tnn.ModuleList(convs)
        self.pools = [pool for _, pool in chans]
        self.fc_in = tnn.Linear((height // 16) * 512, hidden)
        self.gru1 = tnn.GRU(hidden, hidden, bidirectional=True,
                            batch_first=True)
        self.gru2 = tnn.GRU(2 * hidden, hidden, bidirectional=True,
                            batch_first=True)
        self.head = tnn.Linear(2 * hidden, vocab)

    def forward(self, x):  # (B, 1, H, W)
        for (conv, bn), pool in zip(self.convs, self.pools):
            x = F.relu(bn(conv(x)))
            if pool is not None:
                x = F.max_pool2d(x, pool, stride=pool)
        b, c, h, w = x.shape
        # (B, C, H, W) -> (B, W, H, C) -> (B, W, H*C): height-major feature
        # order, identical to the Flax transpose(0,2,1,3)+reshape
        x = x.permute(0, 3, 2, 1).reshape(b, w, h * c)
        x = self.fc_in(x)
        x, _ = self.gru1(x)
        x, _ = self.gru2(x)
        return self.head(x)  # (B, T, V)


class TConvBN2D(tnn.Module):
    """Torch twin of models.layers.ConvBN (3x3 SAME, stride 1)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def space_to_depth_nchw(x, k: int):
    """NCHW space-to-depth in the ONNX / flax channel order: output channel
    index = (bi*k + bj)*C + c (torch's pixel_unshuffle uses the OTHER,
    c-major order and is NOT numerically interchangeable)."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // k, k, w // k, k)
    x = x.permute(0, 3, 5, 1, 2, 4)
    return x.reshape(b, c * k * k, h // k, w // k)


class TUNet(tnn.Module):
    """Torch twin of models.segmentation.UNet (incl. the space-to-depth
    stem variant, stem_stride=2)."""

    def __init__(self, width=8, classes=1, in_ch=3, stem_stride=1):
        super().__init__()
        feats = [width, width * 2, width * 4, width * 8]
        self.stem_stride = stem_stride
        self.stem_conv = None
        self.stem_out = None
        cin = in_ch
        if stem_stride > 1:
            self.stem_conv = TConvBN2D(in_ch, width // 2)
            cin = in_ch * stem_stride * stem_stride
        downs = []
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
        head_in = feats[0]
        if stem_stride > 1:
            self.stem_out = TConvBN2D(feats[0] + width // 2, width // 2)
            head_in = width // 2
        self.head = tnn.Conv2d(head_in, classes, 1, bias=True)

    def forward(self, x):  # NCHW
        stem = None
        if self.stem_conv is not None:
            stem = self.stem_conv(x)
            x = space_to_depth_nchw(x, self.stem_stride)
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
        if stem is not None:
            s = self.stem_stride
            while s > 1:  # power-of-two stride -> log2(s) upsamples
                x = F.interpolate(x, scale_factor=2, mode="nearest")
                s //= 2
            x = torch.cat([x, stem], dim=1)
            x = self.stem_out(x)
        return self.head(x)


class TConvBN2DS(tnn.Module):
    """Torch twin of models.layers.ConvBN for arbitrary kernel / stride /
    dilation: XLA SAME padding replicated as explicit (possibly asymmetric)
    F.pad for the twin's fixed input size."""

    def __init__(self, cin, cout, k, hw, stride=1, dilation=1, act=True):
        super().__init__()
        ph = same_pads(hw[0], k, stride, dilation)
        pw = same_pads(hw[1], k, stride, dilation)
        self.pads = (pw[0], pw[1], ph[0], ph[1])
        self.conv = tnn.Conv2d(cin, cout, k, stride=stride,
                               dilation=dilation, bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(F.pad(x, self.pads)))
        return F.relu(x) if self.act else x


def _half(hw):
    return (-(-hw[0] // 2), -(-hw[1] // 2))


class TResidualBlock(tnn.Module):
    """Torch twin of models.layers.ResidualBlock (basic block, projection
    shortcut when shape changes)."""

    def __init__(self, cin, f, hw, stride=1):
        super().__init__()
        self.c1 = TConvBN2DS(cin, f, 3, hw, stride=stride)
        out_hw = _half(hw) if stride == 2 else hw
        self.c2 = TConvBN2DS(f, f, 3, out_hw, act=False)
        self.short = None
        if stride != 1 or cin != f:
            self.short = tnn.ModuleList([
                tnn.Conv2d(cin, f, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(f),
            ])

    def forward(self, x):
        y = self.c2(self.c1(x))
        r = x
        if self.short is not None:
            conv, bn = self.short
            r = bn(conv(x))
        return F.relu(y + r)


class TASPP(tnn.Module):
    """Torch twin of models.layers.ASPP: 1x1 + three dilated 3x3 branches +
    image-level pooling branch, concat in flax branch order, 1x1 proj."""

    def __init__(self, cin, hw, feats=256, rates=(6, 12, 18)):
        super().__init__()
        self.b0 = TConvBN2DS(cin, feats, 1, hw)
        self.bs = tnn.ModuleList(
            [TConvBN2DS(cin, feats, 3, hw, dilation=r) for r in rates]
        )
        self.pool_conv = TConvBN2DS(cin, feats, 1, (1, 1))
        self.proj = TConvBN2DS(feats * (2 + len(rates)), feats, 1, hw)

    def forward(self, x):
        outs = [self.b0(x)] + [b(x) for b in self.bs]
        p = x.mean(dim=(2, 3), keepdim=True)
        p = self.pool_conv(p)
        outs.append(p.expand(-1, -1, x.shape[2], x.shape[3]))
        return self.proj(torch.cat(outs, dim=1))


class TDeepLabV3Plus(tnn.Module):
    """Torch twin of models.segmentation.DeepLabV3Plus (ResNetEncoder with
    blocks_per_stage=2, ASPP head, stride-4 skip decoder). Bilinear resizes
    use align_corners=False = the half-pixel convention of
    jax.image.resize."""

    def __init__(self, hw=(64, 64), classes=5, widths=(64, 128, 256, 512)):
        super().__init__()
        self.stem = TConvBN2DS(3, widths[0], 7, hw, stride=2)
        s2 = _half(hw)
        mp_h = same_pads(s2[0], 3, 2)
        mp_w = same_pads(s2[1], 3, 2)
        self.mp_pads = (mp_w[0], mp_w[1], mp_h[0], mp_h[1])
        s4 = _half(s2)
        stage0 = [TResidualBlock(widths[0], widths[0], s4) for _ in range(2)]
        self.stage0 = tnn.ModuleList(stage0)
        stages = []
        cin, shw = widths[0], s4
        for f in widths[1:]:
            stages.append(tnn.ModuleList([
                TResidualBlock(cin, f, shw, stride=2),
                TResidualBlock(f, f, _half(shw)),
            ]))
            cin, shw = f, _half(shw)
        self.stages = tnn.ModuleList(stages)
        self.aspp = TASPP(widths[-1], shw)
        self.low_conv = TConvBN2DS(widths[0], 48, 1, s4)
        self.dec1 = TConvBN2DS(256 + 48, 256, 3, s4)
        self.dec2 = TConvBN2DS(256, 256, 3, s4)
        self.head = tnn.Conv2d(256, classes, 1, bias=True)
        self.hw = hw

    def forward(self, x):  # (B, 3, H, W)
        x = self.stem(x)
        x = F.max_pool2d(
            F.pad(x, self.mp_pads, value=float("-inf")), 3, stride=2
        )
        for blk in self.stage0:
            x = blk(x)
        low = x  # stride 4
        for a, b in self.stages:
            x = b(a(x))
        y = self.aspp(x)
        y = F.interpolate(y, size=low.shape[2:], mode="bilinear",
                          align_corners=False)
        low = self.low_conv(low)
        y = torch.cat([y, low], dim=1)
        y = self.dec2(self.dec1(y))
        logits = self.head(y)
        return F.interpolate(logits, size=self.hw, mode="bilinear",
                             align_corners=False)
