"""Numeric forward parity for the metric-net importers.

torchvision is absent in this environment, so each architecture is
mirrored here in plain torch with torchvision-compatible state_dict key
names (InceptionV3: torchvision/models/inception.py layout consumed by
Face-DeId/metrics/fid.py:18-44; AlexNet: torchvision alexnet.features
consumed by Face-DeId/metrics/lpips.py:10-25; ResNet: torchvision
resnet.py layout consumed by Image_Caption/models.py:8-30; IResNet:
insightface iresnet.py layout).  Random weights AND random BN running
stats are loaded on both sides — a transposed kernel, swapped BN stat,
or branch-order mismatch in ``utils.torch_import`` fails these tests
even without the real pretrained files.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from ppvision_tpu.metrics.face_id import IResNet, arcface_variables_from_torch
from ppvision_tpu.metrics.fid import InceptionV3
from ppvision_tpu.metrics.lpips import LPIPS
from ppvision_tpu.models.resnet import CaptionEncoder
from ppvision_tpu.utils import torch_import as ti


def _np(x):
    return x.detach().numpy()


def _sd(module):
    return {k: _np(v) for k, v in module.state_dict().items()}


def _randomize(module: tnn.Module, seed: int) -> None:
    """Fill every tensor in the state_dict (weights, biases, running
    stats) with random values so swapped mean/var or scale/bias is
    numerically visible."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if not torch.is_floating_point(v):
            continue
        if k.endswith("running_var"):
            v.copy_(torch.rand(v.shape, generator=g) * 1.5 + 0.5)
        else:
            v.copy_(torch.randn(v.shape, generator=g) * 0.1)
    module.load_state_dict(sd)


# ---------------------------------------------------------------------------
# InceptionV3 (torchvision inception.py key layout).
# ---------------------------------------------------------------------------


class BasicConv2d(tnn.Module):
    def __init__(self, c_in, c_out, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(c_in, c_out, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(c_out, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TInceptionA(tnn.Module):
    def __init__(self, c_in, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(c_in, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(c_in, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(c_in, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(c_in, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, b3, bp], 1)


class TInceptionB(tnn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.branch3x3 = BasicConv2d(c_in, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(c_in, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class TInceptionC(tnn.Module):
    def __init__(self, c_in, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(c_in, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(c_in, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(c_in, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(c_in, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(self.branch7x7dbl_3(self.branch7x7dbl_2(bd)))
        )
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(tnn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(c_in, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(c_in, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class TInceptionE(tnn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.branch1x1 = BasicConv2d(c_in, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(c_in, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(c_in, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(c_in, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class TInceptionV3(tnn.Module):
    """Pool3 feature extractor with torchvision attribute names, matching
    the reference's block1..4 slicing (Face-DeId/metrics/fid.py:18-44)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280)
        self.Mixed_7c = TInceptionE(2048)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        for blk in (
            self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
            self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
            self.Mixed_7a, self.Mixed_7b, self.Mixed_7c,
        ):
            x = blk(x)
        x = F.adaptive_avg_pool2d(x, (1, 1))
        return x.view(x.size(0), -1)


@pytest.mark.slow
def test_inception_importer_numeric_parity():
    torch.manual_seed(0)
    tm = TInceptionV3().eval()
    _randomize(tm, seed=10)
    variables = ti.inception_variables_from_torch(_sd(tm))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(InceptionV3().apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# AlexNet + LPIPS (reference Face-DeId/metrics/lpips.py formulation).
# ---------------------------------------------------------------------------


def _torch_alexnet_features():
    """torchvision ``alexnet.features`` mirror (conv indices 0,3,6,8,10)."""
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
    )


def _torch_lpips(feats, lin_w, x, y):
    """Reference LPIPS.forward (lpips.py:61-72) on NCHW tensors."""
    mu = torch.tensor([-0.03, -0.088, -0.188]).view(1, 3, 1, 1)
    sigma = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    x = (x - mu) / sigma
    y = (y - mu) / sigma

    def fmaps(z):
        out = []
        for layer in feats:
            z = layer(z)
            if isinstance(layer, tnn.ReLU):
                out.append(z)
        return out

    def normalize(f):
        return f * torch.rsqrt(torch.sum(f**2, dim=1, keepdim=True) + 1e-10)

    total = 0.0
    for fx, fy, w in zip(fmaps(x), fmaps(y), lin_w):
        d = (normalize(fx) - normalize(fy)) ** 2
        total = total + torch.mean(F.conv2d(d, w))
    return total


@pytest.mark.slow
def test_lpips_importer_numeric_parity():
    torch.manual_seed(1)
    feats = _torch_alexnet_features().eval()
    _randomize(feats, seed=11)
    g = torch.Generator().manual_seed(12)
    lin_w = [torch.rand((1, c, 1, 1), generator=g) for c in (64, 192, 384, 256, 256)]
    lpips_sd = {
        f"lpips_weights.{i}.main.1.weight": _np(w) for i, w in enumerate(lin_w)
    }
    params = ti.lpips_params_from_torch(_sd(feats), lpips_sd)

    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = float(
            _torch_lpips(
                feats, lin_w,
                torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                torch.tensor(np.transpose(y, (0, 3, 1, 2))),
            )
        )
    got = float(
        LPIPS().apply({"params": params}, jnp.asarray(x), jnp.asarray(y))
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# ResNet (torchvision resnet.py key layout; v1.5 stride-on-3x3).
# ---------------------------------------------------------------------------


class TBottleneck(tnn.Module):
    def __init__(self, c_in, mid, stride=1, project=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(c_in, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.conv2 = tnn.Conv2d(mid, mid, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.conv3 = tnn.Conv2d(mid, mid * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(mid * 4)
        if project:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(c_in, mid * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(mid * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + identity)


class TResNetTrunk(tnn.Module):
    def __init__(self, stage_sizes):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        c_in, mid = 64, 64
        for stage, n in enumerate(stage_sizes):
            blocks = []
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                blocks.append(TBottleneck(c_in, mid, stride=stride, project=(b == 0)))
                c_in = mid * 4
            setattr(self, f"layer{stage + 1}", tnn.Sequential(*blocks))
            mid *= 2

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return x


@pytest.mark.slow
def test_resnet_converter_numeric_parity():
    # (1, 2, 1, 1) exercises every converter code path — projection
    # blocks, plain blocks, strides — through the same loop that maps
    # the full (3, 4, 23, 3) ResNet-101.
    stages = (1, 2, 1, 1)
    torch.manual_seed(2)
    tm = TResNetTrunk(stages).eval()
    _randomize(tm, seed=13)
    variables = ti.caption_encoder_variables_from_torch(_sd(tm), stage_sizes=stages)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        feat = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        want = F.adaptive_avg_pool2d(feat, (2, 2)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        CaptionEncoder(encoded_image_size=2, stage_sizes=stages).apply(
            variables, jnp.asarray(x), train=False
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# ArcFace IResNet (insightface iresnet.py key layout).
# ---------------------------------------------------------------------------


class TIBasicBlock(tnn.Module):
    def __init__(self, c_in, planes, stride, downsample):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(c_in, eps=1e-5)
        self.conv1 = tnn.Conv2d(c_in, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.prelu = tnn.PReLU(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes, eps=1e-5)
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(c_in, planes, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes, eps=1e-5),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = self.bn3(self.conv2(self.prelu(self.bn2(self.conv1(self.bn1(x))))))
        return out + identity


class TIResNet(tnn.Module):
    def __init__(self, layers):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-5)
        self.prelu = tnn.PReLU(64)
        widths = (64, 128, 256, 512)
        c_in = 64
        for li, (w, n) in enumerate(zip(widths, layers), start=1):
            blocks = []
            for b in range(n):
                blocks.append(
                    TIBasicBlock(c_in, w, stride=2 if b == 0 else 1, downsample=(b == 0))
                )
                c_in = w
            setattr(self, f"layer{li}", tnn.Sequential(*blocks))
        self.bn2 = tnn.BatchNorm2d(512, eps=1e-5)
        self.fc = tnn.Linear(512 * 7 * 7, 512)
        self.features = tnn.BatchNorm1d(512, eps=1e-5)

    def forward(self, x):
        x = self.prelu(self.bn1(self.conv1(x)))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = self.bn2(x)
        x = torch.flatten(x, 1)
        return self.features(self.fc(x))


@pytest.mark.slow
def test_arcface_importer_numeric_parity():
    layers = (1, 1, 1, 1)
    torch.manual_seed(3)
    tm = TIResNet(layers).eval()
    _randomize(tm, seed=14)
    params = arcface_variables_from_torch(_sd(tm), layers=layers)

    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(IResNet(layers=layers).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-4)
