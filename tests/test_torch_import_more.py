"""Converters for RAFT (golden vs reference) and ResNet/AlexNet (structural)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ppvision_tpu.metrics.lpips import LPIPS
from ppvision_tpu.models.raft import RAFT
from ppvision_tpu.models.resnet import CaptionEncoder
from ppvision_tpu.utils import torch_import as ti

from .golden_reference import REFERENCE_ROOT, install_munch_stub


@pytest.mark.slow
def test_raft_parity_with_reference():
    import argparse
    import sys

    install_munch_stub()
    path = f"{REFERENCE_ROOT}/Face-DeId"
    if path not in sys.path:
        sys.path.insert(0, path)
    from RAFT.core.raft import RAFT as TorchRAFT  # noqa: PLC0415

    args = argparse.Namespace(
        small=False, mixed_precision=False, alternate_corr=False, dropout=0
    )
    torch.manual_seed(0)
    tr = TorchRAFT(args).eval()
    sd = {k: v.detach().numpy() for k, v in tr.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, ti.raft_params_from_torch(sd))

    rng = np.random.default_rng(0)
    # 128^2: the torch reference's grid_sample divides by (W-1), which is
    # zero at the 1x1 bottom pyramid level of smaller inputs -> NaN.
    i1 = rng.uniform(0, 255, (1, 128, 128, 3)).astype(np.float32)
    i2 = rng.uniform(0, 255, (1, 128, 128, 3)).astype(np.float32)
    # iters=1: with random weights the flow feedback explodes to NaN in
    # the torch reference itself after a few iterations.
    with torch.no_grad():
        want = tr(
            torch.tensor(np.transpose(i1, (0, 3, 1, 2))),
            torch.tensor(np.transpose(i2, (0, 3, 1, 2))),
            iters=1,
            test_mode=True,
        ).numpy()
    got = RAFT(iters=1).apply({"params": params}, jnp.asarray(i1), jnp.asarray(i2))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert np.isfinite(want).all()
    scale = max(np.abs(want).max(), 1.0)
    assert np.abs(got - want).max() < 2e-3 * scale


def _synthetic_resnet_sd(stage_sizes=(1, 1, 1, 1)):
    """torchvision-resnet-shaped random state_dict (torchvision absent)."""
    rng = np.random.default_rng(1)
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    inp = 64
    mid = 64
    for stage, n in enumerate(stage_sizes):
        for b in range(n):
            t = f"layer{stage + 1}.{b}"
            out = mid * 4
            if b == 0:
                conv(f"{t}.downsample.0", out, inp, 1)
                bn(f"{t}.downsample.1", out)
            conv(f"{t}.conv1", mid, inp, 1)
            bn(f"{t}.bn1", mid)
            conv(f"{t}.conv2", mid, mid, 3)
            bn(f"{t}.bn2", mid)
            conv(f"{t}.conv3", out, mid, 1)
            bn(f"{t}.bn3", out)
            inp = out
        mid *= 2
    return sd


@pytest.mark.slow  # redundant with test_metric_net_parity numeric checks
def test_resnet_converter_structural():
    stages = (1, 1, 1, 1)
    sd = _synthetic_resnet_sd(stages)
    variables = ti.caption_encoder_variables_from_torch(sd, stages)
    enc = CaptionEncoder(encoded_image_size=4, stage_sizes=stages)
    # Apply must accept the converted tree as-is (shapes/names line up).
    out = enc.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.zeros((1, 64, 64, 3))
    )
    assert out.shape == (1, 4, 4, 2048)


@pytest.mark.slow
def test_lpips_converter_structural():
    rng = np.random.default_rng(2)
    alex_sd = {}
    chans = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3)]
    for idx, (o, i, k) in zip(ti._ALEX_FEATURE_IDS, chans):
        alex_sd[f"features.{idx}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05
        alex_sd[f"features.{idx}.bias"] = np.zeros(o, np.float32)
    lpips_sd = {
        f"lpips_weights.{i}.main.1.weight": np.abs(
            rng.standard_normal((1, c, 1, 1))
        ).astype(np.float32)
        for i, c in enumerate([64, 192, 384, 256, 256])
    }
    params = ti.lpips_params_from_torch(alex_sd, lpips_sd)
    model = LPIPS()
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    val = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, x, x * 0.5
    )
    assert np.isfinite(float(val)) and float(val) > 0
