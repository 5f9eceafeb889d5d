"""Convert reference PyTorch checkpoints into this framework's param trees.

The reference ships several pretrained artifacts (wing.ckpt FAN,
Model_wing.pth camera+fan_priv, StarGAN nets, raft-things.pth,
lpips_weights.ckpt, torchvision backbones — see
``Face-DeId/download.sh``).  These functions map their state_dicts onto
our Flax parameter trees so users can migrate checkpoints 1:1, and so
golden tests can compare randomly-initialized torch models against the
Flax ports.

Conventions: torch Conv2d (O, I, kh, kw) -> flax (kh, kw, I, O); Linear
(O, I) -> (I, O); BatchNorm running stats become FrozenBatchNorm
params.  All outputs are numpy float32 trees ready for ``jnp.asarray``
/ flax apply.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "fan_params_from_torch",
    "generator_params_from_torch",
    "mapping_params_from_torch",
    "style_encoder_params_from_torch",
    "discriminator_params_from_torch",
    "camera_params_from_torch",
    "lens_params_from_torch",
    "inception_variables_from_torch",
    "preserve_float64",
]

Tree = dict

# Converters emit this dtype (f32 — checkpoints are f32 and the compute
# pipeline is bf16/f32).  The f64 free-running dynamics goldens need the
# conversion to PRESERVE double-precision torch state; they wrap the
# import in ``preserve_float64()``.
_FLOAT = np.float32


class preserve_float64:
    """Context manager: converters emit float64 instead of float32."""

    def __enter__(self):
        global _FLOAT
        self._saved = _FLOAT
        _FLOAT = np.float64
        return self

    def __exit__(self, *exc):
        global _FLOAT
        _FLOAT = self._saved
        return False



def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """torch.load a checkpoint (CPU) and return a flat name->numpy dict."""
    import torch

    obj = torch.load(path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], Mapping):
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k.replace("module.", "")] = v.detach().cpu().numpy()
    return out


def _conv(sd, name, bias=True) -> Tree:
    p = {"kernel": np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0)).astype(_FLOAT)}
    if bias and f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"].astype(_FLOAT)
    return p


def _linear(sd, name) -> Tree:
    p = {"kernel": sd[f"{name}.weight"].T.astype(_FLOAT)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"].astype(_FLOAT)
    return p


def _bn(sd, name) -> Tree:
    return {
        "scale": sd[f"{name}.weight"].astype(_FLOAT),
        "bias": sd[f"{name}.bias"].astype(_FLOAT),
        "mean": sd[f"{name}.running_mean"].astype(_FLOAT),
        "var": sd[f"{name}.running_var"].astype(_FLOAT),
    }


def _inorm(sd, name) -> Tree:
    return {
        "scale": sd[f"{name}.weight"].astype(_FLOAT),
        "bias": sd[f"{name}.bias"].astype(_FLOAT),
    }


# ---------------------------------------------------------------------------
# FAN (core/wing.py architecture; e.g. wing.ckpt, Model_wing.pth['Decoder']).
# ---------------------------------------------------------------------------


def _dense_conv_block(sd, name, has_down: bool) -> Tree:
    out = {
        "FrozenBatchNorm_0": _bn(sd, f"{name}.bn1"),
        "Conv_0": _conv(sd, f"{name}.conv1", bias=False),
        "FrozenBatchNorm_1": _bn(sd, f"{name}.bn2"),
        "Conv_1": _conv(sd, f"{name}.conv2", bias=False),
        "FrozenBatchNorm_2": _bn(sd, f"{name}.bn3"),
        "Conv_2": _conv(sd, f"{name}.conv3", bias=False),
    }
    if has_down:
        out["FrozenBatchNorm_3"] = _bn(sd, f"{name}.downsample.0")
        out["Conv_3"] = _conv(sd, f"{name}.downsample.2", bias=False)
    return out


# Hourglass blocks in our creation order -> reference module names
# (recursion: b1/b2 on the way down, b2_plus at the bottom, b3 on the
# way up; wing.py:47-71).
_HG_ORDER = [
    "b1_4", "b2_4", "b1_3", "b2_3", "b1_2", "b2_2",
    "b1_1", "b2_1", "b2_plus_1", "b3_1", "b3_2", "b3_3", "b3_4",
]


def fan_params_from_torch(sd: Mapping[str, np.ndarray]) -> Tree:
    """state_dict of the reference FAN -> params for models.fan.FAN."""
    hg = {"CoordConv_0": {"Conv_0": _conv(sd, "m0.coordconv.conv")}}
    for i, blk in enumerate(_HG_ORDER):
        hg[f"DenseConvBlock_{i}"] = _dense_conv_block(sd, f"m0.{blk}", has_down=False)
    return {
        "CoordConv_0": {"Conv_0": _conv(sd, "conv1.conv")},
        "FrozenBatchNorm_0": _bn(sd, "bn1"),
        "DenseConvBlock_0": _dense_conv_block(sd, "conv2", has_down=True),
        "DenseConvBlock_1": _dense_conv_block(sd, "conv3", has_down=False),
        "DenseConvBlock_2": _dense_conv_block(sd, "conv4", has_down=True),
        "HourGlass_0": hg,
        "DenseConvBlock_3": _dense_conv_block(sd, "top_m_0", has_down=False),
        "Conv_0": _conv(sd, "conv_last0"),
        "FrozenBatchNorm_1": _bn(sd, "bn_end0"),
        "Conv_1": _conv(sd, "l0"),
    }


# ---------------------------------------------------------------------------
# StarGAN-v2 nets (core/model.py).
# ---------------------------------------------------------------------------


def _resblk(sd, name, dim_in, dim_out) -> Tree:
    out: Tree = {}
    idx = 0
    if dim_in != dim_out:
        out[f"Conv_{idx}"] = _conv(sd, f"{name}.conv1x1", bias=False)
        idx += 1
    norm = 0
    if f"{name}.norm1.weight" in sd:
        out["InstanceNorm_0"] = _inorm(sd, f"{name}.norm1")
        out["InstanceNorm_1"] = _inorm(sd, f"{name}.norm2")
        norm = 1
    out[f"Conv_{idx}"] = _conv(sd, f"{name}.conv1")
    out[f"Conv_{idx + 1}"] = _conv(sd, f"{name}.conv2")
    return out


def _adain_resblk(sd, name, dim_in, dim_out, w_hpf) -> Tree:
    out: Tree = {
        "AdaIN_0": {"Dense_0": _linear(sd, f"{name}.norm1.fc")},
        "Conv_0": _conv(sd, f"{name}.conv1"),
        "AdaIN_1": {"Dense_0": _linear(sd, f"{name}.norm2.fc")},
        "Conv_1": _conv(sd, f"{name}.conv2"),
    }
    if w_hpf == 0 and dim_in != dim_out:
        out["Conv_2"] = _conv(sd, f"{name}.conv1x1", bias=False)
    return out


def _gen_dims(img_size: int, max_conv_dim: int, repeat_num: int) -> list[int]:
    dims = [2**14 // img_size]
    for _ in range(repeat_num):
        dims.append(min(dims[-1] * 2, max_conv_dim))
    return dims


def generator_params_from_torch(
    sd: Mapping[str, np.ndarray],
    img_size: int = 256,
    max_conv_dim: int = 512,
    w_hpf: float = 1.0,
) -> Tree:
    import math

    repeat = int(math.log2(img_size)) - 4 + (1 if w_hpf > 0 else 0)
    dims = _gen_dims(img_size, max_conv_dim, repeat)
    out: Tree = {"Conv_0": _conv(sd, "from_rgb")}
    for i in range(repeat):
        out[f"ResBlk_{i}"] = _resblk(sd, f"encode.{i}", dims[i], dims[i + 1])
    for j in range(2):
        out[f"ResBlk_{repeat + j}"] = _resblk(
            sd, f"encode.{repeat + j}", dims[-1], dims[-1]
        )
    # decode list order = forward order (bottlenecks then ups).
    for j in range(2):
        out[f"AdainResBlk_{j}"] = _adain_resblk(
            sd, f"decode.{j}", dims[-1], dims[-1], w_hpf
        )
    for n, i in enumerate(reversed(range(repeat))):
        out[f"AdainResBlk_{2 + n}"] = _adain_resblk(
            sd, f"decode.{2 + n}", dims[i + 1], dims[i], w_hpf
        )
    out["InstanceNorm_0"] = _inorm(sd, "to_rgb.0")
    out["Conv_1"] = _conv(sd, "to_rgb.2")
    return out


def mapping_params_from_torch(
    sd: Mapping[str, np.ndarray], num_domains: int = 2
) -> Tree:
    out: Tree = {}
    for i in range(4):
        out[f"Dense_{i}"] = _linear(sd, f"shared.{2 * i}")
    idx = 4
    for d in range(num_domains):
        for i in range(4):
            out[f"Dense_{idx}"] = _linear(sd, f"unshared.{d}.{2 * i}")
            idx += 1
    return out


def _conv_trunk(sd, prefix, img_size, max_conv_dim) -> Tree:
    import math

    repeat = int(math.log2(img_size)) - 2
    dims = _gen_dims(img_size, max_conv_dim, repeat)
    out: Tree = {"Conv_0": _conv(sd, f"{prefix}.0")}
    for i in range(repeat):
        out[f"ResBlk_{i}"] = _resblk(sd, f"{prefix}.{1 + i}", dims[i], dims[i + 1])
    out["Conv_1"] = _conv(sd, f"{prefix}.{repeat + 2}")
    return out


def style_encoder_params_from_torch(
    sd: Mapping[str, np.ndarray],
    img_size: int = 256,
    num_domains: int = 2,
    max_conv_dim: int = 512,
) -> Tree:
    out: Tree = {"_ConvTrunk_0": _conv_trunk(sd, "shared", img_size, max_conv_dim)}
    for d in range(num_domains):
        out[f"Dense_{d}"] = _linear(sd, f"unshared.{d}")
    return out


def discriminator_params_from_torch(
    sd: Mapping[str, np.ndarray],
    img_size: int = 256,
    num_domains: int = 2,
    max_conv_dim: int = 512,
) -> Tree:
    import math

    repeat = int(math.log2(img_size)) - 2
    out: Tree = {"_ConvTrunk_0": _conv_trunk(sd, "main", img_size, max_conv_dim)}
    # Final 1x1 conv over a 1x1 spatial map == Dense.
    w = sd[f"main.{repeat + 4}.weight"]  # (D, C, 1, 1)
    out["Dense_0"] = {
        "kernel": np.transpose(w[:, :, 0, 0], (1, 0)).astype(_FLOAT),
        "bias": sd[f"main.{repeat + 4}.bias"].astype(_FLOAT),
    }
    return out


# ---------------------------------------------------------------------------
# Cameras.
# ---------------------------------------------------------------------------


def camera_params_from_torch(sd: Mapping[str, np.ndarray]):
    """Reference Face-DeId Camera state_dict -> optics.camera.CameraParams."""
    from ..optics.camera import CameraParams

    return CameraParams(
        zernike_train=np.asarray(sd["Zer_train"], _FLOAT).reshape(-1),
        zernike_frozen=np.asarray(sd["Zer_no_train"], _FLOAT).reshape(-1),
    )


def lens_params_from_torch(sd: Mapping[str, np.ndarray]):
    """Reference OpticsZernike state_dict -> optics.lens.LensParams.
    Accepts both raw and 'optics.'-prefixed keys (warm-start ckpts,
    train.py:68-78)."""
    from ..optics.lens import LensParams

    def get(k):
        return sd[k] if k in sd else sd[f"optics.{k}"]

    return LensParams(
        defocus=_FLOAT(np.asarray(get("zernike_coeffs_train")).reshape(())),
        frozen_pre=np.asarray(get("zernike_coeffs_no_train"), _FLOAT).reshape(-1),
        frozen_post=np.asarray(get("zernike_coeffs_no_train2"), _FLOAT).reshape(-1),
    )


# ---------------------------------------------------------------------------
# ResNet-101 (torchvision state_dict layout) -> models.resnet.
# ---------------------------------------------------------------------------


def _bn_flax(sd, name):
    """torchvision BatchNorm -> (flax nn.BatchNorm params, batch_stats)."""
    return (
        {
            "scale": sd[f"{name}.weight"].astype(_FLOAT),
            "bias": sd[f"{name}.bias"].astype(_FLOAT),
        },
        {
            "mean": sd[f"{name}.running_mean"].astype(_FLOAT),
            "var": sd[f"{name}.running_var"].astype(_FLOAT),
        },
    )


def resnet_variables_from_torch(
    sd: Mapping[str, np.ndarray], stage_sizes=(3, 4, 23, 3)
) -> Tree:
    """torchvision resnet state_dict -> {'params','batch_stats'} for
    models.resnet.ResNetBackbone."""
    params: Tree = {"Conv_0": _conv(sd, "conv1", bias=False)}
    stats: Tree = {}
    bnp, bns = _bn_flax(sd, "bn1")
    params["BatchNorm_0"] = bnp
    stats["BatchNorm_0"] = bns

    blk = 0
    for stage, n in enumerate(stage_sizes):
        for b in range(n):
            t = f"layer{stage + 1}.{b}"
            name = f"Bottleneck_{blk}"
            p: Tree = {}
            st: Tree = {}
            ci = bi = 0
            if b == 0:
                # Flax creation order: projection conv+bn first.
                p[f"Conv_{ci}"] = _conv(sd, f"{t}.downsample.0", bias=False)
                bnp, bns = _bn_flax(sd, f"{t}.downsample.1")
                p[f"BatchNorm_{bi}"] = bnp
                st[f"BatchNorm_{bi}"] = bns
                ci += 1
                bi += 1
            for j in (1, 2, 3):
                p[f"Conv_{ci}"] = _conv(sd, f"{t}.conv{j}", bias=False)
                bnp, bns = _bn_flax(sd, f"{t}.bn{j}")
                p[f"BatchNorm_{bi}"] = bnp
                st[f"BatchNorm_{bi}"] = bns
                ci += 1
                bi += 1
            params[name] = p
            stats[name] = st
            blk += 1
    return {"params": params, "batch_stats": stats}


def caption_encoder_variables_from_torch(sd, stage_sizes=(3, 4, 23, 3)) -> Tree:
    """Wrap the backbone tree under the CaptionEncoder submodule name."""
    v = resnet_variables_from_torch(sd, stage_sizes)
    return {
        "params": {"ResNetBackbone_0": v["params"]},
        "batch_stats": {"ResNetBackbone_0": v["batch_stats"]},
    }


def decoder_params_from_torch(sd: Mapping[str, np.ndarray]) -> Tree:
    """Reference ``DecoderWithAttention`` state_dict
    (Image_Caption/models.py:93-133) -> models.captioner
    AttentionLSTMDecoder params.

    torch ``nn.LSTMCell`` carries two bias vectors (bias_ih + bias_hh,
    simply summed in the cell); they map onto the lstm_x / lstm_h Dense
    biases, whose outputs our cell also sums.  Gate order (i, f, g, o)
    is identical on both sides.
    """
    return {
        "att_enc": _linear(sd, "attention.encoder_att"),
        "att_dec": _linear(sd, "attention.decoder_att"),
        "att_full": _linear(sd, "attention.full_att"),
        "embedding": {"embedding": sd["embedding.weight"].astype(_FLOAT)},
        "init_h": _linear(sd, "init_h"),
        "init_c": _linear(sd, "init_c"),
        "f_beta": _linear(sd, "f_beta"),
        "fc": _linear(sd, "fc"),
        "lstm_x": {
            "kernel": sd["decode_step.weight_ih"].T.astype(_FLOAT),
            "bias": sd["decode_step.bias_ih"].astype(_FLOAT),
        },
        "lstm_h": {
            "kernel": sd["decode_step.weight_hh"].T.astype(_FLOAT),
            "bias": sd["decode_step.bias_hh"].astype(_FLOAT),
        },
    }


# ---------------------------------------------------------------------------
# AlexNet features + LPIPS calibration -> metrics.lpips.LPIPS.
# ---------------------------------------------------------------------------

_ALEX_FEATURE_IDS = (0, 3, 6, 8, 10)  # conv indices inside alexnet.features


def lpips_params_from_torch(
    alexnet_sd: Mapping[str, np.ndarray], lpips_sd: Mapping[str, np.ndarray]
) -> Tree:
    """torchvision alexnet state_dict + the reference lpips_weights.ckpt
    (keys 'lpips_weights.{i}.main.1.weight', Face-DeId/metrics/
    lpips.py:28-60) -> params for metrics.lpips.LPIPS."""
    alex: Tree = {}
    for i, li in enumerate(_ALEX_FEATURE_IDS):
        key = f"features.{li}" if f"features.{li}.weight" in alexnet_sd else str(li)
        alex[f"Conv_{i}"] = _conv(alexnet_sd, key)
    out: Tree = {"alexnet": alex}
    for i in range(5):
        w = np.asarray(lpips_sd[f"lpips_weights.{i}.main.1.weight"])  # (1, C, 1, 1)
        out[f"lin_{i}"] = w[0, :, 0, 0][:, None].astype(_FLOAT)  # (C, 1)
    return out


# ---------------------------------------------------------------------------
# RAFT (raft-things.pth) -> models.raft.RAFT.
# ---------------------------------------------------------------------------

_RAFT_LAYERS = [  # (torch name, stride, in_planes, planes)
    ("layer1.0", 1, 64, 64),
    ("layer1.1", 1, 64, 64),
    ("layer2.0", 2, 64, 96),
    ("layer2.1", 1, 96, 96),
    ("layer3.0", 2, 96, 128),
    ("layer3.1", 1, 128, 128),
]


def _raft_encoder(sd, prefix: str, norm: str) -> Tree:
    """BasicEncoder (extractor.py:118-192).  'instance' norms are
    torch-affine=False (no params); 'batch' norms map to our frozen-BN
    _Norm params."""
    out: Tree = {"Conv_0": _conv(sd, f"{prefix}.conv1")}
    nidx = 0
    if norm == "batch":
        out[f"_Norm_{nidx}"] = _bn(sd, f"{prefix}.norm1")
    nidx += 1
    for i, (t, stride, in_p, planes) in enumerate(_RAFT_LAYERS):
        blk: Tree = {
            "Conv_0": _conv(sd, f"{prefix}.{t}.conv1"),
            "Conv_1": _conv(sd, f"{prefix}.{t}.conv2"),
        }
        if norm == "batch":
            blk["_Norm_0"] = _bn(sd, f"{prefix}.{t}.norm1")
            blk["_Norm_1"] = _bn(sd, f"{prefix}.{t}.norm2")
        if stride != 1 or in_p != planes:
            blk["Conv_2"] = _conv(sd, f"{prefix}.{t}.downsample.0")
            if norm == "batch":
                blk["_Norm_2"] = _bn(sd, f"{prefix}.{t}.downsample.1")
        out[f"ResidualBlock_{i}"] = blk
    out["Conv_1"] = _conv(sd, f"{prefix}.conv2")
    return out


def raft_params_from_torch(sd: Mapping[str, np.ndarray]) -> Tree:
    """raft-things state_dict ('module.' already stripped by
    load_torch_state_dict) -> params for models.raft.RAFT."""
    update: Tree = {
        "BasicMotionEncoder_0": {
            "Conv_0": _conv(sd, "update_block.encoder.convc1"),
            "Conv_1": _conv(sd, "update_block.encoder.convc2"),
            "Conv_2": _conv(sd, "update_block.encoder.convf1"),
            "Conv_3": _conv(sd, "update_block.encoder.convf2"),
            "Conv_4": _conv(sd, "update_block.encoder.conv"),
        },
        "SepConvGRU_0": {
            "Conv_0": _conv(sd, "update_block.gru.convz1"),
            "Conv_1": _conv(sd, "update_block.gru.convr1"),
            "Conv_2": _conv(sd, "update_block.gru.convq1"),
            "Conv_3": _conv(sd, "update_block.gru.convz2"),
            "Conv_4": _conv(sd, "update_block.gru.convr2"),
            "Conv_5": _conv(sd, "update_block.gru.convq2"),
        },
        "Conv_0": _conv(sd, "update_block.flow_head.conv1"),
        "Conv_1": _conv(sd, "update_block.flow_head.conv2"),
        "Conv_2": _conv(sd, "update_block.mask.0"),
        "Conv_3": _conv(sd, "update_block.mask.2"),
    }
    return {
        "fnet": _raft_encoder(sd, "fnet", "instance"),
        "cnet": _raft_encoder(sd, "cnet", "batch"),
        "update_block": update,
    }


# ---------------------------------------------------------------------------
# InceptionV3 (torchvision inception_v3 state_dict layout) -> metrics.fid.
# ---------------------------------------------------------------------------

# torchvision branch names in our BasicConv creation order, per block type
# (metrics/fid.py InceptionA..E __call__ order).
_INCEPTION_BRANCHES = {
    "A": [
        "branch1x1", "branch5x5_1", "branch5x5_2",
        "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool",
    ],
    "B": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
    "C": [
        "branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
        "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
        "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool",
    ],
    "D": [
        "branch3x3_1", "branch3x3_2",
        "branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4",
    ],
    "E": [
        "branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
        "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
        "branch3x3dbl_3b", "branch_pool",
    ],
}

# (flax top-level module name, torchvision module name, block type)
_INCEPTION_BLOCKS = [
    ("InceptionA_0", "Mixed_5b", "A"),
    ("InceptionA_1", "Mixed_5c", "A"),
    ("InceptionA_2", "Mixed_5d", "A"),
    ("InceptionB_0", "Mixed_6a", "B"),
    ("InceptionC_0", "Mixed_6b", "C"),
    ("InceptionC_1", "Mixed_6c", "C"),
    ("InceptionC_2", "Mixed_6d", "C"),
    ("InceptionC_3", "Mixed_6e", "C"),
    ("InceptionD_0", "Mixed_7a", "D"),
    ("InceptionE_0", "Mixed_7b", "E"),
    ("InceptionE_1", "Mixed_7c", "E"),
]

_INCEPTION_STEM = [
    "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
    "Conv2d_3b_1x1", "Conv2d_4a_3x3",
]


def _basic_conv(sd, name) -> tuple[Tree, Tree]:
    """torchvision BasicConv2d -> (params, batch_stats) for fid.BasicConv."""
    params = {
        "Conv_0": _conv(sd, f"{name}.conv", bias=False),
        "BatchNorm_0": {
            "scale": sd[f"{name}.bn.weight"].astype(_FLOAT),
            "bias": sd[f"{name}.bn.bias"].astype(_FLOAT),
        },
    }
    stats = {
        "BatchNorm_0": {
            "mean": sd[f"{name}.bn.running_mean"].astype(_FLOAT),
            "var": sd[f"{name}.bn.running_var"].astype(_FLOAT),
        }
    }
    return params, stats


def inception_variables_from_torch(sd: Mapping[str, np.ndarray]) -> Tree:
    """torchvision ``inception_v3`` state_dict -> variables
    ``{'params', 'batch_stats'}`` for ``metrics.fid.InceptionV3``.

    The reference FID extractor is the torchvision model up to pool3
    (Face-DeId/metrics/fid.py:18-44); AuxLogits / fc weights are ignored.
    """
    params: Tree = {}
    stats: Tree = {}
    for i, tname in enumerate(_INCEPTION_STEM):
        p, s = _basic_conv(sd, tname)
        params[f"BasicConv_{i}"] = p
        stats[f"BasicConv_{i}"] = s
    for fname, tname, btype in _INCEPTION_BLOCKS:
        bp: Tree = {}
        bs: Tree = {}
        for j, branch in enumerate(_INCEPTION_BRANCHES[btype]):
            p, s = _basic_conv(sd, f"{tname}.{branch}")
            bp[f"BasicConv_{j}"] = p
            bs[f"BasicConv_{j}"] = s
        params[fname] = bp
        stats[fname] = bs
    return {"params": params, "batch_stats": stats}
