"""Face-identity embedding + cosine-similarity parity metric.

BASELINE.json requires "SSIM & face-ID-cosine parity" for the de-id
pipeline; the reference repo itself carries no ID-embedding net (its
README identity numbers come from external MtCNN/Dlib tooling), so this
is a framework-native addition: an ArcFace-style IResNet-50 embedder
(the standard insightface architecture — 112x112 input, 512-d output)
with a torch state_dict importer, plus the cosine metric used to score
how much identity the anonymization removes (lower |cos| = better
de-identification) or how stable identity is across reruns (parity).

Pretrained weights load from an insightface ``iresnet50`` torch
state_dict via ``arcface_variables_from_torch``; with random weights
only relative comparisons are meaningful.

Two preprocessing modes:

- ``make_embed_fn`` resizes the whole frame to 112x112 — it does NOT
  run insightface's 5-landmark similarity-align crop, so absolute
  cosines are not comparable to published ArcFace verification
  numbers.  As a parity/leakage metric (the same pipeline applied to
  both sides of every comparison) it is self-consistent, which is all
  BASELINE.json's "face-ID-cosine parity" requires.
- ``make_aligned_embed_fn`` runs the insightface-comparable pipeline
  fully on device: FAN landmarks -> 5-point similarity solve to the
  canonical ArcFace 112x112 template (``ARCFACE_TEMPLATE``) -> affine
  bilinear warp -> embed.  One jittable program, no cv2 — the
  TPU-native equivalent of insightface's ``norm_crop``.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "ARCFACE_TEMPLATE",
    "IResNet",
    "face_id_cosine",
    "fan_five_points",
    "make_aligned_embed_fn",
    "make_embed_fn",
    "similarity_from_points",
    "warp_to_template",
    "arcface_variables_from_torch",
]


class _FrozenBN(nn.Module):
    """BatchNorm with running stats as params (eval-only), eps=1e-5."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        mul = (jax.lax.rsqrt(var + self.eps) * scale).astype(x.dtype)
        add = (bias - mean * jax.lax.rsqrt(var + self.eps) * scale).astype(x.dtype)
        return x * mul + add


class _PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C))."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, x * a.astype(x.dtype))


class IBasicBlock(nn.Module):
    """insightface IBasicBlock: BN-conv-BN-PReLU-conv-BN (+1x1 down)."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out = _FrozenBN()(x)
        out = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype,
        )(out)
        out = _FrozenBN()(out)
        out = _PReLU()(out)
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
        )(out)
        out = _FrozenBN()(out)
        if self.downsample:
            x = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
            )(x)
            x = _FrozenBN()(x)
        return out + x


class IResNet(nn.Module):
    """ArcFace IResNet: 112x112x3 in [-1, 1] -> 512-d embedding.

    ``layers=(3, 4, 14, 3)`` is iresnet50.
    """

    layers: tuple[int, ...] = (3, 4, 14, 3)
    embed_dim: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(x)
        x = _FrozenBN()(x)
        x = _PReLU()(x)
        # Stage widths (64, 128, 256, 512), stride 2 at each stage entry
        # (iresnet.py in insightface).
        widths = (64, 128, 256, 512)
        for w, n_blocks in zip(widths, self.layers):
            for i in range(n_blocks):
                stride = 2 if i == 0 else 1
                down = i == 0
                x = IBasicBlock(w, stride=stride, downsample=down, dtype=self.dtype)(x)
        x = _FrozenBN()(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.Dense(self.embed_dim)(x)
        # 1-d "features" BN over the embedding (affine, eps 1e-5).
        x = _FrozenBN()(x)
        return x


def make_embed_fn(model: IResNet, params: Any):
    """Jittable: NHWC [0,1] face batch (any square size) -> unit 512-d."""

    def embed(x):
        x = jax.image.resize(x, (x.shape[0], 112, 112, 3), "bilinear")
        x = x * 2.0 - 1.0
        e = model.apply({"params": params}, x)
        return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-10)

    return embed


def face_id_cosine(embed_fn, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean cosine similarity between embeddings of two face batches."""
    ea, eb = embed_fn(a), embed_fn(b)
    return jnp.mean(jnp.sum(ea * eb, axis=-1))


# ---------------------------------------------------------------------------
# insightface-comparable alignment, fully on device.
# ---------------------------------------------------------------------------

# Canonical ArcFace 112x112 destination template (insightface
# ``face_align.arcface_dst``): left eye, right eye, nose tip, left
# mouth corner, right mouth corner.
ARCFACE_TEMPLATE = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    dtype=np.float32,
)

# 98-point FAN (WFLW layout, as used by the reference aligner,
# wing.py:353-380): eye rings 60-67/68-75 + centers 96/97, nose tip 54,
# mouth corners 76/82.
_EYE_L_IDX = tuple(range(60, 68)) + (96,)
_EYE_R_IDX = tuple(range(68, 76)) + (97,)
_NOSE_TIP = 54
_MOUTH_L = 76
_MOUTH_R = 82


def fan_five_points(landmarks: jnp.ndarray) -> jnp.ndarray:
    """(..., 98, 2) FAN landmarks -> (..., 5, 2) ArcFace points.

    Eye points are ring+center means (the reference aligner's eye
    estimate, wing.py:357-361) — more stable than the single center
    channel under the argmax quantization of ``heatmap_landmarks``.
    """
    eye_l = landmarks[..., _EYE_L_IDX, :].mean(axis=-2)
    eye_r = landmarks[..., _EYE_R_IDX, :].mean(axis=-2)
    return jnp.stack(
        [
            eye_l,
            eye_r,
            landmarks[..., _NOSE_TIP, :],
            landmarks[..., _MOUTH_L, :],
            landmarks[..., _MOUTH_R, :],
        ],
        axis=-2,
    )


def similarity_from_points(src: jnp.ndarray, dst: jnp.ndarray):
    """Least-squares non-reflective similarity ``src -> dst``.

    Closed form (no SVD — the 2-d similarity normal equations are
    diagonal after centering, so this is exact, jit/TPU-friendly, and
    equals Umeyama without the reflection branch): with the transform
    ``[x', y'] = [[a, -b], [b, a]] @ [x, y] + t``,

        a = sum(sc . dc) / sum(|sc|^2)
        b = sum(cross(sc, dc)) / sum(|sc|^2)

    over centered points.  Returns ``(A, t)`` with A (..., 2, 2) and
    t (..., 2) for point sets src/dst of shape (..., N, 2).
    """
    sm = src.mean(axis=-2, keepdims=True)
    dm = dst.mean(axis=-2, keepdims=True)
    sc = src - sm
    dc = dst - dm
    denom = jnp.sum(sc * sc, axis=(-2, -1)) + 1e-12
    a = jnp.sum(sc * dc, axis=(-2, -1)) / denom
    b = (
        jnp.sum(sc[..., 0] * dc[..., 1] - sc[..., 1] * dc[..., 0], axis=-1)
        / denom
    )
    row0 = jnp.stack([a, -b], axis=-1)
    row1 = jnp.stack([b, a], axis=-1)
    mat = jnp.stack([row0, row1], axis=-2)
    t = dm[..., 0, :] - jnp.einsum("...ij,...j->...i", mat, sm[..., 0, :])
    return mat, t


def warp_to_template(
    img: jnp.ndarray,
    src_points: jnp.ndarray,
    dst_points: jnp.ndarray | None = None,
    out_size: int = 112,
) -> jnp.ndarray:
    """Similarity-warp NHWC ``img`` so ``src_points`` land on
    ``dst_points`` (default: ``ARCFACE_TEMPLATE``), zeros outside.

    The inverse map is analytic (``A^-1 = adj(A) / (a^2 + b^2)`` for a
    similarity), so the warp is one fused gather program — the
    TPU-native counterpart of insightface ``norm_crop``
    (cv2.warpAffine).  ``src_points``: (B, 5, 2) in img pixel coords.
    """
    from ..models.raft import bilinear_sampler

    if dst_points is None:
        dst_points = jnp.asarray(ARCFACE_TEMPLATE)
    dst = jnp.broadcast_to(dst_points, src_points.shape)
    mat, t = similarity_from_points(src_points, dst)  # (B,2,2), (B,2)
    det = mat[..., 0, 0] ** 2 + mat[..., 1, 0] ** 2  # a^2 + b^2
    inv = (
        jnp.stack(
            [
                jnp.stack([mat[..., 1, 1], -mat[..., 0, 1]], axis=-1),
                jnp.stack([-mat[..., 1, 0], mat[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / det[..., None, None]
    )
    ys, xs = jnp.meshgrid(
        jnp.arange(out_size, dtype=jnp.float32),
        jnp.arange(out_size, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys], axis=-1)  # (S, S, 2) output (x, y)
    rel = grid[None] - t[:, None, None, :]
    coords = jnp.einsum("bij,bhwj->bhwi", inv, rel)
    return bilinear_sampler(img, coords)


def make_aligned_embed_fn(
    model: IResNet, params: Any, fan, fan_params, input_size: int = 256
):
    """Jittable insightface-comparable embed: NHWC [0,1] frames of any
    square size -> unit 512-d, via FAN landmarks + template alignment.

    The whole pipeline (landmark net, similarity solve, warp, embed)
    is one traced program; batch with the outer jit/vmap as usual.
    ``input_size`` is the FAN working resolution (256 = reference
    behavior, wing.py:244; below 256 is a tests/dry-run speed knob,
    same convention as ``models.fan.get_heatmap``).
    """
    from ..models.align import heatmap_landmarks
    from ..models.fan import NUM_LANDMARKS
    from ..ops.image import resize_bilinear

    def embed(x):
        xr = resize_bilinear(x, (input_size, input_size))
        out = fan.apply({"params": fan_params}, xr).astype(jnp.float32)
        lm = heatmap_landmarks(out[..., :NUM_LANDMARKS]) * 4.0  # input-frame px
        pts = fan_five_points(lm)
        face = warp_to_template(xr, pts)
        e = model.apply({"params": params}, face * 2.0 - 1.0)
        return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-10)

    return embed


# ---------------------------------------------------------------------------
# insightface iresnet torch state_dict -> IResNet params.
# ---------------------------------------------------------------------------


def _bn_t(sd, name):
    return {
        "scale": np.asarray(sd[f"{name}.weight"], np.float32),
        "bias": np.asarray(sd[f"{name}.bias"], np.float32),
        "mean": np.asarray(sd[f"{name}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{name}.running_var"], np.float32),
    }


def _conv_t(sd, name):
    return {"kernel": np.transpose(np.asarray(sd[f"{name}.weight"], np.float32), (2, 3, 1, 0))}


def arcface_variables_from_torch(
    sd: Mapping[str, np.ndarray], layers: tuple[int, ...] = (3, 4, 14, 3)
) -> dict:
    """insightface ``iresnet`` state_dict -> params for IResNet."""
    out: dict = {
        "Conv_0": _conv_t(sd, "conv1"),
        "_FrozenBN_0": _bn_t(sd, "bn1"),
        "_PReLU_0": {"alpha": np.asarray(sd["prelu.weight"], np.float32)},
    }
    idx = 0
    for li, n_blocks in enumerate(layers, start=1):
        for bi in range(n_blocks):
            t = f"layer{li}.{bi}"
            blk = {
                "_FrozenBN_0": _bn_t(sd, f"{t}.bn1"),
                "Conv_0": _conv_t(sd, f"{t}.conv1"),
                "_FrozenBN_1": _bn_t(sd, f"{t}.bn2"),
                "_PReLU_0": {"alpha": np.asarray(sd[f"{t}.prelu.weight"], np.float32)},
                "Conv_1": _conv_t(sd, f"{t}.conv2"),
                "_FrozenBN_2": _bn_t(sd, f"{t}.bn3"),
            }
            if bi == 0:
                blk["Conv_2"] = _conv_t(sd, f"{t}.downsample.0")
                blk["_FrozenBN_3"] = _bn_t(sd, f"{t}.downsample.1")
            out[f"IBasicBlock_{idx}"] = blk
            idx += 1
    out["_FrozenBN_1"] = _bn_t(sd, "bn2")
    # torch fc flattens NCHW (C,H,W); our flatten is NHWC (H,W,C) —
    # permute the fc input dimension accordingly.
    w = np.asarray(sd["fc.weight"], np.float32)  # (E, C*H*W)
    e = w.shape[0]
    c = 512
    hw = w.shape[1] // c
    s = int(np.sqrt(hw))
    w = w.reshape(e, c, s, s).transpose(0, 2, 3, 1).reshape(e, -1)
    out["Dense_0"] = {"kernel": w.T, "bias": np.asarray(sd["fc.bias"], np.float32)}
    # BatchNorm1d 'features' — affine weight/bias + running stats.
    out["_FrozenBN_2"] = _bn_t(sd, "features")
    return out
