"""FAN stacked-hourglass face-landmark heatmap network (Flax, NHWC).

Same architecture family as the reference's wing/FAN
(``Face-DeId/core/wing.py:36-310``): CoordConv stem, dense ConvBlocks,
one depth-4 hourglass, 98+1-channel heatmap head, plus the heatmap
post-processing (privacy masks, facial-part shift/sharpen pipeline,
landmark extraction).

TPU-first choices:

- The network only ever runs frozen/eval in this framework (the
  reference never optimizes FAN, solver.py:60-62), so BatchNorm uses
  stored running statistics as parameters — no mutable state under jit.
- Coordinate channels are static constants concatenated on the channel
  (lane) axis.
- The hourglass recursion is unrolled at trace time (depth is static).
- Landmark extraction (argmax over heatmaps) is a flat-argmax +
  unravel, batched, instead of per-sample Python loops
  (wing.py:289-298).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.image import avg_pool_2x, resize_bilinear, upsample_nearest_2x
from .stargan import Conv

NUM_LANDMARKS = 98


def _coord_channels(height: int, width: int, with_r: bool) -> np.ndarray:
    """(H, W, 2 or 3) static coord maps; 'x' varies along H as in the
    reference (wing.py:86-99).

    Computed with the reference's exact f32 arithmetic
    (``arange/(n-1)*2-1``, wing.py:86-89) — IEEE elementwise ops, so the
    values are bit-identical to the torch constants; promoting them to
    f64 then matches a ``.double()``-converted reference net exactly
    (the f64 free-running dynamics golden relies on this)."""
    x = (np.arange(height, dtype=np.float32) / np.float32(height - 1)) * np.float32(2) - np.float32(1)
    y = (np.arange(width, dtype=np.float32) / np.float32(width - 1)) * np.float32(2) - np.float32(1)
    x = x[:, None] * np.ones((1, width), np.float32)
    y = np.ones((height, 1), np.float32) * y[None]
    chans = [x, y]
    if with_r:
        rr = np.sqrt(x**2 + y**2)
        chans.append(rr / rr.max())
    return np.stack(chans, axis=-1)


class _ConvParams(nn.Module):
    """Parameter-only stand-in for ``nn.Conv`` (same tree: kernel, bias)."""

    kshape: tuple
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.kshape)
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _KernelParams(nn.Module):
    """Parameter-only stand-in for a bias-free ``nn.Conv`` (tree: kernel).

    Lets a block read the raw kernel to build fused variants (e.g.
    conv+pool) from the SAME parameter tensor nn.Conv would own — the
    param tree (names, shapes, init) is identical to
    ``nn.Conv(use_bias=False)``."""

    kshape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.kshape)


class CoordConv(nn.Module):
    """Conv over input + coordinate (+boundary-gated coordinate) channels.

    The coordinate channels are static, so their contribution
    ``conv(coords)`` is a CONSTANT feature map that XLA folds at compile
    time — the runtime conv only sees the data channels (no channel
    concat, no 256^2 coord materialization, and channel counts stay
    lane-aligned: e.g. the hourglass 1x1 runs 256-in, not 259-in).
    Exact same math as convolving the concatenation.
    """

    features: int
    kernel: int
    stride: int = 1
    with_r: bool = False
    with_boundary: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, heatmap=None):
        h, w = x.shape[-3], x.shape[-2]
        coords = _coord_channels(h, w, self.with_r)
        ncoord = coords.shape[-1]
        cx = x.shape[-1]
        # Boundary-gated channels exist only when a heatmap is fed (the
        # reference conv is built lazily on the concatenated input,
        # wing.py:86-136 — first-stack hourglasses see no boundary).
        has_gate = self.with_boundary and heatmap is not None
        cin = cx + ncoord + (2 if has_gate else 0)
        kernel, bias = _ConvParams(
            (self.kernel, self.kernel, cin, self.features), self.features,
            name="Conv_0",
        )()
        dt = self.dtype or x.dtype
        pad = [(self.kernel // 2, self.kernel // 2)] * 2
        strides = (self.stride, self.stride)
        from ..ops.cpuconv import conv2d

        def conv(v, k):
            return conv2d(v.astype(dt), k.astype(dt), strides, pad)

        y = conv(x, kernel[:, :, :cx])
        # Static coord contribution: conv of a (1,H,W,ncoord) constant.
        y = y + conv(jnp.asarray(coords)[None], kernel[:, :, cx : cx + ncoord])
        if has_gate:
            boundary = jnp.clip(heatmap[..., -1:], 0.0, 1.0)
            gate = (boundary > 0.05).astype(dt)
            gated = gate * jnp.asarray(coords[..., :2])[None].astype(dt)
            y = y + conv(gated, kernel[:, :, cx + ncoord :])
        return y + bias.astype(dt)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with running stats stored as parameters (eval-only).

    ``fold=True`` returns the folded f32 ``(mul, add)`` pair instead of
    applying it (``x`` then only supplies the channel count) — used by
    the fused Pallas DenseConvBlock, which applies the same
    compute-dtype scale/shift inside the kernel."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, fold: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        # Fold stats into one scale/shift, applied in the compute dtype.
        # (Same association as ever: mean * rsqrt * scale, left-to-right.)
        mulf = jax.lax.rsqrt(var + self.eps) * scale
        addf = bias - mean * jax.lax.rsqrt(var + self.eps) * scale
        if fold:
            return mulf, addf
        return x * mulf.astype(x.dtype) + addf.astype(x.dtype)


class DenseConvBlock(nn.Module):
    """BN-relu-conv cascade whose three outputs concatenate to ``features``
    channels (the hourglass building block, wing.py:139-175).

    ``pool_output=True`` returns ``avg_pool_2x(block(x))`` with the pool
    commuted through the channel concat and the residual 1x1 (both exact:
    pooling is spatial-linear, concat is channel-only), and the LAST 3x3
    conv fused with the pool into one 4x4/s2 conv
    (``ops.fusedconv.conv3x3_avgpool2x``).  Identical math to pooling
    after the block, but the concat, residual, and o3 tensors are only
    ever materialized at the pooled resolution — the unfused order
    writes them all at full res first (the FAN stem's 128^2 maps are the
    bandwidth-bound stage's largest tensors).  Param tree is unchanged.
    """

    in_features: int
    features: int
    dtype: Any = None
    pool_output: bool = False

    @nn.compact
    def __call__(self, x):
        half, quarter = self.features // 2, self.features // 4
        dt = self.dtype or x.dtype
        cin = x.shape[-1]

        from ..ops.cpuconv import conv2d

        def conv3x3(h, k):
            return conv2d(h.astype(dt), k.astype(dt), (1, 1), [(1, 1), (1, 1)])

        def bn_relu(h):
            return nn.relu(FrozenBatchNorm()(h))

        # Params declared identically in both paths (same order/names).
        k1 = _KernelParams((3, 3, cin, half), name="Conv_0")
        k2 = _KernelParams((3, 3, half, quarter), name="Conv_1")
        k3 = _KernelParams((3, 3, quarter, quarter), name="Conv_2")

        if not self.pool_output and self.in_features == self.features == cin:
            from ..ops.denseblock import dense_block_eligible, fused_dense_block

            xc = x.astype(dt)
            # x.dtype == dt keeps BN numerics identical to the unfused
            # path (which normalizes in x's own dtype before the conv
            # casts).
            if x.dtype == jnp.dtype(dt) and dense_block_eligible(
                xc, self.features
            ):
                # Whole block in one Pallas kernel: read x once, write
                # concat+residual once (ops/denseblock.py).  The three
                # FrozenBatchNorms are declared in the SAME call order
                # as the unfused path (auto-names _0/_1/_2); ``fold``
                # hands their folded (mul, add) to the kernel, and the
                # channel-sliced dummies only supply channel counts.
                bn1 = FrozenBatchNorm()(x, fold=True)
                bn2 = FrozenBatchNorm()(x[..., :half], fold=True)
                bn3 = FrozenBatchNorm()(x[..., :quarter], fold=True)
                return fused_dense_block(
                    xc, k1().astype(dt), k2().astype(dt), k3().astype(dt),
                    bn1, bn2, bn3,
                )

        h1 = bn_relu(x)
        o1 = conv3x3(h1, k1())
        h2 = bn_relu(o1)
        o2 = conv3x3(h2, k2())
        h3 = bn_relu(o2)

        if not self.pool_output:
            o3 = conv3x3(h3, k3())
            out = jnp.concatenate([o1, o2, o3], axis=-1)
            res = x
            if self.in_features != self.features:
                res = Conv(
                    self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="Conv_3",
                )(bn_relu(res))
            return out + res

        from ..ops.fusedconv import conv3x3_avgpool2x

        o3p = conv3x3_avgpool2x(h3.astype(dt), k3())
        out = jnp.concatenate([avg_pool_2x(o1), avg_pool_2x(o2), o3p], axis=-1)
        res = x
        if self.in_features != self.features:
            # 1x1 conv commutes exactly with the 2x2 mean pool (channel-
            # only vs spatial-only linear maps) — run it on the small side.
            res = Conv(
                self.features, (1, 1), use_bias=False, dtype=self.dtype,
                name="Conv_3",
            )(avg_pool_2x(bn_relu(res).astype(dt)))
        else:
            res = avg_pool_2x(res)
        return out + res


class HourGlass(nn.Module):
    """Recursive encoder-decoder at depth 4 over 256-channel features."""

    depth: int = 4
    features: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, heatmap=None):
        x = CoordConv(
            self.features, 1, with_r=True, with_boundary=True, dtype=self.dtype
        )(x, heatmap)

        def level(h, d):
            up1 = DenseConvBlock(self.features, self.features, dtype=self.dtype)(h)
            low = avg_pool_2x(h)
            low = DenseConvBlock(self.features, self.features, dtype=self.dtype)(low)
            if d > 1:
                low = level(low, d - 1)
            else:
                low = DenseConvBlock(self.features, self.features, dtype=self.dtype)(low)
            low = DenseConvBlock(self.features, self.features, dtype=self.dtype)(low)
            return up1 + upsample_nearest_2x(low)

        return level(x, self.depth)


class FAN(nn.Module):
    """Single-stack FAN: stem to 64x64x256, hourglass, 99-channel head.

    ``fold_privacy_head=True`` (an apply-time compute variant over the
    SAME param tree) returns the two privacy masks at head resolution,
    (B, 64, 64, 2) float32, instead of the 99-channel heatmap: the
    privacy masks are channel-sums of the head output
    (``get_heatmap(privacy=True)``, reference wing.py:249-251), and a
    channel-sum of 1x1-conv outputs equals a 1x1 conv with the
    channel-summed kernel/bias — so the fold writes 2 channels where
    the unfused order writes 99 and re-reads them to reduce (the head
    map is one of the bandwidth-bound FAN stage's largest tensors).
    The boundary channel (98) is not part of either mask.
    """

    num_landmarks: int = NUM_LANDMARKS
    dtype: Any = None
    fold_privacy_head: bool = False

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = CoordConv(64, 7, stride=2, with_r=True, dtype=self.dtype)(x)  # 256 -> 128
        x = nn.relu(FrozenBatchNorm()(x))
        # Stem block with the 128->64 pool commuted inside (exact math,
        # avoids materializing the block's 128^2 maps — see DenseConvBlock).
        x = DenseConvBlock(64, 128, dtype=self.dtype, pool_output=True)(x)
        x = DenseConvBlock(128, 128, dtype=self.dtype)(x)
        x = DenseConvBlock(128, 256, dtype=self.dtype)(x)

        h = HourGlass(dtype=self.dtype)(x, None)
        h = DenseConvBlock(256, 256, dtype=self.dtype)(h)
        h = Conv(256, (1, 1), dtype=self.dtype)(h)
        h = nn.relu(FrozenBatchNorm()(h))
        dt = self.dtype or h.dtype
        kern, bias = _ConvParams(
            (1, 1, 256, self.num_landmarks + 1), self.num_landmarks + 1,
            name="Conv_1",
        )()
        if self.fold_privacy_head:
            # Masks = f32 channel-sums of head channels [0:49) / [49:98)
            # == 1x1 conv with group-summed kernel (summed in the f32
            # master params; f32 accumulate+output — FAN is value-only
            # everywhere, so the mixed-dtype conv never sees a grad).
            from ..ops.cpuconv import conv2d as _c2d

            kf = jnp.stack(
                [kern[..., :49].sum(-1), kern[..., 49:98].sum(-1)], axis=-1
            )
            bf = jnp.stack([bias[:49].sum(), bias[49:98].sum()])
            out = _c2d(
                h, kf.astype(dt), (1, 1), "VALID",
                preferred_element_type=jnp.promote_types(h.dtype, jnp.float32),
            )
            return out + bf
        # Returned in the compute dtype: consumers reduce/resize with f32
        # accumulation, so an eager f32 cast here would only double the
        # head tensor's HBM bytes.
        from ..ops.cpuconv import conv2d as _c2d

        y = _c2d(h, kern.astype(dt), (1, 1), "VALID")
        return y + bias.astype(dt)


# ---------------------------------------------------------------------------
# Heatmap post-processing (pure functions of the raw head output).
# ---------------------------------------------------------------------------

# Facial-part channel ranges (reference wing.py:518-528).
IDX = dict(
    chin=(8, 25),
    eyebrows=(33, 51),
    eyebrowsedges=(33, 46),
    nose=(51, 55),
    nostrils=(55, 60),
    eyes=(60, 76),
    lipedges=(76, 82),
    lipupper=(77, 82),
    liplower=(83, 88),
    lipinner=(88, 96),
)


def _roll_rows(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """The reference's ``shift`` (wing.py:497-515) is a circular row roll."""
    return jnp.roll(x, -n, axis=-3)


def preprocess_heatmaps(hm: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Facial-part shift/sharpen pipeline -> (mask, mask-without-face-line).

    Port of ``preprocess`` (wing.py:532-578); ``hm`` is (B, H, W, 98)
    NHWC.  Returns two (B, H, W, 1) masks in [0, 1].
    """
    h = hm.shape[-3]
    sw = h // 256
    ops = dict(
        chin=(0, 3),
        eyebrows=(-7 * sw, 2),
        nostrils=(8 * sw, 4),
        lipupper=(-8 * sw, 4),
        liplower=(8 * sw, 4),
        lipinner=(-2 * sw, 3),
    )
    x = hm
    for part, (shift_n, power) in ops.items():
        s, e = IDX[part]
        x = x.at[..., s:e].set(_roll_rows(x[..., s:e], shift_n) ** power)

    zero = (
        list(range(0, IDX["chin"][0]))
        + list(range(IDX["chin"][1], 33))
        + [IDX["eyebrowsedges"][0], IDX["eyebrowsedges"][1], IDX["lipedges"][0], IDX["lipedges"][1]]
    )
    x = x.at[..., jnp.asarray(zero)].set(0.0)

    s, e = IDX["nose"]
    x = x.at[..., s + 1 : e].set(_roll_rows(x[..., s + 1 : e], 4 * sw))

    s, e = IDX["eyes"]
    eyes = x[..., s:e]
    x = x.at[..., s:e].set(_roll_rows(eyes, -8) ** 3 + _roll_rows(eyes, -24))

    x2 = x
    x2 = x2.at[..., IDX["chin"][0] : IDX["chin"][1]].set(0.0)
    x2 = x2.at[..., IDX["lipedges"][0] : IDX["lipinner"][1]].set(0.0)
    x2 = x2.at[..., IDX["eyebrows"][0] : IDX["eyebrows"][1]].set(0.0)

    m1 = jnp.nan_to_num(jnp.sum(x, axis=-1, keepdims=True))
    m2 = jnp.nan_to_num(jnp.sum(x2, axis=-1, keepdims=True))
    return jnp.clip(m1, 0.0, 1.0), jnp.clip(m2, 0.0, 1.0)


def get_heatmap(
    fan: FAN,
    params: Any,
    x: jnp.ndarray,
    privacy: bool = False,
    delimiter: bool = False,
    input_size: int = 256,
):
    """0-1 normalized heatmap masks from an image batch.

    Port of ``FAN.get_heatmap`` (wing.py:241-260): resize to 256
    (bilinear), map [-1,1]-style input through ``x*0.5+0.5``, run the
    net, drop the boundary channel, upsample back with
    align_corners=True, then:

    - ``privacy=True``: two masks = clamped sums of channels [0:49) and
      [49:98) (wing.py:249-251).
    - ``delimiter=True``: zero channels <33 then the preprocess pipeline.
    - otherwise: the preprocess pipeline.
    """
    # The reference resizes the input to 256 and upsamples heatmaps by
    # input//heatmap = 4, so masks are always 256^2 regardless of the
    # original image size (wing.py:244-258).  ``input_size`` below 256
    # is a speed knob for tests/dry-runs, not reference behavior.
    s = input_size
    # Cast to the FAN compute dtype BEFORE the 256^2 upsample: the first
    # conv casts anyway, and doing it here halves the HBM traffic of the
    # largest tensors in the (bandwidth-bound) FAN stage.
    xr = resize_bilinear(x.astype(fan.dtype or x.dtype), (s, s))
    if privacy:
        # Channel-sum and bilinear resize commute (both linear; the
        # reference clamps last, wing.py:250-251), so the sums happen at
        # heatmap resolution before upsampling — identical result, 49x
        # less resize memory (the naive order OOMs at batch 256 on a
        # 16 GB chip).  The sums themselves are folded INTO the head
        # conv's kernel (see ``FAN.fold_privacy_head``), so the
        # 99-channel head map is never materialized either.
        m = FAN(
            num_landmarks=fan.num_landmarks, dtype=fan.dtype,
            fold_privacy_head=True,
        ).apply({"params": params}, xr * 0.5 + 0.5)
        m = resize_bilinear(m, (s, s), align_corners=True)
        return (
            jnp.clip(m[..., :1], 0.0, 1.0),
            jnp.clip(m[..., 1:], 0.0, 1.0),
        )
    out = fan.apply({"params": params}, xr * 0.5 + 0.5)
    hm = out[..., : NUM_LANDMARKS]
    hm = resize_bilinear(
        hm.astype(jnp.promote_types(hm.dtype, jnp.float32)), (s, s), align_corners=True
    )
    if delimiter:
        hm = hm.at[..., :33].set(0.0)
    return preprocess_heatmaps(hm)


def estimate_landmarks(fan: FAN, params: Any, x: jnp.ndarray) -> jnp.ndarray:
    """(B, 98, 2) landmark coordinates x4 scale (port of
    ``estimate_landmark``, wing.py:289-298) via batched flat argmax."""
    out = fan.apply({"params": params}, x * 0.5 + 0.5).astype(jnp.float32)
    hm = out[..., :NUM_LANDMARKS]
    hm = hm.at[..., :33].set(0.0)
    b, h, w, c = hm.shape
    flat = jnp.transpose(hm, (0, 3, 1, 2)).reshape(b, c, h * w)
    idx = jnp.argmax(flat, axis=-1)
    rows = idx // w
    cols = idx % w
    return jnp.stack([rows, cols], axis=-1).astype(jnp.float32) * 4.0
