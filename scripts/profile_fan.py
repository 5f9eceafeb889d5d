"""Section timing of the FAN stage at bench shapes: stem vs hourglass vs head.

Also times a single DenseConvBlock at 64^2x256 to estimate per-block cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppvision_tpu.models.fan import FAN, DenseConvBlock, HourGlass, get_heatmap
from ppvision_tpu.ops.image import avg_pool_2x, resize_bilinear

B = int(os.environ.get("PPVISION_FAN_BATCH", "128"))
DT = jnp.bfloat16


def timeit(f, *args):
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
    float(g(*args))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(g(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


class Stem(nn.Module):
    dtype = DT

    @nn.compact
    def __call__(self, x):
        from ppvision_tpu.models.fan import CoordConv, DenseConvBlock, FrozenBatchNorm

        x = CoordConv(64, 7, stride=2, with_r=True, dtype=self.dtype)(x)
        x = nn.relu(FrozenBatchNorm()(x))
        x = DenseConvBlock(64, 128, dtype=self.dtype)(x)
        x = avg_pool_2x(x)
        x = DenseConvBlock(128, 128, dtype=self.dtype)(x)
        x = DenseConvBlock(128, 256, dtype=self.dtype)(x)
        return x


def main():
    key = jax.random.key(0)
    x128 = jax.random.uniform(key, (B, 128, 128, 3))

    fan = FAN(dtype=DT)
    pf = fan.init(key, jnp.zeros((1, 256, 256, 3)))["params"]
    t_full = timeit(
        lambda p, x: get_heatmap(fan, p, x, privacy=True)[0], pf, x128
    )

    stem = Stem()
    x256 = resize_bilinear(x128.astype(DT), (256, 256))
    ps = stem.init(key, jnp.zeros((1, 256, 256, 3), DT))["params"]
    t_stem = timeit(lambda p, x: stem.apply({"params": p}, x), ps, x256)

    hg = HourGlass(dtype=DT)
    x64 = jax.random.normal(key, (B, 64, 64, 256), DT)
    ph = hg.init(key, jnp.zeros((1, 64, 64, 256), DT))["params"]
    t_hg = timeit(lambda p, x: hg.apply({"params": p}, x), ph, x64)

    blk = DenseConvBlock(256, 256, dtype=DT)
    pb = blk.init(key, jnp.zeros((1, 64, 64, 256), DT))["params"]
    t_blk = timeit(lambda p, x: blk.apply({"params": p}, x), pb, x64)

    print(
        f"B={B}: full {t_full:.1f}ms | stem(256^2 in) {t_stem:.1f}ms | "
        f"hourglass(64^2x256) {t_hg:.1f}ms | one block@64^2 {t_blk:.1f}ms"
    )


if __name__ == "__main__":
    main()
