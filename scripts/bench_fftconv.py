"""Fused Pallas FFT-conv vs the unfused split-complex DFT chain, on-chip.

Compiles ``ops.fftconv.fft_conv2d_circular_pallas`` on the real TPU,
asserts equivalence with ``optics.fourier.fft_conv2d_circular`` at the
camera's shapes, and times both.  Timing methodology (see
.claude/skills/verify): ``block_until_ready`` does NOT synchronize on
the tunnel backend — every measurement chains K convs inside ONE jit
and syncs with a scalar ``float(jnp.sum(...))`` host transfer, then
subtracts the ~7.5 ms fixed dispatch floor once.  Prints JSON.

NOTE: Mosaic compiles this kernel SLOWLY (~4 min per shape at
Precision.HIGHEST); that is why the fused camera path ships opt-in
(``PPVISION_FUSED_FFTCONV=1``) — see PERF.md round-3c.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ppvision_tpu.ops.dft import fft2_real
from ppvision_tpu.ops.fftconv import fft_conv2d_circular_pallas
from ppvision_tpu.optics.fourier import fft_conv2d_circular

DISPATCH_FLOOR_S = 7.5e-3
CHAIN = 8


def timeit_synced(fn, *args, reps=6):
    """min over reps of one chained program, scalar-sync timed."""
    float(fn(*args))  # warm (compile)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    out = {"backend": jax.default_backend(), "chain": CHAIN}
    shapes = [(128, 128)]
    if os.environ.get("PPVISION_FFTCONV_FULL"):
        shapes += [(512, 128), (64, 256)]
    results = []
    for b, n in shapes:
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((b, n, n, 3)), jnp.float32)
        ker = jnp.asarray(rng.random((n, n, 3)), jnp.float32)
        kr, ki = fft2_real(ker, axes=(0, 1))

        # Equivalence, single dispatch each.
        t0 = time.perf_counter()
        got = np.asarray(jax.jit(fft_conv2d_circular_pallas)(img, kr, ki))
        fused_compile_s = time.perf_counter() - t0
        want = np.asarray(jax.jit(fft_conv2d_circular)(img, ker))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
        assert rel < 1e-5, (b, n, rel)

        @jax.jit
        def chained_fused(x, kr, ki):
            for _ in range(CHAIN):
                x = fft_conv2d_circular_pallas(x, kr, ki)
            return jnp.sum(x)

        @jax.jit
        def chained_unfused(x, k):
            for _ in range(CHAIN):
                x = fft_conv2d_circular(x, k)
            return jnp.sum(x)

        t_f = (timeit_synced(chained_fused, img, kr, ki) - DISPATCH_FLOOR_S) / CHAIN
        t_u = (timeit_synced(chained_unfused, img, ker) - DISPATCH_FLOOR_S) / CHAIN
        results.append(dict(
            batch=b, n=n, max_rel=float(rel),
            fused_ms=round(t_f * 1e3, 3), unfused_ms=round(t_u * 1e3, 3),
            speedup=round(t_u / t_f, 2),
            fused_compile_s=round(fused_compile_s, 1),
        ))
        print(results[-1], flush=True)
    out["results"] = results
    print(json.dumps(out))


if __name__ == "__main__":
    main()
