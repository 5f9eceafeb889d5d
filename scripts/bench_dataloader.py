"""Host input-pipeline throughput: decode + transform + batch assembly.

The host path must keep a ~5,200 img/s chip fed (BENCH_r*.json
headline).  Measures:

(a) JPEG decode rate — PIL (single-threaded) vs the native libjpeg
    path at 1..K pool threads (``native/transform.cpp``);
(b) the pure-Python/PIL per-image transform
    (``data/face.py::train_transform``);
(c) the C++ thread-pool batch transform on identical crops;
(d) the FUSED native pipeline (bytes -> decode -> crop/resize/flip ->
    float batch, no Python in the loop) at 1..K threads — the
    production path ``FaceBatcher`` takes for JPEG datasets.

Prints one JSON line per stage, then a summary line with the measured
per-core fused rate and the core count required to feed the chip
(demand / per-core rate) — measured, not asserted.

Env: PPVISION_DL_N (default 512), PPVISION_DL_SIZE (128),
PPVISION_DL_THREADS (max pool width, default 8),
PPVISION_DL_CHIP (chip demand img/s, default 5230).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    n = int(os.environ.get("PPVISION_DL_N", "512"))
    size = int(os.environ.get("PPVISION_DL_SIZE", "128"))
    max_threads = int(os.environ.get("PPVISION_DL_THREADS", "8"))
    chip_demand = float(os.environ.get("PPVISION_DL_CHIP", "5230"))

    from ppvision_tpu.data import native as dn
    from ppvision_tpu.data.face import train_transform

    with tempfile.TemporaryDirectory() as root:
        rng = np.random.default_rng(0)
        paths = []
        for i in range(n):
            arr = rng.integers(0, 255, (178, 218, 3), dtype=np.uint8)
            p = os.path.join(root, f"{i:05d}.jpg")
            Image.fromarray(arr).save(p)
            paths.append(p)
        datas = [open(p, "rb").read() for p in paths]

        t0 = time.perf_counter()
        imgs = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
        dt = time.perf_counter() - t0
        print(json.dumps({"metric": "jpeg decode img/s (PIL, 1 thread)",
                          "value": round(n / dt, 1), "unit": "img/s"}))

        t0 = time.perf_counter()
        out = [train_transform(im, np.random.default_rng(i), size)
               for i, im in enumerate(imgs)]
        np.stack(out)
        dt_py = time.perf_counter() - t0
        print(json.dumps({"metric": "transform img/s (python/PIL)",
                          "value": round(n / dt_py, 1), "unit": "img/s"}))

        if not dn.available():
            print(json.dumps({"metric": "transform native", "value": None,
                              "unit": "unavailable"}))
            return

        h, w = imgs[0].shape[:2]
        crops = np.stack([np.array([0, 0, h, w], np.int32) for _ in range(n)])
        flips = rng.random(n) < 0.5
        t0 = time.perf_counter()
        dn.batch_transform(imgs, crops, (size, size), flips)
        dt_c = time.perf_counter() - t0
        print(json.dumps({"metric": "transform img/s (native C++ pool)",
                          "value": round(n / dt_c, 1), "unit": "img/s"}))

        if not dn.has_jpeg():
            print(json.dumps({"metric": "fused decode+transform", "value": None,
                              "unit": "built without libjpeg"}))
            return

        # Fused bytes->batch pipeline at 1..K threads: measures decode
        # SCALING, not just the 1-thread rate.
        per_thread = {}
        widths = sorted({1, 2, 4, max_threads} & set(range(1, max_threads + 1)))
        for t in widths:
            # warm once (page cache, pool spin-up), then time
            dn.batch_decode_transform(datas[:32], crops[:32], (size, size),
                                      flips[:32], n_threads=t)
            t0 = time.perf_counter()
            _, ok = dn.batch_decode_transform(datas, crops, (size, size),
                                              flips, n_threads=t)
            dt_f = time.perf_counter() - t0
            assert ok.all()
            rate = n / dt_f
            per_thread[t] = rate
            print(json.dumps({
                "metric": f"fused decode+transform img/s (native, {t} threads)",
                "value": round(rate, 1), "unit": "img/s"}))

        base = per_thread[widths[0]]
        top = per_thread[widths[-1]]
        ncores = os.cpu_count() or 1
        # Per-core rate from the widest width that still fits physical
        # cores (oversubscribed widths measure contention, not scaling).
        fit = [t for t in widths if t <= ncores] or [widths[0]]
        eff = per_thread[fit[-1]] / fit[-1]
        print(json.dumps({
            "metric": "host pipeline summary",
            "host_cores": ncores,
            "fused_1thread_img_s": round(base, 1),
            "fused_max_img_s": round(top, 1),
            "scaling_efficiency": round(top / (base * widths[-1]), 3),
            "per_core_img_s": round(eff, 1),
            "chip_demand_img_s": chip_demand,
            "cores_to_feed_chip": round(chip_demand / eff, 1),
        }))


if __name__ == "__main__":
    main()
