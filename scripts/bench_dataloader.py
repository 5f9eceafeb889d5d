"""Host input-pipeline throughput: decode + transform + batch assembly.

The host path must keep a 5,000 img/s chip fed. Measures (a) JPEG
decode rate, (b) the pure-Python/PIL per-image transform
(`data/face.py::train_transform`), (c) the C++ thread-pool batch
transform (`native/transform.cpp` via `data/native.py`) on identical
crops. Prints one JSON line per stage.

Env: PPVISION_DL_N (default 512), PPVISION_DL_SIZE (128).
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

        t0 = time.perf_counter()
        imgs = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
        dt = time.perf_counter() - t0
        print(json.dumps({"metric": "jpeg decode img/s (PIL)",
                          "value": round(n / dt, 1), "unit": "img/s"}))

        t0 = time.perf_counter()
        out = [train_transform(im, np.random.default_rng(i), size)
               for i, im in enumerate(imgs)]
        np.stack(out)
        dt_py = time.perf_counter() - t0
        print(json.dumps({"metric": "transform img/s (python/PIL)",
                          "value": round(n / dt_py, 1), "unit": "img/s"}))

        if dn.available():
            h, w = imgs[0].shape[:2]
            crops = np.stack(
                [np.array([0, 0, h, w], np.int32) for _ in range(n)]
            )
            flips = (rng.random(n) < 0.5)
            t0 = time.perf_counter()
            dn.batch_transform(imgs, crops, (size, size), flips)
            dt_c = time.perf_counter() - t0
            print(json.dumps({"metric": "transform img/s (native C++ pool)",
                              "value": round(n / dt_c, 1), "unit": "img/s"}))
        else:
            print(json.dumps({"metric": "transform native", "value": None,
                              "unit": "unavailable"}))


if __name__ == "__main__":
    main()
