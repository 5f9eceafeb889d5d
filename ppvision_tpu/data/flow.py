"""Optical-flow data utilities (RAFT auxiliary stack).

Covers the reference's flow-side components (``Face-DeId/RAFT/core/
{datasets.py, utils/augmentor.py, utils/flow_viz.py,
utils/frame_utils.py}``), which the de-id training path does not touch
but the component inventory includes: .flo / KITTI-png flow IO, the
Middlebury color wheel visualization, Sintel/Chairs-style dataset
indexing, and a photometric+spatial augmentor (host-side numpy).
"""

from __future__ import annotations

import os
import struct
from pathlib import Path

import numpy as np

__all__ = [
    "read_flo",
    "write_flo",
    "read_flow_kitti",
    "write_flow_kitti",
    "flow_to_image",
    "FlowPairDataset",
    "FlowAugmentor",
]

_FLO_MAGIC = 202021.25


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo -> (H, W, 2) float32."""
    with open(path, "rb") as f:
        magic = struct.unpack("f", f.read(4))[0]
        if abs(magic - _FLO_MAGIC) > 1e-3:
            raise ValueError(f"{path}: bad .flo magic {magic}")
        w = struct.unpack("i", f.read(4))[0]
        h = struct.unpack("i", f.read(4))[0]
        data = np.frombuffer(f.read(h * w * 2 * 4), np.float32)
    return data.reshape(h, w, 2).copy()


def write_flo(path: str, flow: np.ndarray) -> None:
    h, w, _ = flow.shape
    with open(path, "wb") as f:
        f.write(struct.pack("f", _FLO_MAGIC))
        f.write(struct.pack("i", w))
        f.write(struct.pack("i", h))
        f.write(flow.astype(np.float32).tobytes())


def read_flow_kitti(path: str) -> tuple[np.ndarray, np.ndarray]:
    """KITTI 16-bit png -> ((H, W, 2) flow, (H, W) valid mask)."""
    import cv2

    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR).astype(np.float64)
    flow = raw[:, :, ::-1][:, :, :2]  # BGR -> RGB, first two channels
    valid = raw[:, :, 0] > 0  # BGR: third RGB channel = first BGR
    flow = (flow - 2**15) / 64.0
    return flow.astype(np.float32), valid


def write_flow_kitti(path: str, flow: np.ndarray, valid: np.ndarray | None = None):
    import cv2

    h, w, _ = flow.shape
    out = np.ones((h, w, 3), np.uint16)
    out[:, :, :2] = np.clip(flow * 64.0 + 2**15, 0, 2**16 - 1).astype(np.uint16)
    if valid is not None:
        out[:, :, 2] = valid.astype(np.uint16)
    cv2.imwrite(path, out[:, :, ::-1])


def _color_wheel() -> np.ndarray:
    """Middlebury color wheel (55 colors)."""
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    cols = np.zeros((ry + yg + gc + cb + bm + mr, 3))
    col = 0
    cols[:ry, 0] = 255
    cols[:ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    cols[col : col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    cols[col : col + yg, 1] = 255
    col += yg
    cols[col : col + gc, 1] = 255
    cols[col : col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    cols[col : col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    cols[col : col + cb, 2] = 255
    col += cb
    cols[col : col + bm, 2] = 255
    cols[col : col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    cols[col : col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    cols[col : col + mr, 0] = 255
    return cols


def flow_to_image(flow: np.ndarray, clip: float | None = None) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 color-wheel visualization."""
    if clip is not None:
        flow = np.clip(flow, -clip, clip)
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u**2 + v**2)
    rad_max = max(rad.max(), 1e-6)
    u, v = u / rad_max, v / rad_max
    rad = rad / rad_max

    wheel = _color_wheel()
    n = wheel.shape[0]
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (n - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % n
    f = fk - k0
    img = np.zeros(flow.shape[:2] + (3,), np.uint8)
    for c in range(3):
        col0 = wheel[k0, c] / 255.0
        col1 = wheel[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        col = 1 - rad * (1 - col)  # saturate with radius
        img[..., c] = np.floor(255 * col)
    return img


class FlowPairDataset:
    """Sintel-style (frame_t, frame_t+1, flow) triples from directories."""

    def __init__(self, image_root: str, flow_root: str | None = None, ext: str = "png"):
        self.pairs: list[tuple[str, str]] = []
        self.flows: list[str | None] = []
        for scene in sorted(Path(image_root).iterdir()):
            if not scene.is_dir():
                continue
            frames = sorted(str(p) for p in scene.glob(f"*.{ext}"))
            for a, b in zip(frames[:-1], frames[1:]):
                self.pairs.append((a, b))
                if flow_root:
                    flo = os.path.join(
                        flow_root, scene.name, Path(a).stem + ".flo"
                    )
                    self.flows.append(flo if os.path.exists(flo) else None)
                else:
                    self.flows.append(None)

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i: int):
        from PIL import Image

        a, b = self.pairs[i]
        img1 = np.asarray(Image.open(a).convert("RGB"), np.float32)
        img2 = np.asarray(Image.open(b).convert("RGB"), np.float32)
        flow = read_flo(self.flows[i]) if self.flows[i] else None
        return img1, img2, flow


class FlowAugmentor:
    """Photometric + spatial augmentation for flow training pairs
    (asymmetric color jitter, random scale/stretch, flips, crop —
    the reference augmentor's behavior, RAFT/core/utils/augmentor.py)."""

    def __init__(
        self,
        crop_size: tuple[int, int],
        min_scale: float = -0.2,
        max_scale: float = 0.5,
        do_flip: bool = True,
        seed: int = 0,
    ):
        self.crop = crop_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.do_flip = do_flip
        self.rng = np.random.default_rng(seed)

    def _photometric(self, img1, img2):
        rng = self.rng
        # Asymmetric with prob 0.2: jitter each frame independently.
        asym = rng.random() < 0.2
        imgs = [img1, img2] if asym else [np.stack([img1, img2])]
        out = []
        for im in imgs:
            brightness = rng.uniform(0.6, 1.4)
            contrast = rng.uniform(0.6, 1.4)
            im = im * brightness
            mean = im.mean(axis=(-3, -2, -1), keepdims=True)
            im = (im - mean) * contrast + mean
            gamma = rng.uniform(0.7, 1.3)
            im = 255.0 * (np.clip(im, 0, 255) / 255.0) ** gamma
            out.append(im)
        if asym:
            img1, img2 = out
        else:
            img1, img2 = out[0][0], out[0][1]
        return np.clip(img1, 0, 255), np.clip(img2, 0, 255)

    def _spatial(self, img1, img2, flow):
        import cv2

        rng = self.rng
        h, w = img1.shape[:2]
        ch, cw = self.crop
        min_needed = max((ch + 8) / h, (cw + 8) / w)
        scale = 2 ** rng.uniform(self.min_scale, self.max_scale)
        sx = max(scale, min_needed)
        sy = max(scale, min_needed)
        if rng.random() < 0.8:  # stretch
            sx *= 2 ** rng.uniform(-0.2, 0.2)
            sy *= 2 ** rng.uniform(-0.2, 0.2)
        sx, sy = max(sx, min_needed), max(sy, min_needed)
        nw, nh = int(round(w * sx)), int(round(h * sy))
        img1 = cv2.resize(img1, (nw, nh), interpolation=cv2.INTER_LINEAR)
        img2 = cv2.resize(img2, (nw, nh), interpolation=cv2.INTER_LINEAR)
        flow = cv2.resize(flow, (nw, nh), interpolation=cv2.INTER_LINEAR)
        flow = flow * [sx, sy]

        if self.do_flip and rng.random() < 0.5:  # horizontal
            img1 = img1[:, ::-1]
            img2 = img2[:, ::-1]
            flow = flow[:, ::-1] * [-1.0, 1.0]
        if self.do_flip and rng.random() < 0.1:  # vertical
            img1 = img1[::-1]
            img2 = img2[::-1]
            flow = flow[::-1] * [1.0, -1.0]

        y0 = int(rng.integers(0, nh - ch + 1))
        x0 = int(rng.integers(0, nw - cw + 1))
        return (
            img1[y0 : y0 + ch, x0 : x0 + cw],
            img2[y0 : y0 + ch, x0 : x0 + cw],
            flow[y0 : y0 + ch, x0 : x0 + cw],
        )

    def __call__(self, img1, img2, flow):
        img1, img2 = self._photometric(img1, img2)
        img1, img2, flow = self._spatial(img1, img2, flow)
        return (
            np.ascontiguousarray(img1, np.float32),
            np.ascontiguousarray(img2, np.float32),
            np.ascontiguousarray(flow, np.float32),
        )
