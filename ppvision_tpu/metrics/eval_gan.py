"""Face-DeId evaluation orchestration (FID + LPIPS over domain pairs).

Equivalent of the reference's ``calculate_metrics`` /
``calculate_fid_for_all_tasks`` (``Face-DeId/metrics/eval.py:16-148``):
for every (source -> target) domain pair, form privacy images with the
camera, regress heatmaps, generate ``num_outs`` anonymized outputs per
source (latent- or reference-style), record mean pairwise LPIPS per
source group, optionally dump PNGs, then FID between real target-domain
images and the generated set.  Reports are returned as dicts and
written as JSON (eval.py:116-120, 147-148).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..data.face import eval_batches, list_images
from ..deid import DeIdBundle, DeIdParams, deid_from_latent, deid_from_reference
from .face_id import IResNet, make_embed_fn
from .fid import InceptionV3, collect_activations, fid_from_activations
from .lpips import LPIPS, make_pairwise_lpips_fn

__all__ = ["calculate_metrics", "load_metric_nets"]


def _domains(root: str) -> list[str]:
    return sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))


def load_metric_nets(paths) -> dict[str, Any]:
    """Import pretrained metric-net weights from a PathsConfig.

    Returns a dict with any of 'lpips_params' / 'inception_params' /
    'arcface_params' whose checkpoint files exist (utils.torch_import
    conversions); missing ones are simply absent.
    """
    from ..utils.torch_import import load_torch_state_dict

    out: dict[str, Any] = {}
    if os.path.exists(paths.lpips_path) and os.path.exists(paths.alexnet_path):
        from ..utils.torch_import import lpips_params_from_torch

        out["lpips_params"] = lpips_params_from_torch(
            load_torch_state_dict(paths.alexnet_path),
            load_torch_state_dict(paths.lpips_path),
        )
    if os.path.exists(paths.inception_path):
        from ..utils.torch_import import inception_variables_from_torch

        out["inception_params"] = inception_variables_from_torch(
            load_torch_state_dict(paths.inception_path)
        )
    if os.path.exists(paths.arcface_path):
        from .face_id import arcface_variables_from_torch

        out["arcface_params"] = arcface_variables_from_torch(
            load_torch_state_dict(paths.arcface_path)
        )
    return out


def calculate_metrics(
    bundle: DeIdBundle,
    params: DeIdParams,
    val_root: str,
    mode: str = "latent",
    num_outs: int = 10,
    batch_size: int = 8,
    lpips_params: Any | None = None,
    inception_params: Any | None = None,
    arcface_params: Any | None = None,
    allow_random_metrics: bool = False,
    out_dir: str | None = None,
    step: int = 0,
    seed: int = 0,
    max_images: int | None = None,
    align_fan_params: Any | None = None,
) -> dict[str, float]:
    """LPIPS_{mode} per src->trg task + FID per target domain + face-ID
    cosine (src vs anonymized, BASELINE.json parity metric).

    ``lpips_params`` / ``inception_params`` / ``arcface_params`` come
    from converted reference checkpoints (``load_metric_nets``).  When a
    net's weights are missing the eval REFUSES to fabricate published
    numbers unless ``allow_random_metrics=True``, in which case fresh
    random nets are used (relative comparisons only) and a loud warning
    is printed.

    ``align_fan_params`` (clean wing-FAN params, e.g. the converted
    wing.ckpt) switches the face-ID embed to the insightface-comparable
    pipeline (FAN landmarks -> ArcFace-template warp -> embed,
    ``face_id.make_aligned_embed_fn``) so absolute cosines line up with
    published ArcFace numbers; default is the whole-frame resize embed,
    self-consistent for parity.
    """
    import sys

    assert mode in ("latent", "reference")
    missing = [
        n
        for n, p in (
            ("LPIPS", lpips_params),
            ("InceptionV3/FID", inception_params),
            ("ArcFace/face-ID", arcface_params),
        )
        if p is None
    ]
    if missing and not allow_random_metrics:
        raise RuntimeError(
            f"metric nets without pretrained weights: {', '.join(missing)}. "
            "Converted checkpoints are required to reproduce published "
            "numbers (see utils.torch_import / load_metric_nets); pass "
            "allow_random_metrics=True (CLI: --allow_random_metrics) for "
            "relative-only numbers from random nets."
        )
    if missing:
        print(
            f"WARNING: random-weight metric nets: {', '.join(missing)} — "
            "values are NOT comparable to published numbers.",
            file=sys.stderr,
        )
    cfg = bundle.cfg
    img_size = cfg.model.img_size
    domains = _domains(val_root)
    if lpips_params is None:
        x0 = jnp.zeros((1, img_size, img_size, 3))
        lpips_params = LPIPS().init(jax.random.key(0), x0, x0)["params"]
    # All C(num_outs, 2) pairwise LPIPS values in ONE jitted call per
    # source batch (features computed once per output).
    lpips_pairs_fn = make_pairwise_lpips_fn(lpips_params, num_outs)
    id_net = IResNet()
    if arcface_params is None:
        arcface_params = id_net.init(jax.random.key(2), jnp.zeros((1, 112, 112, 3)))[
            "params"
        ]
    if align_fan_params is not None:
        from .face_id import make_aligned_embed_fn

        embed_fn = make_aligned_embed_fn(
            id_net, arcface_params, bundle.fan, align_fan_params,
            input_size=cfg.model.fan_input_size,
        )
    else:
        embed_fn = make_embed_fn(id_net, arcface_params)

    @jax.jit
    def id_cos_multi(x_src, fakes):
        """Identity leakage for all outputs at once: (R, B, H, W, 3) ->
        (R,) mean cosine(src, anonymized) per output."""
        r, b = fakes.shape[0], fakes.shape[1]
        es = embed_fn(x_src)
        ef = embed_fn(fakes.reshape((r * b,) + fakes.shape[2:])).reshape(r, b, -1)
        return jnp.mean(jnp.sum(es[None] * ef, axis=-1), axis=1)

    # Multi-output fast path: camera + heatmaps + generator ENCODE once
    # per source batch, then the style-modulated decoder scans over the
    # num_outs styles (models/stargan.py::Generator.decode) — identical
    # outputs to the per-out loop the reference runs (eval.py:66-93).
    from ..deid import _privacy_front
    from ..models.stargan import Generator

    def _gen_multi(p, xs, styles_rb):
        x_priv, masks = _privacy_front(bundle, p, xs)
        gen = bundle.models["generator"]
        z, hps = gen.apply(
            {"params": p.generator}, x_priv, masks, method=Generator.encode
        )
        s_r = styles_rb.reshape(-1, xs.shape[0], styles_rb.shape[-1])

        def body(_, sb):
            return None, gen.apply(
                {"params": p.generator}, z, sb, hps, method=Generator.decode
            )

        _, fakes = jax.lax.scan(body, None, s_r)
        return fakes

    @jax.jit
    def gen_lat_multi(p, xs, zs, y):
        """zs: (R, B, latent); y: (B,) -> (R, B, H, W, 3)."""
        r, b = zs.shape[0], zs.shape[1]
        yy = jnp.tile(y, (r,))
        s = bundle.models["mapping_network"].apply(
            {"params": p.mapping_network}, zs.reshape(r * b, -1), yy
        )
        return _gen_multi(p, xs, s)

    @jax.jit
    def gen_ref_multi(p, xs, xr, yr):
        """xr: (R, B, H, W, 3) refs; yr: (B,) -> (R, B, H, W, 3)."""
        r, b = xr.shape[0], xr.shape[1]
        s = bundle.models["style_encoder"].apply(
            {"params": p.style_encoder},
            xr.reshape(r * b, *xr.shape[2:]),
            jnp.tile(yr, (r,)),
        )
        return _gen_multi(p, xs, s)

    rng = np.random.default_rng(seed)
    results: dict[str, float] = {}
    # Fakes accumulate PER TASK (src->trg) for per-task FID, exactly as
    # the reference's calculate_fid_for_all_tasks (eval.py:123-148).
    fake_sets: dict[str, list[np.ndarray]] = {}

    for trg_idx, trg in enumerate(domains):
        for src in domains:
            if src == trg:
                continue
            task = f"{src}2{trg}"
            lpips_vals = []
            id_vals = []
            src_root = os.path.join(val_root, src)
            trg_files = list_images(os.path.join(val_root, trg))
            n_seen = 0
            for batch in eval_batches(src_root, img_size, batch_size):
                if max_images is not None and n_seen >= max_images:
                    break
                n_seen += batch.shape[0]
                x_src = jnp.asarray(batch)
                y = jnp.full((batch.shape[0],), trg_idx, jnp.int32)
                if mode == "latent":
                    zs = jnp.asarray(
                        rng.standard_normal(
                            (num_outs, batch.shape[0], cfg.model.latent_dim)
                        ).astype(np.float32)
                    )
                    fakes = gen_lat_multi(params, x_src, zs, y)
                else:
                    from ..data.face import _load_rgb, _resize

                    ref_paths = rng.choice(trg_files, num_outs * batch.shape[0])
                    xr = np.stack(
                        [
                            _resize(_load_rgb(p), (img_size, img_size)).astype(
                                np.float32
                            )
                            / 255.0
                            for p in ref_paths
                        ]
                    ).reshape(num_outs, batch.shape[0], img_size, img_size, 3)
                    fakes = gen_ref_multi(params, x_src, jnp.asarray(xr), y)
                # Mean pairwise LPIPS among the generated outputs — one
                # jitted call for all C(num_outs, 2) pairs.
                lpips_vals.extend(np.asarray(lpips_pairs_fn(fakes)).tolist())
                # Identity leakage: cosine(src, anonymized) — lower is
                # better de-identification (BASELINE parity metric).
                id_vals.extend(np.asarray(id_cos_multi(x_src, fakes)).tolist())
                outs_np = np.asarray(fakes)
                fake_sets.setdefault((src, trg), []).extend(outs_np)
                if out_dir:
                    os.makedirs(os.path.join(out_dir, task), exist_ok=True)
                    from PIL import Image

                    # ALL R styles per source, reference file-per-output
                    # layout '%.4i_%.2i.png' (imgidx, styleidx), both
                    # 1-based (eval.py:85-93).
                    base = n_seen - batch.shape[0]
                    arr = np.clip(outs_np * 255, 0, 255).astype(np.uint8)
                    for j in range(arr.shape[0]):
                        for k in range(arr.shape[1]):
                            Image.fromarray(arr[j, k]).save(
                                os.path.join(
                                    out_dir, task,
                                    "%.4i_%.2i.png" % (base + k + 1, j + 1),
                                )
                            )
            results[f"LPIPS_{mode}/{task}"] = float(np.mean(lpips_vals)) if lpips_vals else 0.0
            results[f"FaceIDcos_{mode}/{task}"] = float(np.mean(id_vals)) if id_vals else 0.0

    # FID real-vs-fake per (src -> trg) TASK, exactly as the reference's
    # calculate_fid_for_all_tasks (eval.py:123-148).  The pooled
    # per-target-domain variant rides along as an extra; with 2 domains
    # (one source per target) the two are identical.
    from ..data.face import IMAGENET_MEAN, IMAGENET_STD

    inception = InceptionV3()
    if inception_params is None:
        inception_params = inception.init(
            jax.random.key(1), jnp.zeros((1, 299, 299, 3))
        )

    def _fake_acts(fakes):
        fake_299 = [
            (
                np.asarray(
                    jax.image.resize(
                        jnp.asarray(f), (f.shape[0], 299, 299, 3), "bilinear"
                    )
                )
                - IMAGENET_MEAN
            )
            / IMAGENET_STD
            for f in fakes
        ]
        return collect_activations(inception, inception_params, fake_299)

    real_acts: dict[str, np.ndarray] = {}
    domain_fake_acts: dict[str, list[np.ndarray]] = {}
    for (src, trg), fakes in sorted(fake_sets.items()):
        if not fakes:
            continue
        if trg not in real_acts:
            real = eval_batches(
                os.path.join(val_root, trg), img_size, batch_size,
                imagenet_normalize=True,
            )
            real_acts[trg] = collect_activations(inception, inception_params, real)
        acts_fake = _fake_acts(fakes)
        results[f"FID_{mode}/{src}2{trg}"] = fid_from_activations(
            real_acts[trg], acts_fake
        )
        domain_fake_acts.setdefault(trg, []).append(acts_fake)
    for trg, acts in domain_fake_acts.items():
        if len(acts) > 1:  # pooled == per-task when there is one source
            results[f"FID_domain_{mode}/{trg}"] = fid_from_activations(
                real_acts[trg], np.concatenate(acts)
            )

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"metrics_{mode}_{step}.json"), "w") as f:
            json.dump(results, f, indent=2)
    return results
