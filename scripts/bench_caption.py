"""Captioning throughput (BASELINE.json config 4): camera + ResNet-101
encoder + attention-LSTM decoder.

Two numbers, chained-dispatch timing (see bench.py):

- train: full jitted train step (lens -> encoder -> teacher-forced
  decode -> 3-optimizer update) at the reference recipe (batch 64,
  256^2, Image_Caption/train.py:17-60).
- infer: lens -> encoder -> beam-5 caption decode (eval_total.py
  pipeline, k=5, <=50 steps).

Prints one JSON line per mode. Env: PPVISION_CAP_BATCH, PPVISION_CAP_T
(teacher-forced caption length, default 20), PPVISION_CAP_VOCAB.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ppvision_tpu.config import CaptionConfig
from ppvision_tpu.models.captioner import beam_search
from ppvision_tpu.optics.lens import (
    LensSpec, init_lens_params, lens_apply, make_lens_constants,
)
from ppvision_tpu.train.caption import init_caption, make_caption_train_step

K = int(os.environ.get("PPVISION_BENCH_CHAIN", "8"))


def chain_time(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: jax.block_until_ready(a), out
    )
    sync = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)))
    float(sync(out))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = fn(*args)
        float(sync(out))
        ts.append((time.perf_counter() - t0) / K)
    return min(ts)


def main():
    b = int(os.environ.get("PPVISION_CAP_BATCH", "64"))
    t = int(os.environ.get("PPVISION_CAP_T", "20"))
    vocab = int(os.environ.get("PPVISION_CAP_VOCAB", "9490"))

    cfg = CaptionConfig(batch_size=b)
    spec = LensSpec()
    consts = make_lens_constants(spec)
    lens_params = init_lens_params(spec)
    encoder, decoder, state = init_caption(
        jax.random.key(0), cfg, vocab, spec, lens_params, dtype=jnp.bfloat16
    )

    images = jax.random.uniform(jax.random.key(1), (b, 256, 256, 3))
    caps = jax.random.randint(jax.random.key(2), (b, t + 2), 0, vocab)
    lens_ = jnp.full((b,), t + 2, jnp.int32)
    batch = {"images": images, "captions": caps, "caption_lengths": lens_}

    # --- train step ---
    step = make_caption_train_step(encoder, decoder, cfg, spec, consts)
    jstep = jax.jit(step)
    st = state
    st, _ = jstep(st, batch, jax.random.key(3))  # compile

    def train_call(s):
        s2, m = jstep(s, batch, jax.random.key(4))
        return s2.decoder

    dt = chain_time(train_call, st)
    print(json.dumps({
        "metric": "caption train img/s/chip (camera+ResNet101+LSTM, 256^2, teacher-forced)",
        "value": round(b / dt, 1), "unit": "img/s", "sec_per_iter": round(dt, 4),
    }))

    # --- inference: lens -> encoder -> beam-5 (vmapped per image).
    # Params enter as jit ARGUMENTS: closed-over params become embedded
    # HLO constants and blow the tunnel's compile-request size limit
    # (HTTP 413) at ResNet-101 scale.
    def infer(s, imgs):
        res = lens_apply(s.camera, consts, spec, imgs, mask_mode=cfg.mask_mode)
        enc = encoder.apply(s.encoder, res.sensor, train=False)

        def one(e):
            toks, score = beam_search(
                decoder, s.decoder, e[None], start_token=1, end_token=2,
                beam_size=5, max_steps=50,
            )
            return toks

        return jax.vmap(one)(enc)

    jinfer = jax.jit(infer)
    toks = jinfer(st, images)

    def infer_call(imgs):
        return jinfer(st, imgs)

    dt = chain_time(infer_call, images)
    print(json.dumps({
        "metric": "caption infer img/s/chip (camera+ResNet101+beam5)",
        "value": round(b / dt, 1), "unit": "img/s", "sec_per_iter": round(dt, 4),
    }))


if __name__ == "__main__":
    main()
