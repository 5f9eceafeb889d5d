"""Roofline audit of the caption trainer/inference (BASELINE config 4).

Splits the train step into nested prefixes and times each as its own
chained-dispatch jit, then pairs the times with XLA ``cost_analysis``
FLOPs/bytes so each stage gets an achieved-rate vs roofline verdict
(practical MXU ceiling ~166 TF/s bf16, HBM ~819 GB/s — PERF.md r2e).

Stages:
  lens        : 896^2 wave-optics PSF + 512^2 padded FFT conv + downsample
  encoder     : ResNet-101 forward (256^2 -> 8^2 x 2048)
  decoder     : teacher-forced LSTM scan + attention (T steps)
  loss_fwd    : full forward loss soup
  train_step  : fwd + bwd + 3 Adams (the headline 214 img/s number)

Usage: python scripts/audit_caption.py   (env: PPVISION_CAP_BATCH)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ppvision_tpu.config import CaptionConfig
from ppvision_tpu.optics.lens import (
    LensSpec, init_lens_params, lens_apply, make_lens_constants,
)
from ppvision_tpu.train.caption import init_caption, make_caption_train_step

K = int(os.environ.get("PPVISION_BENCH_CHAIN", "8"))
PEAK_TF = 166e12
PEAK_GB = 819e9
DISPATCH_S = 7.5e-3 / K  # amortized fixed tunnel dispatch per call


def chain_time(fn, *args):
    out = fn(*args)
    sync = jax.jit(
        lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32))
    )
    float(sync(out))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*args)
        float(sync(out))
        ts.append((time.perf_counter() - t0) / K)
    return min(ts)


def cost(jfn, *args):
    c = jfn.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c.get("flops", 0.0), c.get("bytes accessed", 0.0)


def main():
    b = int(os.environ.get("PPVISION_CAP_BATCH", "64"))
    t = 20
    vocab = 9490
    cfg = CaptionConfig(batch_size=b)
    spec = LensSpec()
    consts = make_lens_constants(spec)
    lens_params = init_lens_params(spec)
    encoder, decoder, state = init_caption(
        jax.random.key(0), cfg, vocab, spec, lens_params, dtype=jnp.bfloat16
    )
    images = jax.random.uniform(jax.random.key(1), (b, 256, 256, 3))
    caps = jax.random.randint(jax.random.key(2), (b, t + 2), 0, vocab)
    lens_len = jnp.full((b,), t + 2, jnp.int32)
    batch = {"images": images, "captions": caps, "caption_lengths": lens_len}

    # Stage jits (params as ARGS — closed-over params 413 the tunnel).
    def f_lens(cam, imgs):
        return lens_apply(cam, consts, spec, imgs, mask_mode=cfg.mask_mode).sensor

    def f_enc(cam, enc_vars, imgs):
        return encoder.apply(enc_vars, f_lens(cam, imgs), train=False)

    def f_dec(cam, enc_vars, dec_params, imgs):
        enc_out = f_enc(cam, enc_vars, imgs)
        return decoder.apply(
            {"params": dec_params}, enc_out, caps, lens_len, deterministic=True
        ).predictions

    step = make_caption_train_step(encoder, decoder, cfg, spec, consts)

    stages = [
        ("lens", jax.jit(f_lens), (state.camera, images)),
        ("lens+encoder", jax.jit(f_enc), (state.camera, dict(state.encoder), images)),
        ("lens+enc+decoder", jax.jit(f_dec),
         (state.camera, dict(state.encoder), state.decoder, images)),
    ]
    rows = []
    for name, jfn, args in stages:
        dt = max(chain_time(jfn, *args) - DISPATCH_S, 1e-9)
        fl, by = cost(jfn, *args)
        rows.append((name, dt, fl, by))

    # Full train step.
    jstep = jax.jit(step)
    st, _ = jstep(state, batch, jax.random.key(3))

    def call(s):
        s2, m = jstep(s, batch, jax.random.key(4))
        return s2.decoder

    dt = max(chain_time(call, st) - DISPATCH_S, 1e-9)
    fl, by = cost(jstep, st, batch, jax.random.key(4))
    rows.append(("train_step", dt, fl, by))

    prev = (0.0, 0.0, 0.0)
    out = []
    for name, dt, fl, by in rows:
        d_dt, d_fl, d_by = dt - prev[0], fl - prev[1], by - prev[2]
        if name == "train_step":
            # bwd+opt delta vs the forward-only prefix chain
            pass
        out.append(dict(
            stage=name, ms=round(dt * 1e3, 2), delta_ms=round(d_dt * 1e3, 2),
            gflops=round(fl / 1e9, 1), delta_gflops=round(d_fl / 1e9, 1),
            gb=round(by / 1e9, 2), delta_gb=round(d_by / 1e9, 2),
            tf_s=round(d_fl / max(d_dt, 1e-9) / 1e12, 1),
            gb_s=round(d_by / max(d_dt, 1e-9) / 1e9, 0),
            pct_mxu=round(100 * d_fl / max(d_dt, 1e-9) / PEAK_TF, 1),
            pct_hbm=round(100 * d_by / max(d_dt, 1e-9) / PEAK_GB, 1),
        ))
        prev = (dt, fl, by)
    for r in out:
        print(json.dumps(r))
    print(json.dumps(dict(
        img_s_train=round(b / rows[-1][1], 1), batch=b,
        note="delta_* = this stage minus previous prefix; train_step delta "
             "= bwd + optimizers",
    )))


if __name__ == "__main__":
    main()
