"""Trace the de-id bench step on the live backend and print a device-time
breakdown: front-end (camera+FAN+encode, outside the style scan) vs the
decode ``while`` body, with per-shape op aggregates and bytes accessed.

Ground truth for where the step's device milliseconds go (naive timing on
the tunnel misleads — see PERF.md).  The axon backend's trace events carry
no ``op_name`` metadata; attribution uses the HLO ``long_name`` text and
the while-loop's time span instead.  Usage:
    python scripts/trace_bench.py
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

TRACE_DIR = os.environ.get("PPVISION_TRACE_DIR", "/tmp/benchtrace_cur")
STEPS = 3


def run_and_trace():
    from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
    from ppvision_tpu.deid import build_deid, deid_multi_style

    cfg = FaceDeIdConfig(model=ModelConfig(img_size=128), camera=CameraConfig(n=128))
    bundle = build_deid(jax.random.key(0), cfg)
    b = int(os.environ.get("PPVISION_BENCH_SRC", "128"))
    r = int(os.environ.get("PPVISION_BENCH_OUTS", "10"))
    x_src = jax.random.uniform(jax.random.key(1), (b, 128, 128, 3))
    x_ref = jax.random.uniform(jax.random.key(2), (r, 128, 128, 3))
    y_ref = jnp.zeros((r,), dtype=jnp.int32)

    step = jax.jit(
        lambda p, xs, xr, yr: jnp.sum(deid_multi_style(bundle, p, xs, xr, yr))
    )
    p = bundle.params
    float(step(p, x_src, x_ref, y_ref))  # compile
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(STEPS):
        float(step(p, x_src, x_ref, y_ref))
    jax.profiler.stop_trace()


def report():
    paths = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    # pid 3 = /device:TPU:0; tid 2 = XLA Modules (whole program), tid 3 = XLA Ops.
    evs = [
        e
        for e in trace["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3
    ]
    mods = [
        e
        for e in trace["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 2
    ]
    if mods:
        print(f"per-step module time: {sum(e['dur'] for e in mods)/len(mods)/1e3:.1f} ms")
    whiles = sorted(
        (e for e in evs if e["name"].startswith("while")), key=lambda e: -e["dur"]
    )[:STEPS]
    spans = [(w["ts"], w["ts"] + w["dur"]) for w in whiles]

    def bucket(events, title):
        agg = collections.Counter()
        bags = collections.Counter()
        cnt = collections.Counter()
        for e in events:
            a = e.get("args") or {}
            ln = a.get("long_name", "")
            m = re.match(r"%\S+ = (\S+?)\[([\d,]*)\]", ln)
            shape = f"{m.group(1)}[{m.group(2)}]" if m else "?"
            key = f"{e['name'].split('.')[0]:36s} {shape}"
            agg[key] += e["dur"] / 1e3
            bags[key] += int(a.get("bytes_accessed", 0) or 0)
            cnt[key] += 1
        print(f"\n{title}: {sum(agg.values())/STEPS:.1f} ms/step")
        for k, v in agg.most_common(18):
            print(
                f"{v/STEPS:8.2f} ms {bags[k]/STEPS/1e9:7.2f} GB"
                f"  n={cnt[k]//STEPS:3d}  {k}"
            )

    inside = lambda e: any(s <= e["ts"] < t for s, t in spans)
    body = [e for e in evs if not e["name"].startswith("while") and inside(e)]
    front = [e for e in evs if not e["name"].startswith("while") and not inside(e)]
    bucket(front, "front-end (camera+FAN+encode+style)")
    bucket(body, f"decode while body ({len(whiles)} spans)")


def main():
    if os.environ.get("PPVISION_TRACE_PARSE_ONLY") != "1":
        run_and_trace()
    report()


if __name__ == "__main__":
    main()
