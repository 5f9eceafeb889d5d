"""Trace the RAFT forward on the live backend: device-time breakdown of
the refine ``while`` body vs the encoders/pyramid, op aggregates by
shape (same attribution method as trace_bench.py).

Usage: python scripts/trace_raft.py  (env: PPVISION_RAFT_BATCH)
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

TRACE_DIR = os.environ.get("PPVISION_TRACE_DIR", "/tmp/rafttrace")
STEPS = 3


def run_and_trace():
    from ppvision_tpu.models.raft import RAFT

    b = int(os.environ.get("PPVISION_RAFT_BATCH", "8"))
    model = RAFT(iters=20)
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    im1 = jax.random.uniform(k1, (b, 256, 256, 3)) * 255.0
    im2 = jax.random.uniform(k2, (b, 256, 256, 3)) * 255.0
    params = model.init(k3, im1[:1], im2[:1])["params"]
    fn = jax.jit(
        lambda p, a, c: jnp.sum(
            model.apply({"params": p}, a, c)[-1].astype(jnp.float32)
        )
    )
    float(fn(params, im1, im2))
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(STEPS):
        float(fn(params, im1, im2))
    jax.profiler.stop_trace()


def report():
    paths = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    evs = [
        e for e in trace["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3
    ]
    whiles = sorted(
        (e for e in evs if e["name"].startswith("while")), key=lambda e: -e["dur"]
    )[:STEPS]
    spans = [(w["ts"], w["ts"] + w["dur"]) for w in whiles]
    print(
        f"refine while total: {sum(w['dur'] for w in whiles)/STEPS/1e3:.1f}"
        f" ms/step ({len(whiles)} spans)"
    )

    def bucket(events, title, top=20):
        agg = collections.Counter()
        bags = collections.Counter()
        cnt = collections.Counter()
        for e in events:
            a = e.get("args") or {}
            ln = a.get("long_name", "")
            m = re.match(r"%\S+ = (\S+?)\[([\d,]*)\]", ln)
            shape = f"{m.group(1)}[{m.group(2)}]" if m else "?"
            key = f"{e['name'].split('.')[0]:34s} {shape}"
            agg[key] += e["dur"] / 1e3
            bags[key] += int(a.get("bytes_accessed", 0) or 0)
            cnt[key] += 1
        print(f"\n{title}: {sum(agg.values())/STEPS:.1f} ms/step")
        for k, v in agg.most_common(top):
            print(
                f"{v/STEPS:8.2f} ms {bags[k]/STEPS/1e9:7.2f} GB"
                f"  n={cnt[k]//STEPS:4d}  {k}"
            )

    inside = lambda e: any(s <= e["ts"] < t for s, t in spans)
    body = [e for e in evs if not e["name"].startswith("while") and inside(e)]
    front = [e for e in evs if not e["name"].startswith("while") and not inside(e)]
    bucket(front, "encoders + corr pyramid + upsample")
    bucket(body, "refine while body (20 iters)")


def main():
    if os.environ.get("PPVISION_TRACE_PARSE_ONLY") != "1":
        run_and_trace()
    report()


if __name__ == "__main__":
    main()
