"""Sweep candidate XLA_FLAGS combinations over bench.py (subprocess per
combo — XLA flags are process-global) and report img/s per combo.

Usage: python scripts/sweep_flags.py  [--src 256]
Each run inherits the current env plus the combo's flags appended to
XLA_FLAGS.  Combos that crash or regress are reported, not fatal.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMBOS = {
    "baseline": "",
    "vmem128": "--xla_tpu_scoped_vmem_limit_kib=131072",
    "vmem96": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "flash": "--xla_tpu_enable_flash_attention=false",
}


def run(extra_flags: str, src: str) -> dict | None:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + extra_flags).strip()
    env["PPVISION_BENCH_SRC"] = src
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=1200, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    print(out.stdout[-500:], out.stderr[-500:], file=sys.stderr)
    return None


def main() -> None:
    src = "256"
    if "--src" in sys.argv:
        src = sys.argv[sys.argv.index("--src") + 1]
    results = {}
    for name, flags in COMBOS.items():
        r = run(flags, src)
        results[name] = None if r is None else r["value"]
        print(f"{name:>10}: {results[name]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
