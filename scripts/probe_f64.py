"""Dev probe for the f64 free-running golden: run the torch reference
once, cache it, then run the JAX side and print error distributions.

Usage:  python -u scripts/probe_f64.py [torch|jax|both]
Cache:  /tmp/f64_probe.pkl
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("PPVISION_DYNAMICS_PROBE", "1")

import jax

jax.config.update("jax_platforms", "cpu")

CACHE = "/tmp/f64_probe.pkl"


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    from tests.test_train_dynamics_golden import _make_batches, _run_reference
    from tests.test_train_free_running_f64 import (
        B, FSTEPS, LAT, test_gan_free_running_f64_matches_reference,
    )

    if mode in ("torch", "both") or not os.path.exists(CACHE):
        t0 = time.time()
        batches = _make_batches(3, B, LAT)
        out = _run_reference(batches, dbl=True, steps=FSTEPS)
        with open(CACHE, "wb") as f:
            pickle.dump((batches, out), f)
        print(f"[torch reference done in {time.time() - t0:.0f}s]", flush=True)
    if mode in ("jax", "both"):
        # monkeypatch the reference runner to serve from cache
        import tests.test_train_free_running_f64 as tt

        with open(CACHE, "rb") as f:
            batches, out = pickle.load(f)
        tt._make_batches = lambda *a, **k: batches
        tt._run_reference = lambda *a, **k: out
        t0 = time.time()
        test_gan_free_running_f64_matches_reference()
        print(f"[jax side done in {time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
