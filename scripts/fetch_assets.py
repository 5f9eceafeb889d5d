"""Fetch the reference's published checkpoint/dataset artifacts.

Python equivalent of the reference's asset fetcher
(``Face-DeId/download.sh:1-64``): same artifact groups, same published
URLs, laid out where this repo's CLIs look for them
(``cli/main.py --checkpoint_dir`` / ``utils/torch_import.py``).  The
torch ``.ckpt/.pth`` files load directly through
``ppvision_tpu.utils.torch_import`` — no conversion step needed.

Usage::

    python scripts/fetch_assets.py --list
    python scripts/fetch_assets.py checkpoints [--dest DIR]
    python scripts/fetch_assets.py celeba-hq-dataset pretrained-models raft-models
"""

from __future__ import annotations

import argparse
import sys
import urllib.request
import zipfile
from pathlib import Path

_SP = (
    "https://correouisedu-my.sharepoint.com/:u:/g/personal/"
    "jhon2208456_correo_uis_edu_co/"
)

# group -> [(relative output path, url, unzip_into or None)]
ASSETS: dict[str, list[tuple[str, str, str | None]]] = {
    "checkpoints": [
        ("checkpoints/000001_nets.ckpt",
         _SP + "EfRBSsN3S9VMsErqEcajUREBdzovhloqday3du4P026OLQ?e=pIeaFe&download=1", None),
        ("checkpoints/000001_nets_ema.ckpt",
         _SP + "EXgRge-famBCi891utD8OEoB0QSMp2j6GsdkYiHAawN7IQ?e=xvebcg&download=1", None),
        ("checkpoints/celeba_lm_mean.npz",
         _SP + "EXl0zY1zM6NFmNXQrCDz54EB5-Z2NjR4qHUze4IJ2rg5Hg?e=3blo8c&download=1", None),
        ("checkpoints/Model_wing.pth",
         _SP + "EZ4QSB0VAIBDm4i9-uOEt1UB8LUbHUS-uGRyPuYlpZycTQ?e=mABZOQ&download=1", None),
        ("checkpoints/wing.ckpt",
         _SP + "EenPLgMgMa1IrDU7o4HeSVMBLWvrUIEvEVLGtT_p96Q-cA?e=4AhnrC&download=1", None),
        ("checkpoints/Wing_LR_16.ckpt",
         _SP + "EYEiwI-tj75PgipYLu_ia30BS22dU_sZS59TKXBsGnSbfg?e=YV2IQk&download=1", None),
    ],
    "celeba-hq-dataset": [
        ("data/celeba_hq.zip",
         "https://www.dropbox.com/s/f7pvjij2xlpff59/celeba_hq.zip?dl=1", "data"),
    ],
    "pretrained-models": [
        ("pretrained_models/Lens/150000_nets.ckpt",
         _SP + "EVq0kTjK3s1Kumfihm8bOYEBi9_Lq7mrYdrCqEyEBYn4DA?e=npeyVv&download=1", None),
        ("pretrained_models/LR/150000_nets.ckpt",
         _SP + "ERVy4RAJ3yNPnfXcZgfxeAgBisIzYD-VAxJ6NJLJNkjZrA?e=MJxUCE&download=1", None),
    ],
    "raft-models": [
        ("RAFT/models/models_raft.zip",
         _SP + "EaLsA1C_g6dKqTXaiDWc3sgBN9PS_r2tDGDmSUb7a4pddw?e=wdIMyw&download=1", "."),
    ],
}


def fetch(group: str, dest: Path, *, skip_existing: bool = True) -> None:
    for rel, url, unzip_into in ASSETS[group]:
        out = dest / rel
        out.parent.mkdir(parents=True, exist_ok=True)
        if skip_existing and out.exists() and unzip_into is None:
            print(f"  {out} exists, skipping")
            continue
        print(f"  {url}\n    -> {out}")
        with urllib.request.urlopen(url) as r, open(out, "wb") as f:
            while chunk := r.read(1 << 20):
                f.write(chunk)
        if unzip_into is not None:
            with zipfile.ZipFile(out) as z:
                z.extractall(dest / unzip_into)
            out.unlink()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("groups", nargs="*", choices=[*ASSETS, []],
                   help="asset groups to fetch")
    p.add_argument("--dest", type=Path, default=Path("."),
                   help="repo root to lay assets under (default: cwd)")
    p.add_argument("--list", action="store_true", help="list assets and exit")
    args = p.parse_args(argv)
    if args.list or not args.groups:
        for g, items in ASSETS.items():
            print(g)
            for rel, _, _ in items:
                print(f"  {rel}")
        return 0
    for g in args.groups:
        print(f"[{g}]")
        fetch(g, args.dest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
