"""Offline Cityscapes preprocessing: downscale 2048x1024 -> 1024x512 JPEG q98.

Counterpart of reference data_preprocessing/prepare_cityscapes.py:9-98. The
reference parallelizes with Ray remote workers; here a stdlib process pool
does the same job (no cluster dependency), including the verify/repair pass
for corrupted JPEGs.

Usage:
  python -m improving_segmentation_with_selfsupervised_depth_tpu.data.prepare_cityscapes \
      --in-dir .../leftImg8bit_sequence --out-dir .../leftImg8bit_sequence_small
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Tuple

from PIL import Image

from ..utils import recursive_glob

_ANTIALIAS = getattr(Image, "LANCZOS", getattr(Image, "ANTIALIAS", 1))


def process_image(args: Tuple[str, str, str, int, float]) -> bool:
    src, in_dir, out_dir, quality, scale = args
    dst = src.replace(in_dir, out_dir)
    dst = os.path.splitext(dst)[0] + ".jpg"
    if os.path.isfile(dst):
        return True
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with Image.open(src) as img:
        img = img.convert("RGB")
        img = img.resize((int(img.width * scale), int(img.height * scale)), _ANTIALIAS)
        img.save(dst, quality=quality)
    return True


def verify_image(path: str) -> bool:
    try:
        with Image.open(path) as img:
            img.load()
        return True
    except Exception:
        return False


def process_images(in_dir: str, out_dir: str, quality: int = 98, scale: float = 0.5,
                   workers: int = os.cpu_count() or 4, batch: int = 100) -> None:
    files = sorted(recursive_glob(in_dir, suffix=".png"))
    jobs = [(f, in_dir, out_dir, quality, scale) for f in files]
    with ProcessPoolExecutor(max_workers=workers) as pool:
        for i in range(0, len(jobs), batch):
            list(pool.map(process_image, jobs[i : i + batch]))
            print(f"processed {min(i + batch, len(jobs))}/{len(jobs)}")


def repair(in_dir: str, out_dir: str, quality: int = 98, scale: float = 0.5,
           workers: int = os.cpu_count() or 4) -> List[str]:
    """Verify outputs and re-generate corrupted ones (reference
    prepare_cityscapes.py:40-54, 83-96)."""
    outputs = sorted(recursive_glob(out_dir, suffix=".jpg"))
    with ProcessPoolExecutor(max_workers=workers) as pool:
        ok = list(pool.map(verify_image, outputs))
    broken = [f for f, good in zip(outputs, ok) if not good]
    for b in broken:
        os.remove(b)
        src = os.path.splitext(b.replace(out_dir, in_dir))[0] + ".png"
        process_image((src, in_dir, out_dir, quality, scale))
    print(f"repaired {len(broken)} corrupted files")
    return broken


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--in-dir", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--quality", type=int, default=98)
    parser.add_argument("--scale", type=float, default=0.5)
    parser.add_argument("--workers", type=int, default=os.cpu_count() or 4)
    parser.add_argument("--repair", action="store_true")
    args = parser.parse_args(argv)
    process_images(args.in_dir, args.out_dir, args.quality, args.scale, args.workers)
    if args.repair:
        repair(args.in_dir, args.out_dir, args.quality, args.scale, args.workers)


if __name__ == "__main__":
    main()
