"""Generate a synthetic 2-class 224x224 ImageFolder in the reference's
ChestXRay directory layout (training/validation/testing x NORMAL/
TUBERCULOSIS; dataset_helper/chest_x_ray_dataset.py:9-60).

The image lacks the real ChestXRay/ISIC data (external downloads), so the
full-pipeline evidence run (RESULTS.md) uses this stand-in: brightness-
matched classes separated by TEXTURE, not intensity — class NORMAL gets
soft Gaussian blobs, class TUBERCULOSIS gets localized oriented ridge
patches — so the classifier must learn shape/frequency structure and the
task produces non-trivial calibration behavior.

Usage: python scripts/make_synth_medical.py --out /tmp/synth_ds [--n 250]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _blobs(rng, img, n):
    yy, xx = np.mgrid[0:224, 0:224]
    for _ in range(n):
        cy, cx = rng.uniform(30, 194, 2)
        sig = rng.uniform(12, 30)
        amp = rng.uniform(0.15, 0.3)
        img += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2))
    return img


def _ridges(rng, img, n):
    yy, xx = np.mgrid[0:224, 0:224]
    for _ in range(n):
        cy, cx = rng.uniform(30, 194, 2)
        sig = rng.uniform(12, 30)
        theta = rng.uniform(0, np.pi)
        freq = rng.uniform(0.25, 0.45)  # high-frequency stripes
        amp = rng.uniform(0.15, 0.3)
        u = (xx - cx) * np.cos(theta) + (yy - cy) * np.sin(theta)
        mask = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2))
        img += amp * mask * np.sin(2 * np.pi * freq * u)
    return img


def make_image(cls: int, rng) -> np.ndarray:
    img = rng.normal(0.45, 0.06, (224, 224))
    n = rng.integers(3, 7)
    img = _blobs(rng, img, n) if cls == 0 else _ridges(rng, img, n)
    # brightness-match the classes so intensity alone carries no signal
    img = img - img.mean() + 0.5
    img = np.clip(img, 0.0, 1.0)
    return (np.repeat(img[..., None], 3, -1) * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--n", type=int, default=250, help="train images per class")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    from PIL import Image

    rng = np.random.default_rng(args.seed)
    counts = {"training": args.n, "validation": args.n * 3 // 10, "testing": args.n * 3 // 10}
    for split, n in counts.items():
        for cls_idx, cls in enumerate(["NORMAL", "TUBERCULOSIS"]):
            d = os.path.join(args.out, split, cls)
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                Image.fromarray(make_image(cls_idx, rng)).save(
                    os.path.join(d, f"img_{i:04d}.png")
                )
    print(f"wrote {args.out}: " + ", ".join(f"{k}={2 * v}" for k, v in counts.items()))


if __name__ == "__main__":
    main()
