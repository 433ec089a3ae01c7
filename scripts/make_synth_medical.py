"""Generate a synthetic 2-class 224x224 ImageFolder in the reference's
ChestXRay directory layout (training/validation/testing x NORMAL/
TUBERCULOSIS; dataset_helper/chest_x_ray_dataset.py:9-60).

The image lacks the real ChestXRay/ISIC data (external downloads), so the
full-pipeline evidence run (RESULTS.md) uses this stand-in. The task is
deliberately NON-SATURATING so the calibration/uncertainty machinery has
something to discriminate (round-2 verdict: a 100%-accuracy task drives the
ECE temperature search into a degenerate corner):

* Every image contains the SAME two feature types — soft Gaussian blobs and
  oriented high-frequency ridge patches — so no single patch gives the class
  away. The class signal is only the MIXTURE RATE: each image draws a ridge
  fraction r from overlapping Beta distributions (NORMAL: r ~ Beta(1.5, 6),
  TUBERCULOSIS: r ~ Beta(6, 1.5)) and populates its n=8 features as ridge
  with probability r, else blob. The ridge COUNT is therefore
  BetaBinomial-distributed with class overlap, giving an analytic
  Bayes-optimal accuracy of ~91.2% (printed at generation time; computed
  from 0.5 * sum_k min(P0(k), P1(k))). A perfect feature-counter cannot
  beat it; a good model lands in the high-80s/low-90s.
* Per-image severity jitter (shared across classes): background noise sigma
  ~ U(0.05, 0.12) and feature amplitude ~ U(0.12, 0.30), so low-SNR images
  are genuinely harder — confidence has something real to track.
* Classes stay brightness-matched (each image recentered to mean 0.5), so
  intensity alone carries no signal.
* Optional --label_noise flips that fraction of TRAINING labels (validation/
  test stay clean) for an extra difficulty knob; default 0.

Usage: python scripts/make_synth_medical.py --out /tmp/synth_ds [--n 250]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# class-conditional ridge-fraction priors; NORMAL ~ Beta(A, B), TB ~ Beta(B, A)
BETA_A, BETA_B = 1.5, 6.0
N_FEATURES = 8


def bayes_accuracy() -> float:
    """Bayes-optimal accuracy of the ridge-count channel (the only class
    signal): 1 - 0.5 * sum_k min(P0(k), P1(k)) over BetaBinomial counts."""
    from scipy.stats import betabinom

    k = np.arange(N_FEATURES + 1)
    p0 = betabinom.pmf(k, N_FEATURES, BETA_A, BETA_B)
    p1 = betabinom.pmf(k, N_FEATURES, BETA_B, BETA_A)
    return float(1.0 - 0.5 * np.minimum(p0, p1).sum())


def _blob(rng, img, amp):
    yy, xx = np.mgrid[0:224, 0:224]
    cy, cx = rng.uniform(30, 194, 2)
    sig = rng.uniform(12, 30)
    img += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2))
    return img


def _ridge(rng, img, amp):
    yy, xx = np.mgrid[0:224, 0:224]
    cy, cx = rng.uniform(30, 194, 2)
    sig = rng.uniform(12, 30)
    theta = rng.uniform(0, np.pi)
    freq = rng.uniform(0.25, 0.45)  # high-frequency stripes
    u = (xx - cx) * np.cos(theta) + (yy - cy) * np.sin(theta)
    mask = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2))
    img += amp * mask * np.sin(2 * np.pi * freq * u)
    return img


def make_image(cls: int, rng) -> np.ndarray:
    # per-image severity jitter, identical distribution for both classes
    noise_sigma = rng.uniform(0.05, 0.12)
    amp = rng.uniform(0.12, 0.30)
    img = rng.normal(0.45, noise_sigma, (224, 224))
    # the ONLY class signal: ridge fraction from overlapping Beta priors
    r = rng.beta(BETA_A, BETA_B) if cls == 0 else rng.beta(BETA_B, BETA_A)
    for _ in range(N_FEATURES):
        img = _ridge(rng, img, amp) if rng.random() < r else _blob(rng, img, amp)
    # brightness-match the classes so intensity alone carries no signal
    img = img - img.mean() + 0.5
    img = np.clip(img, 0.0, 1.0)
    return (np.repeat(img[..., None], 3, -1) * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--n", type=int, default=250, help="train images per class")
    ap.add_argument("--test_n", type=int, default=None,
                    help="test images per class (default n*3//10). The rng "
                         "stream draws training, then validation, then "
                         "testing — so enlarging ONLY the test split keeps "
                         "training/validation byte-identical to a previous "
                         "run with the same seed/n, and trained checkpoints "
                         "stay reusable (round-3 verdict Next #4: n=140 "
                         "rows have +-2.6pt binomial sigma)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--label_noise", type=float, default=0.0,
                    help="fraction of TRAINING labels flipped (extra knob; "
                         "validation/testing always clean)")
    args = ap.parse_args()
    from PIL import Image

    rng = np.random.default_rng(args.seed)
    test_n = args.test_n if args.test_n is not None else args.n * 3 // 10
    counts = {"training": args.n, "validation": args.n * 3 // 10, "testing": test_n}
    for split, n in counts.items():
        for cls_idx, cls in enumerate(["NORMAL", "TUBERCULOSIS"]):
            d = os.path.join(args.out, split, cls)
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                gen_cls = cls_idx
                if split == "training" and rng.random() < args.label_noise:
                    gen_cls = 1 - cls_idx  # image from the other class's prior
                Image.fromarray(make_image(gen_cls, rng)).save(
                    os.path.join(d, f"img_{i:04d}.png")
                )
    print(f"wrote {args.out}: " + ", ".join(f"{k}={2 * v}" for k, v in counts.items())
          + f"; Bayes-optimal accuracy {100 * bayes_accuracy():.2f}%"
          + (f"; train label noise {args.label_noise}" if args.label_noise else ""))


if __name__ == "__main__":
    main()
