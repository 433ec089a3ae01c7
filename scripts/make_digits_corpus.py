"""Export scikit-learn's bundled handwritten-digits corpus as an
MNIST-layout IDX tree, for the REAL-DATA evidence row.

This image is zero-egress, so the reference's download-served corpora
(torchvision MNIST, medmnist PathMNIST — mapping/data/dataset.py:12-285)
cannot be fetched. scikit-learn ships ``load_digits`` INSIDE the package:
1,797 genuine scanned handwritten digits (the UCI "Optical Recognition of
Handwritten Digits" set, NIST-derived; 8x8, 17 gray levels, 10 classes).
Exporting it in the exact ``{root}/MNIST/raw/*-ubyte`` wire format drives
the zero-egress ingestion path (ladine_tpu/data/downloads.py) with real
data end-to-end: read_idx -> grayscale->3ch -> resize -> the three-stage
pipeline (round-3 verdict Next #6).

Split: the corpus's canonical halves are not stratified; we use a fixed
80/20 class-stratified split (seeded), train -> ``train-*``, test ->
``t10k-*``. The in-framework 'valid' split is then the standard 90/10
carve of train (downloads.py).

Usage: python scripts/make_digits_corpus.py --out /tmp/digits_root
"""

from __future__ import annotations

import argparse
import os
import struct

import numpy as np


def write_idx_images(path: str, arr: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000803))
        f.write(struct.pack(">III", *arr.shape))
        f.write(arr.astype(np.uint8).tobytes())


def write_idx_labels(path: str, arr: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000801))
        f.write(struct.pack(">I", arr.shape[0]))
        f.write(arr.astype(np.uint8).tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--test_frac", type=float, default=0.2)
    args = ap.parse_args()
    from sklearn.datasets import load_digits

    d = load_digits()
    # 0..16 gray levels -> full 0..255 uint8 range (the idx convention)
    images = np.round(d.images / 16.0 * 255.0).astype(np.uint8)
    labels = d.target.astype(np.uint8)

    rng = np.random.default_rng(args.seed)
    test_idx = []
    for c in range(10):
        members = np.flatnonzero(labels == c)
        members = members[rng.permutation(len(members))]
        test_idx.extend(members[: max(1, int(len(members) * args.test_frac))])
    test_mask = np.zeros(len(labels), bool)
    test_mask[np.asarray(test_idx)] = True

    raw = os.path.join(args.out, "MNIST", "raw")
    os.makedirs(raw, exist_ok=True)
    write_idx_images(os.path.join(raw, "train-images-idx3-ubyte"), images[~test_mask])
    write_idx_labels(os.path.join(raw, "train-labels-idx1-ubyte"), labels[~test_mask])
    write_idx_images(os.path.join(raw, "t10k-images-idx3-ubyte"), images[test_mask])
    write_idx_labels(os.path.join(raw, "t10k-labels-idx1-ubyte"), labels[test_mask])
    print(f"wrote {args.out}/MNIST/raw: train={int((~test_mask).sum())} "
          f"test={int(test_mask.sum())} (8x8, 10 classes, real scanned digits)")


if __name__ == "__main__":
    main()
