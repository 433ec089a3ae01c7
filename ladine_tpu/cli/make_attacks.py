"""Generate pre-computed adversarial test sets.

The reference EVALUATES on ``Test_attacks_{name}/`` ImageFolder trees
(data_loader_attacks, chest_x_ray_dataset.py:196-227) but the tool that
creates them lives in the external SEViT repo. This closes the loop: run the
white-box attacks against the (trained) ViT over the clean test split and
write the adversarial images back as an ImageFolder, byte-compatible with
the reference's consumption path.

    python -m ladine_tpu.cli.make_attacks --dataroot /data/chestxray \
        --attack_name PGD --epsilon 0.03 --guidance_ckpt ./models/vit_ChestXRay

Output: {dataroot}/Test_attacks_{name}/{class}/{i}.png
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="generate Test_attacks_{name} datasets")
    p.add_argument("--dataset", type=str, default="ChestXRay")
    p.add_argument("--dataroot", type=str, required=True)
    p.add_argument("--preprocess", type=str, default="grayscaled")
    p.add_argument("--attack_name", type=str, required=True,
                   choices=["FGSM", "PGD", "BIM", "LinfBIM", "L2PGD", "CW", "AUTOPGD"])
    p.add_argument("--epsilon", type=float, default=0.03)
    p.add_argument("--guidance_ckpt", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default=None,
                   help="output root (default: {dataroot}/Test_attacks_{name})")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--demo", action="store_true",
                   help="tiny ViT geometry (for smoke runs on small images)")
    p.add_argument("--cpu", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from ladine_tpu.attacks import make_attack
    from ladine_tpu.data import open_dataset
    from ladine_tpu.models import ViT
    from ladine_tpu.utils import load_checkpoint, setup_logging

    logger = setup_logging(None)
    if not args.guidance_ckpt and not args.demo:
        build_parser().error(
            "--guidance_ckpt is required (attacking a randomly initialized "
            "ViT produces meaningless adversarial datasets); use --demo for smoke runs"
        )
    img = args.image_size
    if args.demo:
        vit = ViT(num_classes=2, img_size=img, patch_size=max(img // 2, 8),
                  embed_dim=16, depth=2, num_heads=2)
    else:
        vit = ViT(num_classes=2, img_size=img)
    vparams = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)))["params"]
    if args.guidance_ckpt:
        tree, _ = load_checkpoint(args.guidance_ckpt, target={"params": vparams})
        vparams = tree["params"]
        logger.info(f"attacking ViT from {args.guidance_ckpt}")

    # attacks operate in [0,1] pixel space (bounds + the saved images), but a
    # ViT trained with 'standardized' preprocessing must SEE normalized
    # inputs — fold the normalization into the attacked model
    if args.preprocess == "standardized":
        from ladine_tpu.data import NORM_STATS, base_dataset

        mean, std = NORM_STATS[base_dataset(args.dataset)]
        mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)

        def logits_fn(x):
            return vit.apply({"params": vparams}, (x - mean_j) / std_j)

    else:

        def logits_fn(x):
            return vit.apply({"params": vparams}, x)

    attack = jax.jit(make_attack(args.attack_name, args.epsilon, logits_fn))

    # the image pipeline stays raw/[0,1] like the reference's Test_attacks
    # trees (unnormalized images; normalization happens inside logits_fn)
    # shared name router (data/router.py): MNIST-family corpora get their
    # zero-egress idx ingestion here too, so Test_attacks_* trees can be
    # generated for every dataset the pipeline accepts
    ds = open_dataset(args.dataset, args.dataroot, "test",
                      "raw" if args.preprocess == "standardized"
                      else args.preprocess, image_size=(img, img))
    out_root = args.out or os.path.join(args.dataroot, f"Test_attacks_{args.attack_name}")

    counts = {str(c): 0 for c in ds.classes}
    n_success = n_total = 0
    key = jax.random.PRNGKey(args.seed)
    for images, labels in ds.batches(args.batch_size):
        key, sub = jax.random.split(key)
        adv, success = attack(jnp.asarray(images), jnp.asarray(labels), sub)
        adv = np.asarray(jnp.clip(adv, 0.0, 1.0))
        n_success += int(np.asarray(success).sum())
        n_total += len(labels)
        for i, lab in enumerate(np.asarray(labels)):
            # ImageFolder datasets name classes by directory; ArrayDataset
            # (MNIST-family) classes are ints — both become directory names
            cls = str(ds.classes[int(lab)])
            d = os.path.join(out_root, cls)
            os.makedirs(d, exist_ok=True)
            arr = (adv[i] * 255.0).round().astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{counts[cls]}.png"))
            counts[cls] += 1
    logger.info(
        f"wrote {n_total} adversarial images to {out_root} "
        f"({args.attack_name} eps={args.epsilon}, fooled {n_success}/{n_total})"
    )
    print(json.dumps({"mode": "make_attacks", "attack": args.attack_name,
                      "out": out_root, "images": n_total,
                      "attack_success_rate": round(n_success / max(n_total, 1), 4)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
