"""Stage-1a CLI: fine-tune the ViT backbone.

Mirrors /root/reference/mapping/train_transformer.py:24-172 (AdamW lr 1e-4
wd 0.1, StepLR(10, 0.5), CE, best-val-accuracy checkpoint), data-parallel on
whatever devices are present.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="ladine-tpu ViT fine-tune (stage 1a)")
    p.add_argument("--dataset", type=str, default="ChestXRay")
    p.add_argument("--dataroot", type=str, default=None)
    p.add_argument("--preprocess", type=str, default="grayscaled")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=30)
    p.add_argument("--eval_batch_size", type=int, default=70)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.1)
    p.add_argument("--step_size", type=int, default=10)
    p.add_argument("--gamma", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--model_arch", type=str, default="vit",
                   choices=["vit", "resnet18", "resnet50", "efficientnetv2",
                            "deit", "deit_distilled", "convit"],
                   help="backbone family — all six reference choices "
                        "(train_transformer.py:59-84; the reference loaded "
                        "efficientnetv2_l/deit_base/convit_base from local "
                        "pickles, here they are native Flax modules)")
    p.add_argument("--effnet_variant", type=str, default="l",
                   choices=["s", "m", "l"],
                   help="EfficientNetV2 size (reference used efficientnetv2_l)")
    p.add_argument("--out", type=str, default="./models")
    # backbone geometry (reference: timm ViT-B/16 fixed; configurable here so
    # the stage-1 -> stage-3 handoff can run at any model scale)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--embed_dim", type=int, default=768)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--demo", action="store_true")
    p.add_argument("--cpu", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ladine_tpu.data import open_dataset
    from ladine_tpu.models import ViT
    from ladine_tpu.train import (
        create_vit_state,
        make_optimizer,
        make_vit_eval_step,
        make_vit_train_step,
        step_decay,
    )
    from ladine_tpu.utils import save_checkpoint, setup_logging

    logger = setup_logging(args.out)
    if args.demo:
        img, patch, embed, heads, depth = 16, 8, 16, 2, 2
        args.epochs = min(args.epochs, 3)
    else:
        img, patch, embed = args.image_size, args.patch_size, args.embed_dim
        heads, depth = args.num_heads, args.depth

    if args.model_arch == "vit":
        vit = ViT(num_classes=args.num_classes, img_size=img, patch_size=patch,
                  embed_dim=embed, depth=depth, num_heads=heads)
    elif args.model_arch in ("deit", "deit_distilled"):
        from ladine_tpu.models.backbones import DeiT

        vit = DeiT(num_classes=args.num_classes, img_size=img, patch_size=patch,
                   embed_dim=embed, depth=depth, num_heads=heads,
                   distilled=args.model_arch == "deit_distilled")
    elif args.model_arch == "convit":
        from ladine_tpu.models.backbones import ConViT

        # convit_base: 16 heads, GPSA in the first 10 of 12 blocks
        vit = ConViT(num_classes=args.num_classes, img_size=img, patch_size=patch,
                     embed_dim=embed, depth=depth,
                     num_heads=16 if not args.demo else heads,
                     local_layers=min(10, max(depth - 2, 1)))
    elif args.model_arch == "efficientnetv2":
        from ladine_tpu.models.backbones import EfficientNetV2

        vit = EfficientNetV2(num_classes=args.num_classes,
                             variant=args.effnet_variant,
                             width_mult=0.125 if args.demo else 1.0,
                             depth_mult=0.15 if args.demo else 1.0)
    else:
        from ladine_tpu.models.encoders import ResNet

        vit = ResNet(num_classes=args.num_classes, arch=args.model_arch)

    def demo_batches(n=4, b=8, seed=0):
        rng = np.random.default_rng(seed)
        for _ in range(n):
            labels = rng.integers(0, args.num_classes, b)
            # separable synthetic images so the demo can actually learn
            images = (rng.random((b, img, img, 3)) * 0.1 + labels[:, None, None, None] * 0.5)
            yield images.astype(np.float32), labels

    datasets = {}

    def batches(split, bs, shuffle=False, seed=0):
        if args.demo:
            return demo_batches(seed=seed)
        if split not in datasets:
            datasets[split] = open_dataset(args.dataset, args.dataroot, split,
                                           args.preprocess, image_size=(img, img))
        return datasets[split].batches(bs, shuffle=shuffle, seed=seed)

    if args.demo:
        steps_per_epoch = 4
    else:
        datasets["train"] = open_dataset(args.dataset, args.dataroot, "train",
                                         args.preprocess, image_size=(img, img))
        steps_per_epoch = max(1, -(-len(datasets["train"]) // args.batch_size))
    tx = make_optimizer("AdamW",
                        step_decay(args.lr, args.step_size, args.gamma, steps_per_epoch),
                        weight_decay=args.weight_decay, grad_clip=None)
    state = create_vit_state(vit, jax.random.PRNGKey(args.seed), tx, image_size=img)
    train_step = jax.jit(make_vit_train_step(vit, tx))
    eval_step = jax.jit(make_vit_eval_step(vit))

    best_acc = -1.0
    best_params, best_epoch = None, -1
    for epoch in range(args.epochs):
        for images, labels in batches("train", args.batch_size, shuffle=True, seed=epoch):
            state, loss, acc = train_step(state, jnp.asarray(images), jnp.asarray(labels))
        correct = total = 0
        for images, labels in batches("valid", args.eval_batch_size):
            correct += float(eval_step(state.params, jnp.asarray(images), jnp.asarray(labels),
                                       state.batch_stats))
            total += len(labels)
        val_acc = 100.0 * correct / max(total, 1)
        logger.info(f"epoch {epoch}: train loss {float(loss):.4f} val acc {val_acc:.2f}%")
        if val_acc > best_acc:
            # device-side snapshot; one device_get at the final save (a host
            # pull per improvement is minutes over a remote-TPU tunnel)
            best_acc, best_params, best_epoch = val_acc, state.params, epoch
    path = os.path.join(args.out, f"{args.model_arch}_{args.dataset}"
                        if args.model_arch != "vit" else f"vit_{args.dataset}")
    save_checkpoint(path, {"params": best_params},
                    {"epoch": best_epoch, "accuracy": best_acc, "kind": "vit"})
    logger.info(f"saved best ViT (epoch {best_epoch}, acc {best_acc:.2f}%) to {path}")
    print(json.dumps({"mode": "train_transformer", "best_val_accuracy": best_acc}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
