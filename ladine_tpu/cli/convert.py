"""Convert the reference's pretrained torch artifacts into runner-loadable
checkpoints (and optionally a serving Predictor artifact).

The reference's artifact tree (classification_train_separately.py:249-315,
:684-691):

    pretrained/{task}_ckpt/vit_base_patch16_224_{DS}.pth   whole-module pickle
    pretrained/{task}_ckpt/MLPs/<sorted listing>           K whole-module pickles
    .../diffu{k}_ckpt_best_eph{E}_acc{A}.pth               {'noise_estimator': sd, ...}

Usage:

    python -m ladine_tpu.cli.convert \
        --pretrained_dir /path/to/chest_x_ray_ckpt --dataset ChestXRay \
        --diffusion_ckpt diffu0_*.pth diffu1_*.pth ... \
        --out ./converted [--config configs/chest_x_ray.yml] [--export_predictor]

Outputs under --out:
    guidance_{DS}     full SEViTGuidance checkpoint  -> --guidance_ckpt
    member_{k}        per-member ConditionalModel variables -> --diffusion_ckpt
    predictor_artifact  (with --export_predictor) -> Predictor.load()

torch is only needed to unpickle the .pth files (CPU torch suffices).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(description="reference .pth -> ladine-tpu checkpoints")
    p.add_argument("--pretrained_dir", type=str, default=None,
                   help="reference pretrained/{task}_ckpt dir (ViT pickle + MLPs/)")
    p.add_argument("--vit_pth", type=str, default=None,
                   help="explicit ViT .pth (overrides the conventional name)")
    p.add_argument("--mlp_pths", type=str, nargs="*", default=None,
                   help="explicit mapping-MLP .pth files in member order")
    p.add_argument("--diffusion_ckpt", type=str, nargs="*", default=None,
                   help="reference diffu{k}_ckpt_best_*.pth files in member order")
    p.add_argument("--dataset", type=str, default="ChestXRay")
    p.add_argument("--config", type=str, default=None,
                   help="YAML config pinning the model dims (default: full size)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--export_predictor", action="store_true",
                   help="also bundle guidance + members + schedule + the "
                        "dataset's calibrated temperature as a Predictor artifact "
                        "(requires --diffusion_ckpt)")
    p.add_argument("--cpu", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from ladine_tpu.config import Config
    from ladine_tpu.utils import save_checkpoint, validate_guidance_tree
    from ladine_tpu.utils.torch_convert import (
        convert_conditional_model,
        convert_mapping_mlp,
        convert_vit,
        load_torch_state_dict,
    )

    cfg = Config.from_yaml(args.config) if args.config else Config()
    m = cfg.model
    written = {}

    # ---- guidance (ViT + K mapping MLPs) ------------------------------
    vit_pth, mlp_pths = args.vit_pth, args.mlp_pths
    if args.pretrained_dir:
        if vit_pth is None:
            vit_pth = os.path.join(
                args.pretrained_dir, f"vit_base_patch16_224_{args.dataset}.pth"
            )
        if mlp_pths is None:
            mlps_root = os.path.join(args.pretrained_dir, "MLPs")
            # the reference iterates the SORTED listing (cts.py:262-268)
            mlp_pths = [os.path.join(mlps_root, f) for f in sorted(os.listdir(mlps_root))]

    gvars = None
    if vit_pth:
        if not mlp_pths:
            raise SystemExit("need mapping-MLP .pth files alongside the ViT")
        gparams = {"vit": convert_vit(load_torch_state_dict(vit_pth), depth=m.vit_depth)}
        for k, pth in enumerate(mlp_pths):
            gparams[f"mlp{k}"] = convert_mapping_mlp(load_torch_state_dict(pth))
        gvars = {"params": gparams}

        # validate against a freshly-initialized guidance of the config's dims
        from ladine_tpu.models import SEViTGuidance

        guidance = SEViTGuidance(
            num_classes=cfg.data.num_classes, num_members=len(mlp_pths),
            vit_depth=m.vit_depth, img_size=m.image_size, patch_size=m.patch_size,
            embed_dim=m.embed_dim, num_heads=m.num_heads,
            mlp_hidden_dims=tuple(m.mlp_hidden_dims),
        )
        template = guidance.init(
            jax.random.PRNGKey(0), jnp.zeros((1, m.image_size, m.image_size, 3))
        )
        gvars = validate_guidance_tree(gvars, template)
        gpath = os.path.join(args.out, f"guidance_{args.dataset}")
        save_checkpoint(gpath, gvars,
                        {"kind": "guidance", "num_members": len(mlp_pths),
                         "source": vit_pth})
        written["guidance"] = gpath
        print(f"converted guidance ({len(mlp_pths)} MLPs) -> {gpath}", file=sys.stderr)

    # ---- diffusion members --------------------------------------------
    members = []
    if args.diffusion_ckpt:
        from ladine_tpu.models import ConditionalModel

        cond = ConditionalModel(
            data_dim=m.image_size * m.image_size * 3, feature_dim=m.feature_dim,
            hidden_dim=m.hidden_dim, y_dim=cfg.data.num_classes,
            n_steps=cfg.diffusion.timesteps + 1,
            guidance=cfg.diffusion.include_guidance,
        )
        template = cond.init(
            jax.random.PRNGKey(0), jnp.zeros((1, cond.data_dim)),
            jnp.zeros((1, cond.y_dim)), jnp.asarray(0),
            jnp.full((1, cond.y_dim), 1.0 / cond.y_dim),
        )
        paths = []
        for k, pth in enumerate(args.diffusion_ckpt):
            sd = load_torch_state_dict(pth)  # auto-unwraps 'noise_estimator'
            variables = convert_conditional_model(sd)
            variables = validate_guidance_tree(variables, template)  # same checker
            mpath = os.path.join(args.out, f"member_{k}")
            save_checkpoint(mpath, variables,
                            {"kind": "diffusion_member", "member": k, "source": pth})
            members.append(variables)
            paths.append(mpath)
            print(f"converted member {k} -> {mpath}", file=sys.stderr)
        written["members"] = paths

    # ---- serving artifact ----------------------------------------------
    if args.export_predictor:
        if gvars is None or not members:
            raise SystemExit("--export_predictor needs both guidance and members")
        from ladine_tpu.data import CALIBRATED_TEMPERATURE, base_dataset
        from ladine_tpu.infer import Predictor, stack_members
        from ladine_tpu.ops import DiffusionSchedule

        sched = DiffusionSchedule.create(
            cfg.diffusion.beta_schedule, cfg.diffusion.timesteps,
            cfg.diffusion.beta_start, cfg.diffusion.beta_end,
        )
        try:
            temperature = CALIBRATED_TEMPERATURE[base_dataset(args.dataset)]
        except (ValueError, KeyError):
            temperature = 0.2555
        predictor = Predictor(
            guidance=guidance, guidance_vars=gvars, model=cond,
            stacked_vars=stack_members(members), sched=sched,
            temperature=temperature, mc_trials=cfg.testing.mc_trials,
            ddim_steps=cfg.diffusion.ddim_steps or 50,
            ddim_eta=cfg.diffusion.ddim_eta,
        )
        apath = os.path.join(args.out, "predictor_artifact")
        predictor.save(apath)
        written["predictor"] = apath
        print(f"packaged predictor -> {apath}", file=sys.stderr)

    if not written:
        raise SystemExit("nothing to convert: pass --pretrained_dir/--vit_pth "
                         "and/or --diffusion_ckpt")
    print(json.dumps({"mode": "convert", **written}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
