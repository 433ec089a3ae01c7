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

The INVERSE direction (``--export``) writes TPU-trained checkpoints back
into the reference's artifact formats, so migration works both ways:

    python -m ladine_tpu.cli.convert --export --out ./for_reference \
        --guidance_ckpt <guidance or assembled ckpt> \
        --diffusion_ckpt <diffu_all*/diffu{k}* training ckpts> [--eval_ema]

    for_reference/vit_base_patch16_224_{DS}.pth   timm state dict*
    for_reference/MLPs/block_{k}.pth              Classifier state dicts
    for_reference/diffu{k}_ckpt_best_eph{E}_acc{A}.pth
                                                  {'noise_estimator': sd, ...}

*stage-1 pickles in the reference are whole-module; load the state dict
into a timm module and re-pickle (see export_vit's docstring).

torch is only needed to (un)pickle the .pth files (CPU torch suffices).
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
    p.add_argument("--export", action="store_true",
                   help="REVERSE direction: our checkpoints -> reference .pth "
                        "artifacts (--guidance_ckpt and/or --diffusion_ckpt "
                        "become inputs)")
    p.add_argument("--guidance_ckpt", type=str, default=None,
                   help="with --export: a guidance/assembled checkpoint to "
                        "write out as ViT + MLP .pth files")
    p.add_argument("--eval_ema", action="store_true",
                   help="with --export: export the EMA shadow parameters")
    p.add_argument("--cpu", action="store_true")
    return p


def run_export(args) -> int:
    """Our checkpoints -> reference torch artifacts (the CLI's --export)."""
    import jax
    import numpy as np

    from ladine_tpu.utils import load_checkpoint
    from ladine_tpu.utils.torch_convert import (
        export_conditional_model,
        export_mapping_mlp,
        export_vit,
        save_torch_state_dict,
    )

    os.makedirs(args.out, exist_ok=True)
    written = {}

    if args.guidance_ckpt:
        tree, _meta = load_checkpoint(args.guidance_ckpt)
        gp = tree["params"] if "params" in tree else tree
        vit_path = os.path.join(
            args.out, f"vit_base_patch16_224_{args.dataset}.pth"
        )
        save_torch_state_dict(export_vit(gp["vit"], depth=len(
            [k for k in gp["vit"] if k.startswith("block")])), vit_path)
        mlps_dir = os.path.join(args.out, "MLPs")
        os.makedirs(mlps_dir, exist_ok=True)
        mlp_paths = []
        k = 0
        while f"mlp{k}" in gp:
            mp = os.path.join(mlps_dir, f"block_{k}.pth")
            save_torch_state_dict(export_mapping_mlp(gp[f"mlp{k}"]), mp)
            mlp_paths.append(mp)
            k += 1
        written["vit"] = vit_path
        written["mlps"] = mlp_paths
        print(f"exported guidance -> {vit_path} + {len(mlp_paths)} MLPs",
              file=sys.stderr)

    if args.diffusion_ckpt:
        paths = []
        out_idx = 0
        for pth in args.diffusion_ckpt:
            tree, meta = load_checkpoint(pth)
            if "states" in tree:  # training checkpoint: stacked member states
                st = tree["states"]
                if args.eval_ema:
                    from ladine_tpu.train import ema_params_from_ckpt

                    params = ema_params_from_ckpt(st, meta)
                else:
                    params = st["params"]
                stacked = {"params": params, "batch_stats": st["batch_stats"]}
                n = len(jax.tree.leaves(params)[0])
                for i in range(n):
                    one = jax.tree.map(lambda x: np.asarray(x[i]), stacked)
                    idx = meta.get("member_idx")
                    idx = out_idx if idx is None else idx
                    name = (f"diffu{idx}_ckpt_best_eph{meta.get('epoch', 0)}"
                            f"_acc{meta.get('accuracy', 0.0):.4f}.pth")
                    dst = os.path.join(args.out, name)
                    save_torch_state_dict(
                        export_conditional_model(one), dst,
                        wrapper_key="noise_estimator",
                        epoch=meta.get("epoch", 0),
                    )
                    paths.append(dst)
                    out_idx += 1
            else:  # per-member variables checkpoint (this CLI's import output)
                dst = os.path.join(
                    args.out, f"diffu{out_idx}_ckpt_best_eph0_acc0.0000.pth"
                )
                save_torch_state_dict(
                    export_conditional_model(tree), dst,
                    wrapper_key="noise_estimator",
                )
                paths.append(dst)
                out_idx += 1
        written["members"] = paths
        print(f"exported {len(paths)} diffusion members", file=sys.stderr)

    if not written:
        raise SystemExit("--export needs --guidance_ckpt and/or --diffusion_ckpt")
    print(json.dumps({"mode": "export", **written}))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.export:
        return run_export(args)

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
