"""Main CLI — the diffusion-stage driver, mirroring the reference's
``diffusion/main.py`` flag surface (:16-161) and dispatch (:299-380).

Modes:
    --train           train all diffusion members concurrently
    --test            nested-ensemble robust evaluation (test_atk equivalent)
    --calib           cached-sample temperature calibration (test_calibrate)
    --demo            run the selected mode on tiny models + synthetic data

Corruption/attack flags mirror the reference's env-var surface (test.sh:15-22):
--noise_perturbation, --low_resolution, --brightness, --contrast,
--covered K N, --crop, --attack_name, --epsilon.

TPU additions: --ddim N (strided sampler), --bf16, --pallas.
Accepted-for-compat no-ops: --low_mem_mode, --ni, --thread (the TPU build
needs no CPU<->device model swapping; SURVEY.md C23).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ladine-tpu diffusion stage")
    p.add_argument("--config", type=str, default=None, help="YAML config (reference format accepted)")
    p.add_argument("--exp", type=str, default="./exp", help="experiment dir")
    p.add_argument("--doc", type=str, default="run", help="run name (log subdir)")
    p.add_argument("--seed", type=int, default=4444)
    p.add_argument("--dataroot", type=str, default=None)
    p.add_argument("--preprocess", type=str, default="grayscaled",
                   choices=["grayscaled", "standardized"])
    # modes
    p.add_argument("--train", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--calib", action="store_true")
    p.add_argument("--tune_T", action="store_true",
                   help="with --calib: also gradient-fit a softplus temperature "
                        "by NLL on the cached samples (reference --tune_T path)")
    p.add_argument("--save_samples", action="store_true",
                   help="with --test/--calib: dump raw MC samples + labels to "
                        "samples.npz in the log dir for offline recalibration")
    p.add_argument("--cached_samples", type=str, default=None,
                   help="with --calib: recalibrate from a samples.npz dump "
                        "WITHOUT re-running inference")
    p.add_argument("--make_plots", action="store_true",
                   help="with --test/--calib: write reliability / PIW / qq "
                        "figures to the log dir (reference C22 figure dumps)")
    p.add_argument("--demo", action="store_true", help="tiny models + synthetic data")
    p.add_argument("--mlp_idx", type=int, default=None,
                   help="train only this member (reference semantics); default all")
    # checkpoints
    p.add_argument("--guidance_ckpt", type=str, default=None,
                   help="a FULL SEViTGuidance checkpoint (saved guidance tree)")
    p.add_argument("--vit_ckpt", type=str, default=None,
                   help="stage-1a ViT checkpoint; with --mlp_ckpt_dir, the "
                        "guidance is assembled from stage-1 artifacts "
                        "(reference make_files.sh handoff)")
    p.add_argument("--mlp_ckpt_dir", type=str, default=None,
                   help="stage-1b directory holding block_0..block_{K-1}")
    p.add_argument("--diffusion_ckpt", type=str, nargs="*", default=None,
                   help="ONE training checkpoint (diffu_all*/diffu{k}*) or K "
                        "per-member variable checkpoints")
    p.add_argument("--eval_ema", action="store_true",
                   help="evaluate/validate the EMA shadow parameters instead "
                        "of the raw ones (the reference computes but never "
                        "applies its EMA)")
    p.add_argument("--resume_training", type=str, default=None,
                   help="checkpoint dir to resume training from")
    p.add_argument("--allow_random_init", action="store_true",
                   help="with --test/--calib: permit evaluating randomly "
                        "initialized members/guidance (otherwise a hard "
                        "error outside --demo — the reference always loads "
                        "checkpoints here, classification_train_separately"
                        ".py:684-691, and random-model metrics look "
                        "plausible but are garbage)")
    p.add_argument("--pretrain_guidance", type=int, default=0,
                   help="CE-pretrain the guidance heads for N steps before "
                        "diffusion training (reference aux_cls.pre_train path)")
    p.add_argument("--joint_train", action="store_true",
                   help="CE-update the guidance heads alongside every diffusion "
                        "step (reference aux_cls.joint_train path)")
    p.add_argument("--light_ckpt", action="store_true",
                   help="with --train: best checkpoints carry only "
                        "params/EMA/batch_stats in the compute dtype (no "
                        "optimizer state) — ~6x smaller; evaluable and "
                        "exportable but not resumable. Useful over a remote "
                        "tunnel where a full-state save costs minutes")
    p.add_argument("--precompute_guidance", action="store_true",
                   help="with --train: run the frozen guidance over the "
                        "train/valid splits ONCE, cache y0_hat per sample, "
                        "and train without the guidance resident — required "
                        "for full-dims single-chip training (the fp32 "
                        "guidance + member train state exceed 16 GB) and "
                        "faster everywhere (no per-step ViT forward)")
    p.add_argument("--export_predictor", action="store_true",
                   help="package the ensemble as a serving Predictor "
                        "artifact in the log dir: after --train the best "
                        "checkpoint; with --test/--calib the exact loaded "
                        "weights + sampler/quantization knobs evaluated")
    p.add_argument("--eval_guidance", action="store_true",
                   help="report guidance majority-vote accuracy and exit")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   dest="set_overrides",
                   help="dotted-path config override, repeatable "
                        "(e.g. --set optim.lowmem=true --set optim.lr=5e-4); "
                        "values parsed as YAML scalars, applied after the "
                        "YAML file and the dedicated flags")
    # diffusion overrides
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--ddim", type=int, default=0, help="strided sampler steps (0 = full chain)")
    p.add_argument("--eta", type=float, default=None,
                   help="strided-sampler stochasticity; default 1.0 (eta=0 "
                        "collapses per-chain randomness to the y_T draw and "
                        "degrades the MC posterior — see examples/"
                        "gmm_posterior.py); only used with --ddim")
    p.add_argument("--val_ddim", type=int, default=None,
                   help="stride the VALIDATION sampler only during --train "
                        "(0/unset = follow --ddim)")
    p.add_argument("--skip_type", type=str, default=None,
                   choices=["uniform", "quad"],
                   help="strided-sampler timestep spacing (reference "
                        "main.py:133-139 DDIM-heritage flag)")
    p.add_argument("--noise_prior", action="store_true",
                   help="zero prior mean at T instead of the guidance "
                        "prediction (reference main.py:83-86,189)")
    p.add_argument("--noise_prior_sample_only", action="store_true",
                   help="with --noise_prior: reference-EXACT semantics — the "
                        "zero prior applies only at sampling, not in the "
                        "training q_sample (the reference's live train loop "
                        "never consults the flag; needed for weight "
                        "compatibility with reference --noise_prior "
                        "checkpoints, PARITY.md deviations)")
    p.add_argument("--no_cat_f_phi", action="store_true",
                   help="do not concatenate the guidance prediction onto the "
                        "eps-net y-branch input (reference main.py:87-90)")
    p.add_argument("--n_epochs", type=int, default=None)
    # corruptions (test.sh env-var surface)
    p.add_argument("--noise_perturbation", type=float, default=0.0)
    p.add_argument("--low_resolution", type=int, default=1)
    p.add_argument("--brightness", type=float, default=0.0)
    p.add_argument("--contrast", type=float, default=1.0)
    p.add_argument("--covered", type=float, nargs=2, default=[0.0, 0],
                   metavar=("K", "N"))
    p.add_argument("--crop", type=float, default=0.0)
    p.add_argument("--suite", type=str, default=None,
                   help="with --test: JSON file of named EvalConfig overrides "
                        "({name: {field: value}}); runs every named config in "
                        "ONE process (one checkpoint/guidance load instead of "
                        "one per configuration — the load is minutes at full "
                        "dims) and writes report_<name>.json incrementally")
    p.add_argument("--sweep", type=str, default=None,
                   metavar="PARAM=V1,V2,...",
                   help="with --test: sweep one corruption severity, e.g. "
                        "noise=0,0.1,0.2 | lowres=1,2,4 | brightness=... | "
                        "contrast=... | crop=...")
    # attacks
    p.add_argument("--attack_name", type=str, default=None,
                   choices=["FGSM", "PGD", "BIM", "LinfBIM", "L2PGD", "CW",
                            "AUTOPGD"])
    p.add_argument("--epsilon", type=float, default=0.03)
    # inference
    p.add_argument("--mc_trials", type=int, default=None)
    p.add_argument("--temperature", type=float, default=None)
    # TPU
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fp32", action="store_true",
                   help="force model.dtype=float32 over the config (numerics "
                        "A/B: e.g. is a corruption-row uncertainty blowup an "
                        "OOD signal or bf16 reverse-chain divergence?)")
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="with --test/--calib: int8 weights+activations for "
                        "the two big eps matmuls (kernels/int8.py; "
                        "EXPERIMENTAL — compare metrics against bf16)")
    p.add_argument("--int8_encode", action="store_true",
                   help="with --test/--calib: int8 enc_lin1 (the per-image "
                        "encode's 1.2 GB weight stream; the fixed-cost lever "
                        "at short --ddim schedules; kernels/int8.py)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params/optimizer state/EMA over the data axis "
                        "(full-size all-member training state exceeds one chip)")
    p.add_argument("--cpu", action="store_true")
    # reference-compat no-ops
    p.add_argument("--low_mem_mode", action="store_true",
                   help="accepted for compatibility; unnecessary on TPU")
    p.add_argument("--ni", action="store_true", help="non-interactive (compat no-op)")
    p.add_argument("--thread", type=int, default=4, help="compat no-op")
    p.add_argument("--verbose", type=str, default="INFO")
    return p


def _json_sanitize(obj):
    """NaN -> None so report.json stays strict-JSON parseable (empty
    PIW/variance groups are NaN by design)."""
    import math

    if isinstance(obj, float) and math.isnan(obj):
        return None
    if isinstance(obj, dict):
        return {k: _json_sanitize(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_json_sanitize(v) for v in obj]
    return obj


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ladine_tpu.config import Config
    from ladine_tpu.cli.runner import Runner
    from ladine_tpu.infer import EvalConfig

    cfg = Config.from_yaml(args.config) if args.config else Config()
    if args.dataroot:
        cfg.data.dataroot = args.dataroot
    cfg.data.preprocess = args.preprocess
    if args.timesteps:
        cfg.diffusion.timesteps = args.timesteps
    if args.n_epochs:
        cfg.training.n_epochs = args.n_epochs
    if args.ddim:
        cfg.diffusion.ddim_steps = args.ddim
    if args.eta is not None:
        cfg.diffusion.ddim_eta = args.eta
    if args.val_ddim is not None:
        cfg.diffusion.val_ddim_steps = args.val_ddim
    if args.skip_type:
        cfg.diffusion.skip_type = args.skip_type
    if args.noise_prior:
        cfg.diffusion.noise_prior = True
    if args.noise_prior_sample_only:
        # only meaningful on top of the noise prior itself — alone it would
        # silently change nothing, which defeats its weight-compat purpose
        if not (args.noise_prior or cfg.diffusion.noise_prior):
            raise SystemExit(
                "--noise_prior_sample_only requires --noise_prior "
                "(it selects WHERE the noise prior applies)")
        cfg.diffusion.noise_prior_training = False
    if args.no_cat_f_phi:
        cfg.diffusion.include_guidance = False
    if args.bf16 and args.fp32:
        raise SystemExit("--bf16 and --fp32 are mutually exclusive")
    if args.bf16:
        cfg.model.dtype = "bfloat16"
    if args.fp32:
        cfg.model.dtype = "float32"
    if args.pallas:
        cfg.model.use_pallas = True
    if args.fsdp:
        cfg.model.fsdp = True
    if args.mc_trials:
        cfg.testing.mc_trials = args.mc_trials
    if args.set_overrides:
        import yaml as _yaml

        kv = {}
        for s in args.set_overrides:
            if "=" not in s:
                raise SystemExit(f"--set expects section.key=value, got {s!r}")
            k, v = s.split("=", 1)
            parsed = _yaml.safe_load(v)
            if isinstance(parsed, str):
                # YAML 1.1 parses dot-less scientific notation ('5e-4') as a
                # string; a silently-string lr would break downstream math
                try:
                    parsed = float(parsed)
                except ValueError:
                    pass
            kv[k] = parsed
        cfg.apply_overrides(kv)
    cfg.data.seed = args.seed

    log_dir = os.path.join(args.exp, "logs", args.doc)
    runner = Runner(cfg, log_dir=log_dir, demo=args.demo)
    cfg.save_yaml(os.path.join(log_dir, "config.yml"))  # snapshot (main.py:221)
    key = jax.random.PRNGKey(args.seed)

    if args.temperature:
        runner.temperature = args.temperature

    eval_cfg = EvalConfig(
        mc_trials=cfg.testing.mc_trials,
        temperature=runner.temperature,
        noise_std=args.noise_perturbation,
        low_resolution=args.low_resolution,
        brightness=args.brightness,
        contrast=args.contrast,
        cover=(args.covered[0], int(args.covered[1])),
        crop=args.crop,
        attack_name=args.attack_name,
        attack_eps=args.epsilon,
        ddim_steps=cfg.diffusion.ddim_steps,
        ddim_eta=cfg.diffusion.ddim_eta,
        skip_type=cfg.diffusion.skip_type,
        noise_prior=cfg.diffusion.noise_prior,
        use_int8=args.int8,
        use_int8_encode=args.int8_encode,
    )

    if args.eval_guidance:
        # eval_cast halves the host->device transfer of the full-size tree
        # (argmax-based accuracy is insensitive to bf16 weights)
        gvars = runner.init_guidance(jax.random.PRNGKey(0), args.guidance_ckpt,
                                     vit_ckpt=args.vit_ckpt, mlp_dir=args.mlp_ckpt_dir,
                                     eval_cast=not (args.demo and args.guidance_ckpt is None))
        if args.demo and args.guidance_ckpt is None:
            gvars = runner.pretrain_guidance(gvars)
        acc = runner.evaluate_guidance(gvars)
        print(json.dumps({"mode": "eval_guidance", "majority_vote_accuracy": acc}))
        return 0

    if args.train:
        result = runner.train(key, guidance_ckpt=args.guidance_ckpt,
                              epochs=cfg.training.n_epochs,
                              resume_from=args.resume_training,
                              pretrain_guidance_steps=args.pretrain_guidance,
                              member_idx=args.mlp_idx,
                              joint_train=args.joint_train,
                              eval_ema=args.eval_ema,
                              vit_ckpt=args.vit_ckpt,
                              mlp_dir=args.mlp_ckpt_dir,
                              precompute_yhat=args.precompute_guidance,
                              light_ckpt=args.light_ckpt)
        summary = {"mode": "train", "best_accuracy": result["best_accuracy"],
                   "steps": result["steps"]}
        if args.export_predictor:
            from ladine_tpu.infer import Predictor

            if result.get("best_ckpt_path"):
                # export the BEST checkpoint, not the final-epoch weights —
                # the reported best_accuracy belongs to that checkpoint.
                # The loader handles full AND light checkpoints, picks the
                # EMA shadows under --eval_ema, and resolves guidance_src
                # references
                variables, g_tree, _ = runner.load_members_from_train_ckpt(
                    result["best_ckpt_path"], use_ema=args.eval_ema,
                    eval_cast=True,
                )
                gvars = runner.to_eval_vars(g_tree, eval_cast=True)
            else:
                print("warning: no best checkpoint saved; exporting final-epoch "
                      "weights", file=sys.stderr)
                states, gvars = result["states"], result["guidance"]
                if gvars is None:
                    gvars = runner.init_guidance(
                        jax.random.PRNGKey(0), args.guidance_ckpt,
                        vit_ckpt=args.vit_ckpt, mlp_dir=args.mlp_ckpt_dir,
                        eval_cast=True,
                    )
                # with --eval_ema the reported best_accuracy was measured on
                # the (debiased) EMA shadows — the artifact must serve the
                # same weights
                from ladine_tpu.train import ema_read

                mu = cfg.model.ema_rate
                mode = result.get("ema_init", "zero")
                variables = jax.vmap(
                    lambda s: {"params": ema_read(s.ema, mu, s.step, mode)
                               if args.eval_ema else s.params,
                               "batch_stats": s.batch_stats}
                )(states)
            predictor = Predictor(
                guidance=runner.guidance, guidance_vars=gvars,
                model=runner.cond, stacked_vars=variables, sched=runner.sched,
                temperature=runner.temperature,
                mc_trials=cfg.testing.mc_trials,
                ddim_steps=cfg.diffusion.ddim_steps or 50,
                # bake the run's sampler stochasticity into the artifact so
                # the served sampler matches the evaluated/calibrated one
                ddim_eta=cfg.diffusion.ddim_eta,
                head_indices=(args.mlp_idx,) if args.mlp_idx is not None else None,
            )
            artifact = os.path.join(log_dir, "predictor_artifact")
            predictor.save(artifact)
            summary["predictor_artifact"] = artifact
        print(json.dumps(summary))
        return 0

    if args.tune_T and not args.calib:
        print("--tune_T only applies with --calib", file=sys.stderr)
        return 2

    if args.calib and args.cached_samples:
        # offline recalibration: pure reweighting of a previous dump — no
        # models, no inference (the reference reruns full ensemble inference
        # per Nelder-Mead objective evaluation)
        from ladine_tpu.infer import compute_report, temperature_search, tune_temperature_nll

        dump = np.load(args.cached_samples)
        t_best, _ = temperature_search(dump["samples"], dump["labels"])
        report = compute_report(dump["samples"], dump["labels"], t_best)
        report["calibrated_temperature"] = t_best
        if args.tune_T:
            report["nll_tuned_temperature"] = tune_temperature_nll(
                dump["samples"], dump["labels"]
            )
        if args.make_plots:
            from ladine_tpu.utils.plots import save_evaluation_plots

            for pth in save_evaluation_plots(report, log_dir):
                print(f"wrote {pth}", file=sys.stderr)
        printable = {k: v for k, v in report.items() if k not in ("samples", "labels")}
        result = _json_sanitize({"mode": "calib_cached", **printable})
        with open(os.path.join(log_dir, "report.json"), "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
        return 0

    if args.test or args.calib:
        # --diffusion_ckpt TRAINING checkpoints (diffu_all* / diffu{k}*)
        # carry members AND the guidance they were trained against — the
        # natural train -> test handoff. One all-member ckpt, or several
        # single-member ckpts in head order (the reference's MLP_IDX
        # workflow, classification_train_separately.py:684-691).
        def _is_train_ckpt(p):
            meta_p = os.path.join(p, "ladine_meta.json")
            if not os.path.exists(meta_p):
                return False
            with open(meta_p) as f:
                return json.load(f).get("kind") == "diffusion_members"

        train_ckpts = (
            args.diffusion_ckpt
            if args.diffusion_ckpt and all(_is_train_ckpt(p) for p in args.diffusion_ckpt)
            else None
        )
        if train_ckpts:
            stacked, g_tree, head_ids = runner.load_members_from_train_ckpts(
                train_ckpts, use_ema=args.eval_ema, eval_cast=True
            )
            # condition each stacked member on the guidance head it was
            # TRAINED against (--mlp_idx runs record member_idx in the ckpt
            # metadata); legacy ckpts fall back to positional head order
            n_stacked = jax.tree.leaves(stacked)[0].shape[0]
            if head_ids is None:
                head_ids = tuple(range(n_stacked))
            if tuple(head_ids) != tuple(range(cfg.diffusion.num_members)):
                import dataclasses as _dc

                eval_cfg = _dc.replace(eval_cfg, head_indices=tuple(head_ids))
            if args.guidance_ckpt or args.vit_ckpt:
                gvars = runner.init_guidance(jax.random.PRNGKey(0), args.guidance_ckpt,
                                             vit_ckpt=args.vit_ckpt,
                                             mlp_dir=args.mlp_ckpt_dir,
                                             eval_cast=True)
            else:
                gvars = runner.to_eval_vars(g_tree, eval_cast=True)
        else:
            if args.eval_ema:
                print("--eval_ema needs a training checkpoint (diffu_all*); "
                      "per-member variable checkpoints carry no EMA shadows",
                      file=sys.stderr)
                return 2
            if not args.demo and not args.allow_random_init:
                # random members/guidance produce plausible-looking garbage
                # metrics; the reference always loads checkpoints here
                # (classification_train_separately.py:684-691)
                missing = []
                if not args.diffusion_ckpt:
                    missing.append("members (--diffusion_ckpt)")
                if not (args.guidance_ckpt or args.vit_ckpt):
                    missing.append("guidance (--guidance_ckpt or --vit_ckpt)")
                if missing:
                    print("refusing to evaluate randomly initialized "
                          + " and ".join(missing)
                          + "; pass --allow_random_init to override",
                          file=sys.stderr)
                    return 2
            gvars = runner.init_guidance(jax.random.PRNGKey(0), args.guidance_ckpt,
                                         vit_ckpt=args.vit_ckpt,
                                         mlp_dir=args.mlp_ckpt_dir,
                                         eval_cast=True)
            stacked = runner.init_members(jax.random.PRNGKey(1), args.diffusion_ckpt,
                                          eval_cast=True)
        if args.export_predictor:
            # package the EVALUATED configuration for serving: the exact
            # weights, sampler and quantization knobs this test/calib run
            # used (the natural train -> evaluate -> deploy handoff; the
            # train-path export above covers train -> deploy)
            from ladine_tpu.infer import Predictor

            exp_stacked, exp_hi = stacked, eval_cfg.head_indices
            if eval_cfg.selected_members is not None:
                sel = jnp.asarray(eval_cfg.selected_members)
                exp_stacked = jax.tree.map(lambda x: x[sel], stacked)
                exp_hi = tuple(eval_cfg.selected_members)
            predictor = Predictor(
                guidance=runner.guidance, guidance_vars=gvars,
                model=runner.cond, stacked_vars=exp_stacked,
                sched=runner.sched, temperature=eval_cfg.temperature,
                mc_trials=eval_cfg.mc_trials,
                ddim_steps=eval_cfg.ddim_steps, ddim_eta=eval_cfg.ddim_eta,
                skip_type=eval_cfg.skip_type,
                noise_prior=eval_cfg.noise_prior,
                use_int8=eval_cfg.use_int8,
                use_int8_encode=eval_cfg.use_int8_encode,
                head_indices=exp_hi,
            )
            artifact = os.path.join(log_dir, "predictor_artifact")
            predictor.save(artifact)
            print(f"exported predictor -> {artifact}", file=sys.stderr)
            del predictor
        if args.test and args.suite:
            import dataclasses as _dc

            with open(args.suite) as f:
                suite = json.load(f)
            rows = {}
            for name, overrides in suite.items():
                overrides = {k: tuple(v) if isinstance(v, list) else v
                             for k, v in overrides.items()}
                cfg_v = _dc.replace(eval_cfg, **overrides)
                rep = runner.test(key, stacked, gvars, cfg_v)
                rep.pop("samples", None), rep.pop("labels", None)
                # incremental per-row artifact: a killed run keeps its rows
                with open(os.path.join(log_dir, f"report_{name}.json"), "w") as f:
                    # sanitize like the aggregate report: empty per-class
                    # uncertainty cells are NaN and must serialize as null
                    # (strict JSON), not the bare `NaN` literal
                    json.dump(_json_sanitize(rep), f, indent=2)
                rows[name] = {"accuracy": rep["mean_confidence_accuracy"],
                              "mv_accuracy": rep["majority_vote_accuracy"],
                              "ece": rep["ece"], "nll": rep["nll"],
                              "brier": rep["brier"]}
                print(json.dumps({"suite_row": name, **rows[name]}),
                      file=sys.stderr)
            result = _json_sanitize({"mode": "suite", "rows": rows})
            with open(os.path.join(log_dir, "report.json"), "w") as f:
                json.dump(result, f, indent=2)
            print(json.dumps(result))
            return 0
        if args.test and args.sweep:
            param, _, values = args.sweep.partition("=")
            field_map = {"noise": "noise_std", "lowres": "low_resolution",
                         "brightness": "brightness", "contrast": "contrast",
                         "crop": "crop"}
            if param not in field_map:
                print(f"unknown sweep param {param!r}; one of {sorted(field_map)}",
                      file=sys.stderr)
                return 2
            if args.make_plots or args.save_samples:
                print("note: --make_plots/--save_samples are not applied in "
                      "--sweep mode (per-severity reports only)", file=sys.stderr)
            caster = int if param == "lowres" else float
            rows = []
            import dataclasses as _dc

            for v in [caster(x) for x in values.split(",")]:
                cfg_v = _dc.replace(eval_cfg, **{field_map[param]: v})
                rep = runner.test(key, stacked, gvars, cfg_v)
                rows.append({param: v,
                             "accuracy": rep["mean_confidence_accuracy"],
                             "mv_accuracy": rep["majority_vote_accuracy"],
                             "ece": rep["ece"], "nll": rep["nll"],
                             "brier": rep["brier"]})
            result = {"mode": "sweep", "param": param, "rows": rows}
            with open(os.path.join(log_dir, "report.json"), "w") as f:
                json.dump(result, f, indent=2)
            print(json.dumps(result))
            return 0
        if args.test:
            report = runner.test(key, stacked, gvars, eval_cfg)
        else:
            report = runner.calibrate(key, stacked, gvars, eval_cfg)
        if args.calib and args.tune_T:
            from ladine_tpu.infer import tune_temperature_nll

            report["nll_tuned_temperature"] = tune_temperature_nll(
                report["samples"], report["labels"]
            )
        if args.save_samples:
            np.savez_compressed(
                os.path.join(log_dir, "samples.npz"),
                samples=report["samples"], labels=report["labels"],
            )
        if args.make_plots:
            from ladine_tpu.utils.plots import save_evaluation_plots

            for pth in save_evaluation_plots(report, log_dir):
                print(f"wrote {pth}", file=sys.stderr)
        printable = {k: v for k, v in report.items() if k not in ("samples", "labels")}
        result = _json_sanitize({"mode": "test" if args.test else "calib", **printable})
        with open(os.path.join(log_dir, "report.json"), "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
        return 0

    print("nothing to do: pass --train, --test or --calib (add --demo for a smoke run)",
          file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
