"""Nested-ensemble robust evaluation — the reference's ``test_atk`` entry
(/root/reference/diffusion/classification_train_separately.py:631-840) as a
single device pipeline + thin host loop.

Per batch (all inside ONE jit): corruptions in the reference's fixed order ->
optional white-box attack on the ViT -> SEViT guidance heads -> nested
ensemble MC sampling (members x trials x reverse scan) -> raw sample logits.
Host side accumulates numpy samples and computes the metric block
(majority-vote accuracy, ECE/NLL/Brier on the calibrated mean confidence,
per-class PIW and MC variance) — identical quantities to the reference's
report (:810-838).

The raw samples are returned too, so temperature calibration afterwards is a
free reweighting (see infer/calibrate.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ladine_tpu.attacks import make_attack
from ladine_tpu.infer.engine import nested_ensemble_sample
from ladine_tpu.metrics.classification import (
    accuracy_topk,
    brier,
    ece,
    ensemble_confidence,
    majority_vote,
    nll,
    reliability_bins,
)
from ladine_tpu.metrics.uncertainty import mc_variance_per_class, piw_per_class
from ladine_tpu.models.conditional import ConditionalModel
from ladine_tpu.models.guidance import SEViTGuidance
from ladine_tpu.ops.corruptions import apply_corruptions
from ladine_tpu.ops.diffusion import ddim_timesteps
from ladine_tpu.ops.schedules import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Corruption/attack/inference knobs (the reference's env-var surface,
    test.sh:15-22 + main.py flags)."""

    mc_trials: int = 20
    temperature: float = 0.1737
    noise_std: float = 0.0
    low_resolution: int = 1
    brightness: float = 0.0
    contrast: float = 1.0
    cover: Tuple[float, int] = (0.0, 0)
    crop: float = 0.0
    attack_name: Optional[str] = None
    attack_eps: float = 0.03
    ddim_steps: int = 0  # 0 = full ancestral chain (reference behavior)
    # eta=1 preserves the MC vote posterior under striding (eta=0 collapses
    # per-chain randomness to the y_T draw); unused when ddim_steps == 0
    ddim_eta: float = 1.0
    skip_type: str = "uniform"  # strided timestep spacing: uniform | quad
    noise_prior: bool = False  # zero prior mean at T (reference --noise_prior)
    # indices into the guidance heads AND the (full) stacked member variables
    # (the reference loads 6 members but runs selected_block_indices=[0..4],
    # classification_train_separately.py:275, 767-769); None = first
    # num_members heads with all stacked members
    selected_members: Optional[Tuple[int, ...]] = None
    # guidance-head index per ALREADY-SELECTED stacked member (conditioning
    # only — the member stack is used as-is). For partial ensembles from
    # --mlp_idx runs: member i was trained against head head_indices[i].
    # Mutually exclusive with selected_members.
    head_indices: Optional[Tuple[int, ...]] = None
    unroll: int = 1  # reverse-scan unroll factor
    # int8 weights+activations for the two big eps matmuls (kernels/int8.py)
    use_int8: bool = False
    # int8 enc_lin1 — the per-image encode's 1.2 GB weight stream; matters
    # at short DDIM schedules where the fixed cost dominates (kernels/int8.py)
    use_int8_encode: bool = False
    # fused Pallas int8 scan body (kernels/int8_pallas.py; MC trials fold
    # into GEMM rows) — the accuracy-gate row for the --pallas_int8 bench
    use_int8_pallas: bool = False
    # with use_int8_pallas: v2 kernels (lin1/lin4 fused into the Pallas
    # calls); same quantization math, fp32-equal to v1 by test
    pallas_fuse_ends: bool = False


def make_eval_pipeline(
    guidance: SEViTGuidance,
    guidance_vars: Any,
    model: ConditionalModel,
    sched: DiffusionSchedule,
    cfg: EvalConfig,
    mesh=None,
):
    """One jitted function: (stacked_vars, images, labels, key) -> samples
    (M, K, B, C) raw diffusion outputs.

    With ``mesh`` (axes ('member','data')) the member axis of the stacked
    variables and the batch axis of the images are sharded; GSPMD inserts
    the collectives."""
    num_members = guidance.num_members
    tau = (
        ddim_timesteps(sched.num_timesteps, cfg.ddim_steps, cfg.skip_type)
        if cfg.ddim_steps
        else None
    )

    corrupt = functools.partial(
        apply_corruptions,
        noise_std=cfg.noise_std,
        low_resolution=cfg.low_resolution,
        brightness=cfg.brightness,
        contrast=cfg.contrast,
        cover=cfg.cover,
        crop=cfg.crop,
    )

    # guidance_vars is an explicit jit ARGUMENT throughout (bound by partial
    # on the jitted function below): a closure would bake the ~13 GB tree
    # into the lowered program as constants — catastrophic for remote
    # compilation and a full extra HBM copy
    def pipeline(gvars, stacked_vars, images, labels, key):
        k_corrupt, k_attack, k_sample = jax.random.split(key, 3)
        images = corrupt(images, k_corrupt)
        if cfg.attack_name:
            attack = make_attack(
                cfg.attack_name, cfg.attack_eps,
                lambda x: guidance.apply(gvars, x, method="vit_logits"),
            )
            images, _ = attack(images, labels, k_attack)
        # the needed guidance heads are STATIC — heads_subset runs the
        # transformer only to the deepest needed tap and skips the full-ViT
        # head unless selected (the reference loads 6 members, evaluates 5;
        # the 12-block full forward is pure fixed cost otherwise)
        if cfg.selected_members is not None:
            needed = tuple(cfg.selected_members)
        elif cfg.head_indices is not None:
            # partial ensemble: stacked members as-is, each conditioned on
            # the head it was trained against
            needed = tuple(cfg.head_indices)
        else:
            needed = tuple(range(num_members))
        if cfg.use_int8_encode and all(
            int(i) < int(guidance.num_members) for i in needed
        ):
            # int8 first layers for the mapping heads too (the guidance's
            # share of the per-image fixed cost; kernels/int8.py)
            from ladine_tpu.kernels.int8 import int8_mapping_heads

            taps = guidance.apply(gvars, images, needed, method="taps_subset")
            heads = int8_mapping_heads(gvars, taps, needed)
        else:
            heads = guidance.apply(gvars, images, needed, method="heads_subset")
        y0_hat = jax.nn.softmax(heads.astype(jnp.float32), axis=-1)
        vars_run = stacked_vars
        if cfg.selected_members is not None:
            # slice the member axis of the stacked variables to match
            idx = jnp.asarray(cfg.selected_members)
            vars_run = jax.tree.map(lambda x: x[idx], stacked_vars)
        x_flat = images.reshape(images.shape[0], -1)
        return nested_ensemble_sample(
            model, vars_run, x_flat, y0_hat, k_sample, sched,
            mc_trials=cfg.mc_trials, tau=tau, eta=cfg.ddim_eta, unroll=cfg.unroll,
            noise_prior=cfg.noise_prior,
            use_int8_eps=cfg.use_int8 and not cfg.use_int8_pallas,
            use_int8_encode=cfg.use_int8_encode,
            use_int8_pallas=cfg.use_int8_pallas,
            pallas_fuse_ends=cfg.pallas_fuse_ends,
        )

    if mesh is None:
        return functools.partial(jax.jit(pipeline), guidance_vars)

    from jax.sharding import NamedSharding, PartitionSpec as P

    member = NamedSharding(mesh, P("member"))
    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    out = NamedSharding(mesh, P("member", None, "data"))

    cache = {}
    data_dim = dict(zip(mesh.axis_names, mesh.devices.shape))["data"]

    def jitted(stacked_vars, images, labels, key):
        # a tail batch that doesn't tile the data axis (drop_last=False)
        # falls back to the unsharded jit instead of crashing the whole run
        if images.shape[0] % data_dim != 0:
            if "plain" not in cache:
                cache["plain"] = jax.jit(pipeline)
            return cache["plain"](guidance_vars, stacked_vars, images, labels, key)
        # build the sharded jit once (shardings need the variables' structure,
        # which we only see at the first call)
        if "fn" not in cache:
            vars_shard = jax.tree.map(lambda _: member, stacked_vars)
            g_shard = jax.tree.map(lambda _: rep, guidance_vars)
            cache["fn"] = jax.jit(
                pipeline,
                in_shardings=(g_shard, vars_shard, data, data, rep),
                out_shardings=out,
            )
        # variables arriving with OTHER shardings (e.g. FSDP-trained state)
        # are resharded to member sharding once and cached; the source tree
        # is retained so the identity check can't alias a recycled id()
        if cache.get("vars_src") is not stacked_vars:
            cache["vars"] = jax.tree.map(
                lambda x: jax.device_put(x, member), stacked_vars
            )
            cache["vars_src"] = stacked_vars
        return cache["fn"](guidance_vars, cache["vars"], images, labels, key)

    return jitted


def evaluate_ensemble(
    guidance: SEViTGuidance,
    guidance_vars: Any,
    model: ConditionalModel,
    stacked_vars: Any,
    sched: DiffusionSchedule,
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    cfg: EvalConfig,
    key: jax.Array,
    mesh=None,
) -> Dict[str, Any]:
    """Run the full robust-evaluation loop; returns the metric report plus
    the raw cached samples (num_samples, N, C) for calibration."""
    pipeline = make_eval_pipeline(guidance, guidance_vars, model, sched, cfg, mesh=mesh)

    all_samples = []
    all_labels = []
    m = None
    total = 0
    for i, (images, labels) in enumerate(batches):
        key, sub = jax.random.split(key)
        samples = pipeline(stacked_vars, jnp.asarray(images), jnp.asarray(labels), sub)
        m, k, b, c = samples.shape
        all_samples.append(np.asarray(samples.reshape(m * k, b, c), np.float32))
        all_labels.append(np.asarray(labels))
        # per-batch heartbeat: the host pull above is a sync point, so this
        # prints at real progress — long evals must not be SILENT (drivers
        # kill on silence as the wedged-tunnel-RPC signature, run_results.sh).
        # Running total, not (i+1)*b: tail batches are ragged.
        import logging

        total += b
        logging.getLogger("ladine_tpu").info(
            "eval batch %d done (%d instances)", i, total
        )

    samples = np.concatenate(all_samples, axis=1)  # (S, N, C), member-major
    labels = np.concatenate(all_labels)

    return compute_report(samples, labels, cfg.temperature, num_members=m)


def compute_report(
    samples: np.ndarray,
    labels: np.ndarray,
    temperature: float,
    num_members: Optional[int] = None,
) -> Dict[str, Any]:
    """The reference's aggregate metric block (:810-838) over cached samples,
    plus reliability-diagram bins and (when ``num_members`` is given and the
    sample axis is members*trials ordered) per-member vote accuracy."""
    samples_j = jnp.asarray(samples)
    labels_j = jnp.asarray(labels)
    mv = majority_vote(samples_j)
    conf = ensemble_confidence(samples_j, temperature)
    (top1,) = accuracy_topk(conf, labels_j, (1,))
    mv_acc = float(jnp.mean((mv == labels_j).astype(jnp.float32)) * 100.0)
    piw_c, piw_i = piw_per_class(samples_j, mv, labels_j)
    var_c, var_i = mc_variance_per_class(samples_j, mv, labels_j)
    count, bin_conf, bin_acc = reliability_bins(conf, labels_j)
    extra: Dict[str, Any] = {
        "reliability": {
            "count": np.asarray(count).tolist(),
            "confidence": np.asarray(bin_conf).round(4).tolist(),
            "accuracy": np.asarray(bin_acc).round(4).tolist(),
        }
    }
    if num_members and samples.shape[0] % num_members == 0:
        trials = samples.shape[0] // num_members
        per_member = samples_j.reshape(num_members, trials, *samples.shape[1:])
        accs = [
            float(jnp.mean((majority_vote(per_member[m]) == labels_j).astype(jnp.float32)) * 100.0)
            for m in range(num_members)
        ]
        extra["per_member_mv_accuracy"] = [round(a, 2) for a in accs]
    # binomial 95% CI half-widths (percentage points) for the two accuracy
    # rows: claims like sampler-step sweeps must be judged against sampling
    # noise (round-3 verdict Next #4 — at n=140, sigma is +-2.6pp)
    n = int(labels.shape[0])

    def _ci95(acc_pct: float) -> float:
        p = min(max(acc_pct / 100.0, 0.0), 1.0)
        return round(196.0 * float(np.sqrt(p * (1.0 - p) / max(n, 1))), 2)

    return {
        **extra,
        "num_samples": int(samples.shape[0]),
        "num_instances": int(labels.shape[0]),
        "majority_vote_accuracy": mv_acc,
        "majority_vote_accuracy_ci95_pp": _ci95(mv_acc),
        "mean_confidence_accuracy_ci95_pp": _ci95(float(top1)),
        "mean_confidence_accuracy": float(top1),
        "ece": float(ece(conf, labels_j)),
        "nll": float(nll(conf, labels_j, eps=1e-12)),
        "brier": float(brier(conf, labels_j)),
        "piw_correct": np.asarray(piw_c).tolist(),
        "piw_incorrect": np.asarray(piw_i).tolist(),
        "mc_variance_correct": np.asarray(var_c).tolist(),
        "mc_variance_incorrect": np.asarray(var_i).tolist(),
        "temperature": float(temperature),
        "samples": samples,
        "labels": labels,
    }
