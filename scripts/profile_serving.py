"""Decompose the serving (DDIM-50) batch time into its components on real
hardware — the tool for VERDICT r1 Weak #4 ("serving fixed cost unexplained").

Times, as multi-second aggregates (tunnel-safe):
  guidance   — SEViT guidance forward alone (ViT taps + full + 5 MLP heads)
  encode     — member-vmapped image-feature GEMMs alone
  scan-only  — nested_ensemble_sample with PRECOMPUTED y0_hat (no guidance)
  full       — guidance + sampling, the bench.py workload
  vit-only   — bare ViT full forward (no taps, no MLP heads)

full - scan_only ~= guidance; scan_only - scan_flops_est = per-step overhead.

Usage: python scripts/profile_serving.py [--ddim 50] [--reps 10] [--batch 70]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def timeit(fn, reps, argsets):
    """argsets: list of distinct argument tuples, cycled — identical
    repeated dispatches can be elided/deduped by the remote runtime, so
    every rep gets different inputs."""
    import jax

    out = fn(*argsets[0])
    jax.block_until_ready(out)  # compile
    outs = []
    t0 = time.time()
    for i in range(reps):
        outs.append(fn(*argsets[i % len(argsets)]))
    jax.block_until_ready(outs)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ddim", type=int, default=50)
    ap.add_argument("--eta", type=float, default=1.0)
    ap.add_argument("--batch", type=int, default=70)
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--members", type=int, default=5)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--pallas", action="store_true",
                    help="Pallas flash attention inside the guidance ViT")
    ap.add_argument("--int8", action="store_true",
                    help="also time the int8 (XLA) scan-only row")
    ap.add_argument("--int8_encode", action="store_true",
                    help="also time the resident-int8 encode / taps / "
                         "mapping-head components (the 'fast' preset's "
                         "fixed cost, kernels/int8.py)")
    ap.add_argument("--pallas_int8", action="store_true",
                    help="also time the fused Pallas int8 scan-only row "
                         "(kernels/int8_pallas.py) — the scan-level A/B "
                         "against scan_int8_ms")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        try:
            # keep the CPU backend reachable next to the accelerator; the
            # platform name varies (tpu, or a tunneled plugin), so only
            # amend an explicit setting — unset means auto-select, which
            # already keeps cpu available.
            cur = jax.config.jax_platforms
            if cur and "cpu" not in cur:
                jax.config.update("jax_platforms", cur + ",cpu")
        except Exception:
            pass
    import jax.numpy as jnp

    from ladine_tpu.infer import nested_ensemble_sample
    from ladine_tpu.models import ConditionalModel, SEViTGuidance
    from ladine_tpu.ops import DiffusionSchedule, ddim_timesteps

    if args.tiny:
        img, patch, embed, heads_n, depth = 32, 8, 32, 4, args.members
        feat = 64
        mlp_dims = (64, 32, 16)
        args.batch, args.trials = 8, 4
        T = 50
    else:
        img, patch, embed, heads_n, depth = 224, 16, 768, 12, 12
        feat = 4096
        mlp_dims = (4096, 2048, 128)
        T = 1000

    dtype = None if args.cpu else jnp.bfloat16
    M, B, K = args.members, args.batch, args.trials
    guidance = SEViTGuidance(num_classes=2, num_members=M, vit_depth=depth,
                             img_size=img, patch_size=patch, embed_dim=embed,
                             num_heads=heads_n, mlp_hidden_dims=mlp_dims, dtype=dtype,
                             use_pallas_attention=args.pallas)
    cond = ConditionalModel(data_dim=img * img * 3, feature_dim=feat,
                            hidden_dim=feat, y_dim=2, n_steps=T + 1, dtype=dtype)
    sched = DiffusionSchedule.create("linear", T, 1e-4, 0.02)
    tau = ddim_timesteps(T, args.ddim)

    pdtype = jnp.bfloat16 if dtype is not None else jnp.float32
    images = jax.random.uniform(jax.random.PRNGKey(0), (B, img, img, 3), jnp.float32)

    def materialize(shapes, scale=0.02):
        i = [0]

        def fill(s):
            i[0] += 1
            val = scale * ((i[0] % 7) - 3) / 3.0
            return jnp.full(s.shape, val, pdtype if s.dtype == jnp.float32 else s.dtype)

        return jax.tree.map(fill, shapes)

    gvars = materialize(jax.eval_shape(lambda: guidance.init(jax.random.PRNGKey(1), images[:1])))
    one = materialize(jax.eval_shape(
        lambda: cond.init(jax.random.PRNGKey(2), jnp.zeros((1, img * img * 3)),
                          jnp.zeros((1, 2)), jnp.asarray(0), jnp.full((1, 2), 0.5))))
    stacked = dict(jax.tree.map(lambda x: jnp.broadcast_to(x, (M,) + x.shape), one))
    stacked["batch_stats"] = jax.tree.map(lambda x: jnp.abs(x) + 1.0, stacked["batch_stats"])

    x_flat = images.reshape(B, -1)
    y0_hat = jnp.full((M, B, 2), 0.5, jnp.float32)
    key = jax.random.PRNGKey(3)

    g_fn = jax.jit(lambda g, im: guidance.apply(g, im))
    subset = tuple(range(M))  # the serving head set: mapping heads only
    gs_fn = jax.jit(lambda g, im: guidance.apply(g, im, subset, method="heads_subset"))
    vit_fn = jax.jit(lambda g, im: guidance.apply(g, im, method="vit_logits"))
    enc_fn = jax.jit(lambda s, xf: jax.vmap(lambda v: cond.apply(v, xf, method="encode"))(s))
    scan_fn = jax.jit(lambda s, yh, k: nested_ensemble_sample(
        cond, s, x_flat, yh, k, sched, mc_trials=K, tau=tau, eta=args.eta))
    scan_int8_fn = jax.jit(lambda s, yh, k: nested_ensemble_sample(
        cond, s, x_flat, yh, k, sched, mc_trials=K, tau=tau, eta=args.eta,
        use_int8_eps=True))
    scan_pallas_int8_fn = jax.jit(lambda s, yh, k: nested_ensemble_sample(
        cond, s, x_flat, yh, k, sched, mc_trials=K, tau=tau, eta=args.eta,
        use_int8_pallas=True))
    scan_pallas_v2_fn = jax.jit(lambda s, yh, k: nested_ensemble_sample(
        cond, s, x_flat, yh, k, sched, mc_trials=K, tau=tau, eta=args.eta,
        use_int8_pallas=True, pallas_fuse_ends=True))
    if args.int8_encode:
        # resident pre-quantized trees, exactly as the Predictor holds them
        from ladine_tpu.kernels.int8 import (
            int8_encode,
            int8_mapping_heads,
            quantize_encoder,
            quantize_mapping_heads,
        )

        stacked_q = jax.jit(jax.vmap(quantize_encoder))(stacked)
        gvars_q = jax.jit(lambda g: quantize_mapping_heads(g, subset))(gvars)
        enc_int8_fn = jax.jit(
            lambda s, xf: jax.vmap(lambda v: int8_encode(v, xf))(s))
        taps_fn = jax.jit(
            lambda g, im: guidance.apply(g, im, subset, method="taps_subset"))
        heads_int8_fn = jax.jit(
            lambda g, im: int8_mapping_heads(
                g, guidance.apply(g, im, subset, method="taps_subset"), subset))

    def full_fn(g, s, im, k):
        # all K+1 heads — the pre-round-3 serving path, kept for comparison
        heads = guidance.apply(g, im)
        yh = jax.nn.softmax(heads.astype(jnp.float32), axis=-1)[:M]
        return nested_ensemble_sample(cond, s, im.reshape(B, -1), yh, k, sched,
                                      mc_trials=K, tau=tau, eta=args.eta)

    def full_subset_fn(g, s, im, k):
        # the CURRENT serving path: only the M mapping heads are computed
        heads = guidance.apply(g, im, subset, method="heads_subset")
        yh = jax.nn.softmax(heads.astype(jnp.float32), axis=-1)
        return nested_ensemble_sample(cond, s, im.reshape(B, -1), yh, k, sched,
                                      mc_trials=K, tau=tau, eta=args.eta)

    full_jit = jax.jit(full_fn)
    full_subset_jit = jax.jit(full_subset_fn)

    # distinct inputs per rep (identical dispatches get deduped remotely)
    n_var = 8
    img_vars = [images + (i + 1) * 1e-6 for i in range(n_var)]
    yh_vars = [y0_hat + (i + 1) * 1e-7 for i in range(n_var)]
    keys = list(jax.random.split(key, n_var))

    results = {}
    # the cheap component fns need many more reps for a trustworthy
    # multi-second aggregate through the tunnel (sub-ms timings lie)
    for name, fn, argsets, mult in [
        ("vit_only_ms", vit_fn, [(gvars, im) for im in img_vars], 40),
        ("guidance_ms", g_fn, [(gvars, im) for im in img_vars], 40),
        ("guidance_subset_ms", gs_fn, [(gvars, im) for im in img_vars], 40),
        ("encode_ms", enc_fn, [(stacked, im.reshape(B, -1)) for im in img_vars], 20),
        ("scan_only_ms", scan_fn, [(stacked, yh, k) for yh, k in zip(yh_vars, keys)], 1),
    ] + ([
        ("scan_int8_ms", scan_int8_fn,
         [(stacked, yh, k) for yh, k in zip(yh_vars, keys)], 1),
    ] if args.int8 else []) + ([
        ("scan_pallas_int8_ms", scan_pallas_int8_fn,
         [(stacked, yh, k) for yh, k in zip(yh_vars, keys)], 1),
        ("scan_pallas_v2_ms", scan_pallas_v2_fn,
         [(stacked, yh, k) for yh, k in zip(yh_vars, keys)], 1),
    ] if args.pallas_int8 else []) + ([
        ("encode_int8_ms", enc_int8_fn,
         [(stacked_q, im.reshape(B, -1)) for im in img_vars], 20),
        ("taps_subset_ms", taps_fn, [(gvars_q, im) for im in img_vars], 20),
        ("heads_int8_ms", heads_int8_fn, [(gvars_q, im) for im in img_vars], 20),
    ] if args.int8_encode else []) + [
        ("full_ms", full_jit, [(gvars, stacked, im, k) for im, k in zip(img_vars, keys)], 1),
        ("full_subset_ms", full_subset_jit,
         [(gvars, stacked, im, k) for im, k in zip(img_vars, keys)], 1),
    ]:
        t = timeit(fn, args.reps * mult, argsets) * 1e3
        results[name] = round(t, 2)
        print(f"[profile] {name}: {t:.2f} ms", file=sys.stderr)

    results["fixed_cost_ms"] = round(results["full_ms"] - results["scan_only_ms"], 2)
    results["fixed_cost_subset_ms"] = round(
        results["full_subset_ms"] - results["scan_only_ms"], 2)
    results["batch"] = B
    results["img_per_sec_full"] = round(B / (results["full_ms"] / 1e3), 1)
    results["img_per_sec_subset"] = round(B / (results["full_subset_ms"] / 1e3), 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
