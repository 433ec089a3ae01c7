"""Nested-ensemble inference benchmark (the reference's headline workload).

Workload = the reference's test-time hot loop
(/root/reference/diffusion/classification_train_separately.py:767-777):
a batch of 224x224x3 images through SEViT guidance (ViT-B/16 + 5 mapping
MLPs) and then 5 ensemble members x 20 MC trials x 1000-step ancestral CARD
reverse diffusion, full-size ConditionalModel (150528 -> 4096 encoder,
4096-wide y-branch). Here the entire workload is one jitted program:
scan(1000) over vmap(members x trials x batch), bf16 params/compute.

Metric: ensemble inference images/sec (matches BASELINE.json).

vs_baseline: the reference publishes no throughput numbers (BASELINE.md), so
the baseline is an analytic HBM-BANDWIDTH FLOOR of the reference loop on its
required hardware (A100-40GB, README.md:39) — a bound, not a guess at
sustained FLOP/s:

* The loop runs 5 members x 20 trials x 1000 steps = 100,000 eps_theta
  forwards per 70-image batch, strictly sequentially
  (classification_train_separately.py:767-777).
* Each forward must stream the member's full fp32 weights from HBM again
  (no reuse across sequential calls): encoder 150528x4096 + 2x 4096x4096
  (latent_model.py:126-135) + y-branch 2x 4096x4096 + 3x 1001x4096
  timestep-embedding gates (latent_model.py:93-105) = 696M params = 2.78 GB.
* A100-40GB HBM bandwidth 1,555 GB/s -> >= 1.79 ms/forward -> >= 179 s per
  70-image batch -> <= 0.391 images/sec.

This is GENEROUS to the reference: it ignores activation traffic (the 42 MB
x_flat batch re-read per forward), ~20 kernel launches/forward, the guidance
ViT, and Python loop overhead — and the compute floor is lower (~95 GFLOP @
156 TFLOP/s TF32 peak = 0.6 ms), so bandwidth is binding. A measured
reference would land at ~0.2-0.4 img/s; we report value / 0.391 (the bound
that most FAVORS the reference). The previous 12-TFLOP/s-based estimate
(0.087 img/s) overstated the ratio ~4.5x and is retired.

Usage: python bench.py [--tiny] [--cpu] [--ddim N] [--batch B] [--trials K]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


# analytic A100-40GB HBM-bandwidth floor of the reference loop; see docstring
REFERENCE_BASELINE_IMG_PER_SEC = 0.391


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny shapes (smoke test)")
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    ap.add_argument("--ddim", type=int, default=0, help="use DDIM with N steps (0 = full 1000-step ancestral)")
    ap.add_argument("--eta", type=float, default=1.0,
                    help="strided-sampler stochasticity (eta=1 preserves MC "
                         "posterior quality; see examples/gmm_posterior.py)")
    ap.add_argument("--batch", type=int, default=70)
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--members", type=int, default=5)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--pallas", action="store_true",
                    help="use the fully-fused Pallas eps kernel in the scan body")
    ap.add_argument("--int8", action="store_true",
                    help="EXPERIMENTAL: int8 weights+activations for the two big "
                         "eps matmuls (2x MXU OPS on v5e)")
    ap.add_argument("--unroll", type=int, default=1, help="reverse-scan unroll factor")
    ap.add_argument("--train", action="store_true",
                    help="benchmark the diffusion-member training step instead "
                         "(full-size ConditionalModel, fp32 Adam + EMA)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # register CPU alongside the TPU so the big fp32 inits can happen in
        # host RAM; only the bf16 cast is transferred (the fp32 params +
        # their bf16 copies together would blow the 16 GB HBM)
        try:
            cur = jax.config.jax_platforms or "axon"
            if "cpu" not in cur:
                jax.config.update("jax_platforms", cur + ",cpu")
        except Exception:
            pass
    import jax.numpy as jnp

    from ladine_tpu.infer import nested_ensemble_sample, stack_members
    from ladine_tpu.models import ConditionalModel, SEViTGuidance
    from ladine_tpu.ops import DiffusionSchedule, ddim_timesteps

    if args.tiny:
        img, patch, embed, heads, depth = 32, 8, 32, 4, args.members
        feat = hidden = 64
        mlp_dims = (64, 32, 16)
        args.batch = min(args.batch, 8)
        args.timesteps = min(args.timesteps, 50)
    else:
        img, patch, embed, heads, depth = 224, 16, 768, 12, 12
        feat = hidden = 4096
        mlp_dims = (4096, 2048, 128)

    dtype = jnp.bfloat16 if not args.cpu else None
    M, B, K, T = args.members, args.batch, args.trials, args.timesteps

    guidance = SEViTGuidance(
        num_classes=2, num_members=M, vit_depth=depth,
        img_size=img, patch_size=patch, embed_dim=embed, num_heads=heads,
        mlp_hidden_dims=mlp_dims, dtype=dtype,
    )
    cond = ConditionalModel(
        data_dim=img * img * 3, feature_dim=feat, hidden_dim=hidden,
        y_dim=2, n_steps=T + 1, dtype=dtype,
    )
    sched = DiffusionSchedule.create("linear", T, 1e-4, 0.02)
    tau = ddim_timesteps(T, args.ddim) if args.ddim else None

    if args.train:
        return train_bench(args, img, feat, hidden, T, dtype)

    print(f"[bench] init: M={M} B={B} K={K} T={T} img={img} feat={feat} "
          f"sampler={'ddim%d' % args.ddim if args.ddim else 'ancestral'} "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)

    accel = jax.devices()[0]
    pdtype = jnp.bfloat16 if dtype is not None else jnp.float32

    # Throughput does not depend on parameter VALUES — build the exact
    # parameter structure via eval_shape (zero FLOPs, zero RNG) and fill with
    # deterministic small constants directly on the accelerator in bf16.
    # (A real RNG init of the ~7B fp32 values takes ~30 min of host threefry
    # and 2x the HBM; see git history.)
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (B, img, img, 3), jnp.float32)
    x_flat1 = jnp.zeros((1, img * img * 3), jnp.float32)

    def materialize(shapes, scale=0.02):
        i = [0]

        def fill(s):
            i[0] += 1
            # tiny deterministic values keep every activation finite
            val = scale * ((i[0] % 7) - 3) / 3.0
            return jnp.full(s.shape, val, pdtype if s.dtype == jnp.float32 else s.dtype)

        return jax.tree.map(fill, shapes)

    g_shapes = jax.eval_shape(lambda: guidance.init(jax.random.PRNGKey(1), images[:1]))
    gvars = materialize(g_shapes)
    m_shapes = jax.eval_shape(
        lambda: cond.init(jax.random.PRNGKey(2), x_flat1, jnp.zeros((1, 2)),
                          jnp.asarray(0), jnp.full((1, 2), 0.5))
    )
    one_member = materialize(m_shapes)
    # distinct members are irrelevant for throughput; broadcast-stack
    stacked = jax.tree.map(lambda x: jnp.broadcast_to(x, (M,) + x.shape), one_member)
    # BN running var must be positive
    stacked = dict(stacked)
    stacked["batch_stats"] = jax.tree.map(jnp.abs, stacked["batch_stats"])
    stacked["batch_stats"] = jax.tree.map(lambda x: x + 1.0, stacked["batch_stats"])
    print(f"[bench] params materialized on {accel.platform} ({pdtype.__name__})",
          file=sys.stderr)

    @jax.jit
    def infer(gvars, stacked, images, key):
        heads = guidance.apply(gvars, images)
        y0_hat = jax.nn.softmax(heads.astype(jnp.float32), axis=-1)[:M]
        xf = images.reshape(images.shape[0], -1)
        return nested_ensemble_sample(cond, stacked, xf, y0_hat, key, sched,
                                      mc_trials=K, tau=tau, eta=args.eta,
                                      use_pallas_eps=args.pallas,
                                      use_int8_eps=args.int8,
                                      unroll=args.unroll)

    # compile + warmup
    t0 = time.time()
    out = infer(gvars, stacked, images, jax.random.PRNGKey(2))
    out.block_until_ready()
    print(f"[bench] compile+first run: {time.time() - t0:.1f}s, out {out.shape} "
          f"finite={bool(jnp.isfinite(out.astype(jnp.float32)).all())}", file=sys.stderr)

    times = []
    for r in range(args.repeats):
        t0 = time.time()
        out = infer(gvars, stacked, images, jax.random.PRNGKey(3 + r))
        out.block_until_ready()
        times.append(time.time() - t0)
        print(f"[bench] run {r}: {times[-1]:.3f}s", file=sys.stderr)

    # pipelined throughput: issue the batches back-to-back (distinct keys)
    # and block once — the serving pattern, and it removes the per-dispatch
    # host<->device round trip that dominates short (DDIM) workloads when
    # measured one synchronous call at a time. Size the run to a multi-second
    # aggregate so remote-tunnel timing noise is negligible.
    reps = max(args.repeats, int(3.0 / max(min(times), 1e-3)) + 1)
    t0 = time.time()
    outs = [infer(gvars, stacked, images, jax.random.PRNGKey(100 + r))
            for r in range(reps)]
    jax.block_until_ready(outs)
    pipelined = (time.time() - t0) / reps
    print(f"[bench] pipelined: {pipelined:.3f}s/batch over {reps} batches",
          file=sys.stderr)

    best = min(times + [pipelined])
    img_per_sec = B / best
    result = {
        "metric": "ensemble_inference_images_per_sec",
        "value": round(img_per_sec, 3),
        "unit": f"images/sec ({M} members x {K} trials x "
                f"{args.ddim if args.ddim else T}-step reverse, batch {B})",
        "vs_baseline": round(img_per_sec / REFERENCE_BASELINE_IMG_PER_SEC, 1),
    }
    print(json.dumps(result))


def train_bench(args, img, feat, hidden, T, dtype):
    """Diffusion-member training throughput: one full-size member, the
    reference's per-step work (antithetic t, q_sample, eps forward+backward,
    clip, Adam, EMA) on a training batch. fp32 state (Adam numerics), bf16
    compute when on TPU."""
    import jax
    import jax.numpy as jnp

    from ladine_tpu.models import ConditionalModel
    from ladine_tpu.ops import DiffusionSchedule
    from ladine_tpu.train import create_member_state, make_member_step, make_optimizer

    B = args.batch if not args.tiny else 8  # default 70; reference trains at 30
    cond = ConditionalModel(data_dim=img * img * 3, feature_dim=feat,
                            hidden_dim=hidden, y_dim=2, n_steps=T + 1, dtype=dtype)
    sched = DiffusionSchedule.create("linear", T, 1e-4, 0.02)
    tx = make_optimizer("Adam", 1e-3, grad_clip=1.0)

    # structure via eval_shape, deterministic fill (see main bench)
    shapes = jax.eval_shape(
        lambda: create_member_state(cond, jax.random.PRNGKey(0), tx, batch_size=1)
    )
    i = [0]

    def fill(s):
        i[0] += 1
        return jnp.full(s.shape, 0.02 * ((i[0] % 7) - 3) / 3.0, s.dtype)

    state = jax.tree.map(fill, shapes)
    state = state.replace(
        batch_stats=jax.tree.map(lambda x: jnp.abs(x) + 1.0, state.batch_stats),
        step=jnp.asarray(0, jnp.int32),
    )
    # donate the state so XLA updates params/moments/EMA in place — without
    # donation the old + new state coexist and the fp32 member (~13 GB of
    # state) OOMs the 16 GB chip
    step = jax.jit(make_member_step(cond, tx, sched), donate_argnums=(0,))
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, img * img * 3), jnp.float32)
    y0 = jnp.eye(2)[jnp.tile(jnp.array([0, 1]), B // 2 + 1)[:B]]
    yhat = jnp.full((B, 2), 0.5)

    t0 = time.time()
    state, loss = step(state, x, y0, yhat, jax.random.PRNGKey(2))
    jax.block_until_ready(loss)
    print(f"[bench] train compile+first step: {time.time() - t0:.1f}s loss {float(loss):.4f}",
          file=sys.stderr)
    times = []
    for r in range(args.repeats):
        t0 = time.time()
        for _ in range(10):
            state, loss = step(state, x, y0, yhat, jax.random.PRNGKey(3 + r))
        jax.block_until_ready(loss)
        times.append((time.time() - t0) / 10)
        print(f"[bench] train run {r}: {times[-1] * 1e3:.1f} ms/step", file=sys.stderr)
    best = min(times)
    # Training vs_baseline is vs a REALISTIC estimate of the reference's A100
    # train step, derived the same way as the inference baseline: the step is
    # HBM-bound (fwd 2.78 GB weights + bwd ~5.6 GB + Adam read/write m/v/
    # params ~16.7 GB ~= 25 GB @ 1555 GB/s = 16 ms floor = 1875 img/s at
    # batch 30), degraded 2x for PyTorch-eager unfused Adam + the per-param
    # Python-loop EMA (reference ema.py:16-21) + per-batch guidance forward
    # -> ~940 img/s. A single v5e has 53% of an A100's HBM bandwidth, so
    # per-chip parity here is the expected outcome; training scales over the
    # TPU mesh (dryrun_multichip) while the reference is single-GPU.
    print(json.dumps({
        "metric": "diffusion_member_train_images_per_sec",
        "value": round(B / best, 1),
        "unit": f"images/sec (batch {B}, full-size member, fp32 Adam+EMA)",
        "vs_baseline": round((B / best) / 940.0, 2),
    }))


if __name__ == "__main__":
    main()
