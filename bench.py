"""Nested-ensemble benchmark battery (the reference's headline workloads).

Default (no args) runs the FULL battery and prints ONE self-contained JSON
line — the parity workload as the headline plus every other headline metric
under ``extra_metrics`` — so the driver-recorded BENCH_r*.json carries the
complete, driver-verified claim set:

  1. ancestral-1000     — the reference's exact test-time loop
     (/root/reference/diffusion/classification_train_separately.py:767-777):
     batch 70 images -> SEViT guidance (ViT-B/16 + 5 mapping MLPs) -> 5
     members x 20 MC trials x 1000-step ancestral CARD reverse diffusion,
     full-size ConditionalModel (150528->4096 encoder). One jitted program:
     scan(1000) over vmap(members x trials x batch), bf16.
  2. ddim50-eta1        — the serving sampler (strided, stochastic).
  3. ddim50-int8        — + int8 weights/activations on the two big eps matmuls.
  4. ddim10-int8        — the evidence-validated fast serving preset
     (RESULTS.md step-sweep: DDIM-10 at accuracy/ECE parity with DDIM-50).
  5. ddim10-int8-encode — + pre-quantized RESIDENT int8 enc_lin1 and
     mapping-head linear1 (the per-image fixed cost, kernels/int8.py).
  6. ddim10-int8-encode-maxbatch — config 5 at 4x the parity batch (280),
     the knee of the measured batch sweep (throughput serving point; the
     parity protocol stays batch 70 everywhere else).
  7. train-step         — full-size member training step (antithetic t,
     q_sample, eps fwd+bwd, clip, Adam, EMA), fp32 state.

Each completed battery record is ALSO appended to
``evidence/bench_partials.jsonl`` immediately (flushed), and a mid-battery
failure emits a single JSON line carrying every completed record plus the
error — a tunnel relay death after config N preserves configs 1..N (round-3
verdict Weak #5).

Focused single-config runs (old behavior, one plain JSON line):
  --tiny (CPU smoke / driver contract), --ddim N, --int8, --pallas, --train.

Timing methodology is recorded per metric ("timing" tag + both raw numbers):
``sync_best_s`` = best synchronous per-call wall time; ``pipelined_s`` =
back-to-back async dispatch amortized per batch (the serving pattern — it
hides the per-dispatch host round trip that dominates short DDIM workloads).
The headline value uses the better of the two and says which.

INFERENCE vs_baseline: the reference publishes no throughput numbers
(BASELINE.md), so the baseline is an analytic HBM-BANDWIDTH FLOOR of the
reference loop on its required hardware (A100-40GB, README.md:39) — a bound,
not a guess at sustained FLOP/s:

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

TRAINING vs_baseline: reported against a RANGE, because the reference's
actual A100 step time is unmeasurable in this image (torch is CPU-only
here). Lower bound of the range divisor = the analytic A100 HBM floor of
the reference's train step: fwd 2.78 GB weights + bwd ~5.6 GB + Adam
read/write m/v/params ~16.7 GB ~= 25 GB @ 1555 GB/s = 16 ms = 1875 img/s at
batch 30 — unachievable in practice (ignores activations, the per-batch
guidance ViT forward, eager-PyTorch kernel overhead, and the reference's
per-param Python-loop EMA, ema.py:16-21). Upper bound divisor = 940 img/s,
a 2x degradation ESTIMATE for those effects — plausible but asserted, not
measured. ``vs_baseline`` uses the conservative 1875 floor;
``vs_baseline_range`` reports [value/1875, value/940]. Either way the TPU
number is per chip and scales over the mesh (dryrun_multichip) while the
reference is single-GPU.

Usage: python bench.py                 # full battery, one JSON line
       python bench.py --tiny --cpu    # driver-contract smoke
       python bench.py --ddim 50 --int8 --batch 70   # focused config
"""

from __future__ import annotations

import argparse
import json
import sys
import time


# analytic A100-40GB HBM-bandwidth floor of the reference loop; see docstring
REFERENCE_BASELINE_IMG_PER_SEC = 0.391
# training-baseline range divisors; see docstring
TRAIN_BASELINE_FLOOR = 1875.0  # analytic A100 HBM floor (unachievable)
TRAIN_BASELINE_ESTIMATE = 940.0  # 2x-degraded eager-PyTorch estimate


def parse_args():
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
    ap.add_argument("--int8_encode", action="store_true",
                    help="int8 enc_lin1 (fixed-cost lever at short --ddim)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 weights+activations for the two big eps "
                         "matmuls (2x MXU OPS on v5e)")
    ap.add_argument("--pallas_int8", action="store_true",
                    help="fused Pallas int8 scan body (quantize-in-prologue "
                         "GEMM + epilogue + row-max, kernels/int8_pallas.py); "
                         "MC trials fold into GEMM rows")
    ap.add_argument("--pallas_v2", action="store_true",
                    help="with --pallas_int8: also fuse lin1 into lin2's "
                         "prologue and lin4 into lin3's epilogue (h1/h3 "
                         "never touch HBM)")
    ap.add_argument("--unroll", type=int, default=1, help="reverse-scan unroll factor")
    ap.add_argument("--latency", type=int, default=0,
                    help="focused runs: ALSO measure per-request latency "
                         "percentiles over N synchronous calls (online-"
                         "serving lens; batch via --batch). Through the "
                         "remote tunnel each sync call carries a ~30 ms "
                         "host round trip that direct-attached chips do "
                         "not pay — the record says so.")
    ap.add_argument("--train", action="store_true",
                    help="benchmark the diffusion-member training step only")
    ap.add_argument("--lowmem", action="store_true",
                    help="with --train: bf16 Adam/EMA state with stochastic "
                         "rounding (optim.lowmem) — cuts the analytic HBM "
                         "floor from 40*P to 28*P bytes/step")
    ap.add_argument("--full", action="store_true",
                    help="force the full battery even with --tiny/--cpu "
                         "(contract tests use this)")
    return ap.parse_args()


def _setup_platform(args):
    import os

    import jax

    # persistent compile cache: the battery compiles four full-size programs
    # and a remote-TPU compile is minutes each; reruns (and later rounds)
    # skip them entirely
    try:
        if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            jax.config.update("jax_compilation_cache_dir", "/tmp/ladine_jaxcache")
    except Exception:
        pass
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


def _dims(args):
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
    return img, patch, embed, heads, depth, feat, hidden, mlp_dims


def _materialize(shapes, pdtype, scale=0.02):
    """Throughput does not depend on parameter VALUES — build the exact
    parameter structure via eval_shape (zero FLOPs, zero RNG) and fill with
    deterministic small constants directly on the accelerator. (A real RNG
    init of the ~7B fp32 values takes ~30 min of host threefry and 2x the
    HBM; see git history.) Integer leaves (pre-quantized int8 kernels) get
    small nonzero ints — the fp fill value would round to 0."""
    import jax
    import jax.numpy as jnp

    i = [0]

    def fill(s):
        i[0] += 1
        if jnp.issubdtype(s.dtype, jnp.integer):
            return jnp.full(s.shape, (i[0] % 5) - 2, s.dtype)
        # tiny deterministic values keep every activation finite
        val = scale * ((i[0] % 7) - 3) / 3.0
        return jnp.full(s.shape, val, pdtype if s.dtype == jnp.float32 else s.dtype)

    return jax.tree.map(fill, shapes)


def run_inference(args, ddim, eta, use_int8, use_pallas, label,
                  int8_encode=False, batch=None, pallas_int8=False,
                  latency=None):
    """One inference configuration; returns its self-describing record.
    ``batch`` overrides args.batch for this config only (the max-throughput
    battery point). ``latency`` overrides args.latency for this config
    (battery rows that must carry per-request percentiles). All device
    buffers are dropped before returning (the train bench needs the HBM)."""
    import jax
    import jax.numpy as jnp

    from ladine_tpu.infer import nested_ensemble_sample
    from ladine_tpu.models import ConditionalModel, SEViTGuidance
    from ladine_tpu.ops import DiffusionSchedule, ddim_timesteps

    img, patch, embed, heads_n, depth, feat, hidden, mlp_dims = _dims(args)
    dtype = jnp.bfloat16 if not args.cpu else None
    M, B, K, T = (args.members, batch or args.batch, args.trials,
                  args.timesteps)

    guidance = SEViTGuidance(
        num_classes=2, num_members=M, vit_depth=depth,
        img_size=img, patch_size=patch, embed_dim=embed, num_heads=heads_n,
        mlp_hidden_dims=mlp_dims, dtype=dtype,
    )
    cond = ConditionalModel(
        data_dim=img * img * 3, feature_dim=feat, hidden_dim=hidden,
        y_dim=2, n_steps=T + 1, dtype=dtype,
    )
    sched = DiffusionSchedule.create("linear", T, 1e-4, 0.02)
    tau = ddim_timesteps(T, ddim) if ddim else None

    print(f"[bench:{label}] M={M} B={B} K={K} T={T} img={img} feat={feat} "
          f"sampler={'ddim%d' % ddim if ddim else 'ancestral'} int8={use_int8} "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)

    pdtype = jnp.bfloat16 if dtype is not None else jnp.float32
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (B, img, img, 3), jnp.float32)
    x_flat1 = jnp.zeros((1, img * img * 3), jnp.float32)

    g_shapes = jax.eval_shape(lambda: guidance.init(jax.random.PRNGKey(1), images[:1]))
    m_shapes = jax.eval_shape(
        lambda: cond.init(jax.random.PRNGKey(2), x_flat1, jnp.zeros((1, 2)),
                          jnp.asarray(0), jnp.full((1, 2), 0.5))
    )
    if int8_encode:
        # measure the RESIDENT pre-quantized path the Predictor runs.
        # Quantize at the SHAPE level and materialize the post-quantization
        # structure directly: quantize-after-materialize held the bf16 AND
        # int8 ensembles resident simultaneously (~+4.5 GB) and OOMed the
        # 16 GB chip on first hardware contact (BENCH r4, config 5/6).
        from ladine_tpu.kernels.int8 import (
            quantize_encoder,
            quantize_mapping_heads,
        )

        ids = tuple(range(M))
        m_shapes = jax.eval_shape(quantize_encoder, m_shapes)
        g_shapes = jax.eval_shape(
            lambda g: quantize_mapping_heads(g, ids), g_shapes)
    gvars = _materialize(g_shapes, pdtype)
    one_member = _materialize(m_shapes, pdtype)
    # distinct members are irrelevant for throughput; broadcast-stack
    stacked = jax.tree.map(lambda x: jnp.broadcast_to(x, (M,) + x.shape), one_member)
    # BN running var must be positive
    stacked = dict(stacked)
    stacked["batch_stats"] = jax.tree.map(jnp.abs, stacked["batch_stats"])
    stacked["batch_stats"] = jax.tree.map(lambda x: x + 1.0, stacked["batch_stats"])

    @jax.jit
    def infer(gvars, stacked, images, key):
        # only the M mapping heads are needed — heads_subset runs the ViT to
        # block M and skips the full 12-block forward (the reference loads 6
        # members but evaluates 5; same workload, less dead compute)
        if int8_encode:
            from ladine_tpu.kernels.int8 import int8_mapping_heads

            taps = guidance.apply(gvars, images, tuple(range(M)),
                                  method="taps_subset")
            heads = int8_mapping_heads(gvars, taps, tuple(range(M)))
        else:
            heads = guidance.apply(gvars, images, tuple(range(M)),
                                   method="heads_subset")
        y0_hat = jax.nn.softmax(heads.astype(jnp.float32), axis=-1)
        xf = images.reshape(images.shape[0], -1)
        return nested_ensemble_sample(cond, stacked, xf, y0_hat, key, sched,
                                      mc_trials=K, tau=tau, eta=eta,
                                      use_pallas_eps=use_pallas,
                                      use_int8_eps=use_int8,
                                      use_int8_encode=int8_encode,
                                      use_int8_pallas=pallas_int8,
                                      pallas_fuse_ends=args.pallas_v2,
                                      unroll=args.unroll)

    # compile + warmup
    t0 = time.time()
    out = infer(gvars, stacked, images, jax.random.PRNGKey(2))
    out.block_until_ready()
    print(f"[bench:{label}] compile+first run: {time.time() - t0:.1f}s, out {out.shape} "
          f"finite={bool(jnp.isfinite(out.astype(jnp.float32)).all())}", file=sys.stderr)

    times = []
    for r in range(args.repeats):
        t0 = time.time()
        out = infer(gvars, stacked, images, jax.random.PRNGKey(3 + r))
        out.block_until_ready()
        times.append(time.time() - t0)
        print(f"[bench:{label}] run {r}: {times[-1]:.3f}s", file=sys.stderr)

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
    print(f"[bench:{label}] pipelined: {pipelined:.3f}s/batch over {reps} batches",
          file=sys.stderr)

    sync_best = min(times)
    best = min(sync_best, pipelined)
    img_per_sec = B / best
    mfu = _mfu_fields(infer, (gvars, stacked, images, jax.random.PRNGKey(2)),
                      B, img_per_sec,
                      analytic=_analytic_inference_tflops(args, ddim))
    record = {
        "metric": "ensemble_inference_images_per_sec",
        "value": round(img_per_sec, 3),
        "unit": f"images/sec ({M} members x {K} trials x "
                f"{ddim if ddim else T}-step reverse, batch {B}"
                + (", int8 eps" if use_int8 else "")
                + (", int8 pallas-fused eps" if pallas_int8 else "")
                + (" v2" if pallas_int8 and args.pallas_v2 else "")
                + (", int8 encode+heads" if int8_encode else "") + ")",
        "vs_baseline": round(img_per_sec / REFERENCE_BASELINE_IMG_PER_SEC, 1),
        # self-describing timing methodology (ADVICE r2): which measurement
        # produced the headline value, plus both raw numbers
        "timing": "pipelined" if pipelined < sync_best else "sync",
        "sync_best_s": round(sync_best, 4),
        "pipelined_s": round(pipelined, 4),
        **mfu,
    }
    n_latency = args.latency if latency is None else latency
    if n_latency:
        # online-serving lens: one request = one synchronous round trip
        # (distinct keys so the remote runtime cannot dedupe dispatches)
        lat = []
        for r in range(n_latency):
            t0 = time.time()
            o = infer(gvars, stacked, images, jax.random.PRNGKey(1000 + r))
            o.block_until_ready()
            lat.append(time.time() - t0)
        lat.sort()

        def pct(p):
            return round(lat[min(len(lat) - 1, int(p * len(lat)))] * 1e3, 1)

        record.update({
            "latency_ms_p50": pct(0.50),
            "latency_ms_p90": pct(0.90),
            "latency_ms_p99": pct(0.99),
            "latency_samples": len(lat),
            "latency_note": ("synchronous per-request wall time incl. the "
                             "host dispatch round trip (~30 ms through the "
                             "remote tunnel; near-zero direct-attached — "
                             "compare pipelined_s for device-side cost)"),
        })
    # drop device buffers before the next section materializes its state
    del gvars, stacked, one_member, out, outs, infer
    return record


# TPU v5e peak: 197 bf16 TFLOP/s per chip (394 int8 TOPS). int8 configs are
# still reported against the bf16 peak (so >100% is possible there by
# design; the label says which peak was assumed).
V5E_BF16_PEAK_TFLOPS = 197.0


def _analytic_inference_tflops(args, ddim: int) -> dict:
    """Auditable matmul FLOP count of the inference workload, per image
    (round-3 verdict Next #8). XLA's cost_analysis counts a lax.scan BODY
    ONCE regardless of trip count, so it understates any reverse-chain
    program by ~the step count (measured: identical 'flops' for the
    1000-step and 50-step programs) — the headline TFLOPs must come from an
    explicit count. Convention: matmul (R,K)@(K,N) = 2*R*K*N FLOPs; only
    matmuls counted (elementwise/softmax/BN are bandwidth, not FLOPs, and
    contribute <1%).

    Workload anatomy (engine.py): per image the guidance ViT runs
    patch-embed + M transformer blocks (heads_subset stops at the deepest
    tap) + M mapping heads; each member encodes the image ONCE (encoder is
    t/y-independent — computed outside the trial vmap and timestep scan);
    the per-step work is the eps y-branch, dominated by two
    feature_dim^2 matmuls, executed M*K*steps times.
    """
    img, patch, embed, _, _, feat, hidden, mlp_dims = _dims(args)
    M, K, C = args.members, args.trials, 2
    steps = ddim if ddim else args.timesteps
    n_tok = (img // patch) ** 2
    data_dim = img * img * 3

    patch_embed = 2 * n_tok * (patch * patch * 3) * embed
    # per ViT block: qkv 6NE^2 + proj 2NE^2 + mlp(4x) 16NE^2 + scores/values 4N^2E
    vit_blocks = M * (24 * n_tok * embed**2 + 4 * n_tok**2 * embed)
    head_dims = (n_tok * embed,) + tuple(mlp_dims) + (C,)
    heads = M * sum(2 * a * b for a, b in zip(head_dims[:-1], head_dims[1:]))
    encode = M * 2 * (data_dim * feat + feat * hidden + hidden * hidden)
    fixed = patch_embed + vit_blocks + heads + encode
    # eps y-branch per step: lin1 (2C->F) + lin2 (F^2) + lin3 (F^2) + lin4 (F->C)
    per_step = 2 * (2 * C * feat + feat * hidden + hidden * hidden + hidden * C)
    total = fixed + M * K * steps * per_step
    return {
        "workload_tflops_per_image": float(f"{total / 1e12:.4g}"),
        "flops_method": (
            "analytic matmul count (2*R*K*N): guidance patch-embed + "
            f"{M} ViT blocks + {M} mapping heads + {M} member encodes "
            f"(once per image) + {M}x{K}x{steps} eps y-branch steps; "
            "XLA cost_analysis counts scan bodies once and is reported "
            "raw under xla_cost_tflops_per_image as a fixed-cost "
            "cross-check"),
    }


def _mfu_fields(jitted, example_args, batch, img_per_sec, analytic=None):
    """Per-image TFLOPs and model FLOP utilization against the v5e bf16 peak.

    ``analytic``: the _analytic_inference_tflops dict for scan-based
    programs — XLA's cost_analysis counts a scan body once, so for those the
    analytic count is the headline and the XLA number rides along raw as
    ``xla_cost_tflops_per_image`` (a fixed-cost cross-check). Scan-free
    programs (the train step) use the XLA count directly. Best-effort on
    the XLA side: the cost-analysis fields are omitted if the backend
    exposes none."""
    import jax

    xla_tpi = None
    try:
        compiled = jitted.lower(*example_args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost["flops"])
        if flops > 0:
            xla_tpi = flops / batch / 1e12
    except Exception as e:  # noqa: BLE001 — diagnostics only, never fatal
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)

    fields = {}
    if analytic is not None:
        fields.update(analytic)
        if xla_tpi is not None:
            fields["xla_cost_tflops_per_image"] = float(f"{xla_tpi:.4g}")
        tflops_per_img = analytic["workload_tflops_per_image"]
    elif xla_tpi is not None:
        fields["workload_tflops_per_image"] = float(f"{xla_tpi:.4g}")
        fields["flops_method"] = "XLA cost_analysis of the compiled program"
        tflops_per_img = xla_tpi
    else:
        return fields
    if jax.devices()[0].platform != "cpu":
        fields["mfu_pct"] = round(
            100.0 * img_per_sec * tflops_per_img / V5E_BF16_PEAK_TFLOPS, 1)
        fields["mfu_peak_assumed"] = f"v5e bf16 {V5E_BF16_PEAK_TFLOPS:.0f} TFLOP/s"
    return fields


def train_bench(args, lowmem=False):
    """Diffusion-member training throughput: one full-size member, the
    reference's per-step work (antithetic t, q_sample, eps forward+backward,
    clip, Adam, EMA) on a training batch. fp32 state (Adam numerics), bf16
    compute when on TPU."""
    import jax
    import jax.numpy as jnp

    from ladine_tpu.models import ConditionalModel
    from ladine_tpu.ops import DiffusionSchedule
    from ladine_tpu.train import create_member_state, make_member_step, make_optimizer

    img, _, _, _, _, feat, hidden, _ = _dims(args)
    T = args.timesteps
    dtype = jnp.bfloat16 if not args.cpu else None
    B = args.batch if not args.tiny else 8  # default 70; reference trains at 30
    cond = ConditionalModel(data_dim=img * img * 3, feature_dim=feat,
                            hidden_dim=hidden, y_dim=2, n_steps=T + 1, dtype=dtype)
    sched = DiffusionSchedule.create("linear", T, 1e-4, 0.02)
    tx = make_optimizer("Adam", 1e-3, grad_clip=1.0, lowmem=lowmem)

    # structure via eval_shape, deterministic fill (see _materialize; fp32
    # state is kept fp32 — Adam numerics are part of the workload; with
    # --lowmem the moments/EMA come out bf16 from the factories)
    shapes = jax.eval_shape(
        lambda: create_member_state(cond, jax.random.PRNGKey(0), tx,
                                    batch_size=1, lowmem=lowmem)
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
    print(f"[bench:train] compile+first step: {time.time() - t0:.1f}s loss {float(loss):.4f}",
          file=sys.stderr)
    times = []
    for r in range(args.repeats):
        t0 = time.time()
        for _ in range(10):
            state, loss = step(state, x, y0, yhat, jax.random.PRNGKey(3 + r))
        jax.block_until_ready(loss)
        times.append((time.time() - t0) / 10)
        print(f"[bench:train] run {r}: {times[-1] * 1e3:.1f} ms/step", file=sys.stderr)
    best = min(times)
    value = B / best
    mfu = _mfu_fields(step, (state, x, y0, yhat, jax.random.PRNGKey(2)),
                      B, value)
    state_desc = ("bf16 Adam+EMA state, stochastic rounding" if lowmem
                  else "fp32 Adam+EMA")
    record = {
        **mfu,
        "metric": "diffusion_member_train_images_per_sec",
        "value": round(value, 1),
        "unit": f"images/sec (batch {B}, full-size member, {state_desc})",
        # conservative: against the unachievable analytic A100 floor; the
        # range's upper end divides by the 2x-degraded eager estimate (see
        # module docstring — the 2x is asserted, not measured)
        "vs_baseline": round(value / TRAIN_BASELINE_FLOOR, 2),
        "vs_baseline_range": [round(value / TRAIN_BASELINE_FLOOR, 2),
                              round(value / TRAIN_BASELINE_ESTIMATE, 2)],
        "timing": "sync",
        "sync_best_s": round(best, 4),
        **_train_hbm_fields(state, best, lowmem),
    }
    if lowmem:
        record["name"] = "train_step_lowmem"
    del state, step
    return record


# v5e HBM bandwidth per chip (GB/s) — the binding roofline for the train step
V5E_HBM_GBPS = 819.0


def _train_hbm_fields(state, step_s: float, lowmem: bool = False) -> dict:
    """HBM-utilization lens for the training record. The train step is
    BANDWIDTH-bound, not FLOP-bound — its MXU utilization is ~2.5% by
    construction (one batch of rows against ~0.7B fp32 params), so MFU is
    the wrong roofline; what the step can't avoid is moving the optimizer
    state. Analytic FLOOR of bytes/step (fp32, 4 bytes/elt, P = member
    param count): fwd param read 4P + bwd weight re-read 4P + update read
    params+m+v+ema 16P + update write params+m+v+ema 16P = 40P — it
    ignores gradient materialization, activations, and schedule arrays, so
    the reported utilization is a LOWER bound on what the chip actually
    sustained."""
    import jax

    p = sum(int(x.size) for x in jax.tree.leaves(state.params))
    # lowmem: moments + EMA are 2-byte bf16 -> state read/write drop from
    # 16P each to 10P each (params 4P + m/v/ema 3*2P)
    bpp = 28.0 if lowmem else 40.0
    floor_gb = bpp * p / 1e9
    fields = {
        "hbm_floor_gb_per_step": round(floor_gb, 2),
        "hbm_method": (f"analytic traffic floor {bpp:.0f}*P bytes "
                       "(fwd 4P + bwd 4P + Adam/EMA state read "
                       f"{'10P' if lowmem else '16P'} + write "
                       f"{'10P' if lowmem else '16P'}), P = member params"),
    }
    if jax.devices()[0].platform != "cpu":
        fields["hbm_util_pct"] = round(
            100.0 * floor_gb / step_s / V5E_HBM_GBPS, 1)
        fields["hbm_peak_assumed"] = f"v5e {V5E_HBM_GBPS:.0f} GB/s"
    return fields


def _preflight_device(args, timeout_s: float = 180.0) -> None:
    """Fail FAST with a diagnostic record if the accelerator backend is
    unreachable. A dead remote-TPU tunnel makes jax.devices() block forever
    in the main process (relay death, docs/OPERATIONS.md failure modes) —
    probing in a subprocess turns an indefinite driver hang into one JSON
    error line and a nonzero exit. A probe that silently falls back to CPU
    (the accelerator plugin erroring fast instead of hanging) is ALSO a
    failure: this invocation asked for the accelerator."""
    import subprocess
    import sys as _sys

    try:
        res = subprocess.run(
            [_sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        platform = (res.stdout or "").strip().splitlines()[-1:] or [""]
        if res.returncode == 0 and platform[0] != "cpu":
            return
        detail = ("probe fell back to CPU" if res.returncode == 0
                  else (res.stderr or "")[-400:])
    except subprocess.TimeoutExpired:
        detail = f"jax.devices() did not return within {timeout_s:.0f}s"
    # TCP scan of the relay's forwarded ports: distinguishes the dead-relay
    # failure mode (all refusing) from a live relay with a plugin error
    import socket

    open_ports = []
    for port in (8082, 8083, 8087, 8092, 8093, 8097):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                open_ports.append(port)
        except OSError:
            pass
    detail += (f"; relay ports open: {open_ports or 'NONE (relay dead)'}")
    metric = ("diffusion_member_train_images_per_sec" if args.train
              else "ensemble_inference_images_per_sec")
    print(json.dumps({
        "metric": metric,
        "value": 0,
        "unit": "images/sec",
        "vs_baseline": 0,
        "error": "accelerator backend unreachable (dead tunnel relay? "
                 "docs/OPERATIONS.md failure modes): " + detail.strip(),
        **_stale_evidence_fields(),
    }))
    raise SystemExit(2)


def _stale_evidence_fields() -> dict:
    """Context for an unreachable-backend record: the newest
    hardware-verified battery this repo has on disk, clearly labeled STALE.
    The value stays 0 (nothing was measured NOW) — this only makes the
    diagnostic auditable: which numbers exist, from when, where."""
    import os

    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "evidence", "bench_battery.json")
        with open(path) as f:
            rec = json.load(f)
        names = [rec.get("name")] + [e.get("name")
                                     for e in rec.get("extra_metrics", [])]
        return {"last_hardware_evidence": {
            "stale": True,
            "file": "evidence/bench_battery.json",
            "file_mtime_utc": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime(os.path.getmtime(path))),
            "headline": {k: rec.get(k) for k in
                         ("metric", "value", "unit", "vs_baseline")},
            "battery_names": [n for n in names if n],
        }}
    except (OSError, ValueError):
        return {}


def main():
    args = parse_args()
    if not args.cpu:
        _preflight_device(args)
    _setup_platform(args)

    focused = (args.tiny or args.train or args.ddim or args.int8
               or args.int8_encode or args.pallas
               or args.pallas_int8) and not args.full
    if args.train and not args.full:
        print(json.dumps(train_bench(args, lowmem=args.lowmem)))
        return
    if focused:
        print(json.dumps(run_inference(args, args.ddim, args.eta, args.int8,
                                       args.pallas, "focused",
                                       int8_encode=args.int8_encode,
                                       pallas_int8=args.pallas_int8)))
        return

    print(json.dumps(_run_battery(args)))


PARTIALS_PATH = "evidence/bench_partials.jsonl"


def _persist_partial(rec):
    """Append one completed battery record to the partials file and flush —
    a mid-battery tunnel death must not erase the configs that DID run."""
    import os

    try:
        os.makedirs(os.path.dirname(PARTIALS_PATH), exist_ok=True)
        with open(PARTIALS_PATH, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
    except OSError as e:
        print(f"[bench] partial persist failed: {e}", file=sys.stderr)


def _run_battery(args):
    """Full battery: every headline metric in one driver-verified record.
    Runs configs in sequence, persisting each record as it completes; on a
    mid-battery failure, emits the completed records plus the error instead
    of losing everything, and exits nonzero."""
    import os
    import signal

    # a polite kill (driver stall-logic, operator Ctrl-C) should flow
    # through the partial-emission path, not vaporize the run
    def _sigterm(signum, frame):
        raise RuntimeError("SIGTERM")

    signal.signal(signal.SIGTERM, _sigterm)

    configs = [
        ("ancestral_1000_parity_workload",
         lambda: run_inference(args, 0, args.eta, False, False, "ancestral")),
        ("serving_ddim50_eta1",
         lambda: run_inference(args, 50, 1.0, False, False, "ddim50")),
        ("serving_ddim50_int8",
         lambda: run_inference(args, 50, 1.0, True, False, "ddim50-int8")),
        # fast serving preset: the full-dims evidence run (RESULTS.md
        # step-sweep rows) measures DDIM-10 at accuracy/ECE parity with
        # DDIM-50, so the 10-step program is a validated point, not a shortcut
        ("serving_ddim10_int8",
         lambda: run_inference(args, 10, 1.0, True, False, "ddim10-int8")),
        # + resident pre-quantized encoder/head weights: the per-image fixed
        # cost that dominates at 10 steps (kernels/int8.py)
        ("serving_ddim10_int8_encode",
         lambda: run_inference(args, 10, 1.0, True, False,
                               "ddim10-int8-encode", int8_encode=True)),
        # max-throughput point of the measured batch sweep (one v5e chip,
        # 2026-08-18: batch 70/140/280/420 = 1414/1600/1662/1544 img/s,
        # 560 OOMs the 16 GB chip): the per-batch fixed cost (int8 weight
        # stream + guidance) amortizes up to 4x the parity protocol's
        # batch 70, then XLA tiling falls off. Capped at the 280 ABSOLUTE
        # knee so a non-default --batch can never push this config past
        # the validated point (420 regresses, 560 OOMs).
        # the knee row carries per-request latency percentiles so serving
        # claims are throughput AND latency (round-4 verdict Next #7);
        # 100 synchronous round trips ~ +45 s through the remote tunnel
        ("serving_ddim10_int8_encode_maxbatch",
         lambda: run_inference(args, 10, 1.0, True, False,
                               "ddim10-int8-encode-maxbatch",
                               int8_encode=True,
                               batch=min(args.batch * 4, 280),
                               latency=0 if args.tiny else 100)),
        ("train_step", lambda: train_bench(args)),
        # the lowmem A/B rides in the default battery so the driver's
        # round-end run measures it on chip without a separate invocation
        # (round-4 verdict Next #3)
        ("train_step_lowmem", lambda: train_bench(args, lowmem=True)),
    ]
    fail_after = int(os.environ.get("LADINE_BENCH_FAIL_AFTER", "0") or 0)
    # start marker carries the config class so smoke records can never be
    # mistaken for accelerator evidence in the partials file
    _persist_partial({"battery_start": True, "tiny": bool(args.tiny),
                      "cpu": bool(args.cpu),
                      "t": time.strftime("%Y-%m-%dT%H:%M:%S")})
    done, err = [], None
    for idx, (name, fn) in enumerate(configs):
        if fail_after and idx >= fail_after:
            err = f"{name}: RuntimeError: injected failure (test hook)"
            break
        try:
            rec = fn()
        except BaseException as e:  # noqa: BLE001 — partials must survive
            err = f"{name}: {type(e).__name__}: {e}"
            break
        rec["name"] = name
        done.append(rec)
        _persist_partial(rec)
    headline = next((r for r in done
                     if r["name"] == "ancestral_1000_parity_workload"), None)
    if headline is not None:
        result = {**headline,
                  "extra_metrics": [r for r in done if r is not headline]}
    else:
        result = {"metric": "ensemble_inference_images_per_sec", "value": 0,
                  "unit": "images/sec", "vs_baseline": 0,
                  "extra_metrics": done}
    if err is not None:
        result["error"] = (f"battery aborted at config {len(done) + 1}/"
                           f"{len(configs)}: {err}; completed records above")
        print(json.dumps(result))
        raise SystemExit(2)
    return result


if __name__ == "__main__":
    main()
