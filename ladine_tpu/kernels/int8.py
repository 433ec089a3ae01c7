"""Experimental int8 inference path for the eps-net's hot matmuls.

The v5e MXU does 2x int8 OPS vs bf16 (394 vs 197 T); the reverse-diffusion
step is dominated by two feature_dim^2 matmuls (docs/DESIGN.md §1), so
weight+activation int8 with per-channel/per-row scales can approach ~1.5x
end-to-end after quantization overhead.

Scheme: symmetric max-abs — weights quantized per OUTPUT channel offline,
activations per ROW dynamically each step. Accumulation in int32
(lax.dot_general(preferred_element_type=int32) hits the int8 MXU path),
dequantized by the product of the two scales, then the folded gate/BN affine
and softplus in fp32.

EXPERIMENTAL: accuracy/ECE impact must be validated on real data before
production use (docs/ROADMAP.md #2). Gated behind ``use_int8_eps``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ladine_tpu.kernels.fused_eps import _fold


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(K, N) float -> (int8 (K, N), per-output-channel scale (N,))."""
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def int8_matmul(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    w_colsum: jnp.ndarray = None,
) -> jnp.ndarray:
    """(R, K) float @ int8 (K, N) -> (R, N) fp32, dynamic per-row activation
    quantization.

    With ``w_colsum`` (per-channel sum of w_q, precomputed) the activation is
    treated as NON-NEGATIVE and quantized with a fixed zero-point of 127:
    h ~ (q + 127) * s with q in [-127, 127], doubling the resolution for
    softplus outputs (symmetric quant would waste the sign half of int8):
    x @ W = s * ((q @ W_q) + 127 * colsum(W_q)) * w_scale.
    """
    x = x.astype(jnp.float32)
    if w_colsum is None:
        x_scale = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
        x_scale = jnp.maximum(x_scale, 1e-8)
        x_q = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    else:
        x_scale = jnp.max(x, axis=1, keepdims=True) / 254.0
        x_scale = jnp.maximum(x_scale, 1e-8)
        x_q = jnp.clip(jnp.round(x / x_scale) - 127.0, -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32) + 127.0 * w_colsum[None, :]
    return acc * x_scale * w_scale[None, :]


def quantize_member(variables: Any) -> Any:
    """Pre-quantize the two big y-branch kernels of one member's variables;
    returns {'int8': {lin2/lin3: (w_q, scale)}, **variables}."""
    params = variables["params"]
    q = {}
    for name in ("lin2", "lin3"):
        w = params[name]["TorchLinear_0"]["Dense_0"]["kernel"]
        w_q, scale = quantize_weight(jnp.asarray(w, jnp.float32))
        colsum = jnp.sum(w_q.astype(jnp.int32), axis=0).astype(jnp.float32)
        q[name] = (w_q, scale, colsum)
    return {**variables, "int8": q}


def int8_eps(
    qvars: Any,
    f: jnp.ndarray,
    y: jnp.ndarray,
    t: jnp.ndarray,
    y_hat: jnp.ndarray,
) -> jnp.ndarray:
    """eps forward with int8 lin2/lin3 (the >99%-of-FLOPs layers); lin1/lin4
    and all affines compute in fp32. Mirrors kernels/fused_eps.fused_eps.

    The hidden-size intermediates are STORED in the model's compute dtype
    (``f.dtype`` — bf16 on TPU, fp32 on CPU): each (R, hidden) tensor the
    scan body materializes costs an HBM round trip, and at serving shapes
    that elementwise traffic is ~half the measured per-step time (B=280
    sweep, 2026-08-18: 9.5 ms/step vs the ~4.8 ms int8 GEMM floor) — fp32
    storage doubles it for precision the path cannot use, because h is
    about to be rounded to int8 anyway (per-row max-abs, >=0.4% rel) and
    the bf16 non-int8 path already matches fp32 accuracy to four decimals
    (RESULTS.md int8/bf16 rows). Scale math and accumulation stay fp32."""
    params = qvars["params"]
    stats = qvars["batch_stats"]
    cdtype = f.dtype
    y_in = jnp.concatenate([y, y_hat], axis=-1)

    w1, a1, c1 = _fold(params["lin1"], params["unetnorm1"], stats["unetnorm1"], t)
    h = jax.nn.softplus(
        jnp.dot(y_in, w1, preferred_element_type=jnp.float32) * a1 + c1
    ).astype(cdtype)
    h = f * h

    for i, (name, bn) in enumerate((("lin2", "unetnorm2"), ("lin3", "unetnorm3"))):
        # _fold's (a, c) absorb the timestep gate, the linear bias and the
        # eval BN, so the int8 matmul only needs to produce x @ W.
        # lin2's input (f (.) softplus) can be negative -> symmetric quant;
        # lin3's input is a softplus output -> non-negative zero-point-127
        # quant for double the resolution.
        _, a, c = _fold(params[name], params[bn], stats[bn], t)
        w_q, w_scale, w_colsum = qvars["int8"][name]
        z = int8_matmul(h, w_q, w_scale, w_colsum=w_colsum if i == 1 else None) * a + c
        h = jax.nn.softplus(z).astype(cdtype)

    dense4 = params["lin4"]["Dense_0"]
    return jnp.dot(h, dense4["kernel"], preferred_element_type=jnp.float32) + dense4["bias"]


def quantize_encoder(variables: Any) -> Any:
    """Pre-quantize enc_lin1 — the 150528 x 4096 GEMM that dominates the
    per-image encode (~1.2 GB bf16 weight stream; >97% of encode FLOPs) —
    REPLACING the float kernel with its int8 form (+ an 'int8_enc'
    scale collection). enc_lin2/enc_lin3 (16M / small) stay fp32.

    Do this ONCE, OUTSIDE jit, and keep the result resident: quantizing
    inside the jitted program re-reads the full bf16 weight every call, so
    it can never reduce weight HBM traffic (``int8_encode`` supports the
    in-jit fallback for convenience, but the resident-int8 form is the one
    that's actually faster)."""
    import copy

    w = variables["params"]["enc_lin1"]["Dense_0"]["kernel"]
    w_q, scale = quantize_weight(jnp.asarray(w, jnp.float32))
    out = dict(variables)
    out["params"] = copy.copy(variables["params"])
    out["params"]["enc_lin1"] = {
        "Dense_0": {
            "kernel": w_q,
            "bias": variables["params"]["enc_lin1"]["Dense_0"]["bias"],
        }
    }
    out["int8_enc"] = {"scale": scale}
    return out


def _bn_eval_affine(dense_bias, bn_params, bn_stats):
    """Fold (dense bias, eval BatchNorm) into a per-channel (a, c):
    bn(x @ W + b) = (x @ W) * a + c."""
    from ladine_tpu.kernels.fused_eps import _BN_EPS

    inv = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _BN_EPS)
    a = inv
    c = (dense_bias - bn_stats["mean"]) * inv + bn_params["bias"]
    return a, c


def int8_encode(qvars: Any, x: jnp.ndarray) -> jnp.ndarray:
    """ConditionalModel.encode (arch 'linear', eval BN) with int8 enc_lin1.

    Symmetric per-row activation quantization — grayscaled inputs are
    [0, 1] but the 'standardized' preprocess can go negative, so no
    zero-point trick here. Mirrors models/conditional.py:151-168.
    """
    params = qvars["params"]
    stats = qvars["batch_stats"]
    w = params["enc_lin1"]["Dense_0"]["kernel"]
    if w.dtype == jnp.int8:
        # pre-quantized resident weight (quantize_encoder) — the form that
        # actually halves the weight stream
        w_q, w_scale = w, qvars["int8_enc"]["scale"]
    else:
        # in-jit fallback: numerically identical, but reads the float
        # weight anyway — convenience only, no bandwidth win
        w_q, w_scale = quantize_weight(jnp.asarray(w, jnp.float32))

    a1, c1 = _bn_eval_affine(params["enc_lin1"]["Dense_0"]["bias"],
                             params["enc_bn1"], stats["enc_bn1"])
    h = jax.nn.softplus(int8_matmul(x, w_q, w_scale) * a1 + c1)

    d2 = params["enc_lin2"]["Dense_0"]
    a2, c2 = _bn_eval_affine(d2["bias"], params["enc_bn2"], stats["enc_bn2"])
    h = jax.nn.softplus(
        jnp.dot(h, d2["kernel"], preferred_element_type=jnp.float32) * a2 + c2
    )

    d3 = params["enc_lin3"]["Dense_0"]
    h = jnp.dot(h, d3["kernel"], preferred_element_type=jnp.float32) + d3["bias"]
    an, cn = _bn_eval_affine(jnp.zeros_like(params["norm"]["bias"]),
                             params["norm"], stats["norm"])
    return h * an + cn


def quantize_mapping_heads(gvars: Any, mlp_ids) -> Any:
    """Pre-quantize the requested mapping heads' linear1 kernels IN PLACE
    (int8 kernel + 'int8_mlp_scale' collection). Same resident-vs-in-jit
    rationale as ``quantize_encoder``; do once, outside jit."""
    import copy

    out = dict(gvars)
    out["params"] = copy.copy(gvars["params"])
    scales = dict(out.get("int8_mlp_scale", {}))
    for i in sorted({int(i) for i in mlp_ids}):
        p = copy.copy(out["params"][f"mlp{i}"])
        d1 = p["linear1"]["Dense_0"]
        w_q, scale = quantize_weight(jnp.asarray(d1["kernel"], jnp.float32))
        p["linear1"] = {"Dense_0": {"kernel": w_q, "bias": d1["bias"]}}
        out["params"][f"mlp{i}"] = p
        scales[f"mlp{i}"] = scale
    out["int8_mlp_scale"] = scales
    return out


def int8_mapping_heads(gvars: Any, taps: jnp.ndarray, mlp_ids) -> jnp.ndarray:
    """Mapping-MLP heads with int8 first layers: (len(ids), B, C) logits.

    Each head's linear1 (196*768 -> 4096, ~1.23 GB bf16 per member) is the
    guidance's weight-streaming floor at serving time; linear2..4 (8/0.5/0
    MB) stay fp32. ``taps`` is (len(ids), B, 196, embed) from
    SEViTGuidance.taps_subset (same order as ``mlp_ids``). ViT token
    features are signed -> symmetric activation quantization. Mirrors
    models/mlp.py MappingMLP (ReLU, no dropout — the reference's live
    behavior). Accepts either the full guidance variables or just params
    (back-compat); kernels pre-quantized by ``quantize_mapping_heads`` are
    used as-is, float kernels are quantized in-jit (no bandwidth win).
    """
    gparams = gvars.get("params", gvars)
    outs = []
    for tap, i in zip(taps, mlp_ids):
        p = gparams[f"mlp{i}"]
        x = tap.reshape(tap.shape[0], -1).astype(jnp.float32)
        d1 = p["linear1"]["Dense_0"]
        if d1["kernel"].dtype == jnp.int8:
            w_q, w_scale = d1["kernel"], gvars["int8_mlp_scale"][f"mlp{i}"]
        else:
            w_q, w_scale = quantize_weight(jnp.asarray(d1["kernel"], jnp.float32))
        x = jax.nn.relu(int8_matmul(x, w_q, w_scale) + d1["bias"])
        layer = 2
        while f"linear{layer + 1}" in p:  # hidden layers: ReLU
            d = p[f"linear{layer}"]["Dense_0"]
            x = jax.nn.relu(
                jnp.dot(x, d["kernel"], preferred_element_type=jnp.float32)
                + d["bias"]
            )
            layer += 1
        d = p[f"linear{layer}"]["Dense_0"]  # output layer: logits
        x = jnp.dot(x, d["kernel"], preferred_element_type=jnp.float32) + d["bias"]
        outs.append(x)
    return jnp.stack(outs, axis=0)
