"""Pallas TPU fused attention for the ViT guidance backbone.

Design note: LaDiNE's only attention is ViT-B/16's 196/197-token sequences
(SURVEY.md section 5, "long-context: not meaningful here"). Flash-attention
tiling with online softmax is pure overhead at this length — the ENTIRE
(padded) score matrix for one (batch, head) cell is a single 256x256 fp32
tile that fits comfortably in VMEM. So the kernel is a one-shot fused
QK^T -> masked softmax -> @V per grid cell, grid over (batch, head):

* one HBM round trip for q/k/v, none for the scores (never materialized in HBM),
* fp32 softmax statistics regardless of input dtype (bf16 in, bf16 out),
* padded key positions masked with a large negative, not -inf (NaN hygiene).

Sequence length is padded to the 128-lane boundary inside the wrapper; the
padding rows of the output are sliced off. Non-TPU backends fall back to the
identical-math XLA path (used by tests; also keeps CPU debugging easy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float):
    # refs are (1, 1, N_pad, D) blocks for one (batch, head) grid cell
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (N_pad, N_pad)
    n_pad = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused attention: (B, N, H, D) x3 -> (B, N, H, D), scale = D^-0.5.

    Falls back to plain XLA off-TPU (bit-compatible math modulo reduction
    order)."""
    b, n, h, d = q.shape
    scale = d**-0.5
    if jax.default_backend() != "tpu":
        s = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", p.astype(v.dtype), v).astype(q.dtype)

    n_pad = _round_up(n, 128)
    d_pad = _round_up(d, 128)

    def pad(x):
        x = jnp.transpose(x, (0, 2, 1, 3))  # (B, H, N, D)
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    spec = pl.BlockSpec((1, 1, n_pad, d_pad), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, seq_len=n, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d_pad), q.dtype),
        grid=(b, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n_pad * n_pad * d_pad,
            bytes_accessed=4 * b * h * n_pad * d_pad * q.dtype.itemsize,
            transcendentals=b * h * n_pad * n_pad,
        ),
    )(qp, kp, vp)
    out = jnp.transpose(out, (0, 2, 1, 3))[:, :n, :, :d]
    return out
