"""Pallas fused matmul + affine + softplus (+ gate) — the reverse-diffusion
hot op.

One eps_theta scan step is dominated by two feature_dim x feature_dim
matmuls, each followed by a timestep gate, an eval-mode BatchNorm, and a
Softplus (models/conditional.py eps()). At eval the gate and BatchNorm fold
into a single per-output-unit affine (scale, shift):

    z = gamma_t (.) (x W + b);  BN(z) = z * g/sigma + (beta - mu g/sigma)
      = (x W) * a + c,   a = gamma_t g/sigma,   c = gamma_t b g/sigma + beta - mu g/sigma

so the whole layer is ONE kernel: ``softplus((x @ W) * a + c) [* mult]``,
with the optional elementwise ``mult`` implementing the f (.) y conditioning.
Intermediates never touch HBM; the MXU accumulates in fp32.

Grid: (rows / block_r, cols / block_n, K / block_k), fp32 accumulator scratch
persisting over the K axis (the guide's tiled-matmul pattern). Non-TPU
backends fall back to identical XLA math.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, a_ref, c_ref, o_ref, acc_ref, *, n_k: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _finish():
        z = acc_ref[...] * a_ref[...].astype(jnp.float32) + c_ref[...].astype(jnp.float32)
        o_ref[...] = jax.nn.softplus(z).astype(o_ref.dtype)


def _kernel_mult(x_ref, w_ref, a_ref, c_ref, m_ref, o_ref, acc_ref, *, n_k: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _finish():
        z = acc_ref[...] * a_ref[...].astype(jnp.float32) + c_ref[...].astype(jnp.float32)
        o_ref[...] = (jax.nn.softplus(z) * m_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fused_linear_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    a: jnp.ndarray,
    c: jnp.ndarray,
    mult: Optional[jnp.ndarray] = None,
    block_r: int = 512,
    block_n: int = 512,
    block_k: int = 512,
) -> jnp.ndarray:
    """softplus((x @ w) * a + c) [* mult].

    x: (R, K), w: (K, N), a/c: (N,), mult: (R, N) or None. Returns (R, N) in
    x.dtype. Shapes are padded to tile boundaries internally.
    """
    r, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)

    if jax.default_backend() != "tpu":
        z = jnp.dot(x, w, preferred_element_type=jnp.float32) * a + c
        out = jax.nn.softplus(z)
        if mult is not None:
            out = out * mult
        return out.astype(x.dtype)

    br = min(block_r, _round_up(r, 8))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(k, 128))
    rp, np_, kp = _round_up(r, br), _round_up(n, bn), _round_up(k, bk)
    xp = jnp.pad(x, ((0, rp - r), (0, kp - k)))
    wp = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    ap = jnp.pad(a, (0, np_ - n)).reshape(1, np_)
    cp = jnp.pad(c, (0, np_ - n)).reshape(1, np_)
    n_k = kp // bk
    grid = (rp // br, np_ // bn, n_k)

    in_specs = [
        pl.BlockSpec((br, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [xp, wp, ap, cp]
    if mult is not None:
        mp = jnp.pad(mult, ((0, rp - r), (0, np_ - n)))
        in_specs.append(pl.BlockSpec((br, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM))
        args.append(mp)
        kernel = functools.partial(_kernel_mult, n_k=n_k)
    else:
        kernel = functools.partial(_kernel, n_k=n_k)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, np_), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((br, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * np_ * kp,
            bytes_accessed=(rp * kp + kp * np_ + rp * np_) * x.dtype.itemsize,
            transcendentals=rp * np_,
        ),
    )(*args)
    return out[:r, :n]
