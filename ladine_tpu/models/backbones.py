"""Stage-1 backbone zoo beyond ViT/ResNet: DeiT, ConViT, EfficientNetV2.

The reference's stage-1 trainer offers six backbone families
(/root/reference/mapping/train_transformer.py:59-84): vit (timm-created) and
resnet18/resnet50/efficientnetv2_l/deit_base_patch16_224/convit_base loaded
from ad-hoc local pickles (./models/base/*.pth — not shipped in the repo).
ViT + ResNets live in models/vit.py / models/encoders.py; this module
supplies the remaining three as native Flax modules so every reference
``--model_arch`` choice trains on TPU:

* ``DeiT`` — deit_base_patch16_224 is architecturally a plain ViT-B/16 (the
  DeiT recipe differs in training, not topology); the distilled variant adds
  a distillation token and a second head, averaged at inference
  (Touvron et al., ICML 2021).
* ``ConViT`` — convit_base: the first ``local_layers`` transformer blocks use
  Gated Positional Self-Attention (content attention mixed with a learned
  convolution-like positional attention via a per-head sigmoid gate), the
  rest are plain MHSA blocks; no cls token inside GPSA stages (d'Ascoli et
  al., ICML 2021 / timm convit.py topology).
* ``EfficientNetV2`` — fused-MBConv early stages + SE-MBConv late stages,
  1x1 head conv to 1280, GAP, classifier (Tan & Le, ICML 2021). ``variant``
  selects s/m/l stage widths/depths; default 'l' to match the reference's
  efficientnetv2_l pickle.

All are trainable through ``cli/train_transformer.py --model_arch {deit,
convit,efficientnetv2}`` with the reference's optimizer settings (AdamW
lr 1e-4, wd 0.1, StepLR(10, 0.5)).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ladine_tpu.models.conditional import TorchLinear
from ladine_tpu.models.initializers import torch_linear_bias, torch_linear_kernel
from ladine_tpu.models.vit import Block, _LN_EPS


# --------------------------------------------------------------------- DeiT


class DeiT(nn.Module):
    """deit_base_patch16_224(-distilled): ViT-B/16 topology; with
    ``distilled`` a distillation token + second head, averaged at eval."""

    num_classes: int = 2
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    distilled: bool = False
    dtype: Optional[jnp.dtype] = None

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n_prefix = 2 if self.distilled else 1
        h = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    kernel_init=torch_linear_kernel,
                    bias_init=torch_linear_bias(3 * self.patch_size**2),
                    dtype=self.dtype, name="patch_proj")(x)
        h = h.reshape(h.shape[0], -1, self.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        toks = [jnp.broadcast_to(jnp.asarray(cls, h.dtype), (h.shape[0], 1, self.embed_dim))]
        if self.distilled:
            dist = self.param("dist_token", nn.initializers.zeros, (1, 1, self.embed_dim))
            toks.append(jnp.broadcast_to(jnp.asarray(dist, h.dtype),
                                         (h.shape[0], 1, self.embed_dim)))
        h = jnp.concatenate(toks + [h], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(stddev=0.02),
                         (1, self.num_patches + n_prefix, self.embed_dim))
        h = h + jnp.asarray(pos, h.dtype)
        for i in range(self.depth):
            h = Block(self.embed_dim, self.num_heads, dtype=self.dtype,
                      name=f"block{i}")(h)
        h = nn.LayerNorm(epsilon=_LN_EPS, name="norm")(h)
        logits = TorchLinear(self.num_classes, dtype=self.dtype, name="head")(h[:, 0])
        if self.distilled:
            logits_dist = TorchLinear(self.num_classes, dtype=self.dtype,
                                      name="head_dist")(h[:, 1])
            # timm eval behavior: average the two heads
            logits = (logits + logits_dist) / 2.0
        return logits


# -------------------------------------------------------------------- ConViT


class GPSA(nn.Module):
    """Gated Positional Self-Attention (ConViT): per-head sigmoid gate mixes
    content attention with a learned positional attention over relative
    patch offsets (timm convit.py GPSA)."""

    dim: int
    num_heads: int
    locality_strength: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @staticmethod
    def rel_indices(num_patches: int) -> np.ndarray:
        """(1, N, N, 3): (dx, dy, d^2) between every patch pair (row-major
        grid, as in timm convit.py get_rel_indices)."""
        side = int(np.sqrt(num_patches))
        rows = (np.arange(num_patches) // side).astype(np.float32)
        cols = (np.arange(num_patches) % side).astype(np.float32)
        ddx = cols[None, :] - cols[:, None]
        ddy = rows[None, :] - rows[:, None]
        dist = ddx**2 + ddy**2
        return np.stack([ddx, ddy, dist], -1)[None]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qk = TorchLinear(2 * self.dim, dtype=self.dtype, name="qk")(x)
        qk = qk.reshape(b, n, 2, self.num_heads, head_dim)
        q, k = qk[:, :, 0], qk[:, :, 1]
        v = TorchLinear(self.dim, dtype=self.dtype, name="v")(x)
        v = v.reshape(b, n, self.num_heads, head_dim)

        scale = head_dim**-0.5
        content = nn.softmax(jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale, axis=-1)

        rel = jnp.asarray(self.rel_indices(n), x.dtype)  # (1, n, n, 3)
        pos_score = TorchLinear(self.num_heads, dtype=self.dtype,
                                name="pos_proj")(rel)  # (1, n, n, H)
        pos = nn.softmax(pos_score.transpose(0, 3, 1, 2), axis=-1)  # (1, H, n, n)
        gate = self.param("gating_param", nn.initializers.ones, (self.num_heads,))
        g = nn.sigmoid(jnp.asarray(gate, x.dtype))[None, :, None, None]
        attn = (1.0 - g) * content + g * pos
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return TorchLinear(self.dim, dtype=self.dtype, name="proj")(out)


class ConViTBlock(nn.Module):
    dim: int
    num_heads: int
    use_gpsa: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")(x)
        if self.use_gpsa:
            x = x + GPSA(self.dim, self.num_heads, dtype=self.dtype, name="attn")(h)
        else:
            from ladine_tpu.models.vit import Attention

            x = x + Attention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")(x)
        hidden = int(self.dim * 4)
        h = TorchLinear(hidden, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + TorchLinear(self.dim, dtype=self.dtype, name="fc2")(h)


class ConViT(nn.Module):
    """convit_base topology: GPSA in the first ``local_layers`` blocks
    (patches only — the cls token joins for the plain-MHSA tail, as in timm
    convit.py forward_features)."""

    num_classes: int = 2
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 16
    local_layers: int = 10
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    kernel_init=torch_linear_kernel,
                    bias_init=torch_linear_bias(3 * self.patch_size**2),
                    dtype=self.dtype, name="patch_proj")(x)
        h = h.reshape(h.shape[0], -1, self.embed_dim)
        num_patches = h.shape[1]
        pos = self.param("pos_embed", nn.initializers.normal(stddev=0.02),
                         (1, num_patches, self.embed_dim))
        h = h + jnp.asarray(pos, h.dtype)
        for i in range(self.depth):
            if i == self.local_layers:
                cls = self.param("cls_token", nn.initializers.normal(stddev=0.02),
                                 (1, 1, self.embed_dim))
                c = jnp.broadcast_to(jnp.asarray(cls, h.dtype),
                                     (h.shape[0], 1, self.embed_dim))
                h = jnp.concatenate([c, h], axis=1)
            h = ConViTBlock(self.embed_dim, self.num_heads,
                            use_gpsa=i < self.local_layers, dtype=self.dtype,
                            name=f"block{i}")(h)
        if self.depth <= self.local_layers:  # degenerate small configs
            h = jnp.concatenate([jnp.mean(h, 1, keepdims=True), h], axis=1)
        h = nn.LayerNorm(epsilon=_LN_EPS, name="norm")(h)
        return TorchLinear(self.num_classes, dtype=self.dtype, name="head")(h[:, 0])


# -------------------------------------------------------------- EfficientNetV2

# (expansion, out_channels, blocks, stride, fused, se_ratio) per stage
_EFFNETV2_STAGES = {
    "s": [(1, 24, 2, 1, True, 0.0), (4, 48, 4, 2, True, 0.0),
          (4, 64, 4, 2, True, 0.0), (4, 128, 6, 2, False, 0.25),
          (6, 160, 9, 1, False, 0.25), (6, 256, 15, 2, False, 0.25)],
    "m": [(1, 24, 3, 1, True, 0.0), (4, 48, 5, 2, True, 0.0),
          (4, 80, 5, 2, True, 0.0), (4, 160, 7, 2, False, 0.25),
          (6, 176, 14, 1, False, 0.25), (6, 304, 18, 2, False, 0.25),
          (6, 512, 5, 1, False, 0.25)],
    "l": [(1, 32, 4, 1, True, 0.0), (4, 64, 7, 2, True, 0.0),
          (4, 96, 7, 2, True, 0.0), (4, 192, 10, 2, False, 0.25),
          (6, 224, 19, 1, False, 0.25), (6, 384, 25, 2, False, 0.25),
          (6, 640, 7, 1, False, 0.25)],
}


class _SE(nn.Module):
    channels: int
    se_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_channels, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class _MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expansion: int
    stride: int
    fused: bool
    se_ratio: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.in_ch * self.expansion
        h = x
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-3,
                                         dtype=self.dtype, name=name)
        if self.fused:
            h = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                        padding="SAME", use_bias=False, dtype=self.dtype,
                        name="conv_exp")(h)
            h = nn.silu(norm("bn1")(h))
        else:
            if self.expansion != 1:
                h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                            name="conv_pw")(h)
                h = nn.silu(norm("bn1")(h))
            h = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                        padding="SAME", feature_group_count=mid, use_bias=False,
                        dtype=self.dtype, name="conv_dw")(h)
            h = nn.silu(norm("bn2")(h))
            if self.se_ratio > 0:
                h = _SE(mid, max(1, int(self.in_ch * self.se_ratio)),
                        dtype=self.dtype, name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_proj")(h)
        h = norm("bn3")(h)
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + x
        return h


class EfficientNetV2(nn.Module):
    """efficientnetv2_{s,m,l}: stem 3x3/2 -> fused-MBConv + SE-MBConv stages
    -> 1x1 head conv (1280) -> GAP -> classifier."""

    num_classes: int = 2
    variant: str = "l"
    stem_width: Optional[int] = None  # default: first stage width
    width_mult: float = 1.0  # shrink for tests
    depth_mult: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        stages = _EFFNETV2_STAGES[self.variant]
        w = lambda c: max(8, int(c * self.width_mult))
        d = lambda n: max(1, int(round(n * self.depth_mult)))
        stem = self.stem_width or w(stages[0][1])
        h = nn.Conv(stem, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        h = nn.silu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-3, dtype=self.dtype, name="stem_bn")(h))
        in_ch = stem
        for si, (exp, out_c, blocks, stride, fused, se) in enumerate(stages):
            for bi in range(d(blocks)):
                h = _MBConv(in_ch, w(out_c), exp, stride if bi == 0 else 1,
                            fused, se, dtype=self.dtype,
                            name=f"stage{si}_block{bi}")(h, train=train)
                in_ch = w(out_c)
        head_w = max(int(1280 * self.width_mult), in_ch)
        h = nn.Conv(head_w, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(h)
        h = nn.silu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-3, dtype=self.dtype, name="head_bn")(h))
        h = jnp.mean(h, axis=(1, 2))
        return TorchLinear(self.num_classes, dtype=self.dtype, name="classifier")(h)
