"""ViT-B/16 (timm ``vit_base_patch16_224`` layout) in Flax, with
intermediate-block taps for the SEViT guidance path.

Parity notes (vs /root/reference):

* Full forward — patch embed, cls token, learned position embedding, 12
  pre-norm transformer blocks, final LayerNorm, take cls token, linear head
  (mapping/train_transformer.py:76-78 fine-tunes this with a 2-class head).
* Mapping/tap path — the reference computes guidance features as
  ``vit.patch_embed(x) -> vit.pos_drop(...) -> vit.blocks[0..i-1]``
  (classification_train_separately.py:336-341, mapping/train_mapping.py:103-106),
  i.e. it NEVER adds the cls token or the position embedding on this path.
  The mapping MLPs therefore see (B, 196, 768) position-free patch features.
  We reproduce that exactly — it is why the MLP input dim is 196*768.

TPU-first design
----------------
* One forward with taps: the reference recomputes blocks 0..i-1 for each
  i=1..5 (triangular, 15 block evaluations); we run blocks once and collect
  the taps (5 block evaluations) — identical outputs, 3x less work
  (SURVEY.md section 7 win #3).
* Attention is a single fused call; set ``use_pallas_attention=True`` to use
  the Pallas flash-attention kernel (ladine_tpu/kernels/attention.py) on TPU.
* Sequence length is static (196 or 197) so everything tiles cleanly onto
  the MXU with XLA's default fusion; batch is the sharded axis.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ladine_tpu.models.initializers import torch_linear_bias, torch_linear_kernel
from ladine_tpu.models.conditional import TorchLinear

_LN_EPS = 1e-6  # timm ViT uses LayerNorm(eps=1e-6)


class Attention(nn.Module):
    """Multi-head self-attention, timm layout (fused qkv, bias=True)."""

    dim: int
    num_heads: int
    use_pallas: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = TorchLinear(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)

        if self.use_pallas:
            from ladine_tpu.kernels.attention import flash_attention

            out = flash_attention(q, k, v)  # (b, n, h, d)
        else:
            scale = head_dim**-0.5
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
            attn = nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)

        out = out.reshape(b, n, c)
        return TorchLinear(self.dim, dtype=self.dtype, name="proj")(out)


class MlpBlock(nn.Module):
    dim: int
    hidden: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = TorchLinear(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)  # timm uses exact GELU
        return TorchLinear(self.dim, dtype=self.dtype, name="fc2")(h)


class Block(nn.Module):
    """Pre-norm transformer block: x += attn(ln(x)); x += mlp(ln(x))."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_pallas: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, self.use_pallas, self.dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")(x)
        x = x + MlpBlock(self.dim, int(self.dim * self.mlp_ratio), self.dtype, name="mlp")(h)
        return x


class ViT(nn.Module):
    """ViT-B/16 by default (embed 768, 12 blocks, 12 heads, patch 16)."""

    num_classes: int = 2
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    use_pallas_attention: bool = False
    dtype: Optional[jnp.dtype] = None

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def setup(self):
        self.patch_proj = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(3 * self.patch_size**2),
            dtype=self.dtype,
            name="patch_proj",
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, self.num_patches + 1, self.embed_dim),
        )
        self.blocks = [
            Block(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.use_pallas_attention,
                self.dtype,
                name=f"block{i}",
            )
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=_LN_EPS, name="norm")
        self.head = TorchLinear(self.num_classes, dtype=self.dtype, name="head")

    def patch_embed(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) NHWC -> (B, num_patches, embed_dim)."""
        h = self.patch_proj(x)
        return h.reshape(h.shape[0], -1, self.embed_dim)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Full classification forward: (B, H, W, 3) -> (B, num_classes).
        ``train`` is accepted for trainer-signature uniformity (the ViT has
        no train-mode-dependent layers: drop rates are 0 in the reference)."""
        h = self.patch_embed(x)
        cls = jnp.broadcast_to(
            jnp.asarray(self.cls_token, h.dtype), (h.shape[0], 1, self.embed_dim)
        )
        h = jnp.concatenate([cls, h], axis=1)
        h = h + jnp.asarray(self.pos_embed, h.dtype)
        for blk in self.blocks:
            h = blk(h)
        h = self.norm(h)
        return self.head(h[:, 0])

    def tap_features(self, x: jnp.ndarray, depths: Sequence[int]) -> List[jnp.ndarray]:
        """Truncated forwards for the mapping path, all from ONE pass.

        ``depths`` are block counts (reference i=1..5): returns, for each d,
        the (B, 196, embed_dim) output of blocks[0..d-1] applied to the BARE
        patch embedding (no cls token, no position embedding — the reference
        quirk, classification_train_separately.py:336-341).
        """
        h = self.patch_embed(x)
        taps = []
        max_d = max(depths)
        for i in range(max_d):
            h = self.blocks[i](h)
            if (i + 1) in depths:
                taps.append(h)
        return taps

    def forward_with_taps(
        self, x: jnp.ndarray, depths: Sequence[int]
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """Full-forward logits plus mapping taps, sharing the patch embed.

        The tap path and the full path diverge after patch embedding (the
        full path adds cls+pos), so blocks run twice on different inputs —
        still 12 + max(depths) block evaluations vs the reference's
        12 + sum(depths) (classification_train_separately.py:336-346).
        """
        patches = self.patch_embed(x)

        # tap path: bare patches
        h = patches
        taps = []
        max_d = max(depths)
        for i in range(max_d):
            h = self.blocks[i](h)
            if (i + 1) in depths:
                taps.append(h)

        # full path: cls + pos
        cls = jnp.broadcast_to(
            jnp.asarray(self.cls_token, patches.dtype),
            (patches.shape[0], 1, self.embed_dim),
        )
        g = jnp.concatenate([cls, patches], axis=1)
        g = g + jnp.asarray(self.pos_embed, g.dtype)
        for blk in self.blocks:
            g = blk(g)
        g = self.norm(g)
        logits = self.head(g[:, 0])
        return logits, taps
