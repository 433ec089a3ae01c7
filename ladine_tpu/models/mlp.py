"""Mapping network: intermediate ViT features -> class logits.

Behavioral parity with /root/reference/mapping/models/mlp.py:4-29:
196*768 -> 4096 -> 2048 -> 128 -> num_classes with ReLU. The reference
defines a Dropout(0.2) but never applies it in forward — we reproduce the
live behavior (no dropout).

Input is the (B, 196, 768) patch-token tensor from a truncated ViT forward
(WITHOUT cls token or position embedding — see models/vit.py for why),
flattened to (B, 150528).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ladine_tpu.models.conditional import TorchLinear


class MappingMLP(nn.Module):
    num_classes: int = 2
    hidden_dims: Sequence[int] = (4096, 2048, 128)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # reference hard-reshapes to (-1, 196*768) (mlp.py:24)
        x = x.reshape(x.shape[0], -1)
        for i, d in enumerate(self.hidden_dims):
            x = TorchLinear(d, dtype=self.dtype, name=f"linear{i + 1}")(x)
            x = nn.relu(x)
        return TorchLinear(self.num_classes, dtype=self.dtype, name=f"linear{len(self.hidden_dims) + 1}")(x)
