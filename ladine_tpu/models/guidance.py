"""SEViT guidance: frozen ViT + K mapping MLPs -> K+1 guidance heads.

Parity with the reference's ``compute_guiding_prediction``
(classification_train_separately.py:330-350): head i (i=1..K) is
mapping-MLP_i applied to the bare-patch features after ViT blocks 0..i-1;
head K+1 is the full ViT classification forward. All heads are returned as
logits stacked (K+1, B, C); callers softmax them (the softmaxed heads double
as both the eps-net conditioning y_hat and the diffusion prior mean y_T_mean,
classification_train_separately.py:955-963).

TPU-first: one tapped forward instead of the reference's triangular
re-computation; all K+1 heads come out of a single jitted apply.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ladine_tpu.models.mlp import MappingMLP
from ladine_tpu.models.vit import ViT


class SEViTGuidance(nn.Module):
    num_classes: int = 2
    num_members: int = 5
    vit_depth: int = 12
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    num_heads: int = 12
    mlp_hidden_dims: tuple = (4096, 2048, 128)
    use_pallas_attention: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        if self.vit_depth < self.num_members:
            raise ValueError(
                f"vit_depth ({self.vit_depth}) must be >= num_members "
                f"({self.num_members}): member i taps after block i"
            )
        self.vit = ViT(
            num_classes=self.num_classes,
            depth=self.vit_depth,
            img_size=self.img_size,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            use_pallas_attention=self.use_pallas_attention,
            dtype=self.dtype,
            name="vit",
        )
        self.mlps = [
            MappingMLP(
                num_classes=self.num_classes,
                hidden_dims=self.mlp_hidden_dims,
                dtype=self.dtype,
                name=f"mlp{i}",
            )
            for i in range(self.num_members)
        ]

    def _mlp_heads(self, taps) -> jnp.ndarray:
        """All K mapping heads, (K, B, C).

        A member-batched GEMM formulation (stack the K MLPs' params and bmm)
        was tried and REVERTED: stacking materializes a +6.2 GB copy of the
        MLP weights inside every guidance call on the full-size model (each
        first-layer kernel is 1.23 GB bf16), OOM-ing a 16 GB chip, while the
        win was bounded by the ~7.5 ms weight-streaming floor the batched
        form shares. Profile evidence in docs/ROADMAP.md (serving
        fixed-cost breakdown)."""
        return jnp.stack([mlp(tap) for mlp, tap in zip(self.mlps, taps)], axis=0)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) -> (num_members + 1, B, num_classes) guidance logits."""
        depths = tuple(range(1, self.num_members + 1))
        vit_logits, taps = self.vit.forward_with_taps(x, depths)
        heads = self._mlp_heads(taps)
        return jnp.concatenate([heads, vit_logits[None]], axis=0)

    def vit_logits(self, x: jnp.ndarray) -> jnp.ndarray:
        """Full ViT forward only — the attack surface for white-box attacks
        (the reference attacks the ViT, classification_train_separately.py:661-667)."""
        return self.vit(x)

    def tap_logits(self, x: jnp.ndarray) -> jnp.ndarray:
        """Mapping heads only: (num_members, B, num_classes)."""
        depths = tuple(range(1, self.num_members + 1))
        taps = self.vit.tap_features(x, depths)
        return self._mlp_heads(taps)

    def taps_subset(self, x: jnp.ndarray, indices) -> jnp.ndarray:
        """ViT tap features for the requested MAPPING heads only:
        (len(indices), B, 196, embed_dim), in the given order.

        The transformer half of ``heads_subset`` without the mapping MLPs —
        for callers that run the MLP GEMMs outside flax (the int8
        fixed-cost path, kernels/int8.py int8_mapping_heads)."""
        indices = tuple(int(i) for i in indices)
        for i in indices:
            if not 0 <= i < self.num_members:
                raise ValueError(
                    f"taps_subset takes mapping head ids 0..{self.num_members - 1}, "
                    f"got {i} (the full-ViT head has no tap)"
                )
        mlp_ids = sorted(set(indices))
        taps = self.vit.tap_features(x, tuple(i + 1 for i in mlp_ids))
        by_id = dict(zip(mlp_ids, taps))
        return jnp.stack([by_id[i] for i in indices], axis=0)

    def heads_subset(self, x: jnp.ndarray, indices) -> jnp.ndarray:
        """Only the requested guidance heads: (len(indices), B, C), in the
        given order. ``indices`` is a STATIC tuple of head ids (0..K-1 =
        mapping heads, K = full-ViT head).

        This is the serving/eval hot path: the reference loads 6 members but
        only evaluates the 5 mapping-conditioned ones
        (classification_train_separately.py:275, 767-769), so inference
        never needs the full 12-block ViT forward — computing all K+1 heads
        and discarding the last wastes 12 of 17 block evaluations. Here the
        transformer runs only to the DEEPEST requested tap (e.g. 5 blocks
        for the standard 5-member ensemble, or 3 for a single --mlp_idx 2
        member) and only the requested MLPs run. Identical outputs to
        ``__call__(x)[indices]`` (tests/test_models.py)."""
        indices = tuple(int(i) for i in indices)
        k_full = self.num_members
        for i in indices:
            if not 0 <= i <= k_full:
                raise ValueError(
                    f"head index {i} out of range 0..{k_full} "
                    f"({self.num_members} mapping heads + the full-ViT head)"
                )
        mlp_ids = sorted({i for i in indices if i < k_full})
        outs = {}
        if mlp_ids and k_full in indices:
            # both paths needed: share the patch embedding (as __call__ does)
            depths = tuple(i + 1 for i in mlp_ids)
            logits, taps = self.vit.forward_with_taps(x, depths)
            outs[k_full] = logits
            for i, tap in zip(mlp_ids, taps):
                outs[i] = self.mlps[i](tap)
        elif mlp_ids:
            depths = tuple(i + 1 for i in mlp_ids)
            taps = self.vit.tap_features(x, depths)  # increasing-depth order
            for i, tap in zip(mlp_ids, taps):
                outs[i] = self.mlps[i](tap)
        elif k_full in indices:
            outs[k_full] = self.vit(x)
        return jnp.stack([outs[i] for i in indices], axis=0)
