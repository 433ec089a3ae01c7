"""Alternate image-encoder zoo (reference C5/C21 — selectable ``encoder_x``
architectures, dead in the live ChestXRay/ISIC path but part of the
component inventory: /root/reference/diffusion/latent_model.py:216-368 and
pretraining/resnet.py).

All take NHWC float images and return (B, out_dim) features/logits:

* SimpleEncoder  — arch 'simple': data_dim->300->100->out MLP, BN+ReLU
  (latent_model.py:136-145)
* LeNet          — tanh LeNet, avg-pooling (latent_model.py:305-334)
* LeNet5         — BN LeNet-5 (latent_model.py:337-368)
* FashionCNN     — 2 conv blocks + fc head(s) (latent_model.py:234-272)
* SimNet         — 2 conv + maxpool feature extractor (latent_model.py:216-227)
* ResNet / ResNetEncoder — torchvision-layout ResNet18/50 backbone with a
  projection head (latent_model.py:276-301, pretraining/resnet.py:84-145)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ladine_tpu.models.conditional import TorchLinear, _BN_EPS, _BN_MOMENTUM
from ladine_tpu.models.initializers import torch_linear_bias, torch_linear_kernel


def _bn(name=None):
    return nn.BatchNorm(epsilon=_BN_EPS, momentum=_BN_MOMENTUM, name=name)


class TorchConv(nn.Module):
    """nn.Conv with torch Conv2d default init."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str | Sequence[Tuple[int, int]] = "VALID"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size[0] * self.kernel_size[1]
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(fan_in),
        )(x)


class SimpleEncoder(nn.Module):
    """arch='simple' (latent_model.py:136-145): flat -> 300 -> 100 -> out."""

    out_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = TorchLinear(300)(x)
        x = _bn()(x, use_running_average=not train)
        x = nn.relu(x)
        x = TorchLinear(100)(x)
        x = _bn()(x, use_running_average=not train)
        x = nn.relu(x)
        return TorchLinear(self.out_dim)(x)


class LeNet(nn.Module):
    """tanh LeNet (latent_model.py:305-334)."""

    num_classes: int = 10
    n_input_padding: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = [(self.n_input_padding,) * 2] * 2
        x = jnp.tanh(TorchConv(6, (5, 5), padding=pad)(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))
        x = jnp.tanh(TorchConv(16, (5, 5))(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))
        x = jnp.tanh(TorchConv(120, (5, 5))(x))
        x = x.reshape(x.shape[0], -1)
        x = jnp.tanh(TorchLinear(84)(x))
        return TorchLinear(self.num_classes)(x)


class LeNet5(nn.Module):
    """BN LeNet-5 (latent_model.py:337-368)."""

    num_classes: int = 10
    n_input_padding: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = [(self.n_input_padding,) * 2] * 2
        x = TorchConv(6, (5, 5), padding=pad)(x)
        x = nn.relu(_bn()(x, use_running_average=not train))
        x = nn.avg_pool(x, (2, 2), (2, 2))
        x = TorchConv(16, (5, 5))(x)
        x = nn.relu(_bn()(x, use_running_average=not train))
        x = nn.avg_pool(x, (2, 2), (2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(TorchLinear(120)(x))
        x = nn.relu(TorchLinear(84)(x))
        return TorchLinear(self.num_classes)(x)


class FashionCNN(nn.Module):
    """2-conv-block CNN (latent_model.py:234-272)."""

    out_dim: int = 10
    use_for_guidance: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(32, (3, 3), padding=[(1, 1), (1, 1)])(x)
        x = nn.relu(_bn()(x, use_running_average=not train))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = TorchConv(64, (3, 3))(x)
        x = nn.relu(_bn()(x, use_running_average=not train))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = x.reshape(x.shape[0], -1)
        if self.use_for_guidance:
            x = TorchLinear(600)(x)
            x = TorchLinear(120)(x)
            return TorchLinear(self.out_dim)(x)
        return TorchLinear(self.out_dim)(x)


class SimNet(nn.Module):
    """conv-pool-conv-pool feature extractor (latent_model.py:216-227)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.max_pool(nn.relu(TorchConv(32, (5, 5))(x)), (2, 2), (2, 2))
        x = nn.max_pool(nn.relu(TorchConv(64, (5, 5))(x)), (2, 2), (2, 2))
        return x.reshape(x.shape[0], -1)


class _BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = TorchConv(self.features, (3, 3), self.strides, [(1, 1), (1, 1)], use_bias=False)(x)
        y = _bn()(y, use_running_average=not train)
        y = nn.relu(y)
        y = TorchConv(self.features, (3, 3), (1, 1), [(1, 1), (1, 1)], use_bias=False)(y)
        y = _bn()(y, use_running_average=not train)
        if residual.shape != y.shape:
            residual = TorchConv(self.features, (1, 1), self.strides, use_bias=False)(x)
            residual = _bn()(residual, use_running_average=not train)
        return nn.relu(y + residual)


class _Bottleneck(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = TorchConv(self.features, (1, 1), use_bias=False)(x)
        y = nn.relu(_bn()(y, use_running_average=not train))
        y = TorchConv(self.features, (3, 3), self.strides, [(1, 1), (1, 1)], use_bias=False)(y)
        y = nn.relu(_bn()(y, use_running_average=not train))
        y = TorchConv(self.features * 4, (1, 1), use_bias=False)(y)
        y = _bn()(y, use_running_average=not train)
        if residual.shape != y.shape:
            residual = TorchConv(self.features * 4, (1, 1), self.strides, use_bias=False)(x)
            residual = _bn()(residual, use_running_average=not train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """torchvision-layout ResNet18/50 classifier (pretraining/resnet.py
    ResNet18/build_ResNet; also the C21 aux guidance classifier,
    pretraining/encoder.py:29-61)."""

    num_classes: int = 2
    arch: str = "resnet18"

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        stages = {"resnet18": ([2, 2, 2, 2], _BasicBlock), "resnet50": ([3, 4, 6, 3], _Bottleneck)}
        if self.arch not in stages:
            raise ValueError(f"unknown resnet arch {self.arch!r}")
        blocks_per, block_cls = stages[self.arch]
        x = TorchConv(64, (7, 7), (2, 2), [(3, 3), (3, 3)], use_bias=False)(x)
        x = nn.relu(_bn()(x, use_running_average=not train))
        x = nn.max_pool(x, (3, 3), (2, 2), [(1, 1), (1, 1)])
        for i, n_blocks in enumerate(blocks_per):
            for j in range(n_blocks):
                strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = block_cls(64 * 2**i, strides)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if return_features:
            return x
        return TorchLinear(self.num_classes)(x)


class TrajectoryClassifier(nn.Module):
    """Equivalent of the reference's (dead) ``NewClassifier``
    (latent_model.py:50-90): classify a diffusion *trajectory* — a sequence
    of y states at ``timesteps/granularity`` selected time points — guided by
    an image feature, via a small encoder-decoder transformer
    (d_model 10, 2 heads, 4 layers) and an MLP head over the flattened
    decoder outputs.
    """

    num_classes: int = 10
    feature_dim: int = 151296
    seq_len: int = 20  # timesteps / granularity
    d_model: int = 10
    num_heads: int = 2
    num_layers: int = 4

    @nn.compact
    def __call__(self, trajectory: jnp.ndarray, x_feature: jnp.ndarray, train: bool = False):
        """trajectory: (B, seq_len, d_model); x_feature: (B, ...) image feature."""
        mem = nn.relu(TorchLinear(self.d_model)(x_feature.reshape(x_feature.shape[0], -1)))
        mem = mem[:, None, :]  # (B, 1, d_model) memory sequence
        h = trajectory
        for i in range(self.num_layers):
            # self-attention over the trajectory
            a = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, name=f"self{i}")(
                nn.LayerNorm(name=f"ln_s{i}")(h)
            )
            h = h + a
            # cross-attention to the image-feature memory
            c = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, name=f"cross{i}")(
                nn.LayerNorm(name=f"ln_c{i}")(h), mem
            )
            h = h + c
            f = TorchLinear(4 * self.d_model, name=f"ff1_{i}")(nn.LayerNorm(name=f"ln_f{i}")(h))
            h = h + TorchLinear(self.d_model, name=f"ff2_{i}")(nn.relu(f))
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(TorchLinear(128)(h))
        h = nn.relu(TorchLinear(64)(h))
        return TorchLinear(self.num_classes)(h)


class ResNetEncoder(nn.Module):
    """ResNet backbone + linear projection to feature_dim
    (latent_model.py:276-301)."""

    feature_dim: int = 128
    arch: str = "resnet18"

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet(num_classes=1, arch=self.arch)(x, train=train, return_features=True)
        return TorchLinear(self.feature_dim)(feats)
