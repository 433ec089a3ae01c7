"""The epsilon_theta noise-estimator network (ConditionalModel).

Behavioral parity with /root/reference/diffusion/latent_model.py:93-184:

* ``ConditionalLinear`` — Linear followed by a per-timestep multiplicative
  embedding gate (Embedding(n_steps, num_out) init U[0,1)).
* ``ConditionalModel`` — image encoder ``encoder_x`` (live arch 'linear':
  data_dim -> hidden -> hidden -> feature MLP with BatchNorm1d + Softplus)
  + BatchNorm, and a y-branch of three gated ConditionalLinears with
  guidance concat [y_t, y_hat], x (.) y multiplicative conditioning, and a
  linear head back to y_dim logits.

TPU-first design
----------------
The forward is split into ``encode`` (depends only on x) and ``eps``
(depends on y, t, y_hat and the *encoded* features). At inference BatchNorm
uses running stats, so features are exact when computed ONCE per image and
closed over inside the reverse-diffusion ``lax.scan`` — the reference
recomputes the 150528->4096 encoder at every one of the 1000 steps
(latent_model.py:169-171); we don't. The per-step cost is then just the
small y-branch (two feature_dim x feature_dim matmuls).

BatchNorm state: flax ``batch_stats`` collection. For ensembles the whole
variables pytree (params + batch_stats) is stacked across members and
vmapped, which keeps per-member running stats exactly as the reference's
five separate modules do.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ladine_tpu.models.initializers import (
    torch_linear_bias,
    torch_linear_kernel,
    uniform01,
)

# torch BatchNorm1d defaults: eps=1e-5, momentum=0.1 (torch's "momentum" is
# the weight of the NEW batch statistic; flax's is the weight of the OLD
# running average, hence 0.9).
_BN_EPS = 1e-5
_BN_MOMENTUM = 0.9


class TorchLinear(nn.Module):
    """nn.Dense with torch's default init (see initializers.py)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(fan_in),
            dtype=self.dtype,
        )(x)


class ConditionalLinear(nn.Module):
    """Linear + per-timestep multiplicative gate (latent_model.py:93-105)."""

    num_out: int
    n_steps: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        out = TorchLinear(self.num_out, dtype=self.dtype)(x)
        embed = self.param("embed", uniform01, (self.n_steps, self.num_out))
        # scalar t -> (num_out,) broadcast over batch; batched t -> (B, num_out)
        gamma = jnp.asarray(embed, out.dtype)[t]
        return gamma * out


class ConditionalModel(nn.Module):
    """epsilon_theta(x, y_t, t, y_hat) (latent_model.py:108-184, arch='linear').

    Attributes mirror the reference config (configs/chest_x_ray.yml:9-21):
    data_dim=150528, feature_dim=hidden_dim=4096, y_dim=num_classes,
    n_steps=timesteps+1, guidance=True.

    Call ``encode`` / ``eps`` via ``module.apply(vars, ..., method='encode')``
    or the full ``__call__`` for the fused forward.
    """

    data_dim: int = 150528
    feature_dim: int = 4096
    hidden_dim: int = 4096
    y_dim: int = 2
    n_steps: int = 1001
    guidance: bool = True
    arch: str = "linear"  # linear | simple | lenet | lenet5 | fashioncnn | resnet18 | resnet50
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        def bn(name):
            return nn.BatchNorm(epsilon=_BN_EPS, momentum=_BN_MOMENTUM, name=name)

        # encoder_x selection (latent_model.py:118-153). 'linear' is the live
        # path and takes flat (B, data_dim) input; the conv archs take NHWC
        # images (the reference only flattens for toy/simple/linear,
        # classification_train_separately.py:933-934).
        if self.arch == "linear":
            self.enc_lin1 = TorchLinear(self.hidden_dim, dtype=self.dtype, name="enc_lin1")
            self.enc_bn1 = bn("enc_bn1")
            self.enc_lin2 = TorchLinear(self.hidden_dim, dtype=self.dtype, name="enc_lin2")
            self.enc_bn2 = bn("enc_bn2")
            self.enc_lin3 = TorchLinear(self.feature_dim, dtype=self.dtype, name="enc_lin3")
        elif self.arch == "simple":
            from ladine_tpu.models.encoders import SimpleEncoder

            self.encoder_x = SimpleEncoder(out_dim=self.feature_dim, name="encoder_x")
        elif self.arch == "lenet":
            from ladine_tpu.models.encoders import LeNet

            self.encoder_x = LeNet(num_classes=self.feature_dim, name="encoder_x")
        elif self.arch == "lenet5":
            from ladine_tpu.models.encoders import LeNet5

            self.encoder_x = LeNet5(num_classes=self.feature_dim, name="encoder_x")
        elif self.arch == "fashioncnn":
            from ladine_tpu.models.encoders import FashionCNN

            self.encoder_x = FashionCNN(out_dim=self.feature_dim, name="encoder_x")
        elif self.arch in ("resnet18", "resnet50"):
            from ladine_tpu.models.encoders import ResNetEncoder

            self.encoder_x = ResNetEncoder(
                feature_dim=self.feature_dim, arch=self.arch, name="encoder_x"
            )
        else:
            raise ValueError(f"unknown encoder arch {self.arch!r}")
        self.norm = bn("norm")
        self.lin1 = ConditionalLinear(self.feature_dim, self.n_steps, dtype=self.dtype, name="lin1")
        self.unetnorm1 = bn("unetnorm1")
        self.lin2 = ConditionalLinear(self.feature_dim, self.n_steps, dtype=self.dtype, name="lin2")
        self.unetnorm2 = bn("unetnorm2")
        self.lin3 = ConditionalLinear(self.feature_dim, self.n_steps, dtype=self.dtype, name="lin3")
        self.unetnorm3 = bn("unetnorm3")
        self.lin4 = TorchLinear(self.y_dim, dtype=self.dtype, name="lin4")

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """encoder_x + final BatchNorm: (B, data_dim) -> (B, feature_dim).

        Depends only on x (and, in train mode, the batch) — at eval this is
        computed once per image and reused across all members' trials and
        timesteps.
        """
        if self.arch == "linear":
            h = self.enc_lin1(x)
            h = self.enc_bn1(h, use_running_average=not train)
            h = nn.softplus(h)
            h = self.enc_lin2(h)
            h = self.enc_bn2(h, use_running_average=not train)
            h = nn.softplus(h)
            h = self.enc_lin3(h)
        else:
            h = self.encoder_x(x, train=train)
        return self.norm(h, use_running_average=not train)

    def eps(
        self,
        f: jnp.ndarray,
        y: jnp.ndarray,
        t: jnp.ndarray,
        y_hat: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """The y-branch: gated linears + x(.)y conditioning -> eps logits.

        ``f`` is the output of :meth:`encode`. This is the body of the
        reverse-diffusion scan — keep it small and fusable.
        """
        if self.guidance:
            if y_hat is None:
                raise ValueError("guidance=True requires y_hat")
            y = jnp.concatenate([y, y_hat], axis=-1)
        h = self.lin1(y, t)
        h = self.unetnorm1(h, use_running_average=not train)
        h = nn.softplus(h)
        h = f * h
        h = self.lin2(h, t)
        h = self.unetnorm2(h, use_running_average=not train)
        h = nn.softplus(h)
        h = self.lin3(h, t)
        h = self.unetnorm3(h, use_running_average=not train)
        h = nn.softplus(h)
        return self.lin4(h)

    def __call__(
        self,
        x: jnp.ndarray,
        y: jnp.ndarray,
        t: jnp.ndarray,
        y_hat: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        f = self.encode(x, train=train)
        return self.eps(f, y, t, y_hat, train=train)
