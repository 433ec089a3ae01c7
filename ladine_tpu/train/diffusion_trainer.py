"""Diffusion-member training: the CARD epsilon-matching objective.

Parity with the reference train loop (classification_train_separately.py:842-1152):
antithetic timestep sampling (:945-948), guidance softmax as both conditioning
and prior mean (:952-963), ``q_sample`` forward draw, MSE on epsilon (:975),
grad-clip 1.0 + Adam (:996-1006), EMA update (:1007-1009), warmup-cosine LR
(:927-928), periodic validation by sampling the full reverse chain and
checkpointing on best accuracy (:1054-1127).

TPU-first design
----------------
The reference trains its five members as five separate process invocations
(train.sh:15-79). Here all members train CONCURRENTLY: member states are
stacked pytrees, the per-member step is ``vmap``ped over the member axis, and
the full step (guidance forward included, no grad) is one jitted function.
On a mesh the member axis shards over 'member' and the batch over 'data' —
collectives are inserted by GSPMD; BatchNorm batch statistics are computed
over the GLOBAL batch automatically (jnp.mean over a sharded axis).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ladine_tpu.models.conditional import ConditionalModel
from ladine_tpu.models.guidance import SEViTGuidance
from ladine_tpu.ops.diffusion import antithetic_timesteps, q_sample
from ladine_tpu.ops.labels import one_hot_and_prototype
from ladine_tpu.ops.schedules import DiffusionSchedule
from ladine_tpu.train.ema import ema_init, ema_update
from ladine_tpu.train.lowmem import ema_init_bf16, ema_update_sr


class MemberTrainState(flax.struct.PyTreeNode):
    """Everything per diffusion member, stackable along a member axis."""

    params: Any
    batch_stats: Any
    opt_state: Any
    ema: Any
    step: jnp.ndarray


def create_member_state(
    model: ConditionalModel,
    key: jax.Array,
    tx: optax.GradientTransformation,
    batch_size: int = 2,
    lowmem: bool = False,
) -> MemberTrainState:
    """``lowmem``: bf16 EMA accumulator (pairs with make_optimizer(...,
    lowmem=True)'s bf16 Adam moments; train/lowmem.py)."""
    x = jnp.zeros((batch_size, model.data_dim))
    y = jnp.zeros((batch_size, model.y_dim))
    yhat = jnp.full((batch_size, model.y_dim), 1.0 / model.y_dim)
    variables = model.init(key, x, y, jnp.asarray(0), yhat)
    params = variables["params"]
    return MemberTrainState(
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
        ema=ema_init_bf16(params) if lowmem else ema_init(params),
        step=jnp.asarray(0, jnp.int32),
    )


def create_member_states(
    model: ConditionalModel,
    key: jax.Array,
    tx: optax.GradientTransformation,
    num_members: int,
    batch_size: int = 2,
    lowmem: bool = False,
) -> MemberTrainState:
    """Stacked states for all members (independent inits, like the
    reference's five separate runs).

    Members are built and stacked INCREMENTALLY: materializing all member
    states and then stacking holds two full copies at once — at full dims a
    single member's fp32 state (params/Adam moments/EMA) is ~11 GB, so the
    transient 2x OOMs a 16 GB chip even for num_members=1."""
    keys = jax.random.split(key, num_members)

    # donating the state lets XLA alias the buffers: expand_dims is a
    # zero-copy reshape, so the per-member expansion costs no extra HBM
    @functools.partial(jax.jit, donate_argnums=0)
    def expand(state):
        return jax.tree.map(lambda x: jnp.expand_dims(x, 0), state)

    out = None
    for k in keys:
        one = expand(create_member_state(model, k, tx, batch_size, lowmem))
        # concatenate one member at a time; the per-iteration transient is
        # one member's state, not the whole ensemble's
        out = one if out is None else jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), out, one
        )
    return out


def make_member_step(
    model: ConditionalModel,
    tx: optax.GradientTransformation,
    sched: DiffusionSchedule,
    ema_rate: float = 0.9999,
    noise_prior: bool = False,
) -> Callable:
    """One member's training step: (state, x_flat, y0, y0_hat, key) ->
    (state, loss). Pure — vmap/jit/shard freely.

    ``noise_prior`` zeroes the forward-process prior mean while keeping the
    y0_hat conditioning — the reference flag applies this at sampling
    (classification_train_separately.py:1565,1654); applying it in training
    too keeps the forward/reverse processes consistent (the reference's live
    train loop never consults the flag, :963-968)."""

    def step(
        state: MemberTrainState,
        x_flat: jnp.ndarray,
        y0: jnp.ndarray,
        y0_hat: jnp.ndarray,
        key: jax.Array,
    ) -> Tuple[MemberTrainState, jnp.ndarray]:
        n = x_flat.shape[0]
        k_t, k_e = jax.random.split(key)
        t = antithetic_timesteps(k_t, n, sched.num_timesteps)
        e = jax.random.normal(k_e, y0.shape, y0.dtype)
        y_T_mean = jnp.zeros_like(y0_hat) if noise_prior else y0_hat
        y_t = q_sample(y0, y_T_mean, sched, t, e)

        def loss_fn(params):
            eps_pred, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x_flat,
                y_t,
                t,
                y0_hat,
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean((e - eps_pred) ** 2), mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # the accumulator's dtype (static at trace time) selects the EMA
        # rule: bf16 state (optim.lowmem) accumulates with stochastic
        # rounding — (1-mu) increments are below the bf16 ulp, so
        # round-to-nearest would stall the average (train/lowmem.py). The
        # SR key is folded off the step key, leaving the t/noise stream
        # (k_t, k_e) bit-identical to the fp32 path.
        if jax.tree.leaves(state.ema)[0].dtype == jnp.bfloat16:
            new_ema = ema_update_sr(state.ema, new_params, ema_rate,
                                    jax.random.fold_in(key, 2))
        else:
            new_ema = ema_update(state.ema, new_params, ema_rate)
        return (
            state.replace(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                ema=new_ema,
                step=state.step + 1,
            ),
            loss,
        )

    return step


def make_multi_member_step(
    model: ConditionalModel,
    tx: optax.GradientTransformation,
    sched: DiffusionSchedule,
    ema_rate: float = 0.9999,
    noise_prior: bool = False,
) -> Callable:
    """All members advance on the same batch, each conditioned on its own
    guidance head: (stacked_state, x_flat, y0, y0_hat_members (M,B,C), key)
    -> (stacked_state, losses (M,))."""
    member_step = make_member_step(model, tx, sched, ema_rate, noise_prior)

    def step(states, x_flat, y0, y0_hat_members, key):
        keys = jax.random.split(key, y0_hat_members.shape[0])
        return jax.vmap(member_step, in_axes=(0, None, None, 0, 0))(
            states, x_flat, y0, y0_hat_members, keys
        )

    return step


def make_joint_train_step(
    guidance: SEViTGuidance,
    model: ConditionalModel,
    tx: optax.GradientTransformation,
    aux_tx: optax.GradientTransformation,
    sched: DiffusionSchedule,
    num_members: int,
    num_classes: int,
    ema_rate: float = 0.9999,
    head_indices: Optional[Tuple[int, ...]] = None,
    noise_prior: bool = False,
) -> Callable:
    """Joint training: diffusion members + the guidance classifier together.

    The reference carries this path (``nonlinear_guidance_model_train_step``,
    classification_train_separately.py:381-391, behind the live-disabled
    aux_cls.joint_train flag): each batch takes a CE step on all K+1 guidance
    heads with ``aux_tx`` and a diffusion step on every member conditioned on
    the (stop-gradient) updated guidance.

    (state_tuple, images, labels, key) -> (state_tuple, (aux_loss, losses))
    where state_tuple = (member_states, guidance_params, aux_opt_state).
    """
    multi_step = make_multi_member_step(model, tx, sched, ema_rate, noise_prior)
    idx = jnp.asarray(head_indices if head_indices is not None else range(num_members))

    def aux_loss_fn(gparams, images, labels):
        heads = guidance.apply({"params": gparams}, images)  # (K+1, B, C)
        logp = jax.nn.log_softmax(heads, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[None, :, None], axis=-1))

    def step(states, gparams, aux_opt_state, images, labels, key):
        aux_loss, grads = jax.value_and_grad(aux_loss_fn)(gparams, images, labels)
        updates, aux_opt_state = aux_tx.update(grads, aux_opt_state, gparams)
        gparams = optax.apply_updates(gparams, updates)

        heads = guidance.apply({"params": gparams}, images)
        y0_hat = jax.lax.stop_gradient(jax.nn.softmax(heads, axis=-1)[idx])
        y0, _ = one_hot_and_prototype(labels, num_classes)
        x_flat = images.reshape(images.shape[0], -1)
        states, losses = multi_step(states, x_flat, y0, y0_hat, key)
        return states, gparams, aux_opt_state, aux_loss, losses

    return step


def make_full_train_step(
    guidance: SEViTGuidance,
    model: ConditionalModel,
    tx: optax.GradientTransformation,
    sched: DiffusionSchedule,
    num_members: int,
    num_classes: int,
    ema_rate: float = 0.9999,
    head_indices: Optional[Tuple[int, ...]] = None,
    noise_prior: bool = False,
) -> Callable:
    """The COMPLETE jittable training step: images -> frozen SEViT guidance
    (stop-gradient) -> diffusion updates for every trained member.

    ``head_indices`` selects which guidance heads condition the stacked
    members (default 0..num_members-1); a single index reproduces the
    reference's per-member MLP_IDX training runs.

    The guidance VARIABLES are a step argument, not a factory closure: a
    closed-over tree gets baked into the lowered program as constants —
    ~13 GB of HLO literals at full dims (fatal for remote compilation, and
    a duplicate HBM copy).

    (stacked_state, guidance_vars, images NHWC, labels, key)
        -> (stacked_state, losses (M,))
    """
    multi_step = make_multi_member_step(model, tx, sched, ema_rate, noise_prior)
    idx = jnp.asarray(head_indices if head_indices is not None else range(num_members))

    def step(states, guidance_vars, images, labels, key):
        heads = guidance.apply(guidance_vars, images)  # (M+1, B, C) logits
        y0_hat = jax.lax.stop_gradient(jax.nn.softmax(heads, axis=-1)[idx])
        y0, _ = one_hot_and_prototype(labels, num_classes)
        x_flat = images.reshape(images.shape[0], -1)
        return multi_step(states, x_flat, y0, y0_hat, key)

    return step
