"""Stage-1 trainers: ViT fine-tune and mapping-MLP training.

Parity:
* ViT fine-tune (/root/reference/mapping/train_transformer.py:24-172):
  timm ViT-B/16 with a fresh num_classes head, AdamW lr 1e-4 wd 0.1,
  StepLR(10, gamma 0.5), cross-entropy, best-val-accuracy checkpointing.
* Mapping MLPs (/root/reference/mapping/train_mapping.py:23-165): MLP_k on
  the frozen ViT truncated at block k+1 (bare-patch tap path), Adam
  (lr 1e-3 ChestXRay / 5e-4 ISIC), StepLR(20, 0.5), cross-entropy.

TPU-first: the reference trains the five MLPs as five separate script runs,
re-running the frozen ViT prefix each time. All taps have identical shape
(B, 196, 768), so here ONE tapped ViT forward feeds all K MLPs and their
parameter pytrees are stacked and vmapped — 5x fewer ViT forwards and one
jitted step for the whole stage.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ladine_tpu.models.mlp import MappingMLP
from ladine_tpu.models.vit import ViT


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    batch_stats: Any = None  # for BatchNorm backbones (ResNet)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))


# ---------------------------------------------------------------- ViT stage


def create_vit_state(
    vit, key: jax.Array, tx: optax.GradientTransformation, image_size: int = 224
) -> TrainState:
    """Works for any backbone with signature (x, train=False) — ViT (no BN)
    or ResNet (BN -> batch_stats threaded through the state)."""
    x = jnp.zeros((1, image_size, image_size, 3))
    variables = vit.init(key, x)
    params = variables["params"]
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.asarray(0),
        batch_stats=variables.get("batch_stats"),
    )


def make_vit_train_step(vit, tx: optax.GradientTransformation) -> Callable:
    def step(state: TrainState, images, labels) -> Tuple[TrainState, jnp.ndarray, jnp.ndarray]:
        has_bn = state.batch_stats is not None

        def loss_fn(params):
            if has_bn:
                logits, mutated = vit.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, train=True, mutable=["batch_stats"],
                )
                return cross_entropy(logits, labels), (logits, mutated["batch_stats"])
            logits = vit.apply({"params": params}, images, train=True)
            return cross_entropy(logits, labels), (logits, None)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return (
            state.replace(
                params=optax.apply_updates(state.params, updates),
                opt_state=new_opt,
                step=state.step + 1,
                batch_stats=new_bs if has_bn else None,
            ),
            loss,
            jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32)),
        )

    return step


def make_vit_eval_step(vit) -> Callable:
    def step(params, images, labels, batch_stats=None):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        logits = vit.apply(variables, images)
        return jnp.sum((jnp.argmax(logits, -1) == labels).astype(jnp.float32))

    return step


# ------------------------------------------------------------ mapping stage


def create_mapping_states(
    mlp: MappingMLP,
    key: jax.Array,
    tx: optax.GradientTransformation,
    num_members: int,
    num_patches: int = 196,
    embed_dim: int = 768,
    member_indices: Tuple[int, ...] = None,
) -> TrainState:
    """Independent inits for K MLPs, stacked along a member axis.

    ``member_indices`` builds states for a subset only, using the SAME
    per-member keys as the full stack (split by ``num_members``) — so a
    per-member run initializes member k identically to the concurrent run."""
    x = jnp.zeros((1, num_patches, embed_dim))

    def one(k):
        params = mlp.init(k, x)["params"]
        return TrainState(params=params, opt_state=tx.init(params), step=jnp.asarray(0))

    keys = jax.random.split(key, num_members)
    if member_indices is not None:
        keys = [keys[k] for k in member_indices]
    states = [one(k) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def make_mapping_train_step(
    vit: ViT, vit_params: Any, mlp: MappingMLP, tx: optax.GradientTransformation,
    num_members: int, member_indices: Tuple[int, ...] = None,
) -> Callable:
    """One jitted step training mapping MLPs on their taps from a single
    frozen-ViT forward: (stacked_state, images, labels) ->
    (stacked_state, losses (K,), accs (K,)).

    ``member_indices`` restricts the step to a subset of members (tap depth
    k+1 for member k) — the full-size MLPs are ~625M params each, so all
    five Adam states (~37 GB fp32) exceed one 16 GB chip; the per-member
    mode matches the reference's five separate train_mapping.py runs."""
    depths = tuple(
        k + 1 for k in (member_indices if member_indices is not None
                        else range(num_members))
    )

    def one_member(state: TrainState, tap, labels):
        def loss_fn(params):
            logits = mlp.apply({"params": params}, tap)
            return cross_entropy(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return (
            state.replace(
                params=optax.apply_updates(state.params, updates),
                opt_state=new_opt,
                step=state.step + 1,
            ),
            loss,
            acc,
        )

    def step(states, images, labels):
        taps = vit.apply({"params": vit_params}, images, depths, method="tap_features")
        taps = jax.lax.stop_gradient(jnp.stack(taps))  # (K, B, 196, D)
        return jax.vmap(one_member, in_axes=(0, 0, None))(states, taps, labels)

    return step


def make_mapping_eval_step(
    vit: ViT, vit_params: Any, mlp: MappingMLP, num_members: int,
    member_indices: Tuple[int, ...] = None,
) -> Callable:
    depths = tuple(
        k + 1 for k in (member_indices if member_indices is not None
                        else range(num_members))
    )

    def step(stacked_params, images, labels):
        taps = vit.apply({"params": vit_params}, images, depths, method="tap_features")
        taps = jnp.stack(taps)
        logits = jax.vmap(lambda p, t: mlp.apply({"params": p}, t))(stacked_params, taps)
        return jnp.sum((jnp.argmax(logits, -1) == labels[None]).astype(jnp.float32), axis=1)

    return step
