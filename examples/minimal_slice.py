"""Minimum end-to-end LaDiNE slice (BASELINE.json config 1):

    one ChestXRay-shaped image -> frozen ViT taps -> mapping MLP 0 ->
    ConditionalModel member 0 -> 50-step DDIM reverse chain -> class
    probabilities,

on CPU-JAX, exercising every layer with no sharding. Run:

    python examples/minimal_slice.py [--full-size]

(default uses reduced-but-structurally-real sizes so it finishes in seconds;
--full-size uses ViT-B/16 + 4096-wide ConditionalModel shapes.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from ladine_tpu.infer import member_mc_sample
from ladine_tpu.metrics import convert_to_prob, majority_vote
from ladine_tpu.models import ConditionalModel, SEViTGuidance
from ladine_tpu.ops import DiffusionSchedule, ddim_timesteps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full-size", action="store_true")
    args = ap.parse_args()

    if args.full_size:
        img, patch, embed, heads, depth = 224, 16, 768, 12, 12
        feat, mlp_dims = 4096, (4096, 2048, 128)
    else:
        img, patch, embed, heads, depth = 32, 8, 32, 4, 5
        feat, mlp_dims = 64, (64, 32, 16)

    T, DDIM_STEPS, TRIALS = 1000, 50, 4
    key = jax.random.PRNGKey(0)

    # one image
    x = jax.random.uniform(key, (1, img, img, 3))

    # guidance: ViT with taps + mapping MLPs (here randomly initialized; load
    # trained checkpoints or convert reference .pth weights for real use)
    guidance = SEViTGuidance(
        num_classes=2, num_members=5, vit_depth=depth, img_size=img,
        patch_size=patch, embed_dim=embed, num_heads=heads, mlp_hidden_dims=mlp_dims,
    )
    gvars = guidance.init(jax.random.PRNGKey(1), x)
    heads_logits = guidance.apply(gvars, x)  # (6, 1, 2)
    y0_hat = jax.nn.softmax(heads_logits, axis=-1)[0]  # member 0's guidance, (1, 2)
    print("guidance heads:", np.asarray(jax.nn.softmax(heads_logits, -1))[:, 0].round(3).tolist())

    # member 0's conditional diffusion model
    cond = ConditionalModel(data_dim=img * img * 3, feature_dim=feat,
                            hidden_dim=feat, y_dim=2, n_steps=T + 1)
    x_flat = x.reshape(1, -1)
    member0 = cond.init(jax.random.PRNGKey(2), x_flat, jnp.zeros((1, 2)),
                        jnp.asarray(0), y0_hat)

    sched = DiffusionSchedule.create("linear", T, 1e-4, 0.02)
    tau = ddim_timesteps(T, DDIM_STEPS)

    t0 = time.time()
    samples = member_mc_sample(cond, member0, x_flat, y0_hat,
                               jax.random.PRNGKey(3), sched, TRIALS, tau=tau)
    samples.block_until_ready()
    print(f"{TRIALS} MC samples via {DDIM_STEPS}-step DDIM in {time.time() - t0:.1f}s")
    print("raw sample logits:", np.asarray(samples)[:, 0].round(3).tolist())

    probs = convert_to_prob(samples, temperature=0.1737)
    print("per-trial probabilities:", np.asarray(probs)[:, 0].round(3).tolist())
    print("mean probability:", np.asarray(probs.mean(axis=0))[0].round(3).tolist())
    print("majority vote:", int(majority_vote(samples)[0]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
