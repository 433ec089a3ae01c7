"""ladine-tpu: TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
xingbpshen/nested-diffusion (LaDiNE, IEEE TMI 2025).

A probabilistic nested-ensemble classifier: a frozen ViT-B/16's intermediate
transformer blocks feed K mapping MLPs whose predictions condition K CARD-style
conditional diffusion models over the class-probability simplex. Inference draws
Monte-Carlo samples from each member's reverse chain — expressed here as a single
``lax.scan`` over timesteps with ``vmap`` over (members x trials), sharded over a
TPU mesh — and aggregates them into a prediction with epistemic uncertainty.

Layout:
    ops/       pure-function diffusion math, schedules, image corruptions
    models/    Flax modules: ViT-B/16 with taps, mapping MLPs, ConditionalModel
    kernels/   Pallas TPU kernels for the hot fused ops
    parallel/  mesh construction + sharding specs
    data/      ImageFolder pipeline, dataset constants, synthetic generators
    attacks/   white-box adversarial attacks via jax.grad (FGSM/PGD/BIM/CW/APGD)
    train/     optax training loops (ViT, mapping MLPs, diffusion members), EMA
    infer/     nested-ensemble inference engine + temperature calibration
    metrics/   accuracy, ECE, NLL, Brier, PIW, MC variance, majority vote
    utils/     checkpointing (orbax), logging, torch->flax weight conversion
    cli/       entry points mirroring the reference's three stages
"""

__version__ = "0.1.0"
