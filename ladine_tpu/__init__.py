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
    parallel/  mesh construction + sharding specs (member/data, FSDP)
    data/      ImageFolder pipeline, dataset constants, synthetic generators
    attacks/   white-box adversarial attacks via jax.grad (FGSM/PGD/BIM/CW/APGD)
    train/     optax training loops (ViT, mapping MLPs, diffusion members), EMA
    infer/     nested-ensemble inference engine + temperature calibration
    metrics/   accuracy, ECE, NLL, Brier, PIW, MC variance, majority vote
    utils/     checkpointing (orbax), logging, torch->flax weight conversion
    cli/       entry points mirroring the reference's three stages
"""

__version__ = "0.1.0"

# convenience top-level API (heavier submodules import lazily via these)
from ladine_tpu.config import Config  # noqa: E402,F401


def __getattr__(name):
    """Lazy top-level access: ladine_tpu.ConditionalModel etc. without paying
    import cost for unused subsystems."""
    lookup = {
        "ConditionalModel": "ladine_tpu.models",
        "MappingMLP": "ladine_tpu.models",
        "ViT": "ladine_tpu.models",
        "SEViTGuidance": "ladine_tpu.models",
        "DiffusionSchedule": "ladine_tpu.ops",
        "p_sample_loop": "ladine_tpu.ops",
        "ddim_sample_loop": "ladine_tpu.ops",
        "nested_ensemble_sample": "ladine_tpu.infer",
        "stack_members": "ladine_tpu.infer",
        "EvalConfig": "ladine_tpu.infer",
        "evaluate_ensemble": "ladine_tpu.infer",
        "temperature_search": "ladine_tpu.infer",
        "make_mesh": "ladine_tpu.parallel",
    }
    if name in lookup:
        import importlib

        return getattr(importlib.import_module(lookup[name]), name)
    raise AttributeError(f"module 'ladine_tpu' has no attribute {name!r}")
