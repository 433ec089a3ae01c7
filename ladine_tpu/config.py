"""Typed configuration: one dataclass tree replacing the reference's three
config tiers (YAML sections -> recursive argparse.Namespace + ~40 CLI flags +
shell env vars; /root/reference/diffusion/main.py:166-296,
configs/chest_x_ray.yml:1-102).

Section and field names mirror the reference YAML so users can port configs
mechanically; ``Config.from_yaml`` accepts the reference's files directly.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class DataConfig:
    dataset: str = "ChestXRay"
    seed: int = 4444
    label_min_max: Tuple[float, float] = (0.001, 0.999)
    num_classes: int = 2
    num_workers: int = 4
    dataroot: str = "PATH"
    preprocess: str = "grayscaled"  # grayscaled | standardized (CLI --preprocess)


@dataclass
class ModelConfig:
    data_dim: int = 150528  # 224*224*3
    feature_dim: int = 4096
    hidden_dim: int = 4096
    arch: str = "linear"
    # backbone geometry (reference: timm ViT-B/16 fixed; configurable here)
    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    vit_depth: int = 12
    num_heads: int = 12
    mlp_hidden_dims: Tuple[int, ...] = (4096, 2048, 128)
    var_type: str = "fixedlarge"
    ema_rate: float = 0.9999
    ema: bool = True
    # TPU additions
    dtype: str = "float32"  # or "bfloat16"
    use_pallas: bool = False
    fsdp: bool = False  # shard params/opt-state/EMA over the data axis too


@dataclass
class DiffusionConfig:
    beta_schedule: str = "linear"
    beta_start: float = 1e-4
    beta_end: float = 0.02
    timesteps: int = 1000
    include_guidance: bool = True
    apply_aux_cls: bool = True
    trained_aux_cls_ckpt_path: str = "./data/classification/pretrained/chest_x_ray_ckpt"
    trained_diffusion_ckpt_path: List[str] = field(default_factory=list)
    aux_cls_arch: str = "sevit"
    num_members: int = 5
    # reference --noise_prior (main.py:83-86,189): zero prior mean at T
    # instead of the guidance prediction, through BOTH q_sample and the
    # reverse chain (used by the tune_T/test_image_task paths,
    # classification_train_separately.py:1565,1654)
    noise_prior: bool = False
    # Where --noise_prior applies during TRAINING. True (default): the zero
    # prior also enters q_sample, keeping forward/reverse consistent. False:
    # reference-exact semantics — the live reference train loop never
    # consults the flag (classification_train_separately.py:963-968; it only
    # zeroes the prior at sampling, :1565,:1654), so reference --noise_prior
    # checkpoints train WITH the guidance prior. Set False for weight
    # compatibility with such checkpoints (PARITY.md documented deviations).
    noise_prior_training: bool = True
    # TPU addition: strided sampler (0 = full ancestral, reference behavior)
    ddim_steps: int = 0
    # eta=1 (stochastic strided) is the default: eta=0 collapses per-chain
    # randomness to the y_T draw and measurably degrades the MC vote
    # posterior (GMM validation, examples/gmm_posterior.py); unused when
    # ddim_steps == 0
    ddim_eta: float = 1.0
    # validation-only sampler stride during training (0 = use ddim_steps);
    # the full 1000-step chain makes every 10th epoch cost ~a test pass
    val_ddim_steps: int = 0
    # DDIM-heritage --skip_type (main.py:133-139): uniform | quad
    skip_type: str = "uniform"


@dataclass
class TrainingConfig:
    batch_size: int = 30
    n_epochs: int = 1000
    warmup_epochs: int = 40
    snapshot_freq: int = 1_000_000_000
    logging_freq: int = 1200
    validation_freq: int = 10


@dataclass
class SamplingConfig:
    batch_size: int = 30
    last_only: bool = True


@dataclass
class TestingConfig:
    batch_size: int = 70
    n_samples: int = 100  # total MC samples = members * trials
    mc_trials: int = 20
    n_bins: int = 10
    PICP_range: Tuple[float, float] = (2.5, 97.5)
    drop_last: bool = True  # reference test loaders drop the tail batch


@dataclass
class OptimConfig:
    weight_decay: float = 0.0
    optimizer: str = "Adam"
    lr: float = 1e-3
    beta1: float = 0.9
    amsgrad: bool = False
    eps: float = 1e-8
    grad_clip: float = 1.0
    lr_schedule: bool = True
    min_lr: float = 0.0
    # bf16 Adam moments + bf16 EMA accumulator with stochastic rounding
    # (train/lowmem.py): cuts the bandwidth-bound member step's analytic
    # HBM floor from 40*P to 28*P bytes. No reference counterpart (fp32
    # Adam, utils.py:52-63); accuracy-gated by tests/test_lowmem.py.
    lowmem: bool = False


@dataclass
class AuxConfig:
    """Stage-1 trainer settings (train_transformer.py:94-97,
    train_mapping.py:66-75)."""

    vit_lr: float = 1e-4
    vit_weight_decay: float = 0.1
    vit_epochs: int = 200
    vit_step_size: int = 10
    vit_gamma: float = 0.5
    mlp_lr: float = 1e-3
    mlp_epochs: int = 301
    mlp_step_size: int = 20
    mlp_gamma: float = 0.5


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    testing: TestingConfig = field(default_factory=TestingConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    aux_optim: OptimConfig = field(default_factory=OptimConfig)
    aux: AuxConfig = field(default_factory=AuxConfig)

    # ------------------------------------------------------------------ io

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        cfg = cls()
        for section, values in d.items():
            if not hasattr(cfg, section) or not isinstance(values, dict):
                continue
            sub = getattr(cfg, section)
            for k, v in values.items():
                _assign(sub, k, v)
        return cfg

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def save_yaml(self, path: str) -> None:
        """Config snapshot into the log dir (reference main.py:221-222)."""
        import yaml

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f)

    def apply_overrides(self, overrides: Dict[str, Any]) -> "Config":
        """Dotted-path CLI overrides, e.g. {'diffusion.timesteps': 50}
        (replacing the reference's hand-wired flag-over-YAML block,
        main.py:184-195)."""
        for path, value in overrides.items():
            obj = self
            *parents, leaf = path.split(".")
            for p in parents:
                obj = getattr(obj, p)
            _assign(obj, leaf, value)
        return self


def _assign(obj: Any, key: str, value: Any) -> None:
    # tolerate reference-YAML field aliases and ignore unknown keys
    aliases = {
        "n_bins": "n_bins",
        "sampling_size": None,  # unused here
        "type": None,
        "n_input_channels": None,
        "n_input_padding": None,
        "cat_x": None,
        "cat_y_pred": None,
        "vis_step": None,
        "num_figs": None,
        "granularity": None,
        "trained_aux_cls_ckpt_name": None,
        "aux_cls": None,  # nested; handled below
    }
    if key == "aux_cls" and isinstance(value, dict):
        if "arch" in value and hasattr(obj, "aux_cls_arch"):
            obj.aux_cls_arch = value["arch"]
        return
    if key in aliases and aliases[key] is None:
        return
    if not hasattr(obj, key):
        return
    current = getattr(obj, key)
    if isinstance(current, tuple) and isinstance(value, (list, tuple)):
        value = tuple(value)
    if isinstance(value, list) and value and isinstance(value[0], list):
        value = value[0]  # reference nests ckpt path lists one level deep
    setattr(obj, key, value)
