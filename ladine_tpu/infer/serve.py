"""Serving API: a packaged nested-ensemble predictor.

The reference has no deployment story — inference only exists inside
``test_atk``'s evaluation loop. For production serving this wraps the whole
artifact (guidance + stacked members + schedule + calibrated temperature +
sampler settings) behind one object:

    predictor = Predictor.load("./artifact")        # or Predictor(...) from parts
    out = predictor.predict(images)                  # NHWC float32 [0,1]
    out["probs"], out["majority_vote"], out["piw"], out["mc_variance"]

``predict`` is one jitted device program (compiled on first call, cached per
batch shape); the returned uncertainty is the per-instance prediction-
interval width and across-sample variance at the predicted class —
the per-request version of the reference's aggregate PIW/variance metrics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ladine_tpu.infer.engine import nested_ensemble_sample
from ladine_tpu.metrics.classification import convert_to_prob, majority_vote
from ladine_tpu.models.conditional import ConditionalModel
from ladine_tpu.models.guidance import SEViTGuidance
from ladine_tpu.ops.diffusion import ddim_timesteps
from ladine_tpu.ops.schedules import DiffusionSchedule


# Named serving presets for Predictor.load(path, preset=...). Each is an
# evidence-validated operating point of the same artifact (RESULTS.md /
# evidence/bench_battery_r4b.json; one v5e chip, batch 70):
#   parity  — the reference's exact test-time program: full ancestral chain,
#             bf16 (21.2 img/s; what every parity table row uses).
#   serving — 50-step stochastic strided sampler + int8 eps matmuls
#             (504.6 img/s; int8 row matches bf16 to 4 decimals).
#   fast    — 10-step sampler + int8 eps + resident int8 encoder/heads
#             (round-5 re-measure: 1590.0 img/s at B=70, 1945.1 at the
#             B=280 knee with p50 171.3 ms / p99 180.6 ms per request —
#             evidence/r5_bench_int8_b*.json; the knee survived the
#             round-5 kernel A/B unchanged, so the 280 bucket cap stands).
#             Step count validated by the evidence step sweep (DDIM-10 at
#             DDIM-50 accuracy/ECE) and the int8_enc suite row. The fused
#             Pallas int8 kernels measured SLOWER at every point
#             (docs/ROADMAP.md item 6) and stay out of every preset.
# A preset only sets sampler/quantization knobs — temperature, trials and
# head wiring always come from the artifact.
PRESETS = {
    "parity": dict(ddim_steps=0, use_int8=False, use_int8_encode=False),
    "serving": dict(ddim_steps=50, ddim_eta=1.0, skip_type="uniform",
                    use_int8=True, use_int8_encode=False),
    "fast": dict(ddim_steps=10, ddim_eta=1.0, skip_type="uniform",
                 use_int8=True, use_int8_encode=True),
}


@dataclasses.dataclass
class Predictor:
    guidance: SEViTGuidance
    guidance_vars: Any
    model: ConditionalModel
    stacked_vars: Any
    sched: DiffusionSchedule
    temperature: float = 0.1737
    mc_trials: int = 20
    ddim_steps: int = 50  # serving default: strided sampler (0 = full chain)
    # eta=1 (stochastic) is the serving default: deterministic strided
    # sampling collapses per-chain randomness to the y_T draw and measurably
    # degrades the MC posterior estimate (GMM validation: eta=0 MAE 0.036-
    # 0.043 vs eta=1 MAE 0.012 at 20-50 steps, ancestral 0.014)
    ddim_eta: float = 1.0
    skip_type: str = "uniform"  # strided timestep spacing: uniform | quad
    noise_prior: bool = False  # zero prior mean at T (reference --noise_prior)
    use_int8: bool = False
    use_int8_encode: bool = False  # int8 enc_lin1 (see EvalConfig)
    # fused Pallas int8 scan body (kernels/int8_pallas.py) instead of the
    # XLA int8 path; MC trials fold into GEMM rows. Opt-in pending the
    # hardware A/B (bench --pallas_int8) — takes precedence over use_int8.
    use_int8_pallas: bool = False
    # with use_int8_pallas: v2 kernels (lin1/lin4 fused in; bench --pallas_v2)
    pallas_fuse_ends: bool = False
    seed: int = 0
    # which guidance heads condition the stacked members; None = heads
    # 0..n_stacked-1 (set to e.g. (2,) for a single-member --mlp_idx artifact)
    head_indices: Optional[tuple] = None
    # jax.sharding.Mesh with axes ('member', 'data') for multi-chip serving:
    # stacked member variables shard over 'member', the request batch over
    # 'data', guidance stays replicated — the same GSPMD layout the
    # evaluator uses (infer/evaluator.py). None = single-device serving.
    # Not persisted by save(); pass Predictor.load(path, mesh=...) to attach.
    mesh: Any = None

    def __post_init__(self):
        self._tau = (
            ddim_timesteps(self.sched.num_timesteps, self.ddim_steps, self.skip_type)
            if self.ddim_steps
            else None
        )
        n_stacked = jax.tree.leaves(self.stacked_vars)[0].shape[0]
        # STATIC head list: heads_subset then runs the guidance transformer
        # only to the deepest needed tap and skips the full-ViT forward
        # entirely for mapping-only ensembles (the serving fixed-cost lever,
        # docs/ROADMAP.md "Serving fixed-cost")
        idx = tuple(
            int(i) for i in (
                self.head_indices if self.head_indices is not None else range(n_stacked)
            )
        )
        if len(idx) != n_stacked:
            raise ValueError(
                f"head_indices {self.head_indices} must match the {n_stacked} stacked members"
            )
        # JAX gather clamps out-of-range indices, which would silently
        # condition on the wrong head — validate eagerly instead
        n_heads = self.guidance.num_members + 1
        if self.head_indices is not None and any(
            not 0 <= int(i) < n_heads for i in self.head_indices
        ):
            raise ValueError(
                f"head_indices {self.head_indices} out of range: the guidance "
                f"has {n_heads} heads (0..{n_heads - 1})"
            )

        # --int8_encode also covers the guidance's mapping-head first layers
        # (the other half of the per-image fixed cost) when every
        # conditioning head is a mapping head (always true unless the
        # artifact conditions on the full-ViT head)
        int8_heads = self.use_int8_encode and all(
            int(i) < int(self.guidance.num_members) for i in idx
        )
        # run trees: what the jitted program actually receives. With
        # int8_encode they carry PRE-quantized int8 lin1 kernels (computed
        # once HERE, outside jit — quantizing inside the program re-reads
        # the full bf16 weight every call and wins nothing); save() keeps
        # serializing the untouched float originals.
        self._rv_g, self._rv_s = self.guidance_vars, self.stacked_vars
        enc_quantized = heads_quantized = False
        if self.use_int8_encode:
            from ladine_tpu.kernels.int8 import (
                quantize_encoder,
                quantize_mapping_heads,
            )

            # jitted: the cast/abs/round chain fuses into one streaming
            # pass instead of materializing fp32 copies of the stacked
            # 150528x4096 kernels (>12 GB transient at full dims — an OOM
            # on the 16 GB chip this feature targets)
            if self.model.arch == "linear":
                self._rv_s = jax.jit(jax.vmap(quantize_encoder))(
                    self.stacked_vars)
                enc_quantized = True
            if int8_heads:
                self._rv_g = jax.jit(
                    lambda g: quantize_mapping_heads(g, idx)
                )(self.guidance_vars)
                heads_quantized = True

        def _raw(gvars, stacked, images, key):
            if int8_heads:
                from ladine_tpu.kernels.int8 import int8_mapping_heads

                taps = self.guidance.apply(gvars, images, idx,
                                           method="taps_subset")
                heads = int8_mapping_heads(gvars, taps, idx)
            else:
                heads = self.guidance.apply(gvars, images, idx,
                                            method="heads_subset")
            y0_hat = jax.nn.softmax(heads.astype(jnp.float32), axis=-1)
            x_flat = images.reshape(images.shape[0], -1)
            samples = nested_ensemble_sample(
                self.model, stacked, x_flat, y0_hat, key, self.sched,
                mc_trials=self.mc_trials, tau=self._tau, eta=self.ddim_eta,
                use_int8_eps=self.use_int8 and not self.use_int8_pallas,
                noise_prior=self.noise_prior,
                use_int8_encode=self.use_int8_encode,
                use_int8_pallas=self.use_int8_pallas,
                pallas_fuse_ends=self.pallas_fuse_ends,
            )
            m, k, b, c = samples.shape
            flat = samples.reshape(m * k, b, c)
            probs = jnp.mean(convert_to_prob(flat, self.temperature), axis=0)
            mv = majority_vote(flat)
            lo = jnp.quantile(flat, 0.025, axis=0)
            hi = jnp.quantile(flat, 0.975, axis=0)
            piw = jnp.take_along_axis(hi - lo, mv[:, None], axis=1)[:, 0]
            var = jnp.take_along_axis(
                jnp.var(flat, axis=0, ddof=1), mv[:, None], axis=1
            )[:, 0]
            return probs, mv, piw, var

        # handle for export_serving (AOT deployment bundles)
        self._raw_fn = _raw
        if self.mesh is None:
            self._run = jax.jit(_raw)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            member = NamedSharding(self.mesh, P("member"))
            data = NamedSharding(self.mesh, P("data"))
            rep = NamedSharding(self.mesh, P())
            # resident layout: member-sharded ensemble, replicated guidance —
            # done ONCE here so every predict() reuses the distributed copy
            # (the RUN trees, which carry the int8 weights when enabled)
            self._rv_s = jax.tree.map(
                lambda x: jax.device_put(x, member), self._rv_s
            )
            self._rv_g = jax.tree.map(
                lambda x: jax.device_put(x, rep), self._rv_g
            )
            # wherever no quantization actually ran (per TREE, not per the
            # use_int8_encode flag — e.g. a non-'linear' arch never
            # quantizes the encoder) the run tree IS the weights: drop the
            # loaded originals instead of pinning a duplicate full-size
            # copy for the Predictor's lifetime (save() works off the
            # sharded trees). Quantized trees keep their float originals
            # alive for save().
            if not enc_quantized:
                self.stacked_vars = self._rv_s
            if not heads_quantized:
                self.guidance_vars = self._rv_g
            sharded = jax.jit(
                _raw,
                in_shardings=(
                    jax.tree.map(lambda _: rep, self._rv_g),
                    jax.tree.map(lambda _: member, self._rv_s),
                    data,
                    rep,
                ),
                # every output is batch-leading: probs (B,C), vote/piw/var (B,)
                out_shardings=(data, data, data, data),
            )
            plain_cache = {}
            data_dim = dict(
                zip(self.mesh.axis_names, self.mesh.devices.shape)
            )["data"]

            def _run(gvars, stacked, images, key):
                # a request batch that doesn't tile the data axis falls back
                # to an unsharded program (same fallback the evaluator uses
                # for drop_last=False tail batches)
                if images.shape[0] % data_dim != 0:
                    if "fn" not in plain_cache:
                        plain_cache["fn"] = jax.jit(_raw)
                    return plain_cache["fn"](gvars, stacked, images, key)
                return sharded(gvars, stacked, images, key)

            self._run = _run
        # itertools.count: atomic under the GIL — concurrent predict() calls
        # in a threaded server must not reuse a key
        import itertools

        self._counter = itertools.count()

    def predict(self, images: np.ndarray, key: Optional[jax.Array] = None) -> Dict[str, np.ndarray]:
        """images: (B, H, W, 3) float32 in [0, 1]. Returns numpy outputs."""
        s = self.guidance.img_size
        if images.ndim != 4 or images.shape[1:] != (s, s, 3):
            raise ValueError(
                f"predict expects images of shape (B, {s}, {s}, 3); got {images.shape}"
            )
        if key is None:
            key = jax.random.fold_in(jax.random.PRNGKey(self.seed), next(self._counter))
        probs, mv, piw, var = self._run(
            self._rv_g, self._rv_s, jnp.asarray(images), key
        )
        return {
            "probs": np.asarray(probs),
            "majority_vote": np.asarray(mv),
            "piw": np.asarray(piw),
            "mc_variance": np.asarray(var),
        }

    # ------------------------------------------------------------ artifact io

    @staticmethod
    def _dtype_name(dt) -> Optional[str]:
        return None if dt is None else jnp.dtype(dt).name

    @staticmethod
    def _dtype_from_name(name):
        return None if name is None else jnp.dtype(name).type

    def save(self, path: str) -> None:
        from ladine_tpu.utils.checkpoint import save_checkpoint

        meta = {
            "kind": "predictor",
            "temperature": self.temperature,
            "mc_trials": self.mc_trials,
            "ddim_steps": self.ddim_steps,
            "ddim_eta": self.ddim_eta,
            "skip_type": self.skip_type,
            "noise_prior": self.noise_prior,
            "use_int8": self.use_int8,
            "use_int8_encode": self.use_int8_encode,
            "use_int8_pallas": self.use_int8_pallas,
            "pallas_fuse_ends": self.pallas_fuse_ends,
            "head_indices": list(self.head_indices) if self.head_indices else None,
            # the COMPUTE dtype is part of the artifact: dropping it on
            # reload silently rebuilt bf16-run models as fp32 compute, so a
            # served predictor never ran the program the throughput/accuracy
            # evidence was measured on
            "dtype": self._dtype_name(self.model.dtype),
            "guidance": {
                "num_classes": self.guidance.num_classes,
                "num_members": self.guidance.num_members,
                "vit_depth": self.guidance.vit_depth,
                "img_size": self.guidance.img_size,
                "patch_size": self.guidance.patch_size,
                "embed_dim": self.guidance.embed_dim,
                "num_heads": self.guidance.num_heads,
                "mlp_hidden_dims": list(self.guidance.mlp_hidden_dims),
                "dtype": self._dtype_name(self.guidance.dtype),
            },
            "model": {
                "data_dim": self.model.data_dim,
                "feature_dim": self.model.feature_dim,
                "hidden_dim": self.model.hidden_dim,
                "y_dim": self.model.y_dim,
                "n_steps": self.model.n_steps,
                "arch": self.model.arch,
                "guidance": self.model.guidance,
            },
        }
        # the schedule arrays are persisted verbatim (not just num_timesteps):
        # a cosine/non-default-beta artifact must not silently reload as
        # linear 1e-4..0.02
        save_checkpoint(
            path,
            {
                "guidance": self.guidance_vars,
                "members": self.stacked_vars,
                "schedule": self.sched._asdict(),
            },
            meta,
        )

    def export_serving(self, path: str, batch_sizes=(70,)) -> None:
        """AOT deployment bundle: serialized StableHLO serving programs
        (``jax.export``, one per batch size) + the RUN weight trees (the
        pre-quantized int8 forms when enabled) + meta. Reload with
        ``ExportedPredictor.load`` — serving then needs no Flax model code,
        no tracing, and cannot diverge from the program that was validated.
        The reference has no deployment story at all (its inference exists
        only inside the evaluation loop); this is the TPU-native one.

        Fixed shapes by design (XLA serving programs are shape-specialized);
        to sit behind a MicroBatcher pass
        ``batch_sizes=MicroBatcher.bucket_sizes(cap)``. Platform-locked by
        design too: a bundle exported on CPU refuses to run on TPU (and
        vice versa) with a clear jax.export error — export on the platform
        you deploy to (the meta records ``platforms``). Single-topology:
        export the unsharded program — mesh serving reconstructs a
        Predictor with ``mesh=`` instead."""
        if self.mesh is not None:
            raise ValueError(
                "export_serving bundles the single-device program; "
                "mesh serving loads a Predictor with mesh= instead")
        import os

        from jax import export as jexport

        from ladine_tpu.utils.checkpoint import save_checkpoint

        s = self.guidance.img_size
        spec = lambda tree: jax.tree.map(  # noqa: E731
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            tree)
        key_spec = spec(jax.random.PRNGKey(0))
        os.makedirs(os.path.join(path, "programs"), exist_ok=True)
        jitted = jax.jit(self._raw_fn)
        for b in batch_sizes:
            exported = jexport.export(jitted)(
                spec(self._rv_g), spec(self._rv_s),
                jax.ShapeDtypeStruct((int(b), s, s, 3), jnp.float32),
                key_spec,
            )
            with open(os.path.join(path, "programs", f"serving_b{int(b)}.bin"),
                      "wb") as f:
                f.write(exported.serialize())
        save_checkpoint(
            os.path.join(path, "weights"),
            {"gvars": self._rv_g, "stacked": self._rv_s},
            {
                "kind": "exported_predictor",
                "batch_sizes": [int(b) for b in batch_sizes],
                "img_size": int(s),
                "seed": int(self.seed),
                "settings": {
                    "temperature": self.temperature,
                    "mc_trials": self.mc_trials,
                    "ddim_steps": self.ddim_steps,
                    "ddim_eta": self.ddim_eta,
                    "use_int8": self.use_int8,
                    "use_int8_encode": self.use_int8_encode,
                },
                "jax_version": jax.__version__,
                "platforms": list(exported.platforms),
            },
        )

    @classmethod
    def load(cls, path: str, preset: Optional[str] = None,
             dtype: Any = "artifact", **overrides) -> "Predictor":
        """Load a saved predictor artifact. ``preset`` applies a named
        sampler/quantization operating point (see PRESETS) on top of the
        artifact's saved settings; explicit ``overrides`` win over both.
        ``dtype``: compute dtype for the rebuilt modules — the default
        ``"artifact"`` restores the dtype the predictor was SAVED with
        (legacy artifacts without the field reload as fp32-compute, their
        historical behavior); pass ``"bfloat16"``/``"float32"``/``None``
        to override."""
        from ladine_tpu.utils.checkpoint import load_checkpoint

        if preset is not None and preset not in PRESETS:
            raise ValueError(
                f"unknown preset {preset!r}; available: {sorted(PRESETS)}")

        tree, meta = load_checkpoint(path)
        g = meta["guidance"]
        if dtype == "artifact":
            g_dtype = cls._dtype_from_name(g.get("dtype", meta.get("dtype")))
            m_dtype = cls._dtype_from_name(meta.get("dtype"))
        else:
            g_dtype = m_dtype = cls._dtype_from_name(dtype)
        guidance = SEViTGuidance(
            num_classes=g["num_classes"], num_members=g["num_members"],
            vit_depth=g["vit_depth"], img_size=g["img_size"], patch_size=g["patch_size"],
            embed_dim=g["embed_dim"], num_heads=g["num_heads"],
            mlp_hidden_dims=tuple(g["mlp_hidden_dims"]), dtype=g_dtype,
        )
        m = meta["model"]
        model = ConditionalModel(
            data_dim=m["data_dim"], feature_dim=m["feature_dim"],
            hidden_dim=m["hidden_dim"], y_dim=m["y_dim"], n_steps=m["n_steps"],
            arch=m.get("arch", "linear"), guidance=m.get("guidance", True),
            dtype=m_dtype,
        )
        sched = DiffusionSchedule(
            **{k: jnp.asarray(v) for k, v in tree["schedule"].items()}
        )
        hi = meta.get("head_indices")
        if ("ddim_eta" not in meta and "ddim_eta" not in overrides
                and (preset is None or "ddim_eta" not in PRESETS[preset])):
            # legacy artifacts (saved before ddim_eta existed) executed
            # eta=0.0 and were calibrated under it — preserve that behavior
            # rather than silently switching samplers (override via
            # load(..., ddim_eta=...) or an eta-setting preset to opt in to
            # the new default; in those cases the caller chose the eta, so
            # the legacy default never applies and the warning would
            # mislead — but a preset that does NOT set eta, like "parity",
            # must not suppress it)
            import warnings

            warnings.warn(
                f"predictor artifact {path} predates ddim_eta; defaulting to "
                "the legacy eta=0.0 it was saved under",
                stacklevel=2,
            )
        kwargs = dict(
            temperature=meta["temperature"], mc_trials=meta["mc_trials"],
            ddim_steps=meta["ddim_steps"], ddim_eta=meta.get("ddim_eta", 0.0),
            skip_type=meta.get("skip_type", "uniform"),
            noise_prior=meta.get("noise_prior", False),
            use_int8=meta["use_int8"],
            use_int8_encode=meta.get("use_int8_encode", False),
            use_int8_pallas=meta.get("use_int8_pallas", False),
            pallas_fuse_ends=meta.get("pallas_fuse_ends", False),
            head_indices=tuple(hi) if hi else None,
        )
        if preset is not None:
            kwargs.update(PRESETS[preset])
        kwargs.update(overrides)
        return cls(
            guidance=guidance, guidance_vars=tree["guidance"],
            model=model, stacked_vars=tree["members"], sched=sched, **kwargs,
        )


@dataclasses.dataclass
class ExportedPredictor:
    """Serve a ``Predictor.export_serving`` bundle: deserialized StableHLO
    programs + run weight trees. No Flax, no model classes, no tracing —
    the served program is byte-identical to the exported (validated) one.

    Fixed batch sizes by design; ``predict`` dispatches on the request's
    batch size and refuses sizes the bundle does not carry (front it with
    ``MicroBatcher(pad_to=...)`` or export the sizes you serve)."""

    programs: Dict[int, Any]
    gvars: Any
    stacked: Any
    settings: Dict[str, Any]
    img_size: int
    seed: int = 0

    def __post_init__(self):
        import itertools

        self._counter = itertools.count()

    @classmethod
    def load(cls, path: str) -> "ExportedPredictor":
        import glob
        import os

        from jax import export as jexport

        from ladine_tpu.utils.checkpoint import load_checkpoint

        tree, meta = load_checkpoint(os.path.join(path, "weights"))
        if meta.get("kind") != "exported_predictor":
            raise ValueError(
                f"{path} is not an export_serving bundle "
                f"(kind: {meta.get('kind', 'unknown')})")
        programs = {}
        for p in glob.glob(os.path.join(path, "programs", "serving_b*.bin")):
            b = int(os.path.basename(p)[len("serving_b"):-len(".bin")])
            with open(p, "rb") as f:
                programs[b] = jexport.deserialize(f.read())
        if not programs:
            raise ValueError(f"no serving programs under {path}/programs")
        return cls(programs=programs, gvars=tree["gvars"],
                   stacked=tree["stacked"], settings=meta["settings"],
                   img_size=int(meta["img_size"]),
                   seed=int(meta.get("seed", 0)))

    def predict(self, images: np.ndarray, key: Optional[jax.Array] = None) -> Dict[str, np.ndarray]:
        s = self.img_size
        if images.ndim != 4 or images.shape[1:] != (s, s, 3):
            raise ValueError(
                f"predict expects images of shape (B, {s}, {s}, 3); got {images.shape}")
        b = images.shape[0]
        if b not in self.programs:
            raise ValueError(
                f"bundle has programs for batch sizes "
                f"{sorted(self.programs)}, got {b} — pad/split the request "
                f"or re-export with batch_sizes=({b},)")
        if key is None:
            key = jax.random.fold_in(
                jax.random.PRNGKey(self.seed), next(self._counter))
        probs, mv, piw, var = self.programs[b].call(
            self.gvars, self.stacked, jnp.asarray(images, jnp.float32), key)
        return {
            "probs": np.asarray(probs),
            "majority_vote": np.asarray(mv),
            "piw": np.asarray(piw),
            "mc_variance": np.asarray(var),
        }
