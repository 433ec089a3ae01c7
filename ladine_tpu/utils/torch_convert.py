"""torch -> flax weight conversion for the reference's pretrained artifacts.

The reference's three stages hand off whole-module torch pickles
(vit_base_patch16_224_{DS}.pth, MLPs/block_{i}.pth) and diffusion
state_dicts (diffu{k}_ckpt_best_*.pth with key 'noise_estimator') —
SURVEY.md section 1 "artifact handoff". These converters map torch
state_dicts (timm 0.3.x ViT layout, the reference MLP, and the
ConditionalModel) onto our Flax parameter pytrees so numerical-parity
evaluation against reference-trained weights is possible on TPU.

Conventions: torch Linear stores (out, in) -> flax (in, out) transpose;
torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out); BatchNorm
weight/bias/running_mean/running_var -> scale/bias + batch_stats mean/var.

torch is only needed to *load* .pth files; converters accept plain
numpy state dicts too (e.g. re-serialized without torch).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_torch_state_dict(path: str, key: str = None) -> Dict[str, np.ndarray]:
    """Load a .pth file into a flat numpy state dict.

    Handles all three reference artifact formats: whole-module pickles
    (reduced via .state_dict()), plain state dicts, and the diffusion
    checkpoint wrapper {'noise_estimator': state_dict, 'optimizer': ...,
    'epoch': ...} (classification_train_separately.py:1121-1126) — pass
    ``key`` to pick a member explicitly, else the wrapper is auto-unwrapped.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if key is not None:
        obj = obj[key]
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
    elif isinstance(obj, dict) and "noise_estimator" in obj:
        obj = obj["noise_estimator"]
    return {k: _np(v) for k, v in obj.items()}


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _bn(sd: Mapping[str, np.ndarray], prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def convert_mapping_mlp(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference Classifier (mapping/models/mlp.py:4-29) -> MappingMLP params."""
    return {
        f"linear{i}": {"Dense_0": _linear(sd, f"linear{i}")} for i in range(1, 5)
    }


def convert_conditional_model(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ConditionalModel ('linear' arch, guidance=True;
    latent_model.py:108-184) -> our ConditionalModel variables
    ({'params', 'batch_stats'}).

    torch layout: encoder_x.{0,3,6} Linear, encoder_x.{1,4} BatchNorm1d,
    norm BatchNorm1d, lin{1,2,3}.{lin Linear, embed Embedding}, unetnorm{1,2,3}
    BatchNorm1d, lin4 Linear.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for ours, theirs in [("enc_lin1", "encoder_x.0"), ("enc_lin2", "encoder_x.3"),
                         ("enc_lin3", "encoder_x.6")]:
        params[ours] = {"Dense_0": _linear(sd, theirs)}
    for ours, theirs in [("enc_bn1", "encoder_x.1"), ("enc_bn2", "encoder_x.4"),
                         ("norm", "norm")]:
        p, s = _bn(sd, theirs)
        params[ours], stats[ours] = p, s
    for i in (1, 2, 3):
        params[f"lin{i}"] = {
            "TorchLinear_0": {"Dense_0": _linear(sd, f"lin{i}.lin")},
            "embed": _np(sd[f"lin{i}.embed.weight"]),
        }
        p, s = _bn(sd, f"unetnorm{i}")
        params[f"unetnorm{i}"], stats[f"unetnorm{i}"] = p, s
    params["lin4"] = {"Dense_0": _linear(sd, "lin4")}
    return {"params": params, "batch_stats": stats}


def convert_vit(sd: Mapping[str, np.ndarray], depth: int = 12) -> Dict[str, Any]:
    """timm 0.3.x vit_base_patch16_224 state dict -> our ViT params.

    timm layout: patch_embed.proj (Conv2d), cls_token, pos_embed,
    blocks.{i}.{norm1, attn.qkv, attn.proj, norm2, mlp.fc1, mlp.fc2}, norm,
    head.
    """
    params: Dict[str, Any] = {
        "patch_proj": {
            "kernel": _np(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "norm": {"scale": _np(sd["norm.weight"]), "bias": _np(sd["norm.bias"])},
        "head": {"Dense_0": _linear(sd, "head")},
    }
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": {"scale": _np(sd[f"{p}.norm1.weight"]), "bias": _np(sd[f"{p}.norm1.bias"])},
            "norm2": {"scale": _np(sd[f"{p}.norm2.weight"]), "bias": _np(sd[f"{p}.norm2.bias"])},
            "attn": {
                "qkv": {"Dense_0": _linear(sd, f"{p}.attn.qkv")},
                "proj": {"Dense_0": _linear(sd, f"{p}.attn.proj")},
            },
            "mlp": {
                "fc1": {"Dense_0": _linear(sd, f"{p}.mlp.fc1")},
                "fc2": {"Dense_0": _linear(sd, f"{p}.mlp.fc2")},
            },
        }
    return params


# --------------------------------------------------------------------------
# Inverse direction: flax -> reference torch state dicts. A TPU-trained model
# can be exported back into the reference's artifact formats, so a user can
# migrate in either direction (or cross-check the two implementations on the
# same weights). Each exporter is the exact inverse of the converter above;
# tests round-trip through both.
# --------------------------------------------------------------------------


def _inv_linear(tree: Mapping[str, Any], prefix: str, out: Dict[str, np.ndarray]):
    out[f"{prefix}.weight"] = np.ascontiguousarray(_np(tree["kernel"]).T)
    out[f"{prefix}.bias"] = _np(tree["bias"])


def _inv_bn(params: Mapping[str, Any], stats: Mapping[str, Any], prefix: str,
            out: Dict[str, np.ndarray]):
    out[f"{prefix}.weight"] = _np(params["scale"])
    out[f"{prefix}.bias"] = _np(params["bias"])
    out[f"{prefix}.running_mean"] = _np(stats["mean"])
    out[f"{prefix}.running_var"] = _np(stats["var"])
    # torch BatchNorm1d tracks this buffer; harmless constant on reload
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_mapping_mlp(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """MappingMLP params -> reference Classifier state dict
    (mapping/models/mlp.py:4-29)."""
    out: Dict[str, np.ndarray] = {}
    for i in range(1, 5):
        _inv_linear(params[f"linear{i}"]["Dense_0"], f"linear{i}", out)
    return out


def export_conditional_model(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Our ConditionalModel variables -> reference ConditionalModel state
    dict ('linear' arch, guidance=True; latent_model.py:108-184) — the
    payload of the reference's {'noise_estimator': ...} checkpoint."""
    params, stats = variables["params"], variables["batch_stats"]
    out: Dict[str, np.ndarray] = {}
    for ours, theirs in [("enc_lin1", "encoder_x.0"), ("enc_lin2", "encoder_x.3"),
                         ("enc_lin3", "encoder_x.6")]:
        _inv_linear(params[ours]["Dense_0"], theirs, out)
    for ours, theirs in [("enc_bn1", "encoder_x.1"), ("enc_bn2", "encoder_x.4"),
                         ("norm", "norm")]:
        _inv_bn(params[ours], stats[ours], theirs, out)
    for i in (1, 2, 3):
        _inv_linear(params[f"lin{i}"]["TorchLinear_0"]["Dense_0"], f"lin{i}.lin", out)
        out[f"lin{i}.embed.weight"] = _np(params[f"lin{i}"]["embed"])
        _inv_bn(params[f"unetnorm{i}"], stats[f"unetnorm{i}"], f"unetnorm{i}", out)
    _inv_linear(params["lin4"]["Dense_0"], "lin4", out)
    return out


def export_vit(params: Mapping[str, Any], depth: int = 12) -> Dict[str, np.ndarray]:
    """Our ViT params -> timm 0.3.x vit_base_patch16_224 state dict.

    The reference's stage-1 artifact is a whole-module pickle; load this
    state dict into a timm module and re-pickle to reproduce it exactly:
    ``m = timm.create_model('vit_base_patch16_224'); m.head = nn.Linear(768, C);
    m.load_state_dict(torch.load(path)); torch.save(m, out)``.
    """
    out: Dict[str, np.ndarray] = {
        "patch_embed.proj.weight": np.ascontiguousarray(
            _np(params["patch_proj"]["kernel"]).transpose(3, 2, 0, 1)
        ),
        "patch_embed.proj.bias": _np(params["patch_proj"]["bias"]),
        "cls_token": _np(params["cls_token"]),
        "pos_embed": _np(params["pos_embed"]),
        "norm.weight": _np(params["norm"]["scale"]),
        "norm.bias": _np(params["norm"]["bias"]),
    }
    _inv_linear(params["head"]["Dense_0"], "head", out)
    for i in range(depth):
        b, p = params[f"block{i}"], f"blocks.{i}"
        out[f"{p}.norm1.weight"] = _np(b["norm1"]["scale"])
        out[f"{p}.norm1.bias"] = _np(b["norm1"]["bias"])
        out[f"{p}.norm2.weight"] = _np(b["norm2"]["scale"])
        out[f"{p}.norm2.bias"] = _np(b["norm2"]["bias"])
        _inv_linear(b["attn"]["qkv"]["Dense_0"], f"{p}.attn.qkv", out)
        _inv_linear(b["attn"]["proj"]["Dense_0"], f"{p}.attn.proj", out)
        _inv_linear(b["mlp"]["fc1"]["Dense_0"], f"{p}.mlp.fc1", out)
        _inv_linear(b["mlp"]["fc2"]["Dense_0"], f"{p}.mlp.fc2", out)
    return out


def save_torch_state_dict(sd: Mapping[str, np.ndarray], path: str,
                          wrapper_key: str = None, epoch: int = 0) -> None:
    """Write a numpy state dict as a .pth the reference can load.

    ``wrapper_key='noise_estimator'`` reproduces the diffusion checkpoint
    wrapper {'noise_estimator': sd, 'optimizer': {}, 'epoch': E}
    (classification_train_separately.py:1120-1122; the reference only reads
    'noise_estimator' back, :690-691)."""
    import torch

    def to_tensor(v):
        v = np.ascontiguousarray(v)
        try:
            return torch.from_numpy(v)
        except TypeError:
            # non-numpy-native dtypes (e.g. ml_dtypes bfloat16 from a
            # --light_ckpt save) -> fp32, the reference's storage dtype
            return torch.from_numpy(v.astype(np.float32))

    tensors = {k: to_tensor(v) for k, v in sd.items()}
    obj = (
        {wrapper_key: tensors, "optimizer": {}, "epoch": epoch}
        if wrapper_key
        else tensors
    )
    torch.save(obj, path)
