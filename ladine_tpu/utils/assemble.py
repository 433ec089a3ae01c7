"""Stage-1 -> stage-3 guidance checkpoint assembly.

The reference glues its stages through the filesystem: ``make_files.sh:7-13``
moves the stage-1 whole-module pickles (``vit_base_patch16_224_{DS}.pth`` +
``MLPs/block_{i}.pth``) into the diffusion tree, and the runner unpickles
them into the SEViT ensemble (classification_train_separately.py:249-315).

Here the equivalents are Orbax checkpoints: stage 1a saves ``{"params":
<ViT>}`` (cli/train_transformer.py), stage 1b saves per-MLP ``{"params":
<MLP_k>}`` under ``MLPs/block_{k}`` (cli/train_mapping.py), and the stage-3
runner consumes ONE ``SEViTGuidance`` variable tree ``{"params": {"vit": ...,
"mlp0": ..., ..., "mlp{K-1}": ...}}``. These helpers convert between the two
layouts in both directions, so the three-stage pipeline actually connects:

    assemble_guidance(vit_ckpt, mlp_dir)      stage-1 ckpts -> guidance tree
    split_guidance(gvars, num_members)        guidance tree -> stage-1 parts
    export_guidance_stage1(gvars, out, ds)    guidance tree -> stage-1 ckpts
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax

from ladine_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _infer_num_members(mlp_dir: str) -> int:
    ks = []
    for name in os.listdir(mlp_dir):
        if name.startswith("block_") and name[len("block_"):].isdigit():
            ks.append(int(name[len("block_"):]))
    if not ks:
        raise FileNotFoundError(f"no block_<k> checkpoints under {mlp_dir}")
    n = max(ks) + 1
    missing = sorted(set(range(n)) - set(ks))
    if missing:
        raise FileNotFoundError(f"missing MLP checkpoints {missing} under {mlp_dir}")
    return n


def assemble_guidance(
    vit_ckpt: str,
    mlp_dir: Optional[str] = None,
    mlp_ckpts: Optional[Sequence[str]] = None,
    num_members: Optional[int] = None,
) -> Dict[str, Any]:
    """Build a full ``SEViTGuidance`` variable tree from stage-1 checkpoints.

    Args:
        vit_ckpt: stage-1a checkpoint (``{"params": <ViT params>}``).
        mlp_dir: directory holding ``block_0 .. block_{K-1}`` stage-1b
            checkpoints (``cli/train_mapping.py`` layout). Mutually exclusive
            with ``mlp_ckpts``.
        mlp_ckpts: explicit per-member checkpoint paths, in member order.
        num_members: expected K; inferred from the directory listing / path
            count when omitted, validated when given.

    Returns:
        ``{"params": {"vit": ..., "mlp0": ..., ...}}`` — loadable by
        ``SEViTGuidance.apply`` and saveable as a ``--guidance_ckpt``.
    """
    if (mlp_dir is None) == (mlp_ckpts is None):
        raise ValueError("pass exactly one of mlp_dir / mlp_ckpts")
    if mlp_dir is not None:
        n = _infer_num_members(mlp_dir)
        mlp_ckpts = [os.path.join(mlp_dir, f"block_{k}") for k in range(n)]
    if num_members is not None and len(mlp_ckpts) != num_members:
        raise ValueError(
            f"expected {num_members} mapping-MLP checkpoints, found {len(mlp_ckpts)}"
        )
    vit_tree, vit_meta = load_checkpoint(vit_ckpt)
    if "params" not in vit_tree:
        raise ValueError(f"{vit_ckpt} is not a stage-1a ViT checkpoint (no 'params')")
    gparams: Dict[str, Any] = {"vit": vit_tree["params"]}
    for k, path in enumerate(mlp_ckpts):
        tree, meta = load_checkpoint(path)
        if "params" not in tree:
            raise ValueError(f"{path} is not a stage-1b MLP checkpoint (no 'params')")
        saved_member = meta.get("member")
        if saved_member is not None and int(saved_member) != k:
            raise ValueError(
                f"{path} is MLP member {saved_member}, expected {k}: pass "
                "checkpoints in member order"
            )
        gparams[f"mlp{k}"] = tree["params"]
    return {"params": gparams}


def validate_guidance_tree(gvars: Any, template: Any, cast: bool = True,
                           what: str = "assembled guidance") -> Any:
    """Check an assembled tree against a template (a real init or a
    ``jax.eval_shape`` skeleton — only shapes/dtypes are read): same
    structure, same leaf shapes. Returns the tree cast+materialized to the
    template's dtypes, or unchanged (host) with ``cast=False`` so the caller
    can choose the device placement/dtype (e.g. bf16 eval casting without a
    transient fp32 copy). Raises ValueError with the offending path.
    ``what`` names the tree in error messages (also used for diffusion-member
    checkpoints, cli/runner.py init_members)."""
    flat_t = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    flat_g = dict(jax.tree_util.tree_flatten_with_path(gvars)[0])
    t_keys, g_keys = set(flat_t), set(flat_g)
    if t_keys != g_keys:
        missing = sorted(jax.tree_util.keystr(k) for k in t_keys - g_keys)
        extra = sorted(jax.tree_util.keystr(k) for k in g_keys - t_keys)
        raise ValueError(
            f"{what} does not match the model: missing={missing[:5]} "
            f"extra={extra[:5]} (checkpoint trained at different "
            "dimensions than this config?)"
        )
    for k in t_keys:
        if tuple(flat_t[k].shape) != tuple(flat_g[k].shape):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(k)}: checkpoint "
                f"{tuple(flat_g[k].shape)} vs model {tuple(flat_t[k].shape)}"
            )
    if not cast:
        return gvars
    import jax.numpy as jnp

    return jax.tree.map(lambda t, g: jnp.asarray(g, t.dtype), template, gvars)


def split_guidance(
    gvars: Any, num_members: Optional[int] = None
) -> Tuple[Dict[str, Any], List[Dict[str, Any]]]:
    """Inverse of :func:`assemble_guidance`: a guidance variable tree ->
    (vit checkpoint tree, [per-member MLP checkpoint trees])."""
    params = gvars["params"]
    if num_members is None:
        num_members = sum(1 for k in params if k.startswith("mlp"))
    vit_tree = {"params": params["vit"]}
    mlp_trees = [{"params": params[f"mlp{k}"]} for k in range(num_members)]
    return vit_tree, mlp_trees


def export_guidance_stage1(
    gvars: Any, out_dir: str, dataset: str, num_members: Optional[int] = None
) -> List[str]:
    """Write a guidance tree back out in the stage-1 checkpoint layout
    (``{out}/vit_{DS}`` + ``{out}/{DS}/MLPs/block_{k}``) — the inverse used
    to turn a ``--pretrain_guidance`` / ``--joint_train`` run's guidance into
    stage-1 artifacts. Returns the written paths."""
    vit_tree, mlp_trees = split_guidance(gvars, num_members)
    paths = []
    vit_path = os.path.join(out_dir, f"vit_{dataset}")
    save_checkpoint(vit_path, vit_tree, {"kind": "vit", "dataset": dataset})
    paths.append(vit_path)
    for k, tree in enumerate(mlp_trees):
        p = os.path.join(out_dir, dataset, "MLPs", f"block_{k}")
        save_checkpoint(p, tree, {"kind": "mapping_mlp", "member": k})
        paths.append(p)
    return paths
