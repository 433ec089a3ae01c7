"""Checkpointing via Orbax.

Replaces the reference's torch.save/torch.load of whole-module pickles and
state_dicts (classification_train_separately.py:1117-1127, :684-691,
train_transformer.py:161-167, train_mapping.py:155-160) with Orbax pytree
checkpoints. Unlike the reference, EMA shadows ARE checkpointed (the
reference computes but never saves them, SURVEY.md C6) and --resume works.

Checkpoint layout: a directory per ckpt containing the pytree plus a
metadata dict {'epoch': int, 'accuracy': float, 'kind': str}.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, tree: Any, metadata: Optional[Dict] = None) -> None:
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(tree), force=True)
    if metadata is not None:
        with open(os.path.join(path, "ladine_meta.json"), "w") as f:
            json.dump(metadata, f)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Tuple[Any, Dict]:
    """Returns (tree, metadata). ``target`` restores with matching structure
    and dtypes when given."""
    path = os.path.abspath(path)
    if target is not None:
        tree = _checkpointer().restore(path, item=jax.device_get(target))
    else:
        tree = _checkpointer().restore(path)
    return tree, load_checkpoint_meta(path)


def load_checkpoint_meta(path: str) -> Dict:
    """Read just the metadata sidecar — cheap (no pytree restore), for
    callers that need geometry (e.g. ensemble size) before deciding how to
    load the tree itself."""
    meta_path = os.path.join(os.path.abspath(path), "ladine_meta.json")
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        return json.load(f)


def best_checkpoint_name(kind: str, member: int, epoch: int, accuracy: float) -> str:
    """Reference naming scheme: diffu{k}_ckpt_best_eph{E}_acc{A}
    (classification_train_separately.py:1122-1124)."""
    return f"{kind}{member}_ckpt_best_eph{epoch}_acc{accuracy:.4f}"
