"""Device mesh construction and sharding specs.

The reference has NO parallelism (SURVEY.md C23/C24: one CUDA device,
sequential members, CPU<->GPU swaps for memory). The TPU-native equivalent:
a 2-D mesh with axes ``('member', 'data')`` —

* the stacked ensemble-member axis (params, optimizer state, EMA, MC
  samples) shards over 'member';
* the image batch shards over 'data';
* guidance (ViT + MLP) parameters are small and replicated.

All collectives (psum for the data-parallel gradient, all-gathers where a
member needs the full batch) are inserted by GSPMD from these annotations —
there is no hand-written communication. BatchNorm statistics inside the
jitted train step are computed over the GLOBAL batch because jnp.mean over a
sharded axis lowers to a psum over 'data'.

TP/PP/SP/EP are intentionally absent: the largest layer is 150528x4096 and
the longest sequence 197 tokens — nothing here benefits from intra-layer
partitioning (SURVEY.md C23).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MEMBER_AXIS = "member"
DATA_AXIS = "data"


def factor_mesh(n_devices: int, num_members: int) -> Tuple[int, int]:
    """Pick (member_dim, data_dim) with member_dim * data_dim == n_devices.

    member_dim is the largest divisor of n_devices that also divides
    num_members (so the member axis shards evenly); the rest goes to data.
    With the reference's 5 members on 8 devices this is (1, 8) — pure DP —
    while 10 members on 8 devices gives (2, 4).
    """
    best = 1
    for d in range(1, n_devices + 1):
        if n_devices % d == 0 and num_members % d == 0:
            best = d
    return best, n_devices // best


def make_mesh(
    n_devices: Optional[int] = None,
    num_members: int = 5,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    m, d = factor_mesh(len(devices), num_members)
    arr = np.asarray(devices).reshape(m, d)
    return Mesh(arr, (MEMBER_AXIS, DATA_AXIS))


def member_sharding(mesh: Mesh) -> NamedSharding:
    """Leading member axis sharded, everything else replicated."""
    return NamedSharding(mesh, P(MEMBER_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def member_data_sharding(mesh: Mesh) -> NamedSharding:
    """(M, B, ...) arrays: member then batch."""
    return NamedSharding(mesh, P(MEMBER_AXIS, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree(tree: Any, sharding: NamedSharding) -> Any:
    """device_put every leaf with the given sharding."""
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def tree_shardings(tree: Any, sharding: NamedSharding) -> Any:
    """A pytree of the same structure whose leaves are all ``sharding`` —
    for jit in_shardings/out_shardings."""
    return jax.tree.map(lambda _: sharding, tree)


def fsdp_shardings(tree: Any, mesh: Mesh, min_size: int = 2**18) -> Any:
    """FSDP-style shardings for member-stacked train state: every leaf's
    leading axis shards over 'member'; large leaves additionally shard their
    second axis over 'data', so parameters, Adam moments and EMA shadows are
    fully distributed (GSPMD all-gathers params for the matmuls and
    reduce-scatters gradients).

    Full-size LaDiNE training state (5 members x ~650M params x fp32 x
    {params, mu, nu, ema} ~ 49 GB) does not fit one 16 GB chip; with this
    sharding on a v5e-8 it is ~6 GB/device. Leaves smaller than ``min_size``
    elements or whose second dim doesn't tile the data axis stay
    member-sharded only.
    """
    data_dim = dict(zip(mesh.axis_names, mesh.devices.shape))[DATA_AXIS]

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        if (
            len(shape) >= 2
            and np.prod(shape) >= min_size
            and shape[1] % data_dim == 0
        ):
            return NamedSharding(mesh, P(MEMBER_AXIS, DATA_AXIS))
        return NamedSharding(mesh, P(MEMBER_AXIS))

    return jax.tree.map(leaf_sharding, tree)
