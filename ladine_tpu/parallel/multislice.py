"""Multi-slice (DCN) mesh recipe: ensemble members across slices.

The reference trains its 5 ensemble members as 5 *separate process
invocations* on one GPU (`train.sh:15,31,47,63,79`) — the members never
exchange a byte until their checkpoints meet at test time
(`classification_train_separately.py:684-691`). That independence is a
gift for multi-slice TPU training: place the **member axis across slices**
and the **data axis within a slice**, and the per-step collective traffic
decomposes as

* gradient ``psum`` over 'data'  -> intra-slice, rides ICI;
* 'member' axis                  -> no per-step collectives at all (each
  member's loss/grad touches only its own shard); DCN carries only the
  few-bytes per-member loss stack and end-of-run checkpoint traffic.

This is the layout `make_multislice_mesh` builds. The inverse layout
(data across slices) would push a ~650 M-param gradient all-reduce over
DCN every step and is deliberately not offered.

On real multi-slice hardware JAX exposes each device's slice via
``Device.slice_index``; in single-slice or CPU testing environments the
device list is split evenly into ``num_slices`` contiguous groups, which
matches how ``xla_force_host_platform_device_count`` enumerates virtual
devices. Either way the resulting mesh is an ordinary
``jax.sharding.Mesh`` with the same ``('member', 'data')`` axis names as
`make_mesh`, so every train/eval path in this repo (FSDP shardings, the
eval pipeline, the joint step) works on it unchanged.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ladine_tpu.parallel.mesh import DATA_AXIS, MEMBER_AXIS


def group_devices_by_slice(
    devices: Sequence[jax.Device], num_slices: Optional[int] = None
) -> List[List[jax.Device]]:
    """Group devices by their hardware slice.

    Uses ``Device.slice_index`` when the runtime provides it (multi-slice
    TPU); otherwise splits the device list into ``num_slices`` equal
    contiguous groups (virtual/CPU meshes). Raises if the grouping is
    ragged — a mesh needs equal rows.
    """
    devices = list(devices)
    idx = {getattr(d, "slice_index", None) for d in devices}
    if None not in idx and len(idx) > 1:
        groups: dict = {}
        for d in devices:
            groups.setdefault(d.slice_index, []).append(d)
        out = [groups[k] for k in sorted(groups)]
    else:
        n = num_slices or 1
        if len(devices) % n:
            raise ValueError(
                f"{len(devices)} devices do not split into {n} equal slices"
            )
        per = len(devices) // n
        out = [devices[i * per : (i + 1) * per] for i in range(n)]
    sizes = {len(g) for g in out}
    if len(sizes) != 1:
        raise ValueError(f"ragged slices: sizes {sorted(len(g) for g in out)}")
    return out


def multislice_factor(num_slices: int, num_members: int) -> Tuple[int, int]:
    """(member_dim, slices_per_member_group).

    member_dim is the largest divisor of ``num_members`` that divides
    ``num_slices`` — each member-axis row then owns a whole number of
    slices. With 5 members on 5 slices: (5, 1), one member per slice.
    With 5 members on 10 slices: (5, 2), each member data-parallel over
    two slices (its gradient psum then DOES cross DCN — flagged by
    `describe_mesh`).
    """
    best = 1
    for d in range(1, num_members + 1):
        if num_members % d == 0 and num_slices % d == 0:
            best = d
    return best, num_slices // best


def make_multislice_mesh(
    num_members: int = 5,
    num_slices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('member', 'data') mesh whose member axis strides across slices.

    Row ``i`` of the mesh holds the devices of the slice(s) assigned to
    member group ``i``; the data axis enumerates devices within those
    slices. All existing shardings (`member_sharding`, `data_sharding`,
    `fsdp_shardings`) apply unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    groups = group_devices_by_slice(devices, num_slices)
    member_dim, per_group = multislice_factor(len(groups), num_members)
    rows = [
        [d for g in groups[i * per_group : (i + 1) * per_group] for d in g]
        for i in range(member_dim)
    ]
    arr = np.asarray(rows)  # (member_dim, per_group * slice_size)
    return Mesh(arr, (MEMBER_AXIS, DATA_AXIS))


def describe_mesh(mesh: Mesh, num_slices: int) -> str:
    """One-line summary of which axis crosses DCN — logged by callers so a
    launch script can confirm the gradient psum stays on ICI."""
    m, d = mesh.devices.shape
    slice_size = mesh.devices.size // num_slices
    data_crosses_dcn = d > slice_size
    return (
        f"multislice mesh member={m} data={d} over {num_slices} slices: "
        + (
            "data axis spans slices — per-step gradient psum rides DCN "
            "(acceptable only if step time >> DCN latency)"
            if data_crosses_dcn
            else "data axis within a slice (ICI); member axis across slices "
            "(no per-step collectives)"
        )
    )
