"""Data parallelism over a TPU device mesh — the DataParallel replacement.

The reference's only parallelism is single-process ``nn.DataParallel``
(`Detection/train_aug_final.py:35-42`, `Segmentation/main_aug_final.py:119`):
scatter the batch over GPUs, replicate the module, gather per-device losses
and mean them. The TPU-native equivalent (SURVEY.md §2.5) is a 1-D
``jax.sharding.Mesh`` over the batch axis: inputs carry a
``NamedSharding(mesh, P('data', ...))``, parameters are replicated, and XLA
inserts the gradient all-reduce (``psum`` over ICI) automatically inside the
jitted train step. The per-image-loss-then-mean structure of the reference
(`Detection/attack_algo.py:21-27`) maps to ``jnp.mean`` over the globally
sharded batch — numerically identical when shards are equal, which we
enforce the same way the reference does
(batch divisibility assert, `train_aug_final.py:62-65`).

Multi-host (DCN) runs use the standard JAX distributed runtime with per-host
data loading: each host feeds its local shard via
:func:`host_local_batch_to_global`.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    """1-D mesh over the data axis (all local devices by default)."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def check_divisible(batch_size: int, mesh: Mesh) -> None:
    """The reference's batch divisibility assert
    (`train_aug_final.py:62-65`)."""
    n = mesh.size
    if batch_size % n != 0:
        raise ValueError(
            f"batch size {batch_size} not divisible by {n} devices")


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Place host arrays on the mesh, sharded over the leading axis."""
    sh = batch_sharding(mesh, axis_name)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate_state(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params / train state) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def host_local_batch_to_global(mesh: Mesh, local_arrays,
                               axis_name: str = "data"):
    """Assemble a global on-device batch from per-host local shards
    (multi-host DCN path; single-host this is just :func:`shard_batch`)."""
    sh = batch_sharding(mesh, axis_name)
    out = tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a))
        for a in local_arrays)
    return out[0] if len(out) == 1 else out
