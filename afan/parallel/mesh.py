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


def make_mesh_2d(data: int, spatial: int,
                 devices: Optional[Sequence] = None,
                 axis_names: Sequence[str] = ("data", "spatial")) -> Mesh:
    """2-D ``data x spatial`` mesh for spatially-sharded training.

    Beyond-reference capability (SURVEY.md §5 flags it as the honest TPU
    analog of scaling the long axis): activations of very large crops are
    sharded over image ROWS in addition to the batch. Convolutions under
    GSPMD get their halo exchanges inserted by XLA automatically, BN batch
    statistics reduce over both mesh axes, and the gradient psum rides the
    full mesh — no manual collectives. Use when the per-device batch can't
    go below 1 (e.g. b4 Cityscapes 768+ crops on small-HBM chips).
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: data * spatial])
    if devices.size != data * spatial:
        raise ValueError(
            f"need {data * spatial} devices for a {data}x{spatial} mesh, "
            f"have {devices.size}")
    return Mesh(devices.reshape(data, spatial), tuple(axis_names))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def spatial_sharding(mesh: Mesh, data_axis: str = "data",
                     spatial_axis: str = "spatial") -> NamedSharding:
    """Batch over ``data``, image rows (NHWC / NHW axis 1) over
    ``spatial``."""
    return NamedSharding(mesh, P(data_axis, spatial_axis))


def shard_batch_spatial(mesh: Mesh, *arrays, data_axis: str = "data",
                        spatial_axis: str = "spatial"):
    """Place host arrays on a 2-D mesh: leading axis over ``data``, the
    row axis (axis 1: H for NHWC images and NHW label maps) over
    ``spatial``. H must divide by the spatial mesh dim."""
    sh = spatial_sharding(mesh, data_axis, spatial_axis)
    n_sp = mesh.shape[spatial_axis]
    out = []
    for a in arrays:
        if a.shape[1] % n_sp != 0:
            raise ValueError(
                f"row dim {a.shape[1]} not divisible by {n_sp} spatial "
                f"shards")
        out.append(jax.device_put(a, sh))
    return out[0] if len(out) == 1 else tuple(out)


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
