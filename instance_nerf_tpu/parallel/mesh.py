"""Device mesh + sharding helpers.

Replaces the reference's DDP/NCCL stack (``mp.spawn`` +
``dist.init_process_group('nccl')`` + ``DistributedSampler``,
run_rcnn.py:755-826, SURVEY.md §2.16) with the JAX SPMD recipe: build a
``Mesh``, annotate array shardings, and let GSPMD insert the collectives
over ICI. Data parallelism shards the scene batch on ``data``; spatial
parallelism (``sp``) shards the voxel W axis — XLA performs the conv halo
exchanges automatically, which is the TPU analog of the reference's
"chunk everything" memory strategy (SURVEY.md §5.7).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_axis_size(batch_size: int, n_devices: int) -> int:
    """Largest divisor of ``batch_size`` that fits in ``n_devices`` — the
    data axis must evenly divide the scene batch."""
    for n in range(min(batch_size, n_devices), 0, -1):
        if batch_size % n == 0:
            return n
    return 1


def make_mesh(
    n_data: int | None = None,
    n_spatial: int = 1,
    devices=None,
) -> Mesh:
    """(data, sp) mesh. Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_spatial
    dev = np.asarray(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(dev, axis_names=("data", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Scene batch: leading dim over ``data``, W (dim 1) over ``sp``."""
    return NamedSharding(mesh, P("data", "sp"))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """(N, W, L, H, C) voxel grids: batch over data, W spatially."""
    return NamedSharding(mesh, P("data", "sp", None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch: arrays with a leading batch dim go to
    (data, sp)-sharded storage, everything else replicated."""
    n = mesh.shape["data"]

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0:
            if x.ndim >= 5:  # voxel grids: shard W too
                return jax.device_put(x, grid_sharding(mesh))
            return jax.device_put(x, NamedSharding(mesh, P("data")))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(put, tree)
