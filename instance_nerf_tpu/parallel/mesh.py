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

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)


def data_axis_size(batch_size: int, n_devices: int) -> int:
    """Largest divisor of ``batch_size`` that fits in ``n_devices`` — the
    data axis must evenly divide the scene batch. Logs when it degrades
    (prime batch sizes silently lose parallelism otherwise)."""
    for n in range(min(batch_size, n_devices), 0, -1):
        if batch_size % n == 0:
            if n < n_devices:
                log.warning(
                    "data_axis_size: batch %d only divides onto %d of %d "
                    "devices — pick a batch size divisible by the device "
                    "count for full data parallelism",
                    batch_size, n, n_devices,
                )
            return n
    return 1


def make_mesh(
    n_data: int | None = None,
    n_spatial: int = 1,
    n_dcn: int = 1,
    devices=None,
) -> Mesh:
    """(dcn, data, sp) mesh over ``n_dcn * n_data * n_spatial`` devices.

    ``dcn`` is the slice axis for multi-slice scale-out: shard SCENES over
    dcn x data so gradient all-reduce is hierarchical (GSPMD reduces
    within a slice over ICI, then across slices over DCN — the
    data-parallel axes carry only one allreduce of the grads, the sp halo
    exchanges stay intra-slice on ICI). The reference has nothing here
    (single-host DDP, SURVEY.md §2.16); multi-pod scale-out is the
    rebuild's first-class extension. With ``n_dcn=1`` the mesh is the
    single-slice (1, data, sp) layout used everywhere in-process.
    """
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_spatial * n_dcn)
    used = n_dcn * n_data * n_spatial
    if used < len(devices):
        log.warning(
            "make_mesh: using %d of %d devices (dcn=%d x data=%d x sp=%d)",
            used, len(devices), n_dcn, n_data, n_spatial,
        )
    if used > len(devices):
        raise ValueError(
            f"make_mesh: dcn={n_dcn} x data={n_data} x sp={n_spatial} needs "
            f"{used} devices, have {len(devices)}"
        )
    dev = np.asarray(devices[:used]).reshape(n_dcn, n_data, n_spatial)
    return Mesh(dev, axis_names=("dcn", "data", "sp"))


# scenes/rays shard over BOTH the slice axis and the intra-slice data
# axis; a batch dim annotated with this tuple spans dcn x data devices
DATA_AXES = ("dcn", "data")


def data_sharding(mesh: Mesh) -> NamedSharding:
    """1-D+ batch arrays: leading dim over dcn x data."""
    return NamedSharding(mesh, P(DATA_AXES))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Scene batch: leading dim over dcn x data, W (dim 1) over ``sp``."""
    return NamedSharding(mesh, P(DATA_AXES, "sp"))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """(N, W, L, H, C) voxel grids: batch over dcn x data, W spatially."""
    return NamedSharding(mesh, P(DATA_AXES, "sp", None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_size(mesh: Mesh) -> int:
    return mesh.shape["dcn"] * mesh.shape["data"]


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch: arrays with a leading batch dim go to
    (dcn x data, sp)-sharded storage, everything else replicated."""
    n = data_size(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0:
            if x.ndim >= 5:  # voxel grids: shard W too
                return jax.device_put(x, grid_sharding(mesh))
            return jax.device_put(x, data_sharding(mesh))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(put, tree)
