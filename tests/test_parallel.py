import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.parallel.mesh import (
    batch_sharding,
    data_axis_size,
    grid_sharding,
    make_mesh,
    shard_batch,
)


def test_data_axis_size():
    assert data_axis_size(4, 8) == 4
    assert data_axis_size(2, 8) == 2
    assert data_axis_size(3, 8) == 3
    assert data_axis_size(16, 8) == 8
    assert data_axis_size(5, 4) == 1  # largest divisor of 5 <= 4


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_spatial=2)
    assert dict(mesh.shape) == {"dcn": 1, "data": 4, "sp": 2}
    mesh1 = make_mesh(n_data=8, n_spatial=1)
    assert dict(mesh1.shape) == {"dcn": 1, "data": 8, "sp": 1}
    mesh2 = make_mesh(n_dcn=2, n_data=2, n_spatial=2)
    assert dict(mesh2.shape) == {"dcn": 2, "data": 2, "sp": 2}


def test_make_mesh_rejects_oversubscription():
    import pytest

    with pytest.raises(ValueError):
        make_mesh(n_dcn=4, n_data=4, n_spatial=4)


def test_multislice_mesh_trains_scenes_over_dcn_x_data():
    """Scenes shard over dcn x data; the sharded sum is still global —
    the 2x2x2 multi-slice topology of SURVEY §2.16's scale-out story."""
    mesh = make_mesh(n_dcn=2, n_data=2, n_spatial=2)
    x = np.arange(64, dtype=np.float32).reshape(4, 16)
    with mesh:
        (xs,) = shard_batch(mesh, (x,))
        total = jax.jit(jnp.sum)(xs)
    assert len({s.device for s in xs.addressable_shards}) == 8
    np.testing.assert_allclose(float(total), x.sum())


def test_shard_batch_places_arrays():
    mesh = make_mesh(n_data=4, n_spatial=2)
    grids = np.zeros((4, 16, 8, 8, 4), np.float32)
    sizes = np.zeros((4, 3), np.float32)
    scalar = np.zeros((3,), np.float32)  # not divisible -> replicated
    with mesh:
        g, s, c = shard_batch(mesh, (grids, sizes, scalar))
    assert g.sharding.spec == grid_sharding(mesh).spec
    # per-device shard of the grid: batch/4, W/2
    shard = g.addressable_shards[0].data
    assert shard.shape == (1, 8, 8, 8, 4)
    assert s.addressable_shards[0].data.shape == (1, 3)
    assert c.sharding.is_fully_replicated


def test_sharded_sum_is_global():
    mesh = make_mesh(n_data=8, n_spatial=1)
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    with mesh:
        (xs,) = shard_batch(mesh, (x,))
        total = jax.jit(jnp.sum)(xs)
    np.testing.assert_allclose(float(total), x.sum())


def test_prefetch_loader_propagates_errors():
    import pytest

    from instance_nerf_tpu.data.prefetch import PrefetchLoader

    def bad(i):
        if i == 2:
            raise ValueError("boom")
        return i

    loader = PrefetchLoader(bad, 5)
    with pytest.raises(ValueError):
        list(loader)
