import numpy as np
import jax.numpy as jnp

from instance_nerf_tpu.kernels.scatter_pallas import (
    ROWS, TILE, scatter_add_pallas,
)


def test_scatter_add_matches_xla():
    rng = np.random.default_rng(0)
    n = ROWS * TILE * 2
    t, w = 4096, 16
    idx = jnp.asarray(rng.integers(0, t, n), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(n, w)), jnp.float32)
    got = scatter_add_pallas(idx, upd, t, interpret=True)
    want = jnp.zeros((t, w)).at[idx].add(upd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_scatter_add_collision_heavy():
    rng = np.random.default_rng(1)
    n = ROWS * TILE
    t, w = 64, 8  # ~256 collisions per row
    idx = jnp.asarray(rng.integers(0, t, n), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(n, w)), jnp.float32)
    got = scatter_add_pallas(idx, upd, t, interpret=True)
    want = jnp.zeros((t, w)).at[idx].add(upd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
