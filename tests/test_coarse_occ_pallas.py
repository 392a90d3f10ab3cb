import jax.numpy as jnp
import numpy as np

from instance_nerf_tpu.kernels.coarse_occ_pallas import coarse_occ_lookup


def test_coarse_occ_lookup_matches_gather():
    rng = np.random.default_rng(0)
    r = 32
    grid = jnp.asarray(rng.uniform(size=(r, r, r)) < 0.3, jnp.float32)
    n = 8192
    cells = jnp.asarray(rng.integers(0, r, (n, 3)), jnp.int32)
    got = coarse_occ_lookup(cells, grid, block=2048, interpret=True)
    want = grid[cells[:, 0], cells[:, 1], cells[:, 2]]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_coarse_occ_lookup_edge_cells():
    """All-corner cells and a fully-empty grid."""
    r = 32
    grid = jnp.zeros((r, r, r), jnp.float32)
    cells = jnp.asarray(
        [[0, 0, 0], [r - 1, r - 1, r - 1], [0, r - 1, 0], [r - 1, 0, r - 1]]
        * 512, jnp.int32)
    got = coarse_occ_lookup(cells, grid, block=1024, interpret=True)
    assert np.all(np.asarray(got) == 0)

    grid1 = jnp.ones((r, r, r), jnp.float32)
    got1 = coarse_occ_lookup(cells, grid1, block=1024, interpret=True)
    assert np.all(np.asarray(got1) == 1)
