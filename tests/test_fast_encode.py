"""Tests for the TPU-native fast encoding (dense MXU base + brick levels)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instance_nerf_tpu.models.fast_encode import (
    InstanceNGPFast,
    brick_encode,
    brick_resolutions,
    dense_trilinear,
    pe_encode,
)


def brute_trilinear(grid, xyz):
    """Reference trilinear interpolation (numpy, per point)."""
    r = grid.shape[0]
    out = np.zeros((xyz.shape[0], grid.shape[-1]), np.float64)
    for n, x in enumerate(xyz):
        p = np.clip(x, 0, 1) * (r - 1)
        i0 = np.floor(p).astype(int)
        i0 = np.minimum(i0, r - 2)
        f = p - i0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (
                        (f[0] if dx else 1 - f[0])
                        * (f[1] if dy else 1 - f[1])
                        * (f[2] if dz else 1 - f[2])
                    )
                    out[n] += w * grid[i0[0] + dx, i0[1] + dy, i0[2] + dz]
    return out


def test_dense_trilinear_matches_bruteforce():
    rng = np.random.default_rng(0)
    grid = rng.standard_normal((9, 9, 9, 4)).astype(np.float32)
    xyz = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    got = np.asarray(dense_trilinear(jnp.asarray(grid), jnp.asarray(xyz)))
    ref = brute_trilinear(grid, xyz)
    # bf16 first contraction: tolerate ~1e-2 relative
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_dense_trilinear_grid_points_exact():
    """At grid points the tent weights are one-hot: exact values."""
    rng = np.random.default_rng(1)
    r = 5
    grid = rng.standard_normal((r, r, r, 2)).astype(np.float32)
    ii = np.stack(np.meshgrid(*[np.arange(r)] * 3, indexing="ij"), -1)
    xyz = (ii.reshape(-1, 3) / (r - 1)).astype(np.float32)
    got = np.asarray(dense_trilinear(jnp.asarray(grid), jnp.asarray(xyz)))
    np.testing.assert_allclose(got, grid.reshape(-1, 2), atol=2e-2, rtol=2e-2)


def test_dense_trilinear_chunked_equals_unchunked():
    rng = np.random.default_rng(2)
    grid = jnp.asarray(rng.standard_normal((8, 8, 8, 4)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(0, 1, (300, 3)), jnp.float32)
    a = dense_trilinear(grid, xyz, chunk=128)
    b = dense_trilinear(grid, xyz, chunk=4096)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dense_trilinear_grad_is_einsum_transpose():
    """AD through the factorized form must produce finite table grads that
    sum contributions like scatter-add of trilinear weights."""
    rng = np.random.default_rng(3)
    grid = jnp.asarray(rng.standard_normal((6, 6, 6, 2)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(0, 1, (32, 3)), jnp.float32)

    def loss(g):
        return jnp.sum(dense_trilinear(g, xyz) ** 2)

    dg = jax.grad(loss)(grid)
    assert np.isfinite(np.asarray(dg)).all()
    # each point contributes total weight 1 per feature in d(sum f)/dgrid
    ones = jax.grad(lambda g: jnp.sum(dense_trilinear(g, xyz)))(grid)
    np.testing.assert_allclose(float(jnp.sum(ones)), 32.0 * 2, rtol=2e-2)


def test_brick_encode_shapes_and_continuity_within_cell():
    rng = np.random.default_rng(4)
    res = brick_resolutions(3, 8, 32)
    table = jnp.asarray(rng.standard_normal((3, 512, 8, 2)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(0.2, 0.8, (40, 3)), jnp.float32)
    out = brick_encode(table, xyz, res)
    assert out.shape == (40, 6)
    assert np.isfinite(np.asarray(out)).all()
    # within one cell of the coarsest level the encoding is trilinear =>
    # tiny steps produce proportionally tiny changes
    x0 = jnp.asarray([[0.41, 0.42, 0.43]], jnp.float32)
    eps = 1e-4
    x1 = x0 + eps
    d = np.abs(np.asarray(brick_encode(table, x1, res) -
                          brick_encode(table, x0, res)))
    assert d.max() < 0.3  # lipschitz ~ res * |table| scale


def test_brick_encode_dense_level_no_collision():
    """A level with res^3 <= T indexes directly: two cells with different
    coords always read different rows (no hash aliasing)."""
    res = np.array([4])
    table = jnp.asarray(
        np.arange(1 * 64 * 8 * 1, dtype=np.float32).reshape(1, 64, 8, 1)
    )
    # cell centers: each sample sits mid-cell, weight spread over corners
    a = brick_encode(table, jnp.asarray([[0.1, 0.1, 0.1]]), res)
    b = brick_encode(table, jnp.asarray([[0.9, 0.9, 0.9]]), res)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_brick_encode_grads_flow():
    rng = np.random.default_rng(5)
    res = brick_resolutions(2, 8, 16)
    table = jnp.asarray(rng.standard_normal((2, 256, 8, 2)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(0, 1, (16, 3)), jnp.float32)

    def loss(t):
        return jnp.sum(brick_encode(t, xyz, res) ** 2)

    dt = jax.grad(loss)(table)
    assert np.isfinite(np.asarray(dt)).all()
    assert float(jnp.sum(jnp.abs(dt))) > 0


def test_pe_encode_shape_and_range():
    xyz = jnp.asarray(np.random.default_rng(6).uniform(0, 1, (10, 3)),
                      jnp.float32)
    out = pe_encode(xyz, n_freqs=4)
    assert out.shape == (10, 24)
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-6


def test_instance_ngp_fast_api_parity():
    """Drop-in for InstanceNGP: same call signature and output structure."""
    m = InstanceNGPFast(n_levels=2, table_size=256, base_res=4, max_res=8,
                        dense_res=4, hidden=16, num_instances=5)
    xyz = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (12, 3)),
                      jnp.float32)
    vd = jnp.zeros((12, 3)).at[:, 2].set(1.0)
    params = m.init(jax.random.key(0), xyz, vd)
    sigma_raw, rgb, logits = m.apply(params, xyz, vd)
    assert sigma_raw.shape == (12,)
    assert rgb.shape == (12, 3)
    assert logits.shape == (12, 5)
    assert np.isfinite(np.asarray(rgb)).all()


def test_instance_ngp_fast_overfits_tiny_scene():
    """The fast field must fit a simple radiance function (sanity on the
    representation power + gradient path)."""
    import optax

    m = InstanceNGPFast(n_levels=2, table_size=512, base_res=4, max_res=16,
                        dense_res=8, hidden=32, num_instances=3)
    rng = np.random.default_rng(8)
    xyz = jnp.asarray(rng.uniform(0, 1, (512, 3)), jnp.float32)
    vd = jnp.zeros((512, 3)).at[:, 2].set(1.0)
    target = jnp.asarray(
        0.5 + 0.5 * np.sin(6 * np.asarray(xyz[:, :1])), jnp.float32
    )
    params = m.init(jax.random.key(1), xyz, vd)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss(p):
            _, rgb, _ = m.apply(p, xyz, vd)
            return jnp.mean((rgb[:, :1] - target) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    l0 = None
    for i in range(150):
        params, opt, l = step(params, opt)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.3 * l0, (l0, float(l))
