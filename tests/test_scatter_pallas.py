import jax
import numpy as np
import jax.numpy as jnp

from instance_nerf_tpu.kernels.scatter_pallas import (
    ROWS, TILE, scatter_add_padded, scatter_add_pallas,
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


def test_scatter_add_replicas_matches_xla():
    """The replica-accumulator kernel (K disjoint VMEM table copies,
    reduced at the end) is exact vs .at[].add for K in {2, 4}."""
    rng = np.random.default_rng(7)
    n = ROWS * TILE
    t, w = 1024, 16
    idx = jnp.asarray(rng.integers(0, t, n), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(n, w)), jnp.float32)
    want = jnp.zeros((t, w)).at[idx].add(upd)
    for k in (2, 4):
        got = scatter_add_pallas(idx, upd, t, interpret=True, replicas=k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_scatter_add_padded_arbitrary_n():
    rng = np.random.default_rng(2)
    n = 1000  # not a multiple of ROWS*TILE
    t, w = 512, 4
    idx = jnp.asarray(rng.integers(0, t, n), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(n, w)), jnp.float32)
    got = scatter_add_padded(idx, upd, t, interpret=True)
    want = jnp.zeros((t, w)).at[idx].add(upd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_brick_encode_pallas_grad_exact():
    """jax.grad through brick_encode(pallas_grad=True) hits the Pallas
    scatter kernel (interpret mode off-TPU) and matches the XLA
    .at[].add gradient to float-order (VERDICT r2 item 1)."""
    from instance_nerf_tpu.models.fast_encode import brick_encode

    rng = np.random.default_rng(3)
    L, T, F = 3, 512, 2
    table = jnp.asarray(rng.normal(size=(L, T, 8, F)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(0, 1, (257, 3)), jnp.float32)
    res = np.array([4, 8, 16])
    tgt = jnp.asarray(rng.normal(size=(257, L * F)), jnp.float32)

    def loss(tab, pg):
        out = brick_encode(tab, xyz, res, pallas_grad=pg)
        return jnp.sum((out - tgt) ** 2)

    out_pg = brick_encode(table, xyz, res, pallas_grad=True)
    out_ref = brick_encode(table, xyz, res, pallas_grad=False)
    np.testing.assert_allclose(np.asarray(out_pg), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)
    g_pg = jax.grad(loss)(table, True)
    g_ref = jax.grad(loss)(table, False)
    np.testing.assert_allclose(np.asarray(g_pg), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_brick_encode_pallas_replicas_grad_exact():
    """Replica-accumulator table gradient (pallas_replicas=2) matches the
    XLA gradient through brick_encode."""
    from instance_nerf_tpu.models.fast_encode import brick_encode

    rng = np.random.default_rng(5)
    L, T, F = 2, 512, 2
    table = jnp.asarray(rng.normal(size=(L, T, 8, F)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(0, 1, (301, 3)), jnp.float32)
    res = np.array([4, 8])
    tgt = jnp.asarray(rng.normal(size=(301, L * F)), jnp.float32)

    def loss(tab, pg, rep):
        out = brick_encode(tab, xyz, res, pallas_grad=pg,
                           pallas_replicas=rep)
        return jnp.sum((out - tgt) ** 2)

    g_rep = jax.grad(loss)(table, True, 2)
    g_ref = jax.grad(loss)(table, False, 1)
    np.testing.assert_allclose(np.asarray(g_rep), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_hash_encode_pallas_grad_exact():
    from instance_nerf_tpu.models.hashgrid import hash_encode

    rng = np.random.default_rng(4)
    L, T, F = 4, 256, 2
    table = jnp.asarray(rng.normal(size=(L, T, F)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(0, 1, (123, 3)), jnp.float32)
    res = np.array([4, 8, 16, 32])
    tgt = jnp.asarray(rng.normal(size=(123, L * F)), jnp.float32)

    def loss(tab, pg):
        out = hash_encode(tab, xyz, res, pallas_grad=pg)
        return jnp.sum((out - tgt) ** 2)

    out_pg = hash_encode(table, xyz, res, pallas_grad=True)
    out_ref = hash_encode(table, xyz, res, pallas_grad=False)
    np.testing.assert_allclose(np.asarray(out_pg), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)
    g_pg = jax.grad(loss)(table, True)
    g_ref = jax.grad(loss)(table, False)
    np.testing.assert_allclose(np.asarray(g_pg), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
