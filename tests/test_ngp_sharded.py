import numpy as np
import jax
import jax.numpy as jnp
import optax

from instance_nerf_tpu.models.hashgrid import InstanceNGP
from instance_nerf_tpu.models.render import init_occupancy
from instance_nerf_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from instance_nerf_tpu.parallel.ngp_train_step import (
    NGPTrainState,
    make_sharded_ngp_step,
)


def test_sharded_ngp_step_runs_and_matches_single():
    model = InstanceNGP(n_levels=2, table_size=256, max_res=16, hidden=16,
                        num_instances=3)
    apply_fn = lambda p, x, v: model.apply(p, x, v)
    params = model.init(jax.random.key(0), jnp.zeros((1, 3)),
                        jnp.asarray([[0.0, 0, 1]]))
    tx = optax.adam(1e-2)
    occ = init_occupancy(8)

    rng = np.random.default_rng(0)
    n = 64
    o = jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)), jnp.float32).at[:, 2].set(-0.5)
    d = jnp.zeros((n, 3)).at[:, 2].set(1.0)
    rgb = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    inst = jnp.asarray(rng.integers(0, 3, n), jnp.int32)

    mesh = make_mesh(n_data=8, n_spatial=1)
    step = make_sharded_ngp_step(apply_fn, tx, mesh, n_samples=16,
                                 stage="instance")
    with mesh:
        state = NGPTrainState(
            jax.device_put(params, replicated(mesh)),
            jax.device_put(tx.init(params), replicated(mesh)),
        )
        args = shard_batch(mesh, (o, d, rgb, inst))
        state2, metrics = step(state, occ.grid, jax.random.key(1), *args)
    assert np.isfinite(float(metrics["total"]))
    assert np.isfinite(float(metrics["instance"]))

    # single-device reference step produces the same loss
    step1 = make_sharded_ngp_step(apply_fn, tx, make_mesh(n_data=1, n_spatial=1),
                                  n_samples=16, stage="instance")
    _, m1 = step1(NGPTrainState(params, tx.init(params)), occ.grid,
                  jax.random.key(1), o, d, rgb, inst)
    np.testing.assert_allclose(float(metrics["total"]), float(m1["total"]),
                               rtol=1e-4)
