import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.models import render as R
from instance_nerf_tpu.models.hashgrid import (
    InstanceNGP,
    density_activation,
    hash_encode,
    ngp_resolutions,
    sh_encode_deg2,
)


def test_resolutions_geometric():
    res = ngp_resolutions(16, 16, 2048)
    assert res[0] == 16 and res[-1] == 2048
    assert (np.diff(res) > 0).all()


def test_hash_encode_shapes_and_interp():
    L, T, F = 4, 512, 2
    table = jnp.asarray(np.random.default_rng(0).normal(size=(L, T, F)), jnp.float32)
    res = ngp_resolutions(L, 4, 32)
    xyz = jnp.asarray([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    out = hash_encode(table, xyz, res)
    assert out.shape == (3, L * F)
    assert np.isfinite(np.asarray(out)).all()
    # continuity: nearby points give nearby encodings
    eps_out = hash_encode(table, xyz + 1e-5, res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(eps_out), atol=1e-2)


def test_hash_encode_grad():
    L, T, F = 2, 128, 2
    table = jnp.ones((L, T, F))
    res = ngp_resolutions(L, 4, 8)

    def f(tab):
        return jnp.sum(hash_encode(tab, jnp.asarray([[0.3, 0.6, 0.2]]), res))

    g = jax.grad(f)(table)
    assert np.isfinite(np.asarray(g)).all()
    # trilinear weights of the 8 corners sum to 1 per level
    np.testing.assert_allclose(float(np.asarray(g).sum()), L * F, rtol=1e-5)


def test_sh_encode():
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = np.asarray(sh_encode_deg2(d))
    assert out.shape == (1, 9)
    np.testing.assert_allclose(out[0, 0], 0.2820947917, rtol=1e-6)


def test_camera_rays():
    c2w = jnp.eye(4)
    o, d = R.camera_rays(c2w, (100.0, 100.0, 50.0, 50.0), (100, 100))
    assert o.shape == (10000, 3) and d.shape == (10000, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)
    # center pixel looks along -z
    center = np.asarray(d[50 * 100 + 50])
    assert center[2] < -0.99


def test_ray_aabb():
    o = jnp.asarray([[0.5, 0.5, -1.0], [2.0, 2.0, 2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    near, far = R.ray_aabb(o, d)
    assert float(near[0]) == 1.0 and abs(float(far[0]) - 2.0) < 1e-6
    assert float(near[1]) > float(far[1])  # miss


def test_composite_opaque_wall():
    # huge density in the middle sample -> depth ~ that sample, acc ~ 1
    r, s = 2, 16
    t = jnp.broadcast_to(jnp.linspace(0.1, 1.0, s)[None], (r, s))
    dt = jnp.full((r, s), 0.9 / s)
    sigma_raw = jnp.full((r, s), -15.0).at[:, 8].set(10.0)
    rgb = jnp.zeros((r, s, 3)).at[:, 8].set(jnp.asarray([1.0, 0.5, 0.25]))
    out = R.composite(sigma_raw, rgb, None, t, dt)
    np.testing.assert_allclose(np.asarray(out.acc), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.rgb[0]), [1.0, 0.5, 0.25], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.depth), float(t[0, 8]), atol=1e-3)


def test_composite_empty_space():
    r, s = 1, 8
    t = jnp.linspace(0.1, 1.0, s)[None]
    dt = jnp.full((r, s), 0.1)
    out = R.composite(jnp.full((r, s), -15.0), jnp.ones((r, s, 3)), None, t, dt)
    assert float(out.acc[0]) < 1e-4


def test_composite_instance_logits_like_color():
    r, s, i = 1, 8, 4
    t = jnp.linspace(0.1, 1.0, s)[None]
    dt = jnp.full((r, s), 0.1)
    sigma = jnp.full((r, s), -15.0).at[:, 3].set(10.0)
    rgb = jnp.ones((r, s, 3))
    logits = jnp.zeros((r, s, i)).at[:, 3, 2].set(7.0)
    out = R.composite(sigma, rgb, logits, t, dt)
    assert int(np.argmax(np.asarray(out.instance_logits[0]))) == 2
    np.testing.assert_allclose(np.asarray(out.instance_logits[0, 2]), 7.0, atol=0.01)


def test_occupancy_grid_masks_sigma():
    occ = R.OccupancyGrid(jnp.zeros((8, 8, 8)).at[4, 4, 4].set(1.0), 0.5)
    xyz = jnp.asarray([[4.5 / 8, 4.5 / 8, 4.5 / 8], [0.1, 0.1, 0.1]])
    m = np.asarray(occ.occupied(xyz))
    assert m.tolist() == [1.0, 0.0]


def test_instance_ngp_forward():
    model = InstanceNGP(n_levels=4, table_size=2 ** 12, max_res=64,
                        num_instances=5)
    xyz = jnp.asarray([[0.3, 0.4, 0.5], [0.9, 0.1, 0.2]])
    vd = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    params = model.init(jax.random.key(0), xyz, vd)
    sigma_raw, rgb, logits = model.apply(params, xyz, vd)
    assert sigma_raw.shape == (2,)
    assert rgb.shape == (2, 3) and (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
    assert logits.shape == (2, 5)
    assert np.isfinite(float(density_activation(sigma_raw).sum()))


def test_instance_head_no_grad_to_field():
    model = InstanceNGP(n_levels=2, table_size=256, max_res=16, num_instances=3)
    xyz = jnp.asarray([[0.5, 0.5, 0.5]])
    vd = jnp.asarray([[0.0, 0.0, 1.0]])
    params = model.init(jax.random.key(0), xyz, vd)

    def inst_loss(p):
        _, _, logits = model.apply(p, xyz, vd)
        return jnp.sum(logits ** 2)

    g = jax.grad(inst_loss)(params)
    # instance loss must not leak into the hash table (stop_gradient)
    assert float(jnp.abs(g["params"]["hash_table"]).sum()) == 0.0
    assert float(jnp.abs(g["params"]["inst_1"]["kernel"]).sum()) > 0.0


def test_render_rays_end_to_end():
    model = InstanceNGP(n_levels=4, table_size=2 ** 12, max_res=64, num_instances=4)
    xyz0 = jnp.zeros((1, 3))
    vd0 = jnp.asarray([[0.0, 0.0, 1.0]])
    params = model.init(jax.random.key(0), xyz0, vd0)

    o = jnp.asarray([[0.5, 0.5, -0.5], [0.5, 0.5, 0.5]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    out = R.render_rays(
        lambda p, x, v: model.apply(p, x, v),
        params, jax.random.key(1), o, d, n_samples=32,
        occ=R.init_occupancy(16),
    )
    assert out.rgb.shape == (2, 3)
    assert out.instance_logits.shape == (2, 4)
    assert np.isfinite(np.asarray(out.rgb)).all()


def test_update_occupancy():
    occ = R.init_occupancy(8)

    def sigma_fn(xyz):
        # dense blob around center
        return jnp.where(jnp.linalg.norm(xyz - 0.5, axis=-1) < 0.2, 5.0, 0.0)

    occ2 = R.update_occupancy(occ, sigma_fn, jax.random.key(0), decay=0.0)
    g = np.asarray(occ2.grid)
    assert g[4, 4, 4] > 1.0
    assert g[0, 0, 0] < 0.5


def test_coarse_occupancy_mxu_matches_pooled_reference():
    """coarse_occupancy_mxu == nearest-cell lookup of the max-pooled
    grid; on a blocky grid (constant within coarse cells) it equals the
    exact fine lookup."""
    rng = np.random.default_rng(0)
    coarse = rng.uniform(size=(4, 4, 4)) < 0.5
    fine = np.repeat(np.repeat(np.repeat(coarse, 4, 0), 4, 1), 4, 2)
    occ = R.OccupancyGrid(jnp.asarray(fine * 1e3, jnp.float32), 0.01)
    xyz = jnp.asarray(rng.uniform(0, 1, (257, 3)), jnp.float32)
    got = R.coarse_occupancy_mxu(occ, xyz, 4)
    want = occ.occupied(xyz)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_render_rays_two_stage_occupancy_matches_exact_on_blocky_grid():
    """With a grid that is constant within coarse cells, the coarse-MXU
    selection picks the same K candidates as the exact path, so the
    render is identical."""
    model = InstanceNGP(n_levels=2, table_size=2 ** 10, max_res=32,
                        num_instances=3)
    params = model.init(jax.random.key(0), jnp.zeros((1, 3)),
                        jnp.asarray([[0.0, 0.0, 1.0]]))
    rng = np.random.default_rng(1)
    coarse = rng.uniform(size=(8, 8, 8)) < 0.4
    fine = np.repeat(np.repeat(np.repeat(coarse, 4, 0), 4, 1), 4, 2)
    occ = R.OccupancyGrid(jnp.asarray(fine * 1e3, jnp.float32), 0.01)
    o = jnp.asarray(rng.uniform(0.1, 0.9, (16, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    kw = dict(n_samples=32, occ=occ, k_occupied=8, stratified=False)
    f = lambda p, x, v: model.apply(p, x, v)
    exact = R.render_rays(f, params, jax.random.key(2), o, d, **kw)
    two = R.render_rays(f, params, jax.random.key(2), o, d,
                        occ_coarse_res=8, **kw)
    np.testing.assert_allclose(np.asarray(exact.rgb), np.asarray(two.rgb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(exact.instance_logits),
                               np.asarray(two.instance_logits),
                               rtol=1e-5, atol=1e-5)


def test_render_rays_adaptive_k_matches_fixed_when_hits_fit():
    """When every ray has <= min-bucket-K occupied candidates, adaptive-K
    routing captures exactly the same samples as the fixed-K path, so
    per-ray outputs must match (routing only permutes work)."""
    model = InstanceNGP(n_levels=2, table_size=2 ** 10, max_res=32,
                        num_instances=3)
    params = model.init(jax.random.key(0), jnp.zeros((1, 3)),
                        jnp.asarray([[0.0, 0.0, 1.0]]))
    rng = np.random.default_rng(3)
    # sparse occupancy: a thin slab -> few occupied candidates per ray
    fine = np.zeros((32, 32, 32), bool)
    fine[:, :, 14:17] = True
    occ = R.OccupancyGrid(jnp.asarray(fine * 1e3, jnp.float32), 0.01)
    n = 32
    o = jnp.asarray(rng.uniform(0.1, 0.9, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    f = lambda p, x, v: model.apply(p, x, v)
    kw = dict(n_samples=32, occ=occ, stratified=False)
    fixed = R.render_rays(f, params, jax.random.key(2), o, d,
                          k_occupied=16, **kw)
    adapt = R.render_rays(f, params, jax.random.key(2), o, d,
                          k_buckets=((0.5, 16), (0.25, 16), (0.25, 16)),
                          **kw)
    np.testing.assert_allclose(np.asarray(fixed.rgb), np.asarray(adapt.rgb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fixed.depth),
                               np.asarray(adapt.depth),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fixed.instance_logits),
                               np.asarray(adapt.instance_logits),
                               rtol=1e-5, atol=1e-5)
    # mixed-K buckets: slab rays have <= ~6 occupied candidates of 32,
    # so K=8 suffices for the emptiest half -> still identical
    mixed = R.render_rays(f, params, jax.random.key(2), o, d,
                          k_buckets=((0.5, 8), (0.25, 16), (0.25, 16)),
                          **kw)
    np.testing.assert_allclose(np.asarray(fixed.rgb), np.asarray(mixed.rgb),
                               rtol=1e-5, atol=1e-6)
    # weights padded to max K and unpermuted: shape (R, 16)
    assert mixed.weights.shape == (n, 16)


def test_fused_buckets_match_unfused():
    """fuse_buckets=True batches all bucket sub-batches through one field
    query; compaction and compositing are unchanged, so outputs must match
    the per-bucket path (same ops, different batching) — including under
    truncation (dense occupancy, small Ks) and mixed bucket widths."""
    model = InstanceNGP(n_levels=2, table_size=2 ** 10, max_res=32,
                        num_instances=3)
    params = model.init(jax.random.key(0), jnp.zeros((1, 3)),
                        jnp.asarray([[0.0, 0.0, 1.0]]))
    rng = np.random.default_rng(7)
    # half-dense occupancy: buckets genuinely differ in hit counts
    fine = rng.uniform(size=(32, 32, 32)) < 0.5
    occ = R.OccupancyGrid(jnp.asarray(fine * 1e3, jnp.float32), 0.01)
    n = 32
    o = jnp.asarray(rng.uniform(0.1, 0.9, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    f = lambda p, x, v: model.apply(p, x, v)
    kw = dict(n_samples=32, occ=occ, stratified=False,
              k_buckets=((0.5, 4), (0.25, 8), (0.25, 16)))
    fused = R.render_rays(f, params, jax.random.key(2), o, d,
                          fuse_buckets=True, **kw)
    plain = R.render_rays(f, params, jax.random.key(2), o, d,
                          fuse_buckets=False, **kw)
    for field in R.RenderOut._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(fused, field)),
            np.asarray(getattr(plain, field)), rtol=1e-5, atol=1e-5,
            err_msg=field)


def test_adaptive_k_train_step_runs_and_learns():
    """Adaptive-K end-to-end through the jitted train step (grads flow,
    loss decreases on an overfit micro-problem)."""
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer, fast_ngp_config,
    )

    cfg = fast_ngp_config(
        num_instances=3, n_rays=64, n_samples=32, occ_res=32,
        occ_coarse_res=16, k_buckets=((0.5, 4), (0.25, 8), (0.25, 16)),
        n_levels=2, table_size=2 ** 10, dtype="float32",
    )
    tr = InstanceFieldTrainer(cfg, seed=0)
    rng = np.random.default_rng(0)
    o = jnp.asarray(0.5 + 0.45 * rng.normal(size=(64, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rgb = jnp.asarray(rng.uniform(size=(64, 3)), jnp.float32)
    inst = jnp.asarray(rng.integers(0, 3, 64), jnp.int32)
    step = tr._step_fn("rgb")
    losses = []
    p, s = tr.params, tr.opt_state
    for i in range(30):
        p, s, m = step(p, s, tr.occ.grid, jax.random.key(i), o, d, rgb, inst)
        losses.append(float(m["rgb"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sample_points_per_ray_jitter_stratified_bins():
    """per_ray_jitter keeps every sample inside its stratified bin and
    shares ONE offset across a ray's bins (S x fewer threefry values —
    probe22); different rays still get independent offsets."""
    key = jax.random.PRNGKey(3)
    r, s = 8, 16
    o = jnp.zeros((r, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (r, 1))
    near = jnp.zeros((r,))
    far = jnp.ones((r,))
    _, t, dt = R.sample_points(key, o, d, s, near, far,
                               stratified=True, per_ray_jitter=True)
    assert t.shape == (r, s) and dt.shape == (r, s)
    bins = np.floor(np.asarray(t) * s).clip(0, s - 1)
    np.testing.assert_array_equal(bins, np.tile(np.arange(s), (r, 1)))
    # one shared offset per ray: t - bin_lo is constant along the ray
    frac = np.asarray(t) * s - bins
    np.testing.assert_allclose(frac, frac[:, :1].repeat(s, 1), rtol=1e-5)
    # ...but independent across rays
    assert np.std(frac[:, 0]) > 1e-3
