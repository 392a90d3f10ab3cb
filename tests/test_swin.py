import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.models import swin as S


def test_relative_position_index_bounds():
    idx = S.relative_position_index((4, 4, 4))
    assert idx.shape == (64, 64)
    assert idx.min() >= 0
    assert idx.max() < 7 * 7 * 7
    # self-relative position (0,0,0) maps to the table center
    center = (3 * 7 + 3) * 7 + 3
    assert (np.diag(idx) == center).all()


def test_shift_mask_blocks_cross_region():
    m = S.shift_attention_mask((8, 8, 8), (4, 4, 4), (2, 2, 2))
    assert m.shape == (8, 64, 64)
    assert (np.diagonal(m, axis1=1, axis2=2) == 0).all()
    assert (m < 0).any()  # some pairs are masked


def test_window_attention_shapes():
    attn = S.ShiftedWindowAttention3D(dim=32, window=(4, 4, 4), shift=(0, 0, 0), num_heads=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 8, 32)), jnp.float32)
    params = attn.init(jax.random.key(0), x)
    y = attn.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_window_attention_nonmultiple_size():
    attn = S.ShiftedWindowAttention3D(dim=16, window=(4, 4, 4), shift=(2, 2, 2), num_heads=2)
    x = jnp.ones((1, 6, 7, 5, 16))
    params = attn.init(jax.random.key(0), x)
    y = attn.apply(params, x)
    assert y.shape == x.shape


def test_window_locality():
    # with no shift, changing a voxel in one window must not affect others
    attn = S.ShiftedWindowAttention3D(dim=8, window=(4, 4, 4), shift=(0, 0, 0), num_heads=2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 8)), jnp.float32)
    params = attn.init(jax.random.key(0), x)
    y0 = attn.apply(params, x)
    x2 = x.at[0, 0, 0, 0, :].add(10.0)  # window (0,0,0)
    y1 = attn.apply(params, x2)
    diff = np.abs(np.asarray(y1 - y0))
    assert diff[0, :4, :4, :4].max() > 1e-3  # same window changed
    assert diff[0, 4:, 4:, 4:].max() < 1e-6  # far window untouched


def test_patch_merging():
    pm = S.PatchMerging3D(out_dim=64)
    x = jnp.ones((1, 8, 8, 8, 32))
    params = pm.init(jax.random.key(0), x)
    y = pm.apply(params, x)
    assert y.shape == (1, 4, 4, 4, 64)


def test_swin_fpn_pyramid():
    model = S.SwinTransformerFPN(
        embed_dim=24, depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
        window=(4, 4, 4),
    )
    x = jnp.ones((1, 32, 32, 32, 4))
    params = model.init(jax.random.key(0), x)
    outs = model.apply(params, x)
    assert len(outs) == 4
    assert outs[0].shape == (1, 8, 8, 8, 256)
    assert outs[3].shape == (1, 1, 1, 1, 256)


def test_swin_factory():
    from instance_nerf_tpu.models.backbones import build_backbone

    m = build_backbone("swin_t")
    assert m.embed_dim == 96 and m.depths == (2, 2, 6, 2)
