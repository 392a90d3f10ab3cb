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


def ref_relative_position_index(window):
    """Verbatim numpy oracle of the reference's 3D rel-pos index —
    feature_extractor.py:548-563 — INCLUDING the two lines the reference
    flags ``# problematic`` (the row-major mixed-radix multiplies)."""
    coords = np.stack(
        np.meshgrid(np.arange(window[0]), np.arange(window[1]),
                    np.arange(window[2]), indexing="ij")
    )  # 3, Wh, Ww, Wd
    coords_flatten = coords.reshape(3, -1)
    relative_coords = coords_flatten[:, :, None] - coords_flatten[:, None, :]
    relative_coords = relative_coords.transpose(1, 2, 0).copy()
    relative_coords[:, :, 0] += window[0] - 1
    relative_coords[:, :, 1] += window[1] - 1
    relative_coords[:, :, 2] += window[2] - 1
    relative_coords[:, :, 0] *= (2 * window[2] - 1) * (2 * window[1] - 1)  # problematic
    relative_coords[:, :, 1] *= 2 * window[2] - 1  # problematic
    return relative_coords.sum(-1).reshape(-1)  # flattened (N*N,)


def ref_attn_mask(pad_hwd, window_size, shift_size):
    """Verbatim numpy oracle of the reference's shifted-window attention
    mask — feature_extractor.py:462-479 — including the ``-0`` slice
    quirk on zero-shift axes (slice(-0, None) rewrites the whole axis)."""
    pad_H, pad_W, pad_D = pad_hwd
    attn_mask = np.zeros((pad_H, pad_W, pad_D), np.float32)
    h_slices = ((0, -window_size[0]), (-window_size[0], -shift_size[0]),
                (-shift_size[0], None))
    w_slices = ((0, -window_size[1]), (-window_size[1], -shift_size[1]),
                (-shift_size[1], None))
    d_slices = ((0, -window_size[2]), (-window_size[2], -shift_size[2]),
                (-shift_size[2], None))
    count = 0
    for h in h_slices:
        for w in w_slices:
            for d in d_slices:
                attn_mask[h[0]: h[1], w[0]: w[1], d[0]: d[1]] = count
                count += 1
    num_windows = (
        (pad_H // window_size[0]) * (pad_W // window_size[1])
        * (pad_D // window_size[2])
    )
    m = attn_mask.reshape(
        pad_H // window_size[0], window_size[0],
        pad_W // window_size[1], window_size[1],
        pad_D // window_size[2], window_size[2],
    ).transpose(0, 2, 4, 1, 3, 5).reshape(
        num_windows, window_size[0] * window_size[1] * window_size[2]
    )
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def test_relative_position_index_matches_reference_oracle():
    """Golden: repo index == reference semantics, incl. asymmetric
    windows where a wrong axis order / radix would diverge."""
    for window in [(4, 4, 4), (2, 3, 4), (5, 2, 3), (1, 4, 2)]:
        got = S.relative_position_index(window)
        n = window[0] * window[1] * window[2]
        want = ref_relative_position_index(window).reshape(n, n)
        np.testing.assert_array_equal(got, want), window


def test_bias_gather_matches_reference_oracle():
    """Golden: the module's table gather reproduces the reference's
    _get_relative_position_bias (feature_extractor.py:500-508)."""
    window = (2, 3, 4)
    n = 24
    heads = 5
    rng = np.random.default_rng(0)
    table = rng.normal(size=((2 * 2 - 1) * (2 * 3 - 1) * (2 * 4 - 1), heads))
    # reference: table[flat_idx].view(N, N, -1).permute(2, 0, 1)
    want = table[ref_relative_position_index(window)].reshape(
        n, n, heads
    ).transpose(2, 0, 1)
    # repo gather (swin.py ShiftedWindowAttention3D)
    idx = S.relative_position_index(window)
    got = table[idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1)
    np.testing.assert_array_equal(got, want)


def test_shift_mask_matches_reference_oracle():
    """Golden: repo mask == reference mask for mixed shift patterns,
    including zero-shift axes (the reference's -0 slice quirk)."""
    cases = [
        ((8, 8, 8), (4, 4, 4), (2, 2, 2)),
        ((8, 12, 4), (4, 4, 4), (2, 2, 2)),
        ((8, 8, 8), (4, 4, 4), (2, 0, 2)),  # zero-shift middle axis
        ((4, 8, 8), (4, 4, 4), (0, 2, 2)),  # zero-shift first axis
        ((6, 4, 8), (2, 4, 4), (1, 2, 2)),  # asymmetric window
    ]
    for spatial, window, shift in cases:
        got = S.shift_attention_mask(spatial, window, shift)
        want = ref_attn_mask(spatial, list(window), list(shift))
        np.testing.assert_array_equal(got, want), (spatial, window, shift)


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
