"""3D Swin Transformer backbone + FPN (flax, NDHWC).

Capability parity with ``feature_extractor.py:382-789`` (SURVEY.md §2.2):
3D shifted-window multi-head attention with relative position bias and
cyclic-shift masking, 8-way PatchMerging, stochastic depth, variants
swin_t/s/b/l (configs at run_rcnn.py:436-447: patch 4^3, window 4^3).

TPU notes: window partitioning is pure reshape/transpose; each window is
a 64-token sequence so attention is dense (B*nW, 64, 64) matmuls — MXU-
shaped with heads batched. The relative-position-bias gather is a
trace-time constant index into the learned table.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from instance_nerf_tpu.models.fpn import FPN

SWIN_CONFIGS = {
    "swin_t": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swin_s": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swin_b": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swin_l": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}


def swin_config(name: str) -> dict:
    return dict(SWIN_CONFIGS[name])


def relative_position_index(window: Sequence[int]) -> np.ndarray:
    """(N, N) index into the (2w0-1)(2w1-1)(2w2-1) bias table — standard
    3D extension of the Swin formula (ref: feature_extractor.py:548-563)."""
    coords = np.stack(
        np.meshgrid(*[np.arange(w) for w in window], indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (3, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += window[0] - 1
    rel[..., 1] += window[1] - 1
    rel[..., 2] += window[2] - 1
    rel[..., 0] *= (2 * window[1] - 1) * (2 * window[2] - 1)
    rel[..., 1] *= 2 * window[2] - 1
    return rel.sum(-1)


def shift_attention_mask(spatial, window, shift) -> np.ndarray:
    """(nW, N, N) additive mask forbidding attention across cyclic-shift
    seams (ref: feature_extractor.py:463-481). Host-side constant."""
    w_, l_, h_ = spatial
    region = np.zeros(spatial, np.int32)
    count = 0
    slices = lambda ws, ss: (
        (slice(0, -ws), slice(-ws, -ss) if ss else slice(-ws, None), slice(-ss, None))
        if ss
        else (slice(None),)
    )
    for hs in slices(window[0], shift[0]):
        for ws in slices(window[1], shift[1]):
            for ds in slices(window[2], shift[2]):
                region[hs, ws, ds] = count
                count += 1
    r = region.reshape(
        w_ // window[0], window[0], l_ // window[1], window[1], h_ // window[2], window[2]
    ).transpose(0, 2, 4, 1, 3, 5).reshape(-1, window[0] * window[1] * window[2])
    diff = r[:, None, :] - r[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class ShiftedWindowAttention3D(nn.Module):
    dim: int
    window: Sequence[int]
    shift: Sequence[int]
    num_heads: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        b, w_, l_, h_, c = x.shape
        win = list(self.window)
        # pad to window multiples
        pw = (-w_) % win[0]
        pl = (-l_) % win[1]
        ph = (-h_) % win[2]
        x = jnp.pad(x, ((0, 0), (0, pw), (0, pl), (0, ph), (0, 0)))
        W, L, H = x.shape[1:4]
        shift = [0 if win[i] >= x.shape[1 + i] else self.shift[i] for i in range(3)]

        if sum(shift) > 0:
            x = jnp.roll(x, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))

        nw = (W // win[0]) * (L // win[1]) * (H // win[2])
        n = win[0] * win[1] * win[2]
        xw = x.reshape(b, W // win[0], win[0], L // win[1], win[1], H // win[2], win[2], c)
        xw = xw.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b * nw, n, c)

        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(xw)
        qkv = qkv.reshape(b * nw, n, 3, self.num_heads, c // self.num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B*nW, N, h, d)
        q = q * (c // self.num_heads) ** -0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k)

        table = self.param(
            "rel_pos_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * win[0] - 1) * (2 * win[1] - 1) * (2 * win[2] - 1), self.num_heads),
        )
        idx = relative_position_index(win)  # (N, N) host constant
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if sum(shift) > 0:
            mask = jnp.asarray(shift_attention_mask((W, L, H), win, shift))
            attn = attn.reshape(b, nw, self.num_heads, n, n) + mask[None, :, None]
            attn = attn.reshape(b * nw, self.num_heads, n, n)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b * nw, n, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)

        out = out.reshape(b, W // win[0], L // win[1], H // win[2], win[0], win[1], win[2], c)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, W, L, H, c)
        if sum(shift) > 0:
            out = jnp.roll(out, (shift[0], shift[1], shift[2]), axis=(1, 2, 3))
        return out[:, :w_, :l_, :h_]


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: Sequence[int]
    shift: Sequence[int]
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        def drop_path(res):
            if self.drop_path == 0.0 or deterministic:
                return res
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (res.shape[0],) + (1,) * (res.ndim - 1)
            )
            return res * mask / keep

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = ShiftedWindowAttention3D(
            self.dim, self.window, self.shift, self.num_heads,
            dtype=self.dtype, name="attn",
        )(h)
        x = x + drop_path(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + drop_path(h)


class PatchMerging3D(nn.Module):
    """8-way 2x downsample: concat the 2^3 sub-lattices -> LN -> linear
    (ref: feature_extractor.py:649-686)."""

    out_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        b, w, l, h, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, w % 2), (0, l % 2), (0, h % 2), (0, 0)))
        parts = [
            x[:, dx::2, dy::2, dz::2, :]
            for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
        ]
        x = jnp.concatenate(parts, axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype)(x)


class SwinTransformerFPN(nn.Module):
    """Patch embed + 4 Swin stages + FPN neck -> 4x 256-channel levels at
    strides {4, 8, 16, 32} (ref: feature_extractor.py:689-789)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    patch_size: Sequence[int] = (4, 4, 4)
    window: Sequence[int] = (4, 4, 4)
    mlp_ratio: float = 4.0
    stochastic_depth_prob: float = 0.1
    expand_dim: bool = True
    out_channels: int = 256
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(
            self.embed_dim,
            kernel_size=tuple(self.patch_size),
            strides=tuple(self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)

        total = sum(self.depths)
        block_id = 0
        features = []
        for i, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** i) if self.expand_dim else self.embed_dim
            if i > 0:
                x = PatchMerging3D(
                    dim if self.expand_dim else self.embed_dim,
                    dtype=self.dtype, name=f"merge_{i}",
                )(x)
            for j in range(depth):
                sd = self.stochastic_depth_prob * block_id / max(total - 1, 1)
                shift = [0 if j % 2 == 0 else w // 2 for w in self.window]
                x = SwinBlock(
                    dim, self.num_heads[i], self.window, shift,
                    mlp_ratio=self.mlp_ratio, drop_path=sd,
                    dtype=self.dtype, name=f"stage{i}_block{j}",
                )(x, deterministic=deterministic)
                block_id += 1
            features.append(x)

        return FPN(out_channels=self.out_channels, num_outs=4,
                   dtype=self.dtype)(features)
