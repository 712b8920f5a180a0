"""Swin Transformer backbone (flax) for Grounding-DINO.

Swin-T/B with shifted-window attention, relative position bias tables, patch
merging, and multi-scale feature outputs (strides 8/16/32). Matches the
backbone inside the public ``groundingdino_swinb_cogcoor.pth`` checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    patch_size: int = 4
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (1, 2, 3)


PRESETS = {
    "swin_b": SwinConfig(),
    "swin_t": SwinConfig(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), window_size=7),
    "test": SwinConfig(embed_dim=16, depths=(1, 1), num_heads=(2, 2), window_size=4,
                       out_indices=(0, 1)),
}


def _rel_pos_index(window: int) -> np.ndarray:
    """(win^2, win^2) index into the (2w-1)^2 relative position bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):  # x: (nW*B, win*win, C)
        n, l, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(n, l, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (n, heads, l, hd)
        logits = (q * head_dim ** -0.5) @ k.swapaxes(-1, -2)

        table = self.param("rel_bias_table", nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, self.num_heads))
        idx = _rel_pos_index(self.window).reshape(-1)
        bias = table[idx].reshape(l, l, self.num_heads).transpose(2, 0, 1)
        logits = logits + bias.astype(self.dtype)[None]

        if mask is not None:  # (nW, l, l) shifted-window mask
            nw = mask.shape[0]
            logits = logits.reshape(n // nw, nw, self.num_heads, l, l) + mask[None, :, None].astype(self.dtype)
            logits = logits.reshape(n, self.num_heads, l, l)
        attn = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        out = (attn @ v).swapaxes(1, 2).reshape(n, l, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw):  # x: (B, H*W, C)
        h, w = hw
        b, l, c = x.shape
        win = min(self.window, h, w)
        shift = self.shift if win < min(h, w) else 0

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x).reshape(b, h, w, c)
        pad_r = (-w) % win
        pad_b = (-h) % win
        if pad_r or pad_b:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = _shift_mask(hp, wp, win, shift)
        else:
            mask = None

        x = x.reshape(b, hp // win, win, wp // win, win, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(-1, win * win, c)
        x = WindowAttention(self.dim, self.num_heads, win, dtype=self.dtype, name="attn")(x, mask)
        x = x.reshape(b, hp // win, wp // win, win, win, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, hp, wp, c)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w].reshape(b, l, c)
        x = shortcut + x
        hmid = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        hmid = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(hmid)
        hmid = nn.gelu(hmid, approximate=False)  # exact erf GELU (torch default)
        hmid = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(hmid)
        return x + hmid


def _shift_mask(hp: int, wp: int, win: int, shift: int) -> jnp.ndarray:
    """Attention mask for shifted windows (numpy at trace time: static shapes)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    m = img.reshape(hp // win, win, wp // win, win).transpose(0, 2, 1, 3).reshape(-1, win * win)
    diff = m[:, :, None] != m[:, None, :]
    return jnp.asarray(np.where(diff, -100.0, 0.0).astype(np.float32))


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        x = x.reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinBackbone(nn.Module):
    cfg: SwinConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) normalized
        c = self.cfg
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size), (c.patch_size, c.patch_size),
                    padding="VALID", dtype=self.dtype, name="patch_embed")(images)
        b, h, w, _ = x.shape
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x.reshape(b, h * w, -1))

        outs = []
        dim = c.embed_dim
        for si, depth in enumerate(c.depths):
            for bi in range(depth):
                x = SwinBlock(dim, c.num_heads[si], c.window_size,
                              shift=0 if bi % 2 == 0 else c.window_size // 2,
                              mlp_ratio=c.mlp_ratio, dtype=self.dtype,
                              name=f"stage{si}_block{bi}")(x, (h, w))
            if si in c.out_indices:
                y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm{si}")(x)
                outs.append((y.reshape(b, h, w, dim), (h, w)))
            if si < len(c.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{si}")(x, (h, w))
                h, w = (h + 1) // 2, (w + 1) // 2
                dim *= 2
        return outs  # list of ((B, H_i, W_i, C_i), (H_i, W_i))
