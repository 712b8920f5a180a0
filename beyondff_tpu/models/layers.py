"""Shared transformer building blocks (flax.linen).

One implementation of attention / MLP / patch embedding reused across CLIP,
SAM, EfficientSAM, and the Grounding-DINO towers — the reference pulls five
separate PyTorch packages for these (SURVEY.md §2.3). All blocks take a
``dtype`` for bf16 compute with f32 params and use fixed shapes so XLA can
fuse and tile for the MXU.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    hidden_dim: int
    out_dim: Optional[int] = None
    activation: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.activation(x)
        return nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)


class Attention(nn.Module):
    """Multi-head self/cross attention with optional mask and rel-pos hook."""

    num_heads: int
    head_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, kv=None, v=None, mask=None, attn_bias=None):
        """q: queries; kv: keys (defaults to q); v: values (defaults to kv).

        Separate ``v`` supports DETR-style attention where positional
        embeddings are added to queries/keys but not to values.
        """
        kv = q if kv is None else kv
        v_in = kv if v is None else v
        dim = q.shape[-1]
        head_dim = self.head_dim or dim // self.num_heads
        inner = self.num_heads * head_dim

        qp = nn.Dense(inner, dtype=self.dtype, name="q")(q)
        kp = nn.Dense(inner, dtype=self.dtype, name="k")(kv)
        vp = nn.Dense(inner, dtype=self.dtype, name="v")(v_in)

        def split(t):
            return t.reshape(*t.shape[:-1], self.num_heads, head_dim)

        qh, kh, vh = split(qp), split(kp), split(vp)
        if self._use_flash(qh, kh, mask, attn_bias):
            from beyondff_tpu.kernels import flash_attention as fa

            b, s, _, _ = qh.shape
            sk = kh.shape[1]
            fq = qh.transpose(0, 2, 1, 3).reshape(b * self.num_heads, s, head_dim)
            fk = kh.transpose(0, 2, 1, 3).reshape(b * self.num_heads, sk, head_dim)
            fv = vh.transpose(0, 2, 1, 3).reshape(b * self.num_heads, sk, head_dim)
            out = fa.attend(fq, fk, fv)
            out = out.reshape(b, self.num_heads, s, head_dim).transpose(0, 2, 1, 3)
            out = out.reshape(b, s, inner)
        else:
            scale = head_dim ** -0.5
            logits = jnp.einsum("...qhd,...khd->...hqk", qh * scale, kh)
            if attn_bias is not None:
                logits = logits + attn_bias
            if mask is not None:
                logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
            weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("...hqk,...khd->...qhd", weights, vh)
            out = out.reshape(*out.shape[:-2], inner)
        return nn.Dense(self.out_dim or dim, dtype=self.dtype, name="proj")(out)

    def _use_flash(self, qh, kh, mask, attn_bias) -> bool:
        if mask is not None or attn_bias is not None or qh.ndim != 4:
            return False
        if qh.shape[1] != kh.shape[1] or qh.shape[1] < 512:
            return False
        from beyondff_tpu.kernels import dispatch

        return dispatch.on_tpu()


class TransformerBlock(nn.Module):
    """Pre-LN transformer block (CLIP/ViT style)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    activation: Callable = nn.gelu

    @nn.compact
    def __call__(self, x, mask=None, attn_bias=None):
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = x + Attention(self.num_heads, dtype=self.dtype, name="attn")(h, mask=mask, attn_bias=attn_bias)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        x = x + MLP(int(x.shape[-1] * self.mlp_ratio), activation=self.activation,
                    dtype=self.dtype, name="mlp")(h)
        return x


class PatchEmbed(nn.Module):
    """Image -> patch tokens via conv."""

    patch_size: int
    embed_dim: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="proj",
        )(x)
        return x  # (B, H', W', D)


def quick_gelu(x):
    """CLIP's GELU variant: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def window_partition(x: jnp.ndarray, window: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B*nW, win, win, C) with zero padding; returns padded hw."""
    b, h, w, c = x.shape
    pad_h = (-h) % window
    pad_w = (-w) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x: jnp.ndarray, window: int, padded_hw: Tuple[int, int], hw: Tuple[int, int]) -> jnp.ndarray:
    """Inverse of :func:`window_partition`."""
    hp, wp = padded_hw
    h, w = hw
    b = x.shape[0] // ((hp // window) * (wp // window))
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]
