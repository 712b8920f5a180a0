"""BERT-base text encoder (flax) for Grounding-DINO's language branch.

Standard post-LN BERT: wordpiece + position + type embeddings, 12 encoder
layers, followed by Grounding-DINO's linear feature resizer to the
cross-modality dimension. Supports the sub-sentence attention masking
Grounding-DINO applies between '.'-separated category phrases.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2


PRESETS = {
    "bert-base": BertConfig(),
    "test": BertConfig(vocab_size=64, hidden=32, layers=2, heads=2, intermediate=64, max_position=32),
}


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask):  # post-LN
        c = self.cfg
        head_dim = c.hidden // c.heads
        q = nn.Dense(c.hidden, dtype=self.dtype, name="q")(x)
        k = nn.Dense(c.hidden, dtype=self.dtype, name="k")(x)
        v = nn.Dense(c.hidden, dtype=self.dtype, name="v")(x)

        def split(t):
            return t.reshape(*t.shape[:-1], c.heads, head_dim)

        logits = jnp.einsum("bqhd,bkhd->bhqk", split(q) * head_dim ** -0.5, split(k))
        logits = jnp.where(attn_mask[:, None], logits, jnp.finfo(logits.dtype).min)
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, split(v)).reshape(x.shape)
        attn = nn.Dense(c.hidden, dtype=self.dtype, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln1")(x + attn)

        h = nn.Dense(c.intermediate, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden, dtype=self.dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln2")(x + h)


class BertEncoder(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attn_mask, position_ids=None):
        """input_ids: (B, L) int32; attn_mask: (B, L, L) or (B, L) bool;
        position_ids: optional (B, L) int32 (phrase-local positions).

        Returns (B, L, hidden)."""
        c = self.cfg
        if attn_mask.ndim == 2:
            attn_mask = attn_mask[:, None, :] & attn_mask[:, :, None]
        x = nn.Embed(c.vocab_size, c.hidden, dtype=self.dtype, name="word_emb")(input_ids)
        pos = self.param("pos_emb", nn.initializers.normal(0.02), (c.max_position, c.hidden))
        if position_ids is None:
            x = x + pos[: input_ids.shape[1]].astype(self.dtype)
        else:
            x = x + pos[position_ids].astype(self.dtype)
        tok = self.param("type_emb", nn.initializers.normal(0.02), (c.type_vocab, c.hidden))
        x = x + tok[0].astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="emb_ln")(x)
        for i in range(c.layers):
            x = BertLayer(c, dtype=self.dtype, name=f"layer{i}")(x, attn_mask)
        return x


def subsentence_masks(input_ids: np.ndarray, special_ids, cls_id: int, sep_id: int):
    """Grounding-DINO's per-phrase text masking.

    Tokens between '.'-separators only attend within their own phrase;
    special tokens ([CLS], [SEP], '.') attend only to themselves.

    Returns (self_attn_mask (B, L, L) bool, position_ids (B, L) int32) —
    position ids restart at each phrase, as in the reference dependency's
    ``generate_masks_with_special_tokens_and_transfer_map``.
    """
    b, l = input_ids.shape
    special = np.isin(input_ids, list(special_ids) + [cls_id, sep_id])
    mask = np.zeros((b, l, l), bool)
    pos = np.zeros((b, l), np.int64)
    idx = np.eye(l, dtype=bool)
    for bi in range(b):
        spots = np.flatnonzero(special[bi])
        mask[bi] |= idx
        prev = 0
        for s in spots:
            if s in (0, l - 1):
                prev = s + 1
                continue
            mask[bi, prev : s + 1, prev : s + 1] = True
            pos[bi, prev : s + 1] = np.arange(0, s + 1 - prev)
            prev = s + 1
    return mask, pos.astype(np.int32)
