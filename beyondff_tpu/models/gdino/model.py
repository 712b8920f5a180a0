"""Grounding-DINO: open-vocabulary detection from (image, caption).

Faithful JAX rebuild of the architecture behind the public
``groundingdino_swinb_cogcoor.pth`` checkpoint the reference loads from the
HF hub (reference: tools/segmentation_2d.py:65-79): Swin backbone, BERT text
branch with sub-sentence masking, a 6-layer feature enhancer interleaving
image-text bi-attention / text self-attention / multi-scale deformable image
attention, language-guided top-K query selection, and a 6-layer cross-modality
decoder with iterative box refinement and a contrastive (token-grounded)
classification head.

The detection entry point mirrors ``groundingdino.util.inference.predict``
(box_threshold on max token logit, text_threshold for phrase extraction,
reference detect(): segmentation_2d.py:110-168).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from beyondff_tpu.models.gdino import bert as bert_mod
from beyondff_tpu.models.gdino import swin as swin_mod
from beyondff_tpu.models.gdino.deformable import MSDeformAttn
from beyondff_tpu.models.layers import Attention

IMAGE_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGE_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class GDINOConfig:
    swin: swin_mod.SwinConfig = field(default_factory=lambda: swin_mod.PRESETS["swin_b"])
    bert: bert_mod.BertConfig = field(default_factory=lambda: bert_mod.PRESETS["bert-base"])
    hidden: int = 256
    heads: int = 8
    levels: int = 4
    enc_points: int = 4
    dec_points: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    ffn_dim: int = 2048
    num_queries: int = 900
    max_text_len: int = 256
    # the reference's inference transform is aspect-preserving
    # shorter-side-800 (groundingdino load_image: RandomResize([800],
    # max_size=1333), tools/segmentation_2d.py:247); for the 1296x968 ScanNet
    # frames that is (800, 1071) — fixed here at (800, 1072) (multiple of 8
    # for level tiling; the reference's (800, 1200)-sized default padded 12%
    # more tokens than the frames ever carry)
    image_size: Tuple[int, int] = (800, 1072)
    # vision-level position-embedding temperature (the official backbone PE,
    # PositionEmbeddingSineHW pe_temperatureH/W=20 in the released configs;
    # HF GroundingDinoSinePositionEmbedding positional_embedding_temperature)
    pe_temperature: float = 20.0
    # tile-windowed MXU deformable sampling in the encoder (TPU; exact-path
    # fallback via BFF_DEFORM_WINDOWED=0 — see kernels/deform_window.py)
    enc_windowed_deform: bool = True


PRESETS = {
    "swinb": GDINOConfig(),
    "swint": GDINOConfig(swin=swin_mod.PRESETS["swin_t"]),
    "test": GDINOConfig(
        swin=swin_mod.PRESETS["test"],
        bert=bert_mod.PRESETS["test"],
        hidden=32,
        heads=2,
        levels=3,
        enc_layers=1,
        dec_layers=1,
        ffn_dim=64,
        num_queries=20,
        max_text_len=16,
        image_size=(64, 96),
    ),
}


def sine_position_embedding(coords: jnp.ndarray, dim: int, temperature: float = 10000.0):
    """(..., 2 or 4) normalized coords -> (..., dim) sine PE (DETR convention)."""
    n = coords.shape[-1]
    d = dim // n
    scale = 2 * math.pi
    t = temperature ** (2 * (jnp.arange(d // 2, dtype=jnp.float32)) / d)
    parts = []
    for i in range(n):
        x = coords[..., i] * scale
        xt = x[..., None] / t
        parts.append(jnp.stack([jnp.sin(xt), jnp.cos(xt)], axis=-1).reshape(*x.shape, d))
    # DETR orders (y, x) interleaved per pair; keep (pos_y, pos_x) concat order
    return jnp.concatenate(parts, axis=-1)


class BiAttention(nn.Module):
    """Bidirectional image<->text cross-attention with tanh-gated residuals
    (GLIP/Grounding-DINO fusion block)."""

    dim: int
    text_dim: int
    embed_dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, txt, txt_mask=None):
        head_dim = self.embed_dim // self.heads
        scale = head_dim ** -0.5

        # PRE-norm, and the official block REBINDS the normed features as the
        # residual base: out = LN(x) + gamma * delta (GroundingDINO
        # BiAttentionBlock; the HF port's GroundingDinoFusionLayer does the
        # same — pinned in tests/test_torch_parity.py). Applying the residual
        # to the un-normed input computes a different function under real
        # weights.
        img = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_v")(img)
        txt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_l")(txt)

        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(img) * scale
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="l_proj")(txt)
        vv = nn.Dense(self.embed_dim, dtype=self.dtype, name="values_v_proj")(img)
        vl = nn.Dense(self.embed_dim, dtype=self.dtype, name="values_l_proj")(txt)

        def split(t):
            return t.reshape(*t.shape[:-1], self.heads, head_dim)

        logits = jnp.einsum("bihd,bthd->bhit", split(q), split(k))
        # numeric clamping as in the original implementation (the original
        # skips the vision-side global max subtraction: stable_softmax_2d
        # defaults False in the released config)
        logits = jnp.clip(logits, -50000, 50000)
        logits_t = logits.transpose(0, 1, 3, 2)  # (B, h, T, I)
        # text side always subtracts the per-row max before clamping
        logits_t = logits_t - jax.lax.stop_gradient(
            jnp.max(logits_t, axis=-1, keepdims=True))
        logits_t = jnp.clip(logits_t, -50000, 50000)
        if txt_mask is not None:
            logits = jnp.where(txt_mask[:, None, None, :], logits, jnp.finfo(logits.dtype).min)
        attn_i = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        attn_t = jax.nn.softmax(logits_t.astype(jnp.float32), -1).astype(self.dtype)

        img_out = jnp.einsum("bhit,bthd->bihd", attn_i, split(vl)).reshape(img.shape[:-1] + (self.embed_dim,))
        txt_out = jnp.einsum("bhti,bihd->bthd", attn_t, split(vv)).reshape(txt.shape[:-1] + (self.embed_dim,))
        img_out = nn.Dense(self.dim, dtype=self.dtype, name="out_v_proj")(img_out)
        txt_out = nn.Dense(self.text_dim, dtype=self.dtype, name="out_l_proj")(txt_out)

        gamma_v = self.param("gamma_v", nn.initializers.constant(1 / 8), (self.dim,))
        gamma_l = self.param("gamma_l", nn.initializers.constant(1 / 8), (self.text_dim,))
        # residual base = the pre-normed features (see note above)
        img = img + gamma_v.astype(self.dtype) * img_out
        txt = txt + gamma_l.astype(self.dtype) * txt_out
        return img, txt


class EnhancerLayer(nn.Module):
    cfg: GDINOConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, pos, txt, ref_points, shapes, txt_mask,
                 text_self_mask=None, pos_text=None):
        """``pos`` joins queries/keys only (DETR convention), never the
        residual stream. ``text_self_mask`` (B, T, T) restricts the text
        self-attention to each token's own phrase and ``pos_text`` (the sine
        embedding of the restarting position ids) joins its queries/keys —
        both as in the official encoder layer (GroundingDinoEncoderLayer
        .get_text_position_embeddings / GroundingDinoTextEnhancerLayer)."""
        c = self.cfg
        # 1. image <-> text fusion (on raw features). The official
        # BiAttentionBlock projects into embed_dim = dim_feedforward//2
        # (1024 for the released SwinB/T configs) with nhead//2 heads — NOT
        # d_model (HF GroundingDinoBiMultiHeadAttention: embed_dim =
        # encoder_ffn_dim // 2; original build_transformer).
        img, txt = BiAttention(c.hidden, c.hidden, c.ffn_dim // 2, c.heads // 2,
                               dtype=self.dtype, name="fusion")(img, txt, txt_mask)
        # 2. text self-attention (phrase-masked, sine-pos on q/k, nhead//2
        # heads and dim_feedforward//2 FFN — the official text enhancer,
        # GroundingDinoTextEnhancerLayer / original TransformerEncoderLayer
        # (d_model, nhead//2, dim_feedforward//2))
        if text_self_mask is not None:
            t_mask = text_self_mask[:, None, :, :]
        else:
            t_mask = txt_mask[:, None, None, :] if txt_mask is not None else None
        tq = txt + pos_text.astype(self.dtype) if pos_text is not None else txt
        t = Attention(c.heads // 2, dtype=self.dtype, name="text_attn")(
            tq, kv=tq, v=txt, mask=t_mask)
        txt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="text_ln1")(txt + t)
        t = nn.Dense(c.ffn_dim // 2, dtype=self.dtype, name="text_fc1")(txt)
        t = nn.relu(t)
        t = nn.Dense(c.hidden, dtype=self.dtype, name="text_fc2")(t)
        txt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="text_ln2")(txt + t)
        # 3. deformable image self-attention + FFN (query = src + pos, value = src)
        i = MSDeformAttn(c.hidden, c.heads, c.levels, c.enc_points,
                         dtype=self.dtype, windowed=c.enc_windowed_deform,
                         name="deform")(img + pos, ref_points, img, shapes)
        img = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="img_ln1")(img + i)
        i = nn.Dense(c.ffn_dim, dtype=self.dtype, name="img_fc1")(img)
        i = nn.relu(i)
        i = nn.Dense(c.hidden, dtype=self.dtype, name="img_fc2")(i)
        img = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="img_ln2")(img + i)
        return img, txt


class DecoderLayer(nn.Module):
    cfg: GDINOConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, memory, txt, ref_points, shapes, txt_mask):
        c = self.cfg
        # 1. self attention among queries (pos on q and k, not v)
        q = tgt + query_pos
        s = Attention(c.heads, dtype=self.dtype, name="self_attn")(q, kv=q, v=tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(tgt + s)
        # 2. cross attention to text
        t = Attention(c.heads, dtype=self.dtype, name="text_cross")(
            tgt + query_pos, kv=txt,
            mask=txt_mask[:, None, None, :] if txt_mask is not None else None)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_text")(tgt + t)
        # 3. deformable cross attention to image memory
        d = MSDeformAttn(c.hidden, c.heads, c.levels, c.dec_points,
                         dtype=self.dtype, name="deform")(tgt + query_pos, ref_points, memory, shapes)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(tgt + d)
        # 4. FFN
        f = nn.Dense(c.ffn_dim, dtype=self.dtype, name="fc1")(tgt)
        f = nn.relu(f)
        f = nn.Dense(c.hidden, dtype=self.dtype, name="fc2")(f)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln3")(tgt + f)


class BoxHead(nn.Module):
    """3-layer MLP -> cxcywh logit deltas (shared across decoder layers)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc0")(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(4, dtype=self.dtype, name="fc2")(x)


def _inverse_sigmoid(x, eps=1e-3):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class GDINOModule(nn.Module):
    """setup()-style module split into a text-INDEPENDENT :meth:`backbone`
    (Swin + input projections — the image preamble) and a text-conditioned
    :meth:`detect` (BERT + enhancer + query selection + decoder): the
    multi-class sweep banks per-frame projected pyramids device-resident and
    re-runs only the text-conditioned half per class (the reference re-runs
    the whole detector per (class, frame), run_evl.py:103-118 x
    tools/segmentation_2d.py:243-270). Parameter names are identical to the
    previous @nn.compact form (converter/renamer/fixture compatible)."""

    cfg: GDINOConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.bert = bert_mod.BertEncoder(c.bert, dtype=self.dtype, name="bert")
        self.feat_map = nn.Dense(c.hidden, dtype=self.dtype, name="feat_map")
        self.backbone_net = swin_mod.SwinBackbone(c.swin, dtype=self.dtype,
                                                  name="backbone")
        # number of backbone maps used (compact form sliced dynamically;
        # statically: Swin emits len(out_indices) maps)
        n_out = len(c.swin.out_indices)
        n_used = c.levels - 1 if n_out >= c.levels else n_out
        gn = 32 if c.hidden % 32 == 0 else 4
        self.input_projs = [
            nn.Conv(c.hidden, (1, 1), dtype=self.dtype, name=f"input_proj{li}")
            for li in range(n_used)
        ]
        self.input_gns = [
            nn.GroupNorm(gn, epsilon=1e-5, dtype=self.dtype, name=f"input_gn{li}")
            for li in range(n_used)
        ]
        # extra level: stride-2 conv on the last backbone map
        self.extra_proj = nn.Conv(c.hidden, (3, 3), (2, 2), padding=1,
                                  dtype=self.dtype, name=f"input_proj{n_used}")
        self.extra_gn = nn.GroupNorm(gn, epsilon=1e-5, dtype=self.dtype,
                                     name=f"input_gn{n_used}")
        self.level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                      (n_used + 1, c.hidden))
        self.enc_blocks = [EnhancerLayer(c, dtype=self.dtype, name=f"enc{li}")
                           for li in range(c.enc_layers)]
        self.enc_output = nn.Dense(c.hidden, dtype=self.dtype, name="enc_output")
        self.enc_output_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                          name="enc_output_ln")
        self.enc_bbox_head = BoxHead(c.hidden, dtype=self.dtype, name="enc_bbox_head")
        self.tgt_embed = self.param("tgt_embed", nn.initializers.normal(1.0),
                                    (c.num_queries, c.hidden))
        self.bbox_head = BoxHead(c.hidden, dtype=self.dtype, name="bbox_head")  # shared
        self.dec_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="dec_norm")
        self.ref_point_fc1 = nn.Dense(c.hidden, dtype=self.dtype, name="ref_point_fc1")
        self.ref_point_fc2 = nn.Dense(c.hidden, dtype=self.dtype, name="ref_point_fc2")
        self.dec_blocks = [DecoderLayer(c, dtype=self.dtype, name=f"dec{li}")
                           for li in range(c.dec_layers)]

    def backbone(self, images):
        """images (B, H, W, 3) normalized -> tuple of projected per-level
        feature maps (B, h_i, w_i, hidden). Text-independent: cacheable
        across the queries/classes of a frame."""
        c = self.cfg
        feats = self.backbone_net(images)
        feats = feats[-(c.levels - 1):] if len(feats) >= c.levels else feats
        srcs = []
        for li, (f, _hw) in enumerate(feats):
            srcs.append(self.input_gns[li](self.input_projs[li](f)))
        srcs.append(self.extra_gn(self.extra_proj(feats[-1][0])))
        return tuple(srcs)

    def detect(self, srcs, input_ids, text_self_mask, text_pad_mask, position_ids):
        """Text-conditioned half over a projected backbone pyramid ``srcs``
        (tuple of (B, h_i, w_i, hidden)); see :meth:`__call__` for the text
        tensor contracts.

        Returns (pred_logits (B, Q, T), pred_boxes (B, Q, 4) cxcywh in [0,1]).
        """
        c = self.cfg
        # ---------------- text branch
        txt = self.bert(input_ids, text_self_mask, position_ids)
        txt = self.feat_map(txt)  # resizer

        shapes = [(x.shape[1], x.shape[2]) for x in srcs]
        b = srcs[0].shape[0]
        srcs = [x.reshape(b, -1, c.hidden) for x in srcs]

        level_embed = self.level_embed
        pos_parts = []
        for li, (h, w) in enumerate(shapes):
            # the official backbone PE (PositionEmbeddingSineHW / HF
            # GroundingDinoSinePositionEmbedding): cumsum normalization
            # (i+1)/(H+1e-6) and temperature 20 — NOT the 10000-temperature
            # (i+0.5)/H grid the enhancer/decoder sine helpers use
            ys = (jnp.arange(h, dtype=jnp.float32) + 1.0) / (h + 1e-6)
            xs = (jnp.arange(w, dtype=jnp.float32) + 1.0) / (w + 1e-6)
            grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1).reshape(-1, 2)
            pe = sine_position_embedding(grid, c.hidden, temperature=c.pe_temperature)
            pos_parts.append(pe + level_embed[li])
        pos = jnp.concatenate(pos_parts, axis=0)[None].astype(self.dtype)
        memory = jnp.concatenate(srcs, axis=1)

        # per-token reference points: own center replicated across levels
        # (static — built in numpy so the proposal validity mask below is a
        # compile-time constant)
        centers = []
        for h, w in shapes:
            ys = (np.arange(h, dtype=np.float32) + 0.5) / h
            xs = (np.arange(w, dtype=np.float32) + 0.5) / w
            g = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)
            centers.append(g)
        centers = np.concatenate(centers, axis=0)
        ref_enc = jnp.broadcast_to(jnp.asarray(centers)[None, :, None, :],
                                   (b, centers.shape[0], len(shapes), 2))

        # ---------------- feature enhancer
        # sine PE of the restarting per-phrase position ids joins the text
        # self-attention queries/keys (official: get_sine_pos_embed of
        # text_position_ids, exchange_xy=False)
        pos_text = sine_position_embedding(
            position_ids[..., None].astype(jnp.float32), c.hidden)
        for li in range(c.enc_layers):
            memory, txt = self.enc_blocks[li](
                memory, pos, txt, ref_enc, shapes, text_pad_mask,
                text_self_mask=text_self_mask, pos_text=pos_text)

        # ---------------- language-guided query selection
        # per-token grid proposals: own center + level-scaled wh (0.05 * 2^lvl,
        # the deformable-DETR two-stage proposal convention). The official
        # gen_encoder_output_proposals additionally marks proposals with any
        # coordinate outside (0.01, 0.99) invalid: their memory is zeroed
        # before enc_output and their proposal logits are +inf (boxes
        # saturate to 1) — matters for edge cells of the large levels at
        # real image sizes.
        whs = np.concatenate(
            [np.full((h * w, 2), 0.05 * (2.0 ** li), np.float32)
             for li, (h, w) in enumerate(shapes)], axis=0)
        proposals = np.concatenate([np.asarray(centers), whs], axis=-1)
        valid = ((proposals > 0.01) & (proposals < 0.99)).all(-1)  # static
        anchor_logits = np.where(
            valid[:, None],
            np.log(np.clip(proposals, 1e-9, None)
                   / np.clip(1 - proposals, 1e-9, None)),
            np.inf).astype(np.float32)

        masked_memory = jnp.where(jnp.asarray(valid)[None, :, None], memory, 0.0)
        enc_out = self.enc_output_ln(self.enc_output(masked_memory))
        sim = jnp.einsum("bic,btc->bit", enc_out, txt)
        sim = jnp.where(text_pad_mask[:, None, :], sim, -jnp.inf)
        scores = jnp.max(sim, axis=-1)  # (B, I)
        # lax.top_k rather than a sliced full argsort (same descending-order
        # indices; XLA compiles both to the same program on v5e — measured
        # identical — but top_k states the intent and can't regress)
        _, topk = jax.lax.top_k(scores, c.num_queries)

        sel = jnp.take_along_axis(enc_out, topk[..., None], axis=1)
        anchors = jnp.take_along_axis(
            jnp.broadcast_to(jnp.asarray(anchor_logits)[None], (b, *anchor_logits.shape)),
            topk[..., None], axis=1)
        boxes = jax.nn.sigmoid(self.enc_bbox_head(sel) + anchors)

        tgt = jnp.broadcast_to(self.tgt_embed[None].astype(self.dtype),
                               (b, c.num_queries, c.hidden))

        # ---------------- cross-modality decoder with box refinement
        box_head = self.bbox_head  # shared across layers
        ref = boxes
        ref_in = ref  # dec_layers=0 (profiling ablations): heads read the
        # encoder proposals directly
        for li in range(c.dec_layers):
            # official ordering: gen_sineembed_for_position emits
            # (pos_y, pos_x, pos_w, pos_h) for (cx, cy, w, h) refs (the HF
            # port's get_sine_pos_embed exchange_xy=True); pinned against the
            # official function in tests/test_torch_parity.py
            pe = sine_position_embedding(
                ref[..., jnp.array([1, 0, 2, 3])], 2 * c.hidden).astype(self.dtype)
            query_pos = self.ref_point_fc2(nn.relu(self.ref_point_fc1(pe)))
            ref_input = ref[:, :, None, :].repeat(len(shapes), axis=2)
            tgt = self.dec_blocks[li](
                tgt, query_pos, memory, txt, ref_input, shapes, text_pad_mask)
            ref_in = ref
            # the official in-decoder refinement chain applies bbox_embed to
            # the UN-normed layer output (original TransformerDecoder /
            # HF GroundingDinoDecoder); decoder.norm touches only the heads
            ref = jax.nn.sigmoid(box_head(tgt) + _inverse_sigmoid(ref))

        # output heads read the NORMED last hidden state; boxes re-derive
        # from the reference that ENTERED the last layer (official
        # ForObjectDetection: bbox_embed(LN(hs_last)) + logit(ref_in))
        normed = self.dec_norm(tgt)
        out_boxes = jax.nn.sigmoid(box_head(normed) + _inverse_sigmoid(ref_in))
        # contrastive classification against text tokens
        logits = jnp.einsum("bqc,btc->bqt", normed, txt)
        logits = jnp.where(text_pad_mask[:, None, :], logits, jnp.finfo(jnp.float32).min)
        return logits, out_boxes

    def __call__(self, images, input_ids, text_self_mask, text_pad_mask, position_ids):
        """images: (B, H, W, 3) normalized; input_ids (B, T) int32;
        text_self_mask (B, T, T) bool; text_pad_mask (B, T) bool.

        Returns (pred_logits (B, Q, T), pred_boxes (B, Q, 4) cxcywh in [0,1]).
        detect(backbone(images)) — see the split methods."""
        return self.detect(self.backbone(images), input_ids, text_self_mask,
                           text_pad_mask, position_ids)


class GroundingDINO:
    """Inference wrapper: caption preprocessing, jitted forward, phrase extraction."""

    # detections surviving device-side top-K selection per frame
    TOP_K = 64

    def __init__(self, cfg: GDINOConfig, params, tokenizer, dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.module = GDINOModule(cfg, dtype=dtype)
        self._forward = jax.jit(
            lambda p, img, ids, sm, pm, pos: self.module.apply(p, img, ids, sm, pm, pos)
        )
        k = min(self.TOP_K, cfg.num_queries)
        mean = jnp.asarray(IMAGE_MEAN)
        std = jnp.asarray(IMAGE_STD)

        def pack_topk(logits, boxes):
            """Device-side top-K + packing into ONE array: scores | boxes |
            per-token probs, so the host finalize costs a single download
            round trip over the (high-latency) link instead of three."""
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            scores = jnp.max(probs, axis=-1)  # (B, Q)
            top_scores, top_idx = jax.lax.top_k(scores, k)
            top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
            top_probs = jnp.take_along_axis(probs, top_idx[..., None], axis=1)
            return jnp.concatenate(
                [top_scores[..., None], top_boxes.astype(jnp.float32), top_probs],
                axis=-1)  # (B, K, 1+4+T)

        def fwd_topk(p, img_u8, ids, sm, pm, pos):
            # images upload as uint8 (3.9x less host->device traffic) and
            # normalize on device; device-side score computation + top-K
            # selection returns only (B, K) packed rows to the host
            img = (img_u8.astype(jnp.float32) / 255.0 - mean) / std
            logits, boxes = self.module.apply(p, img, ids, sm, pm, pos)
            return pack_topk(logits, boxes)

        self._forward_topk = jax.jit(fwd_topk)

        def fwd_topk_frames(p, frames_u8, ids, sm, pm, pos):
            # single-upload path: the scene's shared uint8 frame buffer
            # (SAM-scaled) resizes to the detector input ON DEVICE — one
            # host->device transfer feeds detector, SAM, and crop scoring
            b, fh, fw, _ = frames_u8.shape
            h, w = self.cfg.image_size
            x = jax.image.resize(frames_u8.astype(jnp.float32), (b, h, w, 3),
                                 "bilinear", antialias=False)
            img = (x / 255.0 - mean) / std
            logits, boxes = self.module.apply(p, img, ids, sm, pm, pos)
            return pack_topk(logits, boxes)

        self._forward_topk_frames = jax.jit(fwd_topk_frames)

        def fwd_topk_frames_mapped(p, frames_u8, ids, sm, pm, pos):
            # single-device frame batches run as lax.map of the batch-1
            # program inside ONE dispatch: XLA's fusion degrades at batch>1
            # here (measured 168 -> 132.6 ms/frame at batch 4 on a v5e) while
            # the sequential map keeps batch-1 per-frame cost
            def one(fr):
                return fwd_topk_frames(p, fr[None], ids, sm, pm, pos)[0]

            return jax.lax.map(one, frames_u8)

        self._forward_topk_frames_mapped = jax.jit(fwd_topk_frames_mapped)
        self._fwd_topk_frames_py = fwd_topk_frames  # unjitted, for shard_map
        self._shmap_cache = {}

        # SPLIT frame programs for the multi-class sweep: (1) the
        # text-independent image preamble (device resize -> normalize -> Swin
        # -> input projections) banked per frame chunk, (2) the
        # text-conditioned half (BERT + enhancer + selection + decoder ->
        # packed top-K) re-run per class. Both run as lax.map of the batch-1
        # program inside one dispatch (the measured batch-shape lesson —
        # see fwd_topk_frames_mapped).
        def bb_frames(p, frames_u8):
            b = frames_u8.shape[0]
            h, w = self.cfg.image_size
            x = jax.image.resize(frames_u8.astype(jnp.float32), (b, h, w, 3),
                                 "bilinear", antialias=False)
            img = (x / 255.0 - mean) / std
            return self.module.apply(p, img, method=GDINOModule.backbone)

        def bb_frames_mapped(p, frames_u8):
            def one(fr):
                return tuple(z[0] for z in bb_frames(p, fr[None]))

            return jax.lax.map(one, frames_u8)

        self._backbone_frames_mapped = jax.jit(bb_frames_mapped)

        def det_feats(p, feats, ids, sm, pm, pos):
            logits, boxes = self.module.apply(p, feats, ids, sm, pm, pos,
                                              method=GDINOModule.detect)
            return pack_topk(logits, boxes)

        def det_feats_mapped(p, feats, ids, sm, pm, pos):
            def one(fs):
                return det_feats(p, tuple(f[None] for f in fs),
                                 ids, sm, pm, pos)[0]

            return jax.lax.map(one, feats)

        self._det_feats_mapped = jax.jit(det_feats_mapped)

    @classmethod
    def create(cls, name_or_cfg="swinb", tokenizer=None, seed: int = 0, dtype=jnp.float32,
               device_fill: bool = False):
        from beyondff_tpu.models.init_utils import fast_init

        cfg = PRESETS[name_or_cfg] if isinstance(name_or_cfg, str) else name_or_cfg
        module = GDINOModule(cfg, dtype=dtype)
        h, w = cfg.image_size
        t = 8
        params = fast_init(
            module,
            jnp.zeros((1, h, w, 3)),
            jnp.zeros((1, t), jnp.int32),
            jnp.ones((1, t, t), bool),
            jnp.ones((1, t), bool),
            jnp.zeros((1, t), jnp.int32),
            seed=seed,
            device_fill=device_fill,
        )
        if tokenizer is None:
            tokenizer = _HashBert(cfg.bert.vocab_size)
        return cls(cfg, params, tokenizer, dtype=dtype)

    # ------------------------------------------------------------ inference
    @staticmethod
    def preprocess_caption(caption: str) -> str:
        """lowercase + ensure trailing '.' (groundingdino.util.inference)."""
        c = caption.lower().strip()
        return c if c.endswith(".") else c + "."

    def preprocess_image(self, image: np.ndarray) -> np.ndarray:
        """uint8 RGB (H, W, 3) -> resized (1, H', W', 3) uint8 at
        cfg.image_size (normalization happens on device)."""
        import cv2

        h, w = self.cfg.image_size
        return cv2.resize(image, (w, h), interpolation=cv2.INTER_LINEAR)[None]

    def predict(self, image: np.ndarray, caption: str,
                box_threshold: float = 0.35, text_threshold: float = 0.25):
        """Single-image open-vocab detection.

        Returns (boxes (K, 4) cxcywh normalized, scores (K,), phrases list).
        """
        return self.predict_batch([image], caption, box_threshold, text_threshold)[0]

    def predict_batch(self, images, caption: str,
                      box_threshold: float = 0.35, text_threshold: float = 0.25):
        """Batched detection over frames sharing one caption — the pipeline's
        per-frame loop collapses into one device dispatch per frame batch
        (the reference runs its detector strictly one frame at a time,
        segmentation_2d.py:243-270).

        Returns a list of (boxes, scores, phrases) per image."""
        return self._predict_common(images, caption, box_threshold, text_threshold,
                                    frames=False)

    def predict_batch_frames(self, frames_dev, caption: str,
                             box_threshold: float = 0.35, text_threshold: float = 0.25):
        """Detection from an already-uploaded uint8 frame buffer (any
        resolution; resized to the detector input on device). The seg2d
        driver's single-upload path feeds the same buffer to SAM."""
        return self._predict_common(frames_dev, caption, box_threshold, text_threshold,
                                    frames=True)

    supports_feats_cache = True

    def predict_batch_frames_async(self, frames_dev, caption: str,
                                   feats_cache=None):
        """Dispatch-only detection on an uploaded frame buffer: enqueues the
        jitted forward and returns a handle WITHOUT blocking on the result —
        the seg2d driver software-pipelines the next batch's detection behind
        the current batch's SAM work (the reference's loop is strictly
        sequential, tools/segmentation_2d.py:243-278). Finish with
        :meth:`predict_finalize`.

        ``feats_cache``: optional ``(dict, key)`` — the multi-class sweep's
        per-scene bank. The text-independent image preamble (resize ->
        normalize -> Swin -> input projections, ~9 MB/frame bf16 at the
        production size) is computed once, stored device-resident under
        ``key``, and every later class pays only the text-conditioned half
        (the reference re-runs the whole detector per class,
        run_evl.py:103-118)."""
        return self._dispatch(frames_dev, caption, frames=True,
                              feats_cache=feats_cache)

    def caption_spans(self, classes):
        """Fused multi-phrase caption + per-class token spans.

        GroundingDINO's NATIVE protocol is multi-phrase: category phrases
        joined with ' . ' share one forward, and the text pathway already
        isolates each phrase — subsentence self-attention masks + per-phrase
        position-id restarts (bert.subsentence_masks), so a class's text
        features match its single-class caption up to the shared image
        pathway. The reference runs one class per sweep pass
        (run_evl.py:103-118), paying a full detector forward per
        (class, frame); a fused caption serves every class in the group from
        ONE forward and the per-class results demux by token span
        (:meth:`predict_finalize_demux`).

        Returns ``(caption, spans)`` where ``spans[i] = (start, end)`` is the
        half-open token range of ``classes[i]`` (separators excluded)."""
        caption = self.preprocess_caption(
            " . ".join(c.lower().strip().strip(".").strip() for c in classes))
        enc = self.tokenizer([caption])
        ids = np.asarray(enc["input_ids"][0][: self.cfg.max_text_len]).tolist()
        seps = set(self._special_ids())
        cls_id, sep_id = self._cls_id(), self._sep_id()
        spans, start = [], None
        for i, t in enumerate(ids):
            if t == cls_id:
                continue
            if t in seps or t == sep_id or t == 0:
                if start is not None:
                    spans.append((start, i))
                    start = None
                if t == sep_id or t == 0:
                    break
            elif start is None:
                start = i
        if start is not None:
            spans.append((start, len(ids)))
        if len(spans) != len(classes):
            raise ValueError(
                f"fused caption tokenized into {len(spans)} spans for "
                f"{len(classes)} classes (max_text_len={self.cfg.max_text_len}"
                " — shrink the caption group)")
        return caption, spans

    def predict_finalize_demux(self, handle, spans,
                               box_threshold: float = 0.35,
                               text_threshold: float = 0.25):
        """Host half of a FUSED multi-class detection: the same single packed
        download as :meth:`predict_finalize`, demuxed per class by caption
        token span. A box's per-class score is the max sigmoid logit over
        that class's tokens — with one span covering the whole caption this
        reproduces the classic finalize exactly (the in-model score is the
        max over all caption tokens; pinned in tests/test_gdino.py), and a
        box may pass several classes' thresholds (each class's CLIP filter
        arbitrates downstream, like the reference's per-class passes).

        ``box_threshold`` may be a scalar or a per-span sequence (classes
        calibrated to different operating points keep their own cutoffs).

        Returns, per frame, a list over classes of (boxes, scores, phrases)."""
        packed_d, ids, b = handle
        packed = np.asarray(packed_d, np.float32)  # (B, K, 1+4+T)
        top_boxes = packed[..., 1:5]
        top_probs = packed[..., 5:]
        thresholds = (list(box_threshold) if np.ndim(box_threshold)
                      else [box_threshold] * len(spans))
        if len(thresholds) != len(spans):
            raise ValueError(f"{len(thresholds)} box thresholds for "
                             f"{len(spans)} spans")
        out = []
        for i in range(b):
            per_class = []
            for (s, e), thr in zip(spans, thresholds):
                sc = top_probs[i][:, s:e].max(axis=1)
                keep = sc > thr
                phrases = []
                for p in top_probs[i][keep]:
                    pos = np.zeros(p.shape, bool)
                    pos[s:e] = p[s:e] > text_threshold
                    phrases.append(self._phrase_from_posmap(pos, ids[0]))
                per_class.append((top_boxes[i][keep], sc[keep], phrases))
            out.append(per_class)
        return out

    def predict_finalize(self, handle, box_threshold: float = 0.35,
                         text_threshold: float = 0.25):
        """Host half of an async detection: ONE packed download + threshold
        + phrase extraction."""
        packed_d, ids, b = handle
        packed = np.asarray(packed_d, np.float32)  # (B, K, 1+4+T)
        top_scores = packed[..., 0]
        top_boxes = packed[..., 1:5]
        top_probs = packed[..., 5:]
        out = []
        for i in range(b):
            keep = top_scores[i] > box_threshold
            phrases = [
                self._phrase_from_posmap(p > text_threshold, ids[0])
                for p in top_probs[i][keep]
            ]
            out.append((top_boxes[i][keep], top_scores[i][keep], phrases))
        return out

    def _dispatch(self, images, caption, frames, feats_cache=None):
        caption = self.preprocess_caption(caption)
        enc = self.tokenizer([caption])
        ids = enc["input_ids"][:, : self.cfg.max_text_len]
        pad = enc["attention_mask"][:, : self.cfg.max_text_len]
        special = getattr(self.tokenizer, "special_ids", None) or self._special_ids()
        self_mask, pos_ids = bert_mod.subsentence_masks(
            ids, special, self._cls_id(), self._sep_id())
        b = len(images)
        if frames:
            img = images if hasattr(images, "shape") else jnp.stack(list(images))
            b = img.shape[0]
        else:
            img = np.concatenate([self.preprocess_image(im) for im in images], axis=0)
        devices = jax.devices()
        sharded = len(devices) > 1 and b % len(devices) == 0
        if frames and not sharded and feats_cache is not None:
            # split path (multi-class banking): banked backbone pyramid +
            # per-class text-conditioned detect, both mapped batch-1 programs
            bank, key = feats_cache
            feats = bank.get(key)
            if feats is None:
                feats = self._backbone_frames_mapped(self.params, img)
                bank[key] = feats
            packed = self._det_feats_mapped(
                self.params, feats, jnp.asarray(ids), jnp.asarray(self_mask),
                jnp.asarray(pad), jnp.asarray(pos_ids))
            return packed, ids, b
        if frames and not sharded and b > 1:
            # mapped batch-1 program (see fwd_topk_frames_mapped): text
            # tensors stay unbatched, only frames map
            args = [img, jnp.asarray(ids), jnp.asarray(self_mask),
                    jnp.asarray(pad), jnp.asarray(pos_ids)]
            packed = self._forward_topk_frames_mapped(self.params, *args)
            return packed, ids, b
        tile = lambda x: np.broadcast_to(x, (b, *x.shape[1:]))
        args = [img if frames else jnp.asarray(img), jnp.asarray(tile(ids)),
                jnp.asarray(tile(self_mask)),
                jnp.asarray(tile(pad)), jnp.asarray(tile(pos_ids))]
        if sharded:
            # data-parallel inference: shard the frame batch over all devices.
            # The forward runs under shard_map (each device computes its own
            # frames, params replicated) rather than jit-on-sharded-inputs:
            # XLA's top_k SPMD fallback otherwise inserts two small
            # all-gathers per batch — shard_map keeps the program provably
            # collective-free (tools/scaling_evidence.py --hlo checks this)
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            mesh = Mesh(np.asarray(devices), ("data",))
            sharding = NamedSharding(mesh, PartitionSpec("data"))
            args = [jax.device_put(a, sharding) for a in args]
            if frames:
                packed = self._sharded_frames_fwd(mesh)(self.params, *args)
                return packed, ids, b
        fwd = self._forward_topk_frames if frames else self._forward_topk
        packed = fwd(self.params, *args)
        return packed, ids, b

    def _sharded_frames_fwd(self, mesh):
        """jit(shard_map(frame forward)) over the data axis, cached per mesh."""
        key = (id(mesh), tuple(mesh.devices.flat))
        fn = self._shmap_cache.get(key)
        if fn is None:
            try:
                from jax import shard_map  # jax >= 0.7
            except ImportError:  # pragma: no cover
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            fn = jax.jit(shard_map(
                self._fwd_topk_frames_py, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                          P("data")),
                out_specs=P("data")))
            self._shmap_cache[key] = fn
        return fn

    def _predict_common(self, images, caption, box_threshold, text_threshold, frames):
        handle = self._dispatch(images, caption, frames)
        return self.predict_finalize(handle, box_threshold, text_threshold)

    def _phrase_from_posmap(self, posmap: np.ndarray, ids: np.ndarray) -> str:
        toks = [self.tokenizer.decode_token(i) for i in ids[np.flatnonzero(posmap)]]
        words = [t for t in toks if not t.startswith("[")]
        out = ""
        for w in words:
            if w.startswith("##"):
                out += w[2:]
            else:
                out += (" " if out else "") + w
        return out

    def _cls_id(self):
        return getattr(self.tokenizer, "cls", 101)

    def _sep_id(self):
        return getattr(self.tokenizer, "sep", 102)

    def _special_ids(self):
        # '.' id if the tokenizer knows it; else empty
        vocab = getattr(self.tokenizer, "vocab", None)
        return [vocab["."]] if vocab and "." in vocab else []


class _HashBert:
    """BERT-interface hash tokenizer for weightless runs and tests."""

    cls, sep = 2, 3

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size
        self.vocab = {".": 4}

    def __call__(self, texts):
        import hashlib

        rows = []
        for t in texts:
            ids = [self.cls]
            for w in t.lower().replace(".", " .").split():
                if w == ".":
                    ids.append(4)
                else:
                    ids.append(5 + int(hashlib.md5(w.encode()).hexdigest(), 16) % (self.vocab_size - 5))
            ids.append(self.sep)
            rows.append(ids)
        width = max(len(r) for r in rows)
        out = np.zeros((len(rows), width), np.int32)
        mask = np.zeros((len(rows), width), bool)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
            mask[i, : len(r)] = True
        return {"input_ids": out, "attention_mask": mask}

    def decode_token(self, idx):
        return {2: "[CLS]", 3: "[SEP]", 4: "."}.get(int(idx), f"w{int(idx)}")

    @property
    def special_ids(self):
        return [4]
