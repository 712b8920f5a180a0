"""Segment Anything (SAM) in flax: ViT image encoder + box-prompted mask decoder.

Replaces the pip ``segment_anything`` package (reference: tools/
segmentation_2d.py:12,98,172-191). The reference drives SAM one image at a
time through ``SamPredictor.set_image`` / ``predict_torch``; here the encoder
is a jitted batch over frames and the decoder is a jitted batch over prompts,
with boxes padded to a fixed count so one compiled program serves every frame.

Architecture follows the public SAM release: ViT-{B,L,H} encoder with
window attention (global attention at 4 fixed depths) and decomposed relative
position embeddings; a prompt encoder embedding box corners with random
Fourier position encoding; a two-way transformer mask decoder with
hypernetwork mask heads. ``convert_torch_checkpoint`` maps the official
``sam_vit_h_4b8939.pth`` onto this tree.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from beyondff_tpu.models.layers import MLP, window_partition, window_unpartition


def _gelu_exact(x):
    """Exact (erf) GELU — torch ``nn.GELU`` default; flax ``nn.gelu`` defaults
    to the tanh approximation, which deviates ~1e-3 per block."""
    return nn.gelu(x, approximate=False)

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


@dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    encoder_dim: int = 1280
    encoder_depth: int = 32
    encoder_heads: int = 16
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    prompt_dim: int = 256
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask_outputs: int = 3
    use_rel_pos: bool = True  # False for plain-ViT encoders (EfficientSAM)
    softmax_f32: bool = True  # False: keep attention softmax in compute dtype


PRESETS = {
    "vit_h": SAMConfig(),
    "vit_l": SAMConfig(encoder_dim=1024, encoder_depth=24, encoder_heads=16,
                       global_attn_indexes=(5, 11, 17, 23)),
    "vit_b": SAMConfig(encoder_dim=768, encoder_depth=12, encoder_heads=12,
                       global_attn_indexes=(2, 5, 8, 11)),
    "test": SAMConfig(img_size=64, patch_size=8, encoder_dim=32, encoder_depth=2,
                      encoder_heads=2, window_size=4, global_attn_indexes=(1,),
                      prompt_dim=32, decoder_mlp_dim=64),
}


# ------------------------------------------------------------ image encoder
def _rel_pos_bias(q_hw: Tuple[int, int], k_hw: Tuple[int, int], rel_h, rel_w, q):
    """Decomposed relative position bias (SAM's add_decomposed_rel_pos)."""
    bias_h, bias_w = _rel_pos_factors(q_hw, k_hw, rel_h, rel_w, q)
    kh, kw = k_hw
    b = q.shape[0]
    bias = bias_h[..., :, None] + bias_w[..., None, :]
    return bias.reshape(b, q_hw[0] * q_hw[1], kh * kw)


def _rel_pos_factors(q_hw: Tuple[int, int], k_hw: Tuple[int, int], rel_h, rel_w, q):
    """Thin factors of the decomposed bias: bias[q, (ky, kx)] =
    bias_h[q, ky] + bias_w[q, kx]. Returns ((B, S, kh), (B, S, kw))."""
    qh, qw = q_hw
    kh, kw = k_hw

    def get(rel, q_size, k_size):
        # rel: (2*max-1, dim). When the runtime axis is SHORTER than the
        # table's native size (rect-encode mode, BFF_SAM_RECT: 48 rows
        # against a 64-grid table), take the CENTRAL slice — each relative
        # offset keeps its trained embedding (the official code would
        # linearly resize the table, mapping offsets onto wrong physical
        # distances; the official model never sees rect inputs, so the
        # slice is the fidelity-preserving choice).
        needed = 2 * max(q_size, k_size) - 1
        if rel.shape[0] > needed:
            start = (rel.shape[0] - needed) // 2
            rel = rel[start:start + needed]
        coords = (
            jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
            - jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
            + (k_size - 1) * max(q_size / k_size, 1.0)
        )
        return rel[coords.astype(jnp.int32)]  # (q, k, dim)

    rh = get(rel_h, qh, kh)
    rw = get(rel_w, qw, kw)
    b, _, dim = q.shape
    rq = q.reshape(b, qh, qw, dim)
    bias_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh).reshape(b, qh * qw, kh)
    bias_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw).reshape(b, qh * qw, kw)
    return bias_h, bias_w


class ViTAttention(nn.Module):
    """SAM ViT attention: fused qkv, per-head rel-pos bias."""

    num_heads: int
    use_rel_pos: bool = True
    input_hw: Tuple[int, int] = (14, 14)
    # native grid the rel-pos tables are sized for (checkpoint shape); the
    # runtime grid may be SMALLER on an axis (rect-encode mode) — the factors
    # then take the central table slice. None -> size by the runtime grid.
    table_hw: Tuple[int, int] = None
    softmax_f32: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        th, tw = self.table_hw if self.table_hw is not None else (h, w)
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = (
            qkv[:, :, 0].transpose(0, 2, 1, 3).reshape(b * self.num_heads, h * w, head_dim),
            qkv[:, :, 1].transpose(0, 2, 1, 3).reshape(b * self.num_heads, h * w, head_dim),
            qkv[:, :, 2].transpose(0, 2, 1, 3).reshape(b * self.num_heads, h * w, head_dim),
        )
        if not self.use_rel_pos and h * w >= 512:
            from beyondff_tpu.kernels import dispatch

            if dispatch.on_tpu():
                from beyondff_tpu.kernels import flash_attention as fa

                out = fa.attend(q, k, v)
                out = out.reshape(b, self.num_heads, h * w, head_dim)
                out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
                return nn.Dense(c, dtype=self.dtype, name="proj")(out)
        if self.use_rel_pos and h * w >= 512 and os.environ.get("BFF_SAM_RELPOS_FLASH"):
            # EXPERIMENTAL, measured SLOWER than XLA on v5e (see
            # kernels/flash_attention.py attend_relpos): global 4096-token
            # attention is VPU-softmax-bound, not HBM-bound, so eliminating
            # the (S, S) score traffic doesn't help and the bias-expansion
            # selector matmul adds MXU work. Kept behind an env flag for
            # re-evaluation on parts with a different VPU:MXU ratio.
            from beyondff_tpu.kernels import dispatch
            from beyondff_tpu.kernels.flash_attention import relpos_shapes_ok

            if dispatch.on_tpu() and relpos_shapes_ok(h, w):
                from beyondff_tpu.kernels import flash_attention as fa

                rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                                   (2 * th - 1, head_dim))
                rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                                   (2 * tw - 1, head_dim))
                bias_h, bias_w = _rel_pos_factors(
                    (h, w), (h, w), rel_h.astype(self.dtype),
                    rel_w.astype(self.dtype), q)
                out = fa.attend_relpos(q, k, v, bias_h, bias_w, w)
                out = out.reshape(b, self.num_heads, h * w, head_dim)
                out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
                return nn.Dense(c, dtype=self.dtype, name="proj")(out)
        logits = (q * head_dim ** -0.5) @ k.transpose(0, 2, 1)
        # BFF_SAM_ABLATE: timing-attribution knob (tools/profile_sam.py) —
        # never set in production
        ablate = os.environ.get("BFF_SAM_ABLATE", "")
        if self.use_rel_pos and "norelpos" not in ablate:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * th - 1, head_dim))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * tw - 1, head_dim))
            logits = logits + _rel_pos_bias((h, w), (h, w), rel_h.astype(self.dtype),
                                            rel_w.astype(self.dtype), q)
        if self.softmax_f32:
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        else:
            # bf16 softmax halves the HBM traffic of the (L, L) score maps;
            # inference-quality accurate for SAM's short windows
            attn = jax.nn.softmax(logits, axis=-1)
        out = (attn @ v).reshape(b, self.num_heads, h * w, head_dim)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    num_heads: int
    window_size: int  # 0 -> global attention
    use_rel_pos: bool = True
    # native full grid for global blocks' rel-pos tables (checkpoint shape)
    full_hw: Tuple[int, int] = None
    softmax_f32: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        ablate = os.environ.get("BFF_SAM_ABLATE", "")  # profiling only
        h0, w0 = x.shape[1], x.shape[2]
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        if self.window_size > 0:
            x, padded = window_partition(x, self.window_size)
            hw = (self.window_size, self.window_size)
            table = hw
        else:
            hw = (h0, w0)
            table = self.full_hw
        if not ("noattn" in ablate and self.window_size > 0):
            x = ViTAttention(self.num_heads, use_rel_pos=self.use_rel_pos,
                             input_hw=hw, table_hw=table,
                             softmax_f32=self.softmax_f32,
                             dtype=self.dtype, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, padded, (h0, w0))
        x = shortcut + x
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        if "nomlp" in ablate:
            return x
        return x + MLP(x.shape[-1] * 4, activation=_gelu_exact, dtype=self.dtype,
                       name="mlp")(h)


class ImageEncoder(nn.Module):
    cfg: SAMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) normalized; H, W multiples of patch
        c = self.cfg
        x = nn.Conv(c.encoder_dim, (c.patch_size, c.patch_size), (c.patch_size, c.patch_size),
                    padding="VALID", dtype=self.dtype, name="patch_embed")(x)
        g = c.img_size // c.patch_size
        pos = self.param("pos_embed", nn.initializers.zeros, (1, g, g, c.encoder_dim))
        # rect-encode mode feeds a sub-grid (e.g. 48x64 of the 64x64 square):
        # the top-left pos-embed block is exactly the square path's embedding
        # for those patches
        x = x + pos[:, : x.shape[1], : x.shape[2]].astype(self.dtype)
        for i in range(c.encoder_depth):
            win = 0 if i in c.global_attn_indexes else c.window_size
            x = ViTBlock(c.encoder_heads, win, use_rel_pos=c.use_rel_pos,
                         full_hw=(g, g), softmax_f32=c.softmax_f32,
                         dtype=self.dtype, name=f"block{i}")(x)
        # neck: 1x1 conv -> LN -> 3x3 conv -> LN, to prompt_dim channels
        x = nn.Conv(c.prompt_dim, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(c.prompt_dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="neck_conv2")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="neck_ln2")(x)
        return x  # (B, g, g, 256)


# ----------------------------------------------------------- prompt encoder
class PromptEncoder(nn.Module):
    cfg: SAMConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.cfg.prompt_dim
        self.pe_gaussian = self.param("pe_gaussian", nn.initializers.normal(1.0), (2, d // 2))
        # 0: neg point, 1: pos point, 2: box top-left, 3: box bottom-right
        self.point_embeddings = self.param("point_embeddings", nn.initializers.normal(1.0), (4, d))
        self.not_a_point = self.param("not_a_point", nn.initializers.normal(1.0), (d,))
        self.no_mask = self.param("no_mask", nn.initializers.normal(1.0), (d,))

    def _pe(self, coords):  # coords in [0,1]
        proj = (2.0 * coords - 1.0) @ self.pe_gaussian.astype(self.dtype)
        proj = 2 * jnp.pi * proj
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def encode_boxes(self, boxes):  # (B, 4) xyxy in pixels of the padded square
        s = self.cfg.img_size
        corners = boxes.reshape(-1, 2, 2) + 0.5
        emb = self._pe(corners / s)
        emb = emb.at[:, 0].add(self.point_embeddings[2].astype(self.dtype))
        emb = emb.at[:, 1].add(self.point_embeddings[3].astype(self.dtype))
        return emb  # (B, 2, d)

    def dense_pe(self, gh: int = None, gw: int = None):
        """Positional grid for a (gh, gw) embedding — coordinates stay
        normalized by the FULL square grid, so a rect sub-grid (rect-encode
        mode) gets exactly the square path's positions for those cells."""
        g = self.cfg.img_size // self.cfg.patch_size
        gh = g if gh is None else gh
        gw = g if gw is None else gw
        ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5) / g
        xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5) / g
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (gh, gw, 2)
        return self._pe(grid)  # (gh, gw, d)

    def no_mask_embedding(self):
        return self.no_mask


# ------------------------------------------------------------- mask decoder
class DecoderAttention(nn.Module):
    num_heads: int
    downsample: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        dim = q.shape[-1]
        inner = dim // self.downsample
        head_dim = inner // self.num_heads
        qp = nn.Dense(inner, dtype=self.dtype, name="q")(q)
        kp = nn.Dense(inner, dtype=self.dtype, name="k")(k)
        vp = nn.Dense(inner, dtype=self.dtype, name="v")(v)

        def split(t):
            return t.reshape(*t.shape[:-1], self.num_heads, head_dim).swapaxes(-3, -2)

        qh, kh, vh = split(qp), split(kp), split(vp)
        logits = (qh * head_dim ** -0.5) @ kh.swapaxes(-1, -2)
        attn = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        out = (attn @ vh).swapaxes(-3, -2)
        out = out.reshape(*out.shape[:-2], inner)
        return nn.Dense(dim, dtype=self.dtype, name="proj")(out)


class TwoWayBlock(nn.Module):
    num_heads: int
    mlp_dim: int
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            # the official block REPLACES queries here (no residual add) —
            # segment_anything TwoWayAttentionBlock / HF SamTwoWayAttentionBlock
            queries = DecoderAttention(self.num_heads, dtype=self.dtype, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(self.num_heads, dtype=self.dtype, name="self_attn")(
                q, q, queries)
        queries = nn.LayerNorm(dtype=self.dtype, name="ln1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(self.num_heads, 2, dtype=self.dtype,
                                             name="cross_t2i")(q, k, keys)
        queries = nn.LayerNorm(dtype=self.dtype, name="ln2")(queries)

        queries = queries + MLP(self.mlp_dim, activation=nn.relu, dtype=self.dtype, name="mlp")(queries)
        queries = nn.LayerNorm(dtype=self.dtype, name="ln3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(self.num_heads, 2, dtype=self.dtype,
                                       name="cross_i2t")(k, q, queries)
        keys = nn.LayerNorm(dtype=self.dtype, name="ln4")(keys)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: SAMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_emb, image_pe, sparse_prompt):
        """image_emb: (g, g, d); sparse_prompt: (B, P, d). Returns (masks, iou).

        masks: (B, num_masks, 4g, 4g) logits; iou: (B, num_masks).
        """
        c = self.cfg
        d = c.prompt_dim
        n_masks = c.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, d))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (n_masks, d))

        b = sparse_prompt.shape[0]
        tokens = jnp.concatenate(
            [jnp.broadcast_to(jnp.concatenate([iou_token, mask_tokens], 0).astype(self.dtype),
                              (b, 1 + n_masks, d)), sparse_prompt], axis=1)

        gh, gw = image_emb.shape[0], image_emb.shape[1]
        src = jnp.broadcast_to(image_emb.reshape(1, gh * gw, d), (b, gh * gw, d))
        pos = jnp.broadcast_to(image_pe.reshape(1, gh * gw, d), (b, gh * gw, d))

        q, k = tokens, src
        for i in range(c.decoder_depth):
            q, k = TwoWayBlock(c.decoder_heads, c.decoder_mlp_dim, skip_first_layer_pe=(i == 0),
                               dtype=self.dtype, name=f"block{i}")(q, k, tokens, pos)
        # final token-to-image attention + norm (SAM TwoWayTransformer tail)
        attn_out = DecoderAttention(c.decoder_heads, 2, dtype=self.dtype, name="final_t2i")(
            q + tokens, k + pos, k)
        q = nn.LayerNorm(dtype=self.dtype, name="ln_final")(q + attn_out)

        iou_out = q[:, 0]
        mask_out = q[:, 1 : 1 + n_masks]

        # upscale image features 4x with two transposed convs
        img = k.reshape(b, gh, gw, d)
        img = nn.ConvTranspose(d // 4, (2, 2), (2, 2), transpose_kernel=True, dtype=self.dtype, name="up1")(img)
        img = nn.LayerNorm(dtype=self.dtype, name="up_ln")(img)
        img = _gelu_exact(img)
        img = nn.ConvTranspose(d // 8, (2, 2), (2, 2), transpose_kernel=True, dtype=self.dtype, name="up2")(img)
        img = _gelu_exact(img)  # (B, 4g, 4g, d/8)

        hyper = []
        for m in range(n_masks):
            h = mask_out[:, m]
            for li, (dim_out) in enumerate([d, d, d // 8]):
                h = nn.Dense(dim_out, dtype=self.dtype, name=f"hyper{m}_fc{li}")(h)
                if li < 2:
                    h = nn.relu(h)
            hyper.append(h)
        hyper = jnp.stack(hyper, axis=1)  # (B, n_masks, d/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, img)

        h = iou_out
        for li, dim_out in enumerate([d, d, n_masks]):
            h = nn.Dense(dim_out, dtype=self.dtype, name=f"iou_fc{li}")(h)
            if li < 2:
                h = nn.relu(h)
        return masks, h


class SAMModule(nn.Module):
    cfg: SAMConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ImageEncoder(self.cfg, dtype=self.dtype)
        self.prompt = PromptEncoder(self.cfg, dtype=self.dtype)
        self.decoder = MaskDecoder(self.cfg, dtype=self.dtype)

    def encode(self, images):
        return self.encoder(images)

    def decode_boxes(self, image_emb, boxes):
        """image_emb: (g, g, d); boxes: (B, 4). Single-mask output (the
        reference's multimask_output=False path, segmentation_2d.py:183-188)."""
        sparse = self.prompt.encode_boxes(boxes)
        dense_pe = self.prompt.dense_pe(image_emb.shape[0], image_emb.shape[1])
        no_mask = self.prompt.no_mask_embedding().astype(self.dtype)
        image_emb = image_emb + no_mask[None, None, :]
        masks, iou = self.decoder(image_emb, dense_pe, sparse)
        return masks[:, 0], iou[:, 0]  # (B, 4g, 4g), (B,)


class SAM:
    """Inference wrapper: batched frame encode + batched box-prompted decode."""

    def __init__(self, cfg: SAMConfig, params, dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.module = SAMModule(cfg, dtype=dtype)
        self._encode = jax.jit(lambda p, x: self.module.apply(p, x, method=SAMModule.encode))
        mean = jnp.asarray(PIXEL_MEAN)
        std = jnp.asarray(PIXEL_STD)

        def encode_u8(p, x_u8, nh, nw):
            # uint8 upload, normalize on device; the region beyond the resized
            # image must be exactly 0 after normalization (SAM pads after
            # normalizing), so mask it explicitly
            x = (x_u8.astype(jnp.float32) - mean) / std
            s_img = x.shape[1]
            rows = jnp.arange(s_img) < nh
            cols = jnp.arange(s_img) < nw
            x = x * (rows[:, None] & cols[None, :])[None, :, :, None]
            return self.module.apply(p, x, method=SAMModule.encode)

        self._encode_u8 = jax.jit(encode_u8, static_argnums=(2, 3))

        def encode_frames_u8(p, fr):
            # single-upload path: unpadded uint8 frames pad + normalize on
            # device; the padded region must be exactly 0 after normalization.
            # BFF_SAM_RECT=1: pad only to the patch multiple instead of the
            # full square — for ScanNet frames (1024x765 scaled) that encodes
            # 48x64 patches instead of 64x64 (-25% encoder compute). The
            # dropped rows are pure zero-pad content; deviation = their
            # absence from global-attention softmax + boundary windows
            # (measured in tools/measure_sam_rect.py, PARITY.md).
            b, nh, nw, _ = fr.shape
            s_img = self.cfg.img_size
            patch = self.cfg.patch_size
            if os.environ.get("BFF_SAM_RECT") == "1":
                ph = min(-(-nh // patch) * patch, s_img)
                pw = min(-(-nw // patch) * patch, s_img)
            else:
                ph = pw = s_img
            x = jnp.pad(fr, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)))
            x = (x.astype(jnp.float32) - mean) / std
            rows = jnp.arange(ph) < nh
            cols = jnp.arange(pw) < nw
            x = x * (rows[:, None] & cols[None, :])[None, :, :, None]
            n_dev = len(jax.devices())
            if b > 1 and not (n_dev > 1 and b % n_dev == 0):
                # frame batches run as lax.map of the batch-1 encoder in one
                # dispatch: XLA's batched-encoder fusion degrades past
                # batch 1 (measured 104.6 -> 70.6 ms/frame at batch 4, v5e)
                return jax.lax.map(
                    lambda xi: self.module.apply(p, xi[None],
                                                 method=SAMModule.encode)[0], x)
            return self.module.apply(p, x, method=SAMModule.encode)

        self._encode_frames = jax.jit(encode_frames_u8)
        self._decode = jax.jit(lambda p, e, b: self.module.apply(p, e, b, method=SAMModule.decode_boxes))
        self._packed_cache = {}

    @classmethod
    def create(cls, name_or_cfg="vit_h", seed: int = 0, dtype=jnp.float32,
               device_fill: bool = False) -> "SAM":
        from beyondff_tpu.models.init_utils import fast_init

        cfg = PRESETS[name_or_cfg] if isinstance(name_or_cfg, str) else name_or_cfg
        module = SAMModule(cfg, dtype=dtype)
        s = cfg.img_size
        g = s // cfg.patch_size
        params = fast_init(module, jnp.zeros((1, s, s, 3)), seed=seed, method=SAMModule.encode,
                           device_fill=device_fill)
        dec = fast_init(module, jnp.zeros((g, g, cfg.prompt_dim)), jnp.zeros((1, 4)),
                        seed=seed + 1, method=SAMModule.decode_boxes, device_fill=device_fill)
        params = {"params": {**dec["params"], **params["params"]}}
        return cls(cfg, params, dtype=dtype)

    # ------------------------------------------------------------ inference
    def preprocess(self, images: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
        """uint8 RGB (B, H, W, 3) -> long-side-1024 zero-padded uint8
        (normalization + pad masking run on device in encode_image)."""
        import cv2

        s = self.cfg.img_size
        b, h, w = images.shape[:3]
        scale = s / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        out = np.zeros((b, s, s, 3), np.uint8)
        for i in range(b):
            out[i, :nh, :nw] = cv2.resize(images[i], (nw, nh),
                                          interpolation=cv2.INTER_LINEAR)
        return out, (nh, nw)

    def scale_frame(self, image: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
        """uint8 RGB (H, W, 3) -> long-side-scaled UNPADDED uint8 (nh, nw, 3)
        for the single-upload path (padding happens on device in
        :meth:`encode_frames`). Same cv2 resize as :meth:`preprocess`."""
        import cv2

        s = self.cfg.img_size
        h, w = image.shape[:2]
        scale = s / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        return cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR), (nh, nw)

    def encode_frames(self, frames_dev) -> jnp.ndarray:
        """(B, nh, nw, 3) uint8 device frames (from :meth:`scale_frame`,
        already uploaded) -> (B, g, g, d) embeddings; pad + normalize on
        device. Numerically identical to preprocess + encode_image."""
        return self._encode_frames(self.params, frames_dev)

    def transform_boxes(self, boxes_xyxy: np.ndarray, orig_hw: Tuple[int, int]) -> np.ndarray:
        """Boxes in original pixels -> padded-square pixels."""
        h, w = orig_hw
        scale = self.cfg.img_size / max(h, w)
        return np.asarray(boxes_xyxy, np.float32) * scale

    def encode_image(self, images, input_hw: Tuple[int, int] = None) -> jnp.ndarray:
        """(B, S, S, 3) -> (B, g, g, d). uint8 inputs (from preprocess) carry
        ``input_hw`` and normalize on device; float inputs are pre-normalized."""
        x = jnp.asarray(images)
        devices = jax.devices()
        if len(devices) > 1 and x.shape[0] % len(devices) == 0:
            # data-parallel encode: shard the frame batch over all devices
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            mesh = Mesh(np.asarray(devices), ("data",))
            x = jax.device_put(x, NamedSharding(mesh, PartitionSpec("data")))
        if x.dtype == jnp.uint8:
            nh, nw = input_hw if input_hw is not None else (x.shape[1], x.shape[2])
            return self._encode_u8(self.params, x, int(nh), int(nw))
        return self._encode(self.params, x)

    def decode_boxes(self, embedding, boxes) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """embedding (g, g, d); boxes (B, 4) in padded-square pixels.
        Returns (low-res mask logits (B, 4g, 4g), iou predictions (B,))."""
        return self._decode(self.params, embedding, jnp.asarray(boxes, jnp.float32))

    def _box_decode_method(self):
        """Module method used by the packed batch decode; EfficientSAM
        overrides this with its best-of-multimask selection (reference picks
        the highest-predicted-IoU of 3 masks per box,
        segmentation_2d_yolo_world.py:243-286)."""
        return SAMModule.decode_boxes

    def decode_boxes_packed(self, embs, boxes, input_hw: Tuple[int, int],
                            orig_hw: Tuple[int, int]):
        """Batched decode for a whole frame batch, postprocessed and
        bit-packed on device: one dispatch instead of a per-frame decode loop,
        and ~8x smaller host downloads than dense booleans (the dense
        (M, H, W) transfer is ~1.25 MB/mask at ScanNet resolution — the
        dominant host<->device cost of the 2D stage on a tunneled chip).

        embs: (B, g, g, d) device array; boxes: (B, K, 4) padded-square pixels
        (zero rows are padding). Returns (packed uint8 (B, K, ceil(H*W/8)),
        iou (B, K)); unpack with np.unpackbits(..., bitorder="little").
        """
        b, k = embs.shape[0], boxes.shape[1]
        key = (b, k, embs.shape[1], embs.shape[2], tuple(input_hw), tuple(orig_hw))
        fn = self._packed_cache.get(key)
        if fn is None:
            # upsample target follows the embedding grid (rect-encode mode
            # yields a (gh, gw) sub-grid of the square; gh*patch rows cover
            # input_hw exactly like the square path's s rows do)
            sh = embs.shape[1] * self.cfg.patch_size
            sw = embs.shape[2] * self.cfg.patch_size
            hh, ww = orig_hw
            n = hh * ww
            n8 = -(-n // 8) * 8

            decode_method = self._box_decode_method()

            def packed_fn(p, e, bx):
                def one(e1, b1):
                    return self.module.apply(p, e1, b1, method=decode_method)

                low, iou = jax.vmap(one)(e, bx)  # (B, K, 4gh, 4gw)
                x = jax.image.resize(low, (b, k, sh, sw), "bilinear")
                x = x[:, :, : input_hw[0], : input_hw[1]]
                x = jax.image.resize(x, (b, k, hh, ww), "bilinear")
                flat = (x > 0).reshape(b, k, n)
                if n8 != n:
                    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, n8 - n)))
                bits = flat.reshape(b, k, n8 // 8, 8)
                w8 = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
                return (jnp.sum(bits.astype(jnp.int32) * w8, -1).astype(jnp.uint8),
                        iou)

            fn = jax.jit(packed_fn)
            self._packed_cache[key] = fn
        return fn(self.params, embs, jnp.asarray(boxes, jnp.float32))

    def postprocess_masks(self, low_res_logits, input_hw: Tuple[int, int],
                          orig_hw: Tuple[int, int]) -> np.ndarray:
        """Low-res logits -> boolean masks at the original resolution
        (threshold 0.0, like the reference's [0,1] masks)."""
        s = self.cfg.img_size
        x = jax.image.resize(low_res_logits, (low_res_logits.shape[0], s, s), "bilinear")
        x = x[:, : input_hw[0], : input_hw[1]]
        x = jax.image.resize(x, (x.shape[0], orig_hw[0], orig_hw[1]), "bilinear")
        return np.asarray(x > 0.0)


# --------------------------------------------------------------- conversion
def convert_torch_checkpoint(path: str, cfg: SAMConfig, _sd=None, strict: bool = True) -> dict:
    """Official SAM checkpoint (sam_vit_{b,l,h}_*.pth) -> flax params.

    Every checkpoint key must be consumed; leftovers raise (``strict=False``
    skips the check for callers that remap parts themselves, e.g. the
    EfficientSAM converter sharing this decoder/prompt mapping)."""
    from beyondff_tpu.models.convert_util import RecordingDict, assert_all_consumed

    if _sd is not None:
        t = _sd
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "items"):
            sd = sd["model"]  # EfficientSAM-style wrapping
        t = RecordingDict({k: v.float().numpy() for k, v in sd.items()})

    def dense(prefix):
        return {"kernel": t[f"{prefix}.weight"].T, "bias": t[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": t[f"{prefix}.weight"], "bias": t[f"{prefix}.bias"]}

    enc = {
        "patch_embed": {
            "kernel": t["image_encoder.patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": t["image_encoder.patch_embed.proj.bias"],
        },
        "pos_embed": t["image_encoder.pos_embed"],
        "neck_conv1": {"kernel": t["image_encoder.neck.0.weight"].transpose(2, 3, 1, 0)},
        "neck_ln1": ln("image_encoder.neck.1"),
        "neck_conv2": {"kernel": t["image_encoder.neck.2.weight"].transpose(2, 3, 1, 0)},
        "neck_ln2": ln("image_encoder.neck.3"),
    }
    for i in range(cfg.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        attn = {"qkv": dense(f"{p}.attn.qkv"), "proj": dense(f"{p}.attn.proj")}
        if cfg.use_rel_pos:
            attn["rel_pos_h"] = t[f"{p}.attn.rel_pos_h"]
            attn["rel_pos_w"] = t[f"{p}.attn.rel_pos_w"]
        enc[f"block{i}"] = {
            "ln1": ln(f"{p}.norm1"),
            "ln2": ln(f"{p}.norm2"),
            "attn": attn,
            "mlp": {"fc1": dense(f"{p}.mlp.lin1"), "fc2": dense(f"{p}.mlp.lin2")},
        }

    prompt = {
        "pe_gaussian": t["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"],
        "point_embeddings": np.stack(
            [t[f"prompt_encoder.point_embeddings.{i}.weight"][0] for i in range(4)]
        ),
        "not_a_point": t["prompt_encoder.not_a_point_embed.weight"][0],
        "no_mask": t["prompt_encoder.no_mask_embed.weight"][0],
    }

    def attn_block(p):
        return {
            "q": dense(f"{p}.q_proj"),
            "k": dense(f"{p}.k_proj"),
            "v": dense(f"{p}.v_proj"),
            "proj": dense(f"{p}.out_proj"),
        }

    dec = {
        "iou_token": t["mask_decoder.iou_token.weight"],
        "mask_tokens": t["mask_decoder.mask_tokens.weight"],
        "up1": {
            "kernel": t["mask_decoder.output_upscaling.0.weight"].transpose(2, 3, 1, 0),
            "bias": t["mask_decoder.output_upscaling.0.bias"],
        },
        "up_ln": ln("mask_decoder.output_upscaling.1"),
        "up2": {
            "kernel": t["mask_decoder.output_upscaling.3.weight"].transpose(2, 3, 1, 0),
            "bias": t["mask_decoder.output_upscaling.3.bias"],
        },
        "ln_final": ln("mask_decoder.transformer.norm_final_attn"),
        "final_t2i": attn_block("mask_decoder.transformer.final_attn_token_to_image"),
    }
    for i in range(cfg.decoder_depth):
        p = f"mask_decoder.transformer.layers.{i}"
        dec[f"block{i}"] = {
            "self_attn": attn_block(f"{p}.self_attn"),
            "ln1": ln(f"{p}.norm1"),
            "cross_t2i": attn_block(f"{p}.cross_attn_token_to_image"),
            "ln2": ln(f"{p}.norm2"),
            "mlp": {"fc1": dense(f"{p}.mlp.lin1"), "fc2": dense(f"{p}.mlp.lin2")},
            "ln3": ln(f"{p}.norm3"),
            "cross_i2t": attn_block(f"{p}.cross_attn_image_to_token"),
            "ln4": ln(f"{p}.norm4"),
        }
    for m in range(cfg.num_multimask_outputs + 1):
        for li in range(3):
            dec[f"hyper{m}_fc{li}"] = dense(f"mask_decoder.output_hypernetworks_mlps.{m}.layers.{li}")
    for li in range(3):
        dec[f"iou_fc{li}"] = dense(f"mask_decoder.iou_prediction_head.layers.{li}")

    params = {"params": {"encoder": enc, "prompt": prompt, "decoder": dec}}
    if strict:
        # mask_downscaling embeds MASK prompts — the pipeline is box-prompted
        # only (reference predict_torch(boxes=...), segmentation_2d.py:183-188)
        assert_all_consumed(
            t, ignore=(r"^prompt_encoder\.mask_downscaling\.",
                       r"num_batches_tracked$"),
            context="SAM checkpoint")
    return jax.tree_util.tree_map(jnp.asarray, params)
