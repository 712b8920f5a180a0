"""CLIP (ViT image tower + causal text tower) in flax.

Replaces the pip ``clip`` package the reference uses for box filtering,
descriptor encoding and label similarity (reference: tools/segmentation_2d.py
:102-106,324-402, tools/refinement.py:93-115,147). Both towers are plain
jit-compiled flax modules; ``convert_torch_checkpoint`` maps the public OpenAI
state dict onto the param tree. Encoders are batched: the reference encodes
one box crop / one text at a time, here crops and prompt variants go through
in single batches.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from beyondff_tpu.models.layers import Attention, MLP, PatchEmbed, quick_gelu

# image preprocessing constants (reference: segmentation_2d.py:315-322)
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 768
    image_resolution: int = 224
    vision_layers: int = 24
    vision_width: int = 1024
    vision_heads: int = 16
    vision_patch: int = 14
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 768
    text_heads: int = 12
    text_layers: int = 12


PRESETS = {
    "ViT-L/14": CLIPConfig(),
    "ViT-B/32": CLIPConfig(embed_dim=512, vision_layers=12, vision_width=768,
                           vision_heads=12, vision_patch=32, text_width=512, text_heads=8),
    "ViT-B/16": CLIPConfig(embed_dim=512, vision_layers=12, vision_width=768,
                           vision_heads=12, vision_patch=16, text_width=512, text_heads=8),
    # tiny config for tests
    "test": CLIPConfig(embed_dim=32, image_resolution=28, vision_layers=2, vision_width=32,
                       vision_heads=2, vision_patch=14, context_length=16, vocab_size=512,
                       text_width=32, text_heads=2, text_layers=2),
}


class ResidualBlock(nn.Module):
    """CLIP transformer block: pre-LN, QuickGELU MLP."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = x + Attention(self.num_heads, dtype=self.dtype, name="attn")(h, mask=mask)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        x = x + MLP(x.shape[-1] * 4, activation=quick_gelu, dtype=self.dtype, name="mlp")(h)
        return x


class VisionTower(nn.Module):
    cfg: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) normalized
        c = self.cfg
        x = PatchEmbed(c.vision_patch, c.vision_width, use_bias=False, dtype=self.dtype,
                       name="patch_embed")(images)
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (d,))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, d)), x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (gh * gw + 1, d))
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_pre")(x)
        for i in range(c.vision_layers):
            x = ResidualBlock(c.vision_heads, dtype=self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02), (d, c.embed_dim))
        return x @ proj.astype(self.dtype)


class TextTower(nn.Module):
    cfg: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):  # (B, L) int32
        c = self.cfg
        emb = nn.Embed(c.vocab_size, c.text_width, dtype=self.dtype, name="token_embedding")
        x = emb(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (c.context_length, c.text_width))
        x = x + pos[: x.shape[1]].astype(self.dtype)
        L = x.shape[1]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        for i in range(c.text_layers):
            x = ResidualBlock(c.text_heads, dtype=self.dtype, name=f"block{i}")(x, mask=causal)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)
        # pool at the EOT token (highest id in each row, like the reference clip)
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (c.text_width, c.embed_dim))
        return x @ proj.astype(self.dtype)


class CLIPModule(nn.Module):
    cfg: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual = VisionTower(self.cfg, dtype=self.dtype)
        self.text = TextTower(self.cfg, dtype=self.dtype)
        self.logit_scale = self.param("logit_scale", nn.initializers.constant(np.log(1 / 0.07)), ())

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T


class CLIP:
    """Inference wrapper: preprocessing + jitted encoders."""

    def __init__(self, cfg: CLIPConfig, params, dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.module = CLIPModule(cfg, dtype=dtype)
        self._encode_image = jax.jit(
            lambda p, x: self.module.apply(p, x, method=CLIPModule.encode_image)
        )
        mean = jnp.asarray(IMAGE_MEAN)
        std = jnp.asarray(IMAGE_STD)
        # uint8 crops normalize on device (4x less upload traffic)
        self._encode_image_u8 = jax.jit(
            lambda p, x: self.module.apply(
                p, (x.astype(jnp.float32) / 255.0 - mean) / std,
                method=CLIPModule.encode_image)
        )
        self._encode_text = jax.jit(
            lambda p, t: self.module.apply(p, t, method=CLIPModule.encode_text)
        )

        def encode_u8_mapped(p, x):
            # crop batches as lax.map of the batch-1 tower in one dispatch.
            # MEASURED: unlike the SAM/GDINO encoders (whose XLA fusion
            # degrades past batch 1 on v5e), the CLIP tower batches WELL —
            # true batch 6.26/10.93/20.11 ms vs mapped 10.19/15.74/26.77 at
            # b=4/8/16 (tools/bench_clip_ab.py) — so BFF_CLIP_MAP stays an
            # off-by-default A/B knob, not a production path
            def one(fr):
                return self.module.apply(
                    p, (fr[None].astype(jnp.float32) / 255.0 - mean) / std,
                    method=CLIPModule.encode_image)[0]

            return jax.lax.map(one, x)

        self._encode_image_u8_mapped = jax.jit(encode_u8_mapped)

        # YCrCb 4:2:0 crop transport (fast-variant hit regime is link-bound,
        # ARCHITECTURE.md round-4 trace): crops cross the link packed at
        # 1.5 B/px and unpack to the IDENTICAL uint8 RGB batch on device
        # before the same normalize+encode — one jit program, one transfer.
        def encode_u8_yuv(p, packed):
            from beyondff_tpu.core import color as _color

            n = self.cfg.image_resolution
            imgs = jax.vmap(lambda b: _color._unpack_core(b, n, n))(packed)
            return self.module.apply(
                p, (imgs.astype(jnp.float32) / 255.0 - mean) / std,
                method=CLIPModule.encode_image)

        self._encode_image_u8_yuv = jax.jit(encode_u8_yuv)
        # device-crop programs (encode_image_boxes), keyed on
        # (mode, K bucket, source shape, frame_hw, det_hw)
        self._crop_progs = {}
        self._row_take = jax.jit(lambda x, i: x[i])

    @classmethod
    def create(cls, name_or_cfg="ViT-L/14", seed: int = 0, dtype=jnp.float32,
               device_fill: bool = False) -> "CLIP":
        from beyondff_tpu.models.init_utils import fast_init

        cfg = PRESETS[name_or_cfg] if isinstance(name_or_cfg, str) else name_or_cfg
        module = CLIPModule(cfg, dtype=dtype)
        dummy_img = jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3))
        dummy_tok = jnp.zeros((1, cfg.context_length), jnp.int32)
        params = fast_init(module, dummy_img, dummy_tok, seed=seed, device_fill=device_fill)
        return cls(cfg, params, dtype=dtype)

    def encode_image(self, images) -> jnp.ndarray:
        """(B, H, W, 3) images -> (B, embed_dim). uint8 inputs normalize on
        device; float inputs are assumed pre-normalized."""
        import os

        x = jnp.asarray(images)
        if x.dtype == jnp.uint8:
            if x.shape[0] > 1 and os.environ.get("BFF_CLIP_MAP") == "1":
                return self._encode_image_u8_mapped(self.params, x)
            return self._encode_image_u8(self.params, x)
        return self._encode_image(self.params, x)

    def encode_image_packed_yuv(self, packed) -> jnp.ndarray:
        """(B, 1.5*n*n) uint8 YCrCb 4:2:0 buffers (core.color.pack_ycrcb420 of
        n x n uint8 RGB crops) -> (B, embed_dim). Bit-identical to
        ``encode_image(roundtrip)`` of the same crops at half the upload
        bytes; used by the seg2d crop filter in YOLO-World mode (the raw
        uint8 crop source, segmentation_2d_yolo_world.py:505-515 — GDINO-mode
        crops are normalize-wrapped sawtooths where chroma subsampling would
        not be near-lossless, so they stay dense)."""
        return self._encode_image_u8_yuv(self.params, jnp.asarray(packed, jnp.uint8))

    def encode_image_boxes(self, frames_dev, frame_idx, boxes, mode: str,
                           frame_hw, det_hw=None, det_mean=None,
                           det_std=None):
        """Device-crop CLIP scoring: cut + resize each box crop ON DEVICE
        from already-uploaded frame buffers (core/crop_resize.py) and encode
        — only box coordinates cross the link, instead of finished pixel
        crops (the fast variant's hit regime and the fused sweep's replay
        phase are link-bound, ARCHITECTURE.md).

        frames_dev: (B, H, W, 3) uint8 device frames; frame_idx: (K,) row of
        each crop's frame; boxes: (K, 4) f32 xyxy in ``frame_hw`` coords.
        ``mode`` is 'yolo' (wrap quirk on the raw buffer) or 'gdino' (device
        resize to ``det_hw`` + ImageNet LUT-wrap arithmetic with
        ``det_mean``/``det_std``). Returns (feats_dev, n) like the upload
        path (_clip_sims_dispatch); crop count bucketed to the next power of
        two for program reuse, pad rows encode zero crops.
        """
        from beyondff_tpu.core import crop_resize as _cr

        n = len(boxes)
        k = 1
        while k < n:
            k *= 2
        boxes_p = np.zeros((k, 4), np.float32)
        boxes_p[:n] = np.asarray(boxes, np.float32)
        idx_p = np.zeros((k,), np.int32)
        idx_p[:n] = np.asarray(frame_idx, np.int32)
        valid = np.zeros((k,), bool)
        valid[:n] = True
        src = self._row_take(frames_dev, idx_p)  # (K, H, W, 3) on device
        h, w = int(src.shape[1]), int(src.shape[2])
        key = (mode, k, h, w, tuple(frame_hw),
               tuple(det_hw) if det_hw is not None else None)
        prog = self._crop_progs.get(key)
        if prog is None:
            res = self.cfg.image_resolution
            mean = jnp.asarray(IMAGE_MEAN)
            std = jnp.asarray(IMAGE_STD)
            dmean = (np.asarray(det_mean, np.float32)
                     if det_mean is not None else None)
            dstd = (np.asarray(det_std, np.float32)
                    if det_std is not None else None)

            def run(p, s, b, v):
                crops = _cr.clip_crop_batch(
                    s, b, v, mode, tuple(frame_hw),
                    det_hw=tuple(det_hw) if det_hw is not None else None,
                    mean=dmean, std=dstd, n=res)
                x = (crops / 255.0 - mean) / std
                return self.module.apply(p, x, method=CLIPModule.encode_image)

            prog = jax.jit(run)
            self._crop_progs[key] = prog
        feats = prog(self.params, src, boxes_p, valid)
        try:
            feats.copy_to_host_async()
        except AttributeError:
            pass
        return feats, n

    def encode_text(self, tokens) -> jnp.ndarray:
        return self._encode_text(self.params, jnp.asarray(tokens, jnp.int32))

    # ------------------------------------------------------- preprocessing
    def preprocess(self, images: np.ndarray) -> np.ndarray:
        """uint8 RGB (B, H, W, 3) -> resized center crops, uint8 (normalization
        runs on device inside encode_image).

        Geometry matches the reference transform: bicubic resize of the short
        side to 224, center crop (segmentation_2d.py:315-322).
        """
        import cv2

        n = self.cfg.image_resolution
        out = np.empty((len(images), n, n, 3), np.uint8)
        for i, img in enumerate(images):
            h, w = img.shape[:2]
            scale = n / min(h, w)
            nh, nw = round(h * scale), round(w * scale)
            r = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_CUBIC)
            top, left = (nh - n) // 2, (nw - n) // 2
            out[i] = r[top : top + n, left : left + n]
        return out


def load(model_size: str, checkpoint_path: str, bpe_path: Optional[str] = None,
         dtype=jnp.float32) -> Tuple[CLIP, object]:
    """Load CLIP from a torch checkpoint + tokenizer. Returns (model, tokenizer)."""
    cfg = PRESETS[model_size]
    params = convert_torch_checkpoint(checkpoint_path, cfg)
    model = CLIP(cfg, params, dtype=dtype)
    if bpe_path:
        from beyondff_tpu.models.tokenizers import ClipTokenizer

        tokenizer = ClipTokenizer(bpe_path, context_length=cfg.context_length)
    else:
        from beyondff_tpu.models.tokenizers import HashTokenizer

        tokenizer = HashTokenizer(cfg.vocab_size, cfg.context_length)
    return model, tokenizer


# --------------------------------------------------------------- conversion
def convert_torch_checkpoint(path: str, cfg: CLIPConfig) -> dict:
    """OpenAI CLIP state dict (.pt/.pth, jit archive or plain) -> flax params."""
    import torch

    from beyondff_tpu.models.convert_util import RecordingDict, assert_all_consumed

    try:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    t = RecordingDict({k: v.float().numpy() for k, v in sd.items()})

    def block(prefix_t: str, heads: int):
        w_in = t[f"{prefix_t}.attn.in_proj_weight"]
        b_in = t[f"{prefix_t}.attn.in_proj_bias"]
        d = w_in.shape[1]
        qw, kw, vw = np.split(w_in, 3, axis=0)
        qb, kb, vb = np.split(b_in, 3, axis=0)
        return {
            "ln1": {"scale": t[f"{prefix_t}.ln_1.weight"], "bias": t[f"{prefix_t}.ln_1.bias"]},
            "ln2": {"scale": t[f"{prefix_t}.ln_2.weight"], "bias": t[f"{prefix_t}.ln_2.bias"]},
            "attn": {
                "q": {"kernel": qw.T, "bias": qb},
                "k": {"kernel": kw.T, "bias": kb},
                "v": {"kernel": vw.T, "bias": vb},
                "proj": {
                    "kernel": t[f"{prefix_t}.attn.out_proj.weight"].T,
                    "bias": t[f"{prefix_t}.attn.out_proj.bias"],
                },
            },
            "mlp": {
                "fc1": {"kernel": t[f"{prefix_t}.mlp.c_fc.weight"].T, "bias": t[f"{prefix_t}.mlp.c_fc.bias"]},
                "fc2": {"kernel": t[f"{prefix_t}.mlp.c_proj.weight"].T, "bias": t[f"{prefix_t}.mlp.c_proj.bias"]},
            },
        }

    visual = {
        "patch_embed": {"proj": {"kernel": t["visual.conv1.weight"].transpose(2, 3, 1, 0)}},
        "class_embedding": t["visual.class_embedding"],
        "positional_embedding": t["visual.positional_embedding"],
        "ln_pre": {"scale": t["visual.ln_pre.weight"], "bias": t["visual.ln_pre.bias"]},
        "ln_post": {"scale": t["visual.ln_post.weight"], "bias": t["visual.ln_post.bias"]},
        "proj": t["visual.proj"],
    }
    for i in range(cfg.vision_layers):
        visual[f"block{i}"] = block(f"visual.transformer.resblocks.{i}", cfg.vision_heads)

    text = {
        "token_embedding": {"embedding": t["token_embedding.weight"]},
        "positional_embedding": t["positional_embedding"],
        "ln_final": {"scale": t["ln_final.weight"], "bias": t["ln_final.bias"]},
        "text_projection": t["text_projection"],
    }
    for i in range(cfg.text_layers):
        text[f"block{i}"] = block(f"transformer.resblocks.{i}", cfg.text_heads)

    params = {"params": {"visual": visual, "text": text, "logit_scale": t["logit_scale"]}}
    # jit-archive scalars carried by the OpenAI .pt files
    assert_all_consumed(
        t, ignore=(r"^input_resolution$", r"^context_length$", r"^vocab_size$"),
        context="CLIP checkpoint")
    return jax.tree_util.tree_map(jnp.asarray, params)
