"""YOLO-World open-vocabulary detector in flax.

Replaces the pip ``inference`` YOLO-World-L the reference uses for its fast
detector variant (reference: tools/segmentation_2d_yolo_world.py:132-139,
SURVEY.md C3). The module mirrors the released ultralytics ``yolov8*-world``
topology layer by layer so the official checkpoints convert 1:1: YOLOv8 CSP
backbone (layers 0-9), a PAN neck whose CSP layers carry max-sigmoid text
attention (``C2fAttn``/``MaxSigmoidAttnBlock``, layers 12/15/18/21), and the
``WorldDetect`` head — DFL box regression plus a contrastive class head
scoring pixel embeddings against CLIP text embeddings (``BNContrastiveHead``
for the v2 checkpoints, plain L2 ``ContrastiveHead`` for v1).

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
    max_channels: int = 512
    text_dim: int = 512  # guide channels (gc)
    embed_dim: int = 512
    img_size: Tuple[int, int] = (640, 640)
    max_dets: int = 100
    reg_max: int = 16  # DFL bins
    nc: int = 80  # training class count (sets the cls-branch width only)
    bn_head: bool = True  # v2 checkpoints use BNContrastiveHead
    attn_heads: Tuple[int, int, int, int] = (8, 4, 8, 16)  # layers 12/15/18/21


PRESETS = {
    "l": YOLOWorldConfig(),
    "m": YOLOWorldConfig(width=0.75, depth=0.67, max_channels=768),
    "s": YOLOWorldConfig(width=0.5, depth=0.33, max_channels=1024),
    "test": YOLOWorldConfig(width=0.25, depth=0.34, max_channels=512, text_dim=32,
                            embed_dim=32, img_size=(64, 64), max_dets=20, reg_max=4,
                            nc=4, attn_heads=(2, 2, 2, 2)),
}


def _make_div(x: float, div: int = 8) -> int:
    return max(div, int(x + div / 2) // div * div)


class ConvBN(nn.Module):
    ch: int
    k: int = 1
    s: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (self.k, self.k), (self.s, self.s), padding=self.k // 2,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn")(x)
        return nn.silu(x) if self.act else x


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


class MaxSigmoidAttn(nn.Module):
    """ultralytics MaxSigmoidAttnBlock with c1 == ec (the released widths):
    per head, max over classes of <pixel embedding, projected guide>, sigmoid-
    gated onto a 3x3-projected feature map."""

    ch: int
    nh: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide):  # guide: (K, gc)
        hc = self.ch // self.nh
        g = nn.Dense(self.ch, use_bias=False, dtype=self.dtype, name="gl")(
            guide.astype(self.dtype))
        g = g.reshape(-1, self.nh, hc)  # (K, nh, hc)
        b, h, w, _ = x.shape
        e = x.reshape(b, h, w, self.nh, hc)
        aw = jnp.einsum("bhwmc,nmc->bhwmn", e, g)
        aw = jnp.max(aw, -1) / np.sqrt(hc).astype(np.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.nh,))
        aw = jax.nn.sigmoid(aw + bias.astype(self.dtype))  # scale=False in released cfgs
        xp = ConvBN(self.ch, 3, act=False, dtype=self.dtype, name="proj_conv")(x)
        xp = xp.reshape(b, h, w, self.nh, hc) * aw[..., None]
        return xp.reshape(b, h, w, self.ch)


class C2fAttn(nn.Module):
    """C2f with an extra max-sigmoid text-attention branch appended before
    the output projection (ultralytics C2fAttn: cv2 sees (3+n) * c/2 chans)."""

    ch: int
    n: int = 1
    nh: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide):
        half = self.ch // 2
        y = ConvBN(self.ch, 1, dtype=self.dtype, name="cv1")(x)
        parts = [y[..., :half], y[..., half:]]
        for i in range(self.n):
            parts.append(Bottleneck(half, False, dtype=self.dtype, name=f"m{i}")(parts[-1]))
        parts.append(MaxSigmoidAttn(half, self.nh, dtype=self.dtype, name="attn")(
            parts[-1], guide))
        return ConvBN(self.ch, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(parts, -1))


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
    """setup()-style module split into a text-INDEPENDENT :meth:`backbone`
    and a text-conditioned :meth:`detect` (PAN + WorldDetect): the multi-class
    sweep banks per-frame backbone features and re-runs only the guided half
    per class (the reference re-runs the whole detector per (class, frame),
    run_evl.py:103-118 x segmentation_2d_yolo_world.py:195-210). Parameter
    names are identical to the previous @nn.compact form (converter/fixture
    compatible)."""

    cfg: YOLOWorldConfig
    dtype: jnp.dtype = jnp.float32

    def _w(self, ch: int) -> int:
        return _make_div(min(ch, self.cfg.max_channels) * self.cfg.width)

    def setup(self):
        c = self.cfg
        w = self._w
        d = lambda n: max(1, round(n * c.depth))
        nh = c.attn_heads

        # ------------------------------------------------ backbone (0-9)
        self.stem = ConvBN(w(64), 3, 2, dtype=self.dtype, name="stem")
        self.down1 = ConvBN(w(128), 3, 2, dtype=self.dtype, name="down1")
        self.c2f1 = C2f(w(128), d(3), dtype=self.dtype, name="c2f1")
        self.down2 = ConvBN(w(256), 3, 2, dtype=self.dtype, name="down2")
        self.c2f2 = C2f(w(256), d(6), dtype=self.dtype, name="c2f2")
        self.down3 = ConvBN(w(512), 3, 2, dtype=self.dtype, name="down3")
        self.c2f3 = C2f(w(512), d(6), dtype=self.dtype, name="c2f3")
        self.down4 = ConvBN(w(1024), 3, 2, dtype=self.dtype, name="down4")
        self.c2f4 = C2f(w(1024), d(3), dtype=self.dtype, name="c2f4")
        self.sppf = SPPF(w(1024), dtype=self.dtype, name="sppf")

        # --------------------------------- text-guided PAN (12/15/16/18/19/21)
        self.t4 = C2fAttn(w(512), d(3), nh[0], dtype=self.dtype, name="t4")
        self.t3 = C2fAttn(w(256), d(3), nh[1], dtype=self.dtype, name="t3")
        self.pan_d3 = ConvBN(w(256), 3, 2, dtype=self.dtype, name="pan_d3")
        self.t4b = C2fAttn(w(512), d(3), nh[2], dtype=self.dtype, name="t4b")
        self.pan_d4 = ConvBN(w(512), 3, 2, dtype=self.dtype, name="pan_d4")
        self.t5 = C2fAttn(w(1024), d(3), nh[3], dtype=self.dtype, name="t5")

        # ------------------------------------------------ WorldDetect (22)
        ch15 = w(256)  # channels of f15, statically known
        c2h = max(16, ch15 // 4, 4 * c.reg_max)
        c3 = max(ch15, min(c.nc, 100))
        self.reg_branches = [
            [ConvBN(c2h, 3, dtype=self.dtype, name=f"reg{li}_0"),
             ConvBN(c2h, 3, dtype=self.dtype, name=f"reg{li}_1"),
             nn.Conv(4 * c.reg_max, (1, 1), dtype=self.dtype, name=f"reg{li}_2")]
            for li in range(3)
        ]
        self.cls_branches = [
            [ConvBN(c3, 3, dtype=self.dtype, name=f"cls{li}_0"),
             ConvBN(c3, 3, dtype=self.dtype, name=f"cls{li}_1"),
             nn.Conv(c.embed_dim, (1, 1), dtype=self.dtype, name=f"cls{li}_2")]
            for li in range(3)
        ]
        if c.bn_head:  # BNContrastiveHead (worldv2)
            self.head_norms = [
                nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name=f"head{li}_norm")
                for li in range(3)
            ]
        self.head_scales = [
            self.param(f"head{li}_logit_scale",
                       nn.initializers.constant(
                           -1.0 if c.bn_head else np.log(1 / 0.07)), ())
            for li in range(3)
        ]
        self.head_biases = [
            self.param(f"head{li}_bias", nn.initializers.constant(-10.0), (1,))
            for li in range(3)
        ]

    def backbone(self, images):
        """images (B, H, W, 3) in [0,1] -> text-independent pyramid
        (p3 /8, p4 /16, p5 /32). Cacheable across queries of a frame."""
        x = self.stem(images)  # /2
        x = self.down1(x)  # /4
        x = self.c2f1(x)
        x = self.down2(x)  # /8
        p3 = self.c2f2(x)
        x = self.down3(p3)  # /16
        p4 = self.c2f3(x)
        x = self.down4(p4)  # /32
        x = self.c2f4(x)
        p5 = self.sppf(x)
        return p3, p4, p5

    def detect(self, p3, p4, p5, text_embeds):
        """Text-guided PAN + WorldDetect head over a backbone pyramid.

        Returns (boxes (B, A, 4) xyxy in pixels, cls_logits (B, A, C_cls))
        over all anchors A of strides 8/16/32."""
        c = self.cfg
        up = jax.image.resize(p5, (p5.shape[0], *p4.shape[1:3], p5.shape[-1]), "nearest")
        f12 = self.t4(jnp.concatenate([up, p4], -1), text_embeds)
        up = jax.image.resize(f12, (f12.shape[0], *p3.shape[1:3], f12.shape[-1]), "nearest")
        f15 = self.t3(jnp.concatenate([up, p3], -1), text_embeds)
        dn = self.pan_d3(f15)
        f18 = self.t4b(jnp.concatenate([dn, f12], -1), text_embeds)
        dn = self.pan_d4(f18)
        f21 = self.t5(jnp.concatenate([dn, p5], -1), text_embeds)

        feats = [(f15, 8), (f18, 16), (f21, 32)]
        boxes_all, cls_all = [], []
        for li, (feat, stride) in enumerate(feats):
            b, hh, ww, _ = feat.shape
            # box branch (Detect.cv2): Conv, Conv, Conv2d(4*reg_max)
            rb = feat
            for layer in self.reg_branches[li]:
                rb = layer(rb)
            # DFL: expectation over softmaxed bins (ultralytics DFL conv)
            dist = jax.nn.softmax(
                rb.reshape(b, hh * ww, 4, c.reg_max).astype(jnp.float32), -1)
            ltrb = jnp.sum(dist * jnp.arange(c.reg_max, dtype=jnp.float32), -1)  # (B, A, 4)
            ys = jnp.arange(hh, dtype=jnp.float32) + 0.5
            xs = jnp.arange(ww, dtype=jnp.float32) + 0.5
            cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
            centers = jnp.stack([cx.ravel(), cy.ravel()], -1)  # (A, 2) in stride units
            x1y1 = (centers - ltrb[..., :2]) * stride
            x2y2 = (centers + ltrb[..., 2:]) * stride
            boxes_all.append(jnp.concatenate([x1y1, x2y2], -1))

            # cls branch (WorldDetect.cv3): Conv, Conv, Conv2d(embed)
            cb = feat
            for layer in self.cls_branches[li]:
                cb = layer(cb)
            # contrastive head (WorldDetect.cv4)
            txt = text_embeds.astype(jnp.float32)
            txt = txt / (jnp.linalg.norm(txt, axis=-1, keepdims=True) + 1e-12)
            if c.bn_head:
                cb = self.head_norms[li](cb)
            else:  # ContrastiveHead: L2 over channels
                cb = cb / (jnp.linalg.norm(cb.astype(jnp.float32), axis=-1,
                                           keepdims=True) + 1e-12).astype(self.dtype)
            logits = jnp.einsum("bhwc,kc->bhwk", cb.astype(jnp.float32), txt)
            logits = logits * jnp.exp(self.head_scales[li]) + self.head_biases[li]
            cls_all.append(logits.reshape(b, hh * ww, -1))

        return jnp.concatenate(boxes_all, 1), jnp.concatenate(cls_all, 1)

    def __call__(self, images, text_embeds):
        """images (B, H, W, 3) in [0,1]; text_embeds (C_cls, text_dim)
        L2-normed. detect(backbone(images)) — see the split methods."""
        p3, p4, p5 = self.backbone(images)
        return self.detect(p3, p4, p5, text_embeds)


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float, top_k: int):
    """Class-agnostic NMS with fixed output size (lax-friendly).

    boxes (A, 4) xyxy, scores (A,). Returns (keep_idx (top_k,), keep_valid).
    """
    a = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
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

        # SPLIT frame-batch programs for the pipelined seg2d driver —
        # (1) device resize (frames upload once, EfficientSAM-scaled) ->
        # text-independent backbone pyramid, (2) text-guided PAN + head ->
        # NMS -> packed (B, K, 6) rows [score | xyxy(det-space) | cls] so one
        # download finalizes the whole batch (mirrors GDINO's
        # _forward_topk_frames; the reference's YOLO path runs per frame with
        # host-side supervision NMS, segmentation_2d_yolo_world.py:195-210).
        # The split lets the multi-class sweep BANK per-frame backbone
        # features and pay only program (2) per extra class; both drivers run
        # the same two programs so stage files stay byte-identical.
        h, w = cfg.img_size
        k = cfg.max_dets

        def bb_frames(p, frames_u8):
            b = frames_u8.shape[0]
            x = jax.image.resize(frames_u8.astype(jnp.float32), (b, h, w, 3),
                                 "bilinear", antialias=False) / 255.0
            return self.module.apply(p, x, method=YOLOWorldModule.backbone)

        self._backbone_frames = jax.jit(bb_frames)

        def head_topk(p, feats, txt, nms_iou):
            boxes, logits = self.module.apply(p, *feats, txt,
                                              method=YOLOWorldModule.detect)
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            cls_id = jnp.argmax(probs, -1)
            scores = jnp.max(probs, -1)

            def one(bx, sc, ci):
                keep_idx, valid = nms_fixed(bx, sc, nms_iou, k)
                return jnp.concatenate([
                    jnp.where(valid, sc[keep_idx], -1.0)[:, None],
                    bx[keep_idx],
                    ci[keep_idx].astype(jnp.float32)[:, None],
                ], axis=-1)  # (K, 6)

            return jax.vmap(one)(boxes, scores, cls_id)

        self._head_topk = jax.jit(head_topk)

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
            if feats.shape[-1] != self.cfg.text_dim:
                raise ValueError(
                    f"YOLO-World guide embeddings must be {self.cfg.text_dim}-d "
                    f"(cfg.text_dim), got {feats.shape[-1]} from the attached CLIP "
                    "tower — official YOLO-World guides on the CLIP-base (512-d) "
                    "text encoder, not ViT-L/14")
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

    # ------------------------------------------------ pipelined frame path
    supports_feats_cache = True

    def predict_batch_frames_async(self, frames_dev, caption: str,
                                   nms_iou: float = 0.5, feats_cache=None):
        """Dispatch-only detection on an already-uploaded uint8 frame buffer
        (any resolution; device-resized to the detector input). Same contract
        as ``GroundingDINO.predict_batch_frames_async`` so the seg2d driver's
        software pipeline (in-flight batches, eager SAM encode) serves this
        detector too. Finish with :meth:`predict_finalize`.

        ``feats_cache``: optional ``(dict, key)`` — the multi-class sweep's
        per-scene bank. The text-independent backbone pyramid for this frame
        batch is computed once, stored device-resident under ``key``, and
        every later class's detection pays only the text-guided PAN + head
        program (the reference re-runs the whole detector per class)."""
        classes = [c.strip() for c in caption.rstrip(".").split(".") if c.strip()]
        txt = self.class_embeddings(classes)
        feats = None
        if feats_cache is not None:
            bank, key = feats_cache
            feats = bank.get(key)
        if feats is None:
            feats = self._backbone_frames(self.params, frames_dev)
            if feats_cache is not None:
                bank[key] = feats
        packed = self._head_topk(self.params, feats, jnp.asarray(txt), nms_iou)
        return packed, classes

    def _row_dets(self, row, sel, classes):
        """Packed (K, 6) row + keep mask -> (normalized cxcywh, scores,
        phrases), the same math as :meth:`predict`."""
        hh, ww = self.cfg.img_size
        scores = row[sel, 0]
        boxes = row[sel, 1:5].copy()
        cls_id = row[sel, 5].astype(np.int64)
        boxes[:, [0, 2]] /= ww
        boxes[:, [1, 3]] /= hh
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        bw = boxes[:, 2] - boxes[:, 0]
        bh = boxes[:, 3] - boxes[:, 1]
        cxcywh = np.clip(np.stack([cx, cy, bw, bh], 1), 0, 1)
        return cxcywh, scores, [classes[i] for i in cls_id]

    def predict_finalize(self, handle, box_threshold: float = 0.02,
                         text_threshold: float = 0.0):
        """Host half of an async detection: one packed download + threshold.
        Returns per-frame (boxes normalized cxcywh, scores, phrases), the
        same math as :meth:`predict` (NMS-padding rows carry score -1 and
        fail any threshold)."""
        packed_d, classes = handle
        packed = np.asarray(packed_d, np.float32)  # (B, K, 6)
        return [self._row_dets(row, row[:, 0] > box_threshold, classes)
                for row in packed]

    # -------------------------------------------------- fused-caption hooks
    def caption_spans(self, classes):
        """Fused multi-class caption for the generic fused-sweep hooks
        (pipeline/segmentation_2d.run_classes). Multi-class IS YOLO-World's
        native protocol — the contrastive head scores every box against the
        whole guide-embedding set in one forward (the reference's
        ``YOLOWorld.set_classes``/``infer``,
        segmentation_2d_yolo_world.py:132-139, is the same shape) — so the
        "span" of a class is simply its index into the per-class logits:
        ``spans[i] = (i, i+1)``. Never overflows (no text-token budget)."""
        caption = " . ".join(c.strip().rstrip(".").strip() for c in classes)
        return caption, [(i, i + 1) for i in range(len(classes))]

    def predict_finalize_demux(self, handle, spans,
                               box_threshold=0.02, text_threshold=0.0):
        """Demux a fused multi-class detection by ARGMAX class assignment
        (the head packs each NMS survivor's best class — YOLO-World's
        deployment protocol): class ``i`` keeps the boxes assigned argmax
        class ``i`` that clear its threshold. ``box_threshold`` may be a
        scalar or a per-span sequence. Like the GDINO demux, results are
        protocol-adjacent to per-class captions (NMS and argmax see the
        whole class set), hence the fused sweep mode stays opt-in."""
        packed_d, classes = handle
        packed = np.asarray(packed_d, np.float32)  # (B, K, 6)
        thresholds = (list(box_threshold) if np.ndim(box_threshold)
                      else [box_threshold] * len(spans))
        if len(thresholds) != len(spans):
            raise ValueError(f"{len(thresholds)} box thresholds for "
                             f"{len(spans)} spans")
        out = []
        for row in packed:
            cls_id = row[:, 5].astype(np.int64)
            out.append([
                self._row_dets(row, (cls_id == s) & (row[:, 0] > thr), classes)
                for (s, _e), thr in zip(spans, thresholds)])
        return out


# --------------------------------------------------------------- conversion

# flax submodule name per ultralytics layer index
_LAYERS = [
    ("stem", "conv"), ("down1", "conv"), ("c2f1", "c2f"), ("down2", "conv"),
    ("c2f2", "c2f"), ("down3", "conv"), ("c2f3", "c2f"), ("down4", "conv"),
    ("c2f4", "c2f"), ("sppf", "sppf"), (None, "upsample"), (None, "concat"),
    ("t4", "c2fattn"), (None, "upsample"), (None, "concat"), ("t3", "c2fattn"),
    ("pan_d3", "conv"), (None, "concat"), ("t4b", "c2fattn"), ("pan_d4", "conv"),
    (None, "concat"), ("t5", "c2fattn"), (None, "detect"),
]
_C2F_DEPTHS = {"c2f1": 3, "c2f2": 6, "c2f3": 6, "c2f4": 3,
               "t4": 3, "t3": 3, "t4b": 3, "t5": 3}


def convert_torch_checkpoint(path_or_sd, cfg: YOLOWorldConfig) -> dict:
    """ultralytics ``yolov8*-world(v2)`` state dict -> flax variables.

    Accepts a path to a torch file or an in-memory state dict; tolerates the
    ``model.model.N`` prefix of a full YOLO wrapper export and the bare
    ``model.N`` of ``DetectionModel.state_dict()``. Every checkpoint key must
    be consumed (buffers like ``num_batches_tracked`` and the constant DFL
    arange conv are verified/ignored); any leftover or missing key raises.
    Reference load site: tools/segmentation_2d_yolo_world.py:132-139.
    """
    if isinstance(path_or_sd, dict):
        sd = path_or_sd
    else:
        import torch

        obj = torch.load(path_or_sd, map_location="cpu", weights_only=False)
        sd = obj.get("model", obj) if isinstance(obj, dict) else obj
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    sd = {k: v for k, v in sd.items()}
    if any(k.startswith("model.model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    consumed = set()

    def take(key):
        consumed.add(key)
        import numpy as _np

        v = sd[key]
        return _np.asarray(v.float().numpy() if hasattr(v, "float") else v, _np.float32)

    def conv_bn(prefix):
        return {
            "conv": {"kernel": take(f"{prefix}.conv.weight").transpose(2, 3, 1, 0)},
            "bn": {"scale": take(f"{prefix}.bn.weight"), "bias": take(f"{prefix}.bn.bias")},
        }, {
            "bn": {"mean": take(f"{prefix}.bn.running_mean"),
                   "var": take(f"{prefix}.bn.running_var")},
        }

    params: dict = {}
    stats: dict = {}

    def put(name, p, s):
        params[name] = p
        if s:
            stats[name] = s

    def bottleneck(prefix):
        p1, s1 = conv_bn(f"{prefix}.cv1")
        p2, s2 = conv_bn(f"{prefix}.cv2")
        return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}

    def c2f(prefix, n):
        p1, s1 = conv_bn(f"{prefix}.cv1")
        p2, s2 = conv_bn(f"{prefix}.cv2")
        p = {"cv1": p1, "cv2": p2}
        s = {"cv1": s1, "cv2": s2}
        for j in range(n):
            p[f"m{j}"], s[f"m{j}"] = bottleneck(f"{prefix}.m.{j}")
        return p, s

    def c2fattn(prefix, n):
        p, s = c2f(prefix, n)
        pa, sa = conv_bn(f"{prefix}.attn.proj_conv")
        p["attn"] = {
            "gl": {"kernel": take(f"{prefix}.attn.gl.weight").T},
            "bias": take(f"{prefix}.attn.bias"),
            "proj_conv": pa,
        }
        s["attn"] = {"proj_conv": sa}
        return p, s

    d = lambda n: max(1, round(n * cfg.depth))
    for i, (name, kind) in enumerate(_LAYERS):
        pfx = f"model.{i}"
        if kind == "conv":
            put(name, *conv_bn(pfx))
        elif kind == "sppf":
            p1, s1 = conv_bn(f"{pfx}.cv1")
            p2, s2 = conv_bn(f"{pfx}.cv2")
            put(name, {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2})
        elif kind == "c2f":
            put(name, *c2f(pfx, d(_C2F_DEPTHS[name])))
        elif kind == "c2fattn":
            put(name, *c2fattn(pfx, d(_C2F_DEPTHS[name])))
        elif kind == "detect":
            for s_i in range(3):
                for branch, ours in (("cv2", "reg"), ("cv3", "cls")):
                    for j in range(2):
                        p, st = conv_bn(f"{pfx}.{branch}.{s_i}.{j}")
                        put(f"{ours}{s_i}_{j}", p, st)
                    params[f"{ours}{s_i}_2"] = {
                        "kernel": take(f"{pfx}.{branch}.{s_i}.2.weight").transpose(2, 3, 1, 0),
                        "bias": take(f"{pfx}.{branch}.{s_i}.2.bias"),
                    }
                params[f"head{s_i}_bias"] = take(f"{pfx}.cv4.{s_i}.bias")
                params[f"head{s_i}_logit_scale"] = take(
                    f"{pfx}.cv4.{s_i}.logit_scale").reshape(())
                if cfg.bn_head:
                    params[f"head{s_i}_norm"] = {
                        "scale": take(f"{pfx}.cv4.{s_i}.norm.weight"),
                        "bias": take(f"{pfx}.cv4.{s_i}.norm.bias"),
                    }
                    stats[f"head{s_i}_norm"] = {
                        "mean": take(f"{pfx}.cv4.{s_i}.norm.running_mean"),
                        "var": take(f"{pfx}.cv4.{s_i}.norm.running_var"),
                    }
            # constant DFL expectation conv: verify it is arange, then drop
            dfl_key = f"{pfx}.dfl.conv.weight"
            if dfl_key in sd:
                dfl = take(dfl_key).reshape(-1)
                if not np.allclose(dfl, np.arange(cfg.reg_max, dtype=np.float32)):
                    raise ValueError("unexpected DFL conv weights")

    leftovers = {k for k in sd if k not in consumed
                 and not k.endswith("num_batches_tracked")}
    if leftovers:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(leftovers)[:8]} "
                         f"(+{max(0, len(leftovers) - 8)} more)")
    return {"params": params, "batch_stats": stats}


def load(checkpoint_path: str, preset: str = "l", clip_model=None, clip_tokenizer=None,
         dtype=jnp.float32):
    """Public YOLO-World checkpoint -> ready model (converter above)."""
    cfg = PRESETS[preset] if isinstance(preset, str) else preset
    variables = convert_torch_checkpoint(checkpoint_path, cfg)
    return YOLOWorld(cfg, variables, clip_model=clip_model,
                     clip_tokenizer=clip_tokenizer, dtype=dtype)
