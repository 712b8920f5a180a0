"""Stage 1 driver: open-vocabulary 2D detection + promptable segmentation.

Rebuild of the reference stage (reference: tools/segmentation_2d.py:212-507):
per scene, each downsampled RGB frame goes through

  1. open-vocab detection (Grounding-DINO by default, YOLO-World variant) with
     phrase filtering against the query (segmentation_2d.py:133-141),
  2. optional CLIP supervision: box crops scored against the ensembled
     descriptor embedding of the query, low-similarity boxes dropped
     (segmentation_2d.py:340-402),
  3. box-prompted SAM mask decoding (segmentation_2d.py:172-191),

and the per-frame results are RLE-encoded into the 2D-mask stage contract.

TPU-first differences: model weights load once into jitted programs; the SAM
decode runs all of a frame's boxes as one batch (the reference loops crops
one at a time through CLIP — here crops are encoded as one batch too);
box counts are padded to ``detector.max_detections`` so every frame reuses
the same compiled decode program.
"""

from __future__ import annotations

import os
from functools import lru_cache as _lru_cache
from typing import Dict, List, Optional, Sequence

import numpy as np

from beyondff_tpu.config import Config
from beyondff_tpu.core import rle
from beyondff_tpu.pipeline import descriptors
from beyondff_tpu.utils import io as bio
from beyondff_tpu.utils.checkpoint import SceneCheckpoint


@_lru_cache(maxsize=8)
def _stack_jit(n: int):
    """Jitted n-way stack: stacking per-frame device buffers with eager
    jnp.stack dispatches ~2n ops over the (high-latency) device link —
    measured 0.62 s per 4-frame batch on a tunneled v5e. One compiled
    program makes it a single dispatch."""
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda *xs: jnp.stack(xs))


@_lru_cache(maxsize=1)
def _take_jit():
    """Jitted row gather: narrow an already-batched device frame buffer to a
    subset of frames in ONE dispatch (the batched-upload path's counterpart
    of restacking per-frame buffers)."""
    import jax

    return jax.jit(lambda x, i: x[i])


def box_cxcywh_to_xyxy(boxes: np.ndarray, w: int, h: int) -> np.ndarray:
    """Normalized cxcywh -> absolute xyxy (reference: box_ops + scaling)."""
    cx, cy, bw, bh = boxes.T
    return np.stack(
        [(cx - bw / 2) * w, (cy - bh / 2) * h, (cx + bw / 2) * w, (cy + bh / 2) * h], axis=1
    )


class Segmentor2D:
    """Loads the model stack once; processes scenes frame by frame."""

    def __init__(self, cfg: Config, detector=None, sam=None, clip_model=None,
                 clip_tokenizer=None):
        self.cfg = cfg
        det_cfg = cfg.detector
        self.clip = None
        self.clip_tokenizer = None
        if det_cfg.filter_with_clip or det_cfg.kind == "yolo_world":
            if clip_model is not None:
                self.clip, self.clip_tokenizer = clip_model, clip_tokenizer
            else:
                self.clip, self.clip_tokenizer = self._load_clip()
        self.detector = detector if detector is not None else self._load_detector()
        if det_cfg.kind == "yolo_world" and getattr(self.detector, "clip", None) is None:
            # YOLO-World derives class embeddings from a CLIP text tower, but
            # only one whose width matches cfg.text_dim (official YOLO-World
            # guides on CLIP-base, 512-d). A wider pipeline tower (e.g. the
            # ViT-L/14 used by the crop filter, 768-d) must NOT be attached —
            # the detector then falls back to hash embeddings of the right
            # width (reference: yolo_world uses its own text encoder while
            # bbox_filter uses ViT-L/14).
            det_text_dim = getattr(getattr(self.detector, "cfg", None), "text_dim", None)
            clip_dim = getattr(getattr(self.clip, "cfg", None), "embed_dim", None)
            if det_text_dim is None or clip_dim == det_text_dim:
                self.detector.clip = self.clip
                self.detector.clip_tokenizer = self.clip_tokenizer
        self.sam = sam if sam is not None else self._load_sam()
        self._query_embedding_cache: Dict[str, np.ndarray] = {}

    # ------------------------------------------------------------- loading
    def _dtype(self):
        import jax.numpy as jnp

        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(
            self.cfg.detector.dtype, jnp.float32)

    def _load_detector(self):
        d = self.cfg.detector
        if d.kind == "yolo_world":
            from beyondff_tpu.models import yolo_world

            return yolo_world.load(d.yolo_world_checkpoint) if d.yolo_world_checkpoint \
                else yolo_world.YOLOWorld.create("test", dtype=self._dtype())
        from beyondff_tpu.models.gdino import GroundingDINO

        if d.gdino_checkpoint:
            from beyondff_tpu.models.gdino import convert, model as gdino_model
            from beyondff_tpu.models.tokenizers import BertTokenizer

            cfg = gdino_model.PRESETS["swinb"]
            params = convert.convert_torch_checkpoint(d.gdino_checkpoint, cfg)
            tok = BertTokenizer(d.bert_vocab_path) if d.bert_vocab_path else None
            return GroundingDINO(cfg, params, tok, dtype=self._dtype())
        return GroundingDINO.create("test", dtype=self._dtype())

    def _load_sam(self):
        d = self.cfg.detector
        if d.kind == "yolo_world":
            from beyondff_tpu.models import efficientsam

            if d.efficientsam_checkpoint:
                cfg = efficientsam.PRESETS["vits"]
                params = efficientsam.convert_torch_checkpoint(d.efficientsam_checkpoint, cfg)
                return efficientsam.EfficientSAM(cfg, params, dtype=self._dtype())
            return efficientsam.EfficientSAM.create("test", dtype=self._dtype())
        from beyondff_tpu.models import sam as sam_mod

        if d.sam_checkpoint and os.path.exists(d.sam_checkpoint):
            cfg = sam_mod.PRESETS["vit_h"]
            params = sam_mod.convert_torch_checkpoint(d.sam_checkpoint, cfg)
            return sam_mod.SAM(cfg, params, dtype=self._dtype())
        return sam_mod.SAM.create("test", dtype=self._dtype())

    def _load_clip(self):
        from beyondff_tpu.models import clip as clip_mod
        from beyondff_tpu.models.tokenizers import HashTokenizer

        d = self.cfg.detector
        if d.clip_checkpoint:
            return clip_mod.load(d.clip_model_size, d.clip_checkpoint,
                                 bpe_path=d.clip_bpe_path or None, dtype=self._dtype())
        model = clip_mod.CLIP.create("test", dtype=self._dtype())
        return model, HashTokenizer(model.cfg.vocab_size, model.cfg.context_length)

    # ------------------------------------------------------- CLIP filtering
    def query_embedding(self, query: str) -> np.ndarray:
        """Mean of the CLIP text embeddings of the descriptor-extended query,
        L2-normalized twice like the reference
        (compute_avg_description_encodings, segmentation_2d.py:324-337)."""
        if query in self._query_embedding_cache:
            return self._query_embedding_cache[query]
        llm = None
        if "gpt" in self.cfg.detector.descriptor_generator:
            from beyondff_tpu.pipeline import llm_client

            llm = llm_client.from_config(self.cfg.detector)
        variants = descriptors.generate(
            query, self.cfg.detector.descriptor_generator, seed=self.cfg.seed,
            llm=llm,
        )[query]
        toks = self.clip_tokenizer(variants)
        feats = np.array(self.clip.encode_text(toks), np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        mean = feats.mean(axis=0)
        mean /= np.linalg.norm(mean)
        self._query_embedding_cache[query] = mean
        return mean

    def _clip_crops(self, image: np.ndarray, boxes_xyxy: np.ndarray,
                    frame_hw=None) -> List[np.ndarray]:
        """Box crops for CLIP scoring, with crop-source parity: the reference
        crops from the DETECTOR-transformed tensor, not the raw frame, and
        casts back to uint8 with `* 255` whose wraparound it inherits. GDINO
        mode crops the ImageNet-normalized resized tensor (bbox_filter,
        segmentation_2d.py:345-380: values in ~[-2.1, 2.6] so
        `(x*255).astype(uint8)` wraps); YOLO-World mode crops the raw uint8
        frame where `x*255` wraps to (-x) mod 256
        (segmentation_2d_yolo_world.py:505-515). Both wraparounds are
        reproduced bit-exactly; the only deviation is the resize geometry —
        the detector input here is fixed cfg.image_size instead of the
        reference's aspect-preserving short-side-800 resize (PARITY.md)."""
        h, w = frame_hw if frame_hw is not None else image.shape[:2]
        if self.cfg.detector.kind == "yolo_world":
            # raw uint8 frame; in the single-upload pipeline the crop source
            # is the (EfficientSAM-scaled) frame buffer while boxes stay at
            # frame resolution — scale the crop coordinates to the source
            src = image
            sx = src.shape[1] / w
            sy = src.shape[0] / h
            import cv2

            # uint8 * 255 wraps to (-x) mod 256, the reference's quirk —
            # uint8 -> uint8 is a pure per-value map, so a 256-entry LUT
            # built with the IDENTICAL expression is bit-exact at a fraction
            # of the host cost (measured 4 ms/crop for the float chain,
            # 0.26 ms via cv2.LUT)
            lut = (np.arange(256, dtype=np.uint8) * 255).astype(np.uint8)

            def normalize(c):
                return cv2.LUT(c, lut)
        else:
            import cv2

            from beyondff_tpu.models.gdino.model import IMAGE_MEAN, IMAGE_STD

            gh, gw = self.detector.cfg.image_size
            src = cv2.resize(image, (gw, gh), interpolation=cv2.INTER_LINEAR)
            sx, sy = gw / w, gh / h

            # normalize per crop via a per-channel 256-entry LUT: the
            # reference normalizes the whole detector tensor then crops
            # (bbox_filter, segmentation_2d.py:345-380); uint8 -> uint8 is a
            # pure per-value map per channel, so the LUT built with the
            # IDENTICAL float expression (including its negative-float ->
            # uint8 cast wraparound) is bit-exact at ~1/16th the host cost
            # (4.1 -> 0.26 ms on a 300x400 crop via cv2.LUT)
            lut = (((np.arange(256, dtype=np.float32)[:, None] / 255.0
                     - IMAGE_MEAN) / IMAGE_STD) * 255).astype(np.uint8)
            lut_cv = lut.reshape(1, 256, 3)

            def normalize(c):
                return cv2.LUT(c, lut_cv)
        sh, sw = src.shape[:2]
        crops = []
        for bx0, by0, bx1, by1 in boxes_xyxy:
            x0, y0 = max(0, int(bx0 * sx)), max(0, int(by0 * sy))
            x1, y1 = min(sw, int(bx1 * sx)), min(sh, int(by1 * sy))
            if x1 <= x0 or y1 <= y0:
                crops.append(np.zeros((2, 2, 3), np.uint8))
                continue
            crops.append(normalize(src[y0:y1, x0:x1]))
        return crops

    def _clip_sims_dispatch(self, crops: List[np.ndarray]):
        """Device half of crop scoring: preprocess + encode dispatch + async
        D2H start. Returns (feats_dev, n) for :meth:`_clip_sims_fetch`."""
        batch = self.clip.preprocess(crops)
        # bucket the crop count to the next power of two: detection counts
        # vary per frame batch, and every distinct batch size would compile a
        # fresh image-tower program (10s+ each over the remote-compile link)
        n = batch.shape[0]
        k = 1
        while k < n:
            k *= 2
        if k > n:
            batch = np.concatenate(
                [batch, np.zeros((k - n, *batch.shape[1:]), batch.dtype)])
        # YCrCb 4:2:0 transport for CLIP crop uploads (BFF_CLIP_YUV=1/0
        # forces): auto-on only in YOLO-World mode, whose crops are raw uint8
        # image content (the near-lossless case, same argument as the frame
        # transport — core/color.py); GDINO-mode crops are LUT-normalized
        # sawtooths (multiple uint8 wraps per channel) where 2x2 chroma
        # averaging smears across wrap discontinuities, so they stay dense.
        cy = os.environ.get("BFF_CLIP_YUV", "auto")
        crop_yuv = (self.cfg.detector.kind == "yolo_world"
                    and os.environ.get("BFF_SEG2D_YUV", "1") != "0"
                    ) if cy == "auto" else cy == "1"
        if crop_yuv and hasattr(self.clip, "encode_image_packed_yuv"):
            from beyondff_tpu.core import color as _color

            packed = np.stack([_color.pack_ycrcb420(c) for c in batch])
            feats_dev = self.clip.encode_image_packed_yuv(packed)
        else:
            feats_dev = self.clip.encode_image(batch)
        try:
            feats_dev.copy_to_host_async()
        except AttributeError:
            pass
        return feats_dev, n

    def _clip_feats_fetch(self, feats_dev, n: int) -> np.ndarray:
        feats = np.asarray(feats_dev, np.float32)[:n]
        return feats / np.linalg.norm(feats, axis=-1, keepdims=True)

    def _clip_sims_fetch(self, feats_dev, n: int, query: str) -> np.ndarray:
        return self._clip_feats_fetch(feats_dev, n) @ self.query_embedding(query)

    def _clip_sims(self, crops: List[np.ndarray], query: str) -> np.ndarray:
        feats_dev, n = self._clip_sims_dispatch(crops)
        return self._clip_sims_fetch(feats_dev, n, query)

    def filter_boxes_with_clip(self, image: np.ndarray, boxes_xyxy: np.ndarray,
                               query: str) -> np.ndarray:
        """Keep boxes whose crop's CLIP similarity >= threshold. Returns
        (keep_mask, similarities). See :meth:`_clip_crops` for parity notes."""
        sims = self._clip_sims(self._clip_crops(image, boxes_xyxy), query)
        return sims >= self.cfg.detector.similarity_threshold, sims

    # --------------------------------------------------------- detection
    def _phrase_filter(self, image: np.ndarray, query: str, detection, frame_hw=None):
        """Phrase filter for one frame; returns (boxes_xyxy, scores, phrases)
        or None (reference: segmentation_2d.py:133-141)."""
        d = self.cfg.detector
        h, w = frame_hw if frame_hw is not None else image.shape[:2]
        boxes, scores, phrases = detection
        if d.must_match_query and len(phrases):
            needle = d.must_match_class or query
            keep = np.array([needle in p for p in phrases], bool)
            boxes, scores = boxes[keep], scores[keep]
            phrases = [p for p, k in zip(phrases, keep) if k]
        if boxes.shape[0] == 0:
            return None
        return box_cxcywh_to_xyxy(boxes, w, h), scores, phrases

    def _cap_detections(self, filtered):
        d = self.cfg.detector
        boxes_xyxy, scores, phrases = filtered
        if boxes_xyxy.shape[0] > d.max_detections:
            order = np.argsort(-np.asarray(scores))[: d.max_detections]
            boxes_xyxy = boxes_xyxy[order]
            scores = np.asarray(scores)[order]
            phrases = [phrases[i] for i in order]
        return boxes_xyxy, np.asarray(scores), phrases

    def _detect_and_filter_batch(self, images, raw_dets, query: str, frame_hw=None,
                                 pre=None):
        """Per-frame phrase filter + ONE batched CLIP crop scoring for the
        whole frame batch (the reference encodes crops box by box,
        segmentation_2d.py:383-388) + per-frame top-K. Returns a list of
        (boxes_xyxy, scores, phrases) / None. ``frame_hw``: coordinate frame
        for the boxes when ``images`` are scaled copies (single-upload path).
        ``pre``: precomputed per-frame phrase-filter results (the pipelined
        scene driver runs the phrase filter early to pick SAM-encode frames)."""
        d = self.cfg.detector
        if pre is None:
            pre = [self._phrase_filter(im, query, det, frame_hw)
                   for im, det in zip(images, raw_dets)]
        # gate on the config flag, not CLIP availability: YOLO-World mode
        # always loads CLIP (class embeddings) but only filters when asked
        # (reference: segmentation_2d_yolo_world.py:213-224)
        if self.clip is None or not d.filter_with_clip:
            return [None if p is None else self._cap_detections(p) for p in pre]
        crops, counts = [], []
        for im, p in zip(images, pre):
            if p is None:
                counts.append(0)
                continue
            c = self._clip_crops(im, p[0], frame_hw)
            crops.extend(c)
            counts.append(len(c))
        if not crops:
            return [None] * len(images)
        sims_all = self._clip_sims(crops, query)
        out, off = [], 0
        for p, n in zip(pre, counts):
            if p is None:
                out.append(None)
                continue
            boxes_xyxy, _scores, phrases = p
            sims = sims_all[off:off + n]
            off += n
            keep = sims >= d.similarity_threshold
            boxes_xyxy = boxes_xyxy[keep]
            # the reference replaces detector logits with CLIP sims
            scores = sims[keep]
            phrases = [ph for ph, k in zip(phrases, keep) if k]
            out.append(None if boxes_xyxy.shape[0] == 0
                       else self._cap_detections((boxes_xyxy, scores, phrases)))
        return out

    def _detect_and_filter(self, image: np.ndarray, query: str, detection):
        """Single-frame variant of :meth:`_detect_and_filter_batch`."""
        return self._detect_and_filter_batch([image], [detection], query)[0]

    def _segment_frames(self, images: List[np.ndarray], dets: List) -> List[np.ndarray]:
        """Box-prompted SAM over several frames: one batched image encode and
        ONE batched decode dispatch for the whole frame batch (box counts
        bucketed to the next power of two so a few compiled programs serve
        every frame), with masks postprocessed + bit-packed on device — the
        reference decodes per frame and ships dense masks to the host
        (segmentation_2d.py:172-191)."""
        h, w = images[0].shape[:2]
        x, input_hw = self.sam.preprocess(np.stack(images))
        embs = self.sam.encode_image(x, input_hw=input_hw)  # stays on device
        return self._decode_masks(embs, dets, input_hw, (h, w))

    def _decode_masks_dispatch(self, embs, dets: List, input_hw, orig_hw):
        """Device half of the batched box decode: pads boxes, decodes +
        bit-packs on device, concatenates the valid rows into one flat
        buffer, and starts its async D2H. Returns (flat_dev, sizes)."""
        d = self.cfg.detector
        h, w = orig_hw
        b = int(embs.shape[0])
        m_max = max(bx.shape[0] for bx, _s, _p in dets)
        k = 1
        while k < min(max(m_max, 1), d.max_detections):
            k *= 2
        padded = np.zeros((b, k, 4), np.float32)
        for i, (boxes_xyxy, _scores, _phrases) in enumerate(dets):
            m = boxes_xyxy.shape[0]
            padded[i, :m] = self.sam.transform_boxes(boxes_xyxy, (h, w))
        packed, _iou = self.sam.decode_boxes_packed(embs, padded, input_hw, (h, w))
        import jax.numpy as jnp

        sizes = [bx.shape[0] for bx, _s, _p in dets]
        flat_dev = jnp.concatenate(  # one host transfer for the batch
            [packed[i, :m] for i, m in enumerate(sizes)], axis=0)
        try:
            flat_dev.copy_to_host_async()
        except AttributeError:
            pass
        return flat_dev, sizes

    def _decode_masks_fetch(self, flat_dev, sizes: List[int],
                            orig_hw) -> List[np.ndarray]:
        """Host half: materialize the packed download, unpack to dense."""
        h, w = orig_hw
        flat = np.asarray(flat_dev)
        masks = np.unpackbits(flat, axis=-1, bitorder="little")[:, : h * w]
        out = []
        off = 0
        for m in sizes:
            out.append(masks[off:off + m].reshape(m, h, w).astype(bool))
            off += m
        return out

    def _decode_masks(self, embs, dets: List, input_hw, orig_hw) -> List[np.ndarray]:
        """Batched box decode + device bit-pack + one packed host download."""
        flat_dev, sizes = self._decode_masks_dispatch(embs, dets, input_hw, orig_hw)
        return self._decode_masks_fetch(flat_dev, sizes, orig_hw)

    # ------------------------------------------------------------ per frame
    def process_frame(self, image: np.ndarray, query: str) -> Optional[Dict]:
        """One RGB frame -> detection record or None (no boxes)."""
        d = self.cfg.detector
        det = self.detector.predict(image, query, box_threshold=d.box_threshold,
                                    text_threshold=d.text_threshold)
        filtered = self._detect_and_filter(image, query, det)
        if filtered is None:
            return None
        masks = self._segment_frames([image], [filtered])[0]
        return {
            "segmented_frame_masks": masks[:, None].astype(bool),  # (M, 1, H, W)
            "confidences": [float(s) for s in filtered[1]],
            "labels": list(filtered[2]),
        }

    # ------------------------------------------------------------ per scene
    def process_scene(self, scene_id: str, query: str,
                      frame_bank: Optional[Dict] = None,
                      demux: Optional[tuple] = None,
                      detections_override: Optional[Dict] = None,
                      override_groups: Optional[Dict] = None,
                      box_threshold: Optional[float] = None):
        """All frames of a scene, batched ``detector.frame_batch`` at a time
        through the detector and SAM encoder, with prefetched image loading.

        Default (``detector.device_frames``): each frame uploads ONCE as a
        SAM-scaled uint8 buffer from the prefetch thread (overlapping device
        compute); the detector input derives from it on device and SAM
        encodes it directly — replacing the reference's three separate
        host-side model preprocessing chains per frame
        (segmentation_2d.py:247-278).

        ``frame_bank``: optional dict shared across CLASSES of the same
        scene (see :func:`run_classes`) — decoded host frames, uploaded
        device buffers, detector backbone pyramids, and SAM encoder
        embeddings are stored under ("img"|"det"|"sam"|"det_feats"|
        "sam_emb", ...) keys, so a multi-class sweep pays each scene's JPEG
        decode, host->device frame traffic, and text-independent encoder
        work once instead of once per class.

        Fused-caption sweep hooks (see :func:`run_classes`):
        ``demux=(classes, spans, out)`` runs a DETECTION-ONLY pass with
        ``query`` as the fused multi-phrase caption: per-class detections
        demux by token span into ``out[(class, frame_id)]`` (plus eager
        SAM-embedding banking for hit frames) and no records are emitted.
        ``detections_override={frame_id: (boxes, scores, phrases)}`` skips
        the detector entirely and feeds the recorded detections through the
        unchanged CLIP-filter -> SAM decode pipeline; frames absent from the
        table are skipped outright (a frame with no boxes emits no record
        either way).
        ``override_groups={class: {frame_id: dets}}`` is the COMBINED form:
        the pipeline's unit becomes a (frame, class) entry, so one pass
        replays the whole class group — frame uploads/encodes key by frame
        (shared via ``frame_bank``, required), crops/CLIP-sims/decodes run
        per entry against that entry's class, and mixed-class batches share
        each flush cycle's device dispatches and D2H transfers (the ~28 ms
        fixed link cost per transfer is paid once per batch instead of once
        per class per batch). Returns ``{class: [records]}``. Masks are
        byte-identical to per-class ``detections_override`` replays;
        confidences (CLIP sims) match up to f32 ulps — the combined crop
        batch pads to a different power-of-2 than per-class batches.

        ``box_threshold`` overrides ``detector.box_threshold`` for this pass
        (per-class operating points in multi-class sweeps; see
        :func:`run_classes` ``class_thresholds``)."""
        p = self.cfg.paths
        d = self.cfg.detector
        box_thr = d.box_threshold if box_threshold is None else box_threshold
        size = (self.cfg.frames.width_2d, self.cfg.frames.height_2d)
        frame_hw = (self.cfg.frames.height_2d, self.cfg.frames.width_2d)
        frame_ids = bio.list_scene_frames(p.scene_2d_dir, scene_id,
                                          self.cfg.frames.downsample_ratio)
        device_frames = (d.device_frames
                         and hasattr(self.detector, "predict_batch_frames_async")
                         and hasattr(self.sam, "encode_frames"))
        group = override_groups is not None
        if demux is not None or detections_override is not None or group:
            if not device_frames:
                raise ValueError("fused-caption passes require the "
                                 "device-frames detector path")
            if demux is not None and not hasattr(self.detector,
                                                 "predict_finalize_demux"):
                raise ValueError("detector does not support caption demux")
        if group:
            if frame_bank is None:
                raise ValueError("override_groups requires a frame_bank "
                                 "(frames are shared across entries)")
            # pipeline unit = (frame, class) entry, frame-major so a frame's
            # banked buffer/embedding serves its classes back to back
            frame_ids = [(f, c) for f in frame_ids for c in override_groups
                         if f in override_groups[c]]
            if not frame_ids:
                return {c: [] for c in override_groups}
        elif detections_override is not None:
            # only frames the fused pass detected can emit records
            frame_ids = [f for f in frame_ids if f in detections_override]
            if not frame_ids:
                return []

        def fid_of(e):
            return e[0] if group else e

        def query_of(e):
            return e[1] if group else query

        # Two-tier upload: when the detector's input is SMALLER than the
        # SAM-scaled frame (YOLO-World's 640x640 vs the 1024-long-side SAM
        # buffer; not GDINO's 800x1072), upload only the detector-scale
        # buffer per frame and defer the SAM-scale upload to frames that
        # actually detect. Misses (the common case) then cost ~1.9x less
        # host->device traffic, and the detector input becomes ONE host
        # cv2.resize of the raw frame — the same chain as the blocking
        # reference path (segmentation_2d_yolo_world.py:195-210) instead of
        # the double bilinear (frame -> SAM scale -> detector scale).
        # BFF_SEG2D_TWO_TIER=1/0 forces it; default: auto by byte count.
        det_hw = getattr(getattr(self.detector, "cfg", None), "img_size", None) \
            or getattr(getattr(self.detector, "cfg", None), "image_size", None)
        two_tier = False
        if device_frames and det_hw is not None:
            sam_long = getattr(self.sam.cfg, "img_size", 1024)
            scale = sam_long / max(frame_hw)
            sam_bytes = round(frame_hw[0] * scale) * round(frame_hw[1] * scale)
            mode = os.environ.get("BFF_SEG2D_TWO_TIER", "auto")
            two_tier = (det_hw[0] * det_hw[1] < sam_bytes) if mode == "auto" \
                else mode == "1"

        # YCrCb 4:2:0 frame transport (default on): frames cross the link at
        # 1.5 B/px instead of 3 — the miss regime is upload-bound, and the
        # JPEG sources already store 4:2:0 chroma so the subsample carries
        # ~all the file's information (core/color.py). BFF_SEG2D_YUV=0
        # restores dense RGB uploads (bit-identical pixels) for A/B.
        yuv = device_frames and os.environ.get("BFF_SEG2D_YUV", "1") != "0"
        # Batched frame uploads (default AUTO = two-tier mode only): ONE
        # host->device transfer per detection batch instead of one per frame.
        # The tunneled link pays a ~28 ms fixed cost per transfer
        # (tools/probe_link.py), which dominates for SMALL frames — measured
        # on the fast variant's 640x640 buffers it wins 2/3 paired hit rounds
        # and the best miss round; on GDINO's 2.4 MB SAM-scale buffers it
        # LOSES ~5% (per-frame uploads interleave with JPEG decode at finer
        # grain and stream under compute), so auto enables it exactly where
        # two_tier is on. BFF_SEG2D_BATCH_UPLOAD=1/0 forces either way.
        bu_mode = os.environ.get("BFF_SEG2D_BATCH_UPLOAD", "auto")
        batch_upload = device_frames and (
            two_tier if bu_mode == "auto" else bu_mode == "1")
        # Device-side CLIP crops (BFF_CLIP_DEVICE_CROPS=auto/1/0): the crop
        # filter cuts + resizes box crops ON DEVICE from the SAM-scale frame
        # buffers (core/crop_resize.py), so only box coordinates cross the
        # link instead of finished pixel crops. Crop source becomes the
        # device buffer (the single-upload deviation class, PARITY.md)
        # instead of the host frame, and the resize runs f32 vs cv2's 11-bit
        # fixed point (±1 LSB; test-pinned in tests/test_crop_resize.py).
        # Measured paired A/Bs (tools/bench_fast_ab.py, real chip): auto
        # enables it exactly where it won — the fast variant's LINK-bound
        # hit regime (9.61 -> 11.40 f/s, +19%) and the fused sweep's replay
        # passes (32.4 -> 36.5 class-f/s, +13%); GDINO's classic hit regime
        # measured dead-neutral (6.16 vs 6.18 f/s, chip-bound), so it keeps
        # the bit-exact host LUT chain there.
        dc_mode = os.environ.get("BFF_CLIP_DEVICE_CROPS", "auto")
        device_crops = (device_frames
                        and self.clip is not None
                        and hasattr(self.clip, "encode_image_boxes")
                        and ((d.kind == "yolo_world" or group
                              or detections_override is not None)
                             if dc_mode == "auto" else dc_mode == "1"))
        if device_frames:
            from beyondff_tpu.core import color as _color
        # JXT coefficient transport (BFF_SEG2D_JXT=auto/1/0, core/jxt.py):
        # frames whose source files are baseline JPEGs at the configured
        # frame size ship as sparse quantized DCT coefficients (~0.4-0.7
        # B/px measured on natural frames vs 1.5 B/px YCrCb) and finish
        # decoding ON DEVICE; the detector-scale and SAM-scale buffers BOTH
        # derive from that one native-resolution upload by device resize, so
        # two-tier hit frames stop paying their second (larger) upload
        # entirely. Requires device crops (host pixels never materialize on
        # the jxt path); frames the spill guard rejects (noise-like content,
        # progressive files, mismatched dims) fall back per frame to the
        # YCrCb path. Default AUTO = YOLO-World mode only, where the paired
        # on-chip A/B measured +31% hit / neutral miss (structured q90
        # frames, ARCHITECTURE.md r5 log); GDINO's fused replays measured
        # neutral-to-negative (41.1 vs 37.1 s, one clean pass under
        # improving link weather), so auto keeps YCrCb there.
        jxt_mode = os.environ.get("BFF_SEG2D_JXT", "auto")
        use_jxt = (device_frames and device_crops
                   and (jxt_mode == "1"
                        or (jxt_mode == "auto" and d.kind == "yolo_world")))
        if jxt_mode == "1" and not use_jxt and not getattr(
                Segmentor2D, "_jxt_forced_warned", False):
            # a forced A/B that silently measures the unchanged YCrCb path
            # would compare identical configurations (ADVICE r4)
            Segmentor2D._jxt_forced_warned = True
            print("[seg2d] warning: BFF_SEG2D_JXT=1 has no effect without "
                  f"device frames + device crops (device_frames={device_frames}, "
                  f"device_crops={device_crops}); set "
                  "BFF_CLIP_DEVICE_CROPS=1 (and two-tier/device transport) "
                  "to engage the coefficient transport")
        if use_jxt:
            from beyondff_tpu.core import jxt as _jxt

            # SAM-scale dims of a frame_hw frame (models/sam.py scale_frame)
            _s = getattr(self.sam.cfg, "img_size", 1024) / max(frame_hw)
            sam_hw = (int(frame_hw[0] * _s + 0.5), int(frame_hw[1] * _s + 0.5))
        jxt_native: Dict = {}  # fid -> native-res device RGB (until stage_a)

        bank = frame_bank  # {("img"|"det"|"sam", fid): buffer} or None

        def _load_img(fid):
            if bank is not None and ("img", fid) in bank:
                return bank[("img", fid)]
            img = bio.load_image(
                os.path.join(p.scene_2d_dir, scene_id, "color", f"{fid}.jpg"), size=size)
            if bank is not None:
                bank[("img", fid)] = img
            return img

        def _jxt_pack(fid):
            """Sparse-pack a frame's JPEG file for the coefficient transport;
            None -> this frame falls back to the host decode + YCrCb path
            (spill guard, non-baseline file, or dims != the configured frame
            size — the host path's PIL resize has no device equivalent)."""
            path = os.path.join(p.scene_2d_dir, scene_id, "color", f"{fid}.jpg")
            try:
                with open(path, "rb") as f:
                    packed = _jxt.pack_file(f.read())
            except (OSError, ValueError):
                return None
            if packed is not None and (packed.geometry.h,
                                       packed.geometry.w) != frame_hw:
                return None
            return packed

        def load(entry):
            fid = fid_of(entry)
            if use_jxt:
                banked = (bank.get(("det" if two_tier else "sam", fid))
                          if bank is not None else None)
                if banked is not None:
                    if two_tier:
                        return entry, None, None, banked
                    return entry, None, bank[("sam_host", fid)][1], banked
                packed = _jxt_pack(fid)
                if packed is not None:
                    # upload + device decode start here (prefetch thread)
                    native = _jxt.upload_frame(packed)
                    if two_tier:
                        dev = _jxt.resize_frame(native, det_hw)
                        if bank is not None:
                            bank[("det", fid)] = dev
                        # stage_a derives the SAM-scale buffer for hit
                        # frames from the retained native (no second upload)
                        jxt_native[fid] = native
                        return entry, None, None, dev
                    dev = _jxt.resize_frame(native, sam_hw)
                    if bank is not None:
                        bank[("sam", fid)] = dev
                        bank[("sam_host", fid)] = (None, sam_hw)
                    return entry, None, sam_hw, dev
            img = _load_img(fid)
            if device_frames:
                if two_tier:
                    dev = bank.get(("det", fid)) if bank is not None else None
                    if dev is None:
                        import cv2

                        det_img = cv2.resize(img, (det_hw[1], det_hw[0]),
                                             interpolation=cv2.INTER_LINEAR)
                        # upload (prefetch thread): detector-scale only; the
                        # SAM-scale buffer uploads lazily for frames with boxes
                        dev = _color.upload_frame(det_img, yuv=yuv)
                        if bank is not None:
                            bank[("det", fid)] = dev
                    return entry, img, None, dev
                dev = bank.get(("sam", fid)) if bank is not None else None
                if dev is not None:
                    small, input_hw = bank[("sam_host", fid)]
                    return entry, small, input_hw, dev
                small, input_hw = self.sam.scale_frame(img)
                # upload starts here, in the prefetch thread (async dispatch)
                dev = _color.upload_frame(small, yuv=yuv)
                if bank is not None:
                    bank[("sam", fid)] = dev
                    bank[("sam_host", fid)] = (small, input_hw)
                return entry, small, input_hw, dev
            return entry, img

        def load_chunk(fids):
            """Batched-upload loader: decode + scale a whole detection batch
            on the host, then ship it as ONE device transfer. Banked chunks
            restack the per-frame buffers on device (no link traffic)."""
            key = "det" if two_tier else "sam"
            all_banked = bank is not None and all(
                (key, fid_of(e)) in bank for e in fids)
            if use_jxt and not all_banked:
                # coefficient transport for the whole chunk: one batched
                # sparse upload, device decode, batched device resize. Any
                # frame the spill guard rejects drops the chunk to the host
                # path (mixed chunks would split the single transfer anyway).
                packs = [_jxt_pack(fid_of(e)) for e in fids]
                if all(pk is not None for pk in packs):
                    natives = _jxt.upload_frames(packs)
                    if two_tier:
                        dev = _jxt.resize_frames(natives, det_hw)
                        for i, e in enumerate(fids):
                            jxt_native[fid_of(e)] = natives[i]
                            if bank is not None:
                                bank[("det", fid_of(e))] = dev[i]
                        return list(fids), [None] * len(fids), None, dev
                    dev = _jxt.resize_frames(natives, sam_hw)
                    if bank is not None:
                        for i, e in enumerate(fids):
                            bank[("sam", fid_of(e))] = dev[i]
                            bank[("sam_host", fid_of(e))] = (None, sam_hw)
                    return list(fids), [None] * len(fids), sam_hw, dev
            # the jxt path never materializes host pixels; don't decode them
            # just to satisfy the (unused-there) smalls slots
            imgs = ([None] * len(fids) if use_jxt and all_banked
                    else [_load_img(fid_of(e)) for e in fids])
            if all_banked:
                dev = _stack_jit(len(fids))(
                    *[bank[(key, fid_of(e))] for e in fids])
                if two_tier:
                    return list(fids), imgs, None, dev
                smalls, hws = zip(*[bank[("sam_host", fid_of(e))] for e in fids])
                return list(fids), list(smalls), hws[0], dev
            if two_tier:
                import cv2

                det_imgs = [cv2.resize(im, (det_hw[1], det_hw[0]),
                                       interpolation=cv2.INTER_LINEAR)
                            for im in imgs]
                dev = _color.upload_frames(det_imgs, yuv=yuv)
                if bank is not None:
                    for i, f in enumerate(fids):
                        bank[("det", fid_of(f))] = dev[i]
                return list(fids), imgs, None, dev
            pairs = [self.sam.scale_frame(im) for im in imgs]
            dev = _color.upload_frames([pr[0] for pr in pairs], yuv=yuv)
            if bank is not None:
                for i, f in enumerate(fids):
                    bank[("sam", fid_of(f))] = dev[i]
                    bank[("sam_host", fid_of(f))] = pairs[i]
            return (list(fids), [pr[0] for pr in pairs], pairs[0][1], dev)

        from beyondff_tpu.utils.prefetch import prefetch_map

        batched = hasattr(self.detector, "predict_batch")
        records: List[Dict] = []
        records_by_class: Dict[str, List[Dict]] = (
            {c: [] for c in override_groups} if group else {})
        buf: List = []

        def emit(kept, masks):
            for (entry, _img, (bx, scores, phrases)), m in zip(kept, masks):
                (records_by_class[entry[1]] if group else records).append({
                    "frame_id": f"{fid_of(entry)}.jpg",
                    "segmented_frame_masks": m[:, None].astype(bool),
                    "confidences": [float(s) for s in scores],
                    "labels": list(phrases),
                })

        # one-batch-deep software pipeline (device path): batch t's detection
        # is DISPATCHED (async) before the host finalizes batch t-1 — so the
        # chip starts GDINO(t) as soon as SAM(t-1) drains, while the host
        # builds crops / unpacks masks for t-1. The reference's loop blocks
        # on every stage in sequence (segmentation_2d.py:243-278).
        pending: List = []  # [(fids, smalls, input_hw, devs, det_handle)]

        # BFF_SEG2D_TRACE=1: per-phase host-blocking seconds, printed per scene
        trace: Optional[Dict[str, float]] = (
            {} if os.environ.get("BFF_SEG2D_TRACE") else None)

        def _span(name):
            import contextlib
            import time as _time

            if trace is None:
                return contextlib.nullcontext()

            @contextlib.contextmanager
            def cm():
                t0 = _time.perf_counter()
                try:
                    yield
                finally:
                    trace[name] = trace.get(name, 0.0) + _time.perf_counter() - t0

            return cm()

        def dispatch_detection():
            if batch_upload:
                # each buf item is a whole chunk, already device-batched
                fids, smalls, input_hw, devs = buf[0]
                frames_dev = devs
            else:
                fids = [b[0] for b in buf]
                smalls = [b[1] for b in buf]
                input_hw = buf[0][2]
                devs = [b[3] for b in buf]
                frames_dev = None
            if detections_override is not None or group:
                # fused-caption replay: this batch's detections were
                # recorded by the demux pass — no detector work at all
                pending.append((fids, smalls, input_hw, devs, None))
                buf.clear()
                return
            with _span("det_dispatch"):
                if frames_dev is None:
                    frames_dev = _stack_jit(len(devs))(*devs)
                kw = {}
                if (bank is not None
                        and getattr(self.detector, "supports_feats_cache", False)
                        and os.environ.get("BFF_SEG2D_BANK_FEATS", "1") != "0"):
                    # multi-class sweep: bank the text-independent backbone
                    # pyramid per frame chunk; later classes re-run only the
                    # text-conditioned half (models/yolo_world.py split,
                    # models/gdino/model.py split — GDINO banks ~9 MB/frame
                    # bf16, so BFF_SEG2D_BANK_FEATS=0 opts long scenes out).
                    # Pyramids are the bank's largest per-frame item; cap the
                    # banked frame count (default 256 ~= 2.3 GB GDINO /
                    # 1.4 GB YOLO) so downsampled-but-huge scenes can't OOM —
                    # frames past the cap recompute per class, and a key
                    # already present keeps serving (chunk boundaries are
                    # identical across classes).
                    cap = int(os.environ.get("BFF_SEG2D_BANK_FEATS_CAP", "256"))
                    key = ("det_feats", tuple(fids))
                    n_banked = sum(
                        len(k[1]) for k in bank if k[0] == "det_feats")
                    if key in bank or n_banked + len(fids) <= cap:
                        kw["feats_cache"] = (bank, key)
                handle = self.detector.predict_batch_frames_async(
                    frames_dev, query, **kw)
                try:
                    # start the packed-result D2H as soon as detection lands,
                    # overlapping the transfer with the queued SAM/CLIP work
                    handle[0].copy_to_host_async()
                except AttributeError:
                    pass
            pending.append((fids, smalls, input_hw, devs, handle))
            buf.clear()

        # SAM encode dispatches BEFORE the CLIP crop filter (default): the
        # encoder only needs the frame buffer, so the chip runs ViT-H while
        # the host builds/normalizes crops — otherwise the chip idles through
        # that host work. Cost: a frame whose every box the CLIP filter drops
        # has paid its encode; detection-empty frames (the common miss case)
        # never encode either way. BFF_SEG2D_EAGER_SAM=0 restores
        # filter-then-encode.
        eager_sam = os.environ.get("BFF_SEG2D_EAGER_SAM", "1") != "0"

        # SAM embeddings are text-independent too: multi-class sweeps bank
        # each hit frame's embedding under ("sam_emb", fid) so a frame that
        # detects for several classes pays the ViT-H encode (~71 ms GDINO
        # mode / ~21 ms EfficientSAM) once per scene instead of once per
        # class. Embeddings are (g, g, d) ~4 MB f32 per frame, so the banked
        # frame count is capped like the backbone-pyramid bank
        # (BFF_SEG2D_BANK_EMB_CAP, default 256); frames past the cap simply
        # re-encode. BFF_SEG2D_BANK_EMB=0 opts out.
        bank_emb = (bank is not None and device_frames
                    and os.environ.get("BFF_SEG2D_BANK_EMB", "1") != "0")

        def encode_banked(fids, indices, enc_input):
            if not bank_emb and not group:
                return self.sam.encode_frames(enc_input(indices))
            cached = ({i: bank.get(("sam_emb", fid_of(fids[i])))
                       for i in indices} if bank_emb
                      else {i: None for i in indices})
            # dedupe by FRAME: group-mode batches can carry the same frame
            # under several classes — encode it once
            missing, seen = [], set()
            for i in indices:
                if cached[i] is None and fid_of(fids[i]) not in seen:
                    seen.add(fid_of(fids[i]))
                    missing.append(i)
            if missing:
                fresh = self.sam.encode_frames(enc_input(missing))
                fresh_by_fid = {fid_of(fids[i]): fresh[j]
                                for j, i in enumerate(missing)}
                if bank_emb:
                    cap = int(os.environ.get("BFF_SEG2D_BANK_EMB_CAP", "256"))
                    n_banked = sum(1 for k in bank if k[0] == "sam_emb")
                    for i in missing:
                        if n_banked < cap:
                            bank[("sam_emb", fid_of(fids[i]))] = \
                                fresh_by_fid[fid_of(fids[i])]
                            n_banked += 1
                for i in indices:
                    if cached[i] is None:
                        cached[i] = fresh_by_fid[fid_of(fids[i])]
                if len(missing) == len(indices):
                    return fresh
            return _stack_jit(len(indices))(*[cached[i] for i in indices])

        # Three-stage deferred completion (device path): every device result
        # (detection packed, CLIP feats, packed masks) starts its D2H with
        # copy_to_host_async at dispatch and is MATERIALIZED one flush cycle
        # later, so the host never blocks on in-flight device compute in the
        # steady state — the transfers ride the link while the chip works on
        # the next batch. Semantics are identical to the blocking order
        # (phrase filter -> CLIP filter -> cap -> decode); BFF_SEG2D_DEFER=0
        # restores same-cycle resolution for A/B.
        bq: List = []  # awaiting CLIP sims -> decode dispatch
        cq: List = []  # awaiting packed-mask download -> emit

        def demux_stage(fids, devs, handle):
            """Fused-caption detection batch: demux the one packed download
            per class into the output table, and bank hit frames' SAM
            embeddings NOW (the per-class override passes reuse them — the
            encode is text-independent, so one per scene serves the group)."""
            classes_d, spans, out_tab = demux[:3]
            # optional 4th element: per-class box thresholds (classes
            # calibrated to their own operating points)
            thr = demux[3] if len(demux) > 3 else box_thr
            with _span("det_finalize"):
                per_frame = self.detector.predict_finalize_demux(
                    handle, spans, box_threshold=thr,
                    text_threshold=d.text_threshold)
            hit_idx = []
            for i, per_class in enumerate(per_frame):
                hit = False
                for c, det in zip(classes_d, per_class):
                    if det[0].shape[0]:
                        out_tab[(c, fids[i])] = det
                        hit = True
                if hit:
                    hit_idx.append(i)
            if not hit_idx or not bank_emb or two_tier:
                # two-tier buffers are detector-scale — the override pass
                # pays the lazy SAM-scale upload + encode instead
                return
            if batch_upload:
                def enc_input(indices):
                    if len(indices) == devs.shape[0]:
                        return devs
                    return _take_jit()(devs, np.asarray(indices, np.int32))
            else:
                def enc_input(indices):
                    return _stack_jit(len(indices))(*[devs[i] for i in indices])
            with _span("sam_encode_dispatch"):
                encode_banked(fids, hit_idx, enc_input)

        def stage_a():
            batch = pending.pop(0)
            try:
                _stage_a(*batch)
            finally:
                if use_jxt:
                    # native-resolution jxt buffers only serve this batch's
                    # SAM-scale derivation; drop them promptly (~3.8 MB/frame)
                    for e in batch[0]:
                        jxt_native.pop(fid_of(e), None)

        def _stage_a(fids, smalls, input_hw, devs, handle):
            if demux is not None:
                demux_stage(fids, devs, handle)
                return
            with _span("det_finalize"):
                if group:
                    raw = [override_groups[e[1]][e[0]] for e in fids]
                elif handle is None:
                    raw = [detections_override[fid] for fid in fids]
                else:
                    raw = self.detector.predict_finalize(
                        handle, box_threshold=box_thr,
                        text_threshold=d.text_threshold)
            with _span("phrase_filter"):
                pre = [self._phrase_filter(im, query_of(e), det, frame_hw)
                       for e, im, det in zip(fids, smalls, raw)]
            idx = [i for i, p in enumerate(pre) if p is not None]
            if not idx:
                return
            if two_tier:
                # frames with boxes pay their SAM-scale upload now (the
                # detector ran from the smaller detector-scale buffer);
                # misses never upload SAM-scale at all
                with _span("sam_upload"):
                    if use_jxt:
                        # derive SAM-scale buffers ON DEVICE from the
                        # retained native-resolution jxt frames — hit frames
                        # pay no second upload. Frames without a native
                        # (banked det from an earlier class/pass) re-pack
                        # their file's coefficients (~0.5 MB vs ~1.7 MB
                        # YCrCb); spill frames take the host chain.
                        sam_devs = {}
                        jx, host_missing = [], []
                        for i in idx:
                            fid = fid_of(fids[i])
                            cached = (bank.get(("sam", fid))
                                      if bank is not None else None)
                            if cached is not None:
                                sam_devs[i] = cached
                                input_hw = bank[("sam_host", fid)][1]
                            elif fid in jxt_native:
                                jx.append(i)
                            else:
                                packed = _jxt_pack(fid)
                                if packed is not None:
                                    jxt_native[fid] = _jxt.upload_frame(packed)
                                    jx.append(i)
                                else:
                                    host_missing.append(i)
                        if jx:
                            nat = _stack_jit(len(jx))(
                                *[jxt_native[fid_of(fids[i])] for i in jx])
                            res = _jxt.resize_frames(nat, sam_hw)
                            input_hw = sam_hw
                            for j, i in enumerate(jx):
                                fid = fid_of(fids[i])
                                sam_devs[i] = res[j]
                                if bank is not None:
                                    bank[("sam", fid)] = res[j]
                                    bank[("sam_host", fid)] = (None, sam_hw)
                        if host_missing:
                            pairs = [self.sam.scale_frame(
                                smalls[i] if smalls[i] is not None
                                else _load_img(fid_of(fids[i])))
                                for i in host_missing]
                            input_hw = pairs[0][1]
                            ups = (_color.upload_frames(
                                [pr[0] for pr in pairs], yuv=yuv)
                                if batch_upload and len(pairs) > 1 else
                                [_color.upload_frame(pr[0], yuv=yuv)
                                 for pr in pairs])
                            for j, i in enumerate(host_missing):
                                fid = fid_of(fids[i])
                                sam_devs[i] = ups[j]
                                if bank is not None:
                                    bank[("sam", fid)] = ups[j]
                                    bank[("sam_host", fid)] = pairs[j]

                        def enc_input(indices):
                            return _stack_jit(len(indices))(
                                *[sam_devs[i] for i in indices])
                    elif batch_upload and bank is None:
                        pairs = [self.sam.scale_frame(smalls[i]) for i in idx]
                        input_hw = pairs[0][1]
                        sam_batch = _color.upload_frames(
                            [pr[0] for pr in pairs], yuv=yuv)
                        pos_of = {i: j for j, i in enumerate(idx)}

                        def enc_input(indices):
                            if len(indices) == len(idx):
                                return sam_batch
                            return _take_jit()(sam_batch, np.asarray(
                                [pos_of[i] for i in indices], np.int32))
                    elif batch_upload:
                        # bank-aware: reuse banked per-frame buffers, batch-
                        # upload only the missing ones, store their slices
                        sam_devs = {}
                        missing = []
                        for i in idx:
                            cached = bank.get(("sam", fid_of(fids[i])))
                            if cached is not None:
                                sam_devs[i] = cached
                                input_hw = bank[("sam_host", fid_of(fids[i]))][1]
                            else:
                                missing.append(i)
                        if missing:
                            pairs = [self.sam.scale_frame(smalls[i])
                                     for i in missing]
                            input_hw = pairs[0][1]
                            up = _color.upload_frames(
                                [pr[0] for pr in pairs], yuv=yuv)
                            for j, i in enumerate(missing):
                                sam_devs[i] = up[j]
                                bank[("sam", fid_of(fids[i]))] = up[j]
                                bank[("sam_host", fid_of(fids[i]))] = pairs[j]

                        def enc_input(indices):
                            return _stack_jit(len(indices))(
                                *[sam_devs[i] for i in indices])
                    else:
                        sam_devs = {}
                        for i in idx:
                            cached = (bank.get(("sam", fid_of(fids[i])))
                                      if bank is not None else None)
                            if cached is not None:
                                sam_devs[i] = cached
                                input_hw = bank[("sam_host", fid_of(fids[i]))][1]
                                continue
                            small_i, input_hw = self.sam.scale_frame(smalls[i])
                            sam_devs[i] = _color.upload_frame(small_i, yuv=yuv)
                            if bank is not None:
                                bank[("sam", fid_of(fids[i]))] = sam_devs[i]
                                bank[("sam_host", fid_of(fids[i]))] = (
                                    small_i, input_hw)

                        def enc_input(indices):
                            return _stack_jit(len(indices))(
                                *[sam_devs[i] for i in indices])
            elif batch_upload:
                # devs is the whole chunk's (B, h, w, 3) device buffer
                def enc_input(indices):
                    if len(indices) == devs.shape[0]:
                        return devs
                    return _take_jit()(devs, np.asarray(indices, np.int32))
            else:
                def enc_input(indices):
                    return _stack_jit(len(indices))(*[devs[i] for i in indices])
            embs = None
            if eager_sam:
                # SAM encode dispatches BEFORE the CLIP crop filter: the
                # encoder only needs the frame buffer, so the chip runs ViT-H
                # while the host builds/normalizes crops. Cost: a frame whose
                # every box the CLIP filter drops has paid its encode;
                # detection-empty frames never encode either way.
                with _span("sam_encode_dispatch"):
                    embs = encode_banked(fids, idx, enc_input)
            feats_dev = n_crops = counts = None
            if self.clip is not None and d.filter_with_clip:
                if device_crops:
                    with _span("crop_build"):
                        counts = [len(pre[i][0]) for i in idx]
                        boxes_cat = np.concatenate(
                            [pre[i][0] for i in idx]).astype(np.float32)
                        fpos = np.repeat(
                            np.arange(len(idx), dtype=np.int32), counts)
                    if boxes_cat.shape[0]:
                        with _span("clip_dispatch"):
                            if d.kind == "yolo_world":
                                feats_dev, n_crops = \
                                    self.clip.encode_image_boxes(
                                        enc_input(idx), fpos, boxes_cat,
                                        "yolo", frame_hw)
                            else:
                                from beyondff_tpu.models.gdino.model import (
                                    IMAGE_MEAN as _GM, IMAGE_STD as _GS)

                                feats_dev, n_crops = \
                                    self.clip.encode_image_boxes(
                                        enc_input(idx), fpos, boxes_cat,
                                        "gdino", frame_hw, det_hw=det_hw,
                                        det_mean=_GM, det_std=_GS)
                else:
                    with _span("crop_build"):
                        crops: List[np.ndarray] = []
                        counts = []
                        for i in idx:
                            c = self._clip_crops(smalls[i], pre[i][0], frame_hw)
                            crops.extend(c)
                            counts.append(len(c))
                    if crops:
                        with _span("clip_dispatch"):
                            feats_dev, n_crops = self._clip_sims_dispatch(crops)
            bq.append((fids, smalls, input_hw, enc_input, idx, pre,
                       embs, feats_dev, n_crops, counts))

        def stage_b():
            (fids, smalls, input_hw, enc_input, idx, pre,
             embs, feats_dev, n_crops, counts) = bq.pop(0)
            dets_by_i = {}
            if feats_dev is not None:
                with _span("clip_wait"):
                    if group:
                        # one feats download serves every class in the batch;
                        # each entry dots against ITS class's embedding
                        feats_all = self._clip_feats_fetch(feats_dev, n_crops)
                    else:
                        sims_all = self._clip_sims_fetch(
                            feats_dev, n_crops, query)
                with _span("filter_apply"):
                    off = 0
                    for i, n in zip(idx, counts):
                        boxes_xyxy, _scores, phrases = pre[i]
                        if group:
                            sims = feats_all[off:off + n] @ \
                                self.query_embedding(query_of(fids[i]))
                        else:
                            sims = sims_all[off:off + n]
                        off += n
                        keep = sims >= d.similarity_threshold
                        bx = boxes_xyxy[keep]
                        if bx.shape[0]:
                            # the reference replaces detector logits with sims
                            dets_by_i[i] = self._cap_detections(
                                (bx, sims[keep],
                                 [p for p, k in zip(phrases, keep) if k]))
            else:
                dets_by_i = {i: self._cap_detections(pre[i]) for i in idx}
            kept_idx = [i for i in idx if i in dets_by_i]
            if not kept_idx:
                return
            if embs is None:
                with _span("sam_encode_dispatch"):
                    embs = encode_banked(fids, kept_idx, enc_input)
            elif len(kept_idx) < len(idx):
                # narrow the eager-encoded embeddings to frames that still
                # have boxes after the CLIP filter: an entirely-dropped frame
                # has paid its (intended) eager encode, but keeping it in the
                # decode batch would run the SAM decoder on k zero boxes
                pos = [j for j, i in enumerate(idx) if i in dets_by_i]
                embs = embs[np.asarray(pos)]
            dets = [dets_by_i[i] for i in kept_idx]
            with _span("decode_dispatch"):
                flat_dev, sizes = self._decode_masks_dispatch(
                    embs, dets, input_hw, frame_hw)
            cq.append(([(fids[i], smalls[i], dets_by_i[i]) for i in kept_idx],
                       flat_dev, sizes))

        def stage_c():
            kept, flat_dev, sizes = cq.pop(0)
            with _span("decode_wait"):
                masks = self._decode_masks_fetch(flat_dev, sizes, frame_hw)
            with _span("emit"):
                emit(kept, masks)

        # in-flight detection batches: det(t) and det(t+1) queue on device
        # while the host finalizes t-1 — absorbs host-side jitter (JPEG
        # decode, crop building, mask unpacking) without idling the chip
        inflight = int(os.environ.get("BFF_SEG2D_INFLIGHT", "2"))
        # deferred-resolution depth: k = materialize each device download k
        # flush cycles after its dispatch (default 1), 0 = same-cycle
        # (blocking). Depth >1 gives a packed-mask D2H more cycles to ride
        # the link before the host blocks on it (the fast variant's hit
        # regime is download-bound after the clip fix).
        defer = int(os.environ.get("BFF_SEG2D_DEFER", "1") or 1)

        def flush_device():
            dispatch_detection()
            if len(pending) > inflight:
                stage_a()
            while len(bq) > defer:
                stage_b()
            while len(cq) > defer:
                stage_c()

        def flush_host():
            fids, images = zip(*buf)
            if batched:
                raw = self.detector.predict_batch(
                    list(images), query, box_threshold=box_thr,
                    text_threshold=d.text_threshold)
            else:
                raw = [self.detector.predict(im, query, box_threshold=box_thr,
                                             text_threshold=d.text_threshold)
                       for im in images]
            kept = []
            filtered_all = self._detect_and_filter_batch(list(images), raw, query)
            for fid, image, filtered in zip(fids, images, filtered_all):
                if filtered is not None:
                    kept.append((fid, image, filtered))
            if kept:
                masks = self._segment_frames([k[1] for k in kept], [k[2] for k in kept])
                emit(kept, masks)
            buf.clear()

        flush = flush_device if device_frames else flush_host

        depth = int(os.environ.get("BFF_SEG2D_PREFETCH", "0")) or (
            3 * max(1, d.frame_batch))
        # >1 loader threads let JPEG decode (releases the GIL) overlap the
        # upload RPC's network wait even on the one-core host
        workers = int(os.environ.get("BFF_SEG2D_WORKERS", "1"))
        if batch_upload:
            bsz = max(1, d.frame_batch)
            chunks = [frame_ids[i:i + bsz] for i in range(0, len(frame_ids), bsz)]
            it = iter(prefetch_map(load_chunk, chunks,
                                   depth=max(1, depth // bsz), workers=workers))
            while True:
                with _span("prefetch_wait"):
                    item = next(it, None)
                if item is None:
                    break
                buf.append(item)
                flush()
        else:
            it = iter(prefetch_map(load, frame_ids, depth=depth, workers=workers))
            while True:
                with _span("prefetch_wait"):
                    item = next(it, None)
                if item is None:
                    break
                buf.append(item)
                if len(buf) == max(1, d.frame_batch):
                    flush()
            if buf:
                flush()
        while pending:
            stage_a()
        while bq:
            stage_b()
        while cq:
            stage_c()
        if trace is not None:
            total = sum(trace.values())
            parts = " ".join(f"{k}={v * 1000:.0f}ms" for k, v in
                             sorted(trace.items(), key=lambda kv: -kv[1]))
            print(f"# seg2d host trace [{scene_id}] total={total * 1000:.0f}ms "
                  f"({len(frame_ids)} frames): {parts}", flush=True)
        return records_by_class if group else records


def run(cfg: Config, class_name: str, scenes: Optional[Sequence[str]] = None,
        resume: bool = True, segmentor: Optional[Segmentor2D] = None) -> List[Dict]:
    """Per-class driver. Scene list defaults to the stage-1 results dir
    (reference scene discovery: segmentation_2d.py:453-454)."""
    p = cfg.paths
    if scenes is None:
        scenes = sorted(
            f.rsplit(".", 1)[0]
            for f in os.listdir(p.stage_1_results_dir)
            if f.endswith((".pth", ".npz"))
        )
    from beyondff_tpu.utils.profiling import StageProfiler

    prof = StageProfiler("segmentation_2d")
    seg = segmentor or Segmentor2D(cfg)
    ckpt = SceneCheckpoint(p.checkpoint_dir, "segmentation_2d", class_name)
    results = []
    for scene_id in scenes:
        if resume and ckpt.done(scene_id):
            continue
        frame_ids = bio.list_scene_frames(p.scene_2d_dir, scene_id,
                                          cfg.frames.downsample_ratio)
        with prof.span("scene", frames=len(frame_ids)):
            records = seg.process_scene(scene_id, class_name)
        n_frames = len(records)
        rle.encode_frame_masks(records)
        out = os.path.join(p.mask_2d_dir, class_name, f"{scene_id}.{cfg.output_format}")
        bio.save_frame_records(out, records)
        ckpt.mark(scene_id)
        results.append({"scene_id": scene_id, "frames_with_boxes": n_frames})
    if results:
        print(prof.report())
    return results


def _fused_groups(detector, classes: Sequence[str], group_size: int):
    """Split ``classes`` into fused-caption groups: greedy ``group_size``
    chunks, bisected when a chunk overflows the detector's text budget
    (``caption_spans`` raises on span/class mismatch). Returns
    ``[(group_classes, caption, spans), ...]`` preserving class order."""
    out = []

    def fit(group):
        try:
            caption, spans = detector.caption_spans(group)
        except ValueError:
            if len(group) == 1:
                raise
            mid = len(group) // 2
            fit(group[:mid])
            fit(group[mid:])
            return
        out.append((group, caption, spans))

    for i in range(0, len(classes), max(1, group_size)):
        fit(list(classes[i:i + group_size]))
    return out


def run_classes(cfg: Config, class_names: Sequence[str],
                scenes: Optional[Sequence[str]] = None, resume: bool = True,
                segmentor: Optional[Segmentor2D] = None,
                class_thresholds: Optional[Dict[str, float]] = None,
                ) -> Dict[str, List[Dict]]:
    """Multi-class 2D stage with SCENE-OUTER ordering: each scene's frames
    are JPEG-decoded and uploaded to the device ONCE (a per-scene
    ``frame_bank``) and every class's detection pass reuses them.

    The reference sweep re-reads and re-ships every frame per class
    (run_evl.py:103-118 x segmentation_2d.py:469-478). Detection itself is
    query-conditioned so it must re-run per class, but on the fast
    (YOLO-World) variant detection is ~5 ms/frame and the per-class cost is
    dominated by exactly the IO this amortizes. The bank also holds the
    text-independent halves of the device work: detector backbone pyramids
    (both detectors' backbone()/detect() split) and SAM encoder embeddings
    for hit frames — later classes re-run only the text-conditioned
    detection half and the box decode. Checkpoints stay per-(class, scene),
    interchangeable with :func:`run`.

    ``detector.fused_captions`` (BFF_SEG2D_FUSED=1/0 overrides): instead of
    one text-conditioned detection pass per class, each scene runs ONE fused
    multi-phrase detection pass per ``fused_group`` classes (" . "-joined
    caption, both detectors' native protocol) and per-class results demux —
    GDINO by caption token span, YOLO-World by argmax class assignment; each
    class then replays only the CLIP-filter -> SAM-decode half over its
    detected frames. Detections are protocol-adjacent, not byte-identical,
    to per-class captions (shared image pathway + top-K), so the mode is
    opt-in.

    ``class_thresholds``: optional per-class ``box_threshold`` overrides —
    classes tuned to different operating points keep them through both the
    per-class and the fused-demux paths (absent classes use
    ``detector.box_threshold``)."""
    p = cfg.paths
    if scenes is None:
        scenes = sorted(
            f.rsplit(".", 1)[0]
            for f in os.listdir(p.stage_1_results_dir)
            if f.endswith((".pth", ".npz"))
        )
    from beyondff_tpu.utils.profiling import StageProfiler

    prof = StageProfiler("segmentation_2d")
    seg = segmentor or Segmentor2D(cfg)
    env = os.environ.get("BFF_SEG2D_FUSED")
    fused = (cfg.detector.fused_captions if env is None else env == "1") \
        and len(class_names) > 1 \
        and cfg.detector.device_frames \
        and hasattr(seg.detector, "caption_spans") \
        and hasattr(seg.detector, "predict_finalize_demux") \
        and hasattr(seg.detector, "predict_batch_frames_async") \
        and hasattr(seg.sam, "encode_frames")
    ckpts = {c: SceneCheckpoint(p.checkpoint_dir, "segmentation_2d", c)
             for c in class_names}
    results: Dict[str, List[Dict]] = {c: [] for c in class_names}
    for scene_id in scenes:
        todo = [c for c in class_names
                if not (resume and ckpts[c].done(scene_id))]
        if not todo:
            continue
        frame_bank: Dict = {}  # lives for this scene only
        frame_ids = bio.list_scene_frames(p.scene_2d_dir, scene_id,
                                          cfg.frames.downsample_ratio)

        def finish(c, records):
            rle.encode_frame_masks(records)
            out = os.path.join(p.mask_2d_dir, c,
                               f"{scene_id}.{cfg.output_format}")
            bio.save_frame_records(out, records)
            ckpts[c].mark(scene_id)
            results[c].append({"scene_id": scene_id,
                               "frames_with_boxes": len(records)})

        if fused and len(todo) > 1:
            for group, caption, spans in _fused_groups(
                    seg.detector, todo, cfg.detector.fused_group):
                dets: Dict = {}
                dmx = (group, spans, dets)
                if class_thresholds:
                    dmx += ([class_thresholds.get(c, cfg.detector.box_threshold)
                             for c in group],)
                with prof.span("fused_detect", frames=len(frame_ids)):
                    seg.process_scene(scene_id, caption,
                                      frame_bank=frame_bank,
                                      demux=dmx)
                tables = {c: {fid: det for (cc, fid), det in dets.items()
                              if cc == c} for c in group}
                # COMBINED replay: one pipeline pass serves the whole group
                # — mixed-class batches share every flush cycle's device
                # dispatches and D2H transfers (per-entry math identical to
                # per-class detections_override replays)
                with prof.span("scene", frames=len(frame_ids)):
                    by_class = seg.process_scene(
                        scene_id, caption, frame_bank=frame_bank,
                        override_groups=tables)
                for c in group:
                    finish(c, by_class[c])
            continue
        for c in todo:
            with prof.span("scene", frames=len(frame_ids)):
                records = seg.process_scene(
                    scene_id, c, frame_bank=frame_bank,
                    box_threshold=(class_thresholds or {}).get(c))
            finish(c, records)
    if any(results.values()):
        print(prof.report())
    return results
