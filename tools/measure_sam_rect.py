"""Measure the rect-encode (pad-free) SAM mode: speed + output deviation.

BFF_SAM_RECT=1 encodes only the valid patch rows (48x64 for ScanNet's
1024x765 scaled frames) instead of the zero-padded 64x64 square. The
dropped tokens are pure pad content, but they DO participate in the square
path's global-attention softmax and boundary windows, so this mode is a
documented deviation (PARITY.md). This tool measures, at ViT-H production
shape:

  - encoder wall clock square vs rect
  - embedding deviation over the valid grid region
  - decoded-mask bit agreement (IoU) for box prompts

BFF_RECT_TEMP_SWEEP=1 additionally re-measures the deviation at scaled
attention temperatures (q-projection columns x2/x4/x8): random-init qk
logits are near zero so softmax is maximally diffuse and every pad token
gets ~uniform weight — the worst case for dropping them. Trained
checkpoints have peaky attention; scaling q raises logit variance toward
that regime, bounding how much of the measured deviation is a random-init
artifact (VERDICT r3 item 6b).

    python tools/measure_sam_rect.py
    BFF_RECT_TEMP_SWEEP=1 python tools/measure_sam_rect.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.models import sam as sam_mod

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    iters = int(os.environ.get("BFF_AB_ITERS", "8"))

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jax.device_get(leaves[0].reshape(-1)[0].astype(jnp.float32)))

    def timed(name, fn):
        t0 = time.time()
        sync(fn())
        print(f"# {name}: compile+first {time.time() - t0:.1f}s", flush=True)
        best = None
        for _ in range(2):
            t0 = time.time()
            out = None
            for _ in range(iters):
                out = fn()
            sync(out)
            dt = (time.time() - t0) / iters
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best * 1000:.1f} ms", flush=True)
        return out

    # ScanNet geometry: 1296x968 frame -> long-side-1024 -> (765, 1024)
    nh, nw = 765, 1024
    frame = rng.integers(0, 255, (1, nh, nw, 3), dtype=np.uint8)
    frame_dev = jnp.asarray(frame)
    boxes = np.array([[100, 80, 600, 500], [300, 200, 900, 700],
                      [50, 50, 200, 300], [400, 100, 1000, 760]], np.float32)
    boxes = boxes[None]  # (1, 4, 4) padded-square pixels

    def scale_attn_temp(params, t):
        """Scale the q columns of every encoder qkv projection by t (on
        device): logits scale by t, softmax gets peakier (trained-like)."""
        import jax.tree_util as jtu

        def fn(path, leaf):
            keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            if "encoder" not in keys or "qkv" not in keys:
                return leaf
            c = leaf.shape[-1] // 3
            if keys[-1] == "kernel":
                return jnp.concatenate([leaf[:, :c] * t, leaf[:, c:]], axis=-1)
            if keys[-1] == "bias":
                return jnp.concatenate([leaf[:c] * t, leaf[c:]])
            return leaf

        return jtu.tree_map_with_path(fn, params)

    temps = [1.0]
    if os.environ.get("BFF_RECT_TEMP_SWEEP"):
        temps += [2.0, 4.0, 8.0]

    results = {}
    sams = {}
    for flag, label in (("0", "square 64x64"), ("1", "rect 48x64")):
        os.environ["BFF_SAM_RECT"] = flag
        sam = sam_mod.SAM.create("vit_h", dtype=dtype, device_fill=True)
        sams[flag] = (sam, sam.params)
        emb = timed(f"encode [{label}]", lambda: sam.encode_frames(frame_dev))
        packed, iou = sam.decode_boxes_packed(emb, boxes, (nh, nw), (968, 1296))
        results[(flag, 1.0)] = (np.asarray(jax.device_get(emb), np.float32),
                                np.asarray(jax.device_get(packed)),
                                np.asarray(jax.device_get(iou), np.float32))
        for t in temps[1:]:
            sam.params = scale_attn_temp(sams[flag][1], t)
            emb = sam.encode_frames(frame_dev)
            packed, iou = sam.decode_boxes_packed(emb, boxes, (nh, nw), (968, 1296))
            results[(flag, t)] = (np.asarray(jax.device_get(emb), np.float32),
                                  np.asarray(jax.device_get(packed)),
                                  np.asarray(jax.device_get(iou), np.float32))
        sam.params = sams[flag][1]
    os.environ.pop("BFF_SAM_RECT", None)

    for t in temps:
        emb_sq, packed_sq, iou_sq = results[("0", t)]
        emb_r, packed_r, iou_r = results[("1", t)]
        gh, gw = emb_r.shape[1], emb_r.shape[2]
        valid_sq = emb_sq[:, :gh, :gw]
        rel = np.linalg.norm(emb_r - valid_sq) / (np.linalg.norm(valid_sq) + 1e-12)
        bits_sq = np.unpackbits(packed_sq, axis=-1, bitorder="little")
        bits_r = np.unpackbits(packed_r, axis=-1, bitorder="little")
        inter = np.logical_and(bits_sq, bits_r).sum(-1)
        union = np.logical_or(bits_sq, bits_r).sum(-1)
        iou_masks = inter / np.maximum(union, 1)
        tag = "" if t == 1.0 else f" [attn temp x{t:g}]"
        print(f"embedding rel L2 over valid {gh}x{gw} region{tag}: {rel:.4f}")
        print(f"decoded-mask IoU square-vs-rect per box{tag}: "
              f"{np.round(iou_masks[0], 4)}")
        print(f"iou-prediction delta{tag}: {np.abs(iou_sq - iou_r).max():.5f}")


if __name__ == "__main__":
    main()
