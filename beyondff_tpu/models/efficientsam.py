"""EfficientSAM in flax: plain-ViT (SAMI) encoder + SAM-style mask decoder.

The reference ships EfficientSAM-S only as a TorchScript binary prompted per
box with best-of-3 mask selection by predicted IoU
(reference: tools/segmentation_2d_yolo_world.py:230-286). TorchScript cannot
run on TPU; this is a native rebuild sharing the prompt/decoder modules with
:mod:`beyondff_tpu.models.sam` — the encoder is a windowless ViT without
relative position embeddings.

``convert_torch_checkpoint`` maps the public ``efficient_sam_vits.pt`` /
``vitt.pt`` state dicts (the weights inside the TorchScript archive share the
same parameter names).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from beyondff_tpu.models import sam as sam_mod
from beyondff_tpu.models.sam import SAM, SAMConfig

PRESETS = {
    # ViT-S (EfficientSAM-S) and ViT-T (EfficientSAM-Ti)
    "vits": SAMConfig(encoder_dim=384, encoder_depth=12, encoder_heads=6,
                      global_attn_indexes=tuple(range(12)), use_rel_pos=False),
    "vitt": SAMConfig(encoder_dim=192, encoder_depth=12, encoder_heads=3,
                      global_attn_indexes=tuple(range(12)), use_rel_pos=False),
    "test": SAMConfig(img_size=64, patch_size=8, encoder_dim=32, encoder_depth=2,
                      encoder_heads=2, global_attn_indexes=(0, 1), use_rel_pos=False,
                      prompt_dim=32, decoder_mlp_dim=64),
}


class EfficientSAM(SAM):
    """SAM wrapper with the reference's best-of-3 multimask selection."""

    def __init__(self, cfg: SAMConfig, params, dtype=jnp.float32):
        super().__init__(cfg, params, dtype=dtype)
        self._decode_multi = jax.jit(
            lambda p, e, b: self.module.apply(p, e, b, method=_decode_boxes_multi)
        )

    @classmethod
    def create(cls, name_or_cfg="vits", seed: int = 0, dtype=jnp.float32) -> "EfficientSAM":
        cfg = PRESETS[name_or_cfg] if isinstance(name_or_cfg, str) else name_or_cfg
        base = SAM.create(cfg, seed=seed, dtype=dtype)
        return cls(cfg, base.params, dtype=dtype)

    def decode_boxes_best(self, embedding, boxes) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Best-of-multimask decode: per box, the mask whose predicted IoU is
        highest (reference: segmentation_2d_yolo_world.py:243-286).

        Returns (masks (B, 4g, 4g) logits, best predicted IoU (B,))."""
        return self._decode_multi(self.params, embedding, jnp.asarray(boxes, jnp.float32))

    def _box_decode_method(self):
        # the packed batch decode picks the best-of-multimask output too, so
        # the pipelined driver matches the reference's per-box selection
        return _decode_boxes_multi


def _decode_boxes_multi(module: sam_mod.SAMModule, image_emb, boxes):
    sparse = module.prompt.encode_boxes(boxes)
    dense_pe = module.prompt.dense_pe()
    no_mask = module.prompt.no_mask_embedding().astype(module.dtype)
    masks, iou = module.decoder(image_emb + no_mask[None, None, :], dense_pe, sparse)
    best = jnp.argmax(iou, axis=1)
    rows = jnp.arange(masks.shape[0])
    return masks[rows, best], iou[rows, best]


# --------------------------------------------------------------- conversion
def convert_torch_checkpoint(path: str, cfg: SAMConfig) -> dict:
    """Public EfficientSAM checkpoint -> flax params.

    EfficientSAM's parameter names differ from SAM's; keys are normalized to
    SAM naming first, then routed through the SAM converter mapping.
    """
    import torch

    from beyondff_tpu.models.convert_util import RecordingDict, assert_all_consumed

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in sd:
        sd = sd["model"]
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
        # EfficientSAM pos embed includes a cls slot in some releases; keep grid part
        "pos_embed": _grid_pos_embed(t["image_encoder.pos_embed"], cfg),
        "neck_conv1": {"kernel": t["image_encoder.neck.0.weight"].transpose(2, 3, 1, 0)},
        "neck_ln1": ln("image_encoder.neck.1"),
        "neck_conv2": {"kernel": t["image_encoder.neck.2.weight"].transpose(2, 3, 1, 0)},
        "neck_ln2": ln("image_encoder.neck.3"),
    }
    for i in range(cfg.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        enc[f"block{i}"] = {
            "ln1": ln(f"{p}.norm1"),
            "ln2": ln(f"{p}.norm2"),
            "attn": {"qkv": dense(f"{p}.attn.qkv"), "proj": dense(f"{p}.attn.proj")},
            "mlp": {"fc1": dense(f"{p}.mlp.lin1"), "fc2": dense(f"{p}.mlp.lin2")},
        }
    # prompt + decoder share SAM naming in the public checkpoint; the shared
    # RecordingDict keeps one consumption ledger across both mappings
    full = sam_mod.convert_torch_checkpoint(path, cfg, _sd=t, strict=False)
    full["params"]["encoder"] = jax.tree_util.tree_map(jnp.asarray, enc)
    assert_all_consumed(
        t, ignore=(r"num_batches_tracked$", r"^prompt_encoder\.mask_downscaling\."),
        context="EfficientSAM checkpoint")
    return full


def _grid_pos_embed(pos: np.ndarray, cfg: SAMConfig) -> np.ndarray:
    g = cfg.img_size // cfg.patch_size
    if pos.ndim == 3:  # (1, n_tokens, d) possibly with cls token
        n = pos.shape[1]
        if n == g * g + 1:
            pos = pos[:, 1:]
        return pos.reshape(1, g, g, -1)
    return pos
