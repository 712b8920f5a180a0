"""Checkpoint converter: public ``groundingdino_swin{b,t}_*.pth`` -> flax params.

Maps the official Grounding-DINO state dict (module names per the upstream
repo: ``backbone.0`` Swin, ``bert`` HF BertModel, ``feat_map`` resizer,
``input_proj`` conv+GN stacks, ``transformer.encoder.{layers,text_layers,
fusion_layers}``, ``transformer.decoder.layers`` with ``cross_attn``/
``ca_text``/``self_attn``, shared ``bbox_embed``) onto
:class:`beyondff_tpu.models.gdino.model.GDINOModule`'s tree.

Any unmapped/missing source keys are collected and raised together so a
mismatch against a particular checkpoint release is diagnosable in one pass.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from beyondff_tpu.models.gdino.model import GDINOConfig


from beyondff_tpu.models.convert_util import (  # noqa: F401 (re-export)
    ConversionError,
    RecordingDict,
    assert_all_consumed,
)

# checkpoint keys that are legitimately not part of the inference graph:
# the BERT pooler head (unused by Grounding-DINO), HF position-id buffers,
# and the duplicated names that module sharing produces in the state dict
# (decoder bbox_embed is one shared MLP registered under every layer index
# and again under transformer.decoder, upstream groundingdino.models)
IGNORED_CHECKPOINT_KEYS = (
    r"bert\.pooler\.",
    r"position_ids$",
    r"^bbox_embed\.[1-9]\d*\.",
    r"^transformer\.decoder\.bbox_embed\.",
    r"^label_enc\.",
    r"num_batches_tracked$",
    # Swin registers these as persistent buffers; they are pure index tables
    # recomputed from the window size at trace time here
    r"relative_position_index$",
    r"attn_mask$",
)


def convert_torch_checkpoint(path: str, cfg: GDINOConfig, strict: bool = True) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    t = RecordingDict({k.replace("module.", ""): v.float().numpy() for k, v in sd.items()})
    missing: List[str] = []

    def get(key):
        if key not in t:
            missing.append(key)
            return np.zeros(1, np.float32)
        return t[key]

    def dense(prefix):
        return {"kernel": get(f"{prefix}.weight").T, "bias": get(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    def mha(prefix):
        """torch MultiheadAttention -> our Attention (q/k/v/proj)."""
        w = get(f"{prefix}.in_proj_weight")
        bias = get(f"{prefix}.in_proj_bias")
        qw, kw, vw = np.split(w, 3, 0)
        qb, kb, vb = np.split(bias, 3, 0)
        return {
            "q": {"kernel": qw.T, "bias": qb},
            "k": {"kernel": kw.T, "bias": kb},
            "v": {"kernel": vw.T, "bias": vb},
            "proj": dense(f"{prefix}.out_proj"),
        }

    def deform(prefix):
        return {
            "sampling_offsets": dense(f"{prefix}.sampling_offsets"),
            "attention_weights": dense(f"{prefix}.attention_weights"),
            "value_proj": dense(f"{prefix}.value_proj"),
            "output_proj": dense(f"{prefix}.output_proj"),
        }

    # ------------------------------------------------------------- backbone
    sw = cfg.swin
    backbone: Dict = {
        "patch_embed": {
            "kernel": get("backbone.0.patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": get("backbone.0.patch_embed.proj.bias"),
        },
        "patch_norm": ln("backbone.0.patch_embed.norm"),
    }
    for si, depth in enumerate(sw.depths):
        for bi in range(depth):
            p = f"backbone.0.layers.{si}.blocks.{bi}"
            backbone[f"stage{si}_block{bi}"] = {
                "ln1": ln(f"{p}.norm1"),
                "ln2": ln(f"{p}.norm2"),
                "attn": {
                    "qkv": dense(f"{p}.attn.qkv"),
                    "proj": dense(f"{p}.attn.proj"),
                    "rel_bias_table": get(f"{p}.attn.relative_position_bias_table"),
                },
                "mlp_fc1": dense(f"{p}.mlp.fc1"),
                "mlp_fc2": dense(f"{p}.mlp.fc2"),
            }
        if si < len(sw.depths) - 1:
            p = f"backbone.0.layers.{si}.downsample"
            backbone[f"merge{si}"] = {
                "norm": ln(f"{p}.norm"),
                "reduction": {"kernel": get(f"{p}.reduction.weight").T},
            }
    for si in sw.out_indices:
        backbone[f"out_norm{si}"] = ln(f"backbone.0.norm{si}")

    # ----------------------------------------------------------------- bert
    bert: Dict = {
        "word_emb": {"embedding": get("bert.embeddings.word_embeddings.weight")},
        "pos_emb": get("bert.embeddings.position_embeddings.weight"),
        "type_emb": get("bert.embeddings.token_type_embeddings.weight"),
        "emb_ln": ln("bert.embeddings.LayerNorm"),
    }
    for i in range(cfg.bert.layers):
        p = f"bert.encoder.layer.{i}"
        bert[f"layer{i}"] = {
            "q": dense(f"{p}.attention.self.query"),
            "k": dense(f"{p}.attention.self.key"),
            "v": dense(f"{p}.attention.self.value"),
            "attn_out": dense(f"{p}.attention.output.dense"),
            "ln1": ln(f"{p}.attention.output.LayerNorm"),
            "fc1": dense(f"{p}.intermediate.dense"),
            "fc2": dense(f"{p}.output.dense"),
            "ln2": ln(f"{p}.output.LayerNorm"),
        }

    params: Dict = {"backbone": backbone, "bert": bert, "feat_map": dense("feat_map")}

    # ---------------------------------------------------------- input projs
    for li in range(cfg.levels):
        params[f"input_proj{li}"] = {
            "kernel": get(f"input_proj.{li}.0.weight").transpose(2, 3, 1, 0),
            "bias": get(f"input_proj.{li}.0.bias"),
        }
        params[f"input_gn{li}"] = ln(f"input_proj.{li}.1")

    params["level_embed"] = get("transformer.level_embed")

    # -------------------------------------------------------------- encoder
    for i in range(cfg.enc_layers):
        img_p = f"transformer.encoder.layers.{i}"
        txt_p = f"transformer.encoder.text_layers.{i}"
        fus_p = f"transformer.encoder.fusion_layers.{i}"
        params[f"enc{i}"] = {
            "deform": deform(f"{img_p}.self_attn"),
            "img_ln1": ln(f"{img_p}.norm1"),
            "img_fc1": dense(f"{img_p}.linear1"),
            "img_fc2": dense(f"{img_p}.linear2"),
            "img_ln2": ln(f"{img_p}.norm2"),
            "text_attn": mha(f"{txt_p}.self_attn"),
            "text_ln1": ln(f"{txt_p}.norm1"),
            "text_fc1": dense(f"{txt_p}.linear1"),
            "text_fc2": dense(f"{txt_p}.linear2"),
            "text_ln2": ln(f"{txt_p}.norm2"),
            "fusion": {
                "v_proj": dense(f"{fus_p}.attn.v_proj"),
                "l_proj": dense(f"{fus_p}.attn.l_proj"),
                "values_v_proj": dense(f"{fus_p}.attn.values_v_proj"),
                "values_l_proj": dense(f"{fus_p}.attn.values_l_proj"),
                "out_v_proj": dense(f"{fus_p}.attn.out_v_proj"),
                "out_l_proj": dense(f"{fus_p}.attn.out_l_proj"),
                "gamma_v": get(f"{fus_p}.gamma_v"),
                "gamma_l": get(f"{fus_p}.gamma_l"),
                "ln_v": ln(f"{fus_p}.layer_norm_v"),
                "ln_l": ln(f"{fus_p}.layer_norm_l"),
            },
        }

    # ------------------------------------------------- query selection bits
    params["enc_output"] = dense("transformer.enc_output")
    params["enc_output_ln"] = ln("transformer.enc_output_norm")
    params["tgt_embed"] = get("transformer.tgt_embed.weight")
    params["enc_bbox_head"] = {
        f"fc{i}": dense(f"transformer.enc_out_bbox_embed.layers.{i}") for i in range(3)
    }

    # -------------------------------------------------------------- decoder
    for i in range(cfg.dec_layers):
        p = f"transformer.decoder.layers.{i}"
        params[f"dec{i}"] = {
            "self_attn": mha(f"{p}.self_attn"),
            "ln1": ln(f"{p}.norm2"),  # upstream: norm2 follows self-attn
            "text_cross": mha(f"{p}.ca_text"),
            "ln_text": ln(f"{p}.catext_norm"),
            "deform": deform(f"{p}.cross_attn"),
            "ln2": ln(f"{p}.norm1"),  # upstream: norm1 follows cross-attn
            "fc1": dense(f"{p}.linear1"),
            "fc2": dense(f"{p}.linear2"),
            "ln3": ln(f"{p}.norm3"),
        }
    params["dec_norm"] = ln("transformer.decoder.norm")
    params["ref_point_fc1"] = dense("transformer.decoder.ref_point_head.layers.0")
    params["ref_point_fc2"] = dense("transformer.decoder.ref_point_head.layers.1")
    # bbox_embed is a list sharing one set of weights when
    # dec_pred_bbox_embed_share=True (the released checkpoints)
    params["bbox_head"] = {f"fc{i}": dense(f"bbox_embed.0.layers.{i}") for i in range(3)}

    if missing:
        raise ConversionError(
            f"{len(missing)} keys missing from checkpoint (first 20): {missing[:20]}"
        )
    if strict:
        assert_all_consumed(t, ignore=IGNORED_CHECKPOINT_KEYS,
                            context="Grounding-DINO checkpoint")
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}
