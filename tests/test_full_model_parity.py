"""FULL-MODEL numerical parity against the installed official architectures.

The environment ships transformers' official ``GroundingDinoForObjectDetection``,
``SamModel``, ``CLIPModel`` and ``BertModel`` — executable specifications of
the exact models the reference pipeline loads from checkpoints
(reference: tools/segmentation_2d.py:65-106, tools/refinement.py:147).
Real weights are unavailable offline, so each test instantiates the official
torch model at a small (but architecturally faithful) config, RANDOMIZES its
parameters, renames the state dict to the original checkpoint layout
(beyondff_tpu.models.hf_compat) and feeds it through the PRODUCTION
converters — then asserts the whole forward matches at float32.

This pins, in one pass, everything the per-submodule pins
(tests/test_torch_parity.py) cannot see: inter-module wiring, query
selection, box-head composition, backbone plumbing, and the converter key
maps themselves.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from beyondff_tpu.models import hf_compat  # noqa: E402


def _randomize(model, rng, std=0.15):
    """Fill every parameter with non-degenerate random values (LayerNorm/
    GroupNorm scales stay near 1 so activations neither vanish nor blow up)."""
    with torch.no_grad():
        for name, p in model.named_parameters():
            vals = rng.normal(0.0, std, p.shape).astype(np.float32)
            if name.endswith(".weight") and p.ndim == 1:
                vals = 1.0 + 0.1 * vals  # norm scales
            p.copy_(torch.from_numpy(vals))
    return model


def _save_sd(tmp_path, sd, name):
    path = str(tmp_path / name)
    torch.save(sd, path)
    return path


# ----------------------------------------------------------------------- BERT
def test_bert_full_model_matches_hf(rng):
    """Our BertEncoder (gdino text branch) vs the official BertModel under the
    3-D sub-sentence attention mask and restarting position ids."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    from beyondff_tpu.models.gdino import bert as bert_mod

    hf_cfg = HFBertConfig(vocab_size=150, hidden_size=32, num_hidden_layers=3,
                          num_attention_heads=2, intermediate_size=64,
                          max_position_embeddings=32,
                          hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = _randomize(BertModel(hf_cfg, add_pooling_layer=False).eval(), rng)

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    def dense(p):
        return {"kernel": sd[f"{p}.weight"].T, "bias": sd[f"{p}.bias"]}

    def ln(p):
        return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}

    params = {
        "word_emb": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "pos_emb": sd["embeddings.position_embeddings.weight"],
        "type_emb": sd["embeddings.token_type_embeddings.weight"],
        "emb_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(hf_cfg.num_hidden_layers):
        p = f"encoder.layer.{i}"
        params[f"layer{i}"] = {
            "q": dense(f"{p}.attention.self.query"),
            "k": dense(f"{p}.attention.self.key"),
            "v": dense(f"{p}.attention.self.value"),
            "attn_out": dense(f"{p}.attention.output.dense"),
            "ln1": ln(f"{p}.attention.output.LayerNorm"),
            "fc1": dense(f"{p}.intermediate.dense"),
            "fc2": dense(f"{p}.output.dense"),
            "ln2": ln(f"{p}.output.LayerNorm"),
        }

    ids = np.array([[101, 7, 8, 120, 9, 10, 11, 120, 102]], np.int64)
    mask3d, pos_ids = bert_mod.subsentence_masks(ids, [120], 101, 102)

    want = hf(input_ids=torch.from_numpy(ids),
              attention_mask=torch.from_numpy(mask3d),
              position_ids=torch.from_numpy(pos_ids.astype(np.int64)),
              ).last_hidden_state.detach().numpy()

    cfg = bert_mod.BertConfig(vocab_size=150, hidden=32, layers=3, heads=2,
                              intermediate=64, max_position=32)
    got = bert_mod.BertEncoder(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask3d),
        jnp.asarray(pos_ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


# ----------------------------------------------------------------------- CLIP
def test_clip_full_model_matches_hf(rng, tmp_path):
    """Our CLIP towers vs the official CLIPModel, weights routed through
    hf_compat.clip_hf_to_original + the production converter."""
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel

    from beyondff_tpu.models import clip as clip_mod

    hf_cfg = HFCLIPConfig(
        projection_dim=32,
        text_config={"vocab_size": 64, "hidden_size": 32, "num_hidden_layers": 2,
                     "num_attention_heads": 2, "intermediate_size": 128,
                     "max_position_embeddings": 16, "eos_token_id": 63,
                     "hidden_act": "quick_gelu"},
        vision_config={"hidden_size": 32, "num_hidden_layers": 2,
                       "num_attention_heads": 2, "intermediate_size": 128,
                       "image_size": 28, "patch_size": 14,
                       "hidden_act": "quick_gelu"},
    )
    hf = _randomize(CLIPModel(hf_cfg).eval(), rng)
    path = _save_sd(tmp_path, hf_compat.clip_hf_to_original(hf.state_dict()), "clip.pth")

    cfg = clip_mod.CLIPConfig(embed_dim=32, image_resolution=28, vision_layers=2,
                              vision_width=32, vision_heads=2, vision_patch=14,
                              context_length=16, vocab_size=64, text_width=32,
                              text_heads=2, text_layers=2)
    params = clip_mod.convert_torch_checkpoint(path, cfg)
    model = clip_mod.CLIP(cfg, params)

    imgs = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    want_img = hf.get_image_features(
        pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))).detach().numpy()
    got_img = np.asarray(model.encode_image(imgs))
    np.testing.assert_allclose(got_img, want_img, atol=5e-4, rtol=1e-3)

    # EOS (=63, the highest id) last so HF pooling and OpenAI argmax pooling
    # agree — the convention the reference's clip package uses
    toks = np.array([[5, 9, 12, 30, 63, 0, 0, 0],
                     [5, 21, 63, 0, 0, 0, 0, 0]], np.int64)
    want_txt = hf.get_text_features(input_ids=torch.from_numpy(toks)).detach().numpy()
    got_txt = np.asarray(model.encode_text(toks))
    np.testing.assert_allclose(got_txt, want_txt, atol=1e-4, rtol=1e-3)


# ------------------------------------------------------------------------ SAM
def test_sam_full_model_matches_hf(rng, tmp_path):
    """Our SAM (encoder + box-prompted decoder) vs the official SamModel,
    weights via hf_compat.sam_hf_to_original + the production converter."""
    from transformers import SamConfig as HFSamConfig
    from transformers import SamModel

    from beyondff_tpu.models import sam as sam_mod

    img_size, patch = 64, 8
    hf_cfg = HFSamConfig(
        vision_config={"hidden_size": 32, "num_hidden_layers": 3,
                       "num_attention_heads": 2, "image_size": img_size,
                       "patch_size": patch, "window_size": 4,
                       "global_attn_indexes": [1], "output_channels": 32,
                       "num_pos_feats": 16,
                       "mlp_dim": 128, "use_abs_pos": True, "use_rel_pos": True},
        prompt_encoder_config={"hidden_size": 32, "image_size": img_size,
                               "patch_size": patch, "mask_input_channels": 4,
                               "image_embedding_size": img_size // patch},
        mask_decoder_config={"hidden_size": 32, "num_attention_heads": 2,
                             "mlp_dim": 64, "iou_head_hidden_dim": 32},
    )
    hf = _randomize(SamModel(hf_cfg).eval(), rng)
    path = _save_sd(tmp_path, hf_compat.sam_hf_to_original(hf.state_dict()), "sam.pth")

    cfg = sam_mod.SAMConfig(img_size=img_size, patch_size=patch, encoder_dim=32,
                            encoder_depth=3, encoder_heads=2, window_size=4,
                            global_attn_indexes=(1,), prompt_dim=32,
                            decoder_heads=2, decoder_mlp_dim=64)
    params = sam_mod.convert_torch_checkpoint(path, cfg)
    model = sam_mod.SAM(cfg, params)

    imgs = rng.normal(size=(1, img_size, img_size, 3)).astype(np.float32)
    want_emb = hf.vision_encoder(
        torch.from_numpy(imgs.transpose(0, 3, 1, 2))).last_hidden_state
    got_emb = np.asarray(model.encode_image(imgs))  # (1, g, g, d)
    np.testing.assert_allclose(got_emb.transpose(0, 3, 1, 2),
                               want_emb.detach().numpy(), atol=1e-4, rtol=1e-3)

    boxes = np.array([[4.0, 6.0, 40.0, 50.0], [10.0, 2.0, 30.0, 60.0]], np.float32)
    out = hf(image_embeddings=want_emb,
             input_boxes=torch.from_numpy(boxes[None]),
             multimask_output=False)
    want_masks = out.pred_masks[0, :, 0].detach().numpy()   # (K, 4g, 4g)
    want_iou = out.iou_scores[0, :, 0].detach().numpy()     # (K,)

    got_masks, got_iou = model.decode_boxes(got_emb[0], boxes)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_masks), want_masks, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------- GDINO
def _tiny_gdino_pair(rng):
    """Matched (HF official model, our config) at a small faithful config."""
    from transformers import BertConfig as HFBertConfig
    from transformers import GroundingDinoConfig, SwinConfig as HFSwinConfig
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        GroundingDinoForObjectDetection,
    )

    from beyondff_tpu.models.gdino import bert as bert_mod
    from beyondff_tpu.models.gdino import swin as swin_mod
    from beyondff_tpu.models.gdino.model import GDINOConfig

    # image (128, 160): every Swin stage resolution stays >= the window (4),
    # so no window shrinking — matching the production regime (800x1072 maps
    # never shrink below window 12)
    hf_swin = HFSwinConfig(image_size=128, patch_size=4, embed_dim=16,
                           depths=[1, 1, 2, 1], num_heads=[2, 2, 2, 2],
                           window_size=4, drop_path_rate=0.0,
                           out_features=["stage2", "stage3", "stage4"])
    hf_text = HFBertConfig(vocab_size=2000, hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=2, intermediate_size=64,
                           max_position_embeddings=32, hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    hf_cfg = GroundingDinoConfig(
        backbone_config=hf_swin, text_config=hf_text,
        d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_queries=20, max_text_len=16, num_feature_levels=4,
        encoder_n_points=4, decoder_n_points=4,
        dropout=0.0, fusion_dropout=0.0, fusion_droppath=0.0,
        text_enhancer_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = _randomize(GroundingDinoForObjectDetection(hf_cfg).eval(), rng)

    swin_cfg = swin_mod.SwinConfig(embed_dim=16, depths=(1, 1, 2, 1),
                                   num_heads=(2, 2, 2, 2), window_size=4,
                                   patch_size=4, out_indices=(1, 2, 3))
    bert_cfg = bert_mod.BertConfig(vocab_size=2000, hidden=32, layers=2, heads=2,
                                   intermediate=64, max_position=32)
    cfg = GDINOConfig(swin=swin_cfg, bert=bert_cfg, hidden=32, heads=4, levels=4,
                      enc_points=4, dec_points=4, enc_layers=2, dec_layers=2,
                      ffn_dim=64, num_queries=20, max_text_len=16,
                      image_size=(128, 160), enc_windowed_deform=False)
    return hf, cfg


def test_gdino_full_model_matches_hf(rng, tmp_path):
    """The whole Grounding-DINO forward — Swin + BERT + enhancer + query
    selection + decoder + contrastive head — vs the official architecture,
    weights via hf_compat.gdino_hf_to_original + the production converter."""
    from beyondff_tpu.models.gdino import bert as bert_mod
    from beyondff_tpu.models.gdino.convert import convert_torch_checkpoint
    from beyondff_tpu.models.gdino.model import GDINOModule

    hf, cfg = _tiny_gdino_pair(rng)
    path = _save_sd(tmp_path, hf_compat.gdino_hf_to_original(hf.state_dict()), "gdino.pth")
    params = convert_torch_checkpoint(path, cfg)

    h, w = cfg.image_size
    imgs = rng.normal(size=(1, h, w, 3)).astype(np.float32)
    # "[CLS] w w . w w w . [SEP]" — 1012 is '.' in the official special set
    ids = np.array([[101, 1200, 1305, 1012, 1400, 1501, 1602, 1012, 102]], np.int64)
    self_mask, pos_ids = bert_mod.subsentence_masks(ids, [1012, 1029], 101, 102)
    pad = np.ones_like(ids, bool)

    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                 input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(pad.astype(np.int64)))
    want_logits = out.logits.numpy()       # (1, Q, max_text_len)
    want_boxes = out.pred_boxes.numpy()    # (1, Q, 4)

    mod = GDINOModule(cfg)
    got_logits, got_boxes = mod.apply(
        params, jnp.asarray(imgs), jnp.asarray(ids, jnp.int32),
        jnp.asarray(self_mask), jnp.asarray(pad), jnp.asarray(pos_ids))
    got_logits = np.asarray(got_logits)
    got_boxes = np.asarray(got_boxes)

    t = ids.shape[1]
    # queries selected by top-k may tie-order differently; compare as sorted
    # sets first, then element-wise after verifying identical selection order
    np.testing.assert_allclose(got_boxes, want_boxes, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(got_logits[..., :t], want_logits[..., :t],
                               atol=5e-4, rtol=1e-3)
    # padding beyond the caption must stay masked out
    assert np.all(want_logits[..., t:] == -np.inf)
    assert np.all(got_logits[..., :t] > -1e30)


def test_gdino_proposal_validity_matches_hf(rng):
    """The static proposal grid + (0.01, 0.99) validity mask vs the official
    generate_encoder_output_proposals at REAL level sizes (where edge cells of
    the large levels are invalid — (i+0.5)/134 > 0.99)."""
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        GroundingDinoModel,
    )

    shapes = [(100, 134), (50, 67), (25, 34), (13, 17)]
    total = sum(h * w for h, w in shapes)
    d = 8
    enc = rng.normal(size=(1, total, d)).astype(np.float32)

    shim = GroundingDinoModel.__new__(GroundingDinoModel)
    torch.nn.Module.__init__(shim)
    shim.enc_output = torch.nn.Identity()
    shim.enc_output_norm = torch.nn.Identity()
    obj_query, proposals = shim.generate_encoder_output_proposals(
        torch.from_numpy(enc),
        torch.zeros((1, total), dtype=torch.bool),
        torch.tensor(shapes, dtype=torch.long))

    # reproduce the model's static construction (model.py query selection)
    centers, whs = [], []
    for li, (h, w) in enumerate(shapes):
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        g = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)
        centers.append(g)
        whs.append(np.full((h * w, 2), 0.05 * (2.0 ** li), np.float32))
    props = np.concatenate([np.concatenate(centers), np.concatenate(whs)], axis=-1)
    valid = ((props > 0.01) & (props < 0.99)).all(-1)
    anchor_logits = np.where(valid[:, None],
                             np.log(np.clip(props, 1e-9, None)
                                    / np.clip(1 - props, 1e-9, None)),
                             np.inf).astype(np.float32)

    assert valid.sum() < total  # edge cells of L0 really are invalid
    np.testing.assert_allclose(anchor_logits, proposals[0].numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(
        (obj_query[0].numpy() != 0).any(-1), valid & (np.abs(enc[0]).max(-1) > 0))
