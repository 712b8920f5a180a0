"""Checkpoint converters: round-trip against synthetic torch-layout state
dicts (inverse-mapped from our own param trees), so the key/transpose
conventions are verified without real checkpoint downloads."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from beyondff_tpu.models import clip as clip_mod  # noqa: E402
from beyondff_tpu.models import sam as sam_mod  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32).copy())


def _fake_clip_checkpoint(model: clip_mod.CLIP) -> dict:
    """Official-OpenAI-layout state dict built from our params (inverse map)."""
    p = model.params["params"]
    sd = {}

    def put_block(prefix, blk):
        qw = np.asarray(blk["attn"]["q"]["kernel"]).T
        kw = np.asarray(blk["attn"]["k"]["kernel"]).T
        vw = np.asarray(blk["attn"]["v"]["kernel"]).T
        sd[f"{prefix}.attn.in_proj_weight"] = _t(np.concatenate([qw, kw, vw], 0))
        sd[f"{prefix}.attn.in_proj_bias"] = _t(np.concatenate(
            [blk["attn"]["q"]["bias"], blk["attn"]["k"]["bias"], blk["attn"]["v"]["bias"]]))
        sd[f"{prefix}.attn.out_proj.weight"] = _t(np.asarray(blk["attn"]["proj"]["kernel"]).T)
        sd[f"{prefix}.attn.out_proj.bias"] = _t(blk["attn"]["proj"]["bias"])
        for ours, theirs in [("ln1", "ln_1"), ("ln2", "ln_2")]:
            sd[f"{prefix}.{theirs}.weight"] = _t(blk[ours]["scale"])
            sd[f"{prefix}.{theirs}.bias"] = _t(blk[ours]["bias"])
        sd[f"{prefix}.mlp.c_fc.weight"] = _t(np.asarray(blk["mlp"]["fc1"]["kernel"]).T)
        sd[f"{prefix}.mlp.c_fc.bias"] = _t(blk["mlp"]["fc1"]["bias"])
        sd[f"{prefix}.mlp.c_proj.weight"] = _t(np.asarray(blk["mlp"]["fc2"]["kernel"]).T)
        sd[f"{prefix}.mlp.c_proj.bias"] = _t(blk["mlp"]["fc2"]["bias"])

    vis = p["visual"]
    sd["visual.conv1.weight"] = _t(np.asarray(vis["patch_embed"]["proj"]["kernel"]).transpose(3, 2, 0, 1))
    sd["visual.class_embedding"] = _t(vis["class_embedding"])
    sd["visual.positional_embedding"] = _t(vis["positional_embedding"])
    for ours, theirs in [("ln_pre", "ln_pre"), ("ln_post", "ln_post")]:
        sd[f"visual.{theirs}.weight"] = _t(vis[ours]["scale"])
        sd[f"visual.{theirs}.bias"] = _t(vis[ours]["bias"])
    sd["visual.proj"] = _t(vis["proj"])
    for i in range(model.cfg.vision_layers):
        put_block(f"visual.transformer.resblocks.{i}", vis[f"block{i}"])

    txt = p["text"]
    sd["token_embedding.weight"] = _t(txt["token_embedding"]["embedding"])
    sd["positional_embedding"] = _t(txt["positional_embedding"])
    sd["ln_final.weight"] = _t(txt["ln_final"]["scale"])
    sd["ln_final.bias"] = _t(txt["ln_final"]["bias"])
    sd["text_projection"] = _t(txt["text_projection"])
    for i in range(model.cfg.text_layers):
        put_block(f"transformer.resblocks.{i}", txt[f"block{i}"])
    sd["logit_scale"] = _t(p["logit_scale"])
    return sd


def test_clip_converter_round_trip(tmp_path):
    model = clip_mod.CLIP.create("test", seed=3)
    sd = _fake_clip_checkpoint(model)
    path = str(tmp_path / "clip.pt")
    torch.save(sd, path)
    params = clip_mod.convert_torch_checkpoint(path, model.cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(model.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params))
    assert len(flat_a) == len(flat_b)
    for path_k, leaf in flat_a:
        other = flat_b[path_k]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(other), rtol=1e-6,
                                   err_msg=str(path_k))

    # converted params drive the model identically
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, model.cfg.image_resolution, model.cfg.image_resolution, 3)).astype(np.float32)
    a = np.asarray(model.encode_image(img))
    b = np.asarray(clip_mod.CLIP(model.cfg, params).encode_image(img))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def _fake_sam_checkpoint(model: sam_mod.SAM) -> dict:
    p = model.params["params"]
    sd = {}

    def dense_inv(prefix, d):
        sd[f"{prefix}.weight"] = _t(np.asarray(d["kernel"]).T)
        sd[f"{prefix}.bias"] = _t(d["bias"])

    def ln_inv(prefix, d):
        sd[f"{prefix}.weight"] = _t(d["scale"])
        sd[f"{prefix}.bias"] = _t(d["bias"])

    enc = p["encoder"]
    sd["image_encoder.patch_embed.proj.weight"] = _t(
        np.asarray(enc["patch_embed"]["kernel"]).transpose(3, 2, 0, 1))
    sd["image_encoder.patch_embed.proj.bias"] = _t(enc["patch_embed"]["bias"])
    sd["image_encoder.pos_embed"] = _t(enc["pos_embed"])
    sd["image_encoder.neck.0.weight"] = _t(np.asarray(enc["neck_conv1"]["kernel"]).transpose(3, 2, 0, 1))
    ln_inv("image_encoder.neck.1", enc["neck_ln1"])
    sd["image_encoder.neck.2.weight"] = _t(np.asarray(enc["neck_conv2"]["kernel"]).transpose(3, 2, 0, 1))
    ln_inv("image_encoder.neck.3", enc["neck_ln2"])
    for i in range(model.cfg.encoder_depth):
        blk = enc[f"block{i}"]
        pfx = f"image_encoder.blocks.{i}"
        ln_inv(f"{pfx}.norm1", blk["ln1"])
        ln_inv(f"{pfx}.norm2", blk["ln2"])
        dense_inv(f"{pfx}.attn.qkv", blk["attn"]["qkv"])
        dense_inv(f"{pfx}.attn.proj", blk["attn"]["proj"])
        if model.cfg.use_rel_pos:
            sd[f"{pfx}.attn.rel_pos_h"] = _t(blk["attn"]["rel_pos_h"])
            sd[f"{pfx}.attn.rel_pos_w"] = _t(blk["attn"]["rel_pos_w"])
        dense_inv(f"{pfx}.mlp.lin1", blk["mlp"]["fc1"])
        dense_inv(f"{pfx}.mlp.lin2", blk["mlp"]["fc2"])

    pr = p["prompt"]
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = _t(pr["pe_gaussian"])
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = _t(
            np.asarray(pr["point_embeddings"])[i][None])
    sd["prompt_encoder.not_a_point_embed.weight"] = _t(np.asarray(pr["not_a_point"])[None])
    sd["prompt_encoder.no_mask_embed.weight"] = _t(np.asarray(pr["no_mask"])[None])

    dec = p["decoder"]
    sd["mask_decoder.iou_token.weight"] = _t(dec["iou_token"])
    sd["mask_decoder.mask_tokens.weight"] = _t(dec["mask_tokens"])
    sd["mask_decoder.output_upscaling.0.weight"] = _t(
        np.asarray(dec["up1"]["kernel"]).transpose(3, 2, 0, 1))
    sd["mask_decoder.output_upscaling.0.bias"] = _t(dec["up1"]["bias"])
    ln_inv("mask_decoder.output_upscaling.1", dec["up_ln"])
    sd["mask_decoder.output_upscaling.3.weight"] = _t(
        np.asarray(dec["up2"]["kernel"]).transpose(3, 2, 0, 1))
    sd["mask_decoder.output_upscaling.3.bias"] = _t(dec["up2"]["bias"])
    ln_inv("mask_decoder.transformer.norm_final_attn", dec["ln_final"])

    def attn_inv(prefix, d):
        dense_inv(f"{prefix}.q_proj", d["q"])
        dense_inv(f"{prefix}.k_proj", d["k"])
        dense_inv(f"{prefix}.v_proj", d["v"])
        dense_inv(f"{prefix}.out_proj", d["proj"])

    attn_inv("mask_decoder.transformer.final_attn_token_to_image", dec["final_t2i"])
    for i in range(model.cfg.decoder_depth):
        blk = dec[f"block{i}"]
        pfx = f"mask_decoder.transformer.layers.{i}"
        attn_inv(f"{pfx}.self_attn", blk["self_attn"])
        ln_inv(f"{pfx}.norm1", blk["ln1"])
        attn_inv(f"{pfx}.cross_attn_token_to_image", blk["cross_t2i"])
        ln_inv(f"{pfx}.norm2", blk["ln2"])
        dense_inv(f"{pfx}.mlp.lin1", blk["mlp"]["fc1"])
        dense_inv(f"{pfx}.mlp.lin2", blk["mlp"]["fc2"])
        ln_inv(f"{pfx}.norm3", blk["ln3"])
        attn_inv(f"{pfx}.cross_attn_image_to_token", blk["cross_i2t"])
        ln_inv(f"{pfx}.norm4", blk["ln4"])
    for m in range(model.cfg.num_multimask_outputs + 1):
        for li in range(3):
            dense_inv(f"mask_decoder.output_hypernetworks_mlps.{m}.layers.{li}",
                      dec[f"hyper{m}_fc{li}"])
    for li in range(3):
        dense_inv(f"mask_decoder.iou_prediction_head.layers.{li}", dec[f"iou_fc{li}"])
    return sd


def test_sam_converter_round_trip(tmp_path):
    model = sam_mod.SAM.create("test", seed=5)
    sd = _fake_sam_checkpoint(model)
    path = str(tmp_path / "sam.pth")
    torch.save(sd, path)
    params = sam_mod.convert_torch_checkpoint(path, model.cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(model.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params))
    assert len(flat_a) == len(flat_b)
    for path_k, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path_k]),
                                   rtol=1e-6, err_msg=str(path_k))

    rng = np.random.default_rng(0)
    s = model.cfg.img_size
    x = rng.normal(size=(1, s, s, 3)).astype(np.float32)
    a = np.asarray(model.encode_image(x))
    b = np.asarray(sam_mod.SAM(model.cfg, params).encode_image(x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def _fake_gdino_checkpoint(model) -> dict:
    """Official-layout state dict inverse-mapped from our tiny-config params."""
    from beyondff_tpu.models.gdino import model as gm

    p = model.params["params"]
    cfg = model.cfg
    sd = {}

    def dense_inv(prefix, d):
        sd[f"{prefix}.weight"] = _t(np.asarray(d["kernel"]).T)
        sd[f"{prefix}.bias"] = _t(d["bias"])

    def ln_inv(prefix, d):
        sd[f"{prefix}.weight"] = _t(d["scale"])
        sd[f"{prefix}.bias"] = _t(d["bias"])

    def mha_inv(prefix, d):
        qw = np.asarray(d["q"]["kernel"]).T
        kw = np.asarray(d["k"]["kernel"]).T
        vw = np.asarray(d["v"]["kernel"]).T
        sd[f"{prefix}.in_proj_weight"] = _t(np.concatenate([qw, kw, vw], 0))
        sd[f"{prefix}.in_proj_bias"] = _t(np.concatenate(
            [d["q"]["bias"], d["k"]["bias"], d["v"]["bias"]]))
        dense_inv(f"{prefix}.out_proj", d["proj"])

    def deform_inv(prefix, d):
        for name in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
            dense_inv(f"{prefix}.{name}", d[name])

    bk = p["backbone"]
    sd["backbone.0.patch_embed.proj.weight"] = _t(
        np.asarray(bk["patch_embed"]["kernel"]).transpose(3, 2, 0, 1))
    sd["backbone.0.patch_embed.proj.bias"] = _t(bk["patch_embed"]["bias"])
    ln_inv("backbone.0.patch_embed.norm", bk["patch_norm"])
    for si, depth in enumerate(cfg.swin.depths):
        for bi in range(depth):
            blk = bk[f"stage{si}_block{bi}"]
            pfx = f"backbone.0.layers.{si}.blocks.{bi}"
            ln_inv(f"{pfx}.norm1", blk["ln1"])
            ln_inv(f"{pfx}.norm2", blk["ln2"])
            dense_inv(f"{pfx}.attn.qkv", blk["attn"]["qkv"])
            dense_inv(f"{pfx}.attn.proj", blk["attn"]["proj"])
            sd[f"{pfx}.attn.relative_position_bias_table"] = _t(blk["attn"]["rel_bias_table"])
            dense_inv(f"{pfx}.mlp.fc1", blk["mlp_fc1"])
            dense_inv(f"{pfx}.mlp.fc2", blk["mlp_fc2"])
        if si < len(cfg.swin.depths) - 1:
            mg = bk[f"merge{si}"]
            ln_inv(f"backbone.0.layers.{si}.downsample.norm", mg["norm"])
            sd[f"backbone.0.layers.{si}.downsample.reduction.weight"] = _t(
                np.asarray(mg["reduction"]["kernel"]).T)
    for si in cfg.swin.out_indices:
        ln_inv(f"backbone.0.norm{si}", bk[f"out_norm{si}"])

    bt = p["bert"]
    sd["bert.embeddings.word_embeddings.weight"] = _t(bt["word_emb"]["embedding"])
    sd["bert.embeddings.position_embeddings.weight"] = _t(bt["pos_emb"])
    sd["bert.embeddings.token_type_embeddings.weight"] = _t(bt["type_emb"])
    ln_inv("bert.embeddings.LayerNorm", bt["emb_ln"])
    for i in range(cfg.bert.layers):
        lyr = bt[f"layer{i}"]
        pfx = f"bert.encoder.layer.{i}"
        dense_inv(f"{pfx}.attention.self.query", lyr["q"])
        dense_inv(f"{pfx}.attention.self.key", lyr["k"])
        dense_inv(f"{pfx}.attention.self.value", lyr["v"])
        dense_inv(f"{pfx}.attention.output.dense", lyr["attn_out"])
        ln_inv(f"{pfx}.attention.output.LayerNorm", lyr["ln1"])
        dense_inv(f"{pfx}.intermediate.dense", lyr["fc1"])
        dense_inv(f"{pfx}.output.dense", lyr["fc2"])
        ln_inv(f"{pfx}.output.LayerNorm", lyr["ln2"])

    dense_inv("feat_map", p["feat_map"])
    for li in range(cfg.levels):
        sd[f"input_proj.{li}.0.weight"] = _t(
            np.asarray(p[f"input_proj{li}"]["kernel"]).transpose(3, 2, 0, 1))
        sd[f"input_proj.{li}.0.bias"] = _t(p[f"input_proj{li}"]["bias"])
        ln_inv(f"input_proj.{li}.1", p[f"input_gn{li}"])
    sd["transformer.level_embed"] = _t(p["level_embed"])

    for i in range(cfg.enc_layers):
        enc = p[f"enc{i}"]
        deform_inv(f"transformer.encoder.layers.{i}.self_attn", enc["deform"])
        ln_inv(f"transformer.encoder.layers.{i}.norm1", enc["img_ln1"])
        dense_inv(f"transformer.encoder.layers.{i}.linear1", enc["img_fc1"])
        dense_inv(f"transformer.encoder.layers.{i}.linear2", enc["img_fc2"])
        ln_inv(f"transformer.encoder.layers.{i}.norm2", enc["img_ln2"])
        mha_inv(f"transformer.encoder.text_layers.{i}.self_attn", enc["text_attn"])
        ln_inv(f"transformer.encoder.text_layers.{i}.norm1", enc["text_ln1"])
        dense_inv(f"transformer.encoder.text_layers.{i}.linear1", enc["text_fc1"])
        dense_inv(f"transformer.encoder.text_layers.{i}.linear2", enc["text_fc2"])
        ln_inv(f"transformer.encoder.text_layers.{i}.norm2", enc["text_ln2"])
        fus = enc["fusion"]
        fpfx = f"transformer.encoder.fusion_layers.{i}"
        for name in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                     "out_v_proj", "out_l_proj"):
            dense_inv(f"{fpfx}.attn.{name}", fus[name])
        sd[f"{fpfx}.gamma_v"] = _t(fus["gamma_v"])
        sd[f"{fpfx}.gamma_l"] = _t(fus["gamma_l"])
        ln_inv(f"{fpfx}.layer_norm_v", fus["ln_v"])
        ln_inv(f"{fpfx}.layer_norm_l", fus["ln_l"])

    dense_inv("transformer.enc_output", p["enc_output"])
    ln_inv("transformer.enc_output_norm", p["enc_output_ln"])
    sd["transformer.tgt_embed.weight"] = _t(p["tgt_embed"])
    for i in range(3):
        dense_inv(f"transformer.enc_out_bbox_embed.layers.{i}", p["enc_bbox_head"][f"fc{i}"])

    for i in range(cfg.dec_layers):
        dec = p[f"dec{i}"]
        pfx = f"transformer.decoder.layers.{i}"
        mha_inv(f"{pfx}.self_attn", dec["self_attn"])
        ln_inv(f"{pfx}.norm2", dec["ln1"])
        mha_inv(f"{pfx}.ca_text", dec["text_cross"])
        ln_inv(f"{pfx}.catext_norm", dec["ln_text"])
        deform_inv(f"{pfx}.cross_attn", dec["deform"])
        ln_inv(f"{pfx}.norm1", dec["ln2"])
        dense_inv(f"{pfx}.linear1", dec["fc1"])
        dense_inv(f"{pfx}.linear2", dec["fc2"])
        ln_inv(f"{pfx}.norm3", dec["ln3"])
    ln_inv("transformer.decoder.norm", p["dec_norm"])
    dense_inv("transformer.decoder.ref_point_head.layers.0", p["ref_point_fc1"])
    dense_inv("transformer.decoder.ref_point_head.layers.1", p["ref_point_fc2"])
    for i in range(3):
        dense_inv(f"bbox_embed.0.layers.{i}", p["bbox_head"][f"fc{i}"])
    return sd


def test_gdino_converter_round_trip(tmp_path):
    from beyondff_tpu.models.gdino import GroundingDINO
    from beyondff_tpu.models.gdino.convert import convert_torch_checkpoint

    model = GroundingDINO.create("test", seed=7)
    sd = _fake_gdino_checkpoint(model)
    path = str(tmp_path / "gdino.pth")
    torch.save({"model": sd}, path)
    params = convert_torch_checkpoint(path, model.cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(model.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params))
    assert len(flat_a) == len(flat_b), (len(flat_a), len(flat_b))
    for path_k, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path_k]),
                                   rtol=1e-6, err_msg=str(path_k))

    # converted params run the detector identically
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    a = model.predict(img, "clothes", box_threshold=0.0, text_threshold=0.0)
    b = GroundingDINO(model.cfg, params, model.tokenizer).predict(
        img, "clothes", box_threshold=0.0, text_threshold=0.0)
    np.testing.assert_allclose(a[0], b[0], rtol=1e-4, atol=1e-5)


def test_efficientsam_converter_round_trip(tmp_path):
    from beyondff_tpu.models import efficientsam as esam_mod

    model = esam_mod.EfficientSAM.create("test", seed=9)
    # EfficientSAM shares SAM's prompt/decoder naming; encoder is plain ViT
    sd = _fake_sam_checkpoint(model)
    # plain-ViT pos embed is stored (1, n_tokens, d) with a cls slot upstream
    pos = np.asarray(model.params["params"]["encoder"]["pos_embed"])
    g = pos.shape[1]
    d = pos.shape[-1]
    with_cls = np.concatenate([np.zeros((1, 1, d), np.float32),
                               pos.reshape(1, g * g, d)], axis=1)
    sd["image_encoder.pos_embed"] = _t(with_cls)
    path = str(tmp_path / "esam.pt")
    torch.save({"model": sd}, path)
    params = esam_mod.convert_torch_checkpoint(path, model.cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(model.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params))
    assert len(flat_a) == len(flat_b)
    for path_k, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path_k]),
                                   rtol=1e-6, err_msg=str(path_k))
