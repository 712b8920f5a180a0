"""Official-checkpoint key layouts, inverse-mapped from our param trees.

Each ``fake_*_checkpoint`` builds a state dict in the OFFICIAL layout of the
corresponding public checkpoint (OpenAI CLIP, Meta SAM, IDEA Grounding-DINO,
Meta EfficientSAM, ultralytics YOLO-World) from one of our models. They are
the executable statement of each converter's key map: round-trip tests check
value fidelity at tiny configs, and the key-coverage tests check the full-
scale key universe against the checked-in listings in tests/fixtures/
(regenerate with ``python tests/converter_layouts.py``).
"""

import numpy as np
import torch

import jax  # noqa: F401


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32).copy())


def _fake_clip_checkpoint(model) -> dict:
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


def _fake_sam_checkpoint(model) -> dict:
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
    # mask-prompt downscaling stack: present in the official checkpoint,
    # unused by the box-prompted pipeline (converter ignore-lists it)
    d_pr = np.asarray(pr["no_mask"]).shape[-1]
    mc = 16
    for key, shape in [
        ("mask_downscaling.0.weight", (mc // 4, 1, 2, 2)),
        ("mask_downscaling.0.bias", (mc // 4,)),
        ("mask_downscaling.1.weight", (mc // 4,)),
        ("mask_downscaling.1.bias", (mc // 4,)),
        ("mask_downscaling.3.weight", (mc, mc // 4, 2, 2)),
        ("mask_downscaling.3.bias", (mc,)),
        ("mask_downscaling.4.weight", (mc,)),
        ("mask_downscaling.4.bias", (mc,)),
        ("mask_downscaling.6.weight", (d_pr, mc, 1, 1)),
        ("mask_downscaling.6.bias", (d_pr,)),
    ]:
        sd[f"prompt_encoder.{key}"] = torch.zeros(*shape)

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
            ws = cfg.swin.window_size
            sd[f"{pfx}.attn.relative_position_index"] = torch.zeros(
                ws * ws, ws * ws, dtype=torch.long)
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


def _fake_yolo_world_checkpoint(model) -> dict:
    """ultralytics yolov8-world(v2)-layout state dict inverse-mapped from our
    params (randomized, so any key/transpose swap breaks equality)."""
    from beyondff_tpu.models import yolo_world as yw

    p = model.params["params"]
    st = model.params["batch_stats"]
    sd = {}

    def conv_inv(prefix, pp, ss):
        sd[f"{prefix}.conv.weight"] = _t(np.asarray(pp["conv"]["kernel"]).transpose(3, 2, 0, 1))
        sd[f"{prefix}.bn.weight"] = _t(pp["bn"]["scale"])
        sd[f"{prefix}.bn.bias"] = _t(pp["bn"]["bias"])
        sd[f"{prefix}.bn.running_mean"] = _t(ss["bn"]["mean"])
        sd[f"{prefix}.bn.running_var"] = _t(ss["bn"]["var"])
        sd[f"{prefix}.bn.num_batches_tracked"] = torch.tensor(0)

    def c2f_inv(prefix, pp, ss, n, attn=False):
        conv_inv(f"{prefix}.cv1", pp["cv1"], ss["cv1"])
        conv_inv(f"{prefix}.cv2", pp["cv2"], ss["cv2"])
        for j in range(n):
            conv_inv(f"{prefix}.m.{j}.cv1", pp[f"m{j}"]["cv1"], ss[f"m{j}"]["cv1"])
            conv_inv(f"{prefix}.m.{j}.cv2", pp[f"m{j}"]["cv2"], ss[f"m{j}"]["cv2"])
        if attn:
            sd[f"{prefix}.attn.gl.weight"] = _t(np.asarray(pp["attn"]["gl"]["kernel"]).T)
            sd[f"{prefix}.attn.bias"] = _t(pp["attn"]["bias"])
            conv_inv(f"{prefix}.attn.proj_conv", pp["attn"]["proj_conv"],
                     ss["attn"]["proj_conv"])

    d = lambda n: max(1, round(n * model.cfg.depth))
    for i, (name, kind) in enumerate(yw._LAYERS):
        pfx = f"model.{i}"
        if kind == "conv":
            conv_inv(pfx, p[name], st[name])
        elif kind == "sppf":
            conv_inv(f"{pfx}.cv1", p[name]["cv1"], st[name]["cv1"])
            conv_inv(f"{pfx}.cv2", p[name]["cv2"], st[name]["cv2"])
        elif kind == "c2f":
            c2f_inv(pfx, p[name], st[name], d(yw._C2F_DEPTHS[name]))
        elif kind == "c2fattn":
            c2f_inv(pfx, p[name], st[name], d(yw._C2F_DEPTHS[name]), attn=True)
        elif kind == "detect":
            for s_i in range(3):
                for branch, ours in (("cv2", "reg"), ("cv3", "cls")):
                    for j in range(2):
                        conv_inv(f"{pfx}.{branch}.{s_i}.{j}", p[f"{ours}{s_i}_{j}"],
                                 st[f"{ours}{s_i}_{j}"])
                    sd[f"{pfx}.{branch}.{s_i}.2.weight"] = _t(
                        np.asarray(p[f"{ours}{s_i}_2"]["kernel"]).transpose(3, 2, 0, 1))
                    sd[f"{pfx}.{branch}.{s_i}.2.bias"] = _t(p[f"{ours}{s_i}_2"]["bias"])
                sd[f"{pfx}.cv4.{s_i}.bias"] = _t(p[f"head{s_i}_bias"])
                sd[f"{pfx}.cv4.{s_i}.logit_scale"] = _t(
                    np.asarray(p[f"head{s_i}_logit_scale"]).reshape(1))
                sd[f"{pfx}.cv4.{s_i}.norm.weight"] = _t(p[f"head{s_i}_norm"]["scale"])
                sd[f"{pfx}.cv4.{s_i}.norm.bias"] = _t(p[f"head{s_i}_norm"]["bias"])
                sd[f"{pfx}.cv4.{s_i}.norm.running_mean"] = _t(st[f"head{s_i}_norm"]["mean"])
                sd[f"{pfx}.cv4.{s_i}.norm.running_var"] = _t(st[f"head{s_i}_norm"]["var"])
            sd[f"{pfx}.dfl.conv.weight"] = _t(
                np.arange(model.cfg.reg_max, dtype=np.float32).reshape(1, -1, 1, 1))
    return sd




# ---------------------------------------------------------------- coverage
FULL_MODELS = {
    # fixture name -> (builder of a zero-weight full-config model, fake fn)
    "sam_vit_h": ("sam", "vit_h"),
    "clip_vit_l14": ("clip", "ViT-L/14"),
    "gdino_swinb": ("gdino", "swinb"),
    "efficientsam_vits": ("efficientsam", "vits"),
    "yolo_world_l": ("yolo_world", "l"),
}


def build_zero_model(kind: str, preset: str):
    """Full-config model with zero weights (structure-only, fast)."""
    import beyondff_tpu.models.init_utils as iu

    orig = iu.fast_init

    def zero_init(module, *a, **kw):
        kw["scale"] = 0.0
        kw["device_fill"] = False
        return orig(module, *a, **kw)

    iu.fast_init = zero_init
    try:
        if kind == "sam":
            from beyondff_tpu.models import sam as sam_mod

            return sam_mod.SAM.create(preset)
        if kind == "clip":
            from beyondff_tpu.models import clip as clip_mod

            return clip_mod.CLIP.create(preset)
        if kind == "gdino":
            from beyondff_tpu.models.gdino import GroundingDINO

            return GroundingDINO.create(preset)
        if kind == "efficientsam":
            from beyondff_tpu.models import efficientsam as esam_mod

            return esam_mod.EfficientSAM.create(preset)
        if kind == "yolo_world":
            from beyondff_tpu.models import yolo_world as yw

            return yw.YOLOWorld.create(preset)
        raise ValueError(kind)
    finally:
        iu.fast_init = orig


def fake_checkpoint_for(kind: str, model) -> dict:
    if kind == "clip":
        return _fake_clip_checkpoint(model)
    if kind == "sam":
        return _fake_sam_checkpoint(model)
    if kind == "gdino":
        return _fake_gdino_checkpoint(model)
    if kind == "efficientsam":
        sd = _fake_sam_checkpoint(model)
        pos = np.asarray(model.params["params"]["encoder"]["pos_embed"])
        g, d = pos.shape[1], pos.shape[-1]
        with_cls = np.concatenate(
            [np.zeros((1, 1, d), np.float32), pos.reshape(1, g * g, d)], axis=1)
        sd["image_encoder.pos_embed"] = _t(with_cls)
        return sd
    if kind == "yolo_world":
        from beyondff_tpu.models import yolo_world  # noqa: F401

        # defined in test_converters historically; now local import cycle-free
        return _fake_yolo_world_checkpoint(model)
    raise ValueError(kind)


def official_key_listing(name: str):
    kind, preset = FULL_MODELS[name]
    model = build_zero_model(kind, preset)
    sd = fake_checkpoint_for(kind, model)
    return model, sorted(sd), sd


if __name__ == "__main__":
    # regenerate the checked-in full-config key listings
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(here, "fixtures"), exist_ok=True)
    import sys

    sys.path.insert(0, os.path.dirname(here))
    for name in FULL_MODELS:
        _model, keys, _sd = official_key_listing(name)
        out = os.path.join(here, "fixtures", f"{name}_keys.txt")
        with open(out, "w") as f:
            f.write("\n".join(keys) + "\n")
        print(f"{name}: {len(keys)} keys -> {out}")
