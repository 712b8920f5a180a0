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
