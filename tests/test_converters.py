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

from converter_layouts import (  # noqa: E402
    _fake_clip_checkpoint,
    _fake_gdino_checkpoint,
    _fake_sam_checkpoint,
    _fake_yolo_world_checkpoint,
    _t,
)


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


def _randomize(model):
    """Replace every float leaf with randoms (variances kept positive) so the
    round-trip detects any mapping swap that identical ones/zeros would hide."""
    rng = np.random.default_rng(11)

    def fill(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        arr = rng.normal(size=leaf.shape).astype(np.float32) * 0.3
        if name == "var":
            arr = np.abs(arr) + 0.5
        return jnp.asarray(arr)

    model.params = jax.tree_util.tree_map_with_path(fill, model.params)
    return model


def test_yolo_world_converter_round_trip(tmp_path):
    from beyondff_tpu.models import yolo_world as yw

    model = _randomize(yw.YOLOWorld.create("test", seed=13))
    sd = _fake_yolo_world_checkpoint(model)
    path = str(tmp_path / "yolow.pt")
    torch.save(sd, path)
    variables = yw.convert_torch_checkpoint(path, model.cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(model.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(variables))
    assert len(flat_a) == len(flat_b), (len(flat_a), len(flat_b))
    for path_k, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path_k]),
                                   rtol=1e-6, err_msg=str(path_k))

    # converted params drive the detector identically
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    a = model.predict(img, "clothes .", box_threshold=0.0)
    b = yw.YOLOWorld(model.cfg, variables).predict(img, "clothes .", box_threshold=0.0)
    np.testing.assert_allclose(a[0], b[0], rtol=1e-4, atol=1e-5)

    # strict consumption: unknown keys raise, missing keys raise
    sd_extra = dict(sd)
    sd_extra["model.99.bogus"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconsumed"):
        yw.convert_torch_checkpoint(sd_extra, model.cfg)
    sd_missing = {k: v for k, v in sd.items() if k != "model.0.conv.weight"}
    with pytest.raises(KeyError):
        yw.convert_torch_checkpoint(sd_missing, model.cfg)


# ------------------------------------------------- full-config key coverage
import os  # noqa: E402
from unittest import mock  # noqa: E402

import converter_layouts as layouts  # noqa: E402

_FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.mark.parametrize("name", sorted(layouts.FULL_MODELS))
def test_official_key_coverage(name):
    """Converters at FULL production configs: the complete official key
    universe (checked-in listing) must be consumed 100%, and the converted
    tree must cover every param of the model (VERDICT round 1, item 5)."""
    kind, _preset = layouts.FULL_MODELS[name]
    model, keys, sd = layouts.official_key_listing(name)

    fixture = os.path.join(_FIXDIR, f"{name}_keys.txt")
    assert os.path.exists(fixture), \
        f"missing fixture {fixture}; regenerate with python tests/converter_layouts.py"
    expected = [line for line in open(fixture).read().splitlines() if line]
    assert keys == expected, f"{name}: key universe drifted from the fixture"

    if kind == "clip":
        from beyondff_tpu.models import clip as clip_mod

        with mock.patch("torch.jit.load", side_effect=RuntimeError("not a jit archive")), \
                mock.patch("torch.load", return_value=sd):
            params = clip_mod.convert_torch_checkpoint("<mem>", model.cfg)
    elif kind == "sam":
        from beyondff_tpu.models import sam as sam_mod

        with mock.patch("torch.load", return_value=sd):
            params = sam_mod.convert_torch_checkpoint("<mem>", model.cfg)
    elif kind == "gdino":
        from beyondff_tpu.models.gdino.convert import convert_torch_checkpoint

        # exercise the documented ignore list with the real checkpoints' extras
        sd = dict(sd)
        d = model.cfg.hidden
        sd["bert.pooler.dense.weight"] = torch.zeros(d, d)
        sd["bert.pooler.dense.bias"] = torch.zeros(d)
        sd["bert.embeddings.position_ids"] = torch.zeros(1, 8)
        sd["bbox_embed.1.layers.0.weight"] = torch.zeros(d, d)
        sd["transformer.decoder.bbox_embed.0.layers.0.weight"] = torch.zeros(d, d)
        with mock.patch("torch.load", return_value=sd):
            params = convert_torch_checkpoint("<mem>", model.cfg)
    elif kind == "efficientsam":
        from beyondff_tpu.models import efficientsam as esam_mod

        with mock.patch("torch.load", return_value=sd):
            params = esam_mod.convert_torch_checkpoint("<mem>", model.cfg)
    else:  # yolo_world
        from beyondff_tpu.models import yolo_world as yw

        params = yw.convert_torch_checkpoint(sd, model.cfg)

    ours = {jax.tree_util.keystr(p): l.shape
            for p, l in jax.tree_util.tree_leaves_with_path(model.params)}
    theirs = {jax.tree_util.keystr(p): np.asarray(l).shape
              for p, l in jax.tree_util.tree_leaves_with_path(params)}
    assert ours == theirs  # every param produced, at the right shape


def test_gdino_bert_keys_match_transformers():
    """External truth check: the BERT key names our GDINO converter expects
    must be exactly the HuggingFace BertModel state-dict layout the official
    checkpoint embeds (reference: groundingdino bertwarper / HF bert)."""
    transformers = pytest.importorskip("transformers")

    from beyondff_tpu.models.gdino import GroundingDINO

    model = GroundingDINO.create("test", seed=0)
    sd = _fake_gdino_checkpoint(model)
    ours = {k[len("bert."):] for k in sd if k.startswith("bert.")}

    cfg = transformers.BertConfig(
        vocab_size=model.cfg.bert.vocab_size, hidden_size=model.cfg.bert.hidden,
        num_hidden_layers=model.cfg.bert.layers,
        num_attention_heads=model.cfg.bert.heads,
        intermediate_size=model.cfg.bert.intermediate,
        max_position_embeddings=model.cfg.bert.max_position)
    hf = set(transformers.BertModel(cfg).state_dict().keys())
    extra_in_hf = hf - ours
    # the pooler head (unused by Grounding-DINO) and buffer-only keys are the
    # ONLY official keys we do not map — and the converter ignore-lists them
    assert all("pooler" in k or "position_ids" in k for k in extra_in_hf), extra_in_hf
    assert not (ours - hf), f"keys we expect but HF BERT lacks: {sorted(ours - hf)[:10]}"
